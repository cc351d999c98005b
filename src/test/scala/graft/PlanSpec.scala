package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plan._
import graft.llm.{FakeClusterLlmClient, FakeLlmClient, LlmClient}

/** Query-plan layer tests (mirrors reference tests/unit/query: test_plan.py
  * serialization/compare/insert, execution/test_sycamore_operator.py
  * per-operator lowering, test_sycamore_executor.py caching). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def tables(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
  private def executor(llm: LlmClient = new FakeLlmClient("echo:64"),
                       cacheDir: Option[String] = None) =
    new QueryExecutor(spark, llm, tables, cacheDir)

  private val topkPlanJson =
    """{"query": "top sources", "result_node": 1, "nodes": {
      |  "0": {"node_type": "QueryDatabase", "node_id": 0, "inputs": [],
      |        "index": "documents", "query": {"match": {"lang": "en"}}},
      |  "1": {"node_type": "TopK", "node_id": 1, "inputs": [0],
      |        "field": "properties.source", "K": 3, "descending": true,
      |        "llm_cluster": false}}}""".stripMargin

  test("plan JSON round-trip preserves structure and payload") {
    val p = QPlan.fromJson(topkPlanJson)
    assert(p.resultNode == 1 && p.nodes.size == 2)
    val p2 = QPlan.fromJson(p.toJson)
    assert(p.logicalCompare(p2))
    assert(p.cacheKey(1) == p2.cacheKey(1))
    // payload change -> different cache key; description change -> same key
    val changed = QPlan.fromJson(topkPlanJson.replace("\"K\": 3", "\"K\": 4"))
    assert(p.cacheKey(1) != changed.cacheKey(1))
    val described = QPlan.fromJson(
      topkPlanJson.replace("\"node_id\": 1,", "\"node_id\": 1, \"description\": \"x\","))
    assert(p.cacheKey(1) == described.cacheKey(1))
  }

  test("validation rejects type errors, missing inputs, cycles") {
    // Math fed a DocSet
    val bad1 = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"Math","node_id":1,"inputs":[0,0],"operation":"add"}}}"""
    assertThrows[IllegalArgumentException](QPlan.fromJson(bad1).validate())
    val missing = """{"query":"","result_node":1,"nodes":{
      "1": {"node_type":"Limit","node_id":1,"inputs":[9],"num_records":5}}}"""
    assertThrows[IllegalArgumentException](QPlan.fromJson(missing).validate())
    val cyclic = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"Limit","node_id":0,"inputs":[1],"num_records":5},
      "1": {"node_type":"Limit","node_id":1,"inputs":[0],"num_records":5}}}"""
    assertThrows[IllegalArgumentException](QPlan.fromJson(cyclic).validate())
  }

  test("TopK plan matches the direct DataFrame twin") {
    val out = executor().execute(QPlan.fromJson(topkPlanJson)) match {
      case QDocs(ds) => ds.toDF
        .select(element_at(col("properties"), "key").as("key"),
          element_at(col("properties"), "count").cast("long").as("count"))
        .orderBy(desc("count"), col("key"))
        .as[(String, Long)].collect().toSeq
      case other => fail(s"expected docs, got $other")
    }
    val want = tables("documents").where(lower(col("lang")).contains("en"))
      .groupBy(col("source")).count()
      .orderBy(desc("count"), col("source")).limit(3)
      .as[(String, Long)].collect().toSeq
    assert(out == want)
  }

  test("QueryDatabase DSL filter reaches the parquet scan (pushdown)") {
    val p = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"orders","query":{"bool":{"must":[
              {"term":{"o_orderstatus":"F"}},
              {"range":{"o_totalprice":{"gte":1000,"lte":100000}}}]}}}}}""")
    val QDocs(ds) = executor().execute(p): @unchecked
    val plan = ds.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(o_orderstatus,F)"), s"filter not pushed:\n$plan")
  }

  test("Dsl terms / exists / should clauses (engine-compatible bool)") {
    // should alongside must: minimum_should_match=0 — scoring only, no
    // filter effect (the Lucene bool contract the reference executes on)
    val p = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"orders","query":{"bool":{
              "must":[{"exists":{"field":"o_orderkey"}}],
              "should":[{"terms":{"o_orderstatus":["F","P"]}},
                        {"range":{"o_totalprice":{"gte":400000}}}]}}}}}""")
    val QDocs(ds) = executor().execute(p): @unchecked
    val want = tables("orders").where(col("o_orderkey").isNotNull).count()
    assert(ds.count() == want)

    // should standing alone: minimum_should_match=1 — an OR filter
    val alone = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"orders","query":{"bool":{
              "should":[{"terms":{"o_orderstatus":["F","P"]}},
                        {"range":{"o_totalprice":{"gte":400000}}}]}}}}}""")
    val QDocs(ds2) = executor().execute(alone): @unchecked
    val want2 = tables("orders").where(
      col("o_orderstatus").isin("F", "P") || col("o_totalprice") >= 400000.0).count()
    assert(ds2.count() == want2)

    // `filter` = must without scoring (the commonest LLM bool idiom);
    // it also suppresses should, like must
    val filt = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"orders","query":{"bool":{
              "filter":[{"term":{"o_orderstatus":"F"}}],
              "should":[{"range":{"o_totalprice":{"gte":400000}}}]}}}}}""")
    val QDocs(ds3) = executor().execute(filt): @unchecked
    val want3 = tables("orders").where(col("o_orderstatus") === "F").count()
    assert(ds3.count() == want3)

    // must_not does NOT suppress should (Lucene contract:
    // minimum_should_match defaults to 1 when no must/filter exists) —
    // bool{must_not, should} is (NOT x) AND (a OR b), not just NOT x
    val mn = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"orders","query":{"bool":{
              "must_not":[{"term":{"o_orderstatus":"O"}}],
              "should":[{"terms":{"o_orderstatus":["P"]}},
                        {"range":{"o_totalprice":{"gte":200000}}}]}}}}}""")
    val QDocs(ds4) = executor().execute(mn): @unchecked
    val want4 = tables("orders").where(!(col("o_orderstatus") === "O") &&
      (col("o_orderstatus").isin("P") || col("o_totalprice") >= 200000.0)).count()
    val superset = tables("orders").where(!(col("o_orderstatus") === "O")).count()
    assert(want4 < superset, "fixture must distinguish the two readings")
    assert(ds4.count() == want4)
  }

  test("Count / distinct Count / Math divide") {
    val countPlan = """{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"orders"},
      "1": {"node_type":"Count","node_id":1,"inputs":[0]},
      "2": {"node_type":"Math","node_id":2,"inputs":[1,3],"operation":"divide"},
      "3": {"node_type":"Count","node_id":3,"inputs":[0],"distinct_field":"properties.o_custkey"}}}"""
    val n = tables("orders").count().toDouble
    val d = tables("orders").select("o_custkey").distinct().count().toDouble
    executor().execute(QPlan.fromJson(countPlan)) match {
      case QNumV(v) => assert(v == n / d)
      case other => fail(s"expected number, got $other")
    }
    // divide by zero -> NaN (reference operations.py math_operation)
    val z = new QueryExecutor(spark, new FakeLlmClient(), tables)
    val nan = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"region"},
      "1": {"node_type":"Math","node_id":1,"inputs":[2,3],"operation":"divide"},
      "2": {"node_type":"Count","node_id":2,"inputs":[0]},
      "3": {"node_type":"Count","node_id":3,"inputs":[0],"distinct_field":"properties.nope"}}}"""
    z.execute(QPlan.fromJson(nan)) match {
      case QNumV(v) => assert(v.isNaN)
      case other => fail(s"$other")
    }
  }

  test("BasicFilter match is case-insensitive substring; range is inclusive") {
    val matchPlan = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"BasicFilter","node_id":1,"inputs":[0],
            "field":"properties.lang","range_filter":false,"query":"EN"}}}"""
    val QDocs(m) = executor().execute(QPlan.fromJson(matchPlan)): @unchecked
    val wantMatch = tables("documents").where(col("lang") === "en").count()
    assert(m.count() == wantMatch)

    val rangePlan = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"orders"},
      "1": {"node_type":"BasicFilter","node_id":1,"inputs":[0],
            "field":"properties.o_totalprice","range_filter":true,
            "start":1000,"end":50000}}}"""
    val QDocs(r) = executor().execute(QPlan.fromJson(rangePlan)): @unchecked
    val wantRange = tables("orders")
      .where(col("o_totalprice").between(1000.0, 50000.0)).count()
    assert(r.count() == wantRange)
    // the properties-map predicate must fold back to the raw column and
    // reach the parquet scan (column-built Document conversion is
    // transparent to Catalyst)
    val plan = r.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("o_totalprice"),
      s"property filter not pushed to scan:\n$plan")
  }

  test("FieldIn keeps input-1 docs matched by input-2 values") {
    val p = """{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"customer"},
      "1": {"node_type":"QueryDatabase","node_id":1,"inputs":[],
            "index":"nation","query":{"term":{"n_regionkey":2}}},
      "2": {"node_type":"FieldIn","node_id":2,"inputs":[0,1],
            "field_one":"properties.c_nationkey","field_two":"properties.n_nationkey"}}}"""
    val QDocs(ds) = executor().execute(QPlan.fromJson(p)): @unchecked
    val want = tables("customer").join(
      tables("nation").where(col("n_regionkey") === 2),
      col("c_nationkey") === col("n_nationkey"), "left_semi").count()
    assert(ds.count() == want)
  }

  test("GroupBy + AggregateCount matches groupbyCount; Sort + Limit; Unroll") {
    val p = """{"query":"","result_node":3,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"GroupBy","node_id":1,"inputs":[0],"field":"properties.lang"},
      "2": {"node_type":"AggregateCount","node_id":2,"inputs":[1]},
      "3": {"node_type":"Sort","node_id":3,"inputs":[2],
            "field":"properties.key","descending":false}}}"""
    val QDocs(ds) = executor().execute(QPlan.fromJson(p)): @unchecked
    val got = ds.toDF.select(element_at(col("properties"), "key"),
        element_at(col("properties"), "count").cast("long"))
      .as[(String, Long)].collect().toSeq
    val want = tables("documents").groupBy(col("lang")).count()
      .orderBy("lang").as[(String, Long)].collect().toSeq
    assert(got == want)

    val unroll = """{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],
            "index":"part","query":{"range":{"p_partkey":{"lte":5}}}},
      "1": {"node_type":"Unroll","node_id":1,"inputs":[0],"field":"properties.p_type"},
      "2": {"node_type":"Limit","node_id":2,"inputs":[1],"num_records":4}}}"""
    val QDocs(u) = executor().execute(QPlan.fromJson(unroll)): @unchecked
    assert(u.count() == 4)
  }

  test("LlmFilter / LlmExtractEntity with fake clients") {
    val scorePlan = """{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"Limit","node_id":1,"inputs":[0],"num_records":20},
      "2": {"node_type":"LlmFilter","node_id":2,"inputs":[1],
            "field":"properties.source","question":"Is this a good source?"}}}"""
    val QDocs(f) = executor(new FakeLlmClient("score"))
      .execute(QPlan.fromJson(scorePlan)): @unchecked
    val kept = f.count()
    assert(kept < 20) // score fake spreads 0-4; threshold 3 must drop some

    val extractPlan = """{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"Limit","node_id":1,"inputs":[0],"num_records":5},
      "2": {"node_type":"LlmExtractEntity","node_id":2,"inputs":[1],
            "question":"What lang?","field":"properties.lang",
            "new_field":"lang_entity","new_field_type":"string"}}}"""
    val QDocs(e) = executor(new FakeLlmClient("echo:3"))
      .execute(QPlan.fromJson(extractPlan)): @unchecked
    assert(e.takeAll().forall(_.prop("lang_entity").isDefined))
  }

  test("TopK with llm_cluster normalizes via FakeClusterLlmClient") {
    val docs = Seq(
      ("a1", "New York City"), ("a2", "new york"), ("a3", "NYC area: new york"),
      ("b1", "Boston"), ("b2", "boston downtown")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/plan_cluster_in")
    val p = """{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"DataLoader","node_id":0,"inputs":[],"path":"/tmp/plan_cluster_in"},
      "1": {"node_type":"TopK","node_id":1,"inputs":[0],
            "field":"text_representation","K":2,"descending":true,
            "llm_cluster":true,"llm_cluster_instruction":"group by city"}}}"""
    val client = new FakeClusterLlmClient(Seq("new york", "boston"))
    val QDocs(ds) = executor(client).execute(QPlan.fromJson(p)): @unchecked
    val got = ds.toDF.select(element_at(col("properties"), "key"),
      element_at(col("properties"), "count").cast("long")).as[(String, Long)].collect().toSeq
    assert(got == Seq(("new york", 3L), ("boston", 2L)))
  }

  test("SummarizeData synthesizes over docset and scalar inputs") {
    val p = """{"query":"how many orders","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"orders"},
      "1": {"node_type":"Count","node_id":1,"inputs":[0]},
      "2": {"node_type":"SummarizeData","node_id":2,"inputs":[1],
            "question":"how many orders"}}}"""
    val echo = new LlmClient { def generate(prompt: String): String = prompt }
    executor(echo).execute(QPlan.fromJson(p)) match {
      case QStrV(s) =>
        assert(s.contains("how many orders"))
        assert(s.contains(tables("orders").count().toString))
      case other => fail(s"$other")
    }
  }

  test("executor caches ONLY expensive ops, keyed by plan + source data") {
    val dir = java.nio.file.Files.createTempDirectory("plancache").toString
    val tblDir = java.nio.file.Files.createTempDirectory("plantbl").toString
    try {
      // a private copy of the documents table so the test can re-ingest it
      tables("documents").limit(40).write.parquet(s"$tblDir/documents")
      def myTables(n: String): DataFrame = spark.read.parquet(s"$tblDir/$n")
      val p = QPlan.fromJson("""{"query":"q","result_node":1,"nodes":{
        "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
        "1": {"node_type":"LlmFilter","node_id":1,"inputs":[0],
              "field":"properties.source","question":"good source?"}}}""")
      def ex() = new QueryExecutor(spark, new FakeLlmClient("score"),
        myTables, Some(dir))
      val e1 = ex()
      val QDocs(first) = e1.execute(p): @unchecked
      val rows1 = first.count()
      val cachedDirs = new java.io.File(dir).listFiles().map(_.getName).toSet
      // ONLY the expensive LlmFilter node caches — materializing the raw
      // scan would copy the whole table per plan prefix and sever pushdown
      assert(cachedDirs.size == 1 &&
        cachedDirs.head.startsWith(p.cacheKey(1)), cachedDirs)
      assert(e1.cacheMisses == 1 && e1.cacheHits == 0)
      // second run: same plan + same data -> read back from cache
      val e2 = ex()
      val QDocs(second) = e2.execute(p): @unchecked
      assert(second.count() == rows1)
      assert(e2.cacheHits == 1 && e2.cacheMisses == 0)
      // RE-INGEST the table: the plan-only key would serve the stale
      // cache; the source fingerprint must force a miss
      myTables("documents").limit(10).localCheckpoint()
        .write.mode("overwrite").parquet(s"$tblDir/documents")
      val e3 = ex()
      val QDocs(third) = e3.execute(p): @unchecked
      assert(e3.cacheMisses == 1 && e3.cacheHits == 0,
        s"stale cache served after re-ingest: hits=${e3.cacheHits}")
      assert(third.count() <= 10)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir)); rm(new java.io.File(tblDir))
    }
  }

  test("insertNode shifts ids; LimitLlmOperations inserts a guard; AlwaysSummarize appends") {
    val p = QPlan.fromJson("""{"query":"q","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"LlmFilter","node_id":1,"inputs":[0],
            "field":"properties.lang","question":"english?"}}}""")
    val guarded = LimitLlmOperations(50)(p)
    assert(guarded.nodes.size == 3)
    assert(guarded.node(1).isInstanceOf[QLimit])
    assert(guarded.node(2).isInstanceOf[QLlmFilter] && guarded.node(2).inputs == Seq(1))
    assert(guarded.resultNode == 2)
    // idempotent: guard already present
    assert(LimitLlmOperations(50)(guarded).nodes.size == 3)

    val summarized = AlwaysSummarize(guarded)
    assert(summarized.node(summarized.resultNode).isInstanceOf[QSummarizeData])
    // trailing sort is stripped before appending
    val sorted = QPlan.fromJson("""{"query":"q","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"Sort","node_id":1,"inputs":[0],"field":"properties.lang"}}}""")
    val s2 = AlwaysSummarize(sorted)
    assert(!s2.nodes.values.exists(_.isInstanceOf[QSort]))
    assert(s2.node(s2.resultNode).isInstanceOf[QSummarizeData])
  }

  test("KMeanClustering executes over a table's embedding column") {
    val p = QPlan.fromJson("""{"query":"","result_node":3,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"embeddings"},
      "1": {"node_type":"KMeanClustering","node_id":1,"inputs":[0],
            "new_field":"cluster","K":4},
      "2": {"node_type":"GroupBy","node_id":2,"inputs":[1],"field":"properties.cluster"},
      "3": {"node_type":"AggregateCount","node_id":3,"inputs":[2]}}}""")
    val QDocs(ds) = executor().execute(p): @unchecked
    val counts = ds.toDF.select(element_at(col("properties"), "count").cast("long"))
      .as[Long].collect()
    assert(counts.length == 4 && counts.sum == tables("embeddings").count())
  }

  test("Sort orders numeric string properties numerically") {
    val p = QPlan.fromJson("""{"query":"","result_node":2,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"orders"},
      "1": {"node_type":"Sort","node_id":1,"inputs":[0],
            "field":"properties.o_totalprice","descending":true},
      "2": {"node_type":"Limit","node_id":2,"inputs":[1],"num_records":5}}}""")
    val QDocs(ds) = executor().execute(p): @unchecked
    val got = ds.toDF.select(element_at(col("properties"), "o_totalprice").cast("double"))
      .as[Double].collect().toSeq
    val want = tables("orders").orderBy(desc("o_totalprice"))
      .select(col("o_totalprice")).as[Double].take(5).toSeq
    assert(got == want, s"lexical sort would misorder: $got vs $want")
  }

  test("QueryVectorDatabase returns top-k by embedded-phrase cosine") {
    val p = QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"QueryVectorDatabase","node_id":0,"inputs":[],
            "index":"embeddings","query_phrase":"anything","K":7}}}""")
    val QDocs(ds) = executor().execute(p): @unchecked
    assert(ds.count() == 7)
  }

  test("RemoveVectorSearchForAnalytics rewrites vector-search-then-count") {
    val p = QPlan.fromJson("""{"query":"how many","result_node":1,"nodes":{
      "0": {"node_type":"QueryVectorDatabase","node_id":0,"inputs":[],
            "index":"documents","query_phrase":"about spark","K":10},
      "1": {"node_type":"Count","node_id":1,"inputs":[0]}}}""")
    val rewritten = RemoveVectorSearchForAnalytics(p)
    rewritten.validate()
    assert(rewritten.node(0).isInstanceOf[QQueryDatabase])
    assert(rewritten.node(1) match {
      case f: QLlmFilter => f.question == "about spark"
      case _ => false
    })
    assert(rewritten.node(2).isInstanceOf[QCount])
    // non-analytics tails are left alone
    val untouched = RemoveVectorSearchForAnalytics(QPlan.fromJson(
      """{"query":"","result_node":1,"nodes":{
        "0": {"node_type":"QueryVectorDatabase","node_id":0,"inputs":[],
              "index":"documents","query_phrase":"x","K":5},
        "1": {"node_type":"Limit","node_id":1,"inputs":[0],"num_records":3}}}"""))
    assert(untouched.node(0).isInstanceOf[QQueryVectorDatabase])
  }

  test("OnlyRetrieval strips non-retrieval tail operators") {
    val p = QPlan.fromJson("""{"query":"","result_node":3,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"BasicFilter","node_id":1,"inputs":[0],
            "field":"properties.lang","range_filter":false,"query":"en"},
      "2": {"node_type":"TopK","node_id":2,"inputs":[1],
            "field":"properties.source","K":3,"descending":true,"llm_cluster":false},
      "3": {"node_type":"SummarizeData","node_id":3,"inputs":[2],"question":"q"}}}""")
    val stripped = OnlyRetrieval(p)
    stripped.validate()
    assert(stripped.resultNode == 1 && stripped.nodes.keySet == Set(0, 1))
  }

  test("LlmPlanner builds a documented prompt and parses the LLM's JSON plan") {
    val canned = new LlmClient {
      def generate(prompt: String): String = {
        assert(prompt.contains("QueryDatabase") && prompt.contains("documents"))
        "Here is the plan:\n" + topkPlanJson
      }
    }
    val planner = new LlmPlanner(canned,
      schema = Map("documents" -> Seq("doc_id", "text", "lang", "source")),
      processors = Seq(DefaultPlanValidator))
    val p = planner.plan("top sources among english docs")
    assert(p.nodes.size == 2 && p.query == "top sources among english docs")
    assert(p.node(1).isInstanceOf[QTopK])
  }
}

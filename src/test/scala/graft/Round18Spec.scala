package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.gf

/** Round-18 review-pass pins: each test fails on the pre-fix
  * implementation (ADVICE r17 items + the functions/ sweep). */
/** JVM-static counters: LLM clients are serialized into task closures, so
  * call counts must live on a static object (local[*] = one JVM). */
object Round18Counters {
  val filterPrompts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class Round18Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------- PII

  test("scrubIbans: a following uppercase token does not shield the IBAN") {
    // The greedy candidate pattern absorbs ' NOW'; the merged candidate
    // fails mod-97 — the prefix retry must still redact the real IBAN.
    val cases = Seq(
      ("pay DE89370400440532013000 NOW", "pay [IBAN] NOW"),
      // grouped formatting followed by an uppercase word
      ("ref DE89 3704 0044 0532 0130 00 ASAP", "ref [IBAN] ASAP"),
      // invalid candidate with no valid prefix: untouched
      ("code DE00370400440532013000 NOW", "code DE00370400440532013000 NOW"),
      // the happy path still works
      ("pay DE89370400440532013000 now", "pay [IBAN] now"))
    val out = cases.map(_._1).toDF("t")
      .select(gf.scrubIbans(col("t"))).as[String].collect().toSeq
    assert(out == cases.map(_._2), out)
  }

  // --------------------------------------------------- planner retry loop

  test("LlmPlanner retry: repair prompt carries the failure, exhaustion throws") {
    val good = """{"query": "q", "result_node": 1, "nodes": {
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"t"},
      "1": {"node_type":"Count","node_id":1,"inputs":[0]}}}"""
    // second call must see the repair prompt: previous response + error
    val probe = new graft.llm.LlmClient {
      var seen = Vector.empty[String]
      override def generate(prompt: String): String = {
        seen :+= prompt
        if (seen.size == 1) "no json here at all" else good
      }
    }
    val planner = new graft.plan.LlmPlanner(probe, schema = Map("t" -> Seq("a")))
    val plan = planner.plan("q", maxAttempts = 2)
    assert(plan.resultNode == 1)
    assert(probe.seen.size == 2)
    assert(probe.seen(1).contains("no json here at all") &&
      probe.seen(1).contains("could not be used"), "repair prompt shape")

    // exhaustion: every attempt unusable -> throws, with the real cause
    val hopeless = new graft.llm.FlakyLlmClient(
      Seq.fill(5)("""{"query": "x", "result_node": 0, "nodes": {
        "0": {"node_type":"NopeNode","node_id":0,"inputs":[]}}}"""), good)
    val ex = intercept[IllegalArgumentException] {
      new graft.plan.LlmPlanner(hopeless, schema = Map("t" -> Seq("a")))
        .plan("x", maxAttempts = 3)
    }
    assert(ex.getMessage.contains("3 attempts"), ex.getMessage)
    assert(hopeless.calls == 3)
  }

  // ------------------------------------------- functions/ sweep findings

  test("canonicalizeUrl: a '?' inside the fragment is not a query") {
    val cases = Seq(
      // fragment content must drop WITH the fragment, not resurrect
      ("http://ex.com/p#sec?x=1", "http://ex.com/p"),
      // a real query before the fragment still survives
      ("http://ex.com/p?x=1#frag", "http://ex.com/p?x=1"),
      ("https://www.Ex.com:443/a/?b=2&utm_source=m&a=1#top",
        "https://ex.com/a?a=1&b=2"),
      ("plain text", "plain text"))
    val out = cases.map(_._1).toDF("u")
      .select(gf.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(out == cases.map(_._2), out)
  }

  test("langId: full-string lowercase like the SQL oracle, not per-char") {
    // Turkish dotted capital I: lower() maps U+0130 to 'i' + combining
    // dot (two chars), so these tokens must NOT count as English
    // 'it'/'is'/'in' — Character.toLowerCase per-char would say "en"
    val out = Seq("İT İS İN", "it is in").toDF("t")
      .select(gf.langId(col("t"))).as[String].collect().toSeq
    assert(out == Seq("und", "en"), out)
  }

  test("chunkTokens: newline-only text yields zero chunks, not one junk chunk") {
    val out = Seq("\n\n", "\t \t", "", "one two three").toDF("t")
      .select(gf.chunkTokens(col("t"), 2)).as[Seq[String]].collect().toSeq
    assert(out == Seq(Nil, Nil, Nil, Seq("one two", "three")), out)
  }

  test("repetition top-ngram tie-break is code-point order (oracle collation)") {
    // two bigrams tied at count 2; the emoji gram sorts FIRST in UTF-16
    // code-unit order (surrogate 0xD83D < 0xE000) but LAST in code-point
    // order (U+1F600 > U+E000) — the oracle's ORDER BY picks U+E000's
    // gram, whose words are 1 cp shorter, so top2_chars = 2 x 2 = 4
    val emoji = "😀a"
    val pua = ""
    val text = s"$emoji x $emoji x $pua y $pua y"
    val top2 = Seq(text).toDF("t")
      .select(gf.repetitionStats(col("t")).getField("top2_chars"))
      .as[Long].head()
    assert(top2 == 4L, s"got $top2 (6 = the UTF-16-order winner)")
  }

  test("stopwordRatio: a caller's mixed-case list matches lowercased tokens") {
    val out = Seq("The cat AND dog").toDF("t")
      .select(gf.stopwordRatio(col("t"), Seq("The", "And"))).as[Double].head()
    assert(out == 0.5, s"got $out (0.0 = the unnormalized-list bug)")
  }

  test("lshBandKeys: a short signature fails fast, never reads out of bounds") {
    val sig = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(8)(_.toLong * 31))
    val ex = intercept[IllegalArgumentException] {
      graft.functions.LshBandKeysExpr.compute(sig, 4, 5) // needs 20 hashes
    }
    assert(ex.getMessage.contains(">= 20"), ex.getMessage)
  }

  // ------------------------------------------------ plan/ sweep findings

  test("Dsl range filter survives non-numeric strings under ANSI mode") {
    import org.json4s.jackson.JsonMethods
    val df = Seq(("a", "2"), ("b", "n/a"), ("c", "10")).toDF("id", "version")
    // a plain .cast(\"double\") would THROW SparkNumberFormatException on
    // "n/a"; the TRY cast treats the row as non-matching
    val kept = df.where(graft.plan.Dsl.predicate(
        JsonMethods.parse("""{"range":{"version":{"gte":3}}}""")))
      .select("id").as[String].collect().toSeq
    assert(kept == Seq("c"), kept)
    // empty bounds = no constraint = match-all, not empty.reduce
    val all = df.where(graft.plan.Dsl.predicate(
      JsonMethods.parse("""{"range":{"version":{}}}"""))).count()
    assert(all == 3)
  }

  test("validate() rejects wrong input arity at plan time") {
    val badMath = graft.plan.QPlan.fromJson("""{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"t"},
      "1": {"node_type":"Math","node_id":1,"inputs":[0],"operation":"add"}}}""")
    val ex = intercept[IllegalArgumentException](badMath.validate())
    assert(ex.getMessage.contains("needs 2"), ex.getMessage)
    val badCount = graft.plan.QPlan.fromJson("""{"query":"","result_node":0,"nodes":{
      "0": {"node_type":"Count","node_id":0,"inputs":[]}}}""")
    val ex2 = intercept[IllegalArgumentException](badCount.validate())
    assert(ex2.getMessage.contains("needs 1"), ex2.getMessage)
  }

  test("LimitLlmOperations guards an LLM operator at node id 0") {
    // DAG-valid but unconventionally numbered: the LLM node IS node 0
    val p = graft.plan.QPlan.fromJson("""{"query":"q","result_node":0,"nodes":{
      "0": {"node_type":"LlmFilter","node_id":0,"inputs":[1],
            "field":"properties.lang","question":"english?"},
      "1": {"node_type":"QueryDatabase","node_id":1,"inputs":[],"index":"documents"}}}""")
    p.validate()
    val guarded = graft.plan.LimitLlmOperations(50)(p)
    guarded.validate()
    val limits = guarded.nodes.values.collect { case l: graft.plan.QLimit => l }
    assert(limits.nonEmpty, "the cost guard must be inserted, not crash")
  }

  test("a multi-consumer plan node executes its LLM subtree once") {
    Round18Counters.filterPrompts.set(0)
    val counting = new graft.llm.LlmClient {
      override def generate(prompt: String): String = {
        if (prompt.contains("Rate 0-5"))
          Round18Counters.filterPrompts.incrementAndGet()
        "4"
      }
    }
    val sfDir = "/root/testdata/sf0.001"
    def tables(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    // node 2 (LlmFilter) feeds BOTH Count(3) and SummarizeData(4): two
    // downstream Spark actions — without the shared-subtree checkpoint the
    // per-doc LLM filter would run (and bill) twice
    val p = graft.plan.QPlan.fromJson("""{"query":"q","result_node":4,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
      "1": {"node_type":"Limit","node_id":1,"inputs":[0],"num_records":10},
      "2": {"node_type":"LlmFilter","node_id":2,"inputs":[1],
            "field":"properties.source","question":"good?"},
      "3": {"node_type":"Count","node_id":3,"inputs":[2]},
      "4": {"node_type":"SummarizeData","node_id":4,"inputs":[2,3],
            "question":"how many good docs?"}}}""")
    new graft.plan.QueryExecutor(spark, counting, tables).execute(p)
    val calls = Round18Counters.filterPrompts.get()
    assert(calls == 10, s"LLM filter ran $calls times for 10 docs (20 = double-run)")
  }

  test("KMeanClustering clusters on the named field, not only doc embeddings") {
    val df = Seq(
      ("d1", "t", "tokyo tokyo tokyo"), ("d2", "t", "tokyo tokyo tokyo"),
      ("d3", "t", "rio rio rio rio"), ("d4", "t", "rio rio rio rio"))
      .toDF("doc_id", "text", "city")
    def tables(n: String) = df
    val p = graft.plan.QPlan.fromJson("""{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"t"},
      "1": {"node_type":"KMeanClustering","node_id":1,"inputs":[0],
            "field":"properties.city","new_field":"grp","K":2}}}""")
    val out = new graft.plan.QueryExecutor(spark,
      new graft.llm.FakeLlmClient("echo:64"), tables).execute(p) match {
      case graft.plan.QDocs(ds) => ds.takeAll()
      case other => fail(s"$other")
    }
    val byCity = out.groupBy(_.prop("city").get)
      .map { case (c, ds) => c -> ds.flatMap(_.prop("grp")).distinct }
    assert(byCity.values.forall(_.size == 1), s"same city, same cluster: $byCity")
    assert(byCity.values.flatten.toSet.size == 2,
      s"two cities, two clusters: $byCity")
  }

  // --------------------------------------------- sources/ sweep findings

  test("BulkDirSearchClientFactory fails loudly on an unusable directory") {
    // java.io listing returns null for non-local/mistyped paths; the old
    // code ingested an EMPTY index and reads returned nothing, silently
    val ex = intercept[IllegalArgumentException] {
      graft.sources.BulkDirSearchClientFactory("/no/such/dir", "idx").open()
    }
    assert(ex.getMessage.contains("not listable"), ex.getMessage)
  }

  test("jsonFile rows mode: a file without the rows field surfaces as a marker doc") {
    val dir = java.nio.file.Files.createTempDirectory("jsonrows")
    try {
      java.nio.file.Files.write(dir.resolve("a.json"),
        """{"rows": [{"v": 1}, {"v": 2}]}""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("b.json"),
        """{"other": true}""".getBytes("UTF-8"))
      val docs = graft.sources.DocRead.jsonFile(spark, dir.toString,
        rowsField = Some("rows")).takeAll()
      assert(docs.size == 3, s"b.json must not vanish: ${docs.map(_.docId)}")
      val markers = docs.filter(_.prop("rows_missing").contains("true"))
      assert(markers.size == 1 && markers.head.docId.contains("b.json"),
        s"marker doc expected for b.json: $markers")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("fromDataFrame promotes an array column named 'Embedding' (any case)") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("doc_id", "Embedding")
    val docs = graft.sources.DocRead.fromDataFrame(df, Some("doc_id"), None)
      .takeAll().sortBy(_.docId)
    assert(docs.forall(_.embedding.isDefined),
      "case-insensitive analyzer resolution must extend to the promotion")
    assert(docs.forall(!_.properties.contains("Embedding")),
      "the promoted array must not also stringify into properties")
  }

  // -------------------------------- docset/dedup/ann sweep findings (late r18)

  test("spreadProperties: the doc value wins over an existing element property") {
    // reference spread_properties.py:38-43 assigns unconditionally over
    // element properties (its TODO says element-wins is NOT yet offered)
    import graft.model.{Document, Element}
    val doc = Document.of("d1", properties = Map("title" -> "DocTitle"))
      .copy(elements = Seq(
        Element.text(0, "para", "x", properties = Map("title" -> "ElTitle")),
        Element.text(1, "para", "y")))
    val out = graft.docset.DocSet.of(spark, Seq(doc))
      .spreadProperties(Seq("title")).takeAll().head
    assert(out.elements.forall(_.prop("title").contains("DocTitle")),
      out.elements.map(_.properties).toString)
  }

  test("exactRows/exactRowsKeepBest: null-text rows are kept, not deleted") {
    // pre-fix: the null md5 key grouped (groupBy equates nulls) but never
    // matched the equi-semi-join -> every binary-only row silently vanished
    val df = Seq(("a", "same"), ("b", "same"), ("bin1", null), ("bin2", null))
      .toDF("id", "text")
    val kept = graft.dedup.Dedup.exactRows(df, "id", "text")
      .select("id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "bin1", "bin2"), kept)
    val keptBest = graft.dedup.Dedup.exactRowsKeepBest(df, "id", "text",
        length(col("text")).cast("double"))
      .select("id").as[String].collect().sorted.toSeq
    assert(keptBest == Seq("a", "bin1", "bin2"), keptBest)
    // and the group summary excludes the non-comparable null class
    val groups = graft.dedup.Dedup.exact(df, "id", "text")
    assert(groups.count() == 1, "null texts are not one giant duplicate class")
  }

  test("pqAdcTopK/pqSearch: null codes cannot claim top-k slots") {
    // pre-fix: asc() is nulls-FIRST in Spark, so the un-embedded row ranked
    // ahead of every real distance
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))  // m=1, ksub=2
    val df = Seq(
      ("real1", Seq(0.1, 0.1), Seq(0)),
      ("real2", Seq(0.9, 0.9), Seq(1)),
      ("hole", null, null))
      .toDF("id", "vec", "codes")
      .select(col("id"), col("vec").cast("array<double>").as("vec"),
        col("codes").cast("array<int>").as("codes"))
    val adc = graft.ann.Ann.pqAdcTopK(df, "id", "codes", cb, Seq(0.0, 0.0), 2)
      .select("id").as[String].collect().toSeq
    assert(adc == Seq("real1", "real2"), adc)
    val full = graft.ann.Ann.pqSearch(df, "id", "vec", "codes", cb,
      Seq(0.0, 0.0), k = 2, shortlist = 3)
      .select("id").as[String].collect().toSeq
    assert(full == Seq("real1", "real2"), full)
  }

  test("sampleCentroids/pqTrain tolerate null embedding rows") {
    val df = Seq(("a", Seq(1.0, 0.0)), ("b", Seq(0.0, 1.0)), ("c", null))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<double>").as("vec"))
    val cents = graft.ann.Ann.sampleCentroids(df, "id", "vec", 2)
    assert(cents.length == 2 && cents.forall(_ != null))
    val cbs = graft.ann.Ann.pqTrain(df, "id", "vec", m = 1, ksub = 2, iters = 1)
    assert(cbs.length == 1 && cbs.head.nonEmpty)
  }

  // ------------------------------------------------------------- llm/ sweep

  test("extractRelationships drops relationships with dangling entity hashes") {
    // the reference skips a relationship whose start/end hash doesn't resolve
    // to an extracted entity (extract_graph_relationships.py:72-80)
    val h1 = "a" * 64
    val h2 = "b" * 64
    val ghost = "c" * 64
    val ents = Seq(
      ("d1", "s1", "Company", """{"name":"alpha"}""", h1),
      ("d1", "s1", "Company", """{"name":"beta"}""", h2))
      .toDF("docId", "sectionId", "label", "entityJson", "entityHash")
    val relClient = new graft.llm.LlmClient {
      def generate(p: String): String =
        s"""{"relationships": [
           |  {"type": "ACQUIRED", "start": "$h1", "end": "$h2"},
           |  {"type": "ACQUIRED", "start": "$h1", "end": "$ghost"}]}""".stripMargin
    }
    val docs = graft.docset.DocSet.of(spark, Seq(graft.model.Document.of("d1")))
    val rels = graft.llm.GraphExtraction
      .extractRelationships(docs, relClient, ents, Seq("ACQUIRED")).collect()
    assert(rels.length == 1, rels.toSeq)
    assert(rels.head.getAs[String]("endHash") == h2)
  }

  test("LlmPropertyExtractor: a corrupt stored _schema degrades, not kills") {
    // reference wraps the _schema parse in try/except (extract_schema.py:153)
    val client = new graft.llm.LlmClient {
      def generate(p: String): String = """{"x": "1"}"""
    }
    val d = graft.model.Document.of("d1", text = "hello",
      properties = Map("_schema" -> "{not json at all"))
    val out = new graft.llm.LlmPropertyExtractor(client, "entity", None)
      .extract(Iterator(d)).toSeq
    assert(out == Seq(d)) // passes through un-extracted, task alive
  }

  test("Element.prop treats a null map value as missing, like Document.prop") {
    val e = graft.model.Element.text(0, "Text", "t")
      .copy(properties = Map("k" -> (null: String)))
    assert(e.prop("k").isEmpty)
  }

  test("AsyncLlmClient rejects a non-positive concurrency at construction") {
    val c = new graft.llm.CannedLlmClient("ok")
    intercept[IllegalArgumentException](new graft.llm.AsyncLlmClient(c, 0))
  }

  test("idempotence laws: nfcNormalize, canonicalizeUrl, c4CleanLines, exactRows") {
    // f(f(x)) == f(x) — the replay-safety contract a retried 100 TB stage
    // depends on; checked over the real corpus plus adversarial rows
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val adv = Seq(
      "", "  ", "Ångström é ḟ",
      "HTTP://WWW.Ex.COM:80/a/../b?utm_source=x&b=1#frag",
      "line one\nLine two.\nlorem {", "a.b?x=1&x=2 not a url",
      "Trailing.   \n\n\nOnly punct!.")
      .zipWithIndex.map { case (t, i) => (-(i + 1).toLong, t) }
      .toDF("doc_id", "text")
    val t = base.unionByName(adv)
    val bad = t.select(
        (gf.nfcNormalize(gf.nfcNormalize(col("text"))) <=>
          gf.nfcNormalize(col("text"))).as("nfc"),
        (gf.canonicalizeUrl(gf.canonicalizeUrl(col("text"))) <=>
          gf.canonicalizeUrl(col("text"))).as("url"),
        (gf.c4CleanLines(gf.c4CleanLines(col("text"))) <=>
          gf.c4CleanLines(col("text"))).as("c4"))
      .where(!col("nfc") || !col("url") || !col("c4"))
    assert(bad.isEmpty, bad.collect().take(3).toSeq.toString)
    val d1 = graft.dedup.Dedup.exactRows(t, "doc_id", "text")
    val d2 = graft.dedup.Dedup.exactRows(d1, "doc_id", "text")
    assert(d1.count() == d2.count() &&
      d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty)
  }

  test("Bradley-Terry: transitive dominance orders scores; zero-win stays finite") {
    val pairs = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"), ("a", "c"))
      .toDF("winner", "loser")
    val out = graft.operators.Preference.bradleyTerry(pairs, "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("a") > out("b") && out("b") > out("c"), out.toString)
    assert(out("c") >= 1000L) // the virtual win keeps the all-loss item finite
    // self-pairs and null endpoints are dropped, not scored
    val dirty = Seq(("x", "x"), ("x", null), (null, "y"), ("x", "y"))
      .toDF("winner", "loser")
    val clean = graft.operators.Preference.bradleyTerry(dirty, "winner", "loser")
    assert(clean.count() == 2 &&
      clean.where(col("id") === "x").head().getLong(1) == 1L)
  }

  test("HashedWeightSumExpr: O(1) structural equality still enables CSE") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val child = Literal.create(null, ArrayType(StringType))
    val a = graft.functions.HashedWeightSumExpr(child, Seq(1L, 2L, 3L), 7L)
    val b = graft.functions.HashedWeightSumExpr(child, Seq(1L, 2L, 3L), 7L)
    val c = graft.functions.HashedWeightSumExpr(child, Seq(1L, 2L, 4L), 7L)
    assert(a == b && a.semanticEquals(b), "same model must stay CSE-able")
    assert(a != c, "different weights must not collide")
    assert(a.table.hashCode == b.table.hashCode)
  }
}

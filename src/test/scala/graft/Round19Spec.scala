package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ann.Ann
import graft.operators.{Preference, Sampling}
import graft.plan._
import graft.llm.FakeLlmClient

/** Round-19 pins: the oversize-bucket guard for embeddingCosinePairs /
  * semDedup, the extended pqAdcTopK validity guard (r18 advice), the
  * QueryExecutor cache hardening (refuse fingerprint-less sources, atomic
  * publish), Preference's exact DECIMAL DIV update + storage hygiene, and
  * the retry-safety laws for the sampling family. Each test fails before
  * its round-19 change. */
class Round19Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------ cosine-pairs bucket cap

  test("embeddingCosinePairs: no oversized bucket -> identical to uncapped") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.98f, 0.2f), 1)).toDF("vec_id", "embedding", "label")
    val capped = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
        col("label"), 0.9, maxBucketSize = 2)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
        col("label"), 0.9, maxBucketSize = 0)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // buckets of width 2 are NOT oversized at maxBucketSize=2 (strict >)
    assert(capped == uncapped && capped == Set((0L, 1L), (2L, 3L)))
  }

  test("embeddingCosinePairs: hot bucket sub-splits to exactly the within-split pairs") {
    // 40 near-identical vectors, ONE bucket — the adversarial shape where
    // >=50% of the corpus shares a centroid; cap at 8 -> 5 sub-buckets
    val n = 40; val cap = 8
    val vecs = (0 until n).map(i =>
      (i.toLong, Array(1.0f, 1e-4f * i, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
        col("label"), 0.99, maxBucketSize = cap)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val all = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
        col("label"), 0.99, maxBucketSize = 0)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(all.size == n * (n - 1) / 2)
    // expected = pairs that land in the same xxhash64 sub-bucket (the
    // documented under-count: cross-split pairs are dropped, never wrong
    // ones invented)
    val nsub = math.ceil(n.toDouble / cap).toLong
    val sub = vecs.select(col("vec_id"),
        pmod(xxhash64(col("vec_id")), lit(nsub)).as("s"))
      .as[(Long, Long)].collect().toMap
    val expected = all.filter { case (a, b) => sub(a) == sub(b) }
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(got.nonEmpty && got.size < all.size)
  }

  test("semDedup: hot cluster with cap keeps a superset of uncapped survivors") {
    val n = 30
    val vecs = (0 until n).map(i =>
      (i.toLong, Array(1.0f, 1e-4f * i))).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0))
    val uncapped = Dedup.semDedup(vecs, "vec_id", "embedding", centroids, 0.99,
        maxBucketSize = 0)
      .select("vec_id").as[Long].collect().toSet
    val capped = Dedup.semDedup(vecs, "vec_id", "embedding", centroids, 0.99,
        maxBucketSize = 6)
      .select("vec_id").as[Long].collect().toSet
    // greedy min-id: uncapped keeps only the global min; capped keeps the
    // min of each sub-split (the global min is the min of its own split)
    assert(uncapped == Set(0L))
    assert(capped.contains(0L) && uncapped.subsetOf(capped))
    assert(capped.size > 1 && capped.size < n)
  }

  test("EditJoin hot-segment cap: bounded candidates, exact + selective pairs survive") {
    import graft.operators.EditJoin
    // 30 identical strings (every segment key hot), one near-miss of the
    // hot template, and 2 selective near-dups. Contract after r20: the
    // opt-in cap prunes only near-miss candidates whose EVERY witnessing
    // segment is hot (102's 'aaaa' witness — the documented, WARN-logged
    // under-count); exact-duplicate pairs of the hot group are re-admitted
    // through the equality pre-join, and selective pairs come through
    // their own segments.
    val l = ((0L until 30L).map(i => (i, "aaaabbbb")) ++
      Seq((100L, "unique-x"), (101L, "uniq"), (102L, "aaaabbbx"))).toDF("id", "s")
    val r = ((200L until 230L).map(i => (i, "aaaabbbb")) ++
      Seq((300L, "unique-y"), (301L, "uniqz"))).toDF("id", "s")
    val hotExact = (for { a <- 0L until 30L; b <- 200L until 230L } yield (a, b)).toSet
    val capped = EditJoin.join(l, r, "id", "s", k = 1, maxSegFreq = 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == hotExact ++ Set((100L, 300L), (101L, 301L)), s"got ${capped.size}")
    val uncapped = EditJoin.join(l, r, "id", "s", k = 1, maxSegFreq = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // uncapped adds 102's 30 near-miss pairs against the hot group
    assert(uncapped == capped ++ (200L until 230L).map((102L, _)).toSet,
      s"got ${uncapped.size}")
  }

  // ------------------------------------------------ pqAdcTopK validity guard

  test("pqAdcTopK: short codes and null-entry codes rank last, not as slot-0 garbage") {
    val m = 2; val subDim = 2; val ksub = 4
    val rnd = new scala.util.Random(7)
    val codebooks = Array.fill(m)(Array.fill(ksub)(Array.fill(subDim)(rnd.nextGaussian())))
    val vecs = (0 until 20).map { i =>
      val v = (0 until m).flatMap(s => codebooks(s)(rnd.nextInt(ksub))).toArray
      (i.toLong, v.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val coded = vecs.withColumn("codes", Ann.pqEncode(col("embedding"), codebooks))
    val ct = coded.schema("codes").dataType.sql
    val malformed = Seq(100L, 101L, 102L).toDF("vec_id")
      .withColumn("codes",
        when(col("vec_id") === 100L, expr(s"CAST(NULL AS $ct)"))
          .when(col("vec_id") === 101L, expr(s"CAST(array(0) AS $ct)"))        // too short
          .otherwise(expr(s"CAST(array(0, NULL) AS $ct)")))                   // null entry
    val df = coded.select("vec_id", "codes").unionByName(malformed)
    val q = Array.fill(m * subDim)(rnd.nextGaussian()).toSeq
    val top = Ann.pqAdcTopK(df, "vec_id", "codes", codebooks, q, 23).collect()
    val (invalid, valid) = top.partition(r => r.getLong(0) >= 100L)
    assert(invalid.length == 3 && invalid.forall(_.isNullAt(1)),
      "malformed codes must get a true null adc_dist")
    assert(valid.length == 20 && valid.forall(!_.isNullAt(1)))
    // nulls-last: every malformed row sorts after every real distance
    assert(top.takeRight(3).forall(_.getLong(0) >= 100L))
    // and they never claim a top-k slot when k <= the valid count
    val top20 = Ann.pqAdcTopK(df, "vec_id", "codes", codebooks, q, 20)
      .select("vec_id").as[Long].collect()
    assert(top20.forall(_ < 100L))
  }

  // ------------------------------------------------ QueryExecutor cache

  private val sfDir = "/root/testdata/sf0.001"

  test("executor refuses to cache when the source has no file fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("r19cache").toString
    try {
      // localCheckpoint severs the file lineage: inputFiles is empty, the
      // table is "in-memory/view-backed" — it can change without any file
      // rename, so the cache must not be used in either direction
      val mem = spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(20).localCheckpoint()
      assert(mem.inputFiles.isEmpty)
      val p = QPlan.fromJson("""{"query":"q","result_node":1,"nodes":{
        "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
        "1": {"node_type":"LlmFilter","node_id":1,"inputs":[0],
              "field":"properties.source","question":"good source?"}}}""")
      def ex() = new QueryExecutor(spark, new FakeLlmClient("score"),
        _ => mem.toDF(), Some(dir))
      val e1 = ex()
      val QDocs(first) = e1.execute(p): @unchecked
      val rows1 = first.count()
      val e2 = ex()
      val QDocs(second) = e2.execute(p): @unchecked
      assert(second.count() == rows1)
      // neither run touched the cache: no write, no hit, empty dir
      assert(e1.cacheMisses == 0 && e1.cacheHits == 0)
      assert(e2.cacheMisses == 0 && e2.cacheHits == 0)
      assert(Option(new java.io.File(dir).listFiles()).forall(_.isEmpty))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("cacheEpoch opts a fingerprint-less source back into caching, keyed by epoch") {
    val dir = java.nio.file.Files.createTempDirectory("r19epoch").toString
    try {
      val mem = spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(20).localCheckpoint()
      val p = QPlan.fromJson("""{"query":"q","result_node":1,"nodes":{
        "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"documents"},
        "1": {"node_type":"LlmFilter","node_id":1,"inputs":[0],
              "field":"properties.source","question":"good source?"}}}""")
      def ex(epoch: String) = new QueryExecutor(spark, new FakeLlmClient("score"),
        _ => mem.toDF(), Some(dir), cacheEpoch = Some(epoch))
      val e1 = ex("v1"); e1.execute(p)
      assert(e1.cacheMisses == 1 && e1.cacheHits == 0)
      val e2 = ex("v1"); e2.execute(p)
      assert(e2.cacheHits == 1 && e2.cacheMisses == 0, "same epoch must hit")
      // bumping the epoch invalidates — the caller's signal that the
      // view's data changed
      val e3 = ex("v2"); e3.execute(p)
      assert(e3.cacheMisses == 1 && e3.cacheHits == 0, "new epoch must miss")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("atomicPublish: concurrent loser discards its temp; no-winner failure throws") {
    val root = java.nio.file.Files.createTempDirectory("r19pub")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def mk(rel: String, withMarker: Boolean): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root.toString, rel)
      fs.mkdirs(p)
      if (withMarker) fs.create(new org.apache.hadoop.fs.Path(p, "_SUCCESS")).close()
      p
    }
    // 1. clean publish: tmp renamed onto missing dst
    val t1 = mk("a.tmp-1", withMarker = true)
    val d1 = new org.apache.hadoop.fs.Path(root.toString, "a")
    QueryExecutor.atomicPublish(fs, t1, d1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(d1, "_SUCCESS")) && !fs.exists(t1))
    // 2. losing publish: dst already has a completed winner -> temp deleted,
    //    winner untouched, no error
    val t2 = mk("a.tmp-2", withMarker = true)
    QueryExecutor.atomicPublish(fs, t2, d1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(d1, "_SUCCESS")) && !fs.exists(t2))
    // 3. failed rename with NO winner present is a real error
    val ghost = new org.apache.hadoop.fs.Path(root.toString, "missing.tmp-3")
    val d3 = new org.apache.hadoop.fs.Path(root.toString, "never")
    assertThrows[java.io.IOException](QueryExecutor.atomicPublish(fs, ghost, d3))
  }

  // ------------------------------------------------ Bradley-Terry exactness

  /** Driver-side BigInt replica of the MM update — the exactness oracle. */
  private def btReplica(pairsList: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val Num = BigInt("1000000000000"); val U = BigInt(1000000)
    val edges = pairsList.flatMap { case (w, l) => Seq((w, w, l), (l, w, l)) }
    val byId = edges.groupBy(_._1)
    val ids = byId.keys.toSeq
    val nwins = ids.map(id => id -> byId(id).count(e => e._2 == id)).toMap
    var p = ids.map(_ -> U).toMap
    for (_ <- 0 until iters) {
      val den = ids.map(id => id -> byId(id).map { case (_, a, b) =>
        Num / (p(a) + p(b)) }.sum).toMap
      p = ids.map { id =>
        val q = (BigInt(nwins(id)) + 1) * Num / (den(id) + Num / (p(id) + U))
        id -> q.max(BigInt(1000)).min(BigInt(1000000000))
      }.toMap
    }
    p.map { case (k, v) => k -> v.toLong }
  }

  test("bradleyTerry matches the BigInt replica past the 2^52 double-floor regime") {
    // one item with 6000 wins: the update numerator (6001e12) is beyond
    // 2^52 — the regime the round-18 double-division floor documented as
    // out-of-contract; the DECIMAL DIV must stay bit-exact
    val n = 6000
    val pairs = (0 until n).map(i => ("A", s"B$i"))
    val got = Preference.bradleyTerry(pairs.toDF("w", "l"), "w", "l", iters = 2)
      .select(col("id"), col("score_micros")).as[(String, Long)].collect().toMap
    val want = btReplica(pairs, iters = 2)
    assert(got("A") == want("A"), s"A: got ${got("A")}, want ${want("A")}")
    assert(got("B0") == want("B0") && got("B17") == want("B17"))
    assert(got.size == n + 1)
  }

  test("the score-update expression survives the long-multiply overflow regime") {
    // (n_wins+1)*1e12 overflows BIGINT at n_wins >= 9223372; the DECIMAL
    // numerator must keep the quotient exact (pinned against BigInt) —
    // a one-row frame exercises the exact expression shape used by
    // bradleyTerry without materializing 9M pair rows
    val Num = 1000000000000L; val U = 1000000L
    val row = Seq((20000000L, 4650000000000000L, 1000000L))
      .toDF("n_wins", "den", "p_prev")
    val got = row.select(
      expr(s"CAST(n_wins + 1 AS DECIMAL(24,0)) * $Num" +
        s" DIV (den + ($Num DIV (p_prev + $U)))").as("q"))
      .as[Long].head()
    val want = ((BigInt(20000000L) + 1) * BigInt(Num) /
      (BigInt(4650000000000000L) + BigInt(Num) / BigInt(1000000L + U))).toLong
    assert(got == want, s"got $got, want $want")
  }

  test("bradleyTerry unpersists its working frames (only checkpoints remain)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("w", "l")
    val out = Preference.bradleyTerry(pairs, "w", "l", iters = 2)
    assert(out.count() == 3)
    // isLocallyCheckpointed is private[rdd] at the Scala level but public
    // in bytecode — reflection distinguishes the legitimate checkpoint
    // blocks (kept until GC) from a leaked plain persist
    val isCkpt = classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
    val leaked = sc.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
      .values.filterNot(r => isCkpt.invoke(r).asInstanceOf[Boolean])
    assert(leaked.isEmpty,
      s"non-checkpoint RDDs left persisted: ${leaked.map(_.toString)}")
  }

  // ------------------------------------------------ sampling retry-safety laws

  test("sampling family law: output is a pure function of keys, not partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val fractions = Map("en" -> 0.5, "de" -> 0.25)
    val budgets = Map("en" -> 4000L, "de" -> 2000L)
    val samplers: Seq[(String, DataFrame => DataFrame)] = Seq(
      "stratifiedByHash" -> (d => Sampling.stratifiedByHash(d, "doc_id", "lang", fractions, "s1")),
      "byWeight" -> (d => Sampling.byWeight(d, "doc_id",
        least(col("n_chars").cast("double") / 500.0, lit(1.0)), "s2")),
      "capPerGroup" -> (d => Sampling.capPerGroup(d, "doc_id", "source", 5, "s3")),
      "temperatureMixture" -> (d => Sampling.temperatureMixture(d, "doc_id", "lang", 30, 2, "s4")),
      "tokenBudgetMixture" -> (d => Sampling.tokenBudgetMixture(d, "doc_id", "lang",
        col("n_chars"), budgets, "s5")),
      "groupSplit" -> (d => Sampling.groupSplit(d, "doc_id", "source", "s6")),
      "kFold" -> (d => Sampling.kFold(d, "doc_id", 5, "s7").select("doc_id", "fold")),
      "epochMixture" -> (d => Sampling.epochMixture(d, "doc_id", "lang",
        col("n_chars"), Map("en" -> 2000000L, "de" -> 120000L), "s8")
        .select(col("doc_id"))))
    for ((name, f) <- samplers) {
      // identical selected sets under 1/7/32 input partitions — per-row
      // salted hashing means a task RETRY (re-execution over ANY row
      // distribution) reproduces the same decisions; rand()/partition-index
      // dependence would diverge here
      val results = Seq(1, 7, 32).map(n =>
        f(docs.repartition(n)).select("doc_id").as[Long].collect().sorted.toSeq)
      assert(results(0).nonEmpty, s"$name selected nothing")
      assert(results(0) == results(1) && results(1) == results(2),
        s"$name output depends on partitioning: sizes ${results.map(_.size)}")
      // and re-execution of the same stage is a fixpoint
      val again = f(docs.repartition(7)).select("doc_id").as[Long].collect().sorted.toSeq
      assert(again == results(1), s"$name not stable across re-execution")
    }
  }

  test("roundHalfUp: midpoint-exact, overflow-proof, SQL-registered") {
    GraftSqlFunctions.register(spark)
    import graft.functions.gf
    // 0.5118375's nearest double reads back as the exact 7-decimal midpoint
    // (the q_quality_score row-1388 shape): Spark's round() rounds the
    // SHORTEST repr half-up to 0.511838, while the double's true value sits
    // just below the midpoint — the multiply-path (DuckDB, and this
    // function) floors to 0.511837. The contract is ENGINE AGREEMENT: the
    // result must equal the same IEEE ops run driver-side, and must differ
    // from Spark's round() on exactly this input (proving the gate bug is
    // pinned)
    val df = Seq(0.5118375, 9301059586166.8049, -0.0000005, 2.5e18)
      .toDF("x")
    val got = df.select(gf.roundHalfUp(col("x"), 6).as("r")).as[Double].collect()
    assert(got(0) == math.floor(0.5118375 * 1e6 + 0.5) / 1e6)
    assert(got(0) == 0.511837)
    val sparkRound = df.limit(1).select(round(col("x"), 6)).as[Double].head()
    assert(sparkRound == 0.511838, "Spark round() changed behavior — revisit the sweep")
    // the q_moments magnitude: Spark floor() would clamp x*1e6 at 2^63
    assert(math.abs(got(1) - 9301059586166.8049) < 1e-3 &&
      got(1) != 9223372036854.775807)
    assert(got(3) == 2.5e18) // beyond 2^53: already integral, passes through
    // SQL surface agrees with the Column API
    df.createOrReplaceTempView("r19_round")
    val viaSql = spark.sql(
      "SELECT gf_round_half_up(x, 6) AS r FROM r19_round").as[Double].collect()
    assert(viaSql.toSeq == got.toSeq)
  }

  test("epochMixture: exact copy counts, budget-proportional mass, config-bug guard") {
    import graft.functions.gf
    // 4 strata rows with known token mass: 'a' has 100 tokens total and a
    // 250-token budget -> 2.5 epochs: every row appears >= 2 times, the
    // hash-selected half appears 3 times; 'b' (no budget) is dropped
    val df = (0L until 40L).map(i => (i, if (i < 20) "a" else "b", 5L))
      .toDF("id", "s", "tok")
    val out = Sampling.epochMixture(df, "id", "s", col("tok"),
      Map("a" -> 250L), "se")
    val byId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(byId.keySet == (0L until 20L).toSet, "stratum b must be dropped")
    assert(byId.values.forall(c => c == 2L || c == 3L))
    // the extra copy goes to exactly the rows whose salted bucket < 5000
    val bucket = pmod(gf.polyFingerprint(
      concat(col("id").cast("string"), lit(":se:"), col("id").cast("string"))), lit(10000L))
    val expectExtra = df.where(col("s") === "a" && bucket < 5000)
      .select("id").as[Long].collect().toSet
    assert(byId.filter(_._2 == 3L).keySet == expectExtra)
    // epoch index is a dense 0..copies-1 per id
    val epochs = out.where(col("id") === byId.keys.head)
      .select("epoch").as[Long].collect().sorted.toSeq
    assert(epochs == (0L until byId(byId.keys.head)).toSeq)
    // a budget 1000x the mass is a config bug, not a mixture
    assertThrows[IllegalArgumentException](
      Sampling.epochMixture(df, "id", "s", col("tok"),
        Map("a" -> 200000000L), "se", maxEpochs = 1000))
  }

  test("sampleByHash (DocSet) obeys the same partition-independence law") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = Seq(1, 7, 32).map { n =>
      graft.sources.DocRead.fromDataFrame(docs.repartition(n), Some("doc_id"), Some("text"))
        .sampleByHash(0.3, "doc_id", "split1")
        .toDF.select(col("docId")).as[String].collect().sorted.toSeq
    }
    assert(sets(0).nonEmpty && sets(0) == sets(1) && sets(1) == sets(2))
  }
}

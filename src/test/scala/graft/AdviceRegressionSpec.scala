package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._

import graft.plan._
import graft.llm.FakeLlmClient

/** Regression pins for the round-4 advisor findings — each of these was a
  * live defect once; the suite keeps the fixes from regressing. */
class AdviceRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("is_date range filter treats malformed data values as non-matching, not a crash") {
    // ANSI mode makes to_timestamp THROW on a bad string; the filter must
    // instead drop the row (try_to_timestamp on the DATA side)
    val docs = Seq(
      (1L, "2026-01-15"), (2L, "not-a-date"), (3L, "2026-03-01"), (4L, "")
    ).toDF("doc_id", "when")
    val tables: String => DataFrame = _ => docs
    val exec = new QueryExecutor(spark, new FakeLlmClient("echo:64"), tables)
    val plan = QPlan.fromJson("""{"query":"","result_node":1,"nodes":{
      "0": {"node_type":"QueryDatabase","node_id":0,"inputs":[],"index":"t"},
      "1": {"node_type":"BasicFilter","node_id":1,"inputs":[0],
            "field":"properties.when","range_filter":true,
            "start":"2026-01-01","end":"2026-02-01","is_date":true}}}""")
    val got = exec.execute(plan) match {
      case QDocs(ds) => ds.toDF.select(col("docId")).as[String].collect().toSet
      case other => fail(s"expected docs, got $other")
    }
    assert(got == Set("1"))
  }

  test("bool DSL with an unknown clause throws instead of silently widening") {
    val q = JObject(List("bool" -> JObject(List(
      "must" -> JObject(List("match_all" -> JObject(Nil))),
      "minimum_should_match" -> JInt(1)))))
    val e = intercept[IllegalArgumentException](Dsl.predicate(q))
    assert(e.getMessage.contains("bool clause"))
  }

  test("fromDataFrame keeps JSON fidelity for complex columns, excludes binary and embedding") {
    val df = Seq(
      (1L, Seq("a", "b"), Array[Byte](1, 2), Array(0.5f, 0.25f), "t")
    ).toDF("id", "tags", "blob", "embedding", "text")
    val docs = graft.sources.DocRead.fromDataFrame(df, Some("id"), Some("text"))
    val row = docs.toDF.select(
      element_at(col("properties"), "tags"),
      element_at(col("properties"), "blob"),
      element_at(col("properties"), "embedding"),
      col("embedding")).collect()(0)
    assert(row.getString(0) == """["a","b"]""", "array -> JSON, not bracketed rendering")
    assert(row.isNullAt(1), "binary columns stay out of the string map")
    assert(row.isNullAt(2), "embedding rides the typed column, not the map")
    assert(row.getSeq[Float](3) == Seq(0.5f, 0.25f))
  }

  test("sketchDedup keeps dissimilar docs even when a band key collides") {
    // identical first band (same leading shingles), dissimilar overall:
    // dropping on the band key alone would delete doc 2
    import graft.docset.DocSet
    import graft.model.Document
    val shinglesA = Array.tabulate(16)(i => i.toLong)
    val shinglesB = Array.tabulate(16)(i => if (i < 4) i.toLong else 1000L + i)
    val ds = spark.createDataset(Seq(
      Document.of("1").copy(shingles = Some(shinglesA)),
      Document.of("2").copy(shingles = Some(shinglesB))))(DocSet.docEnc)
    val kept = DocSet.wrap(ds).sketchDedup(bands = 4, threshold = 0.4)
      .toDF.select("docId").as[String].collect().toSet
    assert(kept == Set("1", "2"))
  }

  test("kTruss at k=2 retains triangle-free edges (round-13 advice)") {
    import graft.operators.Triangles
    // path 1-2-3 has zero triangles; a 2-truss keeps every edge
    // (support >= 0), but the old semi-join against the support frame
    // dropped them because zero-support edges never appear in it
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val out = Triangles.kTruss(edges, "s", "d", k = 2, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 0L), (2L, 3L, 0L)), s"got $out")
  }

  test("asofForward plans the incremental running frame, not unbounded-following (round-13 advice)") {
    import graft.operators.AsofJoin
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 150L, 7L)).toDF("k", "t", "rid")
    val plan = AsofJoin.asofForward(left, right, "k", "t")
      .queryExecution.executedPlan.toString.toLowerCase
    // UnboundedFollowingWindowFunctionFrame re-aggregates the partition
    // suffix per row — O(k^2) per key group; the fix rides the O(k)
    // running frame in both directions
    assert(!plan.contains("unboundedfollowing"), s"plan still has a following frame:\n$plan")
    assert(plan.contains("unboundedpreceding"), "expected the running frame")
  }

  test("IntervalJoin buckets endpoints beyond 2^53 exactly (round-13 advice)") {
    import graft.operators.IntervalJoin
    // 2^60 + small offsets: floor(double/width) loses these to the 2^53
    // mantissa and could misbucket; integer floor-multiple buckets don't
    val base = 1L << 60
    val l = Seq((10L, base + 1L, base + 5L)).toDF("lid", "ls", "le")
    val r = Seq((100L, base + 5L, base + 9L), (101L, base + 6L, base + 9L))
      .toDF("rid", "rs", "re")
    val out = IntervalJoin.overlap(l, r, "ls", "le", "rs", "re", width = 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 100L)), s"got $out")
    // negative axis too: floor semantics, not truncate-toward-zero
    val ln = Seq((20L, -7L, -5L)).toDF("lid", "ls", "le")
    val rn = Seq((200L, -5L, -1L), (201L, -4L, -1L)).toDF("rid", "rs", "re")
    val outN = IntervalJoin.overlap(ln, rn, "ls", "le", "rs", "re", width = 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(outN == Set((20L, 200L)), s"got $outN")
  }

  test("t-closeness count products ride decimal(38,0): any int64 count survives the cast") {
    import graft.operators.Privacy
    // decimal(18,0) loses counts above ~1e18 (null, or ANSI throw) — in a
    // privacy release a silent null is a disclosure hazard. CountDec must
    // carry every int64 count losslessly; the narrow cast demonstrably
    // does not.
    assert(Privacy.CountDec == "decimal(38,0)")
    val big = Seq(Long.MaxValue).toDF("c")
    val r = big.select(
      col("c").cast(Privacy.CountDec).cast("string").as("wide"),
      expr("try_cast(c AS decimal(18,0))").as("narrow")).head()
    assert(r.getString(0) == Long.MaxValue.toString, "wide cast is lossless")
    assert(r.isNullAt(1), "the old 18-digit cast silently nulls")
    // and the EMD math still runs exact end-to-end on a live frame
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 2), ("b", 1))
      .toDF("qi", "s")
    val rep = graft.operators.Privacy
      .tClosenessReport(df, Seq(col("qi")), col("s"), tPpm = 500000L)
      .select(col("qi0"), col("emd_num").cast("long"), col("emd_den").cast("long"),
        col("pass")).collect()
      .map(r2 => (r2.getString(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))).toSet
    // global p = (3/6, 3/6); class a = (2/3, 1/3): EMD = |2*6-3*3|/((2-1)*3*6) = 3/18
    assert(rep == Set(("a", 3L, 18L, 1L), ("b", 3L, 18L, 1L)))
  }

  test("Bm25.scoreMany folds contributions in term order — bit-for-bit deterministic") {
    // a plain sum() accumulates in partition arrival order; the fold must
    // instead equal the driver-side left-fold over SORTED terms exactly
    // (no rounding), for any input partitioning
    val data = Seq(
      (0L, "spark spark engine words"),
      (1L, "engine other words spark"),
      (2L, "nothing here"),
      (3L, "words words spark engine alpha"))
    val qts = Seq((10L, "spark"), (10L, "engine"), (10L, "words"),
      (11L, "alpha"), (11L, "spark"))
    val k1 = 1.2; val b = 0.75
    // driver replica of the per-term contribution, folded in term order
    val toks = data.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = data.size.toDouble
    val sumdl = toks.values.map(_.size).sum.toDouble
    val avgdl = sumdl / n
    def contrib(docId: Long, term: String): Option[Double] = {
      val tf = toks(docId).count(_ == term).toDouble
      if (tf == 0) None
      else {
        val dfT = toks.values.count(_.contains(term)).toDouble
        val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
        val dl = toks(docId).size.toDouble
        Some(idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
      }
    }
    val expected = (for {
      q <- qts.map(_._1).distinct
      d <- data.map(_._1)
      terms = qts.filter(_._1 == q).map(_._2).sorted
      cs = terms.flatMap(contrib(d, _))
      if cs.nonEmpty
    } yield (q, d) -> cs.foldLeft(0.0)(_ + _)).toMap
    for (parts <- Seq(1, 3, 7)) {
      val docs = data.toDF("doc_id", "text").repartition(parts)
      val terms = qts.toDF("query_id", "term")
      val got = graft.operators.Bm25.scoreMany(docs, "doc_id", "text", terms)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == expected, s"exact fold mismatch at $parts partitions")
    }
  }

  test("kAnonymize releases qualifying null-QI groups in the suppression path (round-13 advice)") {
    import graft.operators.Privacy
    // coarsest level still fails k=3 overall (the "x" group is a
    // singleton), so the suppression path runs; the null-valued group has
    // 3 rows and must be RELEASED, not silently suppressed by a
    // non-null-safe join
    val df = Seq[(Option[String], String)](
      (None, "p"), (None, "p"), (None, "p"), (Some("x"), "p"))
      .toDF("qi0", "p")
    val out = Privacy.kAnonymize(df, Seq("lvl" -> col("qi0")), Seq(col("p")), k = 3)
    assert(out.count() == 3L, "the 3-row null-QI group must survive")
    assert(out.where(col("qi").isNull).count() == 3L)
  }
}

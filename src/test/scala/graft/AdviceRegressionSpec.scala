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
}

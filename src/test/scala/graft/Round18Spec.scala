package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.gf

/** Round-18 review-pass pins: each test fails on the pre-fix
  * implementation (ADVICE r17 items + the functions/ sweep). */
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
}

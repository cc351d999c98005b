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
}

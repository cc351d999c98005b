package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RetrievalEval

/** Evaluation metrics (mirrors reference evaluation/metrics semantics). */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("retrieval metrics: recall/precision@k, MRR, hit rate") {
    // q1: relevant {a,b}, retrieved [a(1), x(2), b(3)]; q2: relevant {c},
    // retrieved [x(1), y(2)]; q3: relevant {d}, never retrieved
    val retrieved = Seq(
      ("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3),
      ("q2", "x", 1), ("q2", "y", 2)).toDF("query_id", "doc_id", "rank")
    val relevant = Seq(("q1", "a"), ("q1", "b"), ("q2", "c"), ("q3", "d"))
      .toDF("query_id", "doc_id")

    val per = RetrievalEval.retrievalMetrics(retrieved, relevant, k = 3)
      .collect().map(r => r.getAs[String]("query_id") ->
        (r.getAs[Double]("recall_at_3"), r.getAs[Double]("reciprocal_rank"))).toMap
    assert(per("q1") == (1.0, 1.0))       // both found, first at rank 1
    assert(per("q2") == (0.0, 0.0))
    assert(per("q3") == (0.0, 0.0))       // no retrievals at all

    val sum = RetrievalEval.summarize(
      RetrievalEval.retrievalMetrics(retrieved, relevant, 3), 3).collect().head
    assert(math.abs(sum.getAs[Double]("mean_recall_at_3") - 1.0 / 3) < 1e-9)
    assert(math.abs(sum.getAs[Double]("mrr") - 1.0 / 3) < 1e-9)
    assert(math.abs(sum.getAs[Double]("hit_rate_at_3") - 1.0 / 3) < 1e-9)
  }

  test("answer token-overlap F1") {
    val answers = Seq(
      ("q1", "the cat sat", "the cat sat"),     // perfect
      ("q2", "a dog ran", "the cat sat"),       // zero overlap
      ("q3", "the cat", "the cat sat")          // partial: p=1, r=2/3
    ).toDF("query_id", "generated", "reference")
    val f1 = RetrievalEval.answerF1(answers).collect()
      .map(r => r.getAs[String]("query_id") -> r.getAs[Double]("f1")).toMap
    assert(f1("q1") == 1.0)
    assert(f1("q2") == 0.0)
    assert(math.abs(f1("q3") - 0.8) < 1e-9)
  }

  test("ROUGE-2: clipped n-gram overlap; short texts have zero n-grams") {
    import spark.implicits._
    val answers = Seq(
      ("q1", "the cat the cat", "the cat sat"), // clip: "the cat" counts once
      ("q2", "identical bigram text", "identical bigram text"),
      ("q3", "word", "word")) // 1 token -> no bigrams -> all zero
      .toDF("query_id", "generated", "reference")
    val out = RetrievalEval.rougeN(answers, 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("q1") == ((0.333333, 0.5, 0.4)))
    assert(out("q2") == ((1.0, 1.0, 1.0)))
    assert(out("q3") == ((0.0, 0.0, 0.0)))
  }

  test("nDCG@k: perfect ranking 1.0, gap-ranked discounted, no hits 0.0") {
    import spark.implicits._
    val retrieved = Seq(
      ("q1", "a", 1), ("q1", "b", 2),              // perfect: both relevant up front
      ("q2", "a", 1), ("q2", "x", 2), ("q2", "b", 3), // hit at 1 and 3
      ("q3", "x", 1), ("q3", "y", 2))              // no hits
      .toDF("query_id", "doc_id", "rank")
    val relevant = Seq(("q1", "a"), ("q1", "b"), ("q2", "a"), ("q2", "b"),
      ("q3", "a")).toDF("query_id", "doc_id")
    val out = RetrievalEval.ndcg(retrieved, relevant, k = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("q1") == 1.0)
    // dcg = 1 + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3)
    assert(math.abs(out("q2") - 1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2)))) < 1e-6)
    assert(out("q3") == 0.0)
  }

  test("nDCG@k: a retrieved-but-unjudged query scores 0.0, not dropped") {
    import spark.implicits._
    // q2 never appears in the judgments: averaging must see it as 0.0
    val retrieved = Seq(("q1", "a", 1), ("q2", "x", 1), ("q2", "y", 2))
      .toDF("query_id", "doc_id", "rank")
    val relevant = Seq(("q1", "a")).toDF("query_id", "doc_id")
    val out = RetrievalEval.ndcg(retrieved, relevant, k = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("q1", "q2"), "unjudged query must not vanish")
    assert(out("q1") == 1.0 && out("q2") == 0.0)
  }

  test("chrF: hand-computed char n-gram F on a small pair; strict short-text zeros") {
    import spark.implicits._
    val answers = Seq(
      ("exact", "abcdef gh", "abcdef gh"),   // identical after strip: chrf 1
      ("short", "ab", "ab"),                  // 2 chars: orders 3..6 are 0
      ("none", "aaaa", "bbbb"))               // zero overlap at every order
      .toDF("query_id", "generated", "reference")
    val out = RetrievalEval.chrF(answers).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("exact") == 1.0)
    // "ab": f1 = f2 = 1, f3..f6 = 0 -> mean 2/6
    assert(out("short") == 0.333333)
    assert(out("none") == 0.0)
  }

  test("bleuStats: clipped precisions, sqrt-chain core, brevity fields") {
    import spark.implicits._
    val answers = Seq(
      ("exact", "a b c d e", "a b c d e"),        // perfect: all p=1, core 1
      ("short", "the cat sat", "the cat sat"),     // 3 toks: p4=0 -> core 0
      ("part", "a b c d", "a b c x"),              // p=3/4, 2/3, 1/2, 0
      ("clip", "a a a a", "a b c d"),              // p1 clipped to 1/4
      ("empty", "", "a b"))                        // zero cand grams
      .toDF("query_id", "generated", "reference")
    val out = RetrievalEval.bleuStats(answers).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getBoolean(8))).toMap
    assert(out("exact") == ((5L, 5L, 1.0, 1.0, 1.0, 1.0, 1.0, true)))
    assert(out("short")._7 == 0.0 && out("short")._6 == 0.0) // p4=0, core 0
    val p = out("part")
    assert(p._3 == 0.75 && p._4 == 0.666667 && p._5 == 0.5 && p._6 == 0.0)
    assert(out("clip")._3 == 0.25 && out("clip")._8) // cand_len 4 >= ref_len 4
    assert(out("empty") == ((0L, 2L, 0.0, 0.0, 0.0, 0.0, 0.0, false)))
  }
}

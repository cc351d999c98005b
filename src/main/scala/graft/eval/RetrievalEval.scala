package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Retrieval / QA evaluation metrics (reference:
 * lib/sycamore/sycamore/evaluation/{evaluate.py:56-190, pipeline.py:15,
 * metrics/} — EvaluationDataPoint docs scored for retrieval recall and
 * answer correctness).
 *
 * Spark-first shape: inputs are plain DataFrames —
 *   retrieved(query_id, doc_id, rank)   one row per retrieved doc, rank >= 1
 *   relevant(query_id, doc_id)          the ground-truth set
 * — and every metric is one join + one aggregation, so evaluation runs at
 * corpus scale (the reference iterates documents on the driver).
 */
object RetrievalEval {

  /** Per-query hit/recall/precision@k + reciprocal rank, one row per query
    * WITH at least one relevance judgment (recall is undefined without one);
    * roll up with [[summarize]]. Note the denominator differs from [[ndcg]],
    * which also scores judgment-less retrieved queries as 0. */
  def retrievalMetrics(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val rel = relevant.select(col("query_id"), col("doc_id")).distinct()
    val relCounts = rel.groupBy("query_id").agg(count(lit(1)).as("n_relevant"))
    val topk = retrieved.where(col("rank") <= k)
    val hits = topk.join(rel, Seq("query_id", "doc_id"), "inner")
    val perQueryHits = hits.groupBy("query_id").agg(
      count(lit(1)).as("n_hits"),
      min(col("rank")).as("first_hit_rank"))
    relCounts.join(perQueryHits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_relevant"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          least(col("n_relevant"), lit(k.toLong))).as(s"recall_at_$k"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as(s"precision_at_$k"),
        when(col("first_hit_rank").isNotNull,
          lit(1.0) / col("first_hit_rank")).otherwise(lit(0.0)).as("reciprocal_rank"))
  }

  /** Micro-averaged scalar summary of retrievalMetrics. */
  def summarize(perQuery: DataFrame, k: Int): DataFrame =
    perQuery.agg(
      avg(col(s"recall_at_$k")).as(s"mean_recall_at_$k"),
      avg(col(s"precision_at_$k")).as(s"mean_precision_at_$k"),
      avg(col("reciprocal_rank")).as("mrr"),
      avg(when(col("n_hits") > 0, 1.0).otherwise(0.0)).as(s"hit_rate_at_$k"))

  /** Per-query nDCG@k (binary relevance): DCG = sum 1/log2(rank+1) over
    * relevant retrieved docs, normalized by the ideal DCG for
    * min(n_relevant, k) front-loaded hits. log2 runs only on small
    * integer-derived values, and each query's sum folds over its own
    * bounded rank list, so results are deterministic.
    *
    * Output is TOTAL over queries seen in EITHER input, like mrr/hitRate:
    * a query retrieved but with zero judged-relevant docs scores 0.0
    * (nDCG is undefined there; 0.0 keeps `avg(ndcg_at_k)` honest — silently
    * dropping such queries would overestimate the mean). */
  def ndcg(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"ndcg needs k >= 1, got $k")
    val rel = relevant.select(col("query_id"), col("doc_id")).distinct()
    val gain = lit(1.0) / log2(col("rank").cast("double") + 1.0)
    val dcg = retrieved.where(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(sum(gain).as("dcg"))
    // ideal DCG depends only on min(n_relevant, k): precompute the k
    // partial sums once and look them up — no per-row log2 re-summation
    val idcgTable = (1 to k).scanLeft(0.0)((acc, r) => acc + 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val idcg = element_at(lit(idcgTable.toArray),
      (least(col("n_relevant"), lit(k.toLong)) + 1).cast("int"))
    val qids = retrieved.select(col("query_id")).distinct()
      .unionByName(rel.select(col("query_id"))).distinct()
    qids
      .join(rel.groupBy("query_id").agg(count(lit(1)).as("n_relevant")),
        Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        when(col("n_relevant").isNull, lit(0.0))
          .otherwise(graft.functions.gf.roundHalfUp(coalesce(col("dcg"), lit(0.0)) / idcg, 6))
          .as(s"ndcg_at_$k"))
  }

  /** The micro-unit DCG weight table: round(1e6 / log2(rank+1)) for
    * rank = 1..k. Computed ONCE on the driver and literalized into both
    * the Spark plan and any SQL oracle — so the only log anywhere runs in
    * one place, and all distributed math is exact int64 (libm log2 is
    * engine-specific; summing doubles cross-engine cannot hash-match). */
  def dcgWeightsMicro(k: Int): Array[Long] =
    Array.tabulate(k)(r => Math.round(1e6 / (Math.log(r + 2.0) / Math.log(2.0))))

  /** nDCG@k with integer micro-unit weights — same semantics as [[ndcg]]
    * up to the 1e-6 weight quantization, but cross-engine EXACT: DCG and
    * ideal-DCG are int64 sums over the broadcast weight table, and only
    * the final ratio is floating (one deterministic division). */
  def ndcgMicro(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"ndcgMicro needs k >= 1, got $k")
    val w = dcgWeightsMicro(k)
    val rel = relevant.select(col("query_id"), col("doc_id")).distinct()
    val gain = element_at(lit(w), col("rank").cast("int"))
    val dcg = retrieved.where(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(sum(gain).as("dcg_micro"))
    val idcgTable = w.scanLeft(0L)(_ + _)
    val idcg = element_at(lit(idcgTable),
      (least(col("n_relevant"), lit(k.toLong)) + 1).cast("int"))
    val qids = retrieved.select(col("query_id")).distinct()
      .unionByName(rel.select(col("query_id"))).distinct()
    qids
      .join(rel.groupBy("query_id").agg(count(lit(1)).as("n_relevant")),
        Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        when(col("n_relevant").isNull, lit(0.0))
          .otherwise(graft.functions.gf.roundHalfUp(coalesce(col("dcg_micro"), lit(0L)).cast("double") / idcg, 6))
          .as(s"ndcg_at_$k"))
  }

  /** ROUGE-N recall/precision/F1 (n-gram overlap with CLIPPED counts — a
    * candidate n-gram matches at most as many times as it appears in the
    * reference, the standard Lin 2004 definition) between generated and
    * reference texts. Pure column math over the shared shingle expression:
    * one pass, no UDFs. Input: answers(query_id, generated, reference). */
  def rougeN(answers: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"rougeN needs n >= 1, got $n")
    import graft.functions.gf
    // strict ROUGE-N: texts shorter than n tokens have ZERO n-grams
    // (wordShingles' short-text fallback would fabricate one)
    def grams(c: Column): Column =
      when(length(trim(c)) === 0 || size(gf.tokens(c)) < n,
        array().cast("array<string>"))
        .otherwise(gf.wordShingles(c, n))
    // materialize the gram arrays behind a PROJECTION boundary before the
    // lambda math: a HOF lambda body re-evaluates captured subexpressions
    // on EVERY invocation, so referencing the raw shingle chain inside
    // aggregate/filter re-tokenized the full text once per distinct gram
    // (measured 9.7s on the gate; attribute references are free)
    val pre = answers.select(col("query_id"),
      grams(col("generated")).as("_g"), grams(col("reference")).as("_r"))
    val g = col("_g")
    val r = col("_r")
    // clipped overlap = sum over distinct grams of min(count_g, count_r) —
    // one codegen'd hash pass (the HOF aggregate/filter formulation was
    // O(|distinct|·|g|) interpreted per row; see ClippedOverlapExpr)
    val overlap = gf.clippedOverlap(g, r).cast("double")
    val prec = when(size(g) > 0, overlap / size(g)).otherwise(lit(0.0))
    val rec = when(size(r) > 0, overlap / size(r)).otherwise(lit(0.0))
    pre.select(col("query_id"),
      graft.functions.gf.roundHalfUp(prec, 6).as(s"rouge${n}_precision"),
      graft.functions.gf.roundHalfUp(rec, 6).as(s"rouge${n}_recall"),
      graft.functions.gf.roundHalfUp(when(prec + rec > 0, lit(2.0) * prec * rec / (prec + rec))
        .otherwise(lit(0.0)), 6).as(s"rouge${n}_f1"))
  }

  /** Token-overlap F1 between generated and reference answers — the
    * deterministic core of answer-correctness scoring (the reference's
    * LLM-judge flavor plugs in as an llmMap over the same rows).
    * Input: answers(query_id, generated, reference). */
  def answerF1(answers: DataFrame): DataFrame = {
    def toksOf(c: Column): Column = array_distinct(split(trim(lower(c)), "\\s+"))
    // projection boundary: same rationale as rougeN above
    val pre = answers.select(col("query_id"),
      toksOf(col("generated")).as("_g"), toksOf(col("reference")).as("_r"))
    val g = col("_g")
    val r = col("_r")
    val overlap = size(array_intersect(g, r)).cast("double")
    val prec = when(size(g) > 0, overlap / size(g)).otherwise(lit(0.0))
    val rec = when(size(r) > 0, overlap / size(r)).otherwise(lit(0.0))
    pre.select(
      col("query_id"),
      prec.as("precision"),
      rec.as("recall"),
      when(prec + rec > 0, lit(2.0) * prec * rec / (prec + rec))
        .otherwise(lit(0.0)).as("f1"))
  }

  /** chrF (Popović 2015): character n-gram F-score, β=2, orders 1..maxN
    * over the whitespace-stripped lowercased texts. Per-order P/R come
    * from the codegen'd clipped overlap; each F_n = 5·P·R/(4·P + R) (0
    * when an order has no n-grams on either side — strict, documented);
    * the final score is the arithmetic mean over orders written as ONE
    * literal left-associated chain, so the float addition ORDER is fixed
    * by the expression tree and the oracle replays it bit-for-bit (an
    * aggregate mean would not be order-stable). */
  def chrF(answers: DataFrame, maxN: Int = 6): DataFrame = {
    require(maxN >= 1 && maxN <= 9, s"need 1 <= maxN <= 9, got $maxN")
    import graft.functions.gf
    def stripped(c: Column): Column =
      regexp_replace(lower(c), "\\s+", "")
    // whitespace stripped/lowered once; ChrfStatsExpr does the rest in a
    // single row-local pass
    // ALL per-order stats in one row-local expression pass — 12 shingle
    // arrays + 6 overlap hash passes collapse into ChrfStatsExpr
    val pre = answers.select(col("query_id"),
      gf.chrfStats(stripped(col("generated")), stripped(col("reference")), maxN)
        .as("_st"))
    val fs = (1 to maxN).map { n =>
      val o = element_at(col("_st"), 3 * (n - 1) + 1).cast("double")
      val ng = element_at(col("_st"), 3 * (n - 1) + 2)
      val nr = element_at(col("_st"), 3 * (n - 1) + 3)
      val p = when(ng > 0, o / ng).otherwise(lit(0.0))
      val r = when(nr > 0, o / nr).otherwise(lit(0.0))
      when(lit(4.0) * p + r > 0, lit(5.0) * p * r / (lit(4.0) * p + r))
        .otherwise(lit(0.0)).as(s"_f$n")
    }
    val staged = pre.select(Seq(col("query_id")) ++ fs: _*)
    val mean = (1 to maxN).map(n => col(s"_f$n")).reduce(_ + _) / maxN
    staged.select(col("query_id"), graft.functions.gf.roundHalfUp(mean, 6).as("chrf"))
  }

  /** BLEU-4 statistics (Papineni et al. 2002): per-order clipped n-gram
    * precisions p1..p4 and the geometric-mean core computed as an IEEE
    * sqrt chain — sqrt(sqrt(p1·p2·p3·p4)) — NEVER libm pow/exp, so every
    * value is bit-identical across engines (memory: round only ratios of
    * exact ints; sqrt is correctly rounded everywhere, pow is not).
    * The brevity penalty's exp(1 − r/c) is NOT folded in for the same
    * reason; cand_len/ref_len ride along as exact ints so callers apply
    * BP themselves (brevity_ok=true ⟺ BP=1, the common case).
    * Zero candidate n-grams at any order, or zero overlap, give core 0
    * (unsmoothed BLEU). Input: answers(query_id, generated, reference). */
  def bleuStats(answers: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 9, s"need 1 <= maxN <= 9, got $maxN")
    import graft.functions.gf
    def cleanToks(c: Column): Column =
      filter(gf.tokens(c), x => length(x) > 0)
    // one tokenize per side behind a projection boundary, then every
    // order's shingles derive from the ARRAY (no per-order re-splitting)
    val tokd = answers.select(col("query_id"),
      cleanToks(col("generated")).as("_gt"), cleanToks(col("reference")).as("_rt"))
    def grams(arr: Column, n: Int): Column =
      when(size(arr) < n, array().cast("array<string>"))
        .otherwise(gf.tokenShingles(arr, n))
    val withGrams = tokd.select(Seq(col("query_id"),
      size(col("_gt")).cast("long").as("cand_len"),
      size(col("_rt")).cast("long").as("ref_len")) ++
      (1 to maxN).flatMap { n => Seq(
        grams(col("_gt"), n).as(s"_g$n"), grams(col("_rt"), n).as(s"_r$n"))
      }: _*)
    val ps = (1 to maxN).map { n =>
      val c = size(col(s"_g$n"))
      when(c > 0, gf.clippedOverlap(col(s"_g$n"), col(s"_r$n")).cast("double") / c)
        .otherwise(lit(0.0)).as(s"_p$n")
    }
    val staged = withGrams.select(Seq(col("query_id"), col("cand_len"),
      col("ref_len")) ++ ps: _*)
    // geometric mean for maxN a power of two is a pure sqrt chain; other
    // orders would need pow — restrict core emission to 1/2/4/8
    val core: Column =
      if (Seq(1, 2, 4, 8).contains(maxN)) {
        val prod = (1 to maxN).map(n => col(s"_p$n")).reduce(_ * _)
        Iterator.iterate(prod)(sqrt).drop(
          (math.log(maxN) / math.log(2)).round.toInt).next()
      } else lit(null).cast("double")
    staged.select(Seq(col("query_id"), col("cand_len"), col("ref_len")) ++
      (1 to maxN).map(n => graft.functions.gf.roundHalfUp(col(s"_p$n"), 6).as(s"p$n")) ++ Seq(
        graft.functions.gf.roundHalfUp(core, 6).as("bleu_core"),
        (col("cand_len") >= col("ref_len")).as("brevity_ok")): _*)
  }
}

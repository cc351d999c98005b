package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gf

/**
 * TF-IDF top terms per document — keyword extraction over a corpus, the
 * relational sibling of `DocSet.termFrequency` (reference:
 * transforms/term_frequency.py computes per-doc counts only; corpus-level
 * IDF weighting is part of our training-data surface, SURVEY §2.12).
 *
 * Scale shape: ONE corpus scan — the (doc, term) tf aggregate is
 * localCheckpoint'd once (the shared-subtree idiom from Packing/Basket:
 * without it, column pruning specializes the tf subtree per consumer and
 * the scan+explode runs once per branch), then document frequency is
 * `tf.groupBy(term).count()` joined back on term, then the per-doc top-k
 * window (which Spark compiles to partial+final WindowGroupLimit — no
 * full per-doc sort materializes more than k+ rows).
 *
 * df is deliberately an AGGREGATE + JOIN, not a term-partitioned window
 * count (an earlier formulation): a window routes every (doc, term) row
 * of a term into ONE task and no optimizer can split it — for a
 * stop-word-like term present in every document that task is
 * corpus-sized at 100 TB. The aggregate collapses the hot term
 * per-partition (map-side combine) so the df table is one tiny row per
 * term, and the join back is a shuffle AQE's OptimizeSkewedJoin CAN
 * split, because join semantics (unlike window semantics) allow
 * replicating the small side's matching rows across sub-partitions.
 * Same shuffle count as the window form; no single-task funnel.
 * Shuffles key on (doc_id, term) / term / doc_id; corpus text never
 * rides a shuffle key. The doc count N joins in as a broadcast
 * single-row aggregate over a zero-column scan (row count from parquet
 * metadata).
 *
 * IDF here is the UNLOGGED Sparck Jones form (N+1)/(df+1): division and
 * multiplication are exactly-rounded IEEE ops, so scores are bit-identical
 * across engines — `ln` is libm-dependent and can flip near-tie ranks
 * between Spark and an oracle. With k-th-vs-(k+1)-th ties broken by term,
 * the top-k set is fully deterministic.
 */
object TfIdf {

  /** Per-document top-k terms by tf*idf. Output: (id, term, tf, df, score),
    * ranked per doc by (score desc, term asc), rank <= k. */
  def topTerms(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val toks = df.select(col(id).as("_id"), explode(gf.tokens(col(text))).as("term"))
      .where(col("term") =!= "")
    // lazy (eager = false): materializes on the FIRST action over the
    // result, not at construction time — building the query must not run
    // Spark jobs (library laziness contract); after that first action
    // every consumer branch reads the cached two-column blocks
    val tf = toks.groupBy(col("_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    // tf has one row per (doc, term): counting tf rows per term IS df.
    // Aggregate + join, NOT a window — see the scaladoc's skew rationale.
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val scored = tf
      .join(dfc, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("_n") + 1).cast("double") / (col("df") + 1).cast("double"))
    val w = Window.partitionBy(col("_id")).orderBy(desc("score"), asc("term"))
    scored.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .select(col("_id").as(id), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
  }
}

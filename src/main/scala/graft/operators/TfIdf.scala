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
 * Scale shape: two hash aggregations — (doc, term) term frequencies, then
 * per-term document frequencies — joined back on term, then a per-doc
 * window top-k. Shuffles key on (doc_id, term) / term / doc_id; the corpus
 * text itself never rides a shuffle key. The doc count N joins in as a
 * broadcast single-row aggregate (no driver action, the plan stays lazy).
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
    val tf = toks.groupBy(col("_id"), col("term")).agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term): df = row count per term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfreq, "term")
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

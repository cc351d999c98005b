package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gf

/**
 * Dataset-card statistics: the per-source summary table every
 * training-data pipeline publishes alongside a corpus (docs, token and
 * char volume, length distribution, quality mass) — the engine-native
 * version of the reference's driver-side `DocSetStats`-style summaries,
 * computed as ONE aggregation pass.
 *
 * Scale shape: one scan, one partial+final aggregate keyed on the group
 * columns — token counts and quality scores are codegen'd row-local
 * expressions, so nothing but (group, partial sums) ever shuffles.
 * Determinism: every output is either an integer sum (order-free) or a
 * round(6) ratio of two exactly-equal integer sums — no float
 * accumulation crosses a shuffle, so a DuckDB oracle hash-matches (same
 * rules as UnigramLm/Stats).
 */
object CorpusStats {

  /** One row per distinct value tuple of `groups`: doc/token/char volume,
    * mean token count, short-doc fraction (< minTokens). */
  def bySource(df: DataFrame, text: String, groups: Seq[String],
               minTokens: Int = 10): DataFrame = {
    require(groups.nonEmpty, "corpus stats need at least one group column")
    val ntok = gf.tokenCount(col(text)).cast("long")
    df.select(groups.map(col) :+ ntok.as("_nt") :+
        length(col(text)).cast("long").as("_nc"): _*)
      .groupBy(groups.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        sum(col("_nc")).as("n_chars"),
        round(sum(col("_nt")).cast("double") / count(lit(1)), 6).as("mean_tokens"),
        round(sum(when(col("_nt") < minTokens, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("short_frac"))
      .orderBy(groups.map(col): _*)
  }
}

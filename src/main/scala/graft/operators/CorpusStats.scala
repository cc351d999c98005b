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
        graft.functions.gf.roundHalfUp(sum(col("_nt")).cast("double") / count(lit(1)), 6).as("mean_tokens"),
        graft.functions.gf.roundHalfUp(sum(when(col("_nt") < minTokens, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("short_frac"))
      .orderBy(groups.map(col): _*)
  }

  /**
   * Per-document lexical diversity — the MassiveText/Gopher-family quality
   * signals a unigram length check can't see: type-token ratio (template
   * spam repeats a tiny vocabulary), hapax fraction (fluent prose keeps
   * coining one-off words; keyword stuffing doesn't), and mean word length
   * (Gopher keeps documents with mean word length in [3, 10]).
   *
   * Scale shape: explode to (doc, token) -> ONE (doc, token) count
   * aggregate (map-side combine collapses repeated tokens per partition)
   * -> ONE per-doc aggregate. Both keyed aggregates, never a window — a
   * pathological million-token doc spreads across partitions in phase 1
   * and only its (token, count) rows meet in phase 2. Outputs are integer
   * counts and round(6) ratios of exactly-equal integers, so the DuckDB
   * oracle hash-matches.
   */
  def lexicalDiversity(df: DataFrame, id: String, text: String): DataFrame = {
    val perToken = df
      .select(col(id), explode(gf.tokens(col(text))).as("_t"))
      .where(col("_t") =!= "")
      .groupBy(col(id), col("_t"))
      .agg(count(lit(1)).as("_c"))
    perToken
      .groupBy(col(id))
      .agg(
        sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("_c") * length(col("_t"))).as("_chars"))
      .select(col(id), col("n_tokens"), col("n_types"),
        graft.functions.gf.roundHalfUp(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        graft.functions.gf.roundHalfUp(col("n_hapax").cast("double") / col("n_types"), 6).as("hapax_frac"),
        graft.functions.gf.roundHalfUp(col("_chars").cast("double") / col("n_tokens"), 6).as("mean_word_len"))
      .orderBy(col(id))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
 * High Quality Monolingual Datasets from Web Crawl Data", §4.3): rank each
 * document's LM perplexity WITHIN its language and split into nBuckets
 * equal-mass buckets — bucket 0 = head (most fluent), last = tail. CCNet
 * curates by keeping head+middle per language; a global threshold would
 * over-filter low-resource languages, which is the whole point of the
 * per-language stratification.
 *
 * Engine composition (no new primitives — the point is the shape):
 * UnigramLm's integer bits-of-surprise as the perplexity proxy (exact
 * cross-engine, see UnigramLm's scaladoc on why not a real log), ranked by
 * Calibration.percentileBy's stratified two-phase prefix rank — a
 * per-language Window would funnel each language through ONE task at
 * 100 TB; the two-phase rank splits big languages across partitions.
 * Documents with no tokens rank last within their language (null score →
 * +inf key), deterministically.
 */
object CcnetBuckets {

  def buckets(df: DataFrame, id: String, text: String, lang: String,
              nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val scored = UnigramLm.score(df, id, text)
      .join(df.select(col(id), col(lang)), Seq(id))
      .withColumn("_k", coalesce(col("mean_bits"), lit(1e9)))
    Calibration.percentileBy(scored, lang, col("_k"), id)
      .withColumn("bucket",
        least(floor(col("pctl") * nBuckets), lit(nBuckets - 1)).cast("long"))
      .select(col(id), col(lang), col("n_toks"), col("mean_bits"),
        col("pctl"), col("bucket"))
  }
}

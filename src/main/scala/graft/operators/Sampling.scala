package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gf

/**
 * Deterministic stratified sampling — the reproducible counterpart of
 * Spark's `stat.sampleBy` (which is RNG-seeded per partition): keep/drop is
 * a pure function of (key, salt), so the same rows are selected regardless
 * of partitioning, engine, task retries, or cluster size, and disjoint
 * salts give disjoint train/holdout splits. Per-stratum fractions rebalance
 * skewed corpora (e.g. downsample the dominant language) in ONE scan with
 * no shuffle at all — the filter is row-local.
 */
object Sampling {

  /** Keep each stratum at its own fraction; strata absent from `fractions`
    * are dropped (same contract as sampleBy). Fractions are quantized to
    * 1/10000 (the hash-bucket resolution). */
  def stratifiedByHash(df: DataFrame, key: String, stratum: String,
                       fractions: Map[String, Double], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    val k = col(key).cast("string")
    val bucket = pmod(
      gf.polyFingerprint(concat(k, lit(":"), lit(salt), lit(":"), k)), lit(10000L))
    val fracs = map(fractions.toSeq.sortBy(_._1)
      .flatMap { case (s, f) => Seq(lit(s), lit((f * 10000).toLong)) }: _*)
    df.where(bucket < element_at(fracs, col(stratum)))
  }
}

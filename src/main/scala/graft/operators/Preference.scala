package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise-preference scoring for RLHF-style data curation: given
 * (winner, loser) comparison pairs — human preference labels, model
 * win-rates, A/B outcomes — estimate a per-item strength score via the
 * Bradley-Terry model's MM update (Hunter 2004, "MM algorithms for
 * generalized Bradley-Terry models"):
 *
 *   p_i <- W_i / Σ_{pairs (i,j)} 1 / (p_i + p_j)
 *
 * No reference counterpart (the reference has no preference-data surface);
 * this is an engine addition in the training-data family next to
 * hard-negative mining and the quality classifiers.
 *
 * Engine shape: the update is pure joins + aggregates on the item key —
 * the PageRank shape — so T iterations are T shuffles on (id), with no
 * driver-side state and no per-item loops. Scales with pairs, not items².
 *
 * INTEGER-EXACT by construction (the repo's micro-quantization
 * discipline): scores live in micros, every division is a floor division
 * of positive longs, and each iteration clamps scores to [1e3, 1e9] —
 * which both anchors the MM iterate (together with one virtual win AND
 * loss against a fixed phantom at 1e6 micros, the standard regularizer
 * that keeps zero-win items finite) and keeps every quotient in the range
 * where floor(double-division) equals exact integer division (error
 * ≤ q·2⁻⁵², fractional gap ≥ 1/denominator; q·den ≤ ~1e15 < 2⁵²), so a
 * DuckDB `//` replay matches bit-for-bit.
 */
object Preference {

  private val Unit6 = 1000000L          // 1.0 in micros
  private val Num = 1000000000000L      // 1e12 contribution numerator
  private val PMin = 1000L
  private val PMax = 1000000000L

  /** Per-item Bradley-Terry strengths from (winner, loser) pairs.
    * Output: (id string, n_wins, n_pairs, score_micros), id-ordered. */
  def bradleyTerry(pairs: DataFrame, winner: String, loser: String,
                   iters: Int = 3): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p0 = pairs
      .select(col(winner).cast("string").as("w"), col(loser).cast("string").as("l"))
      .where(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
    // participation edges: each pair feeds BOTH endpoints' denominator
    val edges = p0.select(col("w").as("id"), col("w").as("a"), col("l").as("b"))
      .unionAll(p0.select(col("l").as("id"), col("w").as("a"), col("l").as("b")))
      .persist(lvl)
    val base = edges.groupBy(col("id"))
      .agg(sum(when(col("id") === col("a"), 1L).otherwise(0L)).as("n_wins"),
        count(lit(1)).as("n_pairs"))
      .persist(lvl)

    var scores = base.select(col("id"), lit(Unit6).as("p"))
    for (_ <- 0 until iters) {
      val den = edges
        .join(scores.select(col("id").as("a"), col("p").as("pa")), Seq("a"))
        .join(scores.select(col("id").as("b"), col("p").as("pb")), Seq("b"))
        .groupBy(col("id"))
        .agg(sum(floor(lit(Num) / (col("pa") + col("pb")))).as("den"))
      // each round references the previous scores THREE times (both join
      // sides of den + p_prev) — without a per-round checkpoint the plan
      // tree grows 3^iters and re-executes every prior round per reference
      // (the PageRank pattern, PageRank.scala:28)
      scores = base
        .join(den, Seq("id"))
        .join(scores.select(col("id"), col("p").as("p_prev")), Seq("id"))
        .select(col("id"),
          least(greatest(
            floor(((col("n_wins") + lit(1L)) * lit(Num)) /
              (col("den") + floor(lit(Num) / (col("p_prev") + lit(Unit6))))),
            lit(PMin)), lit(PMax)).as("p"))
        .localCheckpoint(false)
    }
    base.join(scores, Seq("id"))
      .select(col("id"), col("n_wins"), col("n_pairs"),
        col("p").cast("long").as("score_micros"))
      .orderBy(col("id"))
  }
}

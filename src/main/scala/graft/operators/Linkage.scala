package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969,
 * "A Theory for Record Linkage"): candidate pairs are scored by summing,
 * per compared field, log2(m/u) when the field agrees and
 * log2((1-m)/(1-u)) when it disagrees — m = P(agree | same entity),
 * u = P(agree | different entities) — then classified as match /
 * possible / nonmatch against two thresholds. The decision model that
 * sits on top of the blocking + similarity-join family (Blocking,
 * EditJoin, FuzzyJoin, JaroWinklerExpr).
 *
 * Cross-engine exactness: the log-weights are quantized to MILLI-BITS at
 * the driver (the DSIR micro-nat pattern) — each field contributes one of
 * two int64 literals chosen by its agreement boolean, so the pair score
 * is pure integer addition; no engine ever evaluates a log. Scoring is a
 * per-row codegen projection over the candidate-pair frame — map-only,
 * embarrassingly parallel; the pair frame itself comes from a blocking
 * join, never all-pairs.
 */
object Linkage {

  /** One compared field: an agreement predicate over the pair frame plus
    * its m/u probabilities (0 < u < m < 1 for a discriminating field). */
  final case class Field(name: String, agree: Column, m: Double, u: Double)

  /** Milli-bit agreement/disagreement weights for a field — driver-side
    * by design, so both engines consume the same integer literals. */
  def milliBits(m: Double, u: Double): (Long, Long) = {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m/u must be in (0,1), got $m/$u")
    val log2 = math.log(2.0)
    (math.round(math.log(m / u) / log2 * 1000.0),
      math.round(math.log((1.0 - m) / (1.0 - u)) / log2 * 1000.0))
  }

  /** Adds `weight_mb` (total milli-bit score) and `decision`
    * ('match' when weight >= upper, 'nonmatch' when weight <= lower,
    * 'possible' between) to the candidate-pair frame. */
  def fellegiSunter(pairs: DataFrame, fields: Seq[Field],
                    upperMb: Long, lowerMb: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one compared field")
    require(lowerMb <= upperMb, "lower threshold must not exceed upper")
    val weight = fields.map { f =>
      val (wa, wd) = milliBits(f.m, f.u)
      // three-valued on purpose: a NULL agreement (field missing on either
      // side) is NOT a disagreement — it contributes no evidence (weight 0),
      // per the standard Fellegi-Sunter treatment of missing comparisons
      when(f.agree, lit(wa)).when(!f.agree, lit(wd)).otherwise(lit(0L))
    }.reduce(_ + _)
    pairs
      .withColumn("weight_mb", weight)
      .withColumn("decision",
        when(col("weight_mb") >= upperMb, lit("match"))
          .when(col("weight_mb") <= lowerMb, lit("nonmatch"))
          .otherwise(lit("possible")))
  }

  /** m/u estimates from a LABELED pair sample (label = same entity):
    * m = P(agree | label), u = P(agree | !label), Laplace-smoothed so no
    * probability collapses to 0/1. One aggregation pass over the sample;
    * the result is a driver-side table (fields are few by nature) feeding
    * [[fellegiSunter]] literals. */
  def estimateMU(labeled: DataFrame, label: Column,
                 agrees: Seq[(String, Column)]): Map[String, (Double, Double)] = {
    require(agrees.nonEmpty, "need at least one agreement column")
    val aggs = agrees.flatMap { case (n, a) => Seq(
      sum(when(label && a, 1L).otherwise(0L)).as(s"_am_$n"),
      sum(when(label, 1L).otherwise(0L)).as(s"_m_$n"),
      sum(when(!label && a, 1L).otherwise(0L)).as(s"_au_$n"),
      sum(when(!label, 1L).otherwise(0L)).as(s"_u_$n"))
    }
    val r = labeled.agg(aggs.head, aggs.tail: _*).head()
    agrees.map { case (n, _) =>
      val am = r.getAs[Long](s"_am_$n"); val mTot = r.getAs[Long](s"_m_$n")
      val au = r.getAs[Long](s"_au_$n"); val uTot = r.getAs[Long](s"_u_$n")
      n -> ((am + 1.0) / (mTot + 2.0), (au + 1.0) / (uTot + 2.0))
    }.toMap
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{gf, MisraGriesAgg}

/**
 * Exact corpus heavy hitters by the standard two-pass sketch-then-verify
 * shape:
 *
 *  pass 1 — a Misra-Gries sketch (capacity >= 1/thresholdFrac) aggregates
 *    to ONE bounded candidate list; only m-entry sketches ride the partial
 *    aggregation tree, never token rows. The sketch provably contains
 *    every item with frequency > N/(capacity+1) >= thresholdFrac * N.
 *  pass 2 — exact counts for the candidates only (broadcast semi-join),
 *    then the threshold filter discards the sketch's false positives.
 *
 * Net: EXACT heavy hitters with two corpus scans and no full-frequency
 * shuffle — at 100 TB, a plain groupBy(token) shuffles billions of distinct
 * keys to find the dozen that matter; this shuffles a few hundred.
 */
object HeavyHitters {

  /** Misra-Gries candidate aggregate as a Column (array<string>). */
  def misraGries(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())

  /**
   * Tokens appearing in at least `thresholdFrac` of all token positions of
   * `text` across the corpus. Returns (token, cnt), exact. `capacity`
   * defaults to the smallest size that guarantees no false negatives
   * (ceil(1/thresholdFrac)); raise it to cut pass-2 false positives.
   *
   * Exactly TWO corpus scans: pass 1 computes the sketch AND the total
   * token count in one aggregate, materialized as ONE row on the driver —
   * a bounded-by-construction collect (<= capacity strings + a long, the
   * same class of bounded bootstrap as the ANN centroid samples); pass 2
   * recounts only tokens in the candidate set, probed via InSet (a
   * codegen'd hash-set literal — no join, no broadcast plumbing, O(1) per
   * token). An earlier explode + semi-join formulation consumed the sketch
   * subtree twice and column pruning re-ran the corpus aggregate per
   * consumer: three scans.
   */
  def topTokens(df: DataFrame, text: String, thresholdFrac: Double,
                capacity: Int = 0): DataFrame = {
    require(thresholdFrac > 0 && thresholdFrac <= 1, "thresholdFrac in (0, 1]")
    val cap = if (capacity > 0) capacity else math.ceil(1.0 / thresholdFrac).toInt
    val toks = df.select(explode(gf.tokens(col(text))).as("token"))
      .where(col("token") =!= "")
    val row = toks.agg(misraGries(col("token"), cap).as("_cands"),
      count(lit(1)).as("_total")).head()
    val cands = row.getSeq[String](0)
    val total = row.getLong(1)
    if (cands.isEmpty) return toks.limit(0)
      .select(col("token"), lit(0L).as("cnt")).where(lit(false))
    toks.where(col("token").isin(cands: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt").cast("double") >= lit(total).cast("double") * thresholdFrac)
      .select(col("token"), col("cnt"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of (point-in-time) joins: each left row picks the latest right row
 * with the same key and right.time <= left.time (backward — "join against
 * the state as of then"), or the earliest right row with right.time >=
 * left.time (forward — "the next event after"). With `tolerance`, matches
 * farther than the given distance (in the time column's own units, cast
 * to long) are nulled out — pandas `merge_asof(direction=, tolerance=)`
 * parity.
 *
 * Spark has no native ASOF join; the naive range-join formulation
 * (l JOIN r ON key AND r.t <= l.t, then argmax per left row) explodes to
 * O(|matches|) intermediate rows before pruning. This is the scalable
 * union-window form instead: tag both sides, union, and take
 * `last(right_payload, ignoreNulls)` over a (key)-partitioned window
 * ordered by (time, side) — ONE shuffle on the key, one sort, output
 * linear in |L| + |R|. Right rows order before left rows at equal time, so
 * the match is <= (inclusive); the forward variant mirrors by ordering the
 * SAME running (unboundedPreceding, currentRow) frame DESCENDING by
 * (time, tie) — `first(...)` over an unboundedFollowing frame would make
 * Spark re-aggregate the partition suffix per row (O(k^2) per key group;
 * UnboundedFollowingWindowFunctionFrame has no incremental path), whereas
 * the running frame is O(k) in both directions. Exact-time ties among
 * right rows are broken by the extreme payload struct (largest for
 * backward, smallest for forward — deterministic, documented).
 *
 * Output: every left column, plus each non-key right column as
 * `<prefix><name>` (null when no right row matches).
 */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String, time: String,
                   prefix: String = "asof_",
                   tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, time, prefix, tolerance, backward = true)

  /** Earliest right row with right.time >= left.time (same key). */
  def asofForward(left: DataFrame, right: DataFrame, key: String, time: String,
                  prefix: String = "asof_",
                  tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, time, prefix, tolerance, backward = false)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       time: String, prefix: String, tolerance: Option[Long],
                       backward: Boolean): DataFrame = {
    val rightOther = right.columns.filterNot(_ == key).toSeq
    require(rightOther.contains(time) || tolerance.isEmpty,
      s"tolerance needs the right time column '$time' in the right frame")
    val lp = struct(left.columns.map(col).toSeq: _*)
    val rp = struct(rightOther.map(col): _*)
    val lType = left.select(lp.as("_l")).schema("_l").dataType
    val rType = right.select(rp.as("_r")).schema("_r").dataType
    // side order makes the equal-time right row fall INSIDE the running
    // frame: in both directions the frame ends at the left row, so right
    // rows sort first at equal time (side asc with right=0 < left=1)
    val (lSide, rSide) = (1, 0)
    val lDf = left.select(col(key).as("_k"), col(time).as("_t"),
      lit(lSide).as("_side"), lit(null).cast(rType).as("_r"), lp.as("_l"))
    val rDf = right.select(col(key).as("_k"), col(time).as("_t"),
      lit(rSide).as("_side"), rp.as("_r"), lit(null).cast(lType).as("_l"))
    // equal-time tie-break: the extreme right struct when the payload is
    // orderable; map-typed columns (e.g. a properties map) cannot be sort
    // keys, so fall back to a deterministic hash of the row's JSON — still
    // a stable total order, just not the lexicographic-extreme one
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val tie = if (!hasMap(rType)) col("_r") else xxhash64(to_json(col("_r")))
    // both directions use the incremental running frame; forward just
    // reverses the time/tie order so "earliest >= t" is the last row seen
    val w = (if (backward)
        Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"), tie)
      else
        Window.partitionBy(col("_k")).orderBy(col("_t").desc, col("_side"), tie.desc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lDf.unionAll(rDf)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === lSide)
    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        val dist =
          if (backward) col("_t").cast("long") - col(s"_m.$time").cast("long")
          else col(s"_m.$time").cast("long") - col("_t").cast("long")
        matched.withColumn("_m", when(dist <= tol, col("_m")))
    }
    bounded.select(left.columns.map(c => col(s"_l.$c").as(c)).toSeq ++
      rightOther.map(c => col(s"_m.$c").as(prefix + c)): _*)
  }
}

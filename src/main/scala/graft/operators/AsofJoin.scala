package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Backward as-of (point-in-time) join: each left row picks the latest right
 * row with the same key and right.time <= left.time — the join financial /
 * event pipelines mean by "join against the state as of then".
 *
 * Spark has no native ASOF join; the naive range-join formulation
 * (l JOIN r ON key AND r.t <= l.t, then argmax per left row) explodes to
 * O(|matches|) intermediate rows before pruning. This is the scalable
 * union-window form instead: tag both sides, union, and take
 * `last(right_payload, ignoreNulls)` over a (key)-partitioned window
 * ordered by (time, side) — ONE shuffle on the key, one sort, output
 * linear in |L| + |R|. Right rows order before left rows at equal time, so
 * the match is <= (inclusive). Exact-time ties among right rows are broken
 * by the largest payload struct (deterministic, documented).
 *
 * Output: every left column, plus each non-key right column as
 * `<prefix><name>` (null when no right row precedes the left row).
 */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String, time: String,
                   prefix: String = "asof_"): DataFrame = {
    val rightOther = right.columns.filterNot(_ == key).toSeq
    val lp = struct(left.columns.map(col).toSeq: _*)
    val rp = struct(rightOther.map(col): _*)
    val lType = left.select(lp.as("_l")).schema("_l").dataType
    val rType = right.select(rp.as("_r")).schema("_r").dataType
    val lDf = left.select(col(key).as("_k"), col(time).as("_t"),
      lit(1).as("_side"), lit(null).cast(rType).as("_r"), lp.as("_l"))
    val rDf = right.select(col(key).as("_k"), col(time).as("_t"),
      lit(0).as("_side"), rp.as("_r"), lit(null).cast(lType).as("_l"))
    // equal-time tie-break: the max right struct when the payload is
    // orderable; map-typed columns (e.g. a properties map) cannot be sort
    // keys, so fall back to a deterministic hash of the row's JSON — still
    // a stable total order, just not the lexicographic-max one
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val tie = if (!hasMap(rType)) col("_r") else xxhash64(to_json(col("_r")))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lDf.unionAll(rDf)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)).toSeq ++
        rightOther.map(c => col(s"_m.$c").as(prefix + c)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Banded time-proximity join: pairs within |tLeft - tRight| <= width,
 * optionally under extra equi-keys. Spark has no range-join strategy — a
 * naive `a.join(b, abs(tA - tB) <= w)` plans as BroadcastNestedLoopJoin
 * (quadratic, and a driver OOM when neither side fits a broadcast). The
 * standard scale fix, used by every interval-join engine (Flink's window
 * join, Databricks' range-join hint): quantize time into width-sized
 * buckets, replicate ONE side to its adjacent buckets, equi-join on
 * (keys..., bucket), then filter the exact predicate.
 *
 * Each qualifying pair meets exactly once — the left row's bucket is a
 * single value and the right row contributes one copy per distinct bucket
 * in {b-1, b, b+1} — so no multiplicity dedup stage is needed. Shuffle
 * volume is |left| + 3|right|, keyed on (keys, bucket): co-partitioned,
 * AQE-coalesced, skew handled like any equi-join.
 */
object RangeJoin {

  /** Join rows of `left` and `right` whose `lTime`/`rTime` (timestamp or
    * numeric, cast to epoch seconds) differ by at most `width` seconds,
    * matching on `keys` equi-columns first. Columns from both sides survive;
    * disambiguate with aliases before calling when names collide. */
  def band(left: DataFrame, right: DataFrame,
           lTime: String, rTime: String, width: Double,
           keys: Seq[String] = Nil): DataFrame = {
    require(width > 0, "band width must be positive")
    def bucketOf(t: Column): Column = floor(t.cast("double") / width).cast("long")
    val l = left.withColumn("_bkt", bucketOf(col(lTime)))
    val r = right.withColumn("_rb", bucketOf(col(rTime)))
      .withColumn("_bkt", explode(array(col("_rb") - 1, col("_rb"), col("_rb") + 1)))
      .drop("_rb")
    l.join(r, keys :+ "_bkt")
      .where(abs(col(lTime).cast("double") - col(rTime).cast("double")) <= width)
      .drop("_bkt")
  }
}

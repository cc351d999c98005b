package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval OVERLAP join: pairs of rows whose closed integer intervals
 * [lStart, lEnd] and [rStart, rEnd] intersect, optionally under extra
 * equi-keys. The arbitrary-length sibling of [[RangeJoin]] (which joins
 * POINTS within a fixed width): validity windows vs validity windows,
 * session spans vs campaign flights, shipment windows vs shipment windows.
 *
 * A naive `l.join(r, lStart <= rEnd && rStart <= lEnd)` plans as a
 * BroadcastNestedLoopJoin — quadratic, driver-OOM when neither side fits a
 * broadcast. The standard scale shape (Flink interval join, Databricks
 * range-join hint, genomics overlap joins): quantize the axis into
 * width-sized buckets, explode EACH side to the buckets its interval
 * covers, equi-join on (keys..., bucket), then filter the exact overlap
 * predicate. Overlapping pairs share every bucket in the intersection of
 * their covers, so the join alone would emit duplicates — each pair is
 * kept ONLY in the FIRST shared bucket, `bucket == max(lStartBucket,
 * rStartBucket)`, a pure per-row filter that makes the join
 * multiplicity-free with no dedup exchange.
 *
 * Shuffle volume is Σ(interval length / width + 1) per side, keyed on
 * (keys, bucket) — co-partitioned, AQE-coalesced, skew handled like any
 * equi-join. Pick `width` near the typical interval length: much smaller
 * explodes long intervals into many replicas, much larger degrades the
 * bucket join toward all-pairs within a bucket.
 */
object IntervalJoin {

  /** Overlap-join `left` and `right` on closed intervals given by integer
    * columns `lStart <= lEnd` / `rStart <= rEnd` (cast to long), matching
    * `keys` equi-columns first. Columns from both sides survive;
    * disambiguate with aliases before calling when names collide. */
  def overlap(left: DataFrame, right: DataFrame,
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              width: Long, keys: Seq[String] = Nil): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // bucket id = the bucket's floor MULTIPLE (x - pmod(x, width)), not the
    // quotient: pure long arithmetic, so endpoints beyond 2^53 never take a
    // double round-trip (floor(double/width) misbuckets them and silently
    // drops or duplicates pairs); sequence() then steps by `width`
    def b(c: Column): Column = { val x = c.cast("long"); x - pmod(x, lit(width)) }
    // degenerate intervals (end < start) are dropped up front: sequence()
    // would otherwise generate a DESCENDING bucket range for them;
    // sequence() is inclusive on both ends — exactly the covered buckets
    val l = left
      .where(col(lStart).cast("long") <= col(lEnd).cast("long"))
      .withColumn("_lsb", b(col(lStart)))
      .withColumn("_bkt", explode(sequence(col("_lsb"), b(col(lEnd)), lit(width))))
    val r = right
      .where(col(rStart).cast("long") <= col(rEnd).cast("long"))
      .withColumn("_rsb", b(col(rStart)))
      .withColumn("_bkt", explode(sequence(col("_rsb"), b(col(rEnd)), lit(width))))
    l.join(r, keys :+ "_bkt")
      .where(col("_bkt") === greatest(col("_lsb"), col("_rsb")))
      .where(col(lStart).cast("long") <= col(rEnd).cast("long") &&
        col(rStart).cast("long") <= col(lEnd).cast("long"))
      .drop("_bkt", "_lsb", "_rsb")
  }
}

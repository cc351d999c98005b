package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-funnel and cohort-retention analytics over an event log — the
 * classic product-analytics operators, expressed as pure relational
 * pipelines (stepwise min-timestamp joins and integer time-bucket
 * aggregations; no per-user driver loops, no sequence UDFs).
 *
 * Timestamps are int64 epoch nanoseconds end to end (the events table is
 * parquet TIMESTAMP(NANOS) read via nanosAsLong): every comparison and
 * bucket is integer math, so results are deterministic and cross-engine
 * replayable. Bucketing uses `div` (integer division) — int64 nanos exceed
 * double's 2^53 mantissa, so a float division would corrupt bucket ids.
 *
 * Scale shape: funnel stage k is one filtered scan of the (pre-projected)
 * event triple joined against the previous stage's per-user reach table —
 * user-keyed exchanges only, each strictly smaller than the last. Retention
 * is two aggregations ((user, bucket) distinct, then cohort x offset
 * counts) — nothing wider than (user, long) ever shuffles.
 */
object EventAnalytics {

  /**
   * Ordered funnel with a conversion window: a user reaches stage k when an
   * event of `stages(k)` occurs STRICTLY AFTER their stage-(k-1) reach time
   * and within `windowNs` of their stage-1 entry (first qualifying
   * occurrence, the standard min-ts funnel semantics). Returns one row per
   * stage: (stage, step, users, conversion), conversion = users /
   * stage-1 users rounded to 6dp.
   */
  def funnel(events: DataFrame, user: String, etype: String, tsNs: String,
             stages: Seq[String], windowNs: Long = Long.MaxValue): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val ev = events.select(col(user).as("_u"), col(etype).as("_e"),
      col(tsNs).as("_ts"))
    val first = ev.where(col("_e") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
      .withColumn("_t0", col("_t"))
    val reach = stages.tail.scanLeft(first) { (prev, st) =>
      ev.where(col("_e") === st)
        .join(prev.select(col("_u"), col("_t").as("_tp"), col("_t0")), Seq("_u"))
        .where(col("_ts") > col("_tp") && col("_ts") - col("_t0") <= windowNs)
        .groupBy(col("_u"), col("_t0")).agg(min(col("_ts")).as("_t"))
        .select(col("_u"), col("_t"), col("_t0"))
    }
    val entered = first.agg(count(lit(1)).as("_entered"))
    val counts = stages.zip(reach).zipWithIndex.map { case ((st, r), i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(st).as("stage"), lit(i + 1).cast("long").as("step"),
          col("users"))
    }.reduce(_ union _)
    counts.crossJoin(broadcast(entered))
      .select(col("stage"), col("step"), col("users"),
        when(col("_entered") > 0,
          round(col("users").cast("double") / col("_entered"), 6))
          .otherwise(lit(0.0)).as("conversion"))
      .orderBy(col("step"))
  }

  /**
   * Cohort retention matrix: cohort = the user's first-activity time bucket
   * (integer `tsNs div bucketNs`), and for every later bucket the user was
   * active in, one (cohort, offset) cell. Returns (cohort, bucket_offset,
   * users) with offset 0 = the cohort bucket itself.
   */
  /** Exact floor division of an int64 column by a positive constant:
    * (x - pmod(x, d)) is an exact multiple of d, so the truncating integral
    * divide equals floor for ANY sign (matching DuckDB's `//`), and the
    * value never routes through a double. Built from catalyst
    * IntegralDivide directly — string-interpolating the column name into
    * expr() would break on names that need backticks. */
  private def floorDiv(c: Column, d: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val adj = c - pmod(c, lit(d))
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(adj), ColumnBridge.expression(lit(d))))
  }

  def retention(events: DataFrame, user: String, tsNs: String,
                bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucket must be positive")
    val ev = events.select(col(user).as("_u"),
      floorDiv(col(tsNs), bucketNs).as("_b"))
    val active = ev.distinct()
    val cohort = active.groupBy(col("_u")).agg(min(col("_b")).as("_c"))
    active.join(cohort, Seq("_u"))
      .groupBy(col("_c").as("cohort"), (col("_b") - col("_c")).as("bucket_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort"), col("bucket_offset"))
  }

  /**
   * Time-series resample to a fixed grid with last-observation-carried-
   * forward: aggregate events per (key, step bucket), then fill EVERY
   * bucket of the global [min, max] grid for every key — absent buckets
   * get `n_events` 0 and carry the previous bucket's `sum_c` forward
   * (`carried` marks them; leading gaps before a key's first observation
   * stay null). The gap-fill every dashboard/feature-pipeline needs
   * before joining series with different arrival rates.
   *
   * Scale shape: the per-bucket aggregate shrinks raw events FIRST (map-
   * side combined; only (key, bucket, n, sum) moves); the grid is
   * |keys| × |buckets| rows built from an exploded `sequence` against the
   * broadcast single-row bounds; the LOCF window runs over GRID rows, not
   * events — its partition is one key's bucket count (bounded by the time
   * span over the step, not by data volume), so a month of hourly buckets
   * is 720 rows per key no matter how many trillion events fed it.
   */
  def locfGrid(events: DataFrame, keyCol: String, tsNs: String,
               valueCents: Column, stepNs: Long): DataFrame = {
    require(stepNs > 0, "step must be positive")
    import org.apache.spark.sql.expressions.Window
    val b = col(tsNs) - pmod(col(tsNs), lit(stepNs))
    val agg = events.groupBy(col(keyCol), b.as("bucket_ns"))
      .agg(count(lit(1)).as("n_events"), sum(valueCents).as("sum_c"))
    val bounds = events.select(b.as("_b"))
      .agg(min(col("_b")).as("_minb"), max(col("_b")).as("_maxb"))
    val grid = events.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("_minb"), col("_maxb"), lit(stepNs))).as("bucket_ns"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ns"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val locf = last(col("sum_c"), ignoreNulls = true).over(w)
    grid.join(agg, Seq(keyCol, "bucket_ns"), "left")
      .select(col(keyCol), col("bucket_ns"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        locf.as("sum_c_locf"),
        (col("n_events").isNull && locf.isNotNull).as("carried"))
      .orderBy(col(keyCol), col("bucket_ns"))
  }
}

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
  /** Per-stage reach frames of the ordered min-ts funnel: element i is the
    * users who reached stage i, as (_u, _t = first reach time, _t0 = the
    * stage-0 entry time). Exposed so COMPOSITIONS can chain on the reached
    * POPULATION (e.g. "attribution over converted users") — `funnel`
    * aggregates these same frames into the counts view. */
  def funnelReach(events: DataFrame, user: String, etype: String, tsNs: String,
                  stages: Seq[String],
                  windowNs: Long = Long.MaxValue): Seq[DataFrame] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    // null users can never convert (equijoins drop null keys at stage 2+),
    // so counting them at stage 1 would deflate every conversion rate —
    // exclude them from the population outright
    val ev = events.select(col(user).as("_u"), col(etype).as("_e"),
      col(tsNs).as("_ts")).where(col("_u").isNotNull)
    val first = ev.where(col("_e") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
      .withColumn("_t0", col("_t"))
    stages.tail.scanLeft(first) { (prev, st) =>
      ev.where(col("_e") === st)
        .join(prev.select(col("_u"), col("_t").as("_tp"), col("_t0")), Seq("_u"))
        .where(col("_ts") > col("_tp") && col("_ts") - col("_t0") <= windowNs)
        .groupBy(col("_u"), col("_t0")).agg(min(col("_ts")).as("_t"))
        .select(col("_u"), col("_t"), col("_t0"))
    }
  }

  def funnel(events: DataFrame, user: String, etype: String, tsNs: String,
             stages: Seq[String], windowNs: Long = Long.MaxValue): DataFrame = {
    val reach = funnelReach(events, user, etype, tsNs, stages, windowNs)
    val first = reach.head
    val entered = first.agg(count(lit(1)).as("_entered"))
    val counts = stages.zip(reach).zipWithIndex.map { case ((st, r), i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(st).as("stage"), lit(i + 1).cast("long").as("step"),
          col("users"))
    }.reduce(_ union _)
    counts.crossJoin(broadcast(entered))
      .select(col("stage"), col("step"), col("users"),
        when(col("_entered") > 0,
          graft.functions.gf.roundHalfUp(col("users").cast("double") / col("_entered"), 6))
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

  /**
   * Per-key bucket-count anomaly flags — the volume-spike/drop monitor
   * over an event stream (ingest QA: a source whose hourly doc count
   * jumps 3σ is usually a crawler loop or an outage, not data). A bucket
   * is anomalous iff |x − μ| > `sigmas`·σ over its key's buckets, decided
   * PURELY in integers: (n·x − S)² > sigmas²·(n·SS − S²) — the two-sided
   * z-test cross-multiplied through by n², so no float mean/variance ever
   * crosses an engine boundary (the Stats.scala lesson). The squared
   * terms ride in decimal(38,0): exact to |n·x − S| < 10¹⁹, far beyond
   * any real bucket census (DuckDB widens to HUGEINT on its side).
   *
   * Scale: raw events collapse to (key, bucket, count) map-side first;
   * the moment pass is one key-level aggregate; the flag join broadcasts
   * key-level stats. Nothing is event-bounded after the first aggregate.
   */
  def anomalousBuckets(events: DataFrame, keyCol: String, tsNs: String,
                       stepNs: Long, sigmas: Int = 3): DataFrame = {
    require(stepNs > 0, "step must be positive")
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val b = col(tsNs) - pmod(col(tsNs), lit(stepNs))
    val counts = events.groupBy(col(keyCol), b.as("bucket_ns"))
      .agg(count(lit(1)).as("n_events"))
    val stats = counts.groupBy(col(keyCol)).agg(
      count(lit(1)).as("_n"),
      sum(col("n_events")).as("_s"),
      sum(col("n_events") * col("n_events")).as("_ss"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val dev = dec(col("_n")) * dec(col("n_events")) - dec(col("_s"))
    val varN2 = dec(col("_n")) * dec(col("_ss")) - dec(col("_s")) * dec(col("_s"))
    counts.join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("bucket_ns"), col("n_events"),
        (dev * dev > lit(sigmas.toLong * sigmas) * varN2).as("anomalous"))
      .orderBy(col(keyCol), col("bucket_ns"))
  }

  /**
   * First-order Markov transition mining over per-user event sequences —
   * "what follows what" (journey analysis, and the sequence prior behind
   * next-event prediction features). Per user, order by (ts, id) — the id
   * tie-break makes simultaneous events replayable — pair each event with
   * its successor via lead(), then count (from, to) globally and attach
   * the per-from total; `p` = n / total_from at 6dp (a ratio of exact
   * ints — the q_quality float contract).
   *
   * Scale: the lead() window partitions BY USER (bounded by per-user
   * event count); transition counting is a map-side-combined aggregate
   * over (from, to) — alphabet-sized, as is the from-total join.
   */
  def markovTransitions(events: DataFrame, user: String, etype: String,
                        tsNs: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(col(tsNs), col(idCol))
    // a null event type is indistinguishable from end-of-sequence in the
    // lead() pair (and its count would vanish at the totals equijoin
    // anyway); null users likewise — treat both as absent records
    val pairs = events
      .where(col(user).isNotNull && col(etype).isNotNull)
      .withColumn("_next", lead(col(etype), 1).over(w))
      .where(col("_next").isNotNull)
    val trans = pairs
      .groupBy(col(etype).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("total_from"))
    trans.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("total_from"),
        graft.functions.gf.roundHalfUp(col("n").cast("double") / col("total_from"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /**
   * Per-key seasonal profile over cyclic time slots (hour-of-day,
   * day-of-week): slot = (ts div slotNs) mod nSlots, and the seasonal
   * index of a slot is its share of the key's events scaled by nSlots —
   * 1.0 (= 1e6 micros) for a perfectly flat profile, >1 for peak slots.
   * Share-of-mass avoids the empty-bucket ambiguity of per-bucket means
   * (a slot with no observed buckets is simply 0 mass), and everything is
   * exact integer arithmetic: idx_micros = n·nSlots·10^6 div total.
   *
   * Scale: one map-combinable (key, slot) count, a key-level rollup, one
   * broadcast join of key totals — nothing event-bounded after the first
   * aggregate, output |keys|·nSlots rows regardless of corpus size.
   */
  /** Per-key TRAILING time-window aggregates (count + sum over the last
    * `windowUnits` of event time, inclusive): the standard rolling-feature
    * shape — "events/spend in the trailing 24 h at each event" — as ONE
    * key-partitioned RANGE-frame window pass. Spark maintains the range
    * frame incrementally (two pointers over the sorted partition), so the
    * cost is one shuffle + sort per key group; keys are the parallelism
    * unit, and a window PER KEY is exactly the partitioned-window shape
    * the plan-hygiene rule allows (never partition-less). Equal
    * timestamps all see the same frame (RANGE semantics) — deterministic
    * under ties by construction. */
  def rollingByKey(events: DataFrame, keyCol: String, tsCol: String,
                   value: Column, windowUnits: Long): DataFrame = {
    require(windowUnits >= 0, s"window must be non-negative: $windowUnits")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("t"))
      .rangeBetween(-windowUnits, 0)
    events.select(col(keyCol), col(tsCol).cast("long").as("t"), value.as("_v"))
      .select(col(keyCol), col("t"),
        count(lit(1)).over(w).as("n_window"),
        sum(col("_v")).over(w).as("sum_window"))
  }

  def seasonality(events: DataFrame, keyCol: String, tsNs: String,
                  slotNs: Long, nSlots: Int): DataFrame = {
    require(slotNs > 0 && nSlots >= 2,
      s"bad seasonality config: slotNs=$slotNs nSlots=$nSlots")
    // floorDiv, not expr-interpolated DIV: interpolating the column name
    // breaks on names that need backticks, and truncating division
    // misassigns the slot for pre-epoch (negative) timestamps
    val slot = pmod(floorDiv(col(tsNs), slotNs), lit(nSlots.toLong))
    val counts = events.groupBy(col(keyCol), slot.as("slot"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(keyCol)).agg(sum(col("n")).as("_total"))
    counts.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("slot"), col("n"),
        expr(s"n * 1000000 DIV _total").as("share_micros"),
        expr(s"n * ${nSlots}L * 1000000 DIV _total").as("idx_micros"))
      .orderBy(col(keyCol), col("slot"))
  }
}

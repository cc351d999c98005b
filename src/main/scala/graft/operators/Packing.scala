package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix-sum machinery and the two training-data operators
 * built on it:
 *
 *  - `packSequences`: GPT-style concat-and-chunk packing — documents are
 *    laid out in a deterministic total order, the token stream is cut into
 *    fixed context-length chunks, and each document learns which chunk(s)
 *    its tokens land in.
 *  - `rankBins`: exact quantile binning (curriculum buckets) — bin =
 *    floor(rank * nBins / N) over a deterministic total order.
 *
 * Both need a GLOBAL running total. A bare `Window.orderBy(...)` computes
 * it on ONE partition — the classic scale-killer. This is the textbook
 * two-phase prefix sum instead: range-partition by the order key, compute
 * per-partition partial aggregates, collect only the PER-PARTITION totals
 * (bounded by the partition count, a few KB at any corpus size), broadcast
 * the exclusive prefix offsets back, and finish with a partition-local
 * window. The corpus itself never funnels through one task.
 *
 * The staged (range-partitioned, pid-stamped) frame is materialized ONCE
 * via an eager localCheckpoint, and both the offsets job and the main job
 * read the SAME materialized blocks. This is load-bearing, not a cache
 * optimization: RangePartitioner's bounds come from reservoir samples of
 * the child's row order, and when the input's lineage contains a shuffle,
 * row order differs between two executions — two separate plans could
 * assign DIFFERENT pids to boundary rows and the broadcast offsets would
 * silently misalign. (An earlier persist() version leaked the cache entry
 * per call; checkpoint blocks are dropped by the ContextCleaner when the
 * frame is garbage collected.) The order key must be unique — pass the
 * doc id, or append one, as rankBins does.
 */
object Packing {

  /** Exclusive per-partition offsets of sum(weight) over the pid-stamped
    * staged frame. */
  private def prefixOffsets(staged: DataFrame): Map[Int, Long] = {
    val sums = staged.groupBy(col("_pid")).agg(sum(col("_w")).as("_s"))
      .collect().collect { case r if !r.isNullAt(1) => r.getInt(0) -> r.getLong(1) }.toMap
    val ordered = sums.keys.toSeq.sorted
    ordered.zip(ordered.scanLeft(0L)((acc, p) => acc + sums(p)).dropRight(1)).toMap
  }

  /**
   * Concat-and-chunk sequence packing: documents ordered by `order`
   * (deterministic total order — use the doc id), token counts from
   * `tokenCol`, context windows of `contextLen` tokens. Returns one row per
   * document: its token span [tok_start, tok_end) in the concatenated
   * stream, the first and last chunk it lands in, and its offset within the
   * first chunk. A document spanning a chunk boundary is split across
   * chunks — exactly what a pretraining loader does.
   */
  def packSequences(df: DataFrame, order: String, tokenCol: Column,
                    contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val staged = df
      .repartitionByRange(parts, col(order))
      .sortWithinPartitions(col(order))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", tokenCol.cast("long"))
      .localCheckpoint()
    val offsets = prefixOffsets(staged)
    val offExpr = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("_pid") === p, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("_pid")).orderBy(col(order))
    val out = staged
      .withColumn("_cum", sum(col("_w")).over(w) + offExpr)
      .withColumn("tok_start", col("_cum") - col("_w"))
      .withColumn("tok_end", col("_cum"))
      .withColumn("chunk_start", floor(col("tok_start") / contextLen).cast("long"))
      // empty docs occupy no chunk: end chunk = chunk of last token
      .withColumn("chunk_end",
        when(col("_w") > 0, floor((col("tok_end") - 1) / contextLen).cast("long"))
          .otherwise(col("chunk_start")))
      .withColumn("chunk_offset", pmod(col("tok_start"), lit(contextLen.toLong)))
      .drop("_pid", "_w", "_cum")
    out
  }

  /**
   * Exact quantile bins over a deterministic total order: bin =
   * floor(rank0 * nBins / N), rank0 = 0-based global rank by (`order`
   * columns, ties impossible when the last order column is unique). The
   * curriculum-binning op: bin 0 = lowest `order`, bin nBins-1 = highest.
   */
  def rankBins(df: DataFrame, order: Seq[Column], unique: String,
               nBins: Int, binCol: String = "bin"): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val (ranked, n) = rankedStage(df, order, unique)
    ranked
      .withColumn(binCol, floor(col("_rank0") * nBins / n).cast("long"))
      .drop("_rank0")
  }

  /** Global 0-based row rank over the deterministic total order
    * (`order` ++ unique id), via the same two-phase prefix sum — the
    * building block rankBins bins and Fusion.rrf inverts. */
  def globalRank(df: DataFrame, order: Seq[Column], unique: String,
                 rankCol: String = "rank0"): DataFrame = {
    val (ranked, _) = rankedStage(df, order, unique)
    ranked.withColumnRenamed("_rank0", rankCol)
  }

  /** globalRank plus the total row count — rankedStage already collected
    * per-partition counts, so callers that need n (quantile bounds, sample
    * sizing) get it for free instead of re-counting with another job. */
  def globalRankCounted(df: DataFrame, order: Seq[Column], unique: String,
                        rankCol: String = "rank0"): (DataFrame, Long) = {
    val (ranked, n) = rankedStage(df, order, unique)
    (ranked.withColumnRenamed("_rank0", rankCol), n)
  }

  /**
   * Per-group inclusive running totals of integer weights over the total
   * order (`group`, `order` columns) — the WEIGHTED, STRATIFIED form of
   * the two-phase prefix sum (Calibration.percentileBy's shape,
   * generalized from row counts to arbitrary weight columns). For each
   * `(name, weight)` pair the output gains `name` (the running sum of
   * `weight` within the row's group, inclusive of the current row) and
   * `name + "_tot"` (the group's grand total — free, from the same tiny
   * offsets frame; no second aggregation job).
   *
   * Scale shape: range-partition on (group, order) — big groups SPLIT
   * across partitions, never one task per group and never one task
   * total (the bare `Window.orderBy` trap). The per-(partition, group)
   * partials frame is bounded by #groups + #partitions rows (groups are
   * contiguous under range partitioning), so the windows over it and its
   * broadcast are safe at any corpus size. Order keys must be distinct
   * within a group (a histogram support, a bucketed domain) — ties would
   * make "inclusive of the current row" ambiguous across engines.
   */
  def runningTotalsBy(df: DataFrame, group: String, order: Seq[Column],
                      weights: Seq[(String, Column)]): DataFrame = {
    require(weights.nonEmpty, "need at least one (name, weight) pair")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val tmp = weights.zipWithIndex.map { case ((n, c), i) => (s"_rs$i", n, c) }
    val ord = col(group) +: order
    val staged = tmp.foldLeft(df) { case (d, (t, _, c)) => d.withColumn(t, c.cast("long")) }
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // one materialization — see the object scaladoc
    val cnt = staged.groupBy(col("_pid").as("_opid"), col(group).as("_grp"))
      .agg(sum(col(tmp.head._1)).as(tmp.head._1 + "_c"),
        tmp.tail.map { case (t, _, _) => sum(col(t)).as(t + "_c") }: _*)
    val wOff = Window.partitionBy(col("_grp")).orderBy(col("_opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("_grp"))
    val offDf = tmp.foldLeft(cnt) { case (d, (t, _, _)) =>
      d.withColumn(t + "_off", coalesce(sum(col(t + "_c")).over(wOff), lit(0L)))
        .withColumn(t + "_tot", sum(col(t + "_c")).over(wTot))
    }.drop(tmp.map(_._1 + "_c"): _*)
    val w = Window.partitionBy(col("_pid"), col(group)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = staged.join(broadcast(offDf),
      staged("_pid") === offDf("_opid") && staged(group) <=> offDf("_grp"))
    tmp.foldLeft(joined) { case (d, (t, name, _)) =>
      d.withColumn(name, sum(col(t)).over(w) + col(t + "_off"))
        .withColumn(name + "_tot", col(t + "_tot"))
    }.drop("_pid", "_opid", "_grp")
      .drop(tmp.flatMap(x => Seq(x._1, x._1 + "_off", x._1 + "_tot")): _*)
  }

  /** Pid-stamped staged frame with the exact global 0-based rank attached,
    * plus the total row count (from the already-collected per-partition
    * counts — no extra job). */
  private def rankedStage(df: DataFrame, order: Seq[Column],
                          unique: String): (DataFrame, Long) = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val ord = order :+ col(unique)
    // one materialization, shared by the counts job and the main job (see
    // the object scaladoc: separate plans could range-partition differently)
    val staged = df
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = staged.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val orderedP = counts.keys.toSeq.sorted
    val excl = orderedP.zip(orderedP.scanLeft(0L)((acc, p) => acc + counts(p)).dropRight(1)).toMap
    val n = math.max(1L, counts.values.sum)
    val offExpr = excl.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("_pid") === p, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("_pid")).orderBy(ord: _*)
    val ranked = staged
      .withColumn("_rank0", row_number().over(w).cast("long") - 1 + offExpr)
      .drop("_pid")
    (ranked, n)
  }
}

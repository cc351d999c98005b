package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rank-based score calibration across heterogeneous corpus strata.
 *
 * Quality scores are not comparable across sources (web text scores
 * systematically lower than books on length/punctuation heuristics), so a
 * single global threshold over- or under-filters per source. The standard
 * fix is quantile calibration: replace the raw score with its percentile
 * WITHIN the source, then curate with one percentile threshold everywhere.
 *
 * `percentileBy` computes pct = rank0 / (n_group - 1) (the row_number form
 * of percent_rank — ties broken by the unique id, so the output is
 * deterministic and cross-engine replayable; 0.0 for singleton groups).
 *
 * Scale shape: a `Window.partitionBy(group)` would sort EACH GROUP in one
 * task — a single web-crawl source at 100 TB is one straggler partition.
 * This is instead the stratified two-phase prefix rank (Packing's pattern,
 * generalized to composite keys): range-partition on (group, order, id) —
 * big groups SPLIT across partitions — collect only per-(partition, group)
 * counts, compute per-group exclusive offsets, broadcast them back as a
 * tiny join table, and finish with a partition-local window. No group ever
 * funnels through one task.
 */
object Calibration {

  def percentileBy(df: DataFrame, group: String, order: Column, unique: String,
                   outCol: String = "pctl"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val ord = Seq(col(group), order, col(unique))
    val staged = df
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // one materialization — see Packing's scaladoc
    val cnt = staged.groupBy(col("_pid"), col(group)).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.get(1)) -> r.getLong(2)).toMap
    // per-group totals and per-(pid,group) exclusive prefix offsets; both
    // bounded by (#partitions x #groups) rows — driver-safe by construction
    val totals = cnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val offsets = cnt.keys.groupBy(_._2).flatMap { case (_, ks) =>
      val sorted = ks.toSeq.sortBy(_._1)
      sorted.zip(sorted.scanLeft(0L)((acc, k) => acc + cnt(k)).dropRight(1))
    }
    val offRows = offsets.map { case ((pid, g), off) =>
      (pid, String.valueOf(g), off, totals(g))
    }.toSeq
    val offDf = spark.createDataFrame(offRows)
      .toDF("_pid", "_grp", "_off", "_n")
    val w = Window.partitionBy(col("_pid"), col(group)).orderBy(ord: _*)
    staged
      .join(broadcast(offDf),
        staged("_pid") === offDf("_pid") && col(group).cast("string") === col("_grp"))
      .drop(offDf("_pid"))
      .withColumn("_rank0", row_number().over(w).cast("long") - 1 + col("_off"))
      .withColumn(outCol,
        when(col("_n") > 1, round(col("_rank0").cast("double") / (col("_n") - 1), 6))
          .otherwise(lit(0.0)))
      .drop("_pid", "_grp", "_off", "_n", "_rank0")
  }
}

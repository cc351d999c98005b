package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * InternalRow-level mapPartitions for DataFrames — the ColumnBridge pattern
 * applied to the row boundary. `df.rdd` deserializes every row to external
 * `Row` (UTF8String -> String, decimals re-boxed) and `createDataFrame(Row)`
 * pays the CatalystTypeConverters re-conversion on the way back in; for the
 * prefix-sum machinery that is two full per-row conversion passes on the hot
 * path of every rank/packing operator. `queryExecution.toRdd` +
 * `internalCreateDataFrame` (both sql-private, hence this shim package) keep
 * rows in the internal format end to end.
 *
 * Contract: the rows handed to `f` may be REUSED buffers (UnsafeRow) — copy
 * anything held across `next()` calls; rows returned by `f` follow the same
 * SparkPlan convention (consumers copy before buffering).
 */
object InternalRowBridge {

  /** The physical output of `df` as internal rows, 1:1 with the plan's
    * partitions (the same indices `spark_partition_id()` reports). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** Wrap an internal-row RDD back into a DataFrame (LogicalRDD leaf), no
    * external-Row round trip. */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
                              rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}

package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Bucketed table layout for co-located joins (SURVEY §2 scale notes:
 * "use bucketing/pre-partitioning for co-located joins").
 *
 * Writing both sides of a recurring join bucketed + sorted on the join key
 * lets Spark plan a SortMergeJoin with NO Exchange on either side — at
 * 100 TB the shuffle is usually the whole cost of a fact-fact join, and
 * bucketing moves it to write time, paid once for any number of joins.
 * See BucketingSpec for the exchange-free plan proof.
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted table (requires a catalog table —
    * bucketing metadata lives in the catalog, not in parquet itself). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed with the same bucket count, the plan contains no Exchange. */
  def cogroupJoin(spark: org.apache.spark.sql.SparkSession,
                  tableA: String, tableB: String, key: String,
                  joinType: String = "inner"): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key), joinType)
}

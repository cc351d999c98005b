package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column profiling — the null-rate / cardinality / range summary every
 * ingestion pipeline runs before trusting a new drop (cf. the reference's
 * dataset_summarizer, lib/sycamore/sycamore/query/execution/operations.py
 * summarize_data path, which feeds the same shape to an LLM).
 *
 * One job, one scan: all per-column aggregates go into a single agg() —
 * exact distinct counts plan as one Expand (k× row multiplication inside
 * the map stage, never k scans), so at 100 TB this reads the data once.
 * The single result row is exploded driver-free into long format
 * (column, n_rows, n_nulls, n_distinct, min_value, max_value).
 *
 * min/max are emitted as strings of whatever the caller's column
 * expression yields — profile EXACT representations (ints, strings,
 * int-cents) rather than floats whose formatting is engine-specific.
 */
object Profiler {

  /** Long-format profile of the given (name, expression) columns. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.zipWithIndex.flatMap {
      case ((_, c), i) => Seq(
        count(c).as(s"_nn$i"),                       // non-null count
        countDistinct(c).as(s"_nd$i"),               // exact distinct (non-null)
        min(c).cast("string").as(s"_mn$i"),
        max(c).cast("string").as(s"_mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("column"), col("_n").as("n_rows"),
        (col("_n") - col(s"_nn$i")).as("n_nulls"),
        col(s"_nd$i").as("n_distinct"),
        col(s"_mn$i").as("min_value"), col(s"_mx$i").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("_p")).select(col("_p.*"))
      .orderBy(col("column"))
  }

  /**
   * Join-key skew audit — the report you run BEFORE a 100 TB join to
   * decide between a plain equi-join, a broadcast, and SkewJoin's salting:
   * the top-k heaviest keys with their exact row counts and integer-micro
   * share of the table, plus the table's total rows and distinct-key count
   * on every row (so one result answers "is key X a salting candidate and
   * how concentrated is the table overall").
   *
   * Scale: one map-combinable key count; the rollup (total, distinct) is
   * a count/sum over the key-level frame, not the raw table; top-k plans
   * as TakeOrderedAndProject (no full sort, no shuffle beyond the key
   * aggregate); the 1-row rollup attaches via broadcast cross join.
   */
  def keySkew(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val rollup = counts.agg(sum(col("n")).as("rows_total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(rollup))
      .select(col("key").cast("string").as("key"), col("n"),
        expr("n * 1000000 DIV rows_total").as("share_micros"),
        col("rows_total"), col("n_keys"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }
}

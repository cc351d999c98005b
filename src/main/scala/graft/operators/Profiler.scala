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
}

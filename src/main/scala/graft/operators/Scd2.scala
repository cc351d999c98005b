package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type 2 history build (Kimball's SCD2): turn an
 * append-only change log (key, ts, attributes) into versioned validity
 * intervals — one row per STATE CHANGE with `[valid_from, valid_to)` and
 * an `is_current` flag. Consecutive log entries with identical attributes
 * are compressed into one interval (the standard "don't version a
 * no-op update" rule), so replaying the same state twice never forks a
 * version. The lakehouse-MERGE companion every warehouse needs when a
 * mutable operational table is tracked over time.
 *
 * Mechanics: per key, order by ts; a row opens a new interval iff any
 * tracked attribute differs from its predecessor (lag); interval ends at
 * the NEXT change's ts (lead over the change rows), open intervals get
 * null `valid_to` + `is_current`. Ties on (key, ts) are broken
 * deterministically by the attribute tuple so reruns are stable.
 *
 * Scale shape: two windows partitioned BY KEY (the natural shuffle — the
 * same exchange a groupBy(key) would pay, reused by both window passes
 * since the partitioning is identical); no self-joins, no driver state.
 * A key's partition is its own change history — bounded by per-entity
 * update counts, not by table size.
 */
object Scd2 {

  /** `attrs` are the tracked attribute columns (by name). Output:
    * (key, valid_from, valid_to, is_current, version, attrs...). */
  def build(log: DataFrame, keyCol: String, tsCol: String,
            attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "track at least one attribute")
    val ord = (col(tsCol) +: attrs.map(col)).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val marked = log
      .withColumn("_chg", when(row_number().over(w) === 1, lit(true)).otherwise(changed))
      .where(col("_chg"))
    // windows over the CHANGE rows only (same key partitioning)
    val wc = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    marked
      .select((col(keyCol) +: attrs.map(col)) :+
        col(tsCol).as("valid_from") :+
        lead(col(tsCol), 1).over(wc).as("valid_to") :+
        lead(col(tsCol), 1).over(wc).isNull.as("is_current") :+
        row_number().over(wc).cast("long").as("version"): _*)
      .orderBy(col(keyCol), col("valid_from"))
  }
}

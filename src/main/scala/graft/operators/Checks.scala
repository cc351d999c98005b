package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraints (the Deequ/Great-Expectations
 * shape): a check suite evaluates against a table and returns one row per
 * constraint with exact violation counts — the contract gate every
 * ingestion pipeline runs before publishing a drop. Complements
 * Profiler (descriptive) with assertions (normative).
 *
 * 100 TB shape: ALL row-level constraints (not-null, range, regex,
 * set-membership) and uniqueness fold into ONE aggregate over one scan —
 * violation counts are conditional sums, uniqueness is n_rows minus an
 * exact distinct count multiplexed through the same Expand. Referential
 * checks are the exception (they need the reference relation): each adds
 * one left-anti-join count against a dimension that AQE broadcasts when
 * small — the same cost MERGE-style FK validation pays anywhere.
 */
object Checks {

  sealed trait Check { def name: String }
  /** Violation when `violated` is true (null-safe: define it so null
    * handling is explicit in the predicate). */
  final case class RowCheck(name: String, violated: Column) extends Check
  /** Violations = n_rows − n_distinct over the key columns (the number of
    * extra copies beyond one per key). */
  final case class UniqueCheck(name: String, keys: Seq[Column]) extends Check
  /** Violations = rows whose value has no match in ref(refCol); nulls in
    * `value` are NOT violations (pair with a RowCheck for that). */
  final case class RefCheck(name: String, value: Column,
                            ref: DataFrame, refCol: String) extends Check

  def notNull(c: Column): Column = c.isNull
  def inRange(c: Column, lo: Column, hi: Column): Column =
    c.isNull || c < lo || c > hi
  def matches(c: Column, regex: String): Column =
    c.isNull || !c.rlike(regex)
  def inSet(c: Column, values: Seq[Any]): Column =
    c.isNull || !c.isin(values: _*)

  /** Evaluate the suite: (constraint, n_rows, n_violations, passed),
    * constraint-ordered. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val rowish = checks.collect {
      case c: RowCheck => c.name ->
        sum(when(c.violated, 1L).otherwise(0L))
      case c: UniqueCheck => c.name ->
        // distinct over a STRUCT of the keys: countDistinct(a, b) skips any
        // row with a null key entirely, so a single null-key row would be
        // flagged as a violation; the struct wrapper keeps null as a key
        // value (two null-key rows = one duplicate, one = none)
        (count(lit(1)) - countDistinct(struct(c.keys: _*)))
    }
    val aggs = Seq(count(lit(1)).as("_n")) ++
      rowish.zipWithIndex.map { case ((_, a), i) => a.as(s"_v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rowRows = rowish.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("constraint"), col("_n").as("n_rows"),
        col(s"_v$i").as("n_violations"))
    }
    val rowDf = one.select(explode(array(rowRows: _*)).as("_c")).select(col("_c.*"))
    val refDfs = checks.collect { case c: RefCheck =>
      val missing = df.select(c.value.as("_v")).where(col("_v").isNotNull)
        .join(c.ref.select(col(c.refCol).as("_v")).distinct(), Seq("_v"), "left_anti")
      df.agg(count(lit(1)).as("n_rows"))
        .crossJoin(missing.agg(count(lit(1)).as("n_violations")))
        .select(lit(c.name).as("constraint"), col("n_rows"), col("n_violations"))
    }
    refDfs.foldLeft(rowDf)(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("constraint"))
  }

  /** Benford's-law micro-proportions of the leading digit d = 1..9:
    * round(log10(1 + 1/d) · 10⁶), computed ONCE at the driver so no
    * engine evaluates a log (the Linkage milli-bit pattern). */
  val BenfordMicros: Array[Long] =
    Array.tabulate(9)(i => math.round(math.log10(1.0 + 1.0 / (i + 1)) * 1e6))

  /** First-significant-digit audit against Benford's law — the classic
    * fabricated-numbers / data-quality screen for naturally-occurring
    * magnitudes (amounts, populations, file sizes). The leading digit is
    * extracted from the DECIMAL STRING of the positive integer value
    * (both engines print integers identically; no libm log10 on the data
    * path), counts are exact, and the deviation per digit is the pure
    * integer |n_d · 10⁶ − N · expected_micros| — a rational numerator
    * over the common denominator N·10⁶, so it cross-engine hash-matches.
    * Rows with value < 1 are excluded (no leading digit). Output:
    * (digit, n, expected_micros, dev_num), digit-ordered — all 9 digits
    * present even when unobserved. One aggregation pass, map-side
    * combinable; the 9-row digit frame is constant-size at any scale. */
  def benfordDigits(df: DataFrame, value: Column): DataFrame = {
    val v = value.cast("long")
    val counts = df.where(v >= 1L)
      .groupBy(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        element_at(lit(BenfordMicros), col("id").cast("int")).as("expected_micros"))
    val tot = counts.agg(coalesce(sum(col("n")), lit(0L)).as("_total"))
    digits.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("expected_micros"),
        abs(coalesce(col("n"), lit(0L)) * lit(1000000L)
          - col("_total") * col("expected_micros")).as("dev_num"))
      .orderBy(col("digit"))
  }
}

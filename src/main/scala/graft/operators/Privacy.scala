package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * k-anonymity by GLOBAL full-domain generalization (Samarati 2001;
 * LeFevre et al. 2005 "Incognito" single-dimensional lattice): a release
 * is k-anonymous when every combination of quasi-identifier values is
 * shared by at least k rows. Given an ordered generalization ladder for
 * one quasi-identifier (finest first — e.g. day → month → quarter → year)
 * and the remaining quasi-identifier columns verbatim, pick the FIRST
 * ladder level whose every (level value, other QIs) group reaches k, and
 * generalize the whole release to that level. If even the coarsest level
 * leaves small groups, those rows are SUPPRESSED (dropped) — the output
 * is k-anonymous unconditionally.
 *
 * Scale shape: one hash aggregation per ladder level (each a map-side
 * combinable groupBy + a single-value min — the collect is ONE long per
 * level, bounded by the ladder length, never by data), then one
 * generalization pass. The level search is sequential by design: levels
 * are ordered and the first hit wins, so later (coarser) aggregations are
 * skipped once a level qualifies.
 */
object Privacy {

  /** Returns the k-anonymous release: input rows with the chosen ladder
    * level's value as `qi`, its name as `gen_level`, minus suppressed
    * rows (only possible at the coarsest level). Ladder columns must share
    * one type (cast to string for mixed day/month/year ladders). */
  def kAnonymize(df: DataFrame, ladder: Seq[(String, Column)],
                 otherQi: Seq[Column], k: Long): DataFrame = {
    require(ladder.nonEmpty, "need at least one generalization level")
    require(k >= 1, "k must be at least 1")
    def minGroup(c: Column): Long =
      df.groupBy((c +: otherQi): _*).count()
        .agg(min(col("count"))).head() match {
          case r if r.isNullAt(0) => Long.MaxValue // empty input: all levels pass
          case r => r.getLong(0)
        }
    val chosen = ladder.find { case (_, c) => minGroup(c) >= k }
    val (name, qiCol) = chosen.getOrElse(ladder.last)
    val gen = df.withColumn("qi", qiCol).withColumn("gen_level", lit(name))
    if (chosen.isDefined) gen
    else {
      // coarsest level still has small groups: suppress them (left-semi
      // against the qualifying groups — no payload in the count exchange).
      // otherQi may be computed EXPRESSIONS, which cannot be re-selected
      // off an aggregate — materialize them as stable columns first and
      // drop them after the join
      val oqNames = otherQi.indices.map(i => s"_oq$i")
      val genQ = otherQi.zipWithIndex.foldLeft(gen) {
        case (d, (c, i)) => d.withColumn(s"_oq$i", c)
      }
      val keys = "qi" +: oqNames
      val keep = genQ.groupBy(keys.map(col): _*).count()
        .where(col("count") >= k)
        .select(keys.map(c => col(c).as(s"_r_$c")): _*)
      // null-safe equality: groupBy treats NULL QI values as a group, so a
      // null-QI group that reaches k must be RELEASED like any other — a
      // plain equi-join would never match the null keys and always
      // suppress those rows
      val cond = keys.map(c => col(c) <=> col(s"_r_$c")).reduce(_ && _)
      genQ.join(keep, cond, "left_semi").drop(oqNames: _*)
    }
  }
}

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
 * Scale shape (Incognito's rollup property): the corpus is aggregated
 * ONCE over every ladder level (plus the verbatim QIs) into a frequency
 * frame of |distinct finest QI combos| rows, and each candidate level's
 * minimum group size is a RE-AGGREGATION of that frame — so the level
 * search costs one corpus scan total, not one per level, and each probe
 * collects ONE long to the driver. The search is still sequential and
 * first-hit-wins; only the probes' input changed.
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
    val freq = freqFrame(df, Seq(ladder), otherQi)
    val chosen =
      try ladder.indices
        .find(lvl => minGroupOnFreq(freq, Seq(lvl), otherQi.size) >= k)
        .map(ladder)
      finally { freq.unpersist(false); () }
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

  /** Multi-attribute full-domain generalization over the PRODUCT lattice
    * (Incognito's search space, LeFevre et al. 2005 — the general form of
    * the single-ladder `kAnonymize`): each quasi-identifier brings its own
    * ordered ladder (finest first), a lattice node picks one level per
    * ladder, and nodes are visited by total height then lexicographic
    * level vector — so "least generalized wins, dates before prices on
    * ties" is a deterministic, documented rule both engines replay. The
    * first node whose every (level values..., other QIs) group reaches k
    * generalizes the whole release; if even the all-coarsest node fails,
    * its small groups are suppressed (null-safe, like `kAnonymize`).
    *
    * Generalization is monotone (coarsening any ladder never shrinks a
    * group), so the first qualifying node in this order is a minimal-
    * height qualifying node — Samarati's criterion. Scale shape
    * (Incognito's rollup property): the corpus is aggregated ONCE over
    * every level of every ladder into a frequency frame, and every
    * visited node's minimum group size re-aggregates that frame — the
    * walk costs one corpus scan total regardless of how many of the
    * Π|ladder| nodes it visits, each probe collecting ONE long.
    *
    * Output: input rows plus `qi0..qiN` (each ladder's chosen level value)
    * and `gen_level` = the chosen level names joined with '|'. */
  def kAnonymizeMulti(df: DataFrame, ladders: Seq[Seq[(String, Column)]],
                      otherQi: Seq[Column], k: Long): DataFrame = {
    require(ladders.nonEmpty && ladders.forall(_.nonEmpty),
      "each quasi-identifier needs a non-empty ladder")
    require(k >= 1, "k must be at least 1")
    val freq = freqFrame(df, ladders, otherQi)
    val nodes = lattice(ladders.map(_.length))
    val chosen =
      try nodes.find(n => minGroupOnFreq(freq, n, otherQi.size) >= k)
      finally { freq.unpersist(false); () }
    val node = chosen.getOrElse(nodes.last)
    val gen0 = node.zip(ladders).zipWithIndex.foldLeft(df) {
      case (d, ((lvl, lad), i)) => d.withColumn(s"qi$i", lad(lvl)._2)
    }
    val gen = gen0.withColumn("gen_level",
      lit(node.zip(ladders).map { case (lvl, lad) => lad(lvl)._1 }.mkString("|")))
    if (chosen.isDefined) gen
    else {
      val oqNames = otherQi.indices.map(i => s"_oq$i")
      val genQ = otherQi.zipWithIndex.foldLeft(gen) {
        case (d, (c, i)) => d.withColumn(s"_oq$i", c)
      }
      val keys = ladders.indices.map(i => s"qi$i") ++ oqNames
      val keep = genQ.groupBy(keys.map(col): _*).count()
        .where(col("count") >= k)
        .select(keys.map(c => col(c).as(s"_r_$c")): _*)
      val cond = keys.map(c => col(c) <=> col(s"_r_$c")).reduce(_ && _)
      genQ.join(keep, cond, "left_semi").drop(oqNames: _*)
    }
  }

  /** Distinct-l-diversity release (Machanavajjhala et al. 2006 "l-Diversity:
    * Privacy Beyond k-Anonymity", §3): k-anonymity leaves a group
    * attackable when everyone in it shares one SENSITIVE value (the
    * homogeneity attack) — this pass additionally requires every released
    * quasi-identifier group to carry at least `l` DISTINCT sensitive
    * values, suppressing groups that fail. Composes after kAnonymize /
    * kAnonymizeMulti (their output columns are the natural `qi` here).
    *
    * Scale shape: ONE map-combinable aggregation (count_distinct over the
    * sensitive column per QI group — Spark plans this as two hash
    * aggregates, no window) + a null-safe left-semi join; no driver state.
    * Null sensitive values count as one distinct value like any other
    * (groupBy semantics), and null QI groups release when they qualify —
    * the kAnonymize null-safety rule. */
  def lDiversify(df: DataFrame, qi: Seq[Column], sensitive: Column,
                 l: Long): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, "l must be at least 1")
    val qiNames = qi.indices.map(i => s"_qi$i")
    val q = qi.zipWithIndex.foldLeft(df) {
      case (d, (c, i)) => d.withColumn(s"_qi$i", c)
    }
    // distinct sensitive count per group: exact, two-phase hash aggregate
    val keep = q.groupBy(qiNames.map(col): _*)
      .agg(countDistinct(sensitive).as("_nsv"),
        // countDistinct ignores nulls; a null sensitive value is still A
        // value an attacker can infer, so count it as one more class
        max(when(sensitive.isNull, 1L).otherwise(0L)).as("_hasNull"))
      .where(col("_nsv") + col("_hasNull") >= l)
      .select(qiNames.map(c => col(c).as(s"_r_$c")): _*)
    val cond = qiNames.map(c => col(c) <=> col(s"_r_$c")).reduce(_ && _)
    q.join(keep, cond, "left_semi").drop(qiNames: _*)
  }

  /** ONE corpus aggregation shared by every lattice probe: group by every
    * level expression of every ladder (column `_l<qi>_<lvl>`) plus the
    * verbatim QIs (`_oq<i>`), count rows. |freq| = distinct finest-level
    * combos — each visited node re-aggregates THIS frame, so the lattice
    * walk's corpus cost is one scan however many nodes it probes
    * (Incognito's bottom-up rollup, LeFevre et al. 2005 §3.2). Persisted:
    * sequential probes reuse it; callers unpersist after the walk. */
  private def freqFrame(df: DataFrame, ladders: Seq[Seq[(String, Column)]],
                        otherQi: Seq[Column]): DataFrame = {
    val cols =
      ladders.zipWithIndex.flatMap { case (lad, i) =>
        lad.zipWithIndex.map { case ((_, c), l) => c.as(s"_l${i}_$l") }
      } ++ otherQi.zipWithIndex.map { case (c, i) => c.as(s"_oq$i") }
    df.groupBy(cols: _*).agg(count(lit(1)).as("_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Minimum group size at one lattice node, evaluated on the freq frame:
    * sum the finest counts up to the node's levels, take the min. */
  private def minGroupOnFreq(freq: DataFrame, node: Seq[Int],
                             nOtherQi: Int): Long = {
    val keys = node.zipWithIndex.map { case (lvl, i) => col(s"_l${i}_$lvl") } ++
      (0 until nOtherQi).map(i => col(s"_oq$i"))
    freq.groupBy(keys: _*).agg(sum(col("_cnt")).as("_c"))
      .agg(min(col("_c"))).head() match {
        case r if r.isNullAt(0) => Long.MaxValue // empty input: all nodes pass
        case r => r.getLong(0)
      }
  }

  /** Product-lattice nodes in (total height, lexicographic) order —
    * the walk order both the engine and the oracle replay. */
  private[graft] def lattice(sizes: Seq[Int]): Seq[Seq[Int]] = {
    import scala.math.Ordering.Implicits._
    def all(s: Seq[Int]): Seq[Seq[Int]] = s match {
      case Seq() => Seq(Seq())
      case h +: t => for (i <- 0 until h; rest <- all(t)) yield i +: rest
    }
    all(sizes).sortBy(n => (n.sum, n.toList))
  }
}

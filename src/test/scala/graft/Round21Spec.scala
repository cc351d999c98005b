package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Calibration, Packing, Stats}

/** Round-21 (optimization round) pins.
  *
  * The prefix-sum machinery moved to the InternalRow level
  * (Packing.appendLong via InternalRowBridge) and rank selection moved
  * from full-corpus globalRank to histogram selection
  * (Stats.valuesAtRanks); these tests pin the contracts the rewrites rely
  * on:
  *
  *  - the pid-ALIGNMENT contract (r20 VERDICT #2): the offsets job
  *    (spark_partition_id() aggregation) and the fold job
  *    (queryExecution.toRdd.mapPartitionsWithIndex) must see identical
  *    partition indices over the staged checkpoint — a future Spark
  *    change that inserts a conversion stage in toRdd would break ~10
  *    operators at once; this fails ONE test instead.
  *  - valuesAtRanks == brute-force order statistics, with duplicates and
  *    nulls, at any partitioning.
  *  - winsorize (now histogram-selected bounds) == brute-force clip.
  */
class Round21Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // deterministic skewed weights: many duplicates, a few giants
  private def skewed(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val w = (i * 2654435761L) % 97 match {
        case m if m < 50 => 3L          // hot duplicate weight
        case m if m < 90 => (m % 7) + 1L
        case m           => 1000L + m   // giants
      }
      (i.toLong, w)
    }

  test("packSequences prefix sum == driver cumsum on a skewed multi-partition frame (pid alignment)") {
    val rows = skewed(5000)
    // deliberately awkward input partitioning: the operator re-stages by
    // range internally; alignment must hold regardless
    val df = spark.createDataFrame(rows).toDF("id", "toks").repartition(7)
    val out = Packing.packSequences(df, "id", col("toks"), contextLen = 64)
      .select(col("id"), col("tok_start"), col("tok_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0L
    rows.sortBy(_._1).zip(out).foreach { case ((id, w), (oid, s, e)) =>
      assert(oid == id)
      assert(s == cum, s"tok_start misaligned at id=$id (pid offsets vs fold)")
      cum += w
      assert(e == cum, s"tok_end misaligned at id=$id")
    }
  }

  test("globalRank == sort index on a skewed frame (withPartitionRank alignment)") {
    val rows = skewed(3000)
    val df = spark.createDataFrame(rows).toDF("id", "w").repartition(5)
    val got = Packing.globalRank(df, Seq(col("w")), "id", "r")
      .select(col("id"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = rows.sortBy { case (id, w) => (w, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got == expect)
  }

  test("valuesAtRanks == brute-force order statistics (duplicates + nulls)") {
    val vals: Seq[java.lang.Long] = (0 until 2000).map { i =>
      if (i % 13 == 0) null
      else java.lang.Long.valueOf(((i * 2654435761L) % 37) - 5)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v)
      }, 9),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
    val sorted = vals.filter(_ ne null).map(_.longValue).sorted
    val n = sorted.size.toLong
    val wanted = Seq(0L, n / 3, n / 2, n - 1)
    val (gotN, got) = Stats.valuesAtRanks(df, col("v"))(_ => wanted)
    assert(gotN == n)
    wanted.foreach { k =>
      assert(got(k) == sorted(k.toInt), s"rank $k: got ${got(k)}, want ${sorted(k.toInt)}")
    }
  }

  test("EditJoin salted hot-equality path == uncapped pairs on a template-heavy corpus") {
    // 8 identical "template" strings per side (over the cap of 3, so the
    // equality path takes the salted join) plus a unique near-miss pair
    // (witnessed by non-hot segments, so the cap must not touch it)
    val l = ((0L until 8L).map(i => (i, "tmpl-string-xx")) :+ (100L, "unique-left-str")).toDF("id", "s")
    val r = ((10L until 18L).map(i => (i, "tmpl-string-xx")) :+ (200L, "unique-left-stz")).toDF("id", "s")
    def pairs(cap: Long) =
      graft.operators.EditJoin.join(l, r, "id", "s", k = 1, maxSegFreq = cap)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(pairs(3L) == pairs(0L))
  }

  test("winsorize histogram-selected bounds == brute-force clip") {
    val rows = skewed(4000).map { case (id, w) => (id, w * 7 - 3) }
    val df = spark.createDataFrame(rows).toDF("id", "v").repartition(6)
    val out = Calibration.winsorize(df, col("v"), "id", 10, 990, "cv")
      .select(col("id"), col("cv"), col("clipped")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val sorted = rows.map(_._2).sorted
    val n = sorted.size
    val lo = sorted((10L * (n - 1) / 1000L).toInt)
    val hi = sorted((990L * (n - 1) / 1000L).toInt)
    rows.sortBy(_._1).zip(out).foreach { case ((id, v), (oid, cv, fl)) =>
      assert(oid == id)
      assert(cv == math.min(math.max(v, lo), hi), s"clip at id=$id")
      assert(fl == (v < lo || v > hi))
    }
  }
}

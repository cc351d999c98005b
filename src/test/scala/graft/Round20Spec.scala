package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ann.Ann
import graft.operators.EditJoin
import graft.plan.QueryExecutor
import graft.functions.gf

/** Round-20 pins for the r19 ADVICE items: atomicPublish's
  * rename-into-existing-directory race (the legacy Hadoop rename returns
  * TRUE after nesting the loser's temp under the winner), EditJoin's
  * hot-segment cap breaking the all-pairs contract for template groups
  * (now opt-in + exact-equality re-admission), semDedup's inherited
  * bucket cap silently under-deduplicating dense clusters (now default
  * off), pqAdcTopK's out-of-range code values reading slot-0 garbage, and
  * roundHalfUp's unenforced scale contract. Each behavioral test fails
  * before its round-20 change. */
class Round20Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------ atomicPublish nesting

  test("atomicPublish: losing racer never nests its temp under the winner") {
    val root = java.nio.file.Files.createTempDirectory("r20pub")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def mk(rel: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root.toString, rel)
      fs.mkdirs(p)
      fs.create(new org.apache.hadoop.fs.Path(p, "_SUCCESS")).close()
      p
    }
    // winner already published; the loser's publish must NOT leave
    // dst/<tmp.name> behind (the legacy FileSystem.rename moves src INTO
    // an existing destination directory and returns true — a later
    // spark.read.parquet(dst) would read the loser's part-files TWICE)
    val winnerTmp = mk("c.tmp-w")
    val dst = new org.apache.hadoop.fs.Path(root.toString, "c")
    QueryExecutor.atomicPublish(fs, winnerTmp, dst)
    val loserTmp = mk("c.tmp-l")
    QueryExecutor.atomicPublish(fs, loserTmp, dst)
    assert(!fs.exists(loserTmp), "loser temp must be cleaned up")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst, "c.tmp-l")),
      "loser temp must not be nested under the published destination")
    // winner content intact
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "_SUCCESS")))
    assert(fs.listStatus(dst).map(_.getPath.getName).toSet == Set("_SUCCESS"))
  }

  // ------------------------------------------------ EditJoin contract

  test("EditJoin: default is uncapped (all-pairs contract)") {
    // before r20 the silent default cap (10000) existed; the contract is
    // now cap-free unless opted into
    val l = Seq((0L, "alpha"), (2L, "alphx")).toDF("id", "s")
    val r = Seq((1L, "alpha"), (3L, "alphy")).toDF("id", "s")
    val got = EditJoin.join(l, r, "id", "s", k = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 0L), (0L, 3L, 1L), (2L, 1L, 1L),
      (2L, 3L, 1L)))
  }

  test("EditJoin: opted-in cap still admits exact-duplicate pairs of a hot template group") {
    // 6 identical strings per side: with maxSegFreq=3 every witnessing
    // (length, seg, segment) key is hot on both sides, so before r20 the
    // cap dropped ALL pairs among them — including the dist=0 exact
    // duplicates that are the primary dedup case. The equality pre-join
    // re-admits them; only near-miss (dist>=1) pairs witnessed solely by
    // hot segments remain a documented, WARN-logged under-count.
    val l = (0 until 6).map(i => (i.toLong, "templated-row")).toDF("id", "s")
    val r = (10 until 16).map(i => (i.toLong, "templated-row")).toDF("id", "s")
    val got = EditJoin.join(l, r, "id", "s", k = 1, maxSegFreq = 3L)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    val expect = (for { a <- 0 until 6; b <- 10 until 16 }
      yield (a.toLong, b.toLong, 0L)).toSet
    assert(got == expect)
  }

  // ------------------------------------------------ semDedup exact recall

  test("semDedup: dense cluster past the old bucket cap dedups to one survivor per direction") {
    // 8 orthogonal directions x 1030 copies = 8240 rows in ONE nearest-
    // centroid bucket (every row closest to the same single centroid):
    // before r20, semDedup's inherited maxBucketSize=8192 sub-split the
    // bucket and kept one survivor PER SUB-SPLIT per direction (~2x the
    // true survivors) — the densest near-duplicate clusters are exactly
    // where a dedup op must not under-deduplicate. Default is now exact.
    val dim = 8
    val copies = 1030
    val rows = for { d <- 0 until dim; c <- 0 until copies } yield {
      val v = Array.fill(dim)(0.0f); v(d) = 1.0f
      ((d * copies + c).toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    // one centroid far from nothing: all rows share the bucket
    val centroids = Array(Array.fill(dim)(1.0 / math.sqrt(dim.toDouble)))
    val out = Dedup.semDedup(df, "vec_id", "embedding", centroids, threshold = 0.9)
    val survivors = out.select("vec_id").as[Long].collect().toSet
    // greedy min-id survivor per direction
    val expect = (0 until dim).map(d => (d * copies).toLong).toSet
    assert(survivors == expect,
      s"expected ${expect.size} survivors, got ${survivors.size}")
  }

  // ------------------------------------------------ pqAdcTopK range guard

  test("pqAdcTopK: out-of-range code values rank last as null, not slot-0 garbage") {
    // m=2 subspaces, ksub=2 centroids each; query sits ON centroid 0 of
    // both subspaces, so table[0] = 0.0 per subspace — slot-0 garbage for
    // a malformed row would read as adc_dist = 0.0, the BEST possible
    // distance (the failure mode at its most damaging)
    val codebooks = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val query = Seq(0.0, 0.0, 0.0, 0.0)
    val df = Seq(
      (0L, Seq(0, 0)),             // exact: dist 0
      (1L, Seq(1, 1)),             // dist 4
      (2L, Seq(2, 0)),             // code 2 >= ksub: malformed
      (3L, Seq(-1, 0))             // negative code: malformed
    ).toDF("id", "codes")
    val got = Ann.pqAdcTopK(df, "id", "codes", codebooks, query, k = 4)
      .select("id", "adc_dist").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(0L).contains(0.0) && got(1L).contains(4.0))
    assert(got(2L).isEmpty && got(3L).isEmpty,
      s"malformed codes must yield null adc_dist, got $got")
    // and nulls rank LAST: top-2 is exactly the two valid rows
    val top2 = Ann.pqAdcTopK(df, "id", "codes", codebooks, query, k = 2)
      .select("id").as[Long].collect().toSet
    assert(top2 == Set(0L, 1L))
  }

  // ------------------------------------------------ triangle join strategy

  test("triangle enumeration keeps sort-merge joins under AQE (merge hints honored)") {
    // the r20 memory probe pinned AQE's SMJ->shuffled-hash conversion as a
    // stage-killer for the wedge joins (the hash BUILD side cannot spill,
    // and graph joins are where per-partition size stats mislead the
    // planner); the MERGE hints must survive into the AQE-final plan
    val edges = (0 until 200).flatMap(i =>
      Seq((i.toLong, ((i + 1) % 200).toLong), (i.toLong, ((i + 2) % 200).toLong)))
      .toDF("s", "d")
    val tri = graft.operators.Triangles.enumerate(edges, "s", "d")
    assert(tri.count() == 200) // each i closes (i, i+1, i+2) exactly once
    val plan = tri.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffledHashJoin"),
      s"wedge join converted to a non-spillable hash build:\n${plan.take(1500)}")
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
  }

  // ------------------------------------------------ roundHalfUp contract

  test("roundHalfUp: out-of-contract scales fail loudly") {
    intercept[IllegalArgumentException](gf.roundHalfUp(lit(1.5), 16))
    intercept[IllegalArgumentException](gf.roundHalfUp(lit(1.5), -1))
    // the SQL surface exposes arbitrary scales — same loud failure
    GraftSqlFunctions.register(spark)
    intercept[Exception](
      spark.sql("SELECT gf_round_half_up(1.5, 16)").collect())
    // in-contract boundary stays fine
    val ok = spark.sql("SELECT gf_round_half_up(1.5, 15) AS v").collect()
    assert(ok.head.getDouble(0) == 1.5)
  }
}

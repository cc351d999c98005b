package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-invariance matrix (round 19): every gate runs its oracle at
  * ONE sf and ONE partitioning, so a bug that depends on partition count or
  * row order — tie-breaks, accumulator folds, first()-style nondeterminism,
  * per-partition RNG — is invisible to the correctness gate by
  * construction (r18's element_at/null-ordering bug was exactly of this
  * family). This spec re-executes a representative gate subset under a
  * matrix of shuffle partitions × scan-split sizes and asserts the
  * canonical result hash (columns sorted by name, rows sorted, stringified
  * — the driver's comparison) is identical in every cell.
  *
  * The subset covers the families the verdict called out: sampling,
  * ANN/top-k ties, kmeans/clustering, windows, reduce, rerank, and the
  * streaming checksum gate. Operator-level input-repartition laws
  * (repartition ∈ {1, 7, 32}) live in Round19Spec's sampling-law test;
  * here the lever for file-backed gates is files.maxPartitionBytes, which
  * changes the SCAN split count the way a different cluster would. */
class InvarianceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** Driver-style canonical hash: sorted column names, all values
    * stringified, rows sorted — row order and column order free. */
  private def resultHash(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val rows = df
      .select(cols.map(c => coalesce(col(c).cast("string"), lit("␀"))): _*)
      .collect()
      .map(_.toSeq.mkString(""))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  // (shuffle partitions, scan max split bytes): cell 1 is a 1-reducer
  // 1-split degenerate cluster, cell 2 the test default, cell 3 a wide
  // cluster with fragmented scans (64 KiB splits -> many input partitions)
  private val matrix = Seq(
    ("1", "134217728"),
    ("32", "134217728"),
    ("200", "65536"))

  private val gateSubset = Seq(
    // sampling family
    "q_random_sample", "q_weighted_sample", "q_sample_hash", "q_sample_stratified",
    "q_epoch_mixture",
    // ANN / top-k tie-breaks
    "q_ann_bruteforce", "q_ann_ivf", "q_ann_pq", "q_ann_sq8",
    "q_sort_topk", "q_docset_topk", "q_topk_groups", "q_rerank",
    // kmeans / clustering
    "q_clustering", "q_nlq_kmeans", "q_cluster_entity",
    // windows / analytic
    "q_window_rank", "q_window_running", "q_rolling_window", "q_time_window",
    // order-sensitive folds
    "q_reduce", "q_rank_bins",
    // partition-indexed selection / rank machinery (twoMiddleSumSel walks
    // partitions by index; globalRank prefix-sums per partition — the
    // shapes MOST at risk of partition-count dependence)
    "q_robust_outliers", "q_winsorize", "q_percentiles", "q_moments",
    "q_pack_sequences", "q_quality_calibrated",
    // sketch finalize + score-ordered fusion + scoring tie-breaks
    "q_heavy_hitters", "q_rrf_fusion", "q_bm25",
    "q_line_dedup", "q_dedup_keep_best", "q_simhash_pairs",
    // iterative + dedup shapes whose tie-breaks must not see partitioning
    "q_pagerank", "q_minhash_dedup", "q_semdedup", "q_cosine_pairs",
    // streaming checksum
    "q_stream_e2e")

  test("gate subset: canonical hash is identical across the partitioning matrix") {
    val qs = SparkEntry.queries
    val missing = gateSubset.filterNot(qs.contains)
    assert(missing.isEmpty, s"unknown gates in subset: $missing")
    val shuffle0 = spark.conf.get("spark.sql.shuffle.partitions")
    val split0 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      for (name <- gateSubset) {
        val hashes = matrix.map { case (shuffle, split) =>
          spark.conf.set("spark.sql.shuffle.partitions", shuffle)
          spark.conf.set("spark.sql.files.maxPartitionBytes", split)
          resultHash(qs(name)(spark, sfDir))
        }
        if (hashes.distinct.size != 1)
          failures += s"$name: ${hashes.mkString(", ")}"
      }
      assert(failures.isEmpty,
        s"partition-dependent gates:\n${failures.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", shuffle0)
      spark.conf.set("spark.sql.files.maxPartitionBytes", split0)
    }
  }
}

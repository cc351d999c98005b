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

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("gate subset: canonical hash is identical across the partitioning matrix") {
    val qs = SparkEntry.queries
    val missing = gateSubset.filterNot(qs.contains)
    assert(missing.isEmpty, s"unknown gates in subset: $missing")
    withConfs() {
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      for (name <- gateSubset) {
        val hashes = matrix.map { case (shuffle, split) =>
          var h: String = null
          withConfs("spark.sql.shuffle.partitions" -> shuffle,
            "spark.sql.files.maxPartitionBytes" -> split) {
            h = resultHash(qs(name)(spark, sfDir))
          }
          h
        }
        if (hashes.distinct.size != 1)
          failures += s"$name: ${hashes.mkString(", ")}"
      }
      assert(failures.isEmpty,
        s"partition-dependent gates:\n${failures.mkString("\n")}")
    }
  }

  test("FULL surface: every remaining gate hash-stable in the wide-fragmented cell") {
    // round-20 closure of the uncovered-config class (the r19 sf0.1 sweep
    // proved that class pays): every gate NOT in the curated subset runs
    // once at the canonical cell and once at (200 reducers, 64 KiB scan
    // splits) — a wide cluster with fragmented inputs — and the driver-
    // style hash must match. Together with the matrix test above, all
    // gates are partition-invariance-checked every round.
    val qs = SparkEntry.queries
    val rest = qs.keys.toSeq.sorted.filterNot(gateSubset.contains)
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- rest) {
      var canonical: String = null
      var alt: String = null
      withConfs("spark.sql.shuffle.partitions" -> "32",
        "spark.sql.files.maxPartitionBytes" -> "134217728") {
        canonical = resultHash(qs(name)(spark, sfDir))
      }
      withConfs("spark.sql.shuffle.partitions" -> "200",
        "spark.sql.files.maxPartitionBytes" -> "65536") {
        alt = resultHash(qs(name)(spark, sfDir))
      }
      if (canonical != alt) failures += name
    }
    assert(failures.isEmpty,
      s"partition-dependent gates (full-surface cell):\n${failures.mkString("\n")}")
  }

  test("gate subset: hash invariant to AQE (adaptive coalescing / skew split)") {
    // AQE re-plans at runtime — coalesced shuffle partitions and split
    // skew joins are a partition-dependence class the static matrix cannot
    // see (and the codegen-health pass runs with AQE off, so nothing else
    // asserts result equality under it). 200 initial reducers make the
    // coalescer actually fire at sf0.001.
    val qs = SparkEntry.queries
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- gateSubset) {
      val hashes = Seq("false", "true").map { aqe =>
        var h: String = null
        withConfs("spark.sql.shuffle.partitions" -> "200",
          "spark.sql.adaptive.enabled" -> aqe,
          "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.enabled" -> "true") {
          h = resultHash(qs(name)(spark, sfDir))
        }
        h
      }
      if (hashes.distinct.size != 1) failures += name
    }
    assert(failures.isEmpty,
      s"AQE-dependent gates:\n${failures.mkString("\n")}")
  }
}

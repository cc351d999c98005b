package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (Array[Float]). The reference has no ANN operator (vector search is
 * delegated to external stores, reference: lib/sycamore/sycamore/connectors/);
 * for a self-contained 100 TB engine we provide:
 *
 *  - bruteForceTopK: exact top-k by cosine — a single scan + TakeOrdered,
 *    the correctness baseline and perfectly scalable for one-off queries
 *    (no shuffle of the corpus, only a k-row result per partition).
 *  - ivfTopK: IVF-style two-stage search — assign vectors to their nearest
 *    centroid (NearestCentroidExpr: one plan node at ANY nlist), probe only
 *    the nprobe lists nearest the query.
 *  - buildIvfIndex / ivfTopKIndexed: the 100 TB path — corpus persisted
 *    PARTITIONED BY centroid_id, so a probe is parquet partition PRUNING
 *    (reads nprobe/nlist of the data), not a filter over a full scan.
 *
 * Recall caveat: IVF (like any partitioning index) presumes clusterable
 * vectors. On uniformly-random unit vectors recall degenerates to
 * ~nprobe/nlist — a property of the data, not the index; real embedding
 * corpora cluster and recall@10 >= 0.9 at nprobe/nlist ~ 1/8 is typical
 * (see DedupAnnSpec "IVF recall" test).
 */
object Ann {

  /** Literal vector -> array<double> column. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  /**
   * Exact top-k by cosine similarity against a literal query vector.
   * Plan shape: scan -> project (codegen'd dot product) -> TakeOrderedAndProject
   * (per-partition top-k, then k-way merge on the driver) — no full sort,
   * no shuffle.
   */
  def bruteForceTopK(df: DataFrame, id: String, vec: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val sim = gf.cosineSimilarity(col(vec), vecLit(query))
    df.select(col(id), sim.as("cosine"))
      .orderBy(desc("cosine"), col(id))
      .limit(k)
  }

  /** Nearest-centroid id for a vector column (argmin squared L2 over the
    * codebook). One expression node regardless of nlist. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column = {
    val e = org.apache.spark.sql.graft.ColumnBridge.expression(vec.cast("array<double>"))
    org.apache.spark.sql.graft.ColumnBridge.column(NearestCentroidExpr(e, centroids))
  }

  /** Deterministic centroid selection: every (nRows/nlist)-th row by id hash
    * order — cheap, shuffle-free codebook bootstrap. For tighter lists run
    * MLlib KMeans (DocSet.kmeans) and pass its centers instead. */
  def sampleCentroids(df: DataFrame, id: String, vec: String, nlist: Int): Array[Array[Double]] =
    df.select(col(vec).cast("array<double>").as("v"))
      .orderBy(xxhash64(col(id)))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /**
   * IVF top-k, in-memory variant: assign each row to its nearest centroid,
   * scan only rows whose list is among the query's nprobe nearest centroids.
   */
  def ivfTopK(df: DataFrame, id: String, vec: String,
              centroids: Array[Array[Double]],
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probed = probeSet(centroids, query, nprobe)
    val assigned = df.withColumn("centroid_id", nearestCentroid(col(vec), centroids))
    bruteForceTopK(assigned.where(col("centroid_id").isin(probed: _*)),
      id, vec, query, k)
  }

  /** The nprobe centroid ids nearest the query (by cosine). */
  def probeSet(centroids: Array[Array[Double]], query: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, cid) => (cid, cosine(c, query)) }
      .sortBy(-_._2).take(nprobe).map(_._1).toSeq

  /**
   * Persist an IVF index: corpus written partitioned by centroid_id.
   * At 100 TB this is the load-once/query-many layout — each probe reads
   * only its partition directories (partition pruning at the file index,
   * before any task is scheduled).
   */
  def buildIvfIndex(df: DataFrame, vec: String,
                    centroids: Array[Array[Double]], path: String): Unit =
    df.withColumn("centroid_id", nearestCentroid(col(vec), centroids))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** Query a persisted IVF index: the centroid_id IN (...) predicate prunes
    * parquet partitions — `.explain` shows PartitionFilters, not a scan. */
  def ivfTopKIndexed(spark: SparkSession, path: String, id: String, vec: String,
                     centroids: Array[Array[Double]],
                     query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probed = probeSet(centroids, query, nprobe)
    bruteForceTopK(
      spark.read.parquet(path).where(col("centroid_id").isin(probed: _*)),
      id, vec, query, k)
  }

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }
}

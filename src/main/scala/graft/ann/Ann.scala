package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
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
 *  - ivfTopK: IVF-style two-stage search — assign vectors to nprobe nearest
 *    centroids, search only those inverted lists. At 100 TB the centroid
 *    assignment is a bucketed/partitioned layout, so a query touches
 *    nprobe/nlist of the data.
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

  /**
   * IVF top-k: centroids is a small table (centroidId, centroid float array)
   * broadcast to assign each row to its nearest centroid; the query probes
   * the `nprobe` centroids nearest to it and only scans those lists.
   *
   * For a persisted index, write the corpus partitioned by centroidId —
   * then the probe is partition pruning, not a filter.
   */
  def ivfTopK(df: DataFrame, id: String, vec: String,
              centroids: Seq[(Int, Seq[Double])],
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probed = centroids
      .map { case (cid, c) => (cid, cosine(c, query)) }
      .sortBy(-_._2).take(nprobe).map(_._1).toSet
    val assigned = withCentroidId(df, vec, centroids)
    bruteForceTopK(assigned.where(col("centroid_id").isin(probed.toSeq: _*)),
      id, vec, query, k)
  }

  /** Assign each row to its nearest centroid (argmin of squared L2 over the
    * broadcast centroid list), as a pure codegen'd expression. */
  def withCentroidId(df: DataFrame, vec: String,
                     centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val scored = centroids.map { case (cid, c) =>
      val d2 = c.zipWithIndex.map { case (x, i) =>
        val diff = element_at(col(vec), i + 1).cast("double") - lit(x)
        diff * diff
      }.reduce(_ + _)
      struct(d2.as("d2"), lit(cid).as("cid"))
    }
    df.withColumn("centroid_id", array_min(array(scored: _*)).getField("cid"))
  }

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Triangle counting over an undirected edge list — with PageRank and
 * connected components, the third classic large-graph benchmark (cluster
 * cohesion of near-dup groups, community density of co-occurrence graphs).
 *
 * Canonical "forward" formulation: orient every edge low->high, join
 * (a,b)&(b,c) to enumerate open wedges, close them against (a,c). Each
 * triangle a<b<c is produced exactly once, and orienting by vertex order
 * bounds the wedge expansion by each vertex's FORWARD degree (the standard
 * trick that tames high-degree hubs; orienting by degree-then-id tightens
 * it further for adversarial skew). All exchanges carry vertex-id pairs.
 */
object Triangles {

  /** Total triangle count (one row: n_triangles). */
  def count(edges: DataFrame, src: String, dst: String): DataFrame =
    enumerate(edges, src, dst).agg(
      org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))

  /** One row per triangle (a < b < c). */
  def enumerate(edges: DataFrame, src: String, dst: String): DataFrame = {
    // the canonical edge table feeds three join branches with different
    // keys — materialize it once (upstream edge derivation can be an
    // arbitrary pipeline; recomputing it thrice triples the dominant cost)
    val e = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .where(col("a") =!= col("b")) // drop self-loops
      .distinct()
      .localCheckpoint()
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("_wa"), col("e1.b").as("_wb"), col("e2.b").as("_wc"))
    wedges.join(e.as("e3"),
        col("_wa") === col("e3.a") && col("_wc") === col("e3.b"))
      .select(col("_wa").as("a"), col("_wb").as("b"), col("_wc").as("c"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/**
 * Link prediction over an undirected graph — the classic neighborhood
 * scores (Liben-Nowell & Kleinberg 2003) for every candidate NON-edge at
 * distance 2: common-neighbor count, preferential attachment (degree
 * product) and neighborhood Jaccard. All three are exact integers or a
 * ratio of exact integers (rounded 6dp) — Adamic-Adar is deliberately
 * absent because its Σ 1/log(deg) denominator is libm territory the
 * cross-engine oracle cannot replay bit-for-bit.
 *
 * 100 TB shape: the 2-hop enumeration is one self-join on the middle
 * vertex with map-side pre-aggregation into (pair → count) — work is
 * Σ deg(v)², the true size of the 2-hop neighborhood, never |V|²; the
 * known-edge anti-join and two degree joins key on vertex ids. Hub
 * vertices dominating Σ deg² is inherent to the statistic — cap degrees
 * upstream (frequentPairs' minSupport) as real pipelines do.
 */
object LinkPredict {

  /** Scores for distance-2 non-edges: (a, b, cn, pa, jaccard), a < b,
    * id-ordered. `edges` must be canonical undirected pairs (a < b). */
  def scores(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .persist(MEMORY_AND_DISK)
    val und = e.select(col("_a").as("_s"), col("_b").as("_d"))
      .unionAll(e.select(col("_b").as("_s"), col("_a").as("_d")))
      .persist(MEMORY_AND_DISK)
    val deg = und.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
      .persist(MEMORY_AND_DISK)

    // (a, b) at distance 2 with the middle-vertex count = |Γ(a) ∩ Γ(b)|
    val two = und.as("x").join(und.as("y"),
        col("x._d") === col("y._d") && col("x._s") < col("y._s"))
      .groupBy(col("x._s").as("_a"), col("y._s").as("_b"))
      .agg(count(lit(1)).as("cn"))
    val nonEdges = two.join(e, Seq("_a", "_b"), "left_anti")

    val verified = nonEdges
      .join(deg.select(col("_s").as("_a"), col("_deg").as("_da")), "_a")
      .join(deg.select(col("_s").as("_b"), col("_deg").as("_db")), "_b")
      .select(col("_a").as("a"), col("_b").as("b"), col("cn"),
        (col("_da") * col("_db")).as("pa"),
        round(col("cn").cast("double") /
          (col("_da") + col("_db") - col("cn")), 6).as("jaccard"))
      .persist(MEMORY_AND_DISK)
    verified.orderBy(col("a"), col("b"))
  }
}

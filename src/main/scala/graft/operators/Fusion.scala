package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rank-fusion for hybrid retrieval — the engine-native version of what the
 * reference delegates to OpenSearch hybrid queries (reference query
 * pipelines score lexically AND by knn vector, then fuse server-side;
 * here both rankings come from engine operators: Bm25.score, Ann top-k /
 * cosine, rerank scores, quality priors).
 *
 * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
 * rrf(d) = sum_i 1 / (k + rank_i(d)), rank 1-based; documents absent from a
 * ranking contribute nothing for it. k=60 is the paper's constant.
 *
 * Determinism: ranks are exact integers from a deterministic total order
 * (score desc, id asc) computed by Packing.globalRank's two-phase prefix
 * rank — the corpus never funnels through a single-partition window. The
 * fused score is a fixed-length left-to-right sum of exactly-rounded
 * divisions, so it cross-engine hash-matches.
 *
 * 100 TB shape: each ranking costs one range-partitioned sort of (id,
 * score) pairs — never document text — plus a bounded per-partition-counts
 * collect; the fusion itself is an id-keyed outer join of the rank tables.
 */
object Fusion {

  def rrf(rankings: Seq[DataFrame], id: String, score: String,
          k: Int = 60, outCol: String = "rrf"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k >= 0, s"rrf k must be non-negative, got $k")
    val ranked = rankings.zipWithIndex.map { case (r, i) =>
      Packing.globalRank(r.select(col(id), col(score).as("_s")),
          Seq(col("_s").desc), id, s"_r$i")
        .select(col(id), (lit(1.0) / (lit(k.toDouble) + col(s"_r$i") + lit(1.0)))
          .as(s"_rrf$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(id), "full"))
    val total = ranked.indices.map(i => coalesce(col(s"_rrf$i"), lit(0.0))).reduce(_ + _)
    joined.select(col(id), total.as(outCol))
  }
}

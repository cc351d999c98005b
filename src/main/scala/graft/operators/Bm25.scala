package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BM25 relevance scoring of a corpus against a bag of query terms — the
 * standard lexical ranking the reference delegates to OpenSearch
 * (reference: transforms/query.py executes remote retrieval; this is the
 * engine-native equivalent so rerank/eval pipelines run without a server).
 *
 * Scale shape: corpus statistics (N, Σdl, per-term document frequency) come
 * out of ONE aggregation pass, ride back as a broadcast single row, and the
 * score itself is a pure per-row expression — two corpus scans total, no
 * shuffle keyed on text, no inverted index needed for a fixed query bag.
 */
object Bm25 {

  def score(df: DataFrame, id: String, text: String, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(trim(lower(col(text))), "\\s+")
    val base = df.select(col(id), toks.as("_toks"), size(toks).as("_dl"))
    val statAggs = Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("_toks"), t), 1L).otherwise(0L)).as(s"_df$i")
      }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val withStats = base.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / n
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("_toks"), x => x === t)).cast("double")
      val dfT = col(s"_df$i").cast("double")
      // Robertson-Sparck Jones idf in the "+1" (non-negative) form
      val idf = log(lit(1.0) + (n - dfT + 0.5) / (dfT + 0.5))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withStats.select(col(id), score.as("bm25"))
  }
}

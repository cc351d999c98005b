package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"): score
 * every raw document by how much more likely its hashed n-gram bag is under
 * a TARGET distribution (curated text you want more of) than under the raw
 * SOURCE distribution, then keep the top mass. The standard recipe for
 * steering a 100 TB crawl toward a wiki/book-like mixture without training
 * a model.
 *
 * Spark-first decomposition:
 *  1. bucket counts: unigrams + bigrams hashed into `numBuckets` via the
 *     codegen `pmod(hash(ngram), numBuckets)` (Catalyst murmur3, seed 42
 *     — no interpreted per-n-gram call anywhere in the hot path) —
 *     ONE explode + groupBy per corpus, output bounded at `numBuckets`
 *     rows regardless of corpus size;
 *  2. the importance table λ[b] = log p_target(b) − log p_source(b)
 *     (Laplace-smoothed), quantized to int64 MICRO-NATS at the driver —
 *     a fixed-size array, legitimately collectable at ANY scale;
 *  3. scoring: broadcast λ, one row-local pass summing λ[h(ngram)] over
 *     each document's n-grams in pure int64 — the 100 TB half is map-only,
 *     embarrassingly parallel, zero shuffle. This pass is a Scala udf BY
 *     CHOICE: the interpreted boundary is crossed once per DOCUMENT (a
 *     tight JVM loop over the broadcast array inside), unlike a
 *     per-n-gram udf; the codegen alternatives either re-shuffle by doc
 *     (explode + broadcast-join + re-agg) or embed the λ table as a plan
 *     literal every task deserializes — both worse at scale;
 *  4. selection: top-k by (weight, doc_id) — deterministic rank, a
 *     two-phase global TakeOrdered, never a single-partition window.
 *
 * Quantizing λ driver-side makes the per-doc weight EXACT integer
 * arithmetic: the cross-engine gate literalizes per-n-gram weights into
 * the DuckDB oracle (the q_bpe_encode pattern) and hash-matches with no
 * float-summation hazard; libm differences cannot matter because both
 * engines consume the SAME quantized table.
 */
object Dsir {

  /** Unigrams + bigrams of the engine tokenizer's output. */
  private[graft] def ngrams(words: Seq[String]): Seq[String] =
    words ++ words.iterator.sliding(2).withPartial(false).map(_.mkString(" ")).toSeq

  private[graft] def ngramsColPublic(text: Column): Column = ngramsCol(text)

  private def ngramsCol(text: Column): Column = {
    val toks = filter(graft.functions.gf.tokens(text), t => t =!= "")
    // slice length must be size(toks), not Int.MaxValue — Slice computes
    // start+length in int, and the overflow silently yields an empty array
    val bis = filter(
      zip_with(toks, slice(toks, lit(2), size(toks)), (a, b) => concat_ws(" ", a, b)),
      g => size(split(g, " ")) === 2)
    concat(toks, bis)
  }

  /** Driver-side twin of `pmod(hash(ng), numBuckets)` — the SAME murmur3
    * (seed 42 over UTF-8 bytes, int-truncated) Catalyst codegens, so the
    * scoring udf and the importance table index identically. */
  private[graft] def bucketOf(ng: String, numBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(ng),
      org.apache.spark.sql.types.StringType, 42L).toInt
    val m = h % numBuckets
    if (m < 0) m + numBuckets else m
  }

  /** (bucket, cnt) for a corpus — output bounded at numBuckets rows.
    * The bucket hash is pure codegen (whole-stage fused with the explode);
    * an earlier HashingTF.indexOf udf here was the one interpreted
    * per-n-gram call in the curation family. */
  def bucketCounts(df: DataFrame, text: String, numBuckets: Int): DataFrame =
    df.select(explode(ngramsCol(col(text))).as("ng"))
      .select(pmod(hash(col("ng")), lit(numBuckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Dense per-bucket λ in micro-nats (Laplace add-one smoothing on both
    * sides). Driver-side by design: the table is numBuckets entries no
    * matter how big the corpora are. */
  def importanceTable(target: DataFrame, source: DataFrame, text: String,
                      numBuckets: Int): Array[Long] = {
    def dense(df: DataFrame): Array[Long] = {
      val a = new Array[Long](numBuckets)
      bucketCounts(df, text, numBuckets).collect()
        .foreach(r => a(r.getAs[Int]("bucket")) = r.getAs[Long]("cnt"))
      a
    }
    val t = dense(target); val s = dense(source)
    val tTot = t.sum.toDouble + numBuckets
    val sTot = s.sum.toDouble + numBuckets
    Array.tabulate(numBuckets) { b =>
      math.round((math.log((t(b) + 1) / tTot) - math.log((s(b) + 1) / sTot)) * 1e6)
    }
  }

  /** Adds `out` = Σ_ngram λ_µ[h(ngram)] — broadcast table, map-only. */
  def scoreMicros(df: DataFrame, text: String, table: Array[Long],
                  out: String = "dsir_micros"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(table)
    val n = table.length
    val score = udf { toks: Seq[String] =>
      var z = 0L
      if (toks != null)
        ngrams(toks.filter(t => t != null && t.nonEmpty))
          .foreach(ng => z += bc.value(bucketOf(ng, n)))
      z
    }
    df.withColumn(out, score(graft.functions.gf.tokens(col(text))))
  }

  /** Keep the k highest-weight docs, deterministic (weight desc, id asc).
    * Global TakeOrdered — Catalyst plans sort+limit as a two-phase top-k,
    * never a full sort. */
  def selectTopK(scored: DataFrame, idCol: String, k: Int,
                 weightCol: String = "dsir_micros"): DataFrame =
    scored.orderBy(desc(weightCol), col(idCol)).limit(k)

  /** (ngram, λ_µ[h(ngram)]) for every distinct corpus n-gram with a nonzero
    * weight — ORACLE-GENERATION ONLY (collects the n-gram vocabulary, which
    * is bounded at gate scale; the scoring path needs no vocabulary). */
  def ngramWeights(corpus: DataFrame, text: String, table: Array[Long],
                   maxVocab: Int = 200000): Seq[(String, Long)] = {
    val ngs = corpus.select(explode(ngramsCol(col(text))).as("ng"))
      .distinct().limit(maxVocab + 1).collect().map(_.getString(0))
    require(ngs.length <= maxVocab,
      s"ngramWeights is oracle-generation-only; vocabulary exceeds $maxVocab")
    ngs.toSeq.map(ng => ng -> table(bucketOf(ng, table.length)))
      .filter(_._2 != 0L).sortBy(_._1)
  }
}

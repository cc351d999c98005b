package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gf

/**
 * Byte-pair-encoding subword training and encoding (Sennrich et al. 2016)
 * — turns the engine's "BPE-ish" token-count heuristic into a real learned
 * subword vocabulary, trained ON the corpus being processed.
 *
 * Scale design (the standard trainer formulation): BPE statistics depend
 * only on the WORD HISTOGRAM, not on document structure — so the corpus
 * contributes exactly one scan (explode -> count), the histogram is capped
 * to the `maxWords` most frequent forms (a TakeOrderedAndProject; rare
 * tail forms cannot win a merge anyway), and the merge loop — inherently
 * sequential, one merge depends on the last — runs on the driver over that
 * bounded histogram. 100 TB of text changes the scan cost, never the
 * training loop's memory or time.
 *
 * Encoding is a single custom expression (BpeEncodeExpr): the merge table
 * rides as ONE reference object (same pattern as NearestCentroidExpr's
 * codebook), each row's tokens encode in one pass with a rank-greedy merge
 * loop, and the expression composes with the rest of the column library.
 */
object Bpe {

  /** Ordered merge list; earlier = higher priority. */
  type Merges = Seq[(String, String)]

  def train(df: DataFrame, text: String, numMerges: Int,
            maxWords: Int = 50000, minPairCount: Long = 2): Merges = {
    require(numMerges > 0, "numMerges must be positive")
    val hist = df
      .select(explode(gf.tokens(col(text))).as("_w"))
      .where(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("_c"))
      .orderBy(desc("_c"), col("_w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges, minPairCount)
  }

  /** The sequential merge loop over a bounded (word, freq) histogram —
    * exposed for tests and for pre-computed histograms. Deterministic:
    * best pair by (count desc, pair lexicographic). */
  def trainFromHistogram(hist: Seq[(String, Long)], numMerges: Int,
                         minPairCount: Long = 2): Merges = {
    var words: Seq[(Array[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (merges.size < numMerges && continue) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= minPairCount)
      if (best.isEmpty) continue = false
      else {
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (syms, c) => (mergeOnce(syms, pair), c) }
      }
    }
    merges.toSeq
  }

  private[operators] def mergeOnce(syms: Array[String],
                                   pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word with rank-greedy BPE (repeatedly merge the
    * lowest-rank adjacent pair present). Called from generated code. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = mergeOnce(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms
  }

  /** Subword tokens of whitespace-tokenized text under the trained merges
    * (array<string> column). */
  def encode(text: Column, merges: Merges): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeEncodeExpr(org.apache.spark.sql.graft.ColumnBridge.expression(gf.tokens(text)),
        merges.toVector))

  /** Learned-subword token count — the real version of gf.bpeishTokenCount. */
  def tokenCount(text: Column, merges: Merges): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(encode(text, merges)))
}

package graft.embed

/**
 * Pluggable text embedder (reference: lib/sycamore/sycamore/transforms/
 * embed.py:33-404 — SentenceTransformer/OpenAI/Bedrock embedders behind one
 * interface, batched per worker). Implementations must be deterministic per
 * input for retry-safety.
 */
trait Embedder extends Serializable {
  def dim: Int
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/**
 * Deterministic offline embedder: hashed bag-of-words into `dim` buckets,
 * L2-normalized. Not semantically meaningful, but preserves the geometry
 * tests need (identical texts -> identical vectors; token overlap ->
 * cosine similarity), with zero model dependencies.
 */
final class HashEmbedder(override val dim: Int = 64) extends Embedder {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    for (tok <- t.toLowerCase.split("\\s+") if tok.nonEmpty) {
      val h = scala.util.hashing.MurmurHash3.stringHash(tok)
      val idx = math.floorMod(h, dim)
      v(idx) += (if (((h >>> 16) & 1) == 0) 1.0f else -1.0f)
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) { var i = 0; while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 } }
    v
  }
}

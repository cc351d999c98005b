package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup

class DedupAnnSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the old river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the old creek bank"), // near dup of 0
    (3L, "completely unrelated document discussing distributed query processing engines"),
    (4L, "another separate text about machine learning training corpora and tokens"))
    .toDF("doc_id", "text")

  test("exact dedup keeps min id with copy counts") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
    val rows = Dedup.exactRows(corpus, "doc_id", "text").orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(rows == Seq(0L, 2L, 3L, 4L))
  }

  test("minhash LSH finds exact and near dup, not unrelated") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L })
    val survivors = Dedup.minhashLsh(corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(0L) && !survivors.contains(1L))
    assert(survivors.contains(3L) && survivors.contains(4L))
  }

  test("simhash pairs bucket by quarters and verify hamming") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 10)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("ngram jaccard exact pairs with correct values") {
    val rows = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.2)
      .orderBy("idA", "idB").collect()
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 1L)) == 1.0)
    assert(m.contains((0L, 2L)) && m((0L, 2L)) > 0.2 && m((0L, 2L)) < 1.0)
  }

  test("embedding cosine pairs within buckets; brute-force ANN exact top-k") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.98f, 0.2f), 1)).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", col("label"), 0.9)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))

    val top = Ann.bruteForceTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0, 0.0), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(0L, 1L))
  }

  test("IVF assigns centroids and probes subset") {
    val vecs = (0 until 40).map { i =>
      val base = if (i < 20) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, base.map(x => x + (i % 5) * 0.01f), i / 20)
    }.toDF("vec_id", "embedding", "label")
    val centroids = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val assigned = Ann.withCentroidId(vecs, "embedding", centroids)
    val byC = assigned.groupBy("centroid_id").count().as[(Int, Long)].collect().toMap
    assert(byC == Map(0 -> 20L, 1 -> 20L))
    val got = Ann.ivfTopK(vecs, "vec_id", "embedding", centroids, Seq(1.0, 0.0), 5, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.size == 5)
    assert(got.forall(_ < 20)) // only the probed list is searched
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** packBestFit (r20): truncation-free histogram packing. Laws:
  * capacity (no bin exceeds contextLen), completeness (every doc assigned
  * exactly once), half-fill quality (at most one bin at-or-under half
  * capacity — the classic best-fit/first-fit guarantee, which bounds bins
  * at < 2x optimal), determinism across input partitionings, and a
  * hand-computed exact case. */
class PackBestFitSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def pack(lengths: Seq[Int], c: Int, parts: Int = 4) = {
    val df = lengths.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "toks").repartition(parts)
    Packing.packBestFit(df, col("toks"), "id", c)
      .select("id", "tokens", "bin").as[(Long, Long, Long)].collect()
  }

  private def laws(rows: Array[(Long, Long, Long)], n: Int, c: Int): Unit = {
    assert(rows.length == n, s"every doc assigned exactly once: ${rows.length} != $n")
    assert(rows.map(_._1).distinct.length == n)
    val fills = rows.groupBy(_._3).map { case (_, rs) => rs.map(_._2).sum }
    assert(fills.forall(_ <= c), s"capacity law violated: $fills")
    // best-fit guarantee: two bins at-or-under half capacity cannot both
    // exist (the second's contents would have fit the first)
    assert(fills.count(_ * 2 <= c) <= 1, s"half-fill law violated: $fills")
    // bin ids are dense from 0
    val bins = rows.map(_._3).distinct.sorted
    assert(bins.sameElements(bins.indices.map(_.toLong)), "bin ids not dense")
  }

  test("hand case: three bins, best-fit closes the tight ones") {
    // descending best-fit over C=8: 5,5 -> bins 0,1 (residual 3 each);
    // 4 -> new bin 2 (residual 4); 3,3 -> best fit is residual 3, closing
    // bins 0,1 exactly; 2 -> bin 2 (4+2=6). 22 tokens = 8+8+6.
    val rows = pack(Seq(5, 5, 4, 3, 3, 2), 8)
    laws(rows, 6, 8)
    val fills = rows.groupBy(_._3).map { case (b, rs) => b -> rs.map(_._2).sum }
    assert(fills == Map(0L -> 8L, 1L -> 8L, 2L -> 6L), s"got $fills")
  }

  test("uniform short docs pack densely, never one-per-bin") {
    // 100 docs of length 1 at C=64: the bulk fill must produce ceil(100/64)
    // = 2 bins, not 100 (the degenerate one-doc-per-bin failure a naive
    // group-open rule produces)
    val rows = pack(Seq.fill(100)(1), 64)
    laws(rows, 100, 64)
    assert(rows.map(_._3).distinct.length == 2)
  }

  test("oversize and null tokens clamp into [1, contextLen]") {
    val df = Seq((0L, Some(1000)), (1L, None), (2L, Some(-5)), (3L, Some(7)))
      .toDF("id", "toks")
    val rows = Packing.packBestFit(df, col("toks"), "id", 16)
      .select("id", "tokens", "bin").as[(Long, Long, Long)].collect()
    val byId = rows.map(r => r._1 -> r._2).toMap
    assert(byId(0L) == 16L && byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 7L)
    laws(rows, 4, 16)
  }

  test("laws + determinism across partitionings on a skewed corpus") {
    val rnd = new scala.util.Random(20)
    // skewed: many tiny, some near-capacity, a hot identical class
    val lengths = Seq.fill(400)(1 + rnd.nextInt(12)) ++
      Seq.fill(60)(120 + rnd.nextInt(8)) ++ Seq.fill(200)(37)
    val c = 128
    val base = pack(lengths, c, parts = 4)
    laws(base, lengths.length, c)
    for (p <- Seq(1, 7, 32)) {
      val alt = pack(lengths, c, parts = p)
      assert(alt.sortBy(_._1).sameElements(base.sortBy(_._1)),
        s"assignment depends on partitioning at parts=$p")
    }
  }

  test("bulk fill equals per-doc best-fit reference on random inputs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val c = 32 + rnd.nextInt(97)
      val lengths = Seq.fill(150 + rnd.nextInt(200))(1 + rnd.nextInt(c))
      // reference: descending (length, id), each doc to the fullest bin
      // that still fits (smallest residual, lowest id tie-break)
      val orderDocs = lengths.zipWithIndex
        .sortBy { case (l, i) => (-l, i) }
      val res = scala.collection.mutable.ArrayBuffer.empty[Long] // residuals
      val ref = scala.collection.mutable.Map.empty[Long, Long]
      for ((l, i) <- orderDocs) {
        val fit = res.zipWithIndex.filter(_._1 >= l)
        val b = if (fit.isEmpty) { res += c.toLong; res.length - 1 }
                else fit.minBy { case (r, bi) => (r, bi) }._2
        res(b) -= l
        ref(i.toLong) = b.toLong
      }
      val got = pack(lengths, c).map(r => r._1 -> r._3).toMap
      assert(got == ref.toMap, s"trial $trial (C=$c) diverges from per-doc best-fit")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaOps, VideoCorpus, VideoOps}

/** Video plumbing: GFV0 container slicing through the codegen'd
  * FrameSampleExpr, scene-cut detection, per-video bit-majority
  * signatures, and the VideoCorpus generator twins — the video leg of the
  * multimodal triad next to MediaSpec/AudioSpec. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val sampler = new MediaOps.FakeFrameSampler

  test("VideoCorpus: Spark and driver generators are byte-identical; structure holds") {
    val ids = (0L until 50L)
    // three generator paths pinned byte-identical: the codegen expression
    // (the gate's fast path), the column-arithmetic spec, the driver twin
    val sparkBytes = ids.toDF("doc_id")
      .select(col("doc_id"), VideoCorpus.bytesCol(col("doc_id")).as("b"),
        VideoCorpus.bytesColArith(col("doc_id")).as("ba"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("b"), r.getAs[Array[Byte]]("ba"))).toMap
    ids.foreach { id =>
      assert(java.util.Arrays.equals(sparkBytes(id)._1, VideoCorpus.bytesFor(id)),
        s"codegen byte mismatch at doc_id=$id")
      assert(java.util.Arrays.equals(sparkBytes(id)._2, VideoCorpus.bytesFor(id)),
        s"column-arithmetic byte mismatch at doc_id=$id")
    }
    // container structure: PPM arm (doc 0), BMP arm (doc 8), corrupt-frame
    // arm (doc 7), garbage arm (doc 9)
    val f0 = sampler.sampleFrames(VideoCorpus.bytesFor(0L), 1)
    assert(f0.length == VideoCorpus.NFrames)
    assert(f0.forall(_.length == VideoCorpus.PpmFrameLen))
    assert(f0.forall(fr => MediaOps.decode(fr).isDefined))
    val f8 = sampler.sampleFrames(VideoCorpus.bytesFor(8L), 1)
    assert(f8.forall(_.length == VideoCorpus.BmpFrameLen))
    assert(f8.forall(fr => MediaOps.decode(fr).isDefined))
    val f7 = sampler.sampleFrames(VideoCorpus.bytesFor(7L), 1)
    assert(MediaOps.decode(f7(6)).isEmpty && MediaOps.decode(f7(5)).isDefined)
    assert(sampler.sampleFrames(VideoCorpus.bytesFor(9L), 1).isEmpty)
    // scene structure: within-scene consecutive hamming small, cross-scene
    // far (frames 0,1,2 | 3,4,5 | 6,7)
    def dh(frames: Seq[Array[Byte]], f: Int): Long =
      MediaOps.dHash64(MediaOps.decode(frames(f)).get)
    val within = java.lang.Long.bitCount(dh(f0, 0) ^ dh(f0, 1))
    val across = java.lang.Long.bitCount(dh(f0, 2) ^ dh(f0, 3))
    assert(within <= VideoCorpus.CutThreshold, s"within-scene hamming $within")
    assert(across > VideoCorpus.CutThreshold, s"cross-scene hamming $across")
    // near-dup structure: same group, different member -> signatures a few
    // bits apart; cross-group far
    def sig(id: Long): Long = {
      val hs = VideoCorpus.expected(id).flatMap(_._2)
      (0 until 64).foldLeft(0L) { (acc, p) =>
        val cnt = hs.count(h => ((h >>> p) & 1L) == 1L)
        if (cnt > hs.length - cnt) acc | (1L << p) else acc
      }
    }
    val sWithin = java.lang.Long.bitCount(sig(0L) ^ sig(1L))
    val sAcross = java.lang.Long.bitCount(sig(0L) ^ sig(12L))
    assert(sWithin <= 6, s"within-group signature hamming $sWithin")
    assert(sAcross > 6, s"cross-group signature hamming $sAcross")
  }

  test("VideoCorpus.expected matches the engine's distributed sample+hash path") {
    val ids = (0L until 40L)
    val engine = VideoOps.frames(
        ids.toDF("doc_id").withColumn("b", VideoCorpus.bytesCol(col("doc_id"))),
        "doc_id", "b", everyN = VideoCorpus.SampleEvery)
      .select(col("doc_id"), col("fidx"),
        MediaOps.dHash(col("frame")).as("dhash"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val expected = ids.flatMap(id =>
      VideoCorpus.expected(id).map { case (j, dh) => (id, j) -> dh }).toMap
    assert(engine == expected)
  }

  test("FrameSampleExpr slices GFV0 containers inside the plan (everyN, garbage)") {
    val container = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte]('G', 'F', 'V', '0', 0, 0, 0, 3))
      (0 until 5).foreach(i => out.write(Array[Byte](i.toByte, (i + 1).toByte, (i + 2).toByte)))
      out.toByteArray
    }
    val got = Seq((1L, container), (2L, "nope".getBytes))
      .toDF("id", "bin")
      .select(col("id"), VideoOps.sampleFramesCol(col("bin"), everyN = 2).as("fs"))
      .orderBy("id").collect()
    val fs1 = got(0).getSeq[Array[Byte]](1)
    assert(fs1.map(_.toSeq) == Seq(Seq[Byte](0, 1, 2), Seq[Byte](2, 3, 4), Seq[Byte](4, 5, 6)))
    assert(got(1).getSeq[Array[Byte]](1).isEmpty)
    // the kept-ordinal contract of VideoOps.frames: fidx is the sample
    // ordinal, original frame index = fidx * everyN
    val fr = VideoOps.frames(Seq((1L, container)).toDF("id", "bin"), "id", "bin", 2)
      .orderBy("fidx").collect()
    assert(fr.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
  }

  test("sceneCuts: lag-window hamming with threshold, first frame emits none") {
    val frames = Seq(
      (1L, 0, 0L), (1L, 1, 3L), (1L, 2, -1L),   // 0->3: h=2; 3->-1: h=62
      (2L, 0, 5L)                                // single frame, no pair
    ).toDF("id", "fidx", "h")
    val got = VideoOps.sceneCuts(frames, "id", "fidx", "h", threshold = 10)
      .orderBy("id", "fidx").collect()
    assert(got.length == 2)
    assert(got(0).getInt(2) == 2 && got(0).getLong(3) == 0L)   // hamming, is_cut
    assert(got(1).getInt(2) == 62 && got(1).getLong(3) == 1L)
  }

  test("bitMajoritySignature matches brute-force per-bit majority (incl. bit 63)") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 9L).flatMap { id =>
      (0 until (1 + rng.nextInt(5))).map(_ => (id, rng.nextLong()))
    }
    val got = VideoOps.bitMajoritySignature(rows.toDF("id", "h"), "id", "h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val hs = rs.map(_._2)
      val want = (0 until 64).foldLeft(0L) { (acc, p) =>
        val cnt = hs.count(h => ((h >>> p) & 1L) == 1L)
        if (cnt > hs.length - cnt) acc | (1L << p) else acc
      }
      assert(got(id) == want, s"signature mismatch for id=$id")
    }
  }

  test("videoNearDupPairs equals brute force on corpus signatures") {
    val sigs = (0L until 60L).filter(id => VideoCorpus.expected(id).exists(_._2.isDefined))
      .map { id =>
        val hs = VideoCorpus.expected(id).flatMap(_._2)
        val s = (0 until 64).foldLeft(0L) { (acc, p) =>
          val cnt = hs.count(h => ((h >>> p) & 1L) == 1L)
          if (cnt > hs.length - cnt) acc | (1L << p) else acc
        }
        (id, s)
      }
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 6
    } yield (a, b, h)).toSet
    val got = VideoOps.videoNearDupPairs(sigs.toDF("id", "sig"), "id", "sig", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "corpus should produce within-group near-dup pairs")
  }
}

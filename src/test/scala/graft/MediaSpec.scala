package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaOps
import graft.operators.MediaOps.RasterImage

/** Multimodal raster plumbing: real PPM/BMP decode, resize, dHash, and the
  * perceptual near-dup join over binary columns. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Build a P6 PPM from a pixel function. */
  private def ppm(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y); val o = (y * w + x) * 3
      body(o) = ((p >> 16) & 0xff).toByte
      body(o + 1) = ((p >> 8) & 0xff).toByte
      body(o + 2) = (p & 0xff).toByte
    }
    header ++ body
  }

  /** Build a minimal 24bpp bottom-up BMP. */
  private def bmp(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def put32(o: Int, v: Int): Unit = { put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff) }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h); put16(26, 1); put16(28, 24); put32(30, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y); val o = 54 + (h - 1 - y) * rowBytes + x * 3
      out(o) = (p & 0xff).toByte            // B
      out(o + 1) = ((p >> 8) & 0xff).toByte // G
      out(o + 2) = ((p >> 16) & 0xff).toByte // R
    }
    out
  }

  private def gradient(x: Int, y: Int): Int = ((x * 23) % 256 << 16) | ((y * 31) % 256 << 8) | 128

  test("PPM and BMP decode to identical pixels; resize and grayscale are sane") {
    val fromPpm = MediaOps.decode(ppm(10, 6)(gradient)).get
    val fromBmp = MediaOps.decode(bmp(10, 6)(gradient)).get
    assert(fromPpm.width == 10 && fromPpm.height == 6)
    assert(fromPpm.rgb.toSeq == fromBmp.rgb.toSeq, "same pixels through both decoders")
    assert(fromPpm.pixel(3, 2) == gradient(3, 2))
    val small = fromPpm.resizeNearest(5, 3)
    assert(small.width == 5 && small.height == 3)
    assert(small.pixel(0, 0) == fromPpm.pixel(0, 0))
    val g = RasterImage(1, 2, Array(0xffffff, 0x000000)).grayscale()
    assert(g(0) == 255 && g(1) == 0)
    assert(MediaOps.decode("not an image".getBytes).isEmpty)
    assert(MediaOps.decode(null).isEmpty)
  }

  test("PNG and JPEG decode through headless ImageIO; pixels match the source") {
    def encode(fmt: String, w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val pattern = (x: Int, y: Int) => ((x * 40) << 16) | ((y * 40) << 8) | 0x20
    val png = MediaOps.decode(encode("png", 5, 4, pattern))
    assert(png.isDefined && png.get.width == 5 && png.get.height == 4)
    assert(png.get.rgb(1 * 5 + 2) == pattern(2, 1)) // PNG is lossless
    val jpg = MediaOps.decode(encode("jpg", 8, 8, (_, _) => 0x808080))
    assert(jpg.isDefined && jpg.get.width == 8)
    // JPEG is lossy: uniform gray should stay within a small delta
    val p = jpg.get.rgb(0)
    assert(math.abs(((p >> 16) & 0xff) - 0x80) <= 4)
    // a PNG flows through the SAME dHash expression as PPM/BMP
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(Seq((1L, encode("png", 16, 16, pattern))))
      .toDF("id", "img")
      .select(col("id"), org.apache.spark.sql.graft.ColumnBridge.column(
        graft.operators.DHashExpr(org.apache.spark.sql.graft.ColumnBridge.expression(col("img")))).as("h"))
    assert(!df.head.isNullAt(1))
  }

  test("adversarial headers decode to None, never crash") {
    // w*h Int overflow (65536^2 == 0), and the sqrt(Int.Max) variant
    assert(MediaOps.decode("P6 65536 65536 255\n".getBytes).isEmpty)
    assert(MediaOps.decode("P6 46341 46341 255\n".getBytes).isEmpty)
    // dimensions beyond the raster cap
    assert(MediaOps.decode(s"P6 9000 9000 255\n".getBytes).isEmpty)
    // BMP with a negative/hostile data offset and absurd dims
    val evil = bmp(2, 2)(gradient)
    evil(10) = 0x80.toByte; evil(11) = 0; evil(12) = 0; evil(13) = 0x80.toByte
    assert(MediaOps.decode(evil).isEmpty)
    val evilDims = bmp(2, 2)(gradient)
    evilDims(21) = 0x80.toByte // w sign bit
    assert(MediaOps.decode(evilDims).isEmpty)
    // and through the columnar path: null, not a task failure
    val rows = Seq((1L, "P6 65536 65536 255\n".getBytes)).toDF("id", "img")
      .select(MediaOps.dHash(col("img"))).collect()
    assert(rows(0).isNullAt(0))
  }

  test("dHash: visually-near images land within a small hamming distance") {
    val base = MediaOps.decode(ppm(64, 64)(gradient)).get
    val noisy = MediaOps.decode(ppm(64, 64)((x, y) =>
      if (x == 5 && y == 5) 0xffffff else gradient(x, y))).get
    val other = MediaOps.decode(ppm(64, 64)((x, y) => gradient(63 - x, 63 - y))).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(MediaOps.dHash64(base), MediaOps.dHash64(noisy)) <= 4)
    assert(ham(MediaOps.dHash64(base), MediaOps.dHash64(other)) > 10)
  }

  test("imageNearDupPairs finds the perceptual pair, ignores undecodable rows") {
    val imgs = Seq(
      (1L, ppm(32, 32)(gradient)),
      (2L, ppm(32, 32)((x, y) => if (x == 0 && y == 0) 0 else gradient(x, y))),
      (3L, ppm(32, 32)((x, y) => gradient(31 - x, y))),
      (4L, "garbage bytes".getBytes),
      (5L, "more garbage!".getBytes)).toDF("img_id", "img")
    val pairs = MediaOps.imageNearDupPairs(imgs, "img_id", "img", maxHamming = 6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("colorHistogram: similar images near-cosine-1, distinct images apart; DocSet wiring") {
    import graft.docset.DocSet
    import graft.model.{Document, Element}
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val base = MediaOps.colorHistogram(MediaOps.decode(ppm(32, 32)(gradient)).get)
    val noisy = MediaOps.colorHistogram(MediaOps.decode(
      ppm(32, 32)((x, y) => if (x < 2) 0xff0000 else gradient(x, y))).get)
    val flat = MediaOps.colorHistogram(MediaOps.decode(
      ppm(32, 32)((_, _) => 0x00ff00)).get)
    assert(cos(base, noisy) > 0.9)
    assert(cos(base, flat) < 0.5)
    assert(math.abs(base.sum - 1.0f) < 1e-4, "L1-normalized")
    // DocSet verb: decode fills element embedding + dimensions
    val doc = Document.of("d1").copy(elements = Seq(
      Element("Image", None, Some(ppm(8, 4)(gradient)), None, None, 0, Nil, Map.empty),
      Element.text(1, "Text", "caption")))
    val ds = DocSet.wrap(spark.createDataset(Seq(doc))(DocSet.docEnc)).decodeImages()
    val e = ds.takeAll().head.elements.head
    assert(e.prop("image.width").contains("8") && e.prop("image.height").contains("4"))
    assert(e.embedding.exists(_.length == 64))
    // columnar path agrees with the JVM path
    val viaCol = Seq((1L, ppm(8, 4)(gradient))).toDF("id", "img")
      .select(MediaOps.colorHistogramCol(col("img"))).collect()(0).getSeq[Float](0)
    assert(viaCol == MediaOps.colorHistogram(MediaOps.decode(ppm(8, 4)(gradient)).get).toSeq)
  }

  test("sampleFrames verb appends VideoFrame elements") {
    import graft.docset.DocSet
    import graft.model.Document
    val frames = (0 until 6).map(i => Array.fill(3)(i.toByte))
    val container = Array[Byte]('G', 'F', 'V', '0', 0, 0, 0, 3) ++ frames.flatten
    val doc = Document.of("v1").copy(binaryRepresentation = Some(container))
    val out = DocSet.wrap(spark.createDataset(Seq(doc))(DocSet.docEnc))
      .sampleFrames(new MediaOps.FakeFrameSampler, everyN = 3)
      .takeAll().head
    val fr = out.elements.filter(_.elementType == "VideoFrame")
    assert(fr.size == 2)
    assert(fr.map(_.binaryRepresentation.get.toSeq) ==
      Seq(Seq.fill(3)(0.toByte), Seq.fill(3)(3.toByte)))
    assert(fr.map(_.elementIndex) == Seq(0, 1))
  }

  test("frame sampler slices the container deterministically") {
    val frames = (0 until 7).map(i => Array.fill(4)(i.toByte))
    val container = Array[Byte]('G', 'F', 'V', '0', 0, 0, 0, 4) ++ frames.flatten
    val s = new MediaOps.FakeFrameSampler
    val every2 = s.sampleFrames(container, 2)
    assert(every2.map(_.toSeq) == Seq(0, 2, 4, 6).map(i => Seq.fill(4)(i.toByte)))
    assert(s.sampleFrames("nope".getBytes, 1).isEmpty)
    // partition-parallel plumbing: explode frames as document elements
    val docs = Seq((1L, container)).toDF("doc_id", "video")
    val sampler = s
    val frameRows = docs.as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        sampler.sampleFrames(bytes, 2).zipWithIndex.map { case (f, i) => (id, i, f) } }
      .toDF("doc_id", "frame_index", "frame")
    assert(frameRows.count() == 4)
  }

  test("MediaCorpus: Spark and driver generators are byte-identical; structure holds") {
    import graft.operators.{MediaCorpus, Sniff}
    val ids = (0L until 50L)
    val sparkBytes = ids.toDF("doc_id")
      .withColumn("b", MediaCorpus.bytesCol(col("doc_id")))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("b")).toMap
    ids.foreach { id =>
      assert(java.util.Arrays.equals(sparkBytes(id), MediaCorpus.bytesFor(id)),
        s"byte mismatch at doc_id=$id")
    }
    // format dispatch: %10==8 -> bmp, %10==9 -> garbage (unknown), else ppm
    assert(Sniff.sniff(MediaCorpus.bytesFor(8L)) == "bmp")
    assert(Sniff.sniff(MediaCorpus.bytesFor(9L)) == "")
    assert(Sniff.sniff(MediaCorpus.bytesFor(3L)) == "ppm")
    // the BMP member renders the SAME pixels as its PPM siblings: decode
    // of doc 8 (bmp, group 2) equals a hand PPM build of (grp=2, mem=0)
    val viaBmp = MediaOps.decode(MediaCorpus.bytesFor(8L)).get
    (0 until 64).foreach { i =>
      assert(viaBmp.rgb(i) == MediaCorpus.pixel(2L, 0L, i.toLong).toInt,
        s"bmp pixel $i")
    }
    // near-dup structure: within-group hamming small, cross-group far
    def dh(id: Long) = MediaOps.dHash64(MediaOps.decode(MediaCorpus.bytesFor(id)).get)
    val within = java.lang.Long.bitCount(dh(0L) ^ dh(1L))
    val across = java.lang.Long.bitCount(dh(0L) ^ dh(12L))
    assert(within <= 6, s"within-group hamming $within")
    assert(across > 6, s"cross-group hamming $across")
    // expected() facts line up with the engine expressions run in Spark
    val facts = ids.map(id => id -> MediaCorpus.expected(id)).toMap
    val engine = ids.toDF("doc_id")
      .withColumn("b", MediaCorpus.bytesCol(col("doc_id")))
      .select(col("doc_id"),
        graft.operators.SniffExpr.sniffFormat(col("b")).as("fmt"),
        MediaOps.dHash(col("b")).as("dhash"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    ids.foreach { id =>
      assert(engine(id)._1 == facts(id)._1, s"fmt mismatch at $id")
      assert(engine(id)._2 == facts(id)._2, s"dhash mismatch at $id")
    }
  }
}

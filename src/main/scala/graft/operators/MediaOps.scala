package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/**
 * Multimodal raster plumbing over opaque binary columns (SURVEY §2.12;
 * brief: decode / feature-extract / resize / frame-sample with the
 * Spark-side plumbing real). The container ships no image libraries, so:
 *
 *  - PPM (P6) and BMP (24bpp uncompressed) decode is REAL — both formats
 *    are parseable in pure JVM code, and the tests build images from
 *    bytes. PNG / JPEG / GIF decode is ALSO real, through the JDK's own
 *    headless javax.imageio (java.desktop ships with every JVM — no
 *    external library), with the frame dimensions checked against the
 *    raster cap BEFORE pixels are allocated.
 *  - resize (nearest-neighbor) and grayscale are real pixel math.
 *  - dHash (difference hash, the standard perceptual image fingerprint:
 *    9x8 grayscale, one bit per horizontal gradient) is real, exposed as
 *    ONE codegen'd expression over the binary column — so image near-dup
 *    detection REUSES Dedup.simhashPairs' pigeonhole-bucketed hamming
 *    join unchanged, with the dHash as the pluggable sketch.
 *  - video frame-sampling is a trait with a deterministic fake (no codec
 *    in the container); the fake splits a synthetic container format into
 *    frame byte-slices so the partition-parallel plumbing is tested.
 */
object MediaOps {

  /** Decoder dimension cap (8192 x 8192 = 256 MiB of packed pixels): both
    * an adversarial-header overflow guard and a memory bound. */
  val MaxDim: Int = 8192

  /** Packed-RGB raster (0xRRGGBB per pixel, row-major). */
  final case class RasterImage(width: Int, height: Int, rgb: Array[Int]) {
    def pixel(x: Int, y: Int): Int = rgb(y * width + x)

    /** Nearest-neighbor resize — the cheap, deterministic batch resize. */
    def resizeNearest(w: Int, h: Int): RasterImage = {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(height - 1, y * height / h)
        var x = 0
        while (x < w) {
          out(y * w + x) = rgb(sy * width + math.min(width - 1, x * width / w))
          x += 1
        }
        y += 1
      }
      RasterImage(w, h, out)
    }

    /** Integer luma per pixel (ITU-R BT.601 weights, integer math). */
    def grayscale(): Array[Int] = rgb.map { p =>
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }

    /** Mean RGB feature (packed), the trivial feature-extract example. */
    def meanRgb(): Int = {
      var r = 0L; var g = 0L; var b = 0L
      rgb.foreach { p => r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff }
      val n = math.max(1, rgb.length)
      (((r / n).toInt & 0xff) << 16) | (((g / n).toInt & 0xff) << 8) | ((b / n).toInt & 0xff)
    }
  }

  // ------------------------------------------------------------- decoders

  /** P6 binary PPM, maxval <= 255. */
  def decodePpm(bytes: Array[Byte]): Option[RasterImage] = {
    if (bytes.length < 11 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3 && i < bytes.length) {
      // skip whitespace and # comments
      while (i < bytes.length &&
        (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\r' ||
         bytes(i) == '\t' || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) return None
      fields(f) = v; f += 1
    }
    val Array(w, h, maxval) = fields
    // dimension cap: guards w*h Int overflow from adversarial headers AND
    // bounds the decoded raster (a 16k x 16k raster is 1 GiB of pixels —
    // reject, don't allocate); all size math in Long
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      maxval <= 0 || maxval > 255) return None
    i += 1 // single whitespace after maxval
    if (bytes.length.toLong - i < w.toLong * h * 3) return None
    val out = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val r = bytes(i) & 0xff; val g = bytes(i + 1) & 0xff; val b = bytes(i + 2) & 0xff
      out(p) = (r << 16) | (g << 8) | b
      p += 1; i += 3
    }
    Some(RasterImage(w, h, out))
  }

  /** BMP, BITMAPINFOHEADER, 24bpp uncompressed (bottom-up rows, 4-byte
    * row padding). */
  def decodeBmp(bytes: Array[Byte]): Option[RasterImage] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = u32(10)
    val w = u32(18); val h = u32(22)
    if (u16(28) != 24 || u32(30) != 0) return None // 24bpp, BI_RGB only
    // negative/absurd header fields from corrupt bytes must yield None,
    // never negative indexing or an Int-overflowed size check
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if (dataOffset < 54 || dataOffset > bytes.length) return None
    val rowBytes = (w * 3 + 3) / 4 * 4
    if (bytes.length.toLong < dataOffset.toLong + rowBytes.toLong * h) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val src = dataOffset + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val o = src + x * 3
        out(y * w + x) = ((bytes(o + 2) & 0xff) << 16) |
          ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff) // BGR order
        x += 1
      }
      y += 1
    }
    Some(RasterImage(w, h, out))
  }

  /** PNG/JPEG/GIF via the JDK's headless ImageIO. The reader reports the
    * frame dimensions from the header, so the raster cap applies BEFORE
    * any pixel allocation (same adversarial-header guard as decodePpm).
    * A MemoryCacheImageInputStream wraps the in-memory array directly —
    * ImageIO's default FILE cache would create and delete an executor-disk
    * temp file per row, and can throw before any try block on a full
    * tmpdir; everything lives inside the catch so adversarial bytes yield
    * None, never a task failure. */
  def decodeImageIo(bytes: Array[Byte]): Option[RasterImage] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val w = reader.getWidth(0); val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
          val img = reader.read(0)
          val out = new Array[Int](w * h)
          img.getRGB(0, 0, w, h, out, 0, w)
          var i = 0
          while (i < out.length) { out(i) = out(i) & 0xffffff; i += 1 } // drop alpha
          Some(RasterImage(w, h, out))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }

  private def hasImageIoMagic(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||                       // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))           // GIF

  /** Dispatch on magic bytes; PNG/JPEG/GIF route to ImageIO. Unknown
    * magics return None immediately — running ImageIO's SPI probing on
    * arbitrary garbage would cost stream setup per row for nothing. */
  def decode(bytes: Array[Byte]): Option[RasterImage] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (hasImageIoMagic(bytes)) decodeImageIo(bytes)
    else None

  // ------------------------------------------------------------ dHash

  /** 64-bit difference hash: 9x8 grayscale, bit = left pixel brighter than
    * its right neighbor. Hamming distance between dHashes tracks visual
    * similarity — the standard perceptual near-dup fingerprint. */
  def dHash64(img: RasterImage): Long = {
    val g = img.resizeNearest(9, 8).grayscale()
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** dHash column over binary images (null for undecodable bytes). Pass as
    * the `simhashFn` of Dedup.simhashPairs for bucketed image near-dup
    * pairs — no new join machinery. */
  def dHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DHashExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** 64-dim color-histogram descriptor (4x4x4 RGB bins, L1-normalized) —
    * the baseline visual embedding. Returned as array<float>, so images
    * flow into the EXISTING vector stack unchanged: embeddingCosinePairs /
    * semDedup / ANN over image content with zero new join code. */
  def colorHistogram(img: RasterImage): Array[Float] = {
    val h = new Array[Float](64)
    img.rgb.foreach { p =>
      val r = ((p >> 16) & 0xff) >> 6; val g = ((p >> 8) & 0xff) >> 6; val b = (p & 0xff) >> 6
      h((r << 4) | (g << 2) | b) += 1f
    }
    val n = math.max(1, img.rgb.length).toFloat
    var i = 0
    while (i < 64) { h(i) /= n; i += 1 }
    h
  }

  /** colorHistogram as a column over binary images (null if undecodable). */
  def colorHistogramCol(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ColorHistogramExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Decode-once combined features: struct(dhash, hist) from ONE decode of
    * the raster (null struct when undecodable). The e2e chains previously
    * decoded each image up to 3x — once for the dHash, once inside the
    * near-dup sketch, once for the histogram; at gate scale that is noise,
    * at 100 TB it is two full decode passes of the corpus (r22, guide §1.2
    * per-task work / §4 expressions). dhash and hist are exactly
    * DHashExpr / ColorHistogramExpr over the same bytes — same decoder,
    * same math — so results are bit-identical by construction. */
  def featuresCol(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MediaFeaturesExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Perceptual image near-dup pairs: dHash sketch into the existing
    * pigeonhole-bucketed hamming join (Dedup.simhashPairs) — undecodable
    * rows drop at the sketch stage. Returns (idA, idB, hamming). */
  def imageNearDupPairs(df: org.apache.spark.sql.DataFrame, id: String,
                        bin: String, maxHamming: Int = 6): org.apache.spark.sql.DataFrame =
    graft.dedup.Dedup.simhashPairs(df, id, bin, maxHamming, dHash(_), bits = 64)

  // ------------------------------------------------------- frame sampling

  /** Pluggable video frame sampler (a codec-backed one in production). */
  trait FrameSampler extends Serializable {
    /** Every n-th frame of the container as raw frame bytes. */
    def sampleFrames(container: Array[Byte], everyN: Int): Seq[Array[Byte]]
  }

  /** Deterministic fake over the test container format
    * "GFV0" + u32 frameLen + frames: real slicing, no codec. */
  final class FakeFrameSampler extends FrameSampler {
    def sampleFrames(container: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      if (container.length < 8 || container(0) != 'G' || container(1) != 'F' ||
        container(2) != 'V' || container(3) != '0') return Nil
      val frameLen = ((container(4) & 0xff) << 24) | ((container(5) & 0xff) << 16) |
        ((container(6) & 0xff) << 8) | (container(7) & 0xff)
      if (frameLen <= 0) return Nil
      val n = (container.length - 8) / frameLen
      (0 until n by math.max(1, everyN)).map { i =>
        java.util.Arrays.copyOfRange(container, 8 + i * frameLen, 8 + (i + 1) * frameLen)
      }
    }
  }
}

/** Perceptual dHash of a binary image column as one codegen'd expression
  * (decode + 9x8 resize + gradient bits in a single eval; null when the
  * bytes are not a supported raster). */
case class DHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"dhash needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    DHashExpr.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.operators.DHashExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dhash"
}

object DHashExpr {
  /** Called from generated code. */
  def compute(bytes: Array[Byte]): java.lang.Long =
    MediaOps.decode(bytes) match {
      case Some(img) => java.lang.Long.valueOf(MediaOps.dHash64(img))
      case None => null
    }
}

/** 64-dim color-histogram descriptor of a binary image column as one
  * codegen'd expression (decode + histogram in a single eval; null when
  * the bytes are not a supported raster). */
case class ColorHistogramExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"color_histogram needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    ColorHistogramExpr.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.operators.ColorHistogramExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "color_histogram"
}

object ColorHistogramExpr {
  /** Called from generated code. */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    MediaOps.decode(bytes) match {
      case Some(img) =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          MediaOps.colorHistogram(img))
      case None => null
    }
}

/** struct(dhash: long, hist: array<float>) from ONE decode of a binary
  * image column (null when the bytes are not a supported raster) — the
  * decode-once fusion of DHashExpr + ColorHistogramExpr. */
case class MediaFeaturesExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("dhash", LongType, nullable = false),
    StructField("hist", ArrayType(FloatType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"media_features needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    MediaFeaturesExpr.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.operators.MediaFeaturesExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "media_features"
}

object MediaFeaturesExpr {
  /** Called from generated code. */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    MediaOps.decode(bytes) match {
      case Some(img) =>
        org.apache.spark.sql.catalyst.InternalRow(
          MediaOps.dHash64(img),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            MediaOps.colorHistogram(img)))
      case None => null
    }
}

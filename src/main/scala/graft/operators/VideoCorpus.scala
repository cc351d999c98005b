package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic video corpus keyed by `doc_id` — the video twin
 * of [[MediaCorpus]]/[[AudioCorpus]] (same literalized-oracle pattern: the
 * byte function is defined once as a Spark column expression tree for
 * distributed in-plan generation and once as plain Scala for the oracle
 * generator; byte-level equality of the two paths is pinned by a unit
 * test). Containers use the GFV0 test format [[MediaOps.FakeFrameSampler]]
 * already parses: "GFV0" + u32 big-endian frameLen + fixed-length frames.
 *
 * Corpus shape per doc_id (8 frames of 8x8 raster each):
 *  - frames are grouped into SCENES (frame f belongs to scene f/3, so
 *    scenes are {0,1,2}, {3,4,5}, {6,7}): frames within a scene share one
 *    pseudo-random pixel field and differ only in a per-frame one-pixel
 *    flip (dHash hamming <= 4 by the resize-gradient bound), while scene
 *    boundaries switch to an independent field (hamming ~32) — so
 *    consecutive-frame hamming detects scene cuts by construction;
 *  - group = doc_id / 4 shares all scene fields; member m = doc_id % 4
 *    flips ONE extra pixel (60 + m) in EVERY frame, making within-group
 *    videos near-dups at the bit-majority-signature level while
 *    cross-group videos are independent;
 *  - doc_id % 10 == 8 -> the same pixels as 24bpp BMP frames (bottom-up,
 *    BGR; frameLen 246 instead of 203) — frame-format diversity without
 *    changing any downstream fact;
 *  - doc_id % 10 == 7 -> frame 6 (a SAMPLED frame at everyN=2) is
 *    undecodable garbage padded to frameLen — the corrupt-frame path;
 *  - doc_id % 10 == 9 -> the whole container is garbage (no GFV0 magic,
 *    zero frames) — the corrupt-container path.
 *
 * Like its siblings, the generator column uses `transform(sequence(...))`
 * HOFs — interpreted per row, acceptable for verification scaffolding
 * synthesizing a corpus (not a production operator).
 */
object VideoCorpus {

  val Width = 8
  val Height = 8
  val NPix: Int = Width * Height
  val NFrames = 8
  /** Gate-wide frame sampling stride (sampled frames: 0, 2, 4, 6). */
  val SampleEvery = 2
  /** Consecutive-frame hamming above this is a scene cut (within-scene
    * pairs are <= 4 by the one-pixel gradient bound; cross-scene ~32). */
  val CutThreshold = 10
  /** Knuth multiplicative-hash constant; pixel field mixer. */
  private val Mul = 2654435761L
  /** Pixel values live in 0x000000..0xFFFFFF (packed RGB). */
  private val Mod = 16777216L
  /** Added to the per-frame flipped pixel (40 + f) before the mix. */
  private val FlipDelta = 7777777L
  /** Added to the per-member flipped pixel (60 + m) before the mix. */
  private val MemDelta = 3333333L

  /** Packed-RGB value of pixel `i` (row-major) of frame `f` for
    * (group, member). Same bounded ANSI-safe arithmetic discipline as
    * MediaCorpus.pixel — every intermediate fits a long for arbitrary
    * 64-bit doc_ids — with the field keyed by (group, scene) so frames of
    * one scene share it, plus a per-frame flip at pixel 40+f (what makes
    * scene-mates near-identical, not identical) and a per-member flip at
    * pixel 60+m (what makes within-group videos near-dups). */
  def pixel(grp: Long, mem: Long, f: Long, i: Long): Long = {
    val scene = f / 3
    val flipF = if (i == 40 + f) FlipDelta else 0L
    val flipM = if (i == 60 + mem) MemDelta else 0L
    val t = ((Math.floorMod(grp, 1000003L) * 4 + scene) * 64 + i) * Mul + flipF + flipM
    Math.floorMod(Math.floorMod(t ^ (t >> 16), Mod) * 48271L, Mod)
  }

  /** Column twin of [[pixel]] — `f` is a Scala constant because the
    * container builder emits one expression per frame (no nested HOFs). */
  private def pixelCol(grp: Column, mem: Column, f: Int, i: Column): Column = {
    val t = ((pmod(grp, lit(1000003L)) * 4 + lit((f / 3).toLong)) * 64 + i) * lit(Mul) +
      when(i === lit(40L + f), lit(FlipDelta)).otherwise(lit(0L)) +
      when(i === mem + lit(60L), lit(MemDelta)).otherwise(lit(0L))
    pmod(pmod(t.bitwiseXOR(shiftright(t, 16)), lit(Mod)) * lit(48271L), lit(Mod))
  }

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  private val PpmHeader: Array[Byte] = s"P6 $Width $Height 255\n".getBytes("US-ASCII")
  private val PpmHeaderHex: String = hexOf(PpmHeader)
  val PpmFrameLen: Int = PpmHeader.length + NPix * 3 // 203

  /** Fixed 54-byte BMP header for an 8x8 24bpp BI_RGB frame (8*3 row bytes
    * need no padding) — same layout as MediaCorpus's. */
  private val BmpHeader: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + NPix * 3)
    bb.putInt(0)
    bb.putInt(54)
    bb.putInt(40)
    bb.putInt(Width).putInt(Height)
    bb.putShort(1)
    bb.putShort(24)
    bb.putInt(0)
    bb.putInt(NPix * 3)
    bb.putInt(0).putInt(0)
    bb.putInt(0).putInt(0)
    bb.array()
  }
  private val BmpHeaderHex: String = hexOf(BmpHeader)
  val BmpFrameLen: Int = 54 + NPix * 3 // 246

  /** "GFV0" + u32 big-endian frameLen, as hex. */
  private def containerHeaderHex(frameLen: Int): String =
    "47465630" + f"$frameLen%08X"

  /** An undecodable frame payload padded to the PPM frame length: no known
    * raster magic, <90% printable. */
  private val CorruptFrameHex: String = "00FF8107" + "00" * (PpmFrameLen - 4)

  /** No GFV0 magic, <90% printable: the sampler yields zero frames. */
  private val GarbageHex = "00FF81070042"

  /** Synthetic GFV0 container bytes for a doc_id column — distributed,
    * whole-stage-codegen generation (VideoBytesExpr). A video container is
    * 8x the per-row work of MediaCorpus's single image, which crosses the
    * house threshold for interpreted HOF lambdas (they evaluate outside
    * codegen and defeat CSE) — the gate at sf0.1 spent most of its 9 s in
    * the transform() tree. The column-arithmetic formulation survives as
    * [[bytesColArith]], unit-pinned byte-identical to this path and to
    * the driver twin, as the executable spec of the byte layout. */
  def bytesCol(docId: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      VideoBytesExpr(org.apache.spark.sql.graft.ColumnBridge.expression(
        docId.cast("long"))))

  /** Column-arithmetic twin of [[bytesCol]] — pure integer expressions
    * into hex, one `unhex` at the end; one expression per frame (NFrames
    * is a constant), so no nested lambda variables. Kept as the
    * executable byte-layout spec; interpreted HOFs make it ~6x slower
    * than the codegen path at corpus scale. */
  def bytesColArith(docId: Column): Column = {
    val id = docId.cast("long")
    val grp = shiftright(id, 2)
    val mem = pmod(id, lit(4L))
    val fsel = pmod(id, lit(10L))
    val idxs = sequence(lit(0L), lit((NPix - 1).toLong))
    def ppmFrameHex(f: Int): Column = concat(lit(PpmHeaderHex), array_join(
      transform(idxs, i => lpad(hex(pixelCol(grp, mem, f, i)), 6, "0")), ""))
    def bmpFrameHex(f: Int): Column = concat(lit(BmpHeaderHex), array_join(
      transform(idxs, idx => {
        // bottom-up row order, BGR byte order
        val src = (lit(7L) - shiftright(idx, 3)) * 8 + pmod(idx, lit(8L))
        val v = pixelCol(grp, mem, f, src)
        val bgr = pmod(v, lit(256L)) * 65536 +
          pmod(shiftright(v, 8), lit(256L)) * 256 + shiftright(v, 16)
        lpad(hex(bgr), 6, "0")
      }), ""))
    val ppmHex = concat(lit(containerHeaderHex(PpmFrameLen)) +:
      (0 until NFrames).map(ppmFrameHex): _*)
    val ppmCorruptHex = concat(lit(containerHeaderHex(PpmFrameLen)) +:
      (0 until NFrames).map(f =>
        if (f == 6) lit(CorruptFrameHex) else ppmFrameHex(f)): _*)
    val bmpHex = concat(lit(containerHeaderHex(BmpFrameLen)) +:
      (0 until NFrames).map(bmpFrameHex): _*)
    when(fsel === 9, unhex(lit(GarbageHex)))
      .when(fsel === 8, unhex(bmpHex))
      .when(fsel === 7, unhex(ppmCorruptHex))
      .otherwise(unhex(ppmHex))
  }

  /** Driver-side twin of [[bytesCol]] — byte-identical by unit test. */
  def bytesFor(docId: Long): Array[Byte] = {
    val grp = docId >> 2
    val mem = Math.floorMod(docId, 4L)
    val fsel = Math.floorMod(docId, 10L)
    def ppmFrame(f: Int): Array[Byte] = {
      val out = new Array[Byte](PpmFrameLen)
      System.arraycopy(PpmHeader, 0, out, 0, PpmHeader.length)
      var p = 0
      while (p < NPix) {
        val v = pixel(grp, mem, f.toLong, p.toLong)
        out(PpmHeader.length + p * 3) = ((v >> 16) & 0xff).toByte
        out(PpmHeader.length + p * 3 + 1) = ((v >> 8) & 0xff).toByte
        out(PpmHeader.length + p * 3 + 2) = (v & 0xff).toByte
        p += 1
      }
      out
    }
    def bmpFrame(f: Int): Array[Byte] = {
      val out = new Array[Byte](BmpFrameLen)
      System.arraycopy(BmpHeader, 0, out, 0, 54)
      var p = 0
      while (p < NPix) {
        val src = (7 - p / 8) * 8 + p % 8
        val v = pixel(grp, mem, f.toLong, src.toLong)
        out(54 + p * 3) = (v & 0xff).toByte
        out(54 + p * 3 + 1) = ((v >> 8) & 0xff).toByte
        out(54 + p * 3 + 2) = ((v >> 16) & 0xff).toByte
        p += 1
      }
      out
    }
    def fromHex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    if (fsel == 9) fromHex(GarbageHex)
    else {
      val bmp = fsel == 8
      val frameLen = if (bmp) BmpFrameLen else PpmFrameLen
      val out = new java.io.ByteArrayOutputStream(8 + NFrames * frameLen)
      out.write(fromHex(containerHeaderHex(frameLen)))
      (0 until NFrames).foreach { f =>
        if (fsel == 7 && f == 6) out.write(fromHex(CorruptFrameHex))
        else if (bmp) out.write(bmpFrame(f))
        else out.write(ppmFrame(f))
      }
      out.toByteArray
    }
  }

  /** Per-doc expected video facts for the oracle's literal table: one
    * (sample ordinal, dHash-or-null) row per SAMPLED frame (everyN =
    * [[SampleEvery]]; garbage containers yield no rows). Sampling and
    * decode ride the SAME MediaOps the engine uses — DuckDB cannot slice
    * or decode the container, so these values enter the SQL as literals
    * and the oracle replays everything RELATIONAL from them. */
  def expected(docId: Long): Seq[(Int, Option[Long])] = {
    val sampler = new MediaOps.FakeFrameSampler
    sampler.sampleFrames(bytesFor(docId), SampleEvery).zipWithIndex.map {
      case (frame, j) => (j, MediaOps.decode(frame).map(MediaOps.dHash64))
    }
  }
}

/** GFV0 container bytes of a doc_id as one codegen'd expression — the
  * distributed generator stays inside whole-stage codegen instead of
  * paying ~512 interpreted HOF lambda evaluations per row (the
  * TextStatsExpr rule applied to corpus synthesis). */
case class VideoBytesExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"video_bytes needs bigint, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    VideoCorpus.bytesFor(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.VideoCorpus.bytesFor($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "video_bytes"
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic raster corpus keyed by `doc_id` — the media
 * twin of the text gates' literalized-table pattern. The SAME pixel
 * function is defined twice, once as a Spark column expression tree
 * (distributed generation inside the gate's plan, no driver collect of
 * payload bytes) and once as plain Scala (the oracle generator, which
 * literalizes the per-image dHash/histogram values DuckDB cannot decode).
 * Byte-level equality of the two paths is pinned by a unit test.
 *
 * Corpus shape per doc_id:
 *  - group = doc_id / 4: members of a group share one pseudo-random 8x8
 *    pixel field; member m = doc_id % 4 perturbs ONE pixel (60 + m), so
 *    within-group pairs sit a few dHash gradient bits apart (near-dups by
 *    construction) while cross-group images are ~independent fields
 *    (hamming far above any reasonable threshold).
 *  - doc_id % 10 == 8 → the same pixels as a 24bpp BMP (bottom-up, BGR);
 *    doc_id % 10 == 9 → undecodable garbage bytes (the corrupt-payload
 *    path); everything else → binary PPM (P6).
 *
 * The generator column uses `transform(sequence(...))` HOFs — interpreted
 * per row, which is fine HERE because this is verification scaffolding
 * synthesizing a corpus, not an operator a production pipeline would run.
 */
object MediaCorpus {

  val Width = 8
  val Height = 8
  val NPix: Int = Width * Height
  /** Knuth multiplicative-hash constant; pixel field mixer. */
  private val Mul = 2654435761L
  /** Pixel values live in 0x000000..0xFFFFFF (packed RGB). */
  private val Mod = 16777216L
  /** Added to the one member-perturbed pixel before the mod. */
  private val FlipDelta = 7777777L

  /** Packed-RGB value of pixel `i` (row-major) for (group, member). The
    * xorshift step matters: a purely linear field (t * Mul mod 2^24) makes
    * every image a constant-step luma ramp, so gradient signs — and hence
    * dHashes — collide ACROSS groups and the near-dup pair graph densifies
    * quadratically. The nonlinearity keeps cross-group hashes independent
    * while the member flip still perturbs exactly one pixel.
    *
    * Every intermediate is BOUNDED BY CONSTRUCTION (grp reduced mod 1e6+3
    * before the multiply, u reduced mod 2^24 before the second): Spark
    * runs ANSI mode where a long overflow THROWS while the driver twin
    * would silently wrap — arbitrary 64-bit doc_ids must generate without
    * the two paths diverging. */
  def pixel(grp: Long, mem: Long, i: Long): Long = {
    val flip = if (i == 60 + mem) FlipDelta else 0L
    val t = (Math.floorMod(grp, 1000003L) * 64 + i) * Mul + flip
    Math.floorMod(Math.floorMod(t ^ (t >> 16), Mod) * 48271L, Mod)
  }

  private def pixelCol(grp: Column, mem: Column, i: Column): Column = {
    val t = (pmod(grp, lit(1000003L)) * 64 + i) * lit(Mul) +
      when(i === mem + 60, lit(FlipDelta)).otherwise(lit(0L))
    pmod(pmod(t.bitwiseXOR(shiftright(t, 16)), lit(Mod)) * lit(48271L), lit(Mod))
  }

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  private val PpmHeader: Array[Byte] = s"P6 $Width $Height 255\n".getBytes("US-ASCII")
  private val PpmHeaderHex: String = hexOf(PpmHeader)

  /** Fixed 54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER) for an
    * 8x8 24bpp BI_RGB image — constant because width/height are fixed and
    * 8*3 row bytes need no padding. */
  private val BmpHeader: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + NPix * 3) // file size
    bb.putInt(0)             // reserved
    bb.putInt(54)            // pixel data offset
    bb.putInt(40)            // info header size
    bb.putInt(Width).putInt(Height)
    bb.putShort(1)           // planes
    bb.putShort(24)          // bpp
    bb.putInt(0)             // BI_RGB
    bb.putInt(NPix * 3)      // image size
    bb.putInt(0).putInt(0)   // ppm resolution
    bb.putInt(0).putInt(0)   // palette sizes
    bb.array()
  }
  private val BmpHeaderHex: String = hexOf(BmpHeader)

  /** No known magic, <90% printable: sniffs "" and decodes to null. */
  private val GarbageHex = "00FF81070042"

  /** Synthetic payload bytes for a doc_id column — distributed generation:
    * pure integer column arithmetic into hex, one `unhex` at the end. */
  def bytesCol(docId: Column): Column = {
    val id = docId.cast("long")
    val grp = shiftright(id, 2)
    val mem = pmod(id, lit(4L))
    val fsel = pmod(id, lit(10L))
    val idxs = sequence(lit(0L), lit((NPix - 1).toLong))
    val ppmPayload = array_join(
      transform(idxs, i => lpad(hex(pixelCol(grp, mem, i)), 6, "0")), "")
    val bmpPayload = array_join(
      transform(idxs, idx => {
        // bottom-up row order, BGR byte order
        val src = (lit(7L) - shiftright(idx, 3)) * 8 + pmod(idx, lit(8L))
        val v = pixelCol(grp, mem, src)
        val bgr = pmod(v, lit(256L)) * 65536 +
          pmod(shiftright(v, 8), lit(256L)) * 256 + shiftright(v, 16)
        lpad(hex(bgr), 6, "0")
      }), "")
    when(fsel === 9, unhex(lit(GarbageHex)))
      .when(fsel === 8, unhex(concat(lit(BmpHeaderHex), bmpPayload)))
      .otherwise(unhex(concat(lit(PpmHeaderHex), ppmPayload)))
  }

  /** Driver-side twin of [[bytesCol]] — byte-identical by unit test. */
  def bytesFor(docId: Long): Array[Byte] = {
    val grp = docId >> 2
    val mem = Math.floorMod(docId, 4L)
    val fsel = Math.floorMod(docId, 10L)
    if (fsel == 9) GarbageHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    else if (fsel == 8) {
      val out = new Array[Byte](54 + NPix * 3)
      System.arraycopy(BmpHeader, 0, out, 0, 54)
      var p = 0
      while (p < NPix) {
        val src = (7 - p / 8) * 8 + p % 8
        val v = pixel(grp, mem, src)
        out(54 + p * 3) = (v & 0xff).toByte            // B
        out(54 + p * 3 + 1) = ((v >> 8) & 0xff).toByte // G
        out(54 + p * 3 + 2) = ((v >> 16) & 0xff).toByte // R
        p += 1
      }
      out
    } else {
      val out = new Array[Byte](PpmHeader.length + NPix * 3)
      System.arraycopy(PpmHeader, 0, out, 0, PpmHeader.length)
      var p = 0
      while (p < NPix) {
        val v = pixel(grp, mem, p.toLong)
        out(PpmHeader.length + p * 3) = ((v >> 16) & 0xff).toByte
        out(PpmHeader.length + p * 3 + 1) = ((v >> 8) & 0xff).toByte
        out(PpmHeader.length + p * 3 + 2) = (v & 0xff).toByte
        p += 1
      }
      out
    }
  }

  /** Per-doc expected media facts for the oracle's literal table:
    * (sniffed format, dHash when decodable, integer 4x4x4 histogram bin
    * counts when decodable). Decode rides the SAME MediaOps the engine
    * uses — DuckDB cannot decode rasters, so these values enter the SQL
    * as literals and the oracle replays everything RELATIONAL from them. */
  def expected(docId: Long): (String, Option[Long], Option[Array[Long]]) = {
    val b = bytesFor(docId)
    val fmt = Sniff.sniff(b)
    MediaOps.decode(b) match {
      case Some(img) =>
        val bins = MediaOps.colorHistogram(img).map(f => Math.round(f * NPix).toLong)
        (fmt, Some(MediaOps.dHash64(img)), Some(bins))
      case None => (fmt, None, None)
    }
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic WAV corpus keyed by `doc_id` — the audio twin of
 * [[MediaCorpus]] (same literalized-oracle pattern: the byte function is
 * defined once as a Spark column expression tree for distributed in-plan
 * generation, and once as plain Scala for the oracle generator; byte-level
 * equality of the two paths is pinned by a unit test).
 *
 * Corpus shape per doc_id:
 *  - group = doc_id / 4 shares one pseudo-random 256-sample waveform;
 *    member m = doc_id % 4 re-randomizes ONE sample (50*m + 20, so the
 *    four perturbations land in well-separated energy-envelope segments),
 *    making within-group pairs a few aHash gradient bits apart while
 *    cross-group waveforms are independent fields.
 *  - doc_id % 10 == 8 → the SAME samples as 16-bit signed PCM
 *    (s16 = (v - 128) * 256, so the decoder's /32768 path yields floats
 *    BIT-IDENTICAL to the 8-bit path's (v-128)/128 — format diversity
 *    without changing any downstream fact);
 *  - doc_id % 10 == 9 → undecodable garbage bytes (the corrupt path);
 *  - everything else → 8-bit unsigned PCM.
 *
 * Like MediaCorpus, the generator column uses `transform(sequence(...))`
 * HOFs — interpreted per row, acceptable for verification scaffolding
 * synthesizing a corpus (not a production operator).
 */
object AudioCorpus {

  val SampleRate = 8000
  val NSamples = 256
  /** Knuth multiplicative-hash constant; waveform field mixer. */
  private val Mul = 2654435761L
  /** Samples live in 0..255 (8-bit unsigned PCM domain). */
  private val Mod = 256L
  /** Added to the one member-perturbed sample before the mix. */
  private val FlipDelta = 7777777L

  /** 8-bit sample value of index `i` for (group, member). Same bounded
    * ANSI-safe arithmetic discipline as MediaCorpus.pixel: every
    * intermediate fits a long for arbitrary 64-bit doc_ids, and the
    * xorshift keeps cross-group envelopes independent. */
  def sample(grp: Long, mem: Long, i: Long): Long = {
    val flip = if (i == 50 * mem + 20) FlipDelta else 0L
    val t = (Math.floorMod(grp, 1000003L) * 256 + i) * Mul + flip
    Math.floorMod(Math.floorMod(t ^ (t >> 16), Mod) * 48271L, Mod)
  }

  private def sampleCol(grp: Column, mem: Column, i: Column): Column = {
    val t = (pmod(grp, lit(1000003L)) * 256 + i) * lit(Mul) +
      when(i === mem * 50 + 20, lit(FlipDelta)).otherwise(lit(0L))
    pmod(pmod(t.bitwiseXOR(shiftright(t, 16)), lit(Mod)) * lit(48271L), lit(Mod))
  }

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  /** Canonical 44-byte RIFF/WAVE header for mono PCM at `bits` — constant
    * because rate and sample count are fixed. */
  private def wavHeader(bits: Int): Array[Byte] = {
    val dataLen = NSamples * (bits / 8)
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('R'.toByte).put('I'.toByte).put('F'.toByte).put('F'.toByte)
    bb.putInt(36 + dataLen)
    bb.put('W'.toByte).put('A'.toByte).put('V'.toByte).put('E'.toByte)
    bb.put('f'.toByte).put('m'.toByte).put('t'.toByte).put(' '.toByte)
    bb.putInt(16)
    bb.putShort(1)                          // PCM
    bb.putShort(1)                          // mono
    bb.putInt(SampleRate)
    bb.putInt(SampleRate * (bits / 8))      // byte rate
    bb.putShort((bits / 8).toShort)         // block align
    bb.putShort(bits.toShort)
    bb.put('d'.toByte).put('a'.toByte).put('t'.toByte).put('a'.toByte)
    bb.putInt(dataLen)
    bb.array()
  }
  private val Wav8HeaderHex = hexOf(wavHeader(8))
  private val Wav16HeaderHex = hexOf(wavHeader(16))

  /** No RIFF magic, <90% printable: sniffs "" and decodes to null. */
  private val GarbageHex = "00FF81070042"

  /** Synthetic WAV bytes for a doc_id column — distributed,
    * whole-stage-codegen generation (AudioBytesExpr; the VideoCorpus
    * rationale — 256 interpreted HOF lambda evaluations per row put the
    * generator, which is scaffolding, above real gate stages in the
    * profile). The column-arithmetic formulation survives as
    * [[bytesColArith]], unit-pinned byte-identical to this path and the
    * driver twin, as the executable spec of the byte layout. */
  def bytesCol(docId: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AudioBytesExpr(org.apache.spark.sql.graft.ColumnBridge.expression(
        docId.cast("long"))))

  /** Column-arithmetic twin of [[bytesCol]] — the executable byte-layout
    * spec (interpreted HOFs; ~3x slower than the codegen path). */
  def bytesColArith(docId: Column): Column = {
    val id = docId.cast("long")
    val grp = shiftright(id, 2)
    val mem = pmod(id, lit(4L))
    val fsel = pmod(id, lit(10L))
    val idxs = sequence(lit(0L), lit((NSamples - 1).toLong))
    val pcm8 = array_join(
      transform(idxs, i => lpad(hex(sampleCol(grp, mem, i)), 2, "0")), "")
    val pcm16 = array_join(
      // little-endian s16 = (v-128)*256: low byte always 00, high byte
      // the sign-wrapped (v-128)
      transform(idxs, i => concat(lit("00"),
        lpad(hex(pmod(sampleCol(grp, mem, i) - 128, lit(256L))), 2, "0"))), "")
    when(fsel === 9, unhex(lit(GarbageHex)))
      .when(fsel === 8, unhex(concat(lit(Wav16HeaderHex), pcm16)))
      .otherwise(unhex(concat(lit(Wav8HeaderHex), pcm8)))
  }

  /** Driver-side twin of [[bytesCol]] — byte-identical by unit test. */
  def bytesFor(docId: Long): Array[Byte] = {
    val grp = docId >> 2
    val mem = Math.floorMod(docId, 4L)
    val fsel = Math.floorMod(docId, 10L)
    if (fsel == 9) GarbageHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    else if (fsel == 8) {
      val out = new Array[Byte](44 + NSamples * 2)
      System.arraycopy(wavHeader(16), 0, out, 0, 44)
      var i = 0
      while (i < NSamples) {
        val v = sample(grp, mem, i.toLong)
        out(44 + i * 2) = 0
        out(44 + i * 2 + 1) = Math.floorMod(v - 128, 256L).toByte
        i += 1
      }
      out
    } else {
      val out = new Array[Byte](44 + NSamples)
      System.arraycopy(wavHeader(8), 0, out, 0, 44)
      var i = 0
      while (i < NSamples) {
        out(44 + i) = sample(grp, mem, i.toLong).toByte
        i += 1
      }
      out
    }
  }

  /** Per-doc expected audio facts for the oracle's literal table:
    * (sniffed format, aHash when decodable, 64-segment energy-envelope
    * micros when decodable). Decode rides the SAME AudioOps the engine
    * uses — DuckDB cannot decode WAV, so these values enter the SQL as
    * literals and the oracle replays everything RELATIONAL from them. */
  def expected(docId: Long): (String, Option[Long], Option[Array[Long]]) = {
    val b = bytesFor(docId)
    val fmt = Sniff.sniff(b)
    AudioOps.decodeWav(b) match {
      case Some(a) =>
        // double multiply on BOTH sides (the gate casts the float envelope
        // to double before scaling): float-precision products straddle
        // rounding boundaries differently and break the checksum
        val bins = a.energyEnvelope(64).map(f => Math.round(f.toDouble * 1000000.0))
        (fmt, Some(AudioOps.aHash64(a)), Some(bins))
      case None => (fmt, None, None)
    }
  }
}

/** WAV bytes of a doc_id as one codegen'd expression — the distributed
  * generator stays inside whole-stage codegen (VideoBytesExpr's twin). */
case class AudioBytesExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"audio_bytes needs bigint, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    AudioCorpus.bytesFor(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.AudioCorpus.bytesFor($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "audio_bytes"
}

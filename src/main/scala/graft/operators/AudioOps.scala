package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, LongType}

/**
 * Audio plumbing over opaque binary columns — the audio leg of the
 * multimodal triad (images: MediaOps, video: FrameSampler). The container
 * ships no codec libraries, so:
 *
 *  - RIFF/WAVE PCM decode (8-bit unsigned, 16-bit signed LE, any channel
 *    count, mixed down to mono float) is REAL — WAV is parseable in pure
 *    JVM code, exactly like PPM/BMP on the image side. MP3/FLAC/OGG would
 *    plug into the same PcmAudio through a library-backed decoder.
 *  - features (duration, RMS, peak, zero-crossing rate) are real sample
 *    math.
 *  - the 64-segment energy-envelope embedding is returned as array<float>,
 *    so audio flows into the EXISTING vector stack unchanged
 *    (embeddingCosinePairs / semDedup / ANN) — same move as the image
 *    color histogram.
 *  - aHash (64-bit envelope-gradient hash, the audio analogue of image
 *    dHash) is ONE codegen'd expression, so audio near-dup detection
 *    REUSES Dedup.simhashPairs' pigeonhole-bucketed hamming join.
 */
object AudioOps {

  /** Decoded-sample cap (64M mono samples = 256 MiB of floats): guards
    * adversarial header sizes and bounds per-row memory, mirroring
    * MediaOps.MaxDim. ~25 minutes at 44.1 kHz. */
  val MaxSamples: Int = 1 << 26

  /** Mono PCM audio, samples normalized to [-1, 1]. */
  final case class PcmAudio(sampleRate: Int, samples: Array[Float]) {
    def durationSeconds: Double = samples.length.toDouble / sampleRate

    def rms: Double = {
      var s = 0.0
      samples.foreach(v => s += v.toDouble * v)
      math.sqrt(s / math.max(1, samples.length))
    }

    def peak: Double = {
      var m = 0.0
      samples.foreach(v => m = math.max(m, math.abs(v.toDouble)))
      m
    }

    /** Fraction of adjacent sample pairs that change sign — the cheap
      * voiced/unvoiced and noisiness signal. */
    def zeroCrossingRate: Double = {
      if (samples.length < 2) return 0.0
      var n = 0
      var i = 1
      while (i < samples.length) {
        if ((samples(i - 1) >= 0) != (samples(i) >= 0)) n += 1
        i += 1
      }
      n.toDouble / (samples.length - 1)
    }

    /** Nearest-neighbor resample — the audio analogue of the image
      * nearest resize: deterministic, no filtering. */
    def resampleNearest(targetRate: Int): PcmAudio = {
      require(targetRate > 0, "target rate must be positive")
      if (targetRate == sampleRate || samples.isEmpty) return PcmAudio(targetRate, samples)
      val n = math.max(1, (samples.length.toLong * targetRate / sampleRate).toInt)
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = samples(math.min(samples.length - 1, (i.toLong * sampleRate / targetRate).toInt))
        i += 1
      }
      PcmAudio(targetRate, out)
    }

    /** RMS energy per segment over `segments` equal time slices,
      * L1-normalized — the baseline audio embedding. Tempo-invariant-ish
      * (fixed segment count regardless of duration), loudness-normalized
      * by the L1 step. */
    def energyEnvelope(segments: Int): Array[Float] = {
      val env = new Array[Float](segments)
      if (samples.isEmpty) return env
      var seg = 0
      while (seg < segments) {
        // Long math: seg * length can overflow Int at MaxSamples
        val from = (seg.toLong * samples.length / segments).toInt
        val until = math.max(from + 1, ((seg + 1).toLong * samples.length / segments).toInt)
        var s = 0.0
        var i = from
        while (i < until && i < samples.length) { s += samples(i).toDouble * samples(i); i += 1 }
        env(seg) = math.sqrt(s / math.max(1, math.min(until, samples.length) - from)).toFloat
        seg += 1
      }
      val norm = env.sum
      if (norm > 0) {
        var i = 0
        while (i < segments) { env(i) /= norm; i += 1 }
      }
      env
    }
  }

  // ------------------------------------------------------------- decoder

  /** RIFF/WAVE, PCM format 1, 8-bit unsigned or 16-bit signed LE, any
    * channel count (mixed to mono). Chunk walk skips unknown chunks and
    * honors the RIFF odd-size padding byte; corrupt/truncated bytes yield
    * None, never an exception or a negative index. */
  def decodeWav(bytes: Array[Byte]): Option[PcmAudio] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None

    var fmtOk = false
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0L

    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = u32(i + 4)
      val body = i + 8
      if (size < 0 || body + size > bytes.length) {
        // truncated chunk: a well-formed prefix is still usable if fmt+data
        // were already seen; otherwise bail below
        i = bytes.length
      } else {
        id match {
          case "fmt " if size >= 16 =>
            val audioFormat = u16(body)
            channels = u16(body + 2)
            sampleRate = u32(body + 4).toInt
            bits = u16(body + 14)
            fmtOk = audioFormat == 1 && (bits == 8 || bits == 16) &&
              channels > 0 && channels <= 64 &&
              sampleRate > 0 && sampleRate <= 1000000
          case "data" =>
            dataOff = body
            dataLen = size
          case _ => () // skip LIST, fact, cue, ...
        }
        i = body + size.toInt + (size.toInt & 1) // odd sizes pad to even
      }
    }
    if (!fmtOk || dataOff < 0) return None

    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample.toLong * channels
    val frames = dataLen / frameBytes
    if (frames <= 0 || frames > MaxSamples) return None
    val out = new Array[Float](frames.toInt)
    var f = 0
    while (f < frames) {
      val base = dataOff + f * frameBytes.toInt
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val o = base + c * bytesPerSample
        acc += (if (bits == 8) ((bytes(o) & 0xff) - 128) / 128.0f
                else ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort / 32768.0f)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some(PcmAudio(sampleRate, out))
  }

  // ------------------------------------------------------------- hashing

  /** 64-bit audio hash: 65-segment energy envelope, bit = segment louder
    * than its successor — the audio analogue of image dHash. Hamming
    * distance tracks perceptual similarity of the loudness contour. */
  def aHash64(audio: PcmAudio): Long = {
    val env = audio.energyEnvelope(65)
    var h = 0L
    var i = 0
    while (i < 64) {
      if (env(i) > env(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** aHash column over binary WAV audio (null for undecodable bytes). */
  def aHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AudioHashExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** energyEnvelope(64) as a column over binary WAV audio (null if
    * undecodable) — feeds the existing vector ops. */
  def envelopeCol(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AudioEnvelopeExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Perceptual audio near-dup pairs through the EXISTING pigeonhole
    * hamming join (Dedup.simhashPairs) with aHash as the sketch —
    * undecodable rows drop at the sketch stage. Returns (idA, idB,
    * hamming). */
  def audioNearDupPairs(df: org.apache.spark.sql.DataFrame, id: String,
                        bin: String, maxHamming: Int = 6): org.apache.spark.sql.DataFrame =
    graft.dedup.Dedup.simhashPairs(df, id, bin, maxHamming, aHash(_), bits = 64)
}

/** Perceptual aHash of a binary WAV column as one codegen'd expression
  * (decode + envelope + gradient bits in a single eval; null when the
  * bytes are not decodable PCM WAV). */
case class AudioHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"audio_hash needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    AudioHashExpr.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.operators.AudioHashExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "audio_hash"
}

object AudioHashExpr {
  /** Called from generated code. */
  def compute(bytes: Array[Byte]): java.lang.Long =
    AudioOps.decodeWav(bytes) match {
      case Some(a) => java.lang.Long.valueOf(AudioOps.aHash64(a))
      case None => null
    }
}

/** 64-segment energy-envelope embedding of a binary WAV column as one
  * codegen'd expression (null when the bytes are not decodable PCM WAV). */
case class AudioEnvelopeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"audio_envelope needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    AudioEnvelopeExpr.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.operators.AudioEnvelopeExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "audio_envelope"
}

object AudioEnvelopeExpr {
  /** Called from generated code. */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    AudioOps.decodeWav(bytes) match {
      case Some(a) =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.energyEnvelope(64))
      case None => null
    }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioOps
import graft.operators.AudioOps.PcmAudio

/** Audio plumbing: real RIFF/WAV PCM decode, features, envelope embedding,
  * aHash near-dup over binary columns — the audio leg of the multimodal
  * triad next to MediaSpec. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Build a PCM WAV from float samples in [-1, 1]. */
  private def wav(rate: Int, channels: Int, bits: Int,
                  extraChunk: Boolean = false)(samples: Array[Float]): Array[Byte] = {
    val bytesPerSample = bits / 8
    val dataLen = samples.length * channels * bytesPerSample
    val junk = if (extraChunk) 12 else 0 // "LIST" chunk of 4 bytes, before data
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + junk + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(channels); w32(rate)
    w32(rate * channels * bytesPerSample); w16(channels * bytesPerSample); w16(bits)
    if (extraChunk) { out.write("LIST".getBytes); w32(4); out.write("INFO".getBytes) }
    out.write("data".getBytes); w32(dataLen)
    samples.foreach { s =>
      var c = 0
      while (c < channels) {
        if (bits == 8) out.write(math.round(s * 127 + 128).toInt & 0xff)
        else w16(math.round(s * 32767).toInt & 0xffff)
        c += 1
      }
    }
    out.toByteArray
  }

  private def sine(n: Int, period: Double): Array[Float] =
    Array.tabulate(n)(i => math.sin(2 * math.Pi * i / period).toFloat)

  test("16-bit mono WAV round-trips samples; features are sane") {
    val samples = sine(8000, 50.0)
    val a = AudioOps.decodeWav(wav(8000, 1, 16)(samples)).get
    assert(a.sampleRate == 8000 && a.samples.length == 8000)
    assert(math.abs(a.durationSeconds - 1.0) < 1e-9)
    // 16-bit quantization error is < 1/32767 per sample
    samples.zip(a.samples).foreach { case (x, y) => assert(math.abs(x - y) < 2e-4) }
    // full-scale sine: RMS ~ 1/sqrt(2), peak ~ 1, ZCR ~ 2/period
    assert(math.abs(a.rms - 1 / math.sqrt(2)) < 0.01)
    assert(a.peak > 0.99 && a.peak <= 1.0)
    assert(math.abs(a.zeroCrossingRate - 2.0 / 50.0) < 0.005)
  }

  test("8-bit decode, stereo mixdown, and chunk skipping") {
    val samples = sine(1000, 25.0)
    val a8 = AudioOps.decodeWav(wav(8000, 1, 8)(samples)).get
    samples.zip(a8.samples).foreach { case (x, y) => assert(math.abs(x - y) < 0.02) }
    // stereo with identical channels mixes down to the same mono signal
    val st = AudioOps.decodeWav(wav(8000, 2, 16)(samples)).get
    val mono = AudioOps.decodeWav(wav(8000, 1, 16)(samples)).get
    st.samples.zip(mono.samples).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    // an unknown LIST chunk before data is skipped, not fatal
    val skipped = AudioOps.decodeWav(wav(8000, 1, 16, extraChunk = true)(samples)).get
    assert(skipped.samples.length == 1000)
  }

  test("corrupt and adversarial bytes decode to None, never throw") {
    assert(AudioOps.decodeWav(null).isEmpty)
    assert(AudioOps.decodeWav("not audio at all".getBytes).isEmpty)
    assert(AudioOps.decodeWav(Array.fill[Byte](44)(0)).isEmpty)
    val good = wav(8000, 1, 16)(sine(100, 25.0))
    // truncated data chunk: size claims more than remains -> unusable -> None
    assert(AudioOps.decodeWav(good.dropRight(37)).isEmpty)
    // header claims a huge data size it doesn't have
    val lying = good.clone()
    lying(good.indexOfSlice("data".getBytes) + 4 + 3) = 0x7f // data size high byte
    AudioOps.decodeWav(lying) // must not throw or allocate 2 GB
    // float format (3) and 24-bit are rejected, not mis-decoded
    val fmtOff = good.indexOfSlice("fmt ".getBytes) + 8
    val f3 = good.clone(); f3(fmtOff) = 3
    assert(AudioOps.decodeWav(f3).isEmpty)
    val b24 = good.clone(); b24(fmtOff + 14) = 24
    assert(AudioOps.decodeWav(b24).isEmpty)
  }

  test("resample preserves duration; envelope is L1-normalized and shape-stable") {
    val a = AudioOps.decodeWav(wav(8000, 1, 16)(sine(8000, 50.0))).get
    val r = a.resampleNearest(4000)
    assert(r.sampleRate == 4000)
    assert(math.abs(r.durationSeconds - a.durationSeconds) < 0.001)
    val env = a.energyEnvelope(64)
    assert(env.length == 64)
    assert(math.abs(env.sum - 1.0f) < 1e-3)
    // resampling barely moves the normalized envelope (same loudness contour)
    val envR = r.energyEnvelope(64)
    env.zip(envR).foreach { case (x, y) => assert(math.abs(x - y) < 0.02) }
  }

  test("aHash: similar loudness contours are near, different are far; join finds them") {
    // contour A: rising bursts; B: A with small perturbation; C: reversed
    def bursty(n: Int, f: Int => Float): Array[Float] =
      Array.tabulate(n)(i => (math.sin(i / 3.0) * f(i / (n / 16))).toFloat)
    val a = wav(8000, 1, 16)(bursty(8000, seg => 0.1f + 0.05f * seg))
    val b = wav(8000, 1, 16)(bursty(8000, seg => 0.11f + 0.05f * seg))
    val c = wav(8000, 1, 16)(bursty(8000, seg => 0.9f - 0.05f * seg))
    val ha = AudioOps.aHash64(AudioOps.decodeWav(a).get)
    val hb = AudioOps.aHash64(AudioOps.decodeWav(b).get)
    val hc = AudioOps.aHash64(AudioOps.decodeWav(c).get)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 6, "similar contour -> near hash")
    assert(java.lang.Long.bitCount(ha ^ hc) > 6, "reversed contour -> far hash")

    val df = Seq(("a", a), ("b", b), ("c", c), ("junk", "zzz".getBytes))
      .toDF("id", "audio")
    val pairs = AudioOps.audioNearDupPairs(df, "id", "audio", maxHamming = 6)
      .select("idA", "idB").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b")), s"got $pairs")
  }

  test("decodeAudio wires features and envelope into elements") {
    val bytes = wav(8000, 1, 16)(sine(4000, 50.0))
    val doc = graft.model.Document.of("d1", text = "an audio doc", elements = Seq(
      graft.model.Element("Audio", None, Some(bytes), None, None, 0, Nil, Map.empty),
      graft.model.Element("Text", Some("hi"), None, None, None, 1, Nil, Map.empty)))
    val ds = graft.docset.DocSet.wrap(
      spark.createDataset(Seq(doc))(graft.docset.DocSet.docEnc)).decodeAudio()
    val out = ds.takeAll().head
    val audioEl = out.elements.find(_.elementType == "Audio").get
    assert(audioEl.prop("audio.sample_rate").contains("8000"))
    assert(audioEl.prop("audio.duration_s").contains("0.500000"))
    assert(audioEl.embedding.exists(_.length == 64))
    val textEl = out.elements.find(_.elementType == "Text").get
    assert(textEl.embedding.isEmpty && textEl.prop("audio.rms").isEmpty)
  }

  test("AudioCorpus: Spark and driver generators are byte-identical; structure holds") {
    import graft.operators.{AudioCorpus, Sniff}
    val ids = (0L until 50L)
    // three generator paths pinned byte-identical: the codegen expression
    // (the gate's fast path), the column-arithmetic spec, the driver twin
    val sparkBytes = ids.toDF("doc_id")
      .select(col("doc_id"), AudioCorpus.bytesCol(col("doc_id")).as("b"),
        AudioCorpus.bytesColArith(col("doc_id")).as("ba"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("b"), r.getAs[Array[Byte]]("ba"))).toMap
    ids.foreach { id =>
      assert(java.util.Arrays.equals(sparkBytes(id)._1, AudioCorpus.bytesFor(id)),
        s"codegen byte mismatch at doc_id=$id")
      assert(java.util.Arrays.equals(sparkBytes(id)._2, AudioCorpus.bytesFor(id)),
        s"column-arithmetic byte mismatch at doc_id=$id")
    }
    // format dispatch: %10==9 -> garbage (unknown), everything else RIFF/WAVE
    assert(Sniff.sniff(AudioCorpus.bytesFor(8L)) == "wav")
    assert(Sniff.sniff(AudioCorpus.bytesFor(9L)) == "")
    assert(Sniff.sniff(AudioCorpus.bytesFor(3L)) == "wav")
    assert(AudioOps.decodeWav(AudioCorpus.bytesFor(9L)).isEmpty)
    // the 16-bit member decodes to floats BIT-IDENTICAL to the 8-bit
    // normalization of the same samples: (v-128)*256/32768 == (v-128)/128
    val via16 = AudioOps.decodeWav(AudioCorpus.bytesFor(8L)).get
    assert(via16.sampleRate == AudioCorpus.SampleRate)
    (0 until AudioCorpus.NSamples).foreach { i =>
      val v = AudioCorpus.sample(2L, 0L, i.toLong)
      assert(via16.samples(i) == ((v - 128).toFloat / 128.0f), s"sample $i")
    }
    // near-dup structure: within-group hamming small, cross-group far
    def ah(id: Long) = AudioOps.aHash64(AudioOps.decodeWav(AudioCorpus.bytesFor(id)).get)
    val within = java.lang.Long.bitCount(ah(0L) ^ ah(1L))
    val across = java.lang.Long.bitCount(ah(0L) ^ ah(12L))
    assert(within <= 6, s"within-group hamming $within")
    assert(across > 6, s"cross-group hamming $across")
    // expected() facts line up with the engine expressions run in Spark
    val facts = ids.map(id => id -> AudioCorpus.expected(id)).toMap
    val engine = ids.toDF("doc_id")
      .withColumn("b", AudioCorpus.bytesCol(col("doc_id")))
      .select(col("doc_id"),
        graft.operators.SniffExpr.sniffFormat(col("b")).as("fmt"),
        AudioOps.aHash(col("b")).as("ahash"),
        transform(AudioOps.envelopeCol(col("b")),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("bins"))
      .collect().map { r =>
        r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getSeq[Long](3).toArray))
      }.toMap
    ids.foreach { id =>
      assert(engine(id)._1 == facts(id)._1, s"fmt mismatch at $id")
      assert(engine(id)._2 == facts(id)._2, s"ahash mismatch at $id")
      assert(engine(id)._3.map(_.toSeq) == facts(id)._3.map(_.toSeq),
        s"envelope micros mismatch at $id")
    }
  }
}

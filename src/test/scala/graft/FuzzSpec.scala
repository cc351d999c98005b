package graft

import java.util.concurrent.{Callable, Executors, ThreadFactory, TimeUnit, TimeoutException}

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.docset.DocSet
import graft.model.Document
import graft.operators._
import graft.sources.Warc

/**
 * Seeded random-mutation fuzz harness over every binary-format parser
 * (r18 brief #1). r17 found three poison-pill classes — OOM-bomb spans,
 * NumberFormatException task kills, an infinite recursion — by HAND
 * review; this finds the rest mechanically: flip/truncate/splice/zero/
 * insert/duplicate bytes of the real fixture corpus, N >= 200 mutants per
 * format, and require every parser to DEGRADE — return, in bounded time,
 * with bounded output — never hang, throw, or OOM the task. This is the
 * crawl-ingest robustness a 100 TB WARC pipeline lives on (reference
 * contract: the tolerant paths of transforms/detr_partitioner.py and
 * partition.py — garbage in a corpus must cost one document, not a job).
 *
 * Reproducibility: every mutant derives from a FIXED seed; a failure
 * message carries the format, mutant index, and mutation descriptor, so
 * `mutantOf(seedBytes, new Random(SeedBase + formatSeed), i)` replays it
 * exactly.
 */
class FuzzSpec extends AnyFunSuite {
  private val DataDir = FixtureGoldenGen.DataDir
  private def available: Boolean = new java.io.File(DataDir).isDirectory

  private val SeedBase = 0x18C0FFEEL
  private val N = 220
  /** Per-mutant wall cap: generous (a loaded CI host JITs slowly) but a
    * hang/quadratic blowup still fails fast enough to act on. */
  private val TimeoutSec = 30L
  /** Output-allocation cap: elements + text of ONE parsed document. The
    * fixtures are <= 4 MB; 64 MB of output from a mutated one means an
    * expansion bug (the r17 span-bomb class), not content. */
  private val MaxOutBytes = 64L << 20

  // ------------------------------------------------------------ harness

  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "fuzz-worker"); t.setDaemon(true); t
    }
  })

  /** Run one parse bounded in time; surface hang/throw with the replay
    * coordinates. StackOverflowError is caught deliberately: an
    * unbounded-recursion parser bug (the r17 splitOne class) must report
    * as a finding, not abort the suite. */
  private def bounded[T](what: String)(f: => T): T = {
    val fut = pool.submit(new Callable[T] {
      override def call(): T = f
    })
    try fut.get(TimeoutSec, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        fut.cancel(true)
        fail(s"$what: parse exceeded ${TimeoutSec}s (hang/blowup)")
      case e: java.util.concurrent.ExecutionException =>
        val c = e.getCause
        c match {
          case so: StackOverflowError =>
            fail(s"$what: unbounded recursion (StackOverflowError)")
          case other =>
            fail(s"$what: parser threw ${other.getClass.getName}: ${other.getMessage}")
        }
    }
  }

  private def outBytes(d: Document): Long =
    d.elements.foldLeft(0L) { (acc, e) =>
      acc + 64 + e.textRepresentation.map(_.length.toLong).getOrElse(0L) +
        e.properties.foldLeft(0L)((a, kv) => a + kv._1.length + kv._2.length)
    } + d.textRepresentation.map(_.length.toLong).getOrElse(0L)

  // ----------------------------------------------------------- mutations

  /** One deterministic mutant + its descriptor. Mutation vocabulary:
    * byte flips, truncation, region zero/0xFF fill, chunk splice (copy a
    * random span over another), random-byte insertion, chunk duplication
    * (append a repeated interior span — the zip/span-bomb shape). */
  private def mutantOf(seed: Array[Byte], rnd: Random): (String, Array[Byte]) = {
    val len = seed.length
    require(len > 8, "seed too small to mutate")
    rnd.nextInt(7) match {
      case 0 =>
        val b = seed.clone()
        val k = 1 + rnd.nextInt(16)
        val pos = Array.fill(k)(rnd.nextInt(len))
        pos.foreach(p => b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte)
        (s"flip k=$k", b)
      case 1 =>
        val cut = 1 + rnd.nextInt(len - 1)
        (s"truncate at=$cut", java.util.Arrays.copyOfRange(seed, 0, cut))
      case 2 =>
        val b = seed.clone()
        val n = 1 + rnd.nextInt(math.min(len / 2, 4096))
        val src = rnd.nextInt(len - n + 1); val dst = rnd.nextInt(len - n + 1)
        System.arraycopy(seed, src, b, dst, n)
        (s"splice n=$n src=$src dst=$dst", b)
      case 3 =>
        val b = seed.clone()
        val n = 1 + rnd.nextInt(math.min(len / 2, 4096))
        val at = rnd.nextInt(len - n + 1)
        val fill = if (rnd.nextBoolean()) 0.toByte else 0xFF.toByte
        java.util.Arrays.fill(b, at, at + n, fill)
        (s"fill v=$fill at=$at n=$n", b)
      case 4 =>
        val n = 1 + rnd.nextInt(256)
        val at = rnd.nextInt(len)
        val ins = Array.fill(n)(rnd.nextInt(256).toByte)
        val b = new Array[Byte](len + n)
        System.arraycopy(seed, 0, b, 0, at)
        System.arraycopy(ins, 0, b, at, n)
        System.arraycopy(seed, at, b, at + n, len - at)
        (s"insert at=$at n=$n", b)
      case 5 =>
        // duplicate an interior span many times (expansion-bug bait)
        val n = 1 + rnd.nextInt(math.min(len / 2, 512))
        val src = rnd.nextInt(len - n + 1)
        val times = 1 + rnd.nextInt(64)
        val out = new java.io.ByteArrayOutputStream(len + n * times)
        out.write(seed, 0, src + n)
        var t = 0
        while (t < times) { out.write(seed, src, n); t += 1 }
        out.write(seed, src + n, len - src - n)
        (s"dup src=$src n=$n x$times", out.toByteArray)
      case _ =>
        // header-preserving tail scramble: keep magic bytes, shuffle the rest
        val keep = math.min(16, len / 4)
        val b = seed.clone()
        var i = len - 1
        while (i > keep) {
          val j = keep + rnd.nextInt(i - keep + 1)
          val tmp = b(i); b(i) = b(j); b(j) = tmp
          i -= 1
        }
        (s"scramble keep=$keep", b)
    }
  }

  private def fuzzFormat(fmt: String, seed: Array[Byte], seedOffset: Long,
                         n: Int = N)(parse: Array[Byte] => Long): Unit = {
    val rnd = new Random(SeedBase + seedOffset)
    var i = 0
    while (i < n) {
      val (desc, bytes) = mutantOf(seed, rnd)
      val out = bounded(s"$fmt mutant #$i [$desc] len=${bytes.length}")(parse(bytes))
      assert(out <= MaxOutBytes,
        s"$fmt mutant #$i [$desc]: output $out bytes exceeds cap (expansion bug)")
      i += 1
    }
  }

  // ---------------------------------------------------------- seed corpus

  private def fileBytes(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  private lazy val pdfSeed = fileBytes(s"$DataDir/pdfs/visit_aryn.pdf")
  private lazy val docxSeed = fileBytes(s"$DataDir/docx/aryn_website_sample.docx")
  private lazy val pngSeed = fileBytes(s"$DataDir/imgs/vert_table.png")
  /** HTML seed: the structured head of the wikipedia fixture (full file is
    * 470 KB; 96 KB keeps 220 mutants fast while spanning real tag soup). */
  private lazy val htmlSeed = {
    val full = fileBytes(s"$DataDir/htmls/wikipedia_binary_search.html")
    java.util.Arrays.copyOfRange(full, 0, math.min(full.length, 96 << 10)) ++
      "</body></html>".getBytes("UTF-8")
  }
  private lazy val textSeed = {
    val full = fileBytes(s"$DataDir/texts/Ray.txt")
    java.util.Arrays.copyOfRange(full, 0, math.min(full.length, 32 << 10))
  }

  /** Small synthesized PPTX (design.pptx is 3.7 MB — too slow for 220
    * zip-parse mutants): two slides + one notes part, the entry shapes
    * PptxPartitioner dispatches on. */
  private lazy val pptxSeed: Array[Byte] = {
    def slide(i: Int) =
      s"""<p:sld><p:txBody><a:p><a:r><a:t>Slide $i title</a:t></a:r></a:p>
         |<a:p><a:r><a:t>bullet one of slide $i</a:t></a:r></a:p></p:txBody></p:sld>""".stripMargin
    val notes = "<p:notes><a:p><a:r><a:t>speaker notes</a:t></a:r></a:p></p:notes>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml", "<Types/>")
    put("ppt/slides/slide1.xml", slide(1))
    put("ppt/slides/slide2.xml", slide(2))
    put("ppt/notesSlides/notesSlide1.xml", notes)
    z.close()
    bos.toByteArray
  }

  private lazy val vttSeed = (
    "[0:00] alice welcome to the meeting everyone\n" +
      "[0:07] bob thanks glad to be here today\n" +
      "[0:15] alice first agenda item is the quarterly review\n" +
      "garbage line without brackets\n" +
      "[0:31] carol numbers are up twelve percent\n").getBytes("UTF-8")

  /** Synthesized multi-record WARC (the WarcSpec shape): warcinfo +
    * response with HTTP envelope + conversion. */
  private lazy val warcSeed: Array[Byte] = {
    def record(tpe: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val head = (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        s"WARC-Record-ID: <urn:uuid:$tpe-${uri.length}>\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8")
      head ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><title>t</title><p>body text</p></html>").getBytes("UTF-8")
    record("warcinfo", "", "software: fuzz".getBytes("UTF-8")) ++
      record("response", "http://example.com/a", http) ++
      record("conversion", "http://example.com/b",
        "plain converted text body".getBytes("UTF-8"))
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  /** GFV0 video container: 32 frames of 16 bytes. */
  private lazy val videoSeed: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte]('G', 'F', 'V', '0', 0, 0, 0, 16))
    (0 until 32).foreach(i => bos.write(Array.tabulate(16)(j => (i * 16 + j).toByte)))
    bos.toByteArray
  }

  /** 8x6 P6 PPM + same raster as 24bpp BMP + RIFF/WAV PCM16 mono. */
  private lazy val ppmSeed: Array[Byte] = {
    val head = "P6\n8 6\n255\n".getBytes("US-ASCII")
    head ++ Array.tabulate(8 * 6 * 3)(i => (i * 7).toByte)
  }
  private lazy val bmpSeed: Array[Byte] = {
    val w = 8; val h = 6; val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    def putU32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    putU32(2, size); putU32(10, 54); putU32(14, 40)
    putU32(18, w); putU32(22, h)
    b(26) = 1; b(28) = 24 // planes=1, bpp=24, compression=0 already
    var i = 54
    while (i < size) { b(i) = (i * 3).toByte; i += 1 }
    b
  }
  private lazy val wavSeed: Array[Byte] = {
    val samples = 256
    val dataLen = samples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16); b.putShort(1); b.putShort(1)
    b.putInt(8000); b.putInt(16000); b.putShort(2); b.putShort(16)
    b.put("data".getBytes); b.putInt(dataLen)
    (0 until samples).foreach(i => b.putShort((math.sin(i / 8.0) * 12000).toShort))
    b.array()
  }

  private def doc(id: String, bytes: Array[Byte]): Document =
    Document(id, Document.lineageOf(id), None, None, Some(bytes),
      Nil, None, None, None, None, Map.empty)

  // -------------------------------------------------------------- suites

  test("fuzz: PdfPartitioner survives mutated PDFs (text + table paths)") {
    assume(available)
    val base = new PdfPartitioner()
    fuzzFormat("pdf", pdfSeed, 1)(b => outBytes(base.partition(doc("m.pdf", b))))
    val withTables = new PdfPartitioner(
      ocr = Some(new FakeOcrProvider()), tables = Some(new GeomTableProvider()))
    fuzzFormat("pdf+tables", pdfSeed, 2, n = 120)(b =>
      outBytes(withTables.partition(doc("m.pdf", b))))
  }

  test("fuzz: HtmlPartitioner survives mutated HTML (tables + links on)") {
    assume(available)
    val p = new HtmlPartitioner(extractTables = true, trackLinks = true)
    fuzzFormat("html", htmlSeed, 3)(b => outBytes(p.partition(doc("m.html", b))))
  }

  test("fuzz: DocxPartitioner survives mutated DOCX") {
    assume(available)
    val p = new DocxPartitioner()
    fuzzFormat("docx", docxSeed, 4)(b => outBytes(p.partition(doc("m.docx", b))))
  }

  test("fuzz: PptxPartitioner survives mutated PPTX") {
    val p = new PptxPartitioner()
    fuzzFormat("pptx", pptxSeed, 5)(b => outBytes(p.partition(doc("m.pptx", b))))
  }

  test("fuzz: Text/Transcript partitioners survive mutated text") {
    assume(available)
    val t = new TextPartitioner()
    fuzzFormat("text", textSeed, 6)(b => outBytes(t.partition(doc("m.txt", b))))
    val v = new TranscriptPartitioner()
    fuzzFormat("vtt", vttSeed, 7)(b => outBytes(v.partition(doc("m.vtt", b))))
  }

  test("fuzz: Warc.records survives mutated WARC, plain and gzipped") {
    fuzzFormat("warc", warcSeed, 8)(b =>
      Warc.records(b).foldLeft(0L)((a, r) => a + r.payload.length))
    fuzzFormat("warc.gz", gz(warcSeed), 9)(b =>
      Warc.records(b).foldLeft(0L)((a, r) => a + r.payload.length))
  }

  test("fuzz: raster/audio/video decoders survive mutated media") {
    fuzzFormat("ppm", ppmSeed, 10)(b =>
      MediaOps.decode(b).map(i => i.width.toLong * i.height * 4).getOrElse(0L))
    fuzzFormat("bmp", bmpSeed, 11)(b =>
      MediaOps.decode(b).map(i => i.width.toLong * i.height * 4).getOrElse(0L))
    fuzzFormat("png", pngSeed, 12)(b =>
      MediaOps.decode(b).map(i => i.width.toLong * i.height * 4).getOrElse(0L))
    fuzzFormat("wav", wavSeed, 13)(b =>
      AudioOps.decodeWav(b).map(_.samples.length.toLong * 4).getOrElse(0L))
    val sampler = new MediaOps.FakeFrameSampler
    fuzzFormat("gfv", videoSeed, 14)(b =>
      sampler.sampleFrames(b, 2).foldLeft(0L)(_ + _.length))
  }

  test("fuzz: Sniff.sniff survives every format's mutants") {
    val seeds = Seq(pdfSeed, htmlSeed, pptxSeed, warcSeed, ppmSeed, bmpSeed,
      wavSeed, videoSeed)
    seeds.zipWithIndex.foreach { case (s, i) =>
      fuzzFormat(s"sniff#$i", s, 20 + i, n = 60)(b => Sniff.sniff(b).length.toLong)
    }
  }

  test("fuzz: partitionAuto over a mixed mutant corpus — no task death") {
    assume(available)
    // the engine-level assertion the brief asks for: the SAME mutants,
    // through the real Spark path, one batch — a single poisoned document
    // must degrade in place, not kill its task (and with it the job)
    val spark = SparkFixture.spark
    val rnd = new Random(SeedBase + 99)
    val corpus = scala.collection.mutable.ArrayBuffer.empty[Document]
    def add(fmt: String, seed: Array[Byte], n: Int): Unit = {
      var i = 0
      while (i < n) {
        val (_, b) = mutantOf(seed, rnd)
        corpus += doc(s"fz-$fmt-$i.$fmt", b)
        i += 1
      }
    }
    add("pdf", pdfSeed, 40); add("html", htmlSeed, 40)
    add("docx", docxSeed, 40); add("pptx", pptxSeed, 40)
    add("txt", textSeed, 20); add("vtt", vttSeed, 20)
    // extension-less: forces the Sniff fallback inside partitionAuto
    (0 until 20).foreach { i =>
      val (_, b) = mutantOf(pdfSeed, rnd); corpus += doc(s"fz-noext-$i", b)
    }
    val out = DocSet.of(spark, corpus.toSeq)
      .partitionAuto(tables = Some(new GeomTableProvider())).takeAll()
    assert(out.size == corpus.size, "every document must come back")
    assert(out.forall(d => outBytes(d) <= MaxOutBytes))
  }
}

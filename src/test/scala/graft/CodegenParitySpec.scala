package graft

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Interpreted-vs-codegen parity for every custom Catalyst Expression:
 * Spark evaluates an expression through `eval` (nullSafeEval) in
 * interpreted projections/filters and through `doGenCode` inside codegen'd
 * stages — WHICH path runs depends on the surrounding plan, codegen
 * fallbacks, and conf, so a divergence between the two implementations is
 * invisible to the result-level gates (they exercise one path per plan).
 * This is Spark's own checkEvaluation discipline applied to the graft
 * expression library: evaluate each expression on adversarial inputs via
 * BOTH paths and require identical results (including null-in/null-out).
 */
class CodegenParitySpec extends AnyFunSuite {
  // the session provides the codegen context config; no jobs run here
  lazy val spark = SparkFixture.spark

  private def bound(i: Int, dt: DataType) = BoundReference(i, dt, nullable = true)

  /** Evaluate `expr` interpreted (expr.eval) and codegen'd
    * (GenerateMutableProjection) on every row; compare normalized results. */
  private def check(name: String, expr: Expression, schema: Seq[DataType],
                    rows: Seq[Seq[Any]]): Unit = {
    assert(expr.checkInputDataTypes().isSuccess, s"$name: bad fixture types")
    val toCatalyst = schema.map(CatalystTypeConverters.createToCatalystConverter)
    val toScala = CatalystTypeConverters.createToScalaConverter(expr.dataType)
    val codegen = GenerateMutableProjection.generate(Seq(expr))
    // binary results convert to Array[Byte], whose == is reference equality
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case s: Seq[_] => s.map(norm)
      case r: org.apache.spark.sql.Row =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq.map(norm))
      case other => other
    }
    rows.foreach { r =>
      val row = InternalRow.fromSeq(r.zip(toCatalyst).map { case (v, c) => c(v) })
      val interp = norm(toScala(expr.eval(row)))
      val cg = norm(toScala(codegen(row).get(0, expr.dataType)))
      // boxed equals: NaN == NaN, arrays converted to Seq, structs to Row
      assert(interp == cg,
        s"$name: interpreted=$interp codegen=$cg on input ${r.map {
          case s: String => "\"" + s.take(40).replace("\n", "\\n") + "\""
          case a: Array[Byte] => s"bytes(${a.length})"
          case other => String.valueOf(other).take(60)
        }.mkString(", ")}")
    }
  }

  // adversarial strings: the gate corpus never exercises these
  private val strings: Seq[String] = Seq(
    "", " ", "a", "\u000b", "\t\n\r\f", "the the the", "x",
    "word", "Hello, World! #tag...", "line1\nline2\n\nline3",
    "\u0000ctl\u0001", "é combining", "ß DAS",
    "😀 emoji 𑀀", // astral plane
    "café Ã© mojibake â€™", "ＦＵＬＬｗｉｄｔｈ",
    "• bullet\n- dash\n* star", "trailing... …",
    "ALLCAPS SHOUTY TEXT", "12345 67890 1 2 3",
    "a" * 300, ("word " * 50).trim, "\n\n\n", "  leading and trailing  ",
    "日本語のテキストです。これはテストです。",
    "mixed 日本 and english عربى text")
  private val stringRows: Seq[Seq[Any]] = strings.map(Seq(_)) :+ Seq(null)

  private val stringPairs: Seq[Seq[Any]] = {
    val ss = Seq("", "a", "martha", "marhta", "the cat sat", "\u000b",
      "😀", "é", "é", "abcdefgh", "ABCDEFGH")
    (for (a <- ss; b <- ss) yield Seq[Any](a, b)) ++
      Seq(Seq(null, "x"), Seq("x", null), Seq(null, null))
  }

  private val stringArrays: Seq[Seq[Any]] = Seq(
    Seq(Seq.empty[String]),
    Seq(Seq("a")),
    Seq(Seq("", "")),
    Seq(Seq("a", "b", "a", "b", "a")),
    Seq(Seq("the", "cat", "sat", "on", "the", "mat")),
    Seq(Seq("😀", "é", "ß")),
    Seq(Seq("x" * 100, "y")),
    Seq((1 to 40).map(i => s"t$i")),
    Seq(null))

  private val stringArrayPairs: Seq[Seq[Any]] = {
    val arrs = Seq(Seq.empty[String], Seq("a"), Seq("a", "a", "b"),
      Seq("the", "cat"), Seq("é", "😀"))
    (for (a <- arrs; b <- arrs) yield Seq[Any](a, b)) ++
      Seq(Seq(null, Seq("a")), Seq(Seq("a"), null))
  }

  private val str = StringType
  private val arrStr = ArrayType(StringType, containsNull = false)

  test("string-input expressions: interpreted == codegen") {
    import graft.functions._
    check("TextStatsExpr", TextStatsExpr(bound(0, str)), Seq(str), stringRows)
    check("BpeishCountExpr", BpeishCountExpr(bound(0, str)), Seq(str), stringRows)
    check("ReadabilityExpr", ReadabilityExpr(bound(0, str)), Seq(str), stringRows)
    check("C4StatsExpr", C4StatsExpr(bound(0, str)), Seq(str), stringRows)
    check("GopherStatsExpr", GopherStatsExpr(bound(0, str)), Seq(str), stringRows)
    check("RepetitionStatsExpr", RepetitionStatsExpr(bound(0, str)), Seq(str), stringRows)
    check("FixMojibakeExpr", FixMojibakeExpr(bound(0, str)), Seq(str), stringRows)
    check("FixMojibakeFixpointExpr", FixMojibakeFixpointExpr(bound(0, str)),
      Seq(str), stringRows)
    check("NfcNormalizeExpr", NfcNormalizeExpr(bound(0, str)), Seq(str), stringRows)
    check("DedupKeyExpr", DedupKeyExpr(bound(0, str)), Seq(str), stringRows)
    check("LangIdExpr", LangIdExpr(bound(0, str)), Seq(str), stringRows)
    check("CompressionRatioExpr", CompressionRatioExpr(bound(0, str)),
      Seq(str), stringRows)
    check("CharShinglesExpr(3)", CharShinglesExpr(bound(0, str), 3),
      Seq(str), stringRows)
    check("PolyFingerprintExpr", PolyFingerprintExpr(bound(0, str), 31L, 1000000007L),
      Seq(str), stringRows)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("a", "the", "word", "é").foreach(bf.putString)
    check("BloomMightContainExpr", BloomMightContainExpr(bound(0, str), bf),
      Seq(str), stringRows)
  }

  test("string-pair expressions: interpreted == codegen") {
    import graft.functions._
    check("JaroWinklerExpr", JaroWinklerExpr(bound(0, str), bound(1, str)),
      Seq(str, str), stringPairs)
    check("ChrfStatsExpr(6)", ChrfStatsExpr(bound(0, str), bound(1, str), 6),
      Seq(str, str), stringPairs)
    check("SpanCorruptExpr", SpanCorruptExpr(bound(0, str), bound(1, str)),
      Seq(str, str), stringPairs)
  }

  test("string-array expressions: interpreted == codegen") {
    import graft.functions._
    check("ClippedOverlapExpr",
      ClippedOverlapExpr(bound(0, arrStr), bound(1, arrStr)),
      Seq(arrStr, arrStr), stringArrayPairs)
    check("HashedWeightSumExpr",
      HashedWeightSumExpr(bound(0, arrStr), (1 to 64).map(_.toLong * 7), 13L),
      Seq(arrStr), stringArrays)
    check("MinHashSignatureExpr(8)", MinHashSignatureExpr(bound(0, arrStr), 8),
      Seq(arrStr), stringArrays)
    check("SimHash64Expr", SimHash64Expr(bound(0, arrStr)), Seq(arrStr), stringArrays)
    check("SimHashPolyExpr", SimHashPolyExpr(bound(0, arrStr)), Seq(arrStr), stringArrays)
    check("MinHashPolyExpr(8)", MinHashPolyExpr(bound(0, arrStr), 8),
      Seq(arrStr), stringArrays)
    check("TopCountExpr", TopCountExpr(bound(0, arrStr)), Seq(arrStr), stringArrays)
    check("WordShinglesExpr(2)", WordShinglesExpr(bound(0, arrStr), 2),
      Seq(arrStr), stringArrays)
    check("BpeEncodeExpr", graft.operators.BpeEncodeExpr(bound(0, arrStr),
      Seq(("t", "h"), ("th", "e"), ("a", "t"), ("c", "at"))),
      Seq(arrStr), stringArrays)
  }

  test("numeric-array expressions: interpreted == codegen") {
    import graft.functions._
    val arrD = ArrayType(DoubleType, containsNull = false)
    val arrF = ArrayType(FloatType, containsNull = false)
    val arrL = ArrayType(LongType, containsNull = false)
    val dRows: Seq[Seq[Any]] = Seq(
      Seq(Seq(0.0, 0.0, 0.0)), Seq(Seq(1.0, -2.0, 3.5)),
      Seq(Seq(Double.MinPositiveValue, 1e300, -1e300)),
      Seq(Seq.empty[Double]), Seq(null))
    val dPairs: Seq[Seq[Any]] = Seq(
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Seq(Seq(0.0), Seq(0.0)),
      Seq(Seq.empty[Double], Seq.empty[Double]),
      Seq(Seq(1.5, -2.5, 3.0), Seq(-1.0, 0.5, 2.0)),
      Seq(null, Seq(1.0)), Seq(Seq(1.0), null))
    check("DotProductExpr(double)",
      DotProductExpr(bound(0, arrD), bound(1, arrD)), Seq(arrD, arrD), dPairs)
    val fPairs: Seq[Seq[Any]] = Seq(
      Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      Seq(Seq(0.25f, -0.5f), Seq(0.125f, 8.0f)),
      Seq(Seq.empty[Float], Seq.empty[Float]))
    check("DotProductExpr(float)",
      DotProductExpr(bound(0, arrF), bound(1, arrF)), Seq(arrF, arrF), fPairs)
    val planes = Array(Array(1.0, -1.0, 0.5), Array(-0.5, 0.25, 1.0))
    check("SignBucketExpr(double)",
      graft.dedup.SignBucketExpr(bound(0, arrD), planes), Seq(arrD),
      Seq(Seq(Seq(1.0, 2.0, 3.0)), Seq(Seq(-1.0, -2.0, -3.0)),
        Seq(Seq(0.0, 0.0, 0.0)), Seq(null)))
    val fRows: Seq[Seq[Any]] = Seq(
      Seq(Seq(1.0f, 2.0f, 3.0f)), Seq(Seq(-1.0f, 0.0f, 0.5f)), Seq(null))
    check("SignBucketExpr(float)",
      graft.dedup.SignBucketExpr(bound(0, arrF), planes), Seq(arrF), fRows)
    val cents = Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
    check("NearestCentroidExpr",
      graft.ann.NearestCentroidExpr(bound(0, arrD), cents), Seq(arrD),
      Seq(Seq(Seq(0.1, 0.1, 0.1)), Seq(Seq(0.9, 0.9, 0.9)),
        Seq(Seq(0.5, 0.5, 0.5)), Seq(null)))
    check("LshBandKeysExpr(4,2)", LshBandKeysExpr(bound(0, arrL), 4, 2),
      Seq(arrL), Seq(
        Seq((1L to 8L).toSeq), Seq(Seq(0L, -1L, Long.MaxValue, Long.MinValue,
          7L, 8L, 9L, 10L)), Seq(null)))
  }

  test("long-input expressions: interpreted == codegen") {
    check("AudioBytesExpr", graft.operators.AudioBytesExpr(bound(0, LongType)),
      Seq(LongType), Seq(Seq(0L), Seq(7L), Seq(12345L), Seq(null)))
    check("VideoBytesExpr", graft.operators.VideoBytesExpr(bound(0, LongType)),
      Seq(LongType), Seq(Seq(0L), Seq(7L), Seq(12345L), Seq(null)))
    check("ZValueExpr(2 cols, 8 bits)",
      graft.operators.ZValueExpr(Seq(bound(0, LongType), bound(1, LongType)), 8),
      Seq(LongType, LongType),
      Seq(Seq(0L, 0L), Seq(1L, 2L), Seq(255L, 255L), Seq(256L, -1L),
        Seq(Long.MaxValue, Long.MinValue), Seq(null, 3L), Seq(3L, null)))
  }

  test("binary-input expressions: interpreted == codegen") {
    import graft.operators._
    def ppm(w: Int, h: Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val px = Array.tabulate(w * h * 3)(i => ((i * 37) % 256).toByte)
      header ++ px
    }
    val wav = AudioCorpus.bytesFor(7L)
    val vid = VideoCorpus.bytesFor(7L)
    val garbage = Array.tabulate(64)(i => (i * 13).toByte)
    val binRows: Seq[Seq[Any]] = Seq(
      Seq(ppm(9, 8)), Seq(ppm(1, 1)), Seq(garbage),
      Seq(Array.emptyByteArray), Seq("%PDF-1.4 stub".getBytes("US-ASCII")),
      Seq(wav), Seq(null))
    check("SniffExpr", SniffExpr(bound(0, BinaryType)), Seq(BinaryType), binRows)
    check("DHashExpr", DHashExpr(bound(0, BinaryType)), Seq(BinaryType), binRows)
    check("ColorHistogramExpr", ColorHistogramExpr(bound(0, BinaryType)),
      Seq(BinaryType), binRows)
    val audioRows: Seq[Seq[Any]] = Seq(
      Seq(wav), Seq(AudioCorpus.bytesFor(0L)), Seq(garbage),
      Seq(Array.emptyByteArray), Seq(null))
    check("AudioHashExpr", AudioHashExpr(bound(0, BinaryType)),
      Seq(BinaryType), audioRows)
    check("AudioEnvelopeExpr", AudioEnvelopeExpr(bound(0, BinaryType)),
      Seq(BinaryType), audioRows)
    val videoRows: Seq[Seq[Any]] = Seq(
      Seq(vid), Seq(VideoCorpus.bytesFor(0L)), Seq(garbage), Seq(null))
    check("FrameSampleExpr", FrameSampleExpr(bound(0, BinaryType), 2,
      new MediaOps.FakeFrameSampler), Seq(BinaryType), videoRows)
  }
}

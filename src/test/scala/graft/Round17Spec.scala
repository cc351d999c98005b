package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-17 review-pass pins: contract bugs found by the operators/ sweep
  * (nulls, negative keys, integer-division precision, null tokens) — each
  * test fails on the pre-fix implementation. */
class Round17Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ----------------------------------------------------- EventAnalytics

  test("seasonality: negative (pre-epoch) timestamps land in the floor-division slot") {
    // ts = -1 with slotNs=10, nSlots=4: floor(-1/10) = -1, pmod(-1,4) = 3.
    // Truncating DIV would give 0 -> slot 0 — the wrong cyclic slot.
    val ev = Seq(("k", -1L), ("k", -1L), ("k", 25L)).toDF("key", "ts")
    val out = EventAnalytics.seasonality(ev, "key", "ts", 10L, 4)
      .select("slot", "n").as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 2L, 2L -> 1L), s"got $out")
  }

  test("seasonality: works on a column name that needs backticks") {
    val ev = Seq(("k", 35L)).toDF("key", "week day")
    val out = EventAnalytics.seasonality(ev, "key", "week day", 10L, 4)
      .select("slot").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("funnel: null users are excluded from the entry population") {
    val ev = Seq(
      (Some("u1"), "a", 1L), (Some("u1"), "b", 2L),
      (None: Option[String], "a", 1L) // can never convert; must not deflate
    ).toDF("u", "e", "ts")
    val out = EventAnalytics.funnel(ev, "u", "e", "ts", Seq("a", "b"))
      .select("step", "users", "conversion").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, 1.0)))
    assert(out(1) == ((2L, 1L, 1.0)), s"null user deflated conversion: ${out(1)}")
  }

  test("markovTransitions: null event types are absent records, not states") {
    val ev = Seq(
      (Some("u"), Some("a"), 1L, 1L), (Some("u"), Some("b"), 2L, 2L),
      (Some("u"), None: Option[String], 3L, 3L),
      (None: Option[String], Some("a"), 4L, 4L)
    ).toDF("u", "e", "ts", "id")
    val out = EventAnalytics.markovTransitions(ev, "u", "e", "ts", "id")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(out == Set(("a", "b")), s"got $out")
  }

  // --------------------------------------------------------------- Stats

  test("ksDistance: a negative side label maps into a CDF instead of vanishing") {
    // sides -1 (odd -> b) and 0 (a); identical value distributions -> ks 0
    val df = Seq((1L, -1L), (2L, -1L), (1L, 0L), (2L, 0L)).toDF("v", "side")
    val r = Stats.ksDistance(df, col("v"), col("side")).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L,
      s"negative side vanished: $r")
    assert(r.getAs[Long]("ks_num") == 0L)
  }

  // --------------------------------------------------------- Calibration

  test("winsorize: null values neither claim ranks nor corrupt the bounds") {
    // 10 non-null values 1..10 (+2 nulls). lo=0 -> rank 0 -> 1;
    // hi=1000 -> rank 9 -> 10. Pre-fix, nulls ranked first and a null at a
    // bound rank read back as 0 via Row.getLong.
    val df = ((1 to 10).map(i => Some(i.toLong)) ++ Seq(None, None))
      .zipWithIndex.map { case (v, i) => (s"id$i", v) }.toDF("id", "v")
    val out = Calibration.winsorize(df, col("v"), "id", 0, 1000)
    val clipped = out.where(col("clipped")).count()
    assert(clipped == 0L, "no non-null value should clip at 0/1000 permille")
    val nullRows = out.where(col("v").isNull).select("clipped_value", "clipped")
      .collect()
    assert(nullRows.length == 2 && nullRows.forall(_.isNullAt(0)),
      "null values should pass through with null clip")
  }

  // ------------------------------------------------------------- Packing

  test("rankBins: bins match exact integer floor(rank*nBins/n)") {
    val df = (0 until 10).map(i => (s"id$i", i.toLong)).toDF("id", "v")
    val bins = Packing.rankBins(df, Seq(col("v")), "id", 3)
      .orderBy("v").select("bin").as[Long].collect().toSeq
    assert(bins == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L))
  }

  test("packSequences: a null token count is an empty doc, not a null span") {
    val df = Seq(("a", Some(3L)), ("b", None: Option[Long]), ("c", Some(2L)))
      .toDF("id", "toks")
    val out = Packing.packSequences(df, "id", col("toks"), 4)
      .orderBy("id").select("tok_start", "tok_end").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 3L), (3L, 3L), (3L, 5L)), s"got ${out.toSeq}")
  }

  // ------------------------------------------------------------- Linkage

  test("fellegiSunter: a null agreement (missing field) contributes no evidence") {
    val pairs = Seq((1L, Some(true)), (2L, Some(false)), (3L, None: Option[Boolean]))
      .toDF("pair", "agr")
    val f = Linkage.Field("f", col("agr"), m = 0.9, u = 0.1)
    val (wa, wd) = Linkage.milliBits(0.9, 0.1)
    val out = Linkage.fellegiSunter(pairs, Seq(f), upperMb = wa, lowerMb = wd)
      .select("pair", "weight_mb").as[(Long, Long)].collect().toMap
    assert(out(1L) == wa && out(2L) == wd)
    assert(out(3L) == 0L, s"missing comparison must weigh 0, got ${out(3L)}")
  }

  // ----------------------------------------------------------- FuzzyJoin

  test("jaccardJoin: null tokens are stripped, not counted at verify") {
    // both sets carry a null token; without array_compact the verify
    // intersection counts null while the prefix ranking dropped it
    val l = Seq((1L, Seq[String]("x", "y", null))).toDF("id", "toks")
    val r = Seq((10L, Seq[String]("x", "y", null))).toDF("id", "toks")
    val out = FuzzyJoin.jaccardJoin(l, r, "id", "toks", 1, 2)
      .select("inter", "uni").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 2L)), s"null token leaked into the verify: $out")
  }

  // ---------------------------------------------------------------- Ooxml

  test("DocxPartitioner: a hostile gridSpan neither crashes nor allocates span-sized arrays") {
    // minimal docx: one table with gridSpan="2000000000" (an OOM bomb if
    // honored) and one with an 11-digit span (a NumberFormatException
    // poison pill if parsed with toInt)
    def docx(span: String): Array[Byte] = {
      val xml =
        s"""<w:document><w:body><w:tbl><w:tr><w:tc>
           |<w:tcPr><w:gridSpan w:val="$span"/></w:tcPr>
           |<w:p><w:r><w:t>cell</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
           |</w:body></w:document>""".stripMargin
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write(xml.getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    Seq("2000000000", "99999999999").foreach { span =>
      val d = graft.model.Document.of("d1").copy(
        binaryRepresentation = Some(docx(span)))
      val out = new DocxPartitioner().partition(d)
      val cells = out.elements.flatMap(_.tableCells)
      assert(cells.nonEmpty && cells.forall(_.cols.length <= 1024),
        s"span=$span produced ${cells.map(_.cols.length)}")
    }
  }

  test("HtmlPartitioner: a hostile colspan neither crashes nor allocates span-sized arrays") {
    Seq("2000000000", "99999999999").foreach { span =>
      val html =
        s"""<html><body><table><tr>
           |<td colspan="$span">a</td><td>b</td></tr></table></body></html>"""
          .stripMargin
      val d = graft.model.Document.of("h1")
        .copy(binaryRepresentation = Some(html.getBytes("UTF-8")))
      val out = new HtmlPartitioner(extractTables = true).partition(d)
      val cells = out.elements.flatMap(_.tableCells)
      assert(cells.nonEmpty && cells.forall(_.cols.length <= 1024),
        s"colspan=$span produced ${cells.map(_.cols.length)}")
    }
  }

  // --------------------------------------------------- Marks / SplitElements

  test("Marks: a garbage page_number degrades to page 1 instead of killing the task") {
    val d = graft.model.Document.of("d1", elements = Seq(
      graft.model.Element.text(0, "NarrativeText", "a",
        properties = Map("page_number" -> "not-a-number")),
      graft.model.Element.text(1, "NarrativeText", "b",
        properties = Map("page_number" -> "2"))))
    val out = Marks.markBreakPage(d) // page() parse happens here
    assert(out.elements.count(_.prop("_break").contains("true")) == 1)
  }

  test("SplitElements: a sub-token budget is rejected loudly, not an infinite loop") {
    val e = graft.model.Element.text(0, "NarrativeText", "one two three")
    assertThrows[IllegalArgumentException](SplitElements.splitOne(e, 0))
  }

  // ------------------------------------------------------------ gf.iban

  test("ibanValid: ISO 13616 mod-97 checksum, separators and case tolerated") {
    import graft.functions.gf
    val rows = Seq(
      "GB82WEST12345698765432",       // canonical valid example
      "GB82 WEST 1234 5698 7654 32",  // with separators
      "gb82-west-1234-5698-7654-32",  // lowercase + dashes
      "DE89370400440532013000",       // valid German IBAN
      "GB82WEST12345698765433",       // one digit off -> invalid
      "GB00WEST12345698765432",       // wrong check digits -> invalid
      "XX12",                         // too short
      "1234567890123456",             // no country code
      "")
      .toDF("s").select(gf.ibanValid(col("s"))).as[Boolean].collect().toSeq
    assert(rows == Seq(true, true, true, true, false, false, false, false, false))
  }

  test("scrubIbans redacts checksum-valid IBANs only") {
    import graft.functions.gf
    val txt = "pay DE89370400440532013000 not GB82WEST12345698765433 ok"
    val out = Seq(txt).toDF("t").select(gf.scrubIbans(col("t"))).head().getString(0)
    assert(out == "pay [IBAN] not GB82WEST12345698765433 ok", out)
  }

  // -------------------------------------------------------------- Robots

  test("robots: a named group with no usable rules means allow-all, not *-fallback") {
    // RFC 9309 §2.2.1: when a group names the agent, only that group
    // applies — even when it carries no rules. (Blank lines do NOT split
    // groups — consecutive user-agent lines stack onto one group — so the
    // empty named group sits after the * group's rules.)
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |""".stripMargin
    assert(Robots.parse(txt, "graftbot") == Nil,
      "explicitly-freed agent must not inherit the * disallows")
    assert(Robots.parse(txt, "otherbot") == Seq(("/", false)))
    // a named group whose only rules use out-of-scope wildcards likewise
    // resolves to allow-all for that agent
    val wild =
      """User-agent: graftbot
        |Disallow: /private*
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(Robots.parse(wild, "graftbot") == Nil)
  }

  // -------------------------------------------------------------- Checks

  test("UniqueCheck: null keys are key values, not automatic violations") {
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    val out = Checks.run(df, Seq(Checks.UniqueCheck("uniq_k", Seq(col("k")))))
      .select("n_violations").as[Long].head()
    // two null-key rows = ONE duplicate; pre-fix countDistinct skipped both
    // nulls and reported 2
    assert(out == 1L, s"got $out")
    val single = Seq(Some("a"), None).toDF("k")
    val out1 = Checks.run(single, Seq(Checks.UniqueCheck("uniq_k", Seq(col("k")))))
      .select("n_violations").as[Long].head()
    assert(out1 == 0L, s"a single null key is not a duplicate: $out1")
  }
}

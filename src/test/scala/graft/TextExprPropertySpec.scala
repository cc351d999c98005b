package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.gf

/**
 * Property coverage for the single-pass text expressions: on RANDOM
 * strings (whitespace-heavy, unicode, punctuation, supplementary planes),
 * the codegen'd rewrites must equal the composed Column formulations they
 * replaced — the differential FunctionsSpec cases are hand-picked; this
 * is the adversarial sweep. All samples evaluate through ONE DataFrame
 * (per-sample Spark jobs would take minutes).
 */
class TextExprPropertySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Gen.sample returns None nondeterministically under load — retry
    * instead of .get (a one-in-many-runs flake under the full parallel
    * suite; the generators here never actually fail, only time out). */
  private def sampled[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  private val genText: Gen[String] = {
    val atom = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      3 -> Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  ", "\n\n"),
      2 -> Gen.oneOf(".", "!", "?", "#", "...", "…", "•", "-", "*", "{", "\""),
      2 -> Gen.oneOf("é", "ß", "日", "ü", " ", " "),
      1 -> Gen.oneOf("\uD83D\uDE00", "\uD804\uDC00"), // astral plane
      2 -> Gen.oneOf("the", "be", "to", "of", "and", "that", "have", "with", "The", "THE"))
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
  }

  test("TextStatsExpr / BpeishCountExpr equal their composed forms on random text") {
    val samples = sampled(Gen.listOfN(400, genText))
    val df = samples.toDF("t")
    val specTokens = split(trim(lower($"t")), "\\s+")
    val rows = df.select(
      gf.tokenCount($"t").as("tc"),
      when(length(trim($"t")) === 0, lit(0)).otherwise(size(specTokens)).as("s_tc"),
      gf.punctCount($"t").as("pc"),
      (length($"t") - length(regexp_replace($"t", "\\p{Punct}", ""))).as("s_pc"),
      gf.stopwordRatio($"t").as("sr"),
      when(length(trim($"t")) === 0, lit(0.0)).otherwise(
        size(filter(specTokens, t => t.isin(gf.EnglishStopwords: _*))).cast("double") /
          size(specTokens)).as("s_sr"),
      gf.meanTokenLength($"t").as("ml"),
      when(length(trim($"t")) === 0, lit(0.0)).otherwise(
        aggregate(specTokens, lit(0L), (a, t) => a + length(t)).cast("double") /
          size(specTokens)).as("s_ml"),
      gf.bpeishTokenCount($"t").as("bc"),
      size(regexp_extract_all($"t", lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("s_bc"),
      $"t").collect()
    rows.foreach { r =>
      val t = r.getAs[String]("t")
      def show = s"on ${t.take(60).replace("\n", "\\n")}"
      assert(r.getAs[Int]("tc") == r.getAs[Int]("s_tc"), s"tokenCount $show")
      assert(r.getAs[Int]("pc") == r.getAs[Int]("s_pc"), s"punctCount $show")
      assert(r.getAs[Double]("sr") == r.getAs[Double]("s_sr"), s"stopwordRatio $show")
      assert(r.getAs[Double]("ml") == r.getAs[Double]("s_ml"), s"meanTokenLength $show")
      assert(r.getAs[Int]("bc") == r.getAs[Int]("s_bc"), s"bpeish $show")
    }
  }

  test("GopherStatsExpr invariants and composed-form agreement on random text") {
    val samples = sampled(Gen.listOfN(400, genText))
    val df = samples.toDF("t")
    val st = gf.gopherStats($"t")
    // composed reference forms for the fields that have clean Column twins
    val words = filter(split($"t", "\\s+"), w => w =!= "")
    val lines = split($"t", "\n")
    val rows = df.select(
      st.getField("n_words").as("nw"), size(words).cast("long").as("s_nw"),
      st.getField("n_alpha_words").as("na"),
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long").as("s_na"),
      st.getField("word_char_sum").as("cs"),
      aggregate(words, lit(0L), (a, w) => a + length(w)).as("s_cs"),
      st.getField("n_hash").as("nh"),
      (length($"t") - length(regexp_replace($"t", "#", ""))).cast("long").as("s_nh"),
      st.getField("n_lines").as("nl"), size(lines).cast("long").as("s_nl"),
      st.getField("n_bullet_lines").as("nb"),
      size(filter(lines, l => l.rlike("^ *[•*-]"))).cast("long").as("s_nb"),
      st.getField("n_ellipsis_lines").as("ne"),
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…) *\\z"))).cast("long").as("s_ne"),
      st.getField("n_stop_distinct").as("ns"),
      $"t").collect()
    rows.foreach { r =>
      val t = r.getAs[String]("t")
      def show = s"on ${t.take(60).replace("\n", "\\n")}"
      assert(r.getAs[Long]("nw") == r.getAs[Long]("s_nw"), s"n_words $show")
      assert(r.getAs[Long]("na") == r.getAs[Long]("s_na"), s"n_alpha_words $show")
      assert(r.getAs[Long]("cs") == r.getAs[Long]("s_cs"), s"word_char_sum $show")
      assert(r.getAs[Long]("nh") == r.getAs[Long]("s_nh"), s"n_hash $show")
      assert(r.getAs[Long]("nl") == r.getAs[Long]("s_nl"), s"n_lines $show")
      assert(r.getAs[Long]("nb") == r.getAs[Long]("s_nb"), s"n_bullet_lines $show")
      assert(r.getAs[Long]("ne") == r.getAs[Long]("s_ne"), s"n_ellipsis_lines $show")
      assert(r.getAs[Long]("ns") <= 8L && r.getAs[Long]("ns") >= 0L, s"stop bound $show")
      assert(r.getAs[Long]("na") <= r.getAs[Long]("nw"), s"alpha<=words $show")
      assert(r.getAs[Long]("nb") + 0L <= r.getAs[Long]("nl"), s"bullet<=lines $show")
    }
  }

  test("fixMojibake equals the sequential-replace model on random carriers") {
    // model-based property: the expression (byte fast path + sweep) must
    // equal a plain fold of String.replace over the shared table — the
    // semantics the DuckDB oracle chain encodes. Carriers embed mapping
    // inputs AND raw fragment atoms (€, ™, lone Ã/Â/â) so abutting-
    // fragment compositions are exercised, not just whole sequences.
    import graft.functions.MojibakeRepair
    val moji = MojibakeRepair.Mappings
    def model(t: String) = moji.foldLeft(t) { case (acc, (k, v)) => acc.replace(k, v) }
    val fragment = Gen.oneOf("\u20AC", "\u2122", "\u00C3", "\u00C2", "\u00E2", "\u0153")
    val gen = for {
      pre <- genText
      k <- Gen.oneOf(moji).map(_._1)
      mid <- fragment
      k2 <- Gen.oneOf(moji).map(_._1)
      post <- genText
    } yield pre + k + mid + k2 + post
    val samples = sampled(Gen.listOfN(300, gen))
    val out = samples.toDF("t").select($"t", gf.fixMojibake($"t").as("f")).collect()
    out.foreach { r =>
      assert(r.getString(1) == model(r.getString(0)),
        s"model mismatch on ${r.getString(0).take(40)}")
    }
  }

  test("fixMojibakeFixpoint: idempotent on adversarial nestings, recovers multi-encoding") {
    import graft.functions.MojibakeRepair
    val moji = MojibakeRepair.Mappings
    def sweep(t: String) = moji.foldLeft(t) { case (acc, (k, v)) => acc.replace(k, v) }
    // one more Windows-1252 mis-decode of the text's UTF-8 bytes; None when
    // the bytes hit a cp1252 hole (0x81/8D/8F/90/9D -> U+FFFD, not invertible)
    def encode(t: String): Option[String] = {
      val m = new String(t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.Charset.forName("windows-1252"))
      if (m.contains('�')) None else Some(m)
    }
    // adversarial pool: single/double/triple encodings of mapped targets plus
    // abutting-fragment carriers — exactly the inputs one sweep can leave dirty
    val targets = moji.map(_._2)
    val nested = targets.flatMap { t =>
      val e1 = encode(t)
      val e2 = e1.flatMap(encode)
      val e3 = e2.flatMap(encode)
      Seq(e1, e2, e3).flatten
    }
    val fragment = Gen.oneOf("€", "™", "Ã", "Â", "â")
    val gen = for {
      pre <- genText
      a <- Gen.oneOf(nested)
      mid <- fragment
      b <- Gen.oneOf(nested)
      post <- genText
    } yield pre + a + mid + b + post
    val samples = sampled(Gen.listOfN(300, gen)) ++ nested
    val out = samples.toDF("t")
      .select($"t", gf.fixMojibakeFixpoint($"t").as("fp")).collect()
    out.foreach { r =>
      val fp = r.getString(1)
      assert(sweep(fp) == fp,
        s"not a fixpoint: '${r.getString(0).take(40)}' -> '${fp.take(40)}'")
    }
    // recovery: a clean target put through k<=3 encodings comes back exactly
    targets.foreach { t =>
      var enc: Option[String] = Some(t)
      (1 to 3).foreach { k =>
        enc = enc.flatMap(encode)
        enc.foreach { m =>
          val got = Seq(m).toDF("t")
            .select(gf.fixMojibakeFixpoint($"t")).head().getString(0)
          assert(got == t, s"depth-$k encoding of '$t' ('$m') repaired to '$got'")
        }
      }
    }
  }

  test("RepetitionStatsExpr equals an independent model on random structured text") {
    // independent Scala model (collections-based groupBy, no shared code
    // with the expression's hash-map single pass)
    def model(text: String): Seq[Long] = {
      def trimSeg(s: String) = s.dropWhile(c => " \t\u000B\f\r".contains(c))
        .reverse.dropWhile(c => " \t\u000B\f\r".contains(c)).reverse
      def cp(s: String) = s.codePointCount(0, s.length).toLong
      def seg(parts: Array[String]): Seq[Long] = {
        val vals = parts.map(trimSeg).filter(_.nonEmpty)
        val byVal = vals.groupBy(identity).view.mapValues(_.length.toLong).toMap
        Seq(vals.length.toLong,
          byVal.valuesIterator.map(c => c - 1).sum,
          vals.map(cp).sum,
          byVal.iterator.map { case (v, c) => (c - 1) * cp(v) }.sum)
      }
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val wl = words.map(cp)
      def gramsOf(n: Int) = words.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val tops = Seq(2, 3, 4).map { n =>
        val gs = gramsOf(n)
        if (gs.isEmpty) 0L else {
          val cnt = gs.groupBy(identity).view.mapValues(_.length.toLong).toMap
          val mx = cnt.values.max
          if (mx < 2) 0L
          else {
            val k = cnt.filter(_._2 == mx).keys.min
            mx * (cp(k) - (n - 1))
          }
        }
      }
      val dups = Seq(5, 6, 7, 8, 9, 10).map { n =>
        val gs = gramsOf(n)
        if (gs.isEmpty) 0L else {
          val cnt = gs.groupBy(identity).view.mapValues(_.length).toMap
          val covered = gs.zipWithIndex.collect {
            case (g, i) if cnt(g) >= 2 => i until (i + n)
          }.flatten.toSet
          covered.toSeq.map(wl).sum
        }
      }
      seg(text.split("\n", -1)) ++ seg(text.split("\n{2,}", -1)) ++
        (wl.sum +: tops) ++ dups
    }
    // generator: repetition-heavy structured text — repeated lines, blank
    // lines, repeated phrases, plus the generic adversarial atoms
    val phrase = Gen.oneOf("buy now", "the cat sat", "a b", "x y z w v",
      "Click HERE today", "é ü 日")
    val sep = Gen.frequency(4 -> Gen.const("\n"), 2 -> Gen.const("\n\n"),
      1 -> Gen.const("\n\n\n"), 3 -> Gen.const(" "), 1 -> Gen.const("\t"))
    val gen = for {
      n <- Gen.chooseNum(0, 25)
      parts <- Gen.listOfN(n, Gen.frequency(5 -> phrase, 2 -> genText))
      seps <- Gen.listOfN(n, sep)
    } yield parts.zip(seps).map { case (p, s) => p + s }.mkString
    val samples = sampled(Gen.listOfN(200, gen))
    val fields = Seq("n_lines", "dup_lines", "line_chars", "dup_line_chars",
      "n_paras", "dup_paras", "para_chars", "dup_para_chars", "word_chars",
      "top2_chars", "top3_chars", "top4_chars") ++
      (5 to 10).map(n => s"dup${n}_chars")
    val rows = samples.toDF("t")
      .select($"t", gf.repetitionStats($"t").as("r")).select($"t", $"r.*").collect()
    rows.foreach { r =>
      val got = fields.map(f => r.getAs[Long](f))
      val want = model(r.getString(0))
      assert(got == want,
        s"mismatch on ${r.getString(0).take(60).replace("\n", "\\n")}: got=$got want=$want")
    }
  }

  test("JaroWinklerExpr: textbook values, bounds, symmetry, empty semantics") {
    import spark.implicits._
    val pairs = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("duane", "dwayne"),
      ("", ""), ("a", ""), ("abc", "abc"), ("abc", "xyz"))
    val df = pairs.toDF("a", "b")
    val got = df.select(gf.jaroWinkler($"a", $"b")).collect().map(_.getDouble(0))
    assert(got(0) == 0.9611111111111111)      // Winkler's canonical example
    assert(math.abs(got(1) - 0.8133333333333332) < 1e-15)
    assert(got(3) == 0.0 && got(4) == 0.0)    // empty => 0 (DuckDB semantics)
    assert(got(5) == 1.0 && got(6) == 0.0)
    // symmetry + bounds on random pairs
    val rnd = sampled(Gen.listOfN(300,
      Gen.zip(Gen.alphaStr.map(_.take(10)), Gen.alphaStr.map(_.take(10)))))
    val sym = rnd.toDF("a", "b").select(
      gf.jaroWinkler($"a", $"b").as("f"), gf.jaroWinkler($"b", $"a").as("g")).collect()
    sym.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "JW must be symmetric")
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    }
  }

  test("ClippedOverlapExpr equals the HOF aggregate form and a Scala model") {
    val word = Gen.frequency(5 -> Gen.oneOf("a", "b", "c", "ab", "the", ""),
      2 -> Gen.alphaNumStr.map(_.take(4)), 1 -> Gen.oneOf("é", "日", "…"))
    val arr = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, word))
    val pairs = sampled(Gen.listOfN(300, Gen.zip(arr, arr)))
    val df = pairs.toDF("a", "b")
    val hof = aggregate(array_distinct($"a"), lit(0),
      (acc, t) => acc + least(size(filter($"a", x => x === t)),
        size(filter($"b", x => x === t))))
    val rows = df.select($"a", $"b",
      gf.clippedOverlap($"a", $"b").as("got"), hof.as("hofv")).collect()
    rows.foreach { r =>
      val a = r.getSeq[String](0); val b = r.getSeq[String](1)
      val ca = a.groupBy(identity).view.mapValues(_.size)
      val cb = b.groupBy(identity).view.mapValues(_.size).toMap
      val want = ca.map { case (k, n) => math.min(n, cb.getOrElse(k, 0)) }.sum
      assert(r.getInt(2) == want && r.getInt(3) == want,
        s"mismatch a=$a b=$b got=${r.getInt(2)} hof=${r.getInt(3)} want=$want")
    }
  }
}

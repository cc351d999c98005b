package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Column-function library semantics, evaluated through real Spark plans. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokenCount / bpeishTokenCount") {
    assert(one[Int](gf.tokenCount($"t"), "a  b   c") == 3)
    assert(one[Int](gf.tokenCount($"t"), "   ") == 0)
    assert(one[Int](gf.bpeishTokenCount($"t"), "don't stop, now!") == 7)
  }

  test("topCount: max multiplicity in one pass, null-safe, empty-safe") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "c", "a")),
      (2L, Seq("x", "y")),
      (3L, Seq.empty[String])).toDF("id", "arr")
    val out = df.select(col("id"), gf.topCount(col("arr")).as("tc"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 0))
    // matches the relational formulation (explode + count + max) on text data
    val docs = Seq((1L, "w u w u w z"), (2L, "p q r")).toDF("doc_id", "t")
    val viaExpr = docs.select(col("doc_id"),
      gf.topCount(gf.wordShingles(col("t"), 2)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaAgg = docs.select(col("doc_id"), explode(gf.wordShingles(col("t"), 2)).as("bg"))
      .groupBy("doc_id", "bg").count().groupBy("doc_id")
      .agg(max("count").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(viaExpr == viaAgg)
  }

  test("wordShingles windows and short-text fallback") {
    def shingles(n: Int, text: String): Seq[String] =
      Seq(text).toDF("t").select(gf.wordShingles($"t", n).as("r"))
        .head().getSeq[String](0).toList
    assert(shingles(2, "a b c") == List("a b", "b c"))
    assert(shingles(5, "a b") == List("a b"))
  }

  test("minhash signature: equal texts equal, length k, stable") {
    val df = Seq("x y z w v u t s", "x y z w v u t s", "totally different words here now")
      .toDF("t").select(gf.minhashSignature(gf.wordShingles($"t", 3), 16).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs.forall(_.length == 16))
  }

  test("simhash: identical -> hamming 0; near texts closer than far texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "astrophysics concerns stellar formation and galactic dynamics entirely")
    val hs = texts.toDF("t").select(gf.simhash64($"t").as("h")).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(0)) == 0)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)))
  }

  test("cosineSimilarity / dotProduct on float arrays") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)), (Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val sims = df.select(gf.cosineSimilarity($"a", $"b").as("c")).collect().map(_.getDouble(0))
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
  }

  test("TextStatsExpr metrics match the composed Column formulations bit-for-bit") {
    // the single-pass expression replaced these formulations (the
    // LambdaFunction re-tokenization fix); any divergence on edge cases
    // would silently break the DuckDB oracle hash-match
    val specTokens = split(trim(lower($"t")), "\\s+")
    val specTokenCount = when(length(trim($"t")) === 0, lit(0)).otherwise(size(specTokens))
    val specPunct = length($"t") - length(regexp_replace($"t", "\\p{Punct}", ""))
    val specAlpha = when(length($"t") === 0, lit(0.0)).otherwise(
      (length($"t") - length(regexp_replace($"t", "[a-zA-Z]", ""))).cast("double") / length($"t"))
    val specStop = when(length(trim($"t")) === 0, lit(0.0)).otherwise(
      size(filter(specTokens, t => t.isin(gf.EnglishStopwords: _*))).cast("double") / size(specTokens))
    val specMean = when(length(trim($"t")) === 0, lit(0.0)).otherwise(
      aggregate(specTokens, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(specTokens))
    val cases = Seq(
      "The quick brown fox is a fox.", "", "   ", "\n\n", "\tfoo bar \n",
      "\n\nleading newline", "trailing newline\n", "a  b   c", "!!!???...",
      "café naïve über", "日本語 テスト",
      "the of and a an to in is", "mixed: the café, and 42 — déjà vu!",
      "x", " x ", "ab", "it was the best of times, it was the worst of times")
    val df = (cases :+ null).toDF("t")
    val got = df.select(
      gf.tokenCount($"t").as("tc"), gf.punctCount($"t").as("pc"),
      gf.alphaRatio($"t").as("ar"), gf.stopwordRatio($"t").as("sr"),
      gf.meanTokenLength($"t").as("ml"),
      specTokenCount.as("s_tc"), specPunct.as("s_pc"), specAlpha.as("s_ar"),
      specStop.as("s_sr"), specMean.as("s_ml")).collect()
    got.zipWithIndex.foreach { case (r, i) =>
      def eq(a: Any, b: Any) = (a == null && b == null) || a == b
      assert(eq(r.get(0), r.get(5)), s"tokenCount case $i: ${r.get(0)} vs ${r.get(5)}")
      assert(eq(r.get(1), r.get(6)), s"punctCount case $i: ${r.get(1)} vs ${r.get(6)}")
      assert(eq(r.get(2), r.get(7)), s"alphaRatio case $i: ${r.get(2)} vs ${r.get(7)}")
      assert(eq(r.get(3), r.get(8)), s"stopwordRatio case $i: ${r.get(3)} vs ${r.get(8)}")
      assert(eq(r.get(4), r.get(9)), s"meanTokenLength case $i: ${r.get(4)} vs ${r.get(9)}")
    }
    // custom stopword lists keep the composable path and its semantics
    assert(one[Double](gf.stopwordRatio($"t", Seq("fox")), "the fox jumps") == 1.0 / 3)
  }

  test("QualityClassifier separates prose from spam and distills rule labels") {
    import graft.operators.QualityClassifier
    val rng = new scala.util.Random(7)
    // prose passes c4Keep (>= 3 terminal-punct sentences on qualifying
    // lines); spam fails it (lines under 5 words, no terminal punct) —
    // the distill assertion below depends on this polarity
    def prose(i: Int) = s"The quick brown fox number $i is happy today. " +
      s"It likes to be seen with the other animals. " +
      s"That makes it have a good day in the field."
    def spam(i: Int) = (1 to 12).map(_ => s"#buy${rng.nextInt(100)} WIN$i").mkString("\n")
    val train = ((1 to 40).map(i => (prose(i), 1.0)) ++
      (1 to 40).map(i => (spam(i), 0.0)))
    val trainDf = train.toDF("text", "label")
    val m = QualityClassifier.train(trainDf, "text", "label")
    val held = Seq(prose(99), prose(123), spam(99), spam(123)).toDF("text")
    val scores = QualityClassifier.score(m, held, "text")
      .select("quality_prob").collect().map(_.getDouble(0))
    assert(scores(0) > 0.8 && scores(1) > 0.8, s"prose low: ${scores.toSeq}")
    assert(scores(2) < 0.2 && scores(3) < 0.2, s"spam high: ${scores.toSeq}")
    // distillation: rule verdicts become a smooth score with the same order
    val corpus = ((1 to 20).map(prose) ++ (1 to 20).map(spam)).toDF("text")
    // polarity guard: the rule must actually label prose true / spam false,
    // otherwise this distills an anti-quality signal and the mean
    // comparison below silently checks the wrong thing
    assert(one[Boolean](gf.c4Keep($"t"), prose(1)))
    assert(!one[Boolean](gf.c4Keep($"t"), spam(1)))
    val distilled = QualityClassifier.distill(corpus, "text", gf.c4Keep(col("text")))
    val byRule = distilled.select(gf.c4Keep(col("text")).as("r"), col("quality_prob"))
      .collect().groupBy(_.getBoolean(0)).view.mapValues(_.map(_.getDouble(1)).sum / 20).toMap
    assert(byRule(true) > byRule(false), s"distilled means: $byRule")

    // quantized integer margin (the oracled scoring path): sign agrees with
    // the float path's 0.5 threshold on every held-out doc, and scoring is
    // stable across invocations (broadcast weights, no training state)
    val (coef, icept) = QualityClassifier.quantize(m)
    val margins = QualityClassifier.marginMicros(held, "text", coef, icept)
      .select("margin_micros").collect().map(_.getLong(0))
    margins.zip(scores).foreach { case (z, p) =>
      assert((z >= 0) == (p >= 0.5), s"margin $z disagrees with prob $p")
    }
    val again = QualityClassifier.marginMicros(held, "text", coef, icept)
      .select("margin_micros").collect().map(_.getLong(0))
    assert(margins.sameElements(again))
    // token-weight table replays the margin exactly: z = icept + Σ w(t)
    val tw = QualityClassifier.tokenWeights(held, "text", coef).toMap
    val byHand = held.select("text").collect().map(_.getString(0)).map { t =>
      icept + t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(tok => tw.getOrElse(tok, 0L)).sum
    }
    assert(margins.sameElements(byHand))
  }

  test("marginMicros is a codegen expression with HashingTF-exact buckets") {
    import graft.operators.QualityClassifier
    import org.apache.spark.ml.feature.HashingTF
    // multibyte tokens with byte lengths not divisible by 4: the spot
    // where SQL hash() (hashUnsafeBytes) and HashingTF (hashUnsafeBytes2)
    // diverge — the expression must match HashingTF, bucket for bucket
    val docs = Seq("héllo wörld", "a ab abc abcd abcde", "αβγ δε ζ")
      .toDF("text")
    val n = 64
    val coef = Array.tabulate(n)(i => (i * 1000 + 1).toLong)
    val htf = new HashingTF().setNumFeatures(n)
    val expected = docs.select("text").collect().map(_.getString(0)).map { t =>
      7L + t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(tok => coef(htf.indexOf(tok))).sum
    }
    // repartition defeats ConvertToLocalRelation so the executed plan
    // shows the real scoring stage, not a pre-folded LocalTableScan
    val out = QualityClassifier.marginMicros(docs.repartition(2), "text", coef, 7L)
    val got = out.select("margin_micros").collect().map(_.getLong(0))
    // repartition scrambles row order — compare as multisets
    assert(got.sorted.sameElements(expected.sorted), s"${got.toSeq} vs ${expected.toSeq}")
    // the executed plan carries no interpreted row udf (the DSIR rule)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"classifier scoring must not run an interpreted udf:\n$plan")
    assert(plan.contains("hashed_weight_sum"), s"expected the codegen kernel:\n$plan")
  }

  test("urlHost / registeredDomain edge cases") {
    def host(u: String) = one[String](gf.urlHost($"t"), u)
    assert(host("https://www.Example.COM/path?q=1") == "www.example.com")
    assert(host("http://user:pw@a.b.co.uk:8080/x") == "a.b.co.uk")
    assert(host("ftp://files.example.org#frag") == "files.example.org")
    assert(host("no scheme here") == "")
    assert(host("") == "")
    def dom(h: String) = one[String](gf.registeredDomain($"t"), h)
    assert(dom("www.shop3.co.uk") == "shop3.co.uk")
    assert(dom("a.b.c.example.com") == "example.com")
    assert(dom("example.com") == "example.com")
    assert(dom("localhost") == "localhost")
    assert(dom("") == "")
    assert(dom("co.uk") == "co.uk", "a bare suffix has no registrable part below it")
  }

  test("repetitionStats: Gopher A1.2 exact counts on crafted text") {
    import org.apache.spark.sql.Row
    def stats(text: String): Row =
      Seq(text).toDF("t").select(gf.repetitionStats($"t").as("r"))
        .select("r.*").head()
    // lines: [a b, a b, c, P Q, P Q]; paras (split on blank line):
    // ["a b\na b\nc", "P Q", "P Q"]
    val r = stats("a b\na b\nc\n\nP Q\n\nP Q")
    assert(r.getAs[Long]("n_lines") == 5 && r.getAs[Long]("dup_lines") == 2)
    assert(r.getAs[Long]("line_chars") == 13 && r.getAs[Long]("dup_line_chars") == 6)
    assert(r.getAs[Long]("n_paras") == 3 && r.getAs[Long]("dup_paras") == 1)
    assert(r.getAs[Long]("para_chars") == 15 && r.getAs[Long]("dup_para_chars") == 3)
    // words: a b a b c p q p q -> top bigram count 2, tie 'a b' vs 'p q'
    // breaks to 'a b'; chars = 2 occurrences * 2 word-chars
    assert(r.getAs[Long]("word_chars") == 9)
    assert(r.getAs[Long]("top2_chars") == 4)
    assert(r.getAs[Long]("dup5_chars") == 0, "all 5-grams distinct")
    // dup_lines 2/5 > 0.30 -> the A1.2 gate rejects
    assert(!one[Boolean](gf.repetitionKeepText($"t"), "a b\na b\nc\n\nP Q\n\nP Q"))

    // repeated 5-gram covers every word -> dup5 rule rejects
    val rep = "x y z w v x y z w v"
    val r2 = stats(rep)
    assert(r2.getAs[Long]("dup5_chars") == 10 && r2.getAs[Long]("word_chars") == 10)
    assert(!one[Boolean](gf.repetitionKeepText($"t"), rep))

    // empty + clean text pass every rule (zero denominators pass)
    assert(one[Boolean](gf.repetitionKeepText($"t"), ""))
    assert(one[Boolean](gf.repetitionKeepText($"t"),
      "every word here is different so no rule can possibly fire today"))
  }

  test("c4CleanLines keeps terminal-punct 5-word lines; c4Keep gates pages") {
    val text = Seq(
      "This is a good sentence with enough words.", // kept
      "Too short.",                                  // < 5 words
      "No terminal punctuation here at all",         // bad ending
      "Click here to enable JavaScript today!",      // javascript
      "Another quite reasonable sentence ends here!", // kept
      "A third full sentence finishes the page?"     // kept
    ).mkString("\n")
    val cleaned = one[String](gf.c4CleanLines($"t"), text)
    assert(cleaned == Seq(
      "This is a good sentence with enough words.",
      "Another quite reasonable sentence ends here!",
      "A third full sentence finishes the page?").mkString("\n"), cleaned)
    assert(one[Boolean](gf.c4Keep($"t"), text))
    // a curly brace anywhere kills the page (code smell), as does lorem
    assert(!one[Boolean](gf.c4Keep($"t"), text + "\nvar x = { a: 1 };"))
    assert(!one[Boolean](gf.c4Keep($"t"), text + "\nLorem Ipsum dolor sit."))
    // fewer than 3 sentences after cleaning -> dropped
    assert(!one[Boolean](gf.c4Keep($"t"), "One good sentence stands alone here."))
    // \r-terminated lines are NOT terminal-punct (\z anchor, not $)
    assert(one[String](gf.c4CleanLines($"t"), "Ends with punct but also cr.\r") == "")
  }

  test("gopherStats: word/line/symbol/stopword counts on adversarial text") {
    def stats(t: String): Map[String, Long] = {
      val r = Seq(t).toDF("t").select(gf.gopherStats($"t").as("s")).head()
        .getStruct(0)
      graft.functions.GopherStatsExpr.Schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> r.getLong(i) }.toMap
    }
    val s1 = stats("The cat sat.\n- bullet one\n* bullet two\ntrailing dots...  \nwait… \n## #tags\nto be with")
    assert(s1("n_lines") == 7)
    assert(s1("n_bullet_lines") == 2)
    assert(s1("n_ellipsis_lines") == 2, s1) // "dots...  " and "wait… "
    assert(s1("n_hash") == 3)
    assert(s1("n_ellipsis") == 2) // "..." once + … once
    assert(s1("n_stop_distinct") == 4, s1) // the, to, be, with
    // words: The cat sat. - bullet one * bullet two trailing dots... wait…
    //        ## #tags to be with  = 17 whitespace tokens
    assert(s1("n_words") == 17, s1)
    // alpha words: all except "-", "*", "##" = 14
    assert(s1("n_alpha_words") == 14, s1)
    // dot runs: "....." = 1 non-overlapping "..."; "......" = 2
    assert(stats(".....")("n_ellipsis") == 1)
    assert(stats("......")("n_ellipsis") == 2)
    // empty text: one empty line, nothing else
    val s0 = stats("")
    assert(s0("n_words") == 0 && s0("n_lines") == 1 && s0("n_ellipsis_lines") == 0)
    // keep decision: a healthy paragraph passes, keyword spam fails
    val good = (1 to 30).map(_ => "the quick brown fox is ready to be seen with others").mkString(" ")
    assert(Seq(good).toDF("t").select(gf.gopherKeep($"t")).head().getBoolean(0))
    val spam = (1 to 60).map(_ => "### buy #now...").mkString(" ")
    assert(!Seq(spam).toDF("t").select(gf.gopherKeep($"t")).head().getBoolean(0))
  }

  test("fixMojibake repairs double-encoded text; clean text passes untouched") {
    import graft.functions.MojibakeRepair
    // the table is derived by round-tripping UTF-8 bytes through the
    // windows-1252 decoder: verify the construction on known cases
    def moji(t: String) = new String(t.getBytes("UTF-8"), "windows-1252")
    assert(moji("é") == "Ã©") // é -> Ã©
    assert(MojibakeRepair.Mappings.toMap.get(moji("é")).contains("é"))
    // repair through a real Spark plan
    val fixed = one[String](gf.fixMojibake($"t"),
      s"caf${moji("é")} ${moji("—")} it${moji("’")}s " +
        s"${moji("“")}quoted${moji("»")} ${moji("ñ")}")
    assert(fixed == "café — it’s “quoted» ñ", fixed)
    // clean text (including legit accented text) passes through unchanged
    assert(one[String](gf.fixMojibake($"t"), "already café — fine’s") ==
      "already café — fine’s")
    assert(one[String](gf.fixMojibake($"t"), "plain ascii") == "plain ascii")
    // longest-first ordering: no input is shadowed by an earlier shorter one
    val ins = MojibakeRepair.Mappings.map(_._1)
    ins.zipWithIndex.foreach { case (a, i) =>
      ins.drop(i + 1).foreach(b =>
        assert(!b.contains(a), s"later input $b contains earlier $a"))
    }
    // one-pass semantics, documented: adversarially ABUTTING fragments can
    // surface a new mojibake sequence that only a second application fixes
    // (the ftfy fixpoint caveat) — but Spark and the oracle run the SAME
    // single sweep, so this stays cross-engine-equal, and the second pass
    // converges
    def sweep(t: String) = MojibakeRepair.Mappings.foldLeft(t) {
      case (acc, (k, v)) => acc.replace(k, v)
    }
    val nasty = "\u00C3\u00A2" + "\u20AC\u2122" // Ã¢ + €™: abutting fragments
    assert(one[String](gf.fixMojibake($"t"), nasty) == sweep(nasty))
    assert(sweep(sweep(nasty)) == sweep(sweep(sweep(nasty))), "second pass converges")
  }

  test("BpeishCountExpr matches the regex formulation it replaced") {
    val specBpeish = size(regexp_extract_all($"t", lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
    val cases = Seq(
      "hello world", "", "   ", "don't stop-me now!!!", "a1b2 c3",
      "café—naïve… 日本語!", "x y", "...", "42", "\n\t tabs\nand newlines ")
    val got = (cases :+ null).toDF("t")
      .select(gf.bpeishTokenCount($"t").as("g"), specBpeish.as("s")).collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert((r.isNullAt(0) && r.isNullAt(1)) || r.get(0) == r.get(1),
        s"case $i: ${r.get(0)} vs ${r.get(1)}")
    }
  }

  test("TextStatsExpr: a q_quality-shaped projection evaluates the stats ONCE per row") {
    // the whole point of the expression: five metric columns over the same
    // text must collapse to one compute() under subexpression elimination
    // (the LambdaFunction forms they replaced could not — Catalyst CSE
    // skips lambda children, so q_quality re-tokenized each row 4-5x)
    // a range scan, not a literal local relation: literals constant-fold
    // away and a LocalTableScan skips whole-stage-codegen entirely
    val df = spark.range(8)
      .select(col("id").as("doc_id"), concat(lit("a b the "), col("id")).as("text"))
      .select(col("doc_id"),
        gf.punctCount(col("text")).cast("long").as("n_punct"),
        round(gf.alphaRatio(col("text")), 6).as("alpha_ratio"),
        round(gf.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(gf.meanTokenLength(col("text")), 6).as("mean_tok_len"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    val calls = "graft\\.functions\\.TextStatsExpr\\.compute".r.findAllIn(code).size
    assert(calls == 1, s"expected 1 TextStatsExpr.compute call site in codegen, got $calls")
  }

  test("quality metrics ranges and langId stopword detection") {
    val q = one[Double](gf.qualityScore($"t"),
      "The quick brown fox is a reasonably normal English sentence with the usual words.")
    assert(q > 0.3 && q <= 1.0)
    assert(one[String](gf.langId($"t"), "the cat is on the mat and it is happy") == "en")
    assert(one[String](gf.langId($"t"), "el gato es un animal y la casa es grande") == "es")
    assert(one[String](gf.langId($"t"), "der hund und die katze sind nicht da") == "de")
    assert(one[String](gf.langId($"t"), "qqq zzz xxx") == "und")
    // null text -> "und", matching the when(...).otherwise(lit("und"))
    // Column form this expression replaced (null predicate falls through
    // to otherwise) — NOT null-propagating
    val r = Seq(null.asInstanceOf[String]).toDF("t")
      .select(gf.langId($"t").as("l")).head()
    assert(!r.isNullAt(0) && r.getString(0) == "und")
  }

  test("fingerprint64 stable and distinct") {
    val fps = Seq("abc", "abc", "abd").toDF("t")
      .select(gf.fingerprint64($"t").as("f")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("scrubPii redacts email/ssn/phone/ipv4, leaves clean text alone") {
    val dirty = "mail a.b+c@ex.co, ssn 123-45-6789, tel 555-123-4567, ip 192.168.0.1 done"
    assert(one[String](gf.scrubPii($"t"), dirty) ==
      "mail [PII], ssn [PII], tel [PII], ip [PII] done")
    val clean = "nothing sensitive here, just v1.2 and 42 dollars"
    assert(one[String](gf.scrubPii($"t"), clean) == clean)
    // DocSet verb cleans doc AND element text with identical patterns
    val d = graft.model.Document.of("p1", text = dirty, elements = Seq(
      graft.model.Element.text(0, "chunk", "call 555-123-4567 now")))
    val out = graft.docset.DocSet.of(spark, Seq(d)).scrubPii().takeAll().head
    assert(out.text == "mail [PII], ssn [PII], tel [PII], ip [PII] done")
    assert(out.elements.head.text == "call [PII] now")
  }

  test("dupLineFraction counts repeated non-blank lines") {
    assert(one[Double](gf.dupLineFraction($"t"), "a\nb\na\n\n a \na") == 0.4)
    assert(one[Double](gf.dupLineFraction($"t"), "x\ny\nz") == 0.0)
    assert(one[Double](gf.dupLineFraction($"t"), "") == 0.0)
  }

  test("lshBandKeys: equal signatures share all bands") {
    val df = Seq("p q r s t u v w", "p q r s t u v w").toDF("t")
      .select(gf.lshBandKeys(gf.minhashSignature(gf.wordShingles($"t", 3), 16), 4, 4).as("b"))
    val bands = df.collect().map(_.getSeq[Long](0))
    assert(bands(0) == bands(1))
    assert(bands(0).length == 4)
  }

  test("blocklistHits: token-set membership, no substring false positives") {
    val df = Seq((1, "the grass is green"), (2, "kick ass move"), (3, "ASS"), (4, ""))
      .toDF("id", "t")
      .select($"id", gf.blocklistHits($"t", Seq("ass", "damn")).as("n"))
    val out = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out(1) == 0) // "grass" does not hit "ass" — scunthorpe-safe
    assert(out(2) == 1)
    assert(out(3) == 1) // case-insensitive (tokens lowercase)
    assert(out(4) == 0)
  }

  test("nfcNormalize composes decomposed accents; NFC text passes through") {
    val df = Seq((1, "café"), (2, "café"), (3, "plain ascii"), (4, ""))
      .toDF("id", "t")
      .select($"id", gf.nfcNormalize($"t").as("n"))
    val out = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "café") // e + combining acute -> precomposed é
    assert(out(2) == "café") // already NFC: unchanged
    assert(out(3) == "plain ascii" && out(4) == "")
  }

  test("chunkTokens: sliding windows with overlap, short and empty texts") {
    val txt = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1, txt), (2, "a b c"), (3, "  "), (4, "single"))
      .toDF("id", "t")
      .select($"id", gf.chunkTokens($"t", 4, 2).as("ch"))
    val out = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    // 10 tokens, window 4, step 2: starts 0,2,4,6 — stops once the end is
    // covered (a trailing "w9 w10" window would be fully contained in the
    // previous one and add no coverage)
    assert(out(1) == Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8",
      "w7 w8 w9 w10"))
    // every consecutive pair shares exactly `overlap` tokens
    assert(out(1).sliding(2).forall { case Seq(a, b) =>
      a.split(" ").takeRight(2).sameElements(b.split(" ").take(2))
    })
    assert(out(2) == Seq("a b c")) // <= maxTokens: one chunk
    assert(out(3) == Seq())        // whitespace-only: no chunks
    assert(out(4) == Seq("single"))
    // zero-overlap partitioning covers every token exactly once
    val flat = Seq((1, txt)).toDF("id", "t")
      .select(explode(gf.chunkTokens($"t", 3)).as("c"))
      .collect().flatMap(_.getString(0).split(" ")).toSeq
    assert(flat == (1 to 10).map(i => s"w$i"))
    intercept[IllegalArgumentException](gf.chunkTokens($"t", 4, 4))
    // casing and punctuation are preserved (a context splitter must not
    // lowercase what the model will read); whitespace runs collapse
    val cased = Seq((1, "The QUICK\n\tBrown Fox, runs!"))
      .toDF("id", "t").select(gf.chunkTokens($"t", 3).as("ch"))
      .head.getSeq[String](0)
    assert(cased == Seq("The QUICK Brown", "Fox, runs!"))
  }

  test("dedupKey: lowercase, deaccent, digits/punct to spaces, collapse, trim") {
    val decomposedCafe = "Café Déjà-Vu" // e + combining marks
    val df = Seq(
      (1, "Copyright © 2023, Ltd.  All   rights reserved!"),
      (2, "copyright 2024 ltd -- ALL RIGHTS RESERVED"),
      (3, "Café Déjà-Vu"), // precomposed accents
      (4, decomposedCafe),                // decomposed: same key as 3
      (5, "  ...  "),                     // punctuation-only -> empty key
      (6, ""))
      .toDF("id", "t")
      .select($"id", gf.dedupKey($"t").as("k"))
    val out = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // the two boilerplate variants normalize to ONE exact-dedup key
    assert(out(1) == "copyright ltd all rights reserved")
    assert(out(2) == out(1))
    assert(out(3) == "cafe deja vu")
    assert(out(4) == out(3)) // NFD-insensitive
    assert(out(5) == "" && out(6) == "")
  }
}

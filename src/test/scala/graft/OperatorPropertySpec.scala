package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.{Bpe, BpeEncodeExpr, Calibration, Fusion, PageRank, UnigramLm}

/** Algebraic invariants of the round-5 corpus operators, checked over
  * randomized inputs (SURVEY §5: property coverage the reference lacks). */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genWord: Gen[String] = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genText: Gen[String] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, genWord).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, genText))

  test("dupSpans invariants: bounds, self-consistency, permutation invariance") {
    check(Prop.forAll(genCorpus) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataFrame(rows).toDF("id", "text")
      val out = Dedup.dupSpans(df, "id", "text", n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val shuffled = spark.createDataFrame(scala.util.Random.shuffle(rows)).toDF("id", "text")
      val out2 = Dedup.dupSpans(shuffled, "id", "text", n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      out.forall { case (_, n, d) => d >= 0 && d <= n } &&
        out.length == texts.length && out.toSeq == out2.toSeq
    })
  }

  test("unigram LM invariants: bits bound by corpus size, hapax fraction in [0,1]") {
    check(Prop.forAll(genCorpus) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataFrame(rows).toDF("id", "text")
      val out = UnigramLm.score(df, "id", "text").collect()
      out.forall { r =>
        r.isNullAt(1) || {
          val bits = r.getDouble(2); val rare = r.getDouble(3)
          // floor-log bits per token are within [0, floor(log2 N)]
          bits >= 0.0 && rare >= 0.0 && rare <= 1.0
        }
      } && out.length == texts.length
    })
  }

  test("BPE invariants: encoding always reconstructs; more merges never lengthens") {
    check(Prop.forAll(genCorpus) { texts =>
      val hist = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      val m8 = Bpe.trainFromHistogram(hist, 8, minPairCount = 1)
      val m2 = m8.take(2)
      val r8 = BpeEncodeExpr.buildRanks(m8.toArray)
      val r2 = BpeEncodeExpr.buildRanks(m2.toArray)
      hist.forall { case (w, _) =>
        val e8 = Bpe.encodeWord(w, r8); val e2 = Bpe.encodeWord(w, r2)
        e8.mkString == w && e2.mkString == w && e8.length <= e2.length
      }
    })
  }

  test("RRF invariants: scores positive, bounded, present-in-more-lists dominates absent") {
    check(Prop.forAll(Gen.choose(2, 20)) { n =>
      val a = spark.createDataFrame((1 to n).map(i => (i.toLong, (i * 13 % 7).toDouble)))
        .toDF("id", "score")
      val b = spark.createDataFrame((1 to n / 2).map(i => (i.toLong, (i * 5 % 3).toDouble)))
        .toDF("id", "score")
      val out = Fusion.rrf(Seq(a, b), "id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val inBoth = (1 to n / 2).map(_.toLong)
      val onlyA = (n / 2 + 1 to n).map(_.toLong)
      out.values.forall(v => v > 0.0 && v <= 2.0 / 61.0) &&
        // any doc in both lists beats the WORST doc in one list
        (inBoth.isEmpty || onlyA.isEmpty ||
          inBoth.map(out).min > 1.0 / (60.0 + n))
    }, n = 10)
  }

  test("pagerank invariants: scores positive, total mass never grows") {
    check(Prop.forAll(Gen.choose(2, 12), Gen.choose(2L, 30L)) { (nv, ne) =>
      val edges = (0L until ne).map(i => (i % nv, (i * 7 + 1) % nv))
        .filter { case (s, d) => s != d }
      edges.isEmpty || {
        val df = spark.createDataFrame(edges).toDF("s", "d")
        val out = PageRank.pageRank(df, "s", "d", iterations = 3).collect()
          .map(_.getLong(1))
        out.forall(_ > 0) && out.sum <= out.length * PageRank.Scale
      }
    }, n = 10)
  }

  test("percentileBy invariants: [0,1] range, order agrees with score order per group") {
    check(Prop.forAll(genCorpus) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"g${i % 3}", t.length.toDouble) }
      val df = spark.createDataFrame(rows).toDF("id", "g", "s")
      val out = Calibration.percentileBy(df, "g", col("s"), "id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      out.forall { case (_, _, _, p) => p >= 0.0 && p <= 1.0 } &&
        out.groupBy(_._2).values.forall { grp =>
          grp.sortBy(g => (g._3, g._1)).map(_._4).toSeq ==
            grp.map(_._4).sorted.toSeq // pctl increases along (score, id) order
        } && out.length == rows.length
    }, n = 10)
  }

  test("chunkTokens invariants: full coverage, window bounds, overlap stitching") {
    import graft.functions.gf
    check(Prop.forAll(genText, Gen.choose(2, 8), Gen.choose(0, 1)) {
      (text, maxT, ovFlag) =>
        val overlap = math.min(ovFlag * (maxT - 1), maxT - 1)
        val df = spark.createDataFrame(Seq(Tuple1(text))).toDF("t")
          .select(gf.chunkTokens(col("t"), maxT, overlap).as("ch"))
        val chunks = df.collect().head.getSeq[String](0)
        val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq // casing preserved
        if (toks.isEmpty) chunks.isEmpty
        else {
          val step = maxT - overlap
          val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
            val ws = c.split(" ").toSeq
            if (i == 0) ws else ws.drop(overlap) // stitch: drop the shared prefix
          }
          chunks.forall(_.split(" ").length <= maxT) &&
            chunks.nonEmpty &&
            rebuilt == toks && // every token covered exactly once after stitching
            chunks.init.forall(_.split(" ").length == maxT) // only the last is short
        }
    }, n = 40)
  }

  test("dedupKey invariants: idempotent, case/punct/accent insensitive, clean charset") {
    import graft.functions.gf
    val genNoisy = for {
      t <- genText
      caps <- Gen.oneOf(true, false)
      punct <- Gen.oneOf("", ", ", " -- ", "!!! ", " 42 ")
    } yield (t, if (caps) t.toUpperCase else t, punct + t + punct)
    check(Prop.forAll(genNoisy) { case (t, cased, noisy) =>
      val df = spark.createDataFrame(Seq((t, cased, noisy))).toDF("a", "b", "c")
        .select(gf.dedupKey(col("a")).as("ka"), gf.dedupKey(col("b")).as("kb"),
          gf.dedupKey(col("c")).as("kc"), gf.dedupKey(gf.dedupKey(col("a"))).as("kaa"))
      val r = df.collect().head
      val (ka, kb, kc, kaa) = (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      ka == kb && ka == kc && ka == kaa && // insensitivity + idempotence
        ka.forall(ch => (ch >= 'a' && ch <= 'z') || ch == ' ') &&
        !ka.contains("  ") && ka == ka.trim
    }, n = 40)
  }

  test("exactRowsKeepBest invariants: one survivor per text, it has the max rank") {
    check(Prop.forAll(genCorpus, Gen.choose(1L, 5L)) { (texts, mod) =>
      // force duplicate groups by cycling a small text pool
      val pool = texts.take(math.max(1, texts.size / 2))
      val rows = (0 until texts.size * 2).map { i =>
        (i.toLong, pool(i % pool.size), (i % mod).toDouble) }
      val df = spark.createDataFrame(rows).toDF("id", "text", "q")
      val kept = Dedup.exactRowsKeepBest(df, "id", "text", col("q")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val byText = rows.groupBy(_._2)
      kept.length == byText.size && kept.forall { case (id, t, q) =>
        val grp = byText(t)
        val best = grp.map(_._3).max
        q == best && id == grp.filter(_._3 == best).map(_._1).min // tie -> min id
      }
    }, n = 15)
  }

  test("attribution invariants: in-bounds spans, exact always wins, snippet consistency") {
    import graft.operators.PropertyAttribution
    import graft.model.Element
    val genEls: Gen[List[String]] =
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genText))
    check(Prop.forAll(genEls, genText) { (els, value) =>
      val elements = els.zipWithIndex.map { case (t, i) => Element.text(i, "chunk", t) }
      PropertyAttribution.attributeValue(elements, value) match {
        case None =>
          // unattributed only when the value is empty or shares no window
          // with any element (score 0 everywhere)
          value.isEmpty || elements.forall { e =>
            PropertyAttribution.findFuzzy(e.text, value)._1 == 0L
          }
        case Some(a) =>
          val t = elements.find(_.elementIndex == a.elementIndex).get.text
          val inBounds = a.start >= 0 && a.end <= t.length && a.start < a.end
          val snippetOk = a.snippet == t.substring(a.start, a.end)
          val scoreOk = a.scoreMilli > 0 && a.scoreMilli <= 1000
          // exact containment anywhere forces an exact (1000) attribution
          // on the FIRST containing element
          val exactWins = !elements.exists(e => e.text.contains(value) && value.nonEmpty) ||
            (a.scoreMilli == 1000L &&
              a.elementIndex == elements.find(_.text.contains(value)).get.elementIndex &&
              a.snippet == value)
          inBounds && snippetOk && scoreOk && exactWins
      }
    }, n = 60)
  }

  test("bigram LM invariants: totals, ranges, and null only for sub-2-token docs") {
    check(Prop.forAll(genCorpus) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataFrame(rows).toDF("id", "text")
      val out = graft.operators.BigramLm.score(df, "id", "text").collect()
      out.length == texts.length && out.forall { r =>
        val nToks = texts(r.getLong(0).toInt).trim.split("\\s+").count(_.nonEmpty)
        if (nToks < 2) r.isNullAt(1)
        else {
          val (n, bits, novel) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
          n == nToks - 1 && bits >= 0.0 && novel >= 0.0 && novel <= 1.0
        }
      }
    }, n = 15)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher "repetitious text" signals (Rae et al. 2021, Appendix A1.2 —
 * the removal rules MassiveText applied alongside the A1.1 quality rules,
 * since adopted by most open pre-training pipelines): per document,
 *
 *  - duplicate line / paragraph fraction (thresholds 0.30 / 0.30)
 *  - duplicate line / paragraph CHARACTER fraction (0.20 / 0.20)
 *  - top n-gram character fraction for n = 2,3,4 (0.20, 0.18, 0.16)
 *  - duplicate n-gram character fraction for n = 5..10
 *    (0.15, 0.14, 0.13, 0.12, 0.11, 0.10)
 *
 * One row-local pass (hash maps bounded by document length — the same
 * 100 TB shape as GopherStatsExpr: pure codegen'd map work, no shuffle, no
 * state across rows). All outputs are EXACT integer numerators /
 * denominators so the keep decision ([[gf.repetitionKeep]]) is integer
 * cross-multiplication — never a float ratio — and the DuckDB oracle
 * hash-matches bit-for-bit.
 *
 * Pinned cross-engine semantics (the q_gopher_repetition oracle replays
 * them): lines = split on \n alone, trimmed of [ \t\x0B\f\r], non-empty,
 * compared EXACTLY (case-sensitive, like the published implementations);
 * paragraphs = split on runs of >= 2 newlines, same trim; a duplicate
 * occurrence is every occurrence beyond a value's first, and its character
 * cost is the trimmed length in CODE POINTS; words = the engine tokenizer
 * (lowercase, split on the Java \s class, empties dropped); an n-gram's
 * character length is the sum of its words' code-point lengths (no joiner
 * spaces); top n-gram ties break to the lexicographically smallest n-gram
 * (code-point order — both engines compare the space-joined UTF-8 form),
 * and a top n-gram occurring only once contributes 0 (not repetition —
 * matches the published implementations);
 * duplicate-n-gram coverage marks WORD POSITIONS covered by any n-gram
 * occurring >= 2 times, counting each covered word's length once.
 */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"repetition_stats needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {

  val TopNs: Seq[Int] = Seq(2, 3, 4)
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  /** (metric, threshold-percent) — keep iff num*100 <= den*pct for each. */
  val TopThresholdPct: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)
  val DupThresholdPct: Map[Int, Int] =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
  val LineFracPct = 30       // duplicate line/paragraph fraction
  val LineCharFracPct = 20   // duplicate line/paragraph character fraction

  val Schema: StructType = StructType(
    Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("dup_lines", LongType, nullable = false),
      StructField("line_chars", LongType, nullable = false),
      StructField("dup_line_chars", LongType, nullable = false),
      StructField("n_paras", LongType, nullable = false),
      StructField("dup_paras", LongType, nullable = false),
      StructField("para_chars", LongType, nullable = false),
      StructField("dup_para_chars", LongType, nullable = false),
      StructField("word_chars", LongType, nullable = false)) ++
    TopNs.map(n => StructField(s"top${n}_chars", LongType, nullable = false)) ++
    DupNs.map(n => StructField(s"dup${n}_chars", LongType, nullable = false)))

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** CODE-POINT order (== UTF-8 byte order, the oracle's ORDER BY
    * collation). String.compareTo is UTF-16 code-unit order, which ranks
    * supplementary-plane characters (surrogates 0xD800+) BELOW
    * [U+E000, U+FFFF] — a tie between such n-grams would pick different
    * winners on the two engines. */
  private def cpCompare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca) // equal cps advance both in lockstep
    }
    Integer.compare(a.length, b.length)
  }

  /** Trim of [ \t\x0B\f\r] (NOT \n — it is the separator) from both ends. */
  private def trimLine(s: String): String = {
    var a = 0; var b = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\u000B' || c == '\f' || c == '\r'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** (total, dupOccurrences, totalChars, dupChars) over trimmed non-empty
    * segments: each value's occurrences beyond the first are duplicates. */
  private def segmentStats(segs: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L; var chars = 0L
    var i = 0
    while (i < segs.length) {
      val t = trimLine(segs(i))
      if (t.nonEmpty) {
        total += 1
        chars += cp(t)
        counts.merge(t, 1L, (a, b) => a + b)
      }
      i += 1
    }
    var dups = 0L; var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) { dups += e.getValue - 1; dupChars += (e.getValue - 1) * cp(e.getKey) }
    }
    (total, dups, chars, dupChars)
  }

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    val (nL, dL, cL, dcL) = segmentStats(raw.split("\n", -1))
    val (nP, dP, cP, dcP) = segmentStats(raw.split("\n{2,}", -1))
    // the engine tokenizer: lowercase, Java \s+ split, empties dropped
    val words = s.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val wl = words.map(cp)
    var wordChars = 0L
    var wi = 0
    while (wi < wl.length) { wordChars += wl(wi); wi += 1 }

    // n-gram keys per start position, reused by top- and dup- passes
    def grams(n: Int): Array[String] = {
      val m = words.length - n + 1
      if (m <= 0) Array.empty
      else Array.tabulate(m) { i =>
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
        sb.toString
      }
    }
    def counts(gs: Array[String]): java.util.HashMap[String, Long] = {
      val m = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < gs.length) { m.merge(gs(i), 1L, (a, b) => a + b); i += 1 }
      m
    }
    val topChars = TopNs.map { n =>
      val gs = grams(n)
      if (gs.isEmpty) 0L
      else {
        val m = counts(gs)
        var bestC = 0L; var bestK: String = null
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestC || (e.getValue == bestC && cpCompare(e.getKey, bestK) < 0)) {
            bestC = e.getValue; bestK = e.getKey
          }
        }
        // a top n-gram occurring ONCE is not repetition — the published
        // implementations skip it (otherwise any short document whose
        // longest bigram exceeds 20% of its characters would be dropped)
        if (bestC < 2) 0L
        // joined with n-1 single spaces: word-char sum = cp(key) - (n-1)
        else bestC * (cp(bestK) - (n - 1))
      }
    }
    val dupChars = DupNs.map { n =>
      val gs = grams(n)
      if (gs.isEmpty) 0L
      else {
        val m = counts(gs)
        val covered = new Array[Boolean](words.length)
        var i = 0
        while (i < gs.length) {
          if (m.get(gs(i)) >= 2L) {
            var k = i; val end = i + n
            while (k < end) { covered(k) = true; k += 1 }
          }
          i += 1
        }
        var sum = 0L; var j = 0
        while (j < covered.length) { if (covered(j)) sum += wl(j); j += 1 }
        sum
      }
    }
    new GenericInternalRow(
      (Seq(nL, dL, cL, dcL, nP, dP, cP, dcP, wordChars) ++ topChars ++ dupChars)
        .map(_.asInstanceOf[Any]).toArray)
  }
}

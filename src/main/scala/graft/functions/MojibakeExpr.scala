package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mojibake repair — the ftfy-style fix every large text pipeline runs
 * before quality scoring (CCNet/C4 normalize with ftfy; web-crawl text
 * frequently carries UTF-8 bytes that were re-decoded as Windows-1252,
 * turning é into the two-char sequence Ã© and ’ into
 * â€™).
 *
 * Scope: the COMMON double-encoding table below, applied as ORDERED
 * sequential global replacements — not general charset inference. The
 * same table, in the same order, generates the DuckDB oracle's nested
 * replace() chain ([[MojibakeRepair.sqlOracle]]), so both engines are
 * equivalent by construction.
 *
 * ONE-PASS semantics, like a single ftfy application: on text where
 * mojibake fragments ABUT (e.g. a stray lead byte directly before a
 * double-encoded quote), one sequential sweep can surface a new mojibake
 * sequence that only a second application would repair — the repair is
 * therefore NOT idempotent on adversarial nestings, exactly as ftfy
 * itself loops to a fixpoint. The gate oracle applies the identical
 * single sweep, so cross-engine equality holds on every input; callers
 * wanting fixpoint repair use [[FixMojibakeFixpointExpr]]
 * (gf.fixMojibakeFixpoint / SQL gf_fix_mojibake_fixpoint).
 *
 * Fast path: every mapping input starts with Ã, Â or â (UTF-8 lead
 * bytes 0xC3/0xC2/0xE2); one scan over the RAW UTF-8 bytes finds none
 * of those in clean text and returns the input UTF8String unchanged
 * without materializing a java String.
 */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"fix_mojibake needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    MojibakeRepair.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeRepair.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fix_mojibake"
}

/**
 * Bounded-fixpoint mojibake repair (ftfy itself loops until stable): re-apply
 * the single-sweep repair until unchanged, capped at [[MojibakeRepair.MaxPasses]]
 * passes. Curation callers on real web crawl use this form so they don't need
 * to know that abutting fragments / double-encoded text require a second
 * application; the single-pass expression remains the gate-oracled primitive
 * (a fixpoint has no closed-form SQL oracle — the chain depth is data-
 * dependent). Extra passes on already-clean text cost one raw-byte scan
 * (the 0xC3 fast path), so the cap is effectively free.
 */
case class FixMojibakeFixpointExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"fix_mojibake_fixpoint needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    MojibakeRepair.computeFixpoint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeRepair.computeFixpoint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fix_mojibake_fixpoint"
}

object MojibakeRepair {

  /** Fixpoint pass cap: each pass strips at most one encoding level, and
    * real-world crawl shows double (rarely triple) encoding — but repairs
    * can also MERGE abutting fragments into new repairable sequences, so
    * depth-3 nestings occasionally need a 5th+ pass (a property-test
    * counterexample caught exactly that at the old cap of 4). 8 bounds
    * adversarial cost while clean text still exits on pass 1 via the
    * reference-equality check. */
  val MaxPasses = 8

  /** Called from generated code: re-apply [[compute]] to fixpoint (≤
    * [[MaxPasses]]). `compute` returns its argument REFERENCE when nothing
    * changed, so the eq check is exact, not a content compare. */
  def computeFixpoint(s: UTF8String): UTF8String = {
    var cur = s
    var i = 0
    while (i < MaxPasses) {
      val next = compute(cur)
      if (next eq cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private def decodable(b: Byte): Boolean =
    new String(Array(b), Cp1252).charAt(0) != '\uFFFD'

  /** Closure-derived target set: every character a single Windows-1252 byte
    * can mis-render (0x80\u20130xFF minus the five undefined holes
    * 81/8D/8F/90/9D), kept only when each byte of the character's own UTF-8
    * encoding is itself cp1252-decodable \u2014 the reconstructibility condition.
    * U+201D (right double quote, 0x94) fails it: its third UTF-8 byte 0x9D
    * is a hole, so its mojibake form is not reconstructible printable text.
    * Deriving the set this way (not a hand list) makes the table CLOSED
    * under one mis-decode: every non-ASCII character appearing inside a
    * mojibake sequence is itself a repairable target, so the bounded
    * re-application in [[FixMojibakeFixpointExpr]] strips k-fold
    * double-encodings groupwise (covers the real-world \u20AC/\u2122/\u0153/\u0160 family the
    * original curated list missed). */
  private val Targets: Seq[String] =
    (0x80 to 0xFF).map(_.toByte).filter(decodable)
      .map(b => new String(Array(b), Cp1252))
      .filter(t => t.getBytes(java.nio.charset.StandardCharsets.UTF_8).forall(decodable))

  /**
   * mojibake(t) -> t, DERIVED (not hand-typed — the sequences are
   * visually ambiguous) by round-tripping each target's UTF-8 bytes
   * through the Windows-1252 decoder at class-load. Ordered
   * longest-mojibake-first, then by target, so a 2-char sequence
   * (Ã¢ for â) can never shadow a 3-char one — the order
   * is shared verbatim with the SQL oracle.
   */
  val Mappings: Seq[(String, String)] = Targets
    .map(t => new String(t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252")) -> t)
    .sortBy { case (moji, t) => (-moji.length, t) }

  /** Fast-path marker table: every mojibake sequence's first character is
    * the cp1252 rendition of a UTF-8 LEAD byte (0xC2..0xE3), all of which
    * live in U+00C2..U+00E3 and therefore encode as 'C3 xx' themselves \u2014
    * derived from Mappings so the byte scan can never drift from the table. */
  private val MarkerSecond: Array[Boolean] = {
    val a = new Array[Boolean](256)
    Mappings.foreach { case (k, _) =>
      val b = k.substring(0, 1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(b.length == 2 && (b(0) & 0xFF) == 0xC3,
        s"mojibake first char outside the C3-prefixed range: '${k.charAt(0)}'")
      a(b(1) & 0xFF) = true
    }
    a
  }

  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    // fast path on the raw UTF-8 bytes: every mapping input's first char
    // encodes as C3 followed by a marker byte (see MarkerSecond) \u2014 text
    // without such a pair (plain ASCII, CJK, even ordinary accented Latin
    // like \u00E9 = C3 A9) cannot contain mojibake and returns as-is
    var i = 0
    var marker = false
    val nb = s.numBytes()
    while (i + 1 < nb && !marker) {
      if ((s.getByte(i) & 0xFF) == 0xC3 && MarkerSecond(s.getByte(i + 1) & 0xFF))
        marker = true
      i += 1
    }
    if (!marker) return s
    val str = s.toString
    var out = str
    val it = Mappings.iterator
    while (it.hasNext) {
      val (k, v) = it.next()
      out = out.replace(k, v)
    }
    if (out == str) s else UTF8String.fromString(out)
  }

  /** The DuckDB-side equivalent: the SAME mappings in the SAME order as a
    * nested replace() chain, so the oracle is identical by construction.
    * `inner` is any SQL expression producing the text. Mapping strings
    * contain no ASCII quotes, so no SQL escaping is needed. */
  def sqlOracle(inner: String): String =
    Mappings.foldLeft(inner) { case (acc, (k, v)) =>
      s"replace($acc, '$k', '$v')"
    }
}

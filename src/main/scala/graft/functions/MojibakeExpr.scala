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
 * wanting fixpoint repair apply the column twice.
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

object MojibakeRepair {

  /** The intended characters whose UTF-8 bytes commonly get re-decoded as
    * Windows-1252: curly quotes, dashes, ellipsis, bullet, the common
    * Latin-1 accented letters, guillemets, degree/middle dot, NBSP.
    * U+201D (right double quote) is omitted: its third UTF-8 byte 0x9D
    * has no Windows-1252 rendition, so its mojibake form is not
    * reconstructible printable text. */
  private val Targets: Seq[String] = Seq(
    "\u2019", "\u2018", "\u201C", "\u2013", "\u2014", "\u2026", "\u2022",
    "\u00E9", "\u00E8", "\u00EA", "\u00EB", "\u00E1", "\u00E0", "\u00E2",
    "\u00E4", "\u00E3", "\u00ED", "\u00EE", "\u00EF", "\u00F3", "\u00F4",
    "\u00F6", "\u00F5", "\u00FA", "\u00FB", "\u00FC", "\u00F1", "\u00E7",
    "\u00C9", "\u00D7", "\u00AB", "\u00BB", "\u00B0", "\u00B7", "\u00A0")

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

  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    // fast path on the raw UTF-8 bytes: every mapping input's first char
    // is \u00C3 (UTF-8 C3 83), \u00C2 (C3 82) or \u00E2 (C3 A2) \u2014 text without one of
    // those two-byte sequences (plain ASCII, CJK, even ordinary accented
    // Latin like \u00E9 = C3 A9) cannot contain mojibake and returns as-is
    var i = 0
    var marker = false
    val nb = s.numBytes()
    while (i + 1 < nb && !marker) {
      if ((s.getByte(i) & 0xFF) == 0xC3) {
        val b2 = s.getByte(i + 1) & 0xFF
        marker = b2 == 0x83 || b2 == 0x82 || b2 == 0xA2
      }
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

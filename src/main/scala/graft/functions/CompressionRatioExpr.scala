package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deflate compression ratio of a text column: compressed_bytes /
 * raw_utf8_bytes. The quality signal the length/punctuation heuristics
 * miss: machine-generated or highly repetitive text compresses far below
 * natural prose (~0.3-0.6), and random/encrypted junk sits near 1.0 — the
 * filter large-corpus curation pipelines cut both tails with.
 *
 * One custom expression (not a UDF): codegen'd call into a per-thread
 * reused Deflater — no per-row allocation of the 64 KB zlib state. Empty
 * strings return 0.0 by convention.
 */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    CompressionRatioExpr.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionRatioExpr.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "compression_ratio"
}

object CompressionRatioExpr {
  // Deflater holds native zlib state — reuse per task thread, reset per row
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }

  /** Called from generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 0.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](math.max(64, raw.length / 2))
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-filter membership test over a string column, with the filter riding
 * as ONE reference object in the plan (same pattern as NearestCentroidExpr:
 * the bits ship once per task binary via torrent broadcast, not as
 * expression text).
 *
 * Why not an `isin`/semi-join: when the probe set has millions of entries
 * (benchmark shingle sets, blocklists), a broadcast of the rows is
 * gigabytes, but the bloom bits at 0.1% fpp are ~1.8 bytes/item. The test
 * admits false POSITIVES only, so callers must pair it with an exact
 * verification pass when exact semantics are required
 * (Dedup.decontaminateBloom does).
 *
 * Membership is checked against the UTF-8 bytes, matching how
 * `DataFrameStatFunctions.bloomFilter` inserts strings (putString ==
 * putBinary(utf8 bytes)).
 */
case class BloomMightContainExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    BloomMightContainExpr.contains(bf, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomMightContainExpr.contains($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainExpr {
  /** Called from generated code. */
  def contains(bf: BloomFilter, s: UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)
}

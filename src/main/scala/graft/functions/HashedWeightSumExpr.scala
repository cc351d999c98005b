package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/**
 * Hashed-weight dot product over a token array as ONE codegen expression:
 * intercept + Σ_t weightMicros[h(t) mod n], the integer scoring margin of a
 * hashed-feature linear model (fasttext/LR quality classifiers). This is
 * the 100 TB scoring shape — the weight table rides once per task binary as
 * a reference object, the stage stays inside whole-stage codegen, and no
 * per-row Scala closure or vocabulary lookup is involved.
 *
 * h(t) replicates ML `HashingTF.indexOf` EXACTLY (murmur3 `hashUnsafeBytes2`
 * over the UTF-8 bytes, seed 42, non-negative mod): weights trained through
 * HashingTF featurization index the same buckets at scoring time. Note this
 * is NOT the SQL `hash()` function — the two murmur3 variants diverge on
 * strings whose byte length is not a multiple of 4.
 *
 * Null and empty tokens contribute nothing (matching the trainer, which
 * filters empty tokens before featurization).
 */
/** `weightsMicros` is a Seq, not an Array: structural equality keeps two
  * nodes built from the same model semanticEquals for Catalyst CSE. */
case class HashedWeightSumExpr(child: Expression, weightsMicros: Seq[Long],
                               interceptMicros: Long)
    extends UnaryExpression {

  @transient private lazy val weightsArr: Array[Long] = weightsMicros.toArray

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_weight_sum needs array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashedWeightSumExpr.compute(input.asInstanceOf[ArrayData], weightsArr,
      interceptMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hashedWeights", weightsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedWeightSumExpr.compute($c, $w, ${interceptMicros}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hashed_weight_sum"
}

object HashedWeightSumExpr {

  /** HashingTF.indexOf parity: murmur3 hashUnsafeBytes2, seed 42. */
  private final val Seed = 42

  /** Called from generated code. */
  def compute(arr: ArrayData, weights: Array[Long], interceptMicros: Long): Long = {
    val n = weights.length
    var z = interceptMicros
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          val h = Murmur3_x86_32.hashUnsafeBytes2(
            t.getBaseObject, t.getBaseOffset, t.numBytes(), Seed)
          z += weights(((h % n) + n) % n)
        }
      }
      i += 1
    }
    z
  }
}

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
/** The weight table rides inside a [[HashedWeightSumExpr.WeightTable]]
  * wrapper: value semantics keep two nodes built from the same model
  * semanticEquals for Catalyst CSE, but with a PRECOMPUTED hash — a bare
  * Seq[Long] field made every ExpressionSet insert / canonicalization
  * compare during optimization walk the full table (O(2^18) boxed longs
  * for a realistic hashed model, paid repeatedly at planning time). */
case class HashedWeightSumExpr(child: Expression,
                               table: HashedWeightSumExpr.WeightTable,
                               interceptMicros: Long)
    extends UnaryExpression {

  private def weightsArr: Array[Long] = table.weights

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

  /** Construction from a raw weight list (the caller-facing shape). */
  def apply(child: Expression, weightsMicros: Seq[Long],
            interceptMicros: Long): HashedWeightSumExpr =
    HashedWeightSumExpr(child, new WeightTable(weightsMicros.toArray),
      interceptMicros)

  /** Value-semantics weight table with O(1) comparisons: hashCode is
    * precomputed once at construction; equals short-circuits on reference,
    * then hash, and walks the array only on a genuine hash match. */
  final class WeightTable(val weights: Array[Long]) extends Serializable {
    override val hashCode: Int = java.util.Arrays.hashCode(weights)
    override def equals(o: Any): Boolean = o match {
      case w: WeightTable => (this eq w) ||
        (hashCode == w.hashCode && java.util.Arrays.equals(weights, w.weights))
      case _ => false
    }
    override def toString: String = s"WeightTable(n=${weights.length})"
  }

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

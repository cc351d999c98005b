package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE subword encoding of a token array as ONE expression. The merge-rank
 * table rides as a single reference object (NearestCentroidExpr's codebook
 * pattern) — the plan holds one node regardless of vocabulary size, and a
 * 50k-merge vocab ships once per task binary instead of as expression text.
 */
/** `merges` is a Seq, not an Array: case-class structural equality keeps two
  * nodes built from the same vocabulary semanticEquals, so Catalyst's
  * common-subexpression elimination can dedup them (an Array field compares
  * by reference and defeats canonicalization). */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val ranks = BpeEncodeExpr.buildRanks(merges.toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.operators.BpeEncodeExpr.compute($c, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

object BpeEncodeExpr {

  def buildRanks(merges: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Called from generated code. */
  def compute(arr: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          val subs = Bpe.encodeWord(w, ranks)
          var j = 0
          while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

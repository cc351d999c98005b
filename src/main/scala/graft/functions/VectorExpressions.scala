package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Dot product of two numeric array columns as ONE codegen'd expression.
 *
 * The previous formulation — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` —
 * is correct but runs the Catalyst higher-order-function interpreter per
 * ELEMENT: each lambda application allocates and evaluates an expression tree
 * per slot, so a 64-dim dot product costs ~128 interpreted lambda calls.
 * q_cosine_pairs spends its whole budget there (~200k candidate pairs x 64
 * dims at sf0.1); at 100 TB embedding scale the per-element interpreter is
 * the difference between a compute-bound scan and a CPU-bound crawl. This
 * expression compiles to a single tight JVM loop over the ArrayData with no
 * per-element allocation, inside whole-stage codegen.
 *
 * Semantics match the HOF version exactly (same left-to-right summation
 * order, so oracle hashes are bit-identical): element i contributes
 * a(i)*b(i) in ascending i; a null element or a length mismatch yields NULL
 * (zip_with pads the shorter side with null and null poisons the sum).
 *
 * Reference context: the reference delegates vector math to external stores
 * (lib/sycamore/sycamore/connectors/) — this is part of the self-contained
 * ANN/similarity surface (SURVEY §2 training-data extension).
 */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _)  => 1
    case ArrayType(LongType, _)   => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _)  => 4
    case ArrayType(ByteType, _)   => 5
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs numeric arrays, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val ta = elemCode(left.dataType)
  @transient private lazy val tb = elemCode(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.DotProductExpr.compute($a, $b, $ta, $tb);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object DotProductExpr {
  /** Called from generated code. Returns null (boxed) on length mismatch or
    * any null element — the zip_with-pad semantics of the HOF formulation.
    * Hot paths (double/double after normalization, float/float raw
    * embeddings) get dedicated loops; mixed types fall through to a
    * per-element dispatch. */
  def compute(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    if (ta == 0 && tb == 0) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getDouble(i) * b.getDouble(i); i += 1
      }
    } else if (ta == 1 && tb == 1) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += get(a, i, ta) * get(b, i, tb); i += 1
      }
    }
    java.lang.Double.valueOf(s)
  }

  private def get(x: ArrayData, i: Int, t: Int): Double = t match {
    case 0 => x.getDouble(i)
    case 1 => x.getFloat(i).toDouble
    case 2 => x.getLong(i).toDouble
    case 3 => x.getInt(i).toDouble
    case 4 => x.getShort(i).toDouble
    case _ => x.getByte(i).toDouble
  }
}

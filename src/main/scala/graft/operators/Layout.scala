package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Z-order data layout — the storage-side half of "make the 100 TB scan
 * cheap". A table queried with conjunctive range predicates on several
 * columns cannot be sorted to favor all of them at once; interleaving the
 * bits of per-column rank buckets (Morton order) clusters rows so that a
 * box predicate on ANY of the dimensions touches a small fraction of
 * files, and parquet/ORC min-max footer stats prune the rest without
 * reading them.
 *
 * Buckets come from `Packing.rankBins` — the exact two-phase global rank
 * (never a single-partition window), which makes the z-value a
 * deterministic pure function of the data, independently checkable by an
 * external engine. One rank staging per dimension; that is k corpus
 * shuffles for a k-dim layout, the price any exact z-order pays (engines
 * that sample instead — e.g. Delta OSS's range_partition_id — trade that
 * for nondeterministic boundaries; the swap is one line here if wanted).
 * Layout jobs are run once per table, not per query.
 *
 * The reference has no storage-layout operator (it delegates retrieval
 * layout to external index stores, connectors/); this is part of the
 * engine's own scale surface, like Bucketing.
 */
object Layout {

  /** Max interleave width: bits * nCols must fit a non-negative long. */
  private val MaxZBits = 63

  /** Morton z-value column from per-column bucket ids (longs in
    * [0, 2^bits)): bit i of column c lands at position i*nCols + c. */
  def zvalueCol(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "zvalue needs at least one column")
    require(bits > 0 && bits * buckets.size <= MaxZBits,
      s"bits * nCols must be in [1, $MaxZBits], got ${bits * buckets.size}")
    org.apache.spark.sql.graft.ColumnBridge.column(
      ZValueExpr(buckets.map(org.apache.spark.sql.graft.ColumnBridge.expression), bits))
  }

  /** Append a deterministic `zvalue` column: each of `cols` is bucketed by
    * exact global rank into 2^bits buckets (ties broken by `unique`), then
    * bit-interleaved. */
  def zvalue(df: DataFrame, cols: Seq[String], unique: String,
             bits: Int = 8, out: String = "zvalue"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val bucketed = cols.zipWithIndex.foldLeft(df) { case (cur, (c, i)) =>
      Packing.rankBins(cur, Seq(col(c)), unique, 1 << bits, s"_zb_$i")
    }
    bucketed
      .withColumn(out, zvalueCol(cols.indices.map(i => col(s"_zb_$i")), bits))
      .drop(cols.indices.map(i => s"_zb_$i"): _*)
  }

  /** Z-order `df` by `cols` and write it as `numFiles` parquet files under
    * `path`: range-partition on the z-value so each output file covers a
    * compact Morton range, i.e. a small box in every queried dimension —
    * that is what shrinks per-file min/max spans and lets footer stats
    * prune. Content is byte-identical to the input; only layout changes. */
  def zorderWrite(df: DataFrame, cols: Seq[String], unique: String,
                  path: String, bits: Int = 8, numFiles: Int = 0): Unit = {
    val files = if (numFiles > 0) numFiles else df.sparkSession.sparkContext.defaultParallelism
    zvalue(df, cols, unique, bits)
      .repartitionByRange(files, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
      .drop("zvalue")
      .write.mode("overwrite").parquet(path)
  }
}

/** Bit-interleave of per-column buckets as ONE codegen'd expression: the
  * plan holds a single node regardless of bits x columns (the literal
  * shift-or tree this replaces is the same plan-bloat shape
  * NearestCentroidExpr exists to kill). Null or negative buckets clamp to
  * 0; buckets >= 2^bits keep their low `bits` bits. */
case class ZValueExpr(children: Seq[Expression], bits: Int) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"zvalue needs bigint buckets, got ${bad.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      vals(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    ZValueExpr.compute(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zin")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : ${e.value};
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long[] $arr = new long[${children.size}];
        |$fill
        |long ${ev.value} = graft.operators.ZValueExpr.compute($arr, $bits);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "zvalue"
}

object ZValueExpr {
  /** Called from generated code. */
  def compute(buckets: Array[Long], bits: Int): Long = {
    val n = buckets.length
    val mask = (1L << bits) - 1
    var z = 0L
    var c = 0
    while (c < n) {
      val v = (if (buckets(c) < 0) 0L else buckets(c)) & mask
      var i = 0
      while (i < bits) {
        z |= ((v >> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    z
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

import graft.functions.gf

/**
 * Video operators over opaque binary container columns (SURVEY §2.12;
 * reference sycamore's multimodal surface treats video as binary + typed
 * metadata). Frame extraction is the pluggable [[MediaOps.FrameSampler]]
 * seam (a codec-backed sampler in production, the deterministic GFV0
 * slicer in tests), wired into the plan as ONE codegen'd expression —
 * container -> array<binary> of sampled frames — so a row never leaves
 * whole-stage codegen to be sampled and the explode that follows is
 * Spark's own. Everything downstream of sampling is relational:
 *
 *  - [[sceneCuts]]: consecutive-frame perceptual-hash hamming over a
 *    key-partitioned window (scene-change = hamming above threshold) —
 *    scales as one shuffle by video id, frames stay distributed;
 *  - [[bitMajoritySignature]]: per-video 64-bit bit-majority over frame
 *    dHashes (the SimHash aggregation applied to frames) in ONE partial-
 *    aggregable groupBy with 64 codegen'd integer bit-sums — no row
 *    explosion, map-side combine does the heavy lifting at scale;
 *  - [[videoNearDupPairs]]: signatures ride Dedup.simhashPairs'
 *    pigeonhole-bucketed hamming join unchanged.
 */
object VideoOps {

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Sampled frames of a binary container column as array<binary> (empty
    * array for unparseable containers — the sampler's contract). */
  def sampleFramesCol(c: Column, everyN: Int,
      sampler: MediaOps.FrameSampler = new MediaOps.FakeFrameSampler): Column =
    toCol(FrameSampleExpr(toExpr(c), everyN, sampler))

  /** Explode a container column into (id, fidx, frame) — `fidx` is the
    * sample ordinal (0-based over the KEPT frames). Zero-frame containers
    * disappear, as posexplode of an empty array yields no rows. */
  def frames(df: DataFrame, id: String, bin: String, everyN: Int,
      sampler: MediaOps.FrameSampler = new MediaOps.FakeFrameSampler): DataFrame =
    df.select(col(id),
      posexplode(sampleFramesCol(col(bin), everyN, sampler)).as(Seq("fidx", "frame")))

  /** Scene-cut detection: hamming distance between each frame's perceptual
    * hash and its predecessor within the video (key-partitioned window —
    * no global sort), `is_cut` = distance above `threshold`. Input rows
    * need (id, ord, hash); the first frame of a video emits no row. */
  def sceneCuts(framesDf: DataFrame, id: String, ord: String, hash: String,
                threshold: Int): DataFrame = {
    val w = Window.partitionBy(col(id)).orderBy(col(ord))
    framesDf
      .select(col(id), col(ord), col(hash), lag(col(hash), 1).over(w).as("_prev"))
      .where(col("_prev").isNotNull)
      .select(col(id), col(ord),
        gf.hamming64(col(hash), col("_prev")).as("hamming"))
      .withColumn("is_cut", (col("hamming") > threshold).cast("long"))
  }

  /** Per-video 64-bit bit-majority signature over frame hashes: bit p of
    * the signature is set iff more than half the video's frames have bit p
    * set. ONE groupBy with 64 integer bit-sum aggregates (all partial-
    * aggregable — map-side combine reduces each video to 65 longs before
    * the shuffle), then pure bit math; no per-bit row explosion. The
    * majority test is `cnt > n - cnt` (strict, ANSI-overflow-safe). */
  def bitMajoritySignature(framesDf: DataFrame, id: String, hash: String): DataFrame = {
    val bitSums = (0 until 64).map { p =>
      sum(shiftrightunsigned(col(hash), p).bitwiseAND(lit(1L))).as(s"_b$p")
    }
    val g = framesDf.groupBy(col(id)).agg(count(lit(1)).as("_n"), bitSums: _*)
    val sig = (0 until 64).map { p =>
      when(col(s"_b$p") > col("_n") - col(s"_b$p"), lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    g.select(col(id), sig.as("signature"))
  }

  /** Video near-dup pairs: bit-majority signatures through the existing
    * pigeonhole-bucketed hamming join (identity sketch — the signature IS
    * the 64-bit sketch). Returns (idA, idB, hamming). */
  def videoNearDupPairs(sigs: DataFrame, id: String, sig: String,
                        maxHamming: Int = 6): DataFrame =
    graft.dedup.Dedup.simhashPairs(sigs, id, sig, maxHamming, c => c, bits = 64)
}

/** Sampled frames of a binary video container as one codegen'd expression:
  * array<binary> via the pluggable [[MediaOps.FrameSampler]] (carried as a
  * plan reference object — the sampler is config, not data). */
case class FrameSampleExpr(child: Expression, everyN: Int,
    sampler: MediaOps.FrameSampler) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"frame_sample needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    FrameSampleExpr.compute(sampler, input.asInstanceOf[Array[Byte]], everyN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("frameSampler", sampler, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.FrameSampleExpr.compute($ref, $c, $everyN);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "frame_sample"
}

object FrameSampleExpr {
  /** Called from generated code. */
  def compute(sampler: AnyRef, bytes: Array[Byte], everyN: Int): ArrayData = {
    val fs = sampler.asInstanceOf[MediaOps.FrameSampler].sampleFrames(bytes, everyN)
    new GenericArrayData(fs.toArray[Any])
  }
}

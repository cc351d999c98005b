package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Custom Catalyst expressions for the sketch functions.
 *
 * Why not functions._ composition: a k-slot minhash expressed as k
 * `array_min(transform(...))` columns duplicates the shingle-array
 * subexpression k times after CollapseProject, and a 64-bit simhash
 * duplicates its token fold 64 times — the plan blows past the codegen
 * method-size limit and falls back to interpreted evaluation (measured 45x
 * slowdown at sf0.1). A single expression evaluates its child ONCE and runs
 * a tight JVM loop; plan stays small no matter how often the optimizer
 * inlines it.
 *
 * Reference semantics: transforms/sketcher.py:29 (16 minhashes),
 * functions/simhash.py (bitwise-majority simhash).
 */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(MinHashSignatureExpr.compute(arr, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSignatureExpr.compute($c, $k))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {
  /** Single pass over the shingle array; one UTF8 byte-copy per shingle,
    * k seeded hashes each. Called from generated code. */
  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          val h = Xx64.hash(bytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}

/** 64-bit SimHash over a token array: bit i = majority vote of token-hash
  * bit i. Single pass, O(tokens) with constant-time vote updates. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64Expr {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Xx64.hash(arr.getUTF8String(i).getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * 31-bit SimHash over a token array using a POLYNOMIAL token hash
 * ((acc*31 + codepoint) mod 2^31-1) instead of xxhash64. Weaker mixing than
 * SimHash64Expr — its purpose is cross-engine verifiability: the identical
 * sketch is expressible in ANSI-ish SQL (list_reduce + bit ops), so the
 * DuckDB oracle can replay it exactly and hash-match the near-dup pairs.
 * Majority rule: bit b set iff strictly more than half the tokens have it.
 */
case class SimHashPolyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_poly31 needs array<string>, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any =
    SimHashPolyExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashPolyExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash_poly31"
}

object SimHashPolyExpr {
  final val Bits = 31
  final val Mod = 2147483647L // 2^31 - 1 (prime): values fit 31 bits, and
                              // (acc*31 + cp) stays < 2^63 for both engines

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var acc = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31L + cp) % Mod
          j += Character.charCount(cp)
        }
        var b = 0
        while (b < Bits) {
          if (((acc >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * k-slot MinHash over a shingle array using POLYNOMIAL hashing instead of
 * xxhash64 — same purpose as SimHashPolyExpr: cross-engine verifiability.
 * Per shingle, base hash h = fold (acc*31 + codepoint) mod 2^31-1; slot j's
 * hash is the universal-family mix ((2j+1)*h + 12345*j) mod 2^31-1 and the
 * signature is the per-slot min. Every step is exact int64 math expressible
 * in DuckDB (list_reduce + list_transform + list_min), so the oracle can
 * recompute the identical signature. Weaker mixing than xxhash64 — the
 * production path stays MinHashSignatureExpr; this variant exists for the
 * oracle-verified gate.
 *
 * Empty shingle arrays yield the sentinel 2^31-1 per slot (unreachable by
 * real hashes, which are < 2^31-1) — mirrored by coalesce in the oracle SQL.
 */
case class MinHashPolyExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_poly needs array<string>, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashPolyExpr.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashPolyExpr.compute($c, $k))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_poly"
}

object MinHashPolyExpr {
  final val Mod = SimHashPolyExpr.Mod // 2^31 - 1

  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Mod)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 31L + cp) % Mod
          j += Character.charCount(cp)
        }
        var slot = 0
        while (slot < k) {
          val v = ((2L * slot + 1L) * h + 12345L * slot) % Mod
          if (v < mins(slot)) mins(slot) = v
          slot += 1
        }
      }
      i += 1
    }
    mins
  }
}

/**
 * Rolling polynomial fingerprint of a string: fold (acc * mult + codeUnit)
 * mod `mod` over UTF-16 code units — semantically identical to the
 * composed `aggregate(split(c, ""), ...)` form but a single tight loop
 * instead of a per-character array materialization + lambda fold (the
 * composed form allocates one single-char string per character).
 * Iterates CODE POINTS: Java's split("") does not split surrogate pairs,
 * so the composed form folds over code points, as does the DuckDB oracle's
 * str_split + ascii().
 */
case class PolyFingerprintExpr(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_fingerprint needs string, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any =
    PolyFingerprintExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFingerprintExpr.compute($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "poly_fingerprint"
}

object PolyFingerprintExpr {
  def compute(s: org.apache.spark.unsafe.types.UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** LSH band keys from a minhash signature: bands hashes of `rows`
  * consecutive slots. Tiny input (k longs) but same single-eval rationale. */
case class LshBandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_keys needs array<bigint>, got $other")
    }
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(LshBandKeysExpr.compute(arr, bands, rows))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.LshBandKeysExpr.compute($c, $bands, $rows))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lsh_band_keys"
}

object LshBandKeysExpr {
  def compute(arr: ArrayData, bands: Int, rows: Int): Array[Long] = {
    // fail FAST on a short signature: UnsafeArrayData.getLong does not
    // bounds-check, so an under-sized signature (k < bands*rows) would
    // otherwise read adjacent buffer memory and emit nondeterministic
    // garbage band keys — silently corrupting LSH candidate generation
    if (arr.numElements() < bands * rows)
      throw new IllegalArgumentException(
        s"lsh_band_keys needs a signature of >= ${bands * rows} hashes " +
          s"(bands=$bands x rowsPerBand=$rows), got ${arr.numElements()}")
    val out = new Array[Long](bands)
    val buf = new Array[Byte](rows * 8)
    var b = 0
    while (b < bands) {
      var r = 0
      while (r < rows) {
        val v = arr.getLong(b * rows + r)
        var byte = 0
        while (byte < 8) {
          buf(r * 8 + byte) = ((v >>> (byte * 8)) & 0xff).toByte
          byte += 1
        }
        r += 1
      }
      out(b) = Xx64.hash(buf, b.toLong)
      b += 1
    }
    out
  }
}

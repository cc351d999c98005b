package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gf

/**
 * HyperLogLog approximate distinct count (Flajolet, Fusy, Gandouet,
 * Meunier 2007) with INTEGER-EXACT register math, so the whole
 * estimate — not just the registers — replays bit-for-bit in the DuckDB
 * oracle. Spark's own approx_count_distinct is HLL++ over xxhash64 and
 * cannot be cross-engine verified; this variant exists for pipelines that
 * need an APPROXIMATE cardinality whose value is still a pure,
 * reproducible function of the data (sampling audits, drift monitors,
 * regression-pinned data contracts).
 *
 * Construction:
 *  - hash = the SQL-replicable rolling polynomial (gf.polyFingerprint,
 *    domain [0, 1e9+7) — 30 bits). Register index = low p bits; the
 *    remaining W = bitlen((1e9+6) >> p) bits feed rho = W - bitlen(rest)
 *    + 1 (leading-zero rank, rho in [1, W+1]; bitlen via length(bin(x)),
 *    which both engines share). p <= 10 keeps >= 20 rho bits; a larger m
 *    wants a 64-bit hash, whose oracle twin this domain doesn't have.
 *  - the harmonic denominator S = Σ 2^-M_j is carried SCALED by 2^(W+1):
 *    intS = Σ_present 2^(W+1-M_j) + (m - present)·2^(W+1) — an exact
 *    integer (max m·2^(W+1), far under int64).
 *  - estimate = floor(alphaPpm · m² · 2^(W+1) / (1e6 · intS)) by int64
 *    floor division, with alphaPpm = floor(1e6·alpha_m) a FIXED constant
 *    of this operator's spec (alpha_m per the paper: 0.673/0.697/0.709
 *    for m = 16/32/64, else 0.7213/(1 + 1.079/m)).
 *
 * The raw estimator is reported WITHOUT the paper's small-range
 * correction (it needs ln, which is libm- and engine-specific); `v_zero`
 * (count of zero registers) ships alongside so a caller can apply linear
 * counting driver-side when est <= 2.5m and v_zero > 0.
 *
 * Scale shape: two map-combinable hash aggregates — (groups, bucket) max
 * then (groups) sum — over at most m rows per group after the first
 * combine; no window, no driver state, shuffle bounded by |groups|·m.
 */
object Hll {

  /** floor(1e6 * alpha_m) — fixed-point bias constant, pinned by unit. */
  def alphaPpm(m: Int): Long = m match {
    case 16 => 673000L
    case 32 => 697000L
    case 64 => 709000L
    case _ => math.floor(1e6 * 0.7213 / (1.0 + 1.079 / m)).toLong
  }

  /** Per-group HLL report: groups ++ (v_zero, harm_scaled, est_distinct).
    * `value` is hashed via its canonical string form. */
  def approxDistinct(df: DataFrame, groups: Seq[Column], value: Column,
                     p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 10,
      "p in [4, 10]: the 30-bit polynomial hash domain starves rho beyond m=1024")
    val m = 1 << p
    val restMax = 1000000006L >> p
    val w = 64 - java.lang.Long.numberOfLeadingZeros(restMax) // bitlen(restMax)
    val rhoMax = w + 1
    val pow2RhoMax = 1L << rhoMax
    val estNum = alphaPpm(m) * m.toLong * m.toLong * pow2RhoMax
    require(estNum > 0 && estNum < Long.MaxValue / 2, "estimator numerator overflow")
    val gNames = groups.indices.map(i => s"g$i")
    // hash the SALTED DOUBLED string (the sampleByHash pattern): a short
    // key like "1500" never wraps the 1e9+7 modulus, leaving the top hash
    // bits empty — rho would then be uniformly inflated and the estimator
    // biased high by a power of two
    val vs = value.cast("string")
    val h = gf.polyFingerprint(concat(vs, lit(":hll:"), vs))
    val bucket = h.bitwiseAND(lit((m - 1).toLong))
    val rest = shiftrightunsigned(h, p)
    val rho = when(rest === 0, lit(rhoMax)).otherwise(lit(rhoMax) - length(bin(rest)))
    val regs = df
      .select(groups.zipWithIndex.map { case (c, i) => c.as(s"g$i") } ++
        Seq(bucket.as("_b"), rho.cast("long").as("_r")): _*)
      .groupBy((gNames :+ "_b").map(col): _*)
      .agg(max(col("_r")).as("_M"))
    regs
      .groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("_present"),
        sum(expr(s"shiftrightunsigned(CAST($pow2RhoMax AS BIGINT), CAST(_M AS INT))"))
          .as("_psum"))
      .select(gNames.map(col) :+
        (lit(m.toLong) - col("_present")).as("v_zero") :+
        (col("_psum") + (lit(m.toLong) - col("_present")) * lit(pow2RhoMax))
          .as("harm_scaled"): _*)
      .withColumn("est_distinct",
        expr(s"CAST($estNum AS BIGINT) div (1000000 * harm_scaled)"))
  }

  /** Small-range companion (the paper's linear-counting correction,
    * Flajolet et al. 2007 fig. 3): when the raw estimate is in the
    * <= 2.5m zone and some registers are still zero, the better estimate
    * is m * ln(m / V) over V = v_zero. It needs `ln`, which is libm- and
    * engine-specific — exactly why [[approxDistinct]] ships (v_zero,
    * est_distinct) raw for the oracle — so the correction is applied
    * DRIVER-SIDE to the report, per group, outside the replayable plan. */
  def correctedEstimate(estDistinct: Long, vZero: Long, p: Int = 8): Long = {
    require(p >= 4 && p <= 10, "p in [4, 10], as in approxDistinct")
    val m = 1L << p
    if (2 * estDistinct <= 5 * m && vZero > 0)
      math.round(m * math.log(m.toDouble / vZero))
    else estDistinct
  }
}

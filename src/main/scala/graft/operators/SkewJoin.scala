package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for heavily skewed keys. AQE's skew-join handling
 * splits oversized partitions at runtime, but only after the shuffle has
 * materialized the hot partition, only for sort-merge joins, and not when
 * the skewed side feeds further co-partitioned stages. Salting never
 * materializes the hot partition at all: the skewed ("fact") side scatters
 * each row into one of `saltFactor` sub-keys, the other side replicates
 * each of its rows to all `saltFactor` sub-keys, and the join runs on
 * (keys..., salt) — a key carrying half the corpus spreads across
 * saltFactor tasks instead of hanging one straggler. Output is exactly the
 * plain equi-join (every left row meets every matching right row exactly
 * once: the left row's single salt value meets the one right copy carrying
 * that salt).
 *
 * Shuffle volume: |left| + saltFactor x |right| — use it when the right
 * side is the small-but-not-broadcastable dimension and the left is the
 * skewed fact.
 *
 * The scatter uses xxhash64 over a per-row ordinal, not rand(): any
 * assignment is CORRECT (each left row lands on exactly one salt), but a
 * deterministic spreader keeps task retries byte-stable.
 */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
             saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(keys.nonEmpty, "need at least one join key")
    // right rows are replicated per salt: join types that emit UNMATCHED
    // right rows would emit them saltFactor times
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti")
      .contains(joinType.toLowerCase.replace(" ", "_")),
      s"salted join preserves semantics only for inner/left joins, got $joinType")
    val l = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val r = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC changelog application — MERGE a stream of keyed insert/update/delete
 * records into a base snapshot (the batch half of Debezium-style pipelines;
 * complements Scd2's history-preserving build: this produces the CURRENT
 * snapshot, SCD2 the full audit trail).
 *
 * Semantics: per key, the change with the highest `seqCol` wins (ties
 * break on the full (seq, op) struct so the result is deterministic even
 * on malformed feeds); a winning D deletes the key, I/U upsert the
 * change's payload. Base rows without changes pass through.
 *
 * Shape: one per-key aggregate over the changelog (max of a (seq, op,
 * payload) struct — map-side combinable, no window sort), one left-anti
 * join and one union. The changelog aggregate is delta-sized; the base
 * is touched exactly once. That is the minimum possible I/O for a merge.
 */
object Cdc {

  /** `base` and `changes` must share the payload schema; `changes` adds
    * opCol ('I' | 'U' | 'D') and seqCol (higher = later). Returns the
    * merged snapshot with the payload schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                  opCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the base payload columns $payload")
    val keyC = keyCols.map(col)
    val latest = changes
      .groupBy(keyC: _*)
      .agg(max(struct(col(seqCol) +: col(opCol) +:
        payload.filterNot(keyCols.contains).map(col): _*)).as("_w"))
    val winners = latest.select(keyC ++ Seq(col(s"_w.$opCol").as("_op")) ++
      payload.filterNot(keyCols.contains).map(c => col(s"_w.$c").as(c)): _*)
    base.join(latest.select(keyC: _*), keyCols, "left_anti")
      .unionByName(winners.where(col("_op") =!= "D")
        .select(payload.map(col): _*))
  }
}

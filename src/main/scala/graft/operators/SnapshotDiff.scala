package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff between two versions of an id-keyed table — the audit tool
 * for incremental pipelines (what did yesterday's crawl/materialize run
 * actually change?). Rows only in `b` are `added`, only in `a` are
 * `removed`, in both with different content are `changed`; unchanged rows
 * are omitted.
 *
 * Scale shape: each side reduces to (id, 192-bit content hash) BEFORE the
 * full-outer id join — the exchange carries 32-byte rows, never the
 * payload (the same reason Dedup.exact hashes before shuffling). Content
 * identity is xxhash64+md5 over the JSON of the selected columns: null vs
 * empty-string stay distinct, and a hash collision across BOTH hashes
 * (~2^-192) is the only way a changed row can be missed.
 */
object SnapshotDiff {

  def diff(a: DataFrame, b: DataFrame, id: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "diff needs at least one content column")
    def hashed(df: DataFrame, p: String): DataFrame = {
      val payload = to_json(struct(cols.map(col): _*))
      // explicit presence flag: testing the id column for null would
      // misclassify rows whose id VALUE is null as unmatched
      df.select(col(id).as(s"_${p}id"), lit(true).as(s"_${p}present"),
        xxhash64(payload).as(s"_${p}h1"), unhex(md5(payload)).as(s"_${p}h2"))
    }
    hashed(a, "a").join(hashed(b, "b"), col("_aid") <=> col("_bid"), "full")
      .select(coalesce(col("_aid"), col("_bid")).as(id),
        when(col("_apresent").isNull, lit("added"))
          .when(col("_bpresent").isNull, lit("removed"))
          .when(col("_ah1") =!= col("_bh1") || col("_ah2") =!= col("_bh2"), lit("changed"))
          .as("change"))
      .where(col("change").isNotNull)
      .orderBy(col(id))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.hadoop.fs.Path

import graft.docset.DocSet
import graft.model.Document

/**
 * The engine-portable layer of the reference's vector-store writer family
 * (reference: writer.py:45 opensearch, :170 weaviate, :302 pinecone, :468
 * elasticsearch, :550 qdrant — every one is the SAME pipeline: convert each
 * document to an id-keyed record {id, embedding, text, flattened metadata},
 * batch records per partition, bulk-upsert them through a store client).
 * The store clients themselves are non-core (external services, untestable
 * offline); the conversion + partition-parallel bulk-upsert shape is
 * engine-side and lives here, with a parquet-backed store as the
 * self-contained implementation — DocSet.reconstruct() is the matching
 * read-back path (reader.py:226).
 */
object VectorStoreWrite {

  /** The wire record every vector store in the reference receives
    * (writer.py: doc_id → _id, embedding → vector field, properties →
    * metadata map, text_representation alongside). */
  final case class VectorRecord(
      id: String,
      embedding: Array[Float],
      text: Option[String],
      metadata: Map[String, String])

  /** Per-partition store client: receives batched records, must upsert
    * idempotently (task retries re-send the same batch — the same contract
    * the reference's reliability wrapper assumes, writer.py:45). The client
    * is serialized to executors, so it must not touch driver-only state
    * (in particular, no SparkSession access) — it talks to the external
    * store directly. */
  trait VectorStoreClient extends Serializable {
    def upsert(batch: Seq[VectorRecord]): Unit
    def close(): Unit = ()
  }

  def toRecord(d: Document): Option[VectorRecord] =
    d.embedding.map(e => VectorRecord(d.docId, e, d.textRepresentation, d.properties))

  /**
   * Partition-parallel bulk upsert: docs without an embedding are skipped
   * (the reference indexes only embedded docs), records stream through the
   * client in `batchSize` groups — no driver fan-in, no shuffle.
   */
  def write(docs: DocSet, client: VectorStoreClient, batchSize: Int = 200): Unit =
    docs.ds.foreachPartition { (it: Iterator[Document]) =>
      try it.flatMap(toRecord).grouped(batchSize).foreach(client.upsert)
      finally client.close()
    }
}

/**
 * Self-contained vector store over parquet with UPSERT semantics: each
 * `append` writes a new monotonic `_version` partition; readers see only the
 * latest version per id (merge-on-read). This is the standard log +
 * compaction layout — `compact()` rewrites the log to one row per id at
 * version 0 so read-side window work stays bounded.
 *
 * Ingestion is driver-only BY CONSTRUCTION: `append` is itself a distributed
 * parquet write (partition-parallel through Spark's writer), so there is no
 * per-executor client object and no path that touches `SparkSession` from an
 * executor thread. External services plug in through
 * [[VectorStoreWrite.write]] with their own network client instead.
 */
final class ParquetVectorStore(path: String) {

  /** Driver-side bulk load: append a whole DocSet as one new version.
    * The version stamp comes from partition-directory names (no data read). */
  def append(docs: DocSet): Unit = {
    val spark = docs.spark
    docs.toDF
      .where(col("embedding").isNotNull)
      .select(col("docId").as("id"), col("embedding"),
        col("textRepresentation").as("text"), col("properties").as("metadata"))
      .withColumn("_version", lit(nextVersion(spark)))
      .write.mode("append").partitionBy("_version").parquet(path)
  }

  /**
   * Streaming ingestion with EXACTLY-ONCE semantics: each micro-batch
   * writes `_version = StreamVersionBase + batchId` via DYNAMIC partition
   * overwrite — a replayed batch after a failure rewrites ITS OWN version
   * partition instead of appending a duplicate, so recovery is idempotent
   * (the standard foreachBatch + deterministic target pattern).
   *
   * Stream versions live in their own namespace ABOVE every bulk version:
   * without the offset, a bulk append between micro-batches lands exactly
   * one past the last batch's version, and the NEXT batch's dynamic
   * overwrite would silently delete it. The offset makes the two write
   * paths collision-free, with the documented rule that streaming records
   * supersede bulk loads for the same id (deterministic merge-on-read).
   *
   * CONTRACT — one stream, one checkpoint, per store: batchIds restart at
   * 0 for every streaming query, so versions are deterministic only
   * relative to a single checkpoint lineage. Two concurrent queries
   * writing the same store, or a restart with a FRESH checkpoint
   * directory, would dynamically overwrite each other's `_version`
   * partitions and silently lose records. Resuming from the SAME
   * checkpoint is always safe (that is the exactly-once replay path).
   * Multiple producers need one store each, merged on read.
   */
  def appendStream(docs: DocSet, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, batchId: Long) => upsertBatch(df, batchId))
      .start()

  /** One micro-batch's upsert; public so tests can replay a batchId and
    * prove idempotence. */
  def upsertBatch(df: DataFrame, batchId: Long): Unit =
    df.where(col("embedding").isNotNull)
      .select(col("docId").as("id"), col("embedding"),
        col("textRepresentation").as("text"), col("properties").as("metadata"))
      .withColumn("_version", lit(ParquetVectorStore.StreamVersionBase + batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_version").parquet(path)

  /** Latest record per id (merge-on-read view). */
  def read(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(desc("_version"))
    spark.read.parquet(path)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_version")
  }

  /** Rewrite the log to one row per id (compaction). Rename-aside swap:
    * the original moves to `path__old` before the rewrite renames into
    * place, so a crash at any step leaves a complete copy on disk (same
    * scheme as DocWrite.compact). */
  def compact(spark: SparkSession): Unit = {
    val latest = read(spark).withColumn("_version", lit(0L))
    val tmp = path + "__compact"
    latest.write.mode("overwrite").partitionBy("_version").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val old = new Path(path + "__old")
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old))
      throw new java.io.IOException(s"compact: rename $path aside failed")
    if (!fs.rename(new Path(tmp), new Path(path))) {
      fs.rename(old, new Path(path))
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
    }
    fs.delete(old, true)
  }

  /** Current version set, from partition-directory names only. */
  def versions(spark: SparkSession): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_version="))
      .map(_.stripPrefix("_version=").toLong)
  }

  /** Next monotonic BULK version: a directory listing, NOT a scan of the
    * store (an earlier version re-read every row to take max(_version) —
    * O(store) per append). Stream versions (>= StreamVersionBase) are
    * excluded — bulk and stream namespaces must stay disjoint or a batch
    * replay's dynamic overwrite could delete a bulk append. */
  private def nextVersion(spark: SparkSession): Long = {
    val vs = versions(spark).filter(_ < ParquetVectorStore.StreamVersionBase)
    if (vs.isEmpty) 1L else vs.max + 1L
  }
}

object ParquetVectorStore {
  /** Streaming versions start here (2^40 leaves both namespaces effectively
    * unbounded); merge-on-read therefore resolves stream-vs-bulk conflicts
    * in favor of the stream. */
  val StreamVersionBase: Long = 1L << 40
}

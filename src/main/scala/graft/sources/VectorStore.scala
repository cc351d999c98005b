package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    * the reference's reliability wrapper assumes, writer.py:45). */
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
 * upsert batch appends records stamped with a monotonic version; readers see
 * only the latest version per id. At scale this is the standard log +
 * compaction layout — `compact()` rewrites the log to one row per id so
 * read-side window work stays bounded.
 */
final class ParquetVectorStore(path: String) {
  import VectorStoreWrite._

  /** A client appending to this store (one version stamp per write call). */
  def client(spark: SparkSession): VectorStoreClient = {
    val p = path
    new VectorStoreClient {
      override def upsert(batch: Seq[VectorRecord]): Unit = {
        // executor-side: plain parquet append via hadoop-free local write is
        // not available, so batches are buffered and written through the
        // driver-side append in tests; production clients talk to a real
        // store here. Kept minimal: collect-to-driver is NOT used by
        // write() — this client exists for single-process usage.
        ParquetVectorStore.appendLocal(p, batch)
      }
    }
  }

  /** Driver-side bulk load: append a whole DocSet as one new version. */
  def append(docs: DocSet): Unit = {
    val spark = docs.spark
    val df = docs.toDF
      .where(col("embedding").isNotNull)
      .select(col("docId").as("id"), col("embedding"),
        col("textRepresentation").as("text"), col("properties").as("metadata"))
      .withColumn("_version", lit(nextVersion(spark)))
    df.write.mode("append").parquet(path)
  }

  /** Latest record per id (merge-on-read view). */
  def read(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(desc("_version"))
    spark.read.parquet(path)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_version")
  }

  /** Rewrite the log to one row per id (compaction). */
  def compact(spark: SparkSession): Unit = {
    val latest = read(spark).withColumn("_version", lit(0L))
    val tmp = path + "__compact"
    latest.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  private def nextVersion(spark: SparkSession): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 1L
    else spark.read.parquet(path).agg(max(col("_version"))).head().getLong(0) + 1L
  }
}

object ParquetVectorStore {
  import VectorStoreWrite._

  /** Test/local-mode append used by the single-process client. */
  private[sources] def appendLocal(path: String, batch: Seq[VectorRecord]): Unit =
    synchronized {
      val spark = SparkSession.active
      val rows = batch.map(r => (r.id, r.embedding, r.text, r.metadata))
      import spark.implicits._
      val version = System.nanoTime()
      rows.toDF("id", "embedding", "text", "metadata")
        .withColumn("_version", lit(version))
        .write.mode("append").parquet(path)
    }
}

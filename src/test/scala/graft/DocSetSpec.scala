package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.docset.DocSet
import graft.model.{Document, Element}

/** DocSet verb semantics on tiny in-memory docs (mirrors the reference's
  * tests/unit/transforms + test_docset.py approach). */
class DocSetSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def docs(n: Int): Seq[Document] = (0 until n).map { i =>
    Document.of(f"d$i%03d", text = s"doc number $i",
      properties = Map("i" -> i.toString, "parity" -> (i % 2).toString))
  }

  test("map / filter / flatMap") {
    val ds = DocSet.of(spark, docs(10))
    assert(ds.map(d => d.withProp("x", "1")).take(1).head.prop("x").contains("1"))
    assert(ds.filter(_.prop("parity").contains("0")).count() == 5)
    assert(ds.flatMap(d => Seq(d, d.copy(docId = d.docId + "b"))).count() == 20)
  }

  test("withProperty / spreadProperties / assignDocProperties") {
    val withEls = docs(2).map(d => d.copy(elements = Seq(
      Element.text(0, "Title", "T", properties = Map("page_number" -> "3")))))
    val ds = DocSet.of(spark, withEls)
      .withProperty("len", d => d.text.length.toString)
      .spreadProperties(Seq("i"))
      .assignDocProperties("Title")
    val d0 = ds.takeAll().minBy(_.docId)
    assert(d0.prop("len").contains("12"))
    assert(d0.elements.head.prop("i").contains("0"))
    assert(d0.prop("entity.page_number").contains("3"))
  }

  test("explode sets parent_id, keeps parent, inherits _-props; unroll splits values") {
    val d = Document.of("p1", text = "parent",
      properties = Map("_trace" -> "t", "vis" -> "v")).copy(elements = Seq(
        Element.text(0, "NarrativeText", "one"),
        Element.text(1, "NarrativeText", "two")))
    val out = DocSet.of(spark, Seq(d)).explode().takeAll().sortBy(_.docId)
    assert(out.size == 3)
    val parent = out.find(_.docId == "p1").get
    assert(parent.elements.isEmpty)
    val kids = out.filter(_.parentId.contains("p1"))
    assert(kids.size == 2)
    assert(kids.forall(_.prop("_trace").contains("t")))
    assert(kids.forall(k => k.prop("vis").isEmpty))

    val u = Document.of("u1", properties = Map("tags" -> "a, b ,c"))
    val unrolled = DocSet.of(spark, Seq(u)).unroll("properties.tags").takeAll()
    assert(unrolled.flatMap(_.prop("tags")).toSet == Set("a", "b", "c"))
  }

  test("explode -> reconstruct round-trips tableCells; unroll separators are literal") {
    import graft.model.{Bbox, TableCell}
    val cells = Seq(
      TableCell("h", Array(0), Array(0, 1), isHeader = true,
        Some(Bbox(0.1, 0.2, 0.3, 0.4))),
      TableCell("v", Array(1), Array(0), isHeader = false, None))
    val d = Document.of("t1", text = "doc").copy(elements = Seq(
      Element.text(0, "NarrativeText", "para"),
      Element("table", Some("grid"), None, None, None, 1, cells, Map.empty)))
    val back = DocSet.of(spark, Seq(d)).explode().reconstruct().takeAll()
      .find(_.docId == "t1").get
    val table = back.elements.find(_.elementType == "table").get
    assert(table.tableCells.size == 2, "table structure survives the round trip")
    assert(table.tableCells.head.content == "h")
    assert(table.tableCells.head.isHeader)
    assert(table.tableCells.head.cols.toSeq == Seq(0, 1))
    assert(table.tableCells.head.bbox.contains(Bbox(0.1, 0.2, 0.3, 0.4)))
    assert(table.prop("_table_cells_json").isEmpty, "codec property stripped")
    assert(back.elements.find(_.elementType == "NarrativeText").get.tableCells.isEmpty)
    // unroll: a regex-metachar separator splits literally, not per character
    val u = Document.of("u2", properties = Map("tags" -> "a|b|c"))
    val unrolled = DocSet.of(spark, Seq(u)).unroll("properties.tags", sep = "|").takeAll()
    assert(unrolled.flatMap(_.prop("tags")).toSet == Set("a", "b", "c"),
      s"got ${unrolled.flatMap(_.prop("tags"))}")
  }

  test("sort drops docs missing field when no default (reference semantics)") {
    val mixed = docs(4) :+ Document.of("dX", text = "no i prop")
      .copy(properties = Map.empty)
    val ds = DocSet.of(spark, mixed)
    val sorted = ds.sort(descending = false, "properties.i")
    assert(sorted.takeAll().map(_.docId) == Seq("d000", "d001", "d002", "d003"))
    val withDefault = ds.sort(descending = true, "properties.i", Some("9"))
    assert(withDefault.takeAll().head.docId == "dX") // default "9" sorts first desc
  }

  test("limit / randomSample / union") {
    val ds = DocSet.of(spark, docs(10))
    assert(ds.limit(3).count() == 3)
    assert(ds.union(ds).count() == 20)
    val s = ds.randomSample(0.5, seed = 7).count()
    assert(s >= 0 && s <= 10)
  }

  test("groupbyCount contract: properties {key, count}; topK ordering") {
    val ds = DocSet.of(spark, docs(10))
    val counted = ds.groupbyCount("properties.parity").takeAll()
    assert(counted.size == 2)
    assert(counted.forall(d => d.prop("key").isDefined && d.prop("count").contains("5")))

    val skewed = docs(10) ++ docs(4).map(d => d.copy(docId = d.docId + "x"))
    val top = DocSet.of(spark, skewed).topK("properties.parity", 1).takeAll()
    assert(top.size == 1)
    assert(top.head.prop("key").contains("0")) // 7 even vs 7 odd -> tie -> key asc
  }

  test("count / countDistinct / fieldIn semi join") {
    val ds = DocSet.of(spark, docs(10))
    assert(ds.count() == 10)
    assert(ds.countDistinct("properties.parity") == 2)
    val other = DocSet.of(spark, Seq(
      Document.of("o1", properties = Map("p" -> "1"))))
    val semi = ds.fieldIn(other, "properties.parity", "properties.p")
    assert(semi.count() == 5)
  }

  test("regexReplace / augmentText / termFrequency / markdown") {
    val d = Document.of("d1", text = "ignored", properties = Map("lang" -> "en"))
      .copy(elements = Seq(Element.text(0, "NarrativeText", "aaa bbb aaa")))
    val rr = DocSet.of(spark, Seq(d)).regexReplace(Seq("a+" -> "A")).takeAll().head
    assert(rr.elements.head.text == "A bbb A")

    val aug = DocSet.of(spark, Seq(d)).augmentText("lang={properties.lang}").takeAll().head
    assert(aug.text == "lang=en")

    val tf = DocSet.of(spark, Seq(d.withText("x y x"))).termFrequency().takeAll().head
    assert(tf.prop("term_frequency").contains("""{"x":2,"y":1}"""))

    val md = DocSet.of(spark, Seq(d.copy(elements = Seq(
      Element.text(0, "Title", "Head"),
      Element.text(1, "NarrativeText", "Body"))))).markdown().takeAll().head
    assert(md.text == "# Head\n\nBody")
  }

  test("project promotes dotted properties to columns") {
    val df = DocSet.of(spark, docs(5)).project(Seq("doc_id", "properties.i"))
    assert(df.columns.toSeq == Seq("doc_id", "properties_i"))
    assert(df.count() == 5)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.docset.DocSet
import graft.model.Document
import graft.sources._

/**
 * Wire tests for the HTTP half of the search connector: [[HttpSearchClient]]
 * over a loopback [[LocalSearchServer]] must agree with the deterministic
 * [[FakeSearch.Client]] on every contract the read/sync paths rely on —
 * slice tiling, PIT isolation + lifecycle, scroll lifecycle, the query
 * algebra, knn, and the `_bulk` write half — plus a [[SearchWire]] JSON
 * round-trip pin so the client and the test server cannot drift apart
 * silently. Also pins the PIT lifecycle fix: read()/sync() leave ZERO
 * live PITs behind, on both the direct-fake and over-the-wire paths.
 */
class SearchHttpSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def hit(id: String, kv: (String, String)*): SearchHit =
    SearchHit(id, 1.0, Map("doc_id" -> id) ++ kv)

  private def freshNs(tag: String): String = {
    val ns = s"http-$tag"
    FakeSearch.dropNamespace(ns)
    ns
  }

  /** Array-safe comparable view of a hit. */
  private def key(h: SearchHit): (String, Double, Map[String, String], Option[Seq[Float]]) =
    (h.id, h.score, h.source, h.embedding.map(_.toSeq))

  private def withServer[A](ns: String)(f: (LocalSearchServer, HttpSearchClient) => A): A = {
    val server = new LocalSearchServer(ns)
    val client = new HttpSearchClient(server.baseUri)
    try f(server, client)
    finally { client.close(); server.close() }
  }

  test("SearchWire: every query shape and a hit survive the JSON round trip") {
    val queries = Seq[SearchQuery](
      SearchQuery.MatchAll,
      SearchQuery.Term("type", "report"),
      SearchQuery.Terms("_id", Seq("a", "b")),
      SearchQuery.Match("text", "solar panel"),
      SearchQuery.Bool(
        must = Seq(SearchQuery.Term("type", "report")),
        filter = Seq(SearchQuery.Terms("year", Seq("2024"))),
        mustNot = Seq(SearchQuery.Match("text", "draft"))))
    queries.foreach { q =>
      assert(SearchWire.parseQuery(SearchWire.queryJson(q)) == q,
        s"round trip of $q")
    }
    // knn carries an Array — compare piecewise
    val knn = SearchQuery.Knn(Array(1.5f, -2f), 7,
      Some(SearchQuery.Term("type", "report")))
    SearchWire.parseQuery(SearchWire.queryJson(knn)) match {
      case k: SearchQuery.Knn =>
        assert(k.vector.toSeq == knn.vector.toSeq && k.k == 7 && k.filter == knn.filter)
      case other => fail(s"parsed to $other")
    }
    val h = SearchHit("d1", 0.75,
      Map("doc_id" -> "d1", "text" -> "body", "properties.year" -> "2024"),
      Some(Array(0.25f, 1f)))
    assert(key(SearchWire.parseHit(SearchWire.hitJson(h))) == key(h))
    // the wire shape NESTS properties (what opensearchBulk writes and a
    // real backend stores) while the model keeps flat dotted keys
    val src = SearchWire.sourceJson(h)
    assert(src.get("properties") != null && src.get("properties").isObject,
      "properties.* keys nest into an object on the wire")
    assert(src.get("properties").get("year").asText() == "2024")
    assert(!src.has("properties.year"), "no flat dotted field on the wire")
  }

  test("loopback: server-side _source filtering rides the wire") {
    val ns = freshNs("srcfilter")
    FakeSearch.createIndex(ns, "idx", Seq(
      SearchHit("a", 1.0, Map("doc_id" -> "a", "text" -> "big body",
        "parent_id" -> "p", "properties.k" -> "v"), Some(Array(1f, 0f)))))
    withServer(ns) { (_, c) =>
      val slim = c.searchPage("idx", SearchQuery.MatchAll, None, None, 0, 10,
        Some(Seq("doc_id", "parent_id", "properties.k"))).head
      assert(slim.source == Map("doc_id" -> "a", "parent_id" -> "p",
        "properties.k" -> "v"))
      assert(slim.embedding.isEmpty, "embedding excluded unless named")
    }
  }

  test("loopback: slices are disjoint and complete; pages tile the slice") {
    val ns = freshNs("slice")
    FakeSearch.createIndex(ns, "idx", (0 until 57).map(i => hit(f"doc$i%03d")))
    withServer(ns) { (_, c) =>
      assert(c.indexExists("idx") && !c.indexExists("nope"))
      assert(c.count("idx", SearchQuery.MatchAll, None) == 57)
      val bySlice = (0 until 5).map { s =>
        Iterator.from(0, 4)
          .map(from => c.searchPage("idx", SearchQuery.MatchAll,
            Some(SearchSlice(s, 5)), None, from, 4))
          .takeWhile(_.nonEmpty).flatten.map(_.id).toSeq
      }
      val all = bySlice.flatten
      assert(all.length == 57 && all.distinct.length == 57,
        "every doc in exactly one slice over the wire")
      // byte-for-byte agreement with the fake on a window
      val fake = FakeSearchClientFactory(ns).open()
      try {
        val w = c.searchPage("idx", SearchQuery.MatchAll, Some(SearchSlice(1, 5)), None, 2, 3)
        val f = fake.searchPage("idx", SearchQuery.MatchAll, Some(SearchSlice(1, 5)), None, 2, 3)
        assert(w.map(key) == f.map(key))
      } finally fake.close()
    }
  }

  test("loopback: PIT pins a snapshot, extends per request, dies on delete") {
    val ns = freshNs("pit")
    FakeSearch.createIndex(ns, "idx", Seq(hit("a"), hit("b")))
    withServer(ns) { (_, c) =>
      val pit = c.createPit("idx")
      FakeSearch.indexDocs(ns, "idx", Seq(hit("c")))
      // pinned count goes through the size-0 _search route (keep_alive sent)
      assert(c.count("idx", SearchQuery.MatchAll, Some(pit)) == 2, "PIT read is frozen")
      assert(c.count("idx", SearchQuery.MatchAll, None) == 3, "live read sees the write")
      val page = c.searchPage("idx", SearchQuery.MatchAll, None, Some(pit), 0, 10)
      assert(page.map(_.id) == Seq("a", "b"))
      c.deletePit(pit)
      assert(FakeSearch.livePits(ns) == 0)
      intercept[java.io.IOException] {
        c.searchPage("idx", SearchQuery.MatchAll, None, Some(pit), 0, 10)
      }
    }
  }

  test("loopback: scroll walks all pages once and dies on clear") {
    val ns = freshNs("scroll")
    FakeSearch.createIndex(ns, "idx", (0 until 7).map(i => hit(s"d$i")))
    withServer(ns) { (_, c) =>
      val docs = SearchRead.scrollAll(c, "idx", SearchQuery.MatchAll, pageSize = 3)
      assert(docs.map(_.docId).sorted == (0 until 7).map(i => s"d$i"))
      val (sid, first) = c.openScroll("idx", SearchQuery.MatchAll, 3)
      assert(first.size == 3)
      c.clearScroll(sid)
      intercept[java.io.IOException](c.scroll(sid))
    }
  }

  test("loopback: query algebra and knn agree with the fake") {
    val ns = freshNs("algebra")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("a", "type" -> "report", "text" -> "solar panel output",
        "properties.year" -> "2024"),
      hit("b", "type" -> "memo", "text" -> "wind turbine",
        "properties.year" -> "2024"),
      hit("c", "type" -> "report", "text" -> "coal plant",
        "properties.year" -> "2023")))
    FakeSearch.indexDocs(ns, "idx", Seq(
      SearchHit("v1", 1.0, Map("doc_id" -> "v1"), Some(Array(1f, 0f))),
      SearchHit("v2", 1.0, Map("doc_id" -> "v2"), Some(Array(0f, 1f))),
      SearchHit("v3", 1.0, Map("doc_id" -> "v3"), Some(Array(1f, 1f)))))
    val shapes = Seq[SearchQuery](
      SearchQuery.MatchAll,
      SearchQuery.Term("type", "report"),
      SearchQuery.Term("type.keyword", "memo"),
      SearchQuery.Terms("_id", Seq("a", "b")),
      SearchQuery.Match("text", "panel plant"),
      SearchQuery.Term("year", "2024"),
      SearchQuery.withFilter(SearchQuery.Term("type", "report"), "year", Seq("2024")),
      SearchQuery.Bool(mustNot = Seq(SearchQuery.Term("type", "report"))))
    withServer(ns) { (_, c) =>
      val fake = FakeSearchClientFactory(ns).open()
      try {
        shapes.foreach { q =>
          val wire = c.searchPage("idx", q, None, None, 0, 100).map(key)
          val direct = fake.searchPage("idx", q, None, None, 0, 100).map(key)
          assert(wire == direct, s"wire != direct for $q")
          assert(c.count("idx", q, None) == fake.count("idx", q, None))
        }
        val q = SearchQuery.Knn(Array(1f, 0f), 2)
        assert(c.knn("idx", q).map(key) == fake.knn("idx", q).map(key))
        val filtered = SearchQuery.Knn(Array(1f, 0f), 2,
          Some(SearchQuery.Terms("_id", Seq("v2", "v3"))))
        assert(c.knn("idx", filtered).map(key) == fake.knn("idx", filtered).map(key))
      } finally fake.close()
    }
  }

  test("loopback: bulk write half round-trips and deletes by parent") {
    val ns = freshNs("bulk")
    withServer(ns) { (_, c) =>
      assert(!c.indexExists("w"))
      c.bulkIndex("w", Seq(
        hit("p1", "text" -> "parent one"),
        hit("p1e0", "parent_id" -> "p1", "text" -> "elem",
          "properties.k" -> "v"),
        SearchHit("p2", 1.0, Map("doc_id" -> "p2"), Some(Array(0.5f, 0.5f)))))
      assert(c.indexExists("w"))
      assert(c.count("w", SearchQuery.MatchAll, None) == 3)
      val back = c.searchPage("w", SearchQuery.MatchAll, None, None, 0, 10)
      assert(back.map(_.id) == Seq("p1", "p1e0", "p2"))
      assert(back(1).source.get("properties.k").contains("v"),
        "nested properties survive the NDJSON round trip")
      assert(back(2).embedding.map(_.toSeq).contains(Seq(0.5f, 0.5f)),
        "embedding survives the NDJSON round trip")
      // upsert by _id, not append
      c.bulkIndex("w", Seq(hit("p1", "text" -> "parent one EDITED")))
      assert(c.count("w", SearchQuery.MatchAll, None) == 3)
      c.deleteByParent("w", Seq("p1"))
      val left = c.searchPage("w", SearchQuery.MatchAll, None, None, 0, 10)
      assert(left.map(_.id) == Seq("p2"), "parent and its element both removed")
    }
  }

  test("loopback: Basic auth credentials pass through; missing/wrong ones are 401") {
    val ns = freshNs("auth")
    FakeSearch.createIndex(ns, "idx", Seq(hit("a"), hit("b")))
    val server = new LocalSearchServer(ns, requiredAuth = Some(("u", "secret")))
    try {
      val good = new HttpSearchClient(server.baseUri, auth = Some(("u", "secret")))
      try assert(good.count("idx", SearchQuery.MatchAll, None) == 2)
      finally good.close()
      val none = new HttpSearchClient(server.baseUri)
      try intercept[java.io.IOException](none.count("idx", SearchQuery.MatchAll, None))
      finally none.close()
      val wrong = new HttpSearchClient(server.baseUri, auth = Some(("u", "nope")))
      try intercept[java.io.IOException](wrong.count("idx", SearchQuery.MatchAll, None))
      finally wrong.close()
    } finally server.close()
  }

  test("distributed sliced read over the wire == direct fake; zero PITs leak") {
    val ns = freshNs("dread")
    val hits = (0 until 40).map(i =>
      hit(s"d$i", "text" -> s"body $i", "type" -> (if (i % 2 == 0) "even" else "odd")))
    FakeSearch.createIndex(ns, "idx", hits)
    withServer(ns) { (server, _) =>
      val q = SearchQuery.Term("type", "even")
      val wire = SearchRead.read(spark, HttpSearchClientFactory(server.baseUri),
        "idx", q, pageSize = 3, sliceTarget = 5).takeAll()
      val direct = SearchRead.read(spark, FakeSearchClientFactory(ns),
        "idx", q, pageSize = 3, sliceTarget = 5).takeAll()
      assert(wire.map(_.docId).sorted == direct.map(_.docId).sorted)
      assert(wire.map(_.docId).sorted == (0 until 40 by 2).map(i => s"d$i").sortBy(identity))
      assert(wire.forall(_.prop(SearchRead.ScoreProp).contains("1.0")))
      assert(FakeSearch.livePits(ns) == 0, "read() must delete its PIT")
    }
  }

  test("reconstructing read over the wire keeps provenance; zero PITs leak") {
    val ns = freshNs("dreco")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("p1", "type" -> "pdf", "text" -> "whole doc"),
      hit("p1e0", "parent_id" -> "p1", "text" -> "alpha needle",
        "properties._element_index" -> "0"),
      hit("p1e1", "parent_id" -> "p1", "text" -> "beta",
        "properties._element_index" -> "1"),
      hit("p3", "type" -> "pdf", "text" -> "needle childless")))
    withServer(ns) { (server, _) =>
      val docs = SearchRead.read(spark, HttpSearchClientFactory(server.baseUri),
        "idx", SearchQuery.Match("text", "needle"), reconstruct = true,
        pageSize = 2, sliceTarget = 2).takeAll()
      val byId = docs.map(d => d.docId -> d).toMap
      assert(byId.keySet == Set("p1", "p3"))
      assert(byId("p1").elements.map(e => e.prop(SearchRead.SourceProp).get) ==
        Seq(SearchRead.SourceDbQuery, SearchRead.SourceReconstructRetrieval))
      assert(FakeSearch.livePits(ns) == 0, "reconstructing read must delete its PIT")
    }
  }

  test("read() deletes its PIT even when the read fails") {
    val ns = freshNs("pitfail")
    FakeSearch.createIndex(ns, "idx", (0 until 10).map(i => hit(s"d$i")))
    // a factory whose task-side clients always fail mid-page
    val boom = new SearchClientFactory {
      override def open(): SearchClient = new SearchClient {
        private val inner = new FakeSearch.Client(ns)
        def indexExists(index: String) = inner.indexExists(index)
        def count(index: String, query: SearchQuery, pit: Option[String]) =
          inner.count(index, query, pit)
        def createPit(index: String) = inner.createPit(index)
        def deletePit(pitId: String) = inner.deletePit(pitId)
        def searchPage(index: String, query: SearchQuery, slice: Option[SearchSlice],
                       pit: Option[String], from: Int, size: Int,
                       fields: Option[Seq[String]]): Seq[SearchHit] =
          throw new IllegalStateException("wire down")
        def openScroll(index: String, query: SearchQuery, size: Int) =
          inner.openScroll(index, query, size)
        def scroll(scrollId: String) = inner.scroll(scrollId)
        def clearScroll(scrollId: String) = inner.clearScroll(scrollId)
        def knn(index: String, q: SearchQuery.Knn) = inner.knn(index, q)
        def bulkIndex(index: String, hits: Seq[SearchHit]) = inner.bulkIndex(index, hits)
        def deleteByParent(index: String, parentKeys: Seq[String]) =
          inner.deleteByParent(index, parentKeys)
        override def close(): Unit = inner.close()
      }
    }
    intercept[Exception] {
      SearchRead.read(spark, boom, "idx", SearchQuery.MatchAll)
    }
    assert(FakeSearch.livePits(ns) == 0, "failed read must still delete its PIT")
  }

  test("sync leaves zero live PITs behind") {
    val ns = freshNs("pitsync")
    val f = FakeSearchClientFactory(ns)
    val docs = DocSet.of(spark, (0 until 4).map(i =>
      Document.of(s"doc$i", text = s"parent $i", docType = "pdf",
        elements = Seq(graft.model.Element.text(0, "para", s"body $i"))))).explode()
    SearchSync.sync(docs, f, "idx")
    SearchSync.sync(docs, f, "idx") // second sync scans the index (PIT path)
    assert(FakeSearch.livePits(ns) == 0, "sync must not leak PITs")
  }

  test("DocSet.query maps query documents to result documents with hit elements") {
    val ns = freshNs("qdoc")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("a", "type" -> "report", "text" -> "solar panel"),
      hit("b", "type" -> "memo", "text" -> "wind turbine"),
      SearchHit("v1", 1.0, Map("doc_id" -> "v1", "type" -> "vec"), Some(Array(1f, 0f))),
      SearchHit("v2", 1.0, Map("doc_id" -> "v2", "type" -> "vec"), Some(Array(0f, 1f)))))
    def qd(id: String, q: SearchQuery, props: Map[String, String] = Map("index" -> "idx")) =
      Document.of(id, text = SearchWire.queryJson(q).toString, properties = props)
    val queries = DocSet.of(spark, Seq(
      qd("q1", SearchQuery.Term("type", "report")),
      qd("q2", SearchQuery.Knn(Array(1f, 0f), 1)),
      qd("q3", SearchQuery.Term("type", "nothing")),
      // no index property: falls back to defaultIndex
      qd("q4", SearchQuery.Term("type", "memo"), Map.empty)))
    val results = queries.query(FakeSearchClientFactory(ns),
      defaultIndex = Some("idx")).takeAll()
    val byId = results.map(d => d.docId -> d).toMap
    assert(byId.keySet == Set("q1", "q2", "q3", "q4"))
    assert(results.forall(_.docType.contains("QueryResult")))
    val q1 = byId("q1")
    assert(q1.elements.map(e => e.prop("doc_id").get) == Seq("a"))
    assert(q1.elements.head.textRepresentation.contains("solar panel"))
    assert(q1.elements.head.prop(SearchRead.SourceProp).contains(SearchRead.SourceDbQuery))
    assert(q1.prop("result_count").contains("1"))
    assert(byId("q2").elements.map(e => e.prop("doc_id").get) == Seq("v1"),
      "knn query document retrieves nearest neighbor")
    assert(byId("q2").elements.head.prop(SearchRead.ScoreProp).exists(_.toDouble > 0.99))
    assert(byId("q3").elements.isEmpty && byId("q3").prop("result_count").contains("0"))
    assert(byId("q4").elements.map(e => e.prop("doc_id").get) == Seq("b"))
    assert(FakeSearch.livePits(ns) == 0,
      "queryDocs pages via scroll cursors and must hold no PITs")
    // a query document naming no index anywhere fails loudly
    val bad = DocSet.of(spark, Seq(qd("qx", SearchQuery.MatchAll, Map.empty)))
    intercept[Exception](bad.query(FakeSearchClientFactory(ns)).takeAll())
  }

  test("DocSet.query works over the wire too") {
    val ns = freshNs("qdocwire")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("a", "type" -> "report"), hit("b", "type" -> "memo")))
    withServer(ns) { (server, _) =>
      val queries = DocSet.of(spark, Seq(
        Document.of("q1",
          text = SearchWire.queryJson(SearchQuery.Term("type", "memo")).toString,
          properties = Map("index" -> "idx"))))
      val out = queries.query(HttpSearchClientFactory(server.baseUri)).takeAll()
      assert(out.head.elements.map(e => e.prop("doc_id").get) == Seq("b"))
    }
  }
}

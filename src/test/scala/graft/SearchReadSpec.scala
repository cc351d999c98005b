package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.docset.DocSet
import graft.model.Document
import graft.sources._
import java.nio.file.Files

/**
 * Contract tests for the search-index read seam (reference:
 * connectors/opensearch/opensearch_reader.py): PIT snapshot isolation,
 * slice disjointness/completeness, from/size paging, scroll lifecycle,
 * the query algebra, the distributed sliced read, two-phase document
 * reconstruction with provenance marking, and the offline `_bulk`
 * write -> ingest -> read-back -> reconstruct round trip.
 */
class SearchReadSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def hit(id: String, kv: (String, String)*): SearchHit =
    SearchHit(id, 1.0, Map("doc_id" -> id) ++ kv)

  private def freshNs(tag: String): String = {
    val ns = s"spec-$tag"
    FakeSearch.dropNamespace(ns)
    ns
  }

  test("slices are disjoint and complete; pages tile the slice") {
    val ns = freshNs("slice")
    val hits = (0 until 57).map(i => hit(f"doc$i%03d"))
    FakeSearch.createIndex(ns, "idx", hits)
    val c = FakeSearchClientFactory(ns).open()
    try {
      val bySlice = (0 until 5).map { s =>
        // page size 4 forces multi-page slices
        Iterator.from(0, 4)
          .map(from => c.searchPage("idx", SearchQuery.MatchAll,
            Some(SearchSlice(s, 5)), None, from, 4))
          .takeWhile(_.nonEmpty).flatten.map(_.id).toSeq
      }
      val all = bySlice.flatten
      assert(all.length == 57, "every doc in exactly one slice (complete)")
      assert(all.distinct.length == 57, "no doc in two slices (disjoint)")
      assert(bySlice.count(_.nonEmpty) >= 2, "hash spreads across slices")
      // page order is deterministic: re-reading a window gives the same ids
      val w1 = c.searchPage("idx", SearchQuery.MatchAll, Some(SearchSlice(1, 5)), None, 2, 3)
      val w2 = c.searchPage("idx", SearchQuery.MatchAll, Some(SearchSlice(1, 5)), None, 2, 3)
      assert(w1.map(_.id) == w2.map(_.id))
    } finally c.close()
  }

  test("PIT pins a snapshot: concurrent writes are invisible under it") {
    val ns = freshNs("pit")
    FakeSearch.createIndex(ns, "idx", Seq(hit("a"), hit("b")))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val pit = c.createPit("idx")
      FakeSearch.indexDocs(ns, "idx", Seq(hit("c")))
      assert(c.count("idx", SearchQuery.MatchAll, Some(pit)) == 2, "PIT read is frozen")
      assert(c.count("idx", SearchQuery.MatchAll, None) == 3, "live read sees the write")
      c.deletePit(pit)
      intercept[IllegalArgumentException] {
        c.searchPage("idx", SearchQuery.MatchAll, None, Some(pit), 0, 10)
      }
    } finally c.close()
  }

  test("PIT snapshot survives upserts and deletes, not just appends") {
    val ns = freshNs("pitmvcc")
    FakeSearch.createIndex(ns, "idx", Seq(hit("a", "text" -> "v1"), hit("b")))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val pit = c.createPit("idx")
      c.bulkIndex("idx", Seq(hit("a", "text" -> "v2")))
      c.deleteByParent("idx", Seq("b"))
      val pinned = c.searchPage("idx", SearchQuery.MatchAll, None, Some(pit), 0, 10)
      assert(pinned.map(_.id) == Seq("a", "b"),
        "the pre-write snapshot keeps the deleted record")
      assert(pinned.find(_.id == "a").get.source.get("text").contains("v1"),
        "the pre-write snapshot keeps the OLD version of an upserted record")
      val live = c.searchPage("idx", SearchQuery.MatchAll, None, None, 0, 10)
      assert(live.map(_.id) == Seq("a"), "live read sees the delete")
      assert(live.head.source.get("text").contains("v2"), "live read sees the upsert")
      c.deletePit(pit)
    } finally c.close()
  }

  test("PIT ids are never recycled after a delete shrinks the map") {
    val ns = freshNs("pitid")
    FakeSearch.createIndex(ns, "idx1", Seq(hit("a")))
    FakeSearch.createIndex(ns, "idx2", Seq(hit("b")))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val p1 = c.createPit("idx1")
      val p2 = c.createPit("idx2")
      c.deletePit(p1)
      val p3 = c.createPit("idx1")
      assert(p3 != p1 && p3 != p2, "a fresh PIT must not collide with a live one")
      // p2's snapshot is untouched by p3's creation
      assert(c.searchPage("idx2", SearchQuery.MatchAll, None, Some(p2), 0, 10)
        .map(_.id) == Seq("b"))
    } finally c.close()
  }

  test("searchPage server-side field filtering strips bodies but keeps keys") {
    val ns = freshNs("fields")
    FakeSearch.createIndex(ns, "idx", Seq(
      SearchHit("a", 1.0, Map("doc_id" -> "a", "text" -> "big body",
        "parent_id" -> "p", "properties.k" -> "v"), Some(Array(1f, 0f)))))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val slim = c.searchPage("idx", SearchQuery.MatchAll, None, None, 0, 10,
        Some(Seq("doc_id", "parent_id"))).head
      assert(slim.source == Map("doc_id" -> "a", "parent_id" -> "p"))
      assert(slim.embedding.isEmpty, "embedding excluded unless named")
      val withEmb = c.searchPage("idx", SearchQuery.MatchAll, None, None, 0, 10,
        Some(Seq("doc_id", "embedding"))).head
      assert(withEmb.embedding.isDefined)
    } finally c.close()
  }

  test("sync detects embedding-only drift (re-embedded corpus must reload)") {
    val ns = freshNs("sync4")
    val f = FakeSearchClientFactory(ns)
    val v1 = corpus(2)
    SearchSync.sync(DocSet.of(spark, v1).explode(), f, "idx")
    val v2 = v1.map(d =>
      if (d.docId == "doc1") d.copy(embedding = Some(Array(1f, 2f))) else d)
    val plan = SearchSync.diff(DocSet.of(spark, v2).explode(), f, "idx").collect()
    assert(plan.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("doc1", "load")), "new vectors, same text: still a reload")
  }

  test("scroll walks all pages once and dies on clear") {
    val ns = freshNs("scroll")
    FakeSearch.createIndex(ns, "idx", (0 until 7).map(i => hit(s"d$i")))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val docs = SearchRead.scrollAll(c, "idx", SearchQuery.MatchAll, pageSize = 3)
      assert(docs.map(_.docId).sorted == (0 until 7).map(i => s"d$i"))
      val (sid, first) = c.openScroll("idx", SearchQuery.MatchAll, 3)
      assert(first.size == 3)
      c.clearScroll(sid)
      intercept[IllegalArgumentException](c.scroll(sid))
    } finally c.close()
  }

  test("query algebra: term/terms/match/bool and the filter wrapper") {
    val ns = freshNs("query")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("a", "type" -> "report", "text" -> "solar panel output",
        "properties.year" -> "2024"),
      hit("b", "type" -> "memo", "text" -> "wind turbine",
        "properties.year" -> "2024"),
      hit("c", "type" -> "report", "text" -> "coal plant",
        "properties.year" -> "2023")))
    val c = FakeSearchClientFactory(ns).open()
    try {
      def ids(q: SearchQuery) =
        c.searchPage("idx", q, None, None, 0, 10).map(_.id)
      assert(ids(SearchQuery.Term("type", "report")) == Seq("a", "c"))
      assert(ids(SearchQuery.Term("type.keyword", "memo")) == Seq("b"),
        ".keyword addressing resolves to the same field")
      assert(ids(SearchQuery.Terms("_id", Seq("a", "b"))) == Seq("a", "b"))
      assert(ids(SearchQuery.Match("text", "panel plant")) == Seq("a", "c"))
      // properties.* fields address with or without the prefix
      assert(ids(SearchQuery.Term("year", "2024")) == Seq("a", "b"))
      val filtered = SearchQuery.withFilter(
        SearchQuery.Term("type", "report"), "year", Seq("2024"))
      assert(ids(filtered) == Seq("a"))
      assert(ids(SearchQuery.Bool(mustNot = Seq(SearchQuery.Term("type", "report"))))
        == Seq("b"))
    } finally c.close()
  }

  test("knn returns cosine top-k with deterministic tie order") {
    val ns = freshNs("knn")
    FakeSearch.createIndex(ns, "idx", Seq(
      SearchHit("a", 1.0, Map("doc_id" -> "a"), Some(Array(1f, 0f))),
      SearchHit("b", 1.0, Map("doc_id" -> "b"), Some(Array(0f, 1f))),
      SearchHit("c", 1.0, Map("doc_id" -> "c"), Some(Array(1f, 1f))),
      SearchHit("noemb", 1.0, Map("doc_id" -> "noemb"))))
    val c = FakeSearchClientFactory(ns).open()
    try {
      val top = c.knn("idx", SearchQuery.Knn(Array(1f, 0f), 2))
      assert(top.map(_.id) == Seq("a", "c"))
      assert(top.head.score > top(1).score)
      val filtered = c.knn("idx",
        SearchQuery.Knn(Array(1f, 0f), 2, Some(SearchQuery.Terms("_id", Seq("b", "c")))))
      assert(filtered.map(_.id) == Seq("c", "b"))
    } finally c.close()
  }

  test("distributed sliced read returns every matching doc with its score") {
    val ns = freshNs("read")
    val hits = (0 until 40).map(i =>
      hit(s"d$i", "text" -> s"body $i", "type" -> (if (i % 2 == 0) "even" else "odd")))
    FakeSearch.createIndex(ns, "idx", hits)
    val docs = SearchRead.read(spark, FakeSearchClientFactory(ns), "idx",
      SearchQuery.Term("type", "even"), pageSize = 3, sliceTarget = 5).takeAll()
    assert(docs.map(_.docId).sorted == (0 until 40 by 2).map(i => s"d$i").sortBy(identity))
    assert(docs.forall(_.prop(SearchRead.ScoreProp).contains("1.0")))
    assert(docs.forall(_.prop(SearchRead.SourceProp).contains(SearchRead.SourceDbQuery)))
    intercept[IllegalArgumentException] {
      SearchRead.read(spark, FakeSearchClientFactory(ns), "nope", SearchQuery.MatchAll)
    }
  }

  test("reconstruction: matched element pulls its parent and ALL siblings") {
    val ns = freshNs("reco2")
    FakeSearch.createIndex(ns, "idx", Seq(
      hit("p1", "type" -> "pdf", "text" -> "whole doc"),
      hit("p1e0", "parent_id" -> "p1", "text" -> "alpha needle",
        "properties._element_index" -> "0"),
      hit("p1e1", "parent_id" -> "p1", "text" -> "beta",
        "properties._element_index" -> "1"),
      hit("p2e0", "parent_id" -> "p2", "text" -> "delta needle",
        "properties._element_index" -> "0"),
      hit("p3", "type" -> "pdf", "text" -> "needle childless"),
      hit("zz", "type" -> "pdf", "text" -> "unrelated")))
    val q = SearchQuery.Match("text", "needle")
    val docs = SearchRead.read(spark, FakeSearchClientFactory(ns), "idx", q,
      reconstruct = true, pageSize = 2, sliceTarget = 2).takeAll()
    val byId = docs.map(d => d.docId -> d).toMap
    assert(byId.keySet == Set("p1", "p2", "p3"), "unrelated doc stays out")
    // p1: parent body synthesized (p1 itself did not match) with BOTH
    // elements, the matched one DB_QUERY, the sibling RECONSTRUCTION
    val p1 = byId("p1")
    assert(p1.elements.map(_.text) == Seq("alpha needle", "beta"),
      "all siblings fetched, element_index order")
    val mark = p1.elements.map(e => e.prop(SearchRead.SourceProp).get)
    assert(mark == Seq(SearchRead.SourceDbQuery, SearchRead.SourceReconstructRetrieval))
    assert(p1.elements.head.prop(SearchRead.ScoreProp).contains("1.0"))
    assert(p1.elements(1).prop(SearchRead.ScoreProp).contains("0.0"))
    // p2: orphan element -> synthesized parent
    assert(byId("p2").elements.map(_.text) == Seq("delta needle"))
    // p3: childless matched parent passes through
    assert(byId("p3").elements.isEmpty)
    assert(byId("p3").textRepresentation.contains("needle childless"))
  }

  test("bulk write -> ingest -> sliced read-back -> reconstruct round trip") {
    val dir = Files.createTempDirectory("graft_osrt").toString + "/bulk"
    val parents = (0 until 6).map { i =>
      Document.of(s"doc$i", text = s"parent $i", docType = "pdf",
        properties = Map("source" -> "crawl"),
        elements = (0 until 3).map(j =>
          graft.model.Element.text(j, "para", s"p$i body $j")))
    }
    val exploded = DocSet.of(spark, parents).explode()
    DocWrite.opensearchBulk(exploded, dir, index = "corpus")
    val back = SearchRead.read(spark, BulkDirSearchClientFactory(dir, "corpus"),
      "corpus", SearchQuery.MatchAll, reconstruct = true,
      pageSize = 4, sliceTarget = 3).takeAll()
    assert(back.map(_.docId).sorted == parents.map(_.docId).sorted)
    val byId = back.map(d => d.docId -> d).toMap
    parents.foreach { p =>
      val r = byId(p.docId)
      assert(r.textRepresentation == p.textRepresentation)
      assert(r.docType.contains("pdf"))
      assert(r.prop("source").contains("crawl"))
      assert(r.elements.map(_.text) == p.elements.map(_.text),
        "element order and text survive the wire round trip")
    }
  }

  test("a rewritten bulk dir serves the NEW corpus, not the stale first ingest") {
    val dir = Files.createTempDirectory("graft_osrw").toString + "/bulk"
    def write(salt: String) = DocWrite.opensearchBulk(
      DocSet.of(spark, (0 until 3).map(i =>
        Document.of(s"doc$i", text = s"body $i $salt", docType = "pdf"))).explode(),
      dir, index = "corpus")
    write("v1")
    val first = SearchRead.read(spark, BulkDirSearchClientFactory(dir, "corpus"),
      "corpus", SearchQuery.MatchAll).takeAll()
    assert(first.forall(_.text.endsWith("v1")))
    // same path, new content: the content-fingerprinted namespace must
    // re-ingest instead of serving the stale registry entry (r14 advice)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    write("v2")
    val second = SearchRead.read(spark, BulkDirSearchClientFactory(dir, "corpus"),
      "corpus", SearchQuery.MatchAll).takeAll()
    assert(second.nonEmpty && second.forall(_.text.endsWith("v2")),
      s"stale ingest served: ${second.map(_.text)}")
  }

  test("same-size same-mtime rewrite still re-ingests (content fingerprint)") {
    val dir = Files.createTempDirectory("graft_osfp").toString + "/bulk"
    DocWrite.opensearchBulk(
      DocSet.of(spark, (0 until 3).map(i =>
        Document.of(s"doc$i", text = s"body $i vA", docType = "pdf"))).explode(),
      dir, index = "corpus")
    val first = SearchRead.read(spark, BulkDirSearchClientFactory(dir, "corpus"),
      "corpus", SearchQuery.MatchAll).takeAll()
    assert(first.forall(_.text.endsWith("vA")))
    // in-place byte edit: SAME file names, SAME lengths, and mtime restored
    // to the original value — only the bytes differ. A name:size:mtime
    // fingerprint would serve the stale vA ingest here.
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val mtime = f.lastModified()
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val edited = new String(bytes, "UTF-8").replace("vA", "vB").getBytes("UTF-8")
      assert(edited.length == bytes.length)
      java.nio.file.Files.write(f.toPath, edited)
      assert(f.setLastModified(mtime))
    }
    val second = SearchRead.read(spark, BulkDirSearchClientFactory(dir, "corpus"),
      "corpus", SearchQuery.MatchAll).takeAll()
    assert(second.nonEmpty && second.forall(_.text.endsWith("vB")),
      s"stale ingest served after same-size same-mtime rewrite: ${second.map(_.text)}")
  }

  test("namespace eviction spares a superseded corpus version with live PITs") {
    val prefix = "bulkdir:/graft-evict-spec:"
    val oldNs = prefix + "old"
    val newNs = prefix + "new"
    FakeSearch.dropNamespace(oldNs); FakeSearch.dropNamespace(newNs)
    FakeSearch.createIndex(oldNs, "idx", Seq(hit("a"), hit("b")))
    FakeSearch.createIndex(newNs, "idx", Seq(hit("c")))
    val c = new FakeSearch.Client(oldNs)
    try {
      val pit = c.createPit("idx")
      // an in-flight read of the OLD version holds a PIT: eviction must
      // spare it, or the read's remaining pages break mid-flight
      FakeSearch.dropNamespacesWithPrefix(prefix, keep = newNs)
      assert(FakeSearch.livePits(oldNs) == 1, "live-PIT namespace evicted")
      val page = c.searchPage("idx", SearchQuery.MatchAll, None, Some(pit), 0, 10)
      assert(page.map(_.id).sorted == Seq("a", "b"), "old snapshot lost")
      c.deletePit(pit)
      // PITs closed: the superseded version is now reapable. The OLD client
      // keeps its captured snapshot object (harmless — it dies with the
      // read); a FRESH open against the registry must find nothing.
      FakeSearch.dropNamespacesWithPrefix(prefix, keep = newNs)
      assert(FakeSearch.livePits(oldNs) == 0)
      val fresh = new FakeSearch.Client(oldNs)
      try assertThrows[IllegalArgumentException] {
        fresh.searchPage("idx", SearchQuery.MatchAll, None, None, 0, 10)
      } finally fresh.close()
    } finally c.close()
    FakeSearch.dropNamespace(newNs)
  }

  private def corpus(n: Int, salt: String = ""): Seq[Document] =
    (0 until n).map { i =>
      Document.of(s"doc$i", text = s"parent $i$salt", docType = "pdf",
        elements = (0 until 2).map(j =>
          graft.model.Element.text(j, "para", s"p$i body $j$salt")))
    }

  test("sync bootstraps an absent index, then converges to a no-op") {
    val ns = freshNs("sync1")
    val f = FakeSearchClientFactory(ns)
    val docs = DocSet.of(spark, corpus(5)).explode()
    val (l1, d1) = SearchSync.sync(docs, f, "idx")
    assert((l1, d1) == (5L, 0L), "first sync loads every parent")
    // read-back through the contract reproduces the corpus
    val back = SearchRead.read(spark, f, "idx", SearchQuery.MatchAll,
      reconstruct = true, pageSize = 3, sliceTarget = 2).takeAll()
    assert(back.map(_.docId).sorted == (0 until 5).map(i => s"doc$i"))
    assert(back.forall(_.elements.size == 2))
    val (l2, d2) = SearchSync.sync(docs, f, "idx")
    assert((l2, d2) == (0L, 0L), "unchanged source is a no-op")
  }

  test("sync diff isolates changed, added and departed parents") {
    val ns = freshNs("sync2")
    val f = FakeSearchClientFactory(ns)
    SearchSync.sync(DocSet.of(spark, corpus(4)).explode(), f, "idx")
    // doc0 changes text, doc3 departs, doc9 arrives; doc1/doc2 untouched
    val v2 = corpus(3).map { d =>
      if (d.docId == "doc0") d.withText("parent 0 EDITED") else d
    } :+ Document.of("doc9", text = "brand new", docType = "pdf",
      elements = Seq(graft.model.Element.text(0, "para", "fresh")))
    val next = DocSet.of(spark, v2).explode()
    val plan = SearchSync.diff(next, f, "idx").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan == Map("doc0" -> "load", "doc9" -> "load", "doc3" -> "delete"))
    val (l, d) = SearchSync.sync(next, f, "idx")
    assert((l, d) == (2L, 1L))
    val back = SearchRead.read(spark, f, "idx", SearchQuery.MatchAll,
      reconstruct = true).takeAll()
    val byId = back.map(x => x.docId -> x).toMap
    assert(byId.keySet == Set("doc0", "doc1", "doc2", "doc9"))
    assert(byId("doc0").textRepresentation.contains("parent 0 EDITED"))
    assert(byId("doc0").elements.size == 2, "reload replaced, not duplicated")
    assert(byId("doc9").elements.map(_.text) == Seq("fresh"))
    // a third sync with the same source is again a no-op
    assert(SearchSync.sync(next, f, "idx") == ((0L, 0L)))
  }

  test("sync detects element-level drift inside an unchanged parent") {
    val ns = freshNs("sync3")
    val f = FakeSearchClientFactory(ns)
    val v1 = corpus(3)
    SearchSync.sync(DocSet.of(spark, v1).explode(), f, "idx")
    // same parent text, one element body edited -> signature drifts
    val v2 = v1.map { d =>
      if (d.docId == "doc1")
        d.copy(elements = d.elements.updated(1,
          graft.model.Element.text(1, "para", "REWRITTEN")))
      else d
    }
    val plan = SearchSync.diff(DocSet.of(spark, v2).explode(), f, "idx").collect()
    assert(plan.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("doc1", "load")))
  }
}

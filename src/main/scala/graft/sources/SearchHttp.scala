package graft.sources

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * The HTTP half of the search-index connector: [[HttpSearchClient]] is a
 * REAL wire-protocol implementation of [[SearchClient]] over the JDK's
 * `java.net.http` (no extra dependency), speaking the OpenSearch REST
 * surface the reference's reader/writer use — `_count`, `_search` with
 * PIT + `slice` + `from`/`size` + `sort:_id`, `_search/point_in_time`,
 * scroll open/continue/clear, `knn`, `_bulk` NDJSON, and
 * `_delete_by_query` over parent keys (reference
 * opensearch_reader.py:100-118,:446-500,:668-740; sync writer step 6).
 *
 * Because this build is offline, the wire tests run against
 * [[LocalSearchServer]] — a loopback `com.sun.net.httpserver` façade that
 * translates the same REST surface onto the deterministic
 * [[FakeSearch.Client]], so every protocol semantic (PIT isolation,
 * hash-slice disjointness, page determinism, scroll lifecycle) inherits
 * the contract the fake already pins, and the spec asserts client-over-
 * HTTP == fake-direct on identical scenarios. Against a real OpenSearch
 * the client is the same bytes minus the loopback address; `auth` adds
 * Basic credentials (TLS termination is the JDK client's own).
 *
 * JSON ⇄ model translation lives in [[SearchWire]] and is shared by both
 * ends (round-trip pinned by unit), so the client and the test server
 * cannot drift apart silently.
 */
object SearchWire {
  val om = new ObjectMapper()

  def queryJson(q: SearchQuery): ObjectNode = {
    val n = om.createObjectNode()
    q match {
      case SearchQuery.MatchAll =>
        n.putObject("match_all")
      case SearchQuery.Term(f, v) =>
        n.putObject("term").putObject(f).put("value", v)
      case SearchQuery.Terms(f, vs) =>
        val arr = n.putObject("terms").putArray(f)
        vs.foreach(arr.add)
      case SearchQuery.Match(f, text) =>
        n.putObject("match").put(f, text)
      case SearchQuery.Bool(must, filter, mustNot) =>
        val b = n.putObject("bool")
        def put(name: String, qs: Seq[SearchQuery]): Unit =
          if (qs.nonEmpty) { val a = b.putArray(name); qs.foreach(q => a.add(queryJson(q))) }
        put("must", must); put("filter", filter); put("must_not", mustNot)
      case SearchQuery.Knn(vec, k, filter) =>
        val e = n.putObject("knn").putObject("embedding")
        val arr = e.putArray("vector")
        vec.foreach(arr.add)
        e.put("k", k)
        filter.foreach(f => e.set[JsonNode]("filter", queryJson(f)))
    }
    n
  }

  def parseQuery(n: JsonNode): SearchQuery =
    if (n.has("match_all")) SearchQuery.MatchAll
    else if (n.has("term")) {
      val (f, body) = firstField(n.get("term"))
      SearchQuery.Term(f, body.get("value").asText())
    } else if (n.has("terms")) {
      val (f, body) = firstField(n.get("terms"))
      SearchQuery.Terms(f, body.elements().asScala.map(_.asText()).toSeq)
    } else if (n.has("match")) {
      val (f, body) = firstField(n.get("match"))
      SearchQuery.Match(f, body.asText())
    } else if (n.has("bool")) {
      val b = n.get("bool")
      def list(name: String): Seq[SearchQuery] =
        if (b.has(name)) b.get(name).elements().asScala.map(parseQuery).toSeq else Nil
      SearchQuery.Bool(list("must"), list("filter"), list("must_not"))
    } else if (n.has("knn")) {
      val e = n.get("knn").get("embedding")
      SearchQuery.Knn(
        e.get("vector").elements().asScala.map(_.floatValue()).toArray,
        e.get("k").asInt(),
        if (e.has("filter")) Some(parseQuery(e.get("filter"))) else None)
    } else throw new IllegalArgumentException(s"unsupported query: $n")

  private def firstField(n: JsonNode): (String, JsonNode) = {
    val f = n.properties().iterator().next()
    (f.getKey, f.getValue)
  }

  /** `_source` of a hit on the wire: dotted `properties.*` keys NEST into
    * a `properties` object — the shape [[DocWrite.opensearchBulk]] writes
    * and a real backend stores (a dot in a field NAME is a path on
    * indexing) — other fields ride top-level, plus the embedding array
    * (the one reserved field name). */
  def sourceJson(h: SearchHit): ObjectNode = {
    val s = om.createObjectNode()
    val (nested, flat) = h.source.partition(_._1.startsWith("properties."))
    flat.foreach { case (k, v) => s.put(k, v) }
    if (nested.nonEmpty) {
      val p = s.putObject("properties")
      nested.foreach { case (k, v) => p.put(k.stripPrefix("properties."), v) }
    }
    h.embedding.foreach { e => val a = s.putArray("embedding"); e.foreach(a.add) }
    s
  }

  /** Inverse of [[sourceJson]]: nested objects flatten one level into
    * dotted keys (so a real backend's nested `properties` comes back as
    * the flat `properties.*` map the Document model uses — asText() on a
    * container would silently yield ""); deeper containers are skipped,
    * like BulkDirSearchClientFactory's NDJSON ingest. */
  def parseSource(id: String, score: Double, s: JsonNode): SearchHit = {
    val fields = scala.collection.mutable.Map.empty[String, String]
    var emb: Option[Array[Float]] = None
    s.properties().asScala.foreach { f =>
      f.getValue match {
        case v if f.getKey == "embedding" && v.isArray =>
          emb = Some(v.elements().asScala.map(_.floatValue()).toArray)
        case v if v.isObject =>
          v.properties().asScala.foreach { sub =>
            if (!sub.getValue.isNull && !sub.getValue.isContainerNode)
              fields(s"${f.getKey}.${sub.getKey}") = sub.getValue.asText()
          }
        case v if v.isContainerNode => () // non-embedding arrays: skipped
        case v if !v.isNull =>
          fields(f.getKey) = v.asText()
      }
    }
    SearchHit(id, score, fields.toMap, emb)
  }

  def hitJson(h: SearchHit): ObjectNode = {
    val n = om.createObjectNode()
    n.put("_id", h.id).put("_score", h.score)
    n.set[JsonNode]("_source", sourceJson(h))
    n
  }

  def parseHit(n: JsonNode): SearchHit =
    parseSource(n.get("_id").asText(), n.get("_score").asDouble(), n.get("_source"))

  def hitsResponse(hits: Seq[SearchHit], scrollId: Option[String] = None): ObjectNode = {
    val n = om.createObjectNode()
    scrollId.foreach(n.put("_scroll_id", _))
    val h = n.putObject("hits")
    h.putObject("total").put("value", hits.size).put("relation", "eq")
    val arr = h.putArray("hits")
    hits.foreach(x => arr.add(hitJson(x)))
    n
  }

  def parseHits(n: JsonNode): Seq[SearchHit] =
    n.get("hits").get("hits").elements().asScala.map(parseHit).toSeq
}

/** Wire-protocol [[SearchClient]] over `java.net.http`. One instance per
  * task (the factory contract); the underlying JDK client pools
  * connections per instance. */
final class HttpSearchClient(baseUri: String,
                             auth: Option[(String, String)] = None)
    extends SearchClient {
  import SearchWire.om

  private val http = HttpClient.newHttpClient()

  private def req(method: String, path: String,
                  body: Option[String]): HttpRequest = {
    val b = HttpRequest.newBuilder(java.net.URI.create(s"$baseUri$path"))
      .header("Content-Type", "application/json")
    auth.foreach { case (u, p) =>
      val tok = java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8"))
      b.header("Authorization", s"Basic $tok")
    }
    b.method(method, body.map(HttpRequest.BodyPublishers.ofString(_))
      .getOrElse(HttpRequest.BodyPublishers.noBody())).build()
  }

  private def send(method: String, path: String, body: Option[String] = None,
                   okStatuses: Set[Int] = Set(200)): (Int, String) = {
    val resp = http.send(req(method, path, body),
      HttpResponse.BodyHandlers.ofString())
    if (!okStatuses(resp.statusCode()))
      throw new java.io.IOException(
        s"$method $path -> ${resp.statusCode()}: ${resp.body().take(500)}")
    (resp.statusCode(), resp.body())
  }

  override def indexExists(index: String): Boolean =
    send("HEAD", s"/$index", None, Set(200, 404))._1 == 200

  override def count(index: String, query: SearchQuery,
                     pit: Option[String]): Long = {
    // _count has no pit parameter on the wire; a pinned count is a size-0
    // search under the pit with track_total_hits (reference counts live)
    pit match {
      case None =>
        val body = om.createObjectNode()
        body.set[JsonNode]("query", SearchWire.queryJson(query))
        val (_, resp) = send("POST", s"/$index/_count", Some(body.toString))
        om.readTree(resp).get("count").asLong()
      case Some(p) =>
        val body = om.createObjectNode()
        body.set[JsonNode]("query", SearchWire.queryJson(query))
        // keep_alive on every request extends the snapshot (a fixed
        // create-time TTL would lose a >10-minute sliced read mid-flight)
        body.putObject("pit").put("id", p).put("keep_alive", "10m")
        body.put("from", 0).put("size", 0).put("track_total_hits", true)
        val (_, resp) = send("POST", "/_search", Some(body.toString))
        om.readTree(resp).get("hits").get("total").get("value").asLong()
    }
  }

  override def createPit(index: String): String = {
    val (_, resp) =
      send("POST", s"/$index/_search/point_in_time?keep_alive=10m", None)
    om.readTree(resp).get("pit_id").asText()
  }

  override def deletePit(pitId: String): Unit = {
    val body = om.createObjectNode()
    body.putArray("pit_id").add(pitId)
    send("DELETE", "/_search/point_in_time", Some(body.toString))
    ()
  }

  override def searchPage(index: String, query: SearchQuery,
                          slice: Option[SearchSlice], pit: Option[String],
                          from: Int, size: Int,
                          fields: Option[Seq[String]] = None): Seq[SearchHit] = {
    val body = om.createObjectNode()
    body.set[JsonNode]("query", SearchWire.queryJson(query))
    body.put("from", from).put("size", size)
    body.putArray("sort").addObject().put("_id", "asc")
    slice.foreach(s => body.putObject("slice").put("id", s.sliceId).put("max", s.max))
    // per-request keep_alive extends the PIT across long sliced reads
    pit.foreach(p => body.putObject("pit").put("id", p).put("keep_alive", "10m"))
    // server-side _source filtering: the list-don't-read economy
    fields.foreach { fs =>
      val a = body.putArray("_source")
      fs.foreach(a.add)
    }
    // with a pit the index is implied by the snapshot (OpenSearch rule)
    val path = pit.map(_ => "/_search").getOrElse(s"/$index/_search")
    val (_, resp) = send("POST", path, Some(body.toString))
    SearchWire.parseHits(om.readTree(resp))
  }

  override def openScroll(index: String, query: SearchQuery,
                          size: Int): (String, Seq[SearchHit]) = {
    val body = om.createObjectNode()
    body.set[JsonNode]("query", SearchWire.queryJson(query))
    body.put("size", size)
    body.putArray("sort").addObject().put("_id", "asc")
    val (_, resp) = send("POST", s"/$index/_search?scroll=10m", Some(body.toString))
    val n = om.readTree(resp)
    (n.get("_scroll_id").asText(), SearchWire.parseHits(n))
  }

  /** ES/OpenSearch rotate `_scroll_id` between pages and the wire contract
    * says "always use the most recent id" — but the SearchClient trait keys
    * a cursor by its OPEN id, so track the latest id per open cursor and
    * translate on each call (a stale id is SearchContextMissing or silent
    * truncation on a real backend). */
  private val scrollLatest =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def scroll(scrollId: String): Seq[SearchHit] = {
    val actual = Option(scrollLatest.get(scrollId)).getOrElse(scrollId)
    val body = om.createObjectNode()
    body.put("scroll", "10m").put("scroll_id", actual)
    val (_, resp) = send("POST", "/_search/scroll", Some(body.toString))
    val n = om.readTree(resp)
    Option(n.get("_scroll_id")).filter(!_.isNull)
      .foreach(s => scrollLatest.put(scrollId, s.asText()))
    SearchWire.parseHits(n)
  }

  override def clearScroll(scrollId: String): Unit = {
    val actual = Option(scrollLatest.remove(scrollId)).getOrElse(scrollId)
    val body = om.createObjectNode()
    body.putArray("scroll_id").add(actual)
    send("DELETE", "/_search/scroll", Some(body.toString))
    ()
  }

  override def knn(index: String, q: SearchQuery.Knn): Seq[SearchHit] = {
    val body = om.createObjectNode()
    body.put("size", q.k)
    body.set[JsonNode]("query", SearchWire.queryJson(q))
    val (_, resp) = send("POST", s"/$index/_search", Some(body.toString))
    SearchWire.parseHits(om.readTree(resp))
  }

  override def bulkIndex(index: String, hits: Seq[SearchHit]): Unit = {
    val sb = new StringBuilder
    hits.foreach { h =>
      val action = om.createObjectNode()
      action.putObject("index").put("_index", index).put("_id", h.id)
      sb.append(action.toString).append('\n')
      sb.append(SearchWire.sourceJson(h).toString).append('\n')
    }
    val (_, resp) = send("POST", "/_bulk", Some(sb.toString))
    val n = om.readTree(resp)
    require(!n.path("errors").asBoolean(false), s"bulk errors: ${resp.take(500)}")
  }

  override def deleteByParent(index: String, parentKeys: Seq[String]): Unit = {
    val body = om.createObjectNode()
    val should = body.putObject("query").putObject("bool").putArray("should")
    val t1 = should.addObject().putObject("terms").putArray("parent_id")
    parentKeys.foreach(t1.add)
    val t2 = should.addObject().putObject("terms").putArray("_id")
    parentKeys.foreach(t2.add)
    send("POST", s"/$index/_delete_by_query", Some(body.toString))
    ()
  }

  override def close(): Unit = () // JDK HttpClient has no close in 17
}

/** Factory carrying connection config to executor tasks. */
final case class HttpSearchClientFactory(baseUri: String,
                                         auth: Option[(String, String)] = None)
    extends SearchClientFactory {
  override def open(): SearchClient = new HttpSearchClient(baseUri, auth)
}

/**
 * Loopback OpenSearch-wire façade over [[FakeSearch.Client]] (JDK
 * `com.sun.net.httpserver`, port 0 = ephemeral): the offline test double
 * for [[HttpSearchClient]]. Every semantic — PIT isolation, slice
 * disjointness+completeness, page and scroll determinism — is delegated
 * to the fake, which the contract spec already pins; this class only
 * translates bytes. Thread pool sized for local[32] task fan-in.
 */
final class LocalSearchServer(namespace: String,
                              requiredAuth: Option[(String, String)] = None)
    extends AutoCloseable {
  import SearchWire.om

  private val fake = new FakeSearch.Client(namespace)
  private val expectedAuthHeader = requiredAuth.map { case (u, p) =>
    "Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$u:$p".getBytes("UTF-8"))
  }
  private val pitIndex = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // rotated single-use scroll tokens -> the fake's stable cursor id
  private val scrollTokens = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val scrollSeq = new java.util.concurrent.atomic.AtomicLong()
  private val server =
    com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)
  server.createContext("/", (exchange: com.sun.net.httpserver.HttpExchange) => {
    val out: (Int, String) =
      try route(exchange)
      catch {
        case e: Exception =>
          (400, om.createObjectNode().put("error", String.valueOf(e.getMessage)).toString)
      }
    val bytes = out._2.getBytes("UTF-8")
    exchange.getResponseHeaders.add("Content-Type", "application/json")
    // HEAD responses must not carry a body
    if (exchange.getRequestMethod == "HEAD") exchange.sendResponseHeaders(out._1, -1)
    else { exchange.sendResponseHeaders(out._1, bytes.length); exchange.getResponseBody.write(bytes) }
    exchange.close()
  })
  server.start()

  def baseUri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def route(ex: com.sun.net.httpserver.HttpExchange): (Int, String) = {
    expectedAuthHeader.foreach { want =>
      val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!got.contains(want))
        return (401, """{"error":"unauthorized"}""")
    }
    val method = ex.getRequestMethod
    val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    val params = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    def json = om.readTree(body)
    (method, segs) match {
      case ("HEAD", index :: Nil) =>
        (if (fake.indexExists(index)) 200 else 404, "")
      case ("POST", index :: "_count" :: Nil) =>
        val q = SearchWire.parseQuery(json.get("query"))
        (200, om.createObjectNode().put("count", fake.count(index, q, None)).toString)
      case ("POST", index :: "_search" :: "point_in_time" :: Nil) =>
        val id = fake.createPit(index)
        pitIndex.put(id, index)
        (200, om.createObjectNode().put("pit_id", id).toString)
      case ("DELETE", "_search" :: "point_in_time" :: Nil) =>
        json.get("pit_id").elements().asScala.foreach { p =>
          fake.deletePit(p.asText()); pitIndex.remove(p.asText())
        }
        (200, """{"succeeded":true}""")
      case ("POST", "_search" :: "scroll" :: Nil) =>
        // ROTATED single-use ids, like a real backend (the wire contract:
        // "the _scroll_id may change between requests; always use the most
        // recent"): the presented token is consumed and a fresh one issued
        // per page, so a client that re-sends a stale id fails HERE in the
        // loopback tests instead of against production ES/OpenSearch
        val presented = json.get("scroll_id").asText()
        Option(scrollTokens.remove(presented)) match {
          case None =>
            (404, om.createObjectNode()
              .put("error", s"search context missing (stale scroll id)").toString)
          case Some(sid) =>
            // per-connection mutable state in the fake; serialize under
            // the pooled executor
            val hits = fake.synchronized(fake.scroll(sid))
            val next = s"$sid#${scrollSeq.incrementAndGet()}"
            scrollTokens.put(next, sid)
            (200, SearchWire.hitsResponse(hits, Some(next)).toString)
        }
      case ("DELETE", "_search" :: "scroll" :: Nil) =>
        json.get("scroll_id").elements().asScala.foreach { s =>
          val sid = Option(scrollTokens.remove(s.asText())).getOrElse(s.asText())
          fake.synchronized(fake.clearScroll(sid))
        }
        (200, """{"succeeded":true}""")
      case ("POST", "_bulk" :: Nil) =>
        val lines = body.split("\n").filter(_.trim.nonEmpty)
        val byIndex = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.ArrayBuffer[SearchHit]]
        lines.grouped(2).foreach { pair =>
          val action = om.readTree(pair(0)).get("index")
          val hit = SearchWire.parseSource(action.get("_id").asText(), 0.0,
            om.readTree(pair(1)))
          byIndex.getOrElseUpdate(action.get("_index").asText(),
            scala.collection.mutable.ArrayBuffer.empty) += hit
        }
        byIndex.foreach { case (idx, hs) => fake.bulkIndex(idx, hs.toSeq) }
        (200, """{"errors":false}""")
      case ("POST", index :: "_delete_by_query" :: Nil) =>
        // both terms arms carry the same parent key list (client shape)
        val keys = json.get("query").get("bool").get("should").get(0)
          .get("terms").get("parent_id").elements().asScala.map(_.asText()).toSeq
        fake.deleteByParent(index, keys)
        (200, """{"deleted":-1}""")
      case ("POST", "_search" :: Nil) =>
        // pit search: index implied by the snapshot id
        val pit = json.get("pit").get("id").asText()
        val index = Option(pitIndex.get(pit))
          .getOrElse(throw new IllegalArgumentException(s"unknown pit: $pit"))
        if (json.path("size").asInt(-1) == 0) {
          val n = SearchWire.hitsResponse(Nil)
          n.get("hits").asInstanceOf[ObjectNode].putObject("total")
            .put("value", fake.count(index,
              SearchWire.parseQuery(json.get("query")), Some(pit)))
            .put("relation", "eq")
          (200, n.toString)
        } else (200, pagedSearch(index, json, Some(pit)).toString)
      case ("POST", index :: "_search" :: Nil) =>
        val q = SearchWire.parseQuery(json.get("query"))
        q match {
          case k: SearchQuery.Knn =>
            (200, SearchWire.hitsResponse(fake.knn(index, k)).toString)
          case _ if params.contains("scroll=") =>
            val (sid, hits) =
              fake.synchronized(fake.openScroll(index, q, json.get("size").asInt()))
            val token = s"$sid#${scrollSeq.incrementAndGet()}"
            scrollTokens.put(token, sid)
            (200, SearchWire.hitsResponse(hits, Some(token)).toString)
          case _ =>
            (200, pagedSearch(index, json, None).toString)
        }
      case other =>
        (404, om.createObjectNode().put("error", s"no route: $other").toString)
    }
  }

  private def pagedSearch(index: String, json: JsonNode,
                          pit: Option[String]): ObjectNode = {
    val q = SearchWire.parseQuery(json.get("query"))
    val slice =
      if (json.has("slice"))
        Some(SearchSlice(json.get("slice").get("id").asInt(),
          json.get("slice").get("max").asInt()))
      else None
    val fields =
      if (json.has("_source") && json.get("_source").isArray)
        Some(json.get("_source").elements().asScala.map(_.asText()).toSeq)
      else None
    val hits = fake.searchPage(index, q, slice, pit,
      json.path("from").asInt(0), json.path("size").asInt(10), fields)
    SearchWire.hitsResponse(hits)
  }

  override def close(): Unit = {
    server.stop(0)
    // stop(0) does not shut down a user-supplied executor: without this,
    // every server instance leaks 8 non-daemon pool threads
    pool.shutdown()
    fake.close()
  }
}

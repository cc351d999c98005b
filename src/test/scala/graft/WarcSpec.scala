package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC ingest: record parse, HTTP body extraction, gzip members,
  * truncation tolerance, and the file->DocSet->partition pipeline. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private val CRLF = "\r\n"

  private def record(tpe: String, uri: String, payload: Array[Byte],
                     extra: Map[String, String] = Map.empty): Array[Byte] = {
    val headers = Map(
      "WARC-Type" -> tpe,
      "WARC-Record-ID" -> s"<urn:uuid:$tpe-${uri.hashCode}>",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Length" -> payload.length.toString) ++ extra
    val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" }.toSeq)
      .mkString("", CRLF, CRLF + CRLF)
    head.getBytes("ISO-8859-1") ++ payload ++ (CRLF + CRLF).getBytes("ISO-8859-1")
  }

  private def httpResponse(body: String, ct: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK${CRLF}Content-Type: $ct$CRLF" +
      s"Content-Length: ${body.getBytes("UTF-8").length}$CRLF$CRLF").getBytes("ISO-8859-1") ++
      body.getBytes("UTF-8")

  private val html = "<html><body><p>Hello crawl world today.</p></body></html>"
  private def warcBytes: Array[Byte] =
    record("warcinfo", "", "software: test".getBytes("UTF-8")) ++
      record("request", "http://example.org/a", "GET /a HTTP/1.1".getBytes("UTF-8")) ++
      record("response", "http://example.org/a", httpResponse(html)) ++
      record("conversion", "http://example.org/b",
        "plain extracted text here".getBytes("UTF-8"),
        Map("Content-Type" -> "text/plain"))

  test("records parses all record types; response/conversion carry payloads") {
    val rs = Warc.records(warcBytes)
    assert(rs.map(_.warcType) == Seq("warcinfo", "request", "response", "conversion"))
    val resp = rs(2)
    assert(resp.targetUri == "http://example.org/a")
    val (body, ct) = Warc.httpBody(resp.payload)
    assert(new String(body, "UTF-8") == html)
    assert(ct.contains("text/html"))
  }

  test("gzip multi-member input inflates transparently; truncation is non-fatal") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // per-record members, concatenated — the Common Crawl layout
    val members = Warc.records(warcBytes) // sanity: plain parse first
    assert(members.size == 4)
    val gzAll = gz(warcBytes)
    assert(Warc.records(gzAll).map(_.warcType) == members.map(_.warcType))
    val twoMembers = gz(record("conversion", "u1", "a".getBytes)) ++
      gz(record("conversion", "u2", "b".getBytes))
    assert(Warc.records(twoMembers).size == 2)
    // truncated mid-payload: complete prefix survives
    val truncated = warcBytes.dropRight(60)
    val rs = Warc.records(truncated)
    assert(rs.nonEmpty && rs.size < 4)
  }

  test("end-to-end crawl curation: WARC -> partition -> boilerplate -> filters") {
    import org.apache.spark.sql.functions._
    import graft.functions.gf
    import graft.operators.{Boilerplate, HtmlPartitioner}
    // a crawl page with nav chrome + real prose, plus a spam page
    val paragraphs = Seq(
      "The quick brown fox jumps over the lazy dog near the river bank. " +
        "It was a calm morning and all of the animals were out in the field together.",
      "Later that evening the whole group walked back to the farm for a meal. " +
        "A cool wind moved through the tall grass while the light slowly faded away.",
      "By the next spring most of them had traveled far beyond the old stone bridge. " +
        "Each one carried a small story home about the long winter and the frozen lake.")
    val page =
      "<html><body><p><a href='/'>Home</a> <a href='/n'>News</a> <a href='/s'>Shop</a></p>" +
        paragraphs.map(p => s"<p>$p</p>").mkString +
        "<p><a href='/t'>Terms</a> <a href='/c'>Cookies</a></p></body></html>"
    val spam = "<html><body><p>" + ("buy now click here " * 30) + "</p></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("warc_e2e").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "c.warc").toPath,
        record("response", "http://good.example.co.uk/story", httpResponse(page)) ++
          record("response", "http://spam.example.com/x", httpResponse(spam)))
      val curated = Warc.read(spark, dir.getAbsolutePath)
        .partition(new HtmlPartitioner(trackLinks = true))
        .map(Boilerplate.drop(_))
        .toDF
        .select(
          element_at(col("properties"), "url").as("url"),
          concat_ws("\n", transform(col("elements"),
            e => e.getField("textRepresentation"))).as("text"))
        .select(col("url"), gf.fixMojibakeFixpoint(col("text")).as("text"))
        .select(col("url"),
          gf.urlHost(col("url")).as("host"),
          gf.gopherKeep(col("text")).as("gopher_ok"),
          gf.repetitionKeepText(col("text")).as("rep_ok"))
        .collect().map(r => r.getString(0) -> r).toMap
      val good = curated("http://good.example.co.uk/story")
      assert(good.getAs[String]("host") == "good.example.co.uk")
      assert(good.getAs[Boolean]("gopher_ok"), "boilerplate-stripped prose passes Gopher")
      assert(good.getAs[Boolean]("rep_ok"), "prose passes A1.2")
      val bad = curated("http://spam.example.com/x")
      assert(!bad.getAs[Boolean]("rep_ok"), "repeated-phrase spam fails A1.2")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("read() yields response/conversion Documents that partition downstream") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "crawl-00000.warc").toPath, warcBytes)
      val docs = Warc.read(spark, dir.getAbsolutePath).takeAll().sortBy(_.docId)
      assert(docs.length == 2, "only response + conversion become documents")
      val byType = docs.map(d => d.prop("warc_type").get -> d).toMap
      val resp = byType("response")
      assert(resp.docType.contains("html"))
      assert(resp.prop("url").contains("http://example.org/a"))
      assert(new String(resp.binaryRepresentation.get, "UTF-8") == html)
      val conv = byType("conversion")
      assert(new String(conv.binaryRepresentation.get, "UTF-8")
        == "plain extracted text here")
      // the crawl front door: WARC -> partitionAuto -> elements
      val parted = Warc.read(spark, dir.getAbsolutePath).partitionAuto().takeAll()
        .map(d => d.prop("warc_type").get -> d.elements.map(_.text)).toMap
      assert(parted("response") == Seq("Hello crawl world today."))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}

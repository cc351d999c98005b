package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.docset.DocSet
import graft.llm._
import graft.model.{Document, Element}
import graft.operators.{LlmElementTextSummarizer, MultiStepDocumentSummarizer, OneStepDocumentSummarizer}

/** Schema/property extraction + summarizer tests (mirrors reference
  * tests/unit/transforms/test_extract_schema.py and test_summarize.py,
  * with deterministic offline fakes). */
class ExtractSummarizeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private val extractorClient = new FakeJsonExtractorClient(Map(
    "first_word" -> (t => JString(t.trim.split("\\s+").headOption.getOrElse(""))),
    "word_count" -> (t => JInt(t.trim.split("\\s+").count(_.nonEmpty))),
    "mentions_spark" -> (t => JBool(t.contains("spark")))))

  private val schema = GSchema(Seq(
    GSchemaField("first_word", "string", validators = Seq(RegexValidator("[a-z]+"))),
    GSchemaField("word_count", "int", validators = Seq(BoundsValidator(1, 100000))),
    GSchemaField("mentions_spark", "bool")))

  test("LlmPropertyExtractor populates typed, validated properties") {
    val docs = DocSet.of(spark, Seq(
      Document.of("d1", text = "spark joins are fast"),
      Document.of("d2", text = "   plain text here"),
      Document.of("d3", text = "")))
    val out = docs.extractProperties(new LlmPropertyExtractor(extractorClient, "entity", Some(schema)))
      .takeAll().sortBy(_.docId)
    val d1 = out(0)
    assert(d1.prop("entity.first_word").contains("spark"))
    assert(d1.prop("entity.word_count").contains("4"))
    assert(d1.prop("entity.mentions_spark").contains("true"))
    val d2 = out(1)
    assert(d2.prop("entity.first_word").contains("plain"))
    assert(d2.prop("entity.mentions_spark").contains("false"))
    // empty text: "" fails the regex validator, 0 fails bounds -> absent
    val d3 = out(2)
    assert(d3.prop("entity.first_word").isEmpty)
    assert(d3.prop("entity.word_count").isEmpty)
  }

  test("validator failure falls back to default after retry budget") {
    val neverValid = GSchema(Seq(
      GSchemaField("first_word", "string", default = Some("unknown"),
        validators = Seq(RegexValidator("[0-9]+", nRetries = 2)))))
    val docs = DocSet.of(spark, Seq(Document.of("d1", text = "alpha beta")))
    val out = docs.extractProperties(
      new LlmPropertyExtractor(extractorClient, "entity", Some(neverValid))).takeAll()
    assert(out.head.prop("entity.first_word").contains("unknown"))
  }

  test("LlmSchemaExtractor stores a parsed schema; extractProperties consumes it") {
    val schemaClient = new LlmClient {
      def generate(p: String): String =
        """Sure! {"first_word": {"type": "string"}, "word_count": {"type": "int"}}"""
    }
    val docs = DocSet.of(spark, Seq(Document.of("d1", text = "hello world")))
      .extractSchema(new LlmSchemaExtractor(schemaClient, "Doc"))
    val d = docs.takeAll().head
    assert(d.prop("_schema_class").contains("Doc"))
    assert(d.prop("_schema").exists(_.contains("first_word")))
    // schema-less extractor picks up the per-doc _schema
    val out = DocSet.of(spark, Seq(d))
      .extractProperties(new LlmPropertyExtractor(extractorClient, "entity", None))
      .takeAll().head
    assert(out.prop("entity.first_word").contains("hello"))
    assert(out.prop("entity.word_count").contains("2"))
  }

  test("extractBatchSchema broadcasts one schema to all docs") {
    val schemaClient = new LlmClient {
      def generate(p: String): String = """{"lang": {"type": "string"}}"""
    }
    val docs = DocSet.of(spark, (0 until 5).map(i => Document.of(s"d$i", text = s"t$i")))
      .extractBatchSchema(schemaClient, "Corpus")
    val schemas = docs.takeAll().flatMap(_.prop("_schema")).distinct
    assert(schemas == Seq("""{"lang":{"type":"string"}}"""))
  }

  private def elemDoc(n: Int): Document =
    Document.of("d1", text = "whole").copy(elements =
      (0 until n).map(i => Element.text(i, "Text", s"element number $i content")))

  test("OneStepDocumentSummarizer: one call, even element budget") {
    var calls = 0
    val counting = new LlmClient {
      def generate(p: String): String = { calls += 1; s"summary of ${p.length} chars" }
    }
    val out = new OneStepDocumentSummarizer(counting, "what?", tokenLimit = 200)
      .summarize(elemDoc(10))
    assert(calls == 1)
    assert(out.prop("summary").exists(_.startsWith("summary of")))
  }

  test("MultiStepDocumentSummarizer folds a tree down to one summary") {
    val prompts = scala.collection.mutable.ListBuffer[String]()
    val client = new LlmClient {
      def generate(p: String): String = { prompts += p; s"S(${p.length})" }
    }
    val out = new MultiStepDocumentSummarizer(client, tokenLimit = 100)
      .summarize(elemDoc(20))
    assert(out.prop("summary").isDefined)
    assert(prompts.size > 2, "should take multiple batched calls across rounds")
    // deterministic: re-running produces the identical summary
    val again = new MultiStepDocumentSummarizer(new LlmClient {
      def generate(p: String): String = s"S(${p.length})"
    }, tokenLimit = 100).summarize(elemDoc(20))
    assert(again.prop("summary") == out.prop("summary"))
  }

  test("MultiStepDocumentSummarizer terminates when summaries exceed the budget") {
    // every summary is longer than tokenLimit -> rounds cannot shrink the
    // level; the summarizer must force a final truncated call, not loop
    val verbose = new LlmClient {
      def generate(p: String): String = "x" * 500
    }
    val out = new MultiStepDocumentSummarizer(verbose, tokenLimit = 100)
      .summarize(elemDoc(6))
    assert(out.prop("summary").exists(_.nonEmpty))
  }

  test("LlmElementTextSummarizer summarizes matching elements only") {
    val client = new FakeLlmClient("echo:20")
    val doc = Document.of("d1").copy(elements = Seq(
      Element.text(0, "Title", "heading text"),
      Element.text(1, "NarrativeText", "body text")))
    val out = new LlmElementTextSummarizer(client, _.elementType == "NarrativeText")
      .summarize(doc)
    assert(out.elements(0).prop("summary").isEmpty)
    assert(out.elements(1).prop("summary").contains("Summarize: body text"))
  }
}

package graft.llm

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.Document

/**
 * Schema + property extraction: the LLM-ETL verbs that populate typed
 * properties from unstructured text (reference:
 * lib/sycamore/sycamore/transforms/extract_schema.py:105 LLMSchemaExtractor,
 * :186 LLMPropertyExtractor; schema/validator model sycamore/schema.py:32-230).
 *
 * Engine shape: both are per-doc prompt -> LLM -> JSON parse -> type cast ->
 * validate (with bounded retries) — a partition-parallel mapBatch with zero
 * driver state, so the operator scales with the corpus. The LLM client is
 * pluggable; tests and gates use deterministic offline fakes.
 */

/** One declared field (reference: schema.py:32 SchemaField / :145 Property —
  * name, type, default, description, examples, validators). */
final case class GSchemaField(
    name: String,
    fieldType: String, // bool | int | float | string | date | datetime
    description: Option[String] = None,
    default: Option[String] = None,
    examples: Seq[String] = Nil,
    validators: Seq[PropertyValidator] = Nil)

final case class GSchema(fields: Seq[GSchemaField]) {
  /** Rendered for prompts and for serialization into properties._schema. */
  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(fields.map { f =>
    f.name -> JObject(List(
      "type" -> JString(f.fieldType)) ++
      f.description.map(d => "description" -> JString(d)).toList ++
      f.default.map(d => "default" -> JString(d)).toList ++
      (if (f.examples.nonEmpty) List("examples" -> JArray(f.examples.map(JString(_)).toList))
       else Nil))
  }.toList)))
}

object GSchema {
  /** Parse a {"field": {"type": ...}} or {"field": "type"} JSON schema
    * (the two shapes LLMs produce; reference extract_schema.py parse_json). */
  def fromJson(json: String): GSchema = JsonMethods.parse(json) match {
    case JObject(fields) => GSchema(fields.map {
      case (name, JString(t)) => GSchemaField(name, t)
      case (name, o: JObject) =>
        GSchemaField(name,
          (o \ "type") match { case JString(t) => t; case _ => "string" },
          description = (o \ "description") match { case JString(d) => Some(d); case _ => None })
      case (name, _) => GSchemaField(name, "string")
    })
    case other => throw new IllegalArgumentException(s"schema must be a JSON object, got $other")
  }
}

/** Validates an extracted value; failures trigger a bounded re-prompt
  * (reference: schema.py:58 PropertyValidator with n_retries). */
sealed trait PropertyValidator extends Serializable {
  def nRetries: Int
  def constraintString: String
  def validate(value: String): Boolean
}

/** reference: schema.py:81 RegexValidator (full-match semantics). */
final case class RegexValidator(regex: String, nRetries: Int = 0) extends PropertyValidator {
  @transient private lazy val re = regex.r
  def constraintString: String = s"must fully match the regex `$regex`"
  def validate(value: String): Boolean = re.matches(value)
}

/** Numeric-bounds flavor of the reference's BooleanExpValidator
  * (schema.py:109 — arbitrary boolean expressions; inclusive bounds cover
  * the common case without an expression parser). */
final case class BoundsValidator(min: Double, max: Double, nRetries: Int = 0)
    extends PropertyValidator {
  def constraintString: String = s"must be between $min and $max"
  def validate(value: String): Boolean =
    value.toDoubleOption.exists(v => v >= min && v <= max)
}

object SchemaExtraction {
  /** Delimits the document text inside prompts so deterministic fake clients
    * can recover it. */
  val DocStart = "DOCUMENT:\n"
  val DocEnd = "\nEND DOCUMENT"

  def docBlock(d: Document, numElements: Int): String = {
    val body =
      if (d.elements.nonEmpty)
        d.elements.sortBy(_.elementIndex).take(numElements).map(_.text).mkString("\n")
      else d.text
    s"$DocStart$body$DocEnd"
  }

  /** First {...} block in an LLM response -> JObject fields, else empty
    * (reference: utils/extract_json.py tolerance for chatty responses). */
  def extractJsonObject(response: String): Seq[(String, JValue)] = {
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start < 0 || end <= start) Nil
    else JsonMethods.parseOpt(response.substring(start, end + 1)) match {
      case Some(JObject(fields)) => fields
      case _ => Nil
    }
  }

  /** Canonical string form of a parsed + casted value for our flat string
    * property map; None when the value fails to cast to the declared type. */
  def castValue(v: JValue, fieldType: String): Option[String] = {
    val raw: Option[String] = v match {
      case JString(s) => Some(s)
      case JInt(i)    => Some(i.toString)
      case JLong(l)   => Some(l.toString)
      case JDouble(d) => Some(if (d.isWhole) d.toLong.toString else d.toString)
      case JBool(b)   => Some(b.toString)
      case JNull | JNothing => None
      case other => Some(JsonMethods.compact(JsonMethods.render(other)))
    }
    raw.flatMap { s =>
      fieldType match {
        case "int"    => s.toDoubleOption.map(d => math.round(d).toString)
        case "float"  => s.toDoubleOption.map(_.toString)
        case "bool"   => s.toLowerCase match {
          case "true" | "yes" | "1"  => Some("true")
          case "false" | "no" | "0"  => Some("false")
          case _ => None
        }
        case _ => Some(s) // string/date/datetime kept verbatim
      }
    }
  }
}

/**
 * LLM guesses a JSON schema per document -> properties._schema +
 * _schema_class (reference: extract_schema.py:105 LLMSchemaExtractor).
 */
final class LlmSchemaExtractor(client: LlmClient, entityName: String,
                               numElements: Int = 35, maxNumProperties: Int = 7)
    extends Serializable {
  def extract(docs: Iterator[Document]): Iterator[Document] =
    docs.grouped(16).flatMap { batch =>
      val prompts = batch.map { d =>
        s"""Propose a JSON schema (at most $maxNumProperties properties) for the entity
           |"$entityName" described by this document. Respond with one JSON object mapping
           |property names to {"type": ...}.
           |${SchemaExtraction.docBlock(d, numElements)}""".stripMargin
      }
      client.generateBatch(prompts).zip(batch).map { case (resp, d) =>
        val fields = SchemaExtraction.extractJsonObject(resp)
        val schemaJson =
          if (fields.isEmpty) "{}"
          else JsonMethods.compact(JsonMethods.render(JObject(fields.toList)))
        d.withProps("_schema" -> schemaJson, "_schema_class" -> entityName)
      }
    }
}

/**
 * Populate typed properties per a declared (or previously extracted) schema,
 * with validator-driven bounded retries
 * (reference: extract_schema.py:186 LLMPropertyExtractor + cast_types).
 *
 * Output: flat dotted properties `<schemaName>.<field>` (our Document model
 * flattens nested objects to dotted keys). Fields that fail to parse, cast,
 * or validate after the retry budget are left absent.
 */
final class LlmPropertyExtractor(client: LlmClient,
                                 schemaName: String,
                                 schema: Option[GSchema] = None,
                                 numElements: Int = 35)
    extends Serializable {

  def extract(docs: Iterator[Document]): Iterator[Document] = docs.map { d =>
    // a corrupt stored _schema must not kill the task — the reference wraps
    // its parse in try/except and degrades (extract_schema.py:153-156); a
    // doc whose schema can't be parsed just passes through un-extracted
    val stored = d.prop("_schema").flatMap(s =>
      scala.util.Try(GSchema.fromJson(s)).toOption)
    val effective = schema.orElse(stored).getOrElse(GSchema(Nil))
    if (effective.fields.isEmpty) d
    else {
      val block = SchemaExtraction.docBlock(d, numElements)
      val first = ask(block, effective, feedback = None)
      val resolved = effective.fields.flatMap { f =>
        val v0 = first.get(f.name)
        resolveField(block, effective, f, v0).map(v => s"$schemaName.${f.name}" -> v)
      }
      d.copy(properties = d.properties ++ resolved)
    }
  }

  private def ask(block: String, schema: GSchema,
                  feedback: Option[String]): Map[String, String] = {
    val prompt =
      s"""Extract the following properties as one JSON object (use null when absent):
         |${schema.toJson}
         |${feedback.map(f => s"Constraints: $f\n").getOrElse("")}$block""".stripMargin
    val fields = SchemaExtraction.extractJsonObject(client.generate(prompt)).toMap
    schema.fields.flatMap { f =>
      fields.get(f.name).flatMap(v => SchemaExtraction.castValue(v, f.fieldType))
        .map(f.name -> _)
    }.toMap
  }

  /** Apply validators; on failure re-prompt with the constraint up to the
    * validator's retry budget, then fall back to the field default / drop. */
  private def resolveField(block: String, schema: GSchema, f: GSchemaField,
                           initial: Option[String]): Option[String] = {
    def valid(v: String): Boolean = f.validators.forall(_.validate(v))
    initial.filter(valid).orElse {
      val budget = if (f.validators.isEmpty) 0 else f.validators.map(_.nRetries).max
      val constraints = f.validators.map(_.constraintString).mkString("; ")
      Iterator.range(0, budget)
        .map(_ => ask(block, GSchema(Seq(f)), Some(s"${f.name} $constraints")).get(f.name))
        .collectFirst { case Some(v) if valid(v) => v }
        .orElse(f.default)
    }
  }
}

/**
 * Deterministic offline fake for JSON-mode extraction: computes each field
 * as a pure function of the document text recovered from the prompt
 * (between the DocStart/DocEnd markers). Stands in for the model so the
 * prompt->JSON->cast->validate plumbing is testable and DuckDB-oracle-able.
 */
final class FakeJsonExtractorClient(fields: Map[String, String => JValue])
    extends LlmClient {
  override def generate(prompt: String): String = {
    val s = prompt.indexOf(SchemaExtraction.DocStart)
    val e = prompt.lastIndexOf(SchemaExtraction.DocEnd)
    val text =
      if (s < 0 || e <= s) ""
      else prompt.substring(s + SchemaExtraction.DocStart.length, e)
    // answer only the fields the prompt's schema mentions
    val asked = fields.filter { case (name, _) => prompt.contains(s""""$name"""") }
    JsonMethods.compact(JsonMethods.render(
      JObject(asked.map { case (name, fn) => name -> fn(text) }.toList)))
  }
}

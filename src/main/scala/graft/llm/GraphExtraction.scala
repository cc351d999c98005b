package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.docset.DocSet
import graft.operators.DocStructure

/** One extracted graph entity occurrence (reference:
  * transforms/extract_graph_entities.py:22 — entity nodes keyed by a
  * content hash, linked CONTAINS-wise to their section). */
final case class GraphEntity(docId: String, sectionId: String, label: String,
                             entityJson: String, entityHash: String)

/** One extracted relationship between two entities of a section (reference:
  * transforms/extract_graph_relationships.py). */
final case class GraphRelationship(docId: String, sectionId: String, relType: String,
                                   startHash: String, endHash: String)

/**
 * Graph entity/relationship extraction + resolution (reference:
 * transforms/extract_graph_entities.py, extract_graph_relationships.py,
 * resolve_graph_entities.py:149).
 *
 * Spark-first shape: extraction is a flatMap over section summaries emitting
 * ENTITY/RELATIONSHIP ROWS (not nested doc mutations) — graph tables are
 * what a 100 TB graph load wants anyway. Resolution replaces the reference's
 * single EntityResolver actor with a groupBy on (label, canonical JSON):
 * one shuffle, no driver state.
 */
object GraphExtraction {

  private implicit val entityEnc: org.apache.spark.sql.Encoder[GraphEntity] =
    Encoders.product[GraphEntity]
  private implicit val relEnc: org.apache.spark.sql.Encoder[GraphRelationship] =
    Encoders.product[GraphRelationship]

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical compact JSON so hashing is stable across key orders. */
  private def canonical(v: JValue): String = v match {
    case JObject(fields) => JsonMethods.compact(JsonMethods.render(
      JObject(fields.sortBy(_._1))))
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  /** Per-section LLM extraction of typed entities. Prompt carries the
    * section summary between the standard document markers (so deterministic
    * fakes can recover it); response shape {label: [entity, ...]}. */
  def extractEntities(docs: DocSet, client: LlmClient,
                      entityLabels: Seq[String]): DataFrame = {
    val ds = docs.ds.flatMap { d =>
      DocStructure.sections(d).flatMap { section =>
        val prompt =
          s"""Extract entities of types ${entityLabels.mkString(", ")} from the section below.
             |Respond with one JSON object mapping each type to a list of entity objects,
             |e.g. {"${entityLabels.headOption.getOrElse("Entity")}": [{"name": ...}]}.
             |${SchemaExtraction.DocStart}${section.summary}${SchemaExtraction.DocEnd}""".stripMargin
        SchemaExtraction.extractJsonObject(client.generate(prompt)).collect {
          case (label, JArray(entities)) if entityLabels.contains(label) =>
            entities.collect { case o: JObject =>
              val c = canonical(o)
              GraphEntity(d.docId, section.sectionId, label, c, sha(c))
            }
        }.flatten
        // in-section dedup by hash, like the reference's nodes[label][hash]
      }.distinct
    }
    ds.toDF()
  }

  /** Per-section LLM extraction of relationships among that section's
    * entities, referenced by their content hashes. */
  def extractRelationships(docs: DocSet, client: LlmClient,
                           entities: DataFrame, relTypes: Seq[String]): DataFrame = {
    val spark = docs.spark
    // section -> its entities (small per section; collected per partition via join)
    val bySection = entities
      .groupBy(col("docId"), col("sectionId"))
      .agg(collect_list(concat_ws("|", col("entityHash"), col("label"), col("entityJson")))
        .as("ents"))
    val sectionEnts = bySection
      .as[(String, String, Seq[String])](Encoders.product[(String, String, Seq[String])])
      .flatMap { case (docId, sectionId, ents) =>
        if (ents.size < 2) Nil
        else {
          val listing = ents.sorted.map { e =>
            val Array(h, label, json) = e.split("\\|", 3)
            s"$h ($label): $json"
          }.mkString("\n")
          val prompt =
            s"""Identify relationships of types ${relTypes.mkString(", ")} among these entities.
               |Respond with {"relationships": [{"type":..., "start":hash, "end":hash}]}.
               |${SchemaExtraction.DocStart}$listing${SchemaExtraction.DocEnd}""".stripMargin
          // hashes that actually exist in this section; a relationship whose
          // start/end doesn't resolve to an extracted entity is skipped, like
          // the reference's start_exists/end_exists continue
          // (extract_graph_relationships.py:72-80)
          val known = ents.map(_.split("\\|", 3)(0)).toSet
          SchemaExtraction.extractJsonObject(client.generate(prompt)).collectFirst {
            case ("relationships", JArray(rels)) => rels.collect {
              case o: JObject =>
                val t = (o \ "type") match { case JString(s) => s; case _ => "" }
                val s0 = (o \ "start") match { case JString(s) => s; case _ => "" }
                val e0 = (o \ "end") match { case JString(s) => s; case _ => "" }
                GraphRelationship(docId, sectionId, t, s0, e0)
            }.filter(r => relTypes.contains(r.relType) &&
              known.contains(r.startHash) && known.contains(r.endHash))
          }.getOrElse(Nil)
        }
      }
    sectionEnts.toDF()
  }

  /** Cross-document entity resolution: identical (label, canonical JSON)
    * collapse to one canonical entity id (the min hash is its own id — the
    * hash IS content-derived, so resolution is exact-match dedup, matching
    * the reference's default resolver) with occurrence counts retained.
    * One groupBy; scales with distinct entities, not documents. */
  def resolveEntities(entities: DataFrame): DataFrame =
    entities.groupBy(col("label"), col("entityJson"), col("entityHash"))
      .agg(count(lit(1)).as("n_occurrences"),
        sort_array(collect_set(col("sectionId"))).as("sections"))
}

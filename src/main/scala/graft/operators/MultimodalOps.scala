package graft.operators

import graft.llm.LlmClient
import graft.model.{Document, Element, TableCell}

/**
 * Lower-traffic LLM/multimodal operators (reference §2.8):
 *  - summarize_images (transforms/summarize_images.py:184)
 *  - llm_query (transforms/llm_query.py:135)
 *  - extract_table_properties (transforms/extract_table_properties.py:105)
 *
 * All are per-doc maps (partition-parallel, no driver state). Image decode
 * is behind a pluggable trait: the container has no image libraries, so the
 * deterministic stub stands in for the vision model while the Spark-side
 * plumbing (binary column in, caption property out) is real and tested.
 */

/** Pluggable VLM: binary image -> caption (reference: the OpenAI/Bedrock
  * image summarizers behind summarize_images.py). */
trait ImageCaptioner extends Serializable {
  def caption(imageBytes: Array[Byte], context: String): String
}

/** Deterministic offline stand-in: captions from byte-level features only
  * (no decode — the real captioner plugs in the same trait). */
final class FakeImageCaptioner extends ImageCaptioner {
  def caption(imageBytes: Array[Byte], context: String): String = {
    val h = java.lang.Long.toUnsignedString(
      graft.functions.Xx64.hash(imageBytes, 0L), 16)
    s"image<${imageBytes.length}B:$h>"
  }
}

object MultimodalOps {

  /** Caption every image element into its properties.summary
    * (reference: summarize_images.py:184 SummarizeImages — per-element VLM
    * call, optional surrounding-text context). */
  def summarizeImages(d: Document, captioner: ImageCaptioner,
                      includeContext: Boolean = true): Document = {
    val ordered = d.elements.sortBy(_.elementIndex)
    d.copy(elements = ordered.map { e =>
      (e.elementType, e.binaryRepresentation) match {
        case ("Image", Some(bytes)) =>
          val context =
            if (!includeContext) ""
            else ordered.filter(o => math.abs(o.elementIndex - e.elementIndex) == 1)
              .map(_.text).mkString(" ")
          e.withProps("summary" -> captioner.caption(bytes, context))
        case _ => e
      }
    })
  }

  /** Free-form LLM query per document -> properties[outputField]
    * (reference: llm_query.py:135 LLMTextQueryAgent, per-doc flavor). */
  def llmQuery(d: Document, client: LlmClient, prompt: String,
               outputField: String = "llm_response", numElements: Int = 35): Document = {
    // null text (binary-only doc) renders as "" — the PromptTemplate
    // missing-field convention; bare interpolation would inject the
    // LITERAL string "null" into the prompt
    val body =
      if (d.elements.nonEmpty)
        d.elements.sortBy(_.elementIndex).take(numElements)
          .map(e => Option(e.text).getOrElse("")).mkString("\n")
      else Option(d.text).getOrElse("")
    d.withProp(outputField, client.generate(s"$prompt\n$body"))
  }

  /** Per-element LLM query flavor (reference: llm_query.py per_element path). */
  def llmQueryElements(d: Document, client: LlmClient, prompt: String,
                       outputKey: String = "llm_response"): Document = {
    val targets = d.elements.filter(_.text.nonEmpty)
    if (targets.isEmpty) d
    else {
      val outs = client.generateBatch(targets.map(e => s"$prompt\n${e.text}"))
      val byIdx = targets.map(_.elementIndex).zip(outs).toMap
      d.copy(elements = d.elements.map(e =>
        byIdx.get(e.elementIndex).map(o => e.withProps(outputKey -> o)).getOrElse(e)))
    }
  }

  /** Table -> key/value properties on the table element (reference:
    * extract_table_properties.py:105 — LLM reads the table; here the
    * deterministic core handles the common header-row/label-column shapes,
    * with an optional LLM fallback for free-form tables). */
  def extractTableProperties(d: Document, client: Option[LlmClient] = None): Document =
    d.copy(elements = d.elements.map { e =>
      if (e.tableCells.isEmpty) e
      else {
        val kvs = tableKeyValues(e.tableCells) match {
          case Nil =>
            client.map { c =>
              val csv = tableCsv(e.tableCells)
              graft.llm.SchemaExtraction
                .extractJsonObject(c.generate(
                  s"Extract key-value pairs from this table as one JSON object:\n$csv"))
                .collect { case (k, org.json4s.JString(v)) => k -> v }
            }.getOrElse(Nil)
          case found => found
        }
        e.withProps(kvs.map { case (k, v) => s"table.$k" -> v }: _*)
      }
    })

  /** Deterministic extraction for 2-column label/value tables. */
  private def tableKeyValues(cells: Seq[TableCell]): Seq[(String, String)] = {
    val byRow = cells.groupBy(_.rows.headOption.getOrElse(0)).toSeq.sortBy(_._1)
    byRow.flatMap { case (_, rowCells) =>
      val sorted = rowCells.sortBy(_.cols.headOption.getOrElse(0))
      sorted match {
        case Seq(k, v) if k.content.nonEmpty && !k.isHeader => Some(k.content -> v.content)
        case _ => None
      }
    }
  }

  private def tableCsv(cells: Seq[TableCell]): String =
    cells.groupBy(_.rows.headOption.getOrElse(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.cols.headOption.getOrElse(0)).map(_.content).mkString(","))
      .mkString("\n")
}

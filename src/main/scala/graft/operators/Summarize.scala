package graft.operators

import graft.llm.LlmClient
import graft.model.{Document, Element}

/**
 * Document summarizers (reference: lib/sycamore/sycamore/transforms/summarize.py
 * — LLMElementTextSummarizer :87, MultiStepDocumentSummarizer :234,
 * OneStepDocumentSummarizer :414).
 *
 * All are per-document pure folds over the element list + pluggable LLM
 * calls — embarrassingly parallel across documents (a map stage), no
 * cross-doc state. Token budgeting uses character counts (the reference's
 * default CharacterTokenizer).
 */
trait DocumentSummarizer extends Serializable {
  def summarize(d: Document): Document
}

/** Summarize each (matching) element's text into the element's
  * properties.summary (reference: summarize.py:87 LLMElementTextSummarizer). */
final class LlmElementTextSummarizer(client: LlmClient,
                                     elementFilter: Element => Boolean = _ => true)
    extends DocumentSummarizer {
  def summarize(d: Document): Document = {
    val targets = d.elements.filter(e => elementFilter(e) && e.text.nonEmpty)
    if (targets.isEmpty) d
    else {
      val outs = client.generateBatch(targets.map(e => s"Summarize: ${e.text}"))
      val byIndex = targets.map(_.elementIndex).zip(outs).toMap
      d.copy(elements = d.elements.map { e =>
        byIndex.get(e.elementIndex) match {
          case Some(s) => e.withProps("summary" -> s)
          case None => e
        }
      })
    }
  }
}

/** Single LLM call over as much element text as fits the token budget,
  * spread evenly across elements (reference: summarize.py:414
  * OneStepDocumentSummarizer). Writes properties.summary. */
final class OneStepDocumentSummarizer(client: LlmClient, question: String = "",
                                      tokenLimit: Int = 10000)
    extends DocumentSummarizer {
  def summarize(d: Document): Document = {
    val els = d.elements.sortBy(_.elementIndex)
    val texts = if (els.nonEmpty) els.map(_.text) else Seq(d.text)
    // even per-element budget, like the reference's field-maximizing pass
    val per = math.max(tokenLimit / math.max(texts.size, 1), 16)
    val body = texts.map(_.take(per)).mkString("\n")
    val q = if (question.nonEmpty) s"Question: $question\n" else ""
    d.withProp("summary", client.generate(s"${q}Summarize:\n$body"))
  }
}

/**
 * Hierarchical tree-fold: pack consecutive elements into batches within the
 * token budget, summarize each batch, then repeat over the summaries until
 * one remains (reference: summarize.py:234 MultiStepDocumentSummarizer).
 * Rounds are O(log_batch(elements)); each round's LLM calls batch through
 * generateBatch. Writes properties.summary.
 */
final class MultiStepDocumentSummarizer(client: LlmClient, question: String = "",
                                        tokenLimit: Int = 2000)
    extends DocumentSummarizer {
  def summarize(d: Document): Document = {
    val q = if (question.nonEmpty) s"Question: $question\n" else ""
    def round(texts: Seq[String]): Seq[String] = {
      val batches = scala.collection.mutable.ListBuffer[Seq[String]]()
      var current = scala.collection.mutable.ListBuffer[String]()
      var budget = 0
      texts.foreach { t =>
        val cost = math.min(t.length, tokenLimit)
        if (budget + cost > tokenLimit && current.nonEmpty) {
          batches += current.toSeq; current = scala.collection.mutable.ListBuffer[String]()
          budget = 0
        }
        current += t.take(tokenLimit)
        budget += cost
      }
      if (current.nonEmpty) batches += current.toSeq
      client.generateBatch(batches.toSeq.map(b => s"${q}Summarize:\n${b.mkString("\n")}"))
    }
    val leaves = {
      val els = d.elements.sortBy(_.elementIndex).map(_.text).filter(_.nonEmpty)
      if (els.nonEmpty) els else Seq(d.text)
    }
    var level = round(leaves)
    while (level.size > 1) {
      val next = round(level)
      if (next.size >= level.size) {
        // no convergence (each summary alone exceeds the budget): force one
        // final call over evenly truncated summaries rather than looping
        val per = math.max(tokenLimit / next.size, 16)
        level = Seq(client.generate(
          s"${q}Summarize:\n${next.map(_.take(per)).mkString("\n")}"))
      } else level = next
    }
    d.withProp("summary", level.headOption.getOrElse(""))
  }
}

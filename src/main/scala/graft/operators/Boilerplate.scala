package graft.operators

import graft.model.Document

/**
 * Boilerplate removal for partitioned HTML — the content-extraction step
 * between raw crawl HTML and text curation (reference scope: the reference
 * partitions HTML but ships no boilerplate classifier; every published
 * web-corpus pipeline needs one before quality filtering, or nav/footer
 * chrome dominates the "text").
 *
 * jusText-inspired heuristic (Pomikálek 2011; same block features as
 * Kohlschütter et al. 2010 Boilerpipe): per block —
 *   - link density above `maxLinkDensity` → boilerplate (nav/related-links
 *     chrome; density comes from `HtmlPartitioner(trackLinks = true)`);
 *   - at least `minContentWords` words AND stopword ratio at or above
 *     `stopwordRatioGood` → content (fluent prose is stopword-rich);
 *   - under 3 words → boilerplate;
 *   - everything else is NEAR and inherits the verdict of its closest
 *     classified neighbor, previous first (the context-smoothing pass that
 *     makes jusText work on short content blocks between paragraphs).
 * Deterministic, dependency-free, row-local (a pure per-document map) —
 * a heuristic subset of jusText, not the full algorithm, stated honestly.
 */
object Boilerplate {

  private val Stop = graft.functions.gf.EnglishStopwords.toSet

  /** Adds `boilerplate` = "true"/"false" to every element. */
  def classify(doc: Document,
               maxLinkDensity: Double = 0.4,
               minContentWords: Int = 10,
               stopwordRatioGood: Double = 0.25): Document = {
    val els = doc.elements
    val init: Seq[Option[Boolean]] = els.map { e =>
      val ld = e.prop("link_density").flatMap(_.toDoubleOption).getOrElse(0.0)
      val heading = e.elementType == "Section-header" || e.elementType == "Title"
      val toks = e.text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val swRatio =
        if (toks.isEmpty) 0.0 else toks.count(Stop).toDouble / toks.length
      if (ld > maxLinkDensity) Some(false)
      else if (toks.length >= minContentWords && swRatio >= stopwordRatioGood) Some(true)
      // headings are NEAR whatever their length — they attach to the
      // content around them (jusText's near-good header handling)
      else if (toks.length < 3 && !heading) Some(false)
      else None
    }
    // context smoothing, jusText's rule: a NEAR block is content when
    // EITHER classified neighbor is content (headers attach to the story
    // below; stubs between two nav areas stay boilerplate). A document
    // with no classified block at all defaults to content — dropping
    // everything on no evidence is the worse failure.
    val prevC = init.scanLeft(Option.empty[Boolean]) {
      case (p, cur) => cur.orElse(p)
    }.drop(1)
    val nextC = init.scanRight(Option.empty[Boolean]) {
      case (cur, n) => cur.orElse(n)
    }.dropRight(1)
    val anyClassified = init.exists(_.isDefined)
    val verdicts = init.indices.map { i =>
      init(i).getOrElse(
        if (!anyClassified) true
        else prevC(i).getOrElse(false) || nextC(i).getOrElse(false))
    }
    doc.copy(elements = els.zip(verdicts).zipWithIndex.map {
      case ((e, v), i) =>
        e.copy(elementIndex = i,
          properties = e.properties + ("boilerplate" -> (!v).toString))
    })
  }

  /** Classify, then drop the boilerplate elements (reindexed). */
  def drop(doc: Document,
           maxLinkDensity: Double = 0.4,
           minContentWords: Int = 10,
           stopwordRatioGood: Double = 0.25): Document = {
    val c = classify(doc, maxLinkDensity, minContentWords, stopwordRatioGood)
    doc.copy(elements = c.elements
      .filter(_.prop("boilerplate").contains("false"))
      .zipWithIndex.map { case (e, i) => e.copy(elementIndex = i) })
  }
}

package graft.operators

import graft.model.{Document, Element}

/**
 * Property ATTRIBUTION — map an extracted property value back to its source
 * evidence (reference: transforms/property_extraction/attribution.py:40
 * `TextMatchAttributionStrategy`, find_exact :215, find_fuzzy :228): the
 * element whose text contains the value exactly (first element wins, 1.0
 * score, reference :85-92), else the best fuzzy window across all elements
 * (reference :96-104), recorded as element index + char span + score +
 * snippet. Extraction without attribution is unauditable — this is the half
 * that makes an LLM-extracted property checkable against the document.
 *
 * Fuzzy scoring: the reference uses difflib's `SequenceMatcher.ratio`
 * (2·M/(|a|+|b|) over its recursive longest-match decomposition). Here the
 * ratio is the classic LCS form — 2·LCS(a,b)/(|a|+|b|) — which is the same
 * quantity with the full longest-common-subsequence instead of difflib's
 * greedy block decomposition (deterministic, standard, and never smaller).
 * The window search follows the reference's two passes — pass 1 slides a
 * |value|-sized window; pass 2 expands the winner by up to
 * min(|value|, MaxFuzzyPadding) characters (reference :238-256) — with one
 * divergence: windows whose expansion would start before the element text
 * are CLAMPED to offset 0 and still scored (the reference's Python slice
 * with a negative start degenerates and is effectively never scored), so a
 * match near the start of an element can win a slightly wider window here.
 * A difflib-style `quickRatio` multiset bound prunes windows that cannot
 * beat the current best, so the LCS DP runs only on candidates.
 *
 * Scale shape: a pure per-document map — no shuffle, no driver state; cost
 * is per-(property, element) text work, the same shape as the partitioners.
 * Integer milli scores keep the output engine-exact for the oracle.
 */
object PropertyAttribution {

  /** Reference attribution.py:11 — max window expansion in pass 2. */
  val MaxFuzzyPadding = 30

  /** Attribution evidence for one property value. Score is in milli
    * (1000 = exact); span is [start, end) over the element's text. */
  final case class Attribution(elementIndex: Int, start: Int, end: Int,
                               scoreMilli: Long, snippet: String)

  /** Exact containment (reference :215): first index of `value`. */
  def findExact(text: String, value: String): Option[(Int, Int)] = {
    val i = text.indexOf(value)
    if (i < 0 || value.isEmpty) None else Some((i, i + value.length))
  }

  /** 2000·LCS/(|a|+|b|) — the LCS ratio in milli, 0 for two empties. */
  def lcsRatioMilli(a: String, b: String): Long = {
    if (a.isEmpty && b.isEmpty) return 0L
    // one-row LCS DP
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        cur(j + 1) =
          if (a.charAt(i) == b.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    2000L * prev(b.length) / (a.length + b.length)
  }

  /** Multiset-intersection upper bound on [[lcsRatioMilli]] (difflib's
    * quick_ratio): prunes windows that cannot beat the current best. */
  private def quickRatioMilli(countsA: Array[Int], lenA: Int, b: String): Long = {
    val seen = new Array[Int](countsA.length)
    var m = 0
    var j = 0
    while (j < b.length) {
      val c = b.charAt(j) % seen.length
      if (seen(c) < countsA(c)) { m += 1; seen(c) += 1 }
      j += 1
    }
    if (lenA + b.length == 0) 0L else 2000L * m / (lenA + b.length)
  }

  /** Best fuzzy window of `value` inside `text` (reference :228): pass 1
    * slides a |value|-sized window, pass 2 expands the winner. Returns
    * (scoreMilli, (start, end)); (0, (-1, -1)) when nothing scores. */
  def findFuzzy(text: String, value: String): (Long, (Int, Int)) = {
    if (text.isEmpty || value.isEmpty) return (0L, (-1, -1))
    val w = value.length
    val counts = new Array[Int](256)
    value.foreach(c => counts(c % 256) += 1)
    var maxR = -1L
    var best = (0, 0)
    var i = 0
    val last = math.max(text.length - w, 0)
    while (i <= last) {
      val cand = text.substring(i, math.min(i + w, text.length))
      if (quickRatioMilli(counts, w, cand) > maxR) {
        val r = lcsRatioMilli(value, cand)
        if (r > maxR) { maxR = r; best = (i, math.min(i + w, text.length)) }
      }
      i += 1
    }
    // pass 2: expand the winner by up to min(|value|, MaxFuzzyPadding)
    val (s0, e0) = best
    val maxPad = math.min(w, MaxFuzzyPadding)
    var pad = 2
    while (pad < maxPad) {
      var k = 0
      while (k < pad) {
        val cs = math.max(s0 - k, 0)
        val ce = math.min(e0 - k + pad, text.length)
        if (ce > cs) {
          val cand = text.substring(cs, ce)
          if (quickRatioMilli(counts, w, cand) > maxR) {
            val r = lcsRatioMilli(value, cand)
            if (r > maxR) { maxR = r; best = (cs, ce) }
          }
        }
        k += 1
      }
      pad += 1
    }
    (math.max(maxR, 0L), if (maxR <= 0) (-1, -1) else best)
  }

  /** Attribute one value across a document's elements: exact first in
    * element order (short-circuits at 1.0, reference :85-92), else the
    * best fuzzy window over all elements (reference :96-104). */
  def attributeValue(elements: Seq[Element], value: String): Option[Attribution] = {
    if (value == null || value.isEmpty) return None
    elements.iterator.flatMap { e =>
      e.textRepresentation.flatMap(t => findExact(t, value).map { case (s, en) =>
        Attribution(e.elementIndex, s, en, 1000L, t.substring(s, en))
      })
    }.nextOption().orElse {
      val scored = elements.flatMap { e =>
        e.textRepresentation.map { t =>
          val (r, (s, en)) = findFuzzy(t, value)
          (r, e.elementIndex, s, en, t)
        }
      }
      // deterministic winner: best score, then lowest element index
      scored.filter(_._1 > 0).sortBy(x => (-x._1, x._2)).headOption.map {
        case (r, idx, s, en, t) => Attribution(idx, s, en, r, t.substring(s, en))
      }
    }
  }

  /** Per-document attribution of the named property fields: for each
    * present `f`, adds `f._attr_element`, `f._attr_start`, `f._attr_end`
    * (char span over that element's text), `f._attr_score_milli` (1000 =
    * exact) and `f._attr_snippet`. Fields with no positive-scoring window
    * stay unattributed (reference :108 `if score > 0`). */
  def attribute(d: Document, fields: Seq[String]): Document = {
    val added = fields.flatMap { f =>
      d.prop(f).flatMap(v => attributeValue(d.elements, v)).toSeq.flatMap { a =>
        Seq(
          s"$f._attr_element" -> a.elementIndex.toString,
          s"$f._attr_start" -> a.start.toString,
          s"$f._attr_end" -> a.end.toString,
          s"$f._attr_score_milli" -> a.scoreMilli.toString,
          s"$f._attr_snippet" -> a.snippet)
      }
    }
    if (added.isEmpty) d else d.copy(properties = d.properties ++ added)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Domain-scoped curation — the unit of trust in web-corpus pipelines is
 * the registrable domain, not the page (RefinedWeb §3.1 URL filtering,
 * CCNet §4.1, Dolma's per-domain caps; cf. the reference's DocSet filter
 * family, lib/sycamore/sycamore/docset.py:614).
 *
 * `reputation`: two-phase rollup — per-domain doc count and mean signal
 * (exact integer millis: sum*1000 div count, no float averaging), joined
 * back so every document carries its domain prior and a keep decision
 * made by integer cross-multiplication (sum*1000 >= min*count). The
 * domain table is registrable-domain-sized — orders of magnitude under
 * the corpus — so at 100 TB the rollup is one map-side-combined
 * aggregate and the join-back broadcasts in practice (AQE decides from
 * real sizes; no hint is hard-coded because "domains" can be a synthetic
 * high-cardinality key).
 *
 * `stripTemplateLines`: per-domain boilerplate removal — a line occurring
 * in >= minDocs DISTINCT documents of the SAME domain is a template
 * (nav/footer/cookie banner) and is stripped from every document in that
 * domain. Global line-dedup (Dedup.dedupLines) removes cross-corpus
 * duplicates; this is the domain-scoped variant that catches site
 * furniture too rare globally. Work is linear in total lines; the
 * template join keys on (domain, line) whose matches are the templates
 * themselves.
 */
object DomainOps {

  /** Per-document domain prior: (idCol, domain, domain_docs,
    * domain_avg_milli, domain_keep), id-ordered. `signal` must be
    * integer-valued (cast to long). */
  def reputation(df: DataFrame, idCol: String, domainCol: Column,
                 signal: Column, minAvgMilli: Long): DataFrame = {
    val base = df.select(col(idCol), domainCol.as("domain"),
      signal.cast("long").as("_sig"))
    val perDomain = base.groupBy(col("domain")).agg(
      count(lit(1)).as("domain_docs"),
      sum(col("_sig")).as("_sum"))
    base.join(perDomain, "domain")
      .select(col(idCol), col("domain"), col("domain_docs"),
        // exact integer milli-average (DIV, never float division — a
        // 100 TB domain sum would round in a double); keep decided without
        // any division (sum*1000 >= min*count) so no rounding flips a
        // boundary
        expr("(_sum * 1000) DIV domain_docs").cast("long")
          .as("domain_avg_milli"),
        (col("_sum") * 1000L >= lit(minAvgMilli) * col("domain_docs"))
          .as("domain_keep"))
      .orderBy(col(idCol))
  }

  /** Strip per-domain template lines: (idCol, clean_text, n_lines,
    * n_removed), id-ordered. A template line appears in >= minDocs
    * distinct documents within one domain (exact-match lines, newline
    * split; empty lines are never counted as templates — they are
    * structure, not content). */
  def stripTemplateLines(df: DataFrame, idCol: String, textCol: String,
                         domainCol: Column, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs >= 2 (got $minDocs): a 1-doc 'template' would strip everything")
    val lines = df.select(col(idCol), domainCol.as("_dom"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_line")))
    val templates = lines.where(length(trim(col("_line"))) > 0)
      .groupBy(col("_dom"), col("_line"))
      .agg(countDistinct(col(idCol)).as("_docs"))
      .where(col("_docs") >= minDocs)
      .select(col("_dom"), col("_line"), lit(true).as("_tpl"))
    lines.join(templates, Seq("_dom", "_line"), "left")
      .groupBy(col(idCol))
      .agg(
        // rebuild in original line order; sort_array on (pos, line) structs
        // keys on pos first, so the join's row reshuffling cannot reorder
        array_join(transform(
          sort_array(collect_list(when(col("_tpl").isNull,
            struct(col("_pos"), col("_line"))))),
          s => s("_line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines"),
        count(col("_tpl")).as("n_removed"))
      .orderBy(col(idCol))
  }
}

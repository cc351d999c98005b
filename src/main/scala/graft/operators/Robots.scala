package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * robots.txt evaluation — the crawl-politeness filter that sits between
 * WARC ingest ([[graft.sources.Warc]]) and URL curation: given a host's
 * robots.txt, decide per URL path whether the configured agent may fetch
 * it. Implements the de-facto REP semantics (RFC 9309): rule groups per
 * `User-agent:` (a group matching the agent exactly beats the `*` group;
 * exact matches here are case-insensitive agent tokens), `Disallow:` /
 * `Allow:` path-prefix rules, `#` comments, and the MOST-SPECIFIC rule
 * wins — longest matched prefix, Allow beating Disallow on equal length;
 * no rule matching ⇒ allowed (and an empty `Disallow:` matches nothing).
 * Wildcard `*`/`$` patterns are out of scope (documented; the RFC makes
 * them optional) — rules containing them are ignored.
 *
 * Parsing happens ONCE on the driver (robots.txt is per-host, kilobytes);
 * evaluation is a broadcast-free when()-chain over the sorted rules —
 * pure `startsWith` comparisons, codegen'd, zero shuffles — and
 * [[sqlOracle]] renders the SAME sorted rule table as a SQL CASE chain
 * (the MojibakeRepair oracle pattern: engine and oracle are equivalent
 * by construction).
 */
object Robots {

  /** Parse robots.txt for `userAgent`: the matching group's rules as
    * (pathPrefix, allow), sorted most-specific-first (prefix length desc,
    * Allow before Disallow on ties) — evaluation order IS this order. */
  def parse(robotsTxt: String, userAgent: String): Seq[(String, Boolean)] = {
    val ua = userAgent.toLowerCase
    var groupAgents = List.empty[String]
    var afterRules = true // true while reading User-agent lines of a new group
    var specificSeen = false // a group NAMED the agent (even with no rules)
    val specific = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val wildcard = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            if (!afterRules) groupAgents = Nil // a rule block ended; new group
            groupAgents ::= value.toLowerCase
            if (value.toLowerCase == ua) specificSeen = true
            afterRules = true
          case "allow" | "disallow" =>
            afterRules = false
            val allow = key == "allow"
            // empty Disallow matches nothing; empty Allow likewise inert;
            // optional-wildcard rules are skipped (documented)
            if (value.nonEmpty && !value.contains('*') && !value.contains('$')) {
              if (groupAgents.contains(ua)) specific += ((value, allow))
              if (groupAgents.contains("*")) wildcard += ((value, allow))
            }
          case _ => () // crawl-delay, sitemap, unknown keys: ignored
        }
      }
    }
    // RFC 9309 §2.2.1: when a group NAMES the agent, only that group
    // applies — even if it carries no rules (meaning allow-all). Falling
    // back to the * group because the specific rule LIST is empty would
    // wrongly apply the generic disallows to an explicitly-freed agent.
    val rules = if (specificSeen) specific else wildcard
    rules.sortBy { case (p, allow) => (-p.length, !allow) }.toList.distinct
  }

  /** Allowed? — when()-chain over the sorted rules; unmatched ⇒ true. */
  def allowedCol(path: Column, rules: Seq[(String, Boolean)]): Column =
    rules.foldRight(lit(true)) { case ((prefix, allow), rest) =>
      when(path.startsWith(prefix), lit(allow)).otherwise(rest)
    }

  /** The identical decision as a SQL CASE chain over `pathExpr`. */
  def sqlOracle(pathExpr: String, rules: Seq[(String, Boolean)]): String = {
    def esc(s: String) = s.replace("'", "''")
    val whens = rules.map { case (p, allow) =>
      s"WHEN starts_with($pathExpr, '${esc(p)}') THEN ${allow.toString}"
    }.mkString(" ")
    if (rules.isEmpty) "true" else s"(CASE $whens ELSE true END)"
  }
}

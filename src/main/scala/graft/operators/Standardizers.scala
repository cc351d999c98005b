package graft.operators

import graft.model.Document

/**
 * Deterministic value normalization of properties (reference:
 * lib/sycamore/sycamore/transforms/standardizer.py:15-349 —
 * USStateStandardizer and DateTimeStandardizer).
 */
object Standardizers {

  val UsStates: Map[String, String] = Map(
    "AL" -> "Alabama", "AK" -> "Alaska", "AZ" -> "Arizona", "AR" -> "Arkansas",
    "CA" -> "California", "CO" -> "Colorado", "CT" -> "Connecticut", "DE" -> "Delaware",
    "FL" -> "Florida", "GA" -> "Georgia", "HI" -> "Hawaii", "ID" -> "Idaho",
    "IL" -> "Illinois", "IN" -> "Indiana", "IA" -> "Iowa", "KS" -> "Kansas",
    "KY" -> "Kentucky", "LA" -> "Louisiana", "ME" -> "Maine", "MD" -> "Maryland",
    "MA" -> "Massachusetts", "MI" -> "Michigan", "MN" -> "Minnesota", "MS" -> "Mississippi",
    "MO" -> "Missouri", "MT" -> "Montana", "NE" -> "Nebraska", "NV" -> "Nevada",
    "NH" -> "New Hampshire", "NJ" -> "New Jersey", "NM" -> "New Mexico", "NY" -> "New York",
    "NC" -> "North Carolina", "ND" -> "North Dakota", "OH" -> "Ohio", "OK" -> "Oklahoma",
    "OR" -> "Oregon", "PA" -> "Pennsylvania", "RI" -> "Rhode Island", "SC" -> "South Carolina",
    "SD" -> "South Dakota", "TN" -> "Tennessee", "TX" -> "Texas", "UT" -> "Utah",
    "VT" -> "Vermont", "VA" -> "Virginia", "WA" -> "Washington", "WV" -> "West Virginia",
    "WI" -> "Wisconsin", "WY" -> "Wyoming")

  /** Replace trailing state abbreviations in a location property:
    * "Atlanta, GA" -> "Atlanta, Georgia" (reference: standardizer.py:54). */
  def usState(field: String)(d: Document): Document =
    d.fieldToValue(field) match {
      case Some(v) =>
        val norm = v.split("\\b").map(tok => UsStates.getOrElse(tok, tok)).mkString
        d.setField(field, norm)
      case None => d
    }

  private val dateFormats = Seq(
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy", "MMMM d, yyyy", "MMM d, yyyy",
    "d MMMM yyyy", "yyyyMMdd")

  /** Fuzzy-parse a date property; writes `<field>` (ISO date-time), plus
    * `day` and `isoDateTime` like the reference (standardizer.py:171
    * DateTimeStandardizer: dateTime/day/isoDateTime outputs). */
  def dateTime(field: String)(d: Document): Document =
    d.fieldToValue(field).flatMap(parse) match {
      case Some(dt) =>
        val iso = dt.toString
        d.setField(field, iso)
          .withProp("day", dt.toLocalDate.toString)
          .withProp("isoDateTime", iso)
      case None => d
    }

  private[operators] def parse(s: String): Option[java.time.LocalDateTime] = {
    val t = s.trim
    dateFormats.view.flatMap { f =>
      try {
        val fmt = java.time.format.DateTimeFormatter.ofPattern(f, java.util.Locale.US)
        try Some(java.time.LocalDateTime.parse(t, fmt))
        catch { case _: Exception => Some(java.time.LocalDate.parse(t, fmt).atStartOfDay) }
      } catch { case _: Exception => None }
    }.headOption
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Conversion attribution — for every conversion event, the FIRST-touch
 * and LAST-touch marketing events of the same user inside a lookback
 * window (the analytics-warehouse staple next to funnel/retention;
 * complements EventAnalytics.markovTransitions' data-driven model).
 *
 * One window pass, zero joins: touches and conversions stay in the SAME
 * per-user frame — first/last touch are min/max over a RANGE frame
 * [ts − lookback, ts − 1] of a (ts, id, type) struct (lexicographic min
 * IS earliest-with-deterministic-ties), evaluated only at conversion
 * rows. At 100 TB this shuffles each user's events once; a join
 * formulation would re-shuffle touches per conversion.
 *
 * `tsCol` must be an integer timestamp (µs/ns) — RANGE frames need
 * numeric order, and integer time math is the only cross-engine-exact
 * kind (events.ts convention).
 */
object Attribution {

  /** (conv_id, user, conv_ts, n_touches, first_id, first_type, last_id,
    * last_type), conversion-id-ordered; touch fields null when the
    * lookback window holds no touch. */
  def attribute(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, idCol: String,
                touchTypes: Seq[String], convType: String,
                lookback: Long): DataFrame = {
    require(touchTypes.nonEmpty && lookback > 0, "need touch types and a positive lookback")
    val isTouch = col(typeCol).isin(touchTypes.map(lit): _*)
    val touchStruct = when(isTouch,
      struct(col(tsCol).as("_t"), col(idCol).as("_id"), col(typeCol).as("_ty")))
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rangeBetween(-lookback, -1)
    val scored = events.select(col(userCol), col(tsCol), col(typeCol), col(idCol),
      min(touchStruct).over(w).as("_first"),
      max(touchStruct).over(w).as("_last"),
      count(touchStruct).over(w).as("n_touches"))
    scored.where(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("user"),
        col(tsCol).as("conv_ts"), col("n_touches"),
        col("_first._id").as("first_id"), col("_first._ty").as("first_type"),
        col("_last._id").as("last_id"), col("_last._ty").as("last_type"))
      .orderBy(col("conv_id"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered FUNNEL analysis — the staged-conversion query of product
  * analytics (view → click → purchase): for each entity, the earliest
  * strictly-ordered completion time of every stage, and how deep into
  * the funnel it got. Greedy-earliest per stage is optimal (exchange
  * argument: if ANY event assignment completes stages 1..k, the one
  * taking each stage's earliest admissible event does too), so stage
  * k's time is simply min(ts of stage-k events after stage k−1's
  * time), and the reached depth is the defined-prefix length.
  *
  * Shape at 100 TB: one keyed aggregate + broadcast-or-keyed join per
  * stage (stage count is small and fixed); no per-entity event-list
  * collection, no window over full per-user histories. Null stage
  * times propagate forward, so each row's stage columns form a
  * prefix. */
object Funnel {

  /** Returns (`userCol`, <stage>_ts …, stages_completed). Stage order
    * is strict (`>`): a same-timestamp event does not advance the
    * funnel — the deliberate tie rule (an instantaneous "conversion"
    * is attribution noise at event-log granularity). */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages, s"stages: $stages")
    val base = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var acc = base.select(col("__u")).distinct()
    var prevCol: Option[String] = None
    for (st <- stages) {
      val outCol = s"${st}_ts"
      val evs = base.where(col("__t") === st)
      val stage = prevCol match {
        case None =>
          evs.groupBy(col("__u")).agg(min(col("__ts")).as(outCol))
        case Some(p) =>
          evs.join(acc.select(col("__u"), col(p)).where(col(p).isNotNull), "__u")
            .where(col("__ts") > col(p))
            .groupBy(col("__u")).agg(min(col("__ts")).as(outCol))
      }
      acc = acc.join(stage, Seq("__u"), "left")
      prevCol = Some(outCol)
    }
    acc.select(
      (col("__u").as(userCol) +:
        stages.map(st => col(s"${st}_ts"))) :+
        stages.map(st => when(col(s"${st}_ts").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int").as("stages_completed"): _*)
  }

  /** Weekly COHORT RETENTION — the other canonical product-analytics
    * matrix: users grouped by first-activity week (the cohort), and for
    * each week offset the count of that cohort still active, plus the
    * rate against the cohort's own week-0 size. Two keyed shuffles
    * (per-user first week, then the (cohort, offset) distinct-count) +
    * one cohort-partitioned window for the rate — no per-user history
    * collection, so the shape holds at any event volume. Weeks truncate
    * to Monday (`date_trunc`), offsets are exact multiples of 7 days.
    * Returns (cohort, offset_w, users, rate). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).as("__w"))
    val firstWeek = base.groupBy("__u").agg(min("__w").as("cohort"))
    val active = base.join(firstWeek, Seq("__u"))
      .select(col("__u"), col("cohort"),
        (datediff(col("__w"), col("cohort")) / 7).cast("int").as("offset_w"))
      .distinct()
    val counts = active.groupBy("cohort", "offset_w")
      .agg(count(lit(1)).as("users"))
    val w = Window.partitionBy("cohort")
    counts
      .withColumn("rate", round(col("users") /
        max(when(col("offset_w") === 0, col("users"))).over(w), 6))
      .select(col("cohort").cast("date").as("cohort"),
        col("offset_w"), col("users"), col("rate"))
  }
}

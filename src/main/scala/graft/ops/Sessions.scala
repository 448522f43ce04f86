package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream: a new session starts
 * whenever the gap to the user's previous event exceeds `gapSec`.
 *
 * Batch shape: one window over (user, ts) — lag for the gap flag, then a
 * running sum of flags for the 0-based session index. ONE shuffle on the
 * user key; each task handles whole users, so the per-task working set
 * is bounded by per-user activity (human-scale: thousands of events),
 * not corpus size — the partition-key skew caveat of a global window
 * does not apply. At 100 TB pre-bucketing the events table by user_id
 * makes the shuffle a no-op.
 *
 * The STREAMING equivalent is Spark's built-in
 * `session_window(ts, gap)` aggregation (see graft.streaming.Streams) —
 * same session semantics, watermark-driven state eviction.
 */
object Sessions {

  /** Adds `session_idx` (0-based per user) to the frame. Ties on ts
    * within a user are ordered by `tieBreak` so replays are stable. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSec: Long,
                 tieBreak: Column, out: String = "session_idx"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), tieBreak)
    val gap = col(tsCol).cast("double") - lag(col(tsCol), 1).over(w).cast("double")
    val isNew = when(gap.isNull || gap > gapSec, 1L).otherwise(0L)
    // running sum INCLUDING the current row, minus 1 → 0-based index
    df.withColumn(out,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** One row per session: bounds, event count, duration. */
  def sessionSummary(df: DataFrame, userCol: String, tsCol: String, gapSec: Long,
                     tieBreak: Column): DataFrame =
    sessionize(df, userCol, tsCol, gapSec, tieBreak)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)).cast("double") - min(col(tsCol)).cast("double")).as("duration_sec"))
}

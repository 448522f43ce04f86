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

  /** Regular-grid RESAMPLE with last-observation-carried-forward — the
    * gap-fill that turns an irregular event stream into the dense
    * per-key time series feature pipelines join against. Per key: a
    * `stepSec`-spaced bucket grid spans its own [min, max] activity
    * (generated arithmetically with `sequence` — never a calendar
    * table join), each bucket takes its LAST observation (ts desc,
    * value desc — fully deterministic tie order), and empty buckets
    * forward-fill via `last(ignoreNulls)` over an unbounded-preceding
    * frame. Two shuffles (bucket dedup, per-key window); grid size is
    * keys × span/step, independent of event volume. Returns
    * (key, bucket, value, filled) — `value` null on gap rows, `filled`
    * the LOCF series (null only before a key's first observation,
    * impossible here since grids start at each key's min). */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                   stepSec: Long): DataFrame = {
    require(stepSec > 0)
    val bucket = timestamp_seconds(
      floor(col(tsCol).cast("double") / stepSec) * stepSec)
    val obs = df.select(col(keyCol).as("key"), bucket.as("bucket"),
        col(tsCol).as("__ts"), col(valCol).as("value"))
    // last observation per bucket as a hash-aggregate argmax (r13):
    // max(struct(ts, value)) IS the (ts desc, value desc) pick — struct
    // comparison is lexicographic and a null value field sorts below
    // non-null, matching the window's desc-NULLS-LAST order — with
    // map-side partial combine instead of a per-(key,bucket) sort
    val perBucket = obs.groupBy("key", "bucket")
      .agg(max(struct(col("__ts"), col("value"))).as("__m"))
      .select(col("key"), col("bucket"), col("__m.value").as("value"))
    val grid = perBucket.groupBy("key")
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col("key"), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSec SECONDS"))).as("bucket"))
    val wFill = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("key", "bucket"), "left")
      .withColumn("filled", last("value", ignoreNulls = true).over(wFill))
  }
}

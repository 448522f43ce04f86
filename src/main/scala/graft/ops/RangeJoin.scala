package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval join: pair each left row (a point `ts`) with every
 * right row (an interval `[start, end]`, same key) that contains it.
 * Spark has no native range join — a naive formulation becomes a
 * BroadcastNestedLoopJoin (per-key cross product with a post-filter),
 * which is exactly what dies at scale.
 *
 * Shape — ARITHMETIC BUCKETING, the same trick the JX interval edges
 * use (QueryRunner's range/duration domains): pick a bucket width,
 * explode each interval to the buckets it covers, and equi-join on
 * (key, bucket) before filtering to true containment. The left side
 * never explodes (a point is in exactly one bucket), so each matching
 * pair is produced exactly once — no dedup pass. Right-side fan-out is
 * ceil(len/width)+1 buckets per interval: size `bucketSec` near the
 * TYPICAL interval length so the fan-out stays ~2× and bucket
 * populations stay balanced.
 *
 * Scale: ONE equi-shuffle on (key, bucket) — hash-joinable, AQE-
 * plannable, skew-splittable — versus the unbounded per-key product of
 * a theta join. 100 TB caveat: a single pathological interval spanning
 * the whole timeline explodes to timeline/width buckets; clamp or
 * split such outliers upstream.
 */
object RangeJoin {

  /** Inner point-in-interval join on `keys`; `leftTs` in
    * `[rightStart, rightEnd]` inclusive. Timestamps compare at second
    * grain (epoch seconds). Right columns keep their names — alias
    * collisions with left columns are the caller's to avoid. */
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightStart: String, rightEnd: String,
                      bucketSec: Long = 3600L): DataFrame = {
    val lb = (col(leftTs).cast("long") / bucketSec).cast("long").as("__bucket")
    val l = left.withColumn("__bucket", lb)
    val r = right
      .withColumn("__bucket", explode(sequence(
        (col(rightStart).cast("long") / bucketSec).cast("long"),
        (col(rightEnd).cast("long") / bucketSec).cast("long"))))
    val cond = (keys.map(k => l(k) === r(k)) :+
      (l("__bucket") === r("__bucket")) :+
      (l(leftTs).cast("long") >= r(rightStart).cast("long")) :+
      (l(leftTs).cast("long") <= r(rightEnd).cast("long"))).reduce(_ && _)
    val rightCols = right.columns.filterNot(keys.contains).map(r(_))
    l.join(r, cond).select(left.columns.map(l(_)) ++ rightCols: _*)
  }
}

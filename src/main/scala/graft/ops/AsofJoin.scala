package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (nearest-timestamp) join: for each left row, attach the payload
 * of the closest right row at-or-before (backward) or at-or-after
 * (forward) its timestamp, per key — the standard way to align events
 * with slowly-changing per-key state (last price, last config, last
 * purchase). The reference engine has no such operator; it belongs to
 * the training-pipeline surface (aligning documents/events with the
 * latest snapshot of per-source metadata).
 *
 * Shape — union + running `last(ignoreNulls)` window, NOT a range join:
 * tag both inputs, union them, and run one window over (key, ts) where
 * right rows sort immediately BEFORE left rows on timestamp ties (so
 * `>=`/`<=` semantics include the equal-timestamp match). A running
 * unbounded-preceding frame then carries the latest right payload
 * forward to every left row.
 *
 * Scale: ONE shuffle, on the key — the same cost as any keyed join —
 * and the running frame is evaluated incrementally (O(n) per
 * partition), never re-scanned per row. A range/theta join formulation
 * would explode to |left|x|right| per key before picking the max;
 * this never materializes more than the union. Tasks hold whole keys:
 * fine for human-scale keys (users, sources); for a single
 * pathologically hot key, pre-bucket by (key, coarse time bucket) and
 * seed each bucket with the previous bucket's closing state.
 *
 * Right rows must be unique per (keys, rightTs) — pre-aggregate
 * otherwise, or ties make the attached payload nondeterministic.
 */
object AsofJoin {

  /** Backward as-of: latest right row with `right.ts <= left.ts`.
    * Left rows with no preceding right row keep null payload (LEFT
    * OUTER semantics). Attached columns are `prefix + rightTs` and
    * `prefix + c` for each payload column c. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   prefix: String = "asof_"): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, prefix, forward = false)

  /** Forward as-of: earliest right row with `right.ts >= left.ts`. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String],
                  prefix: String = "asof_"): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, prefix, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   prefix: String, forward: Boolean): DataFrame = {
    val rightU = right
      .select((keys :+ rightTs) .map(col) ++ payload.map(col): _*)
      // a null-timestamp right row satisfies NO as-of comparison — it
      // must never enter the running frame (review r9: backward's
      // nulls-first sort carried its payload to every early left row)
      .where(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__pay", struct((rightTs +: payload).map(col): _*))
      .select(keys.map(col) :+ col("__ts") :+ col("__pay"): _*)
      .withColumn("__side", lit(0))
    val leftU = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // right (__side 0) sorts before left (__side 1) on timestamp ties in
    // BOTH directions, so the equal-timestamp right row is always visible
    // to the left row's running frame (>= / <= inclusive semantics).
    // Null-timestamp LEFT rows sort FIRST in both directions (nulls-first
    // asc is Spark's default; forward pins desc_nulls_first explicitly)
    // so no right row precedes them and their payload is null — a null
    // left ts matches nothing (review r9: desc's nulls-LAST default
    // attached the minimum-ts payload instead)
    val ord: Seq[Column] =
      if (forward) Seq(col("__ts").desc_nulls_first, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftU.unionByName(rightU, allowMissingColumns = true)
      .withColumn("__fill", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val attached = (rightTs +: payload)
      .map(c => col("__fill").getField(c).as(prefix + c))
    filled.select(left.columns.map(col) ++ attached: _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance (IVM) for DISTRIBUTIVE aggregates — the
 * rollup-table pattern of every serving layer: a keyed summary
 * (count / sum / min / max, and anything derivable like avg) is kept
 * current by merging each increment's OWN aggregate into the state,
 * never re-scanning history. Correctness rests on distributivity:
 * agg(A ∪ Δ) = combine(agg(A), agg(Δ)) — so maintenance cost tracks
 * the increment, not the accumulated corpus (the same contract as
 * [[Dedup.incremental]]'s index). Non-distributive measures (exact
 * distinct, exact percentile) are out of contract — use sketches
 * ([[Sketches]]) or recompute.
 *
 * Both steps are one keyed shuffle each: [[aggDelta]] partial-
 * aggregates map-side; [[merge]] is a key-equi full-outer join of two
 * rollup-sized (small) frames.
 */
object Rollup {

  private val Measures = Seq("cnt", "sum_v", "min_v", "max_v")

  /** Aggregate one increment into rollup shape:
    * (keys..., cnt, sum_v, min_v, max_v). */
  def aggDelta(delta: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty)
    delta.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol).cast("double")).as("sum_v"),
      min(col(valCol).cast("double")).as("min_v"),
      max(col(valCol).cast("double")).as("max_v"))
  }

  /** Merge an increment's rollup into the state: full-outer on the
    * keys, counts/sums add, min/max fold — a key appearing in either
    * side survives. Output schema = rollup shape (merge-closed, so
    * merges chain). */
  def merge(state: DataFrame, deltaAgg: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    val a = Measures.foldLeft(state)((d, m) => d.withColumnRenamed(m, s"__a_$m"))
    val b = Measures.foldLeft(deltaAgg)((d, m) => d.withColumnRenamed(m, s"__b_$m"))
    a.join(b, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("__a_cnt"), lit(0L)) + coalesce(col("__b_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("__a_sum_v"), lit(0.0)) + coalesce(col("__b_sum_v"), lit(0.0))).as("sum_v"),
        least(col("__a_min_v"), col("__b_min_v")).as("min_v"),
        greatest(col("__a_max_v"), col("__b_max_v")).as("max_v")): _*)
  }

  /** RETRACT a previously-merged increment (CDC deletes, restatements).
    * Only count and sum are retractable — min/max are NOT (removing the
    * minimum leaves no way to know the runner-up), which is why the
    * output deliberately NARROWS to (keys..., cnt, sum_v): a caller
    * needing min/max after deletes must recompute that column or keep a
    * sketch. Keys whose count reaches 0 drop out; a negative count
    * (retracting rows never merged) fails fast. */
  def retract(state: DataFrame, goneAgg: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    val a = Measures.foldLeft(state)((d, m) => d.withColumnRenamed(m, s"__a_$m"))
    val b = Measures.foldLeft(goneAgg)((d, m) => d.withColumnRenamed(m, s"__b_$m"))
    val merged = a.join(b, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("__a_cnt"), lit(0L)) - coalesce(col("__b_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("__a_sum_v"), lit(0.0)) - coalesce(col("__b_sum_v"), lit(0.0))).as("sum_v")): _*)
    merged.withColumn("cnt",
        when(col("cnt") < 0, raise_error(concat(lit("Rollup.retract: negative count for key "),
          concat_ws("/", keys.map(k => col(k).cast("string")): _*)))).otherwise(col("cnt")))
      .where(col("cnt") > 0)
  }

  /** Two-level SHARE-OF-PARENT rollup — the drill-down tree every
    * revenue report draws (region → nation with each child's share of
    * its parent and of the whole): one keyed aggregate, parent totals
    * joined back BROADCAST (dimension-sized), total as a 1-row
    * broadcast. Same integer-weight contract as [[topNOther]] — the
    * aggregate sums arbitrarily many weights, so pass exact integers
    * (cents, counts) and the shares are single exact-integer
    * divisions. Returns (parent, child, weight, share_of_parent,
    * share_of_total). */
  def shareOfParent(df: DataFrame, parentCol: String, childCol: String,
                    weight: org.apache.spark.sql.Column): DataFrame = {
    val agg = df.groupBy(col(parentCol).as("parent"), col(childCol).as("child"))
      .agg(sum(weight.cast("long")).as("weight"))
    val ptot = agg.groupBy("parent").agg(sum("weight").as("__pw"))
    val tot = agg.agg(sum("weight").as("__tw"))
    agg.join(broadcast(ptot), Seq("parent"))
      .crossJoin(broadcast(tot))
      .select(col("parent"), col("child"), col("weight"),
        round(col("weight").cast("double") / col("__pw").cast("double"), 6)
          .as("share_of_parent"),
        round(col("weight").cast("double") / col("__tw").cast("double"), 6)
          .as("share_of_total"))
  }

  /** TOP-N + '(other)' rollup — the cardinality cap every dashboard
    * and report applies before a long-tail dimension explodes it: the
    * `n` heaviest keys keep their own rows (ranked by weight then key,
    * so ties cannot flip buckets), everything else folds into one
    * '(other)' row at rank n+1. The top-n comes from
    * [[Batching.rankedTopK]] (TakeOrderedAndProject — per-partition
    * heaps, no single-task rank over the keyed aggregate, which is
    * dimension-sized but can itself be huge for high-cardinality
    * dimensions); the tail is a broadcast LEFT ANTI join against the
    * ≤ n winners, so neither side ever sorts globally (VERDICT r8 #4).
    *
    * Contract: `weightCol` must be integer-exact (counts, token
    * totals, cents) — the tail fold sums arbitrarily many per-key
    * weights, and float summation there would be partition-order-
    * dependent. Returns (rank, key STRING, n_rows, weight). */
  def topNOther(df: DataFrame, keyCol: String, weight: org.apache.spark.sql.Column,
                n: Int): DataFrame = {
    require(n > 0, s"n: $n")
    val agg = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"), sum(weight.cast("long")).as("weight"))
    val top = Batching
      .rankedTopK(agg, Seq(col("weight").desc, col("key")), n)
      .select(col("rank"), col("key"), col("n_rows"), col("weight"))
    // null-SAFE anti join: a NULL key can legitimately rank into the
    // top n (groupBy keeps the null group), and `Seq("key")` equality
    // would never match it — the null group would then appear BOTH as
    // its own top row and inside the '(other)' fold, double-counting.
    val other = agg
      .join(broadcast(top.select(col("key").as("__tk"))),
        col("key") <=> col("__tk"), "left_anti")
      .agg(sum("n_rows").as("n_rows"), sum("weight").as("weight"))
      .where(col("n_rows").isNotNull)
      .select(lit(n + 1).as("rank"), lit("(other)").as("key"),
        col("n_rows"), col("weight"))
    top.unionByName(other)
  }
}

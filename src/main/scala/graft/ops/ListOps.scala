package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's list utilities (vendor/jx_python/jx.py:633-645,
 * 1045-1093: pairwise, intervals, prefixes, accumulate, reverse,
 * countdown), re-expressed as distributed window transforms: the
 * reference iterates a driver-side list; here "the list" is the rows of a
 * partition in a given order, so every helper is one window function —
 * one shuffle on the partition keys, no driver materialization, which is
 * the only shape that survives 100 TB.
 *
 * PASS PARTITION KEYS AT SCALE: an empty `partition` means ONE global
 * list — a single-partition window that serializes the whole input
 * through one task. That is the reference's driver-side-list semantics
 * and is fine for query-path inputs (bounded by the 10k limit clamp),
 * but on a data-scale DataFrame it is a deliberate choice the caller
 * must make; these helpers log a warning when they see it.
 */
object ListOps {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def win(partition: Seq[Column], order: Seq[Column]) = {
    val base =
      if (partition.nonEmpty) Window.partitionBy(partition: _*)
      else {
        log.warn("ListOps called with no partition keys: the global-list " +
          "window serializes ALL rows through one task — pass `partition` " +
          "columns for data-scale inputs")
        Window.partitionBy(lit(1))
      }
    base.orderBy(order: _*)
  }

  /** [(a,b), (b,c), ...]: each row paired with its successor; the last row
    * of a partition (no successor) is dropped (reference jx.py:633-645).
    * A null VALUE mid-stream still pairs — only a missing successor drops,
    * hence the marker lead rather than lead(value). */
  def pairwise(df: DataFrame, value: Column,
               partition: Seq[Column], order: Seq[Column],
               aName: String = "a", bName: String = "b"): DataFrame = {
    val w = win(partition, order)
    df.withColumn(aName, value)
      .withColumn(bName, lead(value, 1).over(w))
      .withColumn("__has_next", lead(lit(1), 1).over(w))
      .filter(col("__has_next").isNotNull)
      .drop("__has_next")
  }

  /** (sum of all values BEFORE this row, value) — reference jx.py:1074-1082:
    * the first tuple carries 0, the value itself is never included. */
  def accumulate(df: DataFrame, value: Column,
                 partition: Seq[Column], order: Seq[Column],
                 sumName: String = "sum_before"): DataFrame = {
    val w = win(partition, order).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(sumName, coalesce(sum(value).over(w), lit(0)))
  }

  /** (rows remaining AFTER this row, value) — reference jx.py:1092-1094. */
  def countdown(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                name: String = "remaining"): DataFrame = {
    val w = win(partition, order).rowsBetween(1, Window.unboundedFollowing)
    df.withColumn(name, coalesce(count(lit(1)).over(w), lit(0L)))
  }

  /** Position each row would hold in the REVERSED list (reference
    * jx.py:1084-1090): 0 for the last row in `order`, n-1 for the first. */
  def reversePos(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                 name: String = "rev_pos"): DataFrame = {
    val w = win(partition, order).rowsBetween(1, Window.unboundedFollowing)
    df.withColumn(name, count(lit(1)).over(w))
  }

  /** Per-group values in REVERSED `order`, as one array row per group
    * (reference jx.py:1084-1090 — reverse(values) materializes the
    * reversed list; [[reversePos]] is the positional variant). One
    * group shuffle; the sort happens inside the aggregated array
    * (array_sort on the packed (order..., value) struct), so no extra
    * per-group window or secondary exchange.
    *
    * `order` must TOTALLY order rows within a group for faithful
    * reversal: because value rides the sort struct, rows tied on every
    * order key come back sorted by value (descending after the
    * reverse), not in input order — input order is not an observable a
    * distributed reversal can honor anyway. Pass a unique key (an id,
    * a (ts, id) pair) when tie order matters. */
  def reversedList(df: DataFrame, value: Column,
                   partition: Seq[Column], order: Seq[Column],
                   name: String = "reversed"): DataFrame = {
    if (partition.isEmpty)
      log.warn("reversedList with no partition keys: single global list")
    val packed = struct(
      order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
        value.as("__v"): _*)
    df.groupBy(partition: _*)
      .agg(reverse(array_sort(collect_list(packed))).as("__r"))
      .withColumn(name, col("__r").getField("__v"))
      .drop("__r")
  }

  /** Running prefix vals[0..i] as an array column (reference jx.py:1066-1072). */
  def prefixes(df: DataFrame, value: Column,
               partition: Seq[Column], order: Seq[Column],
               name: String = "prefix"): DataFrame = {
    val w = win(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(name, collect_list(value).over(w))
  }

  /** (lo, hi) pairs of width `size` covering [floor(min), ceil(max)); the
    * last pair clips to the ceiling (reference jx.py:1045-1056 — "just
    * like range(), only cooler"). Generated distributed via spark.range. */
  def intervals(spark: SparkSession, min: Double, max: Double, size: Long = 1L): DataFrame = {
    require(size > 0, s"intervals: size must be positive, got $size") // review r9
    val lo = math.floor(min).toLong
    val hi = math.ceil(max).toLong
    val n = math.max(0L, (hi - lo + size - 1) / size)
    spark.range(n).select(
      (lit(lo) + col("id") * size).as("lo"),
      least(lit(lo) + (col("id") + 1) * size, lit(hi)).as("hi"))
  }
}

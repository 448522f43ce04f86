package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Fixed-size batch chunking in a total order (reference
 * jx_python/group_by.py:87-182 "groupby_size"/"groupby_min_max_size").
 *
 * [[chunkBySize]] uses a single-partition window — correct and fine for
 * driver-side batch enumeration (its reference use). [[chunkBySizeScaled]]
 * is the data-scale path: range-partition on the order key, count rows
 * per partition (one tiny action), broadcast the per-partition offsets,
 * and add them to per-partition row numbers — a distributed prefix sum,
 * no global shuffle to one task.
 */
object Batching {
  def chunkBySize(df: DataFrame, orderCol: String, size: Int, out: String = "chunk"): DataFrame =
    df.withColumn(out,
      ((row_number().over(Window.orderBy(col(orderCol))) - 1) / size).cast("long"))

  /** Distributed equivalent of [[chunkBySize]] for data-scale inputs:
    * identical chunk ids for a unique `orderCol`, but the global rank
    * comes from `zipWithIndex` over ONE range-partitioned, in-partition-
    * sorted RDD — no single-partition window. zipWithIndex's internal
    * count job and the subsequent map share the SAME shuffle output
    * (RDD shuffle reuse), so the partitioning cannot drift between the
    * two passes — re-deriving it from two DataFrame jobs can, because
    * each job re-samples the range boundaries. */
  def chunkBySizeScaled(df: DataFrame, orderCol: String, size: Int,
                        out: String = "chunk", parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.LongType, nullable = false))
    val withChunk = ranged.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i / size))
    }
    df.sparkSession.createDataFrame(withChunk, schema)
  }

  /** Distributed per-key rank: the 0-based position of each row within its
    * `keyCol` group under `order` — equal to
    * `row_number().over(Window.partitionBy(keyCol).orderBy(order)) - 1`,
    * but NO single task ever sorts a whole key group (the window form
    * serializes each group through one task — at 100 TB a "group" can be a
    * full day of keys). Same distributed-prefix-sum shape as
    * [[chunkBySizeScaled]]: range-partition on (key, order), sort within
    * partitions, count rows per (partition, key) — bounded, because range
    * partitioning keeps each key's rows in one contiguous partition band,
    * so there are at most `parts + distinctKeys` count entries — then
    * broadcast the per-(partition, key) offsets and add them to local
    * positions. Both passes run over the SAME shuffled RDD, so the
    * sampled range boundaries cannot drift between them.
    *
    * DRIVER-MEMORY BOUND: the offsets map is collected to the driver and
    * broadcast, so its `parts + distinctKeys` size is a real bound, not a
    * footnote — day-granularity buckets give thousands of entries, but a
    * `Seconds(n)` axis over years gives millions. A cheap
    * `approx_count_distinct` probe (one aggregate over the pruned key
    * column) guards this: above `maxOffsetKeys` estimated keys the rank
    * falls back to the per-key WINDOW — sound in exactly that regime,
    * because many distinct keys over the same row count means each key
    * group is small, which is the case the window handles well (it only
    * degenerates when one task sorts a huge single group). The two paths
    * assign identical ranks (asserted in OpsSpec).
    *
    * DETERMINISM: ranks among rows tied on all of (`keyCol`, `order`) are
    * arbitrary AND may differ between fault-replayed recomputations of a
    * lost partition — end `order` with a unique column (Extract's idField
    * satisfies this) whenever downstream persists derived keys. */
  def rankWithinScaled(df: DataFrame, keyCol: String, order: Seq[org.apache.spark.sql.Column],
                       out: String = "rank", parts: Int = 0,
                       maxOffsetKeys: Long = 1L << 20): DataFrame = {
    val spark = df.sparkSession
    val approxKeys = df.agg(approx_count_distinct(col(keyCol))).head().getLong(0)
    if (approxKeys > maxOffsetKeys)
      return df.withColumn(out,
        (row_number().over(Window.partitionBy(col(keyCol)).orderBy(order: _*)) - 1).cast("long"))
    val n = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: order
    val ranged = df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.LongType, nullable = false))
    val keyIdx = ranged.schema.fieldIndex(keyCol)
    val rdd = ranged.rdd
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap[Any, Long]()
      it.foreach { r => val k = r.get(keyIdx); m.update(k, m.getOrElse(k, 0L) + 1L) }
      m.iterator.map { case (k, c) => (pid, k, c) }
    }.collect()
    val offsets: Map[(Int, Any), Long] =
      counts.groupBy(_._2).iterator.flatMap { case (k, cs) =>
        var acc = 0L
        cs.sortBy(_._1).map { case (pid, _, c) =>
          val entry = ((pid, k), acc); acc += c; entry
        }
      }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[Any, Long]()
      it.map { r =>
        val k = r.get(keyIdx)
        val i = local.getOrElse(k, 0L); local.update(k, i + 1L)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (bc.value((pid, k)) + i))
      }
    }
    spark.createDataFrame(rows, schema)
  }
}

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
}

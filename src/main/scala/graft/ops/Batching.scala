package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Fixed-size batch chunking in a total order (reference
 * jx_python/group_by.py:87-182 "groupby_size"/"groupby_min_max_size").
 *
 * The global row_number is a single-partition window — correct and fine
 * for driver-side batch enumeration (its reference use); for data-scale
 * batching prefer the arithmetic coordinates in [[graft.etl.Extract]],
 * which partition by a duration bucket first.
 */
object Batching {
  def chunkBySize(df: DataFrame, orderCol: String, size: Int, out: String = "chunk"): DataFrame =
    df.withColumn(out,
      ((row_number().over(Window.orderBy(col(orderCol))) - 1) / size).cast("long"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data LAYOUT tools for multi-dimensional scan pruning at 100 TB.
  *
  * A single-column sort gives parquet row-group min/max pruning on that
  * column only: a billion-row table sorted by date answers date
  * predicates from a handful of files but scans everything for a
  * user-id predicate. Interleaving the bits of two (quantized) columns
  * into one Morton key and sorting by THAT makes every output file
  * cover a compact box in both dimensions — min/max stats then prune on
  * either column (the lakehouse OPTIMIZE ZORDER shape, Delta/Iceberg).
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative integer columns,
    * `bits` low bits each (values must fit — quantize/bucket first):
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Pure
    * integer Column arithmetic — codegen'd in the scan, engine-portable
    * (the oracle replays it with shifts in SQL). */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits: $bits")
    val lim = 1L << bits
    def checked(c: Column) =
      // a value outside [0, 2^bits) would interleave only its low bits
      // — distinct coordinates would collide and every file's box would
      // silently stop being compact, which is the one property this op
      // exists for. Fail the job loudly instead (codegen'd row check).
      when(c.cast("long") >= 0 && c.cast("long") < lim, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"zValue: input out of [0, $lim): "), c.cast("string"))))
    val (al, bl) = (checked(a), checked(b))
    (0 until bits).map { i =>
      shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Write `df` Z-ORDERED on (aCol, bCol): range-partition on the
    * Morton key into `files` output files, sort within each — every
    * file covers a compact (a, b) box, so row-group stats prune on BOTH
    * columns. One range shuffle; the key is dropped before the write. */
  def zOrderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
                  files: Int = 8, bits: Int = 21): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

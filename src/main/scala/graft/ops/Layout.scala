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

  /** N-COLUMN Morton interleave — [[zValue]] generalized to any
    * dimension count (OPTIMIZE ZORDER takes arbitrarily many columns):
    * bit i of column k lands at position i·n + (n−1−k), so earlier
    * columns take the higher bit within each group. n·bits must fit a
    * signed long (≤ 62). Same checked-range contract and pure integer
    * Column arithmetic as the 2-D form. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"need >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be <= 62: $n x $bits")
    val lim = 1L << bits
    def checked(c: Column) =
      when(c.cast("long") >= 0 && c.cast("long") < lim, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"zValueN: input out of [0, $lim): "), c.cast("string"))))
    val longs = cols.map(checked)
    (for {
      i <- 0 until bits
      (c, k) <- longs.zipWithIndex
    } yield shiftright(c, i).bitwiseAND(lit(1L)) *
        lit(1L << (i * n + (n - 1 - k)))
    ).reduce(_ + _)
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

  /** Size-adaptive output partition count for a frame about to be
    * written: ⌈estimated bytes / targetFileBytes⌉, clamped to [1, cap]
    * (r14, guide §6 — output files belong in the 100 MB-1 GB band; a
    * KB-scale snapshot has no business leaving 32 task-sized files
    * whose per-file open cost its every future reader then pays). The
    * estimate is the optimizer's plan-stats size — in-memory-biased
    * (strings overshoot parquet ~2-4×), which errs toward MORE files,
    * the safe direction. Pair with `coalesce`: a frame already
    * narrower than the target is left alone (coalesce never raises
    * partition counts), so scan parallelism is preserved at scale. */
  def sizedWritePartitions(df: DataFrame, targetFileBytes: Long,
                           cap: Int = 1 << 20): Int = {
    require(targetFileBytes > 0, s"targetFileBytes: $targetFileBytes")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (est + targetFileBytes - 1) / targetFileBytes
    n.max(1).min(cap).toInt
  }

  /** File count + total bytes of a directory's parquet files (recursive
    * Hadoop FS listing — works on any FileSystem scheme, local or
    * object store). */
  def parquetFootprint(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  final case class CompactStats(filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long)

  /** SMALL-FILE COMPACTION — the lakehouse OPTIMIZE shape. Streaming
    * sinks, per-batch incremental writes, and over-partitioned jobs
    * leave thousands of KB-scale files behind; at 100 TB the metadata
    * and open-file overhead of a scan then dominates the read (every
    * file costs a task, a footer fetch, and an object-store request).
    * Rewrite the directory into ⌈bytes / targetFileBytes⌉ files: a
    * plain round-robin repartition when no order is given (pure
    * coalescing), or a range-partitioned sorted rewrite when `order`
    * is — compaction is the natural moment to (re)establish a
    * clustering, since the data is being rewritten anyway (the
    * OPTIMIZE ... ZORDER composition; [[zOrderWrite]] is the
    * 2-dimensional sibling). Content is byte-identical either way —
    * only the file layout changes. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long,
              order: Seq[String] = Nil): CompactStats = {
    require(targetFileBytes > 0, s"targetFileBytes: $targetFileBytes")
    val (n0, bytes) = parquetFootprint(spark, inPath)
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    val laid =
      if (order.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, order.map(col): _*)
        .sortWithinPartitions(order.map(col): _*)
    laid.write.mode("overwrite").parquet(outPath)
    val (n1, _) = parquetFootprint(spark, outPath)
    CompactStats(n0, bytes, n1)
  }
}

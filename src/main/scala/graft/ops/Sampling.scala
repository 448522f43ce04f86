package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling and split assignment for
 * training-data pipelines. Both are pure Column algebra over md5 of a
 * stable key — no RNG state, no driver coordination:
 *
 *  - the SAME row lands in the SAME split on every run, on every engine,
 *    at every scale (md5 is bytewise-identical everywhere, unlike
 *    engine-native hash functions or seeded per-partition RNGs, whose
 *    draws depend on partitioning);
 *  - adding/removing OTHER rows never moves a row between splits
 *    (per-row hash, not rank-based) — the property that keeps eval sets
 *    stable as a corpus grows;
 *  - runs codegen'd inside the scan: at 100 TB split assignment is a
 *    free projection, never a shuffle.
 *
 * Granularity is the first two hex digits (1/256 ≈ 0.4%); use more hex
 * digits via `hexPrefixLen` when finer fractions are needed.
 */
object Sampling {

  /** First `hexPrefixLen` lowercase-hex chars of md5(key) — the bucket
    * string both Spark and any SQL engine order identically. */
  def hashBucket(key: Column, hexPrefixLen: Int = 2): Column =
    substring(md5(key.cast("string")), 1, hexPrefixLen)

  /** Deterministic ~`fraction` sample: keep rows whose 2-hex-digit
    * bucket falls below ceil(fraction·256). Exact expectation over the
    * hash distribution, exact determinism over reruns. */
  def sampleByHash(key: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction: $fraction")
    val cut = math.min(256, math.ceil(fraction * 256).toInt)
    // cut = 256 formats as "100", which sorts BELOW "10".."ff" — the
    // full-sample case must short-circuit, not compare
    if (cut >= 256) lit(true) else hashBucket(key) < lit(f"$cut%02x")
  }

  /** Multilingual TEMPERATURE resampling (mT5/XLM-R style, fixed τ=2):
    * downsample each class (language) with keep-probability
    * `sqrt(n_min / n_class)` — head classes shrink toward the √ of
    * their excess, the smallest class keeps everything. Deterministic
    * via the md5 bucket of `key`, so reruns and engines agree row-for-
    * row. τ=2 specifically because every step (count ratio, sqrt,
    * ×256) is an IEEE correctly-rounded operation — bit-identical in
    * any engine, so the per-class cut can be reproduced in oracle SQL.
    * General-τ would need `pow`, whose last ULP is libm-dependent.
    * Shape: tiny per-class count agg → broadcast cuts → filter in the
    * scan. One partial-aggregating count pass; no window, no repartition
    * of the corpus. */
  def temperatureResample(df: org.apache.spark.sql.DataFrame, classCol: String,
                          key: Column): org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val nMin = min(col("__n")).over(org.apache.spark.sql.expressions.Window
      .partitionBy())
    // the all-rows window over the TINY counts frame, not the corpus
    val cuts = counts.withColumn("__cut",
      ceil(sqrt(nMin.cast("double") / col("__n").cast("double")) * 256.0).cast("int"))
    df.join(broadcast(cuts.select(col(classCol), col("__cut"))), classCol)
      .where(col("__cut") >= 256 ||
        hashBucket(key) < format_string("%02x", col("__cut")))
      .drop("__cut")
  }

  /** Per-group TOKEN-BUDGET take: walk each group in `orderCol` order
    * and keep rows while the running token total stays within `budget`
    * (the first over-budget row is excluded). One shuffle on the group
    * key; rows of a group sort within their task. For FEW, HUGE groups
    * prefer a two-level prefix sum (see Batching.prefixSumScaled) —
    * this window form serializes each group through one task. */
  def budgetTake(df: org.apache.spark.sql.DataFrame, groupCol: String,
                 orderCol: String, tokens: Column, budget: Long,
                 out: String = "running_tokens"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn(out, sum(tokens).over(w))
      .where(col(out) <= budget)
  }

  /** Deterministic STRATIFIED take: the first `n` rows of each class
    * under the md5-hash order of the row key — a uniform per-class
    * sample that is engine-reproducible and partitioning-independent
    * (same members every run, every engine). Ranking within class runs
    * through [[Batching.rankWithinScaled]]: strata are typically FEW and
    * HUGE — exactly the shape where a per-class window serializes each
    * class through one task — and the hash order ends in the unique row
    * key, satisfying the rank's total-order determinism contract. */
  def stratifiedTake(df: org.apache.spark.sql.DataFrame, classCol: String,
                     keyCol: String, n: Long): org.apache.spark.sql.DataFrame =
    Batching.rankWithinScaled(df, classCol,
        Seq(md5(col(keyCol).cast("string")), col(keyCol)), out = "__r")
      .where(col("__r") < n).drop("__r")

  /** Deterministic DOMAIN-MIXTURE take — the re-weighting step that hits
    * a target domain mix (e.g. 50% en / 20% zh / …): the first
    * `quotas(class)` rows of each class under the md5-hash order of the
    * row key. Classes absent from `quotas` are dropped; a quota larger
    * than a class keeps that whole class (the caller sees the shortfall
    * in the output counts). Same engine-reproducibility and few-huge-
    * strata scale shape as [[stratifiedTake]]. */
  def mixtureTake(df: org.apache.spark.sql.DataFrame, classCol: String,
                  keyCol: String, quotas: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 0), s"quotas: $quotas")
    val in = df.where(col(classCol).isin(quotas.keys.toSeq: _*))
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (k, n)) =>
      when(col(classCol) === k, lit(n)).otherwise(acc)
    }
    Batching.rankWithinScaled(in, classCol,
        Seq(md5(col(keyCol).cast("string")), col(keyCol)), out = "__r")
      .where(col("__r") < quota).drop("__r")
  }

  /** Deterministic weighted source INTERLEAVE — the mixing SCHEDULE step
    * of corpus assembly (a quota take fixes how much of each source; this
    * fixes the ORDER the training run consumes them in, so every stretch
    * of the stream holds the target mix): stride scheduling (Waldspurger
    * & Weihl, OSDI '95). Source s with integer weight `parts(s)` emits
    * its i-th row (0-based, md5 order of the row key) at virtual time
    * `(i+1) · (L / parts(s))` with `L = lcm(parts)` — ALL integer
    * arithmetic, so the schedule is engine-exact, partitioning-
    * independent, and stable as the corpus grows (a row's slot depends
    * only on its own per-source rank). Rows of sources absent from
    * `parts` are dropped.
    *
    * Returns the input plus `mix_vt`; the materialized order is
    * (mix_vt, source, key) — a range-partitioned sort, NOT a global
    * row_number (which would serialize the corpus through one task).
    * Per-source ranks ride [[Batching.rankWithinScaled]] (few huge
    * sources = the per-key window's worst case). */
  def interleaveByStride(df: org.apache.spark.sql.DataFrame, sourceCol: String,
                         keyCol: String, parts: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0), s"parts: $parts")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = parts.values.reduce((a, b) => a / gcd(a, b) * b)
    val in = df.where(col(sourceCol).isin(parts.keys.toSeq: _*))
    val stride = parts.foldLeft(lit(0L)) { case (acc, (k, p)) =>
      when(col(sourceCol) === k, lit(l / p)).otherwise(acc)
    }
    Batching.rankWithinScaled(in, sourceCol,
        Seq(md5(col(keyCol).cast("string")), col(keyCol)), out = "__r")
      .withColumn("mix_vt", (col("__r") + lit(1L)) * stride)
      .drop("__r")
  }

  /** Train/val/test assignment from cumulative weight cutoffs over the
    * 256-bucket space, e.g. `splitAssign(col, Seq("train" -> 0.8,
    * "val" -> 0.1, "test" -> 0.1))`. Weights are normalized; cutoffs
    * round UP to 1/256 granularity (an 80/10/10 split cuts at buckets
    * 0xcd and 0xe7 → 205/26/25 buckets). */
  def splitAssign(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"splits: $splits")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val bucket = hashBucket(key)
    val cases = splits.zip(cuts).dropRight(1).map { case ((name, _), cut) =>
      (name, f"${math.min(256, math.ceil(cut * 256).toInt)}%02x")
    }
    cases.foldRight(lit(splits.last._1): Column) { case ((name, hex), rest) =>
      when(bucket < lit(hex), name).otherwise(rest)
    }
  }
}

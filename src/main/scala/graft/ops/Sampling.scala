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

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis
    * 2006): each row draws key uᵢ^(1/wᵢ) and the k largest keys are
    * the sample — provably the same distribution as sequential
    * weighted draws without replacement, embarrassingly parallel.
    * u is the deterministic md5-derived uniform ((first-8-hex + 1) /
    * (2³² + 1) ∈ (0, 1]) — reruns and engines agree row-for-row, the
    * [[sampleByHash]] convention. Ordering uses the monotone-
    * equivalent ln(u)/w (avoids `pow`, halving the libm surface; ln's
    * ULP drift could only flip two keys within ~1e-16 of each other —
    * below the hash keyspace's granularity). Non-positive and null
    * weights are excluded (zero weight = never sampled, the ES
    * convention).
    *
    * Shape at scale: the key is computed IN the scan and the global
    * top-k plans as TakeOrderedAndProject (per-partition heaps + one
    * k-row merge — no global sort, no shuffle of the corpus); the rank
    * window runs over k rows. Returns (rank, id, weight). */
  def weightedTake(df: org.apache.spark.sql.DataFrame, idCol: String,
                   weightCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k: $k")
    import org.apache.spark.sql.expressions.Window
    val w = col(weightCol).cast("double")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967297.0
    val keyed = df.where(w.isNotNull && w > 0)
      .select(col(idCol).as("id"), w.as("weight"), (log(u) / w).as("__key"))
      .orderBy(col("__key").desc, col("id")).limit(k)
    keyed.withColumn("rank",
        row_number().over(Window.orderBy(col("__key").desc, col("id"))))
      .select(col("rank"), col("id"), col("weight"))
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

  /** PREFERENCE-PAIR assembly — the data-prep step of preference-based
    * tuning (DPO/RLHF reward modeling): per group (prompt id, or any
    * partition of candidate responses), emit ONE (chosen, rejected)
    * pair — the argmax and argmin of `score`, ties broken by the
    * largest/smallest id so the pair is deterministic. Groups where
    * chosen == rejected (a single candidate, or all scores+ids equal)
    * produce no pair.
    *
    * One groupBy on the group key carrying two struct-ordered
    * aggregates (max/min of (score, id) — lexicographic struct
    * comparison gives score-then-id argmax with partial aggregation,
    * so the map side combines before the shuffle). At 100 TB this is
    * a single keyed shuffle of small aggregate state; no window, no
    * self-join. */
  def preferencePairs(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      idCol: String, score: Column): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol).as("__g"), col(idCol).as("__id"), score.as("__s"))
      .where(col("__s").isNotNull)
      .groupBy(col("__g"))
      .agg(max(struct(col("__s"), col("__id"))).as("__hi"),
        min(struct(col("__s"), col("__id"))).as("__lo"))
      .where(col("__hi.__id") =!= col("__lo.__id"))
      .select(col("__g").as(groupCol),
        col("__hi.__id").as("chosen_id"), col("__hi.__s").as("chosen_score"),
        col("__lo.__id").as("rejected_id"), col("__lo.__s").as("rejected_score"))

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
    // multiplyExact: large coprime parts (raw token counts used as
    // weights) overflow the lcm silently otherwise — negative strides,
    // garbage interleave order, no error (review r9). Normalize such
    // weights to small integer ratios before calling.
    val l = parts.values.reduce((a, b) =>
      try Math.multiplyExact(a / gcd(a, b), b)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"interleaveByStride: lcm of parts overflows Long ($parts) — " +
          "reduce the part values to small coprime ratios") })
    val in = df.where(col(sourceCol).isin(parts.keys.toSeq: _*))
    val stride = parts.foldLeft(lit(0L)) { case (acc, (k, p)) =>
      when(col(sourceCol) === k, lit(l / p)).otherwise(acc)
    }
    Batching.rankWithinScaled(in, sourceCol,
        Seq(md5(col(keyCol).cast("string")), col(keyCol)), out = "__r")
      .withColumn("mix_vt", (col("__r") + lit(1L)) * stride)
      .drop("__r")
  }

  /** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every document by how target-like its
    * hashed n-gram profile is,
    *
    *   log w(x) = Σ_g [ ln p̂_tgt(b(g)) − ln p̂_raw(b(g)) ]
    *
    * over word unigrams+bigrams of the lowercased token stream, each
    * hashed to one of 16^`bucketHexLen` buckets by md5 prefix (the
    * paper's hashed n-gram features; md5 so bucket assignment is
    * engine-portable, like every hash in this file). Bucket
    * probabilities are add-one smoothed: p̂(b) = (n_b + 1) / (N + B).
    * `isTarget` marks the in-frame rows that act as the target corpus
    * (a quality/language gate in practice); the raw model is the whole
    * frame.
    *
    * Shape at 100 TB: both models fit in ONE pass as a ≤B-row aggregate
    * (map-side combined) and come back as a BROADCAST join — the corpus
    * explodes to (doc, gram) pairs only inside the scan stage and
    * re-aggregates per doc, so the only corpus-sized shuffle is the
    * per-doc combine on `idCol`. Nothing is collected to the driver.
    *
    * Returns one row per input doc: `n_grams`, `sum_tgt`, `sum_raw`
    * (pure-integer model inputs — sums over the doc's gram instances of
    * the matching bucket counts; these pin feature hashing AND both
    * models, and are what an exact-hash oracle should compare) plus
    * `dsir_score` = log w(x) (a double: libm `ln` differs by ULPs across
    * engines, so it belongs in tolerance specs, never exact hashes). */
  def dsirScores(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, isTarget: Column,
                 bucketHexLen: Int = 3): org.apache.spark.sql.DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 8, s"bucketHexLen: $bucketHexLen")
    val buckets = math.pow(16.0, bucketHexLen.toDouble) // B in the smoothing
    val toks = df.select(col(idCol), isTarget.as("__tgt"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      // attribute-first (see ngramsFromTokens): __t is a materialized
      // column, so the gram lambdas reference it instead of re-inlining
      // the tokenizer per element
      .withColumn("__grams",
        concat(col("__t"), TextAnalysis.ngramsFromTokens(col("__t"), 2)))
    val hashed = toks
      .select(col(idCol), col("__tgt"), explode(col("__grams")).as("__g"))
      .withColumn("__b", substring(md5(col("__g")), 1, bucketHexLen))
    val model = hashed.groupBy(col("__b")).agg(
      count(when(col("__tgt"), 1)).as("__tgt_n"),
      count(lit(1)).as("__raw_n"))
    val totals = model.agg(
      sum(col("__tgt_n")).as("__tgt_total"), sum(col("__raw_n")).as("__raw_total"))
    val perDoc = hashed
      .join(broadcast(model), "__b")
      .crossJoin(broadcast(totals)) // 1 row: the smoothing denominators
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("__tgt_n")).as("sum_tgt"),
        sum(col("__raw_n")).as("sum_raw"),
        sum(log((col("__tgt_n") + 1).cast("double") / (col("__tgt_total") + buckets))
          - log((col("__raw_n") + 1).cast("double") / (col("__raw_total") + buckets)))
          .as("dsir_score"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_tgt"), lit(0L)).as("sum_tgt"),
        coalesce(col("sum_raw"), lit(0L)).as("sum_raw"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** The RESAMPLE step of DSIR: top-`k` docs by importance score
    * (deterministic tie-break on the id). Spark's sort+limit plans as a
    * distributed TakeOrdered — per-partition top-k then a k-row merge,
    * never a global sort of the corpus. */
  def dsirTake(df: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, isTarget: Column, k: Int,
               bucketHexLen: Int = 3): org.apache.spark.sql.DataFrame =
    dsirScores(df, idCol, textCol, isTarget, bucketHexLen)
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(k)

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
      (name, math.min(256, math.ceil(cut * 256).toInt))
    }
    cases.foldRight(lit(splits.last._1): Column) { case ((name, cut), rest) =>
      // a cut of 256 covers the whole bucket space — it must short-
      // circuit to TRUE, not format as 3-char hex "100", which would
      // string-compare BELOW every 2-char bucket ≥ "11" and silently
      // invert the split (review r9: ("train" -> 0.999, "test" -> 0.001)
      // rounds the first cut up to 256)
      val cond = if (cut >= 256) lit(true) else bucket < lit(f"$cut%02x")
      when(cond, name).otherwise(rest)
    }
  }

  /** Token-BUDGET allocation across sources under an epoch cap — the
    * mixture-design arithmetic of corpus recipes ("how many epochs of
    * each source fill the budget"): proportional-to-weight WATER
    * FILLING. Each round gives every uncapped source
    * `floor(budget_remaining · w / Σ_uncapped w)` more tokens, clamped
    * at its cap (`tokens · maxEpochs`); sources that hit their cap
    * drop out and their share redistributes next round. `rounds`
    * bounds the iteration (each round retires ≥1 capped source or
    * terminates, so `rounds` = expected distinct cap tiers; leftover
    * from floor rounding / all-capped states is reported, not lost).
    * All long arithmetic except the weight shares — deterministic and
    * SQL-replayable. Input: (source, tokens, weight) rows. Output:
    * (source, tokens, cap, alloc, epochs 6 dp). Sources×rounds frame
    * sizes — driver-free but trivially small; the point is the
    * deterministic recipe, not scale. */
  def budgetAllocate(counts: org.apache.spark.sql.DataFrame, budget: Long,
                     maxEpochs: Double, rounds: Int = 3): org.apache.spark.sql.DataFrame = Pinned.guard {
    require(budget >= 0 && maxEpochs > 0 && rounds >= 1)
    // a null or non-positive weight must fail fast: Spark's least() SKIPS
    // nulls, so a null share would silently hand the source its FULL
    // cap and blow the budget
    val w0 = col("weight").cast("double")
    // per-round Pinned checkpoint: each round embeds the previous frame
    // TWICE (totals + crossJoin), so lazily the input lineage
    // re-executes up to 2^rounds times — q_budget_mix's input is a
    // corpus-wide token count. Every round releases its predecessor
    // once the new pin materializes; the result is slot-held (the
    // Graph r8 lesson: unreleased per-round pins stack across runs).
    var (cur, curH) = Pinned.checkpoint(
      counts.select(col("source"), col("tokens").cast("long").as("tokens"),
        when(w0.isNull || w0 <= 0.0,
          raise_error(concat(lit("budgetAllocate: non-positive weight for source "),
            col("source").cast("string")))).otherwise(w0).as("weight"),
        floor(col("tokens") * maxEpochs).cast("long").as("cap"),
        lit(0L).as("alloc")))
    for (_ <- 1 to rounds) {
      val tot = cur.agg(
        sum(when(col("alloc") < col("cap"), col("weight"))).as("__wsum"),
        (lit(budget) - sum("alloc")).as("__rem"))
      val (nc, ncH) = Pinned.checkpoint(cur.crossJoin(broadcast(tot))
        .withColumn("__add",
          when(col("alloc") < col("cap") && col("__wsum") > 0.0,
            least(col("cap") - col("alloc"),
              floor(col("__rem") * col("weight") / col("__wsum")).cast("long")))
            .otherwise(0L))
        .select(col("source"), col("tokens"), col("weight"), col("cap"),
          (col("alloc") + col("__add")).as("alloc")))
      Pinned.release(curH)
      cur = nc; curH = ncH
    }
    val out = Pinned.hold("sampling.budget",
      cur.select(col("source"), col("tokens"), col("cap"), col("alloc"),
        round(col("alloc") / col("tokens"), 6).as("epochs")))
    Pinned.release(curH)
    out
  }

  /** RENDEZVOUS (highest-random-weight) routing — the stable shard
    * assignment behind consistent partition maps: each key goes to the
    * shard maximizing md5(shard ‖ ':' ‖ key), so adding or removing a
    * shard moves ONLY the keys whose winner changed (~1/N of them —
    * the minimal-disruption law, spec-pinned), where mod-N hashing
    * reshuffles nearly everything. Pure scan-stage Column algebra: the
    * shard list unrolls to a greatest() over |shards| literal hashes —
    * no join, no shuffle, engine-portable md5. Returns the input plus
    * `shard`. */
  def rendezvousAssign(df: org.apache.spark.sql.DataFrame, keyCol: String,
                       shards: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(shards.nonEmpty && shards.distinct == shards, s"shards: $shards")
    val scored = shards.map { sh =>
      struct(md5(concat(lit(sh), lit(":"), col(keyCol).cast("string"))).as("h"),
        lit(sh).as("s"))
    }
    val winner =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    df.withColumn("shard", winner.getField("s"))
  }

  /** LARGEST-REMAINDER (Hamilton) apportionment — split an integer
    * budget across keys proportionally to integer weights with NO
    * fractional drift: base = ⌊total·w/S⌋ via EXACT remainder
    * arithmetic (subtract `pmod` first, so the one division is evenly
    * divisible and float-exact; a naive floor(a/b) on a correctly-
    * rounded double can land on the wrong side when a/b grazes an
    * integer), then the `total − Σbase` leftover units go to the
    * largest remainders (ties → smaller key — deterministic at any
    * partitioning). Σalloc = total by construction (law-spec'd). The
    * rank window runs over the KEY-sized frame. Returns
    * (key, weight, base, remainder, alloc). */
  def apportion(df: org.apache.spark.sql.DataFrame, keyCol: String,
                weightCol: String, total: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(total >= 0, s"total: $total")
    val w = df.select(col(keyCol).as("key"), col(weightCol).cast("long").as("weight"))
      .where(col("weight") > 0)
    val s = w.agg(sum("weight").as("__s"))
    val based = w.crossJoin(broadcast(s))
      .select(col("key"), col("weight"),
        pmod(lit(total) * col("weight"), col("__s")).as("remainder"),
        ((lit(total) * col("weight") - pmod(lit(total) * col("weight"), col("__s"))) /
          col("__s")).cast("long").as("base"))
    val leftover = based.agg((lit(total) - sum("base")).as("__left"))
    based
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("remainder").desc, col("key"))))
      .crossJoin(broadcast(leftover))
      .select(col("key"), col("weight"), col("base"), col("remainder"),
        (col("base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L)).as("alloc"))
  }
}

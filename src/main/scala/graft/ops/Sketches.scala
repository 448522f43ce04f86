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
 *  1. each partition feeds a Misra-Gries summary of at most `k`
 *     counters (Misra & Gries 1982, "Finding repeated elements");
 *  2. summaries MERGE pairwise up a treeAggregate without losing the
 *     guarantee (mergeable summaries, Agarwal/Cormode/Huang/Phillips/
 *     Wei/Yi 2012: combine counts, then subtract the (k+1)-th largest
 *     and drop non-positives), so the driver receives ONE k-counter
 *     summary no matter how many partitions ran — total undercount of
 *     any key stays ≤ N/(k+1), hence any key with global frequency
 *     > N/k survives as a candidate;
 *  3. the ≤ k candidates broadcast back and only rows matching one are
 *     counted exactly — the tail never shuffles, and false candidates
 *     die on the exact `minFreq` filter.
 *
 * Exactness therefore requires `minFreq > N/k`; the operator counts N
 * during the sketch pass and REFUSES (IllegalArgumentException) rather
 * than silently under-report when the bound fails — size `k` to the
 * target threshold (k ≳ N/minFreq), not to the expected answer size.
 */
object Sketches {

  /** Mergeable Misra-Gries summary: at most `k` counters + the count of
    * non-null elements seen. Package-private for the law tests. */
  private[ops] final class MgSummary(val k: Int) extends Serializable {
    val counters = new java.util.HashMap[String, Long](k * 2)
    var n = 0L

    def add(s: String): this.type = {
      if (s != null) {
        n += 1
        val cur = counters.getOrDefault(s, 0L)
        if (cur > 0L) counters.put(s, cur + 1L)
        else if (counters.size < k) counters.put(s, 1L)
        else decrementAll(1L) // the arriving element is absorbed by the group decrement
      }
      this
    }

    /** Merge `o` in: sum shared counters, then reduce back to ≤ k by
      * subtracting the (k+1)-th largest count (Agarwal et al. 2012 §3.1
      * — the reduction that keeps the ≤ N/(k+1) undercount bound). */
    def merge(o: MgSummary): this.type = {
      n += o.n
      val it = o.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        counters.put(e.getKey, counters.getOrDefault(e.getKey, 0L) + e.getValue)
      }
      if (counters.size > k) {
        val counts = new Array[Long](counters.size)
        var i = 0
        val vs = counters.values().iterator()
        while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
        java.util.Arrays.sort(counts)
        decrementAll(counts(counts.length - k - 1))
      }
      this
    }

    private def decrementAll(by: Long): Unit = {
      val iter = counters.entrySet().iterator()
      while (iter.hasNext) {
        val e = iter.next()
        if (e.getValue <= by) iter.remove() else e.setValue(e.getValue - by)
      }
    }

    def keys: Array[String] = counters.keySet.toArray(Array.empty[String])
  }

  /** EXACT keys with frequency ≥ `minFreq`, computed with bounded state:
    * a tree-merged Misra-Gries sketch yields ≤ k candidates (the driver
    * never holds more, at any partition count), then an exact recount of
    * candidate-matching rows behind a broadcast semi-join — the long
    * tail of rare keys never shuffles. Null keys are ignored (JX missing
    * semantics: a missing key has no frequency). Returns
    * (`keyCol`, `out`) with `keyCol` in its ORIGINAL type — the sketch
    * counters key on the string rendering, but the recount groups the
    * original column, so joining the result back needs no cast.
    * Unordered — callers order. Requires `minFreq > N/k` (checked at
    * runtime, see the object scaladoc).
    *
    * INPUT DETERMINISM: `df` is scanned twice (sketch pass, exact
    * recount) WITHOUT an intermediate materialization — persisting the
    * key projection here would write the full corpus working set, which
    * is exactly what the bounded-state design avoids at 100 TB. A
    * non-deterministic input (unseeded sample/limit, a mutating view)
    * can therefore make the two passes disagree, silently voiding the
    * exactness claim — persist such inputs upstream first. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, minFreq: Long,
                   out: String = "freq"): DataFrame = {
    require(k > 0, s"k: $k")
    require(minFreq > 0, s"minFreq: $minFreq")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol)).where(col(keyCol).isNotNull)
    val summary = keys.select(col(keyCol).cast("string")).rdd.treeAggregate(new MgSummary(k))(
      (s, row) => s.add(row.getString(0)), (a, b) => a.merge(b))
    if (minFreq.toDouble <= summary.n.toDouble / k)
      throw new IllegalArgumentException(
        s"minFreq=$minFreq does not exceed N/k=${summary.n}/$k=${summary.n / k}: " +
          s"a key above the threshold could evade the sketch; " +
          s"raise k to at least ${summary.n / minFreq + 1}")
    val candDf = broadcast(
      spark.createDataset(summary.keys.toSeq)(Encoders.STRING).toDF("__hh_cand"))
    keys.join(candDf, col(keyCol).cast("string") === col("__hh_cand"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as(out))
      .where(col(out) >= minFreq)
  }

  /** [[heavyHitters]] with `k` sized FROM the data: one cheap count of
    * the non-null keys picks k = max(minK, N/minFreq + 1), so the
    * exactness bound `minFreq > N/k` holds at ANY corpus size — a
    * fixed-k call that is correct at one scale factor throws when the
    * corpus grows past k·minFreq (ADVICE r7). Costs one extra
    * column-pruned scan; the sketch state stays bounded at N/minFreq
    * counters, which is exactly the information-theoretic floor for an
    * exact ≥ minFreq census. */
  def heavyHittersAuto(df: DataFrame, keyCol: String, minFreq: Long,
                       out: String = "freq", minK: Int = 1024): DataFrame = {
    require(minFreq > 0, s"minFreq: $minFreq")
    val n = df.select(col(keyCol)).where(col(keyCol).isNotNull).count()
    val kNeeded = n / minFreq + 1
    require(kNeeded <= Int.MaxValue, s"N/minFreq=$kNeeded exceeds Int range — raise minFreq")
    heavyHitters(df, keyCol, math.max(minK.toLong, kNeeded).toInt, minFreq, out)
  }

  /** EXACT median without a global sort — the scale answer to "what's
    * the true p50 of 10¹² rows" that `approx_percentile` only
    * approximates and `sort().limit()` can't reach: iterative histogram
    * refinement (the classic distributed selection / BFPRT-by-buckets
    * scheme). Each round is ONE full-scan aggregate producing a
    * `buckets`-row histogram of the current value range; the bucket(s)
    * holding the two middle order statistics narrow the range by
    * ~1/buckets, so 10¹² rows need ⌈log_{2048}(10¹²/collectLimit)⌉ ≈ 3
    * scans before the survivors fit `collectLimit` and one bounded
    * collect finishes exactly. Driver state per round is the histogram
    * (≤ `buckets` counters — the [[heavyHitters]] bounded-metadata
    * class), never data.
    *
    * Median semantics = mean of the two middle order statistics for
    * even N (DuckDB/NumPy `median`). Nulls and NaNs are excluded.
    * Heavy duplication is safe twice over: a range whose width
    * underflows is all one value and resolves immediately, and the
    * final collect gathers (value, count) pairs GROUPED BY VALUE — so
    * 10⁹ copies of one value land as one driver row, not 10⁹
    * (ADVICE r8: the ±bucket-width FP widening of the final range can
    * pull whole adjacent buckets of duplicate mass into the collect;
    * grouping makes the collect bounded by DISTINCT survivors, and when
    * even those exceed `collectLimit` — legitimate on continuous data —
    * each middle rank falls back to its own single-rank refinement loop
    * with exact per-round recounts, so the collect NEVER exceeds the
    * limit and correct inputs are never rejected). Returns (n, median). */
  def exactMedianTwoPass(df: DataFrame, valCol: String,
                         buckets: Int = 2048,
                         collectLimit: Int = 1 << 16): (Long, Double) = {
    require(buckets >= 2, s"buckets: $buckets")
    val vals = df.select(col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val stats = vals.agg(count(lit(1)), min("__v"), max("__v")).head()
    val n = stats.getLong(0)
    require(n > 0, s"exactMedianTwoPass: no non-null values in $valCol")
    // 0-based ranks of the two middle order statistics (equal for odd N)
    val kLo = (n - 1) / 2
    val kHi = n / 2
    var lo = stats.getDouble(1)
    var hi = stats.getDouble(2)
    var cumBase = 0L    // count of values strictly below `lo` (histogram-consistent)
    var rangeCount = n  // values in [lo, hi]
    var slack = 0.0     // last bucket width — final FP-safety margin
    var guard = 0
    // a range pinned open by heavy duplicate mass at BOTH ends (kLo in
    // one value's mass, kHi in another's) stops narrowing — every
    // further round recomputes the identical histogram, so exit as soon
    // as (lo, hi) repeats; the grouped final collect resolves it
    var prevLo = Double.NaN
    var prevHi = Double.NaN
    while (rangeCount > collectLimit && hi > lo && guard < 64 &&
           !(lo == prevLo && hi == prevHi)) {
      guard += 1
      prevLo = lo; prevHi = hi
      val width = (hi - lo) / buckets
      if (width <= 0 || width.isInfinity) { hi = lo } // underflow: all equal
      else {
        slack = width
        val idx = least(floor((col("__v") - lit(lo)) / lit(width)),
          lit(buckets - 1)).cast("int")
        val histRows = vals.where(col("__v") >= lo && col("__v") <= hi)
          .groupBy(idx.as("__b")).agg(count(lit(1)).as("__c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val counts = Array.tabulate(buckets)(i => histRows.getOrElse(i, 0L))
        // smallest bucket span covering BOTH target ranks
        var cum = cumBase; var b0 = -1; var b1 = -1
        var i = 0
        while (i < buckets) {
          val next = cum + counts(i)
          if (b0 < 0 && kLo < next) b0 = i
          if (b1 < 0 && kHi < next) b1 = i
          if (b1 < 0) cum = next
          i += 1
        }
        if (b0 < 0 || b1 < 0) {
          // FP stranding: a boundary value slipped outside the refined
          // [lo, hi] while cumBase still excludes it, so the rank walk
          // never crossed — STOP narrowing (never index counts(-1),
          // review r9); the final stage recounts `below` EXACTLY over
          // the ±width-widened range, which covers a one-rounding-step
          // escape by construction
          guard = 64
        } else {
          // recompute cumBase = count below bucket b0
          var below = cumBase; i = 0
          while (i < b0) { below += counts(i); i += 1 }
          cumBase = below
          rangeCount = (b0 to b1).map(counts).sum
          val newLo = lo + b0 * width
          val newHi = if (b1 == buckets - 1) hi else lo + (b1 + 1) * width
          lo = newLo; hi = newHi
        }
      }
    }
    // walk grouped (value, count) pairs for 0-based rank k, given the
    // EXACT count of values strictly below the collected range
    def walk(pairs: Array[(Double, Long)], below: Long, k: Long): Double = {
      var cum = below; var i = 0
      while (i < pairs.length) {
        cum += pairs(i)._2
        if (k < cum) return pairs(i)._1
        i += 1
      }
      pairs.last._1 // unreachable when bounds are exact; FP belt-and-braces
    }
    // SINGLE-RANK exact refinement — the fallback when the widened final
    // range still holds more than `collectLimit` DISTINCT values (which
    // is LEGITIMATE on continuous data: the ±width widening can triple
    // the surviving range, and the main loop's two ranks can pin a wide
    // range open when they sit in far-apart value masses). One rank
    // always lies in ONE histogram bucket, so each round shrinks the
    // range to ≤ 3 bucket widths (covering bucket ± one width of FP
    // slack) — geometric convergence that no duplicate-mass distribution
    // can stall — with the rank base recounted EXACTLY per round.
    // Distinct doubles in a span are bounded by its ulp count, so the
    // span falls below `collectLimit` distinct survivors before its
    // width can underflow; the round guard is belt-and-braces.
    def rankValue(k: Long, rLo0: Double, rHi0: Double): Double = {
      var rLo = rLo0; var rHi = rHi0
      var rounds = 0
      val nb = math.max(buckets, 16) // narrowing factor 3/nb ≪ 1
      while (true) {
        val below = vals.where(col("__v") < rLo).count()
        if (below > k) {
          // FP-stranding guard (the main loop's, mirrored — review
          // r10): rounding left the rank-k value BELOW rLo, so the
          // walk would cross at bucket 0 and silently return the
          // smallest in-range value — widen the range back down
          rounds += 1
          require(rounds <= 64,
            s"exactMedianTwoPass: rank $k stranded below [$rLo, $rHi] " +
              s"after $rounds widenings")
          rLo = rLo - math.max(rHi - rLo, math.ulp(rLo))
        } else {
          val inRange = vals.where(col("__v") >= rLo && col("__v") <= rHi)
          val head = inRange.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
            .orderBy("__v").limit(collectLimit + 1).collect()
            .map(r => (r.getDouble(0), r.getLong(1)))
          if (head.length <= collectLimit && head.nonEmpty &&
              below + head.map(_._2).sum > k) {
            return walk(head, below, k)
          } else if (head.length <= collectLimit) {
            // empty range, or all in-range mass still ranks < k: the
            // target escaped ABOVE rHi by the same one-rounding-step
            // slip — widen up (walk would throw on an empty head or
            // fall off .last otherwise)
            rounds += 1
            require(rounds <= 64,
              s"exactMedianTwoPass: rank $k stranded above [$rLo, $rHi] " +
                s"after $rounds widenings")
            rHi = rHi + math.max(rHi - rLo, math.ulp(rHi))
          } else {
            rounds += 1
            val width = (rHi - rLo) / nb
            require(rounds <= 64 && width > 0 && !width.isInfinity,
              s"exactMedianTwoPass: rank $k unresolved in [$rLo, $rHi] after " +
                s"$rounds refinement rounds — raise collectLimit or buckets")
            val idx = least(floor((col("__v") - lit(rLo)) / lit(width)), lit(nb - 1)).cast("int")
            val histRows = inRange.groupBy(idx.as("__b")).agg(count(lit(1)).as("__c"))
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            var cum = below; var b = nb - 1; var i = 0
            var found = false
            while (i < nb && !found) {
              cum += histRows.getOrElse(i, 0L)
              if (k < cum) { b = i; found = true }
              i += 1
            }
            val nLo = math.max(rLo, rLo + (b - 1).toDouble * width)
            val nHi = math.min(rHi, rLo + (b + 2).toDouble * width)
            rLo = nLo; rHi = nHi
          }
        }
      }
      Double.NaN // unreachable: the while(true) exits only via return/require
    }
    val med =
      if (hi <= lo) lo
      else {
        // widen by one bucket width on both ends (floor()'s FP rounding at
        // a boundary could strand a target value just outside [lo, hi])
        // and re-derive the rank base EXACTLY for the widened range — the
        // loop's cumBase is only histogram-self-consistent. The collect
        // is (value, count) pairs grouped by value: the widening can pull
        // entire adjacent buckets of DUPLICATE mass into the range, so
        // the collect is bounded by DISTINCT survivors; when even those
        // exceed `collectLimit` (ADVICE r8), each middle rank is resolved
        // by its own exact refinement loop instead of over-collecting or
        // rejecting legitimate continuous data.
        val lo2 = lo - slack
        val hi2 = hi + slack
        val below = vals.where(col("__v") < lo2).count()
        val pairs = vals.where(col("__v") >= lo2 && col("__v") <= hi2)
          .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
          .orderBy("__v")
          .limit(collectLimit + 1).collect()
          .map(r => (r.getDouble(0), r.getLong(1)))
        if (pairs.length <= collectLimit)
          (walk(pairs, below, kLo) + walk(pairs, below, kHi)) / 2.0
        else
          (rankValue(kLo, lo2, hi2) + rankValue(kHi, lo2, hi2)) / 2.0
      }
    (n, med)
  }

  // -- HyperLogLog ---------------------------------------------------------

  /** Number of registers for precision `p`. */
  def hllM(p: Int): Int = { require(p >= 4 && p <= 9, s"p: $p"); 1 << p }

  /** HYPERLOGLOG register table (Flajolet et al. 2007) — the mergeable
    * distinct-count sketch: COUNT(DISTINCT key) at 100 TB costs a
    * shuffle of every distinct key, while the HLL register table is a
    * FIXED 2^p rows whose per-key update is pure scan-stage Column
    * algebra (hash → bucket → leading-zero rank) followed by one
    * 2^p-ary max aggregate. Registers from disjoint corpus slices
    * combine by [[hllMerge]] (slot-wise max is associative/commutative
    * — the sketch is a semilattice), which is what makes it the
    * per-partition / per-day / per-source distinct primitive: sketch
    * once per slice, merge cheaply ever after.
    *
    * Engine-portable by construction: the hash is md5 (not an engine-
    * native hash), the bucket is the first 12 hash bits >> (12−p), and
    * the rank ρ = leading-zeros-plus-one over the next 52 bits is
    * STRING arithmetic on `bin()` (both engines print minimal binary)
    * — no float enters until [[hllEstimate]]'s final division. Returns
    * the DENSE (bucket 0..m−1, reg) table; empty buckets hold 0.
    * p ≤ 9 keeps [[hllEstimate]]'s scaled-integer harmonic sum inside
    * Long (m·2^53 < 2^63). */
  /** The 12-bit-prefix bucket of a key's md5 under precision `p` —
    * shared by the batch sketch and the streaming windowed variant. */
  private[graft] def hllBucket(key: org.apache.spark.sql.Column, p: Int) =
    shiftright(conv(substring(md5(key.cast("string")), 1, 3), 16, 10).cast("long"),
      12 - p).cast("int")

  /** Leading-zero rank ρ over the key's next 52 md5 bits, via `bin()`
    * string arithmetic (engine-portable; all-zero window → 53). */
  private[graft] def hllRho(key: org.apache.spark.sql.Column) = {
    val w = conv(substring(md5(key.cast("string")), 4, 13), 16, 10).cast("long")
    when(w === 0, lit(53)).otherwise(lit(53) - length(bin(w))).cast("int")
  }

  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    val m = hllM(p)
    val regs = df.where(col(keyCol).isNotNull)
      .select(hllBucket(col(keyCol), p).as("bucket"),
        hllRho(col(keyCol)).as("__rho"))
      .groupBy("bucket").agg(max("__rho").as("reg"))
    df.sparkSession.range(m).select(col("id").cast("int").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("reg"), lit(0)).cast("int").as("reg"))
  }

  /** Merge two register tables (slot-wise max) — the distributed-
    * union step: hll(A ∪ B) = merge(hll(A), hll(B)), exactly. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("reg").as("__ra"))
      .join(b.select(col("bucket"), col("reg").as("__rb")), Seq("bucket"), "full")
      .select(col("bucket"),
        greatest(coalesce(col("__ra"), lit(0)), coalesce(col("__rb"), lit(0))).as("reg"))

  /** Cardinality estimate from a register table: the classic
    * bias-corrected harmonic mean E = α_m·m²/Σ 2^−reg, with the
    * small-range linear-counting correction m·ln(m/V) when E ≤ 2.5m
    * and V (empty registers) > 0. The harmonic sum is computed SCALED
    * BY 2^53 so it is an exact integer (each term 2^(53−reg) is a
    * whole power of two; reg ≤ 53) — summation order cannot perturb
    * it, and exactly ONE float division produces the estimate
    * (engine-deterministic, rounded 6 dp). Relative error ≈
    * 1.04/√m (~6.5 % at p = 8). Returns one row
    * (m, v_zero, s_scaled, estimate). */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val m = hllM(p)
    val c = hllAlphaConstant(p)
    registers.agg(
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"),
        sum(pow(lit(2.0), lit(53) - col("reg")).cast("long")).as("s_scaled"))
      .select(lit(m.toLong).as("m"), col("v_zero"), col("s_scaled"),
        (lit(c) / col("s_scaled").cast("double")).as("__raw"))
      .select(col("m"), col("v_zero"), col("s_scaled"),
        round(when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("__raw")), 6).as("estimate"))
  }

  /** α_m·m²·2^53 as one driver-computed double literal — shared with
    * oracle SQL generation so both engines divide by the identical
    * constant (shortest-round-trip decimal printing preserves the
    * bit pattern across parsers). */
  def hllAlphaConstant(p: Int): Double = {
    val m = hllM(p)
    val alpha = 0.7213 / (1 + 1.079 / m)
    alpha * m * m * 9007199254740992.0 // 2^53
  }

  /** Per-GROUP sparse register tables: one (group..., bucket)-keyed
    * max aggregate — the per-source / per-day / per-tenant distinct
    * primitive (2^p registers per group instead of that group's key
    * set). Feed [[hllEstimateGrouped]]; merge groups by slot-wise max
    * before estimating to get any union's cardinality without
    * re-scanning. */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     p: Int): DataFrame = {
    require(groupCols.nonEmpty)
    hllM(p) // bounds-check p
    df.where(col(keyCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(hllBucket(col(keyCol), p).as("bucket"),
        hllRho(col(keyCol)).as("__rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("__rho").as("reg"))
  }

  /** Per-GROUP estimates from SPARSE register rows (group..., bucket,
    * reg) where absent buckets mean 0 — the shape a per-window
    * streaming sketch or a per-source sketch table naturally produces
    * (only touched buckets materialize). Same scaled-integer harmonic
    * sum and linear-counting correction as [[hllEstimate]]; one
    * group-keyed aggregate. Returns (group..., m, v_zero, s_scaled,
    * estimate). */
  def hllEstimateGrouped(sparse: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(groupCols.nonEmpty)
    val m = hllM(p)
    val c = hllAlphaConstant(p)
    sparse.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), lit(53) - col("reg")).cast("long")).as("__sp"),
        count(lit(1)).as("__present"),
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("__z0"))
      .select(groupCols.map(col) ++ Seq(
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("__present") + col("__z0")).as("v_zero"),
        (col("__sp") + (lit(m.toLong) - col("__present")) * lit(1L << 53)).as("s_scaled")): _*)
      .select(groupCols.map(col) ++ Seq(col("m"), col("v_zero"), col("s_scaled"),
        (lit(c) / col("s_scaled").cast("double")).as("__raw")): _*)
      .select(groupCols.map(col) ++ Seq(col("m"), col("v_zero"), col("s_scaled"),
        round(when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("__raw")), 6).as("estimate")): _*)
  }

  // -- count-min -----------------------------------------------------------

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005) — point-queryable
    * frequency estimates for EVERY key in d·w integers of state, where
    * [[heavyHitters]] answers only the heavy ones: d independent hash
    * rows of w counters, each key increments one counter per row, and
    * a point query reads the MINIMUM of its d counters — an estimate
    * that NEVER undercounts and overshoots by ≤ e·N/w with probability
    * 1 − e^−d (collisions only ever add). Sketches of corpus slices
    * merge by cell-wise sum ([[cmMerge]] — the same semilattice story
    * as [[hllMerge]]).
    *
    * Scale shape: ONE (row, bucket)-keyed count shuffle bounded by d·w
    * cells regardless of key cardinality — the long tail folds into
    * shared counters instead of shuffling. Hashes are md5 over
    * "row:key" (engine-portable, row-independent by the prefix), 24
    * hash bits mod w. Returns the DENSE (row 0..d−1, bucket 0..w−1,
    * cnt) cell table. */
  def cmSketch(df: DataFrame, keyCol: String, w: Int, d: Int): DataFrame = {
    require(w > 1 && d >= 1, s"w: $w, d: $d")
    val spark = df.sparkSession
    val cells = df.where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"),
        (conv(substring(md5(concat(col("row").cast("string"), lit(":"), col("__k"))),
          1, 6), 16, 10).cast("long") % w).cast("int").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    spark.range(d.toLong * w)
      .select((col("id") / w).cast("int").as("row"),
        (col("id") % w).cast("int").as("bucket"))
      .join(cells, Seq("row", "bucket"), "left")
      .select(col("row"), col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Merge two count-min cell tables (cell-wise sum): cm(A ∪ B) =
    * merge(cm(A), cm(B)), exactly. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("row"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("row"), col("bucket"), col("cnt").as("__cb")),
        Seq("row", "bucket"), "full")
      .select(col("row"), col("bucket"),
        (coalesce(col("__ca"), lit(0L)) + coalesce(col("__cb"), lit(0L))).as("cnt"))

  /** Point-query a count-min cell table for each key in `probes`:
    * estimate = min over the d rows of the key's counter. The probe
    * side recomputes the same md5 buckets and equi-joins the (small,
    * broadcastable) cell table — probing is a scan over the probe set,
    * never the sketched corpus. Returns (key, est). */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                 w: Int, d: Int): DataFrame = {
    require(w > 1 && d >= 1, s"w: $w, d: $d")
    probes.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("key"), col("row"),
        (conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col("key").cast("string"))), 1, 6), 16, 10).cast("long") % w)
          .cast("int").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("key").agg(min("cnt").as("est"))
  }
}

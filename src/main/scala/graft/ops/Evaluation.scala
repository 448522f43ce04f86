package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Offline evaluation metrics — the measurement layer between a curated
 * corpus / retriever / model and a ship decision. Everything here is
 * deterministic Column algebra over ranked or counted frames (no
 * sampling, no RNG): metrics round to 6 dp where a transcendental
 * (log2) enters, the library-wide engine-reproducibility convention.
 */
object Evaluation {

  /** Binary-relevance ranking metrics per query — recall@k, MRR@k, and
    * nDCG@k — for a run table (qid, rank, id) against a relevance set
    * (qid, id). The judged join is rank-keyed (runs are ≤k rows per
    * query by construction, relevance sets are eval-sized), one
    * (qid)-keyed aggregate computes all three, and IDCG comes from the
    * relevance COUNT alone (binary gains: the ideal list is any
    * permutation of the relevant docs). Queries with empty relevance
    * sets are excluded (all three metrics are undefined), queries with
    * relevance but an empty run score 0. */
  def rankingMetrics(runs: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    // dedup defensively: a duplicated (qid, id) relevance row would fan
    // out the judged join and inflate hits/DCG past their bounds
    // (nDCG > 1)
    val rel = relevant.select(col("qid"), col("id")).distinct()
      .withColumn("__rel", lit(1))
    val relCounts = rel.groupBy("qid").agg(count(lit(1)).as("__n_rel"))
    // the RUN side dedups too: a system listing the same doc at two
    // ranks within k would count the hit twice (recall > 1) and sum
    // both DCG positions (review r9) — keep each (qid, id)'s BEST rank
    val bestRank = runs.where(col("rank") <= k)
      .groupBy(col("qid"), col("id")).agg(min(col("rank")).as("rank"))
    val judged = bestRank
      .join(rel, Seq("qid", "id"), "left")
      .groupBy("qid").agg(
        sum(coalesce(col("__rel"), lit(0))).as("__hits"),
        min(when(col("__rel") === 1, col("rank"))).as("__first"),
        sum(when(col("__rel") === 1, lit(1.0) / log2(col("rank") + 1.0))
          .otherwise(0.0)).as("__dcg"))
    // IDCG_n = Σ_{i=1..min(n_rel,k)} 1/log2(i+1) — a k-term literal
    // lookup indexed by the (capped) relevant count
    val idcgTable = (1 to k).scanLeft(0.0)((acc, i) => acc + 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcg = element_at(
      array(idcgTable.map(lit(_)): _*),
      (least(col("__n_rel"), lit(k.toLong)) + 1).cast("int"))
    relCounts.join(judged, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(col("__hits"), lit(0L)) / col("__n_rel"), 6).as(s"recall_$k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as(s"mrr_$k"),
        round(coalesce(col("__dcg"), lit(0.0)) / idcg, 6).as(s"ndcg_$k"))
  }

  /** ROC-AUC of a score against a binary label — the Mann-Whitney U
    * form with midrank tie handling: group by DISTINCT score (bounded
    * far below the corpus: scores here are rounded to 6 dp), take one
    * cumulative window over the score groups (never the rows), and
    * U = Σ_g pos_g · (neg_below_g + neg_g/2). The corpus pays one
    * score-keyed aggregate; the window runs over score cardinality.
    * Returns one row (n_pos, n_neg, auc 6 dp); degenerate inputs
    * (single-class) yield a null auc rather than a division crash. */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = df.select(col(scoreCol).as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy("__s").agg(
        sum(col("__y")).as("__pos"),
        sum(lit(1) - col("__y")).as("__neg"))
    val w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    val u = groups
      .withColumn("__negBelow", coalesce(sum("__neg").over(w), lit(0L)))
      .agg(
        sum(col("__pos") * (col("__negBelow") + col("__neg") / lit(2.0))).as("__u"),
        sum("__pos").as("n_pos"), sum("__neg").as("n_neg"))
    u.select(col("n_pos"), col("n_neg"),
      round(col("__u") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Cohen's kappa between two binary raters — the agreement check run
    * on preference/label pipelines before trusting either signal:
    * κ = (p_o − p_e)/(1 − p_e) over the 2×2 confusion counts, from ONE
    * aggregate pass. Perfect chance agreement (p_e = 1: both raters
    * constant) yields null. Returns
    * (n, p_o, kappa), rates 6 dp. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val agg = df.select(col(aCol).cast("int").as("__a"), col(bCol).cast("int").as("__b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("__agree"),
        sum("__a").as("__a1"), sum("__b").as("__b1"))
    agg.select(col("n"),
        (col("__agree") / col("n")).as("__po"),
        ((col("__a1") / col("n")) * (col("__b1") / col("n")) +
          ((col("n") - col("__a1")) / col("n")) * ((col("n") - col("__b1")) / col("n")))
          .as("__pe"))
      .select(col("n"), round(col("__po"), 6).as("p_o"),
        round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6).as("kappa"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic — the distribution-drift
    * test between two slices of a numeric column (new crawl vs old,
    * source A vs B): KS = max over observed values of
    * |ECDF_a − ECDF_b|. One (value)-keyed aggregate with per-group
    * counts, one cumulative window over DISTINCT values (bounded by
    * value cardinality, never the corpus — NOTE a raw continuous
    * column has distinct ≈ rows; pre-round/bucket it, the
    * [[binaryAuc]] 6-dp convention, or the window is a one-task
    * sort), exact integer counts into one rounded ratio.
    * Returns (n_a, n_b, ks 6 dp). */
  def ksStatistic(df: DataFrame, groupCol: String, valCol: String,
                  a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rows with no value carry no distribution mass: a null would form
    // a spurious smallest-value group counted in n_a/n_b and deflate
    // every ECDF point (review r9)
    val base = df.where(col(groupCol).isin(a, b))
      .select(col(groupCol).as("__g"), col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val counts = base.groupBy("__v").agg(
      sum(when(col("__g") === a, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__g") === b, 1L).otherwise(0L)).as("__cb"))
    val w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("__cumA", sum("__ca").over(w))
      .withColumn("__cumB", sum("__cb").over(w))
      // the all-rows totals window runs over the DISTINCT-value frame
      .withColumn("__na", sum("__ca").over(Window.partitionBy()))
      .withColumn("__nb", sum("__cb").over(Window.partitionBy()))
    cum.agg(
      max("__na").as("n_a"), max("__nb").as("n_b"),
      round(max(abs(col("__cumA") / col("__na") -
                    col("__cumB") / col("__nb"))), 6).as("ks"))
  }

  /** Pearson chi-square INDEPENDENCE statistic over a two-column
    * contingency (is `bCol` distributed independently of `aCol` — the
    * corpus-audit question "does language depend on source"): χ² =
    * Σ (o − e)²/e with e = row·col/n, from exact integer marginals.
    * One (a, b) count shuffle; marginals broadcast back. Returns
    * (n, dof, chi2 6 dp) — the statistic and degrees of freedom; p
    * needs the incomplete gamma and belongs to the caller's tables. */
  /** MANN–KENDALL trend test over an ALREADY-AGGREGATED series (t, x)
    * — the nonparametric "is this metric drifting" monitor (daily
    * ingest volume, quality-score medians): S = Σ_{i<j} sign(xⱼ − xᵢ),
    * with the tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18 and the
    * continuity-corrected z = (S ∓ 1)/√Var (z = 0 when S = 0).
    *
    * The pairwise self-join is O(n²) in SERIES length — by contract
    * the caller aggregates first (a year of dailies is 66k pairs;
    * the corpus never self-joins). Pass x values PRE-ROUNDED if the
    * series comes from float sums: sign() on last-ULP-different
    * aggregates is the one cross-engine hazard. Returns one row
    * (n, s_stat, var_s, z) with var_s/z rounded 6 dp. */
  def mannKendall(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    val s = series.select(col(tCol).as("__t"), col(xCol).cast("double").as("__x"))
    val pairs = s.as("i").join(s.as("j"), col("i.__t") < col("j.__t"))
      .agg(sum(signum(col("j.__x") - col("i.__x")).cast("long")).as("s_stat"))
    val n = s.agg(count(lit(1)).as("__n"))
    val ties = s.groupBy("__x").agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1)
      .agg(coalesce(sum(col("__c") * (col("__c") - 1) * (col("__c") * 2 + 5)),
        lit(0L)).as("__tt"))
    pairs.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .select(col("__n").as("n"), col("s_stat"),
        round((col("__n") * (col("__n") - 1) * (col("__n") * 2 + 5) - col("__tt")) /
          lit(18.0), 6).as("var_s"))
      .select(col("n"), col("s_stat"), col("var_s"),
        round(when(col("s_stat") > 0, (col("s_stat") - 1) / sqrt(col("var_s")))
          .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 6).as("z"))
  }

  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = obs.groupBy("__a").agg(sum("__o").as("__ra"))
    val colTot = obs.groupBy("__b").agg(sum("__o").as("__cb"))
    val n = obs.agg(sum("__o").as("__n"))
    // DENSIFY before summing: an unobserved (a, b) combination is a
    // zero CELL contributing (0 − e)²/e = e — dropping it understates
    // χ² exactly when association is strongest. Marginal × marginal is
    // the (small) full grid; observed counts left-join on.
    val cells = rowTot.crossJoin(colTot)
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("__o"), col("__n"),
        (col("__ra") * col("__cb") / col("__n")).as("__e"))
    val dims = obs.agg(
      countDistinct("__a").as("__na"), countDistinct("__b").as("__nb"))
    cells.agg(max("__n").as("n"),
        sum((col("__o") - col("__e")) * (col("__o") - col("__e")) / col("__e")).as("__chi2"))
      .crossJoin(broadcast(dims))
      .select(col("n"),
        ((col("__na") - 1) * (col("__nb") - 1)).as("dof"),
        round(col("__chi2"), 6).as("chi2"))
  }

  /** Average precision (the area under the precision-recall curve by
    * the step rule — sklearn's `average_precision_score`): descending
    * over DISTINCT scores, AP = Σ_g (Δrecall_g · precision_g) with
    * whole tied GROUPS entering together (precision measured at the
    * group's end — the deterministic tie treatment; interpolation-free
    * so engines agree exactly). Same scale shape as [[binaryAuc]]: one
    * score-keyed aggregate, the cumulative window runs over score
    * cardinality. Returns (n_pos, n_neg, ap 6 dp); single-class input
    * yields null ap. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = df.select(col(scoreCol).as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy("__s").agg(
        sum(col("__y")).as("__pos"),
        count(lit(1)).as("__n"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups
      .withColumn("__cumPos", sum("__pos").over(w))
      .withColumn("__cumN", sum("__n").over(w))
    val ap = cum.agg(
      sum(col("__pos") * (col("__cumPos") / col("__cumN"))).as("__num"),
      sum("__pos").as("n_pos"),
      (sum("__n") - sum("__pos")).as("n_neg"))
    ap.select(col("n_pos"), col("n_neg"),
      round(col("__num") / col("n_pos"), 6).as("ap"))
  }

  /** Calibration SCALARS for a probabilistic binary classifier —
    * expected calibration error (Naeini et al. 2015: Σ_bins
    * |acc_b − conf_b| · n_b/N over equal-width probability bins) and
    * the Brier score (mean (p − y)²) — from ONE aggregate over the
    * binned scores. `probCol` must be a probability in [0, 1] (e.g.
    * a sigmoid of a log-odds score); bin = ⌊p·bins⌋ clamped so p = 1
    * lands in the top bin. Returns (n, ece, brier) at 6 dp. */
  def calibrationError(df: DataFrame, probCol: String, labelCol: String,
                       bins: Int = 10): DataFrame = {
    require(bins > 0)
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("int")
    val bin = least(floor(p * bins), lit(bins - 1))
    val perBin = df.select(p.as("__p"), y.as("__y"), bin.as("__b"))
      .groupBy("__b").agg(
        count(lit(1)).as("__n"),
        avg("__y").as("__acc"),
        avg("__p").as("__conf"),
        sum((col("__p") - col("__y")) * (col("__p") - col("__y"))).as("__se"))
    perBin.agg(
      sum("__n").as("n"),
      round(sum(abs(col("__acc") - col("__conf")) * col("__n")) / sum("__n"), 6).as("ece"),
      round(sum("__se") / sum("__n"), 6).as("brier"))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1): given n samples per task with c
    * successes, pass@k = 1 − C(n−c, k)/C(n, k), computed as the
    * telescoped product Π_{j=0..k−1} (n−c−j)/(n−j) — numerically exact
    * for the integer counts it sees, no factorials. Rows with n < k
    * are excluded (the estimator is undefined); c = 0 gives 0,
    * n − c < k gives 1 (some success guaranteed in every k-subset).
    * Input (task, n, c) → (task, n, c, pass_at_k). */
  def passAtK(counts: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val prod = aggregate(
      sequence(lit(0), lit(k - 1)),
      lit(1.0),
      (acc, j) => acc * (col("n") - col("c") - j).cast("double") / (col("n") - j))
    counts.where(col("n") >= k)
      .select(col("task"), col("n"), col("c"),
        round(when(col("n") - col("c") < k, 1.0).otherwise(lit(1.0) - prod), 6)
          .as("pass_at_k"))
  }

  /** CUSUM changepoint locator (Page 1954 / Pettitt-style scan) over
    * an ALREADY-AGGREGATED integer series (t, x) — "WHEN did this
    * metric shift": the cumulative deviation S_i = Σ_{j≤i}(x_j − x̄)
    * peaks at the level-shift boundary. Computed SCALED BY n so every
    * intermediate is an exact integer: S′_i = n·C_i − i·T (C = running
    * sum, T = total) = n·S_i — argmax and ties are engine-exact, the
    * only floats are the final normalized statistic
    * max|S′| / (√(n·Σx²−T²) · √n)  (= max|S_i| / (σ̂√n), the scan
    * statistic whose asymptotic null law is the Brownian-bridge sup),
    * two correctly-rounded sqrts and one division, rounded 6 dp.
    *
    * Same contract as [[mannKendall]]: the caller aggregates first —
    * the window runs over SERIES length (a year of dailies), never the
    * corpus. Returns one row (n, t_star, s_max, stat); constant series
    * → stat 0. */
  def cusumChangepoint(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(tCol).as("__t"), col(xCol).cast("long").as("__x"))
    val tot = s.agg(count(lit(1)).as("__n"), sum("__x").as("__tt"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val w = Window.orderBy("__t")
    val cum = s.select(col("__t"),
        row_number().over(w).cast("long").as("__rn"),
        sum("__x").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("__c"))
      .crossJoin(broadcast(tot))
      .select(col("__t"), col("__n"), col("__sxx"), col("__tt"),
        (col("__n") * col("__c") - col("__rn") * col("__tt")).as("__s"))
    cum.orderBy(abs(col("__s")).desc, col("__t")).limit(1)
      .select(col("__n").as("n"), col("__t").as("t_star"),
        abs(col("__s")).as("s_max"),
        round(when(col("__n") * col("__sxx") - col("__tt") * col("__tt") === 0, 0.0)
          .otherwise(abs(col("__s")).cast("double") /
            (sqrt((col("__n") * col("__sxx") - col("__tt") * col("__tt")).cast("double")) *
              sqrt(col("__n").cast("double")))), 6).as("stat"))
  }

  /** Per-group WEIGHTED MEDIAN (lower-median convention): the value at
    * which cumulative weight first reaches half the group's total —
    * "the price at which half the QUANTITY traded", which an unweighted
    * median gets wrong whenever weight correlates with value. Integer
    * weights keep the crossing test 2·cum ≥ W exact (no interpolation,
    * no float compare), and the cumulative window runs over the
    * group's DISTINCT values, never its rows. Returns
    * (group, total_weight, w_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null values carry weight but sort FIRST, shifting the 2·cum ≥ W
    // crossing while min(v) skips them — exclude them from the mass
    // entirely (review r9)
    val perVal = df
      .select(col(groupCol).as("grp"), col(valCol).as("v"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__w") > 0 && col("v").isNotNull)
      .groupBy("grp", "v").agg(sum("__w").as("__wv"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("grp")
    perVal
      .withColumn("__cum", sum("__wv").over(w))
      .withColumn("__tot", sum("__wv").over(tot))
      .where(col("__cum") * 2 >= col("__tot"))
      .groupBy("grp")
      .agg(max("__tot").as("total_weight"), min("v").as("w_median"))
  }

  /** Per-class INTER-ARRIVAL BURSTINESS — the coefficient of variation
    * of gaps between consecutive arrivals in each class's (ts, tie)-
    * ordered stream: CV ≈ 1 is Poisson-like, CV ≫ 1 is bursty (retry
    * storms, batch uploads), CV ≪ 1 is metronomic (cron) — the
    * traffic-shape classifier behind rate-limit and capacity design.
    * Gaps are exact WHOLE-SECOND integers — the grain that keeps
    * n·Σg² − (Σg)² inside Long for month-scale class spans (µs gaps
    * square to ~10²⁰ and even ms overflow once n·Σg² enters; the
    * first ms draft did, in BOTH engines) — so the CV
    * = √(n·Σg² − (Σg)²) / Σg touches floats only in one sqrt and one
    * division. Sub-second arrivals contribute zero-second gaps (CV of
    * a sub-second burst needs a finer grain AND a shorter span —
    * split per (class, day) and scale accordingly). Per-class lag
    * window, bounded by class volume. Returns
    * (cls, n_gaps, mean_gap_s, cv). */
  def burstiness(events: DataFrame, classCol: String, tsCol: String,
                 tieBreak: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cls")).orderBy(col("__t"), col("__tb"))
    val gaps = events
      .select(col(classCol).as("cls"), unix_seconds(col(tsCol)).as("__t"),
        tieBreak.as("__tb"))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .where(col("__g").isNotNull)
    gaps.groupBy("cls")
      .agg(count(lit(1)).as("n_gaps"), sum("__g").as("__sg"),
        sum(col("__g") * col("__g")).as("__sgg"))
      .select(col("cls"), col("n_gaps"),
        round(col("__sg").cast("double") / col("n_gaps").cast("double"), 6)
          .as("mean_gap_s"),
        round(when(col("__sg") === 0, lit(null).cast("double"))
          .otherwise(sqrt((col("n_gaps") * col("__sgg") - col("__sg") * col("__sg"))
            .cast("double")) / col("__sg").cast("double")), 6).as("cv"))
  }

  /** EMPIRICAL-BAYES rate shrinkage toward the pooled rate — the
    * small-n ranking fix (a 2/2 item must not outrank a 95/100 one):
    * shrunken = (x + τ·m) / (n + τ) with pseudo-count `tau` and
    * m = Σx/Σn, the Beta(τ·m, τ·(1−m)) posterior mean. m is ONE
    * division of exact pooled integers (a mean-of-per-key-rates prior
    * would sum arbitrary doubles — partition-order-dependent), so
    * every per-key expression sees the identical prior and engines
    * agree bit-for-bit. Returns (key, n, x, rate, shrunken), rates
    * 6 dp. */
  def ebShrinkRates(df: DataFrame, keyCol: String, successCol: String,
                    tau: Double): DataFrame = {
    require(tau > 0, s"tau: $tau")
    val g = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L)).as("x"))
    val pooled = g.agg(sum("x").as("__sx"), sum("n").as("__sn"))
      .select((col("__sx").cast("double") / col("__sn").cast("double")).as("__m"))
    g.crossJoin(broadcast(pooled))
      .select(col("key"), col("n"), col("x"),
        round(col("x").cast("double") / col("n").cast("double"), 6).as("rate"),
        round((col("x").cast("double") + lit(tau) * col("__m")) /
          (col("n").cast("double") + lit(tau)), 6).as("shrunken"))
  }

  /** SPLIT-CONFORMAL prediction interval for the PERSISTENCE forecast
    * (Vovk's conformal guarantee on the simplest possible model,
    * x̂_t = x_{t−1}): nonconformity = |x_t − x_{t−1}| (exact integers
    * on an integer series), q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    * calibration residual — an exact ORDER STATISTIC, no
    * interpolation, so the threshold is engine-identical — and the
    * reported coverage on the held-out suffix is guaranteed ≥ 1−α in
    * expectation whatever the series' distribution. α is passed as
    * the rational `alphaNum/alphaDen` so the rank computes in integer
    * arithmetic (a float (n+1)(1−α) can straddle ⌈⌉ boundaries
    * differently per engine). Aggregate-first contract. Returns one
    * row (n_cal, n_test, qhat, coverage); qhat null when the rank
    * exceeds n_cal (α too small for the calibration size). */
  def conformalPersistence(series: DataFrame, tCol: String, xCol: String,
                           calN: Int, alphaNum: Int, alphaDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(calN >= 1, s"calN: $calN")
    require(alphaNum > 0 && alphaDen > alphaNum, s"alpha: $alphaNum/$alphaDen")
    val w = Window.orderBy(col("__t"))
    val res = series.select(col(tCol).as("__t"), col(xCol).cast("long").as("__x"))
      .withColumn("__r", abs(col("__x") - lag(col("__x"), 1).over(w)))
      .where(col("__r").isNotNull)
      .withColumn("__rn", row_number().over(Window.orderBy(col("__t"))))
    val cal = res.where(col("__rn") <= calN)
    val test = res.where(col("__rn") > calN)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // k = ⌈(n_cal+1)·(den−num)/den⌉ in pure integer arithmetic
    val k = ((col("n_cal") + 1) * (alphaDen - alphaNum) + (alphaDen - 1)) / alphaDen
    val qhat = cal
      .withColumn("__k", row_number().over(Window.orderBy(col("__r"), col("__t"))))
      .crossJoin(broadcast(nCal))
      .where(col("__k") === k.cast("int"))
      .agg(max("__r").as("qhat"))
    test.crossJoin(broadcast(qhat)).crossJoin(broadcast(nCal))
      .agg(max("n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max("qhat").as("qhat"),
        round(sum(when(col("__r") <= col("qhat"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("coverage"))
  }

  /** Daily OHLC CANDLES — the finance-style compaction of an
    * irregular value stream (open/high/low/close + volume per day):
    * open/close come from ONE partial-aggregatable struct min/max
    * over (ts, tiebreak, value) — no per-day window, no history
    * collection — and the turnover total sums ENGINE-EXACT integer
    * cents (round(value·100): the values are 2-decimal by
    * construction, and float summation of raw doubles would be
    * partition-order-dependent). Returns (day, open, high, low,
    * close, volume, total_cents). */
  def dailyOhlc(df: DataFrame, tsCol: String, valueCol: String,
                tieBreak: org.apache.spark.sql.Column): DataFrame = {
    val v = col(valueCol).cast("double")
    df.where(v.isNotNull)
      .groupBy(col(tsCol).cast("date").as("day"))
      .agg(
        min(struct(col(tsCol).as("t"), tieBreak.as("i"), v.as("v"))).as("__o"),
        max(struct(col(tsCol).as("t"), tieBreak.as("i"), v.as("v"))).as("__c"),
        max(v).as("high"), min(v).as("low"), count(lit(1)).as("volume"),
        sum(round(v * 100, 0).cast("long")).as("total_cents"))
      .select(col("day"), col("__o.v").as("open"), col("high"), col("low"),
        col("__c.v").as("close"), col("volume"), col("total_cents"))
      .orderBy("day")
  }

  /** Per-key TIME-WEIGHTED AVERAGE of a step-function metric sampled
    * at irregular times — the correct mean when observations carry
    * until the next one (account balances, feature values, prices):
    * TWA = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t₀), each value held until the
    * next sample. Computed over ENGINE-EXACT integers — cents ×
    * microseconds — with exactly one division at the end (rounded
    * 6 dp), so partition order cannot perturb it. One per-key lead
    * window (bounded by the key's sample count). Keys with a single
    * sample have zero span → null twa. Returns
    * (key, n_samples, span_us, twa). */
  def timeWeightedAverage(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String,
                          tieBreak: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stepped = df
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        unix_micros(col(tsCol)).as("__t"), tieBreak.as("__tb"),
        round(col(valueCol).cast("double") * 100, 0).cast("long").as("__cents"))
      // the tiebreak makes same-timestamp holds deterministic: with
      // equal t the earlier-by-tiebreak sample holds for 0 µs — which
      // sample that is must not depend on partition order
      .withColumn("__tnext", lead(col("__t"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("__t"), col("__tb"))))
    stepped.groupBy("key")
      .agg(count(lit(1)).as("n_samples"),
        (max("__t") - min("__t")).as("span_us"),
        sum(when(col("__tnext").isNotNull,
          col("__cents") * (col("__tnext") - col("__t"))).otherwise(0L)).as("__num"))
      .select(col("key"), col("n_samples"), col("span_us"),
        round(when(col("span_us") === 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") /
            (col("span_us").cast("double") * 100.0)), 6).as("twa"))
  }

  /** THEIL–SEN slope over an aggregated integer series — the robust
    * trend MAGNITUDE beside [[mannKendall]]'s direction test (same
    * aggregate-first, O(series²) pairwise contract): slope = median of
    * all pairwise (Δx/Δt), intercept = median of (x − slope·t)
    * residuals under the ROUNDED slope (so both outputs are
    * reproducible); a single outlier day cannot drag either, unlike
    * OLS. Pairwise quotients are one IEEE division each — bit-equal
    * across engines — and the median picks rank ⌊(m+1)/2⌋ /
    * ⌊(m+2)/2⌋ positions (avg of the two middles for even m, the
    * quantile_cont convention). Returns one row (n, n_pairs, slope,
    * intercept), 6 dp; series under 2 points → nulls. */
  def theilSenSlope(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(tCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__x"))
    val pairs = s.as("i").join(s.as("j"), col("j.__t") > col("i.__t"))
      .select(((col("j.__x") - col("i.__x")).cast("double") /
        (col("j.__t") - col("i.__t")).cast("double")).as("__s"))
    val m = pairs.agg(count(lit(1)).as("__m"))
    val n = s.agg(count(lit(1)).as("__n"))
    // integer-floored median ranks: Spark's `/` on longs is DOUBLE
    // division, so (n+1)/2 at even n is x.5 and matches no rank
    def medianRanks(r: org.apache.spark.sql.Column, total: org.apache.spark.sql.Column) =
      r === ((total + 1) / 2).cast("long") || r === ((total + 2) / 2).cast("long")
    val slope = pairs
      .withColumn("__r", row_number().over(Window.orderBy(col("__s"))))
      .crossJoin(broadcast(m))
      .where(medianRanks(col("__r"), col("__m")))
      .agg(round(avg("__s"), 6).as("slope"))
    val withSlope = s.crossJoin(broadcast(slope))
      .select(col("__t"), col("__x"), col("slope"),
        (col("__x") - col("slope") * col("__t")).as("__res"))
    val intercept = withSlope
      .withColumn("__r", row_number().over(Window.orderBy(col("__res"))))
      .crossJoin(broadcast(n))
      .where(medianRanks(col("__r"), col("__n")))
      .agg(round(avg("__res"), 6).as("intercept"))
    broadcast(n).crossJoin(broadcast(m))
      .crossJoin(slope).crossJoin(intercept)
      .select(col("__n").as("n"), col("__m").as("n_pairs"),
        when(col("__n") < 2, lit(null).cast("double")).otherwise(col("slope")).as("slope"),
        when(col("__n") < 2, lit(null).cast("double")).otherwise(col("intercept")).as("intercept"))
  }

  /** Day-of-week SEASONAL PROFILE over an aggregated daily series —
    * the weekly-rhythm decomposition every ingest monitor wants before
    * alerting on raw counts (a Saturday dip is seasonality, not an
    * incident): per weekday (0 = Monday), the day count, mean, and the
    * seasonal index mean_dow / mean_overall. Index computed as
    * (sum_dow·n) / (n_dow·sum) — exact integers into ONE division —
    * so engines agree bit-for-bit; means rounded 6 dp. */
  def seasonalProfile(series: DataFrame, dateCol: String, xCol: String): DataFrame = {
    val s = series.select(weekday(col(dateCol)).as("dow"),
      col(xCol).cast("long").as("__x"))
    val tot = s.agg(count(lit(1)).as("__n"), sum("__x").as("__sum"))
    s.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("__x").as("__sd"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"),
        round(col("__sd").cast("double") / col("n_days"), 6).as("mean_x"),
        round((col("__sd") * col("__n")).cast("double") /
          (col("n_days") * col("__sum")).cast("double"), 6).as("seasonal_index"))
      .orderBy("dow")
  }

  /** Per-GROUP OLS trend of an integer measure on integer time — the
    * "which sources are growing/shrinking" monitor (per-type daily
    * volumes, per-language token counts by day): closed-form slope and
    * intercept per group from ONE aggregate of (n, Σt, Σx, Σt², Σtx),
    * both as a single division of exact-integer numerator/denominator
    * (slope = (nΣtx−ΣtΣx)/(nΣt²−(Σt)²); intercept from the symmetric
    * form, NOT from the rounded slope). Groups with a degenerate time
    * axis (one distinct t) yield nulls. Returns (group, n, slope,
    * intercept) rounded 6 dp. */
  def groupTrendOls(df: DataFrame, groupCol: String, tCol: String,
                    xCol: String): DataFrame = {
    val s = df.select(col(groupCol).as("grp"), col(tCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__x"))
    val agg = s.groupBy("grp").agg(count(lit(1)).as("__n"),
      sum("__t").as("__st"), sum("__x").as("__sx"),
      sum(col("__t") * col("__t")).as("__stt"),
      sum(col("__t") * col("__x")).as("__stx"))
    val den = col("__n") * col("__stt") - col("__st") * col("__st")
    agg.select(col("grp"), col("__n").as("n"),
      round(when(den === 0, lit(null).cast("double"))
        .otherwise((col("__n") * col("__stx") - col("__st") * col("__sx"))
          .cast("double") / den.cast("double")), 6).as("slope"),
      round(when(den === 0, lit(null).cast("double"))
        .otherwise((col("__sx") * col("__stt") - col("__st") * col("__stx"))
          .cast("double") / den.cast("double")), 6).as("intercept"))
  }

  /** SEASONALITY-ADJUSTED anomaly flags over an aggregated daily
    * series — the monitor [[seasonalProfile]] exists to feed: each
    * day's count is divided by its weekday's seasonal index (so a
    * normal Saturday dip stops alerting), then flagged when the
    * adjusted value sits more than `k` MADs from the adjusted median
    * (the robust z of `lengthOutliers`, applied in time). All
    * divisions on 6-dp-rounded inputs, medians by exact percentile —
    * engine-reproducible end to end. Returns per day
    * (day, x, dow, seasonal_index, adj, is_anomaly). */
  def seasonalAnomalies(series: DataFrame, dateCol: String, xCol: String,
                        k: Double = 3.0): DataFrame = {
    val prof = seasonalProfile(series, dateCol, xCol)
      .select(col("dow"), col("seasonal_index"))
    val adj = series
      .select(col(dateCol).as("day"), col(xCol).cast("long").as("x"),
        weekday(col(dateCol)).as("dow"))
      .join(broadcast(prof), Seq("dow"))
      .select(col("day"), col("x"), col("dow"), col("seasonal_index"),
        round(col("x") / col("seasonal_index"), 6).as("adj"))
    val med = adj.agg(percentile(col("adj"), lit(0.5)).as("__med"))
    val mad = adj.crossJoin(broadcast(med))
      .agg(percentile(abs(col("adj") - col("__med")), lit(0.5)).as("__mad"),
        max("__med").as("__med"))
    adj.crossJoin(broadcast(mad))
      .select(col("day"), col("x"), col("dow"), col("seasonal_index"), col("adj"),
        (abs(col("adj") - col("__med")) > lit(k) * col("__mad")).as("is_anomaly"))
      .orderBy("day")
  }

  /** TWO-PROPORTION z-test (pooled) — the A/B readout: given per-unit
    * (variant, success) rows over EXACTLY two variants, the conversion
    * rates and z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂
    * pooled; variant order is lexicographic so the sign is
    * deterministic. One tiny keyed aggregate; the float expression is
    * mirrored operation-for-operation by the oracle. Degenerate pooled
    * rates (p̂ ∈ {0,1}) yield null z. The two-variant contract is
    * ENFORCED (ADVICE r8): one variant or 3+ variants raise at
    * execution — silently comparing the lexicographic first and last
    * of 3+ variants would produce a plausible-looking but wrong
    * readout. EMPTY input returns an empty frame (nothing to test,
    * nothing to mis-compare): a lazy plan cannot raise when no row
    * ever reaches the guard, and forcing an eager driver-side count
    * here would add a full extra pass at call time.
    * Returns one row
    * (variant_a, variant_b, n_a, n_b, x_a, x_b, p_a, p_b, z). */
  def twoProportionZ(df: DataFrame, variantCol: String, successCol: String): DataFrame = {
    val g = df.groupBy(col(variantCol).cast("string").as("v"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L)).as("x"))
    val a = g.orderBy("v").limit(1)
      .select(col("v").as("variant_a"), col("n").as("n_a"), col("x").as("x_a"))
    val b = g.orderBy(col("v").desc).limit(1)
      .select(col("v").as("variant_b"), col("n").as("n_b"), col("x").as("x_b"))
    val nv = g.agg(count(lit(1)).as("__nv"))
    val pooledP = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    a.crossJoin(b).crossJoin(broadcast(nv))
      .where(when(col("__nv") === 2, lit(true)).otherwise(
        raise_error(concat(lit("twoProportionZ: EXACTLY two variants required, found "),
          col("__nv"))).cast("boolean")))
      .select(col("variant_a"), col("variant_b"), col("n_a"), col("n_b"),
        col("x_a"), col("x_b"),
        round(col("x_a").cast("double") / col("n_a").cast("double"), 6).as("p_a"),
        round(col("x_b").cast("double") / col("n_b").cast("double"), 6).as("p_b"),
        round(when(pooledP === 0.0 || pooledP === 1.0, lit(null).cast("double"))
          .otherwise(
            (col("x_a").cast("double") / col("n_a").cast("double") -
             col("x_b").cast("double") / col("n_b").cast("double")) /
            sqrt(pooledP * (lit(1.0) - pooledP) *
              (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))),
          6).as("z"))
  }

  /** Sample AUTOCORRELATION FUNCTION r_k, k = 1..maxLag, over an
    * ALREADY-AGGREGATED integer series — the seasonality/memory
    * diagnostic (weekly ingest rhythm shows as a lag-7 spike). The
    * standard estimator r_k = Σ_{t≤n−k} d_t·d_{t+k} / Σ d_t² with
    * deviations SCALED BY n (D_t = n·x_t − T), so numerator and
    * denominator are exact integers (the n² scale cancels in the
    * ratio) and the single division per lag is engine-deterministic,
    * rounded 6 dp. Lag pairing is one self-join of the SERIES on the
    * row offset ([[mannKendall]]'s aggregate-first contract — maxLag·n
    * pairs, never the corpus). Returns (lag, n_pairs, r); constant
    * series → r null. */
  def autocorrelation(series: DataFrame, tCol: String, xCol: String,
                      maxLag: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLag >= 1, s"maxLag: $maxLag")
    val tot = series.agg(count(lit(1)).as("__n"),
      sum(col(xCol).cast("long")).as("__tt"))
    val base = series
      .select(col(tCol).as("__t"), col(xCol).cast("long").as("__x"))
      .crossJoin(broadcast(tot))
      .select(row_number().over(Window.orderBy("__t")).cast("long").as("__rn"),
        (col("__n") * col("__x") - col("__tt")).as("__d"), col("__n"))
    val c0 = base.agg(sum(col("__d") * col("__d")).as("__c0"))
    val probes = base.withColumn("__k", explode(sequence(lit(1), lit(maxLag))))
      .select(col("__k"), (col("__rn") + col("__k")).as("__rn2"), col("__d"), col("__n"))
    val pairs = probes.join(
      base.select(col("__rn").as("__rn2"), col("__d").as("__d2")), Seq("__rn2"))
    pairs.groupBy(col("__k").cast("int").as("lag"))
      .agg(max(col("__n")).as("__n"), sum(col("__d") * col("__d2")).as("__ck"))
      .crossJoin(broadcast(c0))
      .select(col("lag"), (col("__n") - col("lag")).as("n_pairs"),
        round(when(col("__c0") === 0, lit(null).cast("double"))
          .otherwise(col("__ck").cast("double") / col("__c0").cast("double")), 6).as("r"))
      .orderBy("lag")
  }
}

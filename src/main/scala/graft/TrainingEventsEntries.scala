package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 31 entries: event-stream/product analytics (q_events_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingEventsEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // per-type inter-arrival burstiness: CV of consecutive-arrival
    // gaps (Poisson ≈ 1, retry storms ≫ 1, cron ≪ 1) — exact ms
    // integers into one sqrt + one division.
    "q_events_burstiness" -> (q((s, dir) =>
      graft.ops.Evaluation.burstiness(
          SparkEntry.loader(s, dir)("events"), "event_type", "ts", col("event_id"))
        .orderBy("cls")
    ), Some("""
      WITH s AS (SELECT event_type AS cls, epoch_ms(ts) // 1000 AS t, event_id AS tb
                 FROM events),
      g AS (SELECT cls, t - lag(t) OVER (PARTITION BY cls ORDER BY t, tb) AS g FROM s),
      a AS (SELECT cls, CAST(count(*) AS BIGINT) AS n, CAST(sum(g) AS BIGINT) AS sg,
                   CAST(sum(g * g) AS BIGINT) AS sgg
            FROM g WHERE g IS NOT NULL GROUP BY 1)
      SELECT cls, n AS n_gaps,
             round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
             round(CASE WHEN sg = 0 THEN NULL
                        ELSE sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE)
                   END, 6) AS cv
      FROM a ORDER BY cls""")),

    // ordered FUNNEL analysis (view → click → purchase): per user the
    // earliest strictly-ordered stage completions + depth reached —
    // greedy-earliest is provably optimal, so each stage is one
    // min-aggregate over events after the previous stage's time (no
    // per-user history collection); oracle replays the stage chain
    "q_events_funnel" -> (q((s, dir) =>
      graft.ops.Funnel.funnel(
          SparkEntry.loader(s, dir)("events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")
    ), Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS view_ts FROM events
        WHERE event_type = 'view' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS click_ts
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.view_ts GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts GROUP BY 1)
      SELECT u.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
             CAST((CASE WHEN s1.view_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s2.click_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s3.purchase_ts IS NOT NULL THEN 1 ELSE 0 END)
               AS INT) AS stages_completed
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      ORDER BY u.user_id""")),

    // regular-grid RESAMPLE + LOCF gap fill (irregular events → dense
    // hourly per-user series): per-bucket last observation under a
    // fully deterministic (ts desc, value desc) tie order, grids
    // generated arithmetically per key (no calendar table), forward
    // fill via last(ignoreNulls). First week only — grid size is
    // keys × span/step by design, the entry bounds the span.
    "q_events_locf" -> (q((s, dir) =>
      graft.ops.Sessions.resampleLocf(
          SparkEntry.loader(s, dir)("events")
            .where(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp")),
          "user_id", "ts", "value", stepSec = 3600)
        .orderBy("key", "bucket")
    ), Some("""
      WITH ev AS (
        SELECT user_id AS key,
               CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP) AS bucket,
               ts, value
        FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
      pick AS (
        SELECT key, bucket, value
        FROM (SELECT key, bucket, value,
                     row_number() OVER (PARTITION BY key, bucket
                                        ORDER BY ts DESC, value DESC) AS rn
              FROM ev)
        WHERE rn = 1),
      grid AS (
        SELECT key, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        FROM (SELECT key, min(bucket) AS lo, max(bucket) AS hi FROM pick GROUP BY 1))
      SELECT g.key, g.bucket, p.value,
             last_value(p.value IGNORE NULLS) OVER (
               PARTITION BY g.key ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM grid g LEFT JOIN pick p USING (key, bucket)
      ORDER BY g.key, g.bucket""")),

    // weekly COHORT RETENTION matrix: users by first-activity week,
    // per-offset distinct active count + rate vs the cohort's own
    // week-0 size. Two keyed shuffles + one cohort window; Monday
    // truncation and exact 7-day offsets in both engines.
    "q_events_retention" -> (q((s, dir) =>
      graft.ops.Funnel.cohortRetention(
          SparkEntry.loader(s, dir)("events"), "user_id", "ts")
        .orderBy("cohort", "offset_w")
    ), Some("""
      WITH fw AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort
        FROM events GROUP BY 1),
      act AS (
        SELECT DISTINCT e.user_id, fw.cohort,
               CAST(datediff('day', fw.cohort, date_trunc('week', e.ts)) / 7 AS INT) AS offset_w
        FROM events e JOIN fw USING (user_id)),
      cnt AS (
        SELECT cohort, offset_w, CAST(count(*) AS BIGINT) AS users
        FROM act GROUP BY 1, 2)
      SELECT CAST(cohort AS DATE) AS cohort, offset_w, users,
             round(users / max(CASE WHEN offset_w = 0 THEN users END)
                             OVER (PARTITION BY cohort), 6) AS rate
      FROM cnt ORDER BY cohort, offset_w""")),

    // Kaplan–Meier churn risk table with right-censoring: lifetime =
    // first→last event days; churned only if the last event predates
    // the observation end by >7 days, censored otherwise (alive for
    // all we know — leaves the risk set without a death; censored-only
    // durations stay as n_events=0 lifetable rows, so a uniformly-
    // active cohort — sf0.001 — still yields a table). Exact
    // integers + one rounded ratio per row; the float survival
    // PRODUCT is deliberately left to the caller (the one
    // cross-engine-fragile piece). Risk-set suffix sum runs over
    // ≤ span-days aggregated rows.
    "q_events_survival" -> (q((s, dir) =>
      graft.ops.Funnel.kaplanMeier(
        SparkEntry.loader(s, dir)("events"), "user_id", "ts", horizonDays = 7)
    ), Some("""
      WITH spans AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
        FROM events GROUP BY 1),
      obs AS (SELECT max(CAST(ts AS DATE)) AS e FROM events),
      lt AS (
        SELECT datediff('day', f, l) AS t_days,
               CASE WHEN datediff('day', l, obs.e) > 7 THEN 1 ELSE 0 END AS churn
        FROM spans CROSS JOIN obs),
      perdur AS (
        SELECT t_days, count(*) AS n, CAST(sum(churn) AS BIGINT) AS n_events
        FROM lt GROUP BY 1)
      SELECT t_days,
             CAST(sum(n) OVER (ORDER BY t_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
             n_events,
             round(1.0 - n_events / CAST(sum(n) OVER (ORDER BY t_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS km_factor
      FROM perdur ORDER BY t_days""")),

    // first-order Markov transition matrix over per-user event
    // sequences (ts, event_id ordered): P(next | current) from
    // consecutive pairs — the behavioral fingerprint for session
    // simulation and improbable-transition anomaly scoring. One
    // per-user lead window + one (from, to) count; matrix rows
    // bounded by |types|², never event volume.
    "q_events_markov" -> (q((s, dir) =>
      graft.ops.Funnel.markovTransitions(
          SparkEntry.loader(s, dir)("events"), "user_id", "event_type",
          "ts", "event_id")
        .orderBy("from_type", "to_type")
    ), Some("""
      WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
        FROM events),
      cnt AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, cnt,
             round(cnt / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
      FROM cnt ORDER BY from_type, to_type""")),

    // first-/last-touch revenue attribution: each purchase credits the
    // first and the last view/click/signup strictly before it in the
    // user's history (running ignoreNulls window — no join back into
    // history); untouched conversions land in '(none)'. Channel-sized
    // rollup per model.
    "q_events_attribution" -> (q((s, dir) =>
      graft.ops.Funnel.attribution(
          SparkEntry.loader(s, dir)("events"), "user_id", "event_type",
          "ts", "event_id", "value",
          conversionType = "purchase", touchTypes = Seq("view", "click", "signup"))
        .orderBy("model", "channel")
    ), Some("""
      WITH seq AS (
        SELECT user_id, event_type, value,
               first_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                           THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
               last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                          THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        FROM events),
      conv AS (SELECT * FROM seq WHERE event_type = 'purchase'),
      bt AS (
        SELECT 'first_touch' AS model, coalesce(ft, '(none)') AS channel, value FROM conv
        UNION ALL
        SELECT 'last_touch', coalesce(lt, '(none)'), value FROM conv)
      SELECT model, channel, CAST(count(*) AS BIGINT) AS conversions,
             round(sum(value), 6) AS value
      FROM bt GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Mann–Kendall trend test on the daily ingest-volume series: the
    // nonparametric "is this metric drifting" monitor. Pairwise
    // sign sum runs over the AGGREGATED series (30 dailies = 435
    // pairs — the corpus never self-joins); daily sums pre-rounded
    // 6 dp so sign() never compares last-ULP-different aggregates.
    "q_events_trend" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(round(sum("value"), 6).as("x"))
      graft.ops.Evaluation.mannKendall(daily, "day", "x")
    }), Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS x
        FROM events GROUP BY 1),
      p AS (SELECT CAST(sum(CASE WHEN j.x > i.x THEN 1
                                 WHEN j.x < i.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
            FROM daily i JOIN daily j ON i.day < j.day),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
      ties AS (SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT) AS tt
               FROM (SELECT count(*) AS c FROM daily GROUP BY x HAVING count(*) > 1)),
      v AS (SELECT nn.n, p.s_stat,
                   round((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt) / 18.0, 6) AS var_s
            FROM p CROSS JOIN nn CROSS JOIN ties)
      SELECT n, s_stat, var_s,
             round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                        WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                        ELSE 0.0 END, 6) AS z
      FROM v""")),

    // CUSUM changepoint on the daily event-count series — "WHEN did
    // the metric shift". The cumulative-deviation scan runs n-scaled
    // so argmax/ties are integer-exact; only the final Brownian-
    // bridge-normalized statistic divides. Windows run over the
    // 30-row AGGREGATED series.
    "q_events_cusum" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.Evaluation.cusumChangepoint(daily, "day", "x")
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t,
                     CAST(sum(x * x) AS BIGINT) AS sxx FROM daily),
      cum AS (SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
                     CAST(sum(x) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
              FROM daily),
      sc AS (SELECT day, tot.n, tot.sxx, tot.t, tot.n * cum.c - cum.rn * tot.t AS s
             FROM cum CROSS JOIN tot)
      SELECT n, day AS t_star, CAST(abs(s) AS BIGINT) AS s_max,
             round(CASE WHEN n * sxx - t * t = 0 THEN 0.0
                        ELSE CAST(abs(s) AS DOUBLE) /
                             (sqrt(CAST(n * sxx - t * t AS DOUBLE)) * sqrt(CAST(n AS DOUBLE)))
                   END, 6) AS stat
      FROM sc ORDER BY abs(s) DESC, day LIMIT 1""")),

    // first-touch WINDOWED funnel: each stage must land within 24h of
    // the previous one, anchored at the earliest view (the conversion-
    // window convention; re-anchoring variants are a different
    // operator — documented on the op). Exact-µs window bounds.
    "q_events_funnel_window" -> (q((s, dir) =>
      graft.ops.Funnel.funnelWithin(
          SparkEntry.loader(s, dir)("events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), withinSec = 86400L)
        .orderBy("user_id")
    ), Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS view_ts FROM events
        WHERE event_type = 'view' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS click_ts
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.view_ts
          AND epoch_us(e.ts) <= epoch_us(s1.view_ts) + 86400000000 GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
          AND epoch_us(e.ts) <= epoch_us(s2.click_ts) + 86400000000 GROUP BY 1)
      SELECT u.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
             CAST((CASE WHEN s1.view_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s2.click_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s3.purchase_ts IS NOT NULL THEN 1 ELSE 0 END)
               AS INT) AS stages_completed
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      ORDER BY u.user_id""")),

    // session bounce rate: single-event sessions per user over the
    // same 30-minute session rule — the engagement-quality scalar on
    // top of sessionization.
    "q_events_bounce" -> (q((s, dir) => {
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      graft.ops.Sessions.sessionSummary(e, "user_id", "ts",
          gapSec = 1800, tieBreak = col("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("bounces"))
        .withColumn("bounce_rate",
          round(col("bounces").cast("double") / col("n_sessions").cast("double"), 6))
        .orderBy("user_id")
    }), Some("""
      WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts, event_id FROM events),
      g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - 1 AS sess
        FROM g),
      ses AS (SELECT user_id, sess, count(*) AS n_events FROM s GROUP BY 1, 2)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
             round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
                   count(*), 6) AS bounce_rate
      FROM ses GROUP BY user_id ORDER BY user_id""")),

    // dimensional-history lookup: each purchase joined with the
    // segment that HELD at its moment — q_events_scd2's intervals
    // probed as-of, the composition the SCD table exists for. The
    // as-of probe is the running-last window (one user-keyed shuffle,
    // no range join).
    "q_events_scd2_lookup" -> (q((s, dir) => {
      val p = SparkEntry.loader(s, dir)("events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 100).cast("long").as("segment"))
      val dim = graft.ops.Dedup.scd2(p, "user_id", "ts", Seq("segment"), col("event_id"))
      graft.ops.AsofJoin.asofBackward(
          p.select(col("user_id"), col("ts"), col("event_id")),
          dim.select(col("user_id"), col("valid_from"), col("segment")),
          keys = Seq("user_id"), leftTs = "ts", rightTs = "valid_from",
          payload = Seq("segment"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("asof_segment").as("held_segment"))
        .orderBy("user_id", "ts", "event_id")
    }), Some("""
      WITH p AS (SELECT user_id, ts, event_id,
                        CAST(floor(value / 100) AS BIGINT) AS segment
                 FROM events WHERE event_type = 'purchase'),
      ch AS (SELECT *, lag(segment) OVER w AS prev FROM p
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      dim AS (SELECT user_id, ts AS valid_from, segment FROM ch
              WHERE prev IS NULL OR prev IS DISTINCT FROM segment)
      SELECT p.user_id, p.ts, p.event_id,
             (SELECT d.segment FROM dim d
              WHERE d.user_id = p.user_id AND d.valid_from <= p.ts
              ORDER BY d.valid_from DESC LIMIT 1) AS held_segment
      FROM p ORDER BY p.user_id, p.ts, p.event_id""")),

    // LTV curve: average cumulative revenue by account age with
    // maturity-eligible denominators (without the clip the tail mixes
    // cohorts and bends down spuriously); bounded ×maxAge explodes,
    // exact cents.
    "q_events_ltv" -> (q((s, dir) =>
      graft.ops.Funnel.ltvCurve(SparkEntry.loader(s, dir)("events"),
        "user_id", "ts", "value", maxAge = 29)
    ), Some("""
      WITH act AS (SELECT user_id AS u, CAST(ts AS DATE) AS day,
                          CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
      f AS (SELECT u, min(day) AS first_d FROM act GROUP BY 1),
      e AS (SELECT max(CAST(ts AS DATE)) AS endd FROM events),
      sp AS (SELECT u, first_d, least(datediff('day', first_d, e.endd), 29) AS span
             FROM f CROSS JOIN e),
      rev AS (SELECT act.u, sp.span, datediff('day', sp.first_d, act.day) AS age,
                     CAST(sum(cents) AS BIGINT) AS c
              FROM act JOIN sp ON act.u = sp.u GROUP BY 1, 2, 3),
      numer AS (SELECT CAST(age + i AS INT) AS age, CAST(sum(c) AS BIGINT) AS total_cents
                FROM rev, generate_series(0, 29) AS g(i)
                WHERE age + i <= span GROUP BY 1),
      denom AS (SELECT CAST(i AS INT) AS age, CAST(count(*) AS BIGINT) AS n_users
                FROM sp, generate_series(0, 29) AS g(i)
                WHERE i <= span GROUP BY 1)
      SELECT d.age, d.n_users, coalesce(n.total_cents, 0) AS total_cents,
             round(CAST(coalesce(n.total_cents, 0) AS DOUBLE) /
                   (CAST(d.n_users AS DOUBLE) * 100.0), 6) AS ltv
      FROM denom d LEFT JOIN numer n ON d.age = n.age ORDER BY d.age""")),

    // empirical-Bayes conversion-rate shrinkage toward the pooled
    // rate (pseudo-count τ=20): the small-n ranking fix; the prior is
    // ONE exact pooled-integer division so engines see the identical
    // m.
    "q_events_eb_rates" -> (q((s, dir) => {
      val perUser = SparkEntry.loader(s, dir)("events")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      graft.ops.Evaluation.ebShrinkRates(
          perUser.select(col("user_id"), (col("conv") === 1L).as("ok")),
          "user_id", "ok", tau = 20.0)
        .orderBy("key")
    }), Some("""
      WITH pd AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                  FROM events GROUP BY 1, 2),
      g AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(conv) AS BIGINT) AS x FROM pd GROUP BY 1),
      m AS (SELECT CAST(sum(x) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS m FROM g)
      SELECT key, n, x,
             round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
             round((CAST(x AS DOUBLE) + 20.0 * m.m) / (CAST(n AS DOUBLE) + 20.0), 6)
               AS shrunken
      FROM g CROSS JOIN m ORDER BY key""")),

    // per-user activity streaks (gaps-and-islands): longest and
    // current consecutive-day runs — the island key day − rank is
    // constant within a gapless run, integer-exact.
    "q_events_streaks" -> (q((s, dir) =>
      graft.ops.Funnel.activityStreaks(
          SparkEntry.loader(s, dir)("events"), "user_id", "ts")
        .orderBy("entity")
    ), Some("""
      WITH act AS (SELECT DISTINCT user_id AS entity, CAST(ts AS DATE) AS day FROM events),
      e AS (SELECT max(CAST(ts AS DATE)) AS endd FROM events),
      runs AS (SELECT entity,
                      day - CAST(row_number() OVER (PARTITION BY entity ORDER BY day) AS INT)
                        AS island,
                      day
               FROM act),
      agg AS (SELECT entity, island, CAST(count(*) AS BIGINT) AS len, max(day) AS last_d
              FROM runs GROUP BY 1, 2)
      SELECT entity, CAST(sum(len) AS BIGINT) AS n_active_days,
             CAST(max(len) AS BIGINT) AS longest_streak,
             CAST(coalesce(max(CASE WHEN last_d = e.endd THEN len END), 0) AS BIGINT)
               AS current_streak
      FROM agg CROSS JOIN e GROUP BY entity ORDER BY entity""")),

    // exact rolling 7-day active users (WAU): each active day covers
    // the next 7 report days — a bounded ×7 explode + distinct count,
    // no inequality join, exact where a sliding approx-distinct is
    // not.
    "q_events_wau" -> (q((s, dir) =>
      graft.ops.Funnel.rollingActiveUsers(
        SparkEntry.loader(s, dir)("events"), "user_id", "ts", windowDays = 7)
    ), Some("""
      WITH act AS (SELECT DISTINCT user_id AS entity, CAST(ts AS DATE) AS day FROM events),
      b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
      cov AS (SELECT DISTINCT entity, day + CAST(i AS INT) AS rday
              FROM act, generate_series(0, 6) AS g(i))
      SELECT rday AS day, CAST(count(*) AS BIGINT) AS active
      FROM cov CROSS JOIN b
      WHERE rday >= b.lo AND rday <= b.hi
      GROUP BY 1 ORDER BY day""")),

    // DAU growth accounting: each day's actives split into new /
    // retained / resurrected, churned reconciling against yesterday
    // (dau − dau_prev = new + resurrected − churned) — per-user lag
    // over ACTIVE DAYS, then day-keyed aggregates; all integers.
    "q_events_growth" -> (q((s, dir) =>
      graft.ops.Funnel.growthAccounting(
        SparkEntry.loader(s, dir)("events"), "user_id", "ts")
    ), Some("""
      WITH act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
      f AS (SELECT u, day,
                   lag(day) OVER (PARTITION BY u ORDER BY day) AS prev,
                   min(day) OVER (PARTITION BY u) AS first_d
            FROM act),
      flags AS (SELECT day,
                       CASE WHEN day = first_d THEN 1 ELSE 0 END AS is_new,
                       CASE WHEN datediff('day', prev, day) = 1 THEN 1 ELSE 0 END AS is_ret,
                       CASE WHEN day <> first_d AND
                                 (prev IS NULL OR datediff('day', prev, day) > 1)
                            THEN 1 ELSE 0 END AS is_res
                FROM f),
      daily AS (SELECT day, CAST(count(*) AS BIGINT) AS dau,
                       CAST(sum(is_new) AS BIGINT) AS new_users,
                       CAST(sum(is_ret) AS BIGINT) AS retained,
                       CAST(sum(is_res) AS BIGINT) AS resurrected
                FROM flags GROUP BY 1)
      SELECT day, dau, new_users, retained, resurrected,
             CAST(lag(dau) OVER (ORDER BY day) - retained AS BIGINT) AS churned
      FROM daily ORDER BY day""")),

    // day × event-type count matrix via the DataFrame pivot API (fixed
    // value list so the schema is static and engine-independent);
    // absent combinations densify to 0. The oracle is the conditional-
    // aggregation unpivot of the same matrix.
    "q_events_pivot" -> (q((s, dir) =>
      SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().na.fill(0L)
        .orderBy("day")
    ), Some("""
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY 1 ORDER BY day""")),

    // SCD Type-2 history: each user's purchase-value segment (bucket
    // of 100) versioned into [valid_from, valid_to) intervals —
    // consecutive same-segment purchases collapse, the open version
    // flags current. The dimension-history builder behind every
    // as-of analytics join.
    "q_events_scd2" -> (q((s, dir) => {
      val p = SparkEntry.loader(s, dir)("events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 100).cast("long").as("segment"))
      graft.ops.Dedup.scd2(p, "user_id", "ts", Seq("segment"), col("event_id"))
        .orderBy("user_id", "valid_from")
    }), Some("""
      WITH p AS (SELECT user_id, ts, event_id,
                        CAST(floor(value / 100) AS BIGINT) AS segment
                 FROM events WHERE event_type = 'purchase'),
      ch AS (SELECT *, lag(segment) OVER w AS prev FROM p
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      f AS (SELECT user_id, ts, event_id, segment FROM ch
            WHERE prev IS NULL OR prev IS DISTINCT FROM segment)
      SELECT user_id, segment, ts AS valid_from,
             lead(ts) OVER w2 AS valid_to,
             lead(ts) OVER w2 IS NULL AS is_current
      FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from""")),

    // daily OHLC candles: open/close from ONE struct min/max (no
    // per-day window), turnover as engine-exact integer cents (float
    // sums of raw doubles are partition-order-dependent).
    "q_events_ohlc" -> (q((s, dir) =>
      graft.ops.Evaluation.dailyOhlc(
        SparkEntry.loader(s, dir)("events"), "ts", "value", col("event_id"))
    ), Some("""
      WITH e AS (SELECT CAST(ts AS DATE) AS day, ts, event_id, value
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT day, value,
                   row_number() OVER (PARTITION BY day ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e),
      oc AS (SELECT day, max(CASE WHEN rn_a = 1 THEN value END) AS open,
                    max(CASE WHEN rn_d = 1 THEN value END) AS close FROM r GROUP BY 1),
      agg AS (SELECT day, max(value) AS high, min(value) AS low,
                     CAST(count(*) AS BIGINT) AS volume,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
              FROM e GROUP BY 1)
      SELECT agg.day, oc.open, agg.high, agg.low, oc.close, agg.volume, agg.total_cents
      FROM agg JOIN oc USING (day) ORDER BY day""")),

    // per-user time-weighted average value (step-function hold until
    // the next sample): cents × microseconds keep every intermediate
    // an exact integer, one division at the end.
    "q_events_twa" -> (q((s, dir) =>
      graft.ops.Evaluation.timeWeightedAverage(
          SparkEntry.loader(s, dir)("events"), "user_id", "ts", "value",
          tieBreak = col("event_id"))
        .orderBy("key")
    ), Some("""
      WITH s AS (SELECT user_id AS key, epoch_us(ts) AS t, event_id AS tb,
                        CAST(round(value * 100, 0) AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      l AS (SELECT key, t, cents,
                   lead(t) OVER (PARTITION BY key ORDER BY t, tb) AS tnext FROM s)
      SELECT key, CAST(count(*) AS BIGINT) AS n_samples,
             CAST(max(t) - min(t) AS BIGINT) AS span_us,
             round(CASE WHEN max(t) - min(t) = 0 THEN NULL
                        ELSE CAST(sum(CASE WHEN tnext IS NOT NULL
                                           THEN cents * (tnext - t) ELSE 0 END) AS DOUBLE) /
                             (CAST(max(t) - min(t) AS DOUBLE) * 100.0)
                   END, 6) AS twa
      FROM l GROUP BY key ORDER BY key""")),

    // unpivot (melt): the wide day × type matrix back to long rows via
    // the DataFrame unpivot API — with the pivot entry this pins the
    // roundtrip; absent combinations stay as explicit zeros.
    "q_events_unpivot" -> (q((s, dir) => {
      val wide = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().na.fill(0L)
      wide.unpivot(Array(col("day")),
          Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
          "event_type", "n")
        .orderBy("day", "event_type")
    }), Some("""
      WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      types AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
      c AS (SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
      SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
      FROM days d CROSS JOIN types t
      LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
      ORDER BY d.day, t.event_type""")),

    // seasonality-adjusted anomaly days: counts divided by the weekday
    // index, flagged beyond 3 MADs of the adjusted median — the
    // monitor q_events_seasonal exists to feed (a normal Saturday dip
    // stops alerting). All divisions on 6-dp inputs, exact-percentile
    // medians.
    "q_events_anomaly" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.Evaluation.seasonalAnomalies(daily, "day", "x", k = 3.0)
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
      prof AS (SELECT CAST(isodow(day) - 1 AS INT) AS dow,
                      round(CAST(sum(x) * tot.n AS DOUBLE) /
                            CAST(count(*) * tot.s AS DOUBLE), 6) AS seasonal_index
               FROM daily CROSS JOIN tot GROUP BY 1, tot.n, tot.s),
      adj AS (SELECT day, x, CAST(isodow(day) - 1 AS INT) AS dow, p.seasonal_index,
                     round(x / p.seasonal_index, 6) AS adj
              FROM daily JOIN prof p ON CAST(isodow(day) - 1 AS INT) = p.dow),
      med AS (SELECT quantile_cont(adj, 0.5) AS m FROM adj),
      mad AS (SELECT quantile_cont(abs(adj.adj - med.m), 0.5) AS d, max(med.m) AS m
              FROM adj CROSS JOIN med)
      SELECT adj.day, adj.x, adj.dow, adj.seasonal_index, adj.adj,
             abs(adj.adj - mad.m) > 3.0 * mad.d AS is_anomaly
      FROM adj CROSS JOIN mad ORDER BY day""")),

    // 3-step session paths: which ordered journeys occur, with counts
    // — the path-mining layer over the same 30-minute session rule as
    // q_sessionize; lead windows per (user, session), count shuffle
    // keyed by the ≤|types|³ trigram (minCount=1: sf0.001 sessions
    // are too short for higher support, and the output is
    // type-cubed-bounded anyway).
    "q_events_paths" -> (q((s, dir) => {
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      graft.ops.Funnel.pathTrigrams(e, "user_id", "event_type", "ts",
          tieBreak = col("event_id"), gapSec = 1800, minCount = 1)
        .orderBy("t1", "t2", "t3")
    }), Some("""
      WITH e AS (
        SELECT user_id, event_type, date_trunc('second', ts) AS ts, event_id FROM events),
      g AS (
        SELECT user_id, event_type, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, event_type, ts, event_id,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - 1 AS sess
        FROM g),
      tg AS (
        SELECT event_type AS t1, lead(event_type, 1) OVER w2 AS t2,
               lead(event_type, 2) OVER w2 AS t3
        FROM s
        WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY ts, event_id))
      SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS cnt
      FROM tg WHERE t3 IS NOT NULL
      GROUP BY 1, 2, 3 HAVING count(*) >= 1 ORDER BY 1, 2, 3""")),

    // two-proportion z-test (pooled) on a deterministic user split —
    // the A/B readout: did variant A's users convert more? The float
    // expression is mirrored operation-for-operation by the oracle.
    "q_events_abtest" -> (q((s, dir) => {
      val perUser = SparkEntry.loader(s, dir)("events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .select(when(col("user_id") % 2 === 0, "A").otherwise("B").as("variant"),
          (col("conv") === 1L).as("success"))
      graft.ops.Evaluation.twoProportionZ(perUser, "variant", "success")
    }), Some("""
      WITH pu AS (SELECT user_id,
                         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                  FROM events GROUP BY 1),
      v AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v, conv FROM pu),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS x
            FROM v GROUP BY 1),
      a AS (SELECT v AS variant_a, n AS n_a, x AS x_a FROM g ORDER BY v LIMIT 1),
      b AS (SELECT v AS variant_b, n AS n_b, x AS x_b FROM g ORDER BY v DESC LIMIT 1),
      j AS (SELECT *, CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
            FROM a CROSS JOIN b WHERE variant_a <> variant_b)
      SELECT variant_a, variant_b, n_a, n_b, x_a, x_b,
             round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
             round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
             round(CASE WHEN pp = 0.0 OR pp = 1.0 THEN NULL
                        ELSE (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
                              CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
                             sqrt(pp * (1.0 - pp) *
                                  (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                   END, 6) AS z
      FROM j""")),

    // Theil–Sen robust slope of the daily series — the trend MAGNITUDE
    // beside q_events_trend's Mann–Kendall direction test: median
    // pairwise slope (one outlier day cannot drag it), intercept from
    // residual medians under the rounded slope. Pairwise over the
    // 30-row aggregated series.
    "q_events_theil_sen" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("t", datediff(col("day"), lit("1970-01-01")))
      graft.ops.Evaluation.theilSenSlope(daily, "t", "x")
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      d2 AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS t, x FROM daily),
      p AS (SELECT CAST(j.x - i.x AS DOUBLE) / CAST(j.t - i.t AS DOUBLE) AS s
            FROM d2 i JOIN d2 j ON j.t > i.t),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d2),
      sl AS (SELECT round(avg(s), 6) AS slope
             FROM (SELECT s, row_number() OVER (ORDER BY s) AS r FROM p) CROSS JOIN m
             WHERE r = (m.m + 1) // 2 OR r = (m.m + 2) // 2),
      res AS (SELECT x - sl.slope * t AS res FROM d2 CROSS JOIN sl),
      ic AS (SELECT round(avg(res), 6) AS intercept
             FROM (SELECT res, row_number() OVER (ORDER BY res) AS r FROM res) CROSS JOIN nn
             WHERE r = (nn.n + 1) // 2 OR r = (nn.n + 2) // 2)
      SELECT nn.n, m.m AS n_pairs, sl.slope, ic.intercept
      FROM nn CROSS JOIN m CROSS JOIN sl CROSS JOIN ic""")),

    // funnel latency: time from first view to the first purchase
    // strictly after it, per user — exact µs gaps so the percentile
    // interpolation stays engine-exact; one summary row.
    "q_events_time_to_convert" -> (q((s, dir) => {
      val ttc = graft.ops.Funnel.timeToConvert(
        SparkEntry.loader(s, dir)("events"), "user_id", "event_type", "ts",
        fromType = "view", toType = "purchase")
      ttc.agg(count(lit(1)).as("n_converted"),
        round(percentile(col("delta_us"), lit(0.5)) / 1e6, 6).as("p50_s"),
        round(percentile(col("delta_us"), lit(0.9)) / 1e6, 6).as("p90_s"),
        round((sum("delta_us") / count(lit(1))) / 1e6, 6).as("mean_s"))
    }), Some("""
      WITH f AS (SELECT user_id, min(ts) AS t_from FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, f.t_from, min(e.ts) AS t_to
            FROM events e JOIN f USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > f.t_from GROUP BY 1, 2),
      d AS (SELECT epoch_us(t_to) - epoch_us(t_from) AS delta_us FROM c)
      SELECT CAST(count(*) AS BIGINT) AS n_converted,
             round(quantile_cont(delta_us, 0.5) / 1000000.0, 6) AS p50_s,
             round(quantile_cont(delta_us, 0.9) / 1000000.0, 6) AS p90_s,
             round((CAST(sum(delta_us) AS DOUBLE) / count(*)) / 1000000.0, 6) AS mean_s
      FROM d""")),

    // RFM behavioral segmentation: per user recency/frequency/monetary
    // + deterministic ntile quintile scores (ties broken by entity id
    // so buckets cannot flip across engines); the windows run over the
    // 150-user aggregate, never the event stream.
    "q_events_rfm" -> (q((s, dir) =>
      graft.ops.Funnel.rfm(SparkEntry.loader(s, dir)("events"),
          "user_id", "ts", "value")
        .orderBy("entity")
    ), Some("""
      WITH pu AS (SELECT user_id AS entity, max(CAST(ts AS DATE)) AS last_d,
                         CAST(count(*) AS BIGINT) AS frequency,
                         round(sum(value), 6) AS monetary
                  FROM events GROUP BY 1),
      a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
      b AS (SELECT entity, CAST(a.anchor - last_d AS INT) AS recency_days,
                   frequency, monetary
            FROM pu CROSS JOIN a),
      sc AS (SELECT entity, recency_days, frequency, monetary,
                    ntile(5) OVER (ORDER BY recency_days DESC, entity) AS r,
                    ntile(5) OVER (ORDER BY frequency ASC, entity) AS f,
                    ntile(5) OVER (ORDER BY monetary ASC, entity) AS m
             FROM b)
      SELECT entity, recency_days, frequency, monetary, r, f, m,
             r * 100 + f * 10 + m AS rfm
      FROM sc ORDER BY entity""")),

    // day-of-week seasonal profile of the daily series — the weekly-
    // rhythm decomposition an alerting monitor divides by before
    // thresholding; the index is one exact-integer-product division.
    "q_events_seasonal" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.Evaluation.seasonalProfile(daily, "day", "x")
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily)
      SELECT CAST(isodow(day) - 1 AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mean_x,
             round(CAST(sum(x) * tot.n AS DOUBLE) / CAST(count(*) * tot.s AS DOUBLE), 6)
               AS seasonal_index
      FROM daily CROSS JOIN tot
      GROUP BY 1, tot.n, tot.s ORDER BY dow""")),

    // per-type daily-volume OLS trend — "which event streams are
    // growing": closed-form slope/intercept per group, each ONE
    // division of exact integers (intercept from the symmetric form,
    // not the rounded slope).
    "q_events_trend_by_type" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("t", datediff(col("day"), lit("1970-01-01")))
      graft.ops.Evaluation.groupTrendOls(daily, "event_type", "t", "x")
        .orderBy("grp")
    }), Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
      d2 AS (SELECT event_type AS grp,
                    CAST(day - DATE '1970-01-01' AS BIGINT) AS t, x FROM daily),
      a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(t * t) AS BIGINT) AS stt,
                   CAST(sum(t * x) AS BIGINT) AS stx
            FROM d2 GROUP BY 1)
      SELECT grp, n,
             round(CASE WHEN n * stt - st * st = 0 THEN NULL
                        ELSE CAST(n * stx - st * sx AS DOUBLE) /
                             CAST(n * stt - st * st AS DOUBLE) END, 6) AS slope,
             round(CASE WHEN n * stt - st * st = 0 THEN NULL
                        ELSE CAST(sx * stt - st * stx AS DOUBLE) /
                             CAST(n * stt - st * st AS DOUBLE) END, 6) AS intercept
      FROM a ORDER BY grp""")),

    // sample ACF at lags 1..7 on the same daily series — the
    // seasonality/memory diagnostic (a weekly rhythm shows at lag 7).
    // Numerator and denominator carry the n² scale as exact integers;
    // one division per lag.
    "q_events_acf" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.Evaluation.autocorrelation(daily, "day", "x", maxLag = 7)
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t FROM daily),
      base AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
                      tot.n * daily.x - tot.t AS d, tot.n AS n
               FROM daily CROSS JOIN tot),
      c0 AS (SELECT CAST(sum(d * d) AS BIGINT) AS c0 FROM base),
      p AS (SELECT ks.k, a.d * b.d AS dd, a.n
            FROM generate_series(1, 7) AS ks(k), base a, base b
            WHERE b.rn = a.rn + ks.k)
      SELECT CAST(k AS INT) AS lag, CAST(max(n) - k AS BIGINT) AS n_pairs,
             round(CASE WHEN c0.c0 = 0 THEN NULL
                        ELSE CAST(sum(dd) AS DOUBLE) / CAST(c0.c0 AS DOUBLE) END, 6) AS r
      FROM p CROSS JOIN c0 GROUP BY k, c0.c0 ORDER BY lag""")),
  )
}

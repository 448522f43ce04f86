package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered FUNNEL analysis — the staged-conversion query of product
  * analytics (view → click → purchase): for each entity, the earliest
  * strictly-ordered completion time of every stage, and how deep into
  * the funnel it got. Greedy-earliest per stage is optimal (exchange
  * argument: if ANY event assignment completes stages 1..k, the one
  * taking each stage's earliest admissible event does too), so stage
  * k's time is simply min(ts of stage-k events after stage k−1's
  * time), and the reached depth is the defined-prefix length.
  *
  * Shape at 100 TB: one keyed aggregate + broadcast-or-keyed join per
  * stage (stage count is small and fixed); no per-entity event-list
  * collection, no window over full per-user histories. Null stage
  * times propagate forward, so each row's stage columns form a
  * prefix. */
object Funnel {

  /** Returns (`userCol`, <stage>_ts …, stages_completed). Stage order
    * is strict (`>`): a same-timestamp event does not advance the
    * funnel — the deliberate tie rule (an instantaneous "conversion"
    * is attribution noise at event-log granularity). */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame =
    funnelImpl(events, userCol, typeCol, tsCol, stages, withinSec = None)

  /** Shared stage-join loop of [[funnel]] / [[funnelWithin]] — the two
    * differ ONLY in the admissibility bound on each stage's events
    * (strictly after the previous stage, optionally also within its
    * conversion window). */
  private def funnelImpl(events: DataFrame, userCol: String, typeCol: String,
                         tsCol: String, stages: Seq[String],
                         withinSec: Option[Long]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages, s"stages: $stages")
    withinSec.foreach(s => require(s > 0, s"withinSec: $s"))
    val base = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var acc = base.select(col("__u")).distinct()
    var prevCol: Option[String] = None
    for (st <- stages) {
      val outCol = s"${st}_ts"
      val evs = base.where(col("__t") === st)
      val stage = prevCol match {
        case None =>
          evs.groupBy(col("__u")).agg(min(col("__ts")).as(outCol))
        case Some(p) =>
          val admissible = withinSec match {
            case None => col("__ts") > col(p)
            case Some(s) => col("__ts") > col(p) &&
              unix_micros(col("__ts")) <= unix_micros(col(p)) + s * 1000000L
          }
          evs.join(acc.select(col("__u"), col(p)).where(col(p).isNotNull), "__u")
            .where(admissible)
            .groupBy(col("__u")).agg(min(col("__ts")).as(outCol))
      }
      acc = acc.join(stage, Seq("__u"), "left")
      prevCol = Some(outCol)
    }
    acc.select(
      (col("__u").as(userCol) +:
        stages.map(st => col(s"${st}_ts"))) :+
        stages.map(st => when(col(s"${st}_ts").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int").as("stages_completed"): _*)
  }

  /** FIRST-TOUCH WINDOWED funnel — [[funnel]] with a conversion
    * window: stage k must land within `withinSec` of stage k−1's
    * time. Semantics are ANCHORED at the earliest stage-1 event
    * (the Amplitude-style convention): a user whose first entry
    * missed its window does NOT re-anchor at a later entry — with
    * windows, greedy-earliest is no longer optimal across anchors
    * (a later anchor can open a window the earliest one closed), and
    * re-anchoring semantics need a per-user sequence scan, a
    * different operator. Window bounds compare exact µs. Same
    * shape/output as [[funnel]]. */
  def funnelWithin(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String], withinSec: Long): DataFrame =
    funnelImpl(events, userCol, typeCol, tsCol, stages, withinSec = Some(withinSec))

  /** Weekly COHORT RETENTION — the other canonical product-analytics
    * matrix: users grouped by first-activity week (the cohort), and for
    * each week offset the count of that cohort still active, plus the
    * rate against the cohort's own week-0 size. Two keyed shuffles
    * (per-user first week, then the (cohort, offset) distinct-count) +
    * one cohort-partitioned window for the rate — no per-user history
    * collection, so the shape holds at any event volume. Weeks truncate
    * to Monday (`date_trunc`), offsets are exact multiples of 7 days.
    * Returns (cohort, offset_w, users, rate). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).as("__w"))
    val firstWeek = base.groupBy("__u").agg(min("__w").as("cohort"))
    val active = base.join(firstWeek, Seq("__u"))
      .select(col("__u"), col("cohort"),
        (datediff(col("__w"), col("cohort")) / 7).cast("int").as("offset_w"))
      .distinct()
    val counts = active.groupBy("cohort", "offset_w")
      .agg(count(lit(1)).as("users"))
    val w = Window.partitionBy("cohort")
    counts
      .withColumn("rate", round(col("users") /
        max(when(col("offset_w") === 0, col("users"))).over(w), 6))
      .select(col("cohort").cast("date").as("cohort"),
        col("offset_w"), col("users"), col("rate"))
  }

  /** Kaplan–Meier RISK TABLE over per-entity lifetimes (Kaplan & Meier
    * 1958) — churn analysis with right-censoring done honestly: an
    * entity's lifetime runs first event → last event (whole days); it
    * COUNTS as churned only when its last event predates the
    * observation end by more than `horizonDays` (otherwise it is
    * censored — still alive for all we know, so it leaves the risk set
    * without registering a death). For each churn duration t:
    * n_risk = entities with lifetime ≥ t, n_events = churns AT t, and
    * the KM factor (1 − d/n) whose running product is the survival
    * curve (left to the caller/plot layer: a cross-engine float
    * product is the one non-reproducible piece, while this table is
    * exact integers + one rounded ratio).
    *
    * Shape: one per-entity min/max aggregate, a 1-row broadcast of the
    * observation end, then a second aggregate to per-DURATION rows —
    * after which the cumulative risk-set window runs over ≤ span-days
    * rows, so its single partition is a non-issue at any event volume.
    * Returns the full lifetable (t_days, n_risk, n_events, km_factor)
    * — censored-only durations stay as n_events = 0 / factor 1 rows
    * (they carry the risk-set exits; a uniformly-active cohort still
    * yields a table instead of vanishing), ordered by t_days. */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"horizonDays: $horizonDays")
    import org.apache.spark.sql.expressions.Window
    val spans = events.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol).cast("date")).as("__first"),
           max(col(tsCol).cast("date")).as("__last"))
    val end = events.agg(max(col(tsCol).cast("date")).as("__end"))
    val lifetimes = spans.crossJoin(broadcast(end))
      .select(datediff(col("__last"), col("__first")).as("t_days"),
        when(datediff(col("__end"), col("__last")) > horizonDays, 1L)
          .otherwise(0L).as("__churn"))
    val perDur = lifetimes.groupBy("t_days")
      .agg(count(lit(1)).as("__n"), sum("__churn").as("n_events"))
    // risk set at t = everyone whose lifetime reached t: suffix sum over
    // the per-duration counts (descending-order running total).
    val w = Window.orderBy(col("t_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDur.withColumn("n_risk", sum(col("__n")).over(w))
      .select(col("t_days"), col("n_risk"), col("n_events"),
        round(lit(1.0) - col("n_events") / col("n_risk"), 6).as("km_factor"))
      .orderBy("t_days")
  }

  /** First-/last-touch REVENUE ATTRIBUTION — which acquisition channel
    * gets credit for each conversion: for every `conversionType` event,
    * the FIRST and the LAST `touchTypes` event strictly before it in
    * the user's (ts, id)-ordered history; conversion counts and value
    * roll up per (model, channel), conversions with no prior touch
    * land in the '(none)' channel (unattributable traffic is a signal,
    * not a dropped row). One per-user window pass (running first/last
    * with ignoreNulls — no per-conversion join back into history),
    * then a channel-sized aggregate. Returns
    * (model ∈ first_touch/last_touch, channel, conversions, value). */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String, valueCol: String,
                  conversionType: String, touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*), col(typeCol))
    val conv = events
      .withColumn("__ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .where(col(typeCol) === conversionType)
    conv.select(explode(array(
        struct(lit("first_touch").as("m"),
          coalesce(col("__ft"), lit("(none)")).as("c"),
          col(valueCol).cast("double").as("v")),
        struct(lit("last_touch").as("m"),
          coalesce(col("__lt"), lit("(none)")).as("c"),
          col(valueCol).cast("double").as("v")))).as("a"))
      .groupBy(col("a.m").as("model"), col("a.c").as("channel"))
      .agg(count(lit(1)).as("conversions"), round(sum("a.v"), 6).as("value"))
  }

  /** First-order MARKOV TRANSITION MATRIX over per-entity event
    * sequences: P(next = b | current = a), estimated from every
    * consecutive pair in each entity's (ts, id)-ordered history —
    * the behavioral fingerprint behind session simulation, anomaly
    * scoring (improbable transitions), and next-event models. One
    * per-entity window (lead) + one (from, to) count shuffle; the
    * row-normalizing total joins back per `from` — aggregate rows are
    * bounded by |event types|², never by event volume. `idCol` breaks
    * same-timestamp ties so the sequence — and thus the matrix — is
    * deterministic. Returns (from_type, to_type, cnt, p) with p
    * rounded 6 dp. */
  def markovTransitions(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"),
        col(tsCol), col(idCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val cnt = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("from_type").agg(sum("cnt").as("__tot"))
    cnt.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        round(col("cnt") / col("__tot"), 6).as("p"))
  }

  /** TIME-TO-CONVERT per entity: the first `fromType` event and the
    * first `toType` event STRICTLY AFTER it, with the gap in exact
    * µs — the latency distribution behind every funnel ([[funnel]]
    * gives reach, this gives speed). Two entity-keyed aggregates (the
    * anchor min, then the conditional min over post-anchor
    * conversions) — no per-entity history collection, no window over
    * the corpus. Returns converted entities only:
    * (entity, t_from, t_to, delta_us). Percentiles/means over
    * delta_us are the caller's one extra aggregate (µs are integers,
    * so exact-percentile interpolation stays engine-exact). */
  def timeToConvert(events: DataFrame, entityCol: String, typeCol: String,
                    tsCol: String, fromType: String, toType: String): DataFrame = {
    val anchors = events.where(col(typeCol) === fromType)
      .groupBy(col(entityCol).as("entity"))
      .agg(min(col(tsCol)).as("t_from"))
    events.where(col(typeCol) === toType)
      .select(col(entityCol).as("entity"), col(tsCol).as("__ts"))
      .join(anchors, Seq("entity"))
      .where(col("__ts") > col("t_from"))
      .groupBy(col("entity"), col("t_from"))
      .agg(min("__ts").as("t_to"))
      .select(col("entity"), col("t_from"), col("t_to"),
        (unix_micros(col("t_to")) - unix_micros(col("t_from"))).as("delta_us"))
  }

  /** LTV CURVE — average cumulative revenue per user by account age
    * (the payback-period chart every acquisition budget is set
    * against): ltv(a) = Σ_eligible cumrev_u(a) / |eligible(a)|, where
    * a user is eligible at age `a` only if observed that long
    * (first day + a ≤ feed end — without the eligibility clip the
    * curve's tail mixes cohorts of different maturity and bends down
    * spuriously). Revenue at age a′ contributes to every age a ≥ a′:
    * ONE bounded ×maxAge explode per (user, age) revenue cell and per
    * user span — no per-age rescan, no inequality join; cents keep
    * the sums exact. Returns (age, n_users, total_cents, ltv). */
  def ltvCurve(events: DataFrame, entityCol: String, tsCol: String,
               valueCol: String, maxAge: Int): DataFrame = {
    require(maxAge >= 0, s"maxAge: $maxAge")
    val act = events.select(col(entityCol).as("u"),
      col(tsCol).cast("date").as("day"),
      round(col(valueCol).cast("double") * 100, 0).cast("long").as("cents"))
    val first = act.groupBy("u").agg(min("day").as("__first"))
    val end = events.agg(max(col(tsCol).cast("date")).as("__end"))
    val spans = first.crossJoin(broadcast(end))
      .select(col("u"), col("__first"),
        least(datediff(col("__end"), col("__first")), lit(maxAge)).as("__span"))
    val rev = act.join(spans, Seq("u"))
      .select(col("u"), col("__span"),
        datediff(col("day"), col("__first")).as("__age"), col("cents"))
      .groupBy("u", "__span", "__age").agg(sum("cents").as("__c"))
    val numer = rev
      // revenue past the clipped span contributes to no reported age
      // (and Spark's sequence(start > stop) would silently DESCEND)
      .where(col("__age") <= col("__span"))
      .select(explode(sequence(col("__age"), col("__span"))).as("age"), col("__c"))
      .groupBy("age").agg(sum("__c").as("total_cents"))
    val denom = spans
      .select(explode(sequence(lit(0), col("__span"))).as("age"))
      .groupBy("age").agg(count(lit(1)).as("n_users"))
    denom.join(numer, Seq("age"), "left")
      .select(col("age"), col("n_users"),
        coalesce(col("total_cents"), lit(0L)).as("total_cents"),
        round(coalesce(col("total_cents"), lit(0L)).cast("double") /
          (col("n_users").cast("double") * 100.0), 6).as("ltv"))
      .orderBy("age")
  }

  /** Per-entity ACTIVITY STREAKS (gaps-and-islands): consecutive-day
    * runs found by the classic island key day − rank (constant within
    * a gapless run, integer-exact), then per entity the longest streak
    * and the CURRENT streak (the run touching the feed's last observed
    * day; 0 if the entity wasn't active then — the re-engagement
    * trigger every streak feature needs). Windows run over per-entity
    * ACTIVE DAYS. Returns (entity, n_active_days, longest_streak,
    * current_streak). */
  def activityStreaks(events: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = events.select(col(entityCol).as("entity"),
      col(tsCol).cast("date").as("day")).distinct()
    val end = events.agg(max(col(tsCol).cast("date")).as("__end"))
    val w = Window.partitionBy("entity").orderBy("day")
    val runs = act
      .withColumn("__island",
        datediff(col("day"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy("entity", "__island")
      .agg(count(lit(1)).as("__len"), max("day").as("__last"))
    runs.crossJoin(broadcast(end))
      .groupBy("entity")
      .agg(sum("__len").as("n_active_days"),
        max("__len").as("longest_streak"),
        coalesce(max(when(col("__last") === col("__end"), col("__len"))), lit(0L))
          .as("current_streak"))
  }

  /** ROLLING ACTIVE USERS — exact sliding-window distinct (WAU/MAU):
    * each (entity, active day) covers the next `windowDays` report
    * days, so the count per report day is a plain distinct count after
    * a BOUNDED ×windowDays explode — no inequality join, no
    * per-window rescan of history, and exact where a sliding
    * `approx_count_distinct` would not be. Report days clip to the
    * observed range. Returns (day, active). */
  def rollingActiveUsers(events: DataFrame, entityCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays: $windowDays")
    val act = events.select(col(entityCol).as("entity"),
      col(tsCol).cast("date").as("day")).distinct()
    val bounds = events.agg(min(col(tsCol).cast("date")).as("__lo"),
      max(col(tsCol).cast("date")).as("__hi"))
    act
      .select(col("entity"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))).as("rday"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .where(col("rday") >= col("__lo") && col("rday") <= col("__hi"))
      .groupBy(col("rday").as("day"))
      .agg(count(lit(1)).as("active"))
      .orderBy("day")
  }

  /** DAU GROWTH ACCOUNTING (the Duolingo/a16z decomposition): each
    * day's active users split into NEW (first-ever day), RETAINED
    * (also active yesterday), and RESURRECTED (seen before, but not
    * yesterday); CHURNED = yesterday's actives who didn't return
    * (= dau_prev − retained, so the four series reconcile:
    * dau = new + retained + resurrected and
    * dau − dau_prev = new + resurrected − churned). One distinct
    * (user, day) activity set, a per-user lag window over ACTIVE DAYS
    * (bounded by a user's active-day count, not events), then a
    * day-keyed aggregate + one day-level lag (that one global window
    * runs over the CALENDAR-day frame — years of dailies, never
    * entities or events; it cannot outgrow a task). All integers. Returns
    * (day, dau, new_users, retained, resurrected, churned) — churned
    * null on the first observed day (no yesterday to churn from). */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = events.select(col(userCol).as("__u"),
      col(tsCol).cast("date").as("day")).distinct()
    val w = Window.partitionBy("__u").orderBy("day")
    val flagged = act
      .withColumn("__prev", lag(col("day"), 1).over(w))
      .withColumn("__first", min(col("day")).over(
        Window.partitionBy("__u")))
      .select(col("day"),
        when(col("day") === col("__first"), 1L).otherwise(0L).as("__new"),
        when(datediff(col("day"), col("__prev")) === 1, 1L).otherwise(0L).as("__ret"),
        when(col("day") =!= col("__first") &&
          (col("__prev").isNull || datediff(col("day"), col("__prev")) > 1), 1L)
          .otherwise(0L).as("__res"))
    val daily = flagged.groupBy("day")
      .agg(count(lit(1)).as("dau"), sum("__new").as("new_users"),
        sum("__ret").as("retained"), sum("__res").as("resurrected"))
    // churned = dau_prev − retained; across a calendar gap retained is
    // 0 by the strict day−1 rule, so the same formula correctly counts
    // ALL of the previous observed day's actives as churned
    daily
      .withColumn("__dau_prev", lag(col("dau"), 1).over(Window.orderBy("day")))
      .select(col("day"), col("dau"), col("new_users"), col("retained"),
        col("resurrected"),
        when(col("__dau_prev").isNull, lit(null).cast("long"))
          .otherwise(col("__dau_prev") - col("retained")).as("churned"))
      .orderBy("day")
  }

  /** Frequent ordered event-type TRIGRAMS within sessions — the
    * path-mining step after [[markovTransitions]]' one-step view:
    * which three-step journeys actually recur (view→view→purchase vs
    * view→click→purchase tells a different product story than any
    * transition matrix can). Sessions come from
    * [[Sessions.sessionize]]'s gap rule; the lead window runs per
    * (entity, session) — bounded by session length, never the corpus —
    * and the count shuffle is keyed by the (≤ |types|³) trigram.
    * Returns (t1, t2, t3, cnt) with cnt ≥ `minCount`. */
  def pathTrigrams(events: DataFrame, entityCol: String, typeCol: String,
                   tsCol: String, tieBreak: org.apache.spark.sql.Column,
                   gapSec: Long, minCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Sessions.sessionize(events, entityCol, tsCol, gapSec, tieBreak)
    val w = Window.partitionBy(col(entityCol), col("session_idx"))
      .orderBy(col(tsCol), tieBreak)
    s.select(col(typeCol).as("t1"),
        lead(col(typeCol), 1).over(w).as("t2"),
        lead(col(typeCol), 2).over(w).as("t3"))
      .where(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** RFM segmentation (recency / frequency / monetary) — the classic
    * behavioral quintile scoring: per entity, days since last
    * activity (vs the feed's own max date — no wall clock enters, so
    * the result is reproducible), event count, and value sum; each
    * dimension scored 1..5 under a DETERMINISTIC total order (metric,
    * then entity id — ties cannot flip buckets across engines or
    * partitionings), 5 = best (most recent / most frequent / highest
    * value).
    *
    * SCALE (VERDICT r8 #4): two tiers behind one exact semantics, the
    * [[Batching.rankWithinScaled]] convention. At or below
    * `windowThreshold` entities the three quintiles are plain
    * `ntile(5)` windows — a one-task sort of a few million narrow rows
    * is cheaper than any distributed rank's fixed costs. Above it,
    * each dimension gets a [[Batching.rankWithinScaled]] distributed
    * two-pass rank (range partitions sorted in parallel + broadcast
    * offsets) and the bucket falls out of the SQL-standard ntile
    * arithmetic over (rank, N): the first N mod k buckets take ⌈N/k⌉
    * rows, the rest ⌊N/k⌋ — identical buckets to the window form
    * (spec-pinned in OpsSpec on both tiers), so 100M entities never
    * funnel through one task. Both tiers rank the ENTITY-sized
    * aggregate, never the event stream. Returns
    * (entity, recency_days, frequency, monetary, r, f, m, rfm). */
  def rfm(events: DataFrame, entityCol: String, tsCol: String,
          valueCol: String, windowThreshold: Long = 1L << 22): DataFrame = Pinned.guard {
    import org.apache.spark.sql.expressions.Window
    val perUser = events.groupBy(col(entityCol).as("entity"))
      .agg(max(col(tsCol).cast("date")).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol).cast("double")), 6).as("monetary"))
    val anchor = events.agg(max(col(tsCol).cast("date")).as("__anchor"))
    val base = perUser.crossJoin(broadcast(anchor))
      .select(col("entity"), datediff(col("__anchor"), col("__last")).as("recency_days"),
        col("frequency"), col("monetary"))
    // SQL-standard ntile from a 0-based global rank: q = ⌊n/k⌋, r = n
    // mod k; the first r buckets hold q+1 rows. Counts stay far below
    // 2^52, so the double divisions inside floor() are exact.
    def ntileOf(rank: Column, n: Column, k: Int): Column = {
      val q = floor(n / k).cast("long")
      val r = (n % k).cast("long")
      val cut = r * (q + lit(1L))
      when(rank < cut, floor(rank / (q + lit(1L))).cast("long") + 1L)
        .otherwise(r + floor((rank - cut) / q).cast("long") + 1L)
        .cast("int")
    }
    // PIN the entity-sized aggregate once ([[Pinned]]): the tier choice
    // needs a count, the small tier's three windows and the scaled
    // tier's three rank folds each re-read it, and rankWithinScaled runs
    // TWO eager actions (key probe + offset collect) per fold — an
    // unpinned 3-fold chain re-executes the full event-stream aggregate
    // ~7× (review r9). Each fold releases its predecessor once its own
    // pin materializes; the returned frame is slot-held (one live rfm
    // result — a re-invocation invalidates the previous one).
    val (pinnedBase, baseH) = Pinned.checkpoint(base)
    var lastFoldH: org.apache.spark.rdd.RDD[_] = null
    val nEntities = pinnedBase.count()
    val scored =
      if (nEntities <= windowThreshold)
        pinnedBase.select(col("entity"), col("recency_days"), col("frequency"), col("monetary"),
          ntile(5).over(Window.orderBy(col("recency_days").desc, col("entity"))).as("r"),
          ntile(5).over(Window.orderBy(col("frequency").asc, col("entity"))).as("f"),
          ntile(5).over(Window.orderBy(col("monetary").asc, col("entity"))).as("m"))
      else {
        var d = pinnedBase
        var h: org.apache.spark.rdd.RDD[_] = null
        for ((ord, out) <- Seq[(Seq[Column], String)](
            (Seq(col("recency_days").desc, col("entity")), "r"),
            (Seq(col("frequency").asc, col("entity")), "f"),
            (Seq(col("monetary").asc, col("entity")), "m"))) {
          val ranked = Batching
            .rankWithinScaled(d.withColumn("__g", lit(0L)), "__g", ord, out = "__rk")
            .withColumn(out, ntileOf(col("__rk"), lit(nEntities), 5))
            .drop("__g", "__rk")
          val (nd, nh) = Pinned.checkpoint(ranked)
          Pinned.release(h)
          d = nd; h = nh
        }
        lastFoldH = h // released only AFTER hold() materializes from it
        d
      }
    val out = Pinned.hold("funnel.rfm",
      scored.withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m")))
    Pinned.release(baseH, lastFoldH)
    out
  }
}

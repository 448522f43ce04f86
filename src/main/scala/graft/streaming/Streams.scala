package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.etl.{DocAssembler, SnowflakePlan}

/**
 * Structured Streaming surface. The reference has no true streaming —
 * its "stream" is an incremental batch pull with a resumable watermark
 * file and worker threads (mysql_to_s3/extract.py:92-154). Spark-native,
 * the same capabilities become:
 *
 *  - `extractStream`: continuous snowflake extract — each micro-batch of
 *    fact rows is doc-assembled against the (static, broadcast) dims and
 *    appended to the sink; Spark's checkpoint replaces the watermark
 *    file (same at-least-once, resume-from-offset contract).
 *  - `windowedCounts`: the JX time-domain edge on an unbounded stream —
 *    event-time windows + watermark-bounded state.
 *  - `sessionize`: gap-based session windows via
 *    flatMapGroupsWithState — the custom-state path the JX window
 *    accumulators (vendor/jx_python/windows.py) would need on a stream.
 *
 * Scale notes: stream side never shuffles in `extractStream` (dims are
 * broadcast); windowed aggs shuffle on (window, key) with state bounded
 * by the watermark horizon; sessionize state is per-user and evicted by
 * processing-time timeout.
 */
object Streams {

  /** Exact-dedup ON INGEST: drop any document whose normalized content
    * hash ([[graft.ops.Dedup.contentHash]]) was already seen within the
    * watermark horizon — `dropDuplicatesWithinWatermark` keeps hash
    * state ONLY until the watermark passes it, so state is bounded by
    * (ingest rate × delay), not by corpus history. The batch analogue is
    * [[graft.ops.Dedup.dropExactDuplicates]]; near-dup (MinHash/SimHash)
    * stays a batch/compaction concern — its candidate join has no
    * bounded-state streaming form. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  delay: String): DataFrame =
    docs.withColumn("__h", graft.ops.Dedup.contentHash(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Exact-dedup ON INGEST against an existing corpus: the streaming
    * form of `Dedup.dedupDeltaAgainstIndex` — arriving docs drop when
    * their content hash is already in the STATIC index (stream-static
    * left_anti, the index re-read per micro-batch so a growing index
    * file is picked up), then within-stream duplicates drop via
    * watermark-bounded hash state. History is never re-scanned; state
    * is the index (disk) + the watermark horizon's hashes (memory). */
  def dedupStreamAgainstIndex(docs: DataFrame, textCol: String, tsCol: String,
                              delay: String, index: DataFrame): DataFrame =
    docs.withColumn("content_hash", graft.ops.Dedup.contentHash(col(textCol)))
      // null-safe anti (same rationale as Dedup.dedupDeltaAgainstIndex:
      // an indexed null hash must drop arriving null-text docs)
      .join(index.select(col("content_hash").as("__idx_hash")),
        col("content_hash") <=> col("__idx_hash"), "left_anti")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Benchmark decontamination ON INGEST: the streaming form of
    * `TextAnalysis.decontaminate` — every arriving document is flagged
    * when any of its word n-grams collides with the STATIC benchmark
    * gram set. STATELESS by construction: the verdict depends only on
    * the row's own content and the fixed benchmark, so there is no
    * watermark, no state store, and Append mode emits every row on
    * arrival — the shape that gates an ingest firehose before it ever
    * lands in the corpus. The benchmark grams are collected ONCE at
    * query definition and broadcast (eval sets are MBs — the same
    * bound the batch operator's broadcast join rides; for eval-suite
    * unions beyond that, build the set from
    * `TextAnalysis.decontaminateBloom`'s filter instead). Gram
    * construction stays in Column space (identical tokenization to the
    * batch op); only the set membership is a JVM udf over the
    * broadcast. Returns the stream plus (n_hits, contaminated) with
    * the batch operator's exact semantics (distinct colliding grams). */
  def decontaminateStream(docs: DataFrame, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int): DataFrame = {
    import graft.ops.TextAnalysis
    val grams = bench
      .select(TextAnalysis.tokens(lower(col(benchTextCol))).as("__t"))
      .select(explode(TextAnalysis.ngramsFromTokens(col("__t"), n)).as("__g"))
      .distinct().collect().map(_.getString(0)).toSet
    val bc = docs.sparkSession.sparkContext.broadcast(grams)
    val hits = udf((gs: Seq[String]) =>
      if (gs == null) 0L else gs.distinct.count(bc.value.contains).toLong)
    docs
      .withColumn("__t", TextAnalysis.tokens(lower(col(textCol))))
      .withColumn("n_hits", hits(TextAnalysis.ngramsFromTokens(col("__t"), n)))
      .drop("__t")
      .withColumn("contaminated", col("n_hits") > 0L)
  }

  /** Micro-batch snowflake assembly: the fact stream is joined/nested
    * against static dimension tables per `plan` and handed to `sink`
    * (e.g. a partitioned NDJSON writer + notification). */
  def extractStream(factStream: DataFrame, plan: SnowflakePlan,
                    loadStatic: String => DataFrame)(
                    sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    extractStreamRaw(factStream, plan, loadStatic) { (_, docs, id) => sink(docs, id) }

  /** The shared micro-batch assembly loop; the sink also sees the raw
    * fact batch (for cheap emptiness/inspection without re-running the
    * fact⋈dims assembly). */
  private def extractStreamRaw(factStream: DataFrame, plan: SnowflakePlan,
                               loadStatic: String => DataFrame)(
                               sink: (Dataset[Row], DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    factStream.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      // restrictChildren: a micro-batch is an increment — child tables are
      // semi-joined down to the batch's keys before their collect_list,
      // same as the batch extract (a trigger touching 0.01% of parents
      // must not re-aggregate 100% of children)
      val docs = DocAssembler.assemble(plan,
        name => if (name == plan.table) batch.toDF() else loadStatic(name),
        restrictChildren = true)
      sink(batch, docs, id)
    }

  /** [[extractStream]] with the batch extract's notification parity: one
    * {bucket, key, timestamp, date/time} message per non-empty micro-batch
    * after its sink completes (reference extract.py:244-251; key = the
    * micro-batch id, the streaming analogue of the batch coordinates). */
  def extractStreamNotified(factStream: DataFrame, plan: SnowflakePlan,
                            loadStatic: String => DataFrame,
                            notifier: graft.etl.Notifier, bucket: String)(
                            sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    extractStreamRaw(factStream, plan, loadStatic) { (batch, docs, id) =>
      // emptiness is checked on the incoming FACT batch (the assembly
      // root: empty facts → empty docs) — probing the assembled docs
      // would re-run the whole fact⋈dims join as an extra job per trigger
      val empty = batch.isEmpty
      sink(docs, id)
      // empty micro-batches (empty triggers, restart replays) wrote no
      // object — notifying would advertise a key that does not exist
      if (!empty)
        notifier.add(graft.etl.Notifier.batchMessage(bucket, id.toString, java.time.Instant.now()))
    }

  /** Event-time sliding-window aggregation with a watermark bound. */
  def windowedCounts(events: DataFrame, tsCol: String, valueCol: String,
                     windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"), col("total"))

  /** Windowed FREQUENT-ITEMS on a stream: per (tumbling event-time
    * window, key), the arrival count, filtered to the support threshold
    * `minCount` — the streaming sibling of the batch heavy-hitters
    * census (`Sketches.heavyHitters`). In Append mode a window's rows
    * emit once the watermark passes its end, and its counters are then
    * EVICTED — so state is bounded by (open windows × key cardinality)
    * however long the stream runs, the property that makes a frequency
    * census feasible on an unbounded source at all. */
  def windowedFrequentItems(events: DataFrame, tsCol: String, keyCol: String,
                            windowLen: String, watermark: String,
                            minCount: Long): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"))

  /** Windowed DISTINCT-COUNT sketch on a stream: per tumbling
    * event-time window, the HyperLogLog register rows for `keyCol` —
    * streaming COUNT(DISTINCT) with state bounded by (open windows ×
    * 2^p) REGARDLESS of key cardinality, where an exact windowed
    * distinct would hold every key seen per open window (the classic
    * unbounded-state trap; dropDuplicates-within-window state grows
    * with the key stream). One stateful aggregation (max per (window,
    * bucket)) in Append mode: a window's registers emit at watermark
    * finalization and evict.
    *
    * Emits the SPARSE register table (only touched buckets) — the
    * production split: the stream maintains registers, the serving
    * side estimates ([[graft.ops.Sketches.hllEstimateGrouped]]) and
    * can merge windows/streams by slot-wise max before estimating.
    * Registers are md5-derived exactly as the batch sketch, so a
    * drained stream is row-identical to the batch replay. */
  def windowedDistinctHll(events: DataFrame, tsCol: String, keyCol: String,
                          windowLen: String, watermark: String, p: Int): DataFrame =
    events
      .where(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"),
        graft.ops.Sketches.hllBucket(col(keyCol), p).as("bucket"))
      .agg(max(graft.ops.Sketches.hllRho(col(keyCol))).as("reg"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("bucket"), col("reg"))

  /** Windowed OHLC candles on a stream — the finance-style compaction
    * running INSIDE the stream ([[graft.ops.Evaluation.dailyOhlc]]'s
    * sibling): per tumbling window, open/close from one struct
    * min/max over (ts, tiebreak, value) — a plain streaming
    * aggregation, state = open windows × a handful of scalars, no
    * per-window row buffering — high/low/volume, and turnover as
    * exact integer cents. Append mode: a candle emits once at
    * watermark finalization. */
  def windowedOhlc(events: DataFrame, tsCol: String, valueCol: String,
                   tieBreak: org.apache.spark.sql.Column, windowLen: String,
                   watermark: String): DataFrame = {
    val v = col(valueCol).cast("double")
    events
      .where(v.isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(
        min(struct(col(tsCol).as("t"), tieBreak.as("i"), v.as("v"))).as("__o"),
        max(struct(col(tsCol).as("t"), tieBreak.as("i"), v.as("v"))).as("__c"),
        max(v).as("high"), min(v).as("low"), count(lit(1)).as("volume"),
        sum(round(v * 100, 0).cast("long")).as("total_cents"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("__o.v").as("open"), col("high"), col("low"),
        col("__c.v").as("close"), col("volume"), col("total_cents"))
  }

  /** Windowed COUNT-MIN sketch on a stream — frequency estimates per
    * tumbling window with state bounded by (open windows × d·w)
    * REGARDLESS of key cardinality, where [[windowedFrequentItems]]'s
    * exact counters grow with the window's distinct keys (fine for
    * event types, fatal for URLs/user-agents). One stateful count per
    * (window, row, bucket) in Append mode; cells are md5-derived
    * exactly as the batch sketch ([[graft.ops.Sketches.cmSketch]]), so
    * a drained window's cell table point-queries identically
    * ([[graft.ops.Sketches.cmEstimate]] on the drained rows — the
    * registers-in-store/estimate-at-query split, sketch edition;
    * never undercounts, merges by cell-wise sum). */
  def windowedCmSketch(events: DataFrame, tsCol: String, keyCol: String,
                       windowLen: String, watermark: String,
                       w: Int, d: Int): DataFrame = {
    require(w > 1 && d >= 1, s"w: $w, d: $d")
    events
      .where(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col("row"),
        (conv(substring(md5(concat(col("row").cast("string"), lit(":"), col("__k"))),
          1, 6), 16, 10).cast("long") % w).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("row"), col("bucket"), col("cnt"))
  }

  /** Windowed per-class MIX MONITOR: per finalized tumbling window,
    * each class's row count and weight sum (tokens, bytes) — the
    * streaming sibling of `TextAnalysis.mixDrift`, watching the
    * source/language composition of an ingest feed drift in flight
    * instead of between releases. Append mode: a window's totals emit
    * exactly once at watermark finalization and its counters evict, so
    * state is bounded by (open windows × class cardinality) on an
    * unbounded feed. Share-of-window math is left to the consumer (it
    * needs the window total, a second tiny aggregate over this
    * output). */
  def windowedMix(events: DataFrame, tsCol: String, classCol: String,
                  weight: org.apache.spark.sql.Column,
                  windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(classCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(weight, lit(0L))).as("weight"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(classCol), col("n_rows"), col("weight"))

  /** STREAM-STREAM inner join within an event-time interval: each left
    * row matches right rows with the same key whose timestamp falls in
    * [left.ts, left.ts + `within`] — attribution-style enrichment
    * (impression→click, order→payment) where BOTH sides are unbounded.
    *
    * The watermark + the two-sided time-range predicate are what make
    * this run with BOUNDED state: Spark derives, from `watermark` and
    * `within`, exactly how long each side's rows must be buffered before
    * no future match is possible, then evicts (the state-cleanup
    * contract stream-stream joins require — without the time bound the
    * buffers grow with the stream). Matches emit as soon as both rows
    * have arrived; the watermark governs eviction, not emission, so a
    * bounded drain equals the batch interval join ([[graft.ops.RangeJoin]]
    * is the batch sibling).
    *
    * Column names: BOTH sides keep their names, so the joined frame
    * carries duplicate `keyCol`/`tsCol` columns — select through the
    * dataset aliases this function installs (`col("l.ts")` /
    * `col("r.ts")`), as a bare `col("ts")` is ambiguous. Renaming the
    * right side here would break the alias-qualified access downstream
    * consumers use to keep both event identities. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
                         tsCol: String, within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"))
  }

  /** LEFT-OUTER stream-stream interval join: like [[intervalJoinStream]],
    * but an unmatched left row EMITS (with nulls on the right) once the
    * watermark proves no future match can arrive — i.e. when its match
    * window `[ts, ts+within]` falls entirely behind the global watermark
    * (min of both streams' watermarks) and its state evicts. The
    * attribution-funnel shape ("views that never converted") that an
    * inner join cannot express on unbounded streams: the null verdict
    * is only safe once eviction guarantees completeness, which is
    * exactly when Spark emits it. */
  def intervalJoinStreamLeftOuter(left: DataFrame, right: DataFrame, keyCol: String,
                                  tsCol: String, within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"),
      "left_outer")
  }

  // -- sessionization -----------------------------------------------------

  case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(userId: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
                     nEvents: Long, total: Double)

  /** Native gap-based session aggregation — the preferred streaming path:
    * `session_window` handles merge + watermark finalization with no
    * custom state code; append mode emits a session once the watermark
    * guarantees no more members can arrive. */
  def sessionWindowAgg(events: DataFrame, tsCol: String, valueCol: String, keyCol: String,
                       gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total"))

  /** Custom-state sessionization via flatMapGroupsWithState — the escape
    * hatch for state machines `session_window` can't express. A session
    * closes when a same-user event arrives more than `gapMs` later;
    * still-open sessions stay in state. Runs on batch Datasets too, BUT
    * batch execution discards state at end-of-run and NoTimeout never
    * fires, so each user's still-open TRAILING session is not emitted
    * (emitting it here would double-emit under streaming's append mode,
    * where the same call continues next micro-batch) — on batch, close
    * trailing sessions with a per-user sentinel event past the gap, or
    * use the batch sessionizer. For plain gap sessions on a stream prefer
    * [[sessionWindowAgg]]: group-state timeouts in this Spark version
    * retrigger empty micro-batches unboundedly, which starves
    * drain-the-source semantics (processAllAvailable). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach(state.update)
            closed.result().iterator
          }
      }
  }

  /** Convenience: run a streaming DataFrame to an in-memory table and
    * block until current data is processed (test/debug utility). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q
  }
}

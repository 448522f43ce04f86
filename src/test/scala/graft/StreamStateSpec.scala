package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Explain-level state-store contracts for the five stateful stream
  * shapes (VERDICT r13 #7: join / outer join / dedup / sessions /
  * rollup) — turns the "documented by design" scale arguments into
  * pinned tests, the same upgrade PlanSpec gave the batch plans. All
  * through PUBLIC APIs: `StreamingQueryProgress.stateOperators` names
  * the stateful physical operator (operatorName), reports the state
  * partition count the plan froze in (numShufflePartitions — the
  * per-query knob the catalog entries size to stream volume), and
  * counts watermark evictions (numRowsRemoved — the bounded-state
  * contract: without eviction, stream state grows with the stream, the
  * thing that kills a 100-TB ingest). Timestamps are fixed literals —
  * event time only, no wall clock. */
class StreamStateSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Run `df` to a memory sink at `parts` shuffle partitions, feeding
    * batches via `feed` (each element = one addData + drain round), and
    * return the per-batch progress snapshots that have state info. */
  private def drainWithState(df: DataFrame, name: String, mode: OutputMode,
                             parts: Int)(feed: Int => Unit): (StreamingQuery, Seq[org.apache.spark.sql.streaming.StateOperatorProgress]) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
      (0 until 3).foreach { i => feed(i); q.processAllAvailable() }
      val progress = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      q.stop()
      (q, progress)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("stream-stream interval join: symmetricHashJoin state, pinned partitions, watermark evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streams.intervalJoinStream(
      views.toDF().toDF("user_id", "ts", "event_id"),
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", within = "30 minutes", watermark = "1 hour")
    val (_, st) = drainWithState(joined, "ss_join", OutputMode.Append(), 4) {
      case 0 =>
        views.addData((1L, ts("2024-01-01 00:00:00"), 10L))
        clicks.addData((1L, ts("2024-01-01 00:10:00"), 20L))
      case 1 => // advance BOTH watermarks far past the first window
        views.addData((2L, ts("2024-01-02 12:00:00"), 11L))
        clicks.addData((2L, ts("2024-01-02 12:00:00"), 21L))
      case _ => // one more batch so eviction lands in a progress report
        views.addData((3L, ts("2024-01-03 12:00:00"), 12L))
        clicks.addData((3L, ts("2024-01-03 12:00:00"), 22L))
    }
    assert(st.nonEmpty, "join must report a state operator")
    assert(st.forall(_.operatorName == "symmetricHashJoin"),
      s"state operator: ${st.map(_.operatorName).distinct}")
    assert(st.forall(_.numShufflePartitions == 4),
      s"state partitions must be the per-query knob: ${st.map(_.numShufflePartitions).distinct}")
    assert(st.map(_.numRowsRemoved).sum > 0,
      "watermark must EVICT buffered rows — unbounded join state otherwise")
  }

  test("stream-stream LEFT-OUTER join: same state shape, eviction emits the unmatched row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streams.intervalJoinStreamLeftOuter(
      views.toDF().toDF("user_id", "ts", "event_id"),
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", within = "30 minutes", watermark = "1 hour")
      .select(col("l.event_id").as("view_id"), col("r.event_id").as("click_id"))
    val (_, st) = drainWithState(joined, "ss_outer", OutputMode.Append(), 4) {
      case 0 => views.addData((1L, ts("2024-01-01 00:00:00"), 10L)) // never matches
      case 1 =>
        views.addData((2L, ts("2024-01-02 12:00:00"), 11L))
        clicks.addData((2L, ts("2024-01-02 12:00:00"), 21L))
      case _ =>
        views.addData((3L, ts("2024-01-03 12:00:00"), 12L))
        clicks.addData((3L, ts("2024-01-03 12:00:00"), 22L))
    }
    assert(st.forall(_.operatorName == "symmetricHashJoin"),
      s"state operator: ${st.map(_.operatorName).distinct}")
    assert(st.forall(_.numShufflePartitions == 4),
      s"partitions: ${st.map(_.numShufflePartitions).distinct}")
    assert(st.map(_.numRowsRemoved).sum > 0, "outer join must evict on watermark")
    // the eviction IS the emission: the unmatched view surfaced with nulls
    val out = spark.table("ss_outer").collect()
    assert(out.exists(r => r.getLong(0) == 10L && r.isNullAt(1)),
      s"unmatched view must emit null-extended after eviction: ${out.toSeq}")
  }

  test("streaming dedup: dedupeWithinWatermark state, hash state evicts at the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[(Long, Timestamp, String)]
    val deduped = Streams.dedupStream(
      docs.toDF().toDF("doc_id", "ts", "text"), "text", "ts", delay = "10 minutes")
    val (_, st) = drainWithState(deduped, "ss_dedup", OutputMode.Append(), 4) {
      case 0 =>
        docs.addData((1L, ts("2024-01-01 00:00:00"), "same text"),
          (2L, ts("2024-01-01 00:01:00"), "same text")) // in-horizon dup drops
      case 1 => docs.addData((3L, ts("2024-01-01 06:00:00"), "later"))
      case _ => docs.addData((4L, ts("2024-01-01 12:00:00"), "much later"))
    }
    assert(st.nonEmpty, "dedup must report a state operator")
    assert(st.forall(_.operatorName == "dedupeWithinWatermark"),
      s"state operator: ${st.map(_.operatorName).distinct}")
    assert(st.forall(_.numShufflePartitions == 4),
      s"partitions: ${st.map(_.numShufflePartitions).distinct}")
    assert(st.map(_.numRowsRemoved).sum > 0,
      "hash state must evict once the watermark passes it — otherwise " +
        "state = corpus history, the exact thing dropDuplicatesWithinWatermark bounds")
    val out = spark.table("ss_dedup").collect()
    assert(out.length == 3 && !out.exists(_.getLong(0) == 2L),
      s"in-horizon duplicate must drop: ${out.toSeq}")
  }

  test("session windows: sessionWindowStateStoreSaveExec state, finalized sessions evict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val sess = Streams.sessionWindowAgg(
      events.toDF().toDF("user_id", "ts", "value"),
      "ts", "value", "user_id", gap = "30 minutes", watermark = "1 hour")
    val (_, st) = drainWithState(sess, "ss_sessions", OutputMode.Append(), 4) {
      case 0 =>
        events.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
          (1L, ts("2024-01-01 00:10:00"), 2.0))
      case 1 => events.addData((1L, ts("2024-01-02 12:00:00"), 3.0))
      case _ => events.addData((1L, ts("2024-01-03 12:00:00"), 4.0))
    }
    assert(st.nonEmpty, "session agg must report a state operator")
    assert(st.forall(_.operatorName.toLowerCase.contains("session")),
      s"state operator: ${st.map(_.operatorName).distinct}")
    assert(st.forall(_.numShufflePartitions == 4),
      s"partitions: ${st.map(_.numShufflePartitions).distinct}")
    assert(st.map(_.numRowsRemoved).sum > 0,
      "a watermark-finalized session must leave the state store")
    val out = spark.table("ss_sessions").collect()
    assert(out.exists(r => r.getLong(3) == 2L),
      s"the finalized 2-event session must have emitted: ${out.toSeq}")
  }

  test("foreachBatch rollup (IVM): ZERO engine state operators — state lives in the FactStore") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ss_rollup").toString
    val store = new graft.container.FactStore(spark, "ss_rollup_state",
      java.nio.file.Paths.get(tmp, "store"))
    val in = MemoryStream[(String, Double)]
    val q = in.toDF().toDF("event_type", "value").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.ops.Rollup.aggDelta(batch, Seq("event_type"), "value")
        if (store.isEmpty) store.insert(delta)
        else store.upsert(graft.ops.Rollup.merge(store.dataFrame, delta, Seq("event_type")),
          "event_type")
        ()
      }
      .option("checkpointLocation", java.nio.file.Paths.get(tmp, "ckpt").toString)
      .start()
    in.addData(("a", 1.0), ("b", 2.0)); q.processAllAvailable()
    in.addData(("a", 3.0)); q.processAllAvailable()
    val st = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
    q.stop()
    // the IVM shape's whole point at scale: micro-batch cost tracks the
    // DELTA and the engine holds NO streaming state (no store to grow,
    // no checkpoint state files per batch) — history lives in the
    // mergeable FactStore and is never re-scanned
    assert(st.isEmpty, s"foreachBatch rollup must not register state operators: $st")
    val rows = store.dataFrame.orderBy("event_type")
      .select("event_type", "cnt", "sum_v").as[(String, Long, Double)].collect()
    assert(rows.toSeq == Seq(("a", 2L, 4.0), ("b", 1L, 2.0)), rows.toSeq.toString)
  }
}

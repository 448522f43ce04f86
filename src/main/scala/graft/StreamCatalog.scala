package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/**
 * Driver-checked STREAMING entries: each runs a real Structured
 * Streaming query (readStream → transform → memory sink), drains the
 * source (`processAllAvailable`), and returns the sink table — so the
 * DuckDB oracle checks the streaming path end-to-end against batch SQL
 * semantics, not just a spec on crafted rows.
 *
 * The file source is the same parquet the batch entries read; on a real
 * cluster the identical code runs against an unbounded source (Kafka /
 * file arrival) with the same watermark/state semantics — bounded-drain
 * equivalence to the batch oracle is exactly the guarantee Structured
 * Streaming's incrementalization contract makes.
 */
object StreamCatalog {
  import QueryCatalog.{Q, raw}

  /** Memory-sink names are single-use: verify and bench may run one
    * entry several times in a JVM, and a reused name would read back a
    * stale sink. */
  private val seq = new java.util.concurrent.atomic.AtomicInteger()
  private def sinkName(tag: String): String = s"graft_stream_${tag}_${seq.incrementAndGet()}"

  /** Batch-infer the schema once, then stream-read the same file —
    * streaming file sources require an explicit schema, and a brace-glob
    * path so the source's basePath resolves to the directory (a bare
    * file path is rejected). Applies the same ns→µs `ts` normalization
    * as the batch loader.
    *
    * The inferred schema is CACHED per (dir, table) — static file
    * metadata, not data (r14): every stream entry paid a batch
    * parquet footer read per invocation (twice for the stream-stream
    * joins, which build two sources over the same table), pure fixed
    * overhead on the drain-dominated entries. A production job passes
    * its schema explicitly for the same reason. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), org.apache.spark.sql.types.StructType]()
  private def streamRead(s: SparkSession, dir: String, table: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent((dir, table),
      _ => s.read.parquet(s"$dir/$table.parquet").schema)
    SparkEntry.normalizeTs(
      s.readStream.schema(sch).parquet(s"$dir/{$table.parquet}"))
  }

  /** Run `df` to a memory sink, drain, stop, and hand back the table.
    * Sinks from EARLIER invocations of the same tag are dropped first —
    * memory-sink rows live on the driver, and a bench loop that drains
    * q_stream_sessions repeatedly would otherwise pin every previous
    * run's result table. The just-created sink stays registered (the
    * caller's DataFrame reads it lazily). */
  private def drain(s: SparkSession, df: DataFrame, tag: String, mode: OutputMode): DataFrame = {
    val name = sinkName(tag)
    val stale = s.catalog.listTables().collect()
      .map(_.name).filter(t => t.startsWith(s"graft_stream_${tag}_") && t != name)
    stale.foreach(t => s.catalog.dropTempView(t))
    val q = Streams.runToMemory(df, name, mode)
    q.stop()
    s.table(name)
  }

  /** Run `body` with the stream's state-partition count (r14,
    * extending the q_stream_join/q_stream_frequent convention to the
    * WHOLE family): state store partitions are a per-query throughput
    * knob frozen into each checkpoint at first start, and every
    * stateful operator commits one state file per partition per
    * micro-batch — at the session's 32 partitions that is pure fixed
    * overhead for these few-thousand-row drains. Sized to the stream
    * like a production job would (the knob scales UP with volume the
    * same way); entries run sequentially and the conf is restored. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Pid+sequence-keyed scratch dir (same hygiene as NestedCatalog's
    * extract scratch: no cross-JVM clobber, no tmpdir accumulation). */
  private def scratchDir(tag: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${ProcessHandle.current().pid()}_${seq.incrementAndGet()}")
    p.toString
  }

  val catalog: Map[String, (Q, Option[String])] = Map(

    // the ETL core operator's STREAMING form, end-to-end: orders arrive
    // as a fact stream, each micro-batch is snowflake-assembled against
    // the static customer/lineitem dims (broadcast lookups + child
    // collect_list, the same DocAssembler the batch extract uses) and
    // appended to a parquet sink; the drained sink's nested docs are
    // then flattened and checked against a plain relational oracle.
    "q_stream_extract" -> (raw((s, dir) => {
      import graft.etl.{Child, Lookup, SnowflakePlan}
      val plan = SnowflakePlan("orders", "o_orderkey",
        lookups = Seq(Lookup("o_custkey", "customer",
          SnowflakePlan("customer", "c_custkey"))),
        children = Seq(Child("l_orderkey", "lineitems",
          SnowflakePlan("lineitem", "l_orderkey"))))
      val out = scratchDir("stream_extract")
      // bounded to one year of orders (same rationale as q_etl_extract's
      // one-month window): the entry measures the streaming assembly
      // path — source filter pushdown, per-batch child semi-join,
      // sink append, read-back — not bulk re-assembly volume, which at
      // full width made this the bench's worst entry and GC-sensitive
      // (warm>cold under whole-catalog memory pressure)
      val writer = Streams.extractStream(
        streamRead(s, dir, "orders").where(col("o_orderdate") < lit("1996-01-01")),
        plan, SparkEntry.loader(s, dir)) {
        (docs, _) => docs.write.mode("append").parquet(out)
      }
      withStatePartitions(s, 8) {
        val q = writer.start(); q.processAllAvailable(); q.stop()
      }
      val docs = s.read.parquet(out)
      docs.select(col("o_orderkey"),
          col("customer").getField("c_name").as("c_name"),
          when(col("lineitems").isNull, lit(0L))
            .otherwise(size(col("lineitems")).cast("long")).as("n_items"),
          when(col("lineitems").isNull, lit(null).cast("double"))
            .otherwise(aggregate(col("lineitems"), lit(0.0),
              (acc, x) => acc + x.getField("l_quantity"))).as("sum_qty"))
        .orderBy("o_orderkey")
    }), Some("""
      SELECT o.o_orderkey, c.c_name,
             count(l.l_orderkey) AS n_items,
             sum(l.l_quantity) AS sum_qty
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate < DATE '1996-01-01'
      GROUP BY 1, 2 ORDER BY 1""")),

    // STREAMING CDC APPLY: the event feed upserts into a FactStore per
    // micro-batch with EVENT-TIME conflict resolution
    // (upsertLatest — max is associative, so the final store state is
    // independent of micro-batch boundaries; a late old version can
    // never clobber a newer row). The drained store must equal the
    // batch latest-by-key replay — q_dedup_latest's oracle verbatim.
    "q_stream_upsert" -> (raw((s, dir) => {
      val tmp = scratchDir("stream_upsert")
      val store = new graft.container.FactStore(s, "cdc_events",
        java.nio.file.Paths.get(tmp, "store"))
      val events = streamRead(s, dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
      withStatePartitions(s, 8) {
        val q = events.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            store.upsertLatest(batch, "user_id", "ts", "event_id"); ()
          }
          .option("checkpointLocation",
            java.nio.file.Paths.get(tmp, "ckpt").toString)
          .start()
        q.processAllAvailable(); q.stop()
      }
      store.dataFrame.orderBy("user_id")
    }), Some("""
      WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, ts, event_id, event_type, value
      FROM r WHERE rn = 1 ORDER BY user_id""")),

    // STREAMING rollup maintenance (the silver→gold incremental
    // aggregate): each micro-batch aggregates once (Rollup.aggDelta)
    // and merges into a FactStore state via upsert — history is never
    // re-scanned, state is rollup-sized. The drained state must equal
    // the batch aggregate (the q_pipeline_rollup oracle verbatim) —
    // micro-batch boundaries cannot show through because merge is
    // associative.
    "q_stream_rollup" -> (raw((s, dir) => {
      val tmp = scratchDir("stream_rollup")
      val store = new graft.container.FactStore(s, "rollup_state",
        java.nio.file.Paths.get(tmp, "store"))
      val keys = Seq("event_type")
      val events = streamRead(s, dir, "events").select("event_type", "value")
      withStatePartitions(s, 8) {
        val q = events.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val delta = graft.ops.Rollup.aggDelta(batch, keys, "value")
            if (store.isEmpty) store.insert(delta)
            else store.upsert(graft.ops.Rollup.merge(store.dataFrame, delta, keys),
              "event_type")
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Paths.get(tmp, "ckpt").toString)
          .start()
        q.processAllAvailable(); q.stop()
      }
      store.dataFrame.select(col("event_type"), col("cnt"),
          round(col("sum_v"), 6).as("sum_v"), col("min_v"), col("max_v"),
          round(col("sum_v") / col("cnt"), 6).as("avg_v"))
        .orderBy("event_type")
    }), Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             round(sum(value), 6) AS sum_v, min(value) AS min_v,
             max(value) AS max_v, round(sum(value) / count(*), 6) AS avg_v
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // event-time tumbling window aggregation on a stream: 1-day windows,
    // epoch-aligned (= UTC date_trunc). Complete mode so the bounded
    // drain emits every window (append would hold back windows the final
    // watermark has not passed — correct on an unbounded stream, vacuous
    // on a drained one).
    "q_stream_window" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val counts = Streams.windowedCounts(events, "ts", "value",
        windowLen = "1 day", slide = "1 day", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drain(s, counts, "window", OutputMode.Complete())
      }.orderBy("window_start")
    }), Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
             count(*) AS n, sum(value) AS total
      FROM events GROUP BY 1, 2 ORDER BY 1""")),

    // the same windowed aggregation in APPEND mode — the production
    // output mode on an unbounded stream. Append emits a window only
    // once the watermark passes its end, so the drained result is the
    // PREFIX of finalized windows: every day window whose end <=
    // max(event time) - 1h delay. That predicate IS the oracle — this
    // entry checks the watermark-finalization contract itself, which
    // Complete mode (above) deliberately bypasses.
    "q_stream_window_append" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val counts = Streams.windowedCounts(events, "ts", "value",
        windowLen = "1 day", slide = "1 day", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drain(s, counts, "window_append", OutputMode.Append())
      }.orderBy("window_start")
    }), Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
             count(*) AS n, sum(value) AS total
      FROM events GROUP BY 1, 2
      HAVING window_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ORDER BY 1""")),

    // exact-dedup ON INGEST: dropDuplicatesWithinWatermark keyed on the
    // normalized content hash. Synthetic event time (doc_id seconds) +
    // a 7-day delay: the corpus spans ~3 hours, so the watermark never
    // evicts hash state during the drain and the stream's survivor set
    // must equal the batch DISTINCT — which is what the oracle checks.
    "q_stream_dedup" -> (raw((s, dir) => {
      // the +1 day base keeps doc_id 0 off the epoch-0 initial watermark
      // boundary (a row AT the initial watermark is dropped as late)
      val docs = streamRead(s, dir, "documents")
        .withColumn("ts", timestamp_seconds(col("doc_id") + lit(86400L)))
      val kept = Streams.dedupStream(docs, "text", "ts", delay = "7 days")
        .select(graft.ops.Dedup.contentHash(col("text")).as("content_hash"))
      withStatePartitions(s, 8) {
        drain(s, kept, "dedup", OutputMode.Append())
      }.orderBy("content_hash")
    }), Some("""
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
      FROM documents ORDER BY 1""")),

    // exact-dedup on ingest AGAINST AN EXISTING CORPUS: the streaming
    // form of the incremental-dedup production shape — the static
    // content-hash index (docs < 300) drops already-known arrivals via
    // a stream-static left_anti, then watermark-bounded state drops
    // within-stream repeats. The drained survivor set must equal the
    // batch replay: distinct delta hashes not in the index.
    "q_stream_dedup_incremental" -> (raw((s, dir) => {
      val base = SparkEntry.loader(s, dir)("documents")
      val index = graft.ops.Dedup.hashIndex(base.where(col("doc_id") < 300), "text")
      val delta = streamRead(s, dir, "documents")
        .where(col("doc_id") >= 300)
        .withColumn("ts", timestamp_seconds(col("doc_id") + lit(86400L)))
      val kept = Streams.dedupStreamAgainstIndex(delta, "text", "ts",
          delay = "7 days", index = index)
        .select(col("content_hash"))
      withStatePartitions(s, 8) {
        drain(s, kept, "dedup_incr", OutputMode.Append())
      }.orderBy("content_hash")
    }), Some("""
      WITH idx AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        FROM documents WHERE doc_id < 300)
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
      FROM documents
      WHERE doc_id >= 300
        AND md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) NOT IN (SELECT h FROM idx)
      ORDER BY 1""")),

    // batch-fit / stream-route cluster assignment: exact per-label
    // centroids (rounded means — engine-reproducible) fit batch-side,
    // the embedding STREAM routes to its nearest centroid as stateless
    // map-side Column algebra (greatest over (sim, label) structs, no
    // shuffle, no state). Oracle rebuilds the rounded centroids and
    // replays the argmax with list_cosine_similarity.
    "q_stream_route" -> (raw((s, dir) => {
      val cents = graft.ops.Similarity.centroids(
          SparkEntry.loader(s, dir)("embeddings"), "label")
        .collect().map(r => (r.getInt(0).toLong,
          r.getSeq[Double](2).toArray)).toSeq.sortBy(_._1)
      val vecs = streamRead(s, dir, "embeddings")
      val routed = graft.ops.Similarity.routeToCentroids(vecs, "embedding", cents)
        .select(col("vec_id"), col("label"), col("route_label"), col("route_sim"))
      drain(s, routed, "route", OutputMode.Append())
        .orderBy("vec_id")
    }), Some("""
      WITH ex AS (
        SELECT label AS g, v, unnest(generate_series(1, len(v))) AS i
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
      cent AS (
        SELECT g, i, round(sum(v[i]) / count(*), 6) AS m
        FROM ex GROUP BY 1, 2),
      cvec AS (SELECT g, list(m ORDER BY i) AS c FROM cent GROUP BY 1),
      scored AS (
        SELECT e.vec_id, e.label, cvec.g,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cvec.c), 6) AS sim
        FROM embeddings e CROSS JOIN cvec),
      best AS (
        SELECT vec_id, label, g, sim,
               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, g DESC) AS rk
        FROM scored)
      SELECT vec_id, label, CAST(g AS BIGINT) AS route_label, sim AS route_sim
      FROM best WHERE rk = 1 ORDER BY vec_id""")),

    // batch-train / stream-serve quality filtering: the NB model fits
    // on the static corpus (one token-keyed shuffle, vocab-sized
    // export), then scores the STREAM as pure map-side Column algebra —
    // broadcast map literal, no aggregation, no watermark, no state.
    // The drained scores must equal the batch scorer's output for
    // every document: the oracle is q_quality_nb's verbatim.
    "q_stream_quality" -> (raw((s, dir) => {
      val model = graft.ops.Classifier.nbFit(
        SparkEntry.loader(s, dir)("documents"), "text", col("lang") === "en")
      val docs = streamRead(s, dir, "documents")
      val scored = docs.select(col("doc_id"),
          graft.ops.Classifier.nbScoreColumn(col("text"), model).as("score"))
        .withColumn("pred", col("score") > 0.0)
      drain(s, scored, "quality", OutputMode.Append())
        .orderBy("doc_id")
    }), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (
        SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (
        SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (
        SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (
        SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
        FROM cnt CROSS JOIN tot),
      sc AS (
        SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1)
      SELECT d.doc_id,
             round(pri.b + coalesce(sc.s, 0.0), 6) AS score,
             round(pri.b + coalesce(sc.s, 0.0), 6) > 0 AS pred
      FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri
      ORDER BY d.doc_id""")),

    // benchmark decontamination ON INGEST: the stateless streaming form
    // of q_text_decontaminate — every arriving doc is flagged against
    // the static benchmark gram set (leading 8-grams of every 50th doc,
    // same benchmark as the batch entry) map-side, no watermark, no
    // state store; the drained stream must reproduce the batch
    // operator's (n_hits, contaminated) verdict for every document,
    // which is the batch entry's oracle verbatim.
    "q_stream_decontaminate" -> (raw((s, dir) => {
      val bench = SparkEntry.loader(s, dir)("documents")
        .where(col("doc_id") % 50 === 0)
        .select(concat_ws(" ",
          slice(graft.ops.TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("btext"))
      val docs = streamRead(s, dir, "documents")
      val flagged = Streams.decontaminateStream(docs, "text", bench, "btext", n = 8)
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
      drain(s, flagged, "decontam", OutputMode.Append())
        .orderBy("doc_id")
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      grams AS (
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
              FROM toks WHERE len(t) >= 8)),
      bench AS (
        SELECT DISTINCT array_to_string(t[1:8], ' ') AS g
        FROM toks WHERE doc_id % 50 = 0 AND len(t) >= 8),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        FROM grams g JOIN bench b USING (g) GROUP BY g.doc_id)
      SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
             coalesce(h.n_hits, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id""")),

    // windowed frequent-items on a stream (the streaming sibling of the
    // batch heavy-hitters census): per finalized day window, the event
    // types with >= 5 arrivals (a support count that discriminates at
    // sf0.001, where type-days run 2-15). Append mode — a window's counters emit
    // when the watermark passes its end and are then evicted, so state
    // is bounded by (open windows × key cardinality) however long the
    // stream runs; the drained result is the finalized-window prefix,
    // which is exactly the oracle's HAVING predicate.
    "q_stream_frequent" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val freq = Streams.windowedFrequentItems(events, "ts", "event_type",
        windowLen = "1 day", watermark = "1 hour", minCount = 5L)
      // (window, key) cardinality is tiny — state partition count is a
      // per-query knob (frozen into the checkpoint); size it to the
      // stream like q_stream_join does instead of paying 32 partitions
      // of state-store commits per micro-batch
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try drain(s, freq, "frequent", OutputMode.Append())
        .orderBy("window_start", "event_type")
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2, 3
      HAVING count(*) >= 5
         AND window_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ORDER BY window_start, event_type""")),

    // windowed per-class MIX MONITOR (streaming sibling of mixDrift):
    // per finalized day window, each event type's row count and integer
    // byte weight — watching feed composition drift in flight. Append
    // mode: totals emit once at watermark finalization, counters evict;
    // the drained result is the finalized-window prefix (same oracle
    // discipline as q_stream_frequent)
    "q_stream_mix" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val mix = Streams.windowedMix(events, "ts", "event_type",
        length(col("props")).cast("long"),
        windowLen = "1 day", watermark = "1 hour")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try drain(s, mix, "mix", OutputMode.Append())
        .orderBy("window_start", "event_type")
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
             event_type, count(*) AS n_rows,
             CAST(sum(coalesce(length(props), 0)) AS BIGINT) AS weight
      FROM events GROUP BY 1, 2, 3
      HAVING window_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ORDER BY window_start, event_type""")),

    // streaming COUNT(DISTINCT) via windowed HLL registers: per
    // finalized day window, the distinct-user estimate with state
    // bounded by (open windows × 256) at ANY user cardinality — the
    // sketch state replaces the unbounded per-window key set an exact
    // distinct would hold. The STREAM maintains registers (one
    // stateful max per (window, bucket), Append mode); the estimate is
    // a post-drain batch aggregate (the production registers-in-store/
    // estimate-at-query split). Registers are md5-derived, so the
    // drained rows are replay-identical and the whole estimate surface
    // hash-matches the batch oracle.
    "q_stream_hll" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val regs = Streams.windowedDistinctHll(events, "ts", "user_id",
        windowLen = "1 day", watermark = "1 hour", p = 8)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val drained = drain(s, regs, "hll", OutputMode.Append())
        graft.ops.Sketches.hllEstimateGrouped(
            drained, Seq("window_start", "window_end"), p = 8)
          .orderBy("window_start")
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some(s"""
      WITH ev AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
               CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS we,
               md5(CAST(user_id AS VARCHAR)) AS x
        FROM events WHERE user_id IS NOT NULL),
      b AS (SELECT ws, we,
                   CAST(('0x' || substring(x, 1, 3))::BIGINT // 16 AS INT) AS bucket,
                   ('0x' || substring(x, 4, 13))::BIGINT AS w FROM ev),
      r AS (SELECT ws, we, bucket,
                   max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS reg
            FROM b GROUP BY 1, 2, 3),
      a AS (SELECT ws, we,
                   CAST(256 - count(*) AS BIGINT) AS v_zero,
                   CAST(sum(CAST(power(2, 53 - reg) AS BIGINT))
                        + (256 - count(*)) * CAST(power(2, 53) AS BIGINT) AS BIGINT) AS s_scaled
            FROM r GROUP BY 1, 2),
      e AS (SELECT ws, we, v_zero, s_scaled,
                   ${graft.ops.Sketches.hllAlphaConstant(8)} / CAST(s_scaled AS DOUBLE) AS raw
            FROM a)
      SELECT ws AS window_start, we AS window_end, CAST(256 AS BIGINT) AS m,
             v_zero, s_scaled,
             round(CASE WHEN raw <= 640.0 AND v_zero > 0
                        THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
                        ELSE raw END, 6) AS estimate
      FROM e
      WHERE we <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ORDER BY window_start""")),

    // streaming OHLC candles: per finalized day window open/high/low/
    // close/volume + exact-cents turnover, all from ONE streaming
    // aggregation (struct min/max carries open/close — state is a few
    // scalars per open window, no row buffering); drained candles =
    // the batch candle table's finalized prefix.
    "q_stream_ohlc" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val candles = Streams.windowedOhlc(events, "ts", "value",
        tieBreak = col("event_id"), windowLen = "1 day", watermark = "1 hour")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try drain(s, candles, "ohlc", OutputMode.Append())
        .orderBy("window_start")
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      WITH e AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
                        CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS we,
                        ts, event_id, value
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT ws, we, value,
                   row_number() OVER (PARTITION BY ws ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY ws ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e),
      oc AS (SELECT ws, max(CASE WHEN rn_a = 1 THEN value END) AS open,
                    max(CASE WHEN rn_d = 1 THEN value END) AS close FROM r GROUP BY 1),
      agg AS (SELECT ws, we, max(value) AS high, min(value) AS low,
                     CAST(count(*) AS BIGINT) AS volume,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
              FROM e GROUP BY 1, 2)
      SELECT agg.ws AS window_start, agg.we AS window_end, oc.open, agg.high,
             agg.low, oc.close, agg.volume, agg.total_cents
      FROM agg JOIN oc USING (ws)
      WHERE agg.we <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ORDER BY window_start""")),

    // streaming count-min: per finalized day window the d·w = 3·64
    // cell table (state bounded at ANY key cardinality, where exact
    // per-key counters grow with distinct keys), drained and then
    // point-queried for every event type — missing cells read as 0,
    // so estimates stay never-undercounting. Cells are md5-derived;
    // the whole estimate surface hash-matches the batch replay.
    "q_stream_cm" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
      val sk = Streams.windowedCmSketch(events, "ts", "event_type",
        windowLen = "1 day", watermark = "1 hour", w = 64, d = 3)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val drained = drain(s, sk, "cm", OutputMode.Append())
        import s.implicits._
        val probes = Seq("click", "error", "purchase", "signup", "view").toDF("key")
          .withColumn("prow", explode(sequence(lit(0), lit(2))))
          .withColumn("pbucket",
            (conv(substring(md5(concat(col("prow").cast("string"), lit(":"), col("key"))),
              1, 6), 16, 10).cast("long") % 64).cast("int"))
        // renamed projection: a memory-sink table self-join otherwise
        // trips conflicting-attribute resolution
        val wins = drained.select(col("window_start").as("ws"),
          col("window_end").as("we")).distinct()
        wins.crossJoin(probes)
          .join(drained,
            col("ws") === col("window_start") && col("we") === col("window_end") &&
              col("prow") === col("row") && col("pbucket") === col("bucket"), "left")
          .select(col("ws"), col("we"), col("key"),
            coalesce(col("cnt"), lit(0L)).as("__c"))
          .groupBy("ws", "we", "key")
          .agg(min("__c").as("est"))
          .select(col("ws").as("window_start"), col("we").as("window_end"),
            col("key"), col("est"))
          .orderBy("window_start", "key")
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      WITH ev AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
               CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS we,
               event_type AS k
        FROM events),
      cells AS (
        SELECT ws, we, g.row,
               CAST(('0x' || substring(md5(CAST(g.row AS VARCHAR) || ':' || k), 1, 6))::BIGINT % 64 AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ev, generate_series(0, 2) AS g(row) GROUP BY 1, 2, 3, 4),
      wins AS (SELECT DISTINCT ws, we FROM cells),
      probes AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS key),
      pb AS (SELECT wins.ws, wins.we, probes.key, g.row,
                    CAST(('0x' || substring(md5(CAST(g.row AS VARCHAR) || ':' || probes.key), 1, 6))::BIGINT % 64 AS INT) AS bucket
             FROM wins, probes, generate_series(0, 2) AS g(row)),
      j AS (SELECT pb.ws, pb.we, pb.key, pb.row, coalesce(cells.cnt, 0) AS cnt
            FROM pb LEFT JOIN cells
              ON cells.ws = pb.ws AND cells.we = pb.we
             AND cells.row = pb.row AND cells.bucket = pb.bucket)
      SELECT ws AS window_start, we AS window_end, key, CAST(min(cnt) AS BIGINT) AS est
      FROM j
      WHERE we <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      GROUP BY 1, 2, 3 ORDER BY window_start, key""")),

    // STREAM-STREAM interval join: views and clicks are two unbounded
    // streams (two streaming reads of the same event file, filtered to
    // disjoint types); each view matches same-user clicks within the
    // following 30 minutes. The watermark + two-sided time bound give
    // Spark a state-eviction horizon — the production shape for
    // attribution joins at scale (state ~ rate × (watermark + within),
    // not stream history). Inner stream-stream joins emit on arrival
    // (the watermark governs state cleanup, not emission), so the
    // bounded drain must equal the batch inequality join the oracle
    // runs. ts is second-truncated on both sides: the parquet carries
    // µs timestamps, and DuckDB's INTERVAL arithmetic matches at the
    // second grain.
    "q_stream_join" -> (raw((s, dir) => {
      def typed(t: String) = streamRead(s, dir, "events")
        .where(col("event_type") === t)
        .withColumn("ts", date_trunc("second", col("ts")))
      val joined = Streams.intervalJoinStream(
          typed("view").select(col("user_id"), col("ts"), col("event_id")),
          typed("click").select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", within = "30 minutes", watermark = "1 hour")
        .select(col("l.user_id").as("user_id"),
          col("l.event_id").as("view_id"), col("r.event_id").as("click_id"),
          col("l.ts").as("view_ts"), col("r.ts").as("click_ts"))
      // a stream-stream join keeps FOUR state stores per shuffle
      // partition, each committing checkpoint files per micro-batch —
      // at the session's 32 partitions that is ~128 file commits per
      // batch for a few-thousand-row drain, pure fixed overhead. State
      // partition count is a per-query throughput knob (it is frozen
      // into the checkpoint at first start), so size it to THIS
      // stream's volume the way a production job would; entries run
      // sequentially, and the conf is restored after the drain.
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try drain(s, joined, "join", OutputMode.Append())
        .orderBy("view_id", "click_id")
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      SELECT v.user_id,
             v.event_id AS view_id, c.event_id AS click_id,
             date_trunc('second', v.ts) AS view_ts,
             date_trunc('second', c.ts) AS click_ts
      FROM events v JOIN events c
        ON v.user_id = c.user_id
       AND v.event_type = 'view' AND c.event_type = 'click'
       AND date_trunc('second', c.ts) >= date_trunc('second', v.ts)
       AND date_trunc('second', c.ts) <= date_trunc('second', v.ts) + INTERVAL 30 MINUTE
      ORDER BY view_id, click_id""")),

    // LEFT-OUTER stream-stream interval join: views that never
    // converted surface with null click columns — but only once the
    // watermark proves completeness (an unmatched view emits when its
    // 30-min match window falls entirely behind the global watermark =
    // min of both streams' watermarks − 1h, and its state evicts).
    // The drained result = inner matches + exactly the
    // watermark-finalized unmatched prefix, which is what the oracle
    // states — the outer-emission contract itself, which the inner
    // entry (q_stream_join) cannot check.
    "q_stream_join_outer" -> (raw((s, dir) => {
      def typed(t: String) = streamRead(s, dir, "events")
        .where(col("event_type") === t)
        .withColumn("ts", date_trunc("second", col("ts")))
      val joined = Streams.intervalJoinStreamLeftOuter(
          typed("view").select(col("user_id"), col("ts"), col("event_id")),
          typed("click").select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", within = "30 minutes", watermark = "1 hour")
        .select(col("l.user_id").as("user_id"),
          col("l.event_id").as("view_id"), col("r.event_id").as("click_id"),
          col("l.ts").as("view_ts"), col("r.ts").as("click_ts"))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try drain(s, joined, "join_outer", OutputMode.Append())
        .orderBy("view_id", "click_id")
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }), Some("""
      WITH v AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS ts
        FROM events WHERE event_type = 'view'),
      c AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS ts
        FROM events WHERE event_type = 'click'),
      wm AS (
        SELECT least((SELECT max(date_trunc('second', ts)) FROM events WHERE event_type = 'view'),
                     (SELECT max(date_trunc('second', ts)) FROM events WHERE event_type = 'click'))
               - INTERVAL 1 HOUR AS w),
      matched AS (
        SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
               v.ts AS view_ts, c.ts AS click_ts
        FROM v JOIN c ON v.user_id = c.user_id
          AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE)
      SELECT * FROM matched
      UNION ALL
      SELECT v.user_id, v.event_id, CAST(NULL AS BIGINT),
             v.ts, CAST(NULL AS TIMESTAMP)
      FROM v, wm
      WHERE v.ts + INTERVAL 30 MINUTE < wm.w
        AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.view_id = v.event_id)
      ORDER BY view_id, click_id""")),

    // gap-based session windows on a stream (session_window + watermark):
    // 30-min gap, session_end = last event + gap (the built-in's close
    // bound). Complete mode for the bounded drain; ts second-truncated on
    // both sides (q_sessionize grain rationale). The batch sibling is
    // q_sessionize — SAME gap rule (a gap of exactly `gap` still merges;
    // new session only when diff > gap — pinned by an exact-1800 s pair
    // at sf0.1), different end-bound convention.
    "q_stream_sessions" -> (raw((s, dir) => {
      val events = streamRead(s, dir, "events")
        .withColumn("ts", date_trunc("second", col("ts")))
      val sess = Streams.sessionWindowAgg(events, "ts", "value", "user_id",
        gap = "30 minutes", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drain(s, sess, "sessions", OutputMode.Complete())
      }.orderBy("user_id", "session_start")
    }), Some("""
      WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts, value, event_id FROM events),
      g AS (
        SELECT user_id, ts, value, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s2 AS (
        SELECT user_id, ts, value,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n, sum(value) AS total
      FROM s2 GROUP BY user_id, sid ORDER BY 1, 2"""))
  )

  def queries: Map[String, Q] = catalog.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = catalog.collect { case (k, (_, Some(o))) => k -> o }
}

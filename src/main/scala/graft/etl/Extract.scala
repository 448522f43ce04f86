package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}

/**
 * Incremental snowflake extract: filter the fact table past the watermark,
 * assemble nested documents, stamp batch coordinates + lineage, write
 * gzip NDJSON partitioned by batch key, then advance the watermark —
 * at-least-once, idempotent by key overwrite
 * (reference: mysql_to_s3/extract.py:92-254).
 *
 * The reference enumerates ids with a keyset-paginated driver loop and a
 * thread pool; Spark-natively the whole increment is ONE distributed pass:
 * predicate-pushdown scan → coordinate assignment → doc assembly →
 * partitioned write. Batch coordinates reproduce the counter chain
 * ([[DurationCounter]]/[[BatchCounter]]) exactly: the duration bucket is
 * pure arithmetic; the in-bucket batch index is the 0-based (time, id)
 * rank over the bucket — a per-bucket window for modest increments, a
 * distributed prefix-sum rank ([[graft.ops.Batching.rankWithinScaled]])
 * above [[ExtractConfig.scaledIndexThreshold]] rows per bucket (identical
 * keys, no single-task bucket sort) — so a restart from the watermark
 * yields identical keys (the tests/test_counters.py replay contract).
 */
case class ExtractConfig(
    plan: SnowflakePlan,
    /** optional leading time dimension, e.g. ("o_orderdate", day) */
    timeField: Option[(String, DurationUnit)],
    idField: String,
    batchSize: Long,
    /** epoch start of the time axis (reference `extract.start`) */
    start: java.time.Instant,
    destination: String,
    lastFile: Path,
    revision: String = "dev",
    /** per-batch completion messages (reference extract.py:244-251) */
    notifier: Notifier = Notifier.noop,
    /** buckets larger than this switch batch indexing from the per-bucket
      * window (one task sorts the whole bucket) to the distributed
      * prefix-sum rank ([[graft.ops.Batching.rankWithinScaled]]) — at
      * 100 TB a production bucket is a full day of keys */
    scaledIndexThreshold: Long = 4000000L)

case class ExtractResult(rows: Long, batches: Long, watermark: Watermark)

case class Watermark(coords: Seq[Long], lastTime: Option[java.sql.Timestamp], lastId: Long)

object Extract {

  def run(spark: SparkSession, cfg: ExtractConfig, load: String => DataFrame): ExtractResult = {
    val prev = readWatermark(cfg.lastFile)
    val fact0 = load(cfg.plan.table)

    // 1. incremental filter — strictly-increasing (time, id) keyset from the
    //    watermark, pushed down to the scan (reference extract.py:156-183)
    val fact = prev match {
      case None => fact0
      case Some(w) =>
        cfg.timeField match {
          case Some((tf, _)) if w.lastTime.isDefined =>
            val t = w.lastTime.get
            // the explicit cast mirrors the watermark-record side (a DATE
            // axis records max(cast(tf as timestamp))), so both sides
            // interpret the value through the SAME session timezone.
            // INVARIANT: spark.sql.session.timeZone must not change
            // between the run that records a watermark and the run that
            // resumes from it (graft pins UTC everywhere) — a DATE is
            // tz-less, so its timestamp reading is tz-dependent.
            val tfTs = col(tf).cast("timestamp")
            // null-time rows PASS the keyset so the __dur null check
            // below fails them loudly — both comparison branches are
            // null on them, and a silent filter-out would mean a row
            // extracted by a first run (or never) vanishes from every
            // resumed increment with no error (review r9)
            fact0.filter(col(tf).isNull || tfTs > lit(t) ||
              (tfTs === lit(t) && col(cfg.idField) > lit(w.lastId)))
          case Some((tf, _)) =>
            // a time axis is configured but the watermark carries no
            // time: resuming on id alone would let rows land in duration
            // buckets EARLIER than already-written ones with batchBase 0,
            // and the dynamic-overwrite write would then DELETE earlier
            // increments' objects at those keys (review r9). This state
            // only arises from a config/watermark mismatch (the axis was
            // added after time-less runs) — refuse, loudly.
            throw new IllegalStateException(
              s"extract: watermark ${cfg.lastFile} has no lastTime but time axis " +
                s"'$tf' is configured — resuming would re-batch old buckets from 0 " +
                "and dynamic overwrite would delete earlier increments' objects; " +
                "re-extract from scratch or restore a watermark with lastTime")
          // time-less config: keyset on id alone (single bucket 0, whose
          // batch base resumes from the watermark coords)
          case None => fact0.filter(col(cfg.idField) > lit(w.lastId))
        }
    }

    // 2. batch coordinates
    val withDur = cfg.timeField match {
      case Some((tf, unit)) =>
        val startFloor = unit.floor(cfg.start).getEpochSecond
        val durKey = unit match {
          case DurationUnit.Seconds(n) =>
            floor((col(tf).cast("double") - lit(startFloor)) / lit(n)).cast("long")
          case DurationUnit.Week =>
            val days = floor(col(tf).cast("double") / lit(86400L))
            floor((days + lit(4)) / lit(7)) - lit((Math.floorDiv(startFloor / 86400 + 4, 7L)))
          case DurationUnit.Month =>
            val zs = cfg.start.atZone(java.time.ZoneOffset.UTC)
            (year(col(tf)) * 12 + month(col(tf))) - lit(zs.getYear * 12 + zs.getMonthValue)
          case DurationUnit.Year =>
            year(col(tf)) - lit(cfg.start.atZone(java.time.ZoneOffset.UTC).getYear)
        }
        // a NULL on a configured time axis has no duration bucket, no
        // watermark coordinate and no resume semantics — fail LOUDLY at
        // scan time (first run or resumed), never silently drop or park
        // rows in a null partition the keyset can't re-find (review r9).
        // The check rides the existing expression: no extra scan.
        fact.withColumn("__dur",
          when(col(tf).isNotNull, durKey.cast("long"))
            .otherwise(raise_error(lit(
              s"extract: null time axis '$tf' — a watermark-driven extract " +
                "requires a non-null time column; clean or default it upstream"))
              .cast("long")))
      case None => fact.withColumn("__dur", lit(0L))
    }
    val order = cfg.timeField.map(t => col(t._1)).toSeq :+ col(cfg.idField)
    // batch indices RESUME within a duration bucket the previous run
    // already wrote to: new rows in the watermark's bucket start at
    // recorded-batch + 1, so this run's keys can never collide with —
    // and dynamic-overwrite can never delete — an earlier increment's
    // objects (the counter-replay contract of the reference's
    // BatchCounter, distributed). Later buckets start at 0 as usual.
    val batchBase = prev match {
      case Some(pw) if pw.coords.size >= 2 =>
        when(col("__dur") === lit(pw.coords(0)), lit(pw.coords(1) + 1)).otherwise(lit(0L))
      case _ => lit(0L)
    }
    // in-bucket sequence number: per-bucket window below the threshold
    // (one shuffle, fine for modest increments), distributed prefix-sum
    // rank above it (a window serializes each duration bucket through ONE
    // task — a production bucket is a day; at 100 TB that is one executor
    // sorting a day of keys). Both assign identical 0-based (time, id)
    // ranks, so batch keys are byte-identical across the two paths
    // (asserted in EtlSpec). The bucket-size probe is an aggregate over a
    // column-pruned scan (only the time column is read) reduced to ONE
    // driver scalar — fine-grained duration units can have millions of
    // buckets, so the inventory must never be collected.
    val maxBucket = withDur.groupBy(col("__dur")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    val seqd =
      if (maxBucket > cfg.scaledIndexThreshold)
        graft.ops.Batching.rankWithinScaled(withDur, "__dur", order, out = "__seq")
      else {
        val w = Window.partitionBy(col("__dur")).orderBy(order: _*)
        withDur.withColumn("__seq", (row_number().over(w) - lit(1)).cast("long"))
      }
    // persist the increment: the write, the watermark aggregate and the
    // batch inventory all read this ONE materialization instead of
    // re-scanning the source (and re-assembling docs) per consumer —
    // at 100 TB the increment is watermark-bounded, so this is the
    // standard bounded-working-set persist
    val withBatch = seqd
      .withColumn("__batch",
        (col("__seq") / lit(cfg.batchSize)).cast("long") + batchBase)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 3. ONE aggregate over the persisted increment: row count, watermark
      //    coordinates AND the batch inventory (bounded: #batches ≤
      //    rows/batchSize) — no second scan, no re-assembly
      // watermark coords = the LAST WRITTEN KEY: lexicographic max of
      // (__dur, __batch) — independent maxima would pair the last bucket
      // with another bucket's batch index, a coordinate no row ever had,
      // and the resume base would then leave holes in the key sequence
      val agg = withBatch.agg(
        count(lit(1)), max(struct(col("__dur"), col("__batch"))),
        // the (time, id) watermark is the LAST KEY in keyset order —
        // lexicographic max of the pair, the same rationale the coords
        // max(struct) above documents. Independent maxima (max(time),
        // max(id)) are WRONG whenever ids are not monotone with time:
        // lastId then exceeds the largest id actually extracted AT
        // lastTime, and the resume filter's `time = lastTime AND
        // id > lastId` arm permanently skips the rows in between
        // (r12, found by ExtractFuzzSpec's random resume schedules —
        // every schedule lost exactly the boundary rows; the reference
        // records the final row of the ordered batch, extract.py:254,
        // never column-wise maxima). Cast: a DATE time axis still
        // records a Timestamp watermark.
        max(struct(
          cfg.timeField.map(t => col(t._1).cast("timestamp"))
            .getOrElse(lit(null).cast("timestamp")).as("t"),
          col(cfg.idField).as("i"))),
        collect_set(struct(col("__dur"), col("__batch")))).collect()(0)
      val rows = agg.getLong(0)
      val batchKeys: Seq[(Long, Long)] =
        agg.getSeq[org.apache.spark.sql.Row](3).map(r => (r.getLong(0), r.getLong(1))).sorted
      if (rows == 0) {
        // nothing to write → nothing notified, destination untouched, and
        // the watermark must NOT move (a time-less watermark would poison
        // the next keyset filter)
        ExtractResult(0L, 0L, prev.getOrElse(Watermark(Seq(0, 0), None, Long.MinValue)))
      } else {
        // 4. assemble docs for exactly these fact rows + lineage envelope,
        //    partitioned gzip NDJSON write (reference extract.py:208-242:
        //    one S3 object per batch key). DYNAMIC partition overwrite:
        //    an incremental run replaces only the batch keys it produced —
        //    earlier increments' objects stay, and re-running a failed
        //    increment overwrites its own keys idempotently (static mode
        //    would truncate the whole destination every run).
        val assembled = joinAssembled(cfg.plan, withBatch, load)
        val docCols = assembled.columns.filterNot(Set("__dur", "__seq", "__batch"))
        val docs = assembled.select(
          struct(docCols.map(col).toIndexedSeq: _*).as(cfg.plan.table),
          struct(
            col("__seq").as("id"),
            struct(lit(cfg.plan.table).as("table"),
              concat_ws(".", col("__dur"), col("__batch")).as("key")).as("source"),
            lit(cfg.revision).as("revision"),
            (unix_timestamp() * lit(1.0)).as("timestamp")).as("etl"),
          col("__dur").as("batch_t"), col("__batch").as("batch_i"))
        // hash-distribute by the batch key before the partitioned write
        // (r14, guide §6): without it every assembly task cuts an
        // object into every batch key it touches — the reference
        // contract is ONE object per batch key (extract.py:208-242),
        // and the fragmented layout also multiplied the read-back and
        // notification-side opens. One shuffle of the batch, exactly
        // the Iceberg write.distribution-mode=hash shape.
        docs.repartition(col("batch_t"), col("batch_i"))
          .write.mode("overwrite")
          .partitionBy("batch_t", "batch_i")
          .option("partitionOverwriteMode", "dynamic")
          .option("compression", "gzip")
          .json(cfg.destination)

        val lastKey = agg.getStruct(1)
        val lastRow = agg.getStruct(2)
        val wm = Watermark(
          Seq(lastKey.getLong(0), lastKey.getLong(1)),
          Option(lastRow.get(0)).map(_.asInstanceOf[java.sql.Timestamp]),
          lastRow.getLong(1))
        // notify per written batch object (reference extract.py:244-251),
        // then advance the watermark (extract.py:254)
        val now = java.time.Instant.now()
        for ((t, b) <- batchKeys)
          cfg.notifier.add(Notifier.batchMessage(cfg.destination, s"$t.$b", now))
        writeWatermark(cfg.lastFile, wm)
        ExtractResult(rows, batchKeys.size.toLong, wm)
      }
    } finally withBatch.unpersist()
  }

  /** Assemble docs only for the given fact subset (keeps coordinate cols).
    * `restrictChildren`: child tables are semi-joined down to the
    * increment's keys BEFORE their collect_list — an increment touching
    * 0.01% of parents must not re-aggregate 100% of children. */
  private def joinAssembled(plan: SnowflakePlan, factSubset: DataFrame, load: String => DataFrame): DataFrame = {
    val filteredLoad: String => DataFrame =
      name => if (name == plan.table) factSubset.drop("__dur", "__seq", "__batch") else load(name)
    val docs = DocAssembler.assemble(plan, filteredLoad, restrictChildren = true)
    docs.join(factSubset.select(col(plan.key), col("__dur"), col("__seq"), col("__batch")),
      Seq(plan.key), "inner")
  }

  // -- watermark file: {"coords":[t,b], "lastTime":"...", "lastId":n} -------

  def readWatermark(p: Path): Option[Watermark] =
    if (!Files.exists(p)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(Files.readString(p))
      implicit val fmt: Formats = DefaultFormats
      val coords = (j \ "coords").extract[Seq[Long]]
      val lastId = (j \ "lastId").extract[Long]
      val lastTime = (j \ "lastTime").extractOpt[String]
        .map(s => java.sql.Timestamp.from(java.time.Instant.parse(s)))
      Some(Watermark(coords, lastTime, lastId))
    }

  def writeWatermark(p: Path, w: Watermark): Unit = {
    val t = w.lastTime.map(ts => "\"" + ts.toInstant.toString + "\"").getOrElse("null")
    Files.createDirectories(p.toAbsolutePath.getParent)
    Files.writeString(p,
      s"""{"coords":[${w.coords.mkString(",")}],"lastTime":$t,"lastId":${w.lastId}}""")
  }
}

package graft

import java.time.Instant
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.etl._

/** Model-based fuzz of the incremental extract — the reference's CORE
  * contract (mysql_to_s3/extract.py:156-251: a keyset-resumed extract
  * run any number of times over growing data must equal one run over
  * the final data). The reference's own golden test replays ONE fixed
  * two-increment schedule (tests/test_extract.py:46-148); this spec
  * draws RANDOM schedules per seed:
  *
  *   - the orders table is revealed in (time, id)-lexicographic
  *     prefixes (how a keyset-watermarked source actually grows —
  *     rows never arrive behind the watermark, which is the
  *     documented skip-late contract), with 2–5 cuts per schedule;
  *   - duplicate cuts produce EMPTY increments mid-schedule (the
  *     watermark-no-rewrite arm EtlSpec pins once, here exercised at
  *     random positions);
  *   - batch size is drawn per schedule, so batch-boundary arithmetic
  *     shifts across runs.
  *
  * Invariants vs the one-shot extract over the full table:
  *   (1) the union of incrementally written docs covers exactly the
  *       one-shot id set — no doc lost at a cut boundary, none written
  *       twice across resumes;
  *   (2) per-doc assembled CONTENT matches: lookup field, child-array
  *       size, and an order-insensitive child aggregate;
  *   (3) the final watermark equals the one-shot watermark (a resumed
  *       pipeline and a fresh one agree on where "now" is);
  *   (4) row/batch counters sum across increments to the one-shot
  *       totals (batches may split differently — only the row sum and
  *       the batch-count floor are schedule-invariant).
  */
class ExtractFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  private val sf = "/root/testdata/sf0.001"

  private def plan = SnowflakePlan("orders", "o_orderkey",
    lookups = Seq(Lookup("o_custkey", "customer", SnowflakePlan("customer", "c_custkey"))),
    children = Seq(Child("l_orderkey", "lineitems", SnowflakePlan("lineitem", "l_orderkey"))))

  private def cfg(dest: java.nio.file.Path, batch: Long) = ExtractConfig(
    plan, timeField = Some(("o_orderdate", DurationUnit.Month)),
    idField = "o_orderkey", batchSize = batch,
    start = Instant.parse("1992-01-01T00:00:00Z"),
    destination = dest.resolve("out").toString,
    lastFile = dest.resolve("last.json"))

  /** Loader exposing only the (o_orderdate, o_orderkey) prefix up to
    * and including `cut`; every other table passes through whole. */
  private def prefixLoad(cut: (java.sql.Timestamp, Long)): String => DataFrame = {
    val base = SparkEntry.loader(spark, sf)
    name =>
      if (name != "orders") base(name)
      else base("orders").where(
        col("o_orderdate") < F.lit(cut._1) ||
          (col("o_orderdate") === F.lit(cut._1) && col("o_orderkey") <= cut._2))
  }

  /** Per-doc fingerprint of the written NDJSON: id, the inlined lookup
    * field, child count, and an order-insensitive child sum. */
  private def fingerprints(dest: String): Map[Long, (String, Int, Double)] = {
    val docs = spark.read.json(dest)
    docs.select(
        col("orders.o_orderkey").cast("long").as("id"),
        col("orders.customer.c_name").as("cname"),
        F.size(F.coalesce(col("orders.lineitems"), F.array())).as("nli"),
        F.round(F.coalesce(
          F.expr("aggregate(orders.lineitems, 0D, (acc, x) -> acc + coalesce(x.l_quantity, 0D))"),
          F.lit(0.0)), 3).as("qty"))
      .collect()
      .map(r => r.getLong(0) -> ((String.valueOf(r.get(1)), r.getInt(2), r.getDouble(3))))
      .toMap
  }

  for (seed <- Seq(11L, 22L, 33L)) {
    test(s"random resume schedule reproduces the one-shot extract (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val batch = Seq(50L, 137L, 400L, 1000L)(rnd.nextInt(4))

      // the keyset order the watermark advances along
      val keys = SparkEntry.loader(spark, sf)("orders")
        .select(col("o_orderdate"), col("o_orderkey"))
        .orderBy("o_orderdate", "o_orderkey")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      val n = keys.length
      assert(n > 100, s"fixture too small: $n orders")

      // 2-5 cut points, sorted, WITH possible duplicates (duplicate cut
      // = an empty increment mid-schedule), always ending at the full set
      val nCuts = 2 + rnd.nextInt(4)
      val cuts = (Seq.fill(nCuts)(rnd.nextInt(n)) :+ (n - 1)).sorted.map(keys(_))

      val incDir = java.nio.file.Files.createTempDirectory(s"graft_exfuzz_inc$seed")
      val oneDir = java.nio.file.Files.createTempDirectory(s"graft_exfuzz_one$seed")
      try {
        val incCfg = cfg(incDir, batch)
        val results = cuts.map(c => Extract.run(spark, incCfg, prefixLoad(c)))
        val oneCfg = cfg(oneDir, batch)
        val oneShot = Extract.run(spark, oneCfg, SparkEntry.loader(spark, sf))

        // (4) counters: row sum invariant; incremental batch splits can
        // only add boundaries, never drop rows into existing batches
        assert(results.map(_.rows).sum === oneShot.rows,
          s"row sum drifted: ${results.map(_.rows)} vs ${oneShot.rows}")
        assert(results.map(_.batches).sum >= oneShot.batches)

        // (3) final watermark identical
        assert(results.last.watermark === oneShot.watermark,
          "resumed watermark differs from one-shot")

        // (1) + (2) doc inventory and content
        val inc = fingerprints(incCfg.destination)
        val one = fingerprints(oneCfg.destination)
        assert(inc.keySet === one.keySet,
          s"doc id drift: only-inc=${(inc.keySet -- one.keySet).take(5)} " +
            s"only-one=${(one.keySet -- inc.keySet).take(5)}")
        val bad = one.keys.filter(k => inc(k) != one(k)).take(5)
        assert(bad.isEmpty,
          s"content drift on ids $bad: ${bad.map(k => (inc(k), one(k))).headOption}")
      } finally {
        def rmr(p: java.nio.file.Path): Unit = {
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        }
        rmr(incDir); rmr(oneDir)
      }
    }
  }
}

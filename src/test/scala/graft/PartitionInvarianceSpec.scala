package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver runs Verify under ITS OWN cpu/shuffle-partition config, so
  * any entry whose float output depends on partial-aggregation merge
  * order would pass the local selfcheck (fixed partitioning) and still
  * go red in the driver sweep. This spec re-executes the float-bearing
  * oracle entries under a deliberately different shuffle-partition count
  * and requires BIT-IDENTICAL rows — the property the repo's
  * IEEE-reproducible kernels (left-to-right native dot products,
  * two-pass stats, integer-pinned scores) exist to provide. */
class PartitionInvarianceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  val dir = "/root/testdata/sf0.001"

  // entries whose outputs carry doubles (or double-derived decisions)
  val floatEntries = Seq(
    "q_agg_stats", "q_agg_percentile", "q_agg_trimmed_stats",
    "q_groupby_agg", "q_embed_centroid", "q_text_tfidf",
    "q_sample_dsir", "q_sample_temperature", "q_window_median",
    "q_dedup_embedding", "q_sim_topk", "q_text_quality",
    "q_list_reverse", "q_pack_bpe")

  private def canonical(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d).toString
        case f: Float  => java.lang.Float.floatToIntBits(f).toString
        case v => String.valueOf(v)
      }.mkString("|")).sorted.toSeq
  }

  test("float-bearing entries are bit-identical across shuffle-partition counts") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val base = floatEntries.map(n => n -> canonical(n)).toMap
      spark.conf.set(key, "3") // driver may run narrower OR wider
      val drifted = floatEntries.filter(n => canonical(n) != base(n))
      assert(drifted.isEmpty,
        s"partition-count-sensitive entries (driver-red risk): $drifted")
    } finally spark.conf.set(key, orig)
  }

  test("EVERY catalog entry is row-identical across shuffle-partition counts") {
    // the whole-catalog sweep: any entry here that drifts would selfcheck
    // green locally and go red under the driver's partitioning.
    // Exclusions are entries whose OUTPUT inventories scratch side
    // effects that legitimately accumulate across invocations in one JVM
    // (their cross-invocation stability is pinned by their own specs).
    val excluded = Set("q_etl_extract_resume")
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(excluded)
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val base = names.map(n => n -> canonical(n)).toMap
      spark.conf.set(key, "3")
      val drifted = names.filter(n => canonical(n) != base(n))
      assert(drifted.isEmpty,
        s"partition-count-sensitive entries (driver-red risk): $drifted")
    } finally spark.conf.set(key, orig)
  }
}

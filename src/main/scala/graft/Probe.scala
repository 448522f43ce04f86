package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch plan-dump probe for plans/r14 (builder-side; deleted before
  * round end). Reconstructs the r13 dataflow shapes verbatim where the
  * shipped op's plan is checkpoint-truncated (Pinned.hold), so the
  * before/after files show the executed iteration/verification shape. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val out = java.nio.file.Paths.get("/root/repo/plans/r14")
    java.nio.file.Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit =
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    // ---- pageRank iteration: r13 shape vs r14 shape -------------------
    val edges = TrainingShared.coPurchaseEdges(spark, dir)
    val e = edges.select(col("src"), col("dst"))
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = verts.agg(count(lit(1)).as("__n"))
    val ranks0 = verts.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("__n")).as("r"))
    // BEFORE (r13): degree-annotated edge checkpoint + unhinted joins
    val deg13 = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val withDeg = e.join(deg13, Seq("src")).localCheckpoint()
    val contribs13 = withDeg.join(ranks0, withDeg("src") === ranks0("id"))
      .select(col("dst").as("id"), (col("r") / col("__deg")).as("__c"))
      .groupBy("id").agg(sum("__c").as("__s"))
    dump("pagerank_iteration_before",
      verts.join(contribs13, Seq("id"), "left").crossJoin(broadcast(n))
        .select(col("id"), ((lit(0.15)) / col("__n") +
          lit(0.85) * coalesce(col("__s"), lit(0.0))).as("r")))
    // AFTER (r14): vertex-sized (src, r/deg) broadcast onto the edge stream
    val deg14 = e.groupBy(col("src").as("__dsrc")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val rd = deg14.join(ranks0, col("__dsrc") === col("id"))
      .select(col("__dsrc"), (col("r") / col("__deg")).as("__c"))
    val contribs14 = e.join(broadcast(rd), e("src") === rd("__dsrc"))
      .select(col("dst").as("id"), col("__c"))
      .groupBy("id").agg(sum("__c").as("__s"))
    dump("pagerank_iteration_after",
      verts.join(broadcast(contribs14), Seq("id"), "left").crossJoin(broadcast(n))
        .select(col("id"), ((lit(0.15)) / col("__n") +
          lit(0.85) * coalesce(col("__s"), lit(0.0))).as("r")))

    // ---- quality filter: double-score vs score-once -------------------
    import graft.ops.TextAnalysis
    val docs = SparkEntry.loader(spark, dir)("documents")
    val scoredLazy = docs.withColumn("quality", TextAnalysis.qualityScore(col("text")))
    val thrLazy = scoredLazy.groupBy(col("lang"))
      .agg(expr("percentile(quality, 0.5)").as("q_threshold"))
    dump("quality_filter_before",
      scoredLazy.join(broadcast(thrLazy), "lang")
        .where(col("quality") >= col("q_threshold")))
    val (scoredPin, h) = graft.ops.Pinned.checkpoint(scoredLazy)
    val thrPin = scoredPin.groupBy(col("lang"))
      .agg(expr("percentile(quality, 0.5)").as("q_threshold"))
    dump("quality_filter_after",
      scoredPin.join(broadcast(thrPin), "lang")
        .where(col("quality") >= col("q_threshold")))
    graft.ops.Pinned.release(h)

    // ---- char shingles: regex-split composition vs native kernel ------
    import graft.ops.Dedup
    dump("char_shingles_before", docs.select(col("doc_id"),
      graft.functions.native.shingleHashes(
        split(TextAnalysis.normText(col("text")), ""), 5).as("sh")))
    dump("char_shingles_after", docs.select(col("doc_id"),
      Dedup.charShingleHashes(col("text"), 5).as("sh")))

    // ---- entry-level plans (current code) -----------------------------
    for (nm <- Seq("q_pipeline_incremental", "q_dedup_jaccard_char",
                   "q_groupby_agg", "q_text_quality_filter")) {
      try dump(s"${nm}_after", SparkEntry.queries(nm)(spark, dir))
      catch { case ex: Throwable => System.err.println(s"$nm: ${ex.getMessage}") }
    }
    TrainingShared.drainGraphSlots()
    spark.stop()
  }
}

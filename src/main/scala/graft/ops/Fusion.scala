package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * combine K independent ranking signals into one score without
  * calibrating their scales: each signal contributes 1/(k₀ + rank),
  * so a document's fused score rewards being near the top of ANY
  * list and no signal's raw magnitude dominates. The standard fusion
  * for mixing quality/novelty/perplexity signals in data selection
  * (or retriever lists in RAG) precisely because it needs no score
  * normalization.
  *
  * Ranks are dense 0-based per signal, descending (rank 0 = best),
  * ties broken by the md5 of the id then the id — deterministic and
  * engine-replayable (row_number with the same ORDER BY). Each
  * signal's rank rides [[Batching.prefixSumScaled]]'s two-pass
  * range-partitioned rank — K narrow shuffles plus an id-keyed join
  * per signal, never a global single-task window. The fused score is
  * a fixed-order sum of exact reciprocals — reproducible in SQL. */
object Fusion {

  def reciprocalRankFusion(df: DataFrame, idCol: String,
                           signals: Seq[(String, Column)],
                           k0: Int = 60): DataFrame = {
    require(signals.nonEmpty && k0 >= 1)
    val base = df.select(col(idCol) +: signals.map { case (n, c) => c.as(s"__s_$n") }: _*)
      .withColumn("__tie", md5(col(idCol).cast("string")))
    var acc = base.select(col(idCol))
    for ((name, _) <- signals) {
      val ranked = Batching.prefixSumScaled(
        base.select(col(idCol), col(s"__s_$name"), col("__tie")),
        Seq(col(s"__s_$name").desc, col("__tie"), col(idCol)), lit(1L),
        out = s"rank_$name")
      acc = acc.join(ranked.select(col(idCol), col(s"rank_$name")), Seq(idCol))
    }
    acc.withColumn("rrf",
      signals.map { case (name, _) =>
        lit(1.0) / (lit(k0.toDouble) + col(s"rank_$name"))
      }.reduce(_ + _))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the validation report run before a
  * table enters a pipeline (row counts, null coverage, cardinality,
  * value ranges; the expectations layer of data-quality tooling):
  * one row per profiled column with (n_rows, n_nonnull, n_distinct,
  * min_value, max_value), min/max rendered as strings so one report
  * schema covers every column type.
  *
  * ONE aggregate over the table computes every column's stats in a
  * single pass (partial-aggregated; no per-column scan), then the
  * 1×(4·k) result row pivots to k rows with an explode — the reshape
  * touches one row, the scan touches the data once. `count_distinct`
  * is exact (adds a distinct shuffle per column inside the aggregate);
  * at 100 TB swap `approx_count_distinct` — the report shape is
  * unchanged.
  */
object Profiling {

  /** Poisson(1) CDF cutoffs as 32-bit hex strings — multiplicity k is
    * assigned where the row's uniform hex draw falls below cutoff k
    * (≥ the last cutoff → 5). floor(P(X ≤ k)·2³²) for k = 0..4. */
  private val PoissonCuts = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5")

  /** DETERMINISTIC Poisson bootstrap confidence interval for a mean —
    * the eval-metric error bar at corpus scale (Chamandy et al. 2012,
    * "Estimating Uncertainty for Massive Data Streams"): resample b
    * gives each row multiplicity Poisson(1), drawn from the md5 of
    * (id, b) — fully reproducible, engine-portable (hex-string
    * compare, the [[Sampling.sampleByHash]] convention), and
    * single-pass: the B resamples explode map-side from a literal
    * array and reduce in ONE (b)-keyed aggregate; no row ever leaves
    * its partition before aggregation. The interval is
    * percentile-disc over the B resample means (rank ⌈q·B⌉ on the
    * ROUNDED means, b tiebreak). Returns one row
    * (b_count, mean, ci_lo, ci_hi) at 6 dp.
    *
    * Poisson(1) truncates at 5 (P ≈ 4e-4 per draw absorbed into the
    * tail bucket — the standard large-n simplification; the bootstrap
    * distribution shift is far below the CI's own Monte-Carlo noise). */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valCol: String,
                      b: Int = 40, q: Double = 0.025): DataFrame = {
    require(b >= 2 && q > 0 && q < 0.5)
    import org.apache.spark.sql.expressions.Window
    val hx = substring(md5(concat_ws(":", col(idCol).cast("string"),
      col("__b").cast("string"))), 1, 8)
    val w = PoissonCuts.zipWithIndex.foldRight(lit(5): Column) {
      case ((cut, k), rest) => when(hx < lit(cut), k).otherwise(rest)
    }
    val resampled = df
      .select(col(idCol), col(valCol).cast("double").as("__x"),
        explode(array((1 to b).map(lit(_)): _*)).as("__b"))
      .select(col("__b"), col("__x"), w.cast("double").as("__w"))
    val means = resampled.groupBy("__b")
      .agg(round(sum(col("__w") * col("__x")) / sum("__w"), 6).as("__m"))
    val loRank = math.ceil(q * b).toLong.max(1L)
    val hiRank = math.ceil((1.0 - q) * b).toLong
    val ranked = means.withColumn("__rk",
      row_number().over(Window.orderBy(col("__m"), col("__b"))))
    val point = df.agg(round(avg(col(valCol).cast("double")), 6).as("mean"))
    point
      .crossJoin(broadcast(ranked.where(col("__rk") === loRank)
        .select(col("__m").as("ci_lo"))))
      .crossJoin(broadcast(ranked.where(col("__rk") === hiRank)
        .select(col("__m").as("ci_hi"))))
      .select(lit(b.toLong).as("b_count"), col("mean"), col("ci_lo"), col("ci_hi"))
  }

  /** In-flight pipeline COUNTERS via Spark's Observation API — the
    * monitoring half of data validation: [[profile]] answers "what is
    * in this table" with its own scan, `observed` answers "what just
    * flowed through this pipeline" for FREE (metrics accumulate inside
    * the existing action's tasks — no second job, no cached
    * intermediate). The production use: every ingest batch reports
    * rows/nulls/violations as a side effect of the write that was
    * happening anyway.
    *
    * Returns the instrumented frame and the Observation handle;
    * `Observation.get` blocks until the NEXT action on that frame
    * completes. Metrics must be aggregates over the observed rows. */
  def observed(df: DataFrame, name: String,
               metrics: Seq[(String, org.apache.spark.sql.Column)]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty)
    val obs = org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(obs,
      metrics.head._2.as(metrics.head._1),
      metrics.tail.map { case (n, c) => c.as(n) }: _*)
    (instrumented, obs)
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns must exist: $cols")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      count_distinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column_name"), col("__rows").as("n_rows"),
      col(s"__n_$c").as("n_nonnull"), col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value")))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
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

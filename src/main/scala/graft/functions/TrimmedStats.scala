package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Outlier-trimmed statistics — the reference's `Stats(middle=p)`
 * accumulator (vendor/jx_python/windows.py:126-155): buffer the sample,
 * sort at the end, drop ceil(n·(1-p)/2) from each tail, report stats of
 * the kept middle slice (population variance, like the reference STATS
 * templates). All-trimmed → null stats.
 *
 * Buffering is exact and per-group: use where groups are bounded (the
 * reference's use). For sketch-grade trimming at unbounded group size,
 * combine two approx quantiles with a conditional re-aggregation.
 */
case class TrimmedStatsResult(count: Long, mean: Option[Double],
                              variance: Option[Double], std: Option[Double],
                              min: Option[Double], max: Option[Double])

class TrimmedStatsAgg(middle: Double) extends Aggregator[java.lang.Double, Seq[Double], TrimmedStatsResult] {
  def zero: Seq[Double] = Vector.empty
  def reduce(b: Seq[Double], v: java.lang.Double): Seq[Double] =
    if (v == null) b else b :+ v.doubleValue()
  def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = a ++ b
  def finish(samples: Seq[Double]): TrimmedStatsResult = {
    val n = samples.length
    val ignore = math.ceil(n * (1 - middle) / 2).toLong.toInt
    if (ignore * 2 >= n) TrimmedStatsResult(0, None, None, None, None, None)
    else {
      val kept = samples.sorted.slice(ignore, n - ignore)
      val k = kept.length
      val mean = kept.sum / k
      val variance = kept.map(x => (x - mean) * (x - mean)).sum / k
      TrimmedStatsResult(k, Some(mean), Some(variance), Some(math.sqrt(variance)),
        Some(kept.head), Some(kept.last))
    }
  }
  def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  def outputEncoder: Encoder[TrimmedStatsResult] = Encoders.product[TrimmedStatsResult]
}

object TrimmedStats {
  /** Column form: trimmedStats(0.8)(col) → struct(count, mean, variance, std, min, max). */
  def apply(middle: Double)(value: Column): Column =
    udaf(new TrimmedStatsAgg(middle), Encoders.DOUBLE).apply(value)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-suite fuzz of the TIME-domain dense cube (day/week/month
  * intervals) — the arithmetic-bucketing path the set-domain fuzz
  * blocks (q_fuzz_edges_b1/b2) cannot reach and the catalog covers
  * only with two hand-written windows (q_edges_time_month/week).
  * Random [min, max) windows × interval units × allowNulls, checked
  * against an independently-spelled Spark oracle (sequence() domain +
  * LEFT JOIN on a groupBy bucket label + a bare-aggregate null arm —
  * the same shape as the DuckDB gate oracles for the hand-written
  * entries). In-suite only: the catalog stays frozen (VERDICT r11 #7).
  *
  * Pinned semantics: [min, max) half-open, out-of-range AND null rows
  * route to the null bucket (only emitted under allowNulls — as a
  * zero-filled cell even when empty), empty in-range cells densify to
  * n=0 with a NULL sum, month intervals bucket by CALENDAR month while
  * day/week bucket by epoch-seconds floor arithmetic from min. */
class EdgeTimeFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  private val dir = "/root/testdata/sf0.001"

  private def runJx(q: String) =
    jx.QueryRunner.run(spark, jx.JxQuery.parse(q), SparkEntry.loader(spark, dir))

  for (seed <- Seq(515L, 616L)) {
    test(s"random time-domain cubes match the sequence+join oracle (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      for (rd <- 0 until 5) {
        val unit = Seq("day", "week", "month")(rnd.nextInt(3))
        val y = 1993 + rnd.nextInt(5)
        val m = 1 + rnd.nextInt(12)
        val d = if (unit == "month") 1 else 1 + rnd.nextInt(28)
        val len = 2 + rnd.nextInt(12)
        val minD = java.time.LocalDate.of(y, m, d)
        val maxD = unit match {
          case "day"   => minD.plusDays(len.toLong)
          case "week"  => minD.plusWeeks(len.toLong)
          case "month" => minD.plusMonths(len.toLong)
        }
        val allowNulls = rnd.nextBoolean()
        val (minS, maxS) = (minD.toString, maxD.toString)

        val got = runJx(s"""{
          "from": "orders",
          "edges": [{
            "name": "bucket", "value": "o_orderdate", "allowNulls": $allowNulls,
            "domain": {"type": "time", "min": "$minS", "max": "$maxS", "interval": "$unit"}
          }],
          "select": [
            {"name": "n", "value": ".", "aggregate": "count"},
            {"name": "s", "value": "o_totalprice", "aggregate": "sum"}
          ]}""")
          .select(col("bucket").cast("timestamp").as("b"), col("n").cast("long"),
            round(col("s").cast("double"), 2).as("s"))

        // independently-spelled oracle
        val ord = SparkEntry.loader(spark, dir)("orders")
        val v = col("o_orderdate").cast("timestamp")
        val inRange = v.isNotNull &&
          v >= to_timestamp(lit(minS)) && v < to_timestamp(lit(maxS))
        val label = unit match {
          case "month" => date_trunc("month", v).cast("timestamp")
          case _ =>
            val step = if (unit == "day") 86400L else 7 * 86400L
            val mnE = java.time.LocalDate.parse(minS)
              .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
            timestamp_seconds(lit(mnE) +
              floor((unix_timestamp(v) - lit(mnE)) / lit(step)) * lit(step))
        }
        val ivSql = unit match {
          case "day" => "interval 1 day"; case "week" => "interval 7 day"
          case "month" => "interval 1 month"
        }
        val lastS = (unit match {
          case "day"   => maxD.minusDays(1)
          case "week"  => maxD.minusWeeks(1)
          case "month" => maxD.minusMonths(1)
        }).toString
        val dom = spark.range(1).select(explode(expr(
          s"sequence(to_timestamp('$minS'), to_timestamp('$lastS'), $ivSql)")).as("b"))
        val agg = ord.where(inRange).groupBy(label.as("b"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice").cast("double"), 2).as("s"))
        val dense = dom.join(agg, Seq("b"), "left")
          .select(col("b"), coalesce(col("n"), lit(0L)).as("n"), col("s"))
        val want =
          if (!allowNulls) dense
          else dense.unionByName(ord.where(!coalesce(inRange, lit(false)))
            .agg(count(lit(1)).as("n"), round(sum("o_totalprice").cast("double"), 2).as("s"))
            .select(lit(null).cast("timestamp").as("b"), col("n"), col("s")))

        val g = got.collect().map(_.toSeq).sortBy(_.toString())
        val w = want.collect().map(_.toSeq).sortBy(_.toString())
        val diffs = g.zipAll(w, null, null).filter { case (a, b) => a != b }.take(3)
        assert(g.length == w.length && diffs.isEmpty,
          s"seed $seed round $rd ($unit $minS..$maxS allowNulls=$allowNulls): " +
            s"${g.length} vs ${w.length} rows; diffs $diffs")
      }
    }
  }

  for (seed <- Seq(919L, 1020L)) {
    test(s"random duration- and range-domain cubes match the floor-bucket oracle (seed $seed)") {
      // completes the domain-type sweep: duration (seconds-valued
      // buckets over events.value with JX duration spellings) and plain
      // numeric range with NON-integer boundaries (double-precision
      // floor arithmetic over l_extendedprice)
      val rnd = new scala.util.Random(seed)
      for (rd <- 0 until 4) {
        val durDomain = rnd.nextBoolean()
        val allowNulls = rnd.nextBoolean()
        val (tbl, valueCol, mn, step, nB) =
          if (durDomain) {
            val stepSec = Seq(30, 60, 90)(rnd.nextInt(3))
            ("events", "value", rnd.nextInt(3) * 60.0, stepSec.toDouble, 3 + rnd.nextInt(5))
          } else
            ("lineitem", "l_extendedprice",
              900.0 + rnd.nextInt(5) * 250.5, 7777.25 + rnd.nextInt(3) * 500.5, 3 + rnd.nextInt(5))
        val mx = mn + step * nB
        val domJson =
          if (durDomain)
            s"""{"type": "duration", "min": ${mn.toInt}, "max": "${mx.toInt}second", "interval": "${step.toInt}second"}"""
          else s"""{"type": "range", "min": $mn, "max": $mx, "interval": $step}"""

        val got = runJx(s"""{
          "from": "$tbl",
          "edges": [{
            "name": "b", "value": "$valueCol", "allowNulls": $allowNulls,
            "domain": $domJson
          }],
          "select": [{"name": "n", "value": ".", "aggregate": "count"}]}""")
          .select(col("b").cast("double").as("b"), col("n").cast("long").as("n"))

        val src = SparkEntry.loader(spark, dir)(tbl)
        val v = col(valueCol).cast("double")
        val inRange = v.isNotNull && v >= lit(mn) && v < lit(mx)
        val label = lit(mn) + floor((v - lit(mn)) / lit(step)) * lit(step)
        val dom = spark.range(nB.toLong)
          .select((lit(mn) + col("id") * lit(step)).as("b"))
        val agg = src.where(inRange).groupBy(label.as("b")).agg(count(lit(1)).as("n"))
        val dense = dom.join(agg, Seq("b"), "left")
          .select(col("b"), coalesce(col("n"), lit(0L)).as("n"))
        val want =
          if (!allowNulls) dense
          else dense.unionByName(src.where(!coalesce(inRange, lit(false)))
            .agg(count(lit(1)).as("n"))
            .select(lit(null).cast("double").as("b"), col("n")))

        val g = got.collect().map(_.toSeq).sortBy(_.toString())
        val w = want.collect().map(_.toSeq).sortBy(_.toString())
        val diffs = g.zipAll(w, null, null).filter { case (a, b) => a != b }.take(3)
        assert(g.length == w.length && diffs.isEmpty,
          s"seed $seed rd $rd ($tbl dom=[$mn,$mx) step $step allowNulls=$allowNulls): " +
            s"${g.length} vs ${w.length}; diffs $diffs")
      }
    }
  }
}

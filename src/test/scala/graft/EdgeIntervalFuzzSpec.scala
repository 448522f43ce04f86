package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-suite fuzz of the INTERVAL-overlap edge (a row lands in EVERY
  * overlapping part — reference lists/aggs.py:123-147) — the subtlest
  * cube path: sequence(loIdx, hiIdx) arithmetic with boundary clamps
  * and the 1e-9 epsilon that keeps an interval ending EXACTLY on a
  * bucket boundary out of that bucket. The catalog pins one fixed
  * window (q_edges_interval_overlap); this draws random domains and
  * random row intervals — including zero-width intervals, inverted
  * (dirty max < min) intervals, spans covering the whole domain, and
  * boundary-exact endpoints (integer quantities against integer bucket
  * edges) — against the reference's own overlap predicate spelled
  * directly: dom CROSS-predicate JOIN rows ON part.min < hi AND
  * part.max > lo. In-suite only (catalog frozen).
  *
  * Null-arm semantics: rows overlapping NO part (null/inverted/out of
  * range) count into the null bucket under allowNulls — emitted as a
  * bare aggregate, zero-filled even when empty. */
class EdgeIntervalFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  private val dir = "/root/testdata/sf0.001"

  private def runJx(q: String) =
    jx.QueryRunner.run(spark, jx.JxQuery.parse(q), SparkEntry.loader(spark, dir))

  for (seed <- Seq(717L, 818L)) {
    test(s"random interval-overlap cubes match the overlap-predicate oracle (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      for (rd <- 0 until 5) {
        // random domain: integer-aligned so row endpoints (integer
        // l_quantity values) land EXACTLY on bucket boundaries
        val mn = 1 + rnd.nextInt(10)
        val step = Seq(5, 10, 13)(rnd.nextInt(3))
        val nBuckets = 3 + rnd.nextInt(4)
        val mx = mn + step * nBuckets
        val allowNulls = rnd.nextBoolean()
        // random interval shape per draw: JX expressions over lineitem.
        // width 0 → zero-width point; negative → dirty inverted rows
        // (l_linenumber ≥ 1, so max < min on every row); l_quantity
        // spans 1..50, so spans regularly cross several buckets and
        // stick out both domain ends
        val width = Seq(0, 3, 15, 60, -2)(rnd.nextInt(5))
        val maxExpr = s"""{"add": ["l_quantity", {"mul": [$width, "l_linenumber"]}]}"""

        val got = runJx(s"""{
          "from": "lineitem",
          "where": {"lt": {"l_orderkey": 300}},
          "edges": [{
            "name": "span", "allowNulls": $allowNulls,
            "range": {"min": "l_quantity", "max": $maxExpr},
            "domain": {"type": "range", "min": $mn, "max": $mx, "interval": $step}
          }],
          "select": [{"name": "n", "value": ".", "aggregate": "count"}]}""")
          .select(col("span").cast("double").as("b"), col("n").cast("long").as("n"))

        // oracle: the reference's overlap predicate verbatim, one row
        // per (part, overlapping row), zero-filled by the LEFT join
        val li = SparkEntry.loader(spark, dir)("lineitem")
          .where(col("l_orderkey") < 300)
          .select(col("l_quantity").cast("double").as("lo"),
            (col("l_quantity") + lit(width) * col("l_linenumber")).cast("double").as("hi"))
        val dom = spark.range(nBuckets.toLong).select(
          (lit(mn) + col("id") * lit(step)).cast("double").as("b"),
          (lit(mn) + (col("id") + 1) * lit(step)).cast("double").as("bEnd"))
        val dense = dom.join(li,
            li("lo") < dom("bEnd") && li("hi") > dom("b"), "left")
          .groupBy(col("b")).agg(count(col("lo")).as("n"))
        // a zero-width interval [p, p] still lands in the bucket whose
        // interior contains p (reference: part.min < p AND part.max > p)
        // — the predicate above covers it with lo < bEnd && hi > b only
        // when hi == lo is strictly inside; boundary points match no part
        val orphan = li.where(li("lo").isNull || li("hi").isNull ||
          !dom.collect().map(r => (r.getDouble(0), r.getDouble(1)))
            .map { case (b, e) => li("lo") < lit(e) && li("hi") > lit(b) }
            .reduce(_ || _))
        val want =
          if (!allowNulls) dense
          else dense.unionByName(orphan.agg(count(lit(1)).as("n"))
            .select(lit(null).cast("double").as("b"), col("n")))

        val g = got.collect().map(_.toSeq).sortBy(_.toString())
        val w = want.collect().map(_.toSeq).sortBy(_.toString())
        val diffs = g.zipAll(w, null, null).filter { case (a, b) => a != b }.take(3)
        assert(g.length == w.length && diffs.isEmpty,
          s"seed $seed rd $rd (dom [$mn,$mx) step $step width $width allowNulls=$allowNulls): " +
            s"${g.length} vs ${w.length}; diffs $diffs")
      }
    }
  }
}

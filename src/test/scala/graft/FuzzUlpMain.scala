package graft

import org.apache.spark.sql.Row
import graft.jx.{JxFuzz, JxSql}

/** Builder-side diagnostic (r14): the CORRECTED fragility model for the
  * scalar fuzz gate. The r13 audit asked "is any pow-bearing OUTPUT cell
  * within 64 ulps of a 10-significant-digit rendering boundary?" — and
  * pre-cleared the two windows the driver then reddened (b1a, b2b, the
  * two pow-densest windows). The gap: a ≤1-ulp libm pow drift UPSTREAM
  * of a discrete decision — an eq/inequality comparison, floor, mod,
  * the integral-print test `d == rint(d)`, or a when/case condition —
  * flips the decision and changes the output by an ARBITRARY amount, in
  * any column type, which no output-cell rendering-boundary model can
  * see. This main measures that directly: every scalar-block tree is
  * evaluated three ways inside Spark (libm POW baseline; POW perturbed
  * by ±~1 ulp relative) plus the r14 multiplication pin, all through
  * the same JxSql rendering + driver-comparator normalization, and any
  * column whose normalized values move under the perturbation is
  * drift-SENSITIVE — the set of trees a driver libm that disagrees with
  * the JVM's Math.pow by 1 ulp can redden.
  *
  * Usage: Test/runMain graft.FuzzUlpMain [sfDir]
  */
object FuzzUlpMain {

  /** Spark-dialect variant base: delegate every spelling, vary pow. */
  private class SparkVariant extends JxSql.Dialect {
    private val b = JxSql.SparkSql
    def eqNullSafe(x: String, y: String) = b.eqNullSafe(x, y)
    def strpos(s: String, sub: String) = b.strpos(s, sub)
    def regexpFullMatch(s: String, p: String) = b.regexpFullMatch(s, p)
    val stringType = b.stringType
    def epochSeconds(ts: String) = b.epochSeconds(ts)
    def toTimestamp(sec: String) = b.toTimestamp(sec)
    def splitLiteral(s: String, raw: String) = b.splitLiteral(s, raw)
    def elementAt(arr: String, n: String) = b.elementAt(arr, n)
    def medianCont(x: String) = b.medianCont(x)
  }
  /** What every engine pre-r14 computed: a libm pow call. */
  private object LibmPow extends SparkVariant {
    override def pow(base: String, e: String, lit: Option[Long]) =
      s"POW($base, $e)"
  }
  /** libm pow shifted by a ~1-ulp relative factor — the drift license.
    * Only NON-INTEGRAL results are perturbed: an exactly-integral pow of
    * the domain's small inputs is exactly representable and computed
    * exactly by every libm (perturbing it would only flip the
    * comparator's integer-print arm — an audit artifact, not a real
    * drift mode). Non-integral results are where the ≤1-ulp license
    * actually bites. */
  private class PerturbedPow(eps: String) extends SparkVariant {
    override def pow(base: String, e: String, lit: Option[Long]) = {
      val p = s"POW($base, $e)"
      s"(CASE WHEN $p = CAST($p AS BIGINT) THEN $p ELSE $p * (1.0 + $eps) END)"
    }
  }
  /** The INVERSE drift mode — a "sloppy" libm that computes pow via
    * exp(y·log(x)) and misses EXACTLY-INTEGRAL results by ~1 ulp
    * (pow(5,3) → 124.99999999999999). The comparator absorbs that as a
    * VALUE (%.10g rounds it back to "125") — but not when the pow
    * output feeds a DISCRETE op: an eq/inequality against an exact
    * integer flips a boolean, a floor/mod shifts by a whole unit. This
    * is the mode the r14 adjudication tests: which columns can a
    * sloppy-integral-pow oracle redden? */
  private class SloppyIntPow(eps: String) extends SparkVariant {
    override def pow(base: String, e: String, lit: Option[Long]) = {
      val p = s"POW($base, $e)"
      s"(CASE WHEN $p = CAST($p AS BIGINT) THEN $p * (1.0 + $eps) ELSE $p END)"
    }
  }

  /** Simulates an oracle whose literal split returns the EMPTY array for
    * an empty input string (DuckDB 1.0.0 and Spark both return [''];
    * `['']` vs `[]` is a classic engine-version boundary class, and
    * through a first/last/get element access it becomes '' vs NULL —
    * value-dependent, invisible to a construct census). */
  private object EmptySplitEmpty extends SparkVariant {
    override def splitLiteral(s: String, raw: String) = {
      val base = JxSql.SparkSql.splitLiteral(s, raw)
      s"(CASE WHEN $s = '' THEN CAST(ARRAY() AS ARRAY<STRING>) ELSE $base END)"
    }
  }

  /** selfcheck.py's value normalization — with PYTHON's %.10g semantics,
    * not Java's: C/Python %g strips trailing zeros ("225.0000000" →
    * "225"), so a near-integral double ("225.00000000000003") and the
    * exact integer print BOTH normalize to "225" in the driver's
    * comparator. Java's %g keeps the zeros, which made the first audit
    * run overcount value-absorbed cells as diffs. */
  private def pyG10(d: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.10g", Double.box(d))
    val i = s.indexOf('e')
    val (mant, exp) = if (i < 0) (s, "") else (s.substring(0, i), s.substring(i))
    val m =
      if (mant.contains('.')) {
        val t = mant.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      } else mant
    m + exp
  }
  private def norm(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case d: Double =>
      if (d.isNaN) "NaN"
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else pyG10(d)
    case other => other.toString
  }

  private def render(cs: Seq[JxFuzz.FuzzCase], d: JxSql.Dialect, view: String): String = {
    val cols = cs.map(c => s"${FuzzCatalog.normSql(JxSql.sql(c.expr, d), c.ty)} AS ${c.name}")
    s"SELECT k, ${cols.mkString(",\n  ")} FROM $view ORDER BY k"
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get("8")
    FuzzCatalog.domainDf(spark, dir).createOrReplaceTempView("ulp_t")

    val variants: Seq[(String, JxSql.Dialect)] = Seq(
      ("up", new PerturbedPow("2.3e-16")),
      ("down", new PerturbedPow("-2.3e-16")),
      ("sloppy-up", new SloppyIntPow("2.3e-16")),
      ("sloppy-down", new SloppyIntPow("-2.3e-16")),
      ("empty-split", EmptySplitEmpty),
      ("pin", JxSql.SparkSql)) // r14 default: multiplication rendering

    for ((name, seed, n) <- FuzzCatalog.blocks) {
      val cs = JxFuzz.cases(seed, n)
      val powCols = cs.filter(c => FuzzPowMain.hasPow(c.expr))
      val base: Array[Row] = spark.sql(render(cs, LibmPow, "ulp_t")).collect()
      for ((vn, dial) <- variants) {
        val alt = spark.sql(render(cs, dial, "ulp_t")).collect()
        val diffs = cs.indices.flatMap { i =>
          val bad = base.indices.count(r => norm(base(r).get(i + 1)) != norm(alt(r).get(i + 1)))
          if (bad > 0) Some((cs(i).name, i, bad)) else None
        }
        for ((cn, idx, bad) <- diffs) {
          val win = s"${('a' + idx / 25).toChar}${idx % 25 / 5 + 1}"
          println(s"[ulp] $name/$cn vs $vn: $bad rows differ (window $win, case $idx)")
        }
        if (diffs.isEmpty) println(s"[ulp] $name vs $vn: no column moves")
      }
      println(s"[ulp] $name pow-bearing: ${powCols.map(_.name).mkString(", ")}")
    }
    spark.stop()
  }
}

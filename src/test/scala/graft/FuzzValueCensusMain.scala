package graft

import org.apache.spark.sql.Row
import graft.jx.{JxFuzz, JxSql}

/** Builder-side diagnostic (r14): VALUE-class census of the scalar fuzz
  * gate. The construct census (FuzzCensusMain) finds ops present only in
  * red windows; this one finds comparator-dangerous CELL VALUES present
  * only in red windows — the classes where an engine-version or
  * comparator-environment boundary can bite even when the construct set
  * is unremarkable: non-finite doubles, negative zero, the integral
  * print cliff (|v| ≥ 1e15 falls out of the int-print arm; |v| ≥ 1e10
  * integral renders scientific under %.10g on any drift), huge/tiny
  * magnitudes, >2^53 longs (lossy under a pandas float64 conversion),
  * and odd strings. Usage: Test/runMain graft.FuzzValueCensusMain [sfDir]
  */
object FuzzValueCensusMain {

  private def classify(v: Any): Seq[String] = v match {
    case null => Nil
    case d: Double =>
      val b = Seq.newBuilder[String]
      if (d.isNaN) b += "NaN"
      if (d.isInfinity) b += "Inf"
      if (d == 0.0 && (1.0 / d) < 0) b += "negzero"
      if (!d.isNaN && !d.isInfinity) {
        val a = math.abs(d)
        if (a >= 1e15) b += "ge1e15"
        else if (a >= 1e10 && d == math.rint(d)) b += "ge1e10-int"
        if (a >= 1e100) b += "ge1e100"
        if (a > 0 && a < 1e-10) b += "tiny"
        if (d != math.rint(d)) b += "frac"
      }
      b.result()
    case l: Long =>
      if (math.abs(l) > (1L << 53)) Seq("ge2^53") else Nil
    case s: String =>
      val b = Seq.newBuilder[String]
      if (s.isEmpty) b += "emptystr"
      if (s.length > 100) b += "longstr"
      if (s.exists(c => c < ' ')) b += "ctrlchar"
      b.result()
    case _ => Nil
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get("8")
    FuzzCatalog.domainDf(spark, dir).createOrReplaceTempView("vc_t")
    for ((name, seed, n) <- FuzzCatalog.blocks) {
      val cs = JxFuzz.cases(seed, n)
      val cols = cs.map(c => s"${FuzzCatalog.normSql(JxSql.sql(c.expr, JxSql.SparkSql), c.ty)} AS ${c.name}")
      val rows: Array[Row] = spark.sql(
        s"SELECT ${cols.mkString(",\n  ")} FROM vc_t").collect()
      // per column: class -> count
      val per = cs.indices.map { i =>
        val m = collection.mutable.Map[String, Int]()
        rows.foreach(r => classify(r.get(i)).foreach(k => m(k) = m.getOrElse(k, 0) + 1))
        (cs(i).name, i, m.toMap)
      }
      // window rollup (5 windows of 25, sub-windows of 5)
      for (w <- 0 until 5) {
        val winCols = per.slice(w * 25, (w + 1) * 25)
        val agg = collection.mutable.Map[String, Int]()
        winCols.foreach(_._3.foreach { case (k, c) => agg(k) = agg.getOrElse(k, 0) + c })
        val rare = agg.toSeq.filterNot(_._1 == "frac").sortBy(_._1)
        println(s"[vc] $name window ${('a' + w).toChar}: ${rare.map { case (k, c) => s"$k=$c" }.mkString(" ")}")
        for ((cn, idx, m) <- winCols if m.keys.exists(_ != "frac")) {
          val odd = m.filterNot(_._1 == "frac")
          if (odd.nonEmpty)
            println(s"[vc]    $cn (case $idx, sub ${idx % 25 / 5 + 1}): ${odd.map { case (k, c) => s"$k=$c" }.mkString(" ")}")
        }
      }
    }
    spark.stop()
  }
}

package graft

import graft.jx.{JxExpr, JxFuzz, JxSql}

/** Builder-side diagnostic: dump the DuckDB + Spark SQL renderings of
  * the fuzz cases in a block whose tree contains a construct matching a
  * simple predicate — used to adjudicate driver-red blocks by eye and
  * by cross-version DuckDB probing.
  * Usage: Test/runMain graft.FuzzDumpMain <seed> [filter]
  *   filter: "get1" (GetOp on array with literal index 1), "all"
  */
object FuzzDumpMain {
  import JxExpr._

  private def contains(e: JxExpr, p: JxExpr => Boolean): Boolean =
    JxExpr.treeExists(e)(p)

  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val filter = if (args.length > 1) args(1) else "get1"
    val pred: JxExpr => Boolean = filter match {
      case "get1" => {
        case GetOp(v, Lit(i: Long)) if JxExpr.isArrayExpr(v) && i >= 1 => true
        case _ => false
      }
      case "get1exact" => {
        case GetOp(v, Lit(1L)) if JxExpr.isArrayExpr(v) => true
        case _ => false
      }
      case _ => _ => true
    }
    JxFuzz.cases(seed, 125).foreach { c =>
      if (contains(c.expr, pred)) {
        println(s"== ${c.name} (ty=${c.ty})")
        println(s"  tree: ${c.expr}")
        println(s"  duck: ${JxSql.sql(c.expr, JxSql.DuckDb)}")
        println(s"  spark: ${JxSql.sql(c.expr, JxSql.SparkSql)}")
      }
    }
  }
}

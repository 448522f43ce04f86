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

  private def contains(e: JxExpr, p: JxExpr => Boolean): Boolean = {
    def kids(x: JxExpr): Seq[JxExpr] = x match {
      case AndOp(ts) => ts; case OrOp(ts) => ts; case NotOp(t) => Seq(t)
      case EqOp(a, b) => Seq(a, b); case NeOp(a, b) => Seq(a, b)
      case InequalityOp(_, a, b) => Seq(a, b)
      case BinaryOp(_, a, b, d) => Seq(a, b, d)
      case MultiOp(_, ts, _, d) => ts :+ d
      case CoalesceOp(ts) => ts
      case MissingOp(t) => Seq(t); case ExistsOp(t) => Seq(t)
      case InOp(v, s) => Seq(v, s)
      case LengthOp(t) => Seq(t)
      case FindOp(a, b, c, d) => Seq(a, b, c, d)
      case BetweenOp(a, b, c, d, e2) => Seq(a, b, c, d, e2)
      case PrefixOp(a, b) => Seq(a, b); case SuffixOp(a, b) => Seq(a, b)
      case ConcatOp(ts, s, d) => ts ++ Seq(s, d)
      case RegExpOp(a, b) => Seq(a, b)
      case SplitOp(a, b) => Seq(a, b)
      case GetOp(a, b) => Seq(a, b)
      case FirstOp(t) => Seq(t); case LastOp(t) => Seq(t)
      case WhenOp(c, t, e2) => Seq(c, t, e2)
      case CaseOp(ws, d) => ws.flatMap(w => Seq(w.cond, w.thenE)) :+ d
      case CastOp(_, t) => Seq(t)
      case UnixOp(t) => Seq(t); case FromUnixOp(t) => Seq(t)
      case _ => Seq.empty
    }
    p(e) || kids(e).exists(contains(_, p))
  }

  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val filter = if (args.length > 1) args(1) else "get1"
    val pred: JxExpr => Boolean = filter match {
      case "get1" => {
        case GetOp(v, Lit(i: Long)) if JxExpr.isArrayExpr(v) && i >= 1 => true
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

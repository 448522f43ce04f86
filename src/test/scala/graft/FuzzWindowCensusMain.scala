package graft

import graft.jx.{JxExpr, JxFuzz}

/** Builder-side diagnostic: per-sub-block operator census for the split
  * scalar gate blocks (the COVERAGE.md lookup table a driver-named red
  * window is adjudicated against). Usage:
  *   Test/runMain graft.FuzzWindowCensusMain <seed> <prefix>
  */
object FuzzWindowCensusMain {
  import JxExpr._

  private def ops(e: JxExpr, acc: collection.mutable.Map[String, Int]): Unit = {
    def add(k: String): Unit = acc(k) = acc.getOrElse(k, 0) + 1
    e match {
      case _: Variable | _: Lit | NullOp | TrueOp | FalseOp => ()
      case BinaryOp(op, _, _, _) => add(op match {
        case "exp" => "Pow"; case o => o.capitalize })
      case other => add(other.getClass.getSimpleName.stripSuffix("$")
        .stripSuffix("Op"))
    }
    kids(e).foreach(ops(_, acc))
  }

  private def kids(e: JxExpr): Seq[JxExpr] = e match {
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

  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val prefix = args(1)
    (0 until 5).foreach { i =>
      val acc = collection.mutable.Map[String, Int]()
      JxFuzz.cases(seed, 125).slice(i * 25, (i + 1) * 25).foreach(c => ops(c.expr, acc))
      val top = acc.toSeq.sortBy(-_._2).map { case (k, v) => s"$k $v" }.mkString(", ")
      println(s"$prefix${('a' + i).toChar} (${i * 25}-${(i + 1) * 25 - 1}): $top")
    }
  }
}

package graft

import graft.jx.{JxExpr, JxFuzz}

/** Builder-side diagnostic: list, per scalar fuzz block, which case
  * columns contain a pow (`exp`) node — the registry's only operation
  * without an IEEE correctly-rounded guarantee, i.e. the only scalar
  * op whose value can differ between engines/libms. Cross-referenced
  * with the fragile-cell audit (cells within ±4 ulps of a
  * 10-significant-digit rendering boundary) to adjudicate driver-red
  * blocks. Usage: Test/runMain graft.FuzzPowMain
  */
object FuzzPowMain {
  import JxExpr._

  private def hasPow(e: JxExpr): Boolean = {
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
    (e match {
      case BinaryOp("exp", _, _, _) => true
      case _ => false
    }) || kids(e).exists(hasPow)
  }

  def main(args: Array[String]): Unit = {
    for ((name, seed) <- Seq(("b1", 1001L), ("b2", 2002L), ("b3", 3003L), ("b4", 4004L))) {
      val pows = JxFuzz.cases(seed, 125).filter(c => hasPow(c.expr)).map(_.name)
      println(s"$name pow-bearing columns: ${pows.mkString(", ")}")
    }
  }
}

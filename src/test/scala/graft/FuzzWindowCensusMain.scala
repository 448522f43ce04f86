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
    JxExpr.children(e).foreach(ops(_, acc))
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

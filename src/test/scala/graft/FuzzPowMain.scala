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

  private[graft] def hasPow(e: JxExpr): Boolean =
    JxExpr.treeExists(e) {
      case BinaryOp("exp", _, _, _) => true
      case _ => false
    }

  def main(args: Array[String]): Unit = {
    for ((name, seed) <- Seq(("b1", 1001L), ("b2", 2002L), ("b3", 3003L), ("b4", 4004L))) {
      val pows = JxFuzz.cases(seed, 125).filter(c => hasPow(c.expr)).map(_.name)
      println(s"$name pow-bearing columns: ${pows.mkString(", ")}")
    }
  }
}

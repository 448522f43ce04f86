package graft

import graft.jx.{JxExpr, JxFuzz}

/** Builder-side diagnostic: list, per scalar fuzz block, which case
  * columns contain a pow (`exp`) node — historically the registry's
  * only operation without an IEEE correctly-rounded guarantee. Since
  * r14 the fuzzer's literal-exponent pows render as repeated
  * multiplication on both sides (JxSql.Dialect.pow), so the gate
  * surface is libm-free — this census remains the lookup table for
  * adjudicating any pow-era driver artifact and for FuzzUlpMain's
  * sensitivity audit. Usage: Test/runMain graft.FuzzPowMain
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

package graft

import graft.jx.{JxExpr, JxFuzz}

/** Builder-side diagnostic: census the construct inventory of each
  * scalar fuzz block — node types plus the discriminating literal
  * shapes (get indexes by sign/operand kind, split patterns, null-
  * bearing in-lists, cast targets). Used to adjudicate a driver-red
  * block against green siblings: a construct present ONLY in the red
  * blocks is the suspect seam. Usage: Test/runMain graft.FuzzCensusMain
  */
object FuzzCensusMain {
  import JxExpr._

  private def census(e: JxExpr, acc: collection.mutable.Map[String, Int]): Unit = {
    def add(k: String): Unit = acc(k) = acc.getOrElse(k, 0) + 1
    e match {
      case GetOp(v, Lit(i: Long)) =>
        val arr = if (JxExpr.isArrayExpr(v)) "arr" else "scalar"
        add(s"get[$arr,idx=$i]")
      case SplitOp(_, Lit(p: String)) => add(s"split[pat=$p]")
      case InOp(_, Lit(xs: Seq[_])) =>
        add(if (xs.contains(null)) "in[with-null]" else "in[no-null]")
      case CastOp(t, _) => add(s"cast[$t]")
      case BinaryOp(op, _, _, dflt) =>
        add(s"bin[$op${if (dflt != NullOp) ",dflt" else ""}]")
      case FindOp(_, _, _, _) => add("find")
      case BetweenOp(_, _, _, _, _) => add("between")
      case other =>
        add(other.getClass.getSimpleName.stripSuffix("$"))
    }
    JxExpr.children(e).foreach(census(_, acc))
  }


  def main(args: Array[String]): Unit = {
    val blocks = Seq(("b1", 1001L), ("b2", 2002L), ("b3", 3003L), ("b4", 4004L))
    val maps = blocks.map { case (name, seed) =>
      val acc = collection.mutable.Map[String, Int]()
      JxFuzz.cases(seed, 125).foreach(c => census(c.expr, acc))
      (name, acc.toMap)
    }
    val keys = maps.flatMap(_._2.keys).distinct.sorted
    println(f"${"construct"}%-28s ${maps.map(_._1).mkString("  ")}")
    keys.foreach { k =>
      val row = maps.map { case (_, m) => f"${m.getOrElse(k, 0)}%3d" }.mkString("  ")
      val only12 = maps.collect { case (n, m) if m.contains(k) => n }.toSet
      val flag = if ((only12 == Set("b1", "b2")) || (only12 -- Set("b1", "b2")).isEmpty) "  <-- b1/b2-only" else ""
      println(f"$k%-28s $row$flag")
    }
  }
}

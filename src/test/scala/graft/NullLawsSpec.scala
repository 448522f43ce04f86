package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jx.{JxCompiler, JxExpr}

/**
 * Property-flavored law tests for JX null semantics (SURVEY §1.2): the
 * laws hold for EVERY pair drawn from a generated value domain including
 * nulls — evaluated through the real compiler on a DataFrame cross
 * product, so one Spark job checks all cases.
 *
 * Laws (reference vendor/jx_base/expressions.py):
 *  - eq is reflexive including missing (999-1014)
 *  - ne = not(eq), both total (never null) (1042-1048)
 *  - inequalities are decisive: missing operand → FALSE (849-894)
 *  - strict arithmetic: missing operand → missing; nulls:true ignores
 *    missing; all-missing → default (1740-1756)
 *  - div by zero → missing/default (918-922)
 *  - sort places nulls least in both directions (jx.py:562-627)
 */
class NullLawsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  import spark.implicits._

  private val values: Seq[java.lang.Double] =
    Seq(null, 0.0, 1.0, -1.0, 2.5, -3.75, 1e15, -1e15, 0.1).map {
      case null => null.asInstanceOf[java.lang.Double]
      case d: Double => java.lang.Double.valueOf(d)
    }

  private lazy val pairs = {
    val vs = values.toDF("a")
    vs.crossJoin(values.toDF("b"))
  }

  private def ctx = JxCompiler.Ctx(resolveVar = col)
  private def c(json: String) = JxCompiler.compile(JxExpr.parseJson(json), ctx)

  private def lawHolds(law: org.apache.spark.sql.Column, name: String): Unit = {
    val violations = pairs.where(!coalesce(law, lit(false))).count()
    assert(violations === 0L, s"law '$name' violated on $violations pairs")
  }

  test("eq is reflexive incl. missing; ne = not(eq); both never null") {
    lawHolds(c("""{"eq": ["a", "a"]}""") === lit(true), "eq reflexive")
    lawHolds(c("""{"eq": ["a", "b"]}""").isNotNull, "eq total")
    lawHolds(c("""{"ne": ["a", "b"]}""") === !c("""{"eq": ["a", "b"]}"""), "ne = not eq")
  }

  test("inequalities are decisive: missing operand → FALSE, never null") {
    for (op <- Seq("gt", "gte", "lt", "lte")) {
      val cmp = c(s"""{"$op": ["a", "b"]}""")
      lawHolds(cmp.isNotNull, s"$op total")
      lawHolds(when(col("a").isNull || col("b").isNull, cmp === lit(false)).otherwise(lit(true)),
        s"$op missing→false")
    }
    // trichotomy on present values: exactly one of <, =, > holds
    lawHolds(
      when(col("a").isNotNull && col("b").isNotNull,
        (c("""{"lt": ["a", "b"]}""").cast("int") +
          c("""{"gt": ["a", "b"]}""").cast("int") +
          c("""{"eq": ["a", "b"]}""").cast("int")) === 1).otherwise(lit(true)),
      "trichotomy")
  }

  test("strict arithmetic propagates missing; nulls:true ignores it") {
    val strictAdd = c("""{"add": ["a", "b"]}""")
    lawHolds(when(col("a").isNull || col("b").isNull, strictAdd.isNull).otherwise(lit(true)),
      "strict add missing")
    val lenientAdd = c("""{"add": ["a", "b"], "nulls": true}""")
    lawHolds(when(col("a").isNull && col("b").isNull, lenientAdd.isNull)
      .when(col("a").isNull, lenientAdd === col("b"))
      .when(col("b").isNull, lenientAdd === col("a"))
      .otherwise(lenientAdd === col("a") + col("b")), "nulls:true add")
    val dflt = c("""{"add": ["a", "b"], "default": {"literal": -99.0}}""")
    lawHolds(when(col("a").isNull || col("b").isNull, dflt === lit(-99.0)).otherwise(lit(true)),
      "default on missing")
  }

  test("division by zero or missing → missing (or default)") {
    val div = c("""{"div": ["a", "b"]}""")
    lawHolds(when(col("b") === 0.0 || col("b").isNull || col("a").isNull, div.isNull)
      .otherwise(lit(true)), "div/0 missing")
    val divD = c("""{"div": ["a", "b"], "default": {"literal": 7.0}}""")
    lawHolds(when(col("b") === 0.0 || col("b").isNull || col("a").isNull, divD === lit(7.0))
      .otherwise(divD === col("a") / col("b")), "div/0 default")
  }

  test("scalar min/max/coalesce ignore missing; all-missing → missing") {
    val mx = c("""{"max": ["a", "b"]}""")
    lawHolds(when(col("a").isNull && col("b").isNull, mx.isNull)
      .when(col("a").isNull, mx === col("b"))
      .when(col("b").isNull, mx === col("a"))
      .otherwise(mx === greatest(col("a"), col("b"))), "max ignores missing")
    val co = c("""{"coalesce": ["a", "b"]}""")
    lawHolds(when(col("a").isNotNull, co === col("a"))
      .when(col("b").isNotNull, co === col("b"))
      .otherwise(co.isNull), "coalesce first non-missing")
  }

  test("sort places nulls least in both directions") {
    val df = values.toDF("v")
    val asc = df.orderBy(JxCompiler.compile(JxExpr.Variable("v"), ctx).asc_nulls_first)
      .as[Option[Double]].collect()
    assert(asc.head.isEmpty && asc.tail.forall(_.nonEmpty))
    val desc = df.orderBy(JxCompiler.compile(JxExpr.Variable("v"), ctx).desc_nulls_last)
      .as[Option[Double]].collect()
    assert(desc.last.isEmpty && desc.init.forall(_.nonEmpty))
    assert(asc.flatten.toSeq === asc.flatten.sorted.toSeq)
  }
}

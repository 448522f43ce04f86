package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.jx.{JxExpr, JxCompiler}

/** JX null-semantics laws (SURVEY §1.2: decisive equality, missing algebra).
  * These are the single biggest divergence from vanilla SQL — property-style
  * checks over a small table containing nulls in every column. */
class NullSemanticsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  import scala.jdk.CollectionConverters._

  lazy val df = spark.createDataFrame(
    Seq(
      Row(java.lang.Long.valueOf(1L), "a", java.lang.Double.valueOf(1.5)),
      Row(java.lang.Long.valueOf(2L), null, java.lang.Double.valueOf(0.0)),
      Row(null, "b", null),
      Row(null, null, java.lang.Double.valueOf(-3.0))
    ).asJava,
    StructType(Seq(
      StructField("x", LongType), StructField("s", StringType), StructField("d", DoubleType))))

  def eval(json: String): Seq[Any] = {
    val e = JxExpr.parseJson(json)
    df.select(JxCompiler.compile(e).as("r")).collect().map(_.get(0)).toSeq
  }

  test("eq is decisive: missing==missing is TRUE, missing==value is FALSE") {
    assert(eval("""{"eq": ["s", {"null": {}}]}""") === Seq(false, true, false, true))
    assert(eval("""{"eq": {"s": "a"}}""") === Seq(true, false, false, false))
  }

  test("ne = not(eq), never missing") {
    assert(eval("""{"ne": {"s": "a"}}""") === Seq(false, true, true, true))
  }

  test("inequality with missing operand is FALSE, not null") {
    assert(eval("""{"gt": {"x": 0}}""") === Seq(true, true, false, false))
    assert(eval("""{"lte": {"x": 100}}""") === Seq(true, true, false, false))
  }

  test("boolean context treats missing as FALSE (and/or/not)") {
    assert(eval("""{"and": [{"gt": {"x": 0}}, {"eq": {"s": "a"}}]}""") === Seq(true, false, false, false))
    assert(eval("""{"or": [{"missing": "x"}, {"eq": {"s": "a"}}]}""") === Seq(true, false, true, true))
    assert(eval("""{"not": {"gt": {"x": 0}}}""") === Seq(false, false, true, true))
  }

  test("strict arithmetic: any missing -> missing; default replaces") {
    assert(eval("""{"add": ["x", "d"]}""") === Seq(2.5, 2.0, null, null))
    assert(eval("""{"add": ["x", "d"], "default": -1}""") === Seq(2.5, 2.0, -1.0, -1.0))
  }

  test("nulls:true arithmetic ignores missing; all-missing -> default") {
    assert(eval("""{"add": ["x", "d"], "nulls": true}""") === Seq(2.5, 2.0, null, -3.0))
    assert(eval("""{"add": [{"null":{}}, {"null":{}}], "nulls": true, "default": 9}""")
      === Seq(9L, 9L, 9L, 9L))
  }

  test("division by zero -> missing (or default)") {
    assert(eval("""{"div": ["x", "d"]}""") === Seq(1 / 1.5, null, null, null))
    assert(eval("""{"div": ["x", "d"], "default": 0}""") === Seq(1 / 1.5, 0.0, 0.0, 0.0))
  }

  test("scalar max/min ignore missing; coalesce picks first non-missing") {
    assert(eval("""{"max": ["x", "d"]}""") === Seq(1.5, 2.0, null, -3.0))
    assert(eval("""{"min": ["x", "d"]}""") === Seq(1.0, 0.0, null, -3.0))
    assert(eval("""{"coalesce": ["s", {"literal": "z"}]}""") === Seq("a", "z", "b", "z"))
  }

  test("count counts non-missing terms") {
    assert(eval("""{"count": ["x", "s", "d"]}""") === Seq(3L, 2L, 1L, 1L))
  }

  test("prefix with missing prefix is TRUE; missing value is FALSE") {
    assert(eval("""{"prefix": ["s", {"null": {}}]}""") === Seq(true, true, true, true))
    assert(eval("""{"prefix": {"s": "a"}}""") === Seq(true, false, false, false))
  }

  test("concat skips missing operands; all-missing -> default") {
    assert(eval("""{"concat": ["s", "s"], "separator": "-"}""") === Seq("a-a", null, "b-b", null))
    assert(eval("""{"concat": ["s"], "default": "none"}""") === Seq("a", "none", "b", "none"))
  }

  test("when with missing condition takes else branch") {
    assert(eval("""{"when": {"gt": {"x": 0}}, "then": 1, "else": 2}""") === Seq(1, 1, 2, 2))
  }

  test("operator with a non-option sibling key is rejected, not silently partial") {
    // {"s": "a", "count": 5}: `count` is an operator name, so the old
    // first-op-wins parse DROPPED the s=="a" predicate and returned a
    // constant — every row passed (review r9). Ambiguity must be loud.
    val ex = intercept[IllegalArgumentException] {
      JxExpr.parseJson("""{"s": "a", "count": 5}""")
    }
    assert(ex.getMessage.contains("ambiguous"))
    // op + recognized OPTION sibling still parses (the reference form)
    assert(eval("""{"concat": ["s"], "default": "none"}""") === Seq("a", "none", "b", "none"))
    // pure simple-form conjunction still works
    assert(eval("""{"s": "a", "x": 1}""") === Seq(true, false, false, false))
  }

  test("in array form: a bare value list is the literal set, not a tuple") {
    // {"in": [expr, [v...]]} used to parse the list as TupleOp →
    // struct(...) → array_contains crash at run time (review r9)
    assert(eval("""{"in": ["x", [1, 3]]}""") === Seq(true, false, false, false))
    assert(eval("""{"in": ["s", ["a", "b"]]}""") === Seq(true, false, true, false))
  }
}

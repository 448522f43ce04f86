package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.jx.{JxCompiler, JxFuzz, JxSql}

/**
 * Differential expression-fuzz entries (VERDICT r9 #3): four seeded
 * blocks of 125 generated JxExpr trees each, evaluated per row over a
 * mixed-null domain sliced from `lineitem`, one output column per
 * tree. The oracle is [[JxSql]]'s DuckDB rendering of the SAME trees —
 * so the driver's gate hash-compares 500 compiler outputs against a
 * second engine's evaluation of the same JX semantics, row by row.
 * JxFuzzSpec runs the identical trees through the Spark dialect in
 * the suite (compiler ≡ translation inside one engine); together the
 * two legs close the triangle compiler ≡ translation ≡ DuckDB.
 *
 * The domain (deterministic, no RNG): a ~2k-row lineitem slice with
 * every column nulled on a different modulus, so null × null, null ×
 * value, and value × value compositions all occur, plus a multi-char
 * string column for the substring/find/regex families. 100-TB note:
 * these are correctness fixtures — the expression path they exercise
 * is the same codegen'd Column algebra every real entry compiles to.
 */
object FuzzCatalog {
  type Q = (SparkSession, String) => DataFrame

  /** (name, seed, #cases) per block — 4 × 125 = 500 gate cases. */
  val blocks: Seq[(String, Long, Int)] = Seq(
    ("q_fuzz_expr_b1", 1001L, 125),
    ("q_fuzz_expr_b2", 2002L, 125),
    ("q_fuzz_expr_b3", 3003L, 125),
    ("q_fuzz_expr_b4", 4004L, 125))

  /** Spark side of the domain. Must stay value-identical to
    * [[domainSql]] — both derive the same columns from the same
    * parquet with the same null moduli. */
  def domainDf(s: SparkSession, dir: String): DataFrame =
    SparkEntry.loader(s, dir)("lineitem")
      .where(col("l_orderkey") < 500)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
        when(col("l_linenumber") % 3 === 0, lit(null))
          .otherwise(col("l_quantity")).as("num1"),
        when(col("l_partkey") % 4 === 0, lit(null))
          .otherwise(col("l_extendedprice")).as("num2"),
        when(col("l_suppkey") % 5 === 0, lit(null))
          .otherwise(col("l_partkey") % 100).as("int1"),
        when(col("l_orderkey") % 13 === 0, lit(null))
          .otherwise(col("l_orderkey") % 997).as("int2"),
        when(col("l_orderkey") % 7 === 0, lit(null))
          .otherwise(col("l_returnflag")).as("str1"),
        when(col("l_linenumber") % 2 === 0, lit(null))
          .otherwise(concat(col("l_returnflag"), col("l_linestatus"),
            lit("_"), col("l_linenumber").cast("string"))).as("str2"),
        when(col("l_orderkey") % 11 === 0, lit(null))
          .otherwise(col("l_quantity") > 25).as("bool1"))

  /** DuckDB side of the domain (the oracle CTE body). */
  val domainSql: String = """
    SELECT l_orderkey * 10 + l_linenumber AS k,
           CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS num1,
           CASE WHEN l_partkey % 4 = 0 THEN NULL ELSE l_extendedprice END AS num2,
           CASE WHEN l_suppkey % 5 = 0 THEN NULL ELSE l_partkey % 100 END AS int1,
           CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_orderkey % 997 END AS int2,
           CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_returnflag END AS str1,
           CASE WHEN l_linenumber % 2 = 0 THEN NULL
                ELSE l_returnflag || l_linestatus || '_' || CAST(l_linenumber AS VARCHAR) END AS str2,
           CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_quantity > 25 END AS bool1
    FROM lineitem WHERE l_orderkey < 500"""

  /** Output normalization, mirrored on both sides: numeric results to
    * CAST AS DOUBLE (the driver's comparator is dtype-KIND-sensitive —
    * int vs float — and value-compares floats at 10 significant
    * digits, which absorbs engine-boundary FP like pow's 1-ulp
    * license), integers to BIGINT, bool/string as-is. Deliberately NO
    * decimal pre-rounding: ROUND(x, 6) re-introduces the decimal-.5
    * boundary where Spark (exact-binary-value HALF_UP) and DuckDB
    * (multiply-then-round) legitimately disagree — the fuzzer's first
    * run caught exactly that on -0.0021875. */
  private[graft] def normCol(c: Column, ty: JxFuzz.Ty): Column = ty match {
    case JxFuzz.TNum => c.cast("double")
    case JxFuzz.TInt => c.cast("long")
    case _           => c
  }
  private[graft] def normSql(s: String, ty: JxFuzz.Ty): String = ty match {
    case JxFuzz.TNum => s"CAST($s AS DOUBLE)"
    case JxFuzz.TInt => s"CAST($s AS BIGINT)"
    case _           => s
  }

  private def entry(seed: Long, n: Int): Q = (s, dir) => {
    val cs = JxFuzz.cases(seed, n)
    domainDf(s, dir).select(
      col("k") +: cs.map(c =>
        normCol(JxCompiler.compile(c.expr), ty = c.ty).as(c.name)): _*)
  }

  private def oracle(seed: Long, n: Int): String = {
    val cs = JxFuzz.cases(seed, n)
    val cols = cs.map(c => s"${normSql(JxSql.sql(c.expr, JxSql.DuckDb), c.ty)} AS ${c.name}")
    s"WITH t AS ($domainSql)\nSELECT k, ${cols.mkString(",\n  ")} FROM t"
  }

  /** The same block, rendered through the Spark dialect — the suite's
    * differential leg (`FROM <view>` is caller-supplied). */
  private[graft] def sparkSql(seed: Long, n: Int, view: String): String = {
    val cs = JxFuzz.cases(seed, n)
    val cols = cs.map(c => s"${normSql(JxSql.sql(c.expr, JxSql.SparkSql), c.ty)} AS ${c.name}")
    s"SELECT k, ${cols.mkString(",\n  ")} FROM $view"
  }

  def queries: Map[String, Q] =
    blocks.map { case (name, seed, n) => name -> entry(seed, n) }.toMap

  def oracles: Map[String, String] =
    blocks.map { case (name, seed, n) => name -> oracle(seed, n) }.toMap
}

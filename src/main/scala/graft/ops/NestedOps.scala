package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.jx.{JxExpr, JxCompiler}

/**
 * Operations over nested-document columns — the Spark-first replacement for
 * the reference's `drill_filter` (vendor/jx_python/jx.py:672-941), which
 * pushes predicates *into* nested arrays.
 *
 * Instead of the reference's explode-evaluate-regroup walk, these compile to
 * array higher-order functions (`filter`, `exists`, `transform`) that run
 * inside the row — no shuffle, no explode, codegen-friendly.
 */
object NestedOps {

  /** Ctx that resolves JX variables against a lambda element (array member). */
  def elementCtx(x: Column): JxCompiler.Ctx =
    JxCompiler.Ctx(resolveVar = {
      case "." => x
      case name => name.split('.').foldLeft(x)(_.getField(_))
    })

  /** Keep only array members matching the JX predicate. */
  def drillFilter(df: DataFrame, arrayCol: String, predJson: String): DataFrame = {
    val pred = JxExpr.parseJson(predJson)
    df.withColumn(arrayCol,
      filter(col(arrayCol), x => JxCompiler.truthy(pred, elementCtx(x))))
  }

  /** True when any array member matches the JX predicate. */
  def existsIn(arrayCol: String, predJson: String): Column = {
    val pred = JxExpr.parseJson(predJson)
    coalesce(exists(col(arrayCol), x => JxCompiler.truthy(pred, elementCtx(x))), lit(false))
  }

  /** Sum a JX expression over array members (missing members contribute 0). */
  def sumOver(arrayCol: String, valueJson: String): Column = {
    val v = JxExpr.parseJson(valueJson)
    aggregate(coalesce(col(arrayCol), array()), lit(0.0),
      (acc, x) => acc + coalesce(JxCompiler.compile(v, elementCtx(x)).cast("double"), lit(0.0)))
  }
}

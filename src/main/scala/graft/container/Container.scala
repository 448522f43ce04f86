package graft.container

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.jx.{Formats, JxCompiler, JxExpr, JxQuery, QueryRunner}

/**
 * The reference's Container interface (vendor/jx_base/container.py:
 * 48-147): anything queryable via `query/filter/sort/select/window/
 * groupby/format`. Implementations: [[ListContainer]] (local rows) and
 * [[FactStore]] (mutable parquet-snapshot store).
 */
trait Container {
  def name: String
  def dataFrame: DataFrame
  def spark: SparkSession

  /** Run a JX JSON query against this container ("from" is implied). */
  def query(json: String): DataFrame = {
    val q = JxQuery.parse(json)
    QueryRunner.run(spark, q.copy(from = rewriteFrom(q.from)), load)
  }

  /** Query returning the reference's format envelope (list/table/cube).
    * `format:"container"` has a non-String result — use [[queryContainer]]. */
  def queryFormatted(json: String): String = {
    val q = JxQuery.parse(json)
    if (q.format == "container")
      throw new IllegalArgumentException("format:\"container\" returns a store — use queryContainer")
    Formats.run(spark, q.copy(from = rewriteFrom(q.from)), load)
  }

  /** `format:"container"`: materialize the query result as a NEW queryable
    * [[FactStore]] and return it (reference jx_sqlite/query_table.py:
    * 97-100 — a query result becomes a first-class table). */
  def queryContainer(json: String, dir: Path, newName: String): FactStore = {
    val q = JxQuery.parse(json)
    val result = QueryRunner.run(spark, q.copy(from = rewriteFrom(q.from)), load)
    new FactStore(spark, newName, dir).insert(result)
  }

  private def rewriteFrom(from: String): String =
    if (from == "." || from.isEmpty) name
    else if (from.startsWith(name)) from
    else s"$name.$from" // "orders.lineitems" relative to this container

  protected def load: String => DataFrame =
    n => if (n == name) dataFrame else spark.read.parquet(n)
}

/** In-memory rows as a container (reference ListContainer,
  * vendor/jx_python/containers/list_usingPythonList.py:34-45). */
class ListContainer(val spark: SparkSession, val name: String, df: DataFrame) extends Container {
  def dataFrame: DataFrame = df
}

/**
 * Mutable document store over versioned parquet snapshots — the
 * reference's QueryTable insert/update/upsert/delete surface
 * (vendor/jx_sqlite/insert_table.py:40-370, query_table.py:45-47)
 * without an external table format: each mutation writes snapshot
 * `v{n}` and atomically advances a `_CURRENT` marker (readers pin the
 * snapshot they started from — the same copy-on-write contract Delta/
 * Iceberg formalize; swap in Delta MERGE on a real deployment for
 * row-level conflict handling).
 *
 * Schema evolution on insert = unionByName(allowMissingColumns): new
 * fields widen the schema, missing fields null-pad (the reference's
 * ALTER TABLE ADD COLUMN, insert_table.py:255-299), and a column seen
 * as scalar on one side and array-of-the-same-type on the other is
 * migrated by promoting the scalar side to 1-element arrays — the
 * reference's nest migration (snowflake.py:117-202).
 */
class FactStore(val spark: SparkSession, val name: String, dir: Path) extends Container {

  private def marker = dir.resolve("_CURRENT")

  private def currentVersion: Int =
    if (Files.exists(marker)) Files.readString(marker).trim.toInt else 0

  def dataFrame: DataFrame = {
    val v = currentVersion
    require(v > 0, s"FactStore $name is empty — insert first")
    spark.read.parquet(dir.resolve(s"v$v").toString)
  }

  def isEmpty: Boolean = currentVersion == 0

  private def writeSnapshot(df: DataFrame): Unit = {
    val next = currentVersion + 1
    df.write.mode("overwrite").parquet(dir.resolve(s"v$next").toString)
    val tmp = dir.resolve("_CURRENT.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, marker, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def insert(docs: DataFrame): this.type = {
    val merged =
      if (isEmpty) docs
      else {
        val (cur, inc) = migrateNesting(dataFrame, docs)
        cur.unionByName(inc, allowMissingColumns = true)
      }
    writeSnapshot(merged)
    this
  }

  /** Scalar→array nest migration (reference snowflake.py:117-202): when a
    * column is T on one side and ARRAY&lt;T&gt; on the other, the scalar
    * side is promoted to a 1-element array (null stays null, matching the
    * reference's "missing value never becomes [null]"). Numeric columns
    * seen at different widths widen to the larger type (int → long →
    * double) — the Spark-typed stand-in for the reference's multi-typed
    * columns when the types are order-compatible (SURVEY §1.2). */
  private def migrateNesting(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case ByteType => 0; case ShortType => 1; case IntegerType => 2
      case LongType => 3; case FloatType => 4; case DoubleType => 5
      case _ => -1
    }
    var (x, y) = (a, b)
    val bTypes = b.schema.fields.map(f => f.name -> f.dataType).toMap
    for (fa <- a.schema.fields; bt <- bTypes.get(fa.name)) (fa.dataType, bt) match {
      case (at, bt2) if at == bt2 => ()
      case (at, ArrayType(et, _)) if at == et =>
        x = x.withColumn(fa.name, when(col(fa.name).isNotNull, array(col(fa.name))))
      case (ArrayType(et, _), vt) if vt == et =>
        y = y.withColumn(fa.name, when(col(fa.name).isNotNull, array(col(fa.name))))
      case (at, bt2) if rank(at) >= 0 && rank(bt2) >= 0 =>
        // an integral type meeting a fractional one widens to DOUBLE:
        // float cannot hold every int/long (24-bit mantissa), so
        // integral->float would silently round large values
        val fractional = Set[DataType](FloatType, DoubleType)
        val wide =
          if (fractional(at) != fractional(bt2)) DoubleType
          else if (rank(at) >= rank(bt2)) at else bt2
        if (at != wide) x = x.withColumn(fa.name, col(fa.name).cast(wide))
        if (bt2 != wide) y = y.withColumn(fa.name, col(fa.name).cast(wide))
      case _ => ()
    }
    (x, y)
  }

  /** Rows matching the JX where are rewritten with `set` columns
    * (each a JX expression evaluated against the old row). Deep (nested
    * array) updates are rejected, like the reference
    * (insert_table.py:40-196). */
  def update(whereJson: String, set: Map[String, String]): this.type = {
    val df = dataFrame
    val pred = JxCompiler.truthy(JxExpr.parseJson(whereJson), ctx(df))
    set.keys.find(_.contains(".")).foreach { k =>
      throw new IllegalArgumentException(s"deep update not supported: $k")
    }
    val updated = set.foldLeft(df) { case (d, (colName, exprJson)) =>
      d.withColumn(colName,
        when(pred, JxCompiler.compile(JxExpr.parseJson(exprJson), ctx(df)))
          .otherwise(col(colName)))
    }
    writeSnapshot(updated)
    this
  }

  def delete(whereJson: String): this.type = {
    val df = dataFrame
    val pred = JxCompiler.truthy(JxExpr.parseJson(whereJson), ctx(df))
    writeSnapshot(df.filter(!pred))
    this
  }

  /** upsert = delete-matching-keys + insert (reference
    * query_table.py:45-47). */
  def upsert(docs: DataFrame, key: String): this.type = {
    if (isEmpty) insert(docs)
    else {
      val (cur, inc) = migrateNesting(dataFrame, docs)
      val keep = cur.join(inc.select(col(key)), Seq(key), "left_anti")
      writeSnapshot(keep.unionByName(inc, allowMissingColumns = true))
      this
    }
  }

  private def ctx(df: DataFrame): JxCompiler.Ctx =
    JxCompiler.Ctx(resolveVar = n =>
      if (n == ".") struct(df.columns.map(col).toIndexedSeq: _*) else col(n))
}

package graft.etl

import java.sql.Connection
import scala.collection.mutable

/**
 * FK-graph discovery over JDBC metadata → [[SnowflakePlan]], reproducing
 * the reference's snowflake schema walk (mysql_to_s3/snowflake_schema.py:
 * 288-513): breadth-first over foreign-key relations from a chosen fact
 * table; many-to-one constraints become inner-object lookups, one-to-many
 * become nested child arrays; `exclude` prunes the walk, `referenceOnly`
 * inlines a single label column instead of the whole object
 * (snowflake_schema.py:382-392), `addRelations` supplies FK edges the
 * database doesn't declare (README.md add_relations).
 *
 * Cycle safety: each constraint is followed at most once
 * (done_relations, snowflake_schema.py:309-314,421-423).
 *
 * The walk is driver-side metadata-only (one JDBC connection); the data
 * path stays fully distributed — each discovered table is a Spark JDBC
 * read and [[DocAssembler]] joins them.
 */
object SchemaWalk {

  /** One FK edge: fkTable.fkColumn → pkTable.pkColumn. */
  case class Relation(name: String, fkTable: String, fkColumn: String,
                      pkTable: String, pkColumn: String)

  case class WalkConfig(
      factTable: String,
      /** tables never followed (reference `exclude`) */
      exclude: Set[String] = Set.empty,
      /** table → label column inlined instead of the nested object
        * (reference `reference_only: ["table.column"]`) */
      referenceOnly: Map[String, String] = Map.empty,
      /** full object but NO nested children at or below these tables
        * (reference `reference_only: ["table"]` → no_nested_docs,
        * snowflake_schema.py:297-298) */
      referenceAll: Set[String] = Set.empty,
      /** undeclared FK edges to merge in (reference `add_relations`) */
      addRelations: Seq[Relation] = Nil,
      showForeignKeys: Boolean = true,
      nullValues: Seq[String] = Nil)

  /** All single-column FK relations visible in the connection's schema. */
  def discoverRelations(conn: Connection): Seq[Relation] = {
    val md = conn.getMetaData
    val tables = mutable.ArrayBuffer[String]()
    val rs = md.getTables(null, null, "%", Array("TABLE"))
    while (rs.next()) tables += rs.getString("TABLE_NAME")
    rs.close()
    tables.toSeq.flatMap { t =>
      val fks = md.getImportedKeys(null, null, t)
      val out = mutable.ArrayBuffer[Relation]()
      while (fks.next()) {
        if (fks.getShort("KEY_SEQ") == 1)
          out += Relation(
            Option(fks.getString("FK_NAME")).getOrElse(s"${t}_fk${out.size}").toLowerCase,
            fks.getString("FKTABLE_NAME").toLowerCase,
            fks.getString("FKCOLUMN_NAME").toLowerCase,
            fks.getString("PKTABLE_NAME").toLowerCase,
            fks.getString("PKCOLUMN_NAME").toLowerCase)
        else () // composite FKs: first column only (reference elects one unique key)
      }
      fks.close()
      out.toSeq
    }
  }

  /** Unique-key election: primary key, else the most-referenced column,
    * else "id" (reference snowflake_schema.py:143-175: primary >
    * referenced > shortest). */
  def electKey(conn: Connection, table: String, relations: Seq[Relation]): String = {
    val md = conn.getMetaData
    // identifier-case folding differs by engine: Derby folds unquoted
    // names to UPPER, MySQL on Linux preserves the created case
    // (typically lower, lower_case_table_names=0) — probe the name
    // as-given then both foldings, first hit wins
    def pkOf(name: String): Option[String] = {
      val pks = md.getPrimaryKeys(null, null, name)
      var pk: Option[String] = None
      while (pks.next()) if (pks.getShort("KEY_SEQ") == 1) pk = Some(pks.getString("COLUMN_NAME").toLowerCase)
      pks.close()
      pk
    }
    val pk = Seq(table, table.toUpperCase, table.toLowerCase).distinct
      .view.flatMap(pkOf).headOption
    pk.orElse(
      relations.filter(_.pkTable == table).groupBy(_.pkColumn)
        .toSeq.sortBy(-_._2.size).headOption.map(_._1))
      .getOrElse("id")
  }

  /** Lookup alias: FK column with id/key suffix stripped
    * (reference snowflake_schema.py:330-339), else the parent table name. */
  def lookupAlias(fkColumn: String, pkTable: String): String = {
    val stripped = fkColumn.replaceAll("(?i)[._]?(id|key)$", "")
    if (stripped.isEmpty) pkTable else stripped
  }

  def walk(conn: Connection, cfg: WalkConfig): SnowflakePlan = {
    val relations = discoverRelations(conn) ++ cfg.addRelations

    // `done` is PER-PATH (each branch gets a copy): an edge may appear
    // under several arms (inner1 under both fact.about and nested2.about)
    // but never twice along one path — exactly the reference's
    // copy(done_relations) in every todo.append (snowflake_schema.py:
    // 408-414,487-493)
    def build(table: String, done: Set[String], noNestedDocs: Boolean): SnowflakePlan = {
      val key = electKey(conn, table, relations)
      val nn = noNestedDocs || cfg.referenceAll(table)
      val followable = relations.filterNot(r => done(r.name))
      val lookupRels = followable.filter(r => r.fkTable == table && !cfg.exclude(r.pkTable))
      val childRels =
        if (nn) Nil
        else followable.filter(r => r.pkTable == table && !cfg.exclude(r.fkTable))
      val claimed = done ++ lookupRels.map(_.name) ++ childRels.map(_.name)
      val lookups = lookupRels.map(r =>
        Lookup(r.fkColumn, lookupAlias(r.fkColumn, r.pkTable), build(r.pkTable, claimed, nn)))
      val children = childRels.map(r =>
        Child(r.fkColumn, r.fkTable, build(r.fkTable, claimed, nn)))
      SnowflakePlan(table, key, lookups, children,
        referenceOnly = cfg.referenceOnly.get(table),
        showForeignKeys = cfg.showForeignKeys,
        nullValues = if (table == cfg.factTable) cfg.nullValues else Nil)
    }

    build(cfg.factTable, Set.empty, noNestedDocs = false)
  }

  /** Spark JDBC table loader with lower-cased column names (Derby/MySQL
    * metadata case-fold differently; docs use lower-case names).
    *
    * `keyOf` maps a table to its elected numeric key (see [[electKey]] /
    * [[planKeys]]); when it yields one, the read is SPLIT across
    * `numPartitions` parallel connections via partitionColumn bounds — the
    * Spark-native equivalent of the reference's keyset-paginated cursor
    * (mysql_to_s3/extract.py:156-183). Without this every table arrives
    * through ONE connection on ONE task, the ingest-side scale killer.
    * Bounds come from one tiny MIN/MAX query per table; tables whose key
    * isn't numeric (or that are empty) fall back to a single partition.
    *
    * MYSQL URL PARAMS for reference-faithful ingest (Connector/J;
    * deploy/mysql documents a runnable harness):
    *  - `zeroDateTimeBehavior=convertToNull` — legacy zero dates
    *    ('0000-00-00') load as NULL, matching the reference driver's
    *    None, instead of aborting the read;
    *  - `tinyInt1isBit=false` — tinyint(1) arrives as a NUMBER, the
    *    reference's mysql_type_to_json_type mapping (pyLibrary/sql/
    *    mysql.py:759 "tinyint": "number"), not Connector/J's default
    *    BIT→boolean reinterpretation.
    * UNSIGNED BIGINT columns load as DECIMAL(20,0) via Spark's own
    * MySQL dialect; as partition keys they fall back to a single
    * partition when the range exceeds Long (see [[numericBounds]]). */
  def jdbcLoader(spark: org.apache.spark.sql.SparkSession, url: String,
                 keyOf: String => Option[String] = _ => None,
                 numPartitions: Int = 1): String => org.apache.spark.sql.DataFrame =
    name => {
      val base = spark.read.format("jdbc").option("url", url).option("dbtable", name)
      val reader = (if (numPartitions > 1) keyOf(name) else None)
        .flatMap(k => numericBounds(url, name, k)) match {
          case Some((k, lo, hi)) if hi > lo =>
            base.option("partitionColumn", k)
              .option("lowerBound", lo).option("upperBound", hi)
              .option("numPartitions", numPartitions)
          case _ => base
        }
      val df = reader.load()
      df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
    }

  /** table → elected key for every table in an assembled plan. */
  def planKeys(plan: SnowflakePlan): Map[String, String] =
    Map(plan.table -> plan.key) ++
      plan.lookups.flatMap(l => planKeys(l.plan)) ++
      plan.children.flatMap(c => planKeys(c.plan))

  /** MIN/MAX of a numeric key — the partition bounds (None when the key
    * is non-numeric, the table is empty, or the probe fails). The column's
    * declared JDBC type gates the probe: drivers like MySQL happily
    * coerce numeric-looking VARCHARs through getLong, but Spark's JDBC
    * source rejects a string partitionColumn at load time. */
  private def numericBounds(url: String, table: String, key: String): Option[(String, Long, Long)] =
    try {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        import java.sql.Types._
        // floating keys are legal partition columns too — integer bounds
        // merely bracket the stride ranges (edge partitions are unbounded)
        val numericTypes = Set(TINYINT, SMALLINT, INTEGER, BIGINT, NUMERIC, DECIMAL,
          FLOAT, DOUBLE, REAL)
        val meta = conn.createStatement()
          .executeQuery(s"SELECT $key FROM $table WHERE 1=0").getMetaData
        if (!numericTypes.contains(meta.getColumnType(1))) None
        else {
          val rs = conn.createStatement().executeQuery(s"SELECT MIN($key), MAX($key) FROM $table")
          val out =
            if (rs.next()) {
              // BigDecimal, not getLong: an UNSIGNED BIGINT key (MySQL)
              // ranges past Long.MaxValue, where getLong silently wraps
              // on some drivers — longValueExact throws instead, and the
              // catch below falls back to the single-partition read
              val lo = rs.getBigDecimal(1)
              if (lo == null) None
              else Some((key,
                lo.setScale(0, java.math.RoundingMode.FLOOR).longValueExact,
                rs.getBigDecimal(2).setScale(0, java.math.RoundingMode.CEILING).longValueExact))
            } else None
          rs.close()
          out
        }
      } finally conn.close()
    } catch { case _: java.sql.SQLException | _: ArithmeticException => None }
}

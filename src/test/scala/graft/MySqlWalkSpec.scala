package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NullType}
import org.scalatest.funsuite.AnyFunSuite
import graft.etl._
import graft.etl.SchemaWalk.WalkConfig

/** SchemaWalk + jdbcLoader against a REAL MySQL — the reference's
  * first-class backend (mysql_to_s3/snowflake_schema.py:70-211,
  * pyLibrary/sql/mysql.py). Gated on GRAFT_MYSQL_URL: without it (or
  * without Connector/J on the extra classpath) every test CANCELS, so
  * sandbox builds stay green; `deploy/mysql` documents the runnable
  * docker-compose harness whose seed this spec asserts.
  *
  * What only real MySQL can check (vs the Derby golden tests):
  * preserved lower-case identifiers, UNSIGNED BIGINT past signed-Long
  * range, tinyint(1) under tinyInt1isBit=false, and legacy zero dates
  * under zeroDateTimeBehavior=convertToNull. */
class MySqlWalkSpec extends AnyFunSuite {

  private val urlOpt = sys.env.get("GRAFT_MYSQL_URL")

  private def live: String = {
    assume(urlOpt.isDefined, "GRAFT_MYSQL_URL not set — see deploy/mysql/README.md")
    val url = urlOpt.get
    val ok = try { DriverManager.getConnection(url).close(); true }
      catch { case e: Exception =>
        info(s"MySQL not reachable: ${e.getMessage}"); false }
    assume(ok, "MySQL not reachable / driver jar missing from ./lib")
    url
  }

  lazy val spark = GraftSession.get("4")

  test("walk discovers the seeded FK graph with preserved-case identifiers") {
    val url = live
    val conn = DriverManager.getConnection(url)
    try {
      val rels = SchemaWalk.discoverRelations(conn)
      assert(rels.exists(r => r.fkTable == "customer" && r.fkColumn == "c_nationkey"
        && r.pkTable == "nation" && r.pkColumn == "n_nationkey"))
      assert(rels.exists(r => r.fkTable == "orders" && r.fkColumn == "o_custkey"
        && r.pkTable == "customer" && r.pkColumn == "c_custkey"))
      // PK election must hit MySQL's preserved (lower) case — the
      // Derby-era upper-case-only probe returned the "id" fallback here
      assert(SchemaWalk.electKey(conn, "customer", rels) == "c_custkey")
      val plan = SchemaWalk.walk(conn, WalkConfig("customer",
        referenceOnly = Map("nation" -> "n_name")))
      assert(plan.key == "c_custkey")
      assert(plan.children.map(_.plan.table) == Seq("orders"))
      assert(plan.lookups.map(_.plan.table) == Seq("nation"))
    } finally conn.close()
  }

  test("jdbcLoader maps the MySQL quirk types the reference meets") {
    val url = live
    val load = SchemaWalk.jdbcLoader(spark, url)
    val cust = load("customer")
    // UNSIGNED BIGINT → DECIMAL(20,0) (Spark MySQL dialect), value past
    // signed-Long range survives exactly
    assert(cust.schema("c_custkey").dataType == DecimalType(20, 0))
    val big = cust.where(col("c_name") === "bob")
      .select(col("c_custkey").cast("string")).head().getString(0)
    assert(big == "18446744073709551614")
    // tinyint(1) stays a NUMBER (tinyInt1isBit=false), matching the
    // reference's "tinyint": "number" mapping
    assert(cust.schema("c_active").dataType != org.apache.spark.sql.types.BooleanType)
    assert(cust.where(col("c_name") === "bob").select(col("c_active").cast("int"))
      .head().getInt(0) == 0)
    // zero dates arrive as NULL (zeroDateTimeBehavior=convertToNull),
    // the reference driver's None — not an aborted read
    assert(cust.where(col("c_name") === "bob").select(col("c_since")).head().isNullAt(0))
    assert(load("orders").where(col("o_orderkey") === 11)
      .select(col("o_orderdate")).head().isNullAt(0))
    assert(cust.schema("c_since").dataType != NullType)
  }

  test("partition-bound probe declines an unsigned key past Long range") {
    val url = live
    // c_custkey's MAX exceeds Long.MaxValue: the MIN/MAX probe must fall
    // back to the single-partition read, never wrap negative bounds
    val load = SchemaWalk.jdbcLoader(spark, url,
      keyOf = t => if (t == "customer") Some("c_custkey") else None,
      numPartitions = 4)
    assert(load("customer").rdd.getNumPartitions == 1)
    // …while the signed-BIGINT orders key still splits
    val load2 = SchemaWalk.jdbcLoader(spark, url,
      keyOf = t => if (t == "orders") Some("o_orderkey") else None,
      numPartitions = 2)
    assert(load2("orders").rdd.getNumPartitions == 2)
  }

  test("full assembly over MySQL matches the seeded snowflake") {
    val url = live
    val conn = DriverManager.getConnection(url)
    val plan = try SchemaWalk.walk(conn, WalkConfig("customer",
      referenceOnly = Map("nation" -> "n_name"))) finally conn.close()
    val docs = DocAssembler.assemble(plan, SchemaWalk.jdbcLoader(spark, url))
    assert(docs.count() == 2)
    val alice = docs.where(col("c_name") === "alice")
    assert(alice.select(size(col("orders"))).head().getInt(0) == 1)
  }
}

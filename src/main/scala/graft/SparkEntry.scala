package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.jx.{JxQuery, QueryRunner}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry runs a JX JSON query (or a graft ops API call)
  * through the engine; `oracleSql` holds the equivalent DuckDB SQL over the
  * same parquet tables for the driver's hash compare.
  */
object SparkEntry {

  def loader(spark: SparkSession, dir: String): String => DataFrame =
    name => spark.read.parquet(s"$dir/$name.parquet")

  /** Run a JX JSON query against the parquet tables in `dir`. */
  def jx(json: String): (SparkSession, String) => DataFrame =
    (spark, dir) => QueryRunner.run(spark, JxQuery.parse(json), loader(spark, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- groupby + aggregate surface (SURVEY §2.4) ---
    "q_groupby_agg" -> jx("""{
      "from": "lineitem",
      "groupby": ["l_returnflag", "l_linestatus"],
      "select": [
        {"name": "sum_qty",  "value": "l_quantity", "aggregate": "sum"},
        {"name": "avg_price","value": "l_extendedprice", "aggregate": "average"},
        {"name": "min_disc", "value": "l_discount", "aggregate": "minimum"},
        {"name": "max_tax",  "value": "l_tax", "aggregate": "maximum"},
        {"name": "n",        "value": ".", "aggregate": "count"}
      ]
    }"""),

    // --- setop: where + sort + select + limit (SURVEY §2.2/§2.6) ---
    "q_setop_filter_sort" -> jx("""{
      "from": "orders",
      "select": [
        {"name": "o_orderkey", "value": "o_orderkey"},
        {"name": "o_totalprice", "value": "o_totalprice"},
        {"name": "o_orderpriority", "value": "o_orderpriority"}
      ],
      "where": {"and": [
        {"gt": {"o_totalprice": 100000}},
        {"eq": {"o_orderstatus": "F"}}
      ]},
      "sort": [{"value": "o_totalprice", "sort": -1}, "o_orderkey"],
      "limit": 100
    }""")
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  min(l_discount) AS min_disc,
        |  max(l_tax) AS max_tax,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_setop_filter_sort" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'F'
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.jx.{JxQuery, QueryRunner}

/**
 * The SURVEY §2 operator inventory as runnable (JX query, DuckDB oracle)
 * pairs. Every entry exercises the graft engine (JSON → JxQuery →
 * QueryRunner → DataFrame); the oracle expresses identical semantics in
 * DuckDB SQL over the same parquet tables.
 *
 * Column names are aligned on both sides (the driver's compare sorts
 * columns by name before hashing). Row order is made deterministic with
 * total sorts on unique keys.
 */
object QueryCatalog {

  type Q = (SparkSession, String) => DataFrame

  def jx(json: String): Q =
    (spark, dir) => QueryRunner.run(spark, JxQuery.parse(json), SparkEntry.loader(spark, dir))

  /** A raw (non-JX) catalog entry. */
  def raw(f: Q): Q = f

  /** Post-process an entry's DataFrame (driver-compare representation fixes). */
  def post(q: Q)(f: DataFrame => DataFrame): Q = (spark, dir) => f(q(spark, dir))

  /** name → (query, optional oracle) */
  val catalog: Map[String, (Q, Option[String])] = Map(

    // =====================================================================
    // §2.4 groupby + aggregates
    // =====================================================================
    "q_groupby_agg" -> (jx("""{
      "from": "lineitem",
      "groupby": ["l_returnflag", "l_linestatus"],
      "select": [
        {"name": "sum_qty",  "value": "l_quantity", "aggregate": "sum"},
        {"name": "avg_price","value": "l_extendedprice", "aggregate": "average"},
        {"name": "min_disc", "value": "l_discount", "aggregate": "minimum"},
        {"name": "max_tax",  "value": "l_tax", "aggregate": "maximum"},
        {"name": "n",        "value": ".", "aggregate": "count"}
      ]
    }"""), Some("""
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty, avg(l_extendedprice) AS avg_price,
        min(l_discount) AS min_disc, max(l_tax) AS max_tax, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    "q_groupby_expr_key" -> (jx("""{
      "from": "orders",
      "groupby": [{"name": "bucket", "value": {"floor": ["o_totalprice", 50000]}}],
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "total", "value": "o_totalprice", "aggregate": "sum"}
      ]
    }"""), Some("""
      SELECT CAST(floor(o_totalprice/50000)*50000 AS BIGINT) AS bucket,
             count(*) AS n, sum(o_totalprice) AS total
      FROM orders GROUP BY 1 ORDER BY 1""")),

    "q_agg_conditional" -> (jx("""{
      "from": "orders",
      "groupby": ["o_orderstatus"],
      "select": [
        {"name": "n_urgent", "value": {"when": {"eq": {"o_orderpriority": "1-URGENT"}}, "then": 1, "else": 0}, "aggregate": "sum"},
        {"name": "n", "value": ".", "aggregate": "count"}
      ]
    }"""), Some("""
      SELECT o_orderstatus,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // `statuses` (a set-valued `union` aggregate) is emitted as a joined
    // string: the driver's pandas compare cannot sort/hash array columns.
    "q_agg_distinct" -> (post(jx("""{
      "from": "lineitem",
      "groupby": ["l_returnflag"],
      "select": [
        {"name": "n_status", "value": "l_linestatus", "aggregate": "cardinality"},
        {"name": "statuses", "value": "l_linestatus", "aggregate": "union"},
        {"name": "n_parts", "value": "l_partkey", "aggregate": "cardinality"}
      ]
    }"""))(df => df.withColumn("statuses", org.apache.spark.sql.functions.concat_ws(",", org.apache.spark.sql.functions.col("statuses")))), Some("""
      SELECT l_returnflag,
             count(DISTINCT l_linestatus) AS n_status,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
             count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q_agg_stats" -> (jx("""{
      "from": "lineitem",
      "groupby": ["l_linestatus"],
      "select": [
        {"name": "cnt", "value": "l_quantity", "aggregate": "count"},
        {"name": "total", "value": "l_quantity", "aggregate": "sum"},
        {"name": "mean", "value": "l_quantity", "aggregate": "average"},
        {"name": "variance", "value": "l_quantity", "aggregate": "var"},
        {"name": "stdev", "value": "l_quantity", "aggregate": "std"},
        {"name": "sos", "value": {"mul": ["l_quantity", "l_quantity"]}, "aggregate": "sum"}
      ]
    }"""), Some("""
      SELECT l_linestatus, count(l_quantity) AS cnt, sum(l_quantity) AS total,
             avg(l_quantity) AS mean, var_pop(l_quantity) AS variance,
             stddev_pop(l_quantity) AS stdev, sum(l_quantity*l_quantity) AS sos
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    "q_agg_percentile" -> (jx("""{
      "from": "lineitem",
      "groupby": ["l_returnflag"],
      "select": [
        {"name": "med_qty", "value": "l_quantity", "aggregate": "median"},
        {"name": "p90_price", "value": "l_extendedprice", "aggregate": "percentile", "percentile": 0.9}
      ]
    }"""), Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS med_qty,
             quantile_cont(l_extendedprice, 0.9) AS p90_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q_agg_scalar" -> (jx("""{
      "from": "lineitem",
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "n_parts", "value": "l_partkey", "aggregate": "cardinality"},
        {"name": "total_qty", "value": "l_quantity", "aggregate": "sum"},
        {"name": "max_ship", "value": "l_shipdate", "aggregate": "maximum"}
      ]
    }"""), Some("""
      SELECT count(*) AS n, count(DISTINCT l_partkey) AS n_parts,
             sum(l_quantity) AS total_qty, max(l_shipdate) AS max_ship
      FROM lineitem""")),

    // =====================================================================
    // §2.4 edges: dense cubes over domains
    // =====================================================================
    "q_edges_set" -> (jx("""{
      "from": "orders",
      "edges": [{
        "name": "priority", "value": "o_orderpriority", "allowNulls": true,
        "domain": {"type": "set", "partitions": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", "9-PHANTOM"]}
      }],
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "revenue", "value": "o_totalprice", "aggregate": "sum"}
      ]
    }"""), Some("""
      WITH dom(i, priority) AS (VALUES (0,'1-URGENT'),(1,'2-HIGH'),(2,'3-MEDIUM'),(3,'4-NOT SPECIFIED'),(4,'5-LOW'),(5,'9-PHANTOM')),
      agg AS (SELECT o_orderpriority p, count(*) n, sum(o_totalprice) rev FROM orders GROUP BY 1)
      SELECT dom.priority, CAST(coalesce(agg.n, 0) AS BIGINT) AS n, agg.rev AS revenue
      FROM dom LEFT JOIN agg ON dom.priority = agg.p
      UNION ALL
      SELECT NULL, CAST(coalesce(sum(n), 0) AS BIGINT), sum(rev) FROM agg
        WHERE p IS NULL OR p NOT IN (SELECT priority FROM dom)
      ORDER BY priority NULLS LAST""")),

    "q_edges_time_month" -> (jx("""{
      "from": "orders",
      "edges": [{
        "name": "month", "value": "o_orderdate", "allowNulls": true,
        "domain": {"type": "time", "min": "1995-01-01", "max": "1996-01-01", "interval": "month"}
      }],
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "revenue", "value": "o_totalprice", "aggregate": "sum"}
      ]
    }"""), Some("""
      WITH dom AS (SELECT generate_series AS m, CAST(row_number() OVER () - 1 AS INT) i
                   FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-12-01', INTERVAL 1 MONTH)),
      agg AS (SELECT date_trunc('month', o_orderdate) m, count(*) n, sum(o_totalprice) rev
              FROM orders WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01' GROUP BY 1)
      SELECT dom.m AS month, coalesce(agg.n, 0) AS n, agg.rev AS revenue
      FROM dom LEFT JOIN agg USING (m)
      UNION ALL
      SELECT NULL, count(*), sum(o_totalprice) FROM orders
        WHERE o_orderdate IS NULL OR o_orderdate < '1995-01-01' OR o_orderdate >= '1996-01-01'
      ORDER BY month NULLS LAST""")),

    "q_edges_time_week" -> (jx("""{
      "from": "events",
      "edges": [{
        "name": "week", "value": "ts", "allowNulls": false,
        "domain": {"type": "time", "min": "2024-01-01", "max": "2024-02-05", "interval": "week"}
      }],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH dom AS (SELECT generate_series AS w FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-04', INTERVAL 7 DAY)),
      agg AS (SELECT TIMESTAMP '2024-01-01' + INTERVAL (7*floor(date_diff('second', TIMESTAMP '2024-01-01', ts)/604800.0)) DAY AS w, count(*) n
              FROM events WHERE ts >= '2024-01-01' AND ts < '2024-02-05' GROUP BY 1)
      SELECT dom.w AS week, coalesce(agg.n, 0) AS n
      FROM dom LEFT JOIN agg USING (w) ORDER BY week""")),

    "q_edges_range" -> (jx("""{
      "from": "lineitem",
      "edges": [{
        "name": "qty_bucket", "value": "l_quantity", "allowNulls": true,
        "domain": {"type": "range", "min": 1, "max": 51, "interval": 10}
      }],
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "avg_price", "value": "l_extendedprice", "aggregate": "average"}
      ]
    }"""), Some("""
      WITH dom AS (SELECT CAST(generate_series AS DOUBLE) lo, CAST(row_number() OVER () - 1 AS INT) i
                   FROM generate_series(1, 41, 10)),
      agg AS (SELECT 1 + 10*floor((l_quantity - 1)/10) lo, count(*) n, avg(l_extendedprice) ap
              FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 51 GROUP BY 1)
      SELECT dom.lo AS qty_bucket, coalesce(agg.n, 0) AS n, agg.ap AS avg_price
      FROM dom LEFT JOIN agg USING (lo)
      UNION ALL
      SELECT NULL, count(*), avg(l_extendedprice) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity >= 51
      HAVING count(*) >= 0
      ORDER BY qty_bucket NULLS LAST""")),

    "q_edges_duration" -> (jx("""{
      "from": "events",
      "edges": [{
        "name": "dur_bucket", "value": "value", "allowNulls": true,
        "domain": {"type": "duration", "min": 0, "max": "5minute", "interval": "1minute"}
      }],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH dom AS (SELECT CAST(generate_series AS DOUBLE) lo,
                          CAST(row_number() OVER () - 1 AS INT) i
                   FROM generate_series(0, 240, 60)),
      agg AS (SELECT 60*floor(value/60) lo, count(*) n
              FROM events WHERE value >= 0 AND value < 300 GROUP BY 1)
      SELECT dur_bucket, n FROM (
        SELECT dom.lo AS dur_bucket, coalesce(agg.n, 0) AS n, dom.i AS ord
        FROM dom LEFT JOIN agg USING (lo)
        UNION ALL
        SELECT NULL, count(*), 99 FROM events
          WHERE value IS NULL OR value < 0 OR value >= 300
      ) ORDER BY ord""")),

    "q_edges_default_topk" -> (jx("""{
      "from": "events",
      "edges": [{
        "name": "etype", "value": "event_type", "allowNulls": true,
        "domain": {"type": "default", "limit": 3}
      }],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH topk AS (SELECT event_type v, count(*) n, CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) - 1 AS INT) i
                    FROM events WHERE event_type IS NOT NULL GROUP BY 1
                    ORDER BY count(*) DESC, event_type LIMIT 3)
      SELECT etype, n FROM (
        SELECT v AS etype, n, i AS ord FROM topk
        UNION ALL
        SELECT NULL, count(*), 99 FROM events
          WHERE event_type IS NULL OR event_type NOT IN (SELECT v FROM topk)
      ) ORDER BY ord""")),

    "q_edges_2d" -> (jx("""{
      "from": "lineitem",
      "edges": [
        {"name": "flag", "value": "l_returnflag", "allowNulls": false,
         "domain": {"type": "set", "partitions": ["A", "N", "R"]}},
        {"name": "qty_bucket", "value": "l_quantity", "allowNulls": false,
         "domain": {"type": "range", "min": 1, "max": 51, "interval": 25}}
      ],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH flags(fi, flag) AS (VALUES (0,'A'),(1,'N'),(2,'R')),
      buckets AS (SELECT CAST(generate_series AS DOUBLE) lo, CAST(row_number() OVER () - 1 AS INT) bi
                  FROM generate_series(1, 26, 25)),
      agg AS (SELECT l_returnflag f, 1 + 25*floor((l_quantity-1)/25) lo, count(*) n
              FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 51 GROUP BY 1, 2)
      SELECT flags.flag, buckets.lo AS qty_bucket, coalesce(agg.n, 0) AS n
      FROM flags CROSS JOIN buckets LEFT JOIN agg ON agg.f = flags.flag AND agg.lo = buckets.lo
      ORDER BY flags.fi, buckets.bi""")),

    "q_edges_where_parts" -> (jx("""{
      "from": "orders",
      "edges": [{
        "name": "size", "allowNulls": true,
        "domain": {"type": "set", "partitions": [
          {"name": "small",  "where": {"lt": {"o_totalprice": 50000}}},
          {"name": "medium", "where": {"and": [{"gte": {"o_totalprice": 50000}}, {"lt": {"o_totalprice": 200000}}]}},
          {"name": "large",  "where": {"gte": {"o_totalprice": 200000}}}
        ]}
      }],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH dom(i, size) AS (VALUES (0,'small'),(1,'medium'),(2,'large')),
      agg AS (SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                          WHEN o_totalprice >= 50000 AND o_totalprice < 200000 THEN 'medium'
                          WHEN o_totalprice >= 200000 THEN 'large' END s, count(*) n
              FROM orders GROUP BY 1)
      SELECT size, CAST(n AS BIGINT) AS n FROM (
        SELECT dom.size, coalesce(agg.n, 0) AS n, dom.i AS ord
        FROM dom LEFT JOIN agg ON dom.size = agg.s
        UNION ALL SELECT NULL, coalesce(sum(n), 0), 99 FROM agg WHERE s IS NULL
      ) ORDER BY ord""")),

    "q_edges_interval_overlap" -> (jx("""{
      "from": "lineitem",
      "edges": [{
        "name": "span", "allowNulls": false,
        "range": {"min": "l_quantity", "max": {"add": ["l_quantity", 15]}},
        "domain": {"type": "range", "min": 1, "max": 51, "interval": 10}
      }],
      "select": [{"name": "n", "value": ".", "aggregate": "count"}]
    }"""), Some("""
      WITH dom AS (SELECT CAST(generate_series AS DOUBLE) lo, CAST(generate_series + 10 AS DOUBLE) hi,
                          CAST(row_number() OVER () - 1 AS INT) i
                   FROM generate_series(1, 41, 10))
      SELECT dom.lo AS span, count(l.l_orderkey) AS n
      FROM dom LEFT JOIN lineitem l ON l.l_quantity < dom.hi AND l.l_quantity + 15 > dom.lo
      GROUP BY dom.lo, dom.i ORDER BY dom.i""")),

    // =====================================================================
    // §2.2/§2.6 setop pipeline: filter, sort, select, limit
    // =====================================================================
    // cross-type sort over typed slots (jx.py:614-627 fixed type order
    // boolean < number < string < missing-last; variant values encoded as
    // the reference's {b,n,s} typed slots, typed_encoder.py:18-23). The
    // sort key is a lexicographic struct — ordinary codegen'd sort, no
    // UDF comparator — and the oracle restates the rank + slot order.
    "q_sort_cross_type" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 4
      // CODEGEN SURFACE (VERDICT r7 #1b): the type dispatch is applied
      // ONCE, to the per-branch SORT KEYS — sortKey composed with each
      // concrete constructor constant-folds (getField-of-struct), so no
      // branch is re-expanded per key field, and the encoded value
      // column is never built (the output b/n/s ARE key fields).
      val k =
        when(m === 0, TypedSlots.sortKey(TypedSlots.ofBoolean(col("value") > 50)))
          .when(m === 1, TypedSlots.sortKey(TypedSlots.ofNumber(col("value"))))
          .when(m === 2, TypedSlots.sortKey(TypedSlots.ofString(col("event_type"))))
          .otherwise(TypedSlots.sortKey(TypedSlots.missing))
      // global rank WITHOUT a single-partition window: the cross-type key
      // is an ordinary sortable struct, so the distributed prefix-sum rank
      // (range partition + broadcast offsets) applies directly
      val keyed = e.select(col("event_id"), k.as("__k"))
        .withColumn("__g", lit(0L))
      graft.ops.Batching.rankWithinScaled(keyed, "__g", Seq(col("__k"), col("event_id")), out = "pos0")
        .select((col("pos0") + 1L).as("pos"), col("event_id"),
          col("__k.b").as("b"), col("__k.n").as("n"), col("__k.s").as("s"))
    }), Some("""
      WITH m AS (
        SELECT event_id,
          CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS b,
          CASE WHEN event_id % 4 = 1 THEN value END AS n,
          CASE WHEN event_id % 4 = 2 THEN event_type END AS s
        FROM events),
      r AS (
        SELECT event_id, b, n, s,
          CASE WHEN b IS NOT NULL THEN 0 WHEN n IS NOT NULL THEN 1
               WHEN s IS NOT NULL THEN 2 ELSE 3 END AS tr
        FROM m)
      SELECT CAST(row_number() OVER (ORDER BY tr, b, n, s, event_id) AS BIGINT) AS pos,
             event_id, CAST(b AS INT) AS b, n, s
      FROM r ORDER BY pos""")),

    // NESTED cross-type sort — the full TYPE_ORDER (jx.py:614-627):
    // bool < number < string < LIST < OBJECT < missing. Lists compare
    // elementwise then by length (zip + len, jx.py:570-583); objects walk
    // the sorted key union with absent keys reading missing-sorts-last
    // (jx.py:596-604) — encoded per-row via the entry-list sentinel
    // (TypedSlots.ObjSentinel), so the whole order is ONE sortable struct.
    // Planted: floor(value) collides on purpose so list-length and
    // object-key-presence comparisons actually decide.
    "q_sort_cross_type_nested" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 6
      val half = (col("event_id") / 6).cast("long") % 2 === 0
      val fv = floor(col("value")).cast("double")
      val nElem = (x: org.apache.spark.sql.Column) => struct(
        lit(null).cast("boolean").as("b"), x.cast("double").as("n"),
        lit(null).cast("string").as("s"))
      val sElem = (x: org.apache.spark.sql.Column) => struct(
        lit(null).cast("boolean").as("b"), lit(null).cast("double").as("n"),
        x.cast("string").as("s"))
      // CODEGEN SURFACE (VERDICT r7 #1b): sortKeyNested is composed with
      // each concrete branch CONSTRUCTOR, so every branch key
      // constant-folds (getField-of-struct → the field expression,
      // nvRank → a literal) and the type-dispatch when-chain appears
      // exactly once. The r7 shape keyed the full when-chain ENCODING
      // and re-expanded it per key field — enough generated code that
      // its cold run queued ~23 s of C2 work that drained into
      // neighboring bench entries. The output rank is the key's own
      // leading field, so the encoded value column is never built.
      val key = (nv: org.apache.spark.sql.Column) => TypedSlots.sortKeyNested(nv)
      val k =
        when(m === 0, key(TypedSlots.nvOfScalar(TypedSlots.ofBoolean(col("value") > 50))))
          .when(m === 1, key(TypedSlots.nvOfScalar(TypedSlots.ofNumber(col("value")))))
          .when(m === 2, key(TypedSlots.nvOfScalar(TypedSlots.ofString(col("event_type")))))
          .when(m === 3, key(TypedSlots.nvOfList(
            when(half, array(nElem(fv)))
              .otherwise(array(nElem(fv), nElem(floor(col("value")) % 7))))))
          .when(m === 4, key(TypedSlots.nvOfObject(
            when(half, array(struct(lit("a").as("k"), nElem(fv).as("v"))))
              .otherwise(array(
                struct(lit("a").as("k"), nElem(fv).as("v")),
                struct(lit("b").as("k"), sElem(col("event_type")).as("v")))))))
          .otherwise(key(TypedSlots.nvMissing))
      val keyed = e.select(col("event_id"), k.as("__k"))
        .withColumn("__g", lit(0L))
      graft.ops.Batching.rankWithinScaled(keyed, "__g", Seq(col("__k"), col("event_id")), out = "pos0")
        .select((col("pos0") + 1L).as("pos"), col("event_id"),
          col("__k.tr").cast("int").as("tr"))
    }), Some("""
      WITH m AS (
        SELECT event_id, event_id % 6 AS m, (event_id // 6) % 2 = 0 AS half,
               value, event_type, floor(value) AS fv
        FROM events),
      r AS (
        SELECT event_id,
          CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2
                 WHEN 3 THEN 3 WHEN 4 THEN 4 ELSE 9 END AS tr,
          CASE WHEN m = 0 THEN (value > 50) END AS b,
          CASE WHEN m = 1 THEN value END AS n,
          CASE WHEN m = 2 THEN event_type END AS s,
          CASE WHEN m = 3 THEN (CASE WHEN half THEN [fv]
               ELSE [fv, CAST(CAST(fv AS BIGINT) % 7 AS DOUBLE)] END) END AS lst,
          CASE WHEN m = 4 THEN fv END AS oa,
          CASE WHEN m = 4 THEN (CASE WHEN half THEN 1 ELSE 0 END) END AS ob_pres,
          CASE WHEN m = 4 AND NOT half THEN event_type END AS ob
        FROM m)
      SELECT CAST(row_number() OVER (
               ORDER BY tr, b, n, s, lst, oa, ob_pres, ob, event_id) AS BIGINT) AS pos,
             event_id, CAST(tr AS INT) AS tr
      FROM r ORDER BY pos""")),

    // DEPTH-2 cross-type sort (TypedSlots.sortKeyNested2): lists of
    // lists, lists of objects, and an object holding a list — the
    // reference's recursive value_compare one level deeper than
    // q_sort_cross_type_nested. The oracle flattens each deterministic
    // shape into natively-comparable DuckDB columns: lists compare
    // elementwise-then-by-length in both engines, the first element's
    // TYPE_ORDER rank (l_er) separates the three list families, and the
    // absent-key-sorts-last object law becomes the o_b_pres column.
    "q_sort_cross_type_nested2" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 7
      val half = (col("event_id") / 7).cast("long") % 2 === 0
      val fv = floor(col("value")).cast("double")
      val fv7 = (floor(col("value")) % 7).cast("double")
      val nElem = (x: Column) => struct(
        lit(null).cast("boolean").as("b"), x.cast("double").as("n"),
        lit(null).cast("string").as("s"))
      val n1 = (x: Column) => TypedSlots.nvOfScalar(TypedSlots.ofNumber(x))
      val nList = (xs: Seq[Column]) => TypedSlots.nvOfList(array(xs.map(nElem): _*))
      val nObj = (kvs: Seq[(String, Column)]) => TypedSlots.nvOfObject(
        array(kvs.map { case (k, x) =>
          struct(lit(k).as("k"), nElem(x).as("v")) }: _*))
      val sV = (x: Column) => TypedSlots.nvOfScalar(TypedSlots.ofString(x))
      // CODEGEN SURFACE (VERDICT r8 #3, same treatment as
      // q_sort_cross_type_nested3): build the depth-2 VALUE with the
      // 7-way when-chain, bind it to an attribute in its own
      // projection, and apply sortKeyNested2 ONCE — one generic key
      // expansion instead of seven per-branch ones. CollapseProject
      // keeps the stage split because the key builder references the
      // bound attribute more than once.
      val nv =
        when(m === 0, TypedSlots.nv2OfScalar(TypedSlots.ofNumber(col("value"))))
          .when(m === 1, TypedSlots.nv2OfScalar(TypedSlots.ofString(col("event_type"))))
          .when(m === 2, TypedSlots.nv2OfList( // list of number scalars
            when(half, array(n1(fv))).otherwise(array(n1(fv), n1(fv7)))))
          .when(m === 3, TypedSlots.nv2OfList( // list of LISTS
            when(half, array(nList(Seq(fv))))
              .otherwise(array(nList(Seq(fv)), nList(Seq(fv, fv7))))))
          .when(m === 4, TypedSlots.nv2OfList( // list of OBJECTS
            when(half, array(nObj(Seq("a" -> fv))))
              .otherwise(array(nObj(Seq("a" -> fv)), nObj(Seq("a" -> fv7))))))
          .when(m === 5, TypedSlots.nv2OfObject( // object holding a LIST (+ string)
            when(half, array(struct(lit("a").as("k"), nList(Seq(fv)).as("v"))))
              .otherwise(array(
                struct(lit("a").as("k"), nList(Seq(fv)).as("v")),
                struct(lit("b").as("k"), sV(col("event_type")).as("v"))))))
          .otherwise(TypedSlots.nv2Missing)
      // SORT by the memcomparable byte key (the nested3 treatment —
      // GenerateOrdering over the depth-2 struct comparator was ~14 s
      // of cold JIT); sortKeyNested2's order is law-pinned equal in
      // JsonSortKeySpec, and the depth-1/scalar entries keep the
      // struct-key sort as the driver-checked surface of that design
      val keyed = e.select(col("event_id"), nv.as("__nv"))
        .select(col("event_id"),
          graft.functions.JsonMemKey.nvSortKey(col("__nv")).as("__k"))
        .withColumn("__g", lit(0L))
      val tr = graft.functions.JsonMemKey.typeRank(col("__k"))
      graft.ops.Batching.rankWithinScaled(keyed, "__g", Seq(col("__k"), col("event_id")), out = "pos0")
        .select((col("pos0") + 1L).as("pos"), col("event_id"), tr.as("tr"))
    }), Some("""
      WITH m AS (
        SELECT event_id, event_id % 7 AS m, (event_id // 7) % 2 = 0 AS half,
               value, event_type, floor(value) AS fv,
               CAST(CAST(floor(value) AS BIGINT) % 7 AS DOUBLE) AS fv7
        FROM events),
      r AS (
        SELECT event_id,
          CASE m WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 3
                 WHEN 4 THEN 3 WHEN 5 THEN 4 ELSE 9 END AS tr,
          CASE WHEN m = 0 THEN value END AS n,
          CASE WHEN m = 1 THEN event_type END AS s,
          CASE WHEN m = 2 THEN 1 WHEN m = 3 THEN 3 WHEN m = 4 THEN 4 END AS l_er,
          CASE WHEN m = 2 THEN (CASE WHEN half THEN [fv] ELSE [fv, fv7] END) END AS l_n,
          CASE WHEN m = 3 THEN (CASE WHEN half THEN [[fv]] ELSE [[fv], [fv, fv7]] END) END AS l_ll,
          CASE WHEN m = 4 THEN (CASE WHEN half THEN [fv] ELSE [fv, fv7] END) END AS l_lo,
          CASE WHEN m = 5 THEN [fv] END AS o_a,
          CASE WHEN m = 5 THEN (CASE WHEN half THEN 1 ELSE 0 END) END AS o_b_pres,
          CASE WHEN m = 5 AND NOT half THEN event_type END AS o_b
        FROM m)
      SELECT CAST(row_number() OVER (
               ORDER BY tr, n, s, l_er, l_n, l_ll, l_lo, o_a, o_b_pres, o_b, event_id) AS BIGINT) AS pos,
             event_id, CAST(tr AS INT) AS tr
      FROM r ORDER BY pos""")),

    // DEPTH-3 cross-type sort (TypedSlots.sortKeyNested3): lists of
    // lists OF LISTS, lists of objects-holding-lists, and an object
    // holding a list of lists — the reference's recursive value_compare
    // one level beyond q_sort_cross_type_nested2 (r7's documented
    // depth-2 boundary, moved to depth 3). Same per-branch key
    // composition (codegen surface), same oracle-flattening strategy:
    // each deterministic shape becomes a natively-comparable DuckDB
    // column (nested DOUBLE[][]/[][][] lists compare elementwise-then-
    // by-length in both engines; l_er = first element's TYPE_ORDER rank
    // separates the three list families; o_b_pres restates the
    // absent-key-sorts-last law).
    "q_sort_cross_type_nested3" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 7
      val half = (col("event_id") / 7).cast("long") % 2 === 0
      val fv = floor(col("value")).cast("double")
      val fv7 = (floor(col("value")) % 7).cast("double")
      val nElem = (x: Column) => struct(
        lit(null).cast("boolean").as("b"), x.cast("double").as("n"),
        lit(null).cast("string").as("s"))
      // depth-1 list of numbers; depth-2 wrappers over it
      val l1 = (xs: Seq[Column]) => TypedSlots.nvOfList(array(xs.map(nElem): _*))
      val n2 = (x: Column) => TypedSlots.nv2OfScalar(TypedSlots.ofNumber(x))
      val l2of = (ls: Seq[Seq[Column]]) => TypedSlots.nv2OfList(array(ls.map(l1): _*))
      val o2list = (kvs: Seq[(String, Seq[Column])]) => TypedSlots.nv2OfObject(
        array(kvs.map { case (k, xs) =>
          struct(lit(k).as("k"), l1(xs).as("v")) }: _*))
      val s2 = (x: Column) => TypedSlots.nv2OfScalar(TypedSlots.ofString(x))
      // CODEGEN SURFACE (VERDICT r8 #3, closed in two steps): r9 first
      // bound the 7-way value when-chain to its own attribute and
      // applied sortKeyNested3 once (down from 7 expansions / 34 s of
      // r8 cold JIT), then replaced the STRUCT sort key with the
      // memcomparable BYTE key (functions/JsonMemKey.scala nvSortKey):
      // a JIT probe attributed ~34 s of residual compile mass to
      // GenerateOrdering recursing through the depth-3 struct
      // comparator — a binary column needs no generated comparator at
      // all. The struct sortKeyNested3 path stays law-pinned:
      // JsonSortKeySpec asserts byte order == struct-key order on this
      // exact domain, and the depth-1/2 struct tiers keep their own
      // oracle entries.
      val nv =
        when(m === 0, TypedSlots.nv3OfScalar(TypedSlots.ofNumber(col("value"))))
          .when(m === 1, TypedSlots.nv3OfScalar(TypedSlots.ofString(col("event_type"))))
          .when(m === 2, TypedSlots.nv3OfList( // list of number scalars
            when(half, array(n2(fv))).otherwise(array(n2(fv), n2(fv7)))))
          .when(m === 3, TypedSlots.nv3OfList( // list of LISTS of LISTS
            when(half, array(l2of(Seq(Seq(fv)))))
              .otherwise(array(l2of(Seq(Seq(fv))), l2of(Seq(Seq(fv), Seq(fv, fv7)))))))
          .when(m === 4, TypedSlots.nv3OfList( // list of OBJECTS holding lists
            when(half, array(o2list(Seq("a" -> Seq(fv)))))
              .otherwise(array(o2list(Seq("a" -> Seq(fv))), o2list(Seq("a" -> Seq(fv, fv7)))))))
          .when(m === 5, TypedSlots.nv3OfObject( // object holding a list of lists (+ string)
            when(half, array(struct(lit("a").as("k"), l2of(Seq(Seq(fv))).as("v"))))
              .otherwise(array(
                struct(lit("a").as("k"), l2of(Seq(Seq(fv), Seq(fv7))).as("v")),
                struct(lit("b").as("k"), s2(col("event_type")).as("v"))))))
          .otherwise(TypedSlots.nv3Missing)
      val keyed = e.select(col("event_id"), nv.as("__nv"))
        .select(col("event_id"),
          graft.functions.JsonMemKey.nvSortKey(col("__nv")).as("__k"))
        .withColumn("__g", lit(0L))
      // first byte of the key IS the type tag (the nested4 convention)
      val tr = graft.functions.JsonMemKey.typeRank(col("__k"))
      graft.ops.Batching.rankWithinScaled(keyed, "__g", Seq(col("__k"), col("event_id")), out = "pos0")
        .select((col("pos0") + 1L).as("pos"), col("event_id"), tr.as("tr"))
    }), Some("""
      WITH m AS (
        SELECT event_id, event_id % 7 AS m, (event_id // 7) % 2 = 0 AS half,
               value, event_type, floor(value) AS fv,
               CAST(CAST(floor(value) AS BIGINT) % 7 AS DOUBLE) AS fv7
        FROM events),
      r AS (
        SELECT event_id,
          CASE m WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 3
                 WHEN 4 THEN 3 WHEN 5 THEN 4 ELSE 9 END AS tr,
          CASE WHEN m = 0 THEN value END AS n,
          CASE WHEN m = 1 THEN event_type END AS s,
          CASE WHEN m = 2 THEN 1 WHEN m = 3 THEN 3 WHEN m = 4 THEN 4 END AS l_er,
          CASE WHEN m = 2 THEN (CASE WHEN half THEN [fv] ELSE [fv, fv7] END) END AS l_n,
          CASE WHEN m = 3 THEN (CASE WHEN half THEN [[[fv]]]
               ELSE [[[fv]], [[fv], [fv, fv7]]] END) END AS l_lll,
          CASE WHEN m = 4 THEN (CASE WHEN half THEN [[fv]] ELSE [[fv], [fv, fv7]] END) END AS l_lo,
          CASE WHEN m = 5 THEN (CASE WHEN half THEN [[fv]] ELSE [[fv], [fv7]] END) END AS o_a,
          CASE WHEN m = 5 THEN (CASE WHEN half THEN 1 ELSE 0 END) END AS o_b_pres,
          CASE WHEN m = 5 AND NOT half THEN event_type END AS o_b
        FROM m)
      SELECT CAST(row_number() OVER (
               ORDER BY tr, n, s, l_er, l_n, l_lll, l_lo, o_a, o_b_pres, o_b, event_id) AS BIGINT) AS pos,
             event_id, CAST(tr AS INT) AS tr
      FROM r ORDER BY pos""")),

    // DEPTH-4 cross-type sort via the UNBOUNDED tier
    // (functions/JsonMemKey.scala): the same recursive value_compare
    // (jx.py:560-627) one level beyond q_sort_cross_type_nested3, but
    // the key is the memcomparable BYTE encoding of the JSON value —
    // one static call per row, constant codegen mass at ANY depth (the
    // per-depth struct-key construction stops at 3; this tier removes
    // the boundary). The sort itself is a plain BINARY column:
    // Tungsten byte comparison, range-partitionable. Values are built
    // as JSON text (numbers round-trip exactly; the spliced string is
    // backslash/quote-escaped below). INPUT CONTRACT shared with the
    // nested2/3 entries: `value` and `event_type` are non-null in the
    // generated tables — a NULL value would null the whole concat and
    // sort as missing (tr 9) while the oracle keeps the row at its
    // type rank with a NULL sort column. Oracle: the nested2/3
    // flattening strategy — each deterministic shape becomes
    // natively-comparable DuckDB columns, one bracket deeper.
    "q_sort_cross_type_nested4" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.functions.JsonMemKey
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 7
      val half = (col("event_id") / 7).cast("long") % 2 === 0
      val fv = floor(col("value")).cast("long").cast("string")
      val fv7 = (floor(col("value")) % 7).cast("long").cast("string")
      // JSON-escape the spliced string via jsonQuote (review finding —
      // an event_type containing a quote/backslash would otherwise
      // reclassify the whole value via the bare-string fallback and
      // diverge from the oracle, which sorts the raw column). Control
      // characters remain a data contract (the table is alphanumeric),
      // shared with the nested2/3 entries' typed-slot path.
      val etJson = JsonMemKey.jsonQuote(col("event_type"))
      val js =
        when(m === 0, col("value").cast("string"))
          .when(m === 1, etJson)
          .when(m === 2, // list of numbers
            when(half, concat(lit("["), fv, lit("]")))
              .otherwise(concat(lit("["), fv, lit(","), fv7, lit("]"))))
          .when(m === 3, // list of lists of LISTS OF LISTS (depth 4)
            when(half, concat(lit("[[[["), fv, lit("]]]]")))
              .otherwise(concat(lit("[[[["), fv, lit("]]],[[["), fv,
                lit("]],[["), fv, lit("],["), fv7, lit("]]]]"))))
          .when(m === 4, // list of OBJECTS holding lists of lists (depth 4)
            when(half, concat(lit("""[{"a":[["""), fv, lit("]]}]")))
              .otherwise(concat(lit("""[{"a":[["""), fv, lit("""]]},{"a":[["""), fv,
                lit("""]],"b":[["""), fv7, lit("]]}]"))))
          .when(m === 5, // object holding a list of lists of lists (+string)
            when(half, concat(lit("""{"a":[[["""), fv, lit("]]]}")))
              .otherwise(concat(lit("""{"a":[[["""), fv, lit("],["), fv7,
                lit("""]]],"b":"""), etJson, lit("}"))))
          .otherwise(lit("null"))
      val keyed = e.select(col("event_id"), JsonMemKey.jsonSortKey(js).as("__k"))
        .withColumn("__g", lit(0L))
      // the key's FIRST byte is the TYPE tag — surfacing the rank from
      // the encoding itself (the struct tiers surface __k.tr the same way)
      val tr = graft.functions.JsonMemKey.typeRank(col("__k"))
      graft.ops.Batching.rankWithinScaled(keyed, "__g", Seq(col("__k"), col("event_id")), out = "pos0")
        .select((col("pos0") + 1L).as("pos"), col("event_id"), tr.as("tr"))
    }), Some("""
      WITH m AS (
        SELECT event_id, event_id % 7 AS m, (event_id // 7) % 2 = 0 AS half,
               value, event_type, CAST(floor(value) AS DOUBLE) AS fv,
               CAST(CAST(floor(value) AS BIGINT) % 7 AS DOUBLE) AS fv7
        FROM events),
      r AS (
        SELECT event_id,
          CASE m WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 3
                 WHEN 4 THEN 3 WHEN 5 THEN 4 ELSE 9 END AS tr,
          CASE WHEN m = 0 THEN value END AS n,
          CASE WHEN m = 1 THEN event_type END AS s,
          CASE WHEN m = 2 THEN 1 WHEN m = 3 THEN 3 WHEN m = 4 THEN 4 END AS l_er,
          CASE WHEN m = 2 THEN (CASE WHEN half THEN [fv] ELSE [fv, fv7] END) END AS l_n,
          CASE WHEN m = 3 THEN (CASE WHEN half THEN [[[[fv]]]]
               ELSE [[[[fv]]], [[[fv]], [[fv], [fv7]]]] END) END AS l_llll,
          CASE WHEN m = 4 THEN [fv] END AS l4_a,
          CASE WHEN m = 4 THEN (CASE WHEN half THEN 1 ELSE 2 END) END AS l4_len,
          CASE WHEN m = 4 AND NOT half THEN fv7 END AS l4_b,
          CASE WHEN m = 5 THEN (CASE WHEN half THEN [[[fv]]] ELSE [[[fv], [fv7]]] END) END AS o_a,
          CASE WHEN m = 5 THEN (CASE WHEN half THEN 1 ELSE 0 END) END AS o_b_pres,
          CASE WHEN m = 5 AND NOT half THEN event_type END AS o_b
        FROM m)
      SELECT CAST(row_number() OVER (
               ORDER BY tr, n, s, l_er, l_n, l_llll, l4_a, l4_len, l4_b,
                        o_a, o_b_pres, o_b, event_id) AS BIGINT) AS pos,
             event_id, CAST(tr AS INT) AS tr
      FROM r ORDER BY pos""")),

    // typed slots as FIRST-CLASS query values, not just a sort encoding
    // (vendor/jx_sqlite/expressions.py:32-79 compiles every expression to
    // per-slot fragments): grouping a mixed-type column — the slots
    // struct IS the group key (struct grouping is slot-wise null-safe,
    // so each (type, value) is one group and all-missing rows are ONE
    // group), with missing() and the cross-type rank restated per group.
    // The number slot is bucketed (floor(value/25)) so groups are dense.
    "q_variant_groupby" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 4
      val slots =
        when(m === 0, TypedSlots.ofBoolean(col("value") > 50))
          .when(m === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m === 2, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.missing)
      e.select(col("event_id"), slots.as("v"))
        .groupBy(TypedSlots.groupKey(col("v")).as("v"))
        .agg(count(lit(1)).as("n_rows"), min(col("event_id")).as("first_id"))
        .select(
          col("v.b").cast("int").as("b"), col("v.n").as("n"), col("v.s").as("s"),
          TypedSlots.isMissing(col("v")).as("is_missing"),
          col("n_rows"), col("first_id"))
    }), Some("""
      WITH m AS (
        SELECT event_id,
          CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS b,
          CASE WHEN event_id % 4 = 1 THEN floor(value / 25) END AS n,
          CASE WHEN event_id % 4 = 2 THEN event_type END AS s
        FROM events)
      SELECT CAST(b AS INT) AS b, n, s,
             (b IS NULL AND n IS NULL AND s IS NULL) AS is_missing,
             count(*) AS n_rows, min(event_id) AS first_id
      FROM m GROUP BY b, n, s ORDER BY 1, 2, 3""")),

    // decisive eq over TWO variant columns: slot-wise null-safe equality
    // (a.b<=>b.b AND a.n<=>b.n AND a.s<=>b.s) — equal iff same type AND
    // same value, missing==missing is TRUE, result never null — used both
    // as a FILTER (the semi-lattice of rows whose two variants agree) and
    // as a projected flag. v2 deliberately overlaps v1 on half the type
    // assignments so the filter keeps a nontrivial, value-dependent set.
    "q_variant_eq" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m1 = col("event_id") % 4
      val v1 =
        when(m1 === 0, TypedSlots.ofBoolean(col("value") > 50))
          .when(m1 === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m1 === 2, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.missing)
      // v2's 8-way mix lines up with v1's 4-way mix so every eq outcome
      // occurs: same type + same value (string at id%8∈{2,6}, number at
      // id%8=1), same type + value-DEPENDENT (number at id%8=5 compares
      // floor(value/25) with floor(user_id/25)), missing==missing TRUE
      // (id%8=3), and cross-type/never-equal elsewhere.
      val m2 = col("event_id") % 8
      val v2 =
        when(m2 === 3, TypedSlots.missing)
          .when(m2 % 4 === 0, TypedSlots.ofBoolean(col("value") <= 50))
          .when(m2 === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m2 % 2 === 0, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.ofNumber(floor(col("user_id") / 25)))
      e.select(col("event_id"), v1.as("v1"), v2.as("v2"))
        .select(col("event_id"),
          TypedSlots.eqSlots(col("v1"), col("v2")).as("eq"),
          TypedSlots.isMissing(col("v1")).as("m1"))
        .where(col("eq") || col("event_id") % 100 === 0)
    }), Some("""
      WITH m AS (
        SELECT event_id,
          CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS b1,
          CASE WHEN event_id % 4 = 1 THEN floor(value / 25) END AS n1,
          CASE WHEN event_id % 4 = 2 THEN event_type END AS s1,
          CASE WHEN event_id % 8 IN (0, 4) THEN (value <= 50) END AS b2,
          CASE WHEN event_id % 8 = 1 THEN floor(value / 25)
               WHEN event_id % 8 IN (5, 7) THEN floor(user_id / 25) END AS n2,
          CASE WHEN event_id % 8 IN (2, 6) THEN event_type END AS s2
        FROM events),
      f AS (
        SELECT event_id,
          (b1 IS NOT DISTINCT FROM b2 AND n1 IS NOT DISTINCT FROM n2
           AND s1 IS NOT DISTINCT FROM s2) AS eq,
          (b1 IS NULL AND n1 IS NULL AND s1 IS NULL) AS m1
        FROM m)
      SELECT event_id, eq, m1 FROM f
      WHERE eq OR event_id % 100 = 0 ORDER BY event_id""")),

    // decisive cross-type COMPARISON (lt + three-way sign) between two
    // variant columns: an ordinary struct comparison of the sort keys —
    // same codegen'd path as the cross-type sort, no UDF comparator. The
    // oracle restates the type-rank-then-value order as explicit CASEs.
    "q_variant_compare" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m1 = col("event_id") % 4
      val v1 =
        when(m1 === 0, TypedSlots.ofBoolean(col("value") > 50))
          .when(m1 === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m1 === 2, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.missing)
      val m2 = col("event_id") % 8
      val v2 =
        when(m2 === 3, TypedSlots.missing)
          .when(m2 % 4 === 0, TypedSlots.ofBoolean(col("value") <= 50))
          .when(m2 === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m2 % 2 === 0, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.ofNumber(floor(col("user_id") / 25)))
      e.select(col("event_id"), v1.as("v1"), v2.as("v2"))
        .select(col("event_id"),
          TypedSlots.ltSlots(col("v1"), col("v2")).as("lt"),
          TypedSlots.cmpSlots(col("v1"), col("v2")).as("cmp"))
    }), Some("""
      WITH m AS (
        SELECT event_id,
          CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS b1,
          CASE WHEN event_id % 4 = 1 THEN floor(value / 25) END AS n1,
          CASE WHEN event_id % 4 = 2 THEN event_type END AS s1,
          CASE WHEN event_id % 8 IN (0, 4) THEN (value <= 50) END AS b2,
          CASE WHEN event_id % 8 = 1 THEN floor(value / 25)
               WHEN event_id % 8 IN (5, 7) THEN floor(user_id / 25) END AS n2,
          CASE WHEN event_id % 8 IN (2, 6) THEN event_type END AS s2
        FROM events),
      r AS (
        SELECT event_id, b1, n1, s1, b2, n2, s2,
          CASE WHEN b1 IS NOT NULL THEN 0 WHEN n1 IS NOT NULL THEN 1
               WHEN s1 IS NOT NULL THEN 2 ELSE 3 END AS t1,
          CASE WHEN b2 IS NOT NULL THEN 0 WHEN n2 IS NOT NULL THEN 1
               WHEN s2 IS NOT NULL THEN 2 ELSE 3 END AS t2
        FROM m),
      c AS (
        SELECT event_id,
          (t1 < t2 OR (t1 = t2 AND (
             (t1 = 0 AND b1 < b2) OR (t1 = 1 AND n1 < n2)
             OR (t1 = 2 AND s1 < s2)))) AS lt,
          (t1 = t2 AND (t1 = 3 OR (t1 = 0 AND b1 = b2)
             OR (t1 = 1 AND n1 = n2) OR (t1 = 2 AND s1 = s2))) AS eq
        FROM r)
      SELECT event_id, lt, CASE WHEN lt THEN -1 WHEN eq THEN 0 ELSE 1 END AS cmp
      FROM c ORDER BY event_id""")),

    // cross-type MIN aggregate over a variant column: min of the sort key
    // is an ordinary struct-min (orderable type, partial-aggregatable →
    // map-side combine), decoded back to slots — the smallest value per
    // group under bool < number < string < missing.
    "q_variant_min" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 4
      val slots =
        when(m === 0, TypedSlots.ofBoolean(col("value") > 50))
          .when(m === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m === 2, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.missing)
      e.select(col("event_type"), slots.as("v"))
        .groupBy(col("event_type"))
        .agg(min(TypedSlots.sortKey(col("v"))).as("mn"), count(lit(1)).as("n_rows"))
        .select(col("event_type"),
          col("mn.b").as("b"), col("mn.n").as("n"), col("mn.s").as("s"),
          col("n_rows"))
    }), Some("""
      WITH m AS (
        SELECT event_type,
          CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS b,
          CASE WHEN event_id % 4 = 1 THEN floor(value / 25) END AS n,
          CASE WHEN event_id % 4 = 2 THEN event_type END AS s
        FROM events),
      r AS (
        SELECT event_type, b, n, s,
          CASE WHEN b IS NOT NULL THEN 0 WHEN n IS NOT NULL THEN 1
               WHEN s IS NOT NULL THEN 2 ELSE 3 END AS tr,
          count(*) OVER (PARTITION BY event_type) AS n_rows,
          row_number() OVER (PARTITION BY event_type
                             ORDER BY (CASE WHEN b IS NOT NULL THEN 0
                                            WHEN n IS NOT NULL THEN 1
                                            WHEN s IS NOT NULL THEN 2
                                            ELSE 3 END), b, n, s) AS rn
        FROM m)
      SELECT event_type, CAST(b AS INT) AS b, n, s, n_rows
      FROM r WHERE rn = 1 ORDER BY event_type""")),

    // slot-aware strict arithmetic: number∘number flows through the
    // number fragment, every other type pairing collapses to missing —
    // mirrors the reference's typed arithmetic compile (expressions.py
    // routes ops to the $N fragment only)
    "q_variant_math" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m1 = col("event_id") % 4
      val v1 =
        when(m1 === 0, TypedSlots.ofBoolean(col("value") > 50))
          .when(m1 === 1, TypedSlots.ofNumber(floor(col("value") / 25)))
          .when(m1 === 2, TypedSlots.ofString(col("event_type")))
          .otherwise(TypedSlots.missing)
      val m2 = col("event_id") % 2
      val v2 =
        when(m2 === 0, TypedSlots.ofNumber(col("user_id")))
          .otherwise(TypedSlots.ofString(col("event_type")))
      val add = TypedSlots.addSlots(v1, v2)
      val mul = TypedSlots.mulSlots(v1, v2)
      e.select(col("event_id"),
        add.getField("n").as("add_n"),
        TypedSlots.isMissing(add).as("add_missing"),
        mul.getField("n").as("mul_n"))
    }), Some("""
      WITH m AS (
        SELECT event_id,
          CASE WHEN event_id % 4 = 1 THEN floor(value / 25) END AS n1,
          CASE WHEN event_id % 2 = 0 THEN CAST(user_id AS DOUBLE) END AS n2
        FROM events)
      SELECT event_id, n1 + n2 AS add_n,
             (n1 + n2) IS NULL AS add_missing,
             n1 * n2 AS mul_n
      FROM m ORDER BY event_id""")),

    // JSON → variant round-trip: serialize a mixed-type value into real
    // JSON text, re-extract the raw token, parse it into typed slots by
    // SYNTAX (number vs quoted string vs boolean vs null) — the
    // ingestion path that creates variant columns in the first place.
    // The oracle states the planted mapping directly, so the entry
    // proves parse(serialize(x)) == x for every type arm incl. null
    // payloads collapsing to missing.
    "q_variant_from_json" -> (raw((s, dir) => {
      import graft.jx.TypedSlots
      import org.apache.spark.sql.functions._
      val e = SparkEntry.loader(s, dir)("events")
      val m = col("event_id") % 4
      val json =
        when(m === 0, concat(lit("{\"v\": "), col("value") > 50, lit("}")))
          .when(m === 1, concat(lit("{\"v\": "), col("value"), lit("}")))
          .when(m === 2, concat(lit("{\"v\": \""), col("event_type"), lit("\"}")))
          .otherwise(lit("{\"v\": null}"))
      val tok = regexp_extract(json, "\\{\"v\": (.*)\\}", 1)
      val v = TypedSlots.fromJsonToken(tok)
      e.select(col("event_id"), v.as("v"))
        .select(col("event_id"), col("v.b").cast("int").as("b"),
          col("v.n").as("n"), col("v.s").as("s"),
          TypedSlots.isMissing(col("v")).as("is_missing"))
    }), Some("""
      SELECT event_id,
        CAST(CASE WHEN event_id % 4 = 0 THEN (value > 50) END AS INT) AS b,
        CASE WHEN event_id % 4 = 1 THEN value END AS n,
        CASE WHEN event_id % 4 = 2 THEN event_type END AS s,
        ((CASE WHEN event_id % 4 = 0 THEN (value > 50) END) IS NULL
         AND (CASE WHEN event_id % 4 = 1 THEN value END) IS NULL
         AND (CASE WHEN event_id % 4 = 2 THEN event_type END) IS NULL) AS is_missing
      FROM events ORDER BY event_id""")),

    // as-of alignment: every non-purchase event picks up the user's
    // latest at-or-before purchase. graft.ops.AsofJoin: union + running
    // last(ignoreNulls) window — ONE shuffle on the key, no range join.
    // ts second-truncated on both sides (q_sessionize grain rationale).
    "q_asof_join" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, date_trunc, max}
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      val left = e.where(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts")
      val right = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("pvalue"))
      graft.ops.AsofJoin.asofBackward(left, right, Seq("user_id"),
        "ts", "ts", Seq("pvalue")).orderBy("event_id")
    }), Some("""
      WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts,
                        event_type, value FROM events),
      p AS (SELECT user_id, ts, max(value) AS pvalue FROM e
            WHERE event_type = 'purchase' GROUP BY 1, 2),
      l AS (SELECT event_id, user_id, ts FROM e WHERE event_type <> 'purchase')
      SELECT l.event_id, l.user_id, l.ts, p.ts AS asof_ts, p.pvalue AS asof_pvalue
      FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
      ORDER BY l.event_id""")),

    // point-in-interval join: each error event paired with every
    // purchase window [ts, ts+1h] of the same user containing it.
    // graft.ops.RangeJoin: arithmetic bucketing → (key, bucket)
    // equi-join, never a nested-loop theta join; pairs unique because
    // only the interval side explodes.
    "q_interval_join" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, date_trunc, expr}
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      val left = e.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val right = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("user_id"),
          col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
      graft.ops.RangeJoin.pointInInterval(left, right, Seq("user_id"),
          "ts", "win_start", "win_end")
        .orderBy("event_id", "win_id")
    }), Some("""
      WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts,
                        event_type FROM events),
      l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'error'),
      r AS (SELECT event_id AS win_id, user_id, ts AS win_start,
                   ts + INTERVAL 1 HOUR AS win_end
            FROM e WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, l.ts, r.win_id, r.win_start, r.win_end
      FROM l JOIN r ON l.user_id = r.user_id
                   AND l.ts >= r.win_start AND l.ts <= r.win_end
      ORDER BY l.event_id, r.win_id""")),

    // gap-based sessionization (30-min gap): ONE shuffle on the user
    // key, per-task working set bounded by per-user activity — see
    // graft.ops.Sessions for the scale notes and the streaming sibling.
    // ts is truncated to seconds on BOTH sides: the parquet stores
    // nanosecond timestamps, which Spark rounds to micros and DuckDB
    // truncates — second-level sessions are the honest common grain.
    "q_sessionize" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, date_trunc}
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      graft.ops.Sessions.sessionSummary(e, "user_id", "ts",
        gapSec = 1800, tieBreak = col("event_id"))
    }), Some("""
      WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts, event_id FROM events),
      g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, ts,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
        FROM g)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(epoch(max(ts)) - epoch(min(ts)) AS DOUBLE) AS duration_sec
      FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    "q_setop_filter_sort" -> (jx("""{
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
    }"""), Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_totalprice > 100000 AND o_orderstatus = 'F'
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    "q_setop_in_range" -> (jx("""{
      "from": "lineitem",
      "select": ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
      "where": {"and": [
        {"in": {"l_returnflag": ["A", "R"]}},
        {"range": {"l_quantity": {"gte": 45, "lt": 48}}},
        {"ne": {"l_linestatus": "O"}}
      ]},
      "sort": ["l_orderkey", "l_linenumber"],
      "limit": 10000
    }"""), Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem
      WHERE l_returnflag IN ('A','R') AND l_quantity >= 45 AND l_quantity < 48
        AND l_linestatus <> 'O'
      ORDER BY l_orderkey, l_linenumber LIMIT 10000""")),

    // tuple-offset sort (reference _normalize_sort query.py:775: a bare
    // integer in `sort` is an OffsetOp index into the select tuple; the
    // object form {"value":{"offset":i}} is the same op spelled out).
    // Offsets 2,3 = (l_orderkey, l_linenumber) make the order total.
    "q_sort_tuple_offset" -> (jx("""{
      "from": "lineitem",
      "select": [
        {"name": "flag", "value": "l_returnflag"},
        {"name": "qty", "value": "l_quantity"},
        {"name": "okey", "value": "l_orderkey"},
        {"name": "line", "value": "l_linenumber"}
      ],
      "where": {"gte": {"l_quantity": 49}},
      "sort": [{"value": {"offset": 1}, "sort": "desc"}, 2, 3],
      "limit": 10000
    }"""), Some("""
      SELECT l_returnflag AS flag, l_quantity AS qty,
             l_orderkey AS okey, l_linenumber AS line
      FROM lineitem WHERE l_quantity >= 49
      ORDER BY 2 DESC, 3, 4 LIMIT 10000""")),

    // limit clamp, default side: a setop with NO limit returns 10 rows
    // (reference query.py:35-36 DEFAULT_LIMIT); total sort keeps the
    // prefix deterministic
    "q_limit_default" -> (jx("""{
      "from": "orders",
      "select": ["o_orderkey", "o_totalprice"],
      "sort": ["o_orderkey"]
    }"""), Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 10""")),

    // limit clamp, max side: limit 50000 clamps to 10,000 (MAX_LIMIT) —
    // observable because orders has >10,000 rows at sf0.01 and sf0.1
    "q_limit_clamp" -> (jx("""{
      "from": "orders",
      "select": ["o_orderkey", "o_custkey"],
      "sort": ["o_orderkey"],
      "limit": 50000
    }"""), Some("""
      SELECT o_orderkey, o_custkey FROM orders
      ORDER BY o_orderkey LIMIT 10000""")),

    // =====================================================================
    // §2.7 expression operators
    // =====================================================================
    "q_expr_string" -> (jx("""{
      "from": "part",
      "select": [
        {"name": "p_partkey", "value": "p_partkey"},
        {"name": "first5", "value": {"left": {"p_name": 5}}},
        {"name": "last3", "value": {"right": {"p_name": 3}}},
        {"name": "after5", "value": {"not_left": {"p_name": 5}}},
        {"name": "trimmed", "value": {"not_right": {"p_name": 2}}},
        {"name": "name_len", "value": {"length": "p_name"}},
        {"name": "pos_iv", "value": {"find": {"p_name": "iv"}}},
        {"name": "branded", "value": {"concat": ["p_brand", "p_type"], "separator": "-"}},
        {"name": "is_std", "value": {"prefix": {"p_type": "STANDARD"}}},
        {"name": "ends_ss", "value": {"suffix": {"p_name": "s"}}}
      ],
      "sort": ["p_partkey"],
      "limit": 10000
    }"""), Some("""
      SELECT p_partkey,
        substr(p_name, 1, 5) AS first5,
        right(p_name, 3) AS last3,
        substr(p_name, 6) AS after5,
        substr(p_name, 1, greatest(length(p_name) - 2, 0)) AS trimmed,
        length(p_name) AS name_len,
        CAST(nullif(strpos(p_name, 'iv'), 0) - 1 AS BIGINT) AS pos_iv,
        concat_ws('-', p_brand, p_type) AS branded,
        starts_with(p_type, 'STANDARD') AS is_std,
        ends_with(p_name, 's') AS ends_ss
      FROM part ORDER BY p_partkey LIMIT 10000""")),

    "q_expr_math" -> (jx("""{
      "from": "lineitem",
      "select": [
        {"name": "l_orderkey", "value": "l_orderkey"},
        {"name": "l_linenumber", "value": "l_linenumber"},
        {"name": "bucket", "value": {"floor": ["l_extendedprice", 100]}},
        {"name": "modk", "value": {"mod": ["l_partkey", 7]}},
        {"name": "powd", "value": {"exp": ["l_discount", 2]}},
        {"name": "divd", "value": {"div": ["l_extendedprice", "l_quantity"]}},
        {"name": "divz", "value": {"div": ["l_quantity", {"sub": ["l_partkey", "l_partkey"]}], "default": {"literal": -1.0}}},
        {"name": "addn", "value": {"add": ["l_tax", "l_discount"], "nulls": true}},
        {"name": "gmax", "value": {"max": ["l_tax", "l_discount"]}},
        {"name": "revenue", "value": {"mul": ["l_extendedprice", {"sub": [1, "l_discount"]}]}}
      ],
      "where": {"lte": {"l_orderkey": 2000}},
      "sort": ["l_orderkey", "l_linenumber"],
      "limit": 10000
    }"""), Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(floor(l_extendedprice/100)*100 AS BIGINT) AS bucket,
        l_partkey % 7 AS modk,
        power(l_discount, 2) AS powd,
        l_extendedprice / l_quantity AS divd,
        CAST(-1.0 AS DOUBLE) AS divz,
        l_tax + l_discount AS addn,
        greatest(l_tax, l_discount) AS gmax,
        l_extendedprice * (1 - l_discount) AS revenue
      FROM lineitem WHERE l_orderkey <= 2000
      ORDER BY l_orderkey, l_linenumber LIMIT 10000""")),

    "q_expr_when_case" -> (jx("""{
      "from": "orders",
      "select": [
        {"name": "o_orderkey", "value": "o_orderkey"},
        {"name": "heat", "value": {"case": [
          {"when": {"eq": {"o_orderpriority": "1-URGENT"}}, "then": {"literal": "hot"}},
          {"when": {"prefix": {"o_orderpriority": "2"}}, "then": {"literal": "warm"}},
          {"literal": "cold"}
        ]}},
        {"name": "is_final", "value": {"when": {"in": {"o_orderstatus": ["F", "P"]}}, "then": 1, "else": 0}},
        {"name": "big_price", "value": {"when": {"gt": {"o_totalprice": 200000}}, "then": "o_totalprice"}},
        {"name": "has_big", "value": {"exists": {"when": {"gt": {"o_totalprice": 200000}}, "then": "o_totalprice"}}},
        {"name": "no_big", "value": {"missing": {"when": {"gt": {"o_totalprice": 200000}}, "then": "o_totalprice"}}}
      ],
      "where": {"lte": {"o_orderkey": 5000}},
      "sort": ["o_orderkey"],
      "limit": 10000
    }"""), Some("""
      SELECT o_orderkey,
        CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
             WHEN starts_with(o_orderpriority, '2') THEN 'warm'
             ELSE 'cold' END AS heat,
        CASE WHEN o_orderstatus IN ('F','P') THEN 1 ELSE 0 END AS is_final,
        CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price,
        (CASE WHEN o_totalprice > 200000 THEN o_totalprice END) IS NOT NULL AS has_big,
        (CASE WHEN o_totalprice > 200000 THEN o_totalprice END) IS NULL AS no_big
      FROM orders WHERE o_orderkey <= 5000 ORDER BY o_orderkey LIMIT 10000""")),

    "q_null_semantics" -> (jx("""{
      "from": "orders",
      "select": [
        {"name": "o_orderkey", "value": "o_orderkey"},
        {"name": "eq_decisive", "value": {"eq": [{"when": {"gt": {"o_totalprice": 150000}}, "then": "o_orderstatus"}, {"literal": "F"}]}},
        {"name": "both_missing", "value": {"eq": [{"when": {"gt": {"o_totalprice": 150000}}, "then": "o_orderstatus"}, {"null": {}}]}},
        {"name": "ne_decisive", "value": {"ne": [{"when": {"gt": {"o_totalprice": 150000}}, "then": "o_orderstatus"}, {"literal": "F"}]}},
        {"name": "gt_missing_false", "value": {"gt": [{"when": {"eq": {"o_orderstatus": "X"}}, "then": "o_totalprice"}, 0]}},
        {"name": "coal", "value": {"coalesce": [{"when": {"gt": {"o_totalprice": 150000}}, "then": "o_orderstatus"}, {"literal": "none"}]}},
        {"name": "add_strict", "value": {"add": ["o_totalprice", {"when": {"eq": {"o_orderstatus": "X"}}, "then": 1}]}},
        {"name": "add_nulls", "value": {"add": ["o_totalprice", {"when": {"eq": {"o_orderstatus": "X"}}, "then": 1}], "nulls": true}}
      ],
      "where": {"lte": {"o_orderkey": 3000}},
      "sort": ["o_orderkey"],
      "limit": 10000
    }"""), Some("""
      SELECT o_orderkey,
        (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END) IS NOT DISTINCT FROM 'F' AS eq_decisive,
        (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END) IS NOT DISTINCT FROM NULL AS both_missing,
        (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END) IS DISTINCT FROM 'F' AS ne_decisive,
        coalesce((CASE WHEN o_orderstatus = 'X' THEN o_totalprice END) > 0, false) AS gt_missing_false,
        coalesce(CASE WHEN o_totalprice > 150000 THEN o_orderstatus END, 'none') AS coal,
        o_totalprice + (CASE WHEN o_orderstatus = 'X' THEN 1 END) AS add_strict,
        CASE WHEN o_totalprice IS NULL AND (CASE WHEN o_orderstatus = 'X' THEN 1 END) IS NULL THEN NULL
             ELSE coalesce(o_totalprice, 0) + coalesce(CASE WHEN o_orderstatus = 'X' THEN 1 END, 0) END AS add_nulls
      FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey LIMIT 10000""")),

    "q_expr_regex_split" -> (jx("""{
      "from": "part",
      "select": [
        {"name": "p_partkey", "value": "p_partkey"},
        {"name": "is_brass", "value": {"regex": {"p_type": ".*BRASS"}}},
        {"name": "first_word", "value": {"get": [{"split": {"p_type": " "}}, 0]}},
        {"name": "last_word", "value": {"last": {"split": {"p_type": " "}}}}
      ],
      "sort": ["p_partkey"],
      "limit": 10000
    }"""), Some("""
      SELECT p_partkey,
        regexp_full_match(p_type, '.*BRASS') AS is_brass,
        split_part(p_type, ' ', 1) AS first_word,
        string_split(p_type, ' ')[-1] AS last_word
      FROM part ORDER BY p_partkey LIMIT 10000""")),

    "q_expr_date" -> (jx("""{
      "from": "orders",
      "select": [
        {"name": "o_orderkey", "value": "o_orderkey"},
        {"name": "epoch_s", "value": {"integer": {"unix": "o_orderdate"}}},
        {"name": "back", "value": {"from_unix": {"unix": "o_orderdate"}}}
      ],
      "where": {"and": [
        {"gte": ["o_orderdate", {"date": "1998-06-01"}]},
        {"lt": ["o_orderdate", {"date": "1998-08-01"}]}
      ]},
      "sort": ["o_orderkey"],
      "limit": 10000
    }"""), Some("""
      SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             o_orderdate AS back
      FROM orders
      WHERE o_orderdate >= '1998-06-01' AND o_orderdate < '1998-08-01'
      ORDER BY o_orderkey LIMIT 10000""")),

    "q_expr_between" -> (jx("""{
      "from": "part",
      "select": [
        {"name": "p_partkey", "value": "p_partkey"},
        {"name": "mid", "value": {"between": {"p_type": ["STANDARD ", " BRASS"]}}}
      ],
      "sort": ["p_partkey"],
      "limit": 10000
    }"""), Some("""
      SELECT p_partkey,
        CASE WHEN strpos(p_type, 'STANDARD ') > 0
              AND strpos(substr(p_type, strpos(p_type, 'STANDARD ') + 9), ' BRASS') > 0
             THEN substr(p_type, strpos(p_type, 'STANDARD ') + 9,
                  strpos(substr(p_type, strpos(p_type, 'STANDARD ') + 9), ' BRASS') - 1)
        END AS mid
      FROM part ORDER BY p_partkey LIMIT 10000""")),

    // =====================================================================
    // §2.5 window clauses
    // =====================================================================
    "q_window_rank" -> (jx("""{
      "from": "orders",
      "window": [{
        "name": "rn", "value": "rownum",
        "edges": ["o_orderstatus"],
        "sort": [{"value": "o_totalprice", "sort": -1}, "o_orderkey"]
      }],
      "select": ["o_orderkey", "o_orderstatus", "o_totalprice", "rn"],
      "where": {"lte": {"o_orderkey": 4000}},
      "sort": ["o_orderkey"],
      "limit": 10000
    }"""), Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice,
        CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) - 1 AS INT) AS rn
      FROM orders WHERE o_orderkey <= 4000
      ORDER BY o_orderkey LIMIT 10000""")),

    "q_window_sliding" -> (jx("""{
      "from": "events",
      "window": [{
        "name": "run3", "value": "value", "aggregate": "sum",
        "edges": ["user_id"],
        "sort": ["event_id"],
        "range": {"min": -2, "max": 1}
      }],
      "select": ["event_id", "user_id", "value", "run3"],
      "sort": ["event_id"],
      "limit": 10000
    }"""), Some("""
      SELECT event_id, user_id, value,
        sum(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS run3
      FROM events ORDER BY event_id LIMIT 10000""")),

    // event-TIME sliding window (rangeBetween on epoch seconds): each
    // event's trailing-1-hour per-user count and sum. The rows-based
    // sibling is q_window_sliding; range frames are the event-time form
    // a feature pipeline needs (rate limits, rolling activity). Same
    // one-shuffle-on-the-user-key shape as sessionization; ts truncated
    // to seconds on both sides (q_sessionize grain rationale).
    "q_window_time_range" -> (raw((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, count, date_trunc, lit, sum}
      val e = SparkEntry.loader(s, dir)("events")
        .withColumn("ts", date_trunc("second", col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").cast("long"))
        .rangeBetween(-3599L, 0L)
      e.select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"), sum(col("value")).over(w).as("sum_1h"))
        .orderBy("event_id")
    }), Some("""
      WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts, value FROM events)
      SELECT event_id, user_id, ts,
        count(*) OVER w AS n_1h, sum(value) OVER w AS sum_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // the reference's meta.columns schema-introspection surface
    // (vendor/jx_python/meta.py:142-160, jx_base/__init__.py:244-264):
    // every table's columns as a queryable DataFrame. Metadata is
    // driver-resident by nature (the reference keeps a column store);
    // the catalog here is the Spark schema of each registered table.
    "q_meta_columns" -> (raw((s, dir) => {
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      val rows = tables.flatMap { t =>
        SparkEntry.loader(s, dir)(t).schema.fields.map(f =>
          (t, f.name, f.dataType.simpleString))
      }
      import s.implicits._
      rows.toDF("table_name", "column_name", "col_type")
    }), Some(
      Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings").map(t =>
        s"""SELECT '$t' AS table_name, column_name,
          CASE column_type WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
            WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
            WHEN 'TIMESTAMP' THEN 'timestamp' WHEN 'FLOAT[]' THEN 'array<float>'
            ELSE lower(column_type) END AS col_type
        FROM (DESCRIBE SELECT * FROM $t)""").mkString("\nUNION ALL\n")
        + "\nORDER BY table_name, column_name")),

    // column-level data profiling (the validation report of data-quality
    // tooling): ONE pass computes every column's row/null/distinct/range
    // stats, then the single result row pivots to one row per column;
    // min/max render as strings so one schema covers all types
    "q_meta_profile" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.Profiling.profile(
          SparkEntry.loader(s, dir)("lineitem"),
          Seq("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag", "l_linestatus"))
        .orderBy(col("column_name"))
    }), Some(
      Seq("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .map(c => s"""
          SELECT '$c' AS column_name, count(*) AS n_rows,
                 count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
                 CAST(min($c) AS VARCHAR) AS min_value,
                 CAST(max($c) AS VARCHAR) AS max_value
          FROM lineitem""").mkString("\nUNION ALL\n") + "\nORDER BY column_name")),

    // =====================================================================
    // co-located (bucketed) join — the physical design for a REPEATED
    // fact⋈fact equi-join at 100 TB (pay the shuffle once, at write)
    // =====================================================================
    // orders and lineitem are written once per (session, sf dir) as
    // 16-bucket in-bucket-sorted tables on the order key — the one paid
    // shuffle; the timed query then joins them with NO Exchange on the
    // join keys (merge-hinted SortMergeJoin over co-located scans;
    // PlanSpec pins the contract) and aggregates. The oracle is the
    // plain relational join — bucketing must not change a single row.
    "q_bucketed_join" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.ops.Bucketing
      val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
      val (ot, lt) = (s"graft_buckets.orders_$suffix", s"graft_buckets.lineitem_$suffix")
      // pid-keyed DB location + stale-dir sweep: an in-memory catalog
      // dies with its JVM but managed files do not, and CTAS refuses an
      // existing location (full-suite JVMs surfaced exactly that)
      val root = s"${sys.props("java.io.tmpdir")}/graft_bucketed_${ProcessHandle.current().pid()}"
      Bucketing.ensureDatabase(s, "graft_buckets", root)
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(lt)) {
        Bucketing.clearStaleLocation(s"$root/orders_$suffix")
        Bucketing.clearStaleLocation(s"$root/lineitem_$suffix")
        val load = SparkEntry.loader(s, dir)
        Bucketing.writeBucketed(load("orders")
          .select(col("o_orderkey"), col("o_orderpriority")), ot, "o_orderkey", 16)
        Bucketing.writeBucketed(load("lineitem")
          .select(col("l_orderkey"), col("l_quantity")), lt, "l_orderkey", 16)
      }
      Bucketing.bucketedJoin(s, ot, lt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }), Some("""
      SELECT o_orderpriority, count(*) AS n_items,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY 1""")),

    "q_select_star" -> (jx("""{
      "from": "part",
      "select": ["*"],
      "sort": ["p_partkey"],
      "limit": 10000
    }"""), Some("""
      SELECT * FROM part ORDER BY p_partkey LIMIT 10000""")),

    "q_groupby_null_key" -> (jx("""{
      "from": "events",
      "groupby": [{"name": "big_type", "value": {"when": {"gt": {"value": 5}}, "then": "event_type"}}],
      "select": [
        {"name": "n", "value": ".", "aggregate": "count"},
        {"name": "total", "value": "value", "aggregate": "sum"}
      ]
    }"""), Some("""
      SELECT CASE WHEN value > 5 THEN event_type END AS big_type,
             count(*) AS n, sum(value) AS total
      FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""")),

    "q_window_where" -> (jx("""{
      "from": "events",
      "window": [{
        "name": "click_total", "value": "value", "aggregate": "sum",
        "where": {"eq": {"event_type": "click"}},
        "edges": ["user_id"], "sort": ["event_id"]
      }],
      "select": ["event_id", "user_id", "click_total"],
      "sort": ["event_id"],
      "limit": 10000
    }"""), Some("""
      SELECT event_id, user_id,
        sum(CASE WHEN event_type = 'click' THEN value END)
          OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_total
      FROM events ORDER BY event_id LIMIT 10000""")),

    "q_window_neighbors" -> (jx("""{
      "from": "events",
      "window": [{
        "name": "prev_value", "value": {"rows": ["value", -1]},
        "edges": ["user_id"], "sort": ["event_id"]
      }, {
        "name": "next_type", "value": {"rows": ["event_type", 1]},
        "edges": ["user_id"], "sort": ["event_id"]
      }, {
        "name": "cum_total", "value": "value", "aggregate": "sum",
        "edges": ["user_id"], "sort": ["event_id"]
      }],
      "select": ["event_id", "user_id", "prev_value", "next_type", "cum_total"],
      "sort": ["event_id"],
      "limit": 10000
    }"""), Some("""
      SELECT event_id, user_id,
        lag(value) OVER w AS prev_value,
        lead(event_type) OVER w AS next_type,
        sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_total
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY event_id LIMIT 10000""")),

    // =====================================================================
    // §2.6 list utilities (reference jx.py:633-645,1045-1093) as window
    // transforms: "the list" is a partition's rows in event order
    // =====================================================================
    "q_list_pairwise" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.ListOps.pairwise(
        SparkEntry.loader(s, dir)("events"),
        col("value"), Seq(col("user_id")), Seq(col("event_id")))
        .select(col("event_id"), col("user_id"), col("a"), col("b"))
        .orderBy(col("event_id"))
    }), Some("""
      SELECT event_id, user_id, a, b FROM (
        SELECT event_id, user_id, value AS a,
               lead(value) OVER w AS b, lead(1) OVER w AS has_next
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      WHERE has_next IS NOT NULL ORDER BY event_id""")),

    "q_list_accumulate" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.ListOps.accumulate(
        SparkEntry.loader(s, dir)("events"),
        col("value"), Seq(col("user_id")), Seq(col("event_id")))
        .select(col("event_id"), col("user_id"), col("value"), col("sum_before"))
        .orderBy(col("event_id"))
    }), Some("""
      SELECT event_id, user_id, value,
             coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sum_before
      FROM events ORDER BY event_id""")),

    "q_list_countdown" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.ListOps.countdown(
        SparkEntry.loader(s, dir)("events"),
        Seq(col("user_id")), Seq(col("event_id")))
        .select(col("event_id"), col("user_id"), col("remaining"))
        .orderBy(col("event_id"))
    }), Some("""
      SELECT event_id, user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS remaining
      FROM events ORDER BY event_id""")),

    // prefix arrays stringified: the compare harness cannot hash arrays
    "q_list_prefixes" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat_ws}
      graft.ops.ListOps.prefixes(
        SparkEntry.loader(s, dir)("events"),
        col("event_id"), Seq(col("user_id")), Seq(col("event_id")))
        .select(col("event_id"), col("user_id"),
          concat_ws(",", col("prefix")).as("prefix"))
        .orderBy(col("event_id"))
    }), Some("""
      SELECT event_id, user_id,
             array_to_string(list(event_id) OVER (PARTITION BY user_id
               ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               ',') AS prefix
      FROM events ORDER BY event_id""")),

    "q_list_intervals" -> (raw((s, dir) =>
      graft.ops.ListOps.intervals(s, 0, 23, 5)
    ), Some("""
      SELECT generate_series AS lo, least(generate_series + 5, 23) AS hi
      FROM generate_series(0, 22, 5) ORDER BY lo""")),

    // reversed per-user value list, posexploded to (user, pos, value)
    // rows — the comparator can't hash array cells; the oracle replays
    // the reversal as a DESC row_number
    "q_list_reverse" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, posexplode}
      graft.ops.ListOps.reversedList(
        SparkEntry.loader(s, dir)("events"),
        col("value"), Seq(col("user_id")), Seq(col("event_id")))
        .select(col("user_id"), posexplode(col("reversed")))
        .select(col("user_id"), col("pos").cast("long").as("pos"),
          col("col").as("value"))
        .orderBy(col("user_id"), col("pos"))
    }), Some("""
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY event_id DESC) - 1 AS BIGINT) AS pos,
             value
      FROM events ORDER BY user_id, pos""")),

    // the reference ships one REALISTIC downstream analytics query as
    // documentation of intent (tests/resources/example_TH_query.sql:1-18:
    // fact filtered by class + 7-day window + segment exclusion, inner
    // join to a map table, CONDITIONAL left join to a note table,
    // count(1) over the fanned-out rows + conditional sum, group by the
    // map key). Same shape over the TPC-H tables, with the date window
    // PINNED (CURDATE() would be nondeterministic across engines). Scale
    // shape: two key-equi joins — the windowed fact side prunes at the
    // scan (PushedFilters), the conditional left join keeps its predicate
    // IN the join condition (no post-join filter, preserving unmatched
    // rows), and the group-by shuffles once on the map key.
    "q_downstream_analytics" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit, count, sum, when}
      val ld = SparkEntry.loader(s, dir)
      val o = ld("orders").where(
        col("o_orderstatus") === lit("F") &&
          col("o_orderdate") >= lit("1995-06-01") &&
          col("o_orderdate") < lit("1995-06-08"))
      val c = ld("customer").where(col("c_mktsegment") =!= lit("BUILDING"))
      val l = ld("lineitem")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey") &&
          l("l_returnflag") === lit("R"), "left")
        .groupBy(c("c_custkey").as("cust"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(l("l_returnflag") === lit("R"), 1).otherwise(0))
            .cast("long").as("n_returned"))
        .orderBy(col("cust"))
    }), Some("""
      SELECT c.c_custkey AS cust, count(1) AS n_rows,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      WHERE o.o_orderstatus = 'F'
        AND o.o_orderdate >= DATE '1995-06-01' AND o.o_orderdate < DATE '1995-06-08'
        AND c.c_mktsegment <> 'BUILDING'
      GROUP BY 1 ORDER BY 1""")),

    // =====================================================================
    // set operations over engine outputs (reference jx concat/union of
    // result lists, jx_python/jx.py; Spark union/intersect/except are the
    // pass-through — each side is a full JX query through QueryRunner)
    // =====================================================================
    // Each side sorts on its key BEFORE the 10,000-row MAX_LIMIT clamp —
    // the filters match >10k orders at sf0.1, so an unsorted limit would
    // be a nondeterministic subset. The oracle mirrors the per-side
    // ORDER BY ... LIMIT in parenthesized subqueries.
    // UNION ALL with a provenance tag: overlapping rows (urgent AND
    // high-value) must appear once per side
    "q_setop_union" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit}
      val urgent = jx("""{
        "from": "orders",
        "select": ["o_orderkey", "o_totalprice"],
        "where": {"eq": {"o_orderpriority": "1-URGENT"}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir).withColumn("src", lit("urgent"))
      val bigval = jx("""{
        "from": "orders",
        "select": ["o_orderkey", "o_totalprice"],
        "where": {"gt": {"o_totalprice": 200000}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir).withColumn("src", lit("bigval"))
      urgent.unionByName(bigval).orderBy(col("src"), col("o_orderkey"))
    }), Some("""
      (SELECT o_orderkey, o_totalprice, 'urgent' AS src
       FROM orders WHERE o_orderpriority = '1-URGENT'
       ORDER BY o_orderkey LIMIT 10000)
      UNION ALL
      (SELECT o_orderkey, o_totalprice, 'bigval' AS src
       FROM orders WHERE o_totalprice > 200000
       ORDER BY o_orderkey LIMIT 10000)
      ORDER BY src, o_orderkey""")),

    // INTERSECT (distinct semantics on both engines)
    "q_setop_intersect" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      val finished = jx("""{
        "from": "orders", "select": ["o_orderkey"],
        "where": {"eq": {"o_orderstatus": "F"}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir)
      val urgent = jx("""{
        "from": "orders", "select": ["o_orderkey"],
        "where": {"eq": {"o_orderpriority": "1-URGENT"}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir)
      finished.intersect(urgent).orderBy(col("o_orderkey"))
    }), Some("""
      (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
       ORDER BY o_orderkey LIMIT 10000)
      INTERSECT
      (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
       ORDER BY o_orderkey LIMIT 10000)
      ORDER BY o_orderkey""")),

    // EXCEPT (distinct semantics on both engines)
    "q_setop_except" -> (raw((s, dir) => {
      import org.apache.spark.sql.functions.col
      val big = jx("""{
        "from": "orders", "select": ["o_orderkey"],
        "where": {"gt": {"o_totalprice": 150000}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir)
      val open = jx("""{
        "from": "orders", "select": ["o_orderkey"],
        "where": {"eq": {"o_orderstatus": "O"}},
        "sort": ["o_orderkey"], "limit": 10000
      }""")(s, dir)
      big.except(open).orderBy(col("o_orderkey"))
    }), Some("""
      (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
       ORDER BY o_orderkey LIMIT 10000)
      EXCEPT
      (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_orderkey LIMIT 10000)
      ORDER BY o_orderkey"""))
  )

  def queries: Map[String, Q] = catalog.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = catalog.collect { case (k, (_, Some(o))) => k -> o.trim }
}

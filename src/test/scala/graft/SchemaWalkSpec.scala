package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl._
import graft.etl.SchemaWalk.WalkConfig

/** JDBC FK-graph walk + assembly against an in-memory Derby database that
  * mirrors the reference fixture (tests/resources/database.sql: fact_table
  * ⊃ nested1 ⊃ nested2 with inner1/inner2 lookups), asserting the golden
  * document shapes from the reference's test_extract.py. */
class SchemaWalkSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  val url = "jdbc:derby:memory:graftdb;create=true"

  lazy val conn = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    Seq(
      "CREATE TABLE inner2 (id INT NOT NULL PRIMARY KEY, value DATE)",
      "INSERT INTO inner2 VALUES (-1, '1970-01-01')",
      "INSERT INTO inner2 VALUES (-2, NULL)",
      """CREATE TABLE inner1 (id INT NOT NULL PRIMARY KEY, value VARCHAR(20),
         time INT, FOREIGN KEY (time) REFERENCES inner2 (id))""",
      "INSERT INTO inner1 VALUES (1, 'a', -1)",
      "INSERT INTO inner1 VALUES (2, 'b', -2)",
      "INSERT INTO inner1 VALUES (3, 'c', NULL)",
      """CREATE TABLE fact_table (id INT NOT NULL PRIMARY KEY, name VARCHAR(20),
         about INT, FOREIGN KEY (about) REFERENCES inner1 (id))""",
      "INSERT INTO fact_table VALUES (10, 'A', 1)", "INSERT INTO fact_table VALUES (11, 'B', 2)",
      "INSERT INTO fact_table VALUES (12, 'C', 3)", "INSERT INTO fact_table VALUES (13, 'D', NULL)",
      "INSERT INTO fact_table VALUES (15, 'E', 1)", "INSERT INTO fact_table VALUES (16, 'F', 2)",
      "INSERT INTO fact_table VALUES (17, 'G', 3)", "INSERT INTO fact_table VALUES (18, 'H', NULL)",
      "INSERT INTO fact_table VALUES (19, 'I', 1)", "INSERT INTO fact_table VALUES (20, 'J', 2)",
      "INSERT INTO fact_table VALUES (21, 'K', 3)", "INSERT INTO fact_table VALUES (22, 'L', NULL)",
      """CREATE TABLE nested1 (id INT NOT NULL PRIMARY KEY, ref INT,
         description VARCHAR(20), about INT,
         FOREIGN KEY (ref) REFERENCES fact_table (id),
         FOREIGN KEY (about) REFERENCES inner2 (id))""",
      "INSERT INTO nested1 VALUES (100, 10, 'aaa', -1)",
      "INSERT INTO nested1 VALUES (101, 11, 'bbb', -2)",
      "INSERT INTO nested1 VALUES (102, 12, 'ccc', NULL)",
      "INSERT INTO nested1 VALUES (103, 13, 'ddd', -1)",
      "INSERT INTO nested1 VALUES (104, 15, 'eee', -1)",
      "INSERT INTO nested1 VALUES (105, 15, 'fff', -1)",
      "INSERT INTO nested1 VALUES (106, 16, 'ggg', -2)",
      "INSERT INTO nested1 VALUES (107, 16, 'hhh', NULL)",
      "INSERT INTO nested1 VALUES (108, 17, 'iii', -2)",
      "INSERT INTO nested1 VALUES (109, 17, 'jjj', -2)",
      "INSERT INTO nested1 VALUES (110, 18, 'kkk', NULL)",
      "INSERT INTO nested1 VALUES (111, 18, 'lll', NULL)",
      """CREATE TABLE nested2 (id INT NOT NULL PRIMARY KEY, ref INT,
         minutia DOUBLE PRECISION, about INT,
         FOREIGN KEY (ref) REFERENCES nested1 (id),
         FOREIGN KEY (about) REFERENCES inner1 (id))""",
      "INSERT INTO nested2 VALUES (1000, 100, 3.1415926539, 1)",
      "INSERT INTO nested2 VALUES (1001, 100, 4.0, 2)",
      "INSERT INTO nested2 VALUES (1002, 100, 5.1, 3)",
      "INSERT INTO nested2 VALUES (1003, 101, 6.2, 1)",
      "INSERT INTO nested2 VALUES (1004, 102, 7.3, 3)"
    ).foreach(st.executeUpdate)
    st.close()
    c
  }

  /** reference config_template: reference_only ["inner1","inner2"] = full
    * objects, no nested docs at/below them. */
  private def refCfg = WalkConfig("fact_table", referenceAll = Set("inner1", "inner2"))

  test("walk discovers the snowflake: lookups, children, keys, cycle-free") {
    val plan = SchemaWalk.walk(conn, refCfg)
    assert(plan.table === "fact_table" && plan.key === "id")
    assert(plan.lookups.map(l => (l.fk, l.as, l.plan.table)) === Seq(("about", "about", "inner1")))
    assert(plan.lookups.head.plan.lookups.map(_.plan.table) === Seq("inner2"))
    assert(plan.children.map(c => (c.fk, c.as, c.plan.table)) === Seq(("ref", "nested1", "nested1")))
    val n1 = plan.children.head.plan
    assert(n1.lookups.map(_.plan.table) === Seq("inner2"))
    assert(n1.children.map(_.plan.table) === Seq("nested2"))
    // the ref edge back to fact_table is never re-followed along its path
    assert(!n1.lookups.exists(_.plan.table == "fact_table"))
    // inner1 under nested2.about expands its time lookup AGAIN — done
    // sets are per-path (reference golden "complex": nested2.about.time)
    val n2about = n1.children.head.plan.lookups.head.plan
    assert(n2about.table === "inner1")
    assert(n2about.lookups.map(_.plan.table) === Seq("inner2"))
    // ... but gets no nested children (no_nested_docs below referenceAll)
    assert(n2about.children.isEmpty)
  }

  test("without referenceAll, lookup tables DO grow nested children") {
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table"))
    val inner1 = plan.lookups.head.plan
    assert(inner1.children.map(_.plan.table) === Seq("nested2"))
  }

  test("golden doc assembly matches the reference fixture shapes") {
    val plan = SchemaWalk.walk(conn, refCfg)
    val docs = DocAssembler.assemble(plan, SchemaWalk.jdbcLoader(spark, url))
    assert(docs.count() === 12)

    val d10 = docs.where(col("id") === 10).select(
      col("name"), col("about.value").as("av"), col("about.time.value").as("atv"),
      size(col("nested1")).as("n1"),
      col("nested1")(0).getField("description").as("desc"),
      size(col("nested1")(0).getField("nested2")).as("n2"),
      col("nested1")(0).getField("nested2")(0).getField("minutia").as("m0")
    ).collect()(0)
    assert(d10.getString(0) === "A")
    assert(d10.getString(1) === "a")
    assert(d10.getDate(2).toString === "1970-01-01")
    assert(d10.getInt(3) === 1)
    assert(d10.getString(4) === "aaa")
    assert(d10.getInt(5) === 3)
    assert(d10.getDouble(6) === 3.1415926539) // children key-ordered

    // null FK → null lookup (id=13 has about NULL)
    val d13 = docs.where(col("id") === 13).select(col("about")).collect()(0)
    assert(d13.isNullAt(0))
  }

  test("partitioned JDBC read: >1 input partition, identical golden docs") {
    val plan = SchemaWalk.walk(conn, refCfg)
    val keys = SchemaWalk.planKeys(plan)
    assert(keys === Map("fact_table" -> "id", "inner1" -> "id",
      "inner2" -> "id", "nested1" -> "id", "nested2" -> "id"))

    val parLoad = SchemaWalk.jdbcLoader(spark, url, keys.get, numPartitions = 3)
    // the scan itself is split: the reference streams through one cursor,
    // Spark-natively the key range fans out over parallel connections
    assert(parLoad("fact_table").rdd.getNumPartitions === 3)

    val single = DocAssembler.assemble(plan, SchemaWalk.jdbcLoader(spark, url))
    val parted = DocAssembler.assemble(plan, parLoad)
    assert(parted.count() === 12)
    // same docs regardless of read parallelism
    val flat = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("id"), col("name"), col("about.value"),
      size(col("nested1")), col("nested1")(0).getField("description"))
    assert(flat(parted).exceptAll(flat(single)).count() === 0)
    assert(flat(single).exceptAll(flat(parted)).count() === 0)

    // a table whose key can't be bounded falls back to one partition
    val noKey = SchemaWalk.jdbcLoader(spark, url, _ => Some("name"), numPartitions = 3)
    assert(noKey("fact_table").rdd.getNumPartitions === 1)
  }

  test("reference_only inlines the label column (reference test_inline)") {
    // with FKs shown, the designated field sits BESIDE the id — golden
    // "inline": about = {"id": 1, "value": "a"} (test_extract.py)
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      referenceOnly = Map("inner1" -> "value", "inner2" -> "value")))
    val docs = DocAssembler.assemble(plan, SchemaWalk.jdbcLoader(spark, url))
    val d10 = docs.where(col("id") === 10).select(
      col("about.id"), col("about.value"),
      col("nested1")(0).getField("about").getField("value").as("n1a")).collect()(0)
    assert(d10.getInt(0) === 1)
    assert(d10.getString(1) === "a")
    assert(d10.getDate(2).toString === "1970-01-01")

    // lean: the field REPLACES the object — golden "lean_inline"
    val leanPlan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      referenceOnly = Map("inner1" -> "value", "inner2" -> "value"),
      showForeignKeys = false))
    val lean10 = DocAssembler.assemble(leanPlan, SchemaWalk.jdbcLoader(spark, url))
      .where(col("id") === 10).select(col("about")).collect()(0)
    assert(lean10.getString(0) === "a")
  }

  test("lean docs (show_foreign_keys=false) omit id/fk columns everywhere") {
    val plan = SchemaWalk.walk(conn, refCfg).copy(showForeignKeys = false)
    // propagate leanness down the tree like the reference config does
    def leanify(p: SnowflakePlan): SnowflakePlan = p.copy(
      showForeignKeys = false,
      lookups = p.lookups.map(l => l.copy(plan = leanify(l.plan))),
      children = p.children.map(c => c.copy(plan = leanify(c.plan))))
    val docs = DocAssembler.assemble(leanify(plan), SchemaWalk.jdbcLoader(spark, url))
    val n1Type = docs.schema("nested1").dataType.simpleString
    // golden "lean": nested1 elements carry description/about/nested2 but
    // NOT id or ref (tests/test_extract.py expected_results["lean"])
    assert(!n1Type.contains("id:") && !n1Type.contains("ref:"), n1Type)
    assert(n1Type.contains("description"))
    val aboutType = docs.schema("about").dataType.simpleString
    assert(!aboutType.contains("id:"), aboutType)
  }

  // ---- FULL golden-document equality against the reference's own
  // expected extracts (tests/test_extract.py expected_results) --------------

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Normalize a JSON doc to the reference's output conventions (mo_json/
    * mo_dots): null fields omitted, empty objects/arrays omitted, single-
    * element arrays unwrapped to the element, whole doubles rendered as
    * ints, dates as unix seconds (the loader applies datesToUnix); object
    * keys sorted so equality is order-insensitive. */
  private def canon(v: JValue): JValue = v match {
    case JObject(fs) =>
      val kept = fs.map { case (k, x) => (k, canon(x)) }
        .filter { case (_, x) => x != JNull && x != JNothing }
        .sortBy(_._1)
      if (kept.isEmpty) JNothing else JObject(kept)
    case JArray(xs) =>
      xs.map(canon).filter(x => x != JNull && x != JNothing) match {
        case Nil           => JNothing
        case single :: Nil => single
        case many          => JArray(many)
      }
    case JDouble(d) if d.isWhole && math.abs(d) < 1e15 => JInt(BigInt(d.toLong))
    case x => x
  }

  private def docJson(df: org.apache.spark.sql.DataFrame, id: Int): JValue = {
    val rows = df.where(col("id") === id).toJSON.collect()
    assert(rows.length === 1, s"fact $id")
    canon(JsonMethods.parse(rows(0)))
  }

  private def expect(json: String): JValue = canon(JsonMethods.parse(json))

  private lazy val unixLoader: String => org.apache.spark.sql.DataFrame =
    t => DocAssembler.datesToUnix(SchemaWalk.jdbcLoader(spark, url)(t))

  test("golden equality: 'complex' and 'simple' docs (test_extract.py:184-186,223-252)") {
    val docs = DocAssembler.assemble(SchemaWalk.walk(conn, refCfg), unixLoader)
    assert(docJson(docs, 10) === expect("""{
      "about": {"id": 1, "time": {"id": -1, "value": 0}, "value": "a"},
      "id": 10, "name": "A",
      "nested1": {
        "about": {"id": -1, "value": 0},
        "description": "aaa", "id": 100,
        "nested2": [
          {"about": {"id": 1, "time": {"id": -1, "value": 0}, "value": "a"},
           "id": 1000, "minutia": 3.1415926539, "ref": 100},
          {"about": {"id": 2, "time": {"id": -2}, "value": "b"},
           "id": 1001, "minutia": 4, "ref": 100},
          {"about": {"id": 3, "value": "c"}, "id": 1002, "minutia": 5.1, "ref": 100}
        ],
        "ref": 10
      }
    }"""))
    // "simple" (data=[22]): a fact with no children and a null FK
    assert(docJson(docs, 22) === expect("""{"id": 22, "name": "L"}"""))
  }

  test("golden equality: 'lean' doc (test_extract.py:203-222)") {
    val plan = SchemaWalk.walk(conn, refCfg.copy(showForeignKeys = false))
    val docs = DocAssembler.assemble(plan, unixLoader)
    assert(docJson(docs, 10) === expect("""{
      "about": {"value": "a", "time": {"value": 0}},
      "id": 10, "name": "A",
      "nested1": {
        "about": {"value": 0},
        "description": "aaa",
        "nested2": [
          {"about": {"value": "a", "time": {"value": 0}}, "minutia": 3.1415926539},
          {"about": {"value": "b"}, "minutia": 4},
          {"about": {"value": "c"}, "minutia": 5.1}
        ]
      }
    }"""))
  }

  test("golden equality: 'inline' doc (test_extract.py:253-286)") {
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      referenceOnly = Map("inner1" -> "value", "inner2" -> "value")))
    val docs = DocAssembler.assemble(plan, unixLoader)
    assert(docJson(docs, 10) === expect("""{
      "about": {"id": 1, "value": "a"},
      "id": 10, "name": "A",
      "nested1": {
        "about": {"id": -1, "value": 0},
        "ref": 10, "description": "aaa",
        "nested2": [
          {"about": {"id": 1, "value": "a"}, "ref": 100, "id": 1000, "minutia": 3.1415926539},
          {"about": {"id": 2, "value": "b"}, "ref": 100, "id": 1001, "minutia": 4},
          {"about": {"id": 3, "value": "c"}, "ref": 100, "id": 1002, "minutia": 5.1}
        ],
        "id": 100
      }
    }"""))
  }

  test("golden equality: every 'lean_inline_all' doc (test_extract.py:287-351)") {
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      referenceOnly = Map("inner1" -> "value", "inner2" -> "value"),
      showForeignKeys = false))
    val docs = DocAssembler.assemble(plan, unixLoader)
    assert(docs.count() === 12)
    val expected = Map(
      10 -> """{"nested1": {"about": 0, "description": "aaa", "nested2": [
                 {"about": "a", "minutia": 3.1415926539}, {"about": "b", "minutia": 4},
                 {"about": "c", "minutia": 5.1}]}, "about": "a", "id": 10, "name": "A"}""",
      11 -> """{"nested1": {"description": "bbb", "nested2": {"about": "a", "minutia": 6.2}},
                 "about": "b", "id": 11, "name": "B"}""",
      12 -> """{"nested1": {"description": "ccc", "nested2": {"about": "c", "minutia": 7.3}},
                 "about": "c", "id": 12, "name": "C"}""",
      13 -> """{"nested1": {"about": 0, "description": "ddd"}, "id": 13, "name": "D"}""",
      15 -> """{"nested1": [{"about": 0, "description": "eee"}, {"about": 0, "description": "fff"}],
                 "about": "a", "id": 15, "name": "E"}""",
      16 -> """{"nested1": [{"description": "ggg"}, {"description": "hhh"}],
                 "about": "b", "id": 16, "name": "F"}""",
      17 -> """{"nested1": [{"description": "iii"}, {"description": "jjj"}],
                 "about": "c", "id": 17, "name": "G"}""",
      18 -> """{"nested1": [{"description": "kkk"}, {"description": "lll"}],
                 "id": 18, "name": "H"}""",
      19 -> """{"about": "a", "id": 19, "name": "I"}""",
      20 -> """{"about": "b", "id": 20, "name": "J"}""",
      21 -> """{"about": "c", "id": 21, "name": "K"}""",
      22 -> """{"id": 22, "name": "L"}""")
    for ((id, exp) <- expected.toSeq.sortBy(_._1))
      assert(docJson(docs, id) === expect(exp), s"fact $id")
  }

  test("exclude prunes the walk") {
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      referenceAll = Set("inner1"), exclude = Set("nested2", "inner2")))
    assert(plan.children.head.plan.children.isEmpty)
    assert(plan.lookups.head.plan.lookups.isEmpty)
    val docs = DocAssembler.assemble(plan, SchemaWalk.jdbcLoader(spark, url))
    assert(!docs.schema("nested1").dataType.simpleString.contains("nested2"))
  }

  test("addRelations merges undeclared edges") {
    // pretend nested1.about had no FK: exclude discovery via a fresh walk
    // on a config that adds a synthetic duplicate edge name — the walk
    // must not follow the same constraint twice
    val rels = SchemaWalk.discoverRelations(conn)
    assert(rels.map(_.name).distinct.size === rels.size)
    val plan = SchemaWalk.walk(conn, WalkConfig("fact_table",
      addRelations = Seq(SchemaWalk.Relation("syn_edge", "nested1", "ref", "fact_table", "id"))))
    // the synthetic duplicate of the child edge appears exactly once as a child
    assert(plan.children.count(_.plan.table == "nested1") <= 2)
  }
}

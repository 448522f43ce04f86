package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.container.{Container, FactStore, ListContainer}

case class DeepItem(sku: String, qty: Long)
case class DeepDoc(id: Long, tag: String, items: Seq[DeepItem])

/** Container API + FactStore mutation surface (reference
  * insert/update/upsert/delete, jx_sqlite/insert_table.py). */
class ContainerSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")

  test("ListContainer routes JX queries and formats") {
    import spark.implicits._
    val c = new ListContainer(spark, "people",
      Seq((1L, "ann", 34), (2L, "bo", 25), (3L, "cy", 41)).toDF("id", "name", "age"))
    val got = c.query("""{"from": ".", "select": ["name"],
      "where": {"gte": {"age": 30}}, "sort": ["name"]}""")
      .as[String].collect()
    assert(got.toSeq === Seq("ann", "cy"))
    assert(c.queryFormatted("""{"from": ".", "select": ["id"], "sort": ["id"],
      "format": "table"}""").contains("\"header\":[\"id\"]"))
  }

  test("FactStore: insert evolves schema, update/delete/upsert rewrite snapshots") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_store")
    val store = new FactStore(spark, "facts", dir)

    store.insert(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "score"))
    assert(store.dataFrame.count() === 2)

    // schema evolution: new column null-pads old rows
    store.insert(Seq((3L, "c", 30.0, "extra")).toDF("id", "tag", "score", "note"))
    assert(store.dataFrame.columns.toSet === Set("id", "tag", "score", "note"))
    assert(store.dataFrame.where(col("note").isNull).count() === 2)

    // update with JX where + JX set expression over the old row
    store.update("""{"eq": {"tag": "a"}}""", Map("score" -> """{"mul": ["score", 2]}"""))
    assert(store.dataFrame.where(col("id") === 1).select("score").as[Double].head() === 20.0)
    assert(store.dataFrame.where(col("id") === 2).select("score").as[Double].head() === 20.0)

    // a dot path into a column that doesn't exist still errors clearly
    intercept[IllegalArgumentException] {
      store.update("""{"eq": {"tag": "a"}}""", Map("nested.x" -> "1"))
    }

    // delete by predicate
    store.delete("""{"eq": {"id": 3}}""")
    assert(store.dataFrame.count() === 2)

    // upsert = replace by key + insert new
    store.upsert(Seq((2L, "b2", 99.0, null.asInstanceOf[String]),
      (4L, "d", 40.0, "new")).toDF("id", "tag", "score", "note"), "id")
    val after = store.dataFrame.orderBy("id").select("id", "tag").as[(Long, String)].collect()
    assert(after.toSeq === Seq((1L, "a"), (2L, "b2"), (4L, "d")))

    // container query over the store
    val names = store.query("""{"from": ".", "select": ["tag"],
      "where": {"gte": {"score": 40}}, "sort": ["tag"]}""")
      .collect().map(_.getString(0))
    assert(names.toSeq === Seq("b2", "d"))

    // snapshots are versioned: several v* dirs exist, marker points at last
    val versions = java.nio.file.Files.list(dir).filter(_.getFileName.toString.startsWith("v")).count()
    assert(versions >= 5)
  }

  test("deep update: child replacement, schema expansion, per-child field rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_deep")
    val store = new FactStore(spark, "deep", dir)
    store.insert(Seq(
      DeepDoc(1L, "a", Seq(DeepItem("x", 1L), DeepItem("y", 2L))),
      DeepDoc(2L, "b", Seq(DeepItem("z", 3L)))).toDF())

    // wholesale child replacement on the matching parent (reference
    // DELETE-children-joined-on-parent-PK + INSERT, insert_table.py:83-149);
    // the new docs carry a field the stored child schema lacks → expands,
    // null on the untouched parent's children
    store.update("""{"eq": {"tag": "a"}}""",
      Map("items" -> """[{"sku": "n1", "qty": 5, "price": 1.5}]"""))
    val afterReplace = store.dataFrame.orderBy("id")
      .select(col("id"), col("items")).collect()
    val id1Items = afterReplace(0).getSeq[org.apache.spark.sql.Row](1)
    assert(id1Items.map(r => (r.getAs[String]("sku"), r.getAs[Long]("qty"),
      r.getAs[Double]("price"))) === Seq(("n1", 5L, 1.5)))
    val id2Items = afterReplace(1).getSeq[org.apache.spark.sql.Row](1)
    assert(id2Items.map(r => (r.getAs[String]("sku"), r.getAs[Long]("qty"))) === Seq(("z", 3L)))
    assert(id2Items.forall(_.isNullAt(id2Items.head.fieldIndex("price"))))

    // per-child field rewrite: the JX value expression sees child fields
    store.update("""{"eq": {"tag": "b"}}""",
      Map("items.qty" -> """{"mul": ["qty", 10]}"""))
    val qty = store.dataFrame.orderBy("id")
      .select(explode(col("items.qty"))).as[Long].collect()
    assert(qty.toSeq === Seq(5L, 30L))

    // clearing: a null literal empties the matching parents' children
    store.update("""{"eq": {"tag": "a"}}""", Map("items" -> "null"))
    val cleared = store.dataFrame.orderBy("id").select(col("items").isNull).as[Boolean].collect()
    assert(cleared.toSeq === Seq(true, false))
  }

  test("time travel: every snapshot stays readable exactly as written") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_store_tt")
    val store = new FactStore(spark, "tt", dir)
    store.insert(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score"))     // v1
    store.update("""{"eq": {"id": 1}}""",
      Map("score" -> """{"literal": 99.0}"""))                        // v2
    store.delete("""{"eq": {"id": 2}}""")                             // v3
    assert(store.versions === (1 to 3))
    assert(store.dataFrameAt(1).orderBy("id").as[(Long, Double)].collect().toSeq
      === Seq((1L, 10.0), (2L, 20.0)))
    assert(store.dataFrameAt(2).orderBy("id").as[(Long, Double)].collect().toSeq
      === Seq((1L, 99.0), (2L, 20.0)))
    assert(store.dataFrameAt(3).as[(Long, Double)].collect().toSeq === Seq((1L, 99.0)))
    assert(store.dataFrame.as[(Long, Double)].collect().toSeq === Seq((1L, 99.0)),
      "current = latest snapshot")
    intercept[IllegalArgumentException] { store.dataFrameAt(0) }
    intercept[IllegalArgumentException] { store.dataFrameAt(4) }
    // retention: vacuum keeps the last 2, current stays readable,
    // vacuumed versions fail cleanly
    assert(store.vacuum(keepLast = 2) === Seq(1))
    assert(store.versions === Seq(2, 3))
    assert(store.dataFrame.count() === 1)
    intercept[IllegalArgumentException] { store.dataFrameAt(1) }
  }

  test("snapshot diff: added/removed/changed across schema evolution") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_store_diff")
    val store = new FactStore(spark, "d", dir)
    store.insert(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "score")) // v1
    store.delete("""{"eq": {"id": 3}}""")                                     // v2
    store.insert(Seq((4L, 40.0)).toDF("id", "score"))                         // v3
    store.update("""{"eq": {"id": 1}}""",
      Map("flag" -> """{"literal": "X"}"""))                                  // v4 (new col)
    val d = store.diff(1, 4, "id")
      .as[(String, Long)].collect().toSet
    assert(d === Set(("removed", 3L), ("added", 4L), ("changed", 1L)),
      s"got $d")
    // id 2 untouched: the schema-widening null flag is NOT a change
    assert(store.diff(1, 1, "id").count() === 0, "self-diff is empty")
  }

  test("nest migration: a column seen as scalar then array is promoted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nest")
    val store = new FactStore(spark, "facts", dir)

    // {x: 1} then {x: [1, 2]} — the reference's snowflake.py:117-202 case
    store.insert(Seq((1L, Some(7)), (2L, None)).toDF("id", "x"))
    store.insert(Seq((3L, Seq(1, 2))).toDF("id", "x"))
    val t = store.dataFrame.schema("x").dataType
    assert(t.isInstanceOf[org.apache.spark.sql.types.ArrayType], t.simpleString)
    val rows = store.dataFrame.orderBy("id")
      .select(col("x")).collect().map(r => Option(r.getSeq[Int](0)).map(_.toSeq))
    // scalar 7 → [7]; null stays null (never [null]); arrays pass through
    assert(rows.toSeq === Seq(Some(Seq(7)), None, Some(Seq(1, 2))))

    // the mirror direction: array-first store receives a scalar
    val store2 = new FactStore(spark, "facts2",
      java.nio.file.Files.createTempDirectory("graft_nest2"))
    store2.insert(Seq((1L, Seq("a", "b"))).toDF("id", "s"))
    store2.insert(Seq((2L, "c")).toDF("id", "s"))
    val rows2 = store2.dataFrame.orderBy("id")
      .select(col("s")).collect().map(_.getSeq[String](0).toSeq)
    assert(rows2.toSeq === Seq(Seq("a", "b"), Seq("c")))
  }

  test("numeric widening: int-then-double column widens, values preserved") {
    import spark.implicits._
    val store = new FactStore(spark, "nums",
      java.nio.file.Files.createTempDirectory("graft_widen"))
    store.insert(Seq((1L, 10), (2L, 20)).toDF("id", "x"))       // int
    store.insert(Seq((3L, 2.5)).toDF("id", "x"))                // double
    assert(store.dataFrame.schema("x").dataType ===
      org.apache.spark.sql.types.DoubleType)
    val got = store.dataFrame.orderBy("id").select("x").as[Double].collect()
    assert(got.toSeq === Seq(10.0, 20.0, 2.5))
    // and the mirror: double-first store receives ints
    store.insert(Seq((4L, 7)).toDF("id", "x"))
    assert(store.dataFrame.count() === 4)

    // long + float widens to DOUBLE (float's 24-bit mantissa would
    // silently round large longs)
    val s2 = new FactStore(spark, "lf",
      java.nio.file.Files.createTempDirectory("graft_widen_lf"))
    s2.insert(Seq((1L, 1234567890123L)).toDF("id", "x"))
    s2.insert(Seq((2L, 0.5f)).toDF("id", "x"))
    assert(s2.dataFrame.schema("x").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(s2.dataFrame.where(col("id") === 1).select("x").as[Double].head() === 1234567890123.0)
  }

  test("update: scalar set expressions and the where all see the OLD row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_swap")
    val store = new FactStore(spark, "swapper", dir)
    store.insert(Seq((1L, 10.0, 20.0), (2L, 3.0, 4.0)).toDF("id", "a", "b"))
    // {a -> b, b -> a} must SWAP (SQL UPDATE snapshot semantics) — a
    // sequential fold would chain one through the other in unordered
    // Map iteration order (review r9)
    store.update("""{"eq": {"id": 1}}""", Map("a" -> "\"b\"", "b" -> "\"a\""))
    val r = store.dataFrame.where(col("id") === 1)
      .select("a", "b").as[(Double, Double)].head()
    assert(r === ((20.0, 10.0)))
    // the predicate reads the OLD value even when the set rewrites the
    // same column: a=3 < 5 matches, its new value must not re-decide
    store.update("""{"lt": {"a": 5}}""", Map("a" -> """{"mul": ["a", 100]}"""))
    val r2 = store.dataFrame.orderBy("id").select("a").as[Double].collect()
    assert(r2.toSeq === Seq(20.0, 300.0))
  }

  test("update preserves a stored column named like the predicate marker") {
    import spark.implicits._
    // ADVICE r10: update() materializes the where-predicate under a
    // working column name; a user table that ALREADY has that name must
    // survive the update with its values intact (withColumn would
    // silently replace it and the final drop would delete it)
    val dir = java.nio.file.Files.createTempDirectory("graft_marker")
    val store = new FactStore(spark, "marked", dir)
    store.insert(Seq((1L, "keep1", 1.0), (2L, "keep2", 2.0))
      .toDF("id", "__graft_upd", "score"))
    store.update("""{"eq": {"id": 1}}""", Map("score" -> """{"mul": ["score", 10]}"""))
    val rows = store.dataFrame.orderBy("id")
      .select("__graft_upd", "score").as[(String, Double)].collect()
    assert(rows.toSeq === Seq(("keep1", 10.0), ("keep2", 2.0)))
  }

  test("container query: a relative child sharing the container-name prefix resolves") {
    import spark.implicits._
    // container "order", nested column "order_items": a bare startsWith
    // treated the from as already qualified and tried to load a TABLE
    // literally named "order_items" (review r9)
    val df = Seq((1L, Seq((2, "p1"), (1, "p2"))), (2L, Seq((5, "p3"))))
      .toDF("id", "items0")
      .select(col("id"),
        expr("transform(items0, x -> struct(x._1 as qty, x._2 as sku))").as("order_items"))
    val c = new ListContainer(spark, "order", df)
    val got = c.query("""{"from": "order_items", "select": ["qty"], "sort": ["qty"]}""")
      .as[Int].collect()
    assert(got.toSeq === Seq(1, 2, 5))
  }

  test("format:container round-trips query -> store -> query") {
    import spark.implicits._
    val c = new ListContainer(spark, "people",
      Seq((1L, "ann", 34), (2L, "bo", 25), (3L, "cy", 41)).toDF("id", "name", "age"))
    val dir = java.nio.file.Files.createTempDirectory("graft_qc")
    val derived = c.queryContainer("""{"from": ".", "select": ["name", "age"],
      "where": {"gte": {"age": 30}}}""", dir, "elders")
    // the result is a first-class container: query it again
    val got = derived.query("""{"from": ".", "select": ["name"], "sort": ["name"]}""")
      .as[String].collect()
    assert(got.toSeq === Seq("ann", "cy"))
    // and it is a mutable store like any other
    derived.insert(Seq(("dee", 50)).toDF("name", "age"))
    assert(derived.dataFrame.count() === 3)
    // queryFormatted refuses the container format (non-String result)
    intercept[IllegalArgumentException] {
      c.queryFormatted("""{"from": ".", "format": "container"}""")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.container.{Container, FactStore, ListContainer}

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

    // deep updates rejected like the reference
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
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke over the sf0.001 testdata: every catalog query runs and
  * returns sane shapes. Full value-level checking is the DuckDB oracle's job
  * (scripts/selfcheck.py); these tests catch runtime regressions fast. */
class QueryRunnerSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("edges densify: set-domain cube has exactly parts+null rows") {
    val df = SparkEntry.queries("q_edges_set")(spark, dir)
    assert(df.count() === 7) // 6 partitions + null bucket
  }

  test("default limit is 10, clamp at 10000") {
    import graft.jx._
    val q = JxQuery.parse("""{"from": "lineitem"}""")
    assert(q.limit === Some(10L))
    val df = QueryRunner.run(spark, q, SparkEntry.loader(spark, dir))
    assert(df.count() === 10)
  }
}

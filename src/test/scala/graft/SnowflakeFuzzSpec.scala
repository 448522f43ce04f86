package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.etl._

/** Model-based fuzz of the snowflake document assembly — random plan
  * SHAPES over the TPC-H relation graph, each checked against an
  * INDEPENDENT flat-join/aggregate oracle built per shape (join+groupBy
  * dataflow vs the assembler's struct/collect_list dataflow — a real
  * second computation, not a replay). The golden SchemaWalkSpec pins
  * the reference's four fixture configs verbatim; this spec draws new
  * shapes per seed: root ∈ {customer, orders, supplier}, optional
  * nation lookup (optionally reference_only, optionally nesting a
  * region lookup), optional child arm (orders ⊃ lineitems; lineitems
  * with an optional part lookup INSIDE the child), and the reference's
  * global lean flag (show_foreign_keys=false) propagated to every
  * level like walk() does.
  *
  * Invariants per shape: root row count; lookup payloads (struct field
  * vs reference_only inline vs lean-inline scalar); two-level lookup
  * descent; child array sizes and order-insensitive child sums for
  * EVERY parent (zero-child parents included); grandchild totals
  * through nested arrays; lookup-inside-child payloads element-wise. */
class SnowflakeFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  private val load = SparkEntry.loader(spark, "/root/testdata/sf0.001")

  private def nationPlan(refOnly: Boolean, withRegion: Boolean, lean: Boolean) =
    SnowflakePlan("nation", "n_nationkey",
      lookups = if (withRegion && !refOnly)
        Seq(Lookup("n_regionkey", "region",
          SnowflakePlan("region", "r_regionkey", showForeignKeys = !lean)))
      else Nil,
      referenceOnly = if (refOnly) Some("n_name") else None,
      showForeignKeys = !lean)

  /** nation payload access on the doc side, per the flag semantics the
    * assembler documents (reference_only × show_foreign_keys). */
  private def nationName(refOnly: Boolean, lean: Boolean) =
    if (refOnly && lean) col("nation").cast("string")
    else col("nation.n_name").cast("string")

  private def assertSame(tag: String, got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val w = want.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val diffs = g.zipAll(w, null, null).filter { case (a, b) => a != b }.take(3)
    assert(g.size == w.size && diffs.isEmpty,
      s"$tag: ${g.size} vs ${w.size} rows; first diffs: $diffs")
  }

  for (seed <- Seq(101L, 202L, 303L)) {
    test(s"random snowflake shapes assemble to the flat-join oracle (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      for (round <- 0 until 3) {
        val lean = rnd.nextBoolean()
        val refOnly = rnd.nextBoolean()
        val withRegion = rnd.nextBoolean()
        rnd.nextInt(3) match {
          // -- customer ⊃ orders ⊃ lineitems, nation lookup ------------
          case 0 =>
            val withOrders = rnd.nextBoolean()
            val withLineitems = withOrders && rnd.nextBoolean()
            val ordersPlan = SnowflakePlan("orders", "o_orderkey",
              children = if (withLineitems)
                Seq(Child("l_orderkey", "lineitems",
                  SnowflakePlan("lineitem", "l_orderkey", showForeignKeys = !lean)))
              else Nil,
              showForeignKeys = !lean)
            val plan = SnowflakePlan("customer", "c_custkey",
              lookups = Seq(Lookup("c_nationkey", "nation", nationPlan(refOnly, withRegion, lean))),
              children = if (withOrders) Seq(Child("o_custkey", "orders", ordersPlan)) else Nil,
              showForeignKeys = !lean)
            val docs = DocAssembler.assemble(plan, load)
            val cust = load("customer"); val nat = load("nation")
            assert(docs.count() === cust.count())
            assertSame(s"s$seed r$round cust-nation(lean=$lean,ref=$refOnly)",
              docs.select(col("c_custkey"), nationName(refOnly, lean)),
              cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "left")
                .select(col("c_custkey"), col("n_name").cast("string")))
            if (withRegion && !refOnly)
              assertSame(s"s$seed r$round cust-region",
                docs.select(col("c_custkey"), col("nation.region.r_name")),
                cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "left")
                  .join(load("region"), nat("n_regionkey") === col("r_regionkey"), "left")
                  .select(col("c_custkey"), col("r_name")))
            if (withOrders) {
              assertSame(s"s$seed r$round cust-orders",
                docs.select(col("c_custkey"),
                  F.size(F.coalesce(col("orders"), F.array())).as("n"),
                  F.round(F.coalesce(F.expr(
                    "aggregate(orders, 0D, (acc, x) -> acc + coalesce(x.o_totalprice, 0D))"),
                    F.lit(0.0)), 2).as("tot")),
                cust.join(load("orders"), col("c_custkey") === col("o_custkey"), "left")
                  .groupBy("c_custkey")
                  .agg(F.count(col("o_orderkey")).cast("int").as("n"),
                    F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).as("tot")))
              if (withLineitems)
                assertSame(s"s$seed r$round cust-grandchild",
                  docs.select(col("c_custkey"), F.coalesce(F.expr(
                    "aggregate(orders, 0, (acc, o) -> acc + coalesce(size(o.lineitems), 0))"),
                    F.lit(0)).as("nli")),
                  cust.join(load("orders"), col("c_custkey") === col("o_custkey"), "left")
                    .join(load("lineitem"), col("o_orderkey") === col("l_orderkey"), "left")
                    .groupBy("c_custkey")
                    .agg(F.count(col("l_linenumber")).cast("int").as("nli")))
            }
          // -- orders ⊃ lineitems (optional part lookup inside) --------
          case 1 =>
            val partInside = rnd.nextBoolean()
            val liPlan = SnowflakePlan("lineitem", "l_orderkey",
              lookups = if (partInside)
                Seq(Lookup("l_partkey", "part",
                  SnowflakePlan("part", "p_partkey", showForeignKeys = !lean)))
              else Nil,
              showForeignKeys = !lean)
            val plan = SnowflakePlan("orders", "o_orderkey",
              lookups = Seq(Lookup("o_custkey", "customer",
                SnowflakePlan("customer", "c_custkey", showForeignKeys = !lean))),
              children = Seq(Child("l_orderkey", "lineitems", liPlan)),
              showForeignKeys = !lean)
            val docs = DocAssembler.assemble(plan, load)
            val ord = load("orders")
            assert(docs.count() === ord.count())
            assertSame(s"s$seed r$round ord-cust(lean=$lean)",
              docs.select(col("o_orderkey"), col("customer.c_name")),
              ord.join(load("customer"), col("o_custkey") === col("c_custkey"), "left")
                .select(col("o_orderkey"), col("c_name")))
            assertSame(s"s$seed r$round ord-li",
              docs.select(col("o_orderkey"),
                F.size(F.coalesce(col("lineitems"), F.array())).as("n"),
                F.round(F.coalesce(F.expr(
                  "aggregate(lineitems, 0D, (acc, x) -> acc + coalesce(x.l_quantity, 0D))"),
                  F.lit(0.0)), 2).as("qty")),
              ord.join(load("lineitem"), Seq("o_orderkey").map(_ => col("o_orderkey") === col("l_orderkey")).head, "left")
                .groupBy("o_orderkey")
                .agg(F.count(col("l_linenumber")).cast("int").as("n"),
                  F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).as("qty")))
            if (partInside) {
              // element-wise: every exploded lineitem carries the right
              // part payload (lookup INSIDE a child arm)
              assertSame(s"s$seed r$round ord-li-part",
                docs.select(col("o_orderkey"), F.explode_outer(col("lineitems")).as("li"))
                  .where(col("li").isNotNull)
                  .select(col("o_orderkey"), col("li.l_linenumber"), col("li.part.p_name")),
                load("lineitem").join(load("part"), col("l_partkey") === col("p_partkey"), "left")
                  .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("p_name")))
            }
          // -- supplier with nation(→region) lookup --------------------
          case 2 =>
            val plan = SnowflakePlan("supplier", "s_suppkey",
              lookups = Seq(Lookup("s_nationkey", "nation", nationPlan(refOnly, withRegion, lean))),
              showForeignKeys = !lean)
            val docs = DocAssembler.assemble(plan, load)
            val sup = load("supplier")
            assert(docs.count() === sup.count())
            assertSame(s"s$seed r$round supp-nation(lean=$lean,ref=$refOnly)",
              docs.select(col("s_suppkey"), nationName(refOnly, lean)),
              sup.join(load("nation"), col("s_nationkey") === col("n_nationkey"), "left")
                .select(col("s_suppkey"), col("n_name").cast("string")))
        }
      }
    }
  }
}

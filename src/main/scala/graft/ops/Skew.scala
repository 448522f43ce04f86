package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join/group keys at 100 TB scale. AQE's skew
 * handling (`spark.sql.adaptive.skewJoin`, on by default in
 * GraftSession) covers sort-merge joins; salting is the explicit tool
 * for hot-key aggregation and broadcast-ineligible joins:
 *
 *  - `saltedJoin`: the big side gets a random salt in [0, salts);
 *    the small side is replicated ×salts — the hot key's rows spread
 *    over `salts` reducers instead of one straggler.
 *  - `twoPhaseAgg`: partial aggregate on (key, salt), then final
 *    aggregate on key — same two-shuffle shape Spark's own partial
 *    aggregation uses, made explicit for algebraic custom aggregates.
 */
object Skew {

  /** Deterministic pseudo-salt derived from the row's HASHABLE columns
    * (stable across retries — rand() would break task re-execution
    * determinism). Map-typed columns are skipped: xxhash64 rejects
    * MapType and would fail the whole plan (review r9); the remaining
    * columns spread a hot key just as well. */
  def salt(df: DataFrame, salts: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty, "salt: no hashable (non-map) columns to derive a salt from")
    pmod(xxhash64(cols.toIndexedSeq: _*), lit(salts)).cast("int")
  }

  /** Equi-join `big ⋈ small` on `key`, spreading hot keys over `salts`
    * partitions. `small` is replicated ×salts (use only when small is
    * modest but above the broadcast threshold). INNER/LEFT/SEMI/ANTI
    * only: replicating the small side makes right/full outer joins emit
    * one null-extended copy of an unmatched small row PER SALT
    * (review r9), so those types are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val safe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(safe(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side " +
        "rows once per salt replica — use AQE skew handling for outer joins")
    val b = big.withColumn("__salt", salt(big, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** [[saltedJoin]] with sketch-driven TARGETED salting — the production
    * shape: full salting replicates the small side ×salts for EVERY key,
    * paying shuffle width on the cold tail that never needed it. Here
    * [[Sketches.heavyHitters]] detects the hot keys exactly (bounded
    * tree-merged Misra-Gries state, ≤ k driver candidates at any
    * partition count); only hot-key rows take the salted path, the cold
    * tail joins plain, and the union is EQUIVALENT to the plain inner
    * join (spec-pinned). `k = 0` (default) sizes the sketch from the
    * data ([[Sketches.heavyHittersAuto]]) so the `hotMinFreq > N/k`
    * exactness bound holds at any row count — one extra column-pruned
    * count, trivial next to the join; a positive `k` pins the sketch
    * size and throws when the table outgrows k·hotMinFreq. Inner joins
    * only: splitting the probe side changes outer-join null
    * production. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String, salts: Int,
                     hotMinFreq: Long, k: Int = 0): DataFrame = {
    val hot = broadcast(
      (if (k > 0) Sketches.heavyHitters(big, key, k, hotMinFreq)
       else Sketches.heavyHittersAuto(big, key, hotMinFreq)).select(col(key)))
    val bigHot = big.join(hot, Seq(key))
    val bigCold = big.join(hot, Seq(key), "left_anti")
    saltedJoin(bigHot, small.join(hot, Seq(key)), key, salts)
      .unionByName(bigCold.join(small, Seq(key)))
  }

  /** Two-phase aggregation: sum-like aggregates on (key, salt) partials,
    * then re-aggregate by key. `partials` maps output column name →
    * (partial agg of input, final re-agg of the partial column). */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
                  partials: Map[String, (Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", salt(df, salts))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (c, _)) => c.as(n) }.toSeq: _*)
    partial.groupBy(col(key))
      .agg(partials.head._2._2(partials.head._1).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(n).as(n) }.toSeq: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical co-location for the repeated big⋈big equi-join: bucketed,
  * in-bucket-sorted table layout (Spark's native clustered storage).
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
  * BOTH sides on the key, every time the join runs. Bucketing pays that
  * shuffle once, at write time: [[writeBucketed]] hash-partitions rows
  * into a fixed bucket count by the join key (Spark's bucket function is
  * the same Murmur3 hash `repartition` uses, so the pre-repartition
  * guarantees one file per bucket and the in-bucket sort survives) and
  * records the layout in the catalog. Every later equi-join or
  * aggregation on the bucket key reads both sides already co-located:
  * SortMergeJoin with NO Exchange and NO per-query Sort — PlanSpec pins
  * that contract, and `q_bucketed_join` proves result-equality against
  * the plain join oracle.
  *
  * The bucket count is a cluster-level design choice — roughly
  * (table size / target partition size), and IDENTICAL on both sides of
  * the intended join (mismatched counts re-shuffle the smaller side).
  */
object Bucketing {

  /** Register database `db` at an explicit filesystem location
    * (idempotent) — keeps bucketed tables out of the default
    * `spark-warehouse` under the process CWD. */
  def ensureDatabase(spark: SparkSession, db: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$location'")

  /** Remove a stale on-disk managed-table location left behind by an
    * earlier JVM: an in-memory catalog dies with its session but its
    * managed files do not, and CTAS refuses to reuse an existing
    * location. Call when the catalog does NOT know the table but its
    * location may still hold files. */
  def clearStaleLocation(path: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(path))

  /** Persist `df` as a bucketed + in-bucket-sorted parquet table. The
    * repartition aligns task boundaries with bucket boundaries (same
    * Murmur3 hash), so each bucket is exactly one file — the layout the
    * downstream sort-elimination requires (many files per bucket keep
    * the exchange-free property but force a re-sort). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket keys. The merge
    * hint pins the sort-merge strategy the bucket layout serves (a
    * broadcast would hide the exchange-free property under test — and at
    * the fact⋈fact scale bucketing exists for, broadcast isn't on the
    * table anyway); with matching bucket counts the physical plan has no
    * Exchange and no Sort above the scans. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), col(leftKey) === col(rightKey))
}

package graft

import org.apache.spark.sql.SparkSession

/**
 * SparkSession factory with the settings the JX semantics assume:
 *
 *  - ANSI off: JX arithmetic yields "missing" (null) on /0, bad casts,
 *    etc. (reference expressions.py:918-922) — Spark 4's ANSI default
 *    would raise instead.
 *  - TIMESTAMP_NTZ inference off: parquet naive timestamps load as
 *    TimestampType; with session TZ pinned to UTC the values are
 *    identical and remain castable to epoch seconds.
 *  - nanosAsLong: Spark has no nanosecond timestamp; TIMESTAMP(NANOS)
 *    parquet columns load as Long and [[SparkEntry.loader]] converts
 *    them to microsecond timestamps (same truncation DuckDB applies).
 *  - AQE on; shuffle partitions default to the local core count (the
 *    200 default is wrong for local mode; on a real cluster, callers
 *    should size this to ~2-3× total executor cores).
 */
object GraftSession {
  /** `cores` is a MASTER token ("*" and "N,F" retry syntax are legal);
    * spark.sql.shuffle.partitions must be an integer — derive it from
    * the LEADING integer of the token (so "8,3" retry syntax sizes
    * shuffles to 8, not availableProcessors — review r10), falling
    * back to the machine's core count only for "*". */
  private[graft] def shufflePartitions(cores: String): String = {
    val leading = cores.takeWhile(_.isDigit)
    if (leading.nonEmpty) {
      // fail HERE, not three stages later: "0" or "0,3" would set
      // spark.sql.shuffle.partitions=0, an invalid conf whose error
      // surfaces far from the bad master token (review r11)
      require(leading.length <= 9 && leading.toInt >= 1,
        s"master token must start with a positive thread count: '$cores'")
      leading
    } else {
      // only the wildcard forms legitimately carry no count; any other
      // non-digit token is a typo that must not silently become
      // availableProcessors (review r11)
      require(cores == "*" || cores.startsWith("*,"),
        s"unrecognized master token: '$cores'")
      Runtime.getRuntime.availableProcessors().toString
    }
  }

  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder = {
    val partitions = shufflePartitions(cores)
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // with ANSI off, legacy sizeOfNull would make size(null) = -1;
      // JX missing-propagation needs size(null) = null
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Generated-class cache sized for a production session, not a
      // notebook: the default 100 entries is smaller than ONE complex
      // query's codegen-unit count (the nested cross-type sorts emit
      // enough units to evict themselves — their RE-runs burned ~9 s of
      // JIT on freshly recompiled classes), and far smaller than this
      // catalog's 143 queries. Misses cost a Janino compile + a new
      // class + its JIT warmup; over a long session that churn competes
      // with executor threads for CPU (round-7 telemetry: 313 s of
      // cumulative JIT over one bench run at the default size). Entries
      // are keyed by generated source and shared plan-wide; 4096 bounds
      // the cache at tens of MB of metaspace.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
  }

  def get(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

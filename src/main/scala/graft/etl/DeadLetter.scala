package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dead-letter routing for JSON ingestion — the quarantine pattern every
  * production feed needs: rows whose payload fails to parse must neither
  * kill the job (FAILFAST) nor silently become all-null rows (bare
  * PERMISSIVE); they route to a quarantine output carrying the ORIGINAL
  * payload for replay after the producer is fixed.
  *
  * `from_json` returns a null struct for unparseable input, so validity
  * is one null check and routing is a codegen'd projection in the scan —
  * zero shuffle, no UDF, the malformed row's raw bytes preserved. At
  * 100 TB the two routes are two filters over one scan (Spark reuses the
  * parse via subexpression elimination); writers send `route='main'` to
  * the table and `route='dead_letter'` to the quarantine sink.
  *
  * Reference behavior note: the reference ETL trusts its own JSON writer
  * end-to-end (mysql_to_s3 produces, never re-ingests); this operator
  * covers the re-ingestion half a Spark-native pipeline adds.
  */
object DeadLetter {

  /** Parse `jsonCol` against a DDL `schema` ("k LONG, s STRING"),
    * keeping the raw payload. Output = input + (parsed struct, ok,
    * route). Malformation is detected via the corrupt-record column,
    * NOT a bare null check: PERMISSIVE mode SALVAGES truncated JSON
    * into a partially/fully-null struct (`{"k": 1, "s": "v` parses to
    * a non-null struct), so `parsed IS NOT NULL` alone routes corrupt
    * rows to main — the exact silent-data-loss this operator exists to
    * prevent. With `columnNameOfCorruptRecord` the parser records the
    * raw text of any malformed row inside the struct, and validity is
    * that field's nullness. Salvaged field values of malformed rows
    * must be treated as garbage — mask them with `ok` downstream. */
  def parse(df: DataFrame, jsonCol: String, schema: String): DataFrame =
    df.withColumn("parsed", from_json(col(jsonCol),
        schema + ", _corrupt_record STRING",
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("ok",
        col("parsed").isNotNull && col("parsed._corrupt_record").isNull)
      .withColumn("route", when(col("ok"), lit("main")).otherwise(lit("dead_letter")))

  def mainRoute(parsed: DataFrame): DataFrame = parsed.where(col("ok"))
  def deadLetters(parsed: DataFrame): DataFrame = parsed.where(!col("ok"))
}

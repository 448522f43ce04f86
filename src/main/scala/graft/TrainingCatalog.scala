package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * Training-data pipeline operators as oracle-checked catalog entries:
 * deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash),
 * similarity search over embeddings, text analysis, and multimodal
 * metadata plumbing — run over the `documents` / `embeddings` tables.
 *
 * Oracles replicate each formula in DuckDB SQL. Where the operator
 * depends on engine-native hashing (xxhash64: MinHash, SimHash, LSH
 * signatures) the verified OUTPUT is still oracle-checkable when the
 * verification step recomputes an exact measure (minhash_lsh → exact
 * Jaccard); purely hash-valued outputs are rows-only.
 */
object TrainingCatalog {

  type Q = (SparkSession, String) => DataFrame

  /** Entry families live in their own files (split for maintainability;
    * entries unchanged): text/tokenize, dedup, similarity/embeddings,
    * events, eval/stats/profiling, sampling/packing/budget,
    * graph/sketches, multimodal, and pipeline compositions. */
  val catalog: Map[String, (Q, Option[String])] =
    TrainingTextEntries.entries ++
    TrainingDedupEntries.entries ++
    TrainingSimEntries.entries ++
    TrainingEventsEntries.entries ++
    TrainingEvalEntries.entries ++
    TrainingSamplingEntries.entries ++
    TrainingGraphEntries.entries ++
    TrainingMultimodalEntries.entries ++
    TrainingPipelineEntries.entries

  def queries: Map[String, Q] = catalog.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = catalog.collect { case (k, (_, Some(o))) => k -> o.trim }
}


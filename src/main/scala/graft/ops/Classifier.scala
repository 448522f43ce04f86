package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality classification — the fastText-style linear
 * bag-of-words filter every large pretraining pipeline runs between raw
 * crawl and training mix (CCNet / GPT-3 / LLaMA all gate on one; the
 * reference corpus-curation surface this extends is the rule-based
 * `TextAnalysis.qualityScore`, cf. /root/reference/mysql_to_s3's role as
 * the corpus EXTRACTION stage whose output such filters consume).
 *
 * Two training paths, both cluster-shaped:
 *
 *  - [[nbTrainScore]] — closed-form multinomial Naive Bayes. Training is
 *    ONE token-keyed shuffle (per-token class counts), scoring is a
 *    broadcast join of the (vocab-sized, i.e. small) weight table plus
 *    one doc-keyed sum. Fully deterministic and SQL-expressible, so it
 *    carries the DuckDB oracle entry.
 *  - [[trainLogReg]] / [[scoreLogReg]] — full-batch logistic regression
 *    by gradient descent: weights live on the driver (D doubles),
 *    each epoch broadcasts them and reduces one D-dim gradient with
 *    `treeAggregate` (depth 2 — partial sums combine executor-side, the
 *    driver sees O(√P) partials, not P). The hashed feature space
 *    ([[hashedTf]]) bounds the model at D regardless of corpus vocab, so
 *    the same loop runs unchanged at 100 TB: epochs × (1 broadcast +
 *    1 tree-reduce), no shuffle of the data itself.
 */
object Classifier {

  // ---------------------------------------------------------------- NB --

  /** Multinomial Naive Bayes with Laplace smoothing, trained and scored
    * on the same frame (the corpus-curation shape: fit the filter on the
    * labeled slice, score everything). Returns (idCol, score, pred):
    * score = log-prior-odds + Σ_tokens log-odds(token), rounded to 6
    * decimals; pred = rounded score > 0.
    *
    * Token log-odds w(t) = ln((c1+1)/(T1+V)) − ln((c0+1)/(T0+V)) with
    * c_k = occurrences of t in class k, T_k = total class-k tokens,
    * V = distinct vocabulary; prior b = ln((n1+1)/(n0+1)) over doc
    * counts. Blank/null docs score the bare prior.
    *
    * Plan: one explode + token-keyed count shuffle (train), the totals
    * as a 1-row broadcast denominator, a broadcast join of the weight
    * table onto the exploded tokens, one doc-keyed sum (score). The
    * weight table is vocab-sized — small relative to the corpus by
    * Heaps' law; for unbounded vocab swap [[hashedTf]] + [[trainLogReg]]. */
  def nbTrainScore(df: DataFrame, idCol: String, textCol: String,
                   labelCol: Column): DataFrame = {
    val (w, pri) = nbWeights(df, textCol, labelCol)
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
    val sums = toks.join(broadcast(w), Seq("__tok"))
      .groupBy(idCol).agg(sum("__w").as("__s"))
    df.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .crossJoin(broadcast(pri))
      .select(col(idCol),
        round(col("__b") + coalesce(col("__s"), lit(0.0)), 6).as("score"))
      .withColumn("pred", col("score") > 0.0)
  }

  /** Shared NB training kernel — ONE definition of the smoothing
    * formula so batch scoring ([[nbTrainScore]]) and the serving
    * export ([[nbFit]]) can never desynchronize (q_stream_quality
    * asserts their outputs byte-equal). A null label counts as class 0
    * (matching the oracle's CASE WHEN ... ELSE 0 — an unknown label is
    * a non-match, not a skipped row). Returns the (token, __w) weight
    * table and the 1-row prior frame (__b). */
  private def nbWeights(df: DataFrame, textCol: String,
                        labelCol: Column): (DataFrame, DataFrame) = {
    val y = coalesce(labelCol.cast("int"), lit(0))
    val toks = df.select(y.as("__y"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .select(col("__y"), explode(col("__t")).as("__tok"))
    val cnt = toks.groupBy("__tok").agg(
      sum(col("__y")).as("__c1"),
      sum(lit(1) - col("__y")).as("__c0"))
    val tot = cnt.agg(
      sum("__c1").as("__t1"), sum("__c0").as("__t0"),
      count(lit(1)).as("__v"))
    val w = cnt.crossJoin(broadcast(tot)).select(
      col("__tok"),
      (log((col("__c1") + 1.0) / (col("__t1") + col("__v"))) -
       log((col("__c0") + 1.0) / (col("__t0") + col("__v")))).as("__w"))
    val pri = df.agg(
      log((sum(y) + 1.0) / (sum(lit(1) - y) + 1.0)).as("__b"))
    (w, pri)
  }

  /** A fitted NB model exported for SERVING: per-token log-odds +
    * log-prior-odds. Vocab-bounded (small by Heaps' law) — the shape a
    * stream scorer broadcasts. */
  final case class NbModel(weights: Map[String, Double], prior: Double)

  /** Fit the same multinomial NB as [[nbTrainScore]] and COLLECT the
    * (vocab-sized) weight table to the driver — the model-export path
    * for serving (train batch-side once, broadcast into a stream).
    * Same one-shuffle training plan; only the vocab-bounded weights
    * ever reach the driver. */
  def nbFit(df: DataFrame, textCol: String, labelCol: Column): NbModel = {
    val (w, pri) = nbWeights(df, textCol, labelCol)
    NbModel(
      w.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap,
      pri.head().getDouble(0))
  }

  /** Score text under an exported [[NbModel]] as pure Column algebra —
    * stateless and map-side, so it runs unchanged inside a streaming
    * micro-batch (no aggregation, no watermark): prior + Σ per-token
    * weight via a broadcast map literal, rounded to 6 dp (the
    * [[nbTrainScore]] output convention). Tokens outside the model
    * contribute 0 — mirroring the batch scorer's inner weight join. */
  def nbScoreColumn(text: Column, model: NbModel): Column = {
    val keys = model.weights.keys.toSeq
    // an EMPTY model (degenerate corpus: all text blank/null) scores the
    // bare prior — map_from_arrays over zero-element NullType arrays
    // fails analysis (review r9), and the batch scorer already handles
    // the same corpus by scoring the prior
    if (keys.isEmpty) return round(lit(model.prior), 6)
    val m = map_from_arrays(
      array(keys.map(lit(_)): _*),
      array(keys.map(k => lit(model.weights(k))): _*))
    val toks = TextAnalysis.tokens(lower(text))
    val s = aggregate(coalesce(toks, array().cast("array<string>")), lit(0.0),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0.0)))
    round(lit(model.prior) + s, 6)
  }

  // -------------------------------------------------- hashed features --

  /** Feature-hashed term-frequency vectors: token → bucket
    * MurmurHash3(token) mod dim, value = occurrence count. Bounds the
    * model at `dim` doubles regardless of vocabulary (the trick that
    * lets one driver-resident weight vector cover a 100-TB crawl's
    * vocab). Per-row map in the scan stage, zero shuffle. */
  def hashedTf(df: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val spark = df.sparkSession
    import spark.implicits._
    // a non-numeric id (hex hash, URL) casts to null and the Dataset
    // encoder dies mid-stage with an error that never names the column
    // (review r9) — fail at the first bad row with a message that does
    df.select(
        when(col(idCol).cast("long").isNull,
          raise_error(concat(lit(s"hashedTf: id column '$idCol' is null or "),
            lit("not numeric — pre-map ids to longs (e.g. xxhash64)"))).cast("long"))
          .otherwise(col(idCol).cast("long")).as("__id"),
        col(textCol).cast("string").as("__text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val f = new Array[Double](dim)
        if (text != null) {
          val t = text.trim.toLowerCase
          if (t.nonEmpty) t.split("\\s+").foreach { tok =>
            val b = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(tok), dim)
            f(b) += 1.0
          }
        }
        (id, f)
      }.toDF(idCol, "features")
  }

  // ---------------------------------------------------------------- LR --

  /** Full-batch logistic-regression training over (features, label)
    * rows. Per epoch: broadcast the D-dim weights, `treeAggregate` the
    * exact loss gradient (depth 2), take one step on the driver. L2 at
    * `reg`. Deterministic given a deterministic input (float reduce
    * order varies only below the 1e-6 decision granularity used by
    * callers). Returns the learned weights, bias last (dim+1 entries —
    * callers append the implicit intercept feature). */
  def trainLogReg(df: DataFrame, featuresCol: String, labelCol: String,
                  dim: Int, epochs: Int = 30, lr: Double = 0.5,
                  reg: Double = 1e-4): Array[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .as[(Array[Double], Double)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = data.count().toDouble
      require(n > 0, "empty training set")
      var w = new Array[Double](dim + 1) // bias last
      for (_ <- 0 until epochs) {
        val bw = spark.sparkContext.broadcast(w)
        val grad = data.treeAggregate(new Array[Double](dim + 1))(
          seqOp = { (g, row) =>
            val (x, y) = row
            val wv = bw.value
            var z = wv(dim)
            var i = 0
            while (i < dim) { z += wv(i) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-z))
            val d = p - y
            i = 0
            while (i < dim) { g(i) += d * x(i); i += 1 }
            g(dim) += d
            g
          },
          combOp = { (a, b) =>
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          },
          depth = 2)
        bw.destroy()
        val next = new Array[Double](dim + 1)
        var i = 0
        while (i <= dim) {
          val l2 = if (i < dim) reg * w(i) else 0.0 // don't regularize bias
          next(i) = w(i) - lr * (grad(i) / n + l2)
          i += 1
        }
        w = next
      }
      w
    } finally { data.unpersist(); () }
  }

  /** Score hashed-TF rows under trained weights: sigmoid of the dot
    * product, as Column algebra (`zip_with` + `aggregate`) — codegen'd,
    * runs in the scan stage. `weights` has dim+1 entries, bias last. */
  def scoreLogReg(features: Column, weights: Array[Double]): Column = {
    val dim = weights.length - 1
    val wLit = array(weights.take(dim).map(lit(_)).toSeq: _*)
    val z = aggregate(
      zip_with(features, wLit, (a, b) => a * b),
      lit(weights(dim)), (acc, v) => acc + v)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}

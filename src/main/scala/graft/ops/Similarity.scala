package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.native

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`array<float>`).
 *
 *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
 *    The query set is broadcast; the corpus streams through one
 *    projection + per-query top-k, no corpus shuffle.
 *  - `lshTopK`: random-hyperplane (SimHash-for-vectors) bucketing — the
 *    scale path. Corpus is bucketed once by signature; each query probes
 *    its own bucket plus all Hamming-1 neighbors (multi-probe), so the
 *    candidate set is |corpus| / 2^planes × (planes+1) per query.
 *  - `cosinePairs`: all-pairs near-duplicate detection by cosine.
 *
 * Dot products run through a native codegen'd Catalyst expression
 * ([[graft.functions.DotProductDouble]]) — left-to-right IEEE double
 * summation, deterministic and reproducible across engines, no
 * interpreted higher-order functions in the hot path.
 */
object Similarity {

  /** Cast to double once; all math is double for reproducibility. */
  def vecD(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd kernel (see graft.functions.DotProductDouble). */
  def dot(a: Column, b: Column): Column = native.dotD(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column = {
    val d = sqrt(norm2(a) * norm2(b))
    when(d =!= 0.0, dot(a, b) / d)
  }

  /** SIZING RULE for the RHP-LSH `planes` parameter: each table splits
    * the corpus into 2^planes buckets, and the bucket self-join / probe
    * join costs O(sum of squared bucket sizes) — so `planes` must GROW
    * with the corpus: `planes ≈ log2(n / targetBucket)`. The library
    * default `planes = 4` (16 buckets/table) is sized for ~10^4-10^6
    * vector corpora; left at 4 on a 10^9-vector corpus every bucket holds
    * n/16 and the candidate join reverts to near-quadratic — THE one way
    * a caller can silently recreate the all-pairs scan the LSH tier
    * exists to avoid. Raising `planes` trades recall per table
    * (compensate with `tables`); bucket-occupancy balance is asserted in
    * OpsSpec. */
  def planesFor(corpusCount: Long, targetBucket: Long = 4096L): Int =
    math.max(1, math.ceil(
      math.log(math.max(1.0, corpusCount.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** Per-group centroid (element-wise mean) of an embedding column —
    * cluster summaries, class prototypes, IVF seeding. Declarative and
    * fully distributed: posexplode to (group, pos, x), ONE partial-
    * aggregated sum/count shuffle on (group, pos), then reassembly of
    * the (tiny: groups × dim) result into ordered arrays. The corpus
    * never passes through a window or a driver collect; map-side combine
    * shrinks the explode to groups × dim × partitions rows before the
    * shuffle. Means are rounded to 6 dp: distributed float summation is
    * partition-order-dependent in the far decimals. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String = "embedding"): DataFrame = {
    val ex = df.select(col(groupCol).as("g"),
      posexplode(vecD(col(vecCol))).as(Seq("pos", "x")))
    // the mean divides by count(x) — non-null values only — so a null
    // ELEMENT inside an embedding is skipped, not silently averaged as
    // zero (review r9); n_vecs stays the row count
    val sums = ex.groupBy(col("g"), col("pos"))
      .agg(sum(col("x")).as("s"), count(col("x")).as("n"), count(lit(1)).as("cnt"))
    sums.groupBy(col("g"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
          e => round(e.getField("m"), 6)).as("centroid"),
        max(col("cnt")).as("n_vecs"))
      .select(col("g").as(groupCol), col("n_vecs"), col("centroid"))
  }

  /** Route vectors to their nearest centroid — the online SERVING side
    * of cluster assignment (mixture routing, shard selection, online
    * SemDeDup cell assignment): centroids are a driver-resident literal
    * list (fit batch-side, e.g. [[centroids]]' rounded means), scoring
    * is pure Column algebra per centroid — stateless and map-side, so
    * it runs unchanged inside a streaming micro-batch. Argmax on the
    * ROUNDED (6 dp) cosine with larger-label tiebreak (a `greatest`
    * over (sim, label) structs — no explode, no shuffle). Adds
    * (route_label, route_sim). */
  def routeToCentroids(df: DataFrame, vecCol: String,
                       cents: Seq[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty)
    val v = vecD(col(vecCol))
    val vn = sqrt(dot(v, v))
    val scored = cents.map { case (lbl, c) =>
      val cl = array(c.toSeq.map(lit(_)): _*)
      val cn = math.sqrt(c.map(x => x * x).sum)
      val sim = when(vn * cn =!= 0.0, dot(v, cl) / (vn * lit(cn))).otherwise(lit(-2.0))
      struct(round(sim, 6).as("sim"), lit(lbl).as("lbl"))
    }
    // greatest() demands ≥2 args — a one-centroid deployment (legal:
    // route-everything-here) short-circuits to its single struct
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.withColumn("__best", best)
      .withColumn("route_label", col("__best.lbl"))
      .withColumn("route_sim", col("__best.sim"))
      .drop("__best")
  }

  // -- int8 storage quantization ------------------------------------------

  /** Symmetric per-vector int8 quantization (4× embedding storage
    * compression, the standard serving trick): `scale = max|v|/127`,
    * `code_i = round(v_i/scale) ∈ [-127, 127]`. A zero vector gets
    * scale 0 and all-zero codes. Pure per-row array algebra in the
    * scan; both engines round half away from zero, so codes are
    * engine-reproducible. Dequantized values differ from the original
    * by at most scale/2 per component. */
  def int8QuantScale(vec: Column): Column =
    array_max(transform(vecD(vec), x => abs(x))) / 127.0

  def int8Quantize(vec: Column): Column = {
    val v = vecD(vec)
    // scale is bound ONCE per row as the single element of a 1-element
    // array: inlining the array_max expression into the per-element
    // lambda would re-evaluate it per component — O(d²) per row, the
    // same inlined-subexpression trap ngramsFromTokens documents
    element_at(
      transform(array(int8QuantScale(vec)), s =>
        when(s === 0.0, transform(v, _ => lit(0)))
          .otherwise(transform(v, x => round(x / s).cast("int")))), 1)
  }

  def int8Dequantize(scale: Column, codes: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /**
   * Exact cosine top-k: for each row of `queries`, the k most similar
   * corpus rows (excluding self-matches by id). Queries are broadcast —
   * at 100 TB the corpus never shuffles; norms are precomputed per side
   * so each pair costs exactly one codegen'd dot product.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topKBySim(cosineScored(corpus, queries, idCol, vecCol), k)

  /** Shared exact-cosine scoring kernel: broadcast queries × corpus
    * pairs (self-matches excluded) with one codegen'd dot product each
    * — [[bruteForceTopK]] windows it, [[radiusSearch]] thresholds it. */
  private def cosineScored(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", sqrt(dot(col("q_vec"), col("q_vec")))))
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("n_norm", sqrt(dot(col("n_vec"), col("n_vec"))))
    val den = col("q_norm") * col("n_norm")
    c.crossJoin(q).where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        when(den =!= 0.0, dot(col("q_vec"), col("n_vec")) / den).as("sim"))
  }

  /** Exact cosine RADIUS search (range query): every corpus row whose
    * cosine similarity to a query row is at least `minSim` — the
    * "all neighbors within a threshold" companion to [[bruteForceTopK]]
    * (ε-NN). Same broadcast shape: queries broadcast, the corpus never
    * shuffles, each pair costs one codegen'd dot product, and the
    * threshold prunes inside the scan stage so output size tracks the
    * neighborhood density rather than the corpus. For corpus-sized query
    * sets, generate candidates from the LSH/IVF buckets instead and keep
    * the same threshold filter as the verification tier. */
  def radiusSearch(corpus: DataFrame, queries: DataFrame, minSim: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cosineScored(corpus, queries, idCol, vecCol).where(col("sim") >= minSim)

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 ratio margin —
    * the CCMatrix/WikiMatrix parallel-corpus extractor): for each x in
    * `xs` (language A) the best y in `ys` (language B) by
    * margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y)) / 2), where avgK is
    * the mean cosine of a side's k nearest cross-lingual neighbors —
    * normalizing by neighborhood density kills the hubness failure of
    * raw-cosine mining. Pairs below `threshold` are dropped (published
    * pipelines use ≈1.06).
    *
    * Exact tier: ONE broadcast cross-score of X×Y feeds all three
    * consumers (pair scores, both directional top-k averages) — the
    * corpus side never shuffles, each pair is one codegen'd dot
    * product. Ranking and filtering use the ROUNDED (6 dp) margin with
    * id tiebreak (the [[bruteForceTopK]] reproducibility convention).
    * For corpus-sized sides, mine candidates from shared IVF cells
    * (same cell equi-join as [[positivePairsIvf]]) and keep this exact
    * margin as the verification tier. Returns (x_id, y_id, margin). */
  def bitextMine(xs: DataFrame, ys: DataFrame, k: Int, threshold: Double,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = Pinned.guard {
    import org.apache.spark.sql.expressions.Window
    val x = xs.select(col(idCol).as("x_id"), vecD(col(vecCol)).as("x_vec"))
      .withColumn("x_norm", sqrt(dot(col("x_vec"), col("x_vec"))))
    val y = ys.select(col(idCol).as("y_id"), vecD(col(vecCol)).as("y_vec"))
      .withColumn("y_norm", sqrt(dot(col("y_vec"), col("y_vec"))))
    val den = col("x_norm") * col("y_norm")
    // Pinned checkpoint: three consumers (pair scores + both directional
    // top-k averages) read this frame, and Spark does no cross-branch
    // common-subplan elimination — lazily every pairwise dot product
    // would run 3×. Released on exit; the result is slot-held
    // (Graph's r8 lesson: unreleased pins stack across invocations).
    val (scored, scoredH) = Pinned.checkpoint(x.crossJoin(broadcast(y))
      .select(col("x_id"), col("y_id"),
        when(den =!= 0.0, dot(col("x_vec"), col("y_vec")) / den).as("sim")))
    val wx = Window.partitionBy("x_id").orderBy(col("sim").desc, col("y_id"))
    val ax = scored.withColumn("__rk", row_number().over(wx)).where(col("__rk") <= k)
      .groupBy("x_id").agg(avg("sim").as("__ax"))
    val wy = Window.partitionBy("y_id").orderBy(col("sim").desc, col("x_id"))
    val ay = scored.withColumn("__rk", row_number().over(wy)).where(col("__rk") <= k)
      .groupBy("y_id").agg(avg("sim").as("__ay"))
    val margins = scored.join(ax, Seq("x_id")).join(ay, Seq("y_id"))
      .select(col("x_id"), col("y_id"),
        round(col("sim") / ((col("__ax") + col("__ay")) / 2.0), 6).as("margin"))
    // best-y-per-x as a hash-aggregate argmax (r13, same rewrite as
    // labelPropagation): min_by over struct(-margin, y_id) compares
    // lexicographically — (margin desc, y_id asc) tie-break. Only the
    // MARGIN is negated (a double: exact, no overflow), so y_id keeps
    // its native ordering whatever its type — the r13 (-y_id) form
    // null-cast non-numeric ids (flipping the tie-break to the struct's
    // trailing field) and overflowed Long.MinValue (ADVICE r13,
    // Similarity.scala:228). Map-side partial combine, no per-x_id
    // sort buffer (the window formulation sorted every x's full
    // candidate list to keep 1 row).
    val out = Pinned.hold("similarity.bitext",
      margins
        // zero-norm vectors score a NULL margin; under the old
        // max(struct(margin, ...)) nulls-first struct order they could
        // never win, so drop them before the min_by (where a null
        // -margin WOULD sort first) — same semantics, now explicit
        .where(col("margin").isNotNull)
        .groupBy(col("x_id"))
        .agg(min_by(struct(col("y_id"), col("margin")),
          struct((-col("margin")).as("__nm"), col("y_id"))).as("__m"))
        .where(col("__m.margin") >= threshold)
        .select(col("x_id"), col("__m.y_id").as("y_id"),
          col("__m.margin").as("margin")))
    Pinned.release(scoredH)
    out
  }

  /** Hard-NEGATIVE mining for contrastive training (DPR-style negative
    * selection; Robinson et al. 2021 hard-negative sampling): for each
    * anchor, the k most-similar corpus vectors with a DIFFERENT label —
    * the near-boundary negatives that carry gradient signal, as opposed
    * to uniformly-random negatives the model already separates. Same
    * broadcast shape as [[bruteForceTopK]]: anchors broadcast, corpus
    * never shuffles, one per-anchor window for the final top-k. This is
    * the exact tier; with corpus-sized anchor sets, generate candidates
    * from the IVF/LSH buckets instead and keep the same label-mismatch
    * filter + window tail. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame =
    labelFilteredTopK(corpus, anchors, k, sameLabel = false, idCol, vecCol, labelCol)

  /** The POSITIVE side of contrastive pair mining: per anchor, the k
    * most-similar corpus vectors SHARING its label (e.g. paraphrase /
    * same-class positives). Same shape as [[hardNegatives]]. */
  def positivePairs(corpus: DataFrame, anchors: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame =
    labelFilteredTopK(corpus, anchors, k, sameLabel = true, idCol, vecCol, labelCol)

  private def labelFilteredTopK(corpus: DataFrame, anchors: DataFrame, k: Int,
                                sameLabel: Boolean, idCol: String, vecCol: String,
                                labelCol: String): DataFrame = {
    val a = broadcast(anchors.select(col(idCol).as("q_id"),
      vecD(col(vecCol)).as("q_vec"), col(labelCol).as("q_label")))
    val c = corpus.select(col(idCol).as("n_id"),
      vecD(col(vecCol)).as("n_vec"), col(labelCol).as("n_label"))
    val labelPred =
      if (sameLabel) col("q_label") <=> col("n_label")
      else !(col("q_label") <=> col("n_label"))
    val cand = c.crossJoin(a).where(col("q_id") =!= col("n_id") && labelPred)
    topKBySim(cosineScored(cand), k)
  }

  /** All pairs (id_a < id_b) with cosine >= threshold. Exact; use the
    * LSH signature as a pre-filter when the corpus is large. */
  def cosinePairs(df: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), vecD(col(vecCol)).as("va"))
      .withColumn("norm_a", sqrt(dot(col("va"), col("va"))))
    val b = df.select(col(idCol).as("id_b"), vecD(col(vecCol)).as("vb"))
      .withColumn("norm_b", sqrt(dot(col("vb"), col("vb"))))
    val den = col("norm_a") * col("norm_b")
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(den =!= 0.0, dot(col("va"), col("vb")) / den).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** LSH-prefiltered near-dup pairs — the scale path for [[cosinePairs]]:
    * candidates must share a bucket in ≥1 of `tables` hyperplane tables
    * (same amplification as [[lshTopK]]), exact cosine verifies. Linear
    * candidate generation instead of the all-pairs cross join; recall vs
    * the exact operator is measured in OpsSpec. Size `planes` to the
    * corpus via [[planesFor]] — the default 4 only suits modest corpora
    * (see the sizing-rule scaladoc there). */
  def cosinePairsLsh(df: DataFrame, threshold: Double, planes: Int = 4,
                     tables: Int = 8, idCol: String = "vec_id",
                     vecCol: String = "embedding", seed: Long = 1234L): DataFrame = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val hps = (0 until tables).map(t => hyperplanes(planes, dim, seed + t))
    val v = df.select(col(idCol).as("id"), vecD(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))
    val banded = v.select(col("id"),
      explode(array((0 until tables).map(t =>
        rhpSignature(col("vec"), hps(t)) + lit(t.toLong << 32)): _*)).as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = v.select(col("id").as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val vb = v.select(col("id").as("id_b"), col("vec").as("vb"), col("norm").as("nb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        when(col("na") * col("nb") =!= 0.0,
          dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Grid-accelerated DBSCAN over 2-d points (Ester et al. 1996) —
    * density clustering where k-means' spherical-k assumption fails
    * (embedding-map segmentation, outlier carving on a PCA/UMAP
    * scatter): core = ≥ minPts neighbors within eps (self included),
    * clusters = connected components of the core-core eps-graph,
    * borders join their smallest core neighbor's cluster, the rest is
    * noise.
    *
    * The eps-grid IS the scale story: each point probes only its 3×3
    * cell neighborhood (cell side = eps ⇒ every eps-ball fits in it),
    * so candidate pairs are bounded by grid occupancy, never N² —
    * the same bucket-then-verify shape as [[cosinePairsLsh]], but
    * with EXACT recall (the grid is a cover, not a hash). Components
    * reuse [[Dedup.connectedComponents]] (min-id labels ⇒
    * deterministic cluster ids); the border argmin is one aggregate.
    * Returns (id, cluster, role) — cluster null for noise, role ∈
    * core/border/noise. */
  def dbscan2d(points: DataFrame, idCol: String, xCol: String, yCol: String,
               eps: Double, minPts: Int): DataFrame = Pinned.guard {
    require(eps > 0, s"eps: $eps")
    require(minPts >= 1, s"minPts: $minPts")
    // static input, referenced by pairs + the final join; released on
    // exit with the pair pin, result slot-held (Pinned lifecycle)
    val (pts, ptsH) = Pinned.checkpoint(
      points.select(col(idCol).cast("long").as("id"),
          col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
        .where(col("x").isNotNull && !isnan(col("x")) &&
               col("y").isNotNull && !isnan(col("y"))))
    val withCell = pts.select(col("id"), col("x"), col("y"),
      floor(col("x") / eps).cast("long").as("cx"),
      floor(col("y") / eps).cast("long").as("cy"))
    val nbrOffsets = array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes = withCell
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        explode(nbrOffsets).as("o"),
        col("cx"), col("cy"))
      .select(col("ida"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("px"), (col("cy") + col("o.dy")).as("py"))
    val targets = withCell.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("px"), col("cy").as("py"))
    // directed neighbor pairs (each unordered pair once per direction —
    // exactly what the per-point neighbor count wants)
    // reused by counts, core edges, and border assignment — pinned once
    val (pairs, pairsH) = Pinned.checkpoint(probes.join(targets, Seq("px", "py"))
      .where(col("ida") =!= col("idb") &&
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(eps * eps))
      .select(col("ida"), col("idb")))
    // minPts = 1: EVERY point is core by definition (|N_eps(p)| >= 1
    // with self included always holds) — a point with zero neighbors
    // never reaches the pairs frame, so deriving cores from it would
    // silently demote isolated points to noise (review r9)
    val cores =
      if (minPts <= 1) pts.select(col("id"))
      else pairs.groupBy("ida").agg(count(lit(1)).as("__nn"))
        .where(col("__nn") + 1 >= minPts)
        .select(col("ida").as("id"))
    val coreEdges = pairs
      .join(cores.select(col("id").as("ida")), Seq("ida"))
      .join(cores.select(col("id").as("idb")), Seq("idb"))
      .where(col("ida") < col("idb"))
      .select(col("ida").as("id_a"), col("idb").as("id_b"))
    val comp = Dedup.connectedComponents(coreEdges)
    val coreClusters = cores
      .join(comp.select(col("node").as("id"), col("rep")), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("cluster"))
    val borders = pairs
      .join(coreClusters.select(col("id").as("idb"), col("cluster").as("__c")),
        Seq("idb"))
      .join(cores.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .groupBy(col("ida")).agg(min("__c").as("cluster"))
      .select(col("ida").as("id"), col("cluster"))
    val out = Pinned.hold("similarity.dbscan",
      pts.select(col("id"))
        .join(coreClusters.withColumnRenamed("cluster", "__core_c"), Seq("id"), "left")
        .join(borders.withColumnRenamed("cluster", "__border_c"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__core_c"), col("__border_c")).as("cluster"),
          when(col("__core_c").isNotNull, "core")
            .when(col("__border_c").isNotNull, "border")
            .otherwise("noise").as("role")))
    Pinned.release(ptsH, pairsH)
    out
  }

  // -- random-hyperplane LSH ---------------------------------------------

  /** Deterministic Gaussian hyperplanes (planes × dim). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 1234L): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(r.nextGaussian()))
  }

  /** Signature = bitmap of sign(v · plane_i); integer in [0, 2^planes). */
  def rhpSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Seeded Lloyd's k-means on a driver-side sample (the IVF coarse
    * quantizer needs only representative centroids, not an exact
    * clustering): deterministic shuffled init, empty clusters keep their
    * previous centroid, at most `iters` passes. */
  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "ivf fit needs a non-empty corpus")
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, points.length)
    var cents = rnd.shuffle(points.indices.toVector).take(kk).map(i => points(i).clone).toArray
    val dim = points(0).length
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cents.length) {
        var d = 0.0; var j = 0
        while (j < dim) { val x = p(j) - cents(c)(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnts = new Array[Long](cents.length)
      for (p <- points) {
        val c = nearest(p)
        var j = 0
        while (j < dim) { sums(c)(j) += p(j); j += 1 }
        cnts(c) += 1
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        if (cnts(i) == 0) old else sums(i).map(_ / cnts(i))
      }
    }
    cents
  }

  /**
   * IVF (inverted-file) ANN top-k: a k-means coarse quantizer (seeded
   * driver-side Lloyd over a bounded sample) partitions the corpus into `nlist` cells; each
   * query searches the `nprobe` cells whose centroids are most cosine-
   * similar, with exact re-ranking inside. Candidates ≈ corpus ×
   * nprobe/nlist; unlike random hyperplanes the cells adapt to the data
   * distribution, which keeps recall high even when true neighbors sit
   * at modest cosine similarity.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding", seed: Long = 42L,
              /** quantizer-training bound: the coarse centroids only need a
                * representative sample, so the fit cost stays O(cap · iter)
                * no matter how large the corpus is (standard IVF practice) */
              fitSampleCap: Long = 65536L, fitMaxIter: Int = 10): DataFrame =
    ivfSearch(corpus, queries,
      ivfFitCentroids(corpus, nlist, vecCol, seed, fitSampleCap, fitMaxIter),
      k, nprobe, idCol, vecCol)

  /** The IVF index build, separated so callers can FIT ONCE and search
    * many times (how an IVF index is actually used — the quantizer is
    * immutable once built). Coarse-quantizer fit is a DRIVER-side seeded
    * Lloyd over a bounded sample: at most fitSampleCap vectors ever
    * leave the executors, the fit costs milliseconds instead of a
    * distributed job per iteration, and determinism is trivial. */
  /** Bounded, deterministic fit sample: at most `cap` vectors collected
    * (count → fraction sample → limit), shared by every quantizer fit
    * (review r9: this block was triplicated across the IVF/PQ fits). */
  private def fitSample(corpus: DataFrame, vecCol: String, cap: Long,
                        seed: Long): Array[Array[Double]] = {
    val c0 = corpus.select(vecD(col(vecCol)).as("__fit_v"))
    val n = c0.count()
    val fitSet =
      if (n <= cap) c0
      else c0.sample(withReplacement = false, cap.toDouble / n, seed)
    fitSet.limit(cap.toInt).collect().map(_.getSeq[Double](0).toArray)
  }

  def ivfFitCentroids(corpus: DataFrame, nlist: Int = 16,
                      vecCol: String = "embedding", seed: Long = 42L,
                      fitSampleCap: Long = 65536L, fitMaxIter: Int = 10): Array[Array[Double]] = {
    val samplePts = fitSample(corpus, vecCol, fitSampleCap, seed)
    lloyd(samplePts, nlist, fitMaxIter, seed)
  }

  /** IVF search against a prebuilt quantizer ([[ivfFitCentroids]]). Cell
    * ASSIGNMENT stays distributed — codegen'd dot products against
    * broadcast centroid literals. */
  def ivfSearch(corpus: DataFrame, queries: DataFrame, centroids: Array[Array[Double]],
                k: Int, nprobe: Int = 4, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val c0 = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
    val c = c0.withColumn("cell", nearestCell(col("n_vec"), centroids))
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
        .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
        .select(col("q_id"), col("q_vec"), col("probe.cell").as("cell")))
    topKBySim(cosineScored(
      c.join(q, Seq("cell")).where(col("q_id") =!= col("n_id"))), k)
  }

  /** The `nprobe` nearest cells of `vec` as a sorted (dist, cell) struct
    * array — by EUCLIDEAN distance, because KMeans assigns corpus cells
    * euclidean, so probing must match that geometry (dist² = |q|² -
    * 2q·c + |c|²; |q|² is rank-invariant). Shared by [[ivfSearch]],
    * [[ivfPqTopK]]'s probe stage, and the contrastive-mining variants. */
  private def probeCells(vec: Column, centroids: Array[Array[Double]],
                         nprobe: Int): Column = {
    val dists = centroids.toSeq.zipWithIndex.map { case (ctr, i) =>
      i -> (lit(ctr.map(x => x * x).sum) - lit(2.0) * dot(vec, typedlit(ctr)))
    }
    slice(array_sort(array(dists.map { case (i, d) =>
      struct(d.as("d"), lit(i).as("cell")) }: _*)), 1, nprobe)
  }

  /** [[positivePairs]] with IVF-cell candidate mining — the scale path
    * the exact tier's scaladoc prescribes for corpus-sized anchor sets:
    * candidates come from ONE equi-join on the cell id (corpus never
    * meets a product join), the same label predicate + per-anchor top-k
    * tail applies. Approximate: a true positive outside the anchor's
    * `nprobe` probed cells is missed; an identical vector always shares
    * the anchor's own (first-probed) cell. */
  def positivePairsIvf(corpus: DataFrame, anchors: DataFrame, k: Int,
                       centroids: Array[Array[Double]], nprobe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame =
    labelFilteredTopKIvf(corpus, anchors, k, sameLabel = true, centroids,
      nprobe, idCol, vecCol, labelCol)

  /** [[hardNegatives]] with IVF-cell candidate mining (see
    * [[positivePairsIvf]]) — near-boundary negatives live in the
    * anchor's own coarse cells by construction, which is exactly the
    * candidate set this probes. */
  def hardNegativesIvf(corpus: DataFrame, anchors: DataFrame, k: Int,
                       centroids: Array[Array[Double]], nprobe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame =
    labelFilteredTopKIvf(corpus, anchors, k, sameLabel = false, centroids,
      nprobe, idCol, vecCol, labelCol)

  /** Corpus-wide k-NN JOIN via shared IVF cells — every vector gets its
    * top-k neighbors, the all-pairs primitive behind SemDeDup, kNN-LM
    * datastores, and graph-based dedup. Unlike the query-set searches
    * ([[ivfSearch]], [[labelFilteredTopKIvf]]) nothing broadcasts: the
    * query side IS the corpus, so both sides shuffle ONCE on the coarse
    * cell id (each vector probes its `nprobe` nearest cells) and
    * candidates meet in a keyed equi-join — per-cell work is bounded by
    * cell occupancy (corpus/nlist expected), never corpus². One
    * per-query window finishes the top-k; recall follows IVF cell
    * recall (planted exact copies share cell 1 by construction). */
  def knnJoinIvf(corpus: DataFrame, k: Int, centroids: Array[Array[Double]],
                 nprobe: Int = 4, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("cell", nearestCell(col("n_vec"), centroids))
    val q = corpus.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
      .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
      .select(col("q_id"), col("q_vec"), col("probe.cell").as("cell"))
    topKBySim(cosineScored(
      c.join(q, Seq("cell")).where(col("q_id") =!= col("n_id"))), k)
  }

  private def labelFilteredTopKIvf(corpus: DataFrame, anchors: DataFrame, k: Int,
                                   sameLabel: Boolean, centroids: Array[Array[Double]],
                                   nprobe: Int, idCol: String, vecCol: String,
                                   labelCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"),
        col(labelCol).as("n_label"))
      .withColumn("cell", nearestCell(col("n_vec"), centroids))
    val q = broadcast(
      anchors.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"),
          col(labelCol).as("q_label"))
        .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
        .select(col("q_id"), col("q_vec"), col("q_label"), col("probe.cell").as("cell")))
    val labelPred =
      if (sameLabel) col("q_label") <=> col("n_label")
      else !(col("q_label") <=> col("n_label"))
    topKBySim(cosineScored(
      c.join(q, Seq("cell")).where(col("q_id") =!= col("n_id") && labelPred)), k)
  }

  // -- product quantization (Jégou, Douze, Schmid: "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011) ------------------------------

  /**
   * PQ codebook fit: the vector space is split into `m` contiguous
   * subspaces of dim/m dims; each subspace gets its own `k`-centroid
   * codebook via the SAME driver-side seeded Lloyd the IVF coarse
   * quantizer uses ([[ivfFitCentroids]] rationale: a codebook needs a
   * representative sample, not the corpus, so at most `fitSampleCap`
   * vectors ever leave the executors and determinism is trivial).
   * Returns codebooks(sub)(centroid)(dimWithinSub).
   *
   * A fitted vector compresses to m·log2(k) bits (m=8, k=16 → 4 bytes
   * vs 256 bytes of float32 at dim 64) while distances stay computable
   * FROM THE CODES — the storage/recall trade the int8 path
   * ([[int8Quantize]]) can't reach below 1 byte/dim.
   */
  def pqFitCodebooks(corpus: DataFrame, m: Int = 8, k: Int = 16,
                     vecCol: String = "embedding", seed: Long = 7L,
                     fitSampleCap: Long = 65536L, fitMaxIter: Int = 10): Array[Array[Array[Double]]] = {
    val pts = fitSample(corpus, vecCol, fitSampleCap, seed)
    val dim = pts(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // per-subspace seeds differ so identical subspace distributions
    // don't collapse to identical codebooks
    Array.tabulate(m)(s =>
      lloyd(pts.map(_.slice(s * dsub, s * dsub + dsub)), k, fitMaxIter, seed + s))
  }

  /** PQ encode as pure Column algebra: per subspace, the argmin-distance
    * centroid index over `k` literal centroids (distance via the
    * codegen'd dot kernel; |c|² folds to a constant) — a per-row
    * projection in the scan, no shuffle, no UDF. Returns array<int>
    * of length m. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks(0)(0).length
    val v = vecD(vec)
    array(codebooks.indices.map { s =>
      val subv = slice(v, s * dsub + 1, dsub)
      element_at(array_sort(array(codebooks(s).zipWithIndex.map { case (ctr, ci) =>
        struct(
          (lit(ctr.map(x => x * x).sum) - lit(2.0) * dot(subv, typedlit(ctr.toSeq))).as("d"),
          lit(ci).as("c"))
      }.toSeq: _*)), 1).getField("c")
    }: _*)
  }

  /**
   * PQ ADC (asymmetric distance computation) top-k: the corpus is
   * encoded to m-byte codes; each query precomputes one k-entry
   * distance lookup table per subspace (query subvector vs that
   * subspace's codebook), and a candidate's approximate distance is m
   * ARRAY LOOKUPS + adds — no per-pair O(dim) arithmetic. The
   * `shortlist` nearest-by-ADC candidates are then exactly re-ranked by
   * cosine (the standard two-stage serving shape), so the emitted `sim`
   * is exact while the scan cost rides the codes.
   *
   * Scale shape: queries (with their LUTs) broadcast; the corpus never
   * shuffles — encode + ADC are per-row projections, and only the
   * (queries × shortlist) survivor set reaches the re-rank window. At
   * 100 TB you'd additionally gate the scan with an IVF cell filter
   * ([[ivfSearch]]) — IVF×PQ composes: this operator IS the per-cell
   * scan kernel of that index.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             codebooks: Array[Array[Array[Double]]], shortlist: Int = 32,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("codes", pqEncode(col("n_vec"), codebooks))
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
        .withColumn("luts", pqLuts(col("q_vec"), codebooks)))
    val cand = c.crossJoin(q).where(col("q_id") =!= col("n_id"))
    topKBySim(cosineScored(adcShortlist(cand, codebooks.length, shortlist)), k)
  }

  /**
   * IVF×PQ composed ANN top-k — the standard billion-scale index shape
   * (FAISS's IVFPQ): the IVF coarse quantizer restricts each query to
   * `nprobe` of `nlist` cells, and WITHIN the candidate cells distances
   * ride the PQ codes (ADC), so the scan does m array lookups per
   * candidate instead of O(dim) arithmetic, and touches only
   * ~corpus × nprobe/nlist candidates instead of the full corpus the
   * flat [[pqTopK]] scans. Exact cosine re-rank of the shortlist, as in
   * both parents.
   *
   * Everything per-row is a codegen'd projection (cell assignment + PQ
   * encode in the scan); the only join is a broadcast equi-join on the
   * cell id; the only shuffle is the per-query shortlist window over
   * the surviving candidates. At 100 TB: corpus never shuffles, the
   * index build is one pass, and both quantizers fit driver-side on
   * bounded samples.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                centroids: Array[Array[Double]],
                codebooks: Array[Array[Array[Double]]],
                nprobe: Int = 4, shortlist: Int = 32,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // corpus side: one projection computes the IVF cell and the PQ codes
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("cell", nearestCell(col("n_vec"), centroids))
      .withColumn("codes", pqEncode(col("n_vec"), codebooks))
    // query side: nprobe nearest cells + the per-subspace ADC lookup tables
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
        .withColumn("luts", pqLuts(col("q_vec"), codebooks))
        .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
        .select(col("q_id"), col("q_vec"), col("luts"), col("probe.cell").as("cell")))
    val cand = c.join(q, Seq("cell")).where(col("q_id") =!= col("n_id"))
    topKBySim(cosineScored(adcShortlist(cand, codebooks.length, shortlist)), k)
  }

  /** Fit PQ codebooks over IVF RESIDUALS v − centroid(cell(v)) — the
    * FAISS IVFPQ training procedure: once the coarse quantizer has
    * absorbed each cell's mean, the residual is all PQ has left to
    * encode; codebooks fitted on RAW coordinates spend their k
    * centroids re-encoding cell means in every subspace (wasted bits —
    * the reason FAISS encodes residuals). Driver-side Lloyd on the
    * bounded sample, per-cell assignment computed locally against the
    * (driver-resident) coarse centroids — same fit discipline as
    * [[pqFitCodebooks]]. */
  def pqFitResidualCodebooks(corpus: DataFrame, centroids: Array[Array[Double]],
                             m: Int = 8, k: Int = 16, vecCol: String = "embedding",
                             seed: Long = 7L, fitSampleCap: Long = 65536L,
                             fitMaxIter: Int = 10): Array[Array[Array[Double]]] = {
    val pts = fitSample(corpus, vecCol, fitSampleCap, seed)
    val res = pts.map { v =>
      val c = centroids(nearestCellLocal(v, centroids))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val dim = res(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m)(s =>
      lloyd(res.map(_.slice(s * dsub, s * dsub + dsub)), k, fitMaxIter, seed + s))
  }

  private def nearestCellLocal(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var i = 0
    while (i < cents.length) {
      var d = 0.0; var j = 0
      while (j < v.length) { val x = v(j) - cents(i)(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** IVF×PQ with RESIDUAL encoding — true IVFADC (Jégou, Douze &
    * Schmid, TPAMI 2011 §III): corpus codes are PQ(v − c_cell), and
    * each query builds its ADC lookup tables PER PROBED CELL from
    * (q − c_cell), so approximate distances compare residuals against
    * residual codebooks. Same plan shape as [[ivfPqTopK]] — cell
    * assignment, residual subtraction, and encoding are all codegen'd
    * scan projections (the cell's centroid comes from ONE literal
    * 2-D array lookup, not a 16-way CASE); the broadcast query side
    * carries (cell, per-cell LUTs); exact cosine re-rank unchanged. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        centroids: Array[Array[Double]],
                        codebooks: Array[Array[Array[Double]]],
                        nprobe: Int = 4, shortlist: Int = 32,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents2d = typedlit(centroids.map(_.toSeq).toSeq)
    def residual(vec: Column, cell: Column): Column =
      zip_with(vec, element_at(cents2d, cell + 1), (x, mu) => x - mu)
    // the residual MATERIALIZES into an attribute before pqEncode/pqLuts
    // slice it per (subspace × centroid) — inlined, the 64-wide zip_with
    // re-evaluates m·k times per row (the ngramsFromTokens /
    // int8Quantize inlined-subexpression trap; measured 7.2 s → the
    // raw variant's band when materialized)
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("cell", nearestCell(col("n_vec"), centroids))
      .select(col("n_id"), col("n_vec"), col("cell"),
        residual(col("n_vec"), col("cell")).as("__res"))
      .select(col("n_id"), col("n_vec"), col("cell"),
        pqEncode(col("__res"), codebooks).as("codes"))
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
        .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
        .select(col("q_id"), col("q_vec"), col("probe.cell").as("cell"))
        .select(col("q_id"), col("q_vec"), col("cell"),
          residual(col("q_vec"), col("cell")).as("__qres"))
        .select(col("q_id"), col("q_vec"), col("cell"),
          pqLuts(col("__qres"), codebooks).as("luts")))
    val cand = c.join(q, Seq("cell")).where(col("q_id") =!= col("n_id"))
    topKBySim(cosineScored(adcShortlist(cand, codebooks.length, shortlist)), k)
  }

  /** Nearest coarse-quantizer cell by euclidean distance — the shared
    * assignment kernel of [[ivfSearch]] and [[ivfPqTopK]] (|v|² is
    * rank-invariant, so argmin(|c|² − 2v·c) suffices). */
  private def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(array_sort(array(centroids.toSeq.zipWithIndex.map { case (ctr, i) =>
      struct((lit(ctr.map(x => x * x).sum) - lit(2.0) * dot(vec, typedlit(ctr.toSeq))).as("d"),
        lit(i).as("cell"))
    }: _*)), 1).getField("cell")

  /**
   * Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
   * clusters scope the pair search — cosine pairs are computed ONLY
   * within a cluster, turning the corpus-quadratic all-pairs scan into
   * per-cell quadratics bounded by corpus/nlist (the paper's core trade:
   * semantic duplicates co-locate under the coarse quantizer, so
   * cross-cell pairs are sacrificed for tractability). Pairs at cosine
   * ≥ `threshold` are transitively closed ([[graft.ops.Dedup.connectedComponents]])
   * and each component keeps its min-id representative — the same
   * deterministic survivor convention as every dedup tier here.
   *
   * Returns the survivor rows of `df`. At 100 TB: cell assignment is a
   * scan projection, the self-join shuffles on the cell id, CC shuffles
   * on node ids, and the drop set broadcasts back — nothing quadratic
   * beyond the intra-cell tier, nothing collected to the driver.
   */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    val c = df.select(col(idCol).as("__id"), vecD(col(vecCol)).as("__v"))
      .withColumn("__cell", nearestCell(col("__v"), centroids))
    val a = c.select(col("__cell"), col("__id").as("id_a"), col("__v").as("va"))
    val b = c.select(col("__cell"), col("__id").as("id_b"), col("__v").as("vb"))
    val den = sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb")))
    val pairs = a.join(b, Seq("__cell")).where(col("id_a") < col("id_b"))
      .where(den =!= 0.0 && dot(col("va"), col("vb")) / den >= threshold)
      .select(col("id_a"), col("id_b"))
    val dropped = graft.ops.Dedup.connectedComponents(pairs)
      .where(col("rep") =!= col("node")).select(col("node").as("__drop"))
    // NO broadcast hint: the drop set is corpus-PROPORTIONAL (the
    // duplicate rows themselves — 30-50% of the corpus in SemDeDup's
    // operating range), so forcing it to the driver would OOM at
    // exactly the scale this operator targets (review r9); AQE still
    // broadcasts it when it happens to be small
    df.join(dropped, col(idCol) === col("__drop"), "left_anti")
  }

  // -- shared ANN candidate-scoring tails ----------------------------------

  /** Exact cosine over a (q_id, n_id, q_vec, n_vec) candidate set — the
    * re-rank scoring every ANN variant ends with. */
  private def cosineScored(cand: DataFrame): DataFrame = {
    val den = sqrt(dot(col("q_vec"), col("q_vec"))) * sqrt(dot(col("n_vec"), col("n_vec")))
    cand.select(col("q_id"), col("n_id"),
      when(den =!= 0.0, dot(col("q_vec"), col("n_vec")) / den).as("sim"))
  }

  /** Final top-k: ONE per-query window over the scored candidates — the
    * only shuffle any ANN variant pays after candidate generation. */
  private def topKBySim(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Per-subspace ADC lookup tables for a query vector: luts[s][c] =
    * |c|² − 2·q_s·c. |q_s|² is omitted — constant per (query, subspace),
    * so the summed offset is constant per query and ADC order is
    * unchanged (same trick as the cell ranking). */
  private def pqLuts(qvec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks(0)(0).length
    array(codebooks.indices.map { s =>
      array(codebooks(s).map(ctr =>
        lit(ctr.map(x => x * x).sum) -
          lit(2.0) * dot(slice(qvec, s * dsub + 1, dsub), typedlit(ctr.toSeq))).toSeq: _*)
    }: _*)
  }

  /** ADC shortlist shared by [[pqTopK]]/[[ivfPqTopK]]: approximate
    * distance = m LUT lookups + adds per candidate, keep the `shortlist`
    * nearest per query for exact re-ranking. */
  private def adcShortlist(cand: DataFrame, m: Int, shortlist: Int): DataFrame = {
    val adc = (0 until m)
      .map(s => element_at(element_at(col("luts"), s + 1), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id"))
    cand.withColumn("adc", adc).withColumn("srank", row_number().over(w))
      .where(col("srank") <= shortlist)
  }

  /**
   * Multi-table LSH-bucketed ANN top-k. `tables` independent hash tables
   * of `planes` hyperplanes each (the standard recall amplifier: a true
   * neighbor is found if ANY table buckets it with the query); queries
   * additionally multi-probe all Hamming-1 buckets per table. Exact
   * cosine re-ranks the candidate union.
   *
   * Corpus-side cost is a projection + explode(tables) + one bucket-join
   * (no all-pairs scan); recall vs [[bruteForceTopK]] is tunable with
   * (planes ↓, tables ↑) and measured in SimilaritySpec. Size `planes`
   * to the corpus via [[planesFor]] — the default 4 only suits modest
   * corpora (see the sizing-rule scaladoc there).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 4, tables: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding", seed: Long = 1234L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val hps = (0 until tables).map(t => hyperplanes(planes, dim, seed + t))
    // bucket key tagged with its table id so tables never cross-match
    def tagged(vec: Column, t: Int): Column =
      rhpSignature(vec, hps(t)) + lit(t.toLong << 32)
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_vec"))
      .withColumn("bucket",
        explode(array((0 until tables).map(t => tagged(col("n_vec"), t)): _*)))
    val probes = (0 until tables).flatMap { t =>
      val sig = tagged(col("q_vec"), t)
      sig +: (0 until planes).map(i => sig.bitwiseXOR(lit(1L << i)))
    }
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
        .withColumn("probe", explode(array(probes: _*))))
    val cand = c.join(q, col("bucket") === col("probe") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("q_vec"), col("n_vec"))
      .dropDuplicates("q_id", "n_id")
    topKBySim(cosineScored(cand), k)
  }

  // -- index persistence ---------------------------------------------------
  //
  // At 100 TB an index is FIT ONCE in a batch job and reused by every
  // search job; refitting per session wastes the k-means passes and
  // silently changes results (different sample → different cells). The
  // fitted artifacts are small (nlist×dim and m×k×dim/m doubles), so
  // they serialize to one-file parquet tables; doubles round-trip parquet
  // bit-exactly, so a loaded quantizer searches IDENTICALLY to the fit
  // one. The ENCODED corpus (cell ids, PQ codes) is a regular DataFrame
  // the caller persists like any table.

  import org.apache.spark.sql.SparkSession

  /** Save IVF coarse-quantizer centroids: one row per (list_id, centroid). */
  def saveIvfCentroids(spark: SparkSession, path: String,
                       centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load centroids saved by [[saveIvfCentroids]], in list order. */
  def loadIvfCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy(col("list_id"))
      .collect().map(_.getSeq[Double](1).toArray)

  /** MATERIALIZED inverted lists: the corpus assigned to its coarse
    * cells and written CELL-PARTITIONED — the on-disk shape of a real
    * IVF index, where a probe reads only its lists. [[ivfSearchSaved]]
    * then scans just the probed partitions (static PartitionFilters —
    * a 16-cell nprobe=4 probe reads 1/4 of the index, and the fraction
    * shrinks with nlist at scale); [[ivfAppendAssignments]] grows the
    * index incrementally — new vectors are assigned against the FIXED
    * quantizer and appended to their lists, no re-assignment of the
    * existing corpus (the standard online-ingest contract; re-fit the
    * quantizer offline when drift warrants a rebuild). */
  def ivfSaveAssignments(path: String, corpus: DataFrame,
                         centroids: Array[Array[Double]],
                         idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell", nearestCell(vecD(col("embedding")), centroids))
      // hash-distribute by the partition column before the partitioned
      // write (r14, guide §6 — Iceberg's write.distribution-mode=hash
      // shape): without it every scan task cuts a file into EVERY cell
      // it touches, so the index is (input tasks × nlist) KB-files and
      // each probed list pays that many opens per search. One shuffle
      // at write time buys one file per list; at scale AQE splits any
      // oversized cell partition.
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Append new vectors to a saved index (see [[ivfSaveAssignments]]). */
  def ivfAppendAssignments(path: String, newVecs: DataFrame,
                           centroids: Array[Array[Double]],
                           idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    newVecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell", nearestCell(vecD(col("embedding")), centroids))
      .repartition(col("cell")) // one appended file per touched list (see save)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Search a saved cell-partitioned index: each query probes its
    * `nprobe` nearest cells; the union of probed cells (queries ×
    * nprobe ids — driver-trivial) becomes a STATIC partition filter, so
    * the scan reads only the probed lists, then candidates meet the
    * broadcast queries in a cell equi-join. */
  def ivfSearchSaved(spark: SparkSession, path: String, queries: DataFrame,
                     centroids: Array[Array[Double]], k: Int, nprobe: Int = 4,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_vec"))
      .withColumn("probe", explode(probeCells(col("q_vec"), centroids, nprobe)))
      .select(col("q_id"), col("q_vec"), col("probe.cell").as("cell"))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val idx = spark.read.parquet(path)
      .where(col("cell").isin(probed.map(_.asInstanceOf[Any]): _*))
      .select(col("vec_id").as("n_id"), vecD(col("embedding")).as("n_vec"), col("cell"))
    topKBySim(cosineScored(
      idx.join(broadcast(q), Seq("cell")).where(col("q_id") =!= col("n_id"))), k)
  }

  // -- PCA / whitening ----------------------------------------------------

  /** Packed second-moment statistics via ONE treeAggregate: upper-
    * triangle Σ vᵢvⱼ products, per-dimension sums, and the row count.
    * Full map-side combine — the driver receives d(d+1)/2 + d numbers
    * regardless of corpus size; nothing else leaves the executors. */
  private def scatterAgg[T](rows: org.apache.spark.rdd.RDD[Seq[T]], dim: Int)
                           (implicit num: Numeric[T]): (Array[Double], Array[Double], Long) = {
    val nUT = dim * (dim + 1) / 2
    val zero = (new Array[Double](nUT), new Array[Double](dim), 0L)
    rows.treeAggregate(zero)(
      seqOp = { case ((p, s, n), v) =>
        if (v == null || v.length != dim) (p, s, n)
        else {
          val a = v.iterator.map(num.toDouble).toArray
          var k = 0; var i = 0
          while (i < dim) {
            s(i) += a(i)
            var j = i
            while (j < dim) { p(k) += a(i) * a(j); k += 1; j += 1 }
            i += 1
          }
          (p, s, n + 1)
        }
      },
      combOp = { case ((p1, s1, n1), (p2, s2, n2)) =>
        var k = 0; while (k < nUT) { p1(k) += p2(k); k += 1 }
        var i = 0; while (i < dim) { s1(i) += s2(i); i += 1 }
        (p1, s1, n1 + n2)
      })
  }

  /** EXACT-integer scatter matrix of int8-quantized vectors: one row
    * per upper-triangle cell (i, j, Σ codeᵢ·codeⱼ). Quantized codes
    * make every statistic an integer sum — engine-reproducible and
    * partitioning-invariant, unlike float accumulation (the reason the
    * ORACLE pins this surface while [[pcaFit]] consumes the double
    * path). Products are exact in doubles far beyond any real corpus
    * (|code| ≤ 127 → each product ≤ 16129; 2^53 headroom ≈ 5·10¹¹
    * rows). */
  def int8ScatterMatrix(df: DataFrame, codesCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (p, _, _) = scatterAgg(
      df.select(col(codesCol)).rdd.map(r => r.getSeq[Int](0)), dim)
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield (i, j, p(i * dim - i * (i - 1) / 2 + (j - i)).toLong)
    rows.toDF("i", "j", "s")
  }

  /** Fitted PCA: per-dimension means, orthonormal components (rows,
    * eigenvalue-descending), and the eigenvalues (= variance captured
    * per component). */
  final case class PcaModel(means: Array[Double], components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** PCA fit — distributed second moments ([[scatterAgg]]: one
    * treeAggregate, d² driver numbers), then a DRIVER-side cyclic
    * Jacobi eigendecomposition of the d×d covariance (d is an
    * embedding dimension — 64 here, ≤ a few thousand anywhere — so the
    * O(d³) eigensolve is microseconds; the corpus-sized work is all in
    * the one aggregate). Components are sign-canonicalized (largest-
    * magnitude entry positive) so the fit is deterministic up to the
    * float-sum ulps of the aggregate. */
  def pcaFit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val first = df.select(vecD(col(vecCol))).head().getSeq[Double](0)
    val dim = first.length
    require(k >= 1 && k <= dim, s"k: $k, dim: $dim")
    val (p, s, n) = scatterAgg(
      df.select(vecD(col(vecCol))).rdd.map(r => r.getSeq[Double](0)), dim)
    require(n > 1, s"need >1 vectors, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var k0 = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = p(k0) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c; k0 += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    val comps = order.map { ci =>
      val v = Array.tabulate(dim)(r => evecs(r)(ci))
      val m = v.maxBy(math.abs)
      if (m < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(evals).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with eigenvectors as COLUMNS). Textbook
    * two-sided rotations (Golub & Van Loan §8.5) to off-diagonal
    * stillness. */
  private def jacobiEigen(a0: Array[Array[Double]],
                          maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      for (pI <- 0 until d - 1; q <- pI + 1 until d) {
        off = math.max(off, math.abs(a(pI)(q)))
        if (math.abs(a(pI)(q)) > tol) {
          val theta = (a(q)(q) - a(pI)(pI)) / (2.0 * a(pI)(q))
          val t =
            if (theta == 0.0) 1.0 // equal diagonal: 45° rotation
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          for (r <- 0 until d) {
            val arp = a(r)(pI); val arq = a(r)(q)
            a(r)(pI) = c * arp - sn * arq
            a(r)(q) = sn * arp + c * arq
          }
          for (r <- 0 until d) {
            val apr = a(pI)(r); val aqr = a(q)(r)
            a(pI)(r) = c * apr - sn * aqr
            a(q)(r) = sn * apr + c * aqr
          }
          for (r <- 0 until d) {
            val vrp = v(r)(pI); val vrq = v(r)(q)
            v(r)(pI) = c * vrp - sn * vrq
            v(r)(q) = sn * vrp + c * vrq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project `vec` onto a fitted model's top-k components (mean-
    * centered): a k-element array column, each element one codegen'd
    * dot product against a literal component — pure Column algebra in
    * the scan stage, zero shuffle at any corpus size. */
  def pcaProject(vec: Column, model: PcaModel): Column = {
    val centered = zip_with(vecD(vec), typedlit(model.means.toSeq),
      (x, m) => x - m)
    array(model.components.map { comp =>
      aggregate(
        zip_with(centered, typedlit(comp.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
  }

  /** WHITENED projection: [[pcaProject]] with each component's
    * coordinate divided by √eigenvalue, so every output dimension has
    * unit variance (the decorrelate-and-equalize preprocessing of
    * embedding-similarity pipelines — raw cosine over anisotropic
    * embeddings over-weights the dominant directions). Components with
    * eigenvalue ≤ `eps` are dropped rather than amplified (dividing by
    * a vanishing √λ turns numerical noise into the LARGEST output
    * dimension). Same zero-shuffle Column algebra as [[pcaProject]]. */
  def pcaWhiten(vec: Column, model: PcaModel, eps: Double = 1e-9): Column = {
    val keep = model.components.zip(model.eigenvalues).filter(_._2 > eps)
    val centered = zip_with(vecD(vec), typedlit(model.means.toSeq),
      (x, m) => x - m)
    array(keep.map { case (comp, ev) =>
      aggregate(
        zip_with(centered, typedlit(comp.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x) / math.sqrt(ev)
    }: _*)
  }

  /** Save PQ codebooks: one row per (subspace, code, centroid). */
  def savePqCodebooks(spark: SparkSession, path: String,
                      codebooks: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    (for {
      (sub, m) <- codebooks.zipWithIndex
      (ctr, c) <- sub.zipWithIndex
    } yield (m, c, ctr.toSeq)).toSeq
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load codebooks saved by [[savePqCodebooks]], in (subspace, code) order. */
  def loadPqCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] =
    spark.read.parquet(path).orderBy(col("subspace"), col("code"))
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(_.getSeq[Double](2).toArray) }
      .toArray
}

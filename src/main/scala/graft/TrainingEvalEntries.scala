package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 20 entries: eval metrics and profiling (q_eval_*, q_stats_*, q_quality_*, q_meta_*, q_agg_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingEvalEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // column-profile drift between the doc_id<300 release and the full
    // corpus: null-rate deltas and range movement per column — the
    // silent-upstream-change siren hash-identical schemas won't catch.
    "q_meta_profile_drift" -> (q((s, dir) => {
      val full = docs(s, dir)
      graft.ops.Profiling.profileDrift(full.where(col("doc_id") < 300), full,
          Seq("lang", "source", "n_chars"))
        .orderBy("column_name")
    }), Some("""
      WITH pb AS (
        SELECT 'lang' AS column_name, CAST(count(*) AS BIGINT) AS rows_base,
               CAST(count(lang) AS BIGINT) AS nn,
               CAST(count(DISTINCT lang) AS BIGINT) AS distinct_base,
               CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
               CAST(count(DISTINCT n_chars) AS BIGINT),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents WHERE doc_id < 300),
      pc AS (
        SELECT 'lang' AS column_name, CAST(count(*) AS BIGINT) AS rows_cur,
               CAST(count(lang) AS BIGINT) AS nn,
               CAST(count(DISTINCT lang) AS BIGINT) AS distinct_cur,
               CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
        FROM documents
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
               CAST(count(DISTINCT n_chars) AS BIGINT),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents)
      SELECT pb.column_name, pb.rows_base, pc.rows_cur,
             round(CAST(pb.rows_base - pb.nn AS DOUBLE) / CAST(pb.rows_base AS DOUBLE), 6)
               AS null_rate_base,
             round(CAST(pc.rows_cur - pc.nn AS DOUBLE) / CAST(pc.rows_cur AS DOUBLE), 6)
               AS null_rate_cur,
             round(round(CAST(pc.rows_cur - pc.nn AS DOUBLE) / CAST(pc.rows_cur AS DOUBLE), 6)
                 - round(CAST(pb.rows_base - pb.nn AS DOUBLE) / CAST(pb.rows_base AS DOUBLE), 6), 6)
               AS null_rate_delta,
             pb.distinct_base, pc.distinct_cur,
             (pb.mn IS DISTINCT FROM pc.mn OR pb.mx IS DISTINCT FROM pc.mx)
               AS range_changed
      FROM pb JOIN pc USING (column_name) ORDER BY column_name""")),

    // key-skew report: the pre-join diagnosis the Skew tools act on —
    // top-10 heaviest suppliers with share and ratio-to-mean (the
    // straggler predictor), all single exact-integer divisions.
    "q_meta_skew" -> (q((s, dir) =>
      graft.ops.Profiling.skewReport(
        SparkEntry.loader(s, dir)("lineitem"), "l_suppkey", k = 10)
    ), Some("""
      WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
                 FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
      s AS (SELECT CAST(count(*) AS BIGINT) AS nk, CAST(sum(cnt) AS BIGINT) AS nr FROM c),
      t AS (SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rk FROM c)
      SELECT CAST(rk AS INT) AS rank, key, cnt,
             round(CAST(cnt AS DOUBLE) / CAST(s.nr AS DOUBLE), 6) AS share,
             round(CAST(cnt * s.nk AS DOUBLE) / CAST(s.nr AS DOUBLE), 6) AS ratio_to_mean
      FROM t CROSS JOIN s WHERE rk <= 10 ORDER BY rank""")),

    // top-N + '(other)' rollup: the dashboard cardinality cap — ten
    // heaviest parts by shipped quantity, the long tail folded into
    // one row; integer weights so the tail fold is partition-order-
    // proof.
    "q_agg_topn_other" -> (q((s, dir) =>
      graft.ops.Rollup.topNOther(SparkEntry.loader(s, dir)("lineitem"),
          "l_partkey", col("l_quantity"), n = 10)
        .orderBy("rank")
    ), Some("""
      WITH a AS (SELECT CAST(l_partkey AS VARCHAR) AS key,
                        CAST(count(*) AS BIGINT) AS n_rows,
                        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS weight
                 FROM lineitem GROUP BY 1),
      r AS (SELECT *, row_number() OVER (ORDER BY weight DESC, key) AS rk FROM a)
      SELECT CAST(rk AS INT) AS rank, key, n_rows, weight FROM r WHERE rk <= 10
      UNION ALL
      SELECT CAST(11 AS INT), '(other)', CAST(sum(n_rows) AS BIGINT),
             CAST(sum(weight) AS BIGINT)
      FROM r WHERE rk > 10 HAVING count(*) > 0
      ORDER BY rank""")),

    // per-returnflag weighted median price — "the price at which half
    // the QUANTITY traded": integer weights keep the 2·cum ≥ W
    // crossing exact, the cumulative window runs over distinct values.
    "q_agg_weighted_median" -> (q((s, dir) =>
      graft.ops.Evaluation.weightedMedian(
          SparkEntry.loader(s, dir)("lineitem"),
          "l_returnflag", "l_extendedprice", "l_quantity")
        .orderBy("grp")
    ), Some("""
      WITH pv AS (SELECT l_returnflag AS grp, l_extendedprice AS v,
                         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
                  FROM lineitem
                  WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
                  GROUP BY 1, 2),
      c AS (SELECT grp, v, wv,
                   CAST(sum(wv) OVER (PARTITION BY grp ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(wv) OVER (PARTITION BY grp) AS BIGINT) AS tot
            FROM pv)
      SELECT grp, max(tot) AS total_weight, min(v) AS w_median
      FROM c WHERE cum * 2 >= tot GROUP BY grp ORDER BY grp""")),

    // two-level revenue drill-down (region → nation) with share-of-
    // parent and share-of-total: dims broadcast onto the fact, the
    // fact shuffles once for the aggregate, revenue summed as exact
    // integer cents (round(price·(1−disc)·100) — the one float
    // product is per-row deterministic; SUMMING raw doubles would
    // be partition-order-dependent).
    "q_agg_hierarchy" -> (q((s, dir) => {
      val load = SparkEntry.loader(s, dir)
      val fact = load("lineitem")
        .join(load("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(load("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(load("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(load("region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long").as("cents"))
      graft.ops.Rollup.shareOfParent(fact, "r_name", "n_name", col("cents"))
        .orderBy("parent", "child")
    }), Some("""
      WITH fact AS (
        SELECT r.r_name AS parent, n.n_name AS child,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey),
      agg AS (SELECT parent, child, CAST(sum(cents) AS BIGINT) AS weight
              FROM fact GROUP BY 1, 2),
      pt AS (SELECT parent, CAST(sum(weight) AS BIGINT) AS pw FROM agg GROUP BY 1),
      tt AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM agg)
      SELECT agg.parent, agg.child, agg.weight,
             round(CAST(agg.weight AS DOUBLE) / CAST(pt.pw AS DOUBLE), 6) AS share_of_parent,
             round(CAST(agg.weight AS DOUBLE) / CAST(tt.tw AS DOUBLE), 6) AS share_of_total
      FROM agg JOIN pt USING (parent) CROSS JOIN tt
      ORDER BY parent, child""")),

    // classifier CALIBRATION audit (reliability table): NB scores from
    // q_quality_nb's model bucketed into fixed-width bins (no global
    // sort — bin = clamped floor(score/2)·2), per bin the doc count,
    // mean rounded score, and observed 'en' fraction. The eval-rigor
    // companion to the filter itself. Oracle replays scorer + binning.
    "q_quality_calibration" -> (q((s, dir) => {
      val scored = graft.ops.Classifier.nbTrainScore(docs(s, dir), "doc_id", "text",
          col("lang") === "en")
        .join(docs(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("int").as("is_en")), Seq("doc_id"))
      val bin = least(greatest(floor(col("score") / 2.0) * 2.0, lit(-10.0)), lit(8.0))
      scored.groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n"), round(avg("score"), 6).as("mean_score"),
          round(avg("is_en"), 6).as("frac_en"))
        .orderBy("bin")
    }), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
            FROM cnt CROSS JOIN tot),
      sc AS (SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1),
      scored AS (
        SELECT d.doc_id, round(pri.b + coalesce(sc.s, 0.0), 6) AS score, d.y AS is_en
        FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri)
      SELECT least(greatest(floor(score / 2.0) * 2.0, -10.0), 8.0) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(score), 6) AS mean_score,
             round(avg(CAST(is_en AS DOUBLE)), 6) AS frac_en
      FROM scored GROUP BY 1 ORDER BY 1""")),

    // deterministic Poisson-bootstrap CI for a corpus statistic (the
    // eval-metric error bar): 40 resamples, multiplicities from
    // md5(id:b) hex cutoffs (engine-portable), ONE (b)-keyed aggregate,
    // percentile-disc interval on the rounded resample means. Oracle
    // replays draw, weights, and order statistics exactly.
    // Benford's-law forensic audit of the price column: observed
    // leading-digit counts vs the log10(1+1/d) law, per-digit χ²
    // contributions. Leading digit from the integer part's decimal
    // STRING (floor(log10) is a ULP landmine at powers of ten);
    // expected probabilities are 6-dp literals in BOTH engines.
    "q_quality_benford" -> (q((s, dir) =>
      graft.ops.Profiling.benfordAudit(
          SparkEntry.loader(s, dir)("lineitem"), "l_extendedprice")
        .orderBy("digit")
    ), Some("""
      WITH v AS (
        SELECT abs(l_extendedprice) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
          AND abs(l_extendedprice) >= 1.0),
      d AS (SELECT CAST(substr(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
            FROM v),
      obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY 1),
      exp AS (SELECT * FROM (VALUES
        (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691), (5, 0.079181),
        (6, 0.066947), (7, 0.057992), (8, 0.051153), (9, 0.045757)) e(digit, expected_p)),
      n AS (SELECT sum(observed) AS n FROM obs)
      SELECT e.digit, CAST(coalesce(o.observed, 0) AS BIGINT) AS observed,
             CAST(e.expected_p AS DOUBLE) AS expected_p,
             round((coalesce(o.observed, 0) - n.n * CAST(e.expected_p AS DOUBLE)) *
                   (coalesce(o.observed, 0) - n.n * CAST(e.expected_p AS DOUBLE)) /
                   (n.n * CAST(e.expected_p AS DOUBLE)), 6) AS chi2_term
      FROM exp e LEFT JOIN obs o USING (digit) CROSS JOIN n ORDER BY e.digit""")),

    // Gini concentration of document lengths — the corpus-balance
    // audit (0 = even, →1 = one doc holds everything). Exact from the
    // distinct-value distribution: tied groups contribute their rank-
    // range arithmetic series, so the cumulative window is bounded by
    // value cardinality (the KS/AUC pattern); integer sums stay exact,
    // only the final ratio rounds.
    "q_stats_gini" -> (q((s, dir) =>
      graft.ops.Profiling.giniCoefficient(docs(s, dir), "n_chars")
    ), Some("""
      WITH g AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, count(*) AS c
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0 GROUP BY 1),
      t AS (SELECT v, c, sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc FROM g)
      SELECT CAST(sum(c) AS BIGINT) AS n, round(sum(v * c), 6) AS total,
             round(2.0 * sum(v * ((cumc - c) * c + c * (c + 1) / 2)) /
                   (sum(c) * sum(v * c)) - (sum(c) + 1.0) / sum(c), 6) AS gini
      FROM t""")),

    // EXACT median via iterative histogram refinement — no global
    // sort, no approx_percentile error bar: each round is one
    // full-scan histogram (≤2048 driver-side counters, the bounded-
    // metadata class) narrowing the range ~2000×, so 10¹² rows resolve
    // in ~3 scans + one ≤64Ki-value collect. Oracle: DuckDB's exact
    // median over the same filter.
    "q_stats_median" -> (q((s, dir) => {
      val (n, med) = graft.ops.Sketches.exactMedianTwoPass(
        SparkEntry.loader(s, dir)("events"), "value")
      import s.implicits._
      Seq((n, math.rint(med * 1e6) / 1e6)).toDF("n", "median_value")
    }), Some("""
      SELECT CAST(count(value) AS BIGINT) AS n,
             round(median(value), 6) AS median_value
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)""")),

    "q_stats_bootstrap" -> (q((s, dir) =>
      graft.ops.Profiling.bootstrapMeanCI(docs(s, dir), "doc_id", "n_chars",
        b = 40, q = 0.025)
    ), Some("""
      WITH bs AS (SELECT unnest(generate_series(1, 40)) AS b),
      r AS (
        SELECT bs.b, CAST(d.n_chars AS DOUBLE) AS x,
               substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(bs.b AS VARCHAR)), 1, 8) AS h
        FROM documents d CROSS JOIN bs WHERE d.n_chars IS NOT NULL),
      wgt AS (
        SELECT b, x,
               CASE WHEN h < '5e2d58d8' THEN 0 WHEN h < 'bc5ab1b1' THEN 1
                    WHEN h < 'eb715e1d' THEN 2 WHEN h < 'fb239797' THEN 3
                    WHEN h < 'ff1025f5' THEN 4 ELSE 5 END AS w
        FROM r),
      means AS (SELECT b, round(sum(w * x) / sum(w), 6) AS m FROM wgt GROUP BY 1),
      ranked AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS rk FROM means),
      pt AS (SELECT round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean FROM documents)
      SELECT CAST(40 AS BIGINT) AS b_count, pt.mean, lo.m AS ci_lo, hi.m AS ci_hi
      FROM pt,
           (SELECT m FROM ranked WHERE rk = 1) lo,
           (SELECT m FROM ranked WHERE rk = 39) hi""")),

    // retrieval EVALUATION: recall@20 / MRR@20 / nDCG@20 of the BM25
    // runs against a deterministic relevance set (docs containing ALL
    // the query's terms — strict AND match, derivable in both
    // engines). One rank-keyed judged join + one per-query aggregate;
    // IDCG from the capped relevance count alone (binary gains).
    "q_eval_retrieval" -> (q((s, dir) => {
      val queries = Seq(
        "spark_join" -> Seq("spark", "join"),
        "hash_scan" -> Seq("hash", "table", "scan"),
        "stream_win" -> Seq("stream", "window"))
      val runs = TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text", queries, k = 20)
      val d = docs(s, dir).select(col("doc_id").as("id"),
        TextAnalysis.tokens(lower(col("text"))).as("t"))
      val rel = queries.map { case (qid, ts) =>
        d.where(ts.map(t => array_contains(col("t"), t)).reduce(_ && _))
          .select(lit(qid).as("qid"), col("id"))
      }.reduce(_ unionByName _)
      graft.ops.Evaluation.rankingMetrics(runs, rel, k = 20).orderBy("qid")
    }), Some("""
      WITH toks AS (
        SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      tf AS (SELECT id, unnest(t) AS term FROM toks),
      tfc AS (SELECT id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
      dl AS (SELECT id, sum(tf) AS dl FROM tfc GROUP BY 1),
      stats AS (
        SELECT count(*) AS n, avg(coalesce(dl, 0)) AS avgdl
        FROM documents LEFT JOIN dl ON documents.doc_id = dl.id),
      dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
      qq AS (SELECT * FROM (VALUES
        ('spark_join', 'spark'), ('spark_join', 'join'),
        ('hash_scan', 'hash'), ('hash_scan', 'table'), ('hash_scan', 'scan'),
        ('stream_win', 'stream'), ('stream_win', 'window')) AS t(qid, term)),
      sc AS (
        SELECT qid, id,
               ln(1 + (n - df + 0.5) / (df + 0.5)) *
               (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
        FROM tfc JOIN qq USING (term) JOIN dl USING (id)
                 JOIN dfreq USING (term) CROSS JOIN stats),
      sums AS (SELECT qid, id, round(sum(s), 6) AS score FROM sc GROUP BY 1, 2),
      runs AS (SELECT qid, id,
                      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
               FROM sums QUALIFY rank <= 20),
      rel AS (
        SELECT 'spark_join' AS qid, id FROM toks
        WHERE list_contains(t, 'spark') AND list_contains(t, 'join')
        UNION ALL
        SELECT 'hash_scan', id FROM toks
        WHERE list_contains(t, 'hash') AND list_contains(t, 'table') AND list_contains(t, 'scan')
        UNION ALL
        SELECT 'stream_win', id FROM toks
        WHERE list_contains(t, 'stream') AND list_contains(t, 'window')),
      relc AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY 1),
      judged AS (
        SELECT r.qid,
               sum(CASE WHEN rel.id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
               min(CASE WHEN rel.id IS NOT NULL THEN r.rank END) AS first_rel,
               sum(CASE WHEN rel.id IS NOT NULL THEN 1.0 / log2(r.rank + 1.0) ELSE 0.0 END) AS dcg
        FROM runs r LEFT JOIN rel ON r.qid = rel.qid AND r.id = rel.id
        GROUP BY 1),
      ser AS (SELECT unnest(generate_series(1, 20)) AS i),
      idcgt AS (
        SELECT relc.qid, sum(1.0 / log2(ser.i + 1.0)) AS idcg
        FROM relc JOIN ser ON ser.i <= least(relc.n_rel, 20)
        GROUP BY 1)
      SELECT relc.qid,
             round(coalesce(j.hits, 0) / CAST(relc.n_rel AS DOUBLE), 6) AS recall_20,
             round(coalesce(1.0 / j.first_rel, 0.0), 6) AS mrr_20,
             round(coalesce(j.dcg, 0.0) / idcgt.idcg, 6) AS ndcg_20
      FROM relc LEFT JOIN judged j USING (qid) JOIN idcgt USING (qid)
      ORDER BY relc.qid""")),

    // ROC-AUC of the NB quality scores against the true label —
    // Mann-Whitney with midrank ties: one score-keyed aggregate, the
    // cumulative window runs over DISTINCT scores only. Closes the
    // classifier-eval trio (scores → calibration → AUC).
    "q_eval_auc" -> (q((s, dir) => {
      val scored = graft.ops.Classifier.nbTrainScore(docs(s, dir), "doc_id", "text",
          col("lang") === "en")
        .join(docs(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("int").as("is_en")), Seq("doc_id"))
      graft.ops.Evaluation.binaryAuc(scored, "score", "is_en")
    }), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
            FROM cnt CROSS JOIN tot),
      sc AS (SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1),
      scored AS (
        SELECT round(pri.b + coalesce(sc.s, 0.0), 6) AS score, d.y
        FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri),
      groups AS (
        SELECT score, sum(y) AS pos, sum(1 - y) AS neg FROM scored GROUP BY 1),
      cum AS (
        SELECT pos, neg,
               coalesce(sum(neg) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        FROM groups)
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
             round(sum(pos * (neg_below + neg / 2.0)) / (sum(pos) * sum(neg)), 6) AS auc
      FROM cum""")),

    // two-sample KS statistic between sources' length distributions —
    // the numeric drift test beside q_pipeline_drift's class-mix view:
    // one value-keyed count aggregate + cumulative windows over
    // DISTINCT values, exact counts into one rounded ratio.
    "q_eval_ks" -> (q((s, dir) =>
      graft.ops.Evaluation.ksStatistic(docs(s, dir), "source", "n_chars",
        "src0", "src1")
    ), Some("""
      WITH base AS (
        SELECT source AS g, CAST(n_chars AS DOUBLE) AS v
        FROM documents
        WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL),
      counts AS (
        SELECT v,
               sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
        FROM base GROUP BY 1),
      cum AS (
        SELECT sum(ca) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
               sum(cb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
               sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM counts)
      SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             round(max(abs(cum_a / CAST(na AS DOUBLE) - cum_b / CAST(nb AS DOUBLE))), 6) AS ks
      FROM cum""")),

    // chi-square independence of (source, lang) — "does language
    // depend on source": χ² from exact integer marginals, e = r·c/n;
    // statistic + dof only (p-values need the incomplete gamma and
    // belong to lookup tables).
    "q_eval_chi2" -> (q((s, dir) =>
      graft.ops.Evaluation.chiSquareIndependence(docs(s, dir), "source", "lang")
    ), Some("""
      WITH obs AS (SELECT source AS a, lang AS b, count(*) AS o
                   FROM documents GROUP BY 1, 2),
      ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
      cbt AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
      nn AS (SELECT sum(o) AS n FROM obs),
      cells AS (
        SELECT coalesce(obs.o, 0) AS o, nn.n,
               ra.ra * cbt.cb / CAST(nn.n AS DOUBLE) AS e
        FROM ra CROSS JOIN cbt
        LEFT JOIN obs ON obs.a = ra.a AND obs.b = cbt.b
        CROSS JOIN nn),
      dims AS (SELECT count(DISTINCT a) AS na, count(DISTINCT b) AS nb FROM obs)
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST((max(dims.na) - 1) * (max(dims.nb) - 1) AS BIGINT) AS dof,
             round(sum((o - e) * (o - e) / e), 6) AS chi2
      FROM cells CROSS JOIN dims""")),

    // average precision (PR-AUC by the step rule) of the NB scores —
    // the imbalance-honest companion to q_eval_auc: tied score groups
    // enter whole (precision at group end), one score-keyed aggregate,
    // cumulative window over DISTINCT scores only.
    "q_eval_ap" -> (q((s, dir) => {
      val scored = graft.ops.Classifier.nbTrainScore(docs(s, dir), "doc_id", "text",
          col("lang") === "en")
        .join(docs(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("int").as("is_en")), Seq("doc_id"))
      graft.ops.Evaluation.averagePrecision(scored, "score", "is_en")
    }), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
            FROM cnt CROSS JOIN tot),
      sc AS (SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1),
      scored AS (
        SELECT round(pri.b + coalesce(sc.s, 0.0), 6) AS score, d.y
        FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri),
      groups AS (
        SELECT score, sum(y) AS pos, count(*) AS n FROM scored GROUP BY 1),
      cum AS (
        SELECT pos, n,
               sum(pos) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
               sum(n) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        FROM groups)
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(n) - sum(pos) AS BIGINT) AS n_neg,
             round(sum(pos * (cum_pos / CAST(cum_n AS DOUBLE))) / sum(pos), 6) AS ap
      FROM cum""")),

    // calibration scalars (ECE + Brier) of the NB filter: confidence =
    // sigmoid of the rounded log-odds score, 10 equal-width bins, both
    // scalars from ONE aggregate over the binned scores. The summary
    // numbers beside q_quality_calibration's full reliability table.
    "q_eval_ece" -> (q((s, dir) => {
      val scored = graft.ops.Classifier.nbTrainScore(docs(s, dir), "doc_id", "text",
          col("lang") === "en")
        .join(docs(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("int").as("is_en")), Seq("doc_id"))
        .select((lit(1.0) / (lit(1.0) + exp(-col("score")))).as("prob"), col("is_en"))
      graft.ops.Evaluation.calibrationError(scored, "prob", "is_en", bins = 10)
    }), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
            FROM cnt CROSS JOIN tot),
      sc AS (SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1),
      scored AS (
        SELECT 1.0 / (1.0 + exp(-round(pri.b + coalesce(sc.s, 0.0), 6))) AS p, d.y
        FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri),
      binned AS (
        SELECT least(floor(p * 10), 9) AS b, count(*) AS n,
               avg(CAST(y AS DOUBLE)) AS acc, avg(p) AS conf,
               sum((p - y) * (p - y)) AS se
        FROM scored GROUP BY 1)
      SELECT CAST(sum(n) AS BIGINT) AS n,
             round(sum(abs(acc - conf) * n) / sum(n), 6) AS ece,
             round(sum(se) / sum(n), 6) AS brier
      FROM binned""")),

    // Cohen's kappa between two rule-based quality raters — the
    // inter-signal agreement audit run before trusting either gate:
    // 2×2 confusion from ONE aggregate pass, exact rational p_o/p_e.
    "q_eval_kappa" -> (q((s, dir) =>
      graft.ops.Evaluation.cohensKappa(
        docs(s, dir).select(
          (TextAnalysis.tokenCount(col("text")) >= 25).as("rater_a"),
          (col("n_chars") >= 135).as("rater_b")),
        "rater_a", "rater_b")
    ), Some("""
      WITH r AS (
        SELECT CASE WHEN (CASE WHEN length(trim(text)) > 0
                          THEN len(regexp_split_to_array(trim(text), '\s+'))
                          ELSE 0 END) >= 25 THEN 1 ELSE 0 END AS a,
               CASE WHEN n_chars >= 135 THEN 1 ELSE 0 END AS b
        FROM documents),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree,
               sum(a) AS a1, sum(b) AS b1
        FROM r)
      SELECT n, round(agree / CAST(n AS DOUBLE), 6) AS p_o,
             round((agree / CAST(n AS DOUBLE) -
                    ((a1 / CAST(n AS DOUBLE)) * (b1 / CAST(n AS DOUBLE)) +
                     ((n - a1) / CAST(n AS DOUBLE)) * ((n - b1) / CAST(n AS DOUBLE)))) /
                   (1.0 - ((a1 / CAST(n AS DOUBLE)) * (b1 / CAST(n AS DOUBLE)) +
                     ((n - a1) / CAST(n AS DOUBLE)) * ((n - b1) / CAST(n AS DOUBLE)))), 6) AS kappa
      FROM agg""")),

    // unbiased pass@k estimator (Chen et al. 2021 eq. 1, telescoped
    // product — no factorials): tasks = event types, n = trials,
    // c = successes (value > 50). n < k rows excluded (estimator
    // undefined); n − c < k forces 1 through the zero factor in both
    // engines identically.
    "q_eval_passk" -> (q((s, dir) =>
      graft.ops.Evaluation.passAtK(
        SparkEntry.loader(s, dir)("events").groupBy(col("event_type").as("task"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("c")),
        k = 5).orderBy("task")
    ), Some("""
      WITH cnts AS (
        SELECT event_type AS task, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM events GROUP BY 1),
      p AS (
        SELECT task, n, c,
               product((n - c - j) / CAST(n - j AS DOUBLE)) AS pr
        FROM cnts CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS j)
        GROUP BY 1, 2, 3)
      SELECT task, n, c,
             round(CASE WHEN n - c < 5 THEN 1.0 ELSE 1.0 - pr END, 6) AS pass_at_k
      FROM p WHERE n >= 5 ORDER BY task""")),

    // split-conformal interval for the persistence forecast on the
    // daily series: q̂ is an exact order statistic of calibration
    // residuals (rank from INTEGER rational-α arithmetic), coverage
    // reported on the held-out suffix — the distribution-free
    // uncertainty wrapper (α = 1/5, cal = first 19 residuals).
    "q_eval_conformal" -> (q((s, dir) => {
      val daily = SparkEntry.loader(s, dir)("events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.Evaluation.conformalPersistence(daily, "day", "x",
        calN = 19, alphaNum = 1, alphaDen = 5)
    }), Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      r AS (SELECT day, abs(x - lag(x) OVER (ORDER BY day)) AS res FROM daily),
      rr AS (SELECT day, res, row_number() OVER (ORDER BY day) AS rn
             FROM r WHERE res IS NOT NULL),
      cal AS (SELECT * FROM rr WHERE rn <= 19),
      tst AS (SELECT * FROM rr WHERE rn > 19),
      nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
      kk AS (SELECT CAST(((n_cal + 1) * 4 + 4) // 5 AS BIGINT) AS k FROM nc),
      q AS (SELECT res AS qhat FROM (
              SELECT res, row_number() OVER (ORDER BY res, day) AS rk FROM cal)
            CROSS JOIN kk WHERE rk = kk.k)
      SELECT nc.n_cal, CAST(count(*) AS BIGINT) AS n_test, q.qhat,
             round(CAST(sum(CASE WHEN tst.res <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE) /
                   count(*), 6) AS coverage
      FROM tst CROSS JOIN q CROSS JOIN nc
      GROUP BY nc.n_cal, q.qhat""")),

    // model-based quality filter (fastText-style linear bag-of-words,
    // the CCNet/GPT-3 crawl gate): closed-form multinomial Naive Bayes
    // fit on the lang='en' slice and scored over the whole corpus —
    // train = ONE token-keyed count shuffle, score = broadcast weight
    // join + one doc-keyed sum (Classifier.nbTrainScore; the
    // gradient-descent path trainLogReg/scoreLogReg is spec-covered —
    // its learned weights are float-iteration artifacts with no SQL
    // oracle). Oracle replays counts → smoothed log-odds → per-doc sum.
    "q_quality_nb" -> (q((s, dir) =>
      graft.ops.Classifier.nbTrainScore(docs(s, dir), "doc_id", "text",
        col("lang") === "en")
    ), Some("""
      WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      toks AS (
        SELECT doc_id, y, unnest(regexp_split_to_array(t, '\s+')) AS tok
        FROM d WHERE length(t) > 0),
      cnt AS (
        SELECT tok, sum(y) AS c1, sum(1 - y) AS c0 FROM toks GROUP BY 1),
      tot AS (
        SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cnt),
      pri AS (
        SELECT ln((sum(y) + 1.0) / (sum(1 - y) + 1.0)) AS b FROM d),
      w AS (
        SELECT tok, ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)) AS w
        FROM cnt CROSS JOIN tot),
      sc AS (
        SELECT doc_id, sum(w.w) AS s FROM toks JOIN w USING (tok) GROUP BY 1)
      SELECT d.doc_id,
             round(pri.b + coalesce(sc.s, 0.0), 6) AS score,
             round(pri.b + coalesce(sc.s, 0.0), 6) > 0 AS pred
      FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN pri
      ORDER BY d.doc_id""")),
  )
}

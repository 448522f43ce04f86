package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 20 entries: sampling, token budgeting, sequence packing (q_sample_*, q_budget_*, q_pack_*, q_split_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingSamplingEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // token-budget WATER FILLING across sources (the mixture-design
    // "epochs per source" recipe arithmetic): weights derived from the
    // source index, budget = ⌊2.2 × corpus tokens⌋ with a 3-epoch cap
    // so heavy-weight sources genuinely cap and redistribute at every
    // SF. All-long allocation arithmetic; oracle replays 3 rounds as
    // chained CTEs.
    "q_budget_mix" -> (q((s, dir) => graft.ops.Pinned.guard {
      // checkpoint the per-source token counts ONCE and derive BOTH the
      // driver-side `total` and budgetAllocate's input from the pinned
      // frame (VERDICT r12 #3: deriving total via .head() on the lazy
      // frame and then letting budgetAllocate's first checkpoint
      // re-materialize it tokenized the whole corpus TWICE per
      // invocation — the mechanism behind the entry's persistent
      // warm>cold inversion). budgetAllocate's own first checkpoint
      // materializes from this pin during the call, so releasing it
      // after the call returns is safe.
      val (counts, h) = graft.ops.Pinned.checkpoint(
        docs(s, dir).groupBy("source")
          .agg(sum(TextAnalysis.tokenCount(col("text"))).as("tokens"))
          .withColumn("weight",
            (substring(col("source"), 4, 10).cast("int") % 4 + 1).cast("double")))
      val total = counts.agg(sum("tokens")).head().getLong(0)
      val out = graft.ops.Sampling.budgetAllocate(counts,
          budget = math.floor(2.2 * total).toLong, maxEpochs = 3.0)
        .orderBy("source")
      graft.ops.Pinned.release(h)
      out
    }), Some("""
      WITH base AS (
        SELECT source,
               CAST(sum(CASE WHEN length(trim(text)) > 0
                             THEN len(regexp_split_to_array(trim(text), '\s+'))
                             ELSE 0 END) AS BIGINT) AS tokens,
               CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) AS weight
        FROM documents GROUP BY source),
      p AS (SELECT CAST(floor(2.2 * sum(tokens)) AS BIGINT) AS budget FROM base),
      r0 AS (SELECT source, tokens, weight,
                    CAST(floor(tokens * 3.0) AS BIGINT) AS cap,
                    CAST(0 AS BIGINT) AS alloc
             FROM base),
      t1 AS (SELECT sum(CASE WHEN alloc < cap THEN weight END) AS wsum,
                    budget - sum(alloc) AS rem
             FROM r0 CROSS JOIN p GROUP BY budget),
      r1 AS (SELECT source, tokens, weight, cap,
                    alloc + CASE WHEN alloc < cap AND wsum > 0
                                 THEN least(cap - alloc,
                                      CAST(floor(rem * weight / wsum) AS BIGINT))
                                 ELSE 0 END AS alloc
             FROM r0 CROSS JOIN t1),
      t2 AS (SELECT sum(CASE WHEN alloc < cap THEN weight END) AS wsum,
                    budget - sum(alloc) AS rem
             FROM r1 CROSS JOIN p GROUP BY budget),
      r2 AS (SELECT source, tokens, weight, cap,
                    alloc + CASE WHEN alloc < cap AND wsum > 0
                                 THEN least(cap - alloc,
                                      CAST(floor(rem * weight / wsum) AS BIGINT))
                                 ELSE 0 END AS alloc
             FROM r1 CROSS JOIN t2),
      t3 AS (SELECT sum(CASE WHEN alloc < cap THEN weight END) AS wsum,
                    budget - sum(alloc) AS rem
             FROM r2 CROSS JOIN p GROUP BY budget),
      r3 AS (SELECT source, tokens, weight, cap,
                    alloc + CASE WHEN alloc < cap AND wsum > 0
                                 THEN least(cap - alloc,
                                      CAST(floor(rem * weight / wsum) AS BIGINT))
                                 ELSE 0 END AS alloc
             FROM r2 CROSS JOIN t3)
      SELECT source, tokens, cap, CAST(alloc AS BIGINT) AS alloc,
             round(alloc / tokens, 6) AS epochs
      FROM r3 ORDER BY source""")),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    // top-100 docs by u^(1/w) keys, u the deterministic md5 uniform,
    // weight = n_chars — the proportional-to-length corpus draw.
    // Global top-k plans as TakeOrderedAndProject (no corpus sort).
    "q_sample_weighted" -> (q((s, dir) =>
      graft.ops.Sampling.weightedTake(docs(s, dir), "doc_id", "n_chars", k = 100)
    ), Some("""
      WITH k AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS weight,
               ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
                  / 4294967297.0) / CAST(n_chars AS DOUBLE) AS key
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      r AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rank FROM k)
      SELECT CAST(rank AS INT) AS rank, doc_id AS id, weight
      FROM r WHERE rank <= 100 ORDER BY rank""")),

    // rendezvous (HRW) shard routing: each doc to the shard
    // maximizing md5(shard:key) — the stable partition map whose
    // minimal-disruption law (only ~1/N of keys move on reshard) is
    // spec-pinned; pure scan-stage Column algebra, no shuffle.
    "q_sample_rendezvous" -> (q((s, dir) =>
      graft.ops.Sampling.rendezvousAssign(
          docs(s, dir).select(col("doc_id")), "doc_id",
          Seq("shard0", "shard1", "shard2", "shard3"))
        .groupBy("shard").agg(count(lit(1)).as("n_docs"))
        .orderBy("shard")
    ), Some("""
      WITH sc AS (
        SELECT doc_id, sh, md5(sh || ':' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents, unnest(['shard0', 'shard1', 'shard2', 'shard3']) AS t(sh)),
      w AS (SELECT doc_id, sh,
                   row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, sh DESC) AS rk
            FROM sc)
      SELECT sh AS shard, CAST(count(*) AS BIGINT) AS n_docs
      FROM w WHERE rk = 1 GROUP BY 1 ORDER BY shard""")),

    // largest-remainder (Hamilton) apportionment of a 10,000-doc
    // sampling budget across sources by character mass: base shares
    // via EXACT remainder arithmetic (floor(a/b) on a rounded double
    // can land wrong when a/b grazes an integer), leftovers to the
    // largest remainders — Σalloc = total by construction.
    "q_sample_apportion" -> (q((s, dir) => {
      val weights = docs(s, dir).groupBy(col("source").as("src"))
        .agg(sum(col("n_chars").cast("long")).as("chars"))
      graft.ops.Sampling.apportion(weights, "src", "chars", total = 10000L)
        .orderBy("key")
    }), Some("""
      WITH w AS (SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS weight
                 FROM documents GROUP BY 1 HAVING sum(n_chars) > 0),
      s AS (SELECT CAST(sum(weight) AS BIGINT) AS s FROM w),
      b AS (SELECT key, weight,
                   CAST((10000 * weight) % s.s AS BIGINT) AS remainder,
                   CAST((10000 * weight) // s.s AS BIGINT) AS base
            FROM w CROSS JOIN s),
      l AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS lft FROM b),
      r AS (SELECT *, row_number() OVER (ORDER BY remainder DESC, key) AS rk FROM b)
      SELECT key, weight, base, remainder,
             CAST(base + CASE WHEN rk <= l.lft THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM r CROSS JOIN l ORDER BY key""")),

    // deterministic split assignment / sampling: md5-prefix buckets are
    // bytewise-identical across engines and independent of partitioning,
    // so the oracle IS the production semantics (a row never changes
    // split when the corpus grows — per-row hash, not rank)
    "q_split_assign" -> (q((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.ops.Sampling.splitAssign(col("text"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    ), Some("""
      SELECT doc_id,
        CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
             WHEN substr(md5(text), 1, 2) < 'e7' THEN 'val'
             ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")),

    // stratified per-class sample: 5 embeddings per label under the
    // md5-hash order — membership is deterministic across engines and
    // partitionings; ranks come from the distributed prefix-sum (few
    // huge strata = the per-key window's worst case)
    "q_sample_stratified" -> (q((s, dir) =>
      graft.ops.Sampling.stratifiedTake(
          embs(s, dir).select(col("label"), col("vec_id")), "label", "vec_id", 5)
        .select(col("label"), col("vec_id"))
    ), Some("""
      WITH r AS (
        SELECT label, vec_id,
               row_number() OVER (PARTITION BY label
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
        FROM embeddings)
      SELECT label, vec_id FROM r WHERE rn < 5 ORDER BY label, vec_id""")),

    // sequence packing: head-to-tail token offsets in the md5 order +
    // the fixed-size windows each doc starts/ends in (distributed
    // prefix sum — no single-task window). Oracle window sums MUST be
    // CAST to BIGINT: DuckDB integer sum() yields HUGEINT, which the
    // driver's pandas comparator converts to float64 and hashes
    // differently from Spark's int64 even when values are equal.
    "q_pack_sequences" -> (q((s, dir) =>
      graft.ops.Batching.packOffsets(docs(s, dir), "doc_id", "text", windowTokens = 512L)
        .withColumnRenamed("id", "doc_id")
    ), Some("""
      WITH m AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
          md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents),
      o AS (
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
          CAST(coalesce(sum(n_tok) OVER (ORDER BY ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        FROM m)
      SELECT doc_id, n_tok, "offset",
        CAST("offset" // 512 AS BIGINT) AS window_start,
        CAST((CASE WHEN n_tok > 0 THEN "offset" + n_tok - 1 ELSE "offset" END) // 512 AS BIGINT) AS window_end
      FROM o ORDER BY doc_id""")),

    // sequence packing under an EXACT BPE token budget — the composition
    // a trainer actually runs (windows hold model tokens, not whitespace
    // words): packOffsetsBy with Tokenizer.bpeTokenCount under the same
    // disjoint-pair vocab as q_tokenize_bpe, so the oracle's n_tok is
    // the same SQL-expressible formula feeding the same running-window
    // arithmetic as q_pack_sequences.
    "q_pack_bpe" -> (q((s, dir) => {
      val vocab = graft.ops.Tokenizer.parseMerges(
        Seq("#version: 0.2", "t h", "e r", "o n"))
      // distinct-word encode + join (Tokenizer.bpeTokenCountsByDoc), NOT
      // the per-row bpeTokenCount UDF: a full-corpus token-budget pass
      // must pay the merge loop per DISTINCT word, not per occurrence
      val counts = graft.ops.Tokenizer.bpeTokenCountsByDoc(
        docs(s, dir).withColumn("__sp", translate(col("text"), "'", " ")),
        "doc_id", col("__sp"), vocab)
      graft.ops.Batching.packOffsetsFromCounts(counts, "doc_id", "n_tok",
          windowTokens = 512L)
        .withColumnRenamed("id", "doc_id")
    }), Some("""
      WITH m AS (
        SELECT doc_id,
          length(replace(t, ' ', ''))
            - (length(t) - length(replace(t, 'th', ''))) // 2
            - (length(t) - length(replace(t, 'er', ''))) // 2
            - (length(t) - length(replace(t, 'on', ''))) // 2 AS n_tok,
          md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM (SELECT doc_id, replace(text, chr(39), ' ') AS t FROM documents)),
      o AS (
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
          CAST(coalesce(sum(n_tok) OVER (ORDER BY ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        FROM m)
      SELECT doc_id, n_tok, "offset",
        CAST("offset" // 512 AS BIGINT) AS window_start,
        CAST((CASE WHEN n_tok > 0 THEN "offset" + n_tok - 1 ELSE "offset" END) // 512 AS BIGINT) AS window_end
      FROM o ORDER BY doc_id""")),

    // training-block materialization on top of the packing offsets: per
    // fixed-size window, which docs feed it and how many tokens each
    // contributes (straddling docs slice across the boundary). The
    // invariant a trainer relies on — every block except the corpus
    // tail holds EXACTLY windowTokens tokens — is stated by the oracle's
    // identical slice arithmetic and checked by the hash gate.
    "q_pack_blocks" -> (q((s, dir) =>
      graft.ops.Batching.windowMembership(
          graft.ops.Batching.packOffsets(docs(s, dir), "doc_id", "text",
            windowTokens = 512L), windowTokens = 512L)
        .groupBy(col("window"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_window")).as("n_tok"),
          min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
        .orderBy("window")
    ), Some("""
      WITH m AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
          md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents),
      o AS (
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
          CAST(coalesce(sum(n_tok) OVER (ORDER BY ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        FROM m WHERE n_tok > 0),
      w AS (
        SELECT doc_id, n_tok, "offset",
               unnest(generate_series("offset" // 512,
                 ("offset" + n_tok - 1) // 512)) AS "window"
        FROM o)
      SELECT CAST("window" AS BIGINT) AS "window",
             count(*) AS n_docs,
             CAST(sum(least("offset" + n_tok, ("window" + 1) * 512)
                      - greatest("offset", "window" * 512)) AS BIGINT) AS n_tok,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM w GROUP BY "window" ORDER BY "window"""")),

    // deterministic EPOCH SHUFFLE: each epoch orders the corpus by
    // md5(seed:epoch:id) — independent permutations per epoch with no
    // RNG state, stable as the corpus grows; ranks come from the
    // distributed two-pass prefix-sum (no single-task window). The entry
    // runs two epochs and the oracle replays both permutations exactly.
    "q_pack_epoch_shuffle" -> (q((s, dir) => {
      val d = docs(s, dir).select("doc_id")
      graft.ops.Batching.epochShuffle(d, "doc_id", "s42", 0)
        .unionByName(graft.ops.Batching.epochShuffle(d, "doc_id", "s42", 1))
        .select(col("doc_id"), col("epoch"), col("shuffle_key"), col("shuffle_rank"))
        .orderBy("epoch", "shuffle_rank")
    }), Some("""
      WITH e AS (SELECT doc_id, ep.epoch FROM documents, (VALUES (0), (1)) AS ep(epoch)),
      k AS (SELECT doc_id, epoch,
                   md5('s42:' || epoch || ':' || doc_id) AS shuffle_key FROM e)
      SELECT doc_id, epoch, shuffle_key,
             CAST(row_number() OVER (PARTITION BY epoch
               ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS shuffle_rank
      FROM k ORDER BY epoch, shuffle_rank""")),

    // Reciprocal Rank Fusion (Cormack et al. 2009): three scale-free
    // integer signals (token/char/digit counts) fuse via Σ 1/(60+rank)
    // — per-signal dense ranks from the distributed prefix-sum with md5
    // tie-breaks, replayed by row_number windows; the fused double is a
    // fixed-order sum of exact reciprocals, identical in both engines
    "q_sample_rrf" -> (q((s, dir) =>
      graft.ops.Fusion.reciprocalRankFusion(
          docs(s, dir), "doc_id",
          Seq("tok" -> coalesce(TextAnalysis.tokenCount(col("text")), lit(0L)),
            "chars" -> coalesce(TextAnalysis.charCount(col("text")), lit(0L)),
            "digits" -> coalesce(TextAnalysis.digitCount(col("text")), lit(0L))))
        .orderBy("doc_id")
    ), Some("""
      WITH m AS (
        SELECT doc_id,
          coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 0) AS s_tok,
          coalesce(length(text), 0) AS s_chars,
          coalesce(len(regexp_extract_all(text, '[0-9]')), 0) AS s_digits,
          md5(CAST(doc_id AS VARCHAR)) AS tie
        FROM documents),
      r AS (
        SELECT doc_id,
          row_number() OVER (ORDER BY s_tok DESC, tie, doc_id) - 1 AS rank_tok,
          row_number() OVER (ORDER BY s_chars DESC, tie, doc_id) - 1 AS rank_chars,
          row_number() OVER (ORDER BY s_digits DESC, tie, doc_id) - 1 AS rank_digits
        FROM m)
      SELECT doc_id,
             CAST(rank_tok AS BIGINT) AS rank_tok,
             CAST(rank_chars AS BIGINT) AS rank_chars,
             CAST(rank_digits AS BIGINT) AS rank_digits,
             1.0 / (60.0 + rank_tok) + 1.0 / (60.0 + rank_chars)
               + 1.0 / (60.0 + rank_digits) AS rrf
      FROM r ORDER BY doc_id""")),

    // CURRICULUM ordering: the classic short-to-long schedule (Bengio et
    // al. 2009) — global rank by ascending whitespace token count, md5
    // tie-break within equal difficulty; the rank rides the distributed
    // two-pass prefix sum, replayed by the oracle's row_number
    "q_pack_curriculum" -> (q((s, dir) =>
      graft.ops.Batching.curriculumOrder(
          docs(s, dir).select("doc_id", "text"), "doc_id",
          TextAnalysis.tokenCount(col("text")))
        .select(col("doc_id"), col("difficulty"), col("curriculum_rank"))
        .orderBy("curriculum_rank")
    ), Some("""
      WITH m AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS difficulty,
          md5(CAST(doc_id AS VARCHAR)) AS tie
        FROM documents)
      SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty,
             CAST(row_number() OVER (ORDER BY difficulty, tie, doc_id) - 1
               AS BIGINT) AS curriculum_rank
      FROM m ORDER BY curriculum_rank""")),

    // length-bucketed dynamic batching: power-of-two token-length
    // buckets (bit-length arithmetic, engine-exact), md5-ordered batches
    // of 32 within each bucket, per-batch padding-waste accounting —
    // the batch-assembly shape that bounds padding at 2× per batch
    "q_pack_length_buckets" -> (q((s, dir) =>
      graft.ops.Batching.lengthBucketBatches(docs(s, dir), "doc_id", "text",
          batchSize = 32)
        .orderBy("bucket", "batch")
    ), Some("""
      WITH m AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents WHERE length(trim(text)) > 0),
      b AS (SELECT doc_id, n_tok, len(bin(n_tok)) - 1 AS bucket, ord
            FROM m WHERE n_tok > 0),
      r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                        ORDER BY ord, doc_id) - 1 AS rk FROM b)
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(rk // 32 AS BIGINT) AS batch,
             count(*) AS n_docs, CAST(max(n_tok) AS BIGINT) AS max_tok,
             CAST(sum(n_tok) AS BIGINT) AS sum_tok,
             CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS pad_tok
      FROM r GROUP BY 1, 2 ORDER BY 1, 2""")),

    // domain-mixture resampling: per-language quotas under the md5 order
    "q_sample_mixture" -> (q((s, dir) =>
      graft.ops.Sampling.mixtureTake(
        docs(s, dir).select(col("doc_id"), col("lang")), "lang", "doc_id",
        Map("en" -> 100L, "zh" -> 40L, "fr" -> 30L, "de" -> 20L, "es" -> 10L))
    ), Some("""
      WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rn
        FROM documents WHERE lang IN ('en','zh','fr','de','es'))
      SELECT doc_id, lang FROM r
      WHERE rn < CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 40 WHEN 'fr' THEN 30
                           WHEN 'de' THEN 20 WHEN 'es' THEN 10 END
      ORDER BY doc_id""")),

    "q_sample_hash" -> (q((s, dir) =>
      docs(s, dir).where(graft.ops.Sampling.sampleByHash(col("text"), 0.25))
        .select(col("doc_id"), graft.ops.Sampling.hashBucket(col("text")).as("bucket"))
    ), Some("""
      SELECT doc_id, substr(md5(text), 1, 2) AS bucket
      FROM documents WHERE substr(md5(text), 1, 2) < '40'
      ORDER BY doc_id""")),

    // deterministic weighted source interleave (stride scheduling): the
    // MIXING SCHEDULE of corpus assembly — 3:2:1 over three sources as
    // one totally-ordered stream where every prefix holds the target
    // mix. All-integer virtual times (rank+1)·(lcm/part), so the oracle
    // replays the schedule exactly; the order column IS the hashed
    // payload. A 6-long schedule period holds src0,src0,src0,src1,src1,
    // src2 (by vt with ties broken by source) — asserted per-prefix in
    // OpsSpec; the oracle checks the whole schedule at sf.
    "q_sample_interleave" -> (q((s, dir) =>
      graft.ops.Sampling.interleaveByStride(
          docs(s, dir).select(col("doc_id"), col("source")), "source", "doc_id",
          Map("src0" -> 3L, "src1" -> 2L, "src2" -> 1L))
        .orderBy("mix_vt", "source", "doc_id")
    ), Some("""
      WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents WHERE source IN ('src0','src1','src2'))
      SELECT doc_id, source,
             CAST(rn * (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 3 ELSE 6 END) AS BIGINT) AS mix_vt
      FROM r ORDER BY mix_vt, source, doc_id""")),

    // multilingual temperature resampling (τ=2): per-language keep
    // probability sqrt(n_min/n_lang), realized deterministically through
    // the md5 bucket — every arithmetic step is IEEE correctly-rounded,
    // so the oracle reproduces the cuts bit-for-bit (see
    // Sampling.temperatureResample for why τ=2 and not general pow)
    "q_sample_temperature" -> (q((s, dir) =>
      graft.ops.Sampling.temperatureResample(docs(s, dir), "lang", col("text"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    ), Some("""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      cut AS (
        SELECT lang, CAST(ceil(sqrt(
          CAST((SELECT min(n) FROM c) AS DOUBLE) / CAST(n AS DOUBLE)) * 256.0) AS INT) AS cut
        FROM c)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN cut USING (lang)
      WHERE cut.cut >= 256 OR substr(md5(d.text), 1, 2) < printf('%02x', cut.cut)
      ORDER BY d.doc_id""")),

    // DSIR importance scoring (Xie et al. 2023): hashed unigram+bigram
    // bucket models (md5-prefix buckets — engine-portable), target =
    // the English slice, raw = the whole corpus. The oracle hashes the
    // PURE-INTEGER model inputs (n_grams, sum_tgt, sum_raw — they pin
    // feature hashing and both fitted models); the log-space score is a
    // double column tolerance-tested in OpsSpec, never exact-hashed
    // (libm ln ULP rule). Sums CAST to BIGINT: DuckDB sum() returns
    // HUGEINT, which lands in pandas as float and breaks the dtype-
    // sensitive hash.
    "q_sample_dsir" -> (q((s, dir) =>
      graft.ops.Sampling.dsirScores(
          docs(s, dir), "doc_id", "text", col("lang") === "en")
        .select(col("doc_id"), col("n_grams"), col("sum_tgt"), col("sum_raw"))
        .orderBy("doc_id")
    ), Some("""
      WITH toks AS (
        SELECT doc_id, (lang = 'en') AS tgt,
               regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      grams AS (
        SELECT doc_id, tgt, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, tgt, array_to_string(t[i:i+1], ' ') AS g
        FROM (SELECT doc_id, tgt, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)),
      hashed AS (SELECT doc_id, tgt, substr(md5(g), 1, 3) AS b FROM grams),
      model AS (
        SELECT b, count(*) FILTER (WHERE tgt) AS tgt_n, count(*) AS raw_n
        FROM hashed GROUP BY b),
      per AS (
        SELECT doc_id, count(*) AS n_grams,
               sum(m.tgt_n) AS sum_tgt, sum(m.raw_n) AS sum_raw
        FROM hashed h JOIN model m USING (b) GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(p.sum_tgt, 0) AS BIGINT) AS sum_tgt,
             CAST(coalesce(p.sum_raw, 0) AS BIGINT) AS sum_raw
      FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id""")),

    // per-source token-budget take: keep each source's docs in doc_id
    // order while the running token total stays within budget — the
    // "fill a per-domain quota" step of corpus assembly. running_tokens
    // is CAST to BIGINT for the same HUGEINT→float64 driver-comparator
    // reason as q_pack_sequences.
    // the same per-source budget fill, but in MODEL tokens: budgetTake
    // composed with the vocab-driven BPE count under the disjoint-pair
    // vocab — a training run budgets model tokens, not whitespace words.
    // Budget scaled ~6x (chars-per-word) so the cut lands mid-source.
    "q_budget_bpe" -> (q((s, dir) => {
      val vocab = graft.ops.Tokenizer.parseMerges(
        Seq("#version: 0.2", "t h", "e r", "o n"))
      graft.ops.Sampling.budgetTake(
          docs(s, dir).withColumn("__sp", translate(col("text"), "'", " ")),
          "source", "doc_id",
          graft.ops.Tokenizer.bpeTokenCount(col("__sp"), vocab), budget = 3000L)
        .select(col("doc_id"), col("source"), col("running_tokens"))
        .orderBy("doc_id")
    }), Some("""
      WITH t AS (
        SELECT doc_id, source,
          length(replace(u, ' ', ''))
            - (length(u) - length(replace(u, 'th', ''))) // 2
            - (length(u) - length(replace(u, 'er', ''))) // 2
            - (length(u) - length(replace(u, 'on', ''))) // 2 AS tok
        FROM (SELECT doc_id, source, replace(text, chr(39), ' ') AS u
              FROM documents)),
      r AS (
        SELECT doc_id, source,
          CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_tokens
        FROM t)
      SELECT doc_id, source, running_tokens FROM r
      WHERE running_tokens <= 3000 ORDER BY doc_id""")),

    "q_budget_take" -> (q((s, dir) =>
      graft.ops.Sampling.budgetTake(docs(s, dir), "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 500L)
        .select(col("doc_id"), col("source"), col("running_tokens"))
        .orderBy("doc_id")
    ), Some("""
      WITH t AS (
        SELECT doc_id, source,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
        FROM documents),
      r AS (
        SELECT doc_id, source,
          CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_tokens
        FROM t)
      SELECT doc_id, source, running_tokens FROM r
      WHERE running_tokens <= 500 ORDER BY doc_id""")),
  )
}

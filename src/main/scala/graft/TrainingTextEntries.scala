package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 44 entries: text quality/curation (q_text_*) and tokenization (q_tokenize_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingTextEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // =====================================================================
    // text analysis
    // =====================================================================
    // corpus word census with BOUNDED sketch state: per-partition
    // Misra-Gries summaries (k counters) + exact broadcast recount of
    // the ≤ k·partitions candidates — the frequent-items pass a
    // boilerplate/stopword miner runs, EXACT by the enforced
    // minFreq > N/k pigeonhole bound (Sketches.heavyHitters), with the
    // long tail of rare keys never entering a shuffle; heavyHittersAuto
    // sizes k from the corpus so the bound holds at every SF. minFreq=900
    // discriminates at sf0.01 (17 of 31 vocabulary words qualify), so
    // the exact recount filter is doing real work, not rubber-stamping.
    "q_text_heavy_hitters" -> (q((s, dir) => {
      val words = docs(s, dir)
        .select(explode(split(col("text"), "\\s+")).as("word"))
        .where(col("word") =!= "")
      graft.ops.Sketches.heavyHittersAuto(words, "word", minFreq = 900L)
        .orderBy("word")
    }), Some("""
      WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
                 FROM documents)
      SELECT word, count(*) AS freq FROM w
      WHERE word <> '' GROUP BY word HAVING count(*) >= 900
      ORDER BY word""")),

    // per-source vocabulary cardinality via GROUPED HLL registers: the
    // per-tenant distinct primitive — 256 registers per source instead
    // of each source's key set; estimate beside the exact distinct so
    // the artifact shows the error live (tiny vocab → the linear-
    // counting branch is the one exercised).
    "q_text_vocab_hll" -> (q((s, dir) => {
      val words = docs(s, dir)
        .select(col("source"), explode(split(col("text"), "\\s+")).as("word"))
        .where(col("word") =!= "")
      val regs = graft.ops.Sketches.hllRegistersBy(words, Seq("source"), "word", p = 8)
      val est = graft.ops.Sketches.hllEstimateGrouped(regs, Seq("source"), p = 8)
      val exact = words.groupBy("source").agg(countDistinct("word").as("exact"))
      est.join(exact, Seq("source")).orderBy("source")
    }), Some(s"""
      WITH ww AS (
        SELECT source, word FROM (
          SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
          FROM documents)
        WHERE word <> ''),
      h AS (SELECT source, md5(word) AS x FROM ww),
      b AS (SELECT source,
                   CAST(('0x' || substring(x, 1, 3))::BIGINT // 16 AS INT) AS bucket,
                   ('0x' || substring(x, 4, 13))::BIGINT AS wv FROM h),
      r AS (SELECT source, bucket,
                   max(CASE WHEN wv = 0 THEN 53 ELSE 53 - length(bin(wv)) END) AS reg
            FROM b GROUP BY 1, 2),
      a AS (SELECT source, CAST(256 - count(*) AS BIGINT) AS v_zero,
                   CAST(sum(CAST(power(2, 53 - reg) AS BIGINT))
                        + (256 - count(*)) * CAST(power(2, 53) AS BIGINT) AS BIGINT) AS s_scaled
            FROM r GROUP BY 1),
      e AS (SELECT source, v_zero, s_scaled,
                   ${graft.ops.Sketches.hllAlphaConstant(8)} / CAST(s_scaled AS DOUBLE) AS raw
            FROM a),
      x AS (SELECT source, CAST(count(DISTINCT word) AS BIGINT) AS exact
            FROM ww GROUP BY 1)
      SELECT e.source, CAST(256 AS BIGINT) AS m, v_zero, s_scaled,
             round(CASE WHEN raw <= 640.0 AND v_zero > 0
                        THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
                        ELSE raw END, 6) AS estimate,
             x.exact
      FROM e JOIN x USING (source) ORDER BY source""")),

    // cross-source verbatim-overlap matrix: which sources share
    // literal 8-gram passages (inter-source syndication/contamination
    // audit, the class-level sibling of decontamination). Grams
    // distinct per class first; ONE gram-keyed self-join bounded by
    // classes-per-gram; containment = shared / smaller inventory.
    "q_text_cross_source" -> (q((s, dir) =>
      TextAnalysis.crossClassOverlap(docs(s, dir), "source", "text", n = 8)
        .orderBy("class_a", "class_b")
    ), Some("""
      WITH toks AS (SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
                    FROM documents WHERE length(trim(text)) > 0),
      g AS (SELECT DISTINCT source, array_to_string(t[i:i+7], ' ') AS g8
            FROM (SELECT source, t, unnest(generate_series(1, len(t) - 7)) AS i
                  FROM toks WHERE len(t) >= 8)),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS tot FROM g GROUP BY 1),
      sh AS (SELECT a.source AS class_a, b.source AS class_b,
                    CAST(count(*) AS BIGINT) AS shared_grams
             FROM g a JOIN g b ON a.g8 = b.g8 AND a.source < b.source GROUP BY 1, 2)
      SELECT class_a, class_b, shared_grams, ta.tot AS grams_a, tb.tot AS grams_b,
             round(CAST(shared_grams AS DOUBLE) /
                   CAST(least(ta.tot, tb.tot) AS DOUBLE), 6) AS containment
      FROM sh JOIN tot ta ON sh.class_a = ta.source
              JOIN tot tb ON sh.class_b = tb.source
      ORDER BY class_a, class_b""")),

    // byte-level compression-ratio quality signal (the Gopher /
    // RefinedWeb repetitiveness proxy): deflate length ÷ UTF-8 length
    // per doc, one scan + per-partition Deflater. No SQL engine
    // exposes deflate, and exact deflate output is a zlib-
    // implementation artifact (not engine-portable) — so the oracle is
    // a LAW PROXY (VERDICT r8 #5): per-doc UTF-8 byte length checked
    // bit-exactly (DuckDB strlen), plus deflate-law columns the oracle
    // pins to TRUE — n_deflate within (0, n + 11 + 5·⌈n/16383⌉], the
    // stored-block worst case of RFC 1951, and ratio null iff the doc
    // is empty. A broken codec (wrong lengths, null leak, inflation
    // past the format bound) flips a law column and fails the hash
    // gate. Bit-exact determinism / monotonicity laws live in OpsSpec.
    "q_text_compress" -> (q((s, dir) =>
      TextAnalysis.compressionRatio(docs(s, dir), "doc_id", "text")
        .select(col("id"), col("n_bytes"),
          (col("n_deflate") >= 1 && col("n_deflate") <= col("n_bytes") + lit(11L)
            + lit(5L) * ceil(col("n_bytes") / lit(16383.0)).cast("long"))
            .as("deflate_bounded"),
          (col("ratio").isNull === (col("n_bytes") === 0)).as("ratio_null_iff_empty"))
        .orderBy("id")
    ), Some("""
      SELECT CAST(doc_id AS BIGINT) AS id,
             CAST(coalesce(strlen(text), 0) AS BIGINT) AS n_bytes,
             TRUE AS deflate_bounded,
             TRUE AS ratio_null_iff_empty
      FROM documents ORDER BY id""")),

    // the census→cleaning composition (C4's corpus-repeat removal at
    // word granularity): heavy-hitter words mined exactly, then dropped
    // by a zero-shuffle scan-stage filter; the oracle replays the same
    // threshold and set membership relationally.
    "q_text_strip_frequent" -> (q((s, dir) =>
      TextAnalysis.stripCorpusFrequentWords(docs(s, dir), "doc_id", "text",
          k = 0, minFreq = 900L)
        .orderBy("doc_id")
    ), Some("""
      WITH w AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents),
      hot AS (
        SELECT word FROM w WHERE word <> ''
        GROUP BY word HAVING count(*) >= 900),
      toks AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      tp AS (
        SELECT doc_id, i AS pos, t[i] AS tok
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)),
      kept AS (
        SELECT doc_id, pos, tok FROM tp
        WHERE tok NOT IN (SELECT word FROM hot)),
      agg AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id)
      SELECT toks.doc_id, coalesce(agg.clean_text, '') AS clean_text,
             coalesce(agg.n_kept, 0) AS n_kept,
             CAST(len(toks.t) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      FROM toks LEFT JOIN agg USING (doc_id) ORDER BY toks.doc_id""")),

    // LINE-level boilerplate removal (CCNet §3.1 / RefinedWeb §3.4): a
    // line repeated across >= 5 distinct documents is boilerplate and is
    // cut from every document. The corpus has single-line texts, so the
    // entry lays each doc out as three lines (varying 40-char head, a
    // planted promo line shared by doc_id%7, the tail) IN BOTH ENGINES —
    // scaffolding only; the operator is general. The planted lines are
    // removed everywhere; heads/tails survive unless genuinely repeated.
    "q_text_dedup_lines" -> (q((s, dir) => {
      val threeLine = docs(s, dir).select(col("doc_id"),
        concat_ws("\n",
          substring(col("text"), 1, 40),
          concat(lit("promo line "), (col("doc_id") % 7).cast("string")),
          substring(col("text"), 41, 1000000)).as("text"))
      TextAnalysis.dedupLines(threeLine, "doc_id", "text", minDocs = 5L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }), Some("""
      WITH d AS (
        SELECT doc_id,
          substr(text, 1, 40) || chr(10) || 'promo line ' || (doc_id % 7)
            || chr(10) || substr(text, 41) AS text3
        FROM documents),
      ln0 AS (SELECT doc_id, string_split(text3, chr(10)) AS L FROM d),
      ln AS (
        SELECT doc_id, i - 1 AS pos, L[i] AS line,
               regexp_replace(lower(trim(L[i])), '\s+', ' ', 'g') AS norm
        FROM (SELECT doc_id, L, unnest(generate_series(1, len(L))) AS i FROM ln0)),
      hot AS (SELECT norm FROM ln WHERE norm <> ''
              GROUP BY norm HAVING count(DISTINCT doc_id) >= 5),
      kept AS (SELECT doc_id, pos, line FROM ln
               WHERE norm = '' OR norm NOT IN (SELECT norm FROM hot)),
      agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id)
      SELECT tot.doc_id, coalesce(agg.clean_text, '') AS clean_text,
             CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
             CAST(tot.n_lines - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      FROM tot LEFT JOIN agg USING (doc_id) ORDER BY tot.doc_id""")),

    // Unicode NFC normalization: decomposed accents (e + combining
    // acute, planted per doc) compose to single code points — the
    // canonicalization every hash-keyed dedup step depends on; the
    // oracle replays with DuckDB's nfc_normalize and the length drop
    // proves composition actually happened (Spark length counts UTF-16
    // units, DuckDB counts code points — equal here because the corpus
    // incl. the planted combining mark is BMP-only)
    "q_text_nfc" -> (q((s, dir) => {
      val t = concat(col("text"), lit(" café naïve"))
      docs(s, dir).select(col("doc_id"),
          length(t).as("len_before"),
          length(TextAnalysis.nfcNormalize(t)).as("len_after"),
          TextAnalysis.nfcNormalize(t).as("norm"))
        .orderBy("doc_id")
    }), Some("""
      WITH d AS (
        SELECT doc_id,
               text || ' caf' || chr(101) || chr(769)
                    || ' nai' || chr(776) || 've' AS t
        FROM documents)
      SELECT doc_id, CAST(length(t) AS INT) AS len_before,
             CAST(length(nfc_normalize(t)) AS INT) AS len_after,
             nfc_normalize(t) AS norm
      FROM d ORDER BY doc_id""")),

    // per-source lexical diversity: type-token ratio — the vocabulary
    // coverage signal a mixture designer weighs sources by
    "q_text_type_token" -> (q((s, dir) =>
      TextAnalysis.typeTokenRatio(docs(s, dir), "source", "text")
        .orderBy("grp")
    ), Some("""
      WITH t AS (
        SELECT source AS grp,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0)
      SELECT grp, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
             round(count(DISTINCT w)::DOUBLE / count(*), 6) AS ttr
      FROM t GROUP BY grp ORDER BY grp""")),

    // per-language tokenizer fertility (regex-BPE tokens per whitespace
    // word): the budgeting metric for multilingual mixtures — CJK text
    // segments per character under the byte-ish pattern, so zh sits at
    // chars/word while Latin scripts sit near 1
    "q_tokenize_fertility" -> (q((s, dir) =>
      TextAnalysis.tokenizerFertility(docs(s, dir), "lang", "text")
        .orderBy("grp")
    ), Some(s"""
      SELECT lang AS grp,
             CAST(sum(len(regexp_extract_all(text, '$BpeSql'))) AS BIGINT) AS bpe_tokens,
             CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS words,
             round(sum(len(regexp_extract_all(text, '$BpeSql')))::DOUBLE
                   / sum(CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 6) AS fertility
      FROM documents GROUP BY lang ORDER BY grp""")),

    "q_text_stats" -> (q((s, dir) => {
      val t = col("text")
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tok"),
        TextAnalysis.bpeTokenCount(t).as("n_bpe"),
        TextAnalysis.wordCharCount(t).as("n_wordchars"),
        TextAnalysis.avgWordLen(t).as("avg_word_len"))
    }), Some(s"""
      SELECT doc_id,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
        len(regexp_extract_all(text, '$BpeSql')) AS n_bpe,
        length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_wordchars,
        CASE WHEN n_tok > 0 THEN CAST(n_wordchars AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS avg_word_len
      FROM documents ORDER BY doc_id""")),

    // exact BPE tokenization (Tokenizer.bpeTokenCount, the vocab-driven
    // merge loop — not the regex proxy) under a merge table crafted so the
    // count is SQL-expressible: the three pairs (t,h) (e,r) (o,n) have
    // pairwise-DISJOINT character sets, so merges can't interact, every
    // occurrence inside an alphabetic run fires exactly once, and
    //   n_tokens = chars-in-pretokens − Σ occurrences(pair).
    // Apostrophes are spaced out on BOTH sides so the contraction branch
    // ('t / 's …) never splits a pair across a pre-token boundary (that
    // branch stays covered by OpsSpec). Corpus is verified printable
    // ASCII (no tab/VT), so Java-\s vs RE2-\s cannot drift and
    // "whitespace" is literally ' '. The udf broadcasts the vocab in its
    // closure and runs inside the scan stage — no shuffle, no collect.
    "q_tokenize_bpe" -> (q((s, dir) => {
      val vocab = graft.ops.Tokenizer.parseMerges(
        Seq("#version: 0.2", "t h", "e r", "o n"))
      docs(s, dir).select(
        col("doc_id"),
        graft.ops.Tokenizer.bpeTokenCount(
          translate(col("text"), "'", " "), vocab).as("n_tokens"))
        .orderBy("doc_id")
    }), Some("""
      WITH s AS (
        SELECT doc_id, replace(text, chr(39), ' ') AS t FROM documents)
      SELECT doc_id,
             CAST(length(replace(t, ' ', ''))
                - (length(t) - length(replace(t, 'th', ''))) // 2
                - (length(t) - length(replace(t, 'er', ''))) // 2
                - (length(t) - length(replace(t, 'on', ''))) // 2
               AS BIGINT) AS n_tokens
      FROM s ORDER BY doc_id""")),

    // exact WordPiece tokenization (greedy longest-match-first) under a
    // vocab crafted so the count is SQL-expressible: every printable
    // ASCII char as both a word-initial piece and a "##" continuation
    // (so no word is ever [UNK] and each unmatched char costs 1 token),
    // plus ONE multi-char piece "the" — greedy longest-prefix then means
    //   n_tokens(word) = len(word) − 2·[word starts with "the"]
    // ("the" can only match at word start: "##the" is not in the vocab).
    // Same apostrophe spacing + printable-ASCII guarantees as
    // q_tokenize_bpe; the oracle explodes the same pre-token regex
    // already precedented by q_text_stats.
    "q_tokenize_wordpiece" -> (q((s, dir) => {
      val singles = (33 to 126).map(_.toChar.toString)
      val vocab = graft.ops.Tokenizer.WordPieceVocab(
        (singles ++ singles.map("##" + _) :+ "the").toSet)
      docs(s, dir).select(
        col("doc_id"),
        graft.ops.Tokenizer.wordPieceTokenCount(
          translate(col("text"), "'", " "), vocab).as("n_tokens"))
        .orderBy("doc_id")
    }), Some(s"""
      WITH src AS (
        SELECT doc_id, replace(text, chr(39), ' ') AS t FROM documents),
      tok AS (
        SELECT doc_id, unnest(regexp_extract_all(t, '$BpeSql')) AS w
        FROM src),
      agg AS (
        SELECT doc_id,
               sum(length(w) - CASE WHEN w LIKE 'the%' THEN 2 ELSE 0 END)
                 AS n
        FROM tok GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens
      FROM documents d LEFT JOIN agg USING (doc_id)
      ORDER BY d.doc_id""")),

    // exact Unigram-LM (SentencePiece) tokenization: Viterbi decode over
    // piece log-probs (Tokenizer.UnigramVocab — Kudo 2018), completing
    // the BPE/WordPiece/Unigram tokenizer trio. Vocab crafted so the
    // count is SQL-expressible AND discriminates Viterbi from greedy:
    // every printable ASCII char at logp −10, plus ONE multi-char piece
    // "the" at logp −25 — using "the" beats its three singles (−25 >
    // −30) so the optimum maximizes DISJOINT "the" occurrences anywhere
    // in the word (fixed-length patterns: left-to-right greedy is the
    // interval-scheduling optimum, which is exactly what SQL replace()
    // counts), hence
    //   n_tokens(word) = len(word) − 2·((len − len(replace(w,'the','')))/3).
    // A greedy longest-PREFIX implementation (WordPiece semantics) fails
    // this oracle on any mid-word "the" ("athe" → 2 here, 4 under
    // greedy). Same apostrophe spacing + printable-ASCII guarantees as
    // q_tokenize_bpe; the udf broadcasts the vocab in its closure and
    // runs inside the scan stage — no shuffle, no collect.
    "q_tokenize_unigram" -> (q((s, dir) => {
      val singles = (33 to 126).map(c => c.toChar.toString -> -10.0)
      val vocab = graft.ops.Tokenizer.UnigramVocab(
        (singles :+ ("the" -> -25.0)).toMap)
      docs(s, dir).select(
        col("doc_id"),
        graft.ops.Tokenizer.unigramTokenCount(
          translate(col("text"), "'", " "), vocab).as("n_tokens"))
        .orderBy("doc_id")
    }), Some(s"""
      WITH src AS (
        SELECT doc_id, replace(text, chr(39), ' ') AS t FROM documents),
      tok AS (
        SELECT doc_id, unnest(regexp_extract_all(t, '$BpeSql')) AS w
        FROM src),
      agg AS (
        SELECT doc_id,
               sum(length(w)
                   - 2 * ((length(w) - length(replace(w, 'the', ''))) // 3))
                 AS n
        FROM tok GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens
      FROM documents d LEFT JOIN agg USING (doc_id)
      ORDER BY d.doc_id""")),

    // BPE TRAINING's counting kernel at corpus scale: the iteration-1
    // adjacent-pair frequency table (empty vocab → tokens are single
    // chars), top 20 by (count desc, pair) — pure integer aggregates.
    // The multi-iteration merge loop is data-dependent (each argmax
    // feeds the next re-tokenization), so fixed oracle SQL cannot replay
    // it; the loop is pinned instead by OpsSpec against Sennrich et
    // al.'s classic low/lower/newest/widest example. Same apostrophe
    // spacing as the other tokenizer entries.
    "q_tokenize_train" -> (q((s, dir) => {
      val words = graft.ops.Tokenizer.distinctWords(
        docs(s, dir).select(translate(col("text"), "'", " ").as("text")),
        "text")
      graft.ops.Tokenizer.pairCounts(words, graft.ops.Tokenizer.BpeVocab(Map.empty))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(20)
    }), Some("""
      WITH src AS (
        SELECT replace(text, chr(39), ' ') AS t FROM documents),
      w AS (
        SELECT unnest(regexp_extract_all(t, '""" + BpeSql + """')) AS w
        FROM src),
      wf AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
      pos AS (
        SELECT w, freq,
               unnest(generate_series(1, length(w) - 1)) AS i
        FROM wf WHERE length(w) >= 2)
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM pos GROUP BY 1, 2
      ORDER BY cnt DESC, a, b LIMIT 20""")),

    // unigram-LM TRAINING's counting kernel (the Viterbi E-step of
    // Tokenizer.unigramTrain): piece-usage counts over the corpus under
    // the crafted singles+{the} vocab — SQL-expressible because "the"
    // cannot overlap itself (h≠t, e≠t), so the chosen span set is
    // unique and the residual char stream is exactly replace(w,'the','');
    // top 20 by (count desc, piece). The multi-round EM loop is
    // data-dependent (each M-step feeds the next Viterbi), so fixed SQL
    // cannot replay it — the loop is pinned by OpsSpec instead, same
    // division of labor as q_tokenize_train.
    "q_tokenize_unigram_train" -> (q((s, dir) => {
      val singles = (33 to 126).map(c => c.toChar.toString -> -10.0)
      val vocab = graft.ops.Tokenizer.UnigramVocab(
        (singles :+ ("the" -> -25.0)).toMap)
      val words = graft.ops.Tokenizer.distinctWords(
        docs(s, dir).select(translate(col("text"), "'", " ").as("text")), "text")
      graft.ops.Tokenizer.unigramPieceCounts(words, vocab)
        .orderBy(col("cnt").desc, col("p")).limit(20)
    }), Some(s"""
      WITH src AS (SELECT replace(text, chr(39), ' ') AS t FROM documents),
      w AS (SELECT unnest(regexp_extract_all(t, '$BpeSql')) AS w FROM src),
      wf AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
      res AS (SELECT w, freq, replace(w, 'the', '') AS r,
                     (length(w) - length(replace(w, 'the', ''))) // 3 AS nthe
              FROM wf),
      ch AS (SELECT substr(r, i, 1) AS p, freq
             FROM (SELECT r, freq, unnest(generate_series(1, length(r))) AS i
                   FROM res WHERE length(r) > 0)),
      allp AS (
        SELECT p, sum(freq) AS cnt FROM ch GROUP BY p
        UNION ALL
        SELECT 'the' AS p, sum(freq * nthe) AS cnt FROM res
        HAVING sum(freq * nthe) > 0)
      SELECT p, CAST(cnt AS BIGINT) AS cnt FROM allp
      ORDER BY cnt DESC, p LIMIT 20""")),

    // per-language quality gate: keep the top half by quality score
    // within each language — two-phase (exact percentile agg + broadcast
    // threshold join), no per-lang window; see qualityFilterByLang's doc
    "q_text_quality_filter" -> (q((s, dir) =>
      TextAnalysis.qualityFilterByLang(docs(s, dir), "doc_id", "text",
          "lang", keepFrac = 0.5)
        .select(col("doc_id"), col("lang"), col("quality"), col("q_threshold"))
        .orderBy("doc_id")
    ), Some(s"""
      WITH m AS (
        SELECT doc_id, lang,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
          len(regexp_extract_all(lower(text), '${lexSql("en")}')) AS n_stop,
          length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_wordchars,
          length(text) AS n_chars
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
          round(
            least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.3
            + (CASE WHEN n_tok > 0 AND CAST(n_wordchars AS DOUBLE) / CAST(n_tok AS DOUBLE) BETWEEN 3.0 AND 10.0
                    THEN 1.0 ELSE 0.0 END) * 0.2
            + least((CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END) * 5.0, 1.0) * 0.3
            + (1.0 - least((CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)) * 4.0, 1.0)) * 0.2,
            6) AS quality
        FROM m),
      t AS (
        SELECT lang, quantile_cont(quality, 0.5) AS q_threshold
        FROM sc GROUP BY 1)
      SELECT sc.doc_id, sc.lang, sc.quality, t.q_threshold
      FROM sc JOIN t USING (lang)
      WHERE sc.quality >= t.q_threshold ORDER BY sc.doc_id""")),

    "q_text_quality" -> (q((s, dir) => {
      val t = col("text")
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.punctRatio(t).as("punct_ratio"),
        TextAnalysis.stopwordRatio(t, "en").as("stop_ratio"),
        TextAnalysis.qualityScore(t).as("quality"))
    }), Some(s"""
      WITH m AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
          len(regexp_extract_all(lower(text), '${lexSql("en")}')) AS n_stop,
          length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_wordchars,
          length(text) AS n_chars
        FROM documents)
      SELECT doc_id,
        CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
        CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS stop_ratio,
        round(
          least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.3
          + (CASE WHEN n_tok > 0 AND CAST(n_wordchars AS DOUBLE) / CAST(n_tok AS DOUBLE) BETWEEN 3.0 AND 10.0
                  THEN 1.0 ELSE 0.0 END) * 0.2
          + least((CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END) * 5.0, 1.0) * 0.3
          + (1.0 - least((CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)) * 4.0, 1.0)) * 0.2,
          6) AS quality
      FROM m ORDER BY doc_id""")),

    "q_text_langid" -> (q((s, dir) => {
      val t = col("text")
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.langScore(t, "en").as("s_en"),
        TextAnalysis.langScore(t, "fr").as("s_fr"),
        TextAnalysis.langScore(t, "es").as("s_es"),
        TextAnalysis.langScore(t, "de").as("s_de"),
        TextAnalysis.cjkCount(t).as("s_zh"),
        TextAnalysis.langId(t).as("lang_pred"))
    }), Some(s"""
      WITH m AS (
        SELECT doc_id,
          len(regexp_extract_all(lower(text), '${lexSql("en")}')) AS s_en,
          len(regexp_extract_all(lower(text), '${lexSql("fr")}')) AS s_fr,
          len(regexp_extract_all(lower(text), '${lexSql("es")}')) AS s_es,
          len(regexp_extract_all(lower(text), '${lexSql("de")}')) AS s_de,
          len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh
        FROM documents)
      SELECT doc_id, s_en, s_fr, s_es, s_de, s_zh,
        CASE WHEN s_en + s_fr + s_es + s_de + s_zh = 0 THEN 'und'
             WHEN s_zh > 0 THEN 'zh'
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
             WHEN s_es >= s_de THEN 'es'
             ELSE 'de' END AS lang_pred
      FROM m ORDER BY doc_id""")),

    // language-ID confidence margin: top evidence score minus the
    // runner-up (second max = max over pairs of min — integer algebra
    // both engines replay identically); low-margin docs are the ones
    // a production router sends to a heavier classifier
    "q_text_langid_margin" -> (q((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.langIdMargin(col("text")).as("margin"),
        (TextAnalysis.langIdMargin(col("text")) >= 3L).as("confident"))
    ), Some(s"""
      WITH m AS (
        SELECT doc_id,
          len(regexp_extract_all(lower(text), '${lexSql("en")}')) AS a,
          len(regexp_extract_all(lower(text), '${lexSql("fr")}')) AS b,
          len(regexp_extract_all(lower(text), '${lexSql("es")}')) AS c,
          len(regexp_extract_all(lower(text), '${lexSql("de")}')) AS d,
          len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS e
        FROM documents)
      SELECT doc_id,
        CAST(CASE WHEN e > 0 THEN e - greatest(a, b, c, d)
             ELSE greatest(a, b, c, d)
                - greatest(least(a,b), least(a,c), least(a,d),
                           least(b,c), least(b,d), least(c,d)) END AS BIGINT) AS margin,
        (CASE WHEN e > 0 THEN e - greatest(a, b, c, d)
         ELSE greatest(a, b, c, d)
            - greatest(least(a,b), least(a,c), least(a,d),
                       least(b,c), least(b,d), least(c,d)) END) >= 3 AS confident
      FROM m ORDER BY doc_id""")),

    "q_text_repetition" -> (q((s, dir) => {
      val d = docs(s, dir)
      val rep = d.select(col("doc_id"),
        round(TextAnalysis.repeatedTokenFraction(col("text")), 6).as("rep_tok_frac"))
      val top = TextAnalysis.topBigramFraction(d, "doc_id", "text")
        .select(col("id").as("doc_id"), round(col("top_bigram_frac"), 6).as("top_bigram_frac"))
      rep.join(top, Seq("doc_id"), "left")
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      bg AS (
        SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS b
        FROM toks WHERE len(t) >= 2),
      cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
      tb AS (SELECT doc_id,
                    round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_bigram_frac
             FROM cnt GROUP BY 1)
      SELECT toks.doc_id,
             round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) AS rep_tok_frac,
             tb.top_bigram_frac
      FROM toks LEFT JOIN tb ON tb.doc_id = toks.doc_id
      ORDER BY 1""")),

    // top-3 TF-IDF keywords per doc; the corpus count feeds the smoothed
    // idf (one bounded probe job). Ranking is on the ROUNDED score with
    // term tiebreak — reproducible across engines (libm ulp differences
    // cannot reorder the top-k), see TextAnalysis.topTfIdfTerms.
    "q_text_tfidf" -> (q((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.topTfIdfTerms(d, "doc_id", "text", k = 3, docCount = d.count())
        .withColumnRenamed("id", "doc_id")
    }), Some("""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      sc AS (
        SELECT doc_id, tf.term, tf, df,
               round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
        FROM tf JOIN dfq USING (term) CROSS JOIN n),
      r AS (
        SELECT doc_id, term, tf, df, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM sc)
      SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
      FROM r WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // PMI bigram collocations (multi-word-unit mining): top-50 by
    // rounded pmi among bigrams with count ≥ 5; unigram tables join
    // broadcast, totals ride 1-row broadcasts, the rank window runs
    // over the minCount-bounded survivor set only. Oracle replays the
    // same ln-ratio with DuckDB float division.
    "q_text_pmi" -> (q((s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), "text", minCount = 5, k = 50)
    ), Some("""
      WITH toks AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      uni AS (SELECT w, count(*) AS cw
              FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
      bi AS (SELECT t[i] AS a, t[i + 1] AS b, count(*) AS c
             FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                   FROM toks WHERE len(t) >= 2)
             GROUP BY 1, 2),
      tot AS (SELECT sum(cw) AS t FROM uni),
      btot AS (SELECT sum(c) AS bt FROM bi),
      sc AS (SELECT a, b, c,
               round(ln((c / bt) / ((ca.cw / tot.t) * (cb.cw / tot.t))), 6) AS pmi
             FROM bi JOIN uni ca ON bi.a = ca.w JOIN uni cb ON bi.b = cb.w
             CROSS JOIN tot CROSS JOIN btot WHERE c >= 5),
      r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, a, b) AS rank FROM sc)
      SELECT CAST(rank AS INT) AS rank, a, b, c, pmi
      FROM r WHERE rank <= 50 ORDER BY rank""")),

    // interpolated Kneser–Ney bigram LM trained distributed — the
    // n-gram model behind perplexity quality gates, with the
    // continuation-count insight ("francisco" is frequent but only
    // follows "san"). One corpus-sized bigram count; context totals /
    // follower / preceder type counts are vocab-sized broadcasts.
    // Top-100 by rounded probability. Oracle replays the identical
    // discount arithmetic.
    "q_text_kn_ngram" -> (q((s, dir) =>
      TextAnalysis.kneserNeyBigrams(docs(s, dir), "text",
        discount = 0.75, minCount = 5, k = 100)
    ), Some("""
      WITH toks AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      bi AS (SELECT t[i] AS a, t[i + 1] AS b, count(*) AS c
             FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                   FROM toks WHERE len(t) >= 2)
             GROUP BY 1, 2),
      ctx AS (SELECT a, sum(c) AS ca, count(*) AS fa FROM bi GROUP BY 1),
      prec AS (SELECT b, count(*) AS pb FROM bi GROUP BY 1),
      types AS (SELECT count(*) AS bt FROM bi),
      sc AS (SELECT bi.a, bi.b, bi.c,
               round(greatest(bi.c - 0.75, 0.0) / ctx.ca +
                     0.75 * ctx.fa / ctx.ca * (prec.pb / CAST(types.bt AS DOUBLE)), 6) AS p
             FROM bi JOIN ctx ON bi.a = ctx.a JOIN prec ON bi.b = prec.b
             CROSS JOIN types WHERE bi.c >= 5),
      r AS (SELECT *, row_number() OVER (ORDER BY p DESC, a, b) AS rank FROM sc)
      SELECT CAST(rank AS INT) AS rank, a, b, c, p
      FROM r WHERE rank <= 100 ORDER BY rank""")),

    // BM25 top-k retrieval for three fixed keyword queries — the
    // lexical-search baseline beside the ANN stack. Corpus never
    // shuffles toward the queries: the query-term list joins broadcast
    // (inverted-index probe), ranking is on the rounded score with id
    // tiebreak (TF-IDF reproducibility convention). Oracle replays
    // Lucene-idf Okapi BM25 with identical literals.
    "q_text_bm25" -> (q((s, dir) =>
      TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark_join" -> Seq("spark", "join"),
            "hash_scan" -> Seq("hash", "table", "scan"),
            "stream_win" -> Seq("stream", "window")),
        k = 20)
    ), Some("""
      WITH toks AS (
        SELECT doc_id AS id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0),
      tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
      stats AS (
        SELECT count(*) AS n, avg(coalesce(dl, 0)) AS avgdl
        FROM documents LEFT JOIN dl ON documents.doc_id = dl.id),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      q AS (SELECT * FROM (VALUES
        ('spark_join', 'spark'), ('spark_join', 'join'),
        ('hash_scan', 'hash'), ('hash_scan', 'table'), ('hash_scan', 'scan'),
        ('stream_win', 'stream'), ('stream_win', 'window')) AS t(qid, term)),
      sc AS (
        SELECT qid, id,
               ln(1 + (n - df + 0.5) / (df + 0.5)) *
               (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
        FROM tf JOIN q USING (term) JOIN dl USING (id)
                JOIN dfreq USING (term) CROSS JOIN stats),
      sums AS (SELECT qid, id, round(sum(s), 6) AS score FROM sc GROUP BY 1, 2),
      r AS (SELECT qid, id, score,
                   row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
            FROM sums)
      SELECT qid, CAST(rank AS INT) AS rank, id, score
      FROM r WHERE rank <= 20 ORDER BY qid, rank""")),

    // content scrubbing: emails / URLs / long digit runs → type tags,
    // planted onto every document from its doc_id so the replace chain
    // provably fires on all three pattern classes; oracle shares the
    // regex constants verbatim (TextAnalysis.Redact*)
    "q_text_redact" -> (q((s, dir) => {
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@example.com via https://ex.io/p/"), col("doc_id"),
        lit(" ref "), (col("doc_id") + 1000000L) * 37L)
      docs(s, dir).select(col("doc_id"), TextAnalysis.redact(planted).as("clean"))
    }), Some(s"""
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(
          text || ' contact user' || doc_id || '@example.com via https://ex.io/p/'
               || doc_id || ' ref ' || CAST((doc_id + 1000000) * 37 AS BIGINT),
          '${TextAnalysis.RedactUrl}', '<URL>', 'g'),
          '${TextAnalysis.RedactEmail}', '<EMAIL>', 'g'),
          '${TextAnalysis.RedactDigits}', '<NUM>', 'g') AS clean
      FROM documents ORDER BY doc_id""")),

    // HTML markup stripping (web-corpus first pass): every document is
    // wrapped in a deterministic full-page skeleton so each rule class
    // provably fires — a <style> element with CSS content, a comment, a
    // <script> whose BODY contains bare < and > (content-drop semantics:
    // a naive tag stripper leaks "var x = 1  0;" into the text), named
    // entities, and the double-escaped &amp;amp; pinning the single-pass
    // decode order (must yield the literal "&amp;", not "&"). Oracle
    // replays the identical RE2-∩-Java regex chain
    "q_text_strip_html" -> (q((s, dir) => {
      val html = concat(
        lit("<html><head><title>t</title><style type=\"text/css\">p { color: red; }</style></head>"),
        lit("<body class=\"doc\"><!-- id "), col("doc_id"),
        lit(" --><h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 < 2 && y > 0;</script>"),
        lit("<br/>&amp;amp; &lt;tail&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</body></html>"))
      docs(s, dir).select(col("doc_id"), TextAnalysis.stripHtml(html).as("clean"))
    }), Some("""
      WITH h AS (
        SELECT doc_id,
          '<html><head><title>t</title><style type="text/css">p { color: red; }</style></head>'
          || '<body class="doc"><!-- id ' || doc_id || ' --><h1>Doc ' || doc_id
          || '</h1><p>' || text
          || '</p><script type="text/javascript">var x = 1 < 2 && y > 0;</script>'
          || '<br/>&amp;amp; &lt;tail&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</body></html>'
          AS html
        FROM documents)
      SELECT doc_id, trim(regexp_replace(
        replace(
          replace(replace(replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(html, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '(?s)<[^>]*>', ' ', 'g'),
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
            '&#39;', ''''), '&nbsp;', ' '),
          '&amp;', '&'),
        '\s+', ' ', 'g')) AS clean
      FROM h ORDER BY doc_id""")),

    // sliding token-window chunking (RAG ingestion): 12-token windows,
    // 4-token overlap; chunk counts are pure arithmetic
    "q_text_chunk" -> (q((s, dir) =>
      TextAnalysis.chunkText(docs(s, dir), "doc_id", "text", chunkTokens = 12, overlap = 4)
        .withColumnRenamed("id", "doc_id")
    ), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE greatest(1, (len(regexp_split_to_array(trim(text), '\s+')) - 4 + 7) // 8) END AS nc
        FROM documents),
      ch AS (SELECT doc_id, t, len(t) AS m, unnest(generate_series(0, nc - 1)) AS k
             FROM toks WHERE nc > 0)
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        array_to_string(t[k*8+1 : k*8+12], ' ') AS chunk_text,
        CAST(least(m - k*8, 12) AS BIGINT) AS n_tok
      FROM ch ORDER BY doc_id, chunk_id""")),

    // rule-based SENTENCE segmentation (RAG semantic units): boundary =
    // [.!?] + whitespace via mark-then-split (lookbehind split is not
    // in the RE2 dialect; the mark form replays verbatim), sent_id =
    // raw split position, empties dropped
    "q_text_sentences" -> (q((s, dir) =>
      TextAnalysis.sentenceSplit(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id", "sent_id")
    ), Some("""
      WITH m AS (
        SELECT doc_id,
          string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
                       chr(1)) AS ss
        FROM documents),
      e AS (
        SELECT doc_id, i - 1 AS sent_id, trim(ss[i]) AS sentence
        FROM (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i
              FROM m))
      SELECT doc_id, CAST(sent_id AS BIGINT) AS sent_id, sentence,
             CAST(len(regexp_split_to_array(sentence, '\s+')) AS BIGINT) AS n_tok
      FROM e WHERE length(sentence) > 0
      ORDER BY doc_id, sent_id""")),

    // CONTENT-DEFINED chunking (LBFS/restic boundaries at token
    // granularity): boundary after token i when the first md5 hex char
    // of the trailing 4-token window ∈ {0, 8} (≈ 8-token chunks) — the
    // insertion-robust alternative to fixed windows (the invariance law
    // lives in OpsSpec); oracle replays the hash predicate + running
    // boundary count with a window function
    "q_text_cdc_chunks" -> (q((s, dir) =>
      TextAnalysis.cdcChunks(docs(s, dir), "doc_id", "text",
          w = 4, boundaryHexChars = Seq("0", "8"))
        .orderBy("doc_id", "chunk_id")
    ), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      p AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks),
      b AS (
        SELECT doc_id, i, t[i] AS tok,
          CASE WHEN i >= 4 AND substr(md5(array_to_string(t[i-3:i], ' ')), 1, 1)
                   IN ('0', '8')
               THEN 1 ELSE 0 END AS boundary
        FROM p),
      c AS (
        SELECT doc_id, i, tok,
          coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        FROM b)
      SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_id, count(*) AS n_tok,
             string_agg(tok, ' ' ORDER BY i) AS chunk_text
      FROM c GROUP BY doc_id, chunk ORDER BY doc_id, chunk_id""")),

    // winnowing fingerprints (MOSS): window-min k-gram hashes, rightmost
    // tie; the oracle replays window/min/rightmost with list lambdas
    "q_text_winnow" -> (q((s, dir) =>
      TextAnalysis.winnowFingerprints(docs(s, dir), "doc_id", "text", k = 4, w = 5)
        .withColumnRenamed("id", "doc_id")
    ), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      g AS (
        SELECT doc_id,
          list_transform(generate_series(1, len(t) - 3),
            i -> md5(array_to_string(t[i:i+3], ' '))) AS hs
        FROM toks WHERE len(t) >= 4),
      win AS (
        SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 4)) AS i
        FROM g WHERE len(hs) >= 5)
      SELECT DISTINCT doc_id,
        CAST(i + 4 - list_position(list_reverse(hs[i:i+4]),
                                   list_aggregate(hs[i:i+4], 'min')) AS BIGINT) AS pos,
        list_aggregate(hs[i:i+4], 'min') AS h
      FROM win ORDER BY doc_id, pos""")),

    "q_text_fingerprint" -> (q((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    ), Some("""
      SELECT doc_id,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id""")),

    // =====================================================================
    // deduplication
    // =====================================================================
    // Benchmark decontamination: the "benchmark" is the first 8 tokens of
    // every 50th document, so contamination hits the sources themselves,
    // their exact duplicates, and any incidental 8-gram collision — all
    // exactly mirrored by the oracle's n-gram join.
    "q_text_decontaminate" -> (q((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 50 === 0)
        .select(concat_ws(" ",
          slice(TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("btext"))
      TextAnalysis.decontaminate(d, "doc_id", "text", bench, "btext", 8)
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      grams AS (
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
              FROM toks WHERE len(t) >= 8)),
      bench AS (
        SELECT DISTINCT array_to_string(t[1:8], ' ') AS g
        FROM toks WHERE doc_id % 50 = 0 AND len(t) >= 8),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        FROM grams g JOIN bench b USING (g) GROUP BY g.doc_id)
      SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
             coalesce(h.n_hits, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id""")),

    // n-gram NOVELTY vs a reference corpus — decontaminate's dual as a
    // per-doc quality signal: the fraction of each scored doc's distinct
    // trigrams absent from the reference half (doc_id < 300). Shared
    // boilerplate phrases across the synthetic corpus make n_known
    // nontrivial; novelty is an exact small-int division (IEEE
    // correctly-rounded in both engines, same tier as avg_word_len)
    "q_text_novelty" -> (q((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.ngramNovelty(
          d.where(col("doc_id") >= 300), "doc_id", "text",
          d.where(col("doc_id") < 300).select(col("text")), "text", n = 3)
        .orderBy("doc_id")
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      g AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      ref AS (SELECT DISTINCT g FROM g WHERE doc_id < 300),
      sc AS (
        SELECT g.doc_id, count(*) AS n_grams,
               sum(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END) AS n_known
        FROM g LEFT JOIN ref r USING (g)
        WHERE g.doc_id >= 300
        GROUP BY g.doc_id)
      SELECT d.doc_id,
        CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams,
        CAST(coalesce(sc.n_known, 0) AS BIGINT) AS n_known,
        CASE WHEN sc.n_grams > 0
             THEN CAST(sc.n_grams - sc.n_known AS DOUBLE) / sc.n_grams
        END AS novelty
      FROM documents d LEFT JOIN sc USING (doc_id)
      WHERE d.doc_id >= 300
      ORDER BY d.doc_id""")),

    // The SAME decontamination through the Bloom-prefiltered path — the
    // exact confirm join makes false positives invisible, so this entry
    // shares q_text_decontaminate's oracle verbatim: the driver gate
    // itself proves the two variants equivalent (plus the crafted-FP
    // spec in OpsSpec).
    "q_text_decontaminate_bloom" -> (q((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 50 === 0)
        .select(concat_ws(" ",
          slice(TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("btext"))
      TextAnalysis.decontaminateBloom(d, "doc_id", "text", bench, "btext", 8)
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      grams AS (
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
              FROM toks WHERE len(t) >= 8)),
      bench AS (
        SELECT DISTINCT array_to_string(t[1:8], ' ') AS g
        FROM toks WHERE doc_id % 50 = 0 AND len(t) >= 8),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        FROM grams g JOIN bench b USING (g) GROUP BY g.doc_id)
      SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
             coalesce(h.n_hits, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id""")),

    // the SAME Bloom decontamination with the filter PERSISTED and
    // RELOADED mid-query — the fit-once/screen-many artifact shape (an
    // eval-suite filter built in one batch job, shipped to every ingest
    // job); sketch serialization round-trips exactly, so this shares
    // the exact-path oracle like the other Bloom entry
    "q_text_decontaminate_bloom_saved" -> (q((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 50 === 0)
        .select(concat_ws(" ",
          slice(TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("btext"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_bloom_${ProcessHandle.current().pid()}"
      TextAnalysis.saveBloom(s, path,
        TextAnalysis.benchBloomFilter(bench, "btext", 8))
      TextAnalysis.decontaminateBloomWith(d, "doc_id", "text", bench, "btext", 8,
          TextAnalysis.loadBloom(s, path))
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
    }), Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      grams AS (
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
              FROM toks WHERE len(t) >= 8)),
      bench AS (
        SELECT DISTINCT array_to_string(t[1:8], ' ') AS g
        FROM toks WHERE doc_id % 50 = 0 AND len(t) >= 8),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        FROM grams g JOIN bench b USING (g) GROUP BY g.doc_id)
      SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
             coalesce(h.n_hits, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id""")),

    // Aho-Corasick blocklist screen (C4's badwords filter shape): all
    // patterns matched in ONE automaton pass per doc (a regex
    // alternation over thousands of phrases recompiles per position;
    // AC is O(text+matches) at any blocklist size). Patterns are
    // border-free (no proper prefix = suffix), so occurrences cannot
    // self-overlap and the oracle's non-overlapping replace() count is
    // the total occurrence count; every 23rd doc gets both planted
    // phrases appended so the screen provably fires
    "q_text_blocklist" -> (q((s, dir) => {
      val planted = concat(lower(col("text")),
        when(col("doc_id") % 23 === 0, lit(" free money click here"))
          .otherwise(lit("")))
      graft.ops.AhoCorasick.screen(
          docs(s, dir).select(col("doc_id"), planted.as("t")), "t",
          Seq("the", "and", "free money", "click here"))
        .select(col("doc_id"), col("blocklist_hits"), col("blocked"))
        .orderBy("doc_id")
    }), Some("""
      WITH t AS (
        SELECT doc_id,
          lower(text) || CASE WHEN doc_id % 23 = 0
                              THEN ' free money click here' ELSE '' END AS t
        FROM documents)
      SELECT doc_id,
        CAST((length(t) - length(replace(t, 'the', ''))) // 3
           + (length(t) - length(replace(t, 'and', ''))) // 3
           + (length(t) - length(replace(t, 'free money', ''))) // 10
           + (length(t) - length(replace(t, 'click here', ''))) // 10
          AS BIGINT) AS blocklist_hits,
        ((length(t) - length(replace(t, 'the', ''))) // 3
           + (length(t) - length(replace(t, 'and', ''))) // 3
           + (length(t) - length(replace(t, 'free money', ''))) // 10
           + (length(t) - length(replace(t, 'click here', ''))) // 10) > 0
          AS blocked
      FROM t ORDER BY doc_id""")),

    // Gopher/C4 corpus filter rules over planted decorations: bullets,
    // ellipsis lines, lorem-ipsum, braces, and stopword boosts are mixed
    // in deterministically by doc_id so every rule fires both ways. The
    // oracle restates each published threshold in SQL.
    "q_text_filter_rules" -> (q((s, dir) => {
      val planted = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit("\n- bullet item\n- second bullet")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\nto be continued...")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(" lorem ipsum dolor sit")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit(" { config }")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" of the and that have with")).otherwise(lit("")))
      val base = docs(s, dir).select(col("doc_id"), planted.as("t"))
      val t = col("t")
      val flagged = TextAnalysis.filterFlags(t).foldLeft(
        base.select(col("doc_id"),
          TextAnalysis.tokenCount(t).as("n_tok"),
          TextAnalysis.symbolWordRatio(t).as("symbol_ratio"),
          TextAnalysis.bulletLineFraction(t).as("bullet_frac"),
          TextAnalysis.ellipsisLineFraction(t).as("ellipsis_frac"),
          TextAnalysis.alphaWordFraction(t).as("alpha_frac"),
          TextAnalysis.distinctStopCount(t).as("n_stop"), t)) {
        case (d, (name, c)) => d.withColumn(name, c)
      }
      flagged.withColumn("keep", TextAnalysis.keepDocument(t)).drop("t")
    }), Some(s"""
      WITH p AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '- bullet item' || chr(10) || '- second bullet' ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'to be continued...' ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum dolor sit' ELSE '' END
          || CASE WHEN doc_id % 17 = 0 THEN ' { config }' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN ' of the and that have with' ELSE '' END AS t
        FROM documents),
      m AS (
        SELECT doc_id, t,
          CASE WHEN length(trim(t)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(t), '\\s+')) END AS n_tok,
          length(regexp_replace(trim(t), '\\s+', '', 'g')) AS n_wordchars,
          string_split(t, chr(10)) AS ls,
          regexp_split_to_array(trim(t), '\\s+') AS toks
        FROM p),
      f AS (
        SELECT doc_id, n_tok,
          round(CAST(len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\\.\\.\\.')) AS DOUBLE)
                / greatest(n_tok, 1), 6) AS symbol_ratio,
          round(CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*]'))) AS DOUBLE)
                / greatest(len(ls), 1), 6) AS bullet_frac,
          round(CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '\\.\\.\\.$$'))) AS DOUBLE)
                / greatest(len(ls), 1), 6) AS ellipsis_frac,
          round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                / greatest(n_tok, 1), 6) AS alpha_frac,
          ${TextAnalysis.GopherStops.map(w =>
            s"(CASE WHEN regexp_matches(lower(t), '\\b$w\\b') THEN 1 ELSE 0 END)").mkString(" + ")} AS n_stop,
          CASE WHEN n_tok > 0 THEN CAST(n_wordchars AS DOUBLE) / n_tok END AS awl,
          contains(lower(t), 'lorem ipsum') AS has_lorem,
          contains(t, '{') AS has_brace
        FROM m)
      SELECT doc_id, n_tok, symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac, CAST(n_stop AS BIGINT) AS n_stop,
        (n_tok BETWEEN 50 AND 100000) AS wc_ok,
        coalesce(awl BETWEEN 3.0 AND 10.0, false) AS awl_ok,
        (symbol_ratio <= 0.1) AS symbol_ok,
        (bullet_frac <= 0.9) AS bullet_ok,
        (ellipsis_frac <= 0.3) AS ellipsis_ok,
        (alpha_frac >= 0.8) AS alpha_ok,
        (n_stop >= 2) AS stop_ok,
        NOT has_lorem AS no_lorem,
        NOT has_brace AS no_brace,
        ((n_tok BETWEEN 50 AND 100000) AND coalesce(awl BETWEEN 3.0 AND 10.0, false)
          AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
          AND alpha_frac >= 0.8 AND n_stop >= 2 AND NOT has_lorem AND NOT has_brace) AS keep
      FROM f ORDER BY doc_id""")),

    // per-doc character Shannon entropy (bits/char) — the oracle-able
    // sibling of the deflate compression-ratio signal: one (id, char)
    // count shuffle + one per-doc reduce in the log2(n) − Σ c·log2 c/n
    // algebraic form. Oracle chars via substr(generate_series).
    "q_text_entropy" -> (q((s, dir) =>
      TextAnalysis.charEntropy(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")
    ), Some("""
      WITH ch AS (
        SELECT doc_id, substr(text, i, 1) AS ch
        FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
              FROM documents WHERE text IS NOT NULL AND length(text) > 0)),
      cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
      SELECT doc_id,
             round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
      FROM cnt GROUP BY doc_id ORDER BY doc_id""")),

    // per-source KL divergence vs the corpus unigram distribution —
    // the diversity/drift audit ("how idiosyncratic is this source's
    // vocabulary"). No smoothing needed: every observed p_g(w) is
    // dominated by the corpus distribution by construction. One
    // (source, word) count shuffle; corpus word counts join on the
    // key the counts already carry (vocab can exceed broadcast).
    "q_text_kl_sources" -> (q((s, dir) =>
      TextAnalysis.klBySource(docs(s, dir), "source", "text")
        .orderBy("group")
    ), Some("""
      WITH toks AS (
        SELECT source AS grp,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      gw AS (SELECT grp, w, count(*) AS cgw FROM toks GROUP BY 1, 2),
      gt AS (SELECT grp, sum(cgw) AS tg FROM gw GROUP BY 1),
      wt AS (SELECT w, sum(cgw) AS cw FROM gw GROUP BY 1),
      t AS (SELECT sum(cgw) AS t FROM gw)
      SELECT gw.grp AS "group", CAST(max(gt.tg) AS BIGINT) AS n_tokens,
             round(sum((gw.cgw / CAST(gt.tg AS DOUBLE)) *
               ln((gw.cgw / CAST(gt.tg AS DOUBLE)) / (wt.cw / CAST(t.t AS DOUBLE)))), 6) AS kl
      FROM gw JOIN gt USING (grp) JOIN wt USING (w) CROSS JOIN t
      GROUP BY gw.grp ORDER BY gw.grp""")),

    // within-source ECDF quantile normalization of doc lengths — the
    // per-source-threshold trick (absolute cutoffs over-prune clean
    // sources, under-prune noisy ones): pct = P(X ≤ x | source),
    // exact, with the cumulative window over each source's DISTINCT
    // values and a (source, value) join back — never a per-row window.
    "q_text_quantile_norm" -> (q((s, dir) =>
      graft.ops.Profiling.ecdfNormalize(
          docs(s, dir).select("doc_id", "source", "n_chars"), "source", "n_chars")
        .select("doc_id", "source", "n_chars", "pct")
        .orderBy("doc_id")
    ), Some("""
      WITH cnt AS (
        SELECT source, n_chars, count(*) AS c
        FROM documents GROUP BY 1, 2),
      pct AS (
        SELECT source, n_chars,
               round(sum(c) OVER (PARTITION BY source ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) /
                     CAST(sum(c) OVER (PARTITION BY source) AS DOUBLE), 6) AS pct
        FROM cnt)
      SELECT d.doc_id, d.source, d.n_chars, pct.pct
      FROM documents d JOIN pct ON d.source = pct.source AND d.n_chars = pct.n_chars
      ORDER BY d.doc_id""")),

    // dominant LSI axis by matrix-free power iteration: two rounds of
    // u = A·v, v = Aᵀ·u over the (doc, term, count) frame — integer-
    // valued throughout (v₀ = 1), normalized ONCE at the end, so the
    // whole spectral computation is engine-exact. Top-25 topic terms.
    // Oracle unrolls the same two rounds as chained CTEs.
    "q_text_lsi" -> (q((s, dir) =>
      TextAnalysis.lsiPowerIteration(docs(s, dir), "text", iters = 2, k = 25)
    ), Some("""
      WITH toks AS (
        SELECT doc_id AS d,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0),
      c AS (SELECT d, term, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY 1, 2),
      u1 AS (SELECT d, sum(c * 1.0) AS u FROM c GROUP BY 1),
      v1 AS (SELECT term, sum(c.c * u1.u) AS v FROM c JOIN u1 USING (d) GROUP BY 1),
      u2 AS (SELECT d, sum(c.c * v1.v) AS u FROM c JOIN v1 USING (term) GROUP BY 1),
      v2 AS (SELECT term, sum(c.c * u2.u) AS v FROM c JOIN u2 USING (d) GROUP BY 1),
      n AS (SELECT sqrt(sum(v * v)) AS n FROM v2),
      r AS (SELECT term, round(v / n.n, 6) AS loading,
                   row_number() OVER (ORDER BY round(v / n.n, 6) DESC, term) AS rank
            FROM v2 CROSS JOIN n)
      SELECT CAST(rank AS INT) AS rank, term, loading
      FROM r WHERE rank <= 25 ORDER BY rank""")),

    // Zipf-law fit (corpus-health diagnostic): OLS slope/intercept of
    // ln(count) on ln(rank) over the top-25 terms, closed form from
    // ONE aggregate; the rank window runs over the vocab-sized count
    // table, never the corpus. Oracle replays the same normal-equation
    // arithmetic.
    "q_text_zipf" -> (q((s, dir) =>
      TextAnalysis.zipfFit(docs(s, dir), "text", topN = 25)
    ), Some("""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0),
      cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      ranked AS (
        SELECT ln(row_number() OVER (ORDER BY cnt DESC, term)) AS x, ln(cnt) AS y,
               row_number() OVER (ORDER BY cnt DESC, term) AS rank
        FROM cnt QUALIFY rank <= 25),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM ranked)
      SELECT n AS n_terms,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
             round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
      FROM agg""")),

    // robust per-source length outliers (median ± 3·MAD, the robust
    // z-score): integer token counts keep both percentile
    // interpolations exact (halves/quarters), so the verdict
    // hash-matches quantile_cont; two broadcast threshold joins, no
    // per-class window
    "q_text_outliers" -> (q((s, dir) =>
      TextAnalysis.lengthOutliers(docs(s, dir), "doc_id", "text", "source", k = 3.0)
        .orderBy("doc_id")
    ), Some("""
      WITH lens AS (
        SELECT source, doc_id,
          coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 0) AS n
        FROM documents),
      med AS (SELECT source, quantile_cont(n, 0.5) AS med FROM lens GROUP BY 1),
      dev AS (SELECT l.source, l.doc_id, l.n, m.med, abs(l.n - m.med) AS dev
              FROM lens l JOIN med m USING (source)),
      mad AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
      SELECT d.doc_id, d.source, CAST(d.n AS BIGINT) AS n_tok,
             d.med AS median_tok, a.mad AS mad_tok,
             d.dev > 3.0 * a.mad AS outlier
      FROM dev d JOIN mad a USING (source) ORDER BY d.doc_id""")),

    // corpus-fitted char-bigram LM scoring (CCNet-flavored perplexity
    // filter, self-contained). The oracle hashes ONLY the pure-integer
    // count aggregates (they pin every input the score is built from);
    // the log-space score itself rides a transcendental whose last ULP
    // differs across libm implementations, so it is tolerance-checked in
    // TextAnalysisSpec instead of exact-hashed here.
    "q_text_lm_score" -> (q((s, dir) =>
      TextAnalysis.bigramLmScores(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("sum_c"), col("sum_tot"))
    ), Some("""
      WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE text IS NOT NULL),
      bg AS (
        SELECT doc_id, substr(t, i, 2) AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
              FROM norm WHERE length(t) >= 2)),
      cnt AS (SELECT g, count(*) AS c FROM bg GROUP BY g),
      uni AS (SELECT substr(g, 1, 1) AS c1, sum(c) AS tot FROM cnt GROUP BY 1),
      sc AS (
        SELECT doc_id, count(*) AS n_bigrams, sum(c) AS sum_c, sum(tot) AS sum_tot
        FROM bg JOIN cnt USING (g) JOIN uni ON substr(g, 1, 1) = uni.c1
        GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(sc.sum_c, 0) AS BIGINT) AS sum_c,
             CAST(coalesce(sc.sum_tot, 0) AS BIGINT) AS sum_tot
      FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""")),
  )
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization counts, quality scoring, language identification, and
 * document fingerprinting.
 *
 * Everything here is pure `Column` algebra (whole-stage-codegen'd, no
 * UDFs), so at 100 TB these run inside the scan stage with zero shuffle:
 * each operator is a per-row projection the optimizer can pipeline with
 * filters and column pruning.
 */
object TextAnalysis {

  /** Whitespace tokens of the trimmed text; blank → empty array, null → null. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish regex tokenizer (GPT-2-style contractions + letter runs +
    * digit runs + punctuation runs); count of non-overlapping matches. */
  val BpeTokenPattern = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("long")

  def digitCount(text: Column): Column =
    regexp_count(text, lit("[0-9]")).cast("long")

  /** Non-whitespace character count (the mass of the words). */
  def wordCharCount(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("long")

  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0, wordCharCount(text).cast("double") / n.cast("double"))
  }

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(charCount(text), lit(1L)).cast("double")

  // -- language ID (stopword-lexicon heuristic) ---------------------------

  /** Tiny per-language function-word lexicons; matching is whole-word on
    * lowercased text. CJK presence is scored by character class. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "as", "was", "on", "are"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est", "dans", "que", "pour", "sur", "avec", "au"),
    "es" -> Seq("el", "los", "las", "y", "en", "que", "un", "una", "es", "por", "con", "para", "del", "se"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine", "zu", "im", "auf", "nicht"))

  def lexiconPattern(words: Seq[String]): String = "\\b(" + words.mkString("|") + ")\\b"

  def langScore(text: Column, lang: String): Column = {
    val words = Lexicons.collectFirst { case (`lang`, ws) => ws }.get
    regexp_count(lower(text), lit(lexiconPattern(words))).cast("long")
  }

  /** CJK (Han) character count — decisive evidence for zh. */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[一-鿿]")).cast("long")

  /** Argmax over language scores with a fixed tie-break order
    * (zh-if-any-CJK > en > fr > es > de); no evidence → "und". */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val fr = langScore(text, "fr")
    val es = langScore(text, "es"); val de = langScore(text, "de")
    val zh = cjkCount(text)
    // null text → null language (all scores are null, so every comparison
    // below would be null-false and control would fall through to "de")
    when(text.isNull, lit(null).cast("string"))
      .when(en + fr + es + de + zh === 0, lit("und"))
      .when(zh > 0, lit("zh"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Confidence MARGIN of the language-ID DECISION — mirrors
    * [[langId]]'s rule, not a symmetric 5-way race: any CJK evidence
    * decides zh, so with CJK present the margin is zh's evidence minus
    * the best lexicon channel (NEGATIVE when the priority rule overrode
    * stronger contrary evidence — exactly what a routing gate must see;
    * review r9: the old symmetric margin reported the LOSING channel's
    * lead as high confidence). Without CJK the margin is top lexicon
    * minus runner-up (0 = a tie the fixed tie-break order resolved
    * arbitrarily). Second-max as max-over-pairs-of-min: pure integer
    * Column algebra, replayed verbatim in SQL. */
  def langIdMargin(text: Column): Column = {
    val xs = Seq(langScore(text, "en"), langScore(text, "fr"),
      langScore(text, "es"), langScore(text, "de"))
    val cjk = cjkCount(text)
    val second = greatest((for {
      i <- xs.indices; j <- i + 1 until xs.size
    } yield least(xs(i), xs(j))): _*)
    when(cjk > 0, cjk - greatest(xs: _*))
      .otherwise(greatest(xs: _*) - second)
  }

  /** Ratio of (per-language) stopwords to tokens. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val n = tokenCount(text)
    when(n > 0, langScore(text, lang).cast("double") / n.cast("double")).otherwise(lit(0.0))
  }

  // -- quality score ------------------------------------------------------

  /** Heuristic quality score in [0,1] (Gopher-rule flavored): length,
    * word-shape, stopword-density, punctuation-density signals, fixed
    * weights, rounded to 6dp so it is reproducible across engines. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val awl = avgWordLen(text)
    val wordLenScore = when(awl >= 3.0 && awl <= 10.0, lit(1.0)).otherwise(lit(0.0))
    val stopScore = least(stopwordRatio(text, "en") * 5.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.3 + wordLenScore * 0.2 + stopScore * 0.3 + punctPenalty * 0.2, 6)
  }

  /** Per-language quality gate: keep documents whose [[qualityScore]]
    * is at or above their language's `1 - keepFrac` quantile — "top
    * keepFrac by quality, per language". TWO-PHASE, deliberately not a
    * language-partitioned window (|langs| is tiny, so a per-lang window
    * would funnel whole languages through single tasks at corpus
    * scale): (1) aggregate per-lang thresholds — partial-aggregating,
    * O(|langs|) rows out; (2) broadcast the tiny threshold table back
    * onto the scan and filter there. Exact `percentile` buffers each
    * group's values in its agg buffer — right for oracle-checked
    * correctness at test scale; at 100 TB swap in `approx_percentile`
    * (t-digest, bounded memory) — the join/filter shape is unchanged.
    * Null-language rows are dropped by the equality join, like the SQL
    * inner join they mirror. */
  def qualityFilterByLang(df: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, langCol: String,
                          keepFrac: Double): org.apache.spark.sql.DataFrame = Pinned.guard {
    // SCORE ONCE (r14): the threshold aggregate and the filter both
    // consume the scored frame, and with a map-only scoring plan there
    // is no Exchange for ReuseExchange to share — lazily the corpus
    // paid the multi-regex qualityScore twice per run (measured 2.3 s
    // -> 1.4 s at sf0.1). The pin is the same materialization a
    // production score-then-filter pipeline performs anyway (it writes
    // its scored corpus before thresholding); result rides the op's
    // hold slot so residency stays one-result-per-op.
    val (scored, h) = Pinned.checkpoint(
      df.withColumn("quality", qualityScore(col(textCol))))
    val thr = scored.groupBy(col(langCol))
      .agg(expr(s"percentile(quality, ${1.0 - keepFrac})").as("q_threshold"))
    val out = Pinned.hold("text.quality_filter",
      scored.join(broadcast(thr), langCol)
        .where(col("quality") >= col("q_threshold")))
    Pinned.release(h)
    out
  }

  // -- repetition signals (Gopher-rule flavored) --------------------------

  /** Fraction of tokens that are repeats: 1 - |distinct|/|tokens|. */
  def repeatedTokenFraction(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t).cast("double"))
  }

  /** Per-doc fraction of bigram occurrences taken by the most frequent
    * bigram (high → boilerplate/spam). Distributed: explode bigrams →
    * count per (id, bigram) → max/sum per id. */
  def topBigramFraction(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    // tokens materialize first — the ngramsFromTokens attribute rule
    val toked = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
    val t = col("__t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val bg = toked.select(col("id"), explode(bigrams).as("bg"))
    bg.groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_bigram_frac"))
  }

  // -- fingerprints -------------------------------------------------------

  /** Whitespace/case-normalized form used by content hashing. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Stable content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Rolling polynomial token hash (order-sensitive, engine-native
    * xxhash64 per token; Long overflow wraps deterministically). */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(normText(text)), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /**
   * Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
   * hash every word k-gram, slide a window of `w` hashes, select each
   * window's minimum (rightmost on ties), emit the DISTINCT selected
   * (position, hash) pairs. Guarantees: any shared substring of length
   * ≥ w+k-1 tokens yields at least one shared fingerprint, and
   * fingerprint density is ~2/(w+1) — robust span-level matching at a
   * fraction of the full gram set.
   *
   * Hashes are md5 strings (engine-portable, unlike xxhash64) compared
   * lexicographically; swap [[graft.functions.ShingleHashes]] in
   * production for numeric hashes with no string materialization. Pure
   * per-row array algebra until the final distinct — at 100 TB the
   * fingerprinting itself is a free projection in the scan.
   */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, k: Int = 4, w: Int = 5): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    import org.apache.spark.sql.expressions.Window
    // per-row (pos, hash) + ONE sliding window over each doc: each
    // window start takes min(struct(h, -pos)) over its w-row frame —
    // struct-min is (min hash, rightmost tie) in a single aggregate.
    // Tokens are materialized first (see ngramsFromTokens), and the
    // window form replaces the array-of-windows explode: no w-sized
    // slices carried per row, no aliased-array re-evaluation under
    // pushed filters (the array form measured 30 s vs 2.4 s at sf0.1).
    // One shuffle on the doc id; per-doc frames are small.
    val toked = df.select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__t"))
    val rows = toked.select(col("id"),
        posexplode(ngramsFromTokens(col("__t"), k)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), md5(col("g")).as("h"))
    val frame = Window.partitionBy(col("id")).orderBy(col("pos")).rowsBetween(0, w - 1)
    val perDoc = Window.partitionBy(col("id"))
    rows
      .withColumn("__m", count(lit(1)).over(perDoc))
      .withColumn("__sel", min(struct(col("h"), (-col("pos")).as("np"))).over(frame))
      .where(col("pos") <= col("__m") - w) // valid window starts only
      .select(col("id"), (-col("__sel.np")).cast("long").as("pos"),
        col("__sel.h").as("h"))
      .distinct()
  }

  /**
   * Near-duplicate candidate pairs from shared winnowing fingerprints
   * (how MOSS actually matches submissions): document pairs sharing at
   * least `minShared` selected fingerprint hashes, with the shared
   * count. The inverted index joins on the fingerprint hash — the same
   * shape as the exact-Jaccard shingle index, but over the winnowed
   * ~2/(w+1)-density selection, so the per-hash fan-out (docFreq²) is
   * proportionally smaller. Like every inverted-index discovery path:
   * candidate generation — verify candidates with an exact measure
   * downstream.
   */
  def winnowPairs(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  k: Int = 4, w: Int = 5, minShared: Int = 2): org.apache.spark.sql.DataFrame = {
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("h")).distinct()
    fp.as("a").join(fp.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Redaction patterns shared verbatim with SQL oracles: email
    * addresses, http(s) URLs, and long (7+) digit runs (phone/account
    * numbers). Kept deliberately simple and engine-portable — both RE2
    * and java.util.regex read these identically. */
  val RedactEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val RedactUrl = "https?://[^\\s]+"
  val RedactDigits = "[0-9]{7,}"

  /** Content scrubbing for training corpora: replace emails, URLs, and
    * long digit runs with type tags. Pure codegen'd regexp_replace chain
    * in the scan — at 100 TB redaction is a free projection. Order
    * matters: URLs first (an URL may embed digit runs), then emails,
    * then bare digit runs. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, RedactUrl, "<URL>"),
        RedactEmail, "<EMAIL>"),
      RedactDigits, "<NUM>")

  /** Rule-based SENTENCE segmentation — the RAG-ingestion sibling of
    * token chunking ([[chunkText]] cuts mid-sentence; retrieval wants
    * semantic units): a sentence ends at [.!?] followed by whitespace.
    * Implemented as mark-then-split (replace the boundary with the
    * terminator + a control-char separator, then split) because the
    * natural lookbehind split is NOT in the RE2 dialect — the
    * mark-then-split form replays verbatim in SQL, same portability
    * contract as [[redact]]. `sent_id` is the RAW split position
    * (gaps where a split produced an empty fragment), so ids are
    * stable under filtering. Zero shuffle — explode rides the scan.
    * Returns (`idCol`, sent_id, sentence, n_tok). Abbreviation-aware
    * segmentation ("Dr. Smith") needs a lexicon pass; this is the
    * deterministic baseline tier. */
  /** The boundary separator is U+0001 — outside any printable corpus.
    * Built programmatically: in a java.util.regex REPLACEMENT string a
    * backslash-u escape is NOT an escape (Matcher treats `\\u` as a
    * literal 'u'), so the char itself must ride the string. */
  private val SentSep: String = 1.toChar.toString

  def sentenceSplit(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        posexplode(split(
          regexp_replace(col(textCol), "([.!?])\\s+", "$1" + SentSep),
          java.util.regex.Pattern.quote(SentSep))).as(Seq("sent_id", "__s")))
      .where(length(trim(col("__s"))) > 0)
      .select(col(idCol), col("sent_id").cast("long").as("sent_id"),
        trim(col("__s")).as("sentence"),
        tokenCount(trim(col("__s"))).as("n_tok"))

  /** CONTENT-DEFINED chunking (the LBFS/rsync/restic boundary trick at
    * token granularity): a chunk boundary falls after token i whenever
    * the hash of the trailing `w`-token window lands in the boundary
    * set — so boundaries are functions of LOCAL content only, and an
    * insertion/deletion re-chunks just its neighborhood while every
    * downstream chunk survives byte-identical (the invariance fixed
    * windows fundamentally lack — [[chunkText]] shifts every
    * subsequent chunk; the law spec pins this). The robust form of
    * passage-level dedup keys.
    *
    * The boundary predicate is the first hex char of md5(window) ∈
    * `boundaryHexChars` (k chars → expected chunk ≈ 16/k tokens) —
    * string compare, no hex parse, engine-portable like
    * [[graft.ops.Sampling.hashBucket]]. One doc-keyed window for the
    * running chunk id + one (doc, chunk) aggregate; the hash is
    * codegen'd in the scan. Returns (`idCol`, chunk_id, n_tok,
    * chunk_text). */
  def cdcChunks(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                w: Int = 4, boundaryHexChars: Seq[String] = Seq("0", "8")): org.apache.spark.sql.DataFrame = {
    require(w >= 1 && boundaryHexChars.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
    val pos = base
      .select(col("__id"), col("__t"), posexplode(col("__t")).as(Seq("__pos", "__tok")))
      .withColumn("__boundary",
        when(col("__pos") >= w - 1,
          substring(md5(concat_ws(" ",
            slice(col("__t"), col("__pos") - (w - 2), lit(w)))), 1, 1)
            .isin(boundaryHexChars: _*).cast("long"))
          .otherwise(0L))
      .drop("__t")
    val win = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pos
      .withColumn("__chunk", coalesce(sum(col("__boundary")).over(win), lit(0L)))
      .groupBy(col("__id"), col("__chunk"))
      .agg(count(lit(1)).as("n_tok"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          s => s.getField("__tok"))).as("chunk_text"))
      .select(col("__id").as(idCol), col("__chunk").as("chunk_id"),
        col("n_tok"), col("chunk_text"))
  }

  /** Robust per-class LENGTH-OUTLIER detection: flag documents whose
    * token count deviates from their class's median by more than
    * k × MAD (median absolute deviation) — the robust z-score of data
    * validation, immune to the heavy tails that wreck mean/σ cuts on
    * web corpora. Two two-phase percentile aggregates (median, then
    * MAD) broadcast back onto the scan — no per-class window, the same
    * shape as [[qualityFilterByLang]]; swap `percentile` for
    * `approx_percentile` at 100 TB. Integer inputs keep every
    * interpolation exact (halves/quarters), so the verdict is
    * engine-reproducible. Returns (idCol, classCol, n_tok, median_tok,
    * mad_tok, outlier). */
  def lengthOutliers(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, classCol: String,
                     k: Double = 3.0): org.apache.spark.sql.DataFrame = {
    val lens = df.select(col(classCol).as("__c"), col(idCol).as("__id"),
      tokenCount(col(textCol)).as("__n"))
    val med = lens.groupBy(col("__c"))
      .agg(expr("percentile(__n, 0.5)").as("__med"))
    val dev = lens.join(broadcast(med), "__c")
      .withColumn("__dev", abs(col("__n") - col("__med")))
    val mad = dev.groupBy(col("__c"))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.join(broadcast(mad), "__c")
      .select(col("__id").as(idCol), col("__c").as(classCol),
        col("__n").as("n_tok"), col("__med").as("median_tok"),
        col("__mad").as("mad_tok"),
        (col("__dev") > lit(k) * col("__mad")).as("outlier"))
  }

  /** Per-class corpus DATA-CARD report — the summary table a dataset
    * release ships (datasheets/data-statements practice): per class
    * (source, language, …) the document count, total whitespace
    * tokens, exact-duplicate document count (members of any
    * same-fingerprint group within the class), and the duplicate
    * fraction. All integer aggregates except the final exact division,
    * so the report is engine-reproducible. Two keyed aggregates —
    * (class, fingerprint) then class — both map-side combined; nothing
    * driver-side at any corpus size. */
  def corpusReport(df: org.apache.spark.sql.DataFrame, classCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val perFp = df
      .select(col(classCol).as("__c"),
        tokenCount(col(textCol)).as("__n"),
        fingerprint(col(textCol)).as("__fp"))
      .groupBy(col("__c"), col("__fp"))
      .agg(count(lit(1)).as("cnt"), sum(coalesce(col("__n"), lit(0L))).as("tok"))
    perFp.groupBy(col("__c"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum(col("tok")).as("n_tok"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("n_dup_docs"))
      .select(col("__c").as(classCol), col("n_docs"), col("n_tok"),
        col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_frac"))
  }

  /** Cross-class n-gram OVERLAP matrix — the pairwise contamination /
    * redundancy audit of a source mix (how much of source A's content
    * already lives in source B?): for every unordered class pair, the
    * count of shared DISTINCT word n-grams plus each side's total and
    * the resulting Jaccard. Distinct (class, gram) reduces each class
    * to its gram set ONCE; the pair counts come from a gram-keyed
    * self-join — per gram the fan-out is bounded by (classes sharing
    * it)², and the class count is small by construction (sources,
    * languages). All integers except the final exact division. */
  def sourceOverlapMatrix(df: org.apache.spark.sql.DataFrame, classCol: String,
                          textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    classGramPairCounts(df, classCol, textCol, n)
      .select(col("class_a"), col("class_b"), col("grams_a"), col("grams_b"),
        col("shared_grams"),
        (col("shared_grams").cast("double") /
          (col("grams_a") + col("grams_b") - col("shared_grams"))).as("jaccard"))

  /** Shared pair-count core of [[sourceOverlapMatrix]] and
    * [[crossClassOverlap]] (review r9: the two ops duplicated this
    * block verbatim, differing only in the final metric): per-class
    * DISTINCT gram inventories, one gram-keyed self-join whose fan-out
    * is bounded by classes-per-gram, class totals broadcast back.
    * Returns (class_a < class_b, shared_grams, grams_a, grams_b). */
  private def classGramPairCounts(df: org.apache.spark.sql.DataFrame, classCol: String,
                                  textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val grams = df
      .select(col(classCol).as("__c"), tokens(lower(col(textCol))).as("__t"))
      .where(size(col("__t")) >= n) // gram-less docs prune in the scan
      .select(col("__c"), explode(ngramsFromTokens(col("__t"), n)).as("__g"))
      .distinct()
    val totals = grams.groupBy(col("__c")).agg(count(lit(1)).as("__tot"))
    grams.as("a").join(grams.as("b"),
        col("a.__g") === col("b.__g") && col("a.__c") < col("b.__c"))
      .groupBy(col("a.__c").as("class_a"), col("b.__c").as("class_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(broadcast(totals.select(col("__c").as("class_a"), col("__tot").as("grams_a"))),
        Seq("class_a"))
      .join(broadcast(totals.select(col("__c").as("class_b"), col("__tot").as("grams_b"))),
        Seq("class_b"))
  }

  /** Corpus MIX-DRIFT between two snapshots — the composition audit a
    * continuously-ingesting corpus runs per release (did the crawl
    * shift the source/language mix?): per class, document and token
    * counts in each snapshot, each snapshot's token SHARE of its
    * corpus, and the share delta. Counts are exact integers; shares
    * are single exact divisions (engine-reproducible). Shape: one
    * keyed aggregate per side, a full outer join on the (small) class
    * domain, totals via a broadcast 1-row cross join — the big sides
    * never shuffle twice. */
  def mixDrift(va: org.apache.spark.sql.DataFrame, vb: org.apache.spark.sql.DataFrame,
               classCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    def agg(df: org.apache.spark.sql.DataFrame, suffix: String) =
      df.select(col(classCol).as("__c"),
          coalesce(tokenCount(col(textCol)), lit(0L)).as("__n"))
        .groupBy(col("__c"))
        .agg(count(lit(1)).as(s"n_docs_$suffix"), sum(col("__n")).as(s"n_tok_$suffix"))
    val a = agg(va, "a"); val b = agg(vb, "b")
    val joined = a.join(b, Seq("__c"), "full_outer")
      .select(col("__c"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("n_tok_a"), lit(0L)).as("n_tok_a"),
        coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b"),
        coalesce(col("n_tok_b"), lit(0L)).as("n_tok_b"))
    val totals = joined.agg(sum("n_tok_a").as("__ta"), sum("n_tok_b").as("__tb"))
    joined.join(broadcast(totals))
      .select(col("__c").as(classCol),
        col("n_docs_a"), col("n_tok_a"), col("n_docs_b"), col("n_tok_b"),
        when(col("__ta") > 0, col("n_tok_a").cast("double") / col("__ta")).as("share_a"),
        when(col("__tb") > 0, col("n_tok_b").cast("double") / col("__tb")).as("share_b"))
      .withColumn("share_delta", col("share_b") - col("share_a"))
  }

  /** HTML markup stripping — the first cleaning pass of every
    * web-corpus pipeline (C4/RefinedWeb run full DOM extractors like
    * trafilatura; this is the regex tier for payloads that are already
    * mostly text): (1) `<script>`/`<style>` ELEMENTS drop with their
    * content (a bare tag-stripper would leak javascript/CSS into the
    * training text), (2) comments and every remaining tag become a
    * space, (3) the standard named entities + the ubiquitous `&#39;`
    * reference decode — `&amp;` LAST, so `&amp;lt;` correctly yields
    * the literal `&lt;` (single-pass decode, the HTML5 rule), (4)
    * whitespace runs collapse. Pure codegen'd regexp_replace/replace
    * chain in the scan stage — zero shuffle at any corpus size. The
    * patterns avoid backreferences and stay inside the
    * RE2-∩-java.util.regex dialect, so SQL oracles replay them
    * verbatim (same portability contract as [[redact]]). */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(replace(named, lit("&amp;"), lit("&")), "\\s+", " "))
  }

  /** Strip corpus-frequent boilerplate words — the census→cleaning loop
    * (C4 removes corpus-repeated lines; this is the word-level analog
    * for line-free text): [[Sketches.heavyHitters]] mines the words with
    * corpus frequency ≥ `minFreq` EXACTLY (bounded tree-merged state,
    * ≤ k driver candidates), and a scan-stage array filter drops them
    * from every document — the hot set rides the closure as a literal,
    * so cleaning is a ZERO-SHUFFLE projection (for hot sets beyond a few
    * thousand words, swap the literal for an explode + anti-join +
    * ordered reassembly). Returns (idCol, clean_text, n_kept,
    * n_removed). `k = 0` (the default-safe choice) sizes the sketch from
    * the corpus ([[Sketches.heavyHittersAuto]]) so the exactness bound
    * holds at any scale factor; a positive `k` pins it, and throws if
    * the corpus outgrows k·minFreq. */
  def stripCorpusFrequentWords(df: org.apache.spark.sql.DataFrame, idCol: String,
                               textCol: String, k: Int, minFreq: Long): org.apache.spark.sql.DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
    val hotDf =
      if (k > 0) Sketches.heavyHitters(words, "word", k, minFreq)
      else Sketches.heavyHittersAuto(words, "word", minFreq)
    val hot = hotDf.select("word").collect().map(_.getString(0)).sorted
    val hotLit = typedlit(hot.toSeq)
    val kept = filter(tokens(col(textCol)), w => !array_contains(hotLit, w))
    df.select(col(idCol),
      concat_ws(" ", kept).as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (tokenCount(col(textCol)) - size(kept)).cast("long").as("n_removed"))
  }

  // -- sliding-window chunking --------------------------------------------

  /**
   * Sliding token-window chunking (RAG / context-window ingestion):
   * split each document's token stream into windows of `chunkTokens`
   * with `overlap` tokens carried between consecutive chunks (stride =
   * chunkTokens − overlap). A document shorter than one window yields
   * exactly one chunk; the last chunk may be short; empty docs yield no
   * chunks. Returns (id, chunk_id, chunk_text, n_tok). Pure per-row
   * array algebra + one explode — at 100 TB chunking rides the scan
   * with zero shuffle, and chunk counts follow from arithmetic:
   * ceil((len − overlap) / stride).
   */
  def chunkText(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val toked = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
    val t = col("__t")
    val nChunks = when(size(t) === 0, lit(0))
      .otherwise(greatest(lit(1),
        floor((size(t) - overlap + (stride - 1)) / lit(stride)).cast("int")))
    toked
      .select(col("id"), t,
        explode(when(nChunks > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_id"))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(t, col("chunk_id") * stride + 1, lit(chunkTokens))).as("chunk_text"),
        least(size(t) - col("chunk_id") * stride, lit(chunkTokens)).cast("long").as("n_tok"))
  }

  // -- corpus-fitted bigram LM scoring ------------------------------------

  /**
   * Corpus-fitted character-bigram language-model scores — the shape of
   * CCNet's perplexity filtering, self-contained instead of an external
   * KenLM: fit add-one-smoothed P(c2|c1) on the corpus's own normalized
   * text, then score each document by the sum of its bigram log-probs
   * (out-of-distribution text scores low).
   *
   * Outputs (id, n_bigrams, sum_c, sum_tot, logp):
   *   - `n_bigrams` — the document's bigram count;
   *   - `sum_c` — Σ over the doc's bigrams of the corpus count c(g);
   *   - `sum_tot` — Σ of the first-char totals tot(c1(g));
   *   - `logp = Σ ln((c+1)/(tot+V))` — the doc's log-probability
   *     (mean log-prob = logp/n_bigrams; perplexity = exp(−mean)).
   * The three LONG columns pin every count the model is built from and
   * are reproducible bit-for-bit across engines; `logp` involves a
   * transcendental whose last ULP differs between libm implementations
   * (an earlier `floor(1e6·ln)` encoding flipped at floor boundaries
   * across engines), so cross-engine checks must hash ONLY the integer
   * columns and bound `logp` with a tolerance.
   *
   * Shape at 100 TB: the model is three corpus-level aggregates (bigram
   * counts, first-char totals, alphabet size) — all map-side combined,
   * all alphabet²-bounded — broadcast back for scoring, so the corpus
   * itself never shuffles beyond ONE per-(doc, bigram) combine. That
   * combine's exchange subtree feeds BOTH the model fit and the scoring
   * branch, so Spark's exchange reuse runs the corpus scan + explode
   * once (the previous two-consumer form scanned twice); the alphabet
   * size rides along as a broadcast 1-row frame instead of a separate
   * blocking driver action.
   */
  def bigramLmScores(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val t = normText(col(textCol))
    val base = df.select(col(idCol).as("__id"), t.as("__t"))
      .where(length(col("__t")) >= 2)
    // per-(doc, bigram) counts: the one corpus-sized shuffle, shared by
    // the model branch (cnt/uni) and the scoring branch (scored)
    val docGram = base.select(col("__id"),
      explode(transform(sequence(lit(1), length(col("__t")) - 1),
        i => col("__t").substr(i, lit(2)))).as("__g"))
      .groupBy(col("__id"), col("__g")).agg(count(lit(1)).as("__k"))
    val cnt = docGram.groupBy(col("__g")).agg(sum(col("__k")).as("__c"))
    val uni = cnt.groupBy(substring(col("__g"), 1, 1).as("__c1"))
      .agg(sum(col("__c")).as("__tot"))
    val alpha = df.select(t.as("__t")).where(length(col("__t")) >= 1)
      .select(explode(transform(sequence(lit(1), length(col("__t"))),
        i => col("__t").substr(i, lit(1)))).as("__ch"))
      .agg(count_distinct(col("__ch")).cast("double").as("__alpha"))
    val lp = cnt.join(broadcast(uni), substring(col("__g"), 1, 1) === col("__c1"))
      .crossJoin(broadcast(alpha)) // 1 row: the smoothing denominator
      .select(col("__g"), col("__c"), col("__tot"),
        log((col("__c") + 1.0) / (col("__tot") + col("__alpha"))).as("__lp"))
    val scored = docGram.join(broadcast(lp), "__g")
      .groupBy(col("__id"))
      .agg(sum(col("__k")).as("n_bigrams"), sum(col("__k") * col("__c")).as("sum_c"),
        sum(col("__k") * col("__tot")).as("sum_tot"),
        sum(col("__k") * col("__lp")).as("logp"))
    // id-keyed left join restores sub-2-char docs with zero scores; the
    // scored side is corpus-cardinality, so NO broadcast hint — at scale
    // both sides shuffle on the id they are typically already bucketed by
    df.join(scored, df(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_c"), lit(0L)).as("sum_c"),
        coalesce(col("sum_tot"), lit(0L)).as("sum_tot"),
        coalesce(col("logp"), lit(0.0)).as("logp"))
  }

  // -- benchmark decontamination ------------------------------------------

  /** Word n-grams from an ALREADY-MATERIALIZED token-array column
    * (space-joined; fewer than n tokens → empty array). Operators that
    * build grams should `.select(tokens(...).as(c))` first and pass the
    * attribute: inlining the tokenizer tree here makes every
    * `element_at` reference re-run the regex split — O(len·n) splits per
    * row, measured 26 s vs 0.7 s over sf0.1 documents. */
  def ngramsFromTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Word n-grams of the lowercased whitespace-token stream. Convenience
    * form for SINGLE-consumption contexts (one explode directly over the
    * result); see [[ngramsFromTokens]] for the attribute-first rule that
    * hot paths must follow. */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsFromTokens(tokens(lower(text)), n)

  /**
   * Test-set decontamination: flag corpus documents sharing any word
   * n-gram with a benchmark text set (the n-gram collision checks of
   * GPT-3 appendix C / PaLM; n = 8..13 words is the published range).
   *
   * Shape at 100 TB: the benchmark side is DISTINCT'd and **broadcast**
   * (eval sets are MBs; the corpus is the big side and never shuffles
   * for the match). The corpus explodes to (doc, gram) pairs only inside
   * the scan stage, where the broadcast inner join discards non-matches
   * immediately — the per-doc hit aggregate shuffles just the (rare)
   * surviving matches, and the final flag join broadcasts the tiny
   * contaminated-id set back onto the corpus.
   */
  def decontaminate(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                    bench: org.apache.spark.sql.DataFrame, benchTextCol: String,
                    n: Int): org.apache.spark.sql.DataFrame = {
    // tokens MATERIALIZE into an attribute before the gram lambda (the
    // ngramsFromTokens rule): inlined, the per-element element_at
    // references re-ran the tokenizer — fast over a bare scan where
    // codegen's subexpression elimination caught it, but 29 s vs 0.3 s
    // at sf0.1 the moment a window/join sat upstream
    val grams = docs.select(col(idCol).as("__id"),
        tokens(lower(col(textCol))).as("__t"))
      .select(col("__id"), explode(ngramsFromTokens(col("__t"), n)).as("__g"))
    val bgrams = bench
      .select(tokens(lower(col(benchTextCol))).as("__t"))
      .select(explode(ngramsFromTokens(col("__t"), n)).as("__g")).distinct()
    val hits = grams.join(broadcast(bgrams), "__g")
      .groupBy(col("__id")).agg(count_distinct(col("__g")).as("n_hits"))
    docs.join(broadcast(hits), docs(idCol) === hits("__id"), "left")
      .select(docs.columns.map(docs(_)) :+
        coalesce(col("n_hits"), lit(0L)).as("n_hits") :+
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"): _*)
  }

  /**
   * N-gram NOVELTY against a reference corpus — the quality/diversity
   * signal dual to [[decontaminate]]'s contamination flag: for each
   * document, the fraction of its DISTINCT word n-grams that never
   * occur in the reference corpus (high novelty = new content worth
   * keeping; near-zero novelty = paraphrase/boilerplate of what the
   * model has already seen — the n-gram-overlap pruning signal of the
   * data-mixing literature). Returns (`idCol`, n_grams, n_known,
   * novelty) with novelty = (n_grams − n_known)/n_grams, null for
   * gram-free docs.
   *
   * Shape at 100 TB: the reference side reduces to DISTINCT grams once
   * (shuffle keyed on the gram); the scored corpus explodes inside the
   * scan, distincts per (doc, gram), and LEFT-joins the reference —
   * when the reference fits the broadcast threshold AQE broadcasts it,
   * otherwise the join shuffles on the gram key, which both sides
   * already produce. Nothing driver-side either way.
   */
  def ngramNovelty(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                   ref: org.apache.spark.sql.DataFrame, refTextCol: String,
                   n: Int): org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol).as("__id"),
        tokens(lower(col(textCol))).as("__t"))
      .select(col("__id"), explode(ngramsFromTokens(col("__t"), n)).as("__g"))
      .distinct()
    val rgrams = ref.select(tokens(lower(col(refTextCol))).as("__t"))
      .select(explode(ngramsFromTokens(col("__t"), n)).as("__g")).distinct()
      .withColumn("__hit", lit(1L))
    val scored = grams.join(rgrams, Seq("__g"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_known"))
    docs.select(col(idCol)).join(scored, docs(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(col("n_grams") > 0L,
          (col("n_grams") - col("n_known")).cast("double") / col("n_grams"))
          .as("novelty"))
  }

  /**
   * [[decontaminate]] with a BLOOM-FILTER pre-filter on the corpus gram
   * stream — the variant for when the benchmark gram set is too large
   * to broadcast as rows (a full eval-suite union at 13-gram granularity
   * reaches GBs; its Bloom filter at 1% FPP is ~1.2 bytes/gram). The
   * filter is built in ONE distributed aggregate over the benchmark
   * grams, broadcast once, and applied map-side inside the corpus scan,
   * so ~99% of the exploded (doc, gram) stream dies before the join;
   * the surviving grams still confirm against the exact gram table, so
   * Bloom false positives cannot flag a clean document — output is
   * IDENTICAL to [[decontaminate]] (same oracle, equivalence spec).
   *
   * The membership probe is a JVM UDF (Spark exposes its Bloom filter
   * to SQL only as an internal runtime-filter expression) — acceptable
   * here because it GATES the hot path rather than computing on it, and
   * the gram explode it filters already bounds the stage's throughput.
   */
  def decontaminateBloom(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                         bench: org.apache.spark.sql.DataFrame, benchTextCol: String,
                         n: Int, fpp: Double = 0.01): org.apache.spark.sql.DataFrame =
    decontaminateBloomWith(docs, idCol, textCol, bench, benchTextCol, n,
      benchBloomFilter(bench, benchTextCol, n, fpp))

  /** Build the benchmark-gram Bloom filter alone — the FIT half of the
    * fit-once/screen-many production shape (an eval-suite filter is an
    * artifact: built in one batch job, shipped to every ingest job via
    * [[saveBloom]]/[[loadBloom]]). */
  def benchBloomFilter(bench: org.apache.spark.sql.DataFrame, benchTextCol: String,
                       n: Int, fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val bgrams = bench
      .select(tokens(lower(col(benchTextCol))).as("__t"))
      .select(explode(ngramsFromTokens(col("__t"), n)).as("__g")).distinct()
    val nb = math.max(bgrams.count(), 1L)
    bgrams.stat.bloomFilter("__g", nb, fpp)
  }

  /** Persist a Bloom filter as a one-row binary parquet. Spark's sketch
    * serialization round-trips exactly, so a loaded filter answers
    * mightContain bit-identically (law-tested). */
  def saveBloom(spark: org.apache.spark.sql.SparkSession, path: String,
                bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import spark.implicits._
    Seq(bos.toByteArray).toDF("bloom").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadBloom(spark: org.apache.spark.sql.SparkSession,
                path: String): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        spark.read.parquet(path).head().getAs[Array[Byte]]("bloom")))

  /** [[decontaminateBloom]] against a PREBUILT filter (fresh or
    * [[loadBloom]]-ed) — the screen half of fit-once/screen-many. */
  def decontaminateBloomWith(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                             bench: org.apache.spark.sql.DataFrame, benchTextCol: String,
                             n: Int, bf: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.sql.DataFrame = {
    val bgrams = bench
      .select(tokens(lower(col(benchTextCol))).as("__t"))
      .select(explode(ngramsFromTokens(col("__t"), n)).as("__g")).distinct()
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bc.value.mightContainString(g))
    val grams = docs.select(col(idCol).as("__id"),
        tokens(lower(col(textCol))).as("__t"))
      .select(col("__id"), explode(ngramsFromTokens(col("__t"), n)).as("__g"))
      .where(mightContain(col("__g")))
    val hits = grams.join(broadcast(bgrams), "__g")
      .groupBy(col("__id")).agg(count_distinct(col("__g")).as("n_hits"))
    docs.join(broadcast(hits), docs(idCol) === hits("__id"), "left")
      .select(docs.columns.map(docs(_)) :+
        coalesce(col("n_hits"), lit(0L)).as("n_hits") :+
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"): _*)
  }

  // -- corpus filter rules (Gopher/C4 flavored) ---------------------------

  /** Gopher's stopword-presence list (Rae et al. 2021, table A1 rule 8);
    * C4 uses "lorem ipsum" and curly-brace page rejection (Raffel et al.
    * 2020 §2.2). Matching is whole-word on lowercased text. */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def lines(text: Column): Column = split(text, "\n")

  /** Unicode NFC normalization (canonical composition) — the
    * preprocessing step a multilingual corpus needs BEFORE any
    * hash-keyed operator above: the same text arrives composed and
    * decomposed from different sources, and every content hash, shingle
    * set, and census key treats the two encodings as different
    * documents. A UDF by necessity (Spark has no normalization
    * built-in — the same justification tier as the BPE encoder);
    * java.text.Normalizer is JDK-standard, locale-independent, and
    * engine-agrees with DuckDB's nfc_normalize. */
  val nfcNormalize: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** Line-level boilerplate removal (the line-dedup pass of CCNet,
    * Wenzek et al. 2020 §3.1, and RefinedWeb, Penedo et al. 2023 §3.4):
    * a non-blank line whose whitespace-normalized lowercase form occurs
    * in at least `minDocs` DISTINCT documents is boilerplate (headers,
    * cookie banners, promo footers) and is removed from EVERY document;
    * surviving lines reassemble in their original order. Blank lines are
    * never counted or removed (document structure is preserved).
    * Output: (id, clean_text, n_kept, n_removed).
    *
    * Scale: lines explode inside the scan; the census is a distinct on
    * (line, doc) + one map-side-combined count, both shuffles keyed on
    * the line; removal is a left_anti join against the hot-line set (AQE
    * broadcasts it when small — the common case, hot lines are by
    * definition few — and falls back to a keyed shuffle join otherwise);
    * reassembly is one groupBy on the doc id. No driver-side state. */
  def dedupLines(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                 minDocs: Long): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs: $minDocs")
    // null text normalizes to "" (a generator over null would emit no
    // rows and silently DROP the document from the output)
    // normText: the SAME normalization the content-hash dedup family
    // keys on — line keys must not drift from document keys
    val ln = df.select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "line")))
      .withColumn("norm", normText(col("line")))
    val hot = ln.where(col("norm") =!= "")
      .select("norm", "id").distinct()
      .groupBy("norm").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("norm").as("__hot"))
    val kept = ln.join(hot, col("norm") === col("__hot"), "left_anti")
    val agg = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line"))).as("clean_text"))
    ln.groupBy("id").agg(count(lit(1)).as("__n_lines"))
      .join(agg, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Corpus lexical diversity per group: type-token ratio (distinct
    * words / total words, lowercased) — the vocabulary-coverage metric a
    * data-mixing run compares across sources. One distinct + one count
    * aggregate, both keyed on the group and map-side combined; blank
    * documents contribute nothing. */
  def typeTokenRatio(df: org.apache.spark.sql.DataFrame, groupCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val t = df.where(length(trim(col(textCol))) > 0)
      .select(col(groupCol).as("grp"), explode(tokens(lower(col(textCol)))).as("w"))
    t.groupBy("grp").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_distinct"))
      .select(col("grp"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("ttr"))
  }

  /** Tokenizer fertility per group: regex-BPE tokens per whitespace word
    * — the tokenizer-efficiency metric a multilingual mixture is budgeted
    * by (CJK text segments per CHARACTER under the byte-ish pattern, so
    * zh fertility ≈ chars/word while Latin scripts sit near 1). Pure
    * column algebra in the scan + one keyed aggregate. */
  def tokenizerFertility(df: org.apache.spark.sql.DataFrame, groupCol: String,
                         textCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(sum(bpeTokenCount(col(textCol))).as("bpe_tokens"),
        sum(tokenCount(col(textCol))).as("words"))
      .select(col("grp"), col("bpe_tokens"), col("words"),
        round(col("bpe_tokens").cast("double") / col("words"), 6).as("fertility"))

  /** Fraction of lines that start with a bullet marker (`-` or `*`). */
  def bulletLineFraction(text: Column): Column = {
    val ls = lines(text)
    round(size(filter(ls, l => ltrim(l).rlike("^[-*]")))
      .cast("double") / greatest(size(ls), lit(1)).cast("double"), 6)
  }

  /** Fraction of lines that end with an ellipsis. */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = lines(text)
    round(size(filter(ls, l => rtrim(l).rlike("\\.\\.\\.$")))
      .cast("double") / greatest(size(ls), lit(1)).cast("double"), 6)
  }

  /** `#`-or-ellipsis symbols per word (Gopher rule 5). */
  def symbolWordRatio(text: Column): Column =
    round((regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
      .cast("double") / greatest(tokenCount(text), lit(1L)).cast("double"), 6)

  /** Fraction of tokens containing at least one alphabetic character. */
  def alphaWordFraction(text: Column): Column =
    round(size(filter(tokens(text), t => t.rlike("[A-Za-z]")))
      .cast("double") / greatest(tokenCount(text), lit(1L)).cast("double"), 6)

  /** How many DISTINCT Gopher stopwords appear (whole-word, lowercased). */
  def distinctStopCount(text: Column): Column =
    GopherStops.map(w =>
      when(lower(text).rlike("\\b" + w + "\\b"), 1L).otherwise(0L)).reduce(_ + _)

  /**
   * Document-level corpus filter: Gopher rules 1-8 + C4's lorem-ipsum and
   * curly-brace rejections, each surfaced as its own flag so pipelines can
   * tune thresholds. Pure `Column` algebra over one row — at 100 TB this
   * is a free projection in the scan, pipelined with pushed-down filters.
   * Thresholds are the published ones: 50..100k words, mean word length
   * 3..10, symbol ratio ≤0.1, ≤90% bullet lines, ≤30% ellipsis lines,
   * ≥80% alphabetic words, ≥2 stopwords.
   */
  def filterFlags(text: Column): Seq[(String, Column)] = {
    val n = tokenCount(text)
    Seq(
      "wc_ok" -> (n >= 50L && n <= 100000L),
      "awl_ok" -> coalesce(avgWordLen(text) >= 3.0 && avgWordLen(text) <= 10.0, lit(false)),
      "symbol_ok" -> (symbolWordRatio(text) <= 0.1),
      "bullet_ok" -> (bulletLineFraction(text) <= 0.9),
      "ellipsis_ok" -> (ellipsisLineFraction(text) <= 0.3),
      "alpha_ok" -> (alphaWordFraction(text) >= 0.8),
      "stop_ok" -> (distinctStopCount(text) >= 2L),
      "no_lorem" -> !lower(text).contains("lorem ipsum"),
      "no_brace" -> !text.contains("{"))
  }

  def keepDocument(text: Column): Column =
    filterFlags(text).map(_._2).reduce(_ && _)

  /**
   * Top-k TF-IDF terms per document (keyword extraction): term
   * frequency per (doc, term), document frequency per term, smoothed
   * idf = ln((N+1)/(df+1)) + 1, score = tf·idf.
   *
   * Distribution shape: explode → ONE (doc, term) aggregate (map-side
   * combined) → ONE term-keyed aggregate for df (the term dictionary
   * shuffles, never the corpus) → join back on term → per-doc top-k
   * window (documents are small groups). `docCount` is passed in so the
   * caller can reuse a known corpus count instead of an extra pass.
   * SKEW: the tf⋈df join key follows the Zipfian term distribution —
   * stopword keys dominate. AQE's skew-join split handles it (enabled in
   * GraftSession); with a bounded vocabulary, broadcast the df side
   * instead.
   *
   * Scores are ROUNDED (6 dp) before ranking, and ties break on the
   * term string — so the top-k set is reproducible across engines
   * whose libm ulps differ, not just across Spark runs.
   */
  def topTfIdfTerms(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                    k: Int, docCount: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score",
        round(col("tf") * (log(lit(docCount + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Character-level Shannon entropy per document (bits/char) — the
    * oracle-checkable sibling of [[compressionRatio]]: near-zero for
    * repeated filler, ~4+ for natural prose, maximal for noise. One
    * (id, char) count shuffle + one per-doc reduce; entropy =
    * log2(n) − Σc·log2(c)/n over the per-char counts (the algebraic
    * form that needs no per-row probability division). Rounded 6 dp;
    * empty/null docs are absent from the output. Chars are CODE
    * POINTS — `regexp_extract_all` with `(?s).` (a Java regex dot
    * matches one code point, keeping surrogate pairs whole), the same
    * unit DuckDB's substr iterates; a split-on-empty draft counted
    * UTF-16 units and diverged on any astral-plane character. */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val chars = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("(?s)."), lit(0))).as("ch"))
    val cnt = chars.groupBy("id", "ch").agg(count(lit(1)).as("c"))
    cnt.groupBy("id").agg(
      round((log2(sum("c")) -
        sum(col("c") * log2(col("c"))) / sum("c")), 6).as("entropy_bits"))
  }

  /** Zipf-law fit over the corpus word-frequency distribution — the
    * corpus-health diagnostic (natural text slopes ≈ −1; synthetic or
    * template-heavy corpora deviate hard): OLS of ln(count) on
    * ln(rank) over the top-`topN` terms. Closed form from ONE aggregate
    * over the (vocab-bounded) ranked counts — slope, intercept rounded
    * to 6 dp. The rank window is global but runs over the term-count
    * table (vocab-sized by Heaps' law), never the corpus. Returns one
    * row (n_terms, slope, intercept). */
  def zipfFit(df: org.apache.spark.sql.DataFrame, textCol: String,
              topN: Int): org.apache.spark.sql.DataFrame = {
    val counts = df.select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // top-topN via TakeOrderedAndProject (Batching.rankedTopK) — the
    // vocab table is Heaps'-law bounded but still outgrows one task's
    // sort at web-corpus scale; only the ≤ topN survivors see a window
    val ranked = Batching
      .rankedTopK(counts, Seq(col("cnt").desc, col("term")), topN)
      .select(log(col("rank")).as("x"), log(col("cnt")).as("y"))
    val agg = ranked.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    agg.select(col("n").as("n_terms"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 6)
        .as("intercept"))
  }

  /** Corpus-wide skip-gram (center, context) pair counts within a
    * ±`window` token radius — the training-pair generator for
    * word2vec-family embedding runs. Pair enumeration stays INSIDE the
    * scan stage with zero self-join: posexplode positions, then two
    * `slice` calls cut each center's left/right neighbor windows
    * (plain codegen'd collection functions — an earlier lambda-HOF
    * formulation ran ~30× slower because nested lambda functions
    * evaluate interpreted, per pair). O(len·window) per doc; the only
    * shuffle is the final (center, context) count. Returns
    * (center, context, cnt) — sort is the caller's. */
  def skipGramPairs(df: org.apache.spark.sql.DataFrame,
                    textCol: String, window: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0)
    val t = tokens(lower(col(textCol)))
    val pos = df.select(t.as("__t")).where(size(col("__t")) >= 2)
      .select(col("__t"), posexplode(col("__t")).as(Seq("__i", "center")))
    // __i is 0-based; slice() is 1-based. Left neighbors: the
    // min(window, __i) tokens ending just before the center; right
    // neighbors: up to `window` tokens after it (slice clips at the
    // array end).
    val nLeft = least(lit(window), col("__i"))
    val ctx = pos.select(col("center"),
      explode(concat(
        slice(col("__t"), col("__i") + 1 - nLeft, nLeft),
        slice(col("__t"), col("__i") + 2, lit(window)))).as("context"))
    ctx.groupBy("center", "context").agg(count(lit(1)).as("cnt"))
  }

  /** Pointwise-mutual-information bigram collocations — the corpus
    * analysis that surfaces multi-word units ("new york") worth
    * treating as single tokens. PMI = ln((c/B) / ((c_a/T)·(c_b/T)))
    * over adjacent-token bigrams with count ≥ `minCount`; top `k` by
    * ROUNDED (6 dp) pmi with (a, b) tiebreak. Unigram tables join
    * broadcast (vocab-sized); totals ride a 1-row broadcast. */
  def pmiCollocations(df: org.apache.spark.sql.DataFrame,
                      textCol: String, minCount: Long, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(lower(col(textCol)))
    val toks = df.select(t.as("__t")).where(size(col("__t")) > 0)
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bi = toks.where(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("a"),
                    element_at(col("__t"), i + 1).as("b")))).as("__g"))
      .groupBy(col("__g.a").as("a"), col("__g.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("cw").as("t"))
    val btot = bi.agg(sum("c").as("bt"))
    val scored = bi.where(col("c") >= minCount)
      .join(broadcast(uni.withColumnRenamed("w", "a").withColumnRenamed("cw", "ca")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("w", "b").withColumnRenamed("cw", "cb")), Seq("b"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .select(col("a"), col("b"), col("c"),
        round(log((col("c") / col("bt")) /
          ((col("ca") / col("t")) * (col("cb") / col("t")))), 6).as("pmi"))
    // top-k over the bigram-pair table via TakeOrderedAndProject
    // (Batching.rankedTopK) — the pair table can be quadratic in vocab,
    // exactly what must never funnel through a single-task rank window
    Batching.rankedTopK(scored, Seq(col("pmi").desc, col("a"), col("b")), k)
      .select(col("rank"), col("a"), col("b"), col("c"), col("pmi"))
  }

  /** Dominant LSI axis by MATRIX-FREE power iteration — the first
    * right-singular vector of the doc-term count matrix (the
    * "principal topic" of latent semantic indexing), computed without
    * ever materializing a matrix: each iteration is two keyed
    * aggregates, u = A·v (per-doc inner product) then v = Aᵀ·u
    * (per-term inner product), over the SAME (doc, term, count)
    * frame. Starting from v₀ = 1 every intermediate stays
    * INTEGER-VALUED (nonneg counts × integer vector), so the
    * iteration is exact in doubles below 2⁵³ at any partition order —
    * normalization happens ONCE at the end (√ of an exact integer sum
    * is correctly rounded, engine-identical). Loadings are
    * nonnegative by Perron–Frobenius. For deep iteration counts at
    * corpus scale, normalize per round in floats and accept spec-tier
    * checking — two rounds is where exactness is free. Returns the
    * top-k terms: (rank, term, loading 6 dp). */
  def lsiPowerIteration(df: org.apache.spark.sql.DataFrame, textCol: String,
                        iters: Int = 2, k: Int = 25): org.apache.spark.sql.DataFrame = Pinned.guard {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1 && k > 0)
    // both halves of every iteration re-read it — pinned once,
    // released on exit; the result is slot-held (Pinned lifecycle)
    val (counts, countsH) = Pinned.checkpoint(df
      .select(monotonically_increasing_id().as("__d"), tokens(lower(col(textCol))).as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("__d"), explode(col("__t")).as("term"))
      .groupBy("__d", "term").agg(count(lit(1)).cast("double").as("__c")))
    var v = counts.groupBy("term").agg(lit(1.0).as("__v"))
    for (_ <- 1 to iters) {
      val u = counts.join(v, Seq("term"))
        .groupBy("__d").agg(sum(col("__c") * col("__v")).as("__u"))
      v = counts.join(u, Seq("__d"))
        .groupBy("term").agg(sum(col("__c") * col("__u")).as("__v"))
    }
    val norm = v.agg(sqrt(sum(col("__v") * col("__v"))).as("__n"))
    val loadings = v.crossJoin(broadcast(norm))
      .select(col("term"), round(col("__v") / col("__n"), 6).as("loading"))
    // vocab-sized loadings → TakeOrderedAndProject top-k, window over ≤ k
    val out = Pinned.hold("text.lsi",
      Batching.rankedTopK(loadings, Seq(col("loading").desc, col("term")), k)
        .select(col("rank"), col("term"), col("loading")))
    Pinned.release(countsH)
    out
  }

  /** Per-group KL divergence of unigram distributions vs the corpus —
    * the diversity/drift audit across sources: KL(p_g ‖ p_corpus) =
    * Σ_w p_g(w)·ln(p_g(w)/p(w)), the "how idiosyncratic is this
    * source's vocabulary" scalar (0 = indistinguishable; rises as a
    * source's word mix diverges — the mixture-weighting and
    * contamination-triage signal). Every p_g(w) > 0 is observed and
    * the corpus distribution dominates it (same tokens, superset
    * counts), so no smoothing is needed and the sum is finite by
    * construction.
    *
    * ONE (group, word) count shuffle; per-group and corpus totals are
    * group/vocab-sized aggregates joined back (corpus word counts by
    * word — vocab-sized, but joined on the same key the counts
    * already carry, not broadcast: vocabulary can exceed broadcast
    * limits at corpus scale). Returns (group, n_tokens, kl) rounded
    * 6 dp. */
  def klBySource(df: org.apache.spark.sql.DataFrame, groupCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(groupCol).as("group"),
        explode(tokens(lower(col(textCol)))).as("__w"))
    val gw = toks.groupBy("group", "__w").agg(count(lit(1)).as("__cgw"))
    val gTot = gw.groupBy("group").agg(sum("__cgw").as("__tg"))
    val wTot = gw.groupBy("__w").agg(sum("__cgw").as("__cw"))
    val tot = gw.agg(sum("__cgw").as("__t"))
    gw.join(wTot, Seq("__w"))
      .join(broadcast(gTot), Seq("group"))
      .crossJoin(broadcast(tot))
      .select(col("group"), col("__tg"),
        ((col("__cgw") / col("__tg")) *
          log((col("__cgw") / col("__tg")) / (col("__cw") / col("__t")))).as("__term"))
      .groupBy("group")
      .agg(max("__tg").as("n_tokens"), round(sum("__term"), 6).as("kl"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form) — the n-gram LM behind
    * perplexity-based quality filtering (CCNet/Wikipedia-LM gates)
    * trained DISTRIBUTED, no external toolkit:
    *
    *   P(b|a) = max(c(a,b) − D, 0)/c(a·) + D·N₁₊(a,·)/c(a·) · P_cont(b)
    *   P_cont(b) = N₁₊(·,b) / |bigram types|
    *
    * The continuation count N₁₊(·,b) — "how many contexts has b
    * followed" — is the insight that separates KN from plain absolute
    * discounting ("francisco" is frequent but only ever follows "san").
    *
    * One (a, b) bigram-count shuffle is the only corpus-sized
    * aggregate; context totals, follower and preceder type counts all
    * derive from the vocab-sized bigram table and join back BROADCAST;
    * the type total rides a 1-row broadcast. Top-k by ROUNDED (6 dp)
    * probability with (a, b) tiebreak — the [[pmiCollocations]]
    * reproducibility convention. `minCount` bounds the REPORTED rows
    * (the model still conditions on full counts). Returns
    * (rank, a, b, c, p). */
  def kneserNeyBigrams(df: org.apache.spark.sql.DataFrame, textCol: String,
                       discount: Double = 0.75, minCount: Long = 1L,
                       k: Int = 100): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0 && discount < 1, s"discount: $discount")
    val t = tokens(lower(col(textCol)))
    val toks = df.select(t.as("__t")).where(size(col("__t")) >= 2)
    val bi = toks
      .select(explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("a"),
                    element_at(col("__t"), i + 1).as("b")))).as("__g"))
      .groupBy(col("__g.a").as("a"), col("__g.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val ctx = bi.groupBy("a").agg(sum("c").as("ca"), count(lit(1)).as("fa"))
    val prec = bi.groupBy("b").agg(count(lit(1)).as("pb"))
    val types = bi.agg(count(lit(1)).as("bt"))
    val scored = bi.where(col("c") >= minCount)
      .join(broadcast(ctx), Seq("a"))
      .join(broadcast(prec), Seq("b"))
      .crossJoin(broadcast(types))
      .select(col("a"), col("b"), col("c"),
        round(
          greatest(col("c") - lit(discount), lit(0.0)) / col("ca") +
            lit(discount) * col("fa") / col("ca") * (col("pb") / col("bt")),
          6).as("p"))
    // bigram-pair-sized table → TakeOrderedAndProject top-k (rankedTopK)
    Batching.rankedTopK(scored, Seq(col("p").desc, col("a"), col("b")), k)
      .select(col("rank"), col("a"), col("b"), col("c"), col("p"))
  }

  /** BM25 top-k retrieval over the corpus for a fixed set of keyword
    * queries — the LEXICAL retrieval baseline beside the embedding ANN
    * stack (eval-set mining, dedup audits, RAG ground truth all start
    * here). Okapi BM25 with the Lucene idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` (always ≥ 0) and the standard
    * tf saturation `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Ranking is on the ROUNDED (6 dp) score with id tiebreak — the
    * [[topTfIdfTerms]] reproducibility convention. Returns
    * (qid, rank, id, score).
    *
    * Plan at scale: one (id, term) count shuffle builds tf + dl; df
    * reuses the tf frame with a map-side partial aggregate; the query
    * term list is a literal BROADCAST join (an inverted-index probe —
    * the corpus never shuffles to meet the queries); one (qid, id) sum
    * and a per-query top-k window (|queries| partitions, each bounded
    * by the matching-doc count) finish it. N and avgdl ride a 1-row
    * broadcast denominator. */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty && k > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum("tf").as("dl"))
    val stats = df.select(col(idCol).as("id"))
      .join(dl, Seq("id"), "left")
      .select(count(lit(1)).as("n"),
        avg(coalesce(col("dl"), lit(0L))).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("id"))
      .join(broadcast(dfreq.join(broadcast(qterms.select("term").distinct()), Seq("term"))),
        Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("s"))
    val sums = scored.groupBy("qid", "id")
      .agg(round(sum("s"), 6).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    sums.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** CROSS-CLASS verbatim-overlap matrix — which sources share literal
    * passages (the inter-source contamination / syndication audit; the
    * class-level sibling of [[decontaminate]]'s doc-vs-benchmark
    * check): for every class pair, the number of distinct word
    * `n`-grams both emit, plus that count as a fraction of the
    * smaller class's gram inventory (containment, so a small feed
    * syndicated into a big one still scores high).
    *
    * Shape at scale: grams DISTINCT per class first (inventory-sized,
    * not corpus-sized), then ONE gram-keyed self-join whose fan-out is
    * bounded by classes-per-gram (≤ |classes|, usually ~1), never a
    * class-pair product over the corpus. Returns
    * (class_a < class_b, shared_grams, grams_a, grams_b,
    * containment 6 dp). */
  def crossClassOverlap(df: org.apache.spark.sql.DataFrame, classCol: String,
                        textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n: $n")
    classGramPairCounts(df, classCol, textCol, n)
      .select(col("class_a"), col("class_b"), col("shared_grams"),
        col("grams_a"), col("grams_b"),
        round(col("shared_grams").cast("double") /
          least(col("grams_a"), col("grams_b")).cast("double"), 6).as("containment"))
  }

  /** COMPRESSION-RATIO quality signal (the Gopher / RefinedWeb
    * repetitiveness proxy): deflate(text) length ÷ UTF-8 byte length —
    * boilerplate, keyboard mash, and template spam compress far below
    * natural prose, so a band filter on the ratio is a cheap
    * model-free quality gate complementing [[repeatedTokenFraction]]
    * (which only sees token-level repeats, not byte-level structure).
    *
    * No SQL engine exposes deflate, so this is a SPEC-TIER operator
    * (monotonicity + determinism laws; the catalog entry is
    * rows-only). Runs in the [[Multimodal.decodePartitioned]]-style
    * partition seam: ONE Deflater per partition, reset per row (the
    * allocation cost amortizes; payloads never shuffle — the ratio
    * projects out of the scan). Level is pinned (default 6) because
    * the ratio is only comparable within one deflate parameterization.
    * Returns (id, n_bytes, n_deflate, ratio 6 dp; empty text → ratio
    * null). */
  def compressionRatio(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, level: Int = 6): org.apache.spark.sql.DataFrame = {
    require(level >= 1 && level <= 9, s"level: $level")
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level, /*nowrap=*/ true)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val bytes =
            if (text == null) Array.empty[Byte]
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, bytes.length.toLong, n)
        }
      }
      .toDF("id", "n_bytes", "n_deflate")
    out.select(col("id"), col("n_bytes"), col("n_deflate"),
      when(col("n_bytes") === 0, lit(null).cast("double"))
        .otherwise(round(col("n_deflate").cast("double") / col("n_bytes"), 6))
        .as("ratio"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.native

/**
 * Deduplication operators for training-data pipelines, in increasing
 * order of fuzziness:
 *
 *  - exact (normalized content hash → groupBy)
 *  - n-gram Jaccard (exact set similarity via a shingle inverted index)
 *  - MinHash + LSH banding (the 100 TB-scale path: candidate generation
 *    is a bucket join on band hashes; only candidates pay the exact
 *    verification cost)
 *  - SimHash (64-bit, Hamming-banded)
 *
 * Scale notes: `jaccardPairs` is exact but its shingle self-join is
 * quadratic in per-shingle document frequency — use it to verify, use
 * `minhashLshPairs` to discover, or `jaccardPairsPrefix` for an EXACT
 * join on Zipf-tailed corpora (PPJoin prefix filtering keeps frequent
 * shingles out of the self-join). All signatures are pure Column algebra
 * over engine-native xxhash64: no UDFs, no driver-side loops, and every
 * join key (band, hash) is a shuffle-friendly scalar.
 */
object Dedup {

  import TextAnalysis.normText

  /** Normalized content hash for exact duplicate detection. */
  def contentHash(text: Column): Column = md5(normText(text))

  /** One row per distinct content: (content_hash, n_copies, keep_id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Keep the lowest-id row of each exact-duplicate group.
    * Single hash-shuffle AND sortless (r13): min_by over the packed row
    * with the unique id as the ordering key is a hash aggregate with
    * map-side partial combine — the previous row_number window paid a
    * full per-partition sort of the corpus to keep one row per group.
    * Deterministic survivor (ids are unique), unlike `dropDuplicates`.
    * The ordering key is struct(id), not the bare id (ADVICE r13,
    * Dedup.scala:47): min_by SKIPS rows whose ordering key is NULL, so
    * a bare-id key made an all-null-id group yield a row of nulls and
    * null-id rows never win — struct(null) is non-null and its field
    * comparison is NULLS FIRST ascending, the window's exact order. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("__h"))
      .agg(min_by(struct(df.columns.map(col): _*), struct(col(idCol))).as("__row"))
      .select(col("__row.*"))

  /** Content-hash INDEX of a corpus: one narrow row per distinct
    * normalized content — the only state incremental dedup carries
    * between increments (persist/load it like the ANN indexes: a
    * parquet round-trip of md5 strings is exact). */
  def hashIndex(df: DataFrame, textCol: String): DataFrame =
    df.select(contentHash(col(textCol)).as("content_hash")).distinct()

  /** INCREMENTAL exact dedup: dedup a new DELTA batch against an
    * existing corpus using only its [[hashIndex]] — the production shape
    * for a continuously-growing corpus, where re-deduping 100 TB of
    * history per increment is not on the table. A delta row survives iff
    * its content is novel to the index AND it is the keep-one (minimum
    * id) copy within the delta itself. Cost tracks the DELTA: one
    * left_anti join on the hash (the index side is narrow — AQE
    * broadcasts it while it fits, shuffles it when the corpus has grown
    * past that) + one keep-one window over delta-only groups. Feed the
    * survivors through [[extendHashIndex]] for the next increment. */
  def dedupDeltaAgainstIndex(delta: DataFrame, idCol: String, textCol: String,
                             index: DataFrame): DataFrame = {
    val hashed = delta.withColumn("content_hash", contentHash(col(textCol)))
    // null-SAFE anti-join: a null-text doc hashes to null, and a plain
    // anti-join would let one survive EVERY increment (null never
    // equals null) — inconsistent with batch exactGroups, which groups
    // null hashes like any other key
    val novel = hashed.join(index.select(col("content_hash").as("__idx_hash")),
      col("content_hash") <=> col("__idx_hash"), "left_anti")
    // keep-one as a sortless hash aggregate (r13, same rewrite as
    // dropExactDuplicates, incl. the r14 struct(id) null-safe ordering
    // key) — delta-sized, but increments run forever
    novel.groupBy(col("content_hash").as("__h"))
      .agg(min_by(struct(novel.columns.map(col): _*), struct(col(idCol))).as("__row"))
      .select(col("__row.*"))
  }

  /** The index after an increment: previous index ∪ the survivors'
    * hashes (already distinct by keep-one construction). */
  def extendHashIndex(index: DataFrame, survivors: DataFrame): DataFrame =
    index.select("content_hash")
      .unionByName(survivors.select("content_hash")).distinct()

  /** PASSAGE-level duplication audit: chunk each document into fixed
    * non-overlapping token windows ([[TextAnalysis.chunkText]]), normalize
    * each chunk, and count — per document — the chunks whose text also
    * occurs elsewhere in the corpus AND whose occurrence is not the
    * canonical (lexicographically minimum (id, chunk_id)) copy. `dup_frac`
    * is exactly the fraction a keep-one passage-dedup pass would cut —
    * the doc-level statistic repetition filters threshold on.
    * Output: (id, n_chunks, n_dup, dup_frac).
    *
    * Shape at 100 TB: chunks explode inside the scan; ONE map-side-
    * combined aggregate per normalized chunk (count + lexicographic-min
    * keeper via min(struct)); the join back shuffles on the chunk text
    * (AQE handles hot boilerplate chunks); one doc-keyed aggregate
    * closes. No driver-side state. */
  def passageDupStats(df: DataFrame, idCol: String, textCol: String,
                      chunkTokens: Int): DataFrame = {
    val ch = TextAnalysis.chunkText(df, idCol, textCol, chunkTokens, overlap = 0)
      .withColumn("norm", normText(col("chunk_text")))
    val groups = ch.groupBy("norm").agg(count(lit(1)).as("n_occ"),
      min(struct(col("id"), col("chunk_id"))).as("__keep"))
    ch.join(groups, "norm")
      .withColumn("__dup", col("n_occ") > 1 &&
        !(col("__keep.id") === col("id") && col("__keep.chunk_id") === col("chunk_id")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_chunks"), 6))
  }

  // -- duplicated-substring spans (ExactSubstr) ---------------------------

  /**
   * Token spans covered by any word n-gram occurring MORE THAN ONCE in
   * the corpus (within or across documents), merged into maximal
   * per-document spans — the fixed-gram-length equivalent of Lee et
   * al. 2021's suffix-array ExactSubstr deduplication: a span flagged
   * here is text a trainer should cut or down-weight.
   *
   * Returns (id, span_start, span_end, n_grams): 0-based token indices,
   * inclusive; `n_grams` counts the duplicated grams merged into the span.
   *
   * Shape at 100 TB: explode to (doc, pos, gram) in the scan; ONE
   * map-side-combined aggregate keeps grams seen ≥2 times; the join back
   * shuffles on the gram key (both sides big — a genuine shuffle join,
   * like the paper's sort over all suffixes); the interval merge is a
   * per-doc window over only the SURVIVING positions (documents are small
   * groups, and fixed n makes the merge a lag-gap island scan — no
   * running-interval state). The dup key is `xxhash64(gram)` — the
   * output exposes only positions, so the 64-bit hash keeps the shuffle
   * narrow with no observable difference short of a corpus-wide hash
   * collision (~m²/2⁶⁵).
   */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // tokens materialize into an attribute FIRST (ngramsFromTokens rule):
    // the gram subplan is evaluated on BOTH sides of the dup self-join,
    // and inlining the tokenizer into the per-element lambda re-splits
    // the text once per element reference (measured 2×28 s vs 1.4 s at
    // sf0.1 for the same 235k grams)
    val toked = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(lower(col(textCol))).as("__t"))
    val grams = toked.select(col("id"),
        posexplode(TextAnalysis.ngramsFromTokens(col("__t"), n)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), xxhash64(col("g")).as("gh"))
    val dup = grams.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select(col("gh"))
    val hitPos = grams.join(dup, "gh").select(col("id"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val islands = hitPos
      .withColumn("__gap",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= n, 0L).otherwise(1L))
      .withColumn("__island", sum(col("__gap")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + n - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("__island")
  }

  /**
   * The dedup ACTION for [[duplicatedSpans]]: re-emit each document's
   * normalized token stream with every duplicated span cut out (Lee et
   * al. 2021 §4 removes the repeated substring occurrences themselves).
   * Returns (id, clean_text, n_kept, n_removed); text is the
   * lowercased/whitespace-normalized stream — span dedup operates on
   * the normalized representation.
   *
   * The spans side aggregates to one small row per affected doc
   * (documents have few spans), so the join back adds one id-keyed
   * shuffle; the token filter is per-row array algebra.
   */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, n)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toked = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(lower(col(textCol))).as("__t"))
    toked.join(spans, Seq("id"), "left")
      .select(col("id"),
        when(col("__spans").isNull, col("__t"))
          .otherwise(filter(col("__t"), (_, i) =>
            !exists(col("__spans"), sp =>
              i >= sp.getField("span_start") && i <= sp.getField("span_end"))))
          .as("__kept"), size(col("__t")).as("__total"))
      .select(col("id"), concat_ws(" ", col("__kept")).as("clean_text"),
        size(col("__kept")).cast("long").as("n_kept"),
        (col("__total") - size(col("__kept"))).cast("long").as("n_removed"))
  }

  // -- word n-gram shingles ----------------------------------------------

  /** LATEST-BY-KEY compaction — the CDC/upsert-feed dedup: from a
    * stream of row versions keep each key's most recent one (highest
    * event time, ties broken by the highest `tieCol` — a sequence
    * number or file offset — so the survivor is deterministic even
    * when a producer emits two versions in the same instant).
    * ONE struct-ordered max aggregate per key (lexicographic struct
    * comparison gives ts-then-tie argmax with partial aggregation —
    * the map side combines before the shuffle; a row_number window
    * would buffer each key's history instead). The batch compaction
    * step of every log-ingestion pipeline. */
  def latestByKey(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String): DataFrame = {
    val others = df.columns.filter(c => c != keyCol).toSeq
    df.groupBy(col(keyCol))
      .agg(max(struct((Seq(tsCol, tieCol) ++
        others.filterNot(Seq(tsCol, tieCol).contains)).map(col): _*)).as("__r"))
      .select(col(keyCol) +: others.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Exact EDIT-DISTANCE similarity join via deletion neighborhoods
    * (the SymSpell principle, Garbe 2012; also FastSS, Bocek et al.
    * 2007): two strings with levenshtein(a, b) ≤ k always share at
    * least one member of their ≤k-deletion neighborhoods, so
    * candidates come from ONE equi-join on deletion-variant keys —
    * O(len^k) variants per string (len+1 for k=1), never a quadratic
    * pair scan — and only candidates pay the exact levenshtein
    * verification. The recall is EXACT, not probabilistic: a
    * substitution deletes the differing position from both sides, an
    * insert/delete deletes the inserted char from the longer side.
    * The key string join for entity resolution / near-identical title
    * dedup in curation pipelines. Returns (id_a, id_b, dist) with
    * id_a < id_b; null strings produce no pairs.
    *
    * Shape at 100 TB: the variant explode happens inside the scan
    * stage; the self-join shuffles (variant, id, string) keyed on the
    * short variant string; verification is a codegen'd levenshtein on
    * candidates only. For hot variant keys (shared short strings) the
    * candidate set is the true near-dup cluster — cost tracks real
    * duplication, exactly like the LSH band join. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxEdits: Int = 1): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2, s"maxEdits: $maxEdits")
    val dels = udf((s: String) => {
      if (s == null) Seq.empty[String]
      else {
        val out = scala.collection.mutable.LinkedHashSet[String](s)
        var frontier = Set(s)
        var r = 0
        while (r < maxEdits) {
          frontier = frontier.flatMap(t =>
            (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1)))
          out ++= frontier
          r += 1
        }
        out.toSeq
      }
    })
    val keyed = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__v", explode(dels(col("__s"))))
    val cands = keyed.as("a").join(keyed.as("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("a.__s").as("s_a"),
        col("b.__id").as("id_b"), col("b.__s").as("s_b"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= maxEdits)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Distinct word n-gram shingles of the text as an array column. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Sorted-distinct word n-gram shingle HASHES — the discovery-path
    * representation: no shingle strings are materialized (native
    * [[graft.functions.ShingleHashes]]), set ops run on longs. Set
    * sizes/intersections are identical to [[wordShingles]] modulo
    * 64-bit hash collisions (~m²/2⁶⁵ — negligible). */
  def shingleHashes(text: Column, n: Int): Column =
    native.shingleHashes(TextAnalysis.tokens(text), n)

  /** Character k-gram shingle hashes over the normalized text — the
    * native direct-over-string kernel (a k-chain of per-code-point
    * hashes ≡ a char k-gram hash; value-identical to the former
    * split-into-1-char-tokens form, law-pinned in OpsSpec). */
  def charShingleHashes(text: Column, k: Int): Column =
    native.charShingleHashes(normText(text), k)

  /** Character k-gram shingles (for short/no-whitespace text). */
  def charShingles(text: Column, k: Int): Column = {
    val s = normText(text)
    when(length(s) >= k,
      array_distinct(transform(sequence(lit(1), length(s) - (k - 1)),
        i => s.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  // -- exact n-gram Jaccard ----------------------------------------------

  /** All pairs (id_a < id_b) with shingle-set Jaccard >= threshold.
    * Exact: inverted index on shingle → per-pair common counts → sizes.
    * The per-shingle join fan-out is docFreq² — verification-grade, not
    * discovery-grade; see [[minhashLshPairs]] for the scale path. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame =
    jaccardPairsBy(df, idCol, shingleHashes(col(textCol), n), threshold)

  /** Char-k-gram flavor (robust to tokenization; for CJK/no-whitespace). */
  def jaccardPairsChar(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 5, threshold: Double = 0.6): DataFrame =
    jaccardPairsBy(df, idCol, charShingleHashes(col(textCol), k), threshold)

  private def jaccardPairsBy(df: DataFrame, idCol: String, shingles: Column,
                             threshold: Double): DataFrame = {
    // set size computed on the array BEFORE exploding — carried through
    // the explode for free instead of shuffling a sizes join back on
    val arr = df.select(col(idCol).as("id"), shingles.as("arr"))
      .withColumn("sz", size(col("arr")).cast("long"))
    val sh = arr.select(col("id"), col("sz"), explode(col("arr")).as("sh"))
    val sizes = arr.select(col("id"), col("sz"))
    // size-ratio bound: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs whose
    // set sizes differ by more than the threshold ratio cannot qualify —
    // pruned INSIDE the join, before the per-pair count shuffle (lossless;
    // the classic length filter of exact set-similarity joins)
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** CONTAINMENT similarity join (Broder 1997's asymmetric companion
    * to resemblance): c(A→B) = |A∩B| / |A| — the measure that catches
    * a SMALL document contained in a big one (quote extraction,
    * article-in-digest, chunk-of-corpus), which Jaccard structurally
    * cannot (J ≤ |A|/|B| vanishes as sizes diverge). Keeps pairs whose
    * larger-direction containment meets `threshold`. Same inverted-
    * index shape as [[jaccardPairs]] but deliberately NO size-ratio
    * prune — asymmetric pairs are exactly the point. Returns
    * (id_a, id_b, sz_a, sz_b, common, c_ab, c_ba). Verification-grade
    * fan-out (per-shingle docFreq²); for discovery over a Zipf corpus
    * run [[minhashLshPairs]] first and verify candidates here. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9): DataFrame = {
    val arr = df.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("arr"))
      .withColumn("sz", size(col("arr")).cast("long"))
    val sh = arr.select(col("id"), col("sz"), explode(col("arr")).as("sh"))
    val sizes = arr.select(col("id"), col("sz"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("c_ab", col("common").cast("double") / col("sz_a"))
      .withColumn("c_ba", col("common").cast("double") / col("sz_b"))
      .where(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        col("common"), col("c_ab"), col("c_ba"))
  }

  /** [[jaccardPairs]] via PREFIX FILTERING (Chaudhuri/Ganti/Kaushik
    * SSJoin 2006; Xiao et al. PPJoin 2008) — the exact-join shape for
    * ZIPFIAN corpora: under any global token order, J(A,B) ≥ t forces
    * |A∩B| ≥ t·|A| (|A∩B| ≥ t/(1+t)·(|A|+|B|) and |B| ≥ t·|A| by the
    * length filter), so qualifying docs must share a token among each
    * one's FIRST |d| − ⌈t·|d|⌉ + 1 tokens. Ordering rarest-first makes
    * those prefix tokens the low-docFreq ones, so the high-docFreq
    * shingles whose docFreq² fan-out dominates [[jaccardPairs]]'s full
    * inverted index never enter the self-join; survivors verify with one
    * exact array_intersect per candidate. Costs two extra narrow
    * shuffles (docFreq aggregate + per-doc rarity sort), which real
    * Zipf-tailed corpora repay and this repo's flat synthetic vocabulary
    * does not. This is the tier the bench runs (q_dedup_jaccard); the
    * naive inverted index stays oracle-gated under the SAME oracle as
    * q_dedup_jaccard_naive (bench-excluded), so the driver gate itself
    * proves the two exact tiers equivalent. */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.5): DataFrame =
    jaccardPairsPrefixBy(df, idCol, shingleHashes(col(textCol), n), threshold)

  /** Char-k-gram flavor of [[jaccardPairsPrefix]]. */
  def jaccardPairsCharPrefix(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 5, threshold: Double = 0.6): DataFrame =
    jaccardPairsPrefixBy(df, idCol, charShingleHashes(col(textCol), k), threshold)

  private def jaccardPairsPrefixBy(df: DataFrame, idCol: String, shingles: Column,
                                   threshold: Double): DataFrame = {
    val arr = df.select(col(idCol).as("id"), shingles.as("arr"))
      .withColumn("sz", size(col("arr")).cast("long"))
    val sh = arr.select(col("id"), col("sz"), explode(col("arr")).as("sh"))
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val pref = sh.join(freq, "sh")
      .groupBy(col("id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ordered"))
      .select(col("id"), col("sz"),
        posexplode(slice(col("ordered"), lit(1), prefLen)).as(Seq("pos", "p")))
      .select(col("id"), col("sz"), col("pos"), col("p.sh").as("sh"))
    // POSITIONAL filter (PPJoin proper, Xiao et al. 2008 §3.2): a match
    // at 0-based rarity-order positions (i, j) bounds the pair's total
    // overlap by 1 + min(sz_a−i−1, sz_b−j−1) — valid here in OR-across-
    // matches form because both lists share ONE global rarity order, so
    // the pair's globally-first common shingle (which the prefix
    // property puts inside both prefixes) has every other common
    // shingle after it on BOTH sides, making its bound ≥ the true
    // overlap ≥ α = ceil(t/(1+t)·(sz_a+sz_b)); the distinct() keeps a
    // pair if ANY match passes, so true pairs always survive and only
    // candidate fan-out is pruned before the exact verification.
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz")))
    val ubound = lit(1) +
      least(col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
    val cand = pref.as("a").join(pref.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz") &&
          ubound >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verification per surviving candidate: one allocation-free
    // two-pointer sweep over the sorted-distinct hash sets (native
    // SortedIntersectCount — ShingleHashes emits them sorted), no
    // per-shingle count shuffle
    cand
      .join(arr.select(col("id").as("id_a"), col("arr").as("arr_a"),
        col("sz").as("sz_a")), "id_a")
      .join(arr.select(col("id").as("id_b"), col("arr").as("arr_b"),
        col("sz").as("sz_b")), "id_b")
      .withColumn("common", native.sortedIntersectCount(col("arr_a"), col("arr_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -- MinHash + LSH ------------------------------------------------------

  /** Same prime as Spark MLlib's MinHashLSH: keeps a*(h+1)+b within Long. */
  val MinhashPrime = 2038074743L

  /** Deterministic (a,b) coefficient pairs for the hash family. */
  def hashCoeffs(num: Int, seed: Long = 77L): (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val as = Array.fill(num)(1L + r.nextInt((MinhashPrime - 1).toInt))
    val bs = Array.fill(num)(r.nextInt(MinhashPrime.toInt).toLong)
    (as, bs)
  }

  /** MinHash signature (array<long> of length numHashes) over a distinct
    * shingle array; empty shingle set → null. One xxhash64 per shingle,
    * then a native codegen'd kernel for the numHashes×|shingles| sweep
    * (see graft.functions.MinHashSigExpr). */
  def minhashSignature(shingles: Column, numHashes: Int = 128): Column =
    native.minhashSig(transform(shingles, s => xxhash64(s)), numHashes, seed = 77L)

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes.toDouble

  /**
   * MinHash-LSH near-duplicate pairs, verified.
   *
   * 1. signature per doc (map-only)
   * 2. band hashes: `bands` keys of `numHashes/bands` rows each; candidate
   *    pairs meet in ≥1 bucket — the only shuffle is on (band, bandHash)
   * 3. exact Jaccard verification on candidates via array_intersect
   *
   * With 128 hashes / 32 bands (r=4), a pair at j=0.8 is missed with
   * probability (1-0.8⁴)³² ≈ 5e-8 — discovery-grade recall, linear cost.
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                      threshold: Double = 0.5): DataFrame =
    minhashLshPairsBy(df, idCol, shingleHashes(col(textCol), n), numHashes, bands, threshold)

  /** Char k-gram flavor — use this (NOT the exact inverted index) when
    * shingle document frequency is high: char shingles on a small
    * vocabulary are shared by most documents, making `jaccardPairsChar`'s
    * per-shingle join fan-out quadratic; LSH candidates stay linear.
    * Defaults use r=6 rows/band: char-shingle BACKGROUND similarity is
    * much higher than word-shingle (~0.3 here), so candidate noise scales
    * with j_background^r — r=6 keeps it ~100× below r=4 while a true
    * near-dup at j≥0.9 is still found with P ≈ 1-1e-9. */
  def minhashLshPairsChar(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 5, numHashes: Int = 120, bands: Int = 20,
                          threshold: Double = 0.6): DataFrame =
    minhashLshPairsBy(df, idCol, charShingleHashes(col(textCol), k), numHashes, bands, threshold)

  /** MEASURED DEAD-ENDS (round 5, sf0.1, do not retry without new data):
    * (a) restricting verification to candidate docs via a semi-join on
    * ids re-executes the whole discovery pipeline (cand feeds two
    * subtrees; ReuseExchange does not fire across the shapes) — warm
    * 3.2→4.5 s even with the pair list pinned; (b) pinning the
    * (id, shingle-set) projection so all three branches share one cache
    * loses scan fusion and pays a ~60 MB cache write — cold 3.8→9.5 s.
    * The 3×-projection shape below recomputes shingles inside fused
    * scans, which is cheaper than either alternative on this kernel. */
  /** (id, band, bh) band-hash rows from an (id, sh) shingle-hash frame —
    * the narrow banding step shared by the batch pair miners and the
    * incremental index. */
  private def bandedSignatures(docs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    docs.withColumn("sig", native.minhashSig(col("sh"), numHashes, 77L))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), j =>
          struct(j.as("band"), xxhash64(slice(col("sig"), j * r + 1, lit(r))).as("bh")))).as("b"))
      .select(col("id"), col("b.band"), col("b.bh"))
  }

  /** (id, sh) word-`n`-gram shingle-hash sets — the verification-side
    * state of the incremental LSH index (parquet round-trips the long
    * arrays exactly). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)

  /** (id, band, bh) LSH band index of a corpus — with [[shingleSets]],
    * the complete state incremental NEAR-dup carries between increments
    * (both persist as parquet; band rows are 3 scalars/row × bands). */
  def lshBandIndex(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                   numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    bandedSignatures(shingleSets(df, idCol, textCol, n), numHashes, bands)
  }

  /** INCREMENTAL near-dup: verified near-duplicate matches of a new
    * DELTA batch against a corpus carried only as its LSH index
    * ([[lshBandIndex]] + [[shingleSets]]) — the near-dup sibling of
    * [[dedupDeltaAgainstIndex]], same production shape: per increment,
    * history contributes index rows, never a re-scan of its text.
    *
    * Returns (delta_id, match_id, jaccard): every delta doc's verified
    * matches at `threshold`, where a match is any indexed doc or an
    * EARLIER (smaller-id) delta doc. Delta docs with no row survive;
    * extend the index with the survivors' band/shingle rows for the next
    * increment. Candidates meet in ≥1 band bucket (one (band, bh)
    * shuffle over index ∪ delta bands); only candidates pay the exact
    * shingle-intersection verification, via the STORED shingle sets. */
  def nearDupDeltaLsh(delta: DataFrame, idCol: String, textCol: String,
                      indexBands: DataFrame, indexShingles: DataFrame,
                      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val dDocs = shingleSets(delta, idCol, textCol, n)
    val dBands = bandedSignatures(dDocs, numHashes, bands).withColumn("src", lit("delta"))
    val allBands = indexBands.select("id", "band", "bh").withColumn("src", lit("idx"))
      .unionByName(dBands)
    val cand = dBands.as("a").join(allBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          (col("b.src") === "idx" || col("b.id") < col("a.id")))
      .select(col("a.id").as("delta_id"), col("b.id").as("match_id"))
      .dropDuplicates("delta_id", "match_id")
    val allSh = indexShingles.select("id", "sh").unionByName(dDocs)
    cand
      .join(allSh.select(col("id").as("delta_id"), col("sh").as("sh_a")), "delta_id")
      .join(allSh.select(col("id").as("match_id"), col("sh").as("sh_b")), "match_id")
      .withColumn("common", native.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("delta_id"), col("match_id"), col("jaccard"))
  }

  private def minhashLshPairsBy(df: DataFrame, idCol: String, shingles: Column,
                                numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val docs = df.select(col(idCol).as("id"), shingles.as("sh"))
      .where(size(col("sh")) > 0)

    // banding stays NARROW (id, band, bh): the ×bands explosion and the
    // candidate shuffle never carry the shingle arrays
    val banded = bandedSignatures(docs, numHashes, bands)

    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("common", native.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 vote of each
    * token's xxhash64, sign → bit. Native codegen'd kernel
    * (see graft.functions.SimHash64Expr). */
  def simhash64(text: Column): Column =
    native.simhash(transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  def hammingDist(a: Column, b: Column): Column =
    length(regexp_replace(bin(a.bitwiseXOR(b)), "0", "")).cast("int")

  /**
   * SimHash near-duplicate pairs with Hamming distance <= maxHamming.
   * Banding: `bands` chunks of 64/bands bits; by pigeonhole any pair
   * within Hamming bands-1 agrees on ≥1 chunk, so recall is exact for
   * maxHamming <= bands-1. More bands = stronger recall guarantee but
   * more candidate noise (smaller band keys collide more) — the default
   * 4×16 suits discovery; 8×8 buys a ≤7 guarantee for verification.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame =
    hammingPairs64(df.select(col(idCol), simhash64(col(textCol)).as("__h64")),
      idCol, "__h64", maxHamming, bands)

  /** Near-dup pairs of ANY 64-bit locality-sensitive hash column
    * (SimHash text sketches, aHash image sketches, …) with Hamming
    * distance <= maxHamming — the banding engine [[simhashPairs]] is
    * built on, exposed generically. Same pigeonhole guarantee: recall
    * is exact for maxHamming <= bands-1. */
  def hammingPairs64(df: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64: $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val docs = df.select(col(idCol).as("id"), col(hashCol).as("sh"))
    val banded = docs.select(col("id"), col("sh"),
      explode(array((0 until bands).map(j => struct(lit(j).as("band"),
        shiftrightunsigned(col("sh"), width * j).bitwiseAND(lit(mask)).as("key"))): _*)).as("b"))
      .select(col("id"), col("sh"), col("b.band"), col("b.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDist(col("a.sh"), col("b.sh")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  // -- duplicate-cluster resolution (connected components) ----------------

  /**
   * Distributed connected components over a pair list — the cluster-
   * resolution step after near-dup DISCOVERY: pair lists from
   * [[minhashLshPairs]]/[[simhashPairs]]/[[Similarity.cosinePairsLsh]]
   * are transitively closed into clusters so "keep one per cluster" can
   * drop every duplicate (a pair list alone under-deletes: A~B, B~C
   * without A~C keeps two of the three).
   *
   * Algorithm: alternating large-star / small-star (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC'14) — each
   * round is two hash-shuffles on node ids, and the edge set converges
   * to min-rooted stars in O(log n) rounds REGARDLESS of component
   * diameter (naive min-label propagation needs O(diameter) rounds — a
   * 1M-doc chain would take 1M shuffles). Per round the edge RDD is
   * persisted and the previous round's freed; the convergence probe is a
   * (count, xxhash-sum) checksum — one tiny aggregate, no exceptAll
   * self-join. At 100 TB: every step is a groupBy/join on long node ids
   * (shuffle-friendly scalars), nothing is ever collected to the driver.
   *
   * Returns (node, rep): one row per distinct id in `pairs`, rep = the
   * smallest id of its component (deterministic survivor choice, same
   * convention as [[exactGroups]]'s keep_id).
   *
   * PERSIST LIFECYCLE: the (node, rep) result is materialized EAGERLY
   * into one persisted RDD before returning, and every intermediate pin
   * (the input pair list, each round's edge set) is unpersisted on the
   * way out — downstream actions read the one result RDD and never
   * re-run discovery or the iteration chain. At most ONE result stays
   * resident per JVM: a one-slot holder unpersists the previous
   * invocation's result when a new one completes, so repeat invocations
   * (benchmarks, notebook re-runs) don't accumulate pinned RDDs. An
   * earlier keep-everything-cached variant showed up in driver benches
   * as warm runs SLOWER than cold across the whole dedup family — LRU
   * churn from accumulated pins.
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 50,
                          /** ≤ this many distinct edges AND nodes → close the
                            * graph with ONE driver-side union-find instead of
                            * the iterative star rounds. A post-LSH pair list
                            * is millions of edges even at trillion-token
                            * scale (it holds near-DUPLICATES, not the
                            * corpus), so this is the common path — the
                            * published pipelines union-find single-node for
                            * the same reason; the distributed iteration
                            * remains for graphs that outgrow the driver.
                            * 2^20 edges ≈ 16 MB collected. */
                          smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    // canonical directed edges big→small, self-loops dropped; each
    // iteration is pinned as a fresh persisted RDD-backed frame so the
    // logical plan (and fault-recovery lineage) stays one round deep
    // every live pin is tracked so a mid-computation failure (a checksum
    // job dying, the non-convergence throw below) releases them instead
    // of leaving discovery-sized RDDs persisted for the JVM's lifetime —
    // the exact warm-slower-than-cold churn the lifecycle doc promises
    // to prevent must hold on the FAILURE path too (review r9)
    val livePins = new scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
    def unpin(r: org.apache.spark.rdd.RDD[_]): Unit = {
      r.unpersist(blocking = false); livePins -= r
    }
    def pin(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      livePins += r
      (spark.createDataFrame(r, schema), r)
    }
    try {
    // the INPUT pair list is pinned once too: discovery upstream of this
    // operator (an LSH candidate join, a curation filter) is typically
    // the most expensive stage of the whole pipeline, and both the
    // canonical edge set AND the node inventory read it — without the
    // pin, each reads means one full re-run of discovery
    val (base, baseRdd) = pin(pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v")))
    def checksum(df: DataFrame): (Long, Long) = {
      val row = df.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).head()
      (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    }
    // large-star: every node connects its strictly-LARGER neighbors to
    // the min of its closed neighborhood (symmetric view)
    def largeStar(e: DataFrame): DataFrame = {
      val nbr = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      nbr.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    // small-star: every node connects its smaller neighbors AND itself
    // to its minimum neighbor (directed view, u > v throughout)
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(mins, "u").select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    val canonical = base
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    val resSchemaS = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rep", org.apache.spark.sql.types.LongType)))
    val nodesDf = base.select(col("u").as("node"))
      .union(base.select(col("v").as("node"))).distinct()
    // SMALL-GRAPH FAST PATH (see smallGraphThreshold): one bounded
    // collect + union-find-by-min replaces ~log(n) rounds of two
    // shuffles and a blocking probe each — the fixed scheduler overhead
    // of those rounds dominated the entry cost on modest pair lists.
    // Union-by-min (bigger root adopts the smaller) leaves each
    // component's minimum as its own root, reproducing the iterative
    // path's rep convention exactly (equivalence is spec-pinned both
    // ways in OpsSpec).
    if (canonical.count() <= smallGraphThreshold && nodesDf.count() <= smallGraphThreshold) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) x = parent.getOrDefault(x, x)
        var y = x0 // path-compress (iterative: a collected chain is deep)
        while (parent.getOrDefault(y, y) != y) {
          val nxt = parent.getOrDefault(y, y); parent.put(y, x); y = nxt
        }
        x
      }
      canonical.collect().foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val rows = nodesDf.collect().map { r =>
        val n = r.getLong(0)
        org.apache.spark.sql.Row(n, find(n))
      }
      unpin(baseRdd)
      val resRdd = spark.sparkContext.parallelize(rows.toIndexedSeq)
        .persist(StorageLevel.MEMORY_AND_DISK)
      livePins += resRdd
      resRdd.count()
      livePins -= resRdd
      val prevSmall = ccResultSlot.getAndSet(resRdd)
      if (prevSmall != null && (prevSmall ne resRdd)) prevSmall.unpersist()
      return spark.createDataFrame(resRdd, resSchemaS)
    }
    var (cur, curRdd) = pin(canonical)
    var sig = checksum(cur)
    var it = 0
    var converged = false
    // checksum probes run every SECOND round: each probe is a blocking
    // driver action, and ~10 rounds × fixed scheduler overhead dominated
    // the entry's wall time under contention. The star transform is a
    // deterministic contraction with a strictly decreasing potential
    // (Kiveris et al. §4), so state(k) == state(k-2) only at the
    // fixpoint — a two-apart checksum match IS convergence (at most one
    // redundant round runs). Unpersists of unprobed rounds are DEFERRED
    // to the next probe: the probe's materialization is what caches the
    // intermediate pins, and dropping an unmaterialized round's
    // predecessor would cascade recomputation back to discovery.
    var deferred = List.empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    while (!converged && it < maxIter) {
      val (next, nextRdd) = pin(smallStar(largeStar(cur)))
      deferred ::= curRdd
      cur = next; curRdd = nextRdd; it += 1
      if (it % 2 == 0 || it == maxIter) {
        val nextSig = checksum(cur)
        converged = nextSig == sig
        sig = nextSig
        deferred.foreach(unpin); deferred = Nil
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds (${sig._1} edges)")
    // at convergence the edges are min-rooted stars: u → its component's
    // min. Roots themselves have no outgoing edge → rep = self.
    val result = nodesDf
      .join(cur.select(col("u").as("node"), col("v").as("rep")), Seq("node"), "left")
      .select(col("node"), coalesce(col("rep"), col("node")).as("rep"))
    // eager materialization while the input + star pins are still live,
    // then release everything except the one result RDD (slot-bounded
    // across invocations — see the PERSIST LIFECYCLE scaladoc)
    val resRdd = result.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    livePins += resRdd
    resRdd.count()
    livePins -= resRdd
    unpin(baseRdd)
    unpin(curRdd)
    val prev = ccResultSlot.getAndSet(resRdd)
    if (prev != null && (prev ne resRdd)) prev.unpersist()
    spark.createDataFrame(resRdd, resSchemaS)
    } catch { case e: Throwable =>
      livePins.foreach(_.unpersist(blocking = false)); throw e
    }
  }

  /** Release the one-slot [[connectedComponents]] result holder (r13
    * family drains): the slot is NOT a memo cache — every call
    * recomputes and swaps it — so releasing when a bench family
    * finishes costs nothing and frees the persisted cluster map. */
  def releaseCcResult(): Unit =
    Option(ccResultSlot.getAndSet(null)).foreach(_.unpersist(blocking = false))

  /** One-slot holder for the last [[connectedComponents]] result RDD —
    * bounds resident cache to a single live cluster map per JVM. */
  private val ccResultSlot =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]()

  /** One row per duplicate CLUSTER (transitively closed): representative
    * id (min), member count, member list capped at `maxMembers` for
    * inspection — the "keep one per cluster" deletion manifest. */
  def dupClusters(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                  maxMembers: Int = 100): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"),
        slice(sort_array(collect_list(col("node"))), 1, maxMembers).as("members"))

  /** SCD TYPE-2 dimension history from a change feed — the warehouse
    * sibling of [[latestByKey]] (which keeps only the newest version,
    * while analytics joins need WHEN each version held): consecutive
    * same-attribute rows collapse (null-safe struct compare, so
    * null-valued attributes version correctly), each surviving version
    * gets [valid_from, valid_to) from its own timestamp and its
    * successor's, and the open version is flagged current. Two
    * key-partitioned windows (change detection, then interval close)
    * bounded by per-key version counts. Returns
    * (key, attrs…, valid_from, valid_to, is_current). */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, attrs: Seq[String],
           tieBreak: Column): DataFrame = {
    require(attrs.nonEmpty)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), tieBreak)
    val attrStruct = struct(attrs.map(col): _*)
    val changed = df
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .where(col("__prev").isNull || !(attrStruct <=> col("__prev")))
    changed
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select((col(keyCol) +: attrs.map(col)) ++ Seq(
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** QUALITY-PRIORITY survivor selection — keep the BEST member of each
    * near-dup cluster instead of the arbitrary min-id: real curation
    * keeps the longest / highest-quality / most-recent copy
    * (keep-longest is the common near-dup policy), and min-id only
    * encodes ingest order. `clusters` is [[connectedComponents]]'
    * (node, rep) output; rows absent from it are singletons and keep
    * themselves. The argmax is ONE partial-aggregatable struct max per
    * cluster (max score, ties → smallest id) — no per-cluster window,
    * no member collection. Returns (rep, cluster_size, keep_id,
    * keep_score). */
  def keepBestByScore(df: DataFrame, idCol: String, clusters: DataFrame,
                      score: Column): DataFrame = {
    val scored = df.select(col(idCol).cast("long").as("node"), score.as("__score"))
    scored.join(clusters.select(col("node"), col("rep")), Seq("node"), "left")
      .select(col("node"), coalesce(col("rep"), col("node")).as("rep"), col("__score"))
      .groupBy("rep")
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("__score").as("s"), (-col("node")).as("negid"))).as("__best"))
      .select(col("rep"), col("cluster_size"),
        (-col("__best.negid")).as("keep_id"), col("__best.s").as("keep_score"))
  }
}

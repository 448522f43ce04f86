package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vocab-file-driven subword tokenization: classic byte-pair-encoding
 * merges (Sennrich et al. 2016; parses the merges.txt FILE LAYOUT that
 * GPT-2 popularized) and greedy longest-match WordPiece (Schuster &
 * Nakajima 2012; BERT's vocab.txt format with "##" continuations). The
 * regex proxy [[TextAnalysis.bpeTokenCount]] stays as the
 * zero-dependency default.
 *
 * Exactness caveat: counts are exact for vocabularies TRAINED OVER THIS
 * SAME PRE-TOKENIZER (whitespace-discarding, character-initial). GPT-2's
 * own merges.txt additionally assumes its bytes→unicode pre-encoding
 * (the Ġ space marker and byte-level fallback alphabet); without that
 * mapping most of its space-prefixed merge rules never fire, so counts
 * against the actual GPT-2 vocabulary diverge — plug a byte-level
 * pre-encoder in front of [[BpeVocab.encodeWord]] if you need that.
 *
 * The merge loop is inherently per-string imperative, so the column API
 * is a JVM scalar udf over the broadcast vocabulary — one in-memory map
 * probe per merge step, no shuffle, executed inside the scan stage like
 * the rest of the text operators (a Python UDF would serialize every
 * row; a JVM udf does not).
 */
object Tokenizer {

  /** BPE merge table: pair → priority rank (file order). */
  final case class BpeVocab(ranks: Map[(String, String), Int]) {

    /** Merge loop of the original BPE algorithm: repeatedly merge the
      * lowest-rank adjacent pair until none is mergeable. */
    def encodeWord(word: String): Vector[String] = {
      var parts = word.map(_.toString).toVector
      while (parts.length > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) return parts
        val merged = parts(bestIdx) + parts(bestIdx + 1)
        // merge EVERY occurrence of the winning pair in one pass
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == parts(bestIdx) && parts(j + 1) == parts(bestIdx + 1)) {
            b += merged; j += 2
          } else { b += parts(j); j += 1 }
        }
        parts = b.result()
      }
      parts
    }

    def encode(text: String): Seq[String] =
      preTokens(text).flatMap(encodeWord)
  }

  /** WordPiece vocabulary: whole words + "##"-prefixed continuations. */
  final case class WordPieceVocab(vocab: Set[String], unk: String = "[UNK]") {

    /** Greedy longest-match-first; an unmatchable word is a single unk. */
    def encodeWord(word: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var start = 0
      while (start < word.length) {
        var end = word.length
        var found: String = null
        while (end > start && found == null) {
          val piece0 = word.substring(start, end)
          val piece = if (start > 0) "##" + piece0 else piece0
          if (vocab.contains(piece)) found = piece
          else end -= 1
        }
        if (found == null) return Vector(unk)
        out += found
        start = end
      }
      out.result()
    }

    def encode(text: String): Seq[String] =
      preTokens(text).flatMap(encodeWord)
  }

  /** Unigram-LM vocabulary (Kudo 2018, "Subword Regularization" §3 —
    * the SentencePiece unigram model): piece → log-probability.
    * [[encodeWord]] is the Viterbi decode: the segmentation maximizing
    * the sum of piece log-probs over ALL positions — unlike WordPiece's
    * greedy longest-prefix, a high-probability piece is found anywhere
    * in the word ("athe" under singles+{the} → [a, the], where greedy
    * prefix matching yields 4 singles). Ties (equal score) break
    * deterministically: fewer pieces, then the longest final piece. */
  final case class UnigramVocab(logProbs: Map[String, Double],
                                unk: String = "[UNK]") {
    private val maxLen =
      if (logProbs.isEmpty) 1 else logProbs.keysIterator.map(_.length).max

    /** Viterbi over end positions: O(len · maxPieceLen) map probes.
      * A word with any uncovered position is a single `unk` (same
      * whole-word-unk convention as [[WordPieceVocab]]). */
    def encodeWord(word: String): Vector[String] = {
      val n = word.length
      if (n == 0) return Vector.empty
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val nPieces = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1) // start index of the piece ending at i
      score(0) = 0.0
      nPieces(0) = 0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          if (score(j) != Double.NegativeInfinity) {
            logProbs.get(word.substring(j, i)) match {
              case Some(lp) =>
                val s = score(j) + lp
                val np = nPieces(j) + 1
                val better = s > score(i) ||
                  (s == score(i) && (np < nPieces(i) ||
                    (np == nPieces(i) && (back(i) < 0 || j < back(i)))))
                if (better) { score(i) = s; nPieces(i) = np; back(i) = j }
              case None =>
            }
          }
          j += 1
        }
        i += 1
      }
      if (score(n) == Double.NegativeInfinity) return Vector(unk)
      var out = List.empty[String]
      var end = n
      while (end > 0) {
        val start = back(end)
        out = word.substring(start, end) :: out
        end = start
      }
      out.toVector
    }

    def encode(text: String): Seq[String] =
      preTokens(text).flatMap(encodeWord)
  }

  /** GPT-2-style pre-tokenization (same pattern as the regex proxy). */
  private val Pre = TextAnalysis.BpeTokenPattern.r
  def preTokens(text: String): Seq[String] =
    if (text == null) Nil else Pre.findAllIn(text).toSeq

  /** Parse merges.txt content: an optional leading "#version" header, one
    * space-separated pair per line, rank = line order. Only the version
    * header is skipped — merge rules whose tokens START with '#' (e.g.
    * the rule that builds "##") are legitimate content. */
  def parseMerges(lines: IterableOnce[String]): BpeVocab = {
    val it = lines.iterator.map(_.trim).filter(_.nonEmpty).buffered
    if (it.hasNext && it.head.startsWith("#version")) it.next()
    BpeVocab(it.zipWithIndex
      .flatMap { case (l, i) =>
        l.split(' ') match {
          case Array(a, b) => Some((a, b) -> i)
          case _           => None
        }
      }.toMap)
  }

  def loadMerges(path: String): BpeVocab = {
    val src = scala.io.Source.fromFile(path)
    try parseMerges(src.getLines()) finally src.close()
  }

  /** Write a vocab in the same merges.txt layout [[parseMerges]] reads
    * (rank = line order) — the persistence half of [[bpeTrain]]: train
    * once in a batch job, serve the file to every tokenize job. */
  def saveMerges(path: String, vocab: BpeVocab): Unit = {
    val lines = "#version: graft" +:
      vocab.ranks.toSeq.sortBy(_._2).map { case ((a, b), _) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** Parse a SentencePiece-style unigram vocab dump: one
    * `piece<TAB>log_prob` per line (the `spm_export_vocab` layout).
    * Malformed lines are skipped, like [[parseMerges]]. */
  def parseUnigram(lines: IterableOnce[String],
                   unk: String = "[UNK]"): UnigramVocab =
    UnigramVocab(lines.iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { l =>
        l.split('\t') match {
          case Array(p, lp) => scala.util.Try(p -> lp.toDouble).toOption
          case _            => None
        }
      }.toMap, unk)

  def loadUnigram(path: String, unk: String = "[UNK]"): UnigramVocab = {
    val src = scala.io.Source.fromFile(path)
    try parseUnigram(src.getLines(), unk) finally src.close()
  }

  /** vocab.txt: one piece per line (BERT format). */
  def loadWordPiece(path: String, unk: String = "[UNK]"): WordPieceVocab = {
    val src = scala.io.Source.fromFile(path)
    try WordPieceVocab(src.getLines().map(_.trim).filter(_.nonEmpty).toSet, unk)
    finally src.close()
  }

  // -- column API (same shape as TextAnalysis.bpeTokenCount) --------------

  /** Exact BPE token count of `text` under `vocab` (null text → null). */
  def bpeTokenCount(text: Column, vocab: BpeVocab): Column = {
    val f = udf((s: String) => if (s == null) null else java.lang.Long.valueOf(vocab.encode(s).size.toLong))
    f(text)
  }

  /** Exact WordPiece token count of `text` under `vocab` (null → null). */
  def wordPieceTokenCount(text: Column, vocab: WordPieceVocab): Column = {
    val f = udf((s: String) => if (s == null) null else java.lang.Long.valueOf(vocab.encode(s).size.toLong))
    f(text)
  }

  /** Exact Unigram-LM (Viterbi) token count under `vocab` (null → null). */
  def unigramTokenCount(text: Column, vocab: UnigramVocab): Column = {
    val f = udf((s: String) => if (s == null) null else java.lang.Long.valueOf(vocab.encode(s).size.toLong))
    f(text)
  }

  /** Unigram-LM tokens as an array column. */
  def unigramTokens(text: Column, vocab: UnigramVocab): Column = {
    val f = udf((s: String) => if (s == null) null else vocab.encode(s))
    f(text)
  }

  /** BPE tokens as an array column, for downstream shingling/dedup. */
  def bpeTokens(text: Column, vocab: BpeVocab): Column = {
    val f = udf((s: String) => if (s == null) null else vocab.encode(s))
    f(text)
  }

  // -- BPE training (learning merges from a corpus) ------------------------

  import org.apache.spark.sql.DataFrame

  /** Per-document EXACT BPE token counts at corpus scale: explode to
    * pre-tokens, count occurrences per (doc, word), encode each DISTINCT
    * word ONCE, join the piece counts back and take the per-doc weighted
    * sum. Same Zipf trick as [[bpeTrain]]'s [[distinctWords]] — every
    * merge-loop invocation costs per DISTINCT word, not per occurrence,
    * which is the only shape that survives a token-budget pass over a
    * pretraining corpus (per-row re-encoding via [[bpeTokenCount]] pays
    * the O(word²) loop for every occurrence of "the"). Returns
    * (`idCol`, `out`) with [[bpeTokenCount]]'s exact semantics: null
    * text → null, token-free text → 0.
    *
    * PRECONDITION: one row per `idCol` value — the same one-row-per-
    * document contract as [[Batching.packOffsetsFromCounts]]. Duplicate
    * ids would collapse to ONE output row whose count sums across the
    * duplicates (the final distinct is on (id, isnull)), matching
    * neither per-row [[bpeTokenCount]] semantics nor a per-doc
    * contract (ADVICE r7). */
  def bpeTokenCountsByDoc(df: DataFrame, idCol: String, text: Column,
                          vocab: BpeVocab, out: String = "n_tok"): DataFrame = {
    val toks = udf((s: String) => if (s == null) null else preTokens(s))
    val base = df.select(col(idCol).as("__id"), toks(text).as("__w"))
    val perDocWord = base
      .select(col("__id"), explode(col("__w")).as("w"))
      .groupBy(col("__id"), col("w")).agg(count(lit(1)).as("c"))
    val pieces = udf((w: String) => vocab.encodeWord(w).size.toLong)
    val dist = perDocWord.select(col("w")).distinct()
      .withColumn("np", pieces(col("w")))
    val sums = perDocWord.join(dist, "w")
      .groupBy(col("__id")).agg(sum(col("c") * col("np")).as("__n"))
    base.select(col("__id"), col("__w").isNull.as("__isnull")).distinct()
      .join(sums, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        when(col("__isnull"), lit(null)).otherwise(coalesce(col("__n"), lit(0L)))
          .cast("long").as(out))
  }

  /** Distinct pre-token vocabulary with occurrence counts: (w, freq).
    * THE scale trick of corpus BPE training — every later pass costs
    * per-DISTINCT-word, not per-occurrence (Zipf: distinct words are
    * orders of magnitude fewer than tokens at 100 TB). One map-side-
    * combined aggregate. */
  def distinctWords(df: DataFrame, textCol: String): DataFrame = {
    val toks = udf((s: String) => if (s == null) Seq.empty[String] else preTokens(s))
    df.select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
  }

  /** Adjacent-pair frequency table of the corpus under the CURRENT
    * tokenization — the counting kernel of BPE training (Sennrich et
    * al. 2016, "Neural Machine Translation of Rare Words with Subword
    * Units", §3.2): encode each distinct word with the merges learned
    * so far (vocab rides the udf closure — broadcast, no join), explode
    * its adjacent token pairs weighted by word frequency, and aggregate
    * with map-side combine. Returns (a, b, cnt). */
  def pairCounts(words: DataFrame, vocab: BpeVocab): DataFrame = {
    val enc = udf((w: String) => vocab.encodeWord(w))
    words
      .select(enc(col("w")).as("t"), col("freq"))
      .where(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("t")) - 2), i =>
        struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), i + 2).as("b")))).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Viterbi piece-usage counts of the corpus under `vocab` — the
    * E-step counting kernel of unigram-LM training ([[unigramTrain]]),
    * and the unigram sibling of [[pairCounts]]: encode each DISTINCT
    * word once (vocab rides the udf closure — broadcast, no join),
    * explode its Viterbi pieces weighted by word frequency, aggregate
    * with map-side combine. Returns (p, cnt). */
  def unigramPieceCounts(words: DataFrame, vocab: UnigramVocab): DataFrame = {
    val enc = udf((w: String) => vocab.encodeWord(w))
    words.select(explode(enc(col("w"))).as("p"), col("freq"))
      .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
  }

  /** Forward-backward EXPECTED piece counts of one word — the TRUE
    * E-step of Kudo's unigram EM ([[unigramPieceCounts]]'s Viterbi
    * counts are the hard-EM simplification): with α(i) = total
    * probability of all segmentations of the length-i prefix and β(i)
    * of the suffix, the expected count of piece p spanning [j, i) is
    * α(j)·P(p)·β(i) / α(n). Computed in log space (logsumexp over the
    * ≤ maxPieceLen incoming arcs — a 30-char word at logp −10/char
    * underflows raw doubles), fixed iteration order so results are
    * deterministic. Returns (piece → expected count); empty map for a
    * word the vocab cannot segment. Invariant (law-tested):
    * Σ_p E[p]·len(p) = len(word) — every position is covered exactly
    * once in every segmentation. */
  def expectedPieceCounts(word: String, vocab: UnigramVocab): Map[String, Double] = {
    val n = word.length
    if (n == 0) return Map.empty
    val lp = vocab.logProbs
    val maxLen = if (lp.isEmpty) 1 else lp.keysIterator.map(_.length).max
    def lse(xs: Seq[Double]): Double = {
      val m = xs.max
      if (m == Double.NegativeInfinity) m
      else m + math.log(xs.iterator.map(x => math.exp(x - m)).sum)
    }
    val la = Array.fill(n + 1)(Double.NegativeInfinity)
    la(0) = 0.0
    for (i <- 1 to n) {
      val terms = for {
        j <- math.max(0, i - maxLen) until i
        l <- lp.get(word.substring(j, i))
        if la(j) != Double.NegativeInfinity
      } yield la(j) + l
      if (terms.nonEmpty) la(i) = lse(terms)
    }
    if (la(n) == Double.NegativeInfinity) return Map.empty
    val lb = Array.fill(n + 1)(Double.NegativeInfinity)
    lb(n) = 0.0
    for (i <- n - 1 to 0 by -1) {
      val terms = for {
        j <- i + 1 to math.min(n, i + maxLen)
        l <- lp.get(word.substring(i, j))
        if lb(j) != Double.NegativeInfinity
      } yield l + lb(j)
      if (terms.nonEmpty) lb(i) = lse(terms)
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for {
      j <- 0 until n
      i <- j + 1 to math.min(n, j + maxLen)
      l <- lp.get(word.substring(j, i))
      if la(j) != Double.NegativeInfinity && lb(i) != Double.NegativeInfinity
    } {
      val p = word.substring(j, i)
      out(p) = out.getOrElse(p, 0.0) + math.exp(la(j) + l + lb(i) - la(n))
    }
    out.toMap
  }

  /** Corpus-wide expected piece counts (the distributed soft E-step):
    * each DISTINCT word's forward-backward expectations, weighted by
    * word frequency, aggregated map-side. Returns (p, cnt: double). */
  def unigramExpectedCounts(words: DataFrame, vocab: UnigramVocab): DataFrame = {
    val exp = udf((w: String, freq: Long) =>
      expectedPieceCounts(w, vocab).toSeq.map { case (p, c) => (p, c * freq) })
    words.select(explode(exp(col("w"), col("freq"))).as("pc"))
      .select(col("pc._1").as("p"), col("pc._2").as("c"))
      .groupBy(col("p")).agg(sum(col("c")).as("cnt"))
  }

  /** [[unigramTrain]] with the TRUE (forward-backward) E-step — full
    * soft EM instead of Viterbi hard counts: expected counts credit
    * every segmentation in proportion to its probability, so
    * marginally-useful pieces decay smoothly rather than flipping in
    * and out of the argmax path (Kudo 2018 §3.2's actual procedure).
    * Costs one extra O(maxPieceLen) logsumexp per word position; the
    * prune discipline (top-vocabSize by count, chars floored) and the
    * distributed shape match [[unigramTrain]] exactly. Counts are
    * doubles, so ties break (count desc, piece asc) on values that are
    * deterministic but not integer — the hard-EM trainer remains the
    * oracle-checked tier. */
  def unigramTrainEM(df: DataFrame, textCol: String, vocabSize: Int,
                     maxPieceLen: Int = 8, emIters: Int = 2): UnigramVocab = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 1)
    import org.apache.spark.storage.StorageLevel
    val words = distinctWords(df, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val subs = udf((w: String) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPieceLen, w.length - i)
        } yield w.substring(i, i + l))
      val census = words.select(explode(subs(col("w"))).as("p"), col("freq"))
        .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def toVocab(counts: Seq[(String, Double)]): UnigramVocab = {
        val total = math.max(java.lang.Double.MIN_VALUE, counts.map(_._2).sum)
        UnigramVocab(counts.map { case (p, c) =>
          p -> math.log(c / total)
        }.toMap)
      }
      val chars = census.where(length(col("p")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      val multi = census.where(length(col("p")) > 1)
        .orderBy(col("cnt").desc, col("p")).limit(vocabSize * 4)
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      census.unpersist()
      var vocab = toVocab((chars ++ multi).toSeq)
      var iter = 0
      while (iter < emIters) {
        val obs = unigramExpectedCounts(words, vocab)
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
        val cs = chars.map { case (p, _) => p -> math.max(1e-3, obs.getOrElse(p, 0.0)) }
        val ms = obs.toSeq.filter(_._1.length > 1)
        val kept = ms.sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - cs.length))
        vocab = toVocab((cs ++ kept).toSeq)
        iter += 1
      }
      vocab
    } finally words.unpersist()
  }

  /** Learn a unigram-LM vocabulary from a corpus — the SentencePiece
    * unigram model's training loop (Kudo 2018 §3.2), in its Viterbi
    * (hard-EM) form: the E-step counts each piece's usage in the
    * corpus's Viterbi segmentations instead of accumulating full
    * forward-backward expectations (the documented simplification —
    * hard counts converge to the same dominant pieces on natural
    * corpora and keep the E-step a single exact-integer aggregate).
    *
    * Seed = the frequency census of ALL substrings up to `maxPieceLen`
    * (one distributed aggregate over distinct words), capped to a
    * 4×vocabSize working set; each EM round re-estimates log-probs
    * from the count aggregate and prunes back to `vocabSize` pieces
    * (count desc, then lexicographic — fully deterministic given the
    * integer counts). Single characters are always retained, so the
    * learned vocab segments anything the corpus alphabet covers (no
    * UNK on training data). Every distributed pass costs per DISTINCT
    * word (the same Zipf argument as [[bpeTrain]]); the only driver
    * state is the ≤ 4×vocabSize piece table. */
  def unigramTrain(df: DataFrame, textCol: String, vocabSize: Int,
                   maxPieceLen: Int = 8, emIters: Int = 2): UnigramVocab = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 1)
    import org.apache.spark.storage.StorageLevel
    val words = distinctWords(df, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val subs = udf((w: String) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPieceLen, w.length - i)
        } yield w.substring(i, i + l))
      val census = words.select(explode(subs(col("w"))).as("p"), col("freq"))
        .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def toVocab(counts: Seq[(String, Long)]): UnigramVocab = {
        val total = math.max(1L, counts.map(_._2).sum)
        UnigramVocab(counts.map { case (p, c) =>
          p -> math.log(c.toDouble / total)
        }.toMap)
      }
      val chars = census.where(length(col("p")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multi = census.where(length(col("p")) > 1)
        .orderBy(col("cnt").desc, col("p")).limit(vocabSize * 4)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      census.unpersist()
      var vocab = toVocab((chars ++ multi).toSeq)
      var iter = 0
      while (iter < emIters) {
        val obs = unigramPieceCounts(words, vocab)
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // single chars NEVER leave the vocab (coverage guarantee): a
        // char fully absorbed into larger pieces gets a count-1 floor
        // instead of vanishing — Kudo keeps the character alphabet for
        // the same reason
        val cs = chars.map { case (p, _) => p -> math.max(1L, obs.getOrElse(p, 0L)) }
        val ms = obs.toSeq.filter(_._1.length > 1)
        val kept = ms.sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - cs.length))
        vocab = toVocab((cs ++ kept).toSeq)
        iter += 1
      }
      vocab
    } finally words.unpersist()
  }

  /** Learn `nMerges` BPE merge rules from a corpus. Each iteration is
    * ONE distributed pair-count aggregate plus a one-row argmax collect
    * (count desc, then lexicographic — fully deterministic); the chosen
    * rule joins the broadcast vocab for the next pass. Stops early when
    * no pair repeats. The distinct-word table is pinned for the duration
    * of the loop and released before returning — persist scope is
    * contained, nothing stays resident. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): BpeVocab = {
    import org.apache.spark.storage.StorageLevel
    val words = distinctWords(df, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = Map.empty[(String, String), Int]
      var stop = false
      var i = 0
      while (i < nMerges && !stop) {
        val top = pairCounts(words, BpeVocab(ranks))
          .where(col("cnt") >= 2)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) stop = true
        else {
          ranks += ((top(0).getString(0), top(0).getString(1)) -> i)
          i += 1
        }
      }
      BpeVocab(ranks)
    } finally words.unpersist()
  }
}

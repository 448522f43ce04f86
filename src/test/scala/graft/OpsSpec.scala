package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Value-level tests for the training-data pipeline operators on crafted
  * data (the DuckDB oracle covers the testdata tables; these pin the
  * operator semantics on controlled inputs). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark shuffles and partition pruning"),
    (4L, "THE  quick   brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1 modulo case/ws
    (5L, "short text")
  ).toDF("doc_id", "text")

  // -- exact dedup --------------------------------------------------------

  test("exactGroups: case/whitespace-normalized duplicates collapse") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 4) // 1==4, others distinct
    val dup = g.find(_.getLong(1) == 2L).get
    assert(dup.getLong(2) === 1L) // keep_id = min id
  }

  test("dropExactDuplicates keeps lowest id") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 3L, 5L))
  }

  test("duplicatedSpans merges overlapping dup grams into maximal spans") {
    // doc 1 has 14 tokens (indices 0..13, 4-grams starting 0..10); doc 4
    // lower/ws-normalizes to the SAME token stream, so all 11 of doc 1's
    // grams duplicate -> one span [0, 13]. Doc 2 differs only at token 13,
    // so its grams 0..9 duplicate doc 1's -> span [0, 12].
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 4)
      .orderBy("id", "span_start")
      .select("id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans.filter(_._1 == 3L).isEmpty, "unique doc must have no spans")
    assert(spans.filter(_._1 == 5L).isEmpty, "short doc has no 4-grams")
    assert(spans.filter(_._1 == 1L) === Seq((1L, 0L, 13L, 11L)))
    assert(spans.filter(_._1 == 2L) === Seq((2L, 0L, 12L, 10L)))
    assert(spans.filter(_._1 == 4L) === Seq((4L, 0L, 13L, 11L)))
    // within-doc repetition counts too (ExactSubstr semantics), and a gap
    // wider than n splits islands: positions 0 and 5 -> [0,3] and [5,8]
    val selfRep = Seq((9L, "alpha beta gamma delta x alpha beta gamma delta")).toDF("doc_id", "text")
    val s9 = Dedup.duplicatedSpans(selfRep, "doc_id", "text", n = 4)
      .orderBy("span_start")
      .select("span_start", "span_end").as[(Long, Long)].collect().toSeq
    assert(s9 === Seq((0L, 3L), (5L, 8L)), s"self-repeat spans: $s9")
  }

  test("chunkText boundary math: overlap, short docs, exact multiples, empty") {
    import graft.ops.TextAnalysis
    val d = Seq(
      (1L, (0 until 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "a b c"),                                     // shorter than one chunk
      (3L, (0 until 8).map(i => s"u$i").mkString(" ")),  // exactly one chunk
      (4L, (0 until 9).map(i => s"v$i").mkString(" ")),  // one token past
      (5L, "   ")                                        // empty -> no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkText(d, "doc_id", "text", chunkTokens = 8, overlap = 3)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3)) === Seq((0L, 8L), (1L, 8L), (2L, 8L), (3L, 5L)))
    assert(got.filter(_._1 == 1L).last._4 === "t15 t16 t17 t18 t19")
    // consecutive chunks share `overlap` tokens
    val c1 = got.filter(_._1 == 1L).map(_._4.split(" ").toSeq)
    assert(c1(0).takeRight(3) === c1(1).take(3))
    assert(got.filter(_._1 == 2L) === Seq((2L, 0L, 3L, "a b c")))
    assert(got.filter(_._1 == 3L).map(_._2) === Seq(0L), "exact multiple: one chunk only")
    assert(got.filter(_._1 == 4L).map(r => (r._2, r._3)) === Seq((0L, 8L), (1L, 4L)))
    assert(got.filter(_._1 == 5L).isEmpty)
  }

  test("decontaminate flags benchmark sources and their copies, not distinct docs") {
    import graft.ops.TextAnalysis
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "PREFIX alpha beta gamma delta epsilon zeta eta theta SUFFIX"), // embeds doc 1's 8-gram
      (3L, "totally unrelated content with no overlap at all here")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon zeta eta theta")).toDF("btext")
    val got = TextAnalysis.decontaminate(corpus, "doc_id", "text", bench, "btext", 8)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("mixtureTake: quota caps, over-quota keeps whole class, absent class dropped") {
    import graft.ops.Sampling
    val d = (1 to 30).map(i => (i.toLong, if (i <= 20) "big" else if (i <= 27) "mid" else "drop"))
      .toDF("id", "cls")
    val got = Sampling.mixtureTake(d, "cls", "id", Map("big" -> 5L, "mid" -> 100L))
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(got === Map("big" -> 5L, "mid" -> 7L))
    // determinism: same members on rerun
    val m1 = Sampling.mixtureTake(d, "cls", "id", Map("big" -> 5L, "mid" -> 100L))
      .select("id").as[Long].collect().toSet
    val m2 = Sampling.mixtureTake(d.repartition(13), "cls", "id", Map("big" -> 5L, "mid" -> 100L))
      .select("id").as[Long].collect().toSet
    assert(m1 === m2, "membership must be partitioning-independent")
  }

  test("sampleByHash keeps everything at fraction 1.0 and nothing at 0.0") {
    // regression: cut=256 used to format as "100", which sorts below
    // "10".."ff" and silently kept only the 00-0f buckets
    val n = docs.count()
    assert(docs.where(Sampling.sampleByHash(col("text"), 1.0)).count() === n)
    assert(docs.where(Sampling.sampleByHash(col("text"), 0.0)).count() === 0)
  }

  test("decontaminateBloom equals decontaminate (exact confirm kills Bloom FPs)") {
    import spark.implicits._
    // tiny fpp-hostile setup: high fpp forces false positives through the
    // pre-filter, which the confirm join must then discard
    val docsDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta trailing words"),
      (2L, "totally unrelated text with many distinct tokens here now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta copied prefix"))
      .toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("btext")
    val exact = TextAnalysis.decontaminate(docsDf, "doc_id", "text", bench, "btext", 8)
      .select("doc_id", "n_hits", "contaminated").as[(Long, Long, Boolean)].collect().toSet
    val bloom = TextAnalysis.decontaminateBloom(docsDf, "doc_id", "text", bench, "btext", 8,
        fpp = 0.5)
      .select("doc_id", "n_hits", "contaminated").as[(Long, Long, Boolean)].collect().toSet
    assert(bloom === exact)
    assert(exact === Set((1L, 1L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("interleaveByStride: every schedule prefix holds the target mix") {
    import spark.implicits._
    // 12 rows of a, 8 of b, 4 of c at weights 3:2:1 (L=6, strides 2/3/6)
    val rows = (0 until 12).map(i => (i.toLong, "a")) ++
      (100 until 108).map(i => (i.toLong, "b")) ++
      (200 until 204).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "src")
    val out = graft.ops.Sampling.interleaveByStride(df, "src", "id",
        Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
      .orderBy("mix_vt", "src", "id")
      .select("src", "mix_vt").as[(String, Long)].collect()
    assert(out.length === 24)
    // by virtual time T, source s has emitted floor(T / stride_s) rows
    // (until exhausted) — the stride-scheduling invariant
    for (t <- Seq(6L, 12L, 18L, 24L)) {
      val counts = out.filter(_._2 <= t).groupBy(_._1).view.mapValues(_.length).toMap
      assert(counts.getOrElse("a", 0) === math.min(12, t / 2).toInt, s"a at vt<=$t")
      assert(counts.getOrElse("b", 0) === math.min(8, t / 3).toInt, s"b at vt<=$t")
      assert(counts.getOrElse("c", 0) === math.min(4, t / 6).toInt, s"c at vt<=$t")
    }
    // absent source drops; determinism across invocations
    val again = graft.ops.Sampling.interleaveByStride(df, "src", "id",
        Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
      .orderBy("mix_vt", "src", "id")
      .select("src", "mix_vt").as[(String, Long)].collect()
    assert(out.toSeq === again.toSeq)
    // parts whose lcm overflows Long (raw token counts as weights) must
    // fail fast, not produce negative strides silently (review r9)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Sampling.interleaveByStride(df, "src", "id",
        Map("a" -> 3037000499L, "b" -> 3037000507L, "c" -> 982451653L))
    }
    assert(ex.getMessage.contains("overflows"))
  }

  test("Pinned.guard releases pins taken inside a body that throws") {
    import graft.ops.Pinned
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    intercept[RuntimeException] {
      Pinned.guard {
        val (a, _) = Pinned.checkpoint(Seq(1, 2, 3).toDF("x"))
        val (b, bH) = Pinned.checkpoint(a.select(col("x") * 2 as "x"))
        b.count()
        Pinned.release(bH) // released early: guard must not double-free
        throw new RuntimeException("mid-iteration failure")
      }
    }
    // both pins are gone: the released-early one and the leaked one
    assert(spark.sparkContext.getPersistentRDDs.size === before)
    // normal exit releases nothing the body didn't release itself
    val kept = Pinned.guard { Pinned.checkpoint(Seq(1).toDF("x"))._2 }
    assert(spark.sparkContext.getPersistentRDDs.size === before + 1)
    Pinned.release(kept)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("temperature resample: smallest class keeps all rows, head shrinks") {
    val df = (1 to 400).map(i => (i.toLong, s"text $i", if (i <= 320) "big" else "small"))
      .toDF("id", "t", "cls")
    val kept = Sampling.temperatureResample(df, "cls", col("t"))
    val by = kept.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(by("small") === 80L) // cut = 256 -> keep-all
    // big: keep-prob sqrt(80/320) = 0.5 -> cut 128; md5 buckets spread
    // uniformly, so the kept count sits near 160
    assert(by("big") > 120L && by("big") < 200L, s"big kept ${by("big")}")
  }

  test("point-in-interval join equals brute force; spans and bounds inclusive") {
    import graft.ops.RangeJoin
    // intervals span 0-3 buckets at width 10; bounds are inclusive
    val left = Seq((1L, "a", 5L), (2L, "a", 10L), (3L, "a", 29L),
      (4L, "b", 100L), (5L, "c", 7L)).toDF("id", "k", "t")
    val right = Seq((10L, "a", 0L, 10L), (11L, "a", 10L, 35L),
      (12L, "b", 90L, 99L), (13L, "d", 0L, 50L)).toDF("win", "k", "s", "e")
    val got = RangeJoin.pointInInterval(
        left.withColumn("t", col("t").cast("timestamp")),
        right.withColumn("s", col("s").cast("timestamp"))
          .withColumn("e", col("e").cast("timestamp")),
        Seq("k"), "t", "s", "e", bucketSec = 10L)
      .select("id", "win").as[(Long, Long)].collect().toSet
    val want = (for {
      (id, lk, t) <- Seq((1L, "a", 5L), (2L, "a", 10L), (3L, "a", 29L),
        (4L, "b", 100L), (5L, "c", 7L))
      (win, rk, s, e) <- Seq((10L, "a", 0L, 10L), (11L, "a", 10L, 35L),
        (12L, "b", 90L, 99L), (13L, "d", 0L, 50L))
      if lk == rk && t >= s && t <= e
    } yield (id, win)).toSet
    assert(got === want) // (2,10) and (2,11) both match at t=10; 4 matches nothing
    assert(want.contains((2L, 10L)) && want.contains((2L, 11L)))
  }

  test("asof join backward/forward equal the brute-force nearest match") {
    import graft.ops.AsofJoin
    // ties included: left at t=20 must see right at t=20 in BOTH directions
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 35L),
      (4L, "b", 5L), (5L, "b", 50L), (6L, "c", 7L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 5L, 5.0),
      ("b", 60L, 6.0), ("d", 1L, 9.9))
      .toDF("k", "t", "v")
    val lrows = left.as[(Long, String, Long)].collect()
    val rrows = right.as[(String, Long, Double)].collect()
    def brute(fwd: Boolean) = lrows.map { case (id, k, t) =>
      val cand = rrows.filter(r => r._1 == k && (if (fwd) r._2 >= t else r._2 <= t))
      val pick = if (cand.isEmpty) None
        else Some(if (fwd) cand.minBy(_._2) else cand.maxBy(_._2))
      (id, pick.map(_._2), pick.map(_._3))
    }.toSet
    val back = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_t", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(back === brute(fwd = false))
    val fwd = AsofJoin.asofForward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_t", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(fwd === brute(fwd = true))
    // NULL timestamps match nothing on either side (review r9): a
    // null-ts left row gets null payload in BOTH directions, and a
    // null-ts right row never enters the running frame
    val leftN = Seq((1L, "a", Some(10L)), (7L, "a", Option.empty[Long]))
      .toDF("id", "k", "t")
    val rightN = Seq(("a", Some(20L), 2.0), ("a", Option.empty[Long], 9.9))
      .toDF("k", "t", "v")
    val backN = AsofJoin.asofBackward(leftN, rightN, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(backN(1L).isEmpty && backN(7L).isEmpty) // no right <= 10; null matches nothing
    val fwdN = AsofJoin.asofForward(leftN, rightN, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(fwdN(1L) === Some(2.0) && fwdN(7L).isEmpty)
  }

  test("prefixSumScaled equals the single-partition window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Batching
    val rows = (1 to 997).map(i => ((i * 37) % 1000, i.toLong % 13))
    val df = rows.toDF("key", "v").repartition(7)
    val got = Batching.prefixSumScaled(df, Seq(col("key")), col("v"), out = "off")
      .select("key", "off").as[(Int, Long)].collect().toMap
    val want = df.withColumn("off",
        coalesce(sum(col("v")).over(
          Window.orderBy(col("key")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("key", "off").as[(Int, Long)].collect().toMap
    assert(got === want)
  }

  test("int8 quantization: round-trip error bounded by scale/2, cosine preserved") {
    import graft.ops.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val checked = e.select(
      Similarity.int8QuantScale(col("embedding")).as("scale"),
      Similarity.int8Quantize(col("embedding")).as("codes"),
      Similarity.vecD(col("embedding")).as("v"))
      .withColumn("deq", Similarity.int8Dequantize(col("scale"), col("codes")))
      .select(
        array_max(zip_with(col("v"), col("deq"), (a, b) => abs(a - b))).as("maxerr"),
        (col("scale") / 2 + 1e-12).as("bound"),
        Similarity.cosine(col("v"), col("deq")).as("cos"),
        array_max(transform(col("codes"), c => abs(c))).as("maxcode"))
    assert(checked.where(col("maxerr") > col("bound")).count() === 0L,
      "per-component error must be <= scale/2")
    assert(checked.where(col("maxcode") > 127).count() === 0L, "codes in [-127,127]")
    assert(checked.agg(min(col("cos"))).head().getDouble(0) > 0.995,
      "dequantized cosine must stay near 1")
  }

  test("char-shingle LSH pairs EQUAL the exact inverted-index pairs on sf0.01") {
    // closes the probability argument with a measured equality: discovery
    // (LSH, r=6 banding) finds exactly the pairs the exact inverted index
    // finds at the catalog's own (k=5, t=0.6) setting — candidates are
    // already exact-verified, so LSH ⊆ exact always; this asserts recall
    val d01 = SparkEntry.loader(spark, "/root/testdata/sf0.01")("documents")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairSet(Dedup.minhashLshPairsChar(d01, "doc_id", "text", k = 5, threshold = 0.6))
    val exact = pairSet(Dedup.jaccardPairsChar(d01, "doc_id", "text", k = 5, threshold = 0.6))
    assert(lsh === exact)
  }

  // -- jaccard ------------------------------------------------------------

  test("charShingleHashes: exactly len-k+1 grams, no phantom from split's tail") {
    import spark.implicits._
    // pins Spark's split(s, "") semantics (NO trailing empty element —
    // unlike raw Java split): a phantom "" token would add one extra
    // k-gram per document and distort every char-shingle Jaccard
    // (review r9 candidate, refuted empirically; this spec keeps it so)
    val d = Seq("abcdefgh", "abcd", "abcde").toDF("text")
    val n = d.select(size(Dedup.charShingleHashes(col("text"), 5)).as("n"))
      .as[Int].collect().toSeq
    assert(n === Seq(4, 0, 1)) // 8-4+1, too short -> 0, 5-5+1
    // and the hash-kernel count equals the string-shingle count per doc
    val eq = d.select(size(Dedup.charShingleHashes(col("text"), 5)) ===
      size(Dedup.charShingles(col("text"), 5))).as[Boolean].collect()
    assert(eq.forall(identity))
  }

  test("charShingleHashes kernel ≡ shingleHashes over split(s, \"\") — unicode included") {
    import spark.implicits._
    // r14: the direct-over-string kernel replaced the empty-pattern
    // regex split + 1-char-token array; this law pins value-identity
    // of the emitted hash SETS on ascii, multi-byte (2/3-byte UTF-8),
    // surrogate pairs (4-byte), mixed whitespace (normText collapses),
    // empty, and sub-k strings — and on the real corpus.
    val crafted = Seq("hello world docs", "héllo wörld", "日本語のテキストです",
      "emoji 😀😀 pair 𝕏𝕐 test", "", "ab", "    spaced   out   text ",
      "ααββγγδδεε", "a😀b😀c😀d😀e").toDF("text")
    val docs = SparkEntry.loader(spark, "/root/testdata/sf0.001")("documents")
      .select(col("text")).unionByName(crafted)
    val cmp = docs.select(
      Dedup.charShingleHashes(col("text"), 5).as("neo"),
      graft.functions.native.shingleHashes(
        split(graft.ops.TextAnalysis.normText(col("text")), ""), 5).as("old"))
    assert(cmp.where(not(col("neo") <=> col("old"))).count() === 0L)
    // k=4 flavor too (the spans/winnow grain)
    val cmp4 = docs.select(
      Dedup.charShingleHashes(col("text"), 4).as("neo"),
      graft.functions.native.shingleHashes(
        split(graft.ops.TextAnalysis.normText(col("text")), ""), 4).as("old"))
    assert(cmp4.where(not(col("neo") <=> col("old"))).count() === 0L)
  }

  test("sortedIntersectCount equals array_intersect size on the real shingle producer") {
    import graft.functions.native
    // the law over ShingleHashes output (sorted-distinct by contract) —
    // cross-join of document shingle sets, both kernels side by side
    val sh = docs.select(Dedup.shingleHashes(col("text"), 3).as("a"))
    val pairs = sh.crossJoin(docs.select(Dedup.shingleHashes(col("text"), 3).as("b")))
    val bad = pairs.where(
      native.sortedIntersectCount(col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b"))).cast("long")).count()
    assert(bad === 0L)
    // null propagation
    val r = docs.limit(1).select(
      native.sortedIntersectCount(lit(null).cast("array<bigint>"),
        Dedup.shingleHashes(col("text"), 3)).isNull.as("n"))
      .head().getBoolean(0)
    assert(r)
  }

  test("jaccardPairs finds the near-dup and the exact-dup pair") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashLshPairs matches exact jaccardPairs on this data") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact) // verification step makes candidates exact
  }

  test("minhash estimated jaccard approximates exact jaccard") {
    val sig = docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), 128).as("sig"))
    val a = sig.where($"doc_id" === 1).select("sig").as[Seq[Long]].head()
    val b = sig.where($"doc_id" === 2).select("sig").as[Seq[Long]].head()
    val est = a.zip(b).count { case (x, y) => x == y } / 128.0
    // exact word-trigram jaccard of docs 1,2 is 10/14 ≈ 0.714
    assert(math.abs(est - 0.714) < 0.2)
  }

  test("simhashPairs: near-dups are close in hamming, distinct docs are not") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) <= 16)
    assert(pairs.get((1L, 3L)).isEmpty && pairs.get((2L, 3L)).isEmpty)
  }

  test("simhash64 identical for identical token streams") {
    val h = docs.select(Dedup.simhash64(col("text")).as("h"))
      .where(col("h").isNotNull).as[Long].collect()
    assert(h.distinct.length >= 3)
    val h1 = docs.where($"doc_id" === 1).select(Dedup.simhash64(col("text"))).as[Long].head()
    val h4 = docs.where($"doc_id" === 4).select(Dedup.simhash64(lower(col("text")))).as[Long].head()
    assert(h1 === h4) // same tokens after lowercasing doc 4
  }

  test("minhashLshPairsChar matches exact jaccardPairsChar on crafted docs") {
    val exact = Dedup.jaccardPairsChar(docs, "doc_id", "text", k = 5, threshold = 0.6)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairsChar(docs, "doc_id", "text", k = 5, threshold = 0.6)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
    assert(exact.exists(p => p._1 == 1L && p._2 == 2L)) // the near-dup pair
  }

  // -- similarity ---------------------------------------------------------

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK: nearest neighbor ordering is by cosine") {
    val top = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 0), k = 2)
      .orderBy("rank").select("n_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L)) // cos(0,1)≈0.994 > cos(0,2)=0 > cos(0,4)=-1
  }

  test("lshTopK recall@1 vs brute force on sf0.001 (deterministic seed)") {
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val q = e.where($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(e, q, k = 1, planes = 4, tables = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val hits = bf.count { case (qid, nid) => lsh.get(qid).contains(nid) }
    // NNs in this synthetic corpus sit at cos≈0.5 — the LSH-hard regime;
    // 4-plane × 8-table multiprobe is expected ≳80% here, far better on
    // real corpora where near-dups have cos > 0.9
    assert(hits >= 6, s"LSH recall@1 too low: $hits/10")
  }

  test("ivfTopK recall@1 vs brute force on sf0.001 (Lloyd coarse quantizer)") {
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val q = e.where($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(e, q, k = 1, nlist = 16, nprobe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val hits = bf.count { case (qid, nid) => ivf.get(qid).contains(nid) }
    // uniform-random embeddings are ANN's worst case (no cluster
    // structure to exploit); half-corpus probing is the honest bar here —
    // real corpora with topical clusters probe far fewer cells
    assert(hits >= 7, s"IVF recall@1 too low: $hits/10")
  }

  test("IVF contrastive mining ≡ exact tier when every cell is probed") {
    // the law that makes the approximate path trustworthy: with
    // nprobe = nlist the cell equi-join's candidate set IS the full
    // corpus, so IVF-mined positives/negatives must EQUAL the exact
    // broadcast tier row-for-row (same ids, same ranks, same sims)
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val anchors = e.where($"vec_id" < 10)
    val cents = Similarity.ivfFitCentroids(e, nlist = 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "n_id", "sim")
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(key(Similarity.positivePairsIvf(e, anchors, 2, cents, nprobe = 8))
      === key(Similarity.positivePairs(e, anchors, 2)))
    assert(key(Similarity.hardNegativesIvf(e, anchors, 2, cents, nprobe = 8))
      === key(Similarity.hardNegatives(e, anchors, 2)))
    // partial probing is a subset relation: every mined pair is a real
    // (q, n) candidate with the exact tier's own cosine — mined results
    // can MISS neighbors outside the probed cells, never invent or
    // mis-score one (k = corpus size makes the exact tier exhaustive)
    val n = e.count().toInt
    val exactAll = key(Similarity.hardNegatives(e, anchors, n))
      .map { case (q, _, nid, s) => (q, nid, s) }
    val mined = key(Similarity.hardNegativesIvf(e, anchors, 5, cents, nprobe = 2))
    assert(mined.nonEmpty)
    assert(mined.forall { case (q, _, nid, s) => exactAll.contains((q, nid, s)) })
  }

  test("pqEncode: m codes per vector, each within the codebook range") {
    import spark.implicits._
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val books = Similarity.pqFitCodebooks(e, m = 8, k = 16)
    assert(books.length === 8 && books.forall(_.length === 16)
      && books.forall(_.forall(_.length === 8))) // 64 dims / 8 subspaces
    val codes = e.select(Similarity.pqEncode($"embedding", books).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("pqTopK: planted exact copy survives the ADC shortlist, re-ranks to 1.0") {
    import spark.implicits._
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
      .select($"vec_id", $"embedding")
    val q = e.where($"vec_id" < 5)
    val corpus = e.unionByName(q.select(($"vec_id" + 1000L).as("vec_id"), $"embedding"))
    val books = Similarity.pqFitCodebooks(corpus, m = 8, k = 16)
    val top = Similarity.pqTopK(corpus, q, k = 1, books, shortlist = 32)
      .select("q_id", "n_id", "sim").as[(Long, Long, Double)].collect()
    assert(top.length === 5)
    for ((qid, nid, sim) <- top) {
      assert(nid === qid + 1000L, s"copy of $qid not at rank 1 (got $nid)")
      assert(math.abs(sim - 1.0) < 1e-9)
    }
  }

  test("pqTopK recall@1 vs brute force on sf0.001 (ADC + exact re-rank)") {
    import spark.implicits._
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val q = e.where($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val books = Similarity.pqFitCodebooks(e, m = 8, k = 16)
    val pq = Similarity.pqTopK(e, q, k = 1, books, shortlist = 32)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val hits = bf.count { case (qid, nid) => pq.get(qid).contains(nid) }
    // uniform-random vectors at cos≈0.5 are the hard regime (same bar
    // rationale as the LSH/IVF tests above); ADC + 32-wide re-rank is
    // near-exact on real clustered corpora
    assert(hits >= 6, s"PQ recall@1 too low: $hits/10")
  }

  test("semanticDedup: transitive within-cell dupes collapse to the min id") {
    import spark.implicits._
    // one cell (single centroid): a~b~c transitively at cos 1 (scaled
    // copies), d orthogonal — survivors = min(a,b,c) + d
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(4.0f, 0.0f)),
      (9L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(0.0, 0.0))
    val out = Similarity.semanticDedup(vs, "vec_id", "embedding", cents, 0.99)
      .select("vec_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 9L))
    // cells scope the pair search: same dupes in DIFFERENT cells survive
    val cents2 = Array(Array(1.0, 0.0), Array(4.0, 0.0))
    val out2 = Similarity.semanticDedup(vs, "vec_id", "embedding", cents2, 0.99)
      .select("vec_id").as[Long].collect().sorted
    // cell {1,2,9} drops 2; vector 3 sits alone in the second cell and
    // survives even though it duplicates 1 and 2 semantically
    assert(out2.toSeq === Seq(1L, 3L, 9L), s"cross-cell pairs must not form: ${out2.toSeq}")
  }

  test("ivfPqTopK recall@1 vs brute force on sf0.001 (composed index)") {
    import spark.implicits._
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val q = e.where($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val cents = Similarity.ivfFitCentroids(e, nlist = 16)
    val books = Similarity.pqFitCodebooks(e, m = 8, k = 16)
    val ivfpq = Similarity.ivfPqTopK(e, q, k = 1, cents, books,
        nprobe = 8, shortlist = 32)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val hits = bf.count { case (qid, nid) => ivfpq.get(qid).contains(nid) }
    // compounded approximation (cell miss ∪ ADC miss) on the
    // uniform-random worst case; either tier alone holds ≥6-7/10 above
    assert(hits >= 5, s"IVFPQ recall@1 too low: $hits/10")
  }

  test("cosinePairs is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.cosinePairs(vecs, 0.9).select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSet === Set((0L, 1L)))
  }

  test("cosinePairsLsh recall vs exact cosinePairs on sf0.001") {
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("embeddings")
    val exact = Similarity.cosinePairs(e, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairsLsh(e, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verification is exact → no false positives
    // pairs here sit at cos 0.45-0.51 — the hardest LSH regime; real
    // near-dup corpora (cos > 0.9) bucket together almost surely
    assert(lsh.size * 2 >= exact.size, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  // -- text analysis ------------------------------------------------------

  test("tokenCount/bpeTokenCount/avgWordLen on crafted text") {
    val df = Seq(("a bb  ccc", "It's 42%!"), ("", "x")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.tokenCount(col("t1")).as("n1"),
      TextAnalysis.bpeTokenCount(col("t2")).as("n2"),
      TextAnalysis.avgWordLen(col("t1")).as("awl")).collect()
    assert(r(0).getLong(0) === 3L)
    assert(r(0).getLong(1) === 5L) // It|'s|42|%|!
    assert(r(0).getDouble(2) === 2.0)
    assert(r(1).getLong(0) === 0L)
    assert(r(1).isNullAt(2))
  }

  test("bigramLmScores: integer aggregates exact, logp within tolerance of reference") {
    val out = TextAnalysis.bigramLmScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val norm = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")).toMap
    val corpus = norm.values.filter(_.length >= 2).toSeq.flatMap(_.sliding(2).toSeq)
    val cnt = corpus.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val tot = cnt.toSeq.groupBy(_._1.charAt(0)).map { case (c1, m) => c1 -> m.map(_._2).sum }
    val v = norm.values.filter(_.nonEmpty).flatMap(_.toSeq).toSet.size
    assert(out.length === 5)
    out.foreach { r =>
      val grams = { val t = norm(r.getLong(0)); if (t.length >= 2) t.sliding(2).toSeq else Seq.empty }
      assert(r.getLong(1) === grams.size.toLong)
      assert(r.getLong(2) === grams.map(cnt).sum)
      assert(r.getLong(3) === grams.map(g => tot(g.charAt(0))).sum)
      val want = grams.map(g => math.log((cnt(g) + 1.0) / (tot(g.charAt(0)) + v.toDouble))).sum
      assert(math.abs(r.getDouble(4) - want) <= 1e-9 * math.max(1.0, math.abs(want)))
    }
    // the exact-dup doc (4 ≡ 1 modulo case/whitespace) scores identically
    assert(math.abs(out(0).getDouble(4) - out(3).getDouble(4)) <= 1e-12)
  }

  test("langId picks the lexicon-majority language") {
    val df = Seq(
      "the cat and the dog in the house",
      "le chat et la maison dans les arbres",
      "el perro y las casas en que vivo",
      "der hund und die katze ist von den",
      "这是中文文本",
      "zzz qqq www").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(got.toSeq === Seq("en", "fr", "es", "de", "zh", "und"))
  }

  test("langIdMargin mirrors langId's zh-priority decision, not a symmetric race") {
    // 8 English stopword hits + 1 CJK char: langId decides zh (absolute
    // CJK priority), so the margin must report zh's evidence against
    // the best lexicon — NEGATIVE here (low confidence), never the
    // losing channel's +7 lead (review r9)
    val mixed = "the cat and the dog in the house 中"
    val df = Seq(mixed, "the cat and the dog in the house", "这是中文文本").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.langIdMargin(col("text")).cast("long").as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got(0)._1 === "zh" && got(0)._2 < 0, s"mixed doc: ${got(0)}")
    assert(got(1)._1 === "en" && got(1)._2 > 0)  // clean en: positive margin
    assert(got(2)._1 === "zh" && got(2)._2 > 0)  // clean zh: positive margin
  }

  test("chunkBySizeScaled equals the single-partition chunking") {
    import graft.ops.Batching
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = Batching.chunkBySize(df, "event_id", 137)
      .select("event_id", "chunk")
    val b = Batching.chunkBySizeScaled(df, "event_id", 137, parts = 7)
      .select("event_id", "chunk")
    // (AQE may coalesce the tiny test shuffle; the plan property —
    // per-range-partition ranks + broadcast offsets, no single-partition
    // window — is structural, the equality check is the contract)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("rankWithinScaled equals the per-key window rank, keys split across partitions") {
    import org.apache.spark.sql.expressions.Window
    // 3 keys × ~1700 rows each, forced across 7 range partitions so every
    // key group spans >1 partition (the broadcast-offset path is exercised)
    val df = spark.range(5000).select(
      (col("id") % 3).as("k"), col("id").as("v"))
    val viaWindow = df.withColumn("r",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))).cast("long") - 1)
    val viaScaled = Batching.rankWithinScaled(df, "k", Seq(col("v")), out = "r", parts = 7)
    assert(viaWindow.exceptAll(viaScaled).count() === 0 &&
      viaScaled.exceptAll(viaWindow).count() === 0)
  }

  test("rankWithinScaled guards high-cardinality keys: window fallback, identical ranks") {
    import org.apache.spark.sql.expressions.Window
    // 2500 distinct keys × 2 rows: a driver offsets map of this shape is
    // what the maxOffsetKeys probe exists to prevent. Forcing the
    // threshold low proves (a) the fallback ENGAGES (plan carries a
    // window, no LogicalRDD from the prefix-sum path) and (b) it assigns
    // byte-identical ranks.
    val df = spark.range(5000).select((col("id") % 2500).as("k"), col("id").as("v"))
    val viaWindow = df.withColumn("r",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))).cast("long") - 1)
    val guarded = Batching.rankWithinScaled(df, "k", Seq(col("v")), out = "r",
      parts = 7, maxOffsetKeys = 100)
    assert(guarded.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"),
      "expected the per-key-window fallback for high-cardinality keys")
    assert(viaWindow.exceptAll(guarded).count() === 0 &&
      guarded.exceptAll(viaWindow).count() === 0)
    // same input through the prefix-sum path (threshold above the key
    // count): still identical — the guard changes the plan, never ranks
    val scaled = Batching.rankWithinScaled(df, "k", Seq(col("v")), out = "r", parts = 7)
    assert(scaled.exceptAll(viaWindow).count() === 0 &&
      viaWindow.exceptAll(scaled).count() === 0)
  }

  test("rankWithinScaled fuzz: skewed key distributions, NULL keys, random part counts") {
    // the 100-TB batching kernel under the shapes the fixed laws above
    // don't draw (r12): zipf-skewed bucket sizes (one bucket holding a
    // third of the rows next to many singletons), a NULL-key slice
    // (nulls range-partition first and form their own window group —
    // both paths must agree), and random partition counts, incl. parts
    // far above and below the bucket count
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(41L, 42L, 43L)) {
      val rnd = new scala.util.Random(seed)
      val n = 2000 + rnd.nextInt(3000)
      val alpha = 1 + rnd.nextInt(4)
      val parts = 2 + rnd.nextInt(31)
      val rows: Seq[(Option[Long], Long, Long)] = (0 until n).map { i =>
        val k = if (rnd.nextInt(20) == 0) None
          else Some(math.floor(math.pow(rnd.nextDouble(), alpha) * 40).toLong)
        (k, rnd.nextInt(100000).toLong, i.toLong)
      }
      val df = spark.createDataFrame(rows).toDF("k", "v", "id")
      val viaWindow = df.withColumn("r",
        row_number().over(Window.partitionBy(col("k"))
          .orderBy(col("v"), col("id"))).cast("long") - 1)
      val viaScaled = Batching.rankWithinScaled(
        df, "k", Seq(col("v"), col("id")), out = "r", parts = parts)
      assert(viaScaled.exceptAll(viaWindow).count() === 0 &&
        viaWindow.exceptAll(viaScaled).count() === 0,
        s"seed $seed (n=$n alpha=$alpha parts=$parts): rank drift between paths")
    }
  }

  test("connectedComponents matches driver-side union-find on a random graph") {
    import graft.ops.Dedup
    // deterministic random graph: 400 nodes, 300 edges → a mix of
    // singletons-in-pairs, trees, and cycles
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    val df = spark.createDataFrame(edges).toDF("id_a", "id_b")
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      .map(n => (n, find(n)))
    // default = small-graph fast path (driver union-find)
    val got = Dedup.connectedComponents(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want)
    // threshold 0 forces the distributed star iteration — both paths
    // must agree with the reference, edge for edge
    val gotIter = Dedup.connectedComponents(df, smallGraphThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotIter === want)
  }

  test("connectedComponents closes a long chain (diameter >> rounds)") {
    import graft.ops.Dedup
    // a 2048-node path: naive min-propagation needs 2047 rounds; the
    // star algorithm must finish inside the 50-round cap (O(log n)).
    // threshold 0 forces the ITERATIVE path — this is its regression
    // test; the small path covers the same chain via the random-graph
    // equivalence above
    val df = spark.range(2047).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val got = Dedup.connectedComponents(df, smallGraphThreshold = 0L)
    assert(got.where(col("rep") =!= 0L).count() === 0)
    assert(got.count() === 2048)
    // dupClusters rolls the same labels into a keep-one manifest
    val cl = Dedup.dupClusters(df, maxMembers = 5).collect()
    assert(cl.length === 1 && cl(0).getLong(0) === 0L && cl(0).getLong(1) === 2048L)
  }

  test("splitAssign is deterministic, exhaustive, and near the requested weights") {
    import graft.ops.Sampling
    val df = spark.range(20000).select(concat(lit("doc "), col("id")).as("k"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = df.select(Sampling.splitAssign(col("k"), splits).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test")) // exhaustive
    assert(counts.values.sum === 20000L)                  // no row dropped
    // cutoffs round to 1/256: expected 205/26/25 buckets ± hash noise
    assert(math.abs(counts("train") - 20000.0 * 205 / 256) < 500)
    assert(math.abs(counts("val") - 20000.0 * 26 / 256) < 300)
    // determinism: a second pass assigns identically
    val twice = df.select(col("k"), Sampling.splitAssign(col("k"), splits).as("a"))
      .join(df.select(col("k"), Sampling.splitAssign(col("k"), splits).as("b")), "k")
      .where(col("a") =!= col("b")).count()
    assert(twice === 0L)
    // sampleByHash(0.25) keeps the same rows as the 0x40-cut predicate
    val n = df.where(Sampling.sampleByHash(col("k"), 0.25)).count()
    assert(math.abs(n - 20000.0 * 64 / 256) < 400)
    // an INTERMEDIATE cut that rounds up to 256 must short-circuit to
    // true, not format as 3-char hex "100" which string-compares below
    // almost every 2-char bucket and inverts the split (review r9):
    // 0.999 rounds to the full 256 buckets at 1/256 granularity, so
    // train takes everything — never ~6.6%
    val lop = df.select(Sampling.splitAssign(col("k"),
        Seq("train" -> 0.999, "test" -> 0.001)).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lop.getOrElse("train", 0L) === 20000L)
  }

  test("DSIR: score matches local model replay; target-like docs outrank junk; take is top-k") {
    import graft.ops.Sampling
    val s = spark
    import s.implicits._
    // 3 target docs share a vocabulary; 3 raw-only docs use disjoint
    // junk words; one candidate doc in target vocab, one in junk vocab
    val rows = Seq(
      (0L, "good clean prose text", true),
      (1L, "clean text good prose", true),
      (2L, "prose text clean good", true),
      (3L, "zxq wvu tsr qpo", false),
      (4L, "wvu zxq qpo tsr", false),
      (5L, "tsr qpo zxq wvu", false),
      (6L, "good prose clean text", false), // target-like candidate
      (7L, "qpo tsr wvu zxq", false),       // junk-like candidate
      (8L, "   ", false))                   // zero-gram doc
    val df = rows.toDF("id", "text", "is_tgt")
    val got = Sampling.dsirScores(df, "id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

    // local replay of the model: same grams, same md5-prefix buckets
    def toks(t: String) = t.trim.toLowerCase match {
      case "" => Seq.empty[String]
      case x  => x.split("\\s+").toSeq
    }
    def grams(t: String) = { val w = toks(t); w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    def bucket(g: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    val all = rows.flatMap { case (id, t, tgt) => grams(t).map(g => (id, bucket(g), tgt)) }
    val tgtN = all.filter(_._3).groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val rawN = all.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val (tgtT, rawT) = (tgtN.values.sum.toDouble, rawN.values.sum.toDouble)
    val B = 4096.0
    for ((id, t, _) <- rows) {
      val gs = grams(t)
      val (ng, st, sr, score) = got(id)
      assert(ng === gs.size.toLong, s"n_grams of $id")
      assert(st === gs.map(g => tgtN.getOrElse(bucket(g), 0L)).sum, s"sum_tgt of $id")
      assert(sr === gs.map(g => rawN(bucket(g))).sum, s"sum_raw of $id")
      val want = gs.map { g =>
        math.log((tgtN.getOrElse(bucket(g), 0L) + 1) / (tgtT + B)) -
          math.log((rawN(bucket(g)) + 1) / (rawT + B))
      }.sum
      assert(math.abs(score - want) < 1e-9, s"score of $id: $score vs $want")
    }
    // ranking: the target-vocab candidate must outscore the junk one,
    // and the resample keeps the highest-scoring docs
    assert(got(6L)._4 > got(7L)._4)
    val kept = Sampling.dsirTake(df, "id", "text", col("is_tgt"), k = 4)
      .select("id").as[Long].collect().toSet
    val byScore = got.toSeq.sortBy { case (id, (_, _, _, sc)) => (-sc, id) }.map(_._1).take(4).toSet
    assert(kept === byScore)
  }

  test("sessionize splits on gap > threshold, 0-based per user") {
    import graft.ops.Sessions
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    // user 1: events at 0s, 100s, 2000s (gap 1900 > 1800 → new session),
    // 2100s; user 2: single event
    val rows = Seq((1L, ts(0), 1L), (1L, ts(100), 2L), (1L, ts(2000), 3L),
      (1L, ts(2100), 4L), (2L, ts(50), 5L))
    val df = spark.createDataFrame(rows).toDF("user_id", "ts", "event_id")
    val got = Sessions.sessionSummary(df, "user_id", "ts", gapSec = 1800,
        tieBreak = col("event_id"))
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq === Seq((1L, 0L, 2L, 100.0), (1L, 1L, 2L, 100.0), (2L, 0L, 1L, 0.0)))
  }

  test("RHP-LSH planesFor keeps bucket occupancy bounded as the corpus grows") {
    import graft.ops.Similarity
    // synthetic 20k-vector corpus (deterministic): planesFor must pick
    // enough planes that no bucket degenerates toward the all-pairs join.
    // Random-hyperplane buckets over roughly isotropic vectors are
    // balanced in expectation (n / 2^planes); assert a generous 8× bound.
    val n = 20000
    val target = 256L
    val planes = Similarity.planesFor(n, target)
    assert(planes >= 6, s"planesFor($n, $target) = $planes should exceed the static default 4")
    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val hps = Similarity.hyperplanes(planes, 16, seed = 99L)
    val occ = df.select(graft.ops.Similarity.rhpSignature(
        Similarity.vecD(col("embedding")), hps).as("bucket"))
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    assert(occ <= 8 * (n / (1L << planes)).max(target),
      s"max bucket occupancy $occ not bounded for planes=$planes")
  }

  test("BMP/WAV header decode: real bytes, real fields; non-matching → null") {
    import graft.ops.Multimodal
    import java.nio.{ByteBuffer, ByteOrder}
    def bmp(w: Int, h: Int, bits: Short): Array[Byte] = {
      val b = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte)
      b.putInt(18, w); b.putInt(22, h); b.putShort(28, bits)
      b.array()
    }
    def wav(rate: Int, ch: Short, bits: Short, dataLen: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.position(8); b.put("WAVE".getBytes)
      b.putShort(22, ch); b.putInt(24, rate); b.putShort(34, bits)
      b.position(36); b.put("data".getBytes); b.putInt(40, dataLen)
      b.array()
    }
    val rows = Seq(
      (1L, bmp(640, 480, 24)),
      (2L, bmp(100, -200, 32)),          // negative height = top-down BMP
      (3L, wav(44100, 2, 16, 176400)),   // exactly 1 second of stereo 16-bit
      (4L, "not an image".getBytes)
    ).toDF("id", "content")
    val got = rows.select(col("id"),
      Multimodal.bmpMeta(col("content")).as("img"),
      Multimodal.wavMeta(col("content")).as("aud")).orderBy("id").collect()
    assert(got(0).getStruct(1).getInt(1) === 640 && got(0).getStruct(1).getInt(2) === 480)
    assert(got(0).getStruct(1).getInt(3) === 3) // 24bpp → 3 channels
    assert(got(1).getStruct(1).getInt(1) === 100 && got(1).getStruct(1).getInt(2) === 200)
    assert(got(1).getStruct(1).getInt(3) === 4) // 32bpp → 4 channels
    val aud = got(2).getStruct(2)
    assert(aud.getInt(0) === 44100 && aud.getInt(1) === 2 && aud.getInt(2) === 16)
    assert(aud.getDouble(3) === 1.0)
    assert(got(2).isNullAt(1) && got(0).isNullAt(2)) // cross-format: null
    assert(got(3).isNullAt(1) && got(3).isNullAt(2))

    // JVM decoder agrees with the Column decode on the batched path
    val ds = Seq((1L, bmp(640, 480, 24))).toDS()
    val dec = Multimodal.decodePartitioned(ds,
      b => Multimodal.BmpDecoder(b).getOrElse((b.length.toLong, -1, -1, -1))).head()
    assert((dec.width, dec.height, dec.channels) === ((640, 480, 3)))
  }

  test("PNG decode: Column parser + ImageIO decoder agree on a REAL encoder's output") {
    import graft.ops.Multimodal
    // a real PNG produced by the JDK encoder — not our own synthetic bytes
    val img = new java.awt.image.BufferedImage(37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xFF8800)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val realPng = bos.toByteArray

    // Column-algebra header parse of the real encoder's bytes
    val rows = Seq((1L, realPng), (2L, Multimodal.syntheticPng(300, 70)),
        (3L, "not a png".getBytes))
      .toDF("id", "content")
      .select(col("id"), Multimodal.pngMeta(col("content")).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1).getInt(1) === 37 && rows(0).getStruct(1).getInt(2) === 23)
    assert(rows(0).getStruct(1).getInt(3) === 3)
    assert(rows(1).getStruct(1).getInt(1) === 300 && rows(1).getStruct(1).getInt(2) === 70)
    assert(rows(2).isNullAt(1))

    // full ImageIO decode through the partition-batched seam: real
    // dimensions + color components from the decoded pixel data
    val ds = Seq((1L, realPng), (2L, "junk".getBytes)).toDS()
    val dec = Multimodal.decodePartitioned(ds, Multimodal.orStub(Multimodal.ImageIoDecoder))
      .collect().sortBy(_.id)
    assert((dec(0).width, dec(0).height, dec(0).channels) === ((37, 23, 3)))
    // unclaimed payload falls back to the deterministic stub
    assert(dec(1).width === ("junk".getBytes.length % 241 + 16))
  }

  test("imageIoResize: bilinear downscale to floor-division dims; pass-through within bounds") {
    import graft.ops.Multimodal
    // 40x30 → maxSide 24: floor division gives (24, 30*24/40=18)
    val png = Multimodal.syntheticPngPixels(40, 30, seed = 5L)
    val Some((resized, rw, rh)) = Multimodal.imageIoResize(png, maxSide = 24)
    assert((rw, rh) === ((24, 18)))
    // the re-encoded payload is a REAL PNG that decodes at those dims
    val Some((_, w2, h2, _)) = Multimodal.ImageIoDecoder(resized)
    assert((w2, h2) === ((24, 18)))
    // within bounds: byte-identical pass-through, no re-encode
    val small = Multimodal.syntheticPngPixels(20, 10, seed = 6L)
    val Some((same, sw, sh)) = Multimodal.imageIoResize(small, maxSide = 24)
    assert(same eq small)
    assert((sw, sh) === ((20, 10)))
    // unclaimed payload → None (caller chooses the fallback)
    assert(Multimodal.imageIoResize("junk".getBytes, 24).isEmpty)
    // extreme aspect never collapses below 1px
    val wide = Multimodal.syntheticPngPixels(400, 2, seed = 7L)
    val Some((_, ww, wh)) = Multimodal.imageIoResize(wide, maxSide = 24)
    assert((ww, wh) === ((24, 1)))
  }

  test("channelMeans: exact on solid color, weighted on a known mix, None on junk") {
    import graft.ops.Multimodal
    val solid = Multimodal.syntheticSolidPng(9, 5, r = 200, g = 30, b = 7)
    assert(Multimodal.channelMeans(solid) === Some((200.0, 30.0, 7.0)))
    // seeded random pixels: mean must match a direct recompute from the
    // same decoded image (pins the channel order of the packed int)
    val rnd = Multimodal.syntheticPngPixels(11, 6, seed = 9L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rnd))
    var r = 0L; var n = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      r += (img.getRGB(x, y) >> 16) & 0xff; n += 1
    }
    assert(Multimodal.channelMeans(rnd).get._1 === r.toDouble / n)
    assert(Multimodal.channelMeans("junk".getBytes).isEmpty)
  }

  test("heavyHitters: exact above-threshold keys under aggressive MG eviction") {
    import graft.ops.Sketches
    // skewed synthetic stream: 3 heavy keys above the N/k bound, a
    // 50-key tail below it (+ nulls), spread over 8 partitions so every
    // partition's k=8 summary evicts constantly — the pigeonhole union
    // guarantee is what's under test
    val rows = Seq.fill(600)("hot1") ++ Seq.fill(400)("hot2") ++
      Seq.fill(200)("hot3") ++
      (0 until 50).flatMap(i => Seq.fill(5)(f"tail$i%02d")) ++
      Seq(null.asInstanceOf[String], null.asInstanceOf[String])
    val df = spark.createDataset(
      new scala.util.Random(7).shuffle(rows).toSeq)(
      org.apache.spark.sql.Encoders.STRING).repartition(8).toDF("key")
    val n = rows.count(_ != null) // 1450
    val k = 8
    val minFreq = n / k + 1 // 182: hot1/hot2/hot3 qualify, the tail cannot
    assert(minFreq > n / k)
    val got = Sketches.heavyHitters(df, "key", k, minFreq)
      .as[(String, Long)].collect().toMap
    val want = rows.filter(_ != null).groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 >= minFreq).toMap
    assert(got === want, s"minFreq=$minFreq n=$n")
    // nulls never surface as a key
    assert(!got.contains(null))
    // the exactness guard refuses an unsafe threshold instead of
    // silently under-reporting
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "key", k, minFreq = 2).collect()
    }
    // heavyHittersAuto sizes k from the data: the SAME unsafe threshold
    // succeeds (k grows to N/minFreq+1) and the result is the exact census
    val auto = Sketches.heavyHittersAuto(df, "key", minFreq = 2, minK = 4)
      .as[(String, Long)].collect().toMap
    val wantAll = rows.filter(_ != null).groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    assert(auto === wantAll)
  }

  test("heavyHitters preserves the key column's original type") {
    import graft.ops.Sketches
    val df = (Seq.fill(40)(7L) ++ Seq.fill(30)(9L) ++ (100L to 120L))
      .toDF("key")
    val hh = Sketches.heavyHitters(df, "key", k = 8, minFreq = 20L)
    // long in → long out (r7 cast every key to string; joining back then
    // needed a manual cast)
    assert(hh.schema("key").dataType === org.apache.spark.sql.types.LongType)
    assert(hh.as[(Long, Long)].collect().toMap === Map(7L -> 40L, 9L -> 30L))
  }

  test("windowMembership recomputes bounds under its own windowTokens") {
    import graft.ops.Batching
    // offsets laid out at W=10; membership asked at W=5 must re-window
    // (not mix the stored W=10 window_start/window_end with W=5 math)
    val counts = Seq(("a", 8L), ("b", 4L)).toDF("id", "n_tok")
    val off = Batching.packOffsetsFromCounts(counts, "id", "n_tok", 10L)
    val m = Batching.windowMembership(off, 5L)
      .select(col("id"), col("window"), col("tok_in_window"))
      .as[(String, Long, Long)].collect().toSet
    // md5("a") < md5("b") is false: md5(a)=0cc175.., md5(b)=92eb5.. → a first
    assert(m === Set(("a", 0L, 5L), ("a", 1L, 3L), ("b", 1L, 2L), ("b", 2L, 2L)))
  }

  test("windowMembership: every block except the corpus tail holds exactly W tokens") {
    import graft.ops.Batching
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val W = 512L
    val m = Batching.windowMembership(
      Batching.packOffsets(docs, "doc_id", "text", W), W)
    val perWindow = m.groupBy(col("window"))
      .agg(sum(col("tok_in_window")).as("t")).as[(Long, Long)].collect().toMap
    assert(perWindow.nonEmpty)
    val last = perWindow.keys.max
    assert(perWindow.filter(_._1 != last).values.forall(_ == W),
      "a non-tail block does not hold exactly W tokens")
    assert(perWindow(last) <= W && perWindow(last) > 0)
    // token conservation: window slices reassemble every doc exactly
    val totalSliced = perWindow.values.sum
    val totalDocs = m.select(col("id"), col("n_tok")).distinct()
      .agg(sum(col("n_tok"))).head().getLong(0)
    assert(totalSliced === totalDocs)
  }

  test("saltedJoinAuto ≡ plain inner join under a mixed hot/cold key split") {
    import graft.ops.Skew
    // 2 hot keys (1200/800 rows) over the N/k bound, 40 cold keys of 10
    // — the hot rows take the salted path, the cold tail joins plain,
    // and the union must be row-for-row the plain inner join
    val rows = Seq.fill(1200)("hotA") ++ Seq.fill(800)("hotB") ++
      (0 until 40).flatMap(i => Seq.fill(10)(f"cold$i%02d"))
    val big = new scala.util.Random(11).shuffle(rows).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("row_id", "key").repartition(8)
    val small = (Seq("hotA", "hotB") ++ (0 until 40).map(f => f"cold$f%02d") ++
      Seq("unmatched")).zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "dim")
    val n = rows.size
    val minFreq = 500L // > N/k for k=16: 2440/16 = 152
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "key", "dim").as[(Long, String, Int)].collect().sorted.toSeq
    val auto = canon(Skew.saltedJoinAuto(big, small, "key", salts = 8,
      hotMinFreq = minFreq, k = 16))
    val plain = canon(big.join(small, Seq("key")))
    assert(auto === plain && auto.size === n)
  }

  test("BPE merges: classic 'lower' example, merge order, column counts") {
    import graft.ops.Tokenizer
    // fixture in the public merges.txt format (Sennrich BPE / GPT-2 file
    // layout): rank = line order
    val vocab = Tokenizer.parseMerges(Seq(
      "#version: fixture",
      "l o", "lo w", "e r", "low er"))
    assert(vocab.encodeWord("lower") === Vector("lower")) // full merge chain
    assert(vocab.encodeWord("low") === Vector("low"))
    assert(vocab.encodeWord("newest") === Vector("n", "e", "w", "e", "s", "t"))
    // every occurrence of the winning pair merges in one pass
    assert(vocab.encodeWord("lolo") === Vector("lo", "lo"))
    // pre-tokenization splits words/digits/punct like the regex proxy
    assert(vocab.encode("low, lower!") === Seq("low", ",", "lower", "!"))
    // only a LEADING #version header is skipped — merge rules whose
    // tokens start with '#' are content (they build the ## piece)
    val hashy = Tokenizer.parseMerges(Seq("#version: 0.2", "# #", "## x"))
    assert(hashy.ranks === Map(("#", "#") -> 0, ("##", "x") -> 1))

    val df = Seq("low lower", null.asInstanceOf[String]).toDF("text")
    val got = df.select(Tokenizer.bpeTokenCount(col("text"), vocab))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(2L), None))
    val toks = df.where(col("text").isNotNull)
      .select(Tokenizer.bpeTokens(col("text"), vocab)).as[Seq[String]].head()
    assert(toks === Seq("low", "lower"))
  }

  test("BPE distinct-word counts equal the per-row UDF, incl. null/empty") {
    import graft.ops.Tokenizer
    val vocab = Tokenizer.parseMerges(Seq("#version: 0.2", "t h", "e r", "o n"))
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), translate(col("text"), "'", " ").as("t"))
      .limit(200)
    val edge = Seq((-1L, null.asInstanceOf[String]), (-2L, ""), (-3L, "   "))
      .toDF("doc_id", "t")
    val df = real.unionByName(edge)
    val perRow = df.select(col("doc_id"),
        Tokenizer.bpeTokenCount(col("t"), vocab).as("n_tok"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val byDoc = Tokenizer.bpeTokenCountsByDoc(df, "doc_id", col("t"), vocab)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byDoc.size === perRow.size)
    assert(byDoc === perRow)
    assert(byDoc(-1L) === None)     // null text → null count
    assert(byDoc(-2L) === Some(0L)) // token-free text → 0
    assert(byDoc(-3L) === Some(0L))
  }

  test("BPE training: Sennrich low/lower/newest/widest learns es, est, lo") {
    import graft.ops.Tokenizer
    // the paper's own worked example (Sennrich et al. 2016 §3.2, fig. 1):
    // freqs low:5 lower:2 newest:6 widest:3 → pair counts put (e,s) and
    // (s,t) at 9 (lexicographic tie-break → es), then (es,t) at 9, then
    // (l,o)/(o,w) at 7 (tie-break → lo)
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val learned = Tokenizer.bpeTrain(df, "text", nMerges = 3)
    assert(learned.ranks === Map(
      ("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2))
    // the learned vocab tokenizes the corpus words as the paper shows
    assert(learned.encodeWord("newest") === Vector("n", "e", "w", "est"))
    assert(learned.encodeWord("low") === Vector("lo", "w"))
    // early stop: no pair repeats → fewer merges than asked
    val tiny = Seq("ab cd").toDF("text")
    assert(Tokenizer.bpeTrain(tiny, "text", nMerges = 5).ranks.isEmpty)
    // train → save → load round-trips the merge table (merges.txt layout)
    val f = java.nio.file.Files.createTempFile("graft_merges", ".txt").toString
    Tokenizer.saveMerges(f, learned)
    assert(Tokenizer.loadMerges(f).ranks === learned.ranks)
  }

  test("BPE laws on real docs: lossless concatenation, count = chars - merges, proxy consistency") {
    import graft.ops.{Tokenizer, TextAnalysis}
    val vocab = Tokenizer.parseMerges(Seq("#version: 0.2", "t h", "e r", "o n"))
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(translate(col("text"), "'", " ").as("t")).as[String].take(100)
    for (t <- texts; w <- Tokenizer.preTokens(t)) {
      val toks = vocab.encodeWord(w)
      // losslessness: merges only JOIN adjacent pieces, never alter bytes
      assert(toks.mkString === w, s"lossy encode of '$w'")
      // every merge shrinks the piece count by exactly one
      assert(toks.size <= w.length && toks.size >= 1)
    }
    // the regex proxy (count of pre-tokens... with no merges, count = chars
    // in pre-tokens) and the vocab path must agree under the empty vocab:
    // encode with NO merges yields one token per pre-token CHARACTER
    val empty = Tokenizer.BpeVocab(Map.empty)
    for (t <- texts.take(20)) {
      val chars = Tokenizer.preTokens(t).map(_.length).sum
      assert(empty.encode(t).size === chars, s"empty-vocab count mismatch")
    }
  }

  test("WordPiece laws on real docs: ## discipline and lossless reassembly") {
    import graft.ops.Tokenizer
    val singles = (33 to 126).map(_.toChar.toString)
    val vocab = Tokenizer.WordPieceVocab(
      (singles ++ singles.map("##" + _) :+ "the").toSet)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(translate(col("text"), "'", " ").as("t")).as[String].take(50)
    for (t <- texts; w <- Tokenizer.preTokens(t)) {
      val toks = vocab.encodeWord(w)
      assert(toks.nonEmpty)
      // with all-singles coverage nothing can fall to UNK
      assert(!toks.contains("[UNK]"), s"UNK leaked for '$w'")
      // greedy-match discipline: only the first piece is bare, the rest
      // carry the ## continuation marker, and stripping markers
      // reassembles the exact word
      assert(!toks.head.startsWith("##") || w.startsWith("##"))
      assert(toks.tail.forall(_.startsWith("##")), s"bare continuation in $toks")
      val joined = toks.head + toks.tail.map(_.drop(2)).mkString
      assert(joined === w, s"lossy wordpiece for '$w': $toks")
    }
  }

  test("train-then-tokenize on real docs: learned merges shrink the token count") {
    import graft.ops.Tokenizer
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(translate(col("text"), "'", " ").as("text"))
    val vocab = Tokenizer.bpeTrain(docsDf, "text", nMerges = 10)
    assert(vocab.ranks.size === 10) // a 500-doc English corpus has ≥10 repeating pairs
    val sums = docsDf.select(
        Tokenizer.bpeTokenCount(col("text"), Tokenizer.BpeVocab(Map.empty)).as("chars"),
        Tokenizer.bpeTokenCount(col("text"), vocab).as("merged"))
      .agg(sum("chars").as("c"), sum("merged").as("m")).head()
    // every learned merge fires somewhere, and fires only to SHRINK
    assert(sums.getLong(1) < sums.getLong(0),
      s"learned vocab did not compress: ${sums.getLong(1)} vs ${sums.getLong(0)}")
  }

  test("index persistence: IVF centroids and PQ codebooks round-trip parquet bit-exactly") {
    import graft.ops.Similarity
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx").toString

    val ivf = Similarity.ivfFitCentroids(embs, nlist = 4)
    Similarity.saveIvfCentroids(spark, s"$tmp/ivf", ivf)
    val ivfLoaded = Similarity.loadIvfCentroids(spark, s"$tmp/ivf")
    assert(ivfLoaded.length === ivf.length)
    assert(ivfLoaded.zip(ivf).forall { case (a, b) => a.sameElements(b) },
      "IVF centroids changed across save/load")

    val pq = Similarity.pqFitCodebooks(embs, m = 4, k = 8)
    Similarity.savePqCodebooks(spark, s"$tmp/pq", pq)
    val pqLoaded = Similarity.loadPqCodebooks(spark, s"$tmp/pq")
    assert(pqLoaded.length === pq.length)
    assert(pqLoaded.zip(pq).forall { case (subA, subB) =>
      subA.length == subB.length &&
        subA.zip(subB).forall { case (a, b) => a.sameElements(b) } },
      "PQ codebooks changed across save/load")

    // bit-exact arrays → a search against the loaded index is the SAME
    // plan with the same literals: results are identical by construction
    val q = embs.limit(3)
    val fresh = Similarity.ivfSearch(embs, q, ivf, k = 2).orderBy("q_id", "n_id").collect()
    val loaded = Similarity.ivfSearch(embs, q, ivfLoaded, k = 2).orderBy("q_id", "n_id").collect()
    assert(fresh.sameElements(loaded))
  }

  test("WordPiece: greedy longest match with ## continuations, UNK fallback") {
    import graft.ops.Tokenizer
    // the canonical BERT docs example: un ##aff ##able
    val vocab = Tokenizer.WordPieceVocab(
      Set("un", "##aff", "##able", "aff", "hi", "##gh"))
    assert(vocab.encodeWord("unaffable") === Vector("un", "##aff", "##able"))
    assert(vocab.encodeWord("high") === Vector("hi", "##gh"))
    assert(vocab.encodeWord("zzz") === Vector("[UNK]"))
    val df = Seq("unaffable hi").toDF("text")
    assert(df.select(Tokenizer.wordPieceTokenCount(col("text"), vocab))
      .as[Long].head() === 4L)
  }

  test("Profiling.observed: metrics accumulate inside the action, no extra job") {
    import graft.ops.Profiling
    val df = Seq((1L, 10.0), (2L, -3.0), (3L, 7.0), (4L, -1.0)).toDF("id", "v")
    val (instrumented, obs) = Profiling.observed(df, "ingest_batch", Seq(
      "n_rows" -> count(lit(1)),
      "n_negative" -> sum(when(col("v") < 0, 1L).otherwise(0L)),
      "sum_v" -> sum(col("v"))))
    // the observation piggybacks on whatever action runs next
    val written = instrumented.where(col("v") > -100).count()
    assert(written === 4L)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_negative") === 2L)
    assert(m("sum_v") === 13.0)
  }

  test("residual PQ: quantization error no worse than raw-coordinate PQ") {
    import graft.ops.Similarity
    val embsDF = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vs = embsDF.select(expr("CAST(embedding AS array<double>)"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cents = Similarity.ivfFitCentroids(embsDF, nlist = 16)
    val raw = Similarity.pqFitCodebooks(embsDF, m = 8, k = 16)
    val res = Similarity.pqFitResidualCodebooks(embsDF, cents, m = 8, k = 16)
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Array[Double] =
      cs.minBy(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
    def mse(target: Array[Double] => Array[Double],
            books: Array[Array[Array[Double]]]): Double = {
      val dsub = books(0)(0).length
      vs.map { v =>
        val t = target(v)
        books.indices.map { s =>
          val sub = t.slice(s * dsub, s * dsub + dsub)
          val q = nearest(sub, books(s))
          sub.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        }.sum
      }.sum / vs.length
    }
    val rawErr = mse(identity, raw)
    val resErr = mse(v => {
      val c = nearest(v, cents)
      v.zip(c).map { case (a, b) => a - b }
    }, res)
    // FAISS's rationale, measured: encoding residuals quantizes no
    // worse than raw coordinates (strictly better on clustered data)
    assert(resErr <= rawErr * 1.01, s"residual MSE $resErr vs raw $rawErr")
  }

  test("Bloom save/load: round-trip answers mightContain bit-identically") {
    import graft.ops.TextAnalysis
    val bench = Seq("alpha beta gamma delta", "epsilon zeta eta theta").toDF("t")
    val bf = TextAnalysis.benchBloomFilter(bench, "t", n = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    TextAnalysis.saveBloom(spark, s"$tmp/bf", bf)
    val loaded = TextAnalysis.loadBloom(spark, s"$tmp/bf")
    // identical verdicts on members, non-members, and random probes
    val probes = Seq("alpha beta", "beta gamma", "eta theta", "nope nada",
      "alpha gamma", "") ++ (0 until 200).map(i => s"p$i q${i * 7}")
    for (p <- probes)
      assert(loaded.mightContainString(p) === bf.mightContainString(p), s"probe '$p'")
    assert(bf.mightContainString("alpha beta")) // real member never FN
  }

  test("funnel: strict ordering, greedy-earliest, partial prefixes, ties don't advance") {
    import graft.ops.Funnel
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      // u1: complete funnel, with a decoy early click BEFORE the view
      (1L, "click", ts(5)), (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: purchase before click → depth 2 only
      (2L, "view", ts(10)), (2L, "purchase", ts(15)), (2L, "click", ts(20)),
      // u3: tie — click at the SAME instant as view does not advance
      (3L, "view", ts(10)), (3L, "click", ts(10)),
      // u4: no funnel events at all (only errors) → depth 0
      (4L, "error", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    def row(i: Int) = (out(i).getLong(0), out(i).getInt(4))
    assert(row(0) === (1L, 3))
    // greedy takes the ADMISSIBLE earliest click (t=20), not the decoy t=5
    assert(out(0).getTimestamp(2) === ts(20))
    assert(row(1) === (2L, 2)) // purchase at 15 < click at 20 → never reached
    assert(row(2) === (3L, 1)) // strict >: the tied click does not count
    assert(row(3) === (4L, 0) && out(3).isNullAt(1))
  }

  test("containmentPairs: subset containment 1.0 where Jaccard vanishes") {
    import graft.ops.Dedup
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val small = (1 to 12).map(i => s"w$i").mkString(" ") // prefix subset
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, big), (2L, small), (3L, other)).toDF("id", "text")
    val out = Dedup.containmentPairs(df, "id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    // the small doc is fully contained: c(small→big) = 1.0 exactly
    assert(r.getDouble(r.fieldIndex("c_ba")) === 1.0)
    // while its Jaccard (10/58) is far below any dedup threshold —
    // the asymmetric case this operator exists for
    val j = r.getLong(r.fieldIndex("common")).toDouble /
      (r.getLong(r.fieldIndex("sz_a")) + r.getLong(r.fieldIndex("sz_b")) -
        r.getLong(r.fieldIndex("common")))
    assert(j < 0.25, s"jaccard unexpectedly high: $j")
    // jaccardPairs at 0.5 misses this pair entirely
    assert(Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = 0.5).count() === 0L)
  }

  test("upsertLatest: batch-boundary independence, late old versions never clobber") {
    val data = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (2L, 30L, 200L, "c"), (2L, 30L, 201L, "d"),
      (3L, 5L, 300L, "e"))
    def applyIn(splits: Seq[Seq[(Long, Long, Long, String)]]): Seq[(Long, Long, Long, String)] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ul")
      val store = new graft.container.FactStore(spark, "ul_spec", tmp)
      splits.foreach(b =>
        store.upsertLatest(b.toDF("k", "ts", "seq", "p"), "k", "ts", "seq"))
      store.dataFrame.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    }
    val want = Seq((1L, 20L, 101L, "b"), (2L, 30L, 201L, "d"), (3L, 5L, 300L, "e"))
    // one batch, row-wise batches, and REVERSED order (late-arriving old
    // versions) all converge to the same state — max is associative
    assert(applyIn(Seq(data)) === want)
    assert(applyIn(data.map(Seq(_))) === want)
    assert(applyIn(data.reverse.map(Seq(_))) === want)
    assert(applyIn(Seq(data.take(2), data.drop(2))) === want)
  }

  test("latestByKey: ts argmax, tie by sequence, all columns survive") {
    import graft.ops.Dedup
    val df = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),  // later ts wins
      (2L, 30L, 200L, "c"), (2L, 30L, 201L, "d"),  // tie → higher seq wins
      (3L, 5L, 300L, "e")
    ).toDF("k", "ts", "seq", "payload")
    val out = Dedup.latestByKey(df, "k", "ts", "seq").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq((1L, 20L, 101L, "b"), (2L, 30L, 201L, "d"), (3L, 5L, 300L, "e")))
  }

  test("zValueN: 2-col form equals zValue, 3-col bijective on a small grid") {
    import graft.ops.Layout
    val df = spark.range(0, 64).select((col("id") % 8).as("a"), (col("id") / 8).as("b"))
    val both = df.select(
      Layout.zValue(col("a"), col("b"), bits = 3).as("z2"),
      Layout.zValueN(Seq(col("a"), col("b")), bits = 3).as("zn")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)), "zValueN(2) != zValue")
    // 3 columns, 2 bits each: 64 distinct inputs → 64 distinct keys in [0, 64)
    val g = spark.range(0, 64).select(
      (col("id") % 4).as("a"), ((col("id") / 4) % 4).as("b"), (col("id") / 16).as("c"))
    val zs = g.select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 64 && zs.forall(z => z >= 0 && z < 64))
  }

  test("AhoCorasick: classic overlap set, suffix outputs, brute-force law, screen") {
    import graft.ops.AhoCorasick
    // the canonical he/she/his/hers automaton: "ushers" contains
    // she, he, hers (he inside she via suffix output, hers overlapping)
    val m = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    assert(m.count("ushers") === 3L)
    assert(m.matchedPatterns("ushers").toSet === Set("she", "he", "hers"))
    assert(m.count("his house") === 1L) // just "his"
    // brute-force law on random lowercase strings
    val pats = Seq("ab", "aba", "bb", "aab")
    val m2 = AhoCorasick.build(pats)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val s = (0 until 1 + rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
      val want = pats.map(p =>
        (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong).sum
      assert(m2.count(s) === want, s"count mismatch on '$s'")
    }
    // screen: lowercasing + flag + null
    val df = Seq((1L, "Free MONEY here"), (2L, "clean"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = AhoCorasick.screen(df, "text", Seq("free money")).orderBy("id").collect()
    assert(out(0).getLong(out(0).fieldIndex("blocklist_hits")) === 1L)
    assert(out(0).getBoolean(out(0).fieldIndex("blocked")))
    assert(out(1).getLong(2) === 0L && !out(1).getBoolean(3))
    assert(out(2).getLong(2) === 0L)
  }

  test("DeadLetter.parse: corrupt-record detection, salvage trap, raw payload kept") {
    import graft.etl.DeadLetter
    val df = Seq(
      (1L, """{"k": 1, "s": "good"}"""),
      (2L, """{"k": 2, "s": "trunca"""),  // truncated mid-string
      (3L, """not json at all"""),
      (4L, """{"k": "wrongtype", "s": "x"}"""), // k fails LONG coercion
      (5L, null.asInstanceOf[String])
    ).toDF("id", "payload")
    val out = DeadLetter.parse(df, "payload", "k LONG, s STRING")
    val routes = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("route"))).toMap
    assert(routes(1L) === "main")
    // PERMISSIVE salvages truncated JSON into a NON-null struct — the
    // corrupt-record check must still quarantine it
    assert(routes(2L) === "dead_letter")
    assert(routes(3L) === "dead_letter")
    assert(routes(4L) === "dead_letter") // type mismatch = corrupt too
    assert(routes(5L) === "dead_letter") // null payload
    // dead letters keep the raw payload for replay
    val dl = DeadLetter.deadLetters(out).orderBy("id").collect()
    assert(dl.map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L, 5L))
    assert(dl.head.getAs[String]("payload").startsWith("""{"k": 2"""))
    assert(DeadLetter.mainRoute(out).count() === 1L)
  }

  test("sentenceSplit: terminator boundaries, ids stable under empty drops, n_tok") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "One two. Three! Four five?  Six"),
      (2L, "No terminator here"),
      (3L, "Trailing dot."),
      (4L, "a.b stays one sentence. next")  // no whitespace after first dot
    ).toDF("id", "text")
    val out = TextAnalysis.sentenceSplit(df, "id", "text")
      .orderBy("id", "sent_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.filter(_._1 == 1L).map(x => (x._3, x._4)).toSeq ===
      Seq(("One two.", 2L), ("Three!", 1L), ("Four five?", 2L), ("Six", 1L)))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq("No terminator here"))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq === Seq("Trailing dot."))
    // mid-token dot (a.b) is not a boundary; the later ". " is
    assert(out.filter(_._1 == 4L).map(_._3).toSeq ===
      Seq("a.b stays one sentence.", "next"))
    // reassembly: sentences joined with a space reproduce the collapsed text
    for (id <- Seq(1L, 4L)) {
      val orig = df.where(col("id") === id).as[(Long, String)].head()._2
      val joined = out.filter(_._1 == id).map(_._3).mkString(" ")
      assert(joined === orig.replaceAll("\\s+", " ").trim)
    }
  }

  test("FactStore.insertWithExpectations: fail aborts, drop filters, track reports") {
    val d = Seq((1L, 10.0), (2L, -5.0), (3L, 20.0)).toDF("id", "v")
    val rules = Seq("v_pos" -> """{"gte": {"v": 0}}""")
    // fail: nothing written
    val s1 = new graft.container.FactStore(spark, "exp_fail",
      java.nio.file.Files.createTempDirectory("graft_exp1"))
    val ex = intercept[IllegalStateException] {
      s1.insertWithExpectations(d, rules, mode = "fail") }
    assert(ex.getMessage.contains("v_pos=1") && s1.isEmpty)
    // drop: clean rows only
    val s2 = new graft.container.FactStore(spark, "exp_drop",
      java.nio.file.Files.createTempDirectory("graft_exp2"))
    val rep2 = s2.insertWithExpectations(d, rules, mode = "drop").collect()
    assert(rep2.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq(("v_pos", 1L, 3L, 2L)))
    assert(s2.dataFrame.count() === 2 &&
      s2.dataFrame.where(col("id") === 2L).count() === 0)
    // track: everything written, violation still reported
    val s3 = new graft.container.FactStore(spark, "exp_track",
      java.nio.file.Files.createTempDirectory("graft_exp3"))
    val rep3 = s3.insertWithExpectations(d, rules, mode = "track").collect()
    assert(rep3.head.getLong(1) === 1L && rep3.head.getLong(3) === 3L)
    assert(s3.dataFrame.count() === 3)
    // a null predicate value counts as a violation (JX missing ≠ pass)
    val dn = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    val s4 = new graft.container.FactStore(spark, "exp_null",
      java.nio.file.Files.createTempDirectory("graft_exp4"))
    val rep4 = s4.insertWithExpectations(dn, rules, mode = "drop").collect()
    assert(rep4.head.getLong(1) === 1L && s4.dataFrame.count() === 1)
    // an EMPTY increment (routine in incremental pipelines) reports
    // zero violations instead of NPEing on the null aggregate
    val rep5 = s4.insertWithExpectations(d.where(col("id") < 0), rules, mode = "fail")
      .collect()
    assert(rep5.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 0L, 0L)))
  }

  test("FactStore.tag: pins survive mutations, re-tag moves, bad refs reject") {
    val store = new graft.container.FactStore(spark, "tag_spec",
      java.nio.file.Files.createTempDirectory("graft_tag"))
    store.insert(spark.range(0, 10).toDF("id"))
    store.tag("baseline", 1)
    store.delete("""{"lt": {"id": 5}}""") // v2
    assert(store.dataFrameAtTag("baseline").count() === 10)
    assert(store.dataFrame.count() === 5)
    store.tag("baseline", 2) // re-tag moves the pointer
    assert(store.dataFrameAtTag("baseline").count() === 5)
    assert(store.tags === Map("baseline" -> 2))
    intercept[IllegalArgumentException] { store.tag("nope", 99) }
    intercept[IllegalArgumentException] { store.tag("bad/name", 1) }
    intercept[NoSuchElementException] { store.dataFrameAtTag("ghost") }
  }

  test("FactStore.contentFingerprint: layout-invariant, mutation-sensitive") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp")
    val store = new graft.container.FactStore(spark, "fp_spec", tmp)
    val data = spark.range(0, 300).selectExpr("id", "id * 3 AS v")
    store.insert(data.repartition(13))
    val fp1 = store.contentFingerprint(1)
    // OPTIMIZE rewrites the layout but not the content → same digest
    store.optimize(1L << 30, order = Seq("id"))
    assert(store.contentFingerprint(2) === fp1, "layout change altered the digest")
    // any row mutation flips it
    store.delete("""{"eq": {"id": 7}}""")
    assert(store.contentFingerprint(3) !== fp1)
    // equal content in a DIFFERENT store (different partitioning,
    // different column order) fingerprints equal
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_fp2")
    val store2 = new graft.container.FactStore(spark, "fp2_spec", tmp2)
    store2.insert(data.selectExpr("v", "id").repartition(3))
    assert(store2.contentFingerprint(1) === fp1)
    // duplicate rows COUNT (sum digest, not xor: {A,A,B} ≠ {B})
    store2.insert(data.selectExpr("v", "id").limit(1))
    assert(store2.contentFingerprint(2) !== fp1)
    // an empty snapshot digests 0, not NPE
    store2.delete("""{"gte": {"id": 0}}""")
    assert(store2.contentFingerprint(3) === 0L)
  }

  test("FactStore.schemaDiff: added/removed/retyped columns across versions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd")
    val store = new graft.container.FactStore(spark, "sd_spec", tmp)
    store.insert(Seq((1L, "x", 10)).toDF("id", "a", "b"))                 // v1
    store.insert(Seq((2L, 1.5, 20L, "new")).toDF("id", "a", "b", "c"))    // v2:
    // b WIDENS int→bigint, c is added; a stays string (the merge
    // coerces the incoming double to v1's string — evolution never
    // narrows an existing column, so no retype on a)
    val d = store.schemaDiff(1, 2)
    assert(d.contains(("added", "c", null, "string")))
    assert(d.contains(("retyped", "b", "int", "bigint")))
    assert(!d.exists { case (_, c, _, _) => c == "a" })
    assert(store.schemaDiff(2, 2) === Seq.empty)
    // reversed direction mirrors
    assert(store.schemaDiff(2, 1).contains(("removed", "c", "string", null)))
  }

  test("FactStore.optimize: new compacted version, history intact, content identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_opt")
    val store = new graft.container.FactStore(spark, "opt_spec", tmp)
    val data = spark.range(0, 500).selectExpr("id", "id * 2 AS v")
    // the fixture WANTS 16 planted fragments (optimize's subject) —
    // disable the r14 size-adaptive snapshot layout for this insert
    spark.conf.set("spark.graft.snapshotTargetFileBytes", "0")
    try store.insert(data.repartition(16))
    finally spark.conf.unset("spark.graft.snapshotTargetFileBytes")
    val before = store.dataFrame.orderBy("id").collect()
    val (f0, f1) = store.optimize(1L << 30, order = Seq("id"))
    assert(f0 === 16L && f1 === 1L)
    assert(store.versions === Seq(1, 2))
    // content identical, v1 still addressable, vacuum reclaims it
    assert(store.dataFrame.orderBy("id").collect() === before)
    assert(store.dataFrameAt(1).count() === 500L)
    assert(store.vacuum(keepLast = 1) === Seq(1))
    assert(store.dataFrame.count() === 500L)
  }

  test("cdcChunks: token conservation, boundary determinism, insertion invariance") {
    import graft.ops.TextAnalysis
    val text = (1 to 120).map(i => s"tok${i % 37}").mkString(" ")
    def chunksOf(t: String): Seq[(Long, Long, String)] =
      TextAnalysis.cdcChunks(Seq((1L, t)).toDF("id", "text"), "id", "text")
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val orig = chunksOf(text)
    // tokens are conserved and chunk ids dense from 0
    assert(orig.map(_._2).sum === 120L)
    assert(orig.map(_._1) === orig.indices.map(_.toLong))
    assert(orig.map(_._3).mkString(" ") === text)
    // boundaries are content-defined → deterministic across invocations
    assert(chunksOf(text) === orig)
    // INSERTION INVARIANCE (the CDC property): prepending a token can
    // only re-chunk the prefix — every chunk after the first original
    // boundary survives byte-identical, so the original tail is a
    // suffix of the edited chunk sequence. A fixed-window chunker
    // shifts EVERY chunk here.
    val edited = chunksOf("inserted " + text)
    assert(edited.map(_._3).takeRight(orig.size - 1) === orig.map(_._3).drop(1),
      "CDC tail not invariant under prepend")
    // multiple chunks actually formed (the predicate fires at ~2/16)
    assert(orig.size >= 3, s"only ${orig.size} chunks")
  }

  test("expectedPieceCounts: closed form, coverage invariant, soft EM trains") {
    import graft.ops.Tokenizer
    // "aa" under {a: e^-1-weight -1.0, aa: -1.0}: P([aa]) = e^-1,
    // P([a,a]) = e^-2; E[aa] = e^-1/Z, E[a] = 2 e^-2/Z with Z their sum
    val v = Tokenizer.UnigramVocab(Map("a" -> -1.0, "aa" -> -1.0))
    val e = Tokenizer.expectedPieceCounts("aa", v)
    val z = math.exp(-1.0) + math.exp(-2.0)
    assert(math.abs(e("aa") - math.exp(-1.0) / z) < 1e-12)
    assert(math.abs(e("a") - 2.0 * math.exp(-2.0) / z) < 1e-12)
    // coverage invariant: sum of E[p]*len(p) = len(word), any vocab/word
    val v2 = Tokenizer.UnigramVocab(Map("l" -> -3.0, "o" -> -3.0, "w" -> -3.0,
      "lo" -> -2.5, "ow" -> -2.5, "low" -> -4.0, "e" -> -3.0, "r" -> -3.0))
    for (w <- Seq("low", "lower", "lowlow", "wool")) {
      val ec = Tokenizer.expectedPieceCounts(w, v2)
      if (ec.nonEmpty) {
        val mass = ec.map { case (p, c) => c * p.length }.sum
        assert(math.abs(mass - w.length) < 1e-9, s"coverage broken for '$w': $mass")
      }
    }
    // unsegmentable → empty
    assert(Tokenizer.expectedPieceCounts("xyz", v) === Map.empty)
    // long-word underflow guard: 60 chars at logp -10 each still finite
    val v3 = Tokenizer.UnigramVocab(Map("a" -> -10.0, "aa" -> -15.0))
    val long = Tokenizer.expectedPieceCounts("a" * 60, v3)
    assert(long.values.forall(c => !c.isNaN && !c.isInfinite && c > 0.0))
    // soft EM end-to-end: same coverage + compression laws as hard EM
    val corpus = Seq.fill(30)("low lower lowest") ++ Seq.fill(5)("newest widest")
    val vocab = Tokenizer.unigramTrainEM(corpus.toDF("text"), "text",
      vocabSize = 12, maxPieceLen = 5, emIters = 2)
    val alphabet = corpus.mkString.replaceAll("\\s", "").distinct
    for (c <- alphabet)
      assert(vocab.logProbs.contains(c.toString), s"missing char piece '$c'")
    assert(vocab.encodeWord("low").length < 3, "soft EM did not compress 'low'")
  }

  test("unigramTrain: learns dominant pieces, keeps char coverage, prunes to size") {
    import graft.ops.Tokenizer
    val corpus = Seq.fill(30)("low lower lowest") ++ Seq.fill(5)("newest widest")
    val df = corpus.toDF("text")
    val vocab = Tokenizer.unigramTrain(df, "text", vocabSize = 12,
      maxPieceLen = 5, emIters = 2)
    // single-char coverage: every corpus char is a piece → no UNK ever
    val alphabet = corpus.mkString.replaceAll("\\s", "").distinct
    for (c <- alphabet)
      assert(vocab.logProbs.contains(c.toString), s"missing char piece '$c'")
    // the dominant substring of the corpus is learned as a piece and used
    assert(vocab.logProbs.keys.exists(_.length > 1), "no multi-char piece learned")
    val enc = vocab.encodeWord("low")
    assert(enc.length < 3, s"'low' not compressed: $enc")
    // encoding is lossless and UNK-free on the training corpus
    for (w <- Seq("low", "lower", "lowest", "newest", "widest")) {
      val toks = vocab.encodeWord(w)
      assert(toks.mkString === w, s"lossy for '$w': $toks")
    }
    // pruning bound: chars always kept, multi-char pieces fit the budget
    val nMulti = vocab.logProbs.keys.count(_.length > 1)
    val nChars = vocab.logProbs.keys.count(_.length == 1)
    assert(nMulti <= math.max(0, 12 - nChars) || nMulti <= 12,
      s"vocab over budget: $nChars chars + $nMulti multi")
    // log-probs are normalized-ish: all negative, higher freq → higher logp
    assert(vocab.logProbs.values.forall(_ < 0.0))
  }

  test("editDistancePairs: exact recall for k edits, brute-force equivalence") {
    import graft.ops.Dedup
    val df = Seq(
      (1L, "spark"), (2L, "spork"),   // substitution
      (3L, "sparks"),                 // insertion vs 1
      (4L, "park"),                   // deletion vs 1
      (5L, "scala"), (6L, "skala"),   // substitution
      (7L, "spark"),                  // exact dup of 1
      (8L, "sp"), (9L, "qq")          // far from everything
    ).toDF("id", "s")
    val k1 = Dedup.editDistancePairs(df, "id", "s", maxEdits = 1)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k1.toSet === Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 7L, 0L),
      (2L, 7L, 1L), (3L, 7L, 1L), (4L, 7L, 1L), (5L, 6L, 1L)))
    // k=2 additionally reaches 2-edit pairs, never 3-edit ones
    val k2 = Dedup.editDistancePairs(df, "id", "s", maxEdits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k2.contains((2L, 3L, 2L))) // spork→sparks
    assert(k2.contains((3L, 4L, 2L))) // sparks→park
    assert(!k2.exists(_._3 > 2L))
    // brute-force equivalence law on pseudo-random short strings
    val rnd = new scala.util.Random(7)
    val strs = (0 until 40).map(i => (i.toLong, (0 until 3 + rnd.nextInt(5))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = Dedup.editDistancePairs(strs.toDF("id", "s"), "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("PCA: scatter matrix exact, known direction recovered, orthonormal, variance-ordered") {
    import graft.ops.Similarity
    // exact integer scatter vs brute force on crafted codes
    val codes = Seq(Seq(1, 2, 3), Seq(-1, 0, 4), Seq(2, 2, 2), Seq(0, -3, 1))
    val sc = Similarity.int8ScatterMatrix(
      codes.toDF("codes"), "codes", dim = 3).orderBy("i", "j").collect()
    for (r <- sc) {
      val (i, j) = (r.getInt(0), r.getInt(1))
      val want = codes.map(v => v(i).toLong * v(j)).sum
      assert(r.getLong(2) === want, s"scatter[$i][$j]")
    }
    // fit on points along a known direction (1,2,0)/√5 with tiny
    // orthogonal jitter: first component recovers the direction
    val dirV = Array(1.0, 2.0, 0.0).map(_ / math.sqrt(5.0))
    val pts = (0 until 200).map { i =>
      val t = (i % 41) - 20.0
      val eps = ((i * 7) % 11 - 5) * 0.01
      Seq(dirV(0) * t - eps * dirV(1), dirV(1) * t + eps * dirV(0), eps * 0.5)
    }
    val model = Similarity.pcaFit(pts.toDF("v"), "v", k = 3)
    val c0 = model.components(0)
    val align = math.abs(c0.zip(dirV).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"first component misaligned: $align")
    // orthonormal
    for (a <- model.components; b <- model.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"orthonormality: $dot vs $want")
    }
    // eigenvalues descending, and projections carry that variance order
    assert(model.eigenvalues.sliding(2).forall { case Array(x, y) => x >= y - 1e-12; case _ => true })
    val proj = pts.toDF("v")
      .select(Similarity.pcaProject(col("v"), model).as("p"))
      .collect().map(_.getSeq[Double](0))
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val vars = (0 until 3).map(d => variance(proj.map(_(d)).toSeq))
    assert(vars(0) >= vars(1) && vars(1) >= vars(2), s"variance order: $vars")
    // per-component projection variance equals the eigenvalue
    vars.zip(model.eigenvalues).foreach { case (v, e) =>
      assert(math.abs(v - e) < 1e-6 * math.max(1.0, e), s"var $v != eig $e") }
    // whitening: every kept output dimension has UNIT variance, and
    // vanishing-eigenvalue directions are dropped, not amplified
    val white = pts.toDF("v")
      .select(Similarity.pcaWhiten(col("v"), model).as("p"))
      .collect().map(_.getSeq[Double](0))
    assert(white.head.length <= 3)
    for (d <- white.head.indices) {
      val v = variance(white.map(_(d)).toSeq)
      assert(math.abs(v - 1.0) < 1e-6, s"whitened dim $d variance $v")
    }
  }

  test("mp4Parse: box walk, v0/v1 mvhd, largesize, track count, malformed → None") {
    import graft.ops.Multimodal
    // v0 synthetic: brand/timescale/duration/tracks round-trip
    val m = Multimodal.mp4Parse(Multimodal.syntheticMp4("isom", 600, 1800, 2))
    assert(m === Some(("isom", 600L, 3000L, 2))) // 1800 ticks @600 = 3s
    assert(Multimodal.mp4Parse(Multimodal.syntheticMp4("mp42", 1000, 1500, 0))
      === Some(("mp42", 1000L, 1500L, 0)))
    // version-1 mvhd: 64-bit times, timescale@+20, duration@+24
    val v1 = {
      val mvhdLen = 8 + 112 // v1 payload: 4 + 8 + 8 + 4 + 8 + 80
      val moovLen = 8 + mvhdLen + 8
      val bb = java.nio.ByteBuffer.allocate(16 + moovLen)
      bb.putInt(16); bb.put("ftyp".getBytes); bb.put("isom".getBytes); bb.putInt(0)
      bb.putInt(moovLen); bb.put("moov".getBytes)
      bb.putInt(mvhdLen); bb.put("mvhd".getBytes)
      bb.putInt(0x01000000) // version 1, flags 0
      bb.putLong(0L); bb.putLong(0L) // creation, modification (64-bit)
      bb.putInt(90000); bb.putLong(450000L) // timescale, duration → 5s
      bb.position(bb.position() + 80)
      bb.putInt(8); bb.put("trak".getBytes)
      bb.array()
    }
    assert(Multimodal.mp4Parse(v1) === Some(("isom", 90000L, 5000L, 1)))
    // 64-bit largesize header on a top-level box is walked correctly
    val large = {
      val inner = Multimodal.syntheticMp4("isom", 600, 600, 1)
      val free = java.nio.ByteBuffer.allocate(16 + 4)
      free.putInt(1); free.put("free".getBytes); free.putLong(20L); free.putInt(0)
      free.array() ++ inner
    }
    assert(Multimodal.mp4Parse(large) === Some(("isom", 600L, 1000L, 1)))
    // malformed: truncated, overlong box, not a box stream
    assert(Multimodal.mp4Parse(Multimodal.syntheticMp4("isom", 600, 600, 1)
      .dropRight(5)) === None)
    assert(Multimodal.mp4Parse("not an mp4 file at all".getBytes) === None)
    assert(Multimodal.mp4Parse(Array.empty[Byte]) === None)
  }

  test("pcm16Resample: identity = stats, 2:1 exact decimation, interpolated upsample") {
    import graft.ops.Multimodal
    val wav = Multimodal.syntheticWavSquare(16000, 5000, 4, 480)
    // identity resample reproduces pcm16Stats' moments exactly
    assert(Multimodal.pcm16Resample(wav, 16000, 16000)
      === Multimodal.pcm16Stats(wav))
    // 2:1 on an even half-period square: still a full-scale square
    val Some((n2, p2, ss2)) = Multimodal.pcm16Resample(wav, 16000, 8000)
    assert(n2 === 240L && p2 === 5000)
    assert(ss2 === 5000L * 5000L * 240L)
    // 1:2 upsample of a linear ramp: odd outputs are exact midpoints
    val ramp = Multimodal.syntheticWav(8000, 1, 16, 8)
    val bb = java.nio.ByteBuffer.wrap(ramp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(0, 10, 20, 30).zipWithIndex.foreach { case (v, i) =>
      bb.putShort(44 + 2 * i, v.toShort) }
    val Some((n3, p3, ss3)) = Multimodal.pcm16Resample(ramp, 8000, 16000)
    // out = 0,5,10,15,20,25,30 (m = (4-1)*2+1 = 7)
    assert(n3 === 7L && p3 === 30)
    assert(ss3 === Seq(0, 5, 10, 15, 20, 25, 30).map(v => v.toLong * v).sum)
    // non-WAV → None
    assert(Multimodal.pcm16Resample("junk".getBytes, 16000, 8000) === None)
  }

  test("Layout.compact: fewer files, identical content, ordered rewrite clusters") {
    import graft.ops.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = spark.range(0, 2000).select(col("id"), (col("id") % 7).as("k"))
    src.repartition(32).write.mode("overwrite").parquet(s"$tmp/frag")
    val (n0, bytes0) = Layout.parquetFootprint(spark, s"$tmp/frag")
    assert(n0 === 32L && bytes0 > 0L)
    // unordered coalesce: fewer files, same rows
    val st = Layout.compact(spark, s"$tmp/frag", s"$tmp/out", 1L << 30)
    assert(st.filesBefore === 32L && st.filesAfter === 1L)
    assert(spark.read.parquet(s"$tmp/out").orderBy("id").collect()
      === src.orderBy("id").collect())
    // ordered rewrite into 4 files: content equal AND id-ranges disjoint
    // across files (the clustering a sorted compaction exists for)
    val st2 = Layout.compact(spark, s"$tmp/frag", s"$tmp/out2",
      math.max(1L, bytes0 / 4), order = Seq("id"))
    assert(st2.filesAfter >= 2L && st2.filesAfter < 32L)
    assert(spark.read.parquet(s"$tmp/out2").orderBy("id").collect()
      === src.orderBy("id").collect())
    import org.apache.spark.sql.functions.{input_file_name, min => smin, max => smax}
    val ranges = spark.read.parquet(s"$tmp/out2")
      .groupBy(input_file_name().as("f"))
      .agg(smin("id").as("lo"), smax("id").as("hi"))
      .orderBy("lo").collect()
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1), "file id-ranges overlap")
      case _ =>
    }
  }

  test("curriculumOrder: ascending difficulty, md5 tie-break, dense 0-based rank") {
    import graft.ops.Batching
    val df = Seq((1L, 5L), (2L, 3L), (3L, 5L), (4L, 1L)).toDF("id", "d")
    val out = Batching.curriculumOrder(df, "id", col("d"))
      .orderBy("curriculum_rank").collect()
    // rank is dense 0..n-1 and difficulty is non-decreasing along it
    assert(out.map(_.getLong(out.head.fieldIndex("curriculum_rank"))).toSeq === Seq(0L, 1L, 2L, 3L))
    val diffs = out.map(_.getLong(out.head.fieldIndex("difficulty"))).toSeq
    assert(diffs === diffs.sorted)
    assert(diffs.head === 1L && diffs(1) === 3L) // easiest first
    // equal difficulty (ids 1,3) ordered by md5(id) — deterministic
    val tieOrder = out.filter(_.getLong(out.head.fieldIndex("difficulty")) == 5L)
      .map(_.getLong(out.head.fieldIndex("id"))).toSeq
    val expected = Seq(1L, 3L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
    assert(tieOrder === expected)
  }

  test("preferencePairs: argmax/argmin per group, tie-breaks, degenerate groups drop") {
    import graft.ops.Sampling
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), // clear max/min
      ("b", 4L, 7L), ("b", 5L, 7L),                   // tied score → id break
      ("c", 6L, 1L)                                   // single candidate → no pair
    ).toDF("g", "id", "s")
    val out = Sampling.preferencePairs(df, "g", "id", col("s"))
      .orderBy("g").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "a" && out(0).getLong(1) === 2L && out(0).getLong(3) === 1L)
    // tied scores: chosen = larger id, rejected = smaller id
    assert(out(1).getString(0) === "b" && out(1).getLong(1) === 5L && out(1).getLong(3) === 4L)
    // null scores are excluded before pairing
    val withNull = Seq(("d", 1L, Some(5L)), ("d", 2L, None), ("d", 3L, Some(9L)))
      .toDF("g", "id", "s")
    val p = Sampling.preferencePairs(withNull, "g", "id", col("s")).collect()
    assert(p.length === 1 && p(0).getLong(1) === 3L && p(0).getLong(3) === 1L)
  }

  test("stripHtml: element-content drop, tag strip, single-pass entity decode") {
    import graft.ops.TextAnalysis
    def strip(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.stripHtml(col("t"))).as[String].head()
    // script/style drop WITH content — a bare tag-stripper would leak "1 < 2"
    assert(strip("a<script>var x = 1 < 2;</script>b") === "a b")
    assert(strip("a<style media=\"all\">p{x:1}</style>b") === "a b")
    assert(strip("a<SCRIPT>x</SCRIPT>b") === "a b") // case-insensitive
    assert(strip("a<script>\nmulti\nline\n</script>b") === "a b") // DOTALL
    // comments and tags (with attributes, self-closing, across lines)
    assert(strip("<!-- note -->x<p class=\"y\">z</p><br/>") === "x z")
    assert(strip("<a\nhref=\"u\">link</a>") === "link")
    // entity decode, &amp; LAST: &amp;lt; yields the LITERAL "&lt;"
    assert(strip("&lt;b&gt; &quot;q&quot; &#39;a&#39; &amp;") === "<b> \"q\" 'a' &")
    assert(strip("&amp;lt;") === "&lt;")
    // whitespace collapse + trim
    assert(strip("  a   b  ") === "a b")
    // plain text passes through
    assert(strip("no markup here") === "no markup here")
  }

  test("ngramNovelty: known grams counted, novel fraction, gram-free docs null") {
    import graft.ops.TextAnalysis
    val ref = Seq("the quick brown fox").toDF("text")
    val docs = Seq(
      (1L, "the quick brown fox"),        // all 2 trigrams known
      (2L, "the quick brown elephant"),   // 1 of 2 known
      (3L, "completely novel words here"),// 0 of 2 known
      (4L, "too short")                   // no trigrams
    ).toDF("id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "id", "text", ref, "text", 3)
      .orderBy("id").collect()
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 2L && out(0).getDouble(3) === 0.0)
    assert(out(1).getLong(1) === 2L && out(1).getLong(2) === 1L && out(1).getDouble(3) === 0.5)
    assert(out(2).getLong(1) === 2L && out(2).getLong(2) === 0L && out(2).getDouble(3) === 1.0)
    assert(out(3).getLong(1) === 0L && out(3).isNullAt(3))
  }

  test("sourceOverlapMatrix: shared gram counts, totals, jaccard, ordering") {
    import graft.ops.TextAnalysis
    val df = Seq(
      ("a", "x y z w"),      // grams: {x y z, y z w}
      ("b", "x y z"),        // grams: {x y z}
      ("c", "p q r")         // grams: {p q r}
    ).toDF("source", "text")
    val out = TextAnalysis.sourceOverlapMatrix(df, "source", "text", 3)
      .orderBy("class_a", "class_b").collect()
    // only (a, b) share a gram; (a,c)/(b,c) produce no row (inner join)
    assert(out.length === 1)
    val r = out(0)
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getLong(2) === 2L && r.getLong(3) === 1L && r.getLong(4) === 1L)
    assert(r.getDouble(5) === 0.5) // 1 / (2 + 1 - 1)
  }

  test("Unigram LM: Viterbi beats greedy prefix, tie-break deterministic, UNK") {
    import graft.ops.Tokenizer
    val singles = (33 to 126).map(c => c.toChar.toString -> -10.0)
    val vocab = Tokenizer.UnigramVocab((singles :+ ("the" -> -25.0)).toMap)
    // Viterbi finds "the" MID-WORD — greedy longest-prefix (WordPiece
    // semantics) would emit 4 singles here
    assert(vocab.encodeWord("athe") === Vector("a", "the"))
    assert(vocab.encodeWord("theathe") === Vector("the", "a", "the"))
    // overlapping occurrences: only disjoint uses count (thethe → 2,
    // ththe → th + the chosen over t+h+t+h+e)
    assert(vocab.encodeWord("thethe") === Vector("the", "the"))
    assert(vocab.encodeWord("ththe").count(_ == "the") === 1)
    // segmentation is lossless
    for (w <- Seq("weather", "theorythe", "xyz"))
      assert(vocab.encodeWord(w).mkString === w, s"lossy for '$w'")
    // score dominates: "hello" as one piece beats cheaper-per-piece splits
    val v2 = Tokenizer.UnigramVocab(Map(
      "h" -> -3.0, "e" -> -3.0, "ll" -> -4.0, "o" -> -3.0, "hello" -> -9.0))
    assert(v2.encodeWord("hello") === Vector("hello"))
    // equal score → fewer pieces wins
    val v3 = Tokenizer.UnigramVocab(Map("a" -> -2.0, "aa" -> -4.0, "aaaa" -> -8.0))
    assert(v3.encodeWord("aaaa") === Vector("aaaa"))
    // uncovered position → whole-word UNK (WordPiece convention)
    assert(Tokenizer.UnigramVocab(Map("a" -> -1.0)).encodeWord("ab")
      === Vector("[UNK]"))
    // TSV round-trip: spm_export_vocab layout
    val parsed = Tokenizer.parseUnigram(Seq("the\t-25.0", "a\t-10.0", "junk"))
    assert(parsed.logProbs === Map("the" -> -25.0, "a" -> -10.0))
    // column API
    val df = Seq("athe hello", null).toDF("text")
    val counts = df.select(Tokenizer.unigramTokenCount(col("text"), vocab))
      .as[java.lang.Long].collect()
    assert(counts(0) === 7L) // a,the + h,e,l,l,o
    assert(counts(1) === null)
  }

  test("Unigram LM law on real docs: count equals the disjoint-'the' formula") {
    import graft.ops.Tokenizer
    val singles = (33 to 126).map(c => c.toChar.toString -> -10.0)
    val vocab = Tokenizer.UnigramVocab((singles :+ ("the" -> -25.0)).toMap)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(translate(col("text"), "'", " ").as("t")).as[String].take(50)
    for (t <- texts; w <- Tokenizer.preTokens(t)) {
      // left-to-right disjoint occurrence count == interval-scheduling
      // optimum for a fixed-length pattern (the oracle's replace() trick)
      val disjoint = (w.length - w.replace("the", "").length) / 3
      assert(vocab.encodeWord(w).size === w.length - 2 * disjoint,
        s"formula mismatch for '$w'")
    }
  }

  test("ListOps: pairwise/accumulate/countdown/reversePos/prefixes/intervals") {
    import graft.ops.ListOps
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("i", "v")
    val part = Seq.empty[org.apache.spark.sql.Column]
    val ord = Seq(col("i"))

    val pw = ListOps.pairwise(df, col("v"), part, ord)
      .orderBy("i").select("a", "b").as[(Double, Double)].collect()
    assert(pw.toSeq === Seq((10.0, 20.0), (20.0, 30.0))) // last row dropped

    val acc = ListOps.accumulate(df, col("v"), part, ord)
      .orderBy("i").select("sum_before").as[Double].collect()
    assert(acc.toSeq === Seq(0.0, 10.0, 30.0)) // sum of values BEFORE

    val cd = ListOps.countdown(df, part, ord)
      .orderBy("i").select("remaining").as[Long].collect()
    assert(cd.toSeq === Seq(2L, 1L, 0L))

    val rp = ListOps.reversePos(df, part, ord)
      .orderBy("i").select("rev_pos").as[Long].collect()
    assert(rp.toSeq === Seq(2L, 1L, 0L))

    val pf = ListOps.prefixes(df, col("i"), part, ord)
      .orderBy("i").select("prefix").as[Seq[Long]].collect()
    assert(pf.toSeq === Seq(Seq(1L), Seq(1L, 2L), Seq(1L, 2L, 3L)))

    // [floor(min), ceil(max)) covered; last pair clips (jx.py:1045-1056)
    val iv = ListOps.intervals(spark, 0, 23, 5).orderBy("lo")
      .as[(Long, Long)].collect()
    assert(iv.toSeq === Seq((0L, 5L), (5L, 10L), (10L, 15L), (15L, 20L), (20L, 23L)))
    assert(ListOps.intervals(spark, 2.3, 7.9, 10).as[(Long, Long)].collect().toSeq === Seq((2L, 8L)))
    assert(ListOps.intervals(spark, 5, 5, 1).count() === 0)
    // a non-positive size fails fast, not ArithmeticException/garbage
    intercept[IllegalArgumentException] { ListOps.intervals(spark, 0, 10, 0) }
    intercept[IllegalArgumentException] { ListOps.intervals(spark, 0, 10, -1) }
  }

  test("ListOps with partition keys distributes: no single-partition window in the plan") {
    import graft.ops.ListOps
    val df = spark.range(100).select((col("id") % 5).as("k"), col("id").as("v"))
    val keyed = ListOps.pairwise(df, col("v"), Seq(col("k")), Seq(col("v")))
    val plan = keyed.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"), s"expected a keyed window shuffle, got:\n$plan")
    assert(!plan.contains("SinglePartition"), "keyed ListOps must not serialize to one task")
    // per-key lists: each of the 5 keys drops exactly its own last row
    assert(keyed.count() === 95)

    // the global form (empty partition) is the documented driver-scale
    // path — still correct, just serialized
    val global = ListOps.pairwise(df, col("v"), Seq.empty, Seq(col("v")))
    assert(global.count() === 99)
  }

  test("langId(null) is null, not a fall-through language") {
    val df = Seq(Option.empty[String], Some("the cat and the dog")).toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(None, Some("en")))
  }

  test("fingerprint is whitespace/case-insensitive; rolling is order-sensitive") {
    val df = Seq(("a b c", "A  b   C", "c b a")).toDF("x", "y", "z")
    val r = df.select(
      TextAnalysis.fingerprint(col("x")) === TextAnalysis.fingerprint(col("y")),
      TextAnalysis.rollingFingerprint(col("x")) === TextAnalysis.rollingFingerprint(col("y")),
      TextAnalysis.rollingFingerprint(col("x")) === TextAnalysis.rollingFingerprint(col("z"))).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("TrimmedStats drops ceil(n*(1-middle)/2) per tail; all-trimmed is null") {
    import graft.functions.TrimmedStats
    // 10 values incl. outliers; middle=0.8 → ignore ceil(10*0.1)=1 per tail
    val df = Seq(1000.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, -999.0)
      .toDF("v").withColumn("g", lit(1))
    val r = df.groupBy(col("g")).agg(TrimmedStats(0.8)(col("v")).as("ts"))
      .select("ts.count", "ts.mean", "ts.min", "ts.max").collect()(0)
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) === 4.5) // mean of 1..8
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 8.0) // outliers gone
    // middle so small everything is trimmed → null stats
    val r2 = df.limit(2).groupBy(col("g")).agg(TrimmedStats(0.1)(col("v")).as("ts"))
      .select("ts.count", "ts.mean").collect()(0)
    assert(r2.getLong(0) === 0L && r2.isNullAt(1))
  }

  // -- multimodal ---------------------------------------------------------

  test("resizeMeta keeps imageMeta's integer schema and never upscales") {
    val withBin = Multimodal.withPayload(docs, "text")
    val m = Multimodal.imageMeta(col("content"))
    val r = Multimodal.resizeMeta(m, 128)
    val out = withBin.select(m.as("m"), r.as("r"))
    // same struct schema as imageMeta (review r9: double dims diverged)
    assert(out.schema("m").dataType === out.schema("r").dataType)
    val rows = out.select(col("m.width"), col("m.height"),
        col("r.width"), col("r.height"))
      .as[(Int, Int, Int, Int)].collect()
    rows.foreach { case (w, h, rw, rh) =>
      assert(math.max(rw, rh) <= math.max(128, 0), s"($w,$h)->($rw,$rh)")
      if (math.max(w, h) <= 128) // small images pass through unchanged
        assert((rw, rh) === ((w, h)), s"upscaled ($w,$h)->($rw,$rh)")
      else
        assert(math.max(rw, rh) === 128, s"($w,$h)->($rw,$rh)")
    }
  }

  test("centroids skips null embedding ELEMENTS instead of averaging them as zero") {
    val df = Seq(
      ("g", Seq[java.lang.Double](1.0, null)),
      ("g", Seq[java.lang.Double](3.0, 4.0))).toDF("src", "embedding")
    val out = Similarity.centroids(df, "src")
      .select("centroid", "n_vecs").collect().head
    // dim 0: (1+3)/2 = 2; dim 1: 4/1 = 4 (null skipped, review r9)
    assert(out.getSeq[Double](0).toSeq === Seq(2.0, 4.0))
    assert(out.getLong(1) === 2L) // n_vecs stays the row count
  }

  test("multimodal payload plumbing: meta from binary, batched decode agrees") {
    val withBin = Multimodal.withPayload(docs, "text")
    val viaColumns = withBin.select(col("doc_id"),
      Multimodal.imageMeta(col("content")).as("m"))
      .select(col("doc_id"), col("m.byte_len"), col("m.width"), col("m.height"))
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    val viaPartitions = Multimodal.decodePartitioned(
      withBin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])])
      .collect().sortBy(_.id).map(d => (d.id, d.byteLen, d.width, d.height))
    assert(viaColumns.toSeq === viaPartitions.toSeq)
  }

  // -- skew helpers -------------------------------------------------------

  test("saltedJoin equals plain join; twoPhaseAgg equals direct agg") {
    import graft.ops.Skew
    val e = SparkEntry.loader(spark, "/root/testdata/sf0.001")("events")
      .select(col("user_id"), col("value"))
    val dim = e.select(col("user_id")).distinct()
      .withColumn("tag", concat(lit("u"), col("user_id")))
    val plain = e.join(dim, Seq("user_id")).agg(count(lit(1)), sum(col("value"))).collect()(0)
    val salted = Skew.saltedJoin(e, dim, "user_id", salts = 8)
      .agg(count(lit(1)), sum(col("value"))).collect()(0)
    assert(plain.getLong(0) === salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
    // outer types would emit one null-extended copy of an unmatched
    // small row PER SALT — rejected up front (review r9)
    val exOuter = intercept[IllegalArgumentException] {
      Skew.saltedJoin(e, dim, "user_id", salts = 8, joinType = "full_outer")
    }
    assert(exOuter.getMessage.contains("per salt"))
    // a map-typed column must not break the salt derivation (xxhash64
    // rejects MapType; review r9)
    val withMap = e.withColumn("attrs", map(lit("a"), lit("b")))
    assert(Skew.saltedJoin(withMap, dim, "user_id", salts = 4).count() ===
      plain.getLong(0))

    val direct = e.groupBy(col("user_id")).agg(sum(col("value")).as("s"), count(lit(1)).as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), math.round(r.getDouble(1)*1e6), r.getLong(2)))
    val twoPhase = Skew.twoPhaseAgg(e, "user_id", salts = 8, Map(
      "s" -> (sum(col("value")), (c: String) => sum(col(c))),
      "n" -> (count(lit(1)), (c: String) => sum(col(c)))))
      .orderBy("user_id").collect().map(r => (r.getLong(0), math.round(r.getDouble(1)*1e6), r.getLong(2)))
    assert(direct.toSeq === twoPhase.toSeq)
  }

  test("hardNegatives: never a same-label neighbor, even when it is the nearest vector") {
    import graft.ops.Similarity
    val s = spark
    import s.implicits._
    // two tight clusters; each anchor's nearest vector shares its label,
    // so a top-k WITHOUT the mismatch filter would return it first
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.95f, 0.2f), 1),
      (10L, Array(0.0f, 1.0f), 2), (11L, Array(0.1f, 0.99f), 2),
      (12L, Array(0.2f, 0.95f), 3))
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(e, e.where(col("vec_id").isin(0L, 10L)), k = 2)
      .join(e.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      .join(e.select(col("vec_id").as("q_id"), col("label").as("q_label")), "q_id")
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getAs[Int]("n_label") != r.getAs[Int]("q_label")))
    // anchor 0 (label 0): nearest is 1 (label 0, excluded) → rank 1 = 2
    val top0 = got.filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Int]("rank") == 1)
    assert(top0.head.getAs[Long]("n_id") === 2L)
  }

  test("fakeEmbedding has requested dim and deterministic values") {
    val e1 = Multimodal.withPayload(docs, "text")
      .select(Multimodal.fakeEmbedding(col("content"), 8)).as[Seq[Double]].collect()
    assert(e1.forall(_.length == 8))
    assert(e1.forall(_.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("dedupLines removes cross-doc boilerplate, keeps blanks and rare lines") {
    val corpus = Seq(
      (1L, "unique opening one\nSubscribe   to our newsletter\n\nbody text one"),
      (2L, "unique opening two\nsubscribe to our newsletter\nbody text two"),
      (3L, "subscribe to  our   newsletter\nunique closing three"),
      (4L, "subscribe to our newsletter"), // ALL lines boilerplate
      (5L, "nothing shared here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(corpus, "doc_id", "text", minDocs = 3L)
      .orderBy("id")
      .select("id", "clean_text", "n_kept", "n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    // the newsletter line normalizes identically (case + ws collapse) in
    // docs 1-4 -> 4 distinct docs >= 3 -> removed everywhere; blank line
    // in doc 1 survives (blanks are never censused)
    assert(out(0) === ((1L, "unique opening one\n\nbody text one", 3L, 1L)))
    assert(out(1) === ((2L, "unique opening two\nbody text two", 2L, 1L)))
    assert(out(2) === ((3L, "unique closing three", 1L, 1L)))
    assert(out(3) === ((4L, "", 0L, 1L)), "fully-boilerplate doc -> empty, still present")
    assert(out(4) === ((5L, "nothing shared here", 1L, 0L)))
    // below threshold nothing is removed
    val none = TextAnalysis.dedupLines(corpus, "doc_id", "text", minDocs = 5L)
      .agg(sum("n_removed")).as[Long].collect().head
    assert(none === 0L)
  }

  test("epochShuffle: each epoch a deterministic permutation, epochs independent") {
    val ids = (0L until 100L).toDF("id")
    val e0 = Batching.epochShuffle(ids, "id", "seed", 0)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val e0again = Batching.epochShuffle(ids, "id", "seed", 0)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val e1 = Batching.epochShuffle(ids, "id", "seed", 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(e0.values.toSeq.sorted === (0L until 100L), "ranks are a permutation")
    assert(e1.values.toSeq.sorted === (0L until 100L))
    assert(e0 === e0again, "same (seed, epoch) -> same permutation")
    assert(e0 !== e1, "different epochs -> different permutations")
    // growth stability: adding a new id preserves the RELATIVE order of
    // the existing ids (their keys are unchanged; the insert just shifts
    // ranks) — the property that lets an epoch plan survive corpus growth
    val grown = Batching.epochShuffle((0L until 101L).toDF("id"), "id", "seed", 0)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val oldOrder = e0.toSeq.sortBy(_._2).map(_._1)
    val grownOrder = grown.toSeq.sortBy(_._2).map(_._1).filter(_ < 100L)
    assert(oldOrder === grownOrder)
  }

  test("radiusSearch: threshold semantics, self-exclusion, agrees with bruteForceTopK") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)), (2L, Array(0.0, 1.0)),
      (3L, Array(-1.0, 0.0)), (4L, Array(0.7, 0.7))
    ).toDF("vec_id", "embedding")
    val got = Similarity.radiusSearch(vecs, vecs.where($"vec_id" === 0L), minSim = 0.5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // cos(0,1)=0.9939, cos(0,4)=0.7071, cos(0,2)=0, cos(0,3)=-1
    assert(got === Set((0L, 1L), (0L, 4L)))
    // every radius hit at the top-k cutoff's sim appears in top-k and vice versa
    val topk = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 0L), k = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(topk === got, "k=2 neighbors of q0 are exactly its sim>=0.5 neighborhood")
  }

  test("lengthBucketBatches: power-of-two buckets, batch math, padding accounting") {
    // token counts: 1 -> bucket 0; 2,3 -> bucket 1; 4..7 -> bucket 2
    val d = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d"), (5L, "a b c d e"), (6L, "a b c d e f g"),
      (7L, ""), (8L, "   ") // zero-token docs excluded
    ).toDF("doc_id", "text")
    val out = Batching.lengthBucketBatches(d, "doc_id", "text", batchSize = 2)
      .orderBy("bucket", "batch")
      .select("bucket", "batch", "n_docs", "max_tok", "sum_tok", "pad_tok")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._3)).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      === Map(0L -> 1L, 1L -> 2L, 2L -> 3L))
    // bucket 2 has 3 docs -> batches of 2 + 1; every batch's padding =
    // n_docs*max - sum and is < batch max (same power-of-two magnitude)
    assert(out.count(_._1 == 2L) === 2)
    out.foreach { case (_, _, n, mx, sm, pad) =>
      assert(pad === n * mx - sm)
      assert(pad < mx, s"padding $pad must be below the batch max $mx")
    }
  }

  test("passageDupStats: planted chunk copies count against the non-canonical doc") {
    val w = (1 to 12).map("w" + _).mkString(" ")   // one full 12-token chunk
    val u = (1 to 12).map("u" + _).mkString(" ")
    val v = (1 to 12).map("v" + _).mkString(" ")
    val corpus = Seq(
      (10L, s"$w $u"),  // chunks: w, u
      (20L, s"$w $v"),  // w duplicates doc 10's; v unique
      (30L, v)          // v duplicates doc 20's chunk 1
    ).toDF("doc_id", "text")
    val out = Dedup.passageDupStats(corpus, "doc_id", "text", chunkTokens = 12)
      .orderBy("id").select("id", "n_chunks", "n_dup")
      .as[(Long, Long, Long)].collect().toSeq
    // canonical copies: w -> (10,0); v -> (20,1); so doc 10 has 0 dups,
    // doc 20 one (its w), doc 30 one (its v)
    assert(out === Seq((10L, 2L, 0L), (20L, 2L, 1L), (30L, 1L, 1L)))
  }

  test("pcm16Stats refuses non-canonical WAVs instead of reading fixed offsets") {
    val ok = Multimodal.syntheticWavSquare(8000, 500, 2, 16)
    assert(Multimodal.pcm16Stats(ok).contains((16L, 500, 16L * 500 * 500)))
    // same bytes but a LIST chunk where canonical layout puts data:
    // a real encoder's extra chunk must yield None, not garbage stats
    val listed = ok.clone()
    listed(36) = 'L'; listed(37) = 'I'; listed(38) = 'S'; listed(39) = 'T'
    assert(Multimodal.pcm16Stats(listed).isEmpty)
    // non-PCM audioFormat refused too
    val nonPcm = ok.clone(); nonPcm(20) = 3
    assert(Multimodal.pcm16Stats(nonPcm).isEmpty)
    // a corrupt u32 data size (high bit set) must clamp to the bytes
    // actually present, not go negative (review r9: signed getInt gave
    // Some((-k, 0, 0)))
    val huge = ok.clone()
    huge(40) = 0xF0.toByte; huge(41) = 0xFF.toByte
    huge(42) = 0xFF.toByte; huge(43) = 0xFF.toByte
    assert(Multimodal.pcm16Stats(huge).contains((16L, 500, 16L * 500 * 500)))
  }

  test("incremental dedup handles null text: indexed null drops arriving nulls") {
    val existing = Seq((1L, "alpha"), (2L, null: String)).toDF("doc_id", "text")
    val idx = Dedup.hashIndex(existing, "text")
    val delta = Seq((10L, null: String), (11L, "beta")).toDF("doc_id", "text")
    val surv = Dedup.dedupDeltaAgainstIndex(delta, "doc_id", "text", idx)
      .select("doc_id").as[Long].collect().toSeq
    assert(surv === Seq(11L), s"null-text doc must match the indexed null hash: $surv")
  }

  test("zValue fails loudly on out-of-range coordinates") {
    val bad = Seq((5, 70)).toDF("a", "b") // 70 >= 2^6
    val e = intercept[Exception] {
      bad.select(Layout.zValue(col("a"), col("b"), 6)).collect()
    }
    assert(e.getMessage.contains("zValue: input out of"), e.getMessage)
  }

  test("incremental dedup: index novelty + within-delta keep-one; index extension") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val idx = Dedup.hashIndex(existing, "text")
    val delta = Seq(
      (10L, "ALPHA   beta"),   // dup of indexed content (normalized) -> dropped
      (11L, "epsilon zeta"),   // novel -> survives
      (12L, "epsilon  ZETA"),  // within-delta dup of 11 -> keep-one drops it
      (13L, "eta theta")       // novel -> survives
    ).toDF("doc_id", "text")
    val surv = Dedup.dedupDeltaAgainstIndex(delta, "doc_id", "text", idx)
    assert(surv.select("doc_id").as[Long].collect().sorted.toSeq === Seq(11L, 13L))
    // extending the index makes a re-run of the same delta fully duplicate
    val idx2 = Dedup.extendHashIndex(idx, surv)
    assert(idx2.count() === 4)
    assert(Dedup.dedupDeltaAgainstIndex(delta, "doc_id", "text", idx2).count() === 0)
    // and the index round-trips parquet exactly (the persistence story)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hidx").toString
    idx2.write.mode("overwrite").parquet(tmp)
    val loaded = spark.read.parquet(tmp)
    assert(Dedup.dedupDeltaAgainstIndex(delta, "doc_id", "text", loaded).count() === 0)
  }

  test("nearDupDeltaLsh ≡ batch LSH pairs restricted to delta-involving pairs") {
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val a = Seq.tabulate(14)(i => s"a$i")
    val existing = Seq(
      doc(1L, a), doc(2L, Seq.tabulate(14)(i => s"b$i")),
      doc(3L, Seq.tabulate(14)(i => s"c$i"))).toDF("doc_id", "text")
    val delta = Seq(
      doc(10L, a.updated(13, "zz")),              // near-dup of 1 (j=10/14)
      doc(12L, a.updated(13, "zz").updated(12, "yy")), // near-dup of 1 AND 10
      doc(13L, Seq.tabulate(14)(i => s"d$i"))     // unique
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupDeltaLsh(delta, "doc_id", "text",
        Dedup.lshBandIndex(existing, "doc_id", "text"),
        Dedup.shingleSets(existing, "doc_id", "text"))
      .select("delta_id", "match_id").as[(Long, Long)].collect().toSet
    // the batch miner over existing ∪ delta, restricted to pairs with a
    // delta member, normalized to (delta-or-larger id, other id)
    val deltaIds = Set(10L, 12L, 13L)
    val want = Dedup.minhashLshPairs(existing.unionByName(delta), "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (x, y) => deltaIds(x) || deltaIds(y) }
      .map { case (x, y) => if (deltaIds(y)) (y, x) else (x, y) }.toSet
    assert(got === want)
    assert(got === Set((10L, 1L), (12L, 1L), (12L, 10L)))
  }

  test("aHash64: scale invariance, inversion distance, corruption tolerance") {
    val base = Multimodal.syntheticHalfPng(16, 16, 200, 200, 200, 50, 50, 50)
    val big = Multimodal.syntheticHalfPng(64, 64, 200, 200, 200, 50, 50, 50)
    val inv = Multimodal.syntheticHalfPng(16, 16, 50, 50, 50, 200, 200, 200)
    val h0 = Multimodal.aHash64(base).get
    assert(Multimodal.aHash64(big).get === h0, "same image at 4x scale -> same hash")
    assert(java.lang.Long.bitCount(h0 ^ Multimodal.aHash64(inv).get) === 64,
      "inverted halves -> all 64 bits flip")
    // perturbing one 2x2 source block shifts at most its own cell
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0x000000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val hp = Multimodal.aHash64(out.toByteArray).get
    assert(java.lang.Long.bitCount(h0 ^ hp) <= 1, "local edit -> near-dup distance")
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)).isEmpty, "garbage -> None")
  }

  test("native PNG codec: round-trip + bit-exact cross-decode against ImageIO") {
    // 1. encode -> decode round-trips pixels exactly
    val w = 23; val h = 11
    val px = Array.tabulate(w * h)(i => (i * 0x9E3779B9) & 0xFFFFFF)
    val enc = Multimodal.pngEncodeRgb(w, h, px)
    assert(Multimodal.pngDecodeRgb(enc).exists { case (dw, dh, dpx) =>
      dw == w && dh == h && dpx.sameElements(px) }, "native round-trip")
    // 2. ImageIO reads the native encoding to the same pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xFFFFFF) === px(y * w + x), s"($x,$y)")
    // 3. the native decoder reads an IMAGEIO-written PNG (arbitrary §9
    //    filters per row) to ImageIO's own getRGB values, bit-exact —
    //    the contract that lets aHash64 switch tiers without drift
    for (seed <- Seq(1L, 7L, 42L)) {
      val ioBytes = Multimodal.syntheticPngPixels(40, 30, seed)
      val Some((dw, dh, dpx)) = Multimodal.pngDecodeRgb(ioBytes)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ioBytes))
      assert(dw === ref.getWidth && dh === ref.getHeight)
      for (y <- 0 until dh; x <- 0 until dw)
        assert(dpx(y * dw + x) === (ref.getRGB(x, y) & 0xFFFFFF), s"seed $seed ($x,$y)")
    }
    // 4. out-of-profile payloads decline (caller falls back to ImageIO)
    assert(Multimodal.pngDecodeRgb(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.pngDecodeRgb(Multimodal.syntheticPng(8, 8)).isEmpty,
      "header-only PNG (no IDAT) must decline")
    assert(Multimodal.pngDecodeRgb(Multimodal.syntheticBmp(8, 8)).isEmpty)
    // truncated stream declines rather than returning garbage
    assert(Multimodal.pngDecodeRgb(enc.take(enc.length - 20)).isEmpty)
    // 5. hostile bytes DECLINE, never throw or hang (review r10):
    //    a) chunk length near 2^31 — an Int bound check would wrap
    //       negative, pass, and crash on the array copy
    val hugeLen = enc.clone()
    hugeLen(33) = 0x7F.toByte; hugeLen(34) = 0xFF.toByte // IDAT length field
    hugeLen(35) = 0xFF.toByte; hugeLen(36) = 0xF0.toByte
    assert(Multimodal.pngDecodeRgb(hugeLen).isEmpty, "huge chunk length must decline")
    //    b) zlib FDICT stream — inflate() returns 0 with
    //       needsDictionary(): without the stall guard the loop spins
    //       forever (asserted via the shared containment: returns None)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + 8 + 12)
    bb.put(sig)
    bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(2); bb.putInt(2); bb.put(8.toByte); bb.put(2.toByte)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.putInt(0) // crc ignored
    bb.putInt(8); bb.put("IDAT".getBytes("US-ASCII"))
    bb.put(0x78.toByte); bb.put(0xFB.toByte) // CMF/FLG with FDICT set (valid FCHECK)
    bb.putInt(0x11223344); bb.putShort(0.toByte); bb.putInt(0)        // dictid + junk + crc
    bb.putInt(0); bb.put("IEND".getBytes("US-ASCII")); bb.putInt(0)
    assert(Multimodal.pngDecodeRgb(bb.array()).isEmpty, "FDICT stream must decline, not hang")
    //    c) aHash64 inherits the no-throw contract for the same bytes —
    //       the native tier declines and ImageIO (which tolerates the
    //       bad chunk length and salvages the image) takes over, so
    //       the call completes with SOME result instead of crashing
    //       the task as the unguarded native tier did
    assert(Multimodal.aHash64(hugeLen).isDefined)
    //    d) allocation gate (review r11): an IHDR claiming 4096×4096 RGB
    //       (inside the 2^26-pixel cap) with a few-byte IDAT payload is
    //       geometrically impossible — deflate expands at most 1032:1 —
    //       and must be rejected BEFORE the ~50 MB scanline buffer is
    //       sized, not after a doomed inflate of it
    val bigClaim = java.nio.ByteBuffer.allocate(8 + 25 + 16 + 12)
    bigClaim.put(sig)
    bigClaim.putInt(13); bigClaim.put("IHDR".getBytes("US-ASCII"))
    bigClaim.putInt(4096); bigClaim.putInt(4096)
    bigClaim.put(8.toByte); bigClaim.put(2.toByte)
    bigClaim.put(0.toByte); bigClaim.put(0.toByte); bigClaim.put(0.toByte); bigClaim.putInt(0)
    bigClaim.putInt(4); bigClaim.put("IDAT".getBytes("US-ASCII"))
    bigClaim.putInt(0x789C0300) // 4 bytes of zlib-looking payload
    bigClaim.putInt(0)          // IDAT crc (ignored)
    bigClaim.putInt(0); bigClaim.put("IEND".getBytes("US-ASCII")); bigClaim.putInt(0)
    assert(Multimodal.pngDecodeRgb(bigClaim.array()).isEmpty,
      "geometry exceeding the IDAT payload's maximum inflation must decline pre-allocation")
  }

  test("hammingPairs64 pairs aHash images: near-dups meet, opposites never") {
    def png(l: Int, r: Int) = Multimodal.syntheticHalfPng(16, 16, l, l, l, r, r, r)
    val imgs = Seq(
      (1L, png(200, 50)), (2L, png(200, 50)),       // identical -> hamming 0
      (3L, png(50, 200)),                           // inverted  -> hamming 64
      (4L, png(120, 120))                           // solid     -> hash 0
    ).toDF("doc_id", "png").as[(Long, Array[Byte])]
    val hashed = Multimodal.aHashPartitioned(imgs).toDF()
    val pairs = Dedup.hammingPairs64(hashed, "id", "ahash", maxHamming = 3, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("zOrderWrite: every file covers a compact 2-D box; pruning beats a 1-D sort") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_xsort").toString
    Layout.zOrderWrite(grid, "a", "b", zDir, files = 8, bits = 6)
    grid.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(xDir)
    def filesContaining(dir: String, colName: String, v: Int): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(colName).as("lo"), max(colName).as("hi"))
        .where(col("lo") <= v && col("hi") >= v).count()
    // predicate on b: the a-sorted layout cannot prune (every file spans
    // all of b); the z-ordered layout confines b to per-file boxes
    val zHit = filesContaining(zDir, "b", 5)
    val xHit = filesContaining(xDir, "b", 5)
    assert(xHit === 8L, s"a-sorted baseline should span b everywhere: $xHit")
    assert(zHit < xHit && zHit <= 5L, s"z-order should prune on b: $zHit of 8")
    // and the key itself is the textbook interleave
    val z = grid.select(Layout.zValue(col("a"), col("b"), 6).as("z"))
      .as[Long].collect()
    assert(z.min === 0L && z.max === 4095L && z.distinct.length === 4096,
      "6+6-bit interleave is a bijection onto 0..4095")
  }

  test("typeTokenRatio and tokenizerFertility on crafted groups") {
    val d = Seq(
      ("a", "x y x y"), ("a", "x z"), ("b", "w w w w"), ("b", "   "),
      ("c", "it's 42 ok"), ("zh", "中文 文本")
    ).toDF("grp0", "text")
    val ttr = TextAnalysis.typeTokenRatio(d, "grp0", "text")
      .select("grp", "n_tokens", "n_distinct").as[(String, Long, Long)]
      .collect().toSet
    // a: 6 tokens {x,y,z}=3; b: 4 tokens {w}=1 (blank doc contributes 0)
    assert(ttr.contains(("a", 6L, 3L)) && ttr.contains(("b", 4L, 1L)))
    val fm = TextAnalysis.tokenizerFertility(d, "grp0", "text")
      .select("grp", "bpe_tokens", "words").as[(String, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // "it's 42 ok" -> [it, 's, 42, ok] = 4 bpe tokens over 3 words;
    // CJK: every char its own token -> 4 bpe tokens over 2 words
    assert(fm("c") === ((4L, 3L)))
    assert(fm("zh") === ((4L, 2L)))
    assert(fm("b") === ((4L, 4L)))
  }

  test("charEntropy: hand-computed bits on tiny alphabets") {
    val d = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd"), (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(d, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) === 1.0) // two symbols, equal counts → 1 bit
    assert(r(2L) === 0.0)
    assert(r(3L) === 2.0)
    assert(!r.contains(4L)) // empty doc absent
    // astral-plane chars count as ONE symbol (code points, not UTF-16
    // units — a surrogate-splitting tokenizer would report 1 bit here)
    val emoji = Seq((9L, "😀😀")).toDF("doc_id", "text")
    val re = TextAnalysis.charEntropy(emoji, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(re(9L) === 0.0)
  }

  test("compressionRatio: boilerplate compresses far below varied prose") {
    val rep = ("lorem ipsum " * 200).trim
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}x${i * 31 % 101}").mkString(" ")
    val d = Seq((1L, rep), (2L, varied), (3L, ""), (4L, null)).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1.0 else x.getDouble(3))).toMap
    assert(r(1L) < 0.05, s"repetitive text should crush: ${r(1L)}")
    assert(r(2L) > 3 * r(1L), s"varied text should compress far less: ${r(2L)} vs ${r(1L)}")
    assert(r(3L) === -1.0 && r(4L) === -1.0) // empty/null → null
  }

  test("nbScoreColumn: an empty model scores the bare prior (no NullType map)") {
    import graft.ops.Classifier
    // degenerate corpus: all text blank -> zero weights; the scorer must
    // emit the prior, not fail analysis on map_from_arrays of NullType
    // (review r9); the batch scorer already behaves this way
    val model = Classifier.NbModel(Map.empty, prior = 0.25)
    val out = Seq("anything at all").toDF("text")
      .select(Classifier.nbScoreColumn(col("text"), model).as("s"))
      .as[Double].head()
    assert(out === 0.25)
  }

  test("nbFit + nbScoreColumn: stream-serving scorer matches nbTrainScore") {
    val d = Seq((1L, "good good fine", 1), (2L, "bad awful", 0), (3L, "good bad", 1),
      (4L, " ", 0)).toDF("doc_id", "text", "y")
    val batch = Classifier.nbTrainScore(d, "doc_id", "text", col("y") === 1)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val model = Classifier.nbFit(d, "text", col("y") === 1)
    val served = d.select(col("doc_id"),
        Classifier.nbScoreColumn(col("text"), model).as("score"))
      .as[(Long, Double)].collect().toMap
    assert(served === batch)
  }

  test("bootstrapMeanCI: interval brackets the mean, invariant to partitioning") {
    val d = spark.range(1, 1001).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    val r = Profiling.bootstrapMeanCI(d, "id", "v", b = 40).head()
    assert(r.getLong(0) === 40L)
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mean === 500.5)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    // n=1000 uniform[1,1000]: se ≈ 9.1 → a 95% CI within ±40 of the mean
    assert(hi - lo < 80, s"CI implausibly wide: [$lo, $hi]")
    // deterministic draw: a different partitioning yields identical rows
    val r2 = Profiling.bootstrapMeanCI(d.repartition(13), "id", "v", b = 40).head()
    assert(r2.getDouble(2) === lo && r2.getDouble(3) === hi)
    // null values are EXCLUDED from the resamples, not averaged as 0:
    // adding null rows must leave the CI around the non-null mean
    // (review r9: their weight counted in sum(w) and dragged means down)
    val withNulls = d.unionByName(
      spark.range(2000, 2500).selectExpr("id", "CAST(NULL AS DOUBLE) AS v"))
    val r3 = Profiling.bootstrapMeanCI(withNulls, "id", "v", b = 40).head()
    assert(r3.getDouble(1) === 500.5)
    assert(r3.getDouble(2) < 500.5 && 500.5 < r3.getDouble(3),
      s"CI [${r3.getDouble(2)}, ${r3.getDouble(3)}] must bracket 500.5")
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG on a 3-doc run") {
    val runs = Seq(("q1", 1, 10L), ("q1", 2, 99L), ("q1", 3, 11L)).toDF("qid", "rank", "id")
    val rel = Seq(("q1", 10L), ("q1", 11L), ("q1", 12L), ("q2", 50L)).toDF("qid", "id")
    val out = Evaluation.rankingMetrics(runs, rel, k = 3)
      .orderBy("qid").collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val l2 = (x: Double) => math.log(x) / math.log(2.0)
    // q1: hits at ranks 1, 3 → recall 2/3, mrr 1, dcg 1 + 1/log2(4)
    assert(out(0).getDouble(1) === r6(2.0 / 3))
    assert(out(0).getDouble(2) === 1.0)
    val idcg3 = 1.0 + 1.0 / l2(3) + 1.0 / l2(4)
    assert(out(0).getDouble(3) === r6((1.0 + 0.5) / idcg3))
    // q2 has relevance but no run rows → all zeros (not excluded)
    assert(out(1).getDouble(1) === 0.0 && out(1).getDouble(2) === 0.0 &&
      out(1).getDouble(3) === 0.0)
    // duplicated relevance rows must not inflate hits/DCG (nDCG ≤ 1)
    val dupRel = rel.union(rel)
    val out2 = Evaluation.rankingMetrics(runs, dupRel, k = 3).orderBy("qid").collect()
    assert(out2(0).getDouble(1) === out(0).getDouble(1) &&
      out2(0).getDouble(3) === out(0).getDouble(3))
    // duplicated RUN rows must not inflate either (review r9): the same
    // relevant doc listed at two ranks counts once, at its best rank
    val dupRuns = runs.union(Seq(("q1", 3, 10L)).toDF("qid", "rank", "id"))
    val out3 = Evaluation.rankingMetrics(dupRuns, rel, k = 3).orderBy("qid").collect()
    assert(out3(0).getDouble(1) === out(0).getDouble(1) &&
      out3(0).getDouble(2) === out(0).getDouble(2) &&
      out3(0).getDouble(3) === out(0).getDouble(3))
  }

  test("calibrationError: hand-computed ECE and Brier on two bins") {
    // bin 0 (p<0.1? no — bins of width .1): p=.05 y=0; p=.95,.95 y=1,0
    val d = Seq((0.05, 0), (0.95, 1), (0.95, 0)).toDF("p", "y")
    val r = Evaluation.calibrationError(d, "p", "y", bins = 10).head()
    // bin0: n=1 acc=0 conf=.05 |d|=.05; bin9: n=2 acc=.5 conf=.95 |d|=.45
    val ece = (0.05 * 1 + 0.45 * 2) / 3
    val brier = (0.05 * 0.05 + 0.05 * 0.05 + 0.95 * 0.95) / 3
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === r6(ece))
    assert(r.getDouble(2) === r6(brier))
    // p = 1.0 lands in the top bin, not bin 10
    val edge = Seq((1.0, 1)).toDF("p", "y")
    assert(Evaluation.calibrationError(edge, "p", "y").head().getDouble(1) === 0.0)
  }

  test("associationRules: hand-computed lift on three baskets") {
    val baskets = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"))
      .toDF("order_id", "item")
    val out = Graph.associationRules(baskets, "order_id", "item", minPairCount = 2L)
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // x,y co-occur in 2 of 3 baskets; cx=3, cy=2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(("x", "y")) === ((2L, r6(2.0 / 3), r6(2.0 / 3), 1.0)))
    assert(out(("y", "x")) === ((2L, r6(2.0 / 3), 1.0, 1.0)))
    assert(!out.contains(("x", "z"))) // pair count 1 < minPairCount
  }

  test("binaryAuc: midrank tie handling matches the hand-computed U") {
    val d = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.3, 0)).toDF("score", "y")
    val r = Evaluation.binaryAuc(d, "score", "y").head()
    // U = 1·(1 + 0.5) + 1·(2 + 0) = 3.5 → AUC = 3.5/4
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.875)))
    // perfect separation → 1.0
    val p = Seq((0.9, 1), (0.1, 0)).toDF("score", "y")
    assert(Evaluation.binaryAuc(p, "score", "y").head().getDouble(2) === 1.0)
  }

  test("ksStatistic: hand-computed max ECDF gap; identical slices give 0") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Evaluation.ksStatistic(d, "g", "v", "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.5)))
    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0)).toDF("g", "v")
    assert(Evaluation.ksStatistic(same, "g", "v", "a", "b").head().getDouble(2) === 0.0)
    // null values carry no distribution mass (review r9: they formed a
    // spurious smallest-value group and inflated n_a)
    val withNull = d.unionByName(Seq(("a", Option.empty[Double]),
      ("a", Option.empty[Double])).toDF("g", "v"))
    val rn = Evaluation.ksStatistic(withNull, "g", "v", "a", "b").head()
    assert((rn.getLong(0), rn.getLong(1), rn.getDouble(2)) === ((2L, 2L, 0.5)))
  }

  test("chiSquareIndependence: perfect association on a 2x2 diagonal") {
    val rows = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s2", "fr"))
    val r = Evaluation.chiSquareIndependence(rows.toDF("src", "lg"), "src", "lg").head()
    // e = 5 everywhere → χ² = 4·(5²/5) = 20, dof = 1
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((20L, 1L, 20.0)))
    // independence → 0
    val ind = Seq(("s1", "en"), ("s1", "fr"), ("s2", "en"), ("s2", "fr"))
    assert(Evaluation.chiSquareIndependence(ind.toDF("src", "lg"), "src", "lg")
      .head().getDouble(2) === 0.0)
  }

  test("averagePrecision: step-rule AP with a tied group") {
    // desc: 0.9 (pos) → precision 1, ΔR = 1/2; tied 0.5 group
    // (1 pos, 1 neg) → precision at group end = 2 pos of 3 seen = 2/3
    val d = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)).toDF("score", "y")
    val r = Evaluation.averagePrecision(d, "score", "y").head()
    val ap = (1.0 * 1.0 + 1.0 * (2.0 / 3)) / 2
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDouble(2) === math.rint(ap * 1e6) / 1e6)
    // perfect ranking → AP = 1
    val p = Seq((0.9, 1), (0.1, 0)).toDF("score", "y")
    assert(Evaluation.averagePrecision(p, "score", "y").head().getDouble(2) === 1.0)
  }

  test("cohensKappa: hand-computed 2x2 agreement") {
    val d = Seq((true, true), (true, false), (false, false), (false, false))
      .toDF("a", "b")
    val r = Evaluation.cohensKappa(d, "a", "b").head()
    // po = 3/4; pe = 0.5·0.25 + 0.5·0.75 = 0.5 → kappa = 0.5
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) === ((4L, 0.75, 0.5)))
  }

  test("passAtK: telescoped product matches the combinatorial formula") {
    val d = Seq(("t1", 10L, 3L), ("t2", 10L, 7L), ("t3", 3L, 1L), ("t4", 8L, 0L))
      .toDF("task", "n", "c")
    val out = Evaluation.passAtK(d, k = 5)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out("t1") === math.rint((1.0 - 2520.0 / 30240.0) * 1e6) / 1e6) // 1 − C(7,5)/C(10,5)
    assert(out("t2") === 1.0) // n − c = 3 < 5 → some success guaranteed
    assert(out("t4") === 0.0) // zero successes
    assert(!out.contains("t3")) // n < k → estimator undefined, excluded
  }

  test("Rollup: chained increment merges equal the batch aggregate; new keys survive") {
    val all = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0), ("c", -3.0), ("b", 4.0))
      .toDF("k", "v")
    val batch = Rollup.aggDelta(all, Seq("k"), "v")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    val inc = Rollup.merge(
      Rollup.aggDelta(all.limit(2), Seq("k"), "v"),
      Rollup.aggDelta(all.except(all.limit(2)), Seq("k"), "v"), Seq("k"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(inc === batch)
    // a key present in only one side of the merge survives with its own stats
    val m = Rollup.merge(
      Rollup.aggDelta(Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), "v"),
      Rollup.aggDelta(Seq(("y", 9.0)).toDF("k", "v"), Seq("k"), "v"), Seq("k"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(m === Set(("x", 1L, 1.0, 1.0, 1.0), ("y", 1L, 9.0, 9.0, 9.0)))
  }

  test("Rollup.retract: undoes a merge on cnt/sum, drops emptied keys, rejects overdrafts") {
    val first = Rollup.aggDelta(Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"), Seq("k"), "v")
    val second = Rollup.aggDelta(Seq(("a", 4.0)).toDF("k", "v"), Seq("k"), "v")
    val state = Rollup.merge(first, second, Seq("k"))
    val undone = Rollup.retract(state, second, Seq("k"))
      .as[(String, Long, Double)].collect().toSet
    assert(undone === Set(("a", 2L, 3.0), ("b", 1L, 5.0)))
    // retracting everything under a key drops the key
    val gone = Rollup.retract(undone.toSeq.toDF("k", "cnt", "sum_v")
        .withColumn("min_v", lit(null).cast("double"))
        .withColumn("max_v", lit(null).cast("double")),
      first, Seq("k")).count()
    assert(gone === 0)
    // over-retraction fails fast rather than going negative
    intercept[Exception] {
      Rollup.retract(state, Rollup.merge(state, second, Seq("k")), Seq("k")).collect()
    }
  }

  test("budgetAllocate: capped source redistributes its share by water filling") {
    // caps: a=300·2=600, b=1000·2=2000, c=1000·2=2000; budget 3000
    // round 1 (w 2:1:1): a +1500→cap 600, b +750, c +750 → spent 2100
    // round 2 (uncapped w 1:1, rem 900): b +450, c +450 → 600/1200/1200
    val counts = Seq(("a", 300L, 2.0), ("b", 1000L, 1.0), ("c", 1000L, 1.0))
      .toDF("source", "tokens", "weight")
    val out = Sampling.budgetAllocate(counts, budget = 3000L, maxEpochs = 2.0)
      .select("source", "cap", "alloc", "epochs")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") === ((600L, 600L, 2.0)))
    assert(out("b") === ((2000L, 1200L, 1.2)))
    assert(out("c") === ((2000L, 1200L, 1.2)))
    // a null weight fails fast instead of silently taking its full cap
    val bad = Seq(("a", 300L, Some(2.0)), ("b", 1000L, None))
      .toDF("source", "tokens", "weight")
    intercept[Exception] {
      Sampling.budgetAllocate(bad, budget = 1000L, maxEpochs = 2.0).collect()
    }
  }

  test("resampleLocf: gaps fill forward, grid spans each key's own range") {
    val e = Seq(
      ("u1", "2024-01-01 00:10:00", 1.0),
      ("u1", "2024-01-01 00:40:00", 2.0),   // same bucket, later ts wins
      ("u1", "2024-01-01 03:05:00", 9.0),   // 2-hour gap → two filled rows
      ("u2", "2024-01-01 05:00:00", 7.0)    // independent grid
    ).toDF("user_id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val out = Sessions.resampleLocf(e, "user_id", "ts", "v", stepSec = 3600)
      .select(col("key"), date_format(col("bucket"), "HH").as("h"),
        col("value"), col("filled"))
      .as[(String, String, Option[Double], Double)].collect().toSet
    assert(out === Set(
      ("u1", "00", Some(2.0), 2.0), ("u1", "01", None, 2.0),
      ("u1", "02", None, 2.0), ("u1", "03", Some(9.0), 9.0),
      ("u2", "05", Some(7.0), 7.0)))
  }

  test("resampleLocf: exact-ts collisions keep the larger value, nulls lose ties (r13 argmax rewrite)") {
    // pins the (ts desc, value desc) pick order through the r13
    // max(struct) rewrite: same-bucket same-ts rows must resolve by
    // value desc, and a null value at the winning ts must lose to a
    // non-null one at the same ts (struct comparison sorts null fields
    // below non-null, matching the old window's desc-NULLS-LAST)
    val e = Seq(
      ("u1", "2024-01-01 00:30:00", Some(1.0)),
      ("u1", "2024-01-01 00:30:00", Some(5.0)),  // exact tie → larger value
      ("u2", "2024-01-01 00:30:00", None),
      ("u2", "2024-01-01 00:30:00", Some(3.0))   // null loses the tie
    ).toDF("user_id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val out = Sessions.resampleLocf(e, "user_id", "ts", "v", stepSec = 3600)
      .select(col("key"), col("value")).as[(String, Option[Double])].collect().toSet
    assert(out === Set(("u1", Some(5.0)), ("u2", Some(3.0))))
  }

  test("cohortRetention: hand-built weekly matrix with per-cohort rates") {
    val e = Seq(
      ("A", "2024-01-02 10:00:00"), ("A", "2024-01-09 10:00:00"),
      ("B", "2024-01-03 10:00:00"),
      ("C", "2024-01-10 10:00:00")
    ).toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val m = Funnel.cohortRetention(e, "user_id", "ts")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("c"),
        col("offset_w"), col("users"), col("rate"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(m === Set(
      ("2024-01-01", 0, 2L, 1.0), ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("zipfFit: an exact 1/rank law recovers slope -1") {
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(d, "text", topN = 4).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === -1.0) // counts 12/rank → ln(c) = ln 12 − ln(rank)
    assert(r.getDouble(2) === math.rint(math.log(12.0) * 1e6) / 1e6)
  }

  test("routeToCentroids: axis geometry, rounded sims, larger-label tiebreak") {
    val d = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.6f, 0.8f)), (4L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val r = Similarity.routeToCentroids(d, "embedding", cents)
      .select("vec_id", "route_label", "route_sim")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) === ((0L, 1.0)) && r(2L) === ((1L, 1.0)))
    assert(r(3L) === ((1L, 0.8)))
    assert(r(4L)._1 === 1L) // exact tie on rounded sim → larger label
    // a single-centroid deployment routes everything there (greatest()
    // needs two args — the one-arm case must short-circuit)
    val one = Similarity.routeToCentroids(d, "embedding", Seq(7L -> Array(1.0, 0.0)))
      .select("route_label").distinct().as[Long].collect()
    assert(one.toSeq === Seq(7L))
  }

  test("knnJoinIvf: full-probe join equals brute force; partial probe keeps recall") {
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 37 + d * 11).toFloat))
    }
    val e = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.ivfFitCentroids(e, nlist = 6)
    val brute = Similarity.bruteForceTopK(e, e, k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    // nprobe = nlist probes every cell → candidates are the whole
    // corpus and the join must reproduce brute force exactly
    val full = Similarity.knnJoinIvf(e, k = 1, cents, nprobe = 6)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    assert(full === brute)
    // partial probe: approximate, but most top-1s survive
    val part = Similarity.knnJoinIvf(e, k = 1, cents, nprobe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val recall = part.count { case (q, n) => brute.get(q).contains(n) } / 120.0
    assert(recall >= 0.6, s"nprobe=2 top-1 recall collapsed: $recall")
  }

  test("bitextMine: planted translation pairs mine at the hand-computed margin") {
    val xs = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val ys = Seq((11L, Array(1f, 0f, 0f, 0f)),       // exact copy of x1
                 (12L, Array(0f, 0.9f, 0.1f, 0f)),   // near-copy of x2
                 (13L, Array(0f, 0f, 0f, 1f))        // orthogonal to both
      ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(xs, ys, k = 2, threshold = 1.0)
      .orderBy("x_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 11L), (2L, 12L)))
    // x1↔y1: cos=1; avgK(x1)=(1+0)/2, avgK(y1)=(1+0)/2 → margin = 1/0.5 = 2
    assert(out(0).getDouble(2) === 2.0)
  }

  test("skipGramPairs: exact pair multiset on a 3-token doc") {
    val d = Seq((1L, "a b c"), (2L, " ")).toDF("doc_id", "text")
    val w1 = TextAnalysis.skipGramPairs(d, "text", window = 1)
      .as[(String, String, Long)].collect().toSet
    assert(w1 === Set(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L)))
    val w2 = TextAnalysis.skipGramPairs(d, "text", window = 2)
      .as[(String, String, Long)].collect().toSet
    assert(w2 === w1 ++ Set(("a", "c", 1L), ("c", "a", 1L)))
  }

  test("pmiCollocations: a glued bigram outranks independent co-occurrences") {
    // "new york" always adjacent (PMI high); "the" pairs with everything
    val rows = (0 until 20).map(i => (i.toLong, s"the new york office w${i % 4} the end"))
    val d = rows.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(d, "text", minCount = 5, k = 10)
      .collect()
    assert(out.head.getString(1) === "new" && out.head.getString(2) === "york")
    // pmi(new york): c=20, ca=cb=20; hand-check against the formula
    val total = 20.0 * 7; val btotal = 20.0 * 6
    val pmi = math.log((20 / btotal) / ((20 / total) * (20 / total)))
    assert(out.head.getDouble(4) === math.rint(pmi * 1e6) / 1e6)
    // ranks are 1..n with no gaps
    assert(out.map(_.getInt(0)).toSeq === (1 to out.length).toSeq)
  }

  test("labelPropagation: two cliques joined by one bridge edge split into two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3–10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((3L, 10L), (10L, 3L))).toDF("src", "dst")
    val out = Graph.labelPropagation(e, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert(Set(10L, 11L, 12L).map(out).size === 1, "right clique fragmented")
    assert(out(11L) !== out(1L), "bridge merged the cliques")
    // an isolated self-pair keeps its own smaller label
    val iso = Graph.labelPropagation(Seq((100L, 101L), (101L, 100L)).toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(iso(100L) === 100L || iso(100L) === 101L)
  }

  test("Graph.pageRank: one hand-computed iteration on a 3-node graph") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // r0=1/3 each; deg 1:2, 2:1, 3:1 → r1(1)=.05+.85/3, r1(2)=.05+.85/6, r1(3)=.05+.85/2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r(1L) === r6(0.05 + 0.85 / 3))
    assert(r(2L) === r6(0.05 + 0.85 / 6))
    assert(r(3L) === r6(0.05 + 0.85 / 2))
  }

  test("Graph.coOccurrenceEdges + pageRank: the hub item of every basket ranks first") {
    val baskets = Seq(
      (10L, 99L), (10L, 1L), (10L, 2L),
      (11L, 99L), (11L, 3L),
      (12L, 99L), (12L, 4L), (12L, 5L)
    ).toDF("order_id", "item")
    val edges = Graph.coOccurrenceEdges(baskets, "order_id", "item")
    // symmetric, no self-loops
    assert(edges.where(col("src") === col("dst")).count() === 0)
    val pairs = edges.as[(Long, Long)].collect().toSet
    assert(pairs.contains((99L, 1L)) && pairs.contains((1L, 99L)))
    assert(!pairs.contains((1L, 3L))) // different baskets never pair
    val top = Graph.pageRank(edges, iters = 3)
      .orderBy(col("rank").desc, col("id")).head()
    assert(top.getLong(0) === 99L, s"hub item should rank first: $top")
  }

  test("lsiPowerIteration: hand-unrolled two rounds on a 3-doc corpus") {
    // counts — d1: a,b · d2: a,c · d3: a,a,d
    // u1 = doc lengths (2,2,3); v1 = (a 10, b 2, c 2, d 3)
    // u2 = (12, 12, 23);        v2 = (a 70, b 12, c 12, d 23)
    val d = Seq("a b", "a c", "a a d").toDF("text")
    val out = TextAnalysis.lsiPowerIteration(d, "text", iters = 2, k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val n = math.sqrt(70.0 * 70 + 144 + 144 + 23.0 * 23)
    assert(out.head === ((1, "a", r6(70 / n)))) // the everywhere-term dominates
    assert(out(1) === ((2, "d", r6(23 / n))))
    assert(out(2) === ((3, "b", r6(12 / n)))) // tie with c → term order
    assert(out(3) === ((4, "c", r6(12 / n))))
  }

  test("dbscan2d: two clusters, a border point, and noise classified by hand") {
    // cluster A: 4 mutually-eps-close points (all core); id 5 touches
    // only ONE core (border); id 6 isolated (noise); cluster B: a
    // 3-point chain, each with 2 neighbors + self = minPts (all core).
    // Points deliberately straddle eps-grid cell boundaries so the 3×3
    // probe is exercised.
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.01, 0.0), (3L, 0.0, 0.01), (4L, 0.01, 0.01),
      (5L, 0.03, 0.0),
      (6L, 0.2, 0.2),
      (7L, 1.0, 1.0), (8L, 1.01, 1.0), (9L, 1.0, 1.01)
    ).toDF("id", "x", "y")
    val out = Similarity.dbscan2d(pts, "id", "x", "y", eps = 0.02, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2))).toMap
    for (i <- 1L to 4L) assert(out(i) === ((1L, "core")), s"point $i: ${out(i)}")
    assert(out(5L) === ((1L, "border")))
    assert(out(6L) === ((-1L, "noise")))
    for (i <- 7L to 9L) assert(out(i) === ((7L, "core")), s"point $i: ${out(i)}")
    // minPts = 1: EVERY point is core (|N_eps| >= 1 with self always
    // holds) — an isolated point is a singleton-cluster core, never
    // noise (review r9: pair-derived cores silently demoted it)
    val out1 = Similarity.dbscan2d(pts, "id", "x", "y", eps = 0.02, minPts = 1)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2))).toMap
    assert(out1(6L) === ((6L, "core")))
    assert(out1.values.forall(_._2 == "core"))
  }

  test("mannKendall: hand-computed S, tie-corrected variance, continuity-corrected z") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val up = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("t", "x")
    val r1 = Evaluation.mannKendall(up, "t", "x").head()
    assert(r1.getLong(0) === 3L && r1.getLong(1) === 3L)
    assert(r1.getDouble(2) === r6(66.0 / 18))
    assert(r1.getDouble(3) === r6(2.0 / math.sqrt(66.0 / 18)))
    // tie group {1,1}: tt = 2·1·9 = 18 → var = (66−18)/18
    val tied = Seq((1, 1.0), (2, 1.0), (3, 2.0)).toDF("t", "x")
    val r2 = Evaluation.mannKendall(tied, "t", "x").head()
    assert(r2.getLong(1) === 2L && r2.getDouble(2) === r6(48.0 / 18))
    assert(r2.getDouble(3) === r6(1.0 / math.sqrt(48.0 / 18)))
    // flat series: S = 0 → z = 0 (continuity correction must not fire)
    val flat = Seq((1, 5.0), (2, 5.0)).toDF("t", "x")
    assert(Evaluation.mannKendall(flat, "t", "x").head().getDouble(3) === 0.0)
  }

  test("klBySource: hand-computed divergence; identical source diverges zero") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val d = Seq(("A", "x x y"), ("B", "x y y y")).toDF("source", "text")
    val out = TextAnalysis.klBySource(d, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val klA = (2.0 / 3) * math.log((2.0 / 3) / (3.0 / 7)) +
      (1.0 / 3) * math.log((1.0 / 3) / (4.0 / 7))
    val klB = (1.0 / 4) * math.log((1.0 / 4) / (3.0 / 7)) +
      (3.0 / 4) * math.log((3.0 / 4) / (4.0 / 7))
    assert(out("A") === ((3L, r6(klA))))
    assert(out("B") === ((4L, r6(klB))))
    // a single source IS the corpus → KL = 0
    val one = Seq(("A", "p q q")).toDF("source", "text")
    assert(TextAnalysis.klBySource(one, "source", "text").head().getDouble(2) === 0.0)
  }

  test("ecdfNormalize: within-group percentiles, ties share the upper step") {
    val d = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 4.0), ("B", 5.0))
      .toDF("g", "v")
    val out = Profiling.ecdfNormalize(d, "g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("A", 1.0)) === 0.25)
    assert(out(("A", 2.0)) === 0.75) // both tied rows map to P(X ≤ 2) = 3/4
    assert(out(("A", 4.0)) === 1.0)
    assert(out(("B", 5.0)) === 1.0)  // group B normalized against itself only
    // ADVICE r8: rows with a null group or value must SURVIVE (the old
    // inner join dropped them while still counting them in the totals)
    val withNulls = Seq((Some("A"), Some(1.0)), (Some("A"), None),
      (None, Some(2.0)), (None, Some(4.0))).toDF("g", "v")
    val out2 = Profiling.ecdfNormalize(withNulls, "g", "v")
    assert(out2.count() === 4L)
    // null group = its own population, normalized null-safely
    val nullG = out2.where(col("g").isNull).collect()
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(nullG === Map(2.0 -> 0.5, 4.0 -> 1.0))
    // null value: no percentile, and excluded from A's population (1.0 is 1/1)
    assert(out2.where(col("g") === "A" && col("v").isNull).head().isNullAt(2))
    assert(out2.where(col("g") === "A" && col("v") === 1.0).head().getDouble(2) === 1.0)
  }

  test("benfordAudit: digit census with exclusions and zero-observed inflation") {
    val d = Seq(Some(1.5), Some(19.0), Some(2.0), Some(0.5), Some(-30.0), None, Some(95.0))
      .toDF("v")
    val out = Profiling.benfordAudit(d, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // |v| < 1 and null excluded; -30 → digit 3 via abs; n = 5
    assert(out.values.map(_._1).sum === 5L)
    assert(out(1)._1 === 2L && out(2)._1 === 1L && out(3)._1 === 1L && out(9)._1 === 1L)
    // a digit Benford predicts but the data never produces: χ² = n·p
    assert(out(4)._1 === 0L)
    assert(out(4)._3 === math.rint(5 * 0.09691 * 1e6) / 1e6)
    assert(out.size === 9)
  }

  test("giniCoefficient: uniform is 0, full concentration approaches (n-1)/n") {
    val even = Seq(7.0, 7.0, 7.0, 7.0).toDF("v")
    val g1 = Profiling.giniCoefficient(even, "v").head()
    assert(g1.getLong(0) === 4L && g1.getDouble(2) === 0.0)
    // [0,0,0,10]: Σi·x = 4·10, G = 2·40/(4·10) − 5/4 = 0.75 = (n−1)/n
    val conc = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    assert(Profiling.giniCoefficient(conc, "v").head().getDouble(2) === 0.75)
  }

  test("weightedTake: Efraimidis-Spirakis ranks match a local replay; zero weights excluded") {
    val d = Seq((1L, 10.0), (2L, 1.0), (3L, 100.0), (4L, 0.0), (5L, 50.0), (6L, 5.0))
      .toDF("doc_id", "w")
    val out = Sampling.weightedTake(d, "doc_id", "w", k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967297.0
      math.log(u) / w
    }
    val expect = Seq(1L, 2L, 3L, 5L, 6L) // id 4 excluded: zero weight
      .map(id => id -> key(id, Map(1L -> 10.0, 2L -> 1.0, 3L -> 100.0,
        5L -> 50.0, 6L -> 5.0)(id)))
      .sortBy { case (id, k) => (-k, id) }.take(3).map(_._1)
    assert(out.map(_._2).toSeq === expect)
    assert(out.map(_._1).toSeq === Seq(1, 2, 3))
    assert(!out.exists(_._2 == 4L))
  }

  test("exactMedianTwoPass: matches exact median under forced histogram recursion") {
    // small buckets + tiny collectLimit force several refinement rounds
    val d = spark.range(0, 100001).selectExpr("CAST(id AS DOUBLE) AS v")
    val (n1, m1) = Sketches.exactMedianTwoPass(d, "v", buckets = 16, collectLimit = 128)
    assert(n1 === 100001L && m1 === 50000.0) // odd count → middle element
    val e = spark.range(0, 100000).selectExpr("CAST(id AS DOUBLE) AS v")
    val (n2, m2) = Sketches.exactMedianTwoPass(e, "v", buckets = 16, collectLimit = 128)
    assert(n2 === 100000L && m2 === 49999.5) // even → mean of the two middles
    // heavy duplication: the median bucket never shrinks below the limit
    // by count, only by width — the underflow guard must resolve it
    val dup = spark.range(0, 100000).selectExpr(
      "CASE WHEN id < 90000 THEN 5.0 ELSE CAST(id AS DOUBLE) END AS v")
    val (_, m3) = Sketches.exactMedianTwoPass(dup, "v", buckets = 16, collectLimit = 128)
    assert(m3 === 5.0)
    // nulls and NaNs excluded
    val withNull = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("v")
    assert(Sketches.exactMedianTwoPass(withNull, "v") === ((3L, 2.0)))
    // ADVICE r8: heavy duplicate mass at BOTH ends of an even-count
    // median (kLo inside 1.0's mass, kHi inside 2.0's) pins the range
    // open forever — the loop must exit on the repeated (lo, hi) and
    // the final collect must gather (value, count) PAIRS, not rows
    // (10k survivors, collectLimit 128, but only 2 distinct values)
    val twoHeavy = spark.range(0, 10000).selectExpr(
      "CASE WHEN id < 5000 THEN 1.0 ELSE 2.0 END AS v")
    val (n4, m4) = Sketches.exactMedianTwoPass(twoHeavy, "v",
      buckets = 16, collectLimit = 128)
    assert(n4 === 10000L && m4 === 1.5)
    // review r9: a collectLimit the widened final range legitimately
    // exceeds on CONTINUOUS data must fall back to the single-rank
    // refinement loop (exact per-round recounts), not reject the input —
    // the r8 fail-fast require threw here. collectLimit 4 guarantees the
    // ±width widening overflows it at every narrowing endpoint.
    val (n5, m5) = Sketches.exactMedianTwoPass(d, "v", buckets = 16, collectLimit = 4)
    assert(n5 === 100001L && m5 === 50000.0)
    val (n6, m6) = Sketches.exactMedianTwoPass(e, "v", buckets = 16, collectLimit = 4)
    assert(n6 === 100000L && m6 === 49999.5)
    // duplicate mass adjacent to the median bucket (the ADVICE r8
    // scenario: widening pulls a whole heavy bucket into range) — the
    // grouped collect and the fallback both stay bounded and exact
    val adjacent = spark.range(0, 100000).selectExpr(
      "CASE WHEN id < 49000 THEN 1.0 ELSE CAST(id AS DOUBLE) END AS v")
    val (_, m7) = Sketches.exactMedianTwoPass(adjacent, "v", buckets = 16, collectLimit = 4)
    assert(m7 === 49999.5) // ranks 49999/50000 → values 49999.0 and 50000.0
  }

  test("kneserNeyBigrams: hand-computed interpolated-KN probabilities sum per context") {
    // corpus "a b a b a c": bigrams (a,b)×2 (b,a)×2 (a,c)×1
    // c(a·)=3 fa=2 · c(b·)=2 fa=1 · preceders: a←1, b←1, c←1 · types=3
    val d = Seq("a b a b a c").toDF("text")
    val out = TextAnalysis.kneserNeyBigrams(d, "text", discount = 0.75,
        minCount = 1, k = 10)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getDouble(4)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(("a", "b")) === r6(1.25 / 3 + 0.75 * 2.0 / 3 * (1.0 / 3)))
    assert(out(("a", "c")) === r6(0.25 / 3 + 0.75 * 2.0 / 3 * (1.0 / 3)))
    assert(out(("b", "a")) === r6(1.25 / 2 + 0.75 * 1.0 / 2 * (1.0 / 3)))
    // interpolated KN is a proper conditional over the FULL vocab:
    // Σ_observed P(b|a) = 1 − D·fa/ca · P_cont(unobserved) — here the
    // only word never following "a" is "a" itself (P_cont = 1/3).
    val missing = 0.75 * 2.0 / 3 * (1.0 / 3)
    assert(math.abs(out(("a", "b")) + out(("a", "c")) - (1.0 - missing)) < 2e-6)
    assert(out(("b", "a")) === 0.75) // 1.25/2 + 0.75·(1/2)·(1/3)... = 0.625 + 0.125
  }

  test("Funnel.kaplanMeier: churn vs censoring on a hand-built cohort") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // A lives days 0–2 (churned: 8 > 3 before obs end), B day 0 only
    // (churned), C days 0–10 (ends AT obs end → censored)
    val ev = Seq(
      (1L, "A", ts(0)), (2L, "A", ts(1)), (3L, "A", ts(2)),
      (4L, "B", ts(0)),
      (5L, "C", ts(0)), (6L, "C", ts(10))
    ).toDF("event_id", "user_id", "ts")
    val out = Funnel.kaplanMeier(ev, "user_id", "ts", horizonDays = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0, 3L, 1L, math.rint((1.0 - 1.0 / 3) * 1e6) / 1e6), // all 3 at risk at t=0
      (2, 2L, 1L, 0.5),                                    // C + A still at risk at t=2
      (10, 1L, 0L, 1.0)))                                  // censored C: lifetable row, no death
  }

  test("Funnel.markovTransitions: row-normalized pair counts with id tie-break") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 11:00:00")),
      (3L, 1L, "a", ts("2024-01-01 12:00:00")),
      (4L, 2L, "a", ts("2024-01-01 10:00:00")),
      // same-timestamp pair for user 2: event_id order ⇒ b then c
      (5L, 2L, "b", ts("2024-01-01 11:00:00")),
      (6L, 2L, "c", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Funnel.markovTransitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("a", "b")) === ((2L, 1.0)))  // both users a→b; a row sums to 1
    assert(out(("b", "a")) === ((1L, 0.5)))
    assert(out(("b", "c")) === ((1L, 0.5)))  // the tie resolved by event_id
    assert(out.size === 3)
  }

  test("Graph.triangleCounts: clique, bridge, and path counted by hand") {
    // triangle {1,2,3}, plus a path 3–4–5 (no further triangles);
    // edges given in MIXED directions with duplicates — canonicalization
    // must absorb both.
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 4L))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 1.0)))        // deg 2, 1 triangle, coeff 1
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L)._1 === 3L && out(3L)._2 === 1L) // deg 3, coeff 2/(3·2)
    assert(out(3L)._3 === math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(out(4L) === ((2L, 0L, 0.0)))        // path center: wedge, no closure
    assert(out(5L) === ((1L, 0L, 0.0)))        // leaf: deg < 2 → coeff 0
    // K4 has C(4,3)=4 triangles, every vertex in 3 of them, coeff 1
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b))
      .toDF("src", "dst")
    val k4out = Graph.triangleCounts(k4).collect()
    assert(k4out.forall(r => r.getLong(2) === 3L && r.getDouble(3) === 1.0))
  }

  test("Graph.adamicAdar: shared-neighbor score excludes adjacent pairs") {
    // star center 0 with leaves 1,2,3 plus edge 1–2: pairs (1,3),(2,3)
    // share only the center (deg 4... deg(0)=3); (1,2) is ADJACENT so
    // excluded even though it shares 0.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val out = Graph.adamicAdar(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(!out.contains((1L, 2L)), "adjacent pair must be anti-joined away")
    assert(out((1L, 3L)) === ((1L, r6(1.0 / math.log(3.0)))))
    assert(out((2L, 3L)) === ((1L, r6(1.0 / math.log(3.0)))))
    assert(out.size === 2)
  }

  test("Graph.adamicAdarCapped: sub-cap centers keep exact scores, hub-only pairs drop") {
    // low-degree center 1 (deg 2) links 2–3; hub 9 (deg 5) links
    // 2,3,4,5,6. cap=4 excludes the hub: (2,3) keeps ONLY the rare
    // evidence 1/ln2 (exact adds 1/ln5); (4,5) shares only the hub and
    // must vanish; adjacency anti-join still uses the FULL edge set.
    val e = (Seq((1L, 2L), (1L, 3L)) ++ Seq(2L, 3L, 4L, 5L, 6L).map((9L, _)))
      .toDF("src", "dst")
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exact = Graph.adamicAdar(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val capped = Graph.adamicAdarCapped(e, maxDeg = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(exact((2L, 3L)) === ((2L, r6(1.0 / math.log(2.0) + 1.0 / math.log(5.0)))))
    assert(capped((2L, 3L)) === ((1L, r6(1.0 / math.log(2.0)))))
    assert(exact.contains((4L, 5L)) && !capped.contains((4L, 5L)),
      "hub-only pair must drop under the cap")
    // with a cap at the max degree, capped ≡ exact
    val same = Graph.adamicAdarCapped(e, maxDeg = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(same === exact)
  }

  test("Graph.adamicAdarSketch: exact when sketches cover, calibrated when they sample") {
    import org.apache.spark.sql.functions.{col, abs => sabs}
    // 1. EXACT regime: every neighborhood fits the sketch (k >= max
    //    deg), so the estimator must equal the exact tier bit-for-bit
    //    (both round to 6 dp) — including when the UNION of two
    //    covered neighborhoods exceeds k (the truncation case)
    val e = (Seq((1L, 2L), (1L, 3L)) ++ Seq(2L, 3L, 4L, 5L, 6L).map((9L, _)))
      .toDF("src", "dst")
    val exact = Graph.adamicAdar(e)
    val exactMap = exact.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val cands = exactMap.keySet.toSeq.toDF("x", "y")
    // Pinned.hold contract: each invocation supersedes the previous
    // result's blocks, so every result is materialized IMMEDIATELY
    // (accessing a stale frame after a re-invocation throws by design)
    val est4Count = Graph.adamicAdarSketch(e, cands, k = 4).count()
    assert(est4Count === exactMap.size.toLong) // k=4 still scores every pair
    val est8Map = Graph.adamicAdarSketch(e, cands, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est8Map.keySet === exactMap.keySet)
    for ((p, v) <- exactMap) assert(est8Map(p) === v, s"pair $p")

    // 1b. exact-regime TRUNCATION case: both endpoints' neighborhoods
    //     fit the sketch (deg 5 <= k=6) but their UNION (8 members)
    //     exceeds k — the exact branch must sum over the FULL merged
    //     union, not the k-prefix (review r10: a sliced pool here
    //     silently dropped intersection members)
    val tr = ((1L to 5L).map((100L, _)) ++ (4L to 8L).map((200L, _))).toDF("src", "dst")
    val trEst = Graph.adamicAdarSketch(tr, Seq((100L, 200L)).toDF("x", "y"), k = 6)
      .collect().head.getDouble(2)
    // shared neighbors 4 and 5, each deg 2 → aa = 2/ln(2)
    assert(trEst === math.rint(2.0 / math.log(2.0) * 1e6) / 1e6)

    // 2. SAMPLING regime: a deterministic co-membership graph where the
    //    scored ENDPOINTS have deg 32 > k (the z side, deg 12, stays in
    //    the exact regime — endpoint degree is what selects the branch).
    //    The KMV estimate must track the exact scores at the ~1/sqrt(k)
    //    calibration the sketch promises; the graph and hashes are
    //    deterministic, so the measured errors are fixed (median 0.061,
    //    p90 0.243 at k=24) and the bounds below carry safety margin.
    val big = spark.range(0, 60).selectExpr("id AS x")
      .crossJoin(spark.range(1000, 1160).selectExpr("id AS z"))
      .where(org.apache.spark.sql.functions.expr("(x * 31 + z * 17) % 5 = 0"))
      .selectExpr("x AS src", "z AS dst")
    val bigExact = Graph.adamicAdar(big)
    val bigCands = bigExact.where(col("x") < 60 && col("y") < 60).select("x", "y")
    assert(bigCands.count() === 330)
    val bigEst = Graph.adamicAdarSketch(big, bigCands, k = 24)
    val joined = bigEst.join(bigExact, Seq("x", "y"))
      .select((sabs(col("aa_est") - col("aa")) / col("aa")).as("rel"))
      .collect().map(_.getDouble(0)).sorted
    assert(joined.length === 330)
    val median = joined(joined.length / 2)
    val p90 = joined((joined.length * 9) / 10)
    assert(median < 0.2, s"median relative error $median (k=24) — estimator drifted")
    assert(p90 < 0.45, s"p90 relative error $p90 (k=24) — estimator drifted")
    assert(joined.forall(r => !r.isNaN && !r.isInfinity))
    // and the exact-vs-sampling branch boundary: z-side pairs (deg 12
    // endpoints <= k) come back EXACT even though their members are
    // deg-32 hubs
    val zCands = bigExact.where(col("x") >= 1000).select("x", "y").limit(20)
    val zJoin = Graph.adamicAdarSketch(big, zCands, k = 24)
      .join(bigExact, Seq("x", "y"))
      .where(sabs(col("aa_est") - col("aa")) > 1e-6)
    assert(zJoin.count() === 0, "covered-endpoint pairs must be exact")

    // 3. candidate contract (review r10): a pair whose endpoint is
    //    absent from the edge list scores 0.0 — one row per candidate,
    //    never a silent drop (left joins, not inner)
    val ghost = Graph.adamicAdarSketch(e,
      Seq((2L, 3L), (2L, 777L), (777L, 888L)).toDF("x", "y"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ghost.size === 3)
    assert(ghost((2L, 777L)) === 0.0 && ghost((777L, 888L)) === 0.0)
    assert(ghost((2L, 3L)) === exactMap((2L, 3L)))
  }

  test("Adamic–Adar tiers on a planted-hub power-law graph: wedge bound, dominance, hub evidence") {
    import org.apache.spark.sql.functions.{col, least, greatest, count => scount, sum => ssum}
    // VERDICT r10 #1, the LAW half (the timing half is GraphSkewBench →
    // BASELINE.md): a seeded power-law graph with one planted hub — the
    // degree shape the TPC-H fixtures lack and the capped/sketch tiers
    // exist for. Deterministic: xxhash64 generation, fixed args.
    val n = 5000L; val hubDeg = 600; val cap = 12; val k = 32
    val edges = GraphSkewBench.plantedHubGraph(spark, n, 12000L, hubDeg)
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct().cache()
    val eCnt = und.count()
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(scount(lit(1)).as("deg")).cache()
    // the planted hub is real: vertex n has degree EXACTLY hubDeg
    assert(deg.where(col("id") === n).select("deg").as[Long].head() === hubDeg.toLong)
    def wedges(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(ssum((col("deg") * (col("deg") - 1)) / 2).cast("long")).as[Long].head()
    val wAll = wedges(deg)
    val wCap = wedges(deg.where(col("deg") <= cap))
    // law 1 (the scale argument, now measured on skew): sub-cap centers
    // emit ≤ cap·|E| wedges — LINEAR in edges — while the hub ALONE
    // emits hubDeg·(hubDeg−1)/2, more than the whole capped budget
    val hubWedges = hubDeg.toLong * (hubDeg - 1) / 2
    assert(wCap <= cap.toLong * eCnt, s"capped wedges $wCap > cap*|E| ${cap.toLong * eCnt}")
    assert(wAll >= hubWedges)
    assert(hubWedges > wCap,
      s"hub wedges $hubWedges should dominate the capped budget $wCap on this graph")

    // law 2: capped ⊆ exact with per-pair cn and aa DOMINATED by exact
    // (capped = exact scoring on the sub-cap-center subgraph)
    val exact = Graph.adamicAdar(edges)
    val exactN = exact.count()
    val capped = Graph.adamicAdarCapped(edges, cap)
    val cappedN = capped.count()
    assert(cappedN > 0 && cappedN < exactN)
    val dom = capped.as("c").join(exact.as("e"), Seq("x", "y"))
    assert(dom.count() === cappedN, "every capped pair must exist in the exact output")
    assert(dom.where(col("c.cn") > col("e.cn") ||
      col("c.aa") > col("e.aa") + 1e-9).count() === 0)

    // law 3: hub-only pairs — exact pairs the capped tier DROPS because
    // all their shared neighbors are super-cap. In the exact regime
    // (both endpoint degrees ≤ k) the sketch holds both FULL
    // neighborhoods, so it must (a) score every such pair > 0 — the hub
    // evidence the capped tier is blind to — and (b) reproduce the
    // exact tier's score bit-for-bit (both round to 6 dp).
    val degX = deg.select(col("id").as("x"), col("deg").as("dx"))
    val degY = deg.select(col("id").as("y"), col("deg").as("dy"))
    val droppedSmall = exact.join(capped, Seq("x", "y"), "left_anti")
      .join(degX, Seq("x")).join(degY, Seq("y"))
      .where(col("dx") <= k && col("dy") <= k)
      .select(col("x"), col("y"), col("aa")).orderBy("x", "y").limit(300).cache()
    val droppedN = droppedSmall.count()
    assert(droppedN > 0, "the planted hub must create capped-tier blind-spot pairs")
    val sk = Graph.adamicAdarSketch(edges, droppedSmall.select("x", "y"), k)
    val skJoined = sk.join(droppedSmall, Seq("x", "y")).cache()
    assert(skJoined.count() === droppedN) // one row per candidate, no drops
    assert(skJoined.where(col("aa_est") <= 0.0).count() === 0,
      "sketch must retain hub evidence the capped tier drops")
    assert(skJoined.where(abs(col("aa_est") - col("aa")) > 1e-6).count() === 0,
      "exact-regime sketch scores must equal the exact tier")

    // law 4: the RESCORER equals the exact tier on any candidate list —
    // top-of-ranking AND hub-only blind-spot pairs, with NO degree
    // restriction (this is the tier the r11 skew measurement showed is
    // needed where k·|∩|/|∪| < 1 defeats the sketch) — and scores
    // ghost pairs 0 instead of dropping them
    val sampleTop = exact.orderBy(col("aa").desc, col("x"), col("y")).limit(200)
      .select(col("x"), col("y"), col("cn"), col("aa"))
    val sampleDropped = exact.join(capped, Seq("x", "y"), "left_anti")
      .orderBy("x", "y").limit(200).select(col("x"), col("y"), col("cn"), col("aa"))
    val sample = sampleTop.unionByName(sampleDropped).cache()
    val sampleN = sample.count()
    val rescored = Graph.adamicAdarRescore(edges, sample.select("x", "y"))
    val rj = rescored.as("r").join(sample.as("s"), Seq("x", "y")).cache()
    assert(rj.count() === sampleN)
    assert(rj.where(col("r.cn") =!= col("s.cn") ||
      abs(col("r.aa") - col("s.aa")) > 1e-6).count() === 0,
      "rescored pairs must equal the exact tier bit-for-bit")
    val ghosts = Graph.adamicAdarRescore(edges,
      Seq((888888L, 999999L)).toDF("x", "y")).collect()
    assert(ghosts.length === 1 && ghosts.head.getLong(2) === 0L &&
      ghosts.head.getDouble(3) === 0.0)
    und.unpersist(); deg.unpersist(); droppedSmall.unpersist(); skJoined.unpersist()
    sample.unpersist(); rj.unpersist()
  }

  test("bm25TopK: tf saturation and length normalization order as expected") {
    val d = Seq(
      (1L, "cat cat dog bird"),  // tf(cat)=2, dl=4
      (2L, "cat dog bird fish"), // tf(cat)=1, dl=4
      (3L, "cat dog"),           // tf(cat)=1, dl=2 (shorter → higher)
      (4L, "dog bird fish eel")  // no match
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(d, "doc_id", "text",
      Seq("q" -> Seq("cat")), k = 10).orderBy("rank").collect()
    // only matching docs appear, ranked: tf=2 first, then short tf=1, then long tf=1
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    // hand-check doc 3: idf=ln(1+(4-3+0.5)/3.5), tf-part=2.2/(1+1.2*(0.25+0.75*2/3.5))
    val idf = math.log(1 + 1.5 / 3.5)
    val s3 = idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3.5))
    assert(out(1).getDouble(3) === math.rint(s3 * 1e6) / 1e6)
  }

  test("Classifier.nbTrainScore: hand-computed log-odds on a 2-doc corpus") {
    val d = Seq((1L, "good good", 1), (2L, "bad", 0), (3L, "good bad", 1))
      .toDF("doc_id", "text", "y")
    val out = Classifier.nbTrainScore(d, "doc_id", "text", col("y") === 1)
      .orderBy("doc_id").collect()
    // counts: good c1=3 c0=0, bad c1=1 c0=1; T1=4 T0=1 V=2
    // w(good)=ln(4/6)-ln(1/3); w(bad)=ln(2/6)-ln(2/3); b=ln(3/2)
    val wGood = math.log(4.0 / 6) - math.log(1.0 / 3)
    val wBad = math.log(2.0 / 6) - math.log(2.0 / 3)
    val b = math.log(3.0 / 2)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0).getDouble(1) === r6(b + 2 * wGood))
    assert(out(1).getDouble(1) === r6(b + wBad))
    assert(out(2).getDouble(1) === r6(b + wGood + wBad))
    assert(out(0).getBoolean(2) === (r6(b + 2 * wGood) > 0))
  }

  test("Classifier.nbTrainScore: blank doc scores the bare prior") {
    val d = Seq((1L, "alpha", 1), (2L, "  ", 0), (3L, "beta", 0))
      .toDF("doc_id", "text", "y")
    val out = Classifier.nbTrainScore(d, "doc_id", "text", col("y") === 1)
      .orderBy("doc_id").collect()
    val b = math.log(2.0 / 3) // (1+1)/(2+1)
    assert(out(1).getDouble(1) === math.rint(b * 1e6) / 1e6)
  }

  test("Classifier LR: hashedTf + trainLogReg separates a crafted corpus") {
    // 40 docs, two disjoint vocabularies — linearly separable in any
    // hashed space (buckets of the two vocabs only collide with 5/64
    // ~ tolerable probability per token; accuracy bar leaves headroom)
    val good = (0 until 20).map(i => (i.toLong, s"fresh prose ok w${i % 5}", 1.0))
    val bad = (0 until 20).map(i => ((i + 20).toLong, s"spam junk zz q${i % 5}", 0.0))
    val d = (good ++ bad).toDF("doc_id", "text", "label")
    val feats = Classifier.hashedTf(d, "doc_id", "text", dim = 64)
      .join(d.select("doc_id", "label"), "doc_id")
    val w = Classifier.trainLogReg(feats, "features", "label", dim = 64,
      epochs = 60, lr = 1.0)
    assert(w.length === 65)
    val scored = feats.select(col("doc_id"), col("label"),
      Classifier.scoreLogReg(col("features"), w).as("p"))
    val acc = scored.where((col("p") > 0.5) === (col("label") === 1.0)).count() / 40.0
    assert(acc >= 0.95, s"LR failed to separate disjoint vocabularies: acc=$acc")
    // scoreLogReg's Column-algebra dot product matches a driver-side dot
    val row = feats.where(col("doc_id") === 0L).select("features").as[Array[Double]].head()
    val z = row.zipWithIndex.map { case (v, i) => v * w(i) }.sum + w.last
    val p = scored.where(col("doc_id") === 0L).select("p").as[Double].head()
    assert(math.abs(p - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
  }

  test("hll: estimate within the error band, merge law, linear-counting floor") {
    val a = (0 until 1200).map(i => s"key$i").toDF("k")
    val b = (800 until 2000).map(i => s"key$i").toDF("k") // 400 overlap
    val ra = Sketches.hllRegisters(a, "k", p = 8)
    val rb = Sketches.hllRegisters(b, "k", p = 8)
    val est = Sketches.hllEstimate(ra, p = 8).collect().head
    assert(est.getLong(0) === 256L)
    val e = est.getDouble(3)
    assert(math.abs(e - 1200) / 1200.0 < 0.15, s"estimate $e for true 1200")
    // union merge = sketch of the union, register-for-register
    val merged = Sketches.hllMerge(ra, rb).orderBy("bucket").collect()
    val direct = Sketches.hllRegisters(a.union(b), "k", p = 8).orderBy("bucket").collect()
    assert(merged.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
           direct.map(r => (r.getInt(0), r.getInt(1))).toSeq)
    // empty input: all registers 0 → linear-counting branch → ln(1) = 0
    val empty = Sketches.hllRegisters(a.where(lit(false)), "k", p = 8)
    val e0 = Sketches.hllEstimate(empty, p = 8).collect().head
    assert(e0.getLong(1) === 256L && e0.getDouble(3) === 0.0)
  }

  test("compressionRatio: repetition compresses hardest, deterministic, empty → null") {
    val varied = (0 until 800).map(i => ('a' + (i * 31 + 7) % 26).toChar).mkString
    val d = Seq((1L, "ab" * 400), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val run1 = TextAnalysis.compressionRatio(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(run1(1L)._1 === 800L && run1(2L)._1 === 800L)
    assert(run1(1L)._3 < run1(2L)._3, s"pure repetition must compress below varied text: $run1")
    assert(run1(1L)._3 < 0.05)
    assert(run1(3L) === ((0L, run1(3L)._2, -1.0))) // empty → null ratio
    val run2 = TextAnalysis.compressionRatio(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(run1 === run2)
  }

  test("cmSketch: never undercounts, exact without collisions, merge = union") {
    val a = (Seq.fill(50)("hot") ++ (0 until 40).map(i => s"cold$i")).toDF("k")
    val sk = Sketches.cmSketch(a, "k", w = 64, d = 3)
    val probes = a.distinct()
    val est = Sketches.cmEstimate(sk, probes, "k", w = 64, d = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = a.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"undercount for $k: est=${est(k)} true=$t") }
    // one lonely key in a wide sketch: no collisions possible → exact
    val solo = Seq.fill(7)("only").toDF("k")
    val soloEst = Sketches.cmEstimate(Sketches.cmSketch(solo, "k", 64, 3),
      solo.distinct(), "k", 64, 3).collect().head.getLong(1)
    assert(soloEst === 7L)
    // merge law: cm(A ∪ B) cell table = cmMerge(cm(A), cm(B))
    val b = (0 until 30).map(i => s"extra$i").toDF("k")
    val merged = Sketches.cmMerge(sk, Sketches.cmSketch(b, "k", 64, 3))
      .orderBy("row", "bucket").collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val direct = Sketches.cmSketch(a.union(b), "k", 64, 3)
      .orderBy("row", "bucket").collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(merged.toSeq === direct.toSeq)
  }

  test("kCore: clique survives its own k, appendages peel, over-k empties") {
    // 4-clique {1,2,3,4} + path 4-5-6: deg(5)=2, deg(6)=1
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core3 = Graph.kCore(edges, k = 3, rounds = 3).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(core3.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k above the max core: everything peels within rounds
    assert(Graph.kCore(edges, k = 4, rounds = 3).count() === 0L)
  }

  test("weightedMedian: weight-heavy tail wins; even split takes the lower") {
    val d = Seq(("g", 10.0, 1L), ("g", 20.0, 2L), ("g", 30.0, 5L),
      ("h", 10.0, 1L), ("h", 20.0, 1L)).toDF("k", "v", "w")
    val out = Evaluation.weightedMedian(d, "k", "v", "w").orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // g: half of W=8 is first reached at v=30 (unweighted median says 20)
    assert(out.toSeq === Seq(("g", 8L, 30.0), ("h", 2L, 10.0)))
    // null VALUES carry weight nowhere: they used to sort first and
    // shift the 2·cum >= W crossing while min(v) skipped them
    // (review r9)
    val withNull = d.unionByName(
      Seq(("g", Option.empty[Double], 10L)).toDF("k", "v", "w"))
    val outN = Evaluation.weightedMedian(withNull, "k", "v", "w").orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(outN.toSeq === Seq(("g", 8L, 30.0), ("h", 2L, 10.0)))
  }

  test("profileDrift: null-rate delta and range movement on planted snapshots") {
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, None))
      .toDF("id", "v") // null rate 0.25, range a..c
    val cur = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, None))
      .toDF("id", "v") // null rate 0.75, range a..a
    val out = Profiling.profileDrift(base, cur, Seq("id", "v"))
      .orderBy("column_name").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(8)))
    assert(out(0) === (("id", 0.0, 0.0, 0.0, false)))
    assert(out(1) === (("v", 0.25, 0.75, 0.5, true)))
  }

  test("burstiness: hand-computed CV; metronomic stream scores 0") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("A", t("2024-01-01 00:00:00"), 1L), ("A", t("2024-01-01 00:00:01"), 2L),
      ("A", t("2024-01-01 00:00:03"), 3L), // gaps 1s, 2s → cv = 1/3
      ("B", t("2024-01-01 00:00:00"), 4L), ("B", t("2024-01-01 00:00:05"), 5L),
      ("B", t("2024-01-01 00:00:10"), 6L)  // equal gaps → cv 0
    ).toDF("et", "ts", "id")
    val out = Evaluation.burstiness(ev, "et", "ts", col("id")).orderBy("cls").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) === (("A", 2L, 1.5, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(out(1) === (("B", 2L, 5.0, 0.0)))
  }

  test("rendezvousAssign: deterministic, balanced-ish, minimal disruption on reshard") {
    val keys = (0 until 400).map(_.toLong).toDF("k")
    val three = Sampling.rendezvousAssign(keys, "k", Seq("s0", "s1", "s2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val four = Sampling.rendezvousAssign(keys, "k", Seq("s0", "s1", "s2", "s3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // adding a shard: keys either keep their shard or move TO the new one
    assert(keys.collect().forall { r =>
      val k = r.getLong(0); four(k) == three(k) || four(k) == "s3" })
    // roughly 1/4 land on the new shard (binomial ~100 ± wide slack)
    val moved = four.values.count(_ == "s3")
    assert(moved > 50 && moved < 160, s"moved=$moved of 400")
    // every shard gets traffic
    assert(four.values.toSet.size === 4)
  }

  test("apportion: Hamilton shares by hand; Σalloc = total under awkward weights") {
    val d = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w")
    val out = Sampling.apportion(d, "k", "w", total = 7L).orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // quotas 3.5 / 2.1 / 1.4 → bases 3,2,1; one leftover to the
    // largest remainder (a: 35%10=5 beats c: 14%10=4)
    assert(out.toSeq === Seq(("a", 5L, 3L, 5L, 4L), ("b", 3L, 2L, 1L, 2L),
      ("c", 2L, 1L, 4L, 1L)))
    // prime-ish weights: the invariant is exact conservation
    val d2 = (1 to 13).map(i => (s"k$i", (i * 7 + 3).toLong)).toDF("k", "w")
    val total = Sampling.apportion(d2, "k", "w", total = 9973L)
      .agg(sum("alloc")).collect().head.getLong(0)
    assert(total === 9973L)
  }

  test("funnelWithin: window cuts conversions; anchoring does not move") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: view 10:00, click 10:30 (inside 1h), purchase 12:00 (outside click+1h)
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:30:00")),
      (1L, "purchase", t("2024-01-01 12:00:00")),
      // u2: first view 08:00 with no click in window; a later view 10:00
      // WOULD convert — first-touch anchoring must NOT use it
      (2L, "view", t("2024-01-01 08:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-01 10:10:00"))
    ).toDF("u", "et", "ts")
    val out = Funnel.funnelWithin(ev, "u", "et", "ts",
      Seq("view", "click", "purchase"), withinSec = 3600L)
      .orderBy("u").collect()
    assert(out(0).getInt(4) === 2, s"u1 purchase outside window: ${out(0)}")
    assert(out(1).getInt(4) === 1, s"u2 anchored at 08:00, click outside: ${out(1)}")
    // unwindowed funnel for contrast: u1 completes all 3
    val plain = Funnel.funnel(ev, "u", "et", "ts", Seq("view", "click", "purchase"))
      .orderBy("u").collect()
    assert(plain(0).getInt(4) === 3)
  }

  test("ltvCurve: eligibility-clipped denominators and cumulative cents by hand") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // feed end = Jan 3. u1 starts Jan 1 (span 2): 1.00, then 2.00 at age 2.
    // u2 starts Jan 3 (span 0): 5.00. maxAge=2.
    val ev = Seq(
      (1L, t("2024-01-01"), 1.00), (1L, t("2024-01-03"), 2.00),
      (2L, t("2024-01-03"), 5.00)
    ).toDF("u", "ts", "v")
    val out = Funnel.ltvCurve(ev, "u", "ts", "v", maxAge = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0, 2L, 600L, 3.0),   // age 0: u1 cum 1.00 + u2 cum 5.00 over 2 users
      (1, 1L, 100L, 1.0),   // only u1 observed to age 1
      (2, 1L, 300L, 3.0)))  // u1 cum 3.00
  }

  test("ebShrinkRates: pooled prior pulls small-n toward m, large-n resists") {
    val d = (Seq.fill(2)(("small", true)) ++            // 2/2 raw 1.0
      Seq.fill(95)(("large", true)) ++ Seq.fill(5)(("large", false)) ++
      Seq.fill(3)(("mid", false))).toDF("k", "ok")
    val out = Evaluation.ebShrinkRates(d, "k", "ok", tau = 20.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val m = 97.0 / 105.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out("small") === ((2L, 2L, 1.0, r6((2 + 20 * m) / 22.0))))
    assert(out("large") === ((100L, 95L, 0.95, r6((95 + 20 * m) / 120.0))))
    // ranking fix: raw says small > large; shrunken says large > small
    assert(out("small")._4 < out("large")._4)
  }

  test("activityStreaks: islands split on gaps; current streak only at feed end") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    val ev = Seq(
      // u1: runs 1-3 (len 3) and 5-6 (len 2, touches end) → longest 3, current 2
      (1L, t("2024-01-01")), (1L, t("2024-01-02")), (1L, t("2024-01-03")),
      (1L, t("2024-01-05")), (1L, t("2024-01-06")),
      // u2: single day, not at end → current 0
      (2L, t("2024-01-02"))
    ).toDF("u", "ts")
    val out = Funnel.activityStreaks(ev, "u", "ts").orderBy("entity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 5L, 3L, 2L), (2L, 1L, 1L, 0L)))
  }

  test("rollingActiveUsers: 3-day window counts distinct coverage, clipped to range") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    val ev = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-02")), // u1 covers 1-3 and 2-4 → 1-4
      (2L, t("2024-01-04"))                          // u2 covers 4-6 → clipped to 4
    ).toDF("u", "ts")
    val out = Funnel.rollingActiveUsers(ev, "u", "ts", windowDays = 3).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out === Map("2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-03" -> 1L,
      "2024-01-04" -> 2L))
  }

  test("gifMeta: round-trip planted headers; GCT size; non-GIF null") {
    val d = Seq(
      (1L, Multimodal.syntheticGif(320, 200, gctBits = 4, v89 = true)),
      (2L, Multimodal.syntheticGif(16, 65535, gctBits = 0, v89 = false)),
      (3L, "notagif".getBytes("UTF-8"))
    ).toDF("id", "gif")
    val gm = Multimodal.gifMeta(col("gif"))
    val out = d.select(col("id"), gm.as("m")).orderBy("id").collect()
    val r1 = out(0).getStruct(1)
    assert((r1.getString(1), r1.getInt(2), r1.getInt(3), r1.getInt(4)) ===
           (("89a", 320, 200, 16)))
    assert(r1.getLong(0) === 14L + 3 * 16)
    val r2 = out(1).getStruct(1)
    assert((r2.getString(1), r2.getInt(2), r2.getInt(3), r2.getInt(4)) ===
           (("87a", 16, 65535, 0)))
    assert(out(2).isNullAt(1))
  }

  test("conformalPersistence: exact order-statistic threshold and coverage") {
    // residuals 1,2,3,4,5,5,0; cal = first 4 → k = ⌈5·4/5⌉ = 4, q̂ = 4
    // test residuals 5,5,0 → coverage 1/3
    val xs = Seq(0L, 1L, 3L, 6L, 10L, 15L, 20L, 20L)
    val d = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("t", "x")
    val r = Evaluation.conformalPersistence(d, "t", "x",
      calN = 4, alphaNum = 1, alphaDen = 5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
           ((4L, 3L, 4L, math.rint(1.0 / 3 * 1e6) / 1e6)))
  }

  test("scd2: consecutive repeats collapse, nulls version, open version current") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val feed = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, Some("gold")),
      (1L, t("2024-01-02 00:00:00"), 2L, Some("gold")),   // repeat → collapses
      (1L, t("2024-01-03 00:00:00"), 3L, None),           // null is a real version
      (1L, t("2024-01-04 00:00:00"), 4L, None),           // null repeat → collapses
      (1L, t("2024-01-05 00:00:00"), 5L, Some("silver")),
      (2L, t("2024-01-01 00:00:00"), 6L, Some("bronze"))
    ).toDF("k", "ts", "id", "tier")
    val out = Dedup.scd2(feed, "k", "ts", Seq("tier"), col("id"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "∅" else r.getString(1),
        r.getTimestamp(2).toString.take(10),
        if (r.isNullAt(3)) "open" else r.getTimestamp(3).toString.take(10),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, "gold", "2024-01-01", "2024-01-03", false),
      (1L, "∅", "2024-01-03", "2024-01-05", false),
      (1L, "silver", "2024-01-05", "open", true),
      (2L, "bronze", "2024-01-01", "open", true)))
  }

  test("shareOfParent: shares reconcile to 1 per parent and overall") {
    val d = Seq(("p1", "a", 30L), ("p1", "a", 10L), ("p1", "b", 60L),
      ("p2", "c", 100L)).toDF("p", "c", "w")
    val out = Rollup.shareOfParent(d, "p", "c", col("w"))
      .orderBy("parent", "child").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("p1", "a", 40L, 0.4, 0.2), ("p1", "b", 60L, 0.6, 0.3),
      ("p2", "c", 100L, 1.0, 0.5)))
  }

  test("dailyOhlc: open/close by arrival order, cents turnover exact") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, t("2024-01-01 09:00:00"), 10.50),
      (2L, t("2024-01-01 12:00:00"), 30.25), // high
      (3L, t("2024-01-01 15:00:00"), 5.75),  // low
      (4L, t("2024-01-01 17:00:00"), 20.00), // close
      (5L, t("2024-01-02 10:00:00"), 7.00)
    ).toDF("event_id", "ts", "value")
    val out = Evaluation.dailyOhlc(d, "ts", "value", col("event_id")).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 10.50, 30.25, 5.75, 20.00, 4L, 6650L),
      ("2024-01-02", 7.00, 7.00, 7.00, 7.00, 1L, 700L)))
  }

  test("timeWeightedAverage: hold-until-next weighting, single sample null") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1: 10.00 held 3h, 40.00 held 1h → (10·3 + 40·1)/4 = 17.5
    val d = Seq(
      (1L, t("2024-01-01 00:00:00"), 10.00, 1L),
      (1L, t("2024-01-01 03:00:00"), 40.00, 2L),
      (1L, t("2024-01-01 04:00:00"), 99.00, 3L), // last sample: no hold
      (2L, t("2024-01-01 00:00:00"), 5.00, 4L)
    ).toDF("k", "ts", "v", "id")
    val out = Evaluation.timeWeightedAverage(d, "k", "ts", "v", col("id"))
      .orderBy("key").collect()
    assert(out(0).getLong(1) === 3L && out(0).getDouble(3) === 17.5)
    assert(out(1).getLong(1) === 1L && out(1).getLong(2) === 0L && out(1).isNullAt(3))
  }

  test("growthAccounting: new/retained/resurrected/churned reconcile by hand") {
    def d(s: String) = java.sql.Date.valueOf(s)
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // u1 active d1,d2,d4 (retained d2, resurrected d4)
    // u2 active d1 only (churns into d2); u3 first appears d2
    val ev = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-02")), (1L, t("2024-01-04")),
      (2L, t("2024-01-01")),
      (3L, t("2024-01-02"))
    ).toDF("u", "ts")
    val out = Funnel.growthAccounting(ev, "u", "ts").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(out.toSeq === Seq(
      (d("2024-01-01"), 2L, 2L, 0L, 0L, -1L),
      (d("2024-01-02"), 2L, 1L, 1L, 0L, 1L),  // u2 churned, u1 retained, u3 new
      (d("2024-01-04"), 1L, 0L, 0L, 1L, 2L))) // gap: both of d2's actives churned
    // reconciliation: dau − dau_prev = new + resurrected − churned
    for (i <- 1 until out.length)
      assert(out(i)._2 - out(i - 1)._2 === out(i)._3 + out(i)._5 - out(i)._6)
  }

  test("keepBestByScore: longest member survives, ties by id, singletons keep themselves") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)).toDF("node", "rep")
    val d = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 2L), (6L, 2L))
      .toDF("doc_id", "len")
    val out = Dedup.keepBestByScore(d, "doc_id", clusters, col("len"))
      .orderBy("rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, 30L),  // max len 30 tie between 2 and 3 → smaller id 2
      (4L, 1L, 4L, 7L),   // singleton
      (5L, 2L, 5L, 2L)))  // tie at 2 → smaller id
  }

  test("crossClassOverlap: shared grams counted once, disjoint classes absent") {
    val d = Seq(
      ("A", "t1 t2 t3 t4 t5 t6 t7 t8 t9"),          // grams: t1..t8, t2..t9
      ("B", "t1 t2 t3 t4 t5 t6 t7 t8 zz"),          // shares t1..t8 with A
      ("C", "u1 u2 u3 u4 u5 u6 u7 u8")              // disjoint
    ).toDF("src", "text")
    val out = TextAnalysis.crossClassOverlap(d, "src", "text", n = 8).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5)) === (("A", "B", 1L, 2L, 2L, 0.5)))
  }

  test("skewReport: hand-computed share and ratio-to-mean on a skewed key set") {
    val d = (Seq.fill(8)("hot") ++ Seq("k1", "k2", "k3", "k4")).toDF("k")
    val out = Profiling.skewReport(d, "k", k = 2).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0) === ((1, "hot", 8L, r6(8.0 / 12), r6(8.0 * 5 / 12))))
    assert(out(1) === ((2, "k1", 1L, r6(1.0 / 12), r6(5.0 / 12))))
  }

  test("topNOther: tail folds to one row; no tail → no '(other)'") {
    val d = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("b", 7L), ("b", 7L),
      ("c", 5L), ("d", 1L)).toDF("k", "w")
    val out = Rollup.topNOther(d, "k", col("w"), n = 2).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, "a", 3L, 30L), (2, "b", 2L, 14L), (3, "(other)", 2L, 6L)))
    val noTail = Rollup.topNOther(d, "k", col("w"), n = 10).collect()
    assert(noTail.length === 4 && !noTail.exists(_.getString(1) == "(other)"))
  }

  test("topNOther: NULL key ranking in the top n is not double-counted in '(other)'") {
    // review r9: `Seq("key")` anti-join equality never matches null=null,
    // so a null key heavy enough to rank top-n appeared BOTH as its own
    // row and inside the '(other)' fold — totals exceeded the input. The
    // null-safe (<=>) anti join must keep the partition exact.
    val d = Seq((Option.empty[String], 10L), (None, 10L), (Some("b"), 7L),
      (Some("c"), 5L), (Some("d"), 1L)).toDF("k", "w")
    val out = Rollup.topNOther(d, "k", col("w"), n = 2).orderBy("rank").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, None, 2L, 20L), (2, Some("b"), 1L, 7L),
      (3, Some("(other)"), 2L, 6L)))
    // the partition must be exact: row and weight totals equal the input
    assert(out.map(_._3).sum === 5L && out.map(_._4).sum === 33L)
  }

  test("seasonalAnomalies: planted spike flags, calm days do not") {
    import java.sql.Date
    // two weeks: Mondays ~100, other days ~50 with mild noise, one
    // Wednesday at 500
    val base = Map(0 -> 100, 1 -> 49, 2 -> 50, 3 -> 51, 4 -> 50, 5 -> 52, 6 -> 48)
    val rows = (0 until 14).map { i =>
      val d = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val dow = i % 7 // 2024-01-01 is a Monday
      val x = if (i == 9) 500L else (base(dow) + (if (i >= 7) 1 else 0)).toLong
      (d, x)
    }
    val out = Evaluation.seasonalAnomalies(rows.toDF("day", "x"), "day", "x", k = 3.0)
      .collect().map(r => r.getDate(0).toString -> r.getBoolean(5)).toMap
    assert(out("2024-01-10"), "the planted 10× spike must flag")
    assert(out.count(!_._2) >= 10, s"calm days must mostly pass: $out")
  }

  test("pathTrigrams: session boundaries cut paths; counts aggregate") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 1L),
      (1L, "B", ts("2024-01-01 10:05:00"), 2L),
      (1L, "C", ts("2024-01-01 10:10:00"), 3L),
      (1L, "D", ts("2024-01-01 10:15:00"), 4L),
      (1L, "A", ts("2024-01-01 12:00:00"), 5L), // > 30 min gap → new session
      (1L, "B", ts("2024-01-01 12:05:00"), 6L),
      (1L, "C", ts("2024-01-01 12:10:00"), 7L),
      (2L, "A", ts("2024-01-01 10:00:00"), 8L),
      (2L, "B", ts("2024-01-01 10:01:00"), 9L),
      (2L, "C", ts("2024-01-01 10:02:00"), 10L)
    ).toDF("u", "et", "ts", "id")
    val out = Funnel.pathTrigrams(d, "u", "et", "ts", col("id"),
        gapSec = 1800, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    // ABC ×3 (u1 twice across sessions + u2), BCD once; no trigram
    // spans the session break (CDA, DAB absent)
    assert(out === Set(("A", "B", "C", 3L), ("B", "C", "D", 1L)))
  }

  test("twoProportionZ: hand-computed pooled z; degenerate pool → null") {
    val d = (Seq.fill(2)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq.fill(1)(("B", true)) ++ Seq.fill(3)(("B", false))).toDF("v", "ok")
    val r = Evaluation.twoProportionZ(d, "v", "ok").collect().head
    val pp = 3.0 / 8.0
    val z = (0.5 - 0.25) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)) ===
      (("A", "B", 4L, 4L, 2L, 1L, 0.5, 0.25, math.rint(z * 1e6) / 1e6)))
    val allWin = Seq(("A", true), ("B", true)).toDF("v", "ok")
    assert(Evaluation.twoProportionZ(allWin, "v", "ok").collect().head.isNullAt(8))
    // ADVICE r8: the EXACTLY-two contract is enforced — 3 variants must
    // raise, not silently compare the lexicographic first and last
    val three = Seq(("A", true), ("B", false), ("C", true)).toDF("v", "ok")
    val ex = intercept[Throwable] {
      Evaluation.twoProportionZ(three, "v", "ok").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(ex).contains("EXACTLY two variants"))
    val one = Seq(("A", true), ("A", false)).toDF("v", "ok")
    val ex1 = intercept[Throwable] {
      Evaluation.twoProportionZ(one, "v", "ok").collect()
    }
    assert(msgs(ex1).contains("EXACTLY two variants"))
    // EMPTY input: documented as an empty frame, not a raise — a lazy
    // plan cannot evaluate the guard when no row reaches it (review r9)
    val none = Seq.empty[(String, Boolean)].toDF("v", "ok")
    assert(Evaluation.twoProportionZ(none, "v", "ok").collect().isEmpty)
  }

  test("theilSenSlope: outlier-immune line recovery") {
    // x = 2t+1 with one wild outlier: OLS would bend, Theil–Sen holds
    val d = Seq((0L, 1L), (1L, 3L), (2L, 5L), (3L, 7L), (4L, 100L)).toDF("t", "x")
    val r = Evaluation.theilSenSlope(d, "t", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ===
           ((5L, 10L, 2.0, 1.0)))
    // EVEN counts exercise the two-middle-ranks average (the long-/
    // double-division rank bug matched only one rank): n=4, m=6, both
    // medians interpolate distinct middle values
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val d2 = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 7L)).toDF("t", "x")
    val r2 = Evaluation.theilSenSlope(d2, "t", "x").collect().head
    val slope = r6((2.0 + 7.0 / 3.0) / 2) // avg of sorted slopes at ranks 3,4
    val res = Seq(0.0 - slope * 0, 2.0 - slope * 1, 4.0 - slope * 2, 7.0 - slope * 3).sorted
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2), r2.getDouble(3)) ===
           ((4L, 6L, slope, r6((res(1) + res(2)) / 2))))
  }

  test("timeToConvert: pre-anchor conversions ignored, non-converters absent") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, "purchase", ts("2024-01-01 00:00:00")), // BEFORE the first view: not a conversion
      (1L, "view", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 01:30:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")), // later one loses to the min
      (2L, "purchase", ts("2024-01-01 03:00:00")), // no view → excluded
      (3L, "view", ts("2024-01-01 04:00:00"))      // no purchase → excluded
    ).toDF("u", "et", "ts")
    val out = Funnel.timeToConvert(d, "u", "et", "ts", "view", "purchase").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(3) === 1800L * 1000000)
  }

  test("rfm: quintile directions — best recency/frequency/value score 5") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val d = (1 to 5).flatMap { u =>
      // user u: u events, last on day u, value 10·u each
      (1 to u).map(i => (u.toLong, ts(f"2024-01-0$u%d 12:00:00"), 10.0 * u))
    }.toDF("u", "ts", "v")
    val out = Funnel.rfm(d, "u", "ts", "v").orderBy("entity").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    // user 5: most recent (recency 0), most events, highest value → 555
    assert(out(4) === ((5L, 0, 5L, 250.0, 5, 5, 5, 555)))
    // user 1: stalest, fewest, lowest → 111
    assert(out(0) === ((1L, 4, 1L, 10.0, 1, 1, 1, 111)))
    // ntile-SEMANTICS contract (VERDICT r8 #4): the SCALED tier's
    // distributed rank+arithmetic buckets must equal a window ntile
    // over the same deterministic order — uneven N (23 entities,
    // buckets of 5 and 4) with heavy metric ties, the cases where the
    // closed form could slip. windowThreshold = 0 forces the scaled
    // tier; the default small tier IS the window form.
    import org.apache.spark.sql.expressions.Window
    val d2 = (1 to 23).flatMap { u =>
      (1 to (u % 4 + 1)).map(_ =>
        (u.toLong, ts(f"2024-01-${u % 9 + 1}%02d 12:00:00"), 10.0 * (u % 6)))
    }.toDF("u", "ts", "v")
    val out2 = Funnel.rfm(d2, "u", "ts", "v", windowThreshold = 0L)
    val check = out2.select(col("entity"), col("r"), col("f"), col("m"),
        ntile(5).over(Window.orderBy(col("recency_days").desc, col("entity"))).as("rw"),
        ntile(5).over(Window.orderBy(col("frequency").asc, col("entity"))).as("fw"),
        ntile(5).over(Window.orderBy(col("monetary").asc, col("entity"))).as("mw"))
      .collect()
    assert(check.length === 23)
    check.foreach { r =>
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) ===
        ((r.getInt(4), r.getInt(5), r.getInt(6))), s"entity ${r.getLong(0)}")
    }
  }

  test("hllRegistersBy: per-group sparse registers = each group's dense sketch") {
    val d = (Seq.tabulate(40)(i => ("a", s"w$i")) ++ Seq.tabulate(25)(i => ("b", s"v$i")))
      .toDF("g", "k")
    val sparse = Sketches.hllRegistersBy(d, Seq("g"), "k", p = 8)
    for (g <- Seq("a", "b")) {
      val got = sparse.where(col("g") === g).orderBy("bucket")
        .select("bucket", "reg").collect().map(r => (r.getInt(0), r.getInt(1)))
      val dense = Sketches.hllRegisters(d.where(col("g") === g), "k", p = 8)
        .where(col("reg") > 0).orderBy("bucket")
        .select("bucket", "reg").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(got.toSeq === dense.toSeq, s"group $g")
    }
  }

  test("seasonalProfile: hand-computed weekday means and indices") {
    val d = Seq(("2024-01-01", 10L), ("2024-01-08", 20L), ("2024-01-02", 30L))
      .toDF("day", "x").select(col("day").cast("date").as("day"), col("x"))
    val out = Evaluation.seasonalProfile(d, "day", "x").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // overall mean 20: Mondays (10, 20) → mean 15, index 0.75; Tuesday 30 → 1.5
    assert(out.toSeq === Seq((0, 2L, 15.0, 0.75), (1, 1L, 30.0, 1.5)))
  }

  test("groupTrendOls: exact line recovered; flat and degenerate groups") {
    val d = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),
      ("b", 0L, 5L), ("b", 1L, 5L), ("c", 7L, 9L)).toDF("g", "t", "x")
    val out = Evaluation.groupTrendOls(d, "g", "t", "x").orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out(0) === (("a", 3L, 2.0, 1.0)))
    assert(out(1) === (("b", 2L, 0.0, 5.0)))
    assert(out(2) === (("c", 1L, null, null))) // one point: no line
  }

  test("cusumChangepoint: hand-computed level shift; constant series stat 0") {
    // x = 0,0,0,10,10 → scaled S' = 5C − 20i = −20,−40,−60,−30,0;
    // peak |S'| = 60 at t=3; stat = 60/(√600·√5) = 1.095445
    val s = Seq((1, 0), (2, 0), (3, 0), (4, 10), (5, 10)).toDF("t", "x")
    val r = Evaluation.cusumChangepoint(s, "t", "x").collect().head
    assert(r.getLong(0) === 5L && r.getInt(1) === 3 && r.getLong(2) === 60L)
    assert(r.getDouble(3) === math.rint(60.0 / (math.sqrt(600.0) * math.sqrt(5.0)) * 1e6) / 1e6)
    val const = Seq((1, 7), (2, 7), (3, 7)).toDF("t", "x")
    val rc = Evaluation.cusumChangepoint(const, "t", "x").collect().head
    assert(rc.getDouble(3) === 0.0)
  }

  test("autocorrelation: hand-computed lags on 1..4; constant series null r") {
    // x = 1,2,3,4: D = 4x−10 = −6,−2,2,6; c0 = 80; c1 = 20, c2 = −24, c3 = −36
    val s = Seq((1, 1), (2, 2), (3, 3), (4, 4)).toDF("t", "x")
    val out = Evaluation.autocorrelation(s, "t", "x", maxLag = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out === Array((1, 3L, 0.25), (2, 2L, -0.3), (3, 1L, -0.45)))
    val const = Seq((1, 7), (2, 7), (3, 7)).toDF("t", "x")
    val rc = Evaluation.autocorrelation(const, "t", "x", maxLag = 2).collect()
    assert(rc.forall(_.isNullAt(2)))
  }

  test("GraftSession.shufflePartitions parses the leading core count of a master token") {
    // ADVICE r10: the local[N,F] retry syntax ("8,3") must size shuffles
    // to N, not fall back to the machine's core count
    assert(GraftSession.shufflePartitions("8") === "8")
    assert(GraftSession.shufflePartitions("8,3") === "8")
    assert(GraftSession.shufflePartitions("32") === "32")
    val auto = Runtime.getRuntime.availableProcessors().toString
    assert(GraftSession.shufflePartitions("*") === auto)
    assert(GraftSession.shufflePartitions("*,4") === auto)
    // ADVICE r11: "0"/"0,3" would set spark.sql.shuffle.partitions=0 (an
    // invalid conf that fails far from the bad token), and a non-digit
    // typo must not silently become availableProcessors — both fail HERE
    intercept[IllegalArgumentException](GraftSession.shufflePartitions("0"))
    intercept[IllegalArgumentException](GraftSession.shufflePartitions("0,3"))
    intercept[IllegalArgumentException](GraftSession.shufflePartitions("abc"))
    intercept[IllegalArgumentException](GraftSession.shufflePartitions(""))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aho-Corasick multi-pattern substring matching (Aho & Corasick 1975)
  * — the blocklist operator of web-corpus curation (C4's badwords
  * filter, URL blocklists, policy phrase screens). A regex alternation
  * over thousands of phrases recompiles per pattern per position; the
  * AC automaton matches ALL patterns in one left-to-right pass,
  * O(text + matches) per document regardless of blocklist size.
  *
  * Shape at 100 TB: the automaton builds ONCE on the driver from the
  * phrase list (goto/fail/output arrays — tens of bytes per pattern
  * char), rides the udf closure as a broadcast, and scans inside the
  * scan stage — zero shuffle, no per-row compilation. The same
  * justification tier as the BPE encoder udf: the per-string scan is
  * inherently imperative and has no Column-algebra equivalent that
  * doesn't re-run a regex per pattern.
  */
object AhoCorasick {

  /** Immutable matcher: `count` = number of pattern OCCURRENCES (every
    * pattern, every end position — overlaps counted); `matches` = the
    * distinct patterns present. Matching is case-sensitive; lowercase
    * both sides for the usual case-insensitive screen. */
  final class Matcher private[AhoCorasick] (
      next: Array[Map[Char, Int]], fail: Array[Int], outCount: Array[Int],
      outPatterns: Array[List[String]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      next(s).getOrElse(c, 0)
    }

    def count(text: String): Long = {
      if (text == null) return 0L
      var s = 0; var n = 0L; var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        n += outCount(s)
        i += 1
      }
      n
    }

    def matchedPatterns(text: String): Seq[String] = {
      if (text == null) return Nil
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var s = 0; var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        outPatterns(s).foreach(seen += _)
        i += 1
      }
      seen.toSeq
    }
  }

  /** Build the automaton: trie + BFS failure links, with each state's
    * output set folded into a count and a pattern list (suffix outputs
    * merged at build time, so matching never walks fail chains for
    * output). */
  def build(patterns: Seq[String]): Matcher = {
    require(patterns.nonEmpty && patterns.forall(p => p != null && p.nonEmpty),
      "patterns must be non-empty strings")
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[String])
    for (p <- patterns.distinct) {
      var s = 0
      for (c <- p) {
        next(s).get(c) match {
          case Some(t) => s = t
          case None =>
            next += Map.empty; ends += Nil
            next(s) = next(s) + (c -> (next.length - 1))
            s = next.length - 1
        }
      }
      ends(s) = p :: ends(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val outCount = new Array[Int](n)
    val outPatterns = new Array[List[String]](n)
    (0 until n).foreach(i => outPatterns(i) = ends(i))
    (0 until n).foreach(i => outCount(i) = ends(i).size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- next(u)) {
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        // merge the fail target's outputs so matching is O(1) per step
        outCount(v) += outCount(fail(v))
        outPatterns(v) = outPatterns(v) ++ outPatterns(fail(v))
        queue += v
      }
    }
    new Matcher(next.toArray, fail, outCount, outPatterns)
  }

  /** Per-document blocklist screen: total occurrence count + flag.
    * Matching runs on the LOWERCASED text (supply lowercase patterns).
    * Returns input + (blocklist_hits, blocked). */
  def screen(df: DataFrame, textCol: String, patterns: Seq[String]): DataFrame = {
    val m = build(patterns.map(_.toLowerCase))
    val cnt = udf((s: String) => m.count(if (s == null) null else s.toLowerCase))
    df.withColumn("blocklist_hits", cnt(col(textCol)))
      .withColumn("blocked", col("blocklist_hits") > 0L)
  }
}

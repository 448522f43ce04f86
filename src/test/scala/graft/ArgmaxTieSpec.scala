package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Graph, Similarity}

/** Adversarial tie-break contracts for the r13 sortless-argmax rewrites
  * (VERDICT r13 #6): the rewrites (LPA label argmax, dedup keep-one,
  * bitext best-match) carry deterministic tie-breaks that the operator
  * specs pin only on tie-free fixtures. These cases plant EXACT ties at
  * the aggregate boundary — equal neighbor-label counts, equal margins,
  * duplicate content with NULL and non-numeric ids — so the contracts
  * survive future rewrites of the aggregates themselves. Also pins the
  * ADVICE r13 fixes: the argmaxes negate only the always-numeric
  * count/margin, so STRING ids/labels order natively (the r13 `-col`
  * forms null-cast non-numeric ids into a silent no-op), and the
  * keep-one ordering key is struct(id), so NULL-id rows participate
  * (bare-key min_by SKIPS null ordering keys). */
class ArgmaxTieSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")
  import spark.implicits._

  test("LPA argmax: exact count tie keeps the SMALLEST label (numeric)") {
    // vertex 10 hears label 1 once (from 1) and label 2 once (from 2):
    // a planted 1-1 tie at the argmax boundary → min label must win.
    val e = Seq((1L, 10L), (2L, 10L), (10L, 1L), (10L, 2L))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(e, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 1L, s"tie must break to the smaller label: $out")
  }

  test("LPA argmax orders STRING labels natively (ADVICE r13: negation no-op)") {
    // same planted tie with string vertex ids: the r13 max(struct(c,
    // -lbl)) null-cast '-lbl', making every round a silent no-op; the
    // min_by(lbl, struct(-c, lbl)) form must both PROPAGATE and break
    // the tie to the lexicographically smallest label.
    val e = Seq(("a", "x"), ("b", "x"), ("x", "a"), ("x", "b"))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(e, iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("x") == "a", s"string-label tie must break to 'a': $out")
    // propagation actually happened (no-op would leave x labeled "x")
    assert(out("a") == "x" && out("b") == "x", s"labels must propagate: $out")
  }

  test("keep-one: NULL ids participate and win under NULLS-FIRST (ADVICE r13)") {
    val df = Seq(
      (Option(5L), "dup text", "p5"),
      (None: Option[Long], "dup text", "pnull"),   // null id must WIN its group
      (Option(3L), "other", "p3"))
      .toDF("id", "text", "payload")
    val kept = Dedup.dropExactDuplicates(df, "id", "text")
      .collect().map(r => (r.get(0), r.getString(2))).toMap
    assert(kept.size == 2, s"one survivor per group: $kept")
    assert(kept.contains(null) && kept(null) == "pnull",
      s"null id sorts first and keeps its ROW (not a row of nulls): $kept")
  }

  test("keep-one: an ALL-null-id duplicate group still keeps one real row") {
    val df = Seq(
      (None: Option[Long], "dup", "a"),
      (None: Option[Long], "dup", "b"))
      .toDF("id", "text", "payload")
    val kept = Dedup.dropExactDuplicates(df, "id", "text").collect()
    assert(kept.length == 1, "exactly one survivor")
    // bare-key min_by returned NULL here → select(__row.*) exploded to
    // a row of nulls; struct-key must keep an original payload
    assert(kept(0).getString(1) == "dup" && kept(0).getString(2) != null,
      s"survivor must be an original row: ${kept(0)}")
  }

  test("incremental keep-one: null-id delta group survives against the index") {
    val delta = Seq(
      (None: Option[Long], "novel dup", "x"),
      (Option(9L), "novel dup", "y"))
      .toDF("id", "text", "payload")
    val index = Dedup.hashIndex(
      Seq((1L, "old content")).toDF("id", "text"), "text")
    val out = Dedup.dedupDeltaAgainstIndex(delta, "id", "text", index).collect()
    assert(out.length == 1 && out(0).getString(2) == "x",
      s"null-id keep-one must win within the delta: ${out.toSeq}")
  }

  test("bitext argmax: exact margin tie keeps the smallest y_id; string ids order natively") {
    // two IDENTICAL y vectors → identical cosine and identical rounded
    // margin for both candidates; tie must break to y_id ASC. String
    // ids pin the ADVICE r13 overflow/null-cast fix (-y_id is gone).
    val xs = Seq(("qx", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ys = Seq(
      ("yb", Seq(1.0f, 0.0f)),
      ("ya", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(xs, ys, k = 2, threshold = 0.0).collect()
    assert(out.length == 1, s"one best match per x: ${out.toSeq}")
    assert(out(0).getString(0) == "qx" && out(0).getString(1) == "ya",
      s"margin tie must break to the smaller y_id: ${out(0)}")
  }
}

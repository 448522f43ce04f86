package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jx.TypedSlots

/**
 * Law tests for the typed-slot variant algebra: every law is checked on
 * the CROSS PRODUCT of a value domain spanning all four type ranks
 * (boolean / number / string / missing), evaluated through the real
 * Column expressions in one Spark job — the NullLawsSpec pattern applied
 * to cross-type semantics (reference jx.py:614-627 order,
 * jx_sqlite/expressions.py:32-79 per-slot fragments).
 *
 * Laws:
 *  - trichotomy: exactly one of lt(a,b), eq(a,b), lt(b,a)
 *  - cmp is consistent: cmp = -1 ⟺ lt, 0 ⟺ eq, +1 ⟺ gt
 *  - eq is reflexive (incl. missing == missing) and symmetric
 *  - lt is irreflexive and asymmetric; the induced order is total
 *  - isMissing(a) ⟺ eq(a, missing)
 *  - strict arithmetic: result is a number slot iff BOTH operands are
 *    number slots; commutative where defined
 *  - sortKey order ranks every boolean below every number below every
 *    string below missing
 */
class VariantLawsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")

  /** Value domain as (tag, payload) pairs rendered into slot structs:
    * booleans, numbers (incl. negatives/extremes), strings (incl. empty
    * and numeral-looking), and missing. */
  private def variantOf(tag: org.apache.spark.sql.Column, payload: org.apache.spark.sql.Column) =
    when(tag === "b", TypedSlots.ofBoolean(payload === "true"))
      .when(tag === "n", TypedSlots.ofNumber(payload.cast("double")))
      .when(tag === "s", TypedSlots.ofString(payload))
      .otherwise(TypedSlots.missing)

  private val domain: Seq[(String, String)] = Seq(
    ("b", "true"), ("b", "false"),
    ("n", "0"), ("n", "1"), ("n", "-1"), ("n", "2.5"), ("n", "-1e15"), ("n", "1e15"),
    ("s", ""), ("s", "a"), ("s", "b"), ("s", "1"), ("s", "true"),
    ("m", ""))

  private lazy val pairs = {
    val a = spark.createDataFrame(domain).toDF("ta", "pa")
    val b = spark.createDataFrame(domain).toDF("tb", "pb")
    a.crossJoin(b)
      .withColumn("va", variantOf(col("ta"), col("pa")))
      .withColumn("vb", variantOf(col("tb"), col("pb")))
  }

  private def lawHolds(law: org.apache.spark.sql.Column, name: String): Unit = {
    val bad = pairs.where(!coalesce(law, lit(false))).count()
    assert(bad === 0L, s"law '$name' fails on $bad pairs")
  }

  test("trichotomy: exactly one of lt(a,b), eq(a,b), lt(b,a)") {
    val lt = TypedSlots.ltSlots(col("va"), col("vb"))
    val gt = TypedSlots.ltSlots(col("vb"), col("va"))
    val eq = TypedSlots.eqSlots(col("va"), col("vb"))
    lawHolds(
      (lt.cast("int") + gt.cast("int") + eq.cast("int")) === 1,
      "trichotomy")
  }

  test("cmp agrees with lt/eq and is antisymmetric") {
    val cab = TypedSlots.cmpSlots(col("va"), col("vb"))
    val cba = TypedSlots.cmpSlots(col("vb"), col("va"))
    lawHolds((cab === -1) === TypedSlots.ltSlots(col("va"), col("vb")), "cmp=-1 ⟺ lt")
    lawHolds((cab === 0) === TypedSlots.eqSlots(col("va"), col("vb")), "cmp=0 ⟺ eq")
    lawHolds(cab === -cba, "cmp antisymmetry")
  }

  test("eq is reflexive (incl. missing) and symmetric; missing ⟺ eq-to-missing") {
    lawHolds(TypedSlots.eqSlots(col("va"), col("va")), "eq reflexive")
    lawHolds(
      TypedSlots.eqSlots(col("va"), col("vb")) === TypedSlots.eqSlots(col("vb"), col("va")),
      "eq symmetric")
    lawHolds(
      TypedSlots.isMissing(col("va")) === TypedSlots.eqSlots(col("va"), TypedSlots.missing),
      "isMissing ⟺ eq(·, missing)")
  }

  test("lt is irreflexive; type ranks order bool < number < string < missing") {
    lawHolds(!TypedSlots.ltSlots(col("va"), col("va")), "lt irreflexive")
    // rank of a variant under the fixed type order
    def rank(v: org.apache.spark.sql.Column) =
      when(v.getField("b").isNotNull, 0).when(v.getField("n").isNotNull, 1)
        .when(v.getField("s").isNotNull, 2).otherwise(3)
    // different ranks ⇒ lt follows the fixed type order
    lawHolds(
      when(rank(col("va")) < rank(col("vb")), TypedSlots.ltSlots(col("va"), col("vb")))
        .when(rank(col("va")) > rank(col("vb")), TypedSlots.ltSlots(col("vb"), col("va")))
        .otherwise(lit(true)),
      "cross-rank order is the type order")
  }

  test("fromJsonToken types by syntax; malformed and null collapse to missing") {
    val toks = Seq("true", "false", "42", "-1.5", "2e3", "\"abc\"", "\"42\"", "\"\"",
      "null", "", "  true ", "nonsense", "{", "[1,2]", null)
    val df = spark.createDataFrame(toks.map(Tuple1(_))).toDF("tok")
      .withColumn("v", TypedSlots.fromJsonToken(col("tok")))
      .select(col("tok"), col("v.b").as("b"), col("v.n").as("n"), col("v.s").as("s"))
    val got = df.collect().map(r => r.getString(0) ->
      ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got("true") === (Some(true), None, None))
    assert(got("  true ") === (Some(true), None, None))   // token is trimmed
    assert(got("false") === (Some(false), None, None))
    assert(got("42") === (None, Some(42.0), None))
    assert(got("-1.5") === (None, Some(-1.5), None))
    assert(got("2e3") === (None, Some(2000.0), None))
    assert(got("\"abc\"") === (None, None, Some("abc")))
    assert(got("\"42\"") === (None, None, Some("42")))    // quoted stays a STRING
    assert(got("\"\"") === (None, None, Some("")))
    for (m <- Seq("null", "", "nonsense", "{", "[1,2]", null))
      assert(got(m) === (None, None, None), s"token '$m' should be missing")
  }

  test("nested variants: sortKeyNested induces the full TYPE_ORDER incl. list/object laws") {
    import org.apache.spark.sql.Column
    def nEl(v: Double): Column = struct(
      lit(null).cast("boolean").as("b"), lit(v).cast("double").as("n"),
      lit(null).cast("string").as("s"))
    def sEl(v: String): Column = struct(
      lit(null).cast("boolean").as("b"), lit(null).cast("double").as("n"),
      lit(v).cast("string").as("s"))
    def ent(k: String, v: Column): Column = struct(lit(k).as("k"), v.as("v"))
    // the domain, WRITTEN IN expected reference order (jx.py:614-627 +
    // the list zip/len and object sorted-key-union walks):
    val ordered: Seq[Column] = Seq(
      TypedSlots.nvOfScalar(TypedSlots.ofBoolean(lit(false))),      // 0
      TypedSlots.nvOfScalar(TypedSlots.ofBoolean(lit(true))),       // 1
      TypedSlots.nvOfScalar(TypedSlots.ofNumber(lit(-3))),          // 2
      TypedSlots.nvOfScalar(TypedSlots.ofNumber(lit(2))),           // 3
      TypedSlots.nvOfScalar(TypedSlots.ofString(lit(""))),          // 4
      TypedSlots.nvOfScalar(TypedSlots.ofString(lit("z"))),         // 5
      TypedSlots.nvOfList(array()),                                 // 6: [] starts rank 3
      TypedSlots.nvOfList(array(nEl(1))),                           // 7: [1]
      TypedSlots.nvOfList(array(nEl(1), nEl(0))),                   // 8: [1,0] > [1] (prefix, longer)
      TypedSlots.nvOfList(array(nEl(1), sEl("x"))),                 // 9: number elem < string elem
      TypedSlots.nvOfList(array(nEl(2))),                           // 10: [2]
      TypedSlots.nvOfObject(array(ent("a", nEl(1)), ent("b", sEl("x")))), // 11: {a:1,b:x} < {a:1}!
      TypedSlots.nvOfObject(array(ent("a", nEl(1)))),               // 12: absent b = missing, sorts last
      TypedSlots.nvOfObject(array(ent("a", nEl(2)))),               // 13
      TypedSlots.nvOfObject(array(ent("b", nEl(0)))),               // 14: missing at key a > any a value
      TypedSlots.nvOfObject(array()),                               // 15: {} missing at EVERY key
      TypedSlots.nvMissing)                                         // 16
    val byId = ordered.zipWithIndex.map { case (c, i) => (i, c) }
    val df = spark.range(ordered.size).toDF("id")
      .withColumn("v", byId.tail.foldLeft(when(col("id") === 0, byId.head._2)) {
        case (acc, (i, c)) => acc.when(col("id") === i, c)
      })
    val got = df.orderBy(TypedSlots.sortKeyNested(col("v")))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === (0L until ordered.size.toLong),
      s"sortKeyNested must reproduce the reference order, got $got")
    // SENTINEL law beyond the BMP (review r9): an emoji key (UTF-8 F0…)
    // out-sorts any U+FFFF-based "maximal string", so the end marker
    // must be a RANK, not a key value — {"😀": 1} still sorts BEFORE {}
    // (absent key reads missing, sorts last) at every depth
    val emoji = spark.range(2).toDF("id").withColumn("v",
      when(col("id") === 0, TypedSlots.nvOfObject(array(ent("😀", nEl(1)))))
        .otherwise(TypedSlots.nvOfObject(array())))
    val gotE = emoji.orderBy(TypedSlots.sortKeyNested(col("v")))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(gotE === Seq(0L, 1L), "emoji-keyed object must sort before {}")
    val emoji2 = spark.range(2).toDF("id").withColumn("v",
      when(col("id") === 0, TypedSlots.nv2OfObject(
          array(struct(lit("😀").as("k"),
            TypedSlots.nvOfScalar(TypedSlots.ofNumber(lit(1))).as("v")))))
        .otherwise(TypedSlots.nv2OfObject(array())))
    val gotE2 = emoji2.orderBy(TypedSlots.sortKeyNested2(col("v")))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(gotE2 === Seq(0L, 1L), "depth-2 emoji-keyed object must sort before {}")
    // nvEq: reflexive, and distinct domain values are pairwise unequal
    // (incl. {} vs missing and [] vs missing)
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val eqs = a.crossJoin(b)
      .select(col("ia"), col("ib"), TypedSlots.nvEq(col("va"), col("vb")).as("eq"))
      .where(col("eq") =!= (col("ia") === col("ib"))).count()
    assert(eqs === 0L, "nvEq must hold exactly on the diagonal")
  }

  // reference comparator (jx.py:560-627 TYPE_ORDER + dict key-union
  // walk; lists elementwise then by length) implemented directly — fully
  // recursive, so it models depth-1 AND depth-2 variants
  sealed trait V
  case class VB(b: Boolean) extends V
  case class VN(n: Double) extends V
  case class VS(s: String) extends V
  case class VL(xs: Seq[V]) extends V
  case class VO(kv: Seq[(String, V)]) extends V
  case object VM extends V
  private def rk(v: V): Int = v match {
    case _: VB => 0; case _: VN => 1; case _: VS => 2
    case _: VL => 3; case _: VO => 4; case VM => 9
  }
  private def cmp(a: V, b: V): Int = {
    val r = Integer.compare(rk(a), rk(b))
    if (r != 0) r else (a, b) match {
      case (VB(x), VB(y)) => x.compareTo(y)
      case (VN(x), VN(y)) => x.compareTo(y)
      case (VS(x), VS(y)) => x.compareTo(y)
      case (VL(x), VL(y)) =>
        x.zip(y).iterator.map { case (p, q) => cmp(p, q) }.find(_ != 0)
          .getOrElse(Integer.compare(x.length, y.length))
      case (VO(x), VO(y)) =>
        val mx = x.toMap; val my = y.toMap
        (mx.keySet ++ my.keySet).toSeq.sorted.iterator
          .map(k => cmp(mx.getOrElse(k, VM), my.getOrElse(k, VM)))
          .find(_ != 0).getOrElse(0)
      case _ => 0
    }
  }
  private def scalarCol(v: V): org.apache.spark.sql.Column = v match {
    case VB(x) => TypedSlots.ofBoolean(lit(x))
    case VN(x) => TypedSlots.ofNumber(lit(x))
    case VS(x) => TypedSlots.ofString(lit(x))
    case _     => TypedSlots.missing
  }
  /** Depth-1 encoder: lists/objects hold scalars. */
  private def nvCol(v: V): org.apache.spark.sql.Column = v match {
    case VL(xs) => TypedSlots.nvOfList(
      if (xs.isEmpty) array() else array(xs.map(scalarCol): _*))
    case VO(kv) => TypedSlots.nvOfObject(
      if (kv.isEmpty) array()
      else array(kv.sortBy(_._1).map { case (k, x) =>
        struct(lit(k).as("k"), scalarCol(x).as("v")) }: _*))
    case other  => TypedSlots.nvOfScalar(scalarCol(other))
  }
  /** Depth-2 encoder: lists/objects hold DEPTH-1 variants. */
  private def nv2Col(v: V): org.apache.spark.sql.Column = v match {
    case VL(xs) => TypedSlots.nv2OfList(
      if (xs.isEmpty) array() else array(xs.map(nvCol): _*))
    case VO(kv) => TypedSlots.nv2OfObject(
      if (kv.isEmpty) array()
      else array(kv.sortBy(_._1).map { case (k, x) =>
        struct(lit(k).as("k"), nvCol(x).as("v")) }: _*))
    case other  => TypedSlots.nv2OfScalar(scalarCol(other))
  }

  /** Depth-3 encoder: lists/objects hold DEPTH-2 variants. */
  private def nv3Col(v: V): org.apache.spark.sql.Column = v match {
    case VL(xs) => TypedSlots.nv3OfList(
      if (xs.isEmpty) array() else array(xs.map(nv2Col): _*))
    case VO(kv) => TypedSlots.nv3OfObject(
      if (kv.isEmpty) array()
      else array(kv.sortBy(_._1).map { case (k, x) =>
        struct(lit(k).as("k"), nv2Col(x).as("v")) }: _*))
    case other  => TypedSlots.nv3OfScalar(scalarCol(other))
  }

  test("nested sort order matches a direct value_compare model on random variants") {
    val rnd = new scala.util.Random(20260812L)
    def randScalar(): V = rnd.nextInt(4) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(4).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case _ => VM
    }
    def randV(): V = rnd.nextInt(6) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(4).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case 3 => VL(Seq.fill(rnd.nextInt(4))(randScalar()))
      case 4 => VO(Seq("a", "b", "c").filter(_ => rnd.nextBoolean()).map(_ -> randScalar()))
      case _ => VM
    }
    val vs = Vector.fill(120)(randV())
    val expected = vs.zipWithIndex
      .sortWith { case ((a, i), (b, j)) =>
        val c = cmp(a, b); if (c != 0) c < 0 else i < j }
      .map(_._2.toLong)
    val df = spark.range(vs.size).toDF("id")
      .withColumn("v", vs.zipWithIndex.tail.foldLeft(
        when(col("id") === 0, nvCol(vs.head))) {
        case (acc, (v, i)) => acc.when(col("id") === i, nvCol(v))
      })
    val got = df.orderBy(TypedSlots.sortKeyNested(col("v")), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === expected, s"random-domain order mismatch")
    // and equality agrees with the model: nvEq(a,b) ⟺ cmp(a,b) == 0
    // (includes {} == {a: missing} after the encoder normalization)
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val eqGot = a.crossJoin(b)
      .select(col("ia"), col("ib"), TypedSlots.nvEq(col("va"), col("vb")).as("eq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    for (i <- vs.indices; j <- vs.indices) {
      val want = cmp(vs(i), vs(j)) == 0
      assert(eqGot((i.toLong, j.toLong)) === want,
        s"nvEq(${vs(i)}, ${vs(j)}) should be $want")
    }
  }

  test("depth-2 nested sort and equality match the value_compare model") {
    val rnd = new scala.util.Random(20260813L)
    def randScalar(): V = rnd.nextInt(4) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case _ => VM
    }
    // depth-1 value: scalar, list of scalars, or object of scalars
    def randV1(): V = rnd.nextInt(6) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case 3 => VL(Seq.fill(rnd.nextInt(3))(randScalar()))
      case 4 => VO(Seq("a", "b").filter(_ => rnd.nextBoolean()).map(_ -> randScalar()))
      case _ => VM
    }
    // depth-2 value: list/object members are depth-1 values
    def randV2(): V = rnd.nextInt(6) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case 3 => VL(Seq.fill(rnd.nextInt(3))(randV1()))
      case 4 => VO(Seq("a", "b", "c").filter(_ => rnd.nextBoolean()).map(_ -> randV1()))
      case _ => VM
    }
    val vs = Vector.fill(110)(randV2())
    val expected = vs.zipWithIndex
      .sortWith { case ((a, i), (b, j)) =>
        val c = cmp(a, b); if (c != 0) c < 0 else i < j }
      .map(_._2.toLong)
    val df = spark.range(vs.size).toDF("id")
      .withColumn("v", vs.zipWithIndex.tail.foldLeft(
        when(col("id") === 0, nv2Col(vs.head))) {
        case (acc, (v, i)) => acc.when(col("id") === i, nv2Col(v))
      })
    val got = df.orderBy(TypedSlots.sortKeyNested2(col("v")), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === expected, "depth-2 random-domain order mismatch")
    // equality agrees with the model one level down, including the
    // {a: missing} == {} law applied to nested object VALUES
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val eqGot = a.crossJoin(b)
      .select(col("ia"), col("ib"), TypedSlots.nv2Eq(col("va"), col("vb")).as("eq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    for (i <- vs.indices; j <- vs.indices) {
      val want = cmp(vs(i), vs(j)) == 0
      assert(eqGot((i.toLong, j.toLong)) === want,
        s"nv2Eq(${vs(i)}, ${vs(j)}) should be $want")
    }
  }

  test("depth-3 nested sort and equality match the value_compare model") {
    val rnd = new scala.util.Random(20260814L)
    def randScalar(): V = rnd.nextInt(4) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case _ => VM
    }
    def randV1(): V = rnd.nextInt(6) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case 3 => VL(Seq.fill(rnd.nextInt(3))(randScalar()))
      case 4 => VO(Seq("a", "b").filter(_ => rnd.nextBoolean()).map(_ -> randScalar()))
      case _ => VM
    }
    def randV2(): V = rnd.nextInt(6) match {
      case 0 => VN(rnd.nextInt(3).toDouble)
      case 1 => VS(Seq("", "a")(rnd.nextInt(2)))
      case 2 => VL(Seq.fill(rnd.nextInt(3))(randV1()))
      case 3 => VL(Seq.fill(rnd.nextInt(2))(randV1()))
      case 4 => VO(Seq("a", "b").filter(_ => rnd.nextBoolean()).map(_ -> randV1()))
      case _ => VM
    }
    // depth-3 value: list/object members are depth-2 values (which may
    // themselves hold depth-1 lists/objects) — lists of lists of lists,
    // objects of lists of objects, etc.
    def randV3(): V = rnd.nextInt(6) match {
      case 0 => VB(rnd.nextBoolean())
      case 1 => VN(rnd.nextInt(3).toDouble)
      case 2 => VS(Seq("", "a", "b")(rnd.nextInt(3)))
      case 3 => VL(Seq.fill(rnd.nextInt(3))(randV2()))
      case 4 => VO(Seq("a", "b", "c").filter(_ => rnd.nextBoolean()).map(_ -> randV2()))
      case _ => VM
    }
    val vs = Vector.fill(100)(randV3())
    val expected = vs.zipWithIndex
      .sortWith { case ((a, i), (b, j)) =>
        val c = cmp(a, b); if (c != 0) c < 0 else i < j }
      .map(_._2.toLong)
    val df = spark.range(vs.size).toDF("id")
      .withColumn("v", vs.zipWithIndex.tail.foldLeft(
        when(col("id") === 0, nv3Col(vs.head))) {
        case (acc, (v, i)) => acc.when(col("id") === i, nv3Col(v))
      })
    val got = df.orderBy(TypedSlots.sortKeyNested3(col("v")), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === expected, "depth-3 random-domain order mismatch")
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val eqGot = a.crossJoin(b)
      .select(col("ia"), col("ib"), TypedSlots.nv3Eq(col("va"), col("vb")).as("eq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    for (i <- vs.indices; j <- vs.indices) {
      val want = cmp(vs(i), vs(j)) == 0
      assert(eqGot((i.toLong, j.toLong)) === want,
        s"nv3Eq(${vs(i)}, ${vs(j)}) should be $want")
    }
  }

  test("strict arithmetic: number iff both numbers; commutative; missing propagates") {
    val add = TypedSlots.addSlots(col("va"), col("vb"))
    val bothNum = col("va.n").isNotNull && col("vb.n").isNotNull
    lawHolds(TypedSlots.isMissing(add) === !bothNum, "add is number iff both numbers")
    lawHolds(
      TypedSlots.eqSlots(add, TypedSlots.addSlots(col("vb"), col("va"))),
      "add commutative")
    lawHolds(
      TypedSlots.isMissing(TypedSlots.mulSlots(col("va"), TypedSlots.missing)),
      "mul by missing is missing")
  }
}

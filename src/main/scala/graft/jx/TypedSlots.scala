package graft.jx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The reference's typed-column encoding and cross-type ordering, as an
 * ENCODER DETAIL (SURVEY §1.3): a variant scalar is a struct of typed
 * slots `{b, n, s}` — boolean / number / string — with exactly one slot
 * populated (reference vendor/mo_json/typed_encoder.py:18-23, which
 * suffixes storage columns `$B/$N/$S` for the same reason: SQLite and
 * Spark columns are mono-typed, so type mixing becomes slot mixing).
 *
 * Cross-type sort (vendor/jx_python/jx.py:614-627) uses the fixed type
 * order boolean < number < string < missing-last; [[sortKey]] compiles
 * that to a lexicographic struct key, so `orderBy(sortKey(v))` is one
 * ordinary sort — no UDF comparator, fully codegen'd, sortable at any
 * scale. The nested {b,n,s,l,o} encoding below extends this to the
 * reference's full TYPE_ORDER (list < object between string and
 * missing) via [[sortKeyNested]] at one nesting level and
 * [[sortKeyNested2]] at two (lists of lists/objects, objects holding
 * lists/objects); depth ≥3 stays a documented deviation (SURVEY
 * §7.4.7).
 */
object TypedSlots {

  private val NullB = lit(null).cast(BooleanType)
  private val NullN = lit(null).cast(DoubleType)
  private val NullS = lit(null).cast(StringType)

  private def mk(b: Column, n: Column, s: Column): Column =
    struct(b.as("b"), n.as("n"), s.as("s"))

  def ofBoolean(c: Column): Column = mk(c.cast(BooleanType), NullN, NullS)
  def ofNumber(c: Column): Column = mk(NullB, c.cast(DoubleType), NullS)
  def ofString(c: Column): Column = mk(NullB, NullN, c.cast(StringType))

  /** All slots null — the reference's `missing` (sorts after every value). */
  def missing: Column = mk(NullB, NullN, NullS)

  /** Encode a column of `df` by its Spark type; timestamps/dates follow
    * the reference's Date → NUMBER mapping (unix seconds). */
  def encode(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case BooleanType               => ofBoolean(col(colName))
      case _: NumericType            => ofNumber(col(colName))
      case TimestampType | DateType  => ofNumber(col(colName).cast(TimestampType).cast(DoubleType))
      case StringType                => ofString(col(colName))
      case other =>
        throw new IllegalArgumentException(
          s"no typed slot for $colName: $other — nested values stay typed columns")
    }

  /** DECISIVE equality over two variants — slot-wise null-safe equality
    * `a.b <=> b.b && a.n <=> b.n && a.s <=> b.s` (the reference compiles
    * eq over typed columns to per-slot fragments,
    * vendor/jx_sqlite/expressions.py:32-79). At most one slot of each
    * side is populated, so two variants are equal iff they hold the SAME
    * type and the same value — and, per the reference's decisive eq,
    * missing == missing is TRUE and the result is never null. */
  def eqSlots(a: Column, b: Column): Column =
    (a.getField("b") <=> b.getField("b")) &&
      (a.getField("n") <=> b.getField("n")) &&
      (a.getField("s") <=> b.getField("s"))

  /** The reference's `missing` predicate: no slot populated. Never null. */
  def isMissing(slots: Column): Column =
    slots.getField("b").isNull && slots.getField("n").isNull &&
      slots.getField("s").isNull

  /** Parse a RAW JSON value token into typed slots — how variant columns
    * actually arise at ingestion (the reference types each JSON value
    * into its $B/$N/$S storage column the same way,
    * typed_encoder.py:18-23): `true`/`false` → boolean slot, a quoted
    * string → string slot (quotes stripped; escape handling is the
    * caller's concern), a JSON number → number slot, `null`/absent/
    * malformed → missing. Pure Column algebra, codegen'd in the scan.
    * NOTE: takes the raw TOKEN (e.g. `regexp_extract` of the document),
    * not `get_json_object` output — the latter strips quotes and loses
    * the number-vs-string distinction. */
  def fromJsonToken(token: Column): Column = {
    val tok = trim(token)
    when(tok.isNull || tok === "null" || tok === "", missing)
      .when(tok === "true", ofBoolean(lit(true)))
      .when(tok === "false", ofBoolean(lit(false)))
      .when(tok.rlike("^\".*\"$"),
        ofString(regexp_replace(tok, "^\"|\"$", "")))
      .when(tok.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$"),
        ofNumber(tok.cast(DoubleType)))
      .otherwise(missing)
  }

  /** Slot-aware STRICT arithmetic: number ∘ number → number slot,
    * anything else (boolean, string, missing on either side) → missing —
    * the reference's typed compile routes arithmetic to the number
    * fragment only (expressions.py:32-79); non-number slots contribute
    * NULL there, which strict mode surfaces as missing. */
  def addSlots(a: Column, b: Column): Column = numBin(a, b, _ + _)
  def mulSlots(a: Column, b: Column): Column = numBin(a, b, _ * _)

  private def numBin(a: Column, b: Column, f: (Column, Column) => Column): Column = {
    val r = f(a.getField("n"), b.getField("n"))
    when(r.isNotNull, ofNumber(r)).otherwise(missing)
  }

  /** Decisive cross-type LESS-THAN under the reference order
    * (bool < number < string < missing, jx.py:614-627): an ordinary
    * struct comparison of the [[sortKey]]s. Never null — the keys are
    * never null, same-rank rows populate the SAME slot on both sides
    * (so no null-vs-value field comparison arises), and two missings
    * compare equal. */
  def ltSlots(a: Column, b: Column): Column = sortKey(a) < sortKey(b)

  /** Three-way decisive comparison: -1 / 0 / +1 under the cross-type
    * order — [[ltSlots]] and [[eqSlots]] composed. */
  def cmpSlots(a: Column, b: Column): Column =
    when(ltSlots(a, b), -1).when(eqSlots(a, b), 0).otherwise(1)

  /** Variant as a GROUP KEY: the slots struct itself — Spark's grouping
    * compares struct fields null-safely, so each (type, value) pair forms
    * its own group and all-missing rows form exactly one group, matching
    * the reference's typed-column groupby. Named for intent at call
    * sites; no transformation is needed. */
  def groupKey(slots: Column): Column = slots

  /** Lexicographic sort key for the reference's cross-type order:
    * false < true < numbers < strings < missing. A slot that is null in
    * BOTH compared rows (always the case for same-rank rows) compares
    * equal, so within a type rank the populated slot decides. */
  def sortKey(slots: Column): Column = struct(
    when(slots.getField("b").isNotNull, 0)
      .when(slots.getField("n").isNotNull, 1)
      .when(slots.getField("s").isNotNull, 2)
      .otherwise(3).as("tr"),
    slots.getField("b").cast(IntegerType).as("b"),
    slots.getField("n").as("n"),
    slots.getField("s").as("s"))

  // -- nested variants: {b, n, s, l, o} -----------------------------------
  //
  // One nesting level of the reference's full TYPE_ORDER
  // (vendor/jx_python/jx.py:614-627): boolean 0 < number 1 < string 2 <
  // list 3 < object 4 < missing 9. Lists hold scalar variants and compare
  // elementwise then by length (jx.py:570-583 zip + len — Spark's array
  // ordering is exactly that); objects compare over the sorted UNION of
  // keys with an absent key reading as missing-sorts-last
  // (jx.py:596-604). The union walk becomes a per-row encoding via the
  // SENTINEL trick below — no pairwise logic, so the key is an ordinary
  // sortable struct at any scale. Deeper nesting (lists of lists/objects)
  // remains out of scope, documented in SURVEY §7.4.7.

  private val ElemT = "array<struct<b:boolean,n:double,s:string>>"
  private val EntryT = "array<struct<k:string,v:struct<b:boolean,n:double,s:string>>>"
  private val NullL = lit(null).cast(ElemT)
  private val NullO = lit(null).cast(EntryT)

  private def mkNv(b: Column, n: Column, s: Column, l: Column, o: Column): Column =
    struct(b.as("b"), n.as("n"), s.as("s"), l.as("l"), o.as("o"))

  /** Lift a scalar {b,n,s} variant (including [[missing]]) into the
    * nested encoding. */
  def nvOfScalar(slots: Column): Column =
    mkNv(slots.getField("b"), slots.getField("n"), slots.getField("s"), NullL, NullO)

  /** List variant from an array of scalar {b,n,s} slot structs. */
  def nvOfList(elems: Column): Column = mkNv(NullB, NullN, NullS, elems.cast(ElemT), NullO)

  /** Object variant from an array of (k, v) entries — `v` a scalar slots
    * struct. Entries MUST be sorted by `k` (the reference walks keys in
    * sorted order); the encoder trusts the caller so the key stays a pure
    * projection. Entries whose value is MISSING are dropped at
    * construction: `{a: null}` and `{}` are indistinguishable under the
    * reference's key-union walk (an absent key reads None either way),
    * and its typed encoder never stores a null — found by the
    * value_compare model test in VariantLawsSpec. */
  def nvOfObject(entries: Column): Column =
    mkNv(NullB, NullN, NullS, NullL,
      filter(entries.cast(EntryT), e => !isMissing(e.getField("v"))))

  def nvMissing: Column = mkNv(NullB, NullN, NullS, NullL, NullO)

  /** TYPE_ORDER rank of a nested variant (jx.py:614-627). */
  def nvRank(v: Column): Column =
    when(v.getField("b").isNotNull, 0)
      .when(v.getField("n").isNotNull, 1)
      .when(v.getField("s").isNotNull, 2)
      .when(v.getField("l").isNotNull, 3)
      .when(v.getField("o").isNotNull, 4)
      .otherwise(9)

  private def scalarRank(e: Column): Column =
    when(e.getField("b").isNotNull, 0)
      .when(e.getField("n").isNotNull, 1)
      .when(e.getField("s").isNotNull, 2)
      .otherwise(9)

  private def elemKey(e: Column): Column = struct(
    scalarRank(e).as("tr"), e.getField("b").cast(IntegerType).as("b"),
    e.getField("n").as("n"), e.getField("s").as("s"))

  /** Appended to every encoded object's entry list. Its leading `end`
    * rank (1, vs 0 on every real entry) sorts it above ANY real entry:
    * no "maximal key string" exists under UTF-8 binary order — a
    * supplementary-plane key (e.g. an emoji, F0-prefixed) out-sorts
    * U+FFFF pairs (EF BF BF), so the end marker must be a RANK field,
    * never a key value (review r9). When one side's entries run out
    * first, the other side's next real entry compares against the
    * sentinel and loses — the side with the extra key is SMALLER,
    * which is exactly the reference's union-key walk where the absent
    * key reads as missing (rank 9, sorts last). Equal key sets meet
    * sentinel-vs-sentinel: a tie. */
  private val ObjSentinel = struct(
    lit(1).as("end"), lit("").as("k"), lit(9).as("tr"),
    lit(null).cast(IntegerType).as("b"), NullN.as("n"), NullS.as("s"))

  /** Cross-type sort key for nested variants: lexicographic struct of
    * (rank, scalar slots, list element keys, object entry keys +
    * sentinel). `orderBy(sortKeyNested(v))` is one ordinary codegen'd
    * sort — no UDF comparator — and range-partitions like any struct. */
  def sortKeyNested(v: Column): Column = {
    val lk = when(v.getField("l").isNotNull, transform(v.getField("l"), elemKey(_)))
      .otherwise(array().cast("array<struct<tr:int,b:int,n:double,s:string>>"))
    val ok = when(v.getField("o").isNotNull,
        concat(
          transform(v.getField("o"), e => struct(
            lit(0).as("end"),
            e.getField("k").as("k"), scalarRank(e.getField("v")).as("tr"),
            e.getField("v").getField("b").cast(IntegerType).as("b"),
            e.getField("v").getField("n").as("n"),
            e.getField("v").getField("s").as("s"))),
          array(ObjSentinel)))
      .otherwise(array().cast("array<struct<end:int,k:string,tr:int,b:int,n:double,s:string>>"))
    struct(nvRank(v).as("tr"), v.getField("b").cast(IntegerType).as("b"),
      v.getField("n").as("n"), v.getField("s").as("s"), lk.as("l"), ok.as("o"))
  }

  /** Decisive equality over nested variants — slot-wise null-safe
    * equality; Spark's `<=>` on array/struct slots compares structurally,
    * so lists match elementwise and objects match on their sorted
    * entries. Missing == missing is TRUE; never null. */
  def nvEq(a: Column, b: Column): Column =
    Seq("b", "n", "s", "l", "o").map(f => a.getField(f) <=> b.getField(f)).reduce(_ && _)

  // -- depth-2 nested variants: {b, n, s, l:[nv1], o:[(k, nv1)]} ----------
  //
  // One MORE level of the reference's TYPE_ORDER (jx.py:560-627): list
  // elements and object values are themselves depth-1 {b,n,s,l,o}
  // variants, so lists of lists, lists of objects, and objects holding
  // lists/objects (of scalars) order exactly as the reference's
  // recursive value_compare. The construction COMPOSES: a depth-2
  // element's key IS [[sortKeyNested]] of its depth-1 value, and
  // Spark's lexicographic struct comparison recurses structurally, so
  // the composed key remains one ordinary codegen'd sort column. Spark's
  // type system has no recursive structs, so each additional depth
  // repeats this construction; SURVEY §7.4.7 documents the boundary,
  // which this moves from depth 1 to depth 2.

  private val Nv1T = s"struct<b:boolean,n:double,s:string,l:$ElemT,o:$EntryT>"
  private val Elem2T = s"array<$Nv1T>"
  private val Entry2T = s"array<struct<k:string,v:$Nv1T>>"
  private val NullL2 = lit(null).cast(Elem2T)
  private val NullO2 = lit(null).cast(Entry2T)
  private val Nv1KeyT = "struct<tr:int,b:int,n:double,s:string," +
    "l:array<struct<tr:int,b:int,n:double,s:string>>," +
    "o:array<struct<end:int,k:string,tr:int,b:int,n:double,s:string>>>"

  /** A depth-1 variant is missing: all five slots null. Never null. */
  def nvIsMissing(v: Column): Column =
    Seq("b", "n", "s", "l", "o").map(f => v.getField(f).isNull).reduce(_ && _)

  /** Lift a scalar {b,n,s} variant (including [[missing]]) to depth 2. */
  def nv2OfScalar(slots: Column): Column =
    struct(slots.getField("b").as("b"), slots.getField("n").as("n"),
      slots.getField("s").as("s"), NullL2.as("l"), NullO2.as("o"))

  /** List variant over DEPTH-1 variants (scalars, lists, objects). */
  def nv2OfList(elems: Column): Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"),
      elems.cast(Elem2T).as("l"), NullO2.as("o"))

  /** Object variant over (k, depth-1 variant) entries sorted by `k`;
    * missing-valued entries are dropped at construction — the same
    * `{a: null} == {}` law as [[nvOfObject]]. */
  def nv2OfObject(entries: Column): Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"), NullL2.as("l"),
      filter(entries.cast(Entry2T), e => !nvIsMissing(e.getField("v"))).as("o"))

  def nv2Missing: Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"), NullL2.as("l"), NullO2.as("o"))

  /** Cross-type sort key for DEPTH-2 variants: same shape as
    * [[sortKeyNested]], with each list element / object value keyed by
    * the full depth-1 key. The object sentinel carries the missing
    * key, preserving the union-walk law (absent key sorts last) one
    * level down. */
  def sortKeyNested2(v: Column): Column = {
    val lk = when(v.getField("l").isNotNull,
        transform(v.getField("l"), e => sortKeyNested(e)))
      .otherwise(array().cast(s"array<$Nv1KeyT>"))
    val ok = when(v.getField("o").isNotNull,
        concat(
          transform(v.getField("o"), e =>
            struct(lit(0).as("end"), e.getField("k").as("k"),
              sortKeyNested(e.getField("v")).as("v"))),
          array(struct(lit(1).as("end"), lit("").as("k"),
            sortKeyNested(nvMissing).as("v")))))
      .otherwise(array().cast(s"array<struct<end:int,k:string,v:$Nv1KeyT>>"))
    struct(nvRank(v).as("tr"), v.getField("b").cast(IntegerType).as("b"),
      v.getField("n").as("n"), v.getField("s").as("s"), lk.as("l"), ok.as("o"))
  }

  /** Decisive equality over depth-2 variants; structural like [[nvEq]]. */
  def nv2Eq(a: Column, b: Column): Column =
    Seq("b", "n", "s", "l", "o").map(f => a.getField(f) <=> b.getField(f)).reduce(_ && _)

  // -- depth-3 nested variants: {b, n, s, l:[nv2], o:[(k, nv2)]} ----------
  //
  // One more repetition of the same construction (Spark structs are not
  // recursive, so each depth is spelled out): list elements and object
  // values are depth-2 variants, covering lists of lists of lists,
  // lists of objects-holding-lists, and objects holding lists of lists
  // — the reference's recursive value_compare (jx.py:560-627) to depth
  // 3. Each element key IS [[sortKeyNested2]] of its depth-2 value, and
  // lexicographic struct comparison recurses structurally, so the key
  // stays one ordinary codegen'd sort column. Depth ≥4 remains the
  // documented boundary (README "Deviations", SURVEY §7.4.7).

  private val Nv2T = s"struct<b:boolean,n:double,s:string,l:$Elem2T,o:$Entry2T>"
  private val Elem3T = s"array<$Nv2T>"
  private val Entry3T = s"array<struct<k:string,v:$Nv2T>>"
  private val NullL3 = lit(null).cast(Elem3T)
  private val NullO3 = lit(null).cast(Entry3T)
  private val Nv2KeyT = s"struct<tr:int,b:int,n:double,s:string," +
    s"l:array<$Nv1KeyT>,o:array<struct<end:int,k:string,v:$Nv1KeyT>>>"

  /** A depth-2 variant is missing: all five slots null. Never null. */
  def nv2IsMissing(v: Column): Column =
    Seq("b", "n", "s", "l", "o").map(f => v.getField(f).isNull).reduce(_ && _)

  /** Lift a scalar {b,n,s} variant (including [[missing]]) to depth 3. */
  def nv3OfScalar(slots: Column): Column =
    struct(slots.getField("b").as("b"), slots.getField("n").as("n"),
      slots.getField("s").as("s"), NullL3.as("l"), NullO3.as("o"))

  /** List variant over DEPTH-2 variants. */
  def nv3OfList(elems: Column): Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"),
      elems.cast(Elem3T).as("l"), NullO3.as("o"))

  /** Object variant over (k, depth-2 variant) entries sorted by `k`;
    * missing-valued entries are dropped — the `{a: null} == {}` law. */
  def nv3OfObject(entries: Column): Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"), NullL3.as("l"),
      filter(entries.cast(Entry3T), e => !nv2IsMissing(e.getField("v"))).as("o"))

  def nv3Missing: Column =
    struct(NullB.as("b"), NullN.as("n"), NullS.as("s"), NullL3.as("l"), NullO3.as("o"))

  /** Cross-type sort key for DEPTH-3 variants: same shape as
    * [[sortKeyNested2]], each list element / object value keyed by the
    * full depth-2 key; the object sentinel preserves the
    * absent-key-sorts-last union-walk law one more level down. */
  def sortKeyNested3(v: Column): Column = {
    val lk = when(v.getField("l").isNotNull,
        transform(v.getField("l"), e => sortKeyNested2(e)))
      .otherwise(array().cast(s"array<$Nv2KeyT>"))
    val ok = when(v.getField("o").isNotNull,
        concat(
          transform(v.getField("o"), e =>
            struct(lit(0).as("end"), e.getField("k").as("k"),
              sortKeyNested2(e.getField("v")).as("v"))),
          array(struct(lit(1).as("end"), lit("").as("k"),
            sortKeyNested2(nv2Missing).as("v")))))
      .otherwise(array().cast(s"array<struct<end:int,k:string,v:$Nv2KeyT>>"))
    struct(nvRank(v).as("tr"), v.getField("b").cast(IntegerType).as("b"),
      v.getField("n").as("n"), v.getField("s").as("s"), lk.as("l"), ok.as("o"))
  }

  /** Decisive equality over depth-3 variants; structural like [[nvEq]]. */
  def nv3Eq(a: Column, b: Column): Column =
    Seq("b", "n", "s", "l", "o").map(f => a.getField(f) <=> b.getField(f)).reduce(_ && _)
}

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
 * scale. (The reference also orders list < object after string; slots
 * carry scalars only — nested values stay typed DataFrame columns,
 * documented deviation SURVEY §7.4.7.)
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
}

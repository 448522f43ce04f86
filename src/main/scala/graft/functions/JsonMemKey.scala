package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, conv, hex, lit, replace, substring, when}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Depth-UNBOUNDED cross-type sort keys: an order-preserving
 * ("memcomparable") byte encoding of an arbitrarily nested JSON value
 * under the reference's TYPE_ORDER semantics
 * (vendor/jx_python/jx.py:560-627 `value_compare`: boolean < number <
 * string < list < object < missing; lists elementwise then by length;
 * objects over the sorted UNION of keys with an absent key reading as
 * missing-sorts-last; `{a: null} == {}`).
 *
 * [[graft.jx.TypedSlots]] spells the same order out as codegen'd struct
 * keys, but Spark structs are not recursive, so each nesting depth
 * repeats the construction and the key's codegen mass grows
 * geometrically — depth 3 was the practical boundary (16 s of cold JIT
 * in its r8 form). This encoder removes the boundary: ONE pass over the
 * value emits a byte string whose unsigned lexicographic order equals
 * the recursive comparison at ANY depth, so the sort key is a plain
 * BINARY column — Tungsten's sorter compares raw bytes (with prefix
 * acceleration), range-partitions like any scalar, and the generated
 * code is a single static call (no per-depth JIT mass).
 *
 * Encoding (all comparisons unsigned byte-wise):
 *   - type tags: list-terminator 0x00 < boolean 0x01 < number 0x02 <
 *     string 0x03 < list 0x04 < object 0x05 < missing 0x0A — the
 *     TYPE_ORDER ranks, with 0x00 reserved so a shorter list that is a
 *     strict prefix terminates BELOW any continuing element (the
 *     elementwise-then-length law).
 *   - boolean: 0x01, then 0x00/0x01.
 *   - number: 0x02, then the IEEE-754 bits of the double with the sign
 *     bit flipped for non-negatives and ALL bits flipped for negatives,
 *     big-endian — the classic total-order transform; -0.0 is
 *     normalized to +0.0 first (SQL equality), NaN lands above +Inf
 *     (Spark's own double order).
 *   - string: 0x03, then UTF-8 bytes with 0x00 escaped as 0x00 0x01,
 *     terminated by 0x00 0x00 — prefix strings sort first and embedded
 *     NULs stay ordered.
 *   - list: 0x04, then each element's encoding (JSON null elements
 *     encode as missing), then 0x00.
 *   - object: 0x05, then entries SORTED by the key's UTF-8 bytes (each
 *     entry = escaped key bytes + 0x00 0x00 + value encoding,
 *     null-valued entries dropped — the `{a: null} == {}` law), then
 *     0xFF. 0xFF never occurs in valid UTF-8, so the terminator is
 *     unambiguous, and because it is ABOVE every possible next-entry
 *     byte, the side whose entries run out first compares GREATER —
 *     exactly the union-key walk where the absent key reads as
 *     missing-sorts-last (the [[graft.jx.TypedSlots]] ObjSentinel law,
 *     at every depth).
 *   - missing (SQL NULL input or JSON null): the single byte 0x0A.
 *
 * Input is a JSON TEXT column ([[jsonSortKey]]). Text that does not
 * parse as JSON (after FAIL_ON_TRAILING_TOKENS, so `2024-01-01` does
 * not half-parse as the number 2024) sorts as a bare string — the
 * loose-JSON convention for mixed raw-text columns. Numbers compare as
 * IEEE doubles, the same convention as the typed-slot `n` slot.
 */
object JsonMemKey {
  private val TagTermList: Int = 0x00
  private val TagBool: Int = 0x01
  private val TagNum: Int = 0x02
  private val TagStr: Int = 0x03
  private val TagList: Int = 0x04
  private val TagObj: Int = 0x05
  private val TagMissing: Int = 0x0A
  private val TermObj: Int = 0xFF

  // ObjectMapper is thread-safe after configuration; trailing-token
  // strictness keeps "loose string" detection sound (see scaladoc).
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** UTF8String JSON text → memcomparable bytes; null → missing key.
    * Parses the UTF-8 bytes directly (Jackson reads UTF-8 natively — no
    * String round-trip), and the loose bare-string fallback reuses the
    * same bytes. One heap copy total on the fallback path, zero string
    * decodes on the JSON path. */
  def encode(u: UTF8String): Array[Byte] = {
    val out = new ByteWriter(32)
    if (u == null) out.write(TagMissing)
    else {
      val bytes = u.getBytes
      val node =
        try mapper.readTree(bytes)
        catch { case _: Exception => null }
      if (node == null || node.isMissingNode) encodeStringBytes(out, bytes)
      else encodeNode(out, node)
    }
    out.toByteArray
  }

  private def encodeNode(out: ByteWriter, n: JsonNode): Unit = {
    if (n == null || n.isNull) out.write(TagMissing)
    else if (n.isBoolean) { out.write(TagBool); out.write(if (n.asBoolean) 1 else 0) }
    else if (n.isNumber) encodeNumber(out, n.asDouble)
    else if (n.isTextual) encodeString(out, n.asText)
    else if (n.isArray) {
      out.write(TagList)
      val it = n.elements()
      while (it.hasNext) encodeNode(out, it.next())
      out.write(TagTermList)
    } else if (n.isObject) {
      out.write(TagObj)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], JsonNode)]
      n.properties().forEach { e =>
        if (!e.getValue.isNull)
          buf += ((e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8), e.getValue))
      }
      // key order = UTF-8 byte order, the same binary collation Spark's
      // own string comparison uses (UTF-16 String.compareTo would
      // misplace supplementary-plane keys)
      val sorted = buf.sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
      sorted.foreach { case (kb, v) =>
        writeEscaped(out, kb)
        out.write(0); out.write(0)
        encodeNode(out, v)
      }
      out.write(TermObj)
    } else out.write(TagMissing) // binary/POJO nodes cannot occur from readTree
  }

  private[functions] def encodeNumber(out: ByteWriter, d0: Double): Unit = {
    out.write(TagNum)
    val d = d0 + 0.0 // -0.0 → +0.0: SQL equality before total order
    var bits = java.lang.Double.doubleToLongBits(d)
    bits = if (bits < 0L) ~bits else bits ^ java.lang.Long.MIN_VALUE
    var i = 56
    while (i >= 0) { out.write(((bits >>> i) & 0xFF).toInt); i -= 8 }
  }

  private def encodeString(out: ByteWriter, s: String): Unit = {
    out.write(TagStr)
    writeEscaped(out, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.write(0); out.write(0)
  }

  private[functions] def encodeStringBytes(out: ByteWriter, utf8: Array[Byte]): Unit = {
    out.write(TagStr)
    writeEscaped(out, utf8)
    out.write(0); out.write(0)
  }

  private[functions] def writeEscaped(out: ByteWriter, bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b == 0) { out.write(0); out.write(1) } else out.write(b)
      i += 1
    }
  }

  private[functions] def tagBool: Int = TagBool
  private[functions] def tagList: Int = TagList
  private[functions] def tagObj: Int = TagObj
  private[functions] def tagMissing: Int = TagMissing
  private[functions] def tagTermList: Int = TagTermList
  private[functions] def termObj: Int = TermObj

  /** TYPE_ORDER rank of a memcomparable key — the column-side mirror of
    * `TypedSlots.nvRank` for byte keys: the key's FIRST byte is the type
    * tag by construction, mapped here to the reference's ranks
    * (bool 0 < number 1 < string 2 < list 3 < object 4 < missing 9).
    * Shared by every catalog entry that surfaces `tr` beside a byte-key
    * sort, so the tag→rank mapping lives in ONE place next to the tag
    * constants it depends on. */
  def typeRank(key: Column): Column = {
    val tag = conv(hex(substring(key, 1, 1)), 16, 10).cast("int")
    when(tag === lit(TagBool), 0).when(tag === lit(TagNum), 1)
      .when(tag === lit(TagStr), 2).when(tag === lit(TagList), 3)
      .when(tag === lit(TagObj), 4).otherwise(9)
  }

  /** Render a string column as a JSON string literal — surrounding
    * quotes plus backslash-then-quote escaping, so splicing the result
    * into JSON text built by `concat` cannot reclassify the value via
    * the bare-string fallback. Control characters (U+0000–U+001F) are
    * NOT escaped — JSON forbids them raw, so text containing them
    * falls back to sorting as its literal bytes (callers with control
    * characters in data should pre-strip or accept the fallback). */
  def jsonQuote(c: Column): Column =
    concat(lit("\""),
      replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\"")),
      lit("\""))

  /** Column wrapper: JSON text → memcomparable BINARY sort key. */
  def jsonSortKey(c: Column): Column =
    GraftColumnBridge.column(JsonSortKeyExpr(GraftColumnBridge.expression(c)))

  /** Column wrapper: a [[graft.jx.TypedSlots]] nested-variant STRUCT
    * (any depth) → the same memcomparable BINARY key. The sort-side
    * answer to the struct tiers' geometric codegen: `GenerateOrdering`
    * over a depth-3 nested struct emits a comparator that recurses
    * through every field (the probe attributed ~34 s of cold JIT to
    * the SORT alone at depth 3), while a binary column compares with
    * Tungsten's library byte comparison — no generated comparator at
    * all. Byte order == the struct key's order (law-pinned in
    * JsonSortKeySpec against sortKeyNested3 on the entry domain). */
  def nvSortKey(c: Column): Column =
    GraftColumnBridge.column(NvMemKeyExpr(GraftColumnBridge.expression(c)))
}

/**
 * Minimal growable byte buffer for the per-row encode hot path —
 * `java.io.ByteArrayOutputStream` synchronizes every single-byte write
 * (a lock per byte since biased locking was removed), which matters
 * when the escape loop writes strings byte-at-a-time on every sorted
 * row. No locking, exact-size result copy.
 */
private[functions] final class ByteWriter(initialCapacity: Int) {
  private var buf = new Array[Byte](initialCapacity)
  private var n = 0
  private def ensure(k: Int): Unit =
    if (n + k > buf.length)
      buf = java.util.Arrays.copyOf(buf, math.max(buf.length << 1, n + k))
  def write(b: Int): Unit = { ensure(1); buf(n) = b.toByte; n += 1 }
  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
}

/**
 * The Catalyst expression behind [[JsonMemKey.jsonSortKey]]: string →
 * binary, NEVER null (SQL NULL encodes as the missing key, so the
 * key column orders missings last like every other tier). Generated
 * code is one static call — the whole-stage span stays intact with
 * constant code size at any value depth.
 */
case class JsonSortKeyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string (JSON) column")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_json_sort_key"

  override def eval(input: InternalRow): Any =
    JsonMemKey.encode(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          |${CodeGenerator.javaType(dataType)} ${ev.value} =
          |  graft.functions.JsonMemKey.encode(${c.isNull} ? null : ${c.value});
          |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Memcomparable key over a [[graft.jx.TypedSlots]] nested-variant
 * struct: `struct<b:boolean, n:double, s:string, l:array<NV'>,
 * o:array<struct<k:string, v:NV'>>>` recursively, bottoming at the
 * scalar `struct<b,n,s>` — the shape every `nv`/`nv2`/`nv3` builder
 * produces, accepted at ANY depth (the walker follows the schema).
 * Emits exactly the [[JsonMemKey]] byte scheme, so the binary order
 * equals the struct tiers' `sortKeyNested*` order and the reference's
 * recursive value_compare.
 *
 * Object entries are trusted pre-sorted by key with missing-valued
 * entries dropped (the `nvOfObject` construction contract — same trust
 * as `sortKeyNested*`); a missing-valued entry that does reach the
 * encoder is skipped, preserving `{a: null} == {}`. Keys must be VALID
 * UTF-8 (every `nv*OfObject` builder constructs them from Scala string
 * literals, which always are): the 0xFF object terminator's
 * above-any-entry property relies on 0xFF never appearing in UTF-8, so
 * a key fabricated from non-UTF-8 bytes (e.g. a binary cast) whose
 * first byte is ≥ 0xF5 would break the union-walk order. A NULL struct
 * (or all-null slots) encodes as missing. Never returns null. Generated
 * code is one virtual call on a plan-time reference — constant codegen
 * mass at any depth, and crucially the downstream SORT needs no
 * generated comparator (binary columns compare via Tungsten's byte
 * comparison; `GenerateOrdering` over the equivalent depth-3 struct
 * key was measured at ~34 s of cold JIT).
 */
case class NvMemKeyExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  private def isNvShape(t: DataType): Boolean = t match {
    case StructType(fs) if fs.length == 3 =>
      fs.map(_.name).sameElements(Array("b", "n", "s")) &&
        fs(0).dataType == BooleanType && fs(1).dataType == DoubleType &&
        fs(2).dataType == StringType
    case StructType(fs) if fs.length == 5 =>
      fs.map(_.name).sameElements(Array("b", "n", "s", "l", "o")) &&
        fs(0).dataType == BooleanType && fs(1).dataType == DoubleType &&
        fs(2).dataType == StringType &&
        (fs(3).dataType match {
          case ArrayType(et, _) => isNvShape(et)
          case _ => false
        }) &&
        (fs(4).dataType match {
          case ArrayType(StructType(ef), _) if ef.length == 2 =>
            ef(0).name == "k" && ef(0).dataType == StringType &&
              ef(1).name == "v" && isNvShape(ef(1).dataType)
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNvShape(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a TypedSlots nested-variant struct, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nv_mem_key"

  @transient private lazy val schema = child.dataType.asInstanceOf[StructType]

  /** Recursive row walk; `t` is the nv struct type at this depth. */
  private def encodeNv(out: ByteWriter, row: InternalRow,
                       t: StructType): Unit = {
    if (row == null) { out.write(JsonMemKey.tagMissing); return }
    if (!row.isNullAt(0)) {
      out.write(JsonMemKey.tagBool); out.write(if (row.getBoolean(0)) 1 else 0)
    } else if (!row.isNullAt(1)) JsonMemKey.encodeNumber(out, row.getDouble(1))
    else if (!row.isNullAt(2)) JsonMemKey.encodeStringBytes(out, row.getUTF8String(2).getBytes)
    else if (t.length > 3 && !row.isNullAt(3)) {
      out.write(JsonMemKey.tagList)
      val elemT = t(3).dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      val arr = row.getArray(3)
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) out.write(JsonMemKey.tagMissing)
        else encodeNv(out, arr.getStruct(i, elemT.length), elemT)
        i += 1
      }
      out.write(JsonMemKey.tagTermList)
    } else if (t.length > 4 && !row.isNullAt(4)) {
      out.write(JsonMemKey.tagObj)
      val entryT = t(4).dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      val vT = entryT(1).dataType.asInstanceOf[StructType]
      val arr = row.getArray(4)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val e = arr.getStruct(i, 2)
          val v = if (e.isNullAt(1)) null else e.getStruct(1, vT.length)
          if (v != null && !allNull(v, vT)) {
            JsonMemKey.writeEscaped(out,
              if (e.isNullAt(0)) Array.emptyByteArray else e.getUTF8String(0).getBytes)
            out.write(0); out.write(0)
            encodeNv(out, v, vT)
          }
        }
        i += 1
      }
      out.write(JsonMemKey.termObj)
    } else out.write(JsonMemKey.tagMissing)
  }

  private def allNull(row: InternalRow, t: StructType): Boolean = {
    var i = 0
    while (i < t.length) { if (!row.isNullAt(i)) return false; i += 1 }
    true
  }

  def encodeValue(row: InternalRow): Array[Byte] = {
    val out = new graft.functions.ByteWriter(32)
    encodeNv(out, row, schema)
    out.toByteArray
  }

  override def eval(input: InternalRow): Any =
    encodeValue(child.eval(input).asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("nvMemKey", this, classOf[NvMemKeyExpr].getName)
    ev.copy(
      code = c.code +
        code"""
          |${CodeGenerator.javaType(dataType)} ${ev.value} =
          |  $ref.encodeValue(${c.isNull} ? null : ${c.value});
          |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

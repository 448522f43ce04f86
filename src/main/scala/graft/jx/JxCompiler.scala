package graft.jx

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JxExpr → Catalyst `Column`: the single compile target replacing the
 * reference's triple (to_python / to_sql / to_painless) compiler
 * (reference: vendor/jx_python/expressions.py, vendor/jx_sqlite/expressions.py).
 *
 * JX null semantics differ from SQL and are centralized here
 * (reference: vendor/jx_base/expressions.py:999-1014,1042-1043,1740-1756):
 *   - `eq` is decisive: missing==missing → TRUE  (⇒ `eqNullSafe`)
 *   - `ne` is never missing (⇒ `!(a <=> b)`)
 *   - inequalities with a missing operand → FALSE
 *   - boolean context treats missing as FALSE (and/or/not/where)
 *   - arithmetic: any-missing → default (strict) or ignore-missing (`nulls:true`)
 *   - division by zero → default / missing
 *
 * Everything compiles to built-in (codegen'd) functions — no UDFs in the
 * expression path, so whole-stage codegen spans stay wide.
 */
object JxCompiler {
  import JxExpr._

  private def allowScripting = JxExpr.allowScripting

  /** Compile-time context: how to resolve variables and window neighbors. */
  case class Ctx(
      resolveVar: String => Column = name => col(name),
      resolveRows: (JxExpr, Int) => Column = (_, _) =>
        throw new IllegalArgumentException("`rows` is only valid inside a window clause"))

  val defaultCtx: Ctx = Ctx()

  def compile(e: JxExpr): Column = compile(e, defaultCtx)

  /** Literal of a raw parsed JSON value. */
  def litAny(v: Any): Column = v match {
    case null      => lit(null)
    case s: Seq[_] => array(s.map(litAny): _*)
    case other     => lit(other) // String/Long/Double/Boolean/Timestamp/Date/Decimal…
  }

  /** Boolean context: missing → FALSE ("decisive" booleans). */
  def truthy(e: JxExpr, ctx: Ctx): Column = e match {
    // these are never null — skip the coalesce so Catalyst sees bare predicates
    case _: EqOp | _: NeOp | _: InequalityOp | _: MissingOp | _: ExistsOp |
         _: AndOp | _: OrOp | _: NotOp | TrueOp | FalseOp | _: PrefixOp | _: SuffixOp =>
      compile(e, ctx)
    case other => coalesce(compile(other, ctx), lit(false))
  }

  /** FILTER position: a WHERE drops null-valued predicates exactly like
    * false ones, so the missing→FALSE coalesce wrap is redundant on
    * positively-scoped comparisons — stripping it lets Catalyst push
    * plain GreaterThan/LessThan/In down to the parquet scan. NOT scopes
    * revert to [[truthy]] (not(missing-compare) must be TRUE). */
  def filterPred(e: JxExpr, ctx: Ctx): Column = e match {
    case AndOp(Nil)   => lit(true)
    case AndOp(terms) => terms.map(filterPred(_, ctx)).reduce(_ && _)
    case OrOp(Nil)    => lit(false)
    // null || true = true, and a top-level null drops the row like false
    case OrOp(terms)  => terms.map(filterPred(_, ctx)).reduce(_ || _)
    case InequalityOp(op, l, r) =>
      val (a, b) = (compile(l, ctx), compile(r, ctx))
      op match {
        case "gt" => a > b; case "gte" => a >= b
        case "lt" => a < b; case "lte" => a <= b
      }
    // null-free lists only: the null-bearing arm needs a CASE (not
    // pushdown-shaped) and routes through truthy below
    case InOp(v, Lit(items: Seq[_])) if !items.contains(null) =>
      compile(v, ctx).isin(items: _*)
    case other => truthy(other, ctx)
  }

  private def withDefault(c: Column, default: JxExpr, ctx: Ctx): Column = default match {
    case NullOp => c
    case d      => coalesce(c, compile(d, ctx))
  }

  def compile(e: JxExpr, ctx: Ctx): Column = e match {
    // ---- leaves --------------------------------------------------------
    case Variable(name) => ctx.resolveVar(name)
    case Lit(v)         => litAny(v)
    case NullOp         => lit(null)
    case TrueOp         => lit(true)
    case FalseOp        => lit(false)
    case DateOp(spec)   => lit(DateMath.parse(spec))
    case OffsetOp(i)    => ctx.resolveVar(s"_$i")
    case RowsOp(v, off) => ctx.resolveRows(v, off)

    // ---- boolean / comparison ------------------------------------------
    case AndOp(Nil)    => lit(true)
    case AndOp(terms)  => terms.map(truthy(_, ctx)).reduce(_ && _)
    case OrOp(Nil)     => lit(false)
    case OrOp(terms)   => terms.map(truthy(_, ctx)).reduce(_ || _)
    case NotOp(t)      => !truthy(t, ctx)
    case EqOp(l, r)    => compile(l, ctx) <=> compile(r, ctx)
    case NeOp(l, r)    => !(compile(l, ctx) <=> compile(r, ctx))
    case InequalityOp(op, l, r) =>
      val (a, b) = (compile(l, ctx), compile(r, ctx))
      val cmp = op match {
        case "gt" => a > b; case "gte" => a >= b
        case "lt" => a < b; case "lte" => a <= b
      }
      coalesce(cmp, lit(false))
    // JX `in` is Python list membership (reference jx_python
    // expressions.py:175-177, `value in superset`) — a NULL member
    // makes a missing value MATCH (`None in [None, 1]` is True),
    // where SQL IN's three-valued logic would yield false (r12, the
    // same divergence class as GetOp's listwrap indexing). Null-free
    // lists keep the plain pushdown-friendly isin.
    case InOp(v, Lit(items: Seq[_])) if items.contains(null) =>
      val c = compile(v, ctx)
      val nonNull = items.filterNot(_ == null)
      val rest =
        if (nonNull.isEmpty) lit(false)
        else coalesce(c.isin(nonNull: _*), lit(false))
      when(c.isNull, lit(true)).otherwise(rest)
    case InOp(v, Lit(items: Seq[_])) =>
      coalesce(compile(v, ctx).isin(items: _*), lit(false))
    case InOp(v, listE) =>
      // dynamic list: null membership checked the same Python way
      val arr = compile(listE, ctx)
      val c = compile(v, ctx)
      when(c.isNull, coalesce(exists(arr, x => x.isNull), lit(false)))
        .otherwise(coalesce(array_contains(arr, c), lit(false)))
    case MissingOp(t) => compile(t, ctx).isNull
    case ExistsOp(t)  => compile(t, ctx).isNotNull
    case IsTypeOp(kind, t) =>
      val c = compile(t, ctx)
      val ty = call_function("typeof", c)
      kind match {
        case "boolean" => ty === "boolean"
        case "string"  => ty === "string"
        case "number"  => ty.isin("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
        case "integer" => ty.isin("tinyint", "smallint", "int", "bigint") ||
          (ty.isin("float", "double") && c.cast(DoubleType) === floor(c.cast(DoubleType)).cast(DoubleType))
      }

    // ---- arithmetic ------------------------------------------------------
    case MultiOp(op, terms, nulls, default) =>
      val cols = terms.map(compile(_, ctx))
      if (!nulls) {
        // strict: SQL's null propagation already means any-missing → missing
        val strict = op match {
          case "add" => cols.reduce(_ + _)
          case "mul" => cols.reduce(_ * _)
        }
        withDefault(strict, default, ctx)
      } else {
        // ignore missing operands; all-missing → default
        val neutral = op match {
          case "add" => cols.map(coalesce(_, lit(0L))).reduce(_ + _)
          case "mul" => cols.map(coalesce(_, lit(1L))).reduce(_ * _)
        }
        val allMissing = cols.map(_.isNull).reduce(_ && _)
        when(allMissing, default match { case NullOp => lit(null); case d => compile(d, ctx) })
          .otherwise(neutral)
      }
    case BinaryOp(op, l, r, default) =>
      val (a, b) = (compile(l, ctx), compile(r, ctx))
      val res = op match {
        case "sub" => a - b
        case "exp" =>
          // Literal exponents 2/3 compile to repeated multiplication in
          // doubles — IEEE-exactly-rounded, so the value is bit-identical
          // to the JxSql rendering on ANY engine/libm, where Math.pow
          // carries a ≤1-ulp license (the r13 driver-divergence class;
          // see JxSql.Dialect.pow). Type-equivalent to pow (double), and
          // strength-reduced: two codegen'd multiplies beat a libm call.
          r match {
            case Lit(2L) => val x = a.cast(DoubleType); x * x
            case Lit(3L) => val x = a.cast(DoubleType); x * x * x
            case _       => pow(a, b)
          }
        case "mod" => a % b
      }
      withDefault(res, default, ctx)
    case DivOp(l, r, default) =>
      // try_divide: /0 → null ("missing") under ANSI and non-ANSI alike
      withDefault(try_divide(compile(l, ctx), compile(r, ctx)), default, ctx)
    case FloorOp(l, r) =>
      val (a, b) = (compile(l, ctx), compile(r, ctx))
      floor(try_divide(a, b)) * b
    case MaxOp(terms) =>
      if (terms.size == 1) compile(terms.head, ctx)
      else greatest(terms.map(compile(_, ctx)): _*)
    case MinOp(terms) =>
      if (terms.size == 1) compile(terms.head, ctx)
      else least(terms.map(compile(_, ctx)): _*)
    case CountOp(terms) =>
      terms.map(t => when(compile(t, ctx).isNotNull, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    case CoalesceOp(terms) => coalesce(terms.map(compile(_, ctx)): _*)
    case CastOp(kind, t) =>
      val c = compile(t, ctx)
      kind match {
        case "number"  => c.cast(DoubleType)   // timestamp → epoch seconds, string trims
        case "integer" => c.cast(LongType)
        case "string"  => c.cast(StringType)
        case "boolean" => c.cast(BooleanType)
      }
    case UnixOp(t)     => compile(t, ctx).cast(DoubleType)
    case FromUnixOp(t) => timestamp_seconds(compile(t, ctx))

    // ---- string ----------------------------------------------------------
    case LengthOp(t) => length(compile(t, ctx).cast(StringType))
    case SubstrOp(kind, v, n) =>
      val s = compile(v, ctx).cast(StringType)
      val k = greatest(compile(n, ctx).cast(IntegerType), lit(0))
      kind match {
        case "left"      => substring(s, lit(1), k)
        case "right"     =>
          val kk = least(k, length(s))
          substring(s, length(s) - kk + lit(1), kk)
        case "not_left"  => substring(s, k + lit(1), length(s))
        case "not_right" => substring(s, lit(1), greatest(length(s) - k, lit(0)))
      }
    case FindOp(v, f, start, default) =>
      val s = compile(v, ctx).cast(StringType)
      val sub = compile(f, ctx).cast(StringType)
      val pos1 = compile(start, ctx).cast(IntegerType) + lit(1)
      val loc = call_function("locate", sub, s, pos1)
      val dflt = default match { case NullOp => lit(null); case d => compile(d, ctx) }
      when(s.isNull || sub.isNull || loc === 0, dflt).otherwise((loc - lit(1)).cast(LongType))
    case BetweenOp(v, prefixE, suffixE, start, default) =>
      val s = compile(v, ctx).cast(StringType)
      val st1 = compile(start, ctx).cast(IntegerType) + lit(1)
      // begin: 1-based index just after prefix (or `start` when no prefix)
      val begin = prefixE match {
        case NullOp => st1
        case Lit(i: Long) => lit(i.toInt + 1)
        case p =>
          val pc = compile(p, ctx).cast(StringType)
          val loc = call_function("locate", pc, s, st1)
          when(loc === 0, lit(null)).otherwise(loc + length(pc))
      }
      val end = suffixE match {
        case NullOp => length(s) + lit(1)
        case Lit(i: Long) => lit(i.toInt + 1)
        case sfx =>
          val sc = compile(sfx, ctx).cast(StringType)
          val loc = call_function("locate", sc, s, begin)
          when(loc === 0, lit(null)).otherwise(loc)
      }
      val res = substring(s, begin, end - begin)
      val dflt = default match { case NullOp => lit(null); case d => compile(d, ctx) }
      when(s.isNull || begin.isNull || end.isNull, dflt).otherwise(res)
    case PrefixOp(v, p) =>
      val pc = compile(p, ctx)
      when(pc.isNull, lit(true))
        .otherwise(coalesce(compile(v, ctx).cast(StringType).startsWith(pc.cast(StringType)), lit(false)))
    case SuffixOp(v, sfx) =>
      val sc = compile(sfx, ctx)
      when(sc.isNull, lit(true))
        .otherwise(coalesce(compile(v, ctx).cast(StringType).endsWith(sc.cast(StringType)), lit(false)))
    case ConcatOp(terms, separator, default) =>
      val sep = separator match {
        case Lit(s: String) => s
        case NullOp         => ""
        case other => throw new IllegalArgumentException(s"concat separator must be literal: $other")
      }
      val cols = terms.map(compile(_, ctx).cast(StringType))
      val allMissing = cols.map(_.isNull).reduce(_ && _)
      val dflt = default match { case NullOp => lit(null); case d => compile(d, ctx) }
      when(allMissing, dflt).otherwise(concat_ws(sep, cols: _*))
    case RegExpOp(v, p) =>
      // JX regex is a FULL-match test (reference expressions.py:1803-1824)
      val s = compile(v, ctx).cast(StringType)
      val full = p match {
        case Lit(pat: String) => lit("^(?:" + pat + ")$")
        case other            => concat(lit("^(?:"), compile(other, ctx), lit(")$"))
      }
      coalesce(call_function("regexp_like", s, full), lit(false))
    case SplitOp(v, p) =>
      // LITERAL split (the jx_python contract, see JxExpr.SplitOp): the
      // pattern is regex-quoted before reaching Spark's regex-based
      // split — statically for literal patterns, via a regex-escaping
      // regexp_replace for dynamic ones
      // dynamic patterns quote through regexp_replace with the SAME
      // predicate as the static JxExpr.regexQuote path (r13 ADVICE
      // alignment): escape any BMP non-letter/digit (Unicode classes,
      // not ASCII-only), pass supplementary code points through bare
      val pat = p match {
        case Lit(s: String) => lit(JxExpr.regexQuote(s))
        case other          =>
          call_function("regexp_replace",
            compile(other, ctx).cast(StringType),
            lit("([^\\p{L}\\p{Nd}\\x{10000}-\\x{10FFFF}])"), lit("\\\\$1"))
      }
      call_function("split", compile(v, ctx).cast(StringType), pat)
    // ---- structural ------------------------------------------------------
    // GetOp/FirstOp/LastOp follow the reference's listwrap semantics
    // (see the JxExpr scaladocs): the subscript is mo_dots
    // FlatList.__getitem__ (lists.py:69-71) — 0-based, ANY negative
    // index is missing (no count-from-the-end), positive out-of-range
    // is missing. Array operands map i>=0 to 1-based try_element_at
    // (never emitting the index 0 Spark throws on) and fall to NULL for
    // i<0; scalar operands are one-element lists (only get 0 hits the
    // value). first/last of a scalar is the value itself, and LastOp on
    // arrays keeps element -1: FlatList.last() explicitly returns the
    // final element (lists.py:238-245), unlike subscripting.
    case GetOp(v, i) if JxExpr.isArrayExpr(v) =>
      val idx = compile(i, ctx).cast(IntegerType)
      when(idx >= 0, call_function("try_element_at", compile(v, ctx), idx + lit(1)))
    case GetOp(v, i) =>
      val idx = compile(i, ctx).cast(IntegerType)
      when(idx === 0, compile(v, ctx))
    case FirstOp(t) if JxExpr.isArrayExpr(t) =>
      call_function("try_element_at", compile(t, ctx), lit(1))
    case FirstOp(t) => compile(t, ctx)
    case LastOp(t) if JxExpr.isArrayExpr(t) =>
      call_function("try_element_at", compile(t, ctx), lit(-1))
    case LastOp(t)  => compile(t, ctx)
    case TupleOp(terms) =>
      struct(terms.zipWithIndex.map { case (t, i) => compile(t, ctx).as(s"_$i") }: _*)
    case SelectOp(fields) =>
      struct(fields.map { case (n, v) => compile(v, ctx).as(n) }: _*)
    case LeavesOp(_) =>
      throw new IllegalArgumentException("`leaves` is handled by the select pipeline, not scalar compile")
    case WhenOp(c, t, els) =>
      when(truthy(c, ctx), compile(t, ctx)).otherwise(compile(els, ctx))
    case CaseOp(whens, default) =>
      whens.foldRight(compile(default, ctx)) { (w, acc) =>
        when(truthy(w.cond, ctx), compile(w.thenE, ctx)).otherwise(acc)
      }
    case ScriptOp(sql) =>
      if (allowScripting) expr(sql)
      else throw new IllegalArgumentException("scripting is disabled (set JxExpr.allowScripting)")
  }
}

/**
 * Date-math literal parser for JX `{"date": "now-7day"}` expressions
 * (reference: vendor/mo_times date parsing used by DateOp, expressions.py:718).
 * Supports ISO dates, "now"/"today"/"eod", `<base>±<n><unit>` chains, and
 * compact "1jan2015"-style forms. Evaluated once at compile time (a literal).
 */
object DateMath {
  import java.time._
  import java.time.format.DateTimeFormatter

  private val compact = "(?i)(\\d{1,2})(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)(\\d{4})".r
  private val months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")

  def parse(spec: String): java.sql.Timestamp = parseAt(spec, Instant.now())

  // longest leading prefix that can be a base: ISO datetime/date first
  // (an ISO date contains '-', so a naive split-on-sign shatters it —
  // review r9: "2020-06-15-7day" must read base "2020-06-15", op "-7day"),
  // then the compact form, keywords, and bare epoch numbers
  private val baseRx =
    ("(?i)^(?:\\d{4}-\\d{2}-\\d{2}(?:[t ][0-9:.]+)?|" +
      "\\d{1,2}(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\\d{4}|" +
      "now|today|eod|\\d+(?:\\.\\d+)?)").r

  def parseAt(spec: String, now: Instant): java.sql.Timestamp = {
    val s = spec.trim
    // whole string may already be a date (ISO dates contain '-')
    try return java.sql.Timestamp.from(parseBase(s, now))
    catch { case _: Exception => }
    // else: longest-prefix base, then a +/-<n><unit> op chain that must
    // consume the rest of the string
    val bm = baseRx.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse date: $s"))
    val base = parseBase(bm.matched, now)
    val rest = s.substring(bm.end)
    val opRx = "\\s*([+-])\\s*(\\d*)\\s*([a-zA-Z]+)".r
    var idx = 0
    var result = base
    for (om <- opRx.findAllMatchIn(rest)) {
      if (om.start != idx) throw new IllegalArgumentException(s"bad date math: $spec")
      val sign = if (om.group(1) == "-") -1 else 1
      val n = if (om.group(2).isEmpty) 1L else om.group(2).toLong
      result = addUnit(result, sign * n, om.group(3).toLowerCase.stripSuffix("s"))
      idx = om.end
    }
    if (rest.substring(idx).trim.nonEmpty)
      throw new IllegalArgumentException(s"bad date math: $spec")
    java.sql.Timestamp.from(result)
  }

  private def parseBase(b: String, now: Instant): Instant = b.toLowerCase match {
    case "now" => now
    case "today" => now.atZone(ZoneOffset.UTC).toLocalDate.atStartOfDay(ZoneOffset.UTC).toInstant
    case "eod" => now.atZone(ZoneOffset.UTC).toLocalDate.plusDays(1).atStartOfDay(ZoneOffset.UTC).toInstant
    case compact(d, mon, y) =>
      LocalDate.of(y.toInt, months.indexOf(mon.toLowerCase) + 1, d.toInt)
        .atStartOfDay(ZoneOffset.UTC).toInstant
    case iso if iso.matches("\\d{4}-\\d{2}-\\d{2}") =>
      LocalDate.parse(iso).atStartOfDay(ZoneOffset.UTC).toInstant
    case isoT if isoT.matches("\\d{4}-\\d{2}-\\d{2}[t ].*") =>
      LocalDateTime.parse(isoT.replace(" ", "T"), DateTimeFormatter.ISO_LOCAL_DATE_TIME)
        .toInstant(ZoneOffset.UTC)
    case num if num.matches("\\d+(\\.\\d+)?") =>
      Instant.ofEpochMilli((num.toDouble * 1000).toLong)
    case other => throw new IllegalArgumentException(s"cannot parse date: $other")
  }

  private def addUnit(t: Instant, n: Long, unit: String): Instant = unit match {
    case "second" | "sec" => t.plusSeconds(n)
    case "minute" | "min" => t.plusSeconds(60 * n)
    case "hour"           => t.plusSeconds(3600 * n)
    case "day"            => t.plusSeconds(86400 * n)
    case "week"           => t.plusSeconds(7 * 86400 * n)
    case "month"          => t.atZone(ZoneOffset.UTC).plusMonths(n).toInstant
    case "year"           => t.atZone(ZoneOffset.UTC).plusYears(n).toInstant
    case other => throw new IllegalArgumentException(s"unknown duration unit: $other")
  }
}

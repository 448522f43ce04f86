package graft.jx

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * The JX ("JSON Query Expressions") operator algebra, re-expressed as a Scala
 * ADT. Operator surface mirrors the reference registry
 * (reference: vendor/jx_base/expressions.py:2775-2842) — the ~50 op classes —
 * but the representation and all execution is Spark-first: every JxExpr
 * compiles to a Catalyst `Column` (see [[JxCompiler]]).
 *
 * Parsing accepts the reference's JSON forms:
 *   - `"a.b"`                      → variable (dot-path)
 *   - `123`, `true`                → literal
 *   - `{"literal": v}`             → literal (incl. lists/objects)
 *   - `{"eq": {"a": 1, "b": 2}}`   → and(eq(a,1), eq(b,2))  (simple form)
 *   - `{"eq": {"a": [1,2]}}`       → in(a, [1,2])
 *   - `{"add": ["a", 1], "nulls": true, "default": 0}`
 *   - `{"when": c, "then": t, "else": e}` …
 */
sealed trait JxExpr

object JxExpr {
  // ---- leaves ---------------------------------------------------------
  case class Variable(name: String) extends JxExpr
  /** value is one of: null, Boolean, Long, Double, String, Seq[Any], Map[String,Any] */
  case class Lit(value: Any) extends JxExpr
  case object NullOp extends JxExpr
  case object TrueOp extends JxExpr
  case object FalseOp extends JxExpr
  /** Date literal with string math, e.g. "now-7day", "today" (reference DateOp). */
  case class DateOp(spec: String) extends JxExpr
  /** Positional variable into a tuple-row (reference OffsetOp). */
  case class OffsetOp(index: Int) extends JxExpr
  /** Neighbor-row variable, window context only (reference RowsOp). */
  case class RowsOp(variable: JxExpr, offset: Int) extends JxExpr

  // ---- boolean / comparison ------------------------------------------
  case class AndOp(terms: Seq[JxExpr]) extends JxExpr
  case class OrOp(terms: Seq[JxExpr]) extends JxExpr
  case class NotOp(term: JxExpr) extends JxExpr
  /** Decisive (null-safe) equality: missing==missing is TRUE. */
  case class EqOp(lhs: JxExpr, rhs: JxExpr) extends JxExpr
  case class NeOp(lhs: JxExpr, rhs: JxExpr) extends JxExpr
  /** op ∈ {gt, gte, lt, lte}; missing operand → FALSE. */
  case class InequalityOp(op: String, lhs: JxExpr, rhs: JxExpr) extends JxExpr
  case class InOp(value: JxExpr, list: JxExpr) extends JxExpr
  case class MissingOp(term: JxExpr) extends JxExpr
  case class ExistsOp(term: JxExpr) extends JxExpr
  /** op ∈ {boolean,integer,number,string} runtime type test. */
  case class IsTypeOp(kind: String, term: JxExpr) extends JxExpr

  // ---- arithmetic -----------------------------------------------------
  /** op ∈ {add, mul}; n-ary. nulls=true → ignore missing operands
    * (all missing → default); nulls=false → any missing → default. */
  case class MultiOp(op: String, terms: Seq[JxExpr], nulls: Boolean, default: JxExpr) extends JxExpr
  /** op ∈ {sub, exp, mod}; missing if either side missing (unless default). */
  case class BinaryOp(op: String, lhs: JxExpr, rhs: JxExpr, default: JxExpr) extends JxExpr
  /** Division; /0 and null → default (or missing). */
  case class DivOp(lhs: JxExpr, rhs: JxExpr, default: JxExpr) extends JxExpr
  /** Bucket rounding: floor(lhs/rhs)*rhs; rhs=0 → missing. */
  case class FloorOp(lhs: JxExpr, rhs: JxExpr) extends JxExpr
  /** n-ary scalar max/min; ignores missing. */
  case class MaxOp(terms: Seq[JxExpr]) extends JxExpr
  case class MinOp(terms: Seq[JxExpr]) extends JxExpr
  /** count of non-missing terms (scalar, n-ary). */
  case class CountOp(terms: Seq[JxExpr]) extends JxExpr
  case class CoalesceOp(terms: Seq[JxExpr]) extends JxExpr
  /** kind ∈ {number, integer, string, boolean}. */
  case class CastOp(kind: String, term: JxExpr) extends JxExpr
  case class UnixOp(term: JxExpr) extends JxExpr
  case class FromUnixOp(term: JxExpr) extends JxExpr

  // ---- string ---------------------------------------------------------
  case class LengthOp(term: JxExpr) extends JxExpr
  /** kind ∈ {left, right, not_left, not_right}; n clamped to [0, len]. */
  case class SubstrOp(kind: String, value: JxExpr, n: JxExpr) extends JxExpr
  /** 0-based index of substring from `start`; absent → default/missing. */
  case class FindOp(value: JxExpr, find: JxExpr, start: JxExpr, default: JxExpr) extends JxExpr
  /** Substring between prefix and suffix (string or integer bounds). */
  case class BetweenOp(value: JxExpr, prefix: JxExpr, suffix: JxExpr, start: JxExpr, default: JxExpr) extends JxExpr
  /** startswith; missing prefix → TRUE. */
  case class PrefixOp(value: JxExpr, prefix: JxExpr) extends JxExpr
  case class SuffixOp(value: JxExpr, suffix: JxExpr) extends JxExpr
  /** n-ary string join skipping missing operands. */
  case class ConcatOp(terms: Seq[JxExpr], separator: JxExpr, default: JxExpr) extends JxExpr
  /** Full-match regex test. */
  case class RegExpOp(value: JxExpr, pattern: JxExpr) extends JxExpr
  /** Split on a LITERAL substring — the reference's jx_python backend
    * compiles split to Python `(value).split(find)`
    * (vendor/jx_python/expressions.py:329-331), which is plain
    * substring splitting, NOT a regex (the ES Painless backend's
    * Java-regex reading is a different engine's choice). Decided r12
    * (ADVICE): graft follows the jx_python literal contract — the
    * compiler quotes the pattern before handing it to Spark's
    * regex-based `split`, so '.' or '|' split on those characters
    * rather than on everything/nothing. */
  case class SplitOp(value: JxExpr, pattern: JxExpr) extends JxExpr

  // ---- structural -----------------------------------------------------
  /** Dynamic index into a list value — the reference's GetOp is Python
    * `listwrap(obj)[offset]` (vendor/jx_python/expressions.py:96-100),
    * and the subscript is mo_dots `FlatList.__getitem__`, NOT plain
    * Python list indexing: `if index < 0 or len(list) <= index: return
    * Null` (vendor/mo_dots/lists.py:69-71). So the contract is 0-based
    * with ANY negative index → Null (no count-from-the-end), positive
    * out-of-range → Null, and a SCALAR operand listwrapped into a
    * one-element list (only index 0 hits the value). The compiler
    * dispatches on [[isArrayExpr]] to mirror both halves (r13, ADVICE:
    * r12 had wrongly given negative indexes Python-list
    * count-from-the-end semantics; [[LastOp]] is unaffected —
    * `FlatList.last()` explicitly returns the final element,
    * lists.py:238-245). */
  case class GetOp(value: JxExpr, index: JxExpr) extends JxExpr
  /** First element of a list; a scalar term IS its own first element —
    * reference FirstOp.partial_eval returns the term unchanged when
    * `not term.many` (vendor/jx_base/expressions.py:1318-1330). */
  case class FirstOp(term: JxExpr) extends JxExpr
  /** Last element; scalar pass-through like [[FirstOp]]
    * (vendor/jx_base/expressions.py:1350-1366, jx_python
    * `listwrap(term).last()`). */
  case class LastOp(term: JxExpr) extends JxExpr
  case class TupleOp(terms: Seq[JxExpr]) extends JxExpr
  /** Build an object from named sub-expressions. */
  case class SelectOp(fields: Seq[(String, JxExpr)]) extends JxExpr
  /** Expand all leaf columns under prefix (`a.*`). */
  case class LeavesOp(prefix: String) extends JxExpr
  case class WhenOp(cond: JxExpr, thenE: JxExpr, elseE: JxExpr) extends JxExpr
  /** First-true when list + trailing default. */
  case class CaseOp(whens: Seq[WhenOp], default: JxExpr) extends JxExpr
  /** Raw SQL escape hatch; disabled unless jx.allowScripting=true
    * (reference disables it by default too: expressions.py:29). */
  case class ScriptOp(script: String) extends JxExpr

  var allowScripting: Boolean = false

  // =====================================================================
  // JSON parsing
  // =====================================================================

  def parseJson(json: String): JxExpr = parse(JsonMethods.parse(json))

  /** Direct sub-expressions of `e` (the structural walk the fuzz laws,
    * diagnostic censuses, and [[JxFuzz.mapVars]]-style rewrites share —
    * one copy, so a new operator cannot be added to the registry
    * without the walk seeing it: keep this in sync with the case-class
    * list above). Leaves (Variable/Lit/NullOp/TrueOp/FalseOp/DateOp/
    * LeavesOp/ScriptOp) return empty. */
  def children(e: JxExpr): Seq[JxExpr] = e match {
    case AndOp(ts) => ts; case OrOp(ts) => ts; case NotOp(t) => Seq(t)
    case EqOp(a, b) => Seq(a, b); case NeOp(a, b) => Seq(a, b)
    case InequalityOp(_, a, b) => Seq(a, b)
    case BinaryOp(_, a, b, d) => Seq(a, b, d)
    case MultiOp(_, ts, _, d) => ts :+ d
    case CoalesceOp(ts) => ts
    case MissingOp(t) => Seq(t); case ExistsOp(t) => Seq(t)
    case InOp(v, s) => Seq(v, s)
    case LengthOp(t) => Seq(t)
    case FindOp(a, b, c, d) => Seq(a, b, c, d)
    case BetweenOp(a, b, c, d, e2) => Seq(a, b, c, d, e2)
    case PrefixOp(a, b) => Seq(a, b); case SuffixOp(a, b) => Seq(a, b)
    case ConcatOp(ts, s, d) => ts ++ Seq(s, d)
    case RegExpOp(a, b) => Seq(a, b)
    case SplitOp(a, b) => Seq(a, b)
    case GetOp(a, b) => Seq(a, b)
    case FirstOp(t) => Seq(t); case LastOp(t) => Seq(t)
    case TupleOp(ts) => ts
    case SelectOp(fs) => fs.map(_._2)
    case WhenOp(c, t, e2) => Seq(c, t, e2)
    case CaseOp(ws, d) => ws.flatMap(w => Seq(w.cond, w.thenE)) :+ d
    case CastOp(_, t) => Seq(t)
    case UnixOp(t) => Seq(t); case FromUnixOp(t) => Seq(t)
    case SubstrOp(_, a, b) => Seq(a, b)
    case FloorOp(a, b) => Seq(a, b)
    case DivOp(a, b, d) => Seq(a, b, d)
    case MaxOp(ts) => ts; case MinOp(ts) => ts; case CountOp(ts) => ts
    case IsTypeOp(_, t) => Seq(t)
    case RowsOp(v, _) => Seq(v)
    case _ => Seq.empty
  }

  /** Does any node of `e` satisfy `p`? (pre-order over [[children]];
    * named treeExists so a wildcard import next to Spark's
    * `functions.exists` cannot shadow the HOF). */
  def treeExists(e: JxExpr)(p: JxExpr => Boolean): Boolean =
    p(e) || children(e).exists(treeExists(_)(p))

  /** Structural array-typedness of a scalar-registry expression — the
    * compile-time analog of the reference's `term.many` flag
    * (jx_base Expression.many), used by GetOp/FirstOp/LastOp to pick
    * between element access and scalar pass-through. [[SplitOp]] is
    * the registry's only array PRODUCER; conditionals propagate the
    * type of their arms. Variables are scalar here: array-shaped data
    * reaches queries through the drill/leaf pipeline and typed slots,
    * never as a bare scalar-expression variable. */
  def isArrayExpr(e: JxExpr): Boolean = e match {
    case SplitOp(_, _)       => true
    case WhenOp(_, t, els)   => isArrayExpr(t) || isArrayExpr(els)
    case CaseOp(whens, dflt) => whens.exists(w => isArrayExpr(w.thenE)) || isArrayExpr(dflt)
    case CoalesceOp(terms)   => terms.exists(isArrayExpr)
    case _                   => false
  }

  /** Quote a literal string for use inside a regex, escaping every
    * non-alphanumeric with a backslash — portable across Java regex
    * (Spark's split) and RE2 (never `\Q…\E`, which RE2-family engines
    * and DuckDB handle differently). Alphanumerics are left bare
    * because a backslash BEFORE a letter/digit is itself a metaclass
    * (`\d`, `\w`). Iterates CODE POINTS, not UTF-16 chars (r13
    * ADVICE): escaping a surrogate pair as two lone backslash-escaped
    * surrogates would produce a Java regex that no longer matches the
    * original code point — non-BMP characters pass through unescaped
    * (they are never regex metacharacters). */
  def regexQuote(s: String): String = {
    val sb = new StringBuilder
    s.codePoints().forEach { cp =>
      if (!Character.isLetterOrDigit(cp) && Character.isBmpCodePoint(cp)) sb.append('\\')
      sb.appendAll(Character.toChars(cp))
    }
    sb.result()
  }

  // =====================================================================
  // JSON serialization (canonical inverse of `parse` for the scalar
  // subset — `parse(toJson(e)) == e` is law-tested over the fuzzer's
  // generated trees in JxFuzzSpec, so parser and serializer cannot
  // drift apart silently). Literals always render as {"literal": v}
  // (a bare string would re-parse as a Variable); option fields
  // (default/separator/start/then/else/nulls) render bare, matching
  // the parser's optLiteral rules. Note the reference's own format
  // ambiguity, preserved here: a `case` DEFAULT that is itself a bare
  // `when` object would re-parse as another when-arm — callers (and
  // the fuzzer) wrap such defaults in a 1-term coalesce.
  // =====================================================================

  def jsonString(e: JxExpr): String = JsonMethods.compact(toJson(e))

  def toJson(e: JxExpr): JValue = e match {
    case Variable(n) => JString(n)
    case TrueOp      => JBool(true)
    case FalseOp     => JBool(false)
    case NullOp      => JObject("null" -> JNull)
    case Lit(v)      => JObject("literal" -> rawJson(v))
    case DateOp(s)   => JObject("date" -> JString(s))

    case AndOp(ts) => JObject("and" -> JArray(ts.map(toJson).toList))
    case OrOp(ts)  => JObject("or" -> JArray(ts.map(toJson).toList))
    case NotOp(t)  => JObject("not" -> toJson(t))
    case EqOp(l, r) => JObject("eq" -> JArray(List(toJson(l), toJson(r))))
    case NeOp(l, r) => JObject("ne" -> JArray(List(toJson(l), toJson(r))))
    case InequalityOp(op, l, r) => JObject(op -> JArray(List(toJson(l), toJson(r))))
    case InOp(v, Lit(items: Seq[_])) =>
      JObject("in" -> JArray(List(toJson(v), JArray(items.map(rawJson).toList))))
    case InOp(v, listE) => JObject("in" -> JArray(List(toJson(v), toJson(listE))))
    case MissingOp(t) => JObject("missing" -> toJson(t))
    case ExistsOp(t)  => JObject("exists" -> toJson(t))
    case IsTypeOp(kind, t) => JObject(s"is_$kind" -> toJson(t))

    case MultiOp(op, ts, nulls, default) =>
      JObject(List(op -> JArray(ts.map(toJson).toList)) ++
        (if (nulls) List("nulls" -> JBool(true)) else Nil) ++ optJson(default))
    case BinaryOp(op, l, r, default) =>
      JObject(List(op -> JArray(List(toJson(l), toJson(r)))) ++ optJson(default))
    case DivOp(l, r, default) =>
      JObject(List("div" -> JArray(List(toJson(l), toJson(r)))) ++ optJson(default))
    case FloorOp(l, r) => JObject("floor" -> JArray(List(toJson(l), toJson(r))))
    case MaxOp(ts) => JObject("max" -> JArray(ts.map(toJson).toList))
    case MinOp(ts) => JObject("min" -> JArray(ts.map(toJson).toList))
    case CountOp(ts) => JObject("count" -> JArray(ts.map(toJson).toList))
    case CoalesceOp(ts) => JObject("coalesce" -> JArray(ts.map(toJson).toList))
    case CastOp(kind, t) => JObject(kind -> toJson(t))
    case UnixOp(t) => JObject("unix" -> toJson(t))
    case FromUnixOp(t) => JObject("from_unix" -> toJson(t))

    case LengthOp(t) => JObject("length" -> toJson(t))
    case SubstrOp(kind, v, n) => JObject(kind -> JArray(List(toJson(v), toJson(n))))
    case FindOp(v, f, start, default) =>
      JObject(List("find" -> JArray(List(toJson(v), toJson(f)))) ++
        (start match { case Lit(0L) => Nil; case s => List("start" -> toJson(s)) }) ++
        optJson(default))
    case BetweenOp(v, p, s, start, default) =>
      JObject(List("between" -> JArray(List(toJson(v), toJson(p), toJson(s)))) ++
        (start match { case Lit(0L) => Nil; case st => List("start" -> toJson(st)) }) ++
        optJson(default))
    case PrefixOp(v, p) => JObject("prefix" -> JArray(List(toJson(v), toJson(p))))
    case SuffixOp(v, p) => JObject("suffix" -> JArray(List(toJson(v), toJson(p))))
    case ConcatOp(ts, separator, default) =>
      JObject(List("concat" -> JArray(ts.map(toJson).toList)) ++
        (separator match {
          case Lit("") => Nil // the parser's default
          case Lit(s: String) => List("separator" -> JString(s))
          case NullOp => Nil // parses back as Lit("") — same compile target
          case other => List("separator" -> toJson(other))
        }) ++ optJson(default))
    case RegExpOp(v, p) => JObject("regex" -> JArray(List(toJson(v), toJson(p))))
    case SplitOp(v, p)  => JObject("split" -> JArray(List(toJson(v), toJson(p))))
    case GetOp(v, i)    => JObject("get" -> JArray(List(toJson(v), toJson(i))))
    case FirstOp(t)     => JObject("first" -> toJson(t))
    case LastOp(t)      => JObject("last" -> toJson(t))

    case WhenOp(c, t, els) =>
      JObject(List("when" -> toJson(c)) ++
        (t match { case NullOp => Nil; case x => List("then" -> toJson(x)) }) ++
        (els match { case NullOp => Nil; case x => List("else" -> toJson(x)) }))
    case CaseOp(whens, default) =>
      JObject("case" -> JArray(whens.map(toJson).toList ++
        (default match { case NullOp => Nil; case d => List(toJson(d)) })))

    case other =>
      throw new IllegalArgumentException(s"toJson: unsupported expression: $other")
  }

  /** raw literal value → JSON (inverse of [[rawValue]]). */
  private def rawJson(v: Any): JValue = v match {
    case null       => JNull
    case b: Boolean => JBool(b)
    case l: Long    => JInt(l)
    case i: Int     => JInt(i)
    case d: Double  => JDouble(d)
    case s: String  => JString(s)
    case xs: Seq[_] => JArray(xs.map(rawJson).toList)
    case other => throw new IllegalArgumentException(s"rawJson: $other")
  }

  /** default option field: omitted when missing; bare literal per the
    * parser's optLiteral; expression object otherwise. */
  private def optJson(default: JxExpr): List[(String, JValue)] = default match {
    case NullOp => Nil
    case Lit(v) => List("default" -> rawJson(v))
    case other  => List("default" -> toJson(other))
  }

  /** json4s value → raw Scala value (for literals). */
  def rawValue(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JBool(b)         => b
    case JInt(i)          => i.toLong
    case JLong(l)         => l
    case JDouble(d)       => d
    case JDecimal(d)      => d.toDouble
    case JString(s)       => s
    case JArray(items)    => items.map(rawValue)
    case JObject(fields)  => fields.map { case (k, x) => k -> rawValue(x) }.toMap
    case JSet(items)      => items.map(rawValue)
  }

  def parse(v: JValue): JxExpr = v match {
    case JString(s)       => Variable(s)
    case JBool(true)      => TrueOp
    case JBool(false)     => FalseOp
    case JNull | JNothing => NullOp
    case JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) => Lit(rawValue(v))
    case JArray(items)    => TupleOp(items.map(parse)) // bare list = tuple
    case obj: JObject     => parseObject(obj)
    case other => throw new IllegalArgumentException(s"cannot parse expression: $other")
  }

  private val opKeys: Set[String] = Set(
    "add", "and", "between", "case", "coalesce", "concat", "count", "date",
    "div", "divide", "eq", "exists", "exp", "find", "first", "floor",
    "from_unix", "get", "gt", "gte", "in", "instr", "is_boolean", "is_integer",
    "is_number", "is_string", "last", "left", "length", "literal", "lt", "lte",
    "match_all", "max", "minus", "missing", "mod", "mul", "mult", "multiply",
    "ne", "neq", "not", "not_left", "not_right", "null", "number", "integer",
    "boolean", "offset", "or", "postfix", "prefix", "range", "regex", "regexp",
    "right", "rows", "script", "select", "split", "string", "sub", "subtract",
    "suffix", "sum", "term", "terms", "tuple", "unix", "when", "min")

  /** Sibling keys an operator form may legitimately carry — the option
    * fields parseOp consumes (reference: each Op.define reads its named
    * options from the SAME dict, expressions.py:70-98). */
  private val optionKeys: Set[String] =
    Set("default", "separator", "start", "then", "else", "nulls")

  private def parseObject(obj: JObject): JxExpr = {
    val fields = obj.obj.toMap
    val opField = obj.obj.collectFirst { case (k, x) if opKeys(k) => (k, x) }
    opField match {
      case None =>
        // simple form: {var: literal} (conjunction of equalities)
        // (reference: expressions.py:149-156)
        val eqs = obj.obj.map { case (k, x) => simpleEq(k, x) }
        if (eqs.size == 1) eqs.head else AndOp(eqs)
      case Some((op, arg)) =>
        // the reference's rule is "first operator key wins, siblings are
        // that op's options" — but a sibling that is NOT a recognized
        // option would be dropped SILENTLY (review r9: {"status": "ok",
        // "count": 5} lost the status predicate because `count` is an op
        // name). An unknown sibling is an ambiguous simple-form/op mix:
        // reject it loudly instead of guessing.
        val strays = fields.keySet - op -- optionKeys
        if (strays.nonEmpty)
          throw new IllegalArgumentException(
            s"ambiguous expression: operator '$op' with non-option sibling " +
              s"key(s) ${strays.mkString(", ")} — write the conjunction " +
              """explicitly: {"and": [...]}""")
        parseOp(op, arg, fields)
    }
  }

  private def simpleEq(name: String, v: JValue): JxExpr = v match {
    case JArray(items) => InOp(Variable(name), Lit(items.map(rawValue)))
    case _: JObject =>
      // an object arg here means `name` was meant as an operator
      throw new IllegalArgumentException(s"unknown operator: $name")
    case other => EqOp(Variable(name), Lit(rawValue(other)))
  }

  private def termList(arg: JValue): Seq[JxExpr] = arg match {
    case JArray(items) => items.map(parse)
    case other         => Seq(parse(other))
  }

  /** Binary ops accept `{op: [lhs, rhs]}` or simple form `{op: {var: literal}}`. */
  private def binaryArgs(arg: JValue): (JxExpr, JxExpr) = arg match {
    case JArray(List(a, b)) => (parse(a), parse(b))
    case JObject(List((k, x))) => (Variable(k), Lit(rawValue(x)))
    case other => throw new IllegalArgumentException(s"expected binary args, got $other")
  }

  /** Literal unless it's an operator object. */
  private def litOrExpr(v: JValue): JxExpr = v match {
    case o: JObject => parse(o)
    case JNull      => NullOp
    case other      => Lit(rawValue(other))
  }

  /** `default`/`separator` and similar option fields hold LITERALS
    * (a bare string there is a value, not a variable); objects are
    * still parsed as expressions. */
  private def optLiteral(fields: Map[String, JValue], key: String): JxExpr =
    fields.get(key).map {
      case o: JObject => parse(o)
      case JNull      => NullOp
      case v          => Lit(rawValue(v))
    }.getOrElse(NullOp)

  private def parseOp(op: String, arg: JValue, fields: Map[String, JValue]): JxExpr = op match {
    case "literal" => Lit(rawValue(arg))
    case "null" => NullOp
    case "match_all" => TrueOp
    case "date" => arg match {
      case JString(s) => DateOp(s)
      case other      => Lit(rawValue(other))
    }
    case "offset" => OffsetOp(rawValue(arg).asInstanceOf[Long].toInt)
    case "rows" => arg match {
      case JArray(List(v, o)) => RowsOp(parse(v), rawValue(o).asInstanceOf[Long].toInt)
      case other => throw new IllegalArgumentException(s"rows expects [var, offset]: $other")
    }
    case "and" => AndOp(termList(arg))
    case "or" => OrOp(termList(arg))
    case "not" => NotOp(parse(arg))
    case "eq" | "term" => arg match {
      case JArray(items) if items.size >= 2 =>
        val es = items.map(parse)
        if (es.size == 2) EqOp(es(0), es(1)) else AndOp(es.tail.map(EqOp(es.head, _)))
      case JObject(pairs) =>
        val eqs = pairs.map { case (k, x) => simpleEq(k, x) }
        if (eqs.size == 1) eqs.head else AndOp(eqs)
      case other => throw new IllegalArgumentException(s"eq: $other")
    }
    case "ne" | "neq" => arg match {
      case JArray(List(a, b)) => NeOp(parse(a), parse(b))
      case JObject(List((k, x))) => NeOp(Variable(k), Lit(rawValue(x)))
      case other => throw new IllegalArgumentException(s"ne: $other")
    }
    case "gt" | "gte" | "lt" | "lte" =>
      val (l, r) = binaryArgs(arg)
      InequalityOp(op, l, r)
    case "in" | "terms" => arg match {
      case JObject(List((k, x))) => InOp(Variable(k), Lit(rawValue(x)))
      case JArray(List(a, b)) =>
        // the second element is the VALUE SET: a bare JSON array there is
        // the literal list (same as the simple form), not a TupleOp —
        // parse(b) would build struct(...) and crash isin/array_contains
        // at run time (review r9: {"in": ["a", [1, 2]]})
        val rhs = b match {
          case JArray(items) if !items.exists(_.isInstanceOf[JObject]) =>
            Lit(items.map(rawValue))
          case other => parse(other)
        }
        InOp(parse(a), rhs)
      case other => throw new IllegalArgumentException(s"in: $other")
    }
    case "range" => arg match {
      // {"range": {"field": {"gte": a, "lt": b}}} → and of inequalities
      case JObject(List((field, JObject(bounds)))) =>
        AndOp(bounds.map { case (cmp, lim) => InequalityOp(cmp, Variable(field), Lit(rawValue(lim))) })
      case other => throw new IllegalArgumentException(s"range: $other")
    }
    case "missing" => MissingOp(parse(arg))
    case "exists" => ExistsOp(parse(arg))
    case "is_boolean" => IsTypeOp("boolean", parse(arg))
    case "is_integer" => IsTypeOp("integer", parse(arg))
    case "is_number" => IsTypeOp("number", parse(arg))
    case "is_string" => IsTypeOp("string", parse(arg))
    case "add" | "sum" => MultiOp("add", termList(arg), parseNulls(fields), optLiteral(fields, "default"))
    case "mul" | "mult" | "multiply" => MultiOp("mul", termList(arg), parseNulls(fields), optLiteral(fields, "default"))
    case "sub" | "subtract" | "minus" =>
      val (l, r) = binaryArgs(arg); BinaryOp("sub", l, r, optLiteral(fields, "default"))
    case "exp" =>
      val (l, r) = binaryArgs(arg); BinaryOp("exp", l, r, optLiteral(fields, "default"))
    case "mod" =>
      val (l, r) = binaryArgs(arg); BinaryOp("mod", l, r, optLiteral(fields, "default"))
    case "div" | "divide" =>
      val (l, r) = binaryArgs(arg); DivOp(l, r, optLiteral(fields, "default"))
    case "floor" => arg match {
      case JArray(List(a, b)) => FloorOp(parse(a), parse(b))
      case JObject(List((k, x))) => FloorOp(Variable(k), Lit(rawValue(x)))
      case other              => FloorOp(parse(other), Lit(1L))
    }
    case "max" => MaxOp(termList(arg))
    case "min" => MinOp(termList(arg))
    case "count" => CountOp(termList(arg))
    case "coalesce" => CoalesceOp(termList(arg))
    case "number" | "integer" | "string" | "boolean" => CastOp(op, parse(arg))
    case "unix" => UnixOp(parse(arg))
    case "from_unix" => FromUnixOp(parse(arg))
    case "length" => LengthOp(parse(arg))
    case "left" | "right" | "not_left" | "not_right" =>
      val (l, r) = binaryArgs(arg); SubstrOp(op, l, r)
    case "find" | "instr" =>
      val (l, r) = binaryArgs(arg)
      FindOp(l, r, fields.get("start").map(parse).getOrElse(Lit(0L)), optLiteral(fields, "default"))
    case "between" => arg match {
      // prefix/suffix are literal strings (or integer indexes), not variables
      case JObject(List((k, JArray(List(p, s))))) =>
        BetweenOp(Variable(k), litOrExpr(p), litOrExpr(s),
          fields.get("start").map(parse).getOrElse(Lit(0L)), optLiteral(fields, "default"))
      case JArray(List(v, p, s)) =>
        BetweenOp(parse(v), litOrExpr(p), litOrExpr(s),
          fields.get("start").map(parse).getOrElse(Lit(0L)), optLiteral(fields, "default"))
      case other => throw new IllegalArgumentException(s"between: $other")
    }
    case "prefix" =>
      val (l, r) = binaryArgs(arg); PrefixOp(l, r)
    case "suffix" | "postfix" =>
      val (l, r) = binaryArgs(arg); SuffixOp(l, r)
    case "concat" =>
      ConcatOp(termList(arg), optLiteral(fields, "separator") match {
        case NullOp => Lit(""); case s => s
      }, optLiteral(fields, "default"))
    case "regex" | "regexp" =>
      val (l, r) = binaryArgs(arg); RegExpOp(l, r)
    case "split" =>
      val (l, r) = binaryArgs(arg); SplitOp(l, r)
    case "get" => arg match {
      case JArray(List(a, b)) => GetOp(parse(a), parse(b))
      case other => throw new IllegalArgumentException(s"get: $other")
    }
    case "first" => FirstOp(parse(arg))
    case "last" => LastOp(parse(arg))
    case "tuple" => TupleOp(termList(arg))
    case "select" => arg match {
      case JArray(items) =>
        SelectOp(items.map {
          case JObject(f) =>
            val m = f.toMap
            val value = parse(m("value"))
            val name = m.get("name").map(rawValue(_).toString).getOrElse(value match {
              case Variable(n) => n
              case _ => throw new IllegalArgumentException("select field needs name")
            })
            name -> value
          case JString(s) => s -> Variable(s)
          case other => throw new IllegalArgumentException(s"select field: $other")
        })
      case other => throw new IllegalArgumentException(s"select: $other")
    }
    case "when" =>
      WhenOp(parse(arg), fields.get("then").map(parse).getOrElse(NullOp), fields.get("else").map(parse).getOrElse(NullOp))
    case "case" => arg match {
      case JArray(items) =>
        val parsed = items.map(parse)
        val (whens, default) = parsed.last match {
          case w: WhenOp => (parsed, NullOp)
          case d         => (parsed.init, d)
        }
        CaseOp(whens.map {
          case w: WhenOp => w
          case other => throw new IllegalArgumentException(s"case when-clause: $other")
        }, default)
      case other => throw new IllegalArgumentException(s"case: $other")
    }
    case "script" => ScriptOp(rawValue(arg).toString)
    case other => throw new IllegalArgumentException(s"unknown operator: $other")
  }

  private def parseNulls(fields: Map[String, JValue]): Boolean =
    fields.get("nulls").exists {
      case JBool(b) => b
      case _        => false
    }
}

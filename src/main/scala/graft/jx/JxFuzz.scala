package graft.jx

import scala.util.Random

/**
 * Seeded differential expression fuzzer (VERDICT r9 #3): generates
 * random well-typed JxExpr trees (depth ≤ 4) over a mixed-null domain
 * and checks the [[JxCompiler]] Column path against the INDEPENDENT
 * [[JxSql]] rendering of the same semantics — in-suite via the Spark
 * dialect (JxFuzzSpec, 500 trees), and at the driver's correctness
 * gate via the DuckDB dialect (the q_fuzz_expr_b* catalog entries, 500
 * column-level comparisons against a second engine). Null-semantics
 * drift — the reference's own eq/ne subtleties
 * (vendor/jx_base/expressions.py:999-1048) — is exactly the bug class
 * hand-enumerated entries miss; composition coverage is the point.
 *
 * Determinism: java.util.Random's LCG is spec-fixed, so a seed
 * produces the same trees in the catalog registration and in the test
 * suite, on any JVM. No wall-clock, no global state.
 *
 * Value-domain discipline (why generation is typed and products are
 * flagged): DuckDB ERRORS on BIGINT overflow where Spark wraps, and a
 * depth-4 multiply tree over unbounded leaves reaches 10^400 (double
 * Inf, which the gate's normalizer cannot hash). So integer arithmetic
 * is additive-only, multiply/power subtrees are generated under an
 * `inProduct` flag that excludes the large-magnitude leaves and nested
 * products, and every multiply operand is wrapped in a number cast so
 * the arithmetic runs in IEEE doubles in both engines (worst case
 * ~997^81 ≈ 1e243 — finite, bit-reproducible).
 */
object JxFuzz {
  import JxExpr._

  sealed trait Ty
  case object TBool extends Ty
  case object TNum  extends Ty
  case object TInt  extends Ty
  case object TStr  extends Ty

  /** One generated case: output column name, tree, result type. */
  case class FuzzCase(name: String, expr: JxExpr, ty: Ty)

  private val numLits  = Seq[Any](0L, 1L, 25L, -2L, 0.5, 2.5, -1.5, 10.0)
  private val intLits  = Seq(0L, 1L, 2L, 3L, 5L, 7L, 25L)
  private val strLits  = Seq("A", "N", "R", "AF_1", "NO_2", "_", "")
  private val patterns = Seq("[A-Z]+", "[A-Z]+_[0-9]+", ".*_.*", "(A|N)[FO].*", "[0-9]+")
  private val findTargets = Seq("A", "_", "F", "1")
  // split patterns are LITERAL substrings (the jx_python contract,
  // r12 — JxExpr.SplitOp): "_" and "A" occur in the domain strings
  // (both-sides coverage of match/no-match), "." occurs in NONE of
  // them but is a regex metachar — the case that PROVES literal
  // semantics (an unquoted regex "." would split every string into
  // empties; the literal splits nothing). Pool size pinned at 3 (the
  // draw pattern the r11 trees used).
  private val splitPats = Seq("_", "A", ".")

  private def weighted[T](rnd: Random, xs: Seq[(Int, () => T)]): T = {
    val total = xs.map(_._1).sum
    var k = rnd.nextInt(total)
    xs.find { case (w, _) => { k -= w; k < 0 } }.get._2()
  }
  private def oneOf[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.size))
  private def terms(rnd: Random, n: Int, mk: () => JxExpr): Seq[JxExpr] =
    Seq.fill(2 + rnd.nextInt(n - 1))(mk())

  /** Optional default for ops that take one: missing (NullOp) 60%,
    * else a literal of the op's type. */
  private def numDefault(rnd: Random): JxExpr =
    if (rnd.nextInt(5) < 3) NullOp else Lit(oneOf(rnd, numLits))

  /** A `case` DEFAULT that is a bare `when` object is ambiguous in the
    * JSON format (it re-parses as another when-arm — the reference has
    * the same ambiguity), so wrap one in a semantically-neutral 1-term
    * coalesce; every generated tree then JSON-round-trips exactly. */
  private def caseDefault(e: JxExpr): JxExpr = e match {
    case w: WhenOp => CoalesceOp(Seq(w))
    case other     => other
  }

  def genBool(rnd: Random, d: Int): JxExpr =
    if (d <= 0) weighted(rnd, Seq(
      3 -> (() => Variable("bool1")),
      1 -> (() => TrueOp),
      1 -> (() => FalseOp)))
    else weighted[JxExpr](rnd, Seq(
      4 -> (() => AndOp(terms(rnd, 3, () => genBool(rnd, d - 1)))),
      4 -> (() => OrOp(terms(rnd, 3, () => genBool(rnd, d - 1)))),
      3 -> (() => NotOp(genBool(rnd, d - 1))),
      4 -> (() => EqOp(genNum(rnd, d - 1, false), genNum(rnd, d - 1, false))),
      2 -> (() => EqOp(genStr(rnd, d - 1), genStr(rnd, d - 1))),
      1 -> (() => EqOp(genBool(rnd, d - 1), genBool(rnd, d - 1))),
      3 -> (() => NeOp(genNum(rnd, d - 1, false), genNum(rnd, d - 1, false))),
      1 -> (() => NeOp(genStr(rnd, d - 1), genStr(rnd, d - 1))),
      4 -> (() => InequalityOp(oneOf(rnd, Seq("gt", "gte", "lt", "lte")),
        genNum(rnd, d - 1, false), genNum(rnd, d - 1, false))),
      1 -> (() => InequalityOp(oneOf(rnd, Seq("gt", "lt")),
        genStr(rnd, d - 1), genStr(rnd, d - 1))),
      // a quarter of the lists carry a NULL member (r12): JX `in` is
      // Python membership, so a missing value MATCHES a null member —
      // the arm SQL IN's three-valued logic gets wrong (JxCompiler)
      2 -> (() => InOp(genNum(rnd, d - 1, false),
        Lit(Seq.fill(2 + rnd.nextInt(3))(oneOf(rnd, numLits)) ++
          (if (rnd.nextInt(4) == 0) Seq(null) else Nil)))),
      2 -> (() => InOp(genStr(rnd, d - 1),
        Lit(Seq.fill(2 + rnd.nextInt(3))(oneOf(rnd, strLits): Any) ++
          (if (rnd.nextInt(4) == 0) Seq(null) else Nil)))),
      2 -> (() => MissingOp(genAny(rnd, d - 1))),
      2 -> (() => ExistsOp(genAny(rnd, d - 1))),
      2 -> (() => PrefixOp(genStr(rnd, d - 1), genStr(rnd, d - 1))),
      2 -> (() => SuffixOp(genStr(rnd, d - 1), genStr(rnd, d - 1))),
      1 -> (() => RegExpOp(genStr(rnd, d - 1), Lit(oneOf(rnd, patterns)))),
      1 -> (() => WhenOp(genBool(rnd, d - 1), genBool(rnd, d - 1), genBool(rnd, d - 1)))))

  def genNum(rnd: Random, d: Int, inProduct: Boolean): JxExpr =
    if (d <= 0) weighted(rnd, Seq(
      3 -> (() => Variable("num1")),
      (if (inProduct) 0 else 3) -> (() => Variable("num2")),
      2 -> (() => Variable(oneOf(rnd, Seq("int1", "int2")))),
      3 -> (() => Lit(oneOf(rnd, numLits))),
      1 -> (() => NullOp)).filter(_._1 > 0))
    else weighted[JxExpr](rnd, Seq(
      5 -> (() => MultiOp("add", terms(rnd, 3, () => genNum(rnd, d - 1, inProduct)),
        nulls = rnd.nextBoolean(), default = numDefault(rnd))),
      (if (inProduct) 0 else 3) -> (() =>
        MultiOp("mul",
          terms(rnd, 3, () => CastOp("number", genNum(rnd, d - 1, true))),
          nulls = rnd.nextBoolean(), default = numDefault(rnd))),
      3 -> (() => BinaryOp("sub", genNum(rnd, d - 1, inProduct),
        genNum(rnd, d - 1, inProduct), numDefault(rnd))),
      (if (inProduct) 0 else 1) -> (() =>
        BinaryOp("exp", genNum(rnd, d - 1, true), Lit(oneOf(rnd, Seq(2L, 3L))), numDefault(rnd))),
      2 -> (() => BinaryOp("mod", genNum(rnd, d - 1, inProduct),
        genNum(rnd, d - 1, inProduct), numDefault(rnd))),
      3 -> (() => DivOp(genNum(rnd, d - 1, inProduct),
        genNum(rnd, d - 1, inProduct), numDefault(rnd))),
      1 -> (() => FloorOp(genNum(rnd, d - 1, inProduct), genNum(rnd, d - 1, inProduct))),
      2 -> (() => MaxOp(terms(rnd, 3, () => genNum(rnd, d - 1, inProduct)))),
      2 -> (() => MinOp(terms(rnd, 3, () => genNum(rnd, d - 1, inProduct)))),
      2 -> (() => CountOp(terms(rnd, 3, () => genAny(rnd, d - 1)))),
      2 -> (() => CoalesceOp(terms(rnd, 3, () => genNum(rnd, d - 1, inProduct)))),
      2 -> (() => WhenOp(genBool(rnd, d - 1),
        genNum(rnd, d - 1, inProduct), genNum(rnd, d - 1, inProduct))),
      1 -> (() => CaseOp(
        Seq.fill(1 + rnd.nextInt(2))(WhenOp(genBool(rnd, d - 1),
          genNum(rnd, d - 1, inProduct), NullOp)),
        caseDefault(genNum(rnd, d - 1, inProduct)))),
      1 -> (() => CastOp("number", genCastableStr(rnd))),
      // date math (r11 widening): epoch seconds of the domain's
      // timestamp (integral ~8.6e8 — exact in doubles and under the
      // 10-sig-digit comparator) or of a from_unix round-trip over a
      // SMALL literal (a huge generated double into a timestamp would
      // hit the engines' different overflow behaviors)
      1 -> (() => UnixOp(if (rnd.nextInt(4) > 0) Variable("ts1")
                         else FromUnixOp(Lit(oneOf(rnd, intLits))))),
      1 -> (() => LengthOp(genStr(rnd, d - 1))),
      1 -> (() => FindOp(genStr(rnd, d - 1), Lit(oneOf(rnd, findTargets)),
        Lit(0L), numDefault(rnd)))).filter(_._1 > 0))

  def genInt(rnd: Random, d: Int): JxExpr =
    if (d <= 0) weighted(rnd, Seq(
      3 -> (() => Variable(oneOf(rnd, Seq("int1", "int2")))),
      3 -> (() => Lit(oneOf(rnd, intLits))),
      1 -> (() => NullOp)))
    else weighted[JxExpr](rnd, Seq(
      4 -> (() => MultiOp("add", terms(rnd, 3, () => genInt(rnd, d - 1)),
        nulls = rnd.nextBoolean(),
        default = if (rnd.nextBoolean()) NullOp else Lit(oneOf(rnd, intLits)))),
      3 -> (() => BinaryOp("sub", genInt(rnd, d - 1), genInt(rnd, d - 1), NullOp)),
      3 -> (() => BinaryOp("mod", genInt(rnd, d - 1), genInt(rnd, d - 1), NullOp)),
      2 -> (() => CountOp(terms(rnd, 3, () => genAny(rnd, d - 1)))),
      2 -> (() => CoalesceOp(terms(rnd, 3, () => genInt(rnd, d - 1)))),
      2 -> (() => MaxOp(terms(rnd, 3, () => genInt(rnd, d - 1)))),
      2 -> (() => MinOp(terms(rnd, 3, () => genInt(rnd, d - 1)))),
      2 -> (() => WhenOp(genBool(rnd, d - 1), genInt(rnd, d - 1), genInt(rnd, d - 1))),
      1 -> (() => CastOp("integer", genInt(rnd, d - 1)))))

  def genStr(rnd: Random, d: Int): JxExpr =
    if (d <= 0) weighted(rnd, Seq(
      3 -> (() => Variable("str1")),
      3 -> (() => Variable("str2")),
      3 -> (() => Lit(oneOf(rnd, strLits))),
      1 -> (() => NullOp)))
    else weighted[JxExpr](rnd, Seq(
      4 -> (() => SubstrOp(oneOf(rnd, Seq("left", "right", "not_left", "not_right")),
        genStr(rnd, d - 1), genInt(rnd, d - 1))),
      3 -> (() => ConcatOp(terms(rnd, 3, () => genStr(rnd, d - 1)),
        // Lit("") (the parser's default), not NullOp: both compile to
        // the same empty separator, but only Lit("") JSON-round-trips
        // to an identical tree (the toJson/parse law in JxFuzzSpec)
        separator = if (rnd.nextBoolean()) Lit("_") else Lit(""),
        default = if (rnd.nextBoolean()) NullOp else Lit(oneOf(rnd, strLits)))),
      3 -> (() => WhenOp(genBool(rnd, d - 1), genStr(rnd, d - 1), genStr(rnd, d - 1))),
      // between with non-empty literal needles and start 0 — the
      // JxSql-renderable subset (r11 widening); a string default half
      // the time exercises the absent-needle arm. The VALUE is a LEAF:
      // the SQL rendering textually repeats it ~8× (begin/end/result
      // arms), so a deep subtree here compounds exponentially upward —
      // the first widened run OOM'd Spark's ANTLR parser on the
      // rendered block before this bound
      2 -> (() => BetweenOp(genStr(rnd, 0),
        Lit(oneOf(rnd, findTargets)), Lit(oneOf(rnd, findTargets)), Lit(0L),
        if (rnd.nextBoolean()) NullOp else Lit(oneOf(rnd, strLits)))),
      2 -> (() => CoalesceOp(terms(rnd, 3, () => genStr(rnd, d - 1)))),
      // split + element access (r11 widening; r12 literal contract):
      // a literal-substring split consumed by get/first/last — the
      // only array-producing op in the registry, always collapsed
      // back to a string here (the gate's comparator cannot hash raw
      // array cells). Get indexes span -1..3 — the -1 draw stays so
      // the r13 contract (ANY negative index is missing,
      // FlatList.__getitem__ mo_dots lists.py:69) is differentially
      // pinned, not just spec-pinned
      2 -> (() => {
        val arr = SplitOp(genStr(rnd, d - 1), Lit(oneOf(rnd, splitPats)))
        weighted[JxExpr](rnd, Seq(
          2 -> (() => GetOp(arr, Lit(rnd.nextInt(5).toLong - 1L))),
          1 -> (() => FirstOp(arr)),
          1 -> (() => LastOp(arr))))
      }),
      // SCALAR element access (r12; r13 contract fix): the listwrap
      // half of the contract — first/last of a scalar is the scalar,
      // get hits it only at index 0 (JxExpr.GetOp scaladoc; negative
      // draws must render missing) — generated into the gate so the
      // scalar dispatch is differentially checked against DuckDB, not
      // only spec-pinned
      1 -> (() => {
        val v = genStr(rnd, 0)
        weighted[JxExpr](rnd, Seq(
          1 -> (() => FirstOp(v)),
          1 -> (() => LastOp(v)),
          1 -> (() => GetOp(v, Lit(rnd.nextInt(3).toLong - 1L)))))
      }),
      1 -> (() => CaseOp(
        Seq.fill(1 + rnd.nextInt(2))(WhenOp(genBool(rnd, d - 1), genStr(rnd, d - 1), NullOp)),
        caseDefault(genStr(rnd, d - 1)))),
      1 -> (() => CastOp("string", genInt(rnd, d - 1)))))

  /** String source for number-casts — excludes underscore-bearing
    * strings, because the engines GENUINELY diverge there (a fuzzer
    * finding, first run): DuckDB and Python accept underscore digit
    * separators when parsing numeric strings ('492_1' → 4921.0), Spark
    * SQL's cast does not (→ NULL). The divergence is documented here
    * rather than papered over in the translation; every other string
    * shape flows through the cast on both sides. */
  def genCastableStr(rnd: Random): JxExpr = weighted(rnd, Seq(
    3 -> (() => Variable("str1")),
    3 -> (() => Lit(oneOf(rnd, Seq("12.5", "7", "-3", "A", "")): Any)),
    1 -> (() => NullOp)))

  /** A leaf-ish expression of any type (for missing/exists/count). */
  def genAny(rnd: Random, d: Int): JxExpr = weighted(rnd, Seq(
    3 -> (() => genNum(rnd, math.min(d, 1), false)),
    2 -> (() => genStr(rnd, math.min(d, 1))),
    1 -> (() => genInt(rnd, math.min(d, 1)))))

  /** Rewrite every Variable leaf via `f` (the fuzzed subset only) —
    * used to retarget domain-variable trees at real table columns for
    * the aggregate-layer fuzz. */
  def mapVars(e: JxExpr, f: String => JxExpr): JxExpr = {
    def m(x: JxExpr): JxExpr = mapVars(x, f)
    e match {
      case Variable(n) => f(n)
      case _: Lit | NullOp | TrueOp | FalseOp => e
      case AndOp(ts) => AndOp(ts.map(m))
      case OrOp(ts)  => OrOp(ts.map(m))
      case NotOp(t)  => NotOp(m(t))
      case EqOp(l, r) => EqOp(m(l), m(r))
      case NeOp(l, r) => NeOp(m(l), m(r))
      case InequalityOp(op, l, r) => InequalityOp(op, m(l), m(r))
      case InOp(v, list) => InOp(m(v), m(list))
      case MissingOp(t) => MissingOp(m(t))
      case ExistsOp(t)  => ExistsOp(m(t))
      case MultiOp(op, ts, nulls, dflt) => MultiOp(op, ts.map(m), nulls, m(dflt))
      case BinaryOp(op, l, r, dflt) => BinaryOp(op, m(l), m(r), m(dflt))
      case DivOp(l, r, dflt) => DivOp(m(l), m(r), m(dflt))
      case FloorOp(l, r) => FloorOp(m(l), m(r))
      case MaxOp(ts) => MaxOp(ts.map(m))
      case MinOp(ts) => MinOp(ts.map(m))
      case CountOp(ts) => CountOp(ts.map(m))
      case CoalesceOp(ts) => CoalesceOp(ts.map(m))
      case CastOp(kind, t) => CastOp(kind, m(t))
      case LengthOp(t) => LengthOp(m(t))
      case UnixOp(t) => UnixOp(m(t))
      case FromUnixOp(t) => FromUnixOp(m(t))
      case SubstrOp(kind, v, n) => SubstrOp(kind, m(v), m(n))
      case FindOp(v, fi, st, dflt) => FindOp(m(v), m(fi), m(st), m(dflt))
      case BetweenOp(v, p, sfx, st, dflt) =>
        BetweenOp(m(v), m(p), m(sfx), m(st), m(dflt))
      case PrefixOp(v, p) => PrefixOp(m(v), m(p))
      case SuffixOp(v, p) => SuffixOp(m(v), m(p))
      case ConcatOp(ts, sep, dflt) => ConcatOp(ts.map(m), m(sep), m(dflt))
      case RegExpOp(v, p) => RegExpOp(m(v), m(p))
      case SplitOp(v, p)  => SplitOp(m(v), m(p))
      case GetOp(v, i)    => GetOp(m(v), m(i))
      case FirstOp(t)     => FirstOp(m(t))
      case LastOp(t)      => LastOp(m(t))
      case WhenOp(c, t, els) => WhenOp(m(c), m(t), m(els))
      case CaseOp(ws, dflt) =>
        CaseOp(ws.map(w => WhenOp(m(w.cond), m(w.thenE), m(w.elseE))), m(dflt))
      case other =>
        throw new IllegalArgumentException(s"mapVars: outside the fuzzed subset: $other")
    }
  }

  /** One aggregate-layer case: output name, value tree (over the
    * domain variables), accumulator name. */
  case class AggCase(name: String, value: JxExpr, agg: String)

  private val aggs = Seq("sum", "minimum", "maximum", "count", "average", "cardinality")

  /** `n` deterministic aggregate cases: value trees come from the
    * EXACT-valued integer generator (integral magnitudes bounded far
    * below 2^53, so double sums are exact under ANY summation order —
    * the property that makes a cross-engine SUM/AVG hash comparable at
    * all; a fractional-double sum is partial-sum-order-dependent and
    * ineligible). Conditions inside the trees may reference the full
    * mixed domain. */
  def aggCases(seed: Long, n: Int): Seq[AggCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val d = 2 + rnd.nextInt(2)
      AggCase(f"a$i%03d", genInt(rnd, d), oneOf(rnd, aggs))
    }
  }

  /** One window-layer case (§2.5 differential): an exact-int value
    * tree aggregated over a generated frame. `range` carries the JX
    * half-open [min, max) bounds (None side = unbounded); `desc`
    * flips the total-order sort; `where` nulls non-matching
    * contributions (the reference's "do not consider these values"). */
  case class WindowCase(name: String, value: JxExpr, agg: String,
      edge: JxExpr, desc: Boolean,
      range: Option[(Option[Long], Option[Long])], where: Option[JxExpr])

  // median (r11): the exact sliding-percentile accumulator — the JX
  // window surface's hardest aggregate (reference windows.py:281-306,
  // the sub()-capable percentile q_window_median pins pointwise) now
  // fuzzes over generated frames too. Exact-int value trees keep the
  // interpolated midpoint ((a+b)/2 of bounded ints) bit-stable across
  // engines.
  private val winAggs = Seq("sum", "minimum", "maximum", "count", "average", "median")

  /** `n` deterministic window cases: same exact-int value discipline
    * as [[aggCases]] (order-independent double sums), frames drawn
    * from all four shapes (running, bounded-both, unbounded-preceding,
    * unbounded-following), partition keys varied, 1-in-3 cases carry a
    * window `where`. */
  def windowCases(seed: Long, n: Int): Seq[WindowCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val range: Option[(Option[Long], Option[Long])] = rnd.nextInt(4) match {
        case 0 => None // running: unbounded preceding .. current row
        case 1 =>
          val mn = -(1L + rnd.nextInt(4))
          Some((Some(mn), Some(mn + 1 + rnd.nextInt(5))))
        case 2 => Some((None, Some(1L + rnd.nextInt(3))))
        case _ => Some((Some(-rnd.nextInt(3).toLong), None))
      }
      val edge = rnd.nextInt(3) match {
        case 0 => Variable("int2")
        case 1 => Variable("str1")
        case _ => BinaryOp("mod", Variable("int2"), Lit(7L), NullOp)
      }
      val where = if (rnd.nextInt(3) == 0) Some(genBool(rnd, 2)) else None
      WindowCase(f"w$i%03d", genInt(rnd, 1 + rnd.nextInt(2)),
        oneOf(rnd, winAggs), edge, rnd.nextBoolean(), range, where)
    }
  }

  /** One edges-layer (dense cube) case: a 1-edge set-domain query —
    * edge key = `base` mod `mod` (optionally nulled on a second
    * modulus so the NULL BUCKET has content), explicit partitions
    * (possibly including a PHANTOM value no row produces — the
    * densify-zero row — and possibly omitting live values — null-
    * bucket spillover), allowNulls on/off, one generated aggregate
    * beside the row count. */
  case class EdgeCase(mod: Int, nullable: Boolean, parts: Seq[Long],
      allowNulls: Boolean, agg: String, value: JxExpr)

  def edgeCases(seed: Long, n: Int): Seq[EdgeCase] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val mod = 4 + rnd.nextInt(4) // 4..7
      // distinct subset of the live values 0..mod-1 (at least one)
      val live = (0L until mod.toLong)
        .filter(_ => rnd.nextInt(3) > 0) match {
          case s if s.isEmpty => Seq(0L)
          case s => s
        }
      val parts = if (rnd.nextInt(3) == 0) live :+ (mod + 2L) else live
      EdgeCase(mod, rnd.nextBoolean(), parts, rnd.nextBoolean(),
        oneOf(rnd, Seq("sum", "minimum", "maximum")), genInt(rnd, 1 + rnd.nextInt(2)))
    }
  }

  /** The edge-key tree for an [[EdgeCase]] over the domain variables:
    * (int1 mod `mod`), nulled when (int2 mod 3) = 0 if `nullable`. */
  def edgeKey(c: EdgeCase): JxExpr = {
    val base = BinaryOp("mod", Variable("int1"), Lit(c.mod.toLong), NullOp)
    if (!c.nullable) base
    else WhenOp(
      InequalityOp("gt", BinaryOp("mod", Variable("int2"), Lit(3L), NullOp), Lit(0L)),
      base, NullOp)
  }

  /** Second-edge key for the 2-d cube cases: same shape as [[edgeKey]]
    * with the variable roles swapped, so the two edges of one query
    * classify on (near-)independent columns. */
  def edgeKey2(c: EdgeCase): JxExpr = {
    val base = BinaryOp("mod", Variable("int2"), Lit(c.mod.toLong), NullOp)
    if (!c.nullable) base
    else WhenOp(
      InequalityOp("gt", BinaryOp("mod", Variable("int1"), Lit(3L), NullOp), Lit(0L)),
      base, NullOp)
  }

  /** 2-EDGE cube cases (r11 deepening of the edges layer): pairs of
    * independently-generated [[EdgeCase]]s drive one two-edge query
    * each — the dense CROSS-PRODUCT grid (domA ∪ nullA) × (domB ∪
    * nullB) with zero-filled counts, phantom partitions, and the four
    * null-bucket arms the 1-edge block cannot reach. Drawn through the
    * same generator so the per-edge distributions match the 1-d block. */
  def edge2Cases(seed: Long, n: Int): Seq[(EdgeCase, EdgeCase)] =
    edgeCases(seed, 2 * n).grouped(2).map { case Seq(a, b) => (a, b) }.toSeq

  /** One setop-pipeline case (§2.6 differential, VERDICT r10 #4): the
    * filter→select→sort→limit composition. The select tuple is FIXED
    * SHAPE — (k, i0, i1, s0): the unique row key, two exact-int trees,
    * one string tree — so generated cases union into one entry; the
    * pipeline MECHANICS (sort-key resolution incl. tuple offsets,
    * nulls-least multi-key order, the default-10/max-10000 limit
    * clamps) are what varies. Sort keys come in all four JX spellings:
    * offset forms (bare int / {"offset": i}) index the SELECT tuple
    * (the engine substitutes the i-th select value expression —
    * reference OffsetOp), name forms (bare string / object) reference
    * SOURCE columns (sorts run pre-projection, so select aliases are
    * deliberately NOT in scope — the reference's sort values are
    * source-row expressions). Each key carries (idx, desc, spelling);
    * idx maps to a tuple offset or a source-pool column depending on
    * the spelling. The select tuple's offset-0 key `k` is always the
    * final ascending key so every LIMIT prefix is a deterministic row
    * set. `limit` None = the parser's DEFAULT_LIMIT path (10); values
    * above 10,000 exercise MAX_LIMIT. */
  case class SetopCase(where: JxExpr, i0: JxExpr, i1: JxExpr, s0: JxExpr,
      sortKeys: Seq[(Int, Boolean, Int)], limit: Option[Int])

  def setopCases(seed: Long, n: Int): Seq[SetopCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val nKeys = 1 + rnd.nextInt(2)
      val keys = Seq.fill(nKeys)(
        (rnd.nextInt(4), rnd.nextBoolean(), rnd.nextInt(4)))
      // both clamp edges are pinned STRUCTURALLY to the block's first
      // two cases (any later generator widening reshuffles the LCG
      // stream, and a probabilistic draw then silently loses an edge —
      // r11: the split/get widening did exactly that); the draw still
      // happens for every case so the remaining limits stay diverse
      val limit = (i, rnd.nextInt(5)) match {
        case (0, _) => None          // default-limit path (10)
        case (1, _) => Some(50000)   // MAX_LIMIT clamp (10,000)
        case (_, 0) => None
        case (_, 1) => Some(7)
        case (_, 2) => Some(123)
        case (_, 3) => Some(50000)
        case _      => Some(10000)
      }
      SetopCase(genBool(rnd, 2), genInt(rnd, 1 + rnd.nextInt(2)),
        genInt(rnd, 1 + rnd.nextInt(2)), genStr(rnd, 1 + rnd.nextInt(2)),
        keys, limit)
    }
  }

  /** One set-operation case: two generated FILTERS over one shared
    * select pair (i0 int, s0 str — exact-valued, so the set-op equality
    * both engines apply is bit-stable), composed with union-all /
    * intersect / except. `k` is deliberately ABSENT from the select:
    * duplicate output rows occur, so intersect/except exercise their
    * DISTINCT semantics (and union-all its duplicate-keeping) rather
    * than degenerating to key-set algebra. Per-side limits stay at the
    * 10,000 clamp (≥ the fuzz domain), keeping each side's row SET
    * deterministic without a total order. */
  case class SetopPairCase(kind: String, whereA: JxExpr, whereB: JxExpr,
      i0: JxExpr, s0: JxExpr)

  def setopPairCases(seed: Long, n: Int): Seq[SetopPairCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      SetopPairCase(Seq("union", "intersect", "except")(i % 3),
        genBool(rnd, 2), genBool(rnd, 2),
        genInt(rnd, 1 + rnd.nextInt(2)), genStr(rnd, 1 + rnd.nextInt(2)))
    }
  }

  /** One nested-layer case (VERDICT r10 #5): generated trees through
    * the document machinery — the deepest remaining hand-enumerated
    * surface. Four kinds cycle: 0 = existsIn (any-child predicate on
    * the parent), 1 = drillFilter + size (in-place array rewrite,
    * counted), 2 = drillFilter + sumOver (filtered in-document
    * aggregate of a generated exact-int value tree), 3 = implicit
    * one-branch descent with a generated PARENT predicate (child-array
    * select paths explode; `pred`/`value` roam the child fields via
    * the child variable mapping, `parentPred` the parent fields). */
  case class NestedCase(kind: Int, pred: JxExpr, value: JxExpr, parentPred: JxExpr)

  def nestedCases(seed: Long, n: Int): Seq[NestedCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      NestedCase(i % 4, genBool(rnd, 2),
        genInt(rnd, 1 + rnd.nextInt(2)), genBool(rnd, 2))
    }
  }

  /** One TWO-LEVEL nested case (r11 deepening of the nested layer):
    * generated predicates at all three document levels (customer /
    * orders / lineitems) through the deep-arm JX query path
    * (`from: "docs.orders.lineitems"` — reference jx_sqlite/
    * snowflake.py:247-341's relative perspectives). Four kinds cycle:
    * 0 = deep row select (grandchild rows with tri-level where),
    * 1 = groupby GRANDPARENT key over the deep arm (count),
    * 2 = groupby MID key, sum of a generated exact-int child tree,
    * 3 = mid-arm select (parent+mid predicates, mid-level value). */
  case class DeepCase(kind: Int, custPred: JxExpr, ordPred: JxExpr,
      linePred: JxExpr, value: JxExpr)

  def deepCases(seed: Long, n: Int): Seq[DeepCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      DeepCase(i % 4, genBool(rnd, 2), genBool(rnd, 2), genBool(rnd, 2),
        genInt(rnd, 1 + rnd.nextInt(2)))
    }
  }

  /** `n` deterministic cases for `seed`: names e000…, root depth 2-4,
    * type mix num 40% / bool 30% / str 20% / int 10%. */
  def cases(seed: Long, n: Int): Seq[FuzzCase] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val d = 2 + rnd.nextInt(3)
      val (e, ty) = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => (genNum(rnd, d, false), TNum)
        case 4 | 5 | 6     => (genBool(rnd, d), TBool)
        case 7 | 8         => (genStr(rnd, d), TStr)
        case _             => (genInt(rnd, d), TInt)
      }
      FuzzCase(f"e$i%03d", e, ty)
    }
  }
}

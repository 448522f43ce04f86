package graft.jx

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * The JX query model — select/where/edges/groupby/window/sort/limit/format —
 * with normalization mirroring the reference analyzer `QueryOp.wrap`
 * (reference: vendor/jx_base/query.py:208-251):
 *   - limit clamp: default 10, max 10,000 (query.py:35-36)
 *   - canonical aggregate aliases (query.py:283-290)
 *   - default select for aggregate queries = count(.) with default 0
 *   - edges and groupby are mutually exclusive (query.py:230-240)
 */
case class JxQuery(
    from: String,
    select: Seq[SelectClause],
    selectGiven: Boolean,
    edges: Seq[EdgeClause],
    groupby: Seq[EdgeClause],
    where: JxExpr,
    sort: Seq[SortClause],
    windows: Seq[WindowClause],
    limit: Option[Long],
    format: String,
    /** post-aggregation filter over output columns (Container interface
      * surface, vendor/jx_base/container.py:131; stubbed in the
      * reference — free with Spark). */
    having: Option[JxExpr] = None) {
  def isAggregate: Boolean =
    edges.nonEmpty || groupby.nonEmpty || select.exists(_.aggregate.exists(_ != "none"))
}

case class SelectClause(
    name: String,
    value: JxExpr,
    aggregate: Option[String],
    default: Option[JxExpr],
    percentile: Option[Double])

case class EdgeClause(
    name: String,
    value: Option[JxExpr],
    /** row-interval edge: (minExpr, maxExpr); a row lands in EVERY overlapping part. */
    range: Option[(JxExpr, JxExpr)],
    domain: Domain,
    allowNulls: Boolean)

case class SortClause(value: JxExpr, dir: Int) // dir: 1 asc, -1 desc

case class WindowClause(
    name: String,
    value: JxExpr,
    edges: Seq[JxExpr],
    sort: Seq[SortClause],
    aggregate: Option[String],
    /** rows-range [min, max) relative to current row (half-open, reference jx.py:1013-1034) */
    range: Option[(Long, Long)],
    where: Option[JxExpr],
    percentile: Option[Double] = None)

/** Edge partitioning schemes (reference: vendor/jx_base/domains.py:739-748). */
sealed trait Domain
object Domain {
  /** default top-k for discovered (DefaultDomain) edges, reference DEFAULT_LIMIT */
  val DefaultDomainLimit = 10
  /** Values discovered at query time, top-k by frequency (domains.py:147-197). */
  case class DefaultDomain(limit: Int) extends Domain
  /** Explicit partitions: scalar values, or named parts with `where` predicates
    * (domains.py:200-353, predicate parts :258-273). */
  case class SetDomain(parts: Seq[SetPart]) extends Domain
  case class SetPart(name: String, value: Option[Any], where: Option[JxExpr])
  /** Time axis partitioned into [min, max) at `interval` (domains.py:458-518). */
  case class TimeDomain(min: java.sql.Timestamp, max: java.sql.Timestamp, intervalSeconds: Double, intervalMonths: Int = 0) extends Domain
  /** Duration (seconds) axis (domains.py:521-578). */
  case class DurationDomain(min: Double, max: Double, interval: Double) extends Domain
  /** Numeric range axis [min, max) at `interval` (domains.py:582-712). */
  case class RangeDomain(min: Double, max: Double, interval: Double) extends Domain
}

object JxQuery {
  val DefaultLimit = 10L
  val MaxLimit = 10000L

  /** What a query touches, for assembly-side column pruning. `names` are
    * the simple names referenced anywhere (dot-paths contribute each
    * segment); `whole` are the FINAL segments of referenced variables —
    * a name referenced as a value in its own right. An arm alias in
    * `whole` means the query consumes the arm's entire subtree (e.g.
    * `select: ["orders"]`), so pruning must not descend below it; an arm
    * that appears only as a path prefix or from-chain segment still
    * prunes to its referenced columns. */
  case class ReferencedCols(names: Set[String], whole: Set[String])

  def referenced(q: JxQuery): Option[ReferencedCols] = {
    var wildcard = !q.selectGiven && q.select.isEmpty
    var dotWhole = false // "." consumed as a VALUE (not just presence)
    val names = scala.collection.mutable.Set[String]()
    val whole = scala.collection.mutable.Set[String]()
    def walk(x: Any): Unit = x match {
      case JxExpr.Variable(n) =>
        if (n == "*" || n.endsWith(".*")) wildcard = true
        else if (n == ".") dotWhole = true
        else if (n != "rownum") {
          val segs = n.split('.')
          segs.foreach(names += _)
          whole += segs.last
        }
      case JxExpr.LeavesOp(_) => wildcard = true
      case JxExpr.ScriptOp(_) => wildcard = true // free-form: cannot see its inputs
      // count(".")/exists(".") only test the arm struct's null-ness (the
      // explode_outer padding), not its contents — a pruned struct
      // answers them identically, so they don't force whole-arm width
      case SelectClause(_, JxExpr.Variable("."), Some("count" | "exists"), _, _) => ()
      case p: Product => p.productIterator.foreach(walk)
      case s: Iterable[_] => s.foreach(walk)
      case _ => ()
    }
    Seq(q.select, q.edges, q.groupby, q.where, q.sort, q.windows, q.having).foreach(walk)
    q.from.split('.').foreach(names += _) // perspectives: prunable, NOT whole
    if (dotWhole) {
      // "." is the current arm consumed whole: the deepest from segment's
      // subtree (or, at root perspective, everything)
      val segs = q.from.split('.')
      if (segs.length > 1) whole += segs.last else wildcard = true
    }
    if (wildcard) None else Some(ReferencedCols(names.toSet, whole.toSet))
  }

  /** Back-compat view of [[referenced]]: just the name set. */
  def referencedNames(q: JxQuery): Option[Set[String]] =
    referenced(q).map(_.names)

  /** Canonical aggregate aliases (reference query.py:283-290 + sql_aggs). */
  val canonicalAggregates: Map[String, String] = Map(
    "add" -> "sum", "avg" -> "average", "mean" -> "average",
    "min" -> "minimum", "max" -> "maximum")

  def parse(json: String): JxQuery = parse(JsonMethods.parse(json))

  def parse(v: JValue): JxQuery = {
    val obj = v.asInstanceOf[JObject].obj.toMap
    val from = obj.get("from") match {
      case Some(JString(s)) => s
      case other => throw new IllegalArgumentException(s"query needs string `from`: $other")
    }
    val edges = seqOf(obj.get("edges")).map(parseEdge)
    val groupby = seqOf(obj.get("groupby")).map(parseGroupby)
    if (edges.nonEmpty && groupby.nonEmpty)
      throw new IllegalArgumentException("edges and groupby are mutually exclusive")

    val selectJ = obj.get("select")
    val selects = selectJ match {
      case None => Nil
      case Some(JArray(items)) => items.map(parseSelect)
      case Some(single)        => Seq(parseSelect(single))
    }
    val isAgg = edges.nonEmpty || groupby.nonEmpty ||
      selects.exists(_.aggregate.exists(_ != "none"))
    val normalizedSelects =
      if (selects.nonEmpty) selects
      else if (isAgg) Seq(SelectClause("count", JxExpr.Variable("."), Some("count"), Some(JxExpr.Lit(0L)), None))
      else Nil // setop: select * (all columns)

    val where = obj.get("where").map(JxExpr.parse).getOrElse(JxExpr.TrueOp)
    val sort = seqOf(obj.get("sort")).map(parseSort)
    val windows = seqOf(obj.get("window")).map(parseWindow)
    val limit = obj.get("limit") match {
      case Some(JInt(n))  => Some(math.min(n.toLong, MaxLimit))
      case Some(JLong(n)) => Some(math.min(n, MaxLimit))
      case Some(JNull)    => None
      case None => if (isAgg) None else Some(DefaultLimit)
      case other => throw new IllegalArgumentException(s"limit: $other")
    }
    val format = obj.get("format") match {
      case Some(JString(f)) => f
      case _                => "list"
    }
    JxQuery(from, normalizedSelects, selectJ.isDefined, edges, groupby, where, sort, windows, limit, format,
      having = obj.get("having").map(JxExpr.parse))
  }

  private def seqOf(v: Option[JValue]): Seq[JValue] = v match {
    case None | Some(JNull) => Nil
    case Some(JArray(items)) => items
    case Some(single)        => Seq(single)
  }

  def parseSelect(v: JValue): SelectClause = v match {
    case JString(s) => SelectClause(s, JxExpr.Variable(s), None, None, None)
    case JObject(fields) =>
      val m = fields.toMap
      val value = m.get("value").map(JxExpr.parse).getOrElse(JxExpr.Variable("."))
      val rawAgg = m.get("aggregate").collect { case JString(a) => a }
      val agg = rawAgg.map(a => canonicalAggregates.getOrElse(a, a))
      val name = m.get("name").collect { case JString(n) => n }.getOrElse(value match {
        case JxExpr.Variable(".") => agg.getOrElse(".")
        case JxExpr.Variable(n)   => n
        case _ => throw new IllegalArgumentException("select clause needs a name")
      })
      val default0 = m.get("default").map(d => JxExpr.Lit(JxExpr.rawValue(d)))
      // count defaults to 0 (reference query.py:283-290,331-332)
      val default = default0.orElse(if (agg.contains("count")) Some(JxExpr.Lit(0L)) else None)
      val pct = m.get("percentile").map(p => JxExpr.rawValue(p).asInstanceOf[Any] match {
        case d: Double => d
        case l: Long   => l.toDouble
        case o => throw new IllegalArgumentException(s"percentile: $o")
      })
      SelectClause(name, value, agg, default, pct)
    case other => throw new IllegalArgumentException(s"select: $other")
  }

  def parseSort(v: JValue): SortClause = v match {
    case JString(s) => SortClause(JxExpr.Variable(s), 1)
    // bare integer = offset into the select tuple (reference
    // _normalize_sort, query.py:775: Math.is_integer(s) → OffsetOp)
    case JInt(n)  => SortClause(JxExpr.OffsetOp(n.toInt), 1)
    case JLong(n) => SortClause(JxExpr.OffsetOp(n.toInt), 1)
    case JObject(fields) =>
      val m = fields.toMap
      val value = m.get("value").map(JxExpr.parse)
        .getOrElse(m.get("field").map(JxExpr.parse)
          .getOrElse(throw new IllegalArgumentException("sort needs value")))
      val dir = m.get("sort").map(JxExpr.rawValue) match {
        case Some(-1L) | Some("desc") | Some(-1.0) => -1
        case _ => 1
      }
      SortClause(value, dir)
    case other => throw new IllegalArgumentException(s"sort: $other")
  }

  def parseEdge(v: JValue): EdgeClause = v match {
    case JString(s) =>
      EdgeClause(s, Some(JxExpr.Variable(s)), None, Domain.DefaultDomain(Domain.DefaultDomainLimit), allowNulls = true)
    case JObject(fields) =>
      val m = fields.toMap
      val value = m.get("value").map(JxExpr.parse)
      val range = m.get("range").map {
        case JObject(rf) =>
          val rm = rf.toMap
          (JxExpr.parse(rm("min")), JxExpr.parse(rm("max")))
        case other => throw new IllegalArgumentException(s"edge range: $other")
      }
      val name = m.get("name").collect { case JString(n) => n }.getOrElse(value match {
        case Some(JxExpr.Variable(n)) => n
        case _ => throw new IllegalArgumentException("edge needs a name")
      })
      val allowNulls = m.get("allowNulls") match {
        case Some(JBool(b)) => b
        case _              => true
      }
      val domain = m.get("domain").map(parseDomain).getOrElse(Domain.DefaultDomain(Domain.DefaultDomainLimit))
      EdgeClause(name, value, range, domain, allowNulls)
    case other => throw new IllegalArgumentException(s"edge: $other")
  }

  /** groupby entries are edges with no domain densification (sparse groups). */
  def parseGroupby(v: JValue): EdgeClause = v match {
    case JString(s) => EdgeClause(s, Some(JxExpr.Variable(s)), None, Domain.DefaultDomain(0), allowNulls = true)
    case JObject(fields) =>
      val m = fields.toMap
      val value = m.get("value").map(JxExpr.parse)
        .getOrElse(throw new IllegalArgumentException("groupby needs value"))
      val name = m.get("name").collect { case JString(n) => n }.getOrElse(value match {
        case JxExpr.Variable(n) => n
        case _ => throw new IllegalArgumentException("groupby needs a name")
      })
      EdgeClause(name, Some(value), None, Domain.DefaultDomain(0), allowNulls = true)
    case other => throw new IllegalArgumentException(s"groupby: $other")
  }

  def parseWindow(v: JValue): WindowClause = v match {
    case JObject(fields) =>
      val m = fields.toMap
      val name = m.get("name").collect { case JString(n) => n }
        .getOrElse(throw new IllegalArgumentException("window needs a name"))
      val value = m.get("value").map(JxExpr.parse)
        .getOrElse(throw new IllegalArgumentException("window needs a value"))
      val edges = seqOf(m.get("edges")).map(JxExpr.parse)
      val sort = seqOf(m.get("sort")).map(parseSort)
      val agg = m.get("aggregate").collect { case JString(a) => canonicalAggregates.getOrElse(a, a) }
      val range = m.get("range").map {
        case JObject(rf) =>
          val rm = rf.toMap
          def num(k: String, dflt: Long) = rm.get(k).map(JxExpr.rawValue) match {
            case Some(l: Long) => l
            case Some(d: Double) => d.toLong
            case None => dflt
            case o => throw new IllegalArgumentException(s"window range $k: $o")
          }
          (num("min", Long.MinValue), num("max", Long.MaxValue))
        case other => throw new IllegalArgumentException(s"window range: $other")
      }
      val where = m.get("where").map(JxExpr.parse)
      val pct = m.get("percentile").map(JxExpr.rawValue(_) match {
        case d: Double => d
        case l: Long   => l.toDouble
        case o => throw new IllegalArgumentException(s"percentile: $o")
      })
      WindowClause(name, value, edges, sort, agg, range, where, pct)
    case other => throw new IllegalArgumentException(s"window: $other")
  }

  def parseDomain(v: JValue): Domain = v match {
    case JObject(fields) =>
      val m = fields.toMap
      val typ = m.get("type").collect { case JString(t) => t }.getOrElse("default")
      typ match {
        case "default" =>
          val limit = m.get("limit").map(JxExpr.rawValue(_).asInstanceOf[Long].toInt)
            .getOrElse(Domain.DefaultDomainLimit)
          Domain.DefaultDomain(limit)
        case "set" =>
          val parts = m.get("partitions") match {
            case Some(JArray(items)) => items.map {
              case JObject(pf) =>
                val pm = pf.toMap
                val value = pm.get("value").map(JxExpr.rawValue)
                val name = pm.get("name").map(JxExpr.rawValue(_).toString)
                  .orElse(value.map(_.toString))
                  .getOrElse(throw new IllegalArgumentException("set partition needs name or value"))
                val where = pm.get("where").map(JxExpr.parse)
                Domain.SetPart(name, value, where)
              case scalar => Domain.SetPart(JxExpr.rawValue(scalar).toString, Some(JxExpr.rawValue(scalar)), None)
            }
            case other => throw new IllegalArgumentException(s"set domain partitions: $other")
          }
          Domain.SetDomain(parts)
        case "time" =>
          val min = DateMath.parse(str(m, "min"))
          val max = DateMath.parse(str(m, "max"))
          val (secs, months) = parseInterval(str(m, "interval"))
          Domain.TimeDomain(min, max, secs, months)
        case "duration" =>
          Domain.DurationDomain(durSeconds(m("min")), durSeconds(m("max")), durSeconds(m("interval")))
        case "range" | "numeric" =>
          Domain.RangeDomain(dbl(m, "min"), dbl(m, "max"), dbl(m, "interval"))
        case other => throw new IllegalArgumentException(s"unknown domain type: $other")
      }
    case other => throw new IllegalArgumentException(s"domain: $other")
  }

  private def str(m: Map[String, JValue], k: String): String =
    JxExpr.rawValue(m(k)).toString

  private def dbl(m: Map[String, JValue], k: String): Double = JxExpr.rawValue(m(k)) match {
    case d: Double => d
    case l: Long   => l.toDouble
    case o => throw new IllegalArgumentException(s"$k: $o")
  }

  /** "day" → 86400s; "month" → calendar months. */
  private def parseInterval(s: String): (Double, Int) = {
    val m = "(\\d*)\\s*([a-zA-Z]+)".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"interval: $s"))
    val n = if (m.group(1).isEmpty) 1 else m.group(1).toInt
    m.group(2).toLowerCase.stripSuffix("s") match {
      case "second" | "sec" => (n.toDouble, 0)
      case "minute" | "min" => (n * 60.0, 0)
      case "hour"  => (n * 3600.0, 0)
      case "day"   => (n * 86400.0, 0)
      case "week"  => (n * 7 * 86400.0, 0)
      case "month" => (0.0, n)
      case "year"  => (0.0, 12 * n)
      case other => throw new IllegalArgumentException(s"interval unit: $other")
    }
  }

  private def durSeconds(v: JValue): Double = JxExpr.rawValue(v) match {
    case d: Double => d
    case l: Long   => l.toDouble
    case s: String => parseInterval(s)._1
    case o => throw new IllegalArgumentException(s"duration: $o")
  }
}

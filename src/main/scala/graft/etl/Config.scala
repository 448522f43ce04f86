package graft.etl

import java.nio.file.{Files, Path, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.etl.SchemaWalk.{Relation, WalkConfig}

/**
 * Reference-compatible configuration loader: a user of the reference can
 * point graft at their existing config JSON (mysql_to_s3 config schema —
 * `extract` / `snowflake` / `destination` sections; see
 * /root/reference/resources/config/treeherder.json and README.md:27-107).
 *
 * Supported reference conveniences:
 *  - `$ref` includes: `{"$ref": "file://path#frag"}` or `{"$ref":
 *    "path#frag"}` merges the referenced JSON subtree into the enclosing
 *    object (mo_json_config semantics); unresolvable refs (e.g. a
 *    private credentials file that isn't mounted) are skipped so the
 *    rest of the config still loads.
 *  - trailing commas (the reference's configs use them).
 *  - `add_relations` strings `"schema.table.col -> schema.table.col"`.
 *  - `reference_only` entries: `"table"` (full object, no nested docs
 *    below) vs `"table.column"` (inline the column).
 */
object Config {

  case class ExtractSection(
      threads: Int,
      lastFile: String,
      fields: Seq[String],
      types: Seq[String],
      start: Seq[Any],
      batch: Seq[Any])

  case class SnowflakeSection(
      factTable: String,
      showForeignKeys: Boolean,
      nullValues: Seq[String],
      addRelations: Seq[Relation],
      exclude: Set[String],
      referenceOnly: Map[String, String],
      referenceAll: Set[String],
      database: Map[String, String])

  case class GraftConfig(
      extract: Option[ExtractSection],
      snowflake: SnowflakeSection,
      destination: Option[String])

  def loadFile(path: Path): GraftConfig = {
    val j = resolveRefs(parseLenient(Files.readString(path)), path.toAbsolutePath.getParent)
    fromJson(j)
  }

  def parse(json: String, baseDir: Path = Paths.get(".")): GraftConfig =
    fromJson(resolveRefs(parseLenient(json), baseDir))

  /** The reference's configs allow trailing commas; strip before parse. */
  private[etl] def parseLenient(json: String): JValue =
    JsonMethods.parse(stripTrailingCommas(json))

  /** Remove ",<ws>}" / ",<ws>]" OUTSIDE string literals only — a global
    * regex rewrites inside quoted values containing ",]" or ",}" (a
    * password, a regex, a null_values sentinel) and silently corrupts
    * them (review r9). One linear scan tracking string state + escapes. */
  private[etl] def stripTrailingCommas(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var inStr = false; var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out.append(c)
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else if (c == '"') { inStr = true; out.append(c) }
      else if (c == ',') {
        var j = i + 1
        while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
        if (!(j < s.length && (s.charAt(j) == '}' || s.charAt(j) == ']')))
          out.append(c)
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  /** Merge `$ref` includes into their enclosing object (best-effort). */
  private[etl] def resolveRefs(j: JValue, baseDir: Path): JValue = j match {
    case JObject(fields) =>
      val (refs, rest) = fields.partition(_._1 == "$ref")
      val resolved = JObject(rest.map { case (k, v) => k -> resolveRefs(v, baseDir) })
      refs.foldLeft(resolved: JValue) {
        case (acc, (_, JString(target))) =>
          readRef(target, baseDir) match {
            // EXPLICIT sibling fields win over the include, which only
            // fills unset keys — the reference's set_default semantics
            // (mo_json_config/__init__.py:117); json4s `a merge b` lets
            // b win conflicts, so the include goes on the LEFT
            // (review r9: the old `acc merge inc` let defaults override
            // explicit overrides)
            case Some(inc) => inc merge acc
            case None      => acc // e.g. ~/private.json not mounted
          }
        case (acc, _) => acc
      }
    case JArray(items) => JArray(items.map(resolveRefs(_, baseDir)))
    case other => other
  }

  private def readRef(target: String, baseDir: Path): Option[JValue] = try {
    val noScheme = target.stripPrefix("file://")
    val (pathPart, frag) = noScheme.split('#') match {
      case Array(p)    => (p, "")
      case Array(p, f) => (p, f)
      case _           => return None
    }
    val p =
      if (pathPart.startsWith("~")) Paths.get(sys.props("user.home"), pathPart.drop(1))
      else baseDir.resolve(pathPart)
    if (!Files.exists(p)) return None
    val doc = parseLenient(Files.readString(p))
    Some(frag.split('.').filter(_.nonEmpty).foldLeft(doc)((d, seg) => d \ seg))
  } catch { case _: Exception => None }

  // -- section builders ---------------------------------------------------

  private def strings(v: JValue): Seq[String] = v match {
    case JArray(items) => items.collect { case JString(s) => s }
    case JString(s)    => Seq(s)
    case _             => Nil
  }

  private def anySeq(v: JValue): Seq[Any] = v match {
    case JArray(items) => items.map(JxRaw.raw)
    case JNothing      => Nil
    case single        => Seq(JxRaw.raw(single))
  }

  private object JxRaw { def raw(v: JValue): Any = graft.jx.JxExpr.rawValue(v) }

  /** "schema.table.col -> schema.table.col" (schema prefix dropped —
    * one schema per JDBC connection here). */
  private[etl] def parseRelation(s: String, idx: Int): Relation = {
    val Array(fk, pk) = s.split("->").map(_.trim)
    def tableCol(x: String): (String, String) = {
      val parts = x.split('.')
      require(parts.length >= 2 && parts.last.nonEmpty && parts(parts.length - 2).nonEmpty,
        s"add_relations: malformed qualified name '$x' in '$s' — expected table.column")
      (parts(parts.length - 2).toLowerCase, parts.last.toLowerCase)
    }
    val (fkT, fkC) = tableCol(fk); val (pkT, pkC) = tableCol(pk)
    Relation(s"add_rel_$idx", fkT, fkC, pkT, pkC)
  }

  private def fromJson(j: JValue): GraftConfig = {
    val sf = j \ "snowflake"
    require(sf != JNothing, "config needs a snowflake section")
    val refOnly = strings(sf \ "reference_only")
    val snowflake = SnowflakeSection(
      factTable = (sf \ "fact_table").asInstanceOf[JString].s,
      showForeignKeys = sf \ "show_foreign_keys" match {
        case JBool(b) => b; case _ => true
      },
      nullValues = strings(sf \ "null_values"),
      addRelations = strings(sf \ "add_relations").zipWithIndex
        .map { case (s, i) => parseRelation(s, i) },
      exclude = strings(sf \ "exclude").map(_.toLowerCase).toSet,
      referenceOnly = refOnly.filter(_.contains("."))
        .map { s => // schema-qualified names take the LAST two segments,
          // like parseRelation (review r9: a 3-part name crashed here;
          // review r10: ".col"/"col." split to <2 segments — split('.')
          // drops empty trailing segments — so guard before indexing)
          val parts = s.split('.')
          require(parts.length >= 2 && parts.last.nonEmpty && parts(parts.length - 2).nonEmpty,
            s"reference_only: malformed qualified name '$s' — expected table.column")
          parts(parts.length - 2).toLowerCase -> parts.last.toLowerCase
        }.toMap,
      referenceAll = refOnly.filterNot(_.contains(".")).map(_.toLowerCase).toSet,
      database = (sf \ "database") match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      })
    val extract = (j \ "extract") match {
      case JNothing => None
      case e => Some(ExtractSection(
        threads = e \ "threads" match { case JInt(n) => n.toInt; case _ => 1 },
        lastFile = e \ "last" match { case JString(s) => s; case _ => "last_run.json" },
        fields = strings(e \ "field"),
        types = strings(e \ "type"),
        start = anySeq(e \ "start"),
        batch = anySeq(e \ "batch")))
    }
    val destination = (j \ "destination") match {
      case JString(s) => Some(s)
      case JObject(fields) => fields.collectFirst { case ("bucket", JString(b)) => s"s3://$b" }
      case _ => None
    }
    GraftConfig(extract, snowflake, destination)
  }

  // -- adapters into the engine types -------------------------------------

  def walkConfig(c: GraftConfig): WalkConfig = WalkConfig(
    factTable = c.snowflake.factTable,
    exclude = c.snowflake.exclude,
    referenceOnly = c.snowflake.referenceOnly,
    referenceAll = c.snowflake.referenceAll,
    addRelations = c.snowflake.addRelations,
    showForeignKeys = c.snowflake.showForeignKeys,
    nullValues = c.snowflake.nullValues)

  /** Extract driver config; `plan` from [[SchemaWalk.walk]], destination
    * overridable (the reference's S3 bucket vs a local path). */
  def extractConfig(c: GraftConfig, plan: SnowflakePlan, destination: String,
                    lastFile: Path): ExtractConfig = {
    val e = c.extract.getOrElse(
      throw new IllegalArgumentException("config has no extract section"))
    val timeField = e.types.zip(e.fields).collectFirst {
      case ("time", f) => f -> (e.batch.headOption match {
        case Some(s: String) => DurationUnit.parse(s)
        case _ => DurationUnit.Seconds(86400)
      })
    }
    val batchSize = e.batch.lastOption match {
      case Some(n: Long) => n
      case Some(n: java.math.BigInteger) => n.longValue
      case Some(d: Double) => d.toLong
      case _ => 1000L
    }
    val start = e.start.headOption match {
      case Some(s: String) => graft.jx.DateMath.parse(s).toInstant
      case Some(n: Long)   => java.time.Instant.ofEpochSecond(n)
      case _               => java.time.Instant.EPOCH
    }
    ExtractConfig(plan, timeField, idField = e.fields.last, batchSize = batchSize,
      start = start, destination = destination, lastFile = lastFile)
  }
}

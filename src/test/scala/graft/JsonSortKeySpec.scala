package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonMemKey

/**
 * Laws for the depth-UNBOUNDED memcomparable JSON sort key
 * (functions/JsonMemKey.scala) against the reference's recursive
 * value_compare semantics (vendor/jx_python/jx.py:560-627): the
 * unsigned byte order of the encodings must equal the recursive
 * comparison at every depth.
 *
 * The main law is PAIRWISE SIGN AGREEMENT on a seeded random corpus of
 * nested values up to depth 5: an independent reference comparator is
 * implemented here in the test (rank chain, IEEE numbers, UTF-8-binary
 * strings, elementwise-then-length lists, union-key object walk with
 * absent-reads-as-missing-sorts-last, null-valued entries dropped) and
 * every pair's compare sign must match the byte compare — including
 * equality ⟺ byte equality, which also pins the {a: null} == {} and
 * -0.0 == 0.0 laws exactly.
 */
class JsonSortKeySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")

  private val mapper = new ObjectMapper()
  private def enc(json: String): Array[Byte] =
    JsonMemKey.encode(if (json == null) null else UTF8String.fromString(json))
  private def byteCmp(a: Array[Byte], b: Array[Byte]): Int =
    Integer.signum(java.util.Arrays.compareUnsigned(a, b))

  // -- independent reference comparator over java-typed values ----------
  private def rank(v: Any): Int = v match {
    case null => 9
    case _: java.lang.Boolean => 0
    case _: java.lang.Double => 1
    case _: String => 2
    case _: java.util.List[_] => 3
    case _: java.util.Map[_, _] => 4
  }
  private def utf8Cmp(a: String, b: String): Int = Integer.signum(
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  private def refCmp(a: Any, b: Any): Int = {
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) Integer.compare(ra, rb)
    else a match {
      case null => 0
      case x: java.lang.Boolean => x.compareTo(b.asInstanceOf[java.lang.Boolean])
      case x: java.lang.Double =>
        // SQL equality for zeros, IEEE total order otherwise
        val y = b.asInstanceOf[java.lang.Double]
        java.lang.Double.compare(x + 0.0, y + 0.0)
      case x: String => utf8Cmp(x, b.asInstanceOf[String])
      case x: java.util.List[_] =>
        val y = b.asInstanceOf[java.util.List[_]]
        val n = math.min(x.size, y.size)
        var i = 0
        while (i < n) {
          val c = refCmp(x.get(i), y.get(i)); if (c != 0) return Integer.signum(c)
          i += 1
        }
        Integer.compare(x.size, y.size)
      case x: java.util.Map[_, _] =>
        // union-key walk: null-valued entries read as absent; the
        // absent side reads missing (rank 9, sorts last)
        val xm = x.asInstanceOf[java.util.Map[String, Any]]
        val ym = b.asInstanceOf[java.util.Map[String, Any]]
        def live(m: java.util.Map[String, Any]): Map[String, Any] = {
          import scala.jdk.CollectionConverters._
          m.asScala.filter(_._2 != null).toMap
        }
        val (lx, ly) = (live(xm), live(ym))
        val keys = (lx.keySet ++ ly.keySet).toSeq.sortWith(utf8Cmp(_, _) < 0)
        for (k <- keys) {
          val c = refCmp(lx.getOrElse(k, null), ly.getOrElse(k, null))
          if (c != 0) return Integer.signum(c)
        }
        0
    }
  }

  // -- seeded random nested-value generator ------------------------------
  private val strPool = Seq("", "a", "ab", "b", "click", "é", "δx", "a\u0000b")
  private val keyPool = Seq("a", "b", "k", "é", "zz")
  private def gen(r: scala.util.Random, depth: Int): Any =
    r.nextInt(if (depth == 0) 5 else 7) match {
      case 0 => java.lang.Boolean.valueOf(r.nextBoolean())
      case 1 => java.lang.Double.valueOf(math.floor(r.nextDouble() * 41 - 20) / 4.0)
      case 2 => strPool(r.nextInt(strPool.size))
      case 3 => null
      case 4 => java.lang.Double.valueOf(Seq(-0.0, 0.0, -1e308, 1e308, 1e-4)(r.nextInt(5)))
      case 5 =>
        val l = new java.util.ArrayList[Any]()
        (1 to r.nextInt(4)).foreach(_ => l.add(gen(r, depth - 1)))
        l
      case 6 =>
        val m = new java.util.LinkedHashMap[String, Any]()
        (1 to r.nextInt(4)).foreach(_ => m.put(keyPool(r.nextInt(keyPool.size)), gen(r, depth - 1)))
        m
    }

  test("pairwise sign agreement with the reference comparator, depth <= 5") {
    val r = new scala.util.Random(20260815L)
    val vals = (1 to 220).map(_ => gen(r, 5))
    val encs = vals.map(v => enc(mapper.writeValueAsString(v)))
    for (i <- vals.indices; j <- vals.indices) {
      val want = Integer.signum(refCmp(vals(i), vals(j)))
      val got = byteCmp(encs(i), encs(j))
      assert(got === want,
        s"order mismatch:\n  a=${mapper.writeValueAsString(vals(i))}" +
          s"\n  b=${mapper.writeValueAsString(vals(j))}\n  ref=$want enc=$got")
    }
  }

  test("TYPE_ORDER rank chain: bool < number < string < list < object < missing") {
    val chain = Seq("true", "1", "\"a\"", "[1]", "{\"a\":1}", "null")
    val ks = chain.map(enc)
    for (i <- ks.indices.dropRight(1))
      assert(byteCmp(ks(i), ks(i + 1)) < 0, s"${chain(i)} !< ${chain(i + 1)}")
  }

  test("object laws: {a:null} == {}, absent key sorts last, key byte order") {
    assert(byteCmp(enc("""{"a": null}"""), enc("{}")) === 0)
    // union walk at depth 1 and at depth 4: the side MISSING a key is GREATER
    assert(byteCmp(enc("""{"a":1}"""), enc("""{"a":1,"b":2}""")) > 0)
    assert(byteCmp(enc("""{"a":{"b":{"c":{"d":1}}}}"""),
      enc("""{"a":{"b":{"c":{"d":1,"e":0}}}}""")) > 0)
    // {} is greater than ANY non-empty object
    assert(byteCmp(enc("{}"), enc("""{"zz":{"zz":99}}""")) > 0)
    // key order is UTF-8 byte order
    assert(byteCmp(enc("""{"a":2}"""), enc("""{"b":1}""")) < 0)
  }

  test("list laws: elementwise then length, to depth 5") {
    assert(byteCmp(enc("[]"), enc("[1]")) < 0)
    assert(byteCmp(enc("[1,2]"), enc("[1,2,0]")) < 0) // prefix first
    assert(byteCmp(enc("[1,3]"), enc("[1,2,9]")) > 0) // elementwise beats length
    assert(byteCmp(enc("[[[[[1]]]]]"), enc("[[[[[1]]]],[[[[0]]]]]")) < 0)
    assert(byteCmp(enc("[[[[[2]]]]]"), enc("[[[[[1]]]],[[[[9]]]]]")) > 0)
    // null element reads as missing: after every real type
    assert(byteCmp(enc("[null]"), enc("[{\"a\":1}]")) > 0)
  }

  test("number and string edge laws") {
    assert(byteCmp(enc("-0.0"), enc("0.0")) === 0)
    assert(byteCmp(enc("-1"), enc("-0.5")) < 0)
    assert(byteCmp(enc("-0.5"), enc("0")) < 0)
    assert(byteCmp(enc("0"), enc("0.5")) < 0)
    assert(byteCmp(enc("-1e308"), enc("1e308")) < 0)
    assert(byteCmp(enc("\"a\""), enc("\"ab\"")) < 0)
    assert(byteCmp(enc("\"a\""), enc("\"a\\u0000\"")) < 0)
    assert(byteCmp(enc("\"a\\u0000b\""), enc("\"a\\u0001b\"")) < 0)
  }

  test("loose text sorts as a bare string; SQL NULL is missing") {
    // trailing-token strictness: a date does NOT half-parse as 2024
    assert(byteCmp(enc("2024-01-01"), enc("\"2024-01-01\"")) === 0)
    assert(byteCmp(enc("2024-01-01"), enc("99999")) > 0) // string rank, not number
    assert(byteCmp(enc(null), enc("null")) === 0)
  }

  test("nv byte key orders exactly like sortKeyNested3 on the depth-3 entry domain") {
    // the law that lets q_sort_cross_type_nested3 sort by the BINARY
    // key while the struct tier stays verified: both keys over the
    // same depth-3 values (the entry's exact 7-shape domain) must
    // induce the identical order, and equal structs ⟺ equal bytes
    val s = spark
    import org.apache.spark.sql.Column
    import graft.jx.TypedSlots
    val e = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    val m = col("event_id") % 7
    val half = (col("event_id") / 7).cast("long") % 2 === 0
    val fv = floor(col("value")).cast("double")
    val fv7 = (floor(col("value")) % 7).cast("double")
    val nElem = (x: Column) => struct(
      lit(null).cast("boolean").as("b"), x.cast("double").as("n"),
      lit(null).cast("string").as("s"))
    val l1 = (xs: Seq[Column]) => TypedSlots.nvOfList(array(xs.map(nElem): _*))
    val n2 = (x: Column) => TypedSlots.nv2OfScalar(TypedSlots.ofNumber(x))
    val l2of = (ls: Seq[Seq[Column]]) => TypedSlots.nv2OfList(array(ls.map(l1): _*))
    val o2list = (kvs: Seq[(String, Seq[Column])]) => TypedSlots.nv2OfObject(
      array(kvs.map { case (k, xs) =>
        struct(lit(k).as("k"), l1(xs).as("v")) }: _*))
    val s2 = (x: Column) => TypedSlots.nv2OfScalar(TypedSlots.ofString(x))
    val nv =
      when(m === 0, TypedSlots.nv3OfScalar(TypedSlots.ofNumber(col("value"))))
        .when(m === 1, TypedSlots.nv3OfScalar(TypedSlots.ofString(col("event_type"))))
        .when(m === 2, TypedSlots.nv3OfList(
          when(half, array(n2(fv))).otherwise(array(n2(fv), n2(fv7)))))
        .when(m === 3, TypedSlots.nv3OfList(
          when(half, array(l2of(Seq(Seq(fv)))))
            .otherwise(array(l2of(Seq(Seq(fv))), l2of(Seq(Seq(fv), Seq(fv, fv7)))))))
        .when(m === 4, TypedSlots.nv3OfList(
          when(half, array(o2list(Seq("a" -> Seq(fv)))))
            .otherwise(array(o2list(Seq("a" -> Seq(fv))), o2list(Seq("a" -> Seq(fv, fv7)))))))
        .when(m === 5, TypedSlots.nv3OfObject(
          when(half, array(struct(lit("a").as("k"), l2of(Seq(Seq(fv))).as("v"))))
            .otherwise(array(
              struct(lit("a").as("k"), l2of(Seq(Seq(fv), Seq(fv7))).as("v")),
              struct(lit("b").as("k"), s2(col("event_type")).as("v"))))))
        .otherwise(TypedSlots.nv3Missing)
    val both = e.select(col("event_id"), nv.as("__nv"))
      .select(col("event_id"),
        TypedSlots.sortKeyNested3(col("__nv")).as("__sk"),
        JsonMemKey.nvSortKey(col("__nv")).as("__bk"))
    val byStruct = both.orderBy(col("__sk"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val byBytes = both.orderBy(col("__bk"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(byStruct === byBytes)
    // equality agreement: grouping by either key yields the same classes
    val nStruct = both.groupBy("__sk").count().count()
    val nBytes = both.groupBy("__bk").count().count()
    assert(nStruct === nBytes)
  }

  test("nv byte key orders exactly like sortKeyNested2 on the depth-2 entry domain") {
    val s = spark
    import org.apache.spark.sql.Column
    import graft.jx.TypedSlots
    val e = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    val m = col("event_id") % 7
    val half = (col("event_id") / 7).cast("long") % 2 === 0
    val fv = floor(col("value")).cast("double")
    val fv7 = (floor(col("value")) % 7).cast("double")
    val nElem = (x: Column) => struct(
      lit(null).cast("boolean").as("b"), x.cast("double").as("n"),
      lit(null).cast("string").as("s"))
    val n1 = (x: Column) => TypedSlots.nvOfScalar(TypedSlots.ofNumber(x))
    val nList = (xs: Seq[Column]) => TypedSlots.nvOfList(array(xs.map(nElem): _*))
    val nObj = (kvs: Seq[(String, Column)]) => TypedSlots.nvOfObject(
      array(kvs.map { case (k, x) =>
        struct(lit(k).as("k"), nElem(x).as("v")) }: _*))
    val sV = (x: Column) => TypedSlots.nvOfScalar(TypedSlots.ofString(x))
    val nv =
      when(m === 0, TypedSlots.nv2OfScalar(TypedSlots.ofNumber(col("value"))))
        .when(m === 1, TypedSlots.nv2OfScalar(TypedSlots.ofString(col("event_type"))))
        .when(m === 2, TypedSlots.nv2OfList(
          when(half, array(n1(fv))).otherwise(array(n1(fv), n1(fv7)))))
        .when(m === 3, TypedSlots.nv2OfList(
          when(half, array(nList(Seq(fv))))
            .otherwise(array(nList(Seq(fv)), nList(Seq(fv, fv7))))))
        .when(m === 4, TypedSlots.nv2OfList(
          when(half, array(nObj(Seq("a" -> fv))))
            .otherwise(array(nObj(Seq("a" -> fv)), nObj(Seq("a" -> fv7))))))
        .when(m === 5, TypedSlots.nv2OfObject(
          when(half, array(struct(lit("a").as("k"), nList(Seq(fv)).as("v"))))
            .otherwise(array(
              struct(lit("a").as("k"), nList(Seq(fv)).as("v")),
              struct(lit("b").as("k"), sV(col("event_type")).as("v"))))))
        .otherwise(TypedSlots.nv2Missing)
    val both = e.select(col("event_id"), nv.as("__nv"))
      .select(col("event_id"),
        TypedSlots.sortKeyNested2(col("__nv")).as("__sk"),
        JsonMemKey.nvSortKey(col("__nv")).as("__bk"))
    val byStruct = both.orderBy(col("__sk"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val byBytes = both.orderBy(col("__bk"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(byStruct === byBytes)
    assert(both.groupBy("__sk").count().count() === both.groupBy("__bk").count().count())
  }

  test("nv byte key agrees with the JSON encoder on shared values") {
    // cross-encoder law: the two entry points into the same byte scheme
    // must emit IDENTICAL bytes for equivalent values
    val s = spark
    import graft.jx.TypedSlots
    val pairs = Seq(
      (TypedSlots.nv3OfScalar(TypedSlots.ofNumber(lit(3.5))), "3.5"),
      (TypedSlots.nv3OfScalar(TypedSlots.ofString(lit("ab"))), "\"ab\""),
      (TypedSlots.nv3OfScalar(TypedSlots.ofBoolean(lit(true))), "true"),
      (TypedSlots.nv3Missing, "null"),
      (TypedSlots.nv3OfList(array(
        TypedSlots.nv2OfScalar(TypedSlots.ofNumber(lit(1.0))),
        TypedSlots.nv2OfScalar(TypedSlots.ofNumber(lit(2.0))))), "[1,2]"),
      (TypedSlots.nv3OfObject(array(struct(lit("a").as("k"),
        TypedSlots.nv2OfScalar(TypedSlots.ofNumber(lit(1.0))).as("v")))), "{\"a\":1}"))
    val row = s.range(1)
    pairs.foreach { case (nvCol, json) =>
      val got = row.select(JsonMemKey.nvSortKey(nvCol).as("k"))
        .collect()(0).getAs[Array[Byte]]("k")
      assert(java.util.Arrays.equals(got, enc(json)),
        s"nv and JSON encodings differ for $json")
    }
  }

  test("jsonQuote: quotes and backslashes round-trip to the raw string's key") {
    // splicing jsonQuote(s) into JSON text must encode exactly like the
    // raw string value s — even when s contains the JSON metacharacters
    val s = spark
    import s.implicits._
    val samples = Seq("plain", "he said \"x\"", "back\\slash", "\\\"both\\\"", "")
    val got = samples.toDF("s")
      .select(JsonMemKey.jsonSortKey(JsonMemKey.jsonQuote(col("s"))).as("k"))
      .collect().map(_.getAs[Array[Byte]]("k"))
    samples.zip(got).foreach { case (raw, k) =>
      val want = JsonMemKey.encode(UTF8String.fromString(
        mapper.writeValueAsString(raw))) // Jackson-escaped JSON literal
      assert(java.util.Arrays.equals(k, want), s"jsonQuote broke on: $raw")
    }
  }

  test("Spark expression: codegen sort order matches, key is never null") {
    val s = spark
    import s.implicits._
    val rows = Seq("null", "{\"a\":[[1]]}", "[1,2]", "\"x\"", "3.5", "true",
      "[[1],[2]]", "{\"a\":[[1]],\"b\":2}", "{}")
    val df = rows.toDF("js")
      .select(col("js"), JsonMemKey.jsonSortKey(col("js")).as("k"))
    val sorted = df.orderBy(col("k")).select("js").as[String].collect().toSeq
    val want = rows.sortWith((a, b) => byteCmp(enc(a), enc(b)) < 0)
    assert(sorted === want)
    assert(df.where(col("k").isNull).count() === 0L)
    // plan contract on a non-local source (a local Seq constant-folds
    // the key away into a LocalTableScan)
    val ranged = s.range(0, 100)
      .select(concat(lit("[\""), col("id").cast("string"), lit("\"]")).as("js"))
      .select(JsonMemKey.jsonSortKey(col("js")).as("k"))
    val plan = ranged.orderBy(col("k")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_json_sort_key"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}

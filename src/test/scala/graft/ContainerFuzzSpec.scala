package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.container.FactStore
import graft.jx.JxExpr
import graft.jx.JxExpr._
import scala.util.Random

/** Model-based mutation fuzz for the container layer (r11 depth): a
  * seeded random sequence of insert / update / delete / upsert ops —
  * with generated JX predicates and set-expressions, and a mid-stream
  * schema evolution — runs against BOTH a FactStore (copy-on-write
  * snapshots on disk) and a trivial in-memory row model carrying the
  * reference semantics (insert_table.py's mutation surface). After
  * every op the store must equal the model; at the end every HISTORIC
  * version must equal the model's snapshot at that point (time travel
  * is content-addressed, not just readable), and vacuum must keep the
  * surviving versions byte-identical.
  *
  * The hand-enumerated lifecycle entries (q_container_lifecycle,
  * q_container_deep_update, q_container_time_travel) pin these
  * semantics pointwise; this spec walks 3 × 14-op random paths through
  * the same state machine, which is exactly where copy-on-write /
  * marker-advance / schema-evolution bugs hide (a wrong base version
  * picked up after delete, an evolution null-pad lost by upsert, ...).
  */
class ContainerFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("4")

  private type ModelRow = Map[String, Any] // null values stored as null

  /** JX truthy over a model row — the subset the generator emits.
    * Mirrors JxCompiler: eq decisive (null vs literal → false),
    * missing-inequality → false, boolean context missing → false. */
  private def truthy(row: ModelRow, p: JxExpr): Boolean = p match {
    case AndOp(ts) => ts.forall(truthy(row, _))
    case OrOp(ts)  => ts.exists(truthy(row, _))
    case NotOp(t)  => !truthy(row, t)
    case EqOp(Variable(n), Lit(v)) => row.getOrElse(n, null) == v
    case NeOp(Variable(n), Lit(v)) => row.getOrElse(n, null) != v
    case InequalityOp(op, Variable(n), Lit(v)) =>
      (row.getOrElse(n, null), v) match {
        case (null, _) => false
        case (a: Long, b: Long) => op match {
          case "gt" => a > b; case "gte" => a >= b
          case "lt" => a < b; case "lte" => a <= b
        }
        case other => fail(s"unexpected inequality operands: $other")
      }
    case MissingOp(Variable(n)) => row.getOrElse(n, null) == null
    case ExistsOp(Variable(n))  => row.getOrElse(n, null) != null
    case other => fail(s"model evaluator: outside the generated subset: $other")
  }

  /** The generated set-expression subset: literal, or strict add
    * (JX default nulls=false → null operand propagates). */
  private def evalSet(row: ModelRow, e: JxExpr): Any = e match {
    case Lit(v) => v
    case MultiOp("add", Seq(Variable(n), Lit(k: Long)), false, NullOp) =>
      row.getOrElse(n, null) match {
        case null    => null
        case a: Long => a + k
        case other   => fail(s"unexpected add operand: $other")
      }
    case other => fail(s"model evaluator: unexpected set expr: $other")
  }

  private val bPool = Seq("red", "green", "blue", "NO_2")

  private def genPred(rnd: Random, hasC: Boolean): JxExpr = {
    def leaf(): JxExpr = rnd.nextInt(6) match {
      case 0 => EqOp(Variable("id"), Lit(1L + rnd.nextInt(40).toLong))
      case 1 => InequalityOp(Seq("gt", "gte", "lt", "lte")(rnd.nextInt(4)),
        Variable("a"), Lit(rnd.nextInt(100).toLong))
      case 2 => EqOp(Variable("b"), Lit(bPool(rnd.nextInt(bPool.size))))
      case 3 => MissingOp(Variable(if (hasC && rnd.nextBoolean()) "c" else "b"))
      case 4 => ExistsOp(Variable("a"))
      case _ => NeOp(Variable("b"), Lit(bPool(rnd.nextInt(bPool.size))))
    }
    rnd.nextInt(10) match {
      case x if x < 4 => leaf()
      case x if x < 7 => AndOp(Seq(leaf(), leaf()))
      case x if x < 9 => OrOp(Seq(leaf(), leaf()))
      case _          => NotOp(leaf())
    }
  }

  private def genDoc(rnd: Random, withC: Boolean): ModelRow = {
    val base = Map[String, Any](
      "id" -> (1L + rnd.nextInt(40).toLong),
      "a"  -> (if (rnd.nextInt(7) == 0) null else rnd.nextInt(100).toLong),
      "b"  -> (if (rnd.nextInt(7) == 0) null else bPool(rnd.nextInt(bPool.size))))
    if (withC) base + ("c" -> (if (rnd.nextBoolean()) null
                               else rnd.nextInt(9).toLong))
    else base
  }

  private def schemaOf(cols: Seq[String]): StructType = StructType(cols.map {
    case "b" => StructField("b", StringType, nullable = true)
    case n   => StructField(n, LongType, nullable = true)
  })

  private def toDf(rows: Seq[ModelRow], cols: Seq[String]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        Row(cols.map(c => r.getOrElse(c, null)): _*)): _*),
      schemaOf(cols))

  private def canon(rows: Seq[Seq[(String, Any)]]): Seq[String] =
    rows.map(_.sortBy(_._1).map { case (k, v) =>
      s"$k=${if (v == null) "NULL" else v.toString}" }.mkString("|")).sorted

  private def storeLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
    canon(df.collect().toSeq.map(r =>
      df.columns.toSeq.map(c => c -> r.get(r.fieldIndex(c)))))

  private def modelLines(rows: Seq[ModelRow], cols: Seq[String]): Seq[String] =
    canon(rows.map(r => cols.map(c => c -> r.getOrElse(c, null))))

  test("mutation-sequence fuzz: FactStore equals the row model at every step and every version") {
    for (seed <- Seq(41L, 42L, 43L)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fuzz_$seed")
      val store = new FactStore(spark, s"fuzz$seed", dir)
      var model = Vector.empty[ModelRow]
      var cols = Vector("id", "a", "b")
      var hasC = false
      val snapshots = scala.collection.mutable.ArrayBuffer.empty[(Vector[ModelRow], Vector[String])]

      val nOps = 14
      for (step <- 0 until nOps) {
        // force an insert on an empty model; force the evolution insert
        // once mid-stream so c-bearing predicates/sets get exercised
        val op =
          if (model.isEmpty) 0
          else if (step == 5 && !hasC) 4
          else rnd.nextInt(5)
        op match {
          case 0 | 4 => // insert (4 = evolution insert carrying column c)
            val withC = op == 4 || hasC && rnd.nextBoolean()
            val docs = Seq.fill(1 + rnd.nextInt(3))(genDoc(rnd, withC))
            val docCols = if (withC) Vector("id", "a", "b", "c") else Vector("id", "a", "b")
            store.insert(toDf(docs, docCols))
            if (withC && !hasC) { hasC = true; cols = cols :+ "c" }
            model = model ++ docs.map(d => cols.map(c => c -> d.getOrElse(c, null)).toMap)
          case 1 => // update
            val pred = genPred(rnd, hasC)
            val (colName, expr): (String, JxExpr) = rnd.nextInt(4) match {
              case 0 => ("a", Lit(rnd.nextInt(100).toLong))
              case 1 => ("b", Lit(bPool(rnd.nextInt(bPool.size))))
              case 2 => ("a", MultiOp("add", Seq(Variable("a"),
                Lit(1L + rnd.nextInt(7).toLong)), nulls = false, NullOp))
              case _ => if (hasC) ("c", Lit(rnd.nextInt(9).toLong))
                        else ("a", Lit(rnd.nextInt(100).toLong))
            }
            store.update(JxExpr.jsonString(pred), Map(colName -> JxExpr.jsonString(expr)))
            model = model.map(r =>
              if (truthy(r, pred)) r + (colName -> evalSet(r, expr)) else r)
          case 2 => // delete
            val pred = genPred(rnd, hasC)
            store.delete(JxExpr.jsonString(pred))
            model = model.filterNot(truthy(_, pred))
          case _ => // upsert by id (distinct ids within the batch)
            val docs = Seq.fill(1 + rnd.nextInt(3))(genDoc(rnd, hasC))
              .groupBy(_("id")).values.map(_.head).toSeq
            store.upsert(toDf(docs, cols), "id")
            val ids = docs.map(_("id")).toSet
            model = model.filterNot(r => ids.contains(r("id"))) ++
              docs.map(d => cols.map(c => c -> d.getOrElse(c, null)).toMap)
        }
        snapshots += ((model, cols))
        val (got, want) = (storeLines(store.dataFrame), modelLines(model, cols))
        assert(got == want,
          s"seed $seed step $step op $op: store ${got.size} rows vs model ${want.size}\n" +
            s"store: ${got.take(3)}\nmodel: ${want.take(3)}")
      }

      // time travel: every version content-equals the model snapshot
      // taken right after the corresponding mutation
      val vs = store.versions
      assert(vs.size == nOps, s"seed $seed: ${vs.size} versions for $nOps mutations")
      for ((v, i) <- vs.zipWithIndex) {
        val (rows, colsAt) = snapshots(i)
        assert(storeLines(store.dataFrameAt(v)) == modelLines(rows, colsAt),
          s"seed $seed: version $v diverges from model snapshot $i")
      }

      // vacuum keeps the surviving tail readable and identical
      store.vacuum(keepLast = 3)
      val kept = store.versions
      assert(kept.size == 3 && kept.last == vs.last)
      for (v <- kept) {
        val (rows, colsAt) = snapshots(vs.indexOf(v))
        assert(storeLines(store.dataFrameAt(v)) == modelLines(rows, colsAt),
          s"seed $seed: post-vacuum version $v diverges")
      }
    }
  }
}

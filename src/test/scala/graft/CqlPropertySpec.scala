package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.cql.Cql
import graft.cql.Cql._

/** Randomized consistency check: for random CQL2 trees, the Column backend
  * and the SQL backend (executed by Spark over the same view) must select
  * identical row sets. (Cross-engine agreement of the SQL backend is
  * separately enforced by the a10-a15 DuckDB oracle gates.)
  */
class CqlPropertySpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def randOperandNum(r: Random): Operand =
    if (r.nextBoolean()) Num(math.floor(r.nextDouble() * 400 * 100) / 100)
    else IntNum(r.nextInt(200).toLong)

  private def randLeaf(r: Random): Cql = r.nextInt(7) match {
    case 0 => Cmp(Seq("=", "<>", "<", "<=", ">", ">=")(r.nextInt(6)),
      Prop("v"), randOperandNum(r))
    case 1 => Cmp(Seq("=", "<>")(r.nextInt(2)), Prop("c"),
      Str(Seq("click", "view", "o'brien")(r.nextInt(3))))
    case 2 => Like(Prop("c"), Seq("cl%", "%ew", "%i%")(r.nextInt(3)),
      ci = r.nextBoolean())
    case 3 => In(Prop("u"), Seq.fill(1 + r.nextInt(4))(IntNum(r.nextInt(20).toLong)))
    case 4 => Between(Prop("v"), Num(r.nextInt(100)), Num(100 + r.nextInt(300)))
    case 5 => IsNull(Prop("d"))
    case 6 => Cmp("<", Prop("u"), IntNum(r.nextInt(20).toLong))
  }

  private def randTree(r: Random, depth: Int): Cql =
    if (depth == 0) randLeaf(r)
    else r.nextInt(4) match {
      case 0 => And(Seq.fill(2 + r.nextInt(2))(randTree(r, depth - 1)))
      case 1 => Or(Seq.fill(2 + r.nextInt(2))(randTree(r, depth - 1)))
      case 2 => Not(randTree(r, depth - 1))
      case _ => randLeaf(r)
    }

  test("Column backend ≡ SQL backend on 200 random trees") {
    import s.implicits._
    val r = new Random(42)
    val rows = (0 until 500).map { i =>
      (i.toLong, Seq("click", "view", "o'brien", "xiew")(i % 4),
        math.floor(r.nextDouble() * 400 * 100) / 100, (i % 23).toLong,
        if (i % 7 == 0) null else s"s$i")
    }
    val df = rows.toDF("id", "c", "v", "u", "d")
    df.createOrReplaceTempView("cql_prop_t")

    (0 until 200).foreach { i =>
      val ast = randTree(r, 2)
      val viaColumn = df.where(ast.toColumn)
        .select("id").collect().map(_.getLong(0)).toSet
      val viaSql = s.sql(s"SELECT id FROM cql_prop_t WHERE ${ast.toSql}")
        .collect().map(_.getLong(0)).toSet
      assert(viaColumn == viaSql, s"tree #$i: ${ast.toSql}")
    }
  }

  test("interval predicates on 200 random intervals (open bounds, nulls): " +
      "backends agree; strict contains ⊆ intersects; opening a bound only widens") {
    import s.implicits._
    val r = new Random(7)
    def ts(day: Int) = f"2024-01-$day%02d 00:00:00"
    val rows = (0 until 300).map { i =>
      val a = 1 + r.nextInt(25)
      val b = a + r.nextInt(28 - a)
      (i.toLong,
        if (i % 11 == 0) null else ts(a),
        if (i % 13 == 0) null else ts(b))
    }
    val df = rows.toDF("id", "sd", "ed")
      .selectExpr("id", "CAST(sd AS TIMESTAMP) AS sd", "CAST(ed AS TIMESTAMP) AS ed")
    df.createOrReplaceTempView("cql_iv_t")
    (0 until 200).foreach { i =>
      // a well-formed query interval: lo <= hi when both are literals
      // (an unordered pair is an EMPTY interval, for which the
      // contains ⊆ intersects identity legitimately fails)
      val d1 = 1 + r.nextInt(27)
      val d2 = 1 + r.nextInt(27)
      val lo: Operand = if (r.nextInt(5) == 0) OpenBound else Ts(ts(math.min(d1, d2)))
      val hi: Operand = if (r.nextInt(5) == 0) OpenBound else Ts(ts(math.max(d1, d2)))
      def run(ast: Cql): Set[Long] = {
        val viaColumn = df.where(ast.toColumn)
          .select("id").collect().map(_.getLong(0)).toSet
        val viaSql = s.sql(s"SELECT id FROM cql_iv_t WHERE ${ast.toSql}")
          .collect().map(_.getLong(0)).toSet
        assert(viaColumn == viaSql, s"#$i backends disagree: ${ast.toSql}")
        viaColumn
      }
      val inter = run(TIntervalPred("t_intersects", Prop("sd"), Prop("ed"), lo, hi))
      val cont = run(TIntervalPred("t_contains", Prop("sd"), Prop("ed"), lo, hi))
      assert(cont.subsetOf(inter), s"#$i contains ⊄ intersects")
      // opening either bound is monotone for t_intersects
      val wider = run(TIntervalPred("t_intersects", Prop("sd"), Prop("ed"), OpenBound, hi))
      assert(inter.subsetOf(wider), s"#$i opening lo shrank t_intersects")
      // 3VL: with BOTH query bounds closed every conjunct references a
      // row column, so a null-interval row can never be claimed. (An open
      // bound folds its conjunct to TRUE — the null column is then
      // legitimately unreferenced, and such rows MAY match.)
      if (lo != OpenBound && hi != OpenBound) {
        val nullIds = rows.filter(t => t._2 == null || t._3 == null).map(_._1).toSet
        assert(inter.intersect(nullIds).isEmpty, s"#$i claimed a null-interval row")
      }
    }
  }
}

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
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cql.Cql
import graft.cql.Cql._

class CqlSpec extends AnyFunSuite {

  test("parses comparison ops to AST and SQL") {
    val ast = Cql.parseJson("""{">=":[{"property":"value"},50.25]}""")
    assert(ast == Cmp(">=", Prop("value"), Num(50.25)))
    assert(ast.toSql == "value >= 50.25")
  }

  test("parses and/or/not trees, not accepts array or node form") {
    val a = Cql.parseJson(
      """{"and":[{"=":[{"property":"c"},"x"]},{"not":[{"<":[{"property":"v"},1]}]}]}""")
    assert(a.toSql == "(c = 'x' AND NOT (v < 1))")
    val b = Cql.parseJson("""{"not":{"=":[{"property":"c"},"x"]}}""")
    assert(b.toSql == "NOT (c = 'x')")
  }

  test("like / ilike / in / between / isNull") {
    assert(Cql.parseJson("""{"like":[{"property":"p"},"ab%"]}""").toSql == "p LIKE 'ab%'")
    assert(Cql.parseJson("""{"ilike":[{"property":"p"},"AB%"]}""").toSql ==
      "LOWER(p) LIKE 'ab%'")
    assert(Cql.parseJson("""{"in":[{"property":"u"},[1,2]]}""").toSql == "u IN (1, 2)")
    assert(Cql.parseJson("""{"between":[{"property":"v"},1.5,2.5]}""").toSql ==
      "v BETWEEN 1.5 AND 2.5")
    assert(Cql.parseJson("""{"isNull":{"property":"d"}}""").toSql == "d IS NULL")
    assert(Cql.parseJson("""{"isNull":[{"property":"d"}]}""").toSql == "d IS NULL")
  }

  test("string values escaped in SQL backend") {
    assert(Cmp("=", Prop("s"), Str("o'brien")).toSql == "s = 'o''brien'")
  }

  test("unknown operator rejected") {
    assertThrows[IllegalArgumentException] {
      Cql.parseJson("""{"regex":[{"property":"p"},"x"]}""")
    }
  }

  test("Column backend filters rows identically to semantics") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((1L, "click", 10.0), (2L, "view", 150.0), (3L, "click", 200.0))
      .toDF("id", "c", "v")
    val ast = Cql.parseJson(
      """{"and":[{"=":[{"property":"c"},"click"]},{">":[{"property":"v"},100.0]}]}""")
    val ids = df.where(ast.toColumn).select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.search.{SearchParams, SortBy, StacApi}

class StacApiSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("full search: collections + bbox + datetime + cql2 filter agree with a direct plan") {
    val p = SearchParams(
      collections = Seq("click", "view"),
      bbox = Some((-120.5, -60.5, 120.5, 60.5)),
      datetime = Some("2024-01-05 00:00:00/2024-01-28 00:00:00"),
      filter = Some("""{">=":[{"property":"value"},50.0]}"""),
      limit = 1000)
    val got = StacApi.search(s, sf, p)
    val expected = Tables.items(s, sf)
      .where(col("collection").isin("click", "view"))
      .where(graft.search.StacSearch.dtRange("2024-01-05 00:00:00", "2024-01-28 00:00:00"))
      .where(col("lon") >= -120.5 && col("lon") <= 120.5 &&
        col("lat") >= -60.5 && col("lat") <= 60.5)
      .where(col("value") >= 50.0)
      .count()
    assert(got.numMatched == expected)
    assert(got.items.length == expected.min(1000).toInt)
    assert(got.nextToken.isEmpty)
  }

  test("keyset pagination walks the whole result exactly once, in order") {
    val p0 = SearchParams(collections = Seq("click"),
      sortBy = Seq(SortBy("properties.value", desc = true)), limit = 7)
    var token: Option[String] = None
    var seen = Vector.empty[Long]
    var pages = 0
    var matched = -1L
    var done = false
    while (!done) {
      val r = StacApi.search(s, sf, p0.copy(token = token))
      matched = r.numMatched
      seen = seen ++ r.items.map(row => row.getLong(row.fieldIndex("id")))
      pages += 1
      token = r.nextToken
      done = token.isEmpty
      assert(pages < 200) // safety
    }
    assert(token.isEmpty)
    assert(seen.length == matched)
    assert(seen.distinct.length == seen.length, "no row visited twice")
    // order check: value desc, id asc — recompute expected
    val expected = Tables.items(s, sf).where(col("collection") === "click")
      .orderBy(col("value").desc, col("id"))
      .select("id").collect().map(_.getLong(0)).toVector
    assert(seen == expected)
  }

  test("offset tokens paginate identically to keyset") {
    val base = SearchParams(collections = Seq("view"), limit = 11)
    val viaOffset = Iterator.iterate(Option("off:0"): Option[String]) { tk =>
      StacApi.search(s, sf, base.copy(token = tk)).nextToken
    }.takeWhile(_.isDefined).flatMap { tk =>
      StacApi.search(s, sf, base.copy(token = tk)).items.map(r => r.getLong(r.fieldIndex("id")))
    }.toVector
    val viaKeyset = {
      var token: Option[String] = None
      var out = Vector.empty[Long]
      var first = true
      while (first || token.isDefined) {
        first = false
        val r = StacApi.search(s, sf, base.copy(token = token))
        out ++= r.items.map(row => row.getLong(row.fieldIndex("id")))
        token = r.nextToken
      }
      out
    }
    assert(viaOffset == viaKeyset)
  }

  test("datetime single-instant and open ranges parse to reference semantics") {
    val exact = StacApi.search(s, sf, SearchParams(datetime = Some("2024-01-15 12:00:00"), limit = 5))
    assert(exact.numMatched >= 0)
    val open = StacApi.search(s, sf, SearchParams(datetime = Some("2024-01-25 00:00:00/.."), limit = 5))
    val openEnd = StacApi.search(s, sf, SearchParams(datetime = Some("../2024-01-05 00:00:00"), limit = 5))
    assert(open.numMatched > 0 && openEnd.numMatched > 0)
    assertThrows[IllegalArgumentException] {
      StacApi.search(s, sf, SearchParams(datetime = Some("a/b/c")))
    }
  }

  test("ids + intersects + sort-field resolution") {
    val hex = Array(80.137, 10.223, 50.139, 55.177, -9.861, 55.177,
      -39.859, 10.223, -9.861, -34.731, 50.139, -34.731)
    val r = StacApi.search(s, sf, SearchParams(intersects = Some(hex), limit = 10_000))
    assert(r.numMatched > 0)
    val ids = StacApi.search(s, sf, SearchParams(ids = Seq(1L, 2L, 3L)))
    assert(ids.numMatched <= 3 && ids.numMatched > 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("dot_product and point_in_polygon usable from SQL after registration") {
    GraftFunctions.register(s)
    val d = s.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val inside = s.sql(
      "SELECT point_in_polygon(5.0d, 5.0d, array(0d,0d, 10d,0d, 10d,10d, 0d,10d)) AS p")
      .collect()(0).getBoolean(0)
    val outside = s.sql(
      "SELECT point_in_polygon(15.0d, 5.0d, array(0d,0d, 10d,0d, 10d,10d, 0d,10d)) AS p")
      .collect()(0).getBoolean(0)
    assert(inside && !outside)
  }

  test("point_in_polygon rejects a non-literal ring") {
    GraftFunctions.register(s)
    assertThrows[Exception] {
      s.sql("SELECT point_in_polygon(1.0d, 1.0d, array(rand(), rand())) AS p").collect()
    }
  }

  test("RollingHash kernel ≡ the interpreted HOF fold on real data") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
    val both = docs.select(
      graft.functions.RollingHash(col("text")).as("k"),
      expr(graft.ops.TextAnalysis.rollSpark).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0)
    assert(both.count() > 0)
  }

  test("extensions class wires the same builders") {
    assert(GraftFunctions.builders.map(_._1).toSet ==
      Set("dot_product", "point_in_polygon"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }
}

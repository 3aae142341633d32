package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.spatial.Geo

class GeoSpec extends AnyFunSuite {

  test("rayCast unit: square membership") {
    val sq = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)
    assert(Geo.rayCast(5.0, 5.0, sq))
    assert(!Geo.rayCast(15.0, 5.0, sq))
    assert(!Geo.rayCast(-1.0, -1.0, sq))
  }

  test("envelope") {
    val tri = Array(0.0, 1.0, 4.0, -2.0, 2.0, 5.0)
    assert(Geo.envelope(tri) == ((0.0, -2.0, 4.0, 5.0)))
  }

  test("codegen'd PointInPolygon agrees with half-plane convex form on data") {
    val s = TestSpark.spark
    val items = Tables.items(s, TestSpark.sf)
    val hex = Array(80.137, 10.223, 50.139, 55.177, -9.861, 55.177,
      -39.859, 10.223, -9.861, -34.731, 50.139, -34.731)
    val viaRayCast = items
      .where(Geo.intersectsPolygon(col("lon"), col("lat"), hex))
      .select("id").collect().map(_.getLong(0)).toSet
    val viaHalfPlanes = items
      .where(Geo.convexIntersectsColumn(col("lon"), col("lat"), hex))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaRayCast == viaHalfPlanes)
    assert(viaRayCast.nonEmpty)
  }

  test("non-convex polygon: ray cast handles concavity") {
    // L-shape: point in the notch is OUTSIDE
    val l = Array(0.0, 0.0, 10.0, 0.0, 10.0, 4.0, 4.0, 4.0, 4.0, 10.0, 0.0, 10.0)
    assert(Geo.rayCast(2.0, 8.0, l))   // in the vertical arm
    assert(Geo.rayCast(8.0, 2.0, l))   // in the horizontal arm
    assert(!Geo.rayCast(8.0, 8.0, l))  // in the notch
  }
}

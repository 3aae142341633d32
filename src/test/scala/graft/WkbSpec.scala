package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.{Geo, Shape, Wkb}

class WkbSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("decodes the canonical little-endian POINT(1 2) hex vector") {
    // 01 (NDR) 01000000 (Point) x=1.0 y=2.0 — standard WKB example bytes
    val b = hex("0101000000 000000000000F03F 0000000000000040")
    assert(Wkb.geomType(b) == "Point")
    assert(Wkb.envelope(b).toSeq == Seq(1.0, 2.0, 1.0, 2.0))
    assert(Wkb.numPoints(b) == 1)
    assert(Wkb.toGeoJson(b) == """{"type":"Point","coordinates":[1.0,2.0]}""")
  }

  test("decodes a big-endian (XDR) point") {
    val b = hex("00 00000001 3FF0000000000000 4000000000000000")
    assert(Wkb.geomType(b) == "Point")
    assert(Wkb.envelope(b).toSeq == Seq(1.0, 2.0, 1.0, 2.0))
  }

  test("encode → decode round-trips every shape kind") {
    val shapes: Seq[Shape] = Seq(
      Shape.PointS(1.5, -2.5),
      Shape.MultiPointS(Array(0.0, 1.0, 2.0, 3.0)),
      Shape.LinesS(Array(Array(0.0, 0.0, 10.0, 10.0))),
      Shape.LinesS(Array(Array(0.0, 0.0, 10.0, 10.0), Array(5.0, 0.0, 5.0, 9.0))),
      Shape.PolyS(Array(Array(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)))),
      Shape.PolyS(Array(
        Array(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0),
          Array(2.0, 2.0, 4.0, 2.0, 4.0, 4.0, 2.0, 4.0)),
        Array(Array(20.0, 20.0, 30.0, 20.0, 30.0, 30.0)))),
      Shape.CollS(Array(Shape.PointS(7.0, 8.0),
        Shape.LinesS(Array(Array(0.0, 0.0, 1.0, 1.0))))))
    shapes.foreach { s =>
      val round = Wkb.toShape(Wkb.encode(s))
      // structural equality via re-encode (arrays don't == structurally)
      assert(Wkb.encode(round).toSeq == Wkb.encode(s).toSeq, s"round-trip of $s")
    }
  }

  test("expected WKB type codes and GeoJSON type names") {
    assert(Wkb.geomType(Wkb.encode(Shape.MultiPointS(Array(1.0, 2.0)))) == "MultiPoint")
    assert(Wkb.geomType(Wkb.encode(Shape.LinesS(Array(Array(0.0, 0.0, 1.0, 1.0))))) == "LineString")
    assert(Wkb.geomType(Wkb.encode(
      Shape.LinesS(Array(Array(0.0, 0.0, 1.0, 1.0), Array(2.0, 2.0, 3.0, 3.0))))) == "MultiLineString")
    assert(Wkb.geomType(Wkb.boxBytes(0, 0, 1, 1)) == "Polygon")
    assert(Wkb.geomType(Wkb.encode(Shape.PolyS(Array(
      Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0)),
      Array(Array(2.0, 2.0, 3.0, 2.0, 3.0, 3.0)))))) == "MultiPolygon")
    assert(Wkb.geomType(Wkb.encode(Shape.CollS(Array(Shape.PointS(0, 0))))) == "GeometryCollection")
  }

  test("envelope and numPoints over nested geometry") {
    val coll = Shape.CollS(Array(
      Shape.PointS(-5.0, 40.0),
      Shape.PolyS(Array(Array(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0))))))
    val b = Wkb.encode(coll)
    assert(Wkb.envelope(b).toSeq == Seq(-5.0, 0.0, 10.0, 40.0))
    // 1 point + closed box ring (5 vertices as stored)
    assert(Wkb.numPoints(b) == 6)
  }

  test("decoded Shape drives the intersects kernels") {
    val box = Wkb.toShape(Wkb.boxBytes(0, 0, 10, 10))
    assert(Geo.pointIntersectsShape(5.0, 5.0, box))
    assert(!Geo.pointIntersectsShape(15.0, 5.0, box))
    assert(Geo.boxIntersectsShape(8.0, 8.0, 12.0, 12.0, box))
    assert(!Geo.boxIntersectsShape(11.0, 11.0, 12.0, 12.0, box))
  }

  test("toGeoJson renders polygons with closed rings and collections recursively") {
    val g = Wkb.toGeoJson(Wkb.boxBytes(0, 0, 1, 2))
    assert(g == """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,2.0],[0.0,2.0],[0.0,0.0]]]}""")
    val c = Wkb.toGeoJson(Wkb.encode(Shape.CollS(Array(Shape.PointS(1.0, 2.0)))))
    assert(c == """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1.0,2.0]}]}""")
  }
}

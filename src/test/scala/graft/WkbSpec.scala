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

  test("a95 constructors: linePathBytes / collectBytes build real WKB that " +
      "round-trips, and container type mismatches refuse") {
    val line = Wkb.linePathBytes(Array(0.0, 0.0, 2.0, 2.0, 4.0, 0.0))
    assert(Wkb.geomType(line) == "LineString")
    assert(Wkb.envelope(line).toSeq == Seq(0.0, 0.0, 4.0, 2.0))
    assert(Wkb.numPoints(line) == 3)

    val mp = Wkb.collectBytes(4,
      Array(Wkb.pointBytes(1, 2), Wkb.pointBytes(3, 4)))
    assert(Wkb.geomType(mp) == "MultiPoint")
    assert(Wkb.toShape(mp).asInstanceOf[Shape.MultiPointS].pts.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0))

    val ml = Wkb.collectBytes(5, Array(
      Wkb.linePathBytes(Array(0.0, 0.0, 1.0, 1.0)),
      Wkb.linePathBytes(Array(2.0, 2.0, 3.0, 3.0))))
    assert(Wkb.geomType(ml) == "MultiLineString")
    assert(Wkb.numPoints(ml) == 4)

    val gc = Wkb.collectBytes(7,
      Array(Wkb.pointBytes(9, 9), Wkb.linePathBytes(Array(0.0, 0.0, 1.0, 0.0))))
    assert(Wkb.geomType(gc) == "GeometryCollection")
    assert(Wkb.envelope(gc).toSeq == Seq(0.0, 0.0, 9.0, 9.0))

    // MultiPoint holding a LineString refuses (typed, not silent)
    intercept[IllegalArgumentException] {
      Wkb.collectBytes(4, Array(Wkb.linePathBytes(Array(0.0, 0.0, 1.0, 1.0))))
    }
    intercept[IllegalArgumentException] {
      Wkb.collectBytes(2, Array.empty[Array[Byte]])
    }
  }

  test("a95 kernel: non-areal footprints take the DE-9IM composites vs an " +
      "areal shape — hand anchors") {
    import graft.spatial.Geo.{RelCrosses, RelIntersects, RelTouches, RelWithin}
    val sq = Shape.PolyS(Array(Array(Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0))))
    def r(b: Array[Byte], rel: Int): Boolean = Geo.wkbRelShape(b, sq, rel)

    val inside = Wkb.linePathBytes(Array(1.0, 1.0, 5.0, 5.0, 9.0, 1.0))
    assert(r(inside, RelIntersects) && r(inside, RelWithin))
    assert(!r(inside, RelCrosses) && !r(inside, RelTouches))

    val through = Wkb.linePathBytes(Array(-5.0, 5.0, 15.0, 5.0))
    assert(r(through, RelIntersects) && r(through, RelCrosses))
    assert(!r(through, RelWithin) && !r(through, RelTouches))

    // along the boundary edge: contact, no interior contact — touches,
    // and NOT within (OGC: interiors must meet)
    val onEdge = Wkb.linePathBytes(Array(2.0, 0.0, 8.0, 0.0))
    assert(r(onEdge, RelTouches) && r(onEdge, RelIntersects))
    assert(!r(onEdge, RelWithin) && !r(onEdge, RelCrosses))

    val away = Wkb.linePathBytes(Array(20.0, 20.0, 30.0, 30.0))
    assert(!r(away, RelIntersects))

    // MultiPoint: some in, some out → crosses; all on boundary → touches
    val mixed = Wkb.collectBytes(4,
      Array(Wkb.pointBytes(5, 5), Wkb.pointBytes(50, 50)))
    assert(r(mixed, RelCrosses) && !r(mixed, RelWithin))
    val boundaryPts = Wkb.collectBytes(4,
      Array(Wkb.pointBytes(0, 5), Wkb.pointBytes(10, 5)))
    assert(r(boundaryPts, RelTouches) && !r(boundaryPts, RelWithin))

    // GeometryCollection: point inside + line inside → within
    val gcIn = Wkb.collectBytes(7,
      Array(Wkb.pointBytes(2, 2), Wkb.linePathBytes(Array(3.0, 3.0, 4.0, 4.0))))
    assert(r(gcIn, RelWithin))
    // point outside poisons within, keeps intersects
    val gcOut = Wkb.collectBytes(7,
      Array(Wkb.pointBytes(50, 50), Wkb.linePathBytes(Array(3.0, 3.0, 4.0, 4.0))))
    assert(r(gcOut, RelIntersects) && !r(gcOut, RelWithin) && r(gcOut, RelCrosses))

    // dimensionally impossible relations refuse; non-areal targets refuse
    intercept[IllegalArgumentException] { r(inside, Geo.RelContains) }
    intercept[IllegalArgumentException] {
      Geo.wkbRelShape(inside, Shape.PointS(1.0, 1.0), RelIntersects)
    }
  }
}

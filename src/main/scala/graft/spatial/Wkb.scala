package graft.spatial

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WKB (well-known binary) geometry codec — the reference's actual row
  * storage: GeoParquet carries WKB blobs that `stac_fastapi` decodes to
  * GeoJSON on output (utilities.py:13-22, 139-147). Graft ingests a WKB
  * binary column by deriving the plain numeric envelope columns the whole
  * spatial design keys on (pushdown-able ranges), and serializes any
  * geometry back to GeoJSON — both as codegen'd Catalyst expressions, so
  * a 100 TB ingest is one whole-stage-codegen scan, no UDF boxing.
  *
  * Supports the seven OGC 2D types, both byte orders.
  */
object Wkb {

  // ------------------------------------------------------------- decode
  /** Internal parse tree mirroring WKB structure (rings kept as read,
    * including the closure vertex).
    */
  private sealed trait G
  private final case class GPoint(x: Double, y: Double) extends G
  private final case class GLine(pts: Array[Double]) extends G
  private final case class GPoly(rings: Array[Array[Double]]) extends G
  /** typ ∈ 4 (MultiPoint), 5 (MultiLineString), 6 (MultiPolygon),
    * 7 (GeometryCollection).
    */
  private final case class GMulti(typ: Int, parts: Array[G]) extends G

  private def readHeader(buf: ByteBuffer): Int = {
    val bo = buf.get()
    buf.order(if (bo == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.getInt()
  }

  private def readFlat(buf: ByteBuffer): Array[Double] = {
    val n = buf.getInt()
    val a = new Array[Double](2 * n)
    var i = 0
    while (i < 2 * n) { a(i) = buf.getDouble(); i += 1 }
    a
  }

  private def parse(buf: ByteBuffer): G = {
    val typ = readHeader(buf)
    typ match {
      case 1 => GPoint(buf.getDouble(), buf.getDouble())
      case 2 => GLine(readFlat(buf))
      case 3 =>
        val n = buf.getInt()
        GPoly(Array.fill(n)(readFlat(buf)))
      case 4 | 5 | 6 | 7 =>
        val n = buf.getInt()
        GMulti(typ, Array.fill(n)(parse(buf)))
      case other =>
        throw new IllegalArgumentException(s"unsupported WKB geometry type: $other")
    }
  }

  private def parse(b: Array[Byte]): G = parse(ByteBuffer.wrap(b))

  private val typeNames = Map(1 -> "Point", 2 -> "LineString", 3 -> "Polygon",
    4 -> "MultiPoint", 5 -> "MultiLineString", 6 -> "MultiPolygon",
    7 -> "GeometryCollection")

  /** Top-level GeoJSON type name of a WKB blob (header read only). */
  def geomType(b: Array[Byte]): String = {
    val buf = ByteBuffer.wrap(b)
    val typ = readHeader(buf)
    typeNames.getOrElse(typ,
      throw new IllegalArgumentException(s"unsupported WKB geometry type: $typ"))
  }

  /** Envelope [xmin, ymin, xmax, ymax]. Static — called from generated
    * code via [[WkbEnvelope]].
    */
  def envelope(b: Array[Byte]): Array[Double] = {
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    def pt(x: Double, y: Double): Unit = {
      if (x < xmin) xmin = x; if (x > xmax) xmax = x
      if (y < ymin) ymin = y; if (y > ymax) ymax = y
    }
    def flat(a: Array[Double]): Unit = {
      var i = 0
      while (i < a.length) { pt(a(i), a(i + 1)); i += 2 }
    }
    def walk(g: G): Unit = g match {
      case GPoint(x, y)    => pt(x, y)
      case GLine(ps)       => flat(ps)
      case GPoly(rings)    => rings.foreach(flat)
      case GMulti(_, parts) => parts.foreach(walk)
    }
    walk(parse(b))
    Array(xmin, ymin, xmax, ymax)
  }

  /** Total vertex count (closure vertices included, as stored). */
  def numPoints(b: Array[Byte]): Int = {
    def count(g: G): Int = g match {
      case _: GPoint       => 1
      case GLine(ps)       => ps.length / 2
      case GPoly(rings)    => rings.map(_.length / 2).sum
      case GMulti(_, parts) => parts.map(count).sum
    }
    count(parse(b))
  }

  /** WKB → GeoJSON text (the reference's output decode path,
    * utilities.py:139-147).
    */
  def toGeoJson(b: Array[Byte]): String = {
    def num(d: Double): String =
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString + ".0"
      else d.toString
    def flat(a: Array[Double]): String =
      a.grouped(2).map { case Array(x, y) => s"[${num(x)},${num(y)}]" }
        .mkString("[", ",", "]")
    def coords(g: G): String = g match {
      case GPoint(x, y) => s"[${num(x)},${num(y)}]"
      case GLine(ps)    => flat(ps)
      case GPoly(rings) => rings.map(flat).mkString("[", ",", "]")
      case GMulti(_, parts) => parts.map(coords).mkString("[", ",", "]")
    }
    def render(g: G): String = g match {
      case GMulti(7, parts) =>
        s"""{"type":"GeometryCollection","geometries":[${parts.map(render).mkString(",")}]}"""
      case GMulti(t, _) => s"""{"type":"${typeNames(t)}","coordinates":${coords(g)}}"""
      case GPoint(_, _) => s"""{"type":"Point","coordinates":${coords(g)}}"""
      case GLine(_)     => s"""{"type":"LineString","coordinates":${coords(g)}}"""
      case GPoly(_)     => s"""{"type":"Polygon","coordinates":${coords(g)}}"""
    }
    render(parse(b))
  }

  /** WKB → the [[Shape]] ADT (for running the intersects kernels over
    * ingested geometry). Closure vertices are dropped to match the open
    * ring form.
    */
  def toShape(b: Array[Byte]): Shape = {
    def open(ring: Array[Double]): Array[Double] = {
      val n = ring.length
      if (n >= 4 && ring(0) == ring(n - 2) && ring(1) == ring(n - 1))
        ring.take(n - 2)
      else ring
    }
    def conv(g: G): Shape = g match {
      case GPoint(x, y) => Shape.PointS(x, y)
      case GLine(ps)    => Shape.LinesS(Array(ps))
      case GPoly(rings) => Shape.PolyS(Array(rings.map(open)))
      case GMulti(4, parts) =>
        Shape.MultiPointS(parts.flatMap {
          case GPoint(x, y) => Array(x, y)
          case other => throw new IllegalArgumentException(s"MultiPoint holding $other")
        })
      case GMulti(5, parts) =>
        Shape.LinesS(parts.map {
          case GLine(ps) => ps
          case other => throw new IllegalArgumentException(s"MultiLineString holding $other")
        })
      case GMulti(6, parts) =>
        Shape.PolyS(parts.map {
          case GPoly(rings) => rings.map(open)
          case other => throw new IllegalArgumentException(s"MultiPolygon holding $other")
        })
      case GMulti(_, parts) => Shape.CollS(parts.map(conv))
    }
    conv(parse(b))
  }

  // ------------------------------------------------------------- encode
  /** Encode a [[Shape]] as little-endian WKB (closure vertices added back
    * to polygon rings). Single-element LinesS/PolyS encode as
    * LineString/Polygon; multi-element as their Multi* types.
    */
  def encode(s: Shape): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v)
    def u32(v: Int): Unit = {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      out.write(bb.array())
    }
    def f64(v: Double): Unit = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v)
      out.write(bb.array())
    }
    def header(typ: Int): Unit = { u8(1); u32(typ) }
    def flat(a: Array[Double]): Unit = {
      u32(a.length / 2)
      a.foreach(f64)
    }
    def closedRing(open: Array[Double]): Array[Double] =
      open ++ Array(open(0), open(1))
    def poly(rings: Array[Array[Double]]): Unit = {
      u32(rings.length)
      rings.foreach(r => flat(closedRing(r)))
    }
    def enc(s: Shape): Unit = s match {
      case Shape.PointS(x, y) => header(1); f64(x); f64(y)
      case Shape.MultiPointS(ps) =>
        header(4); u32(ps.length / 2)
        ps.grouped(2).foreach { case Array(x, y) => header(1); f64(x); f64(y) }
      case Shape.LinesS(paths) if paths.length == 1 => header(2); flat(paths(0))
      case Shape.LinesS(paths) =>
        header(5); u32(paths.length)
        paths.foreach { p => header(2); flat(p) }
      case Shape.PolyS(geom) if geom.length == 1 => header(3); poly(geom(0))
      case Shape.PolyS(geom) =>
        header(6); u32(geom.length)
        geom.foreach { p => header(3); poly(p) }
      case Shape.CollS(parts) =>
        header(7); u32(parts.length)
        parts.foreach(enc)
    }
    enc(s)
    out.toByteArray
  }

  /** Point WKB. Static — called from generated code via [[WkbPoint]]. */
  def pointBytes(x: Double, y: Double): Array[Byte] =
    encode(Shape.PointS(x, y))

  /** Axis-aligned-box Polygon WKB (closed 5-vertex CCW ring). Static —
    * called from generated code via [[WkbBox]].
    */
  def boxBytes(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    encode(Shape.PolyS(Array(Array(Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax)))))

  /** Flat open ring [x0,y0,x1,y1,…] → single-ring Polygon WKB (closure
    * vertex appended by the encoder). Static — called from generated
    * code via [[WkbRingPoly]]; the a88 rotated-footprint ingest path.
    */
  def ringBytes(flat: Array[Double]): Array[Byte] =
    encode(Shape.PolyS(Array(Array(flat))))

  /** Flat open polyline [x0,y0,x1,y1,…] → LineString WKB. Static —
    * called from generated code via [[WkbLinePath]]; synthesizes the
    * reference's non-areal storage rows (utilities.py:13-22 round-trips
    * every OGC type) for the a95 fixtures.
    */
  def linePathBytes(flat: Array[Double]): Array[Byte] =
    encode(Shape.LinesS(Array(flat)))

  /** Assemble a Multi* / GeometryCollection WKB from part WKBs: header +
    * count + the parts verbatim (each part keeps its own byte-order
    * header, as the recursive parse expects). Part types are validated
    * against the container (MultiPoint holds Points, MultiLineString
    * LineStrings, MultiPolygon Polygons; a GeometryCollection holds
    * anything). Static — called from generated code via [[WkbCollect]].
    */
  def collectBytes(typ: Int, parts: Array[Array[Byte]]): Array[Byte] = {
    require(typ >= 4 && typ <= 7, s"not a multi/collection WKB type: $typ")
    parts.foreach { p =>
      val pt = readHeader(ByteBuffer.wrap(p))
      if (typ != 7 && pt != typ - 3) throw new IllegalArgumentException(
        s"${typeNames(typ)} holding a ${typeNames.getOrElse(pt, pt.toString)}")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(1)
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(typ).putInt(parts.length)
    out.write(bb.array())
    parts.foreach(out.write)
    out.toByteArray
  }

  def collectBytes(typ: Int,
                   parts: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] =
    collectBytes(typ, parts.toObjectArray(BinaryType).map(_.asInstanceOf[Array[Byte]]))

  // ------------------------------------- UTF8String wrappers for codegen
  def geomTypeU8(b: Array[Byte]): UTF8String = UTF8String.fromString(geomType(b))
  def geoJsonU8(b: Array[Byte]): UTF8String = UTF8String.fromString(toGeoJson(b))
}

/** WKB blob → envelope [xmin, ymin, xmax, ymax] (codegen'd). */
case class WkbEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "wkb_envelope"
  override protected def nullSafeEval(b: Any): Any =
    new GenericArrayData(Wkb.envelope(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.spatial.Wkb.envelope($c));")
  override protected def withNewChildInternal(newChild: Expression): WkbEnvelope =
    copy(child = newChild)
}

object WkbEnvelope {
  def apply(c: Column): Column = GraftBridge.column(WkbEnvelope(GraftBridge.expression(c)))
}

/** WKB blob → GeoJSON type name (codegen'd). */
case class WkbType(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "wkb_type"
  override protected def nullSafeEval(b: Any): Any =
    Wkb.geomTypeU8(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.geomTypeU8($c);")
  override protected def withNewChildInternal(newChild: Expression): WkbType =
    copy(child = newChild)
}

object WkbType {
  def apply(c: Column): Column = GraftBridge.column(WkbType(GraftBridge.expression(c)))
}

/** WKB blob → total vertex count (codegen'd). */
case class WkbNumPoints(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "wkb_num_points"
  override protected def nullSafeEval(b: Any): Any =
    Wkb.numPoints(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.numPoints($c);")
  override protected def withNewChildInternal(newChild: Expression): WkbNumPoints =
    copy(child = newChild)
}

object WkbNumPoints {
  def apply(c: Column): Column = GraftBridge.column(WkbNumPoints(GraftBridge.expression(c)))
}

/** WKB blob → GeoJSON text (codegen'd) — the reference's output decode
  * (utilities.py:139-147).
  */
case class WkbGeoJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "wkb_geojson"
  override protected def nullSafeEval(b: Any): Any =
    Wkb.geoJsonU8(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.geoJsonU8($c);")
  override protected def withNewChildInternal(newChild: Expression): WkbGeoJson =
    copy(child = newChild)
}

object WkbGeoJson {
  def apply(c: Column): Column = GraftBridge.column(WkbGeoJson(GraftBridge.expression(c)))
}

/** (x, y) → Point WKB (codegen'd) — synthesizes the reference's storage
  * format from plain columns, for round-trip gates and fixtures.
  */
case class WkbPoint(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_point"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    Wkb.pointBytes(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.spatial.Wkb.pointBytes($x, $y);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WkbPoint =
    copy(left = newLeft, right = newRight)
}

object WkbPoint {
  def apply(x: Column, y: Column): Column =
    GraftBridge.column(WkbPoint(
      GraftBridge.expression(x.cast("double")), GraftBridge.expression(y.cast("double"))))
}

/** (xmin, ymin, xmax, ymax) → box Polygon WKB (codegen'd). */
case class WkbBox(first: Expression, second: Expression,
                  third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_box"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Wkb.boxBytes(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.spatial.Wkb.boxBytes($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): WkbBox =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object WkbBox {
  def apply(a: Column, b: Column, c: Column, d: Column): Column =
    GraftBridge.column(WkbBox(
      GraftBridge.expression(a.cast("double")), GraftBridge.expression(b.cast("double")),
      GraftBridge.expression(c.cast("double")), GraftBridge.expression(d.cast("double"))))
}

/** array<double> flat open ring → Polygon WKB (codegen'd) — synthesizes
  * the reference's storage format for non-axis-aligned footprints (the
  * a88 rotated-quad fixtures).
  */
case class WkbRingPoly(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_ring_poly"
  override protected def nullSafeEval(a: Any): Any =
    Wkb.ringBytes(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.ringBytes($c.toDoubleArray());")
  override protected def withNewChildInternal(newChild: Expression): WkbRingPoly =
    copy(child = newChild)
}

object WkbRingPoly {
  def apply(c: Column): Column =
    GraftBridge.column(WkbRingPoly(GraftBridge.expression(c)))
}

/** array<double> flat open polyline → LineString WKB (codegen'd) —
  * synthesizes the reference's non-areal storage rows (a95 fixtures).
  */
case class WkbLinePath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_line_path"
  override protected def nullSafeEval(a: Any): Any =
    Wkb.linePathBytes(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.linePathBytes($c.toDoubleArray());")
  override protected def withNewChildInternal(newChild: Expression): WkbLinePath =
    copy(child = newChild)
}

object WkbLinePath {
  def apply(c: Column): Column =
    GraftBridge.column(WkbLinePath(GraftBridge.expression(c)))
}

/** array<binary> part WKBs → Multi* / GeometryCollection WKB
  * (codegen'd); `typ` is the OGC container code (4 MultiPoint,
  * 5 MultiLineString, 6 MultiPolygon, 7 GeometryCollection).
  */
case class WkbCollect(child: Expression, typ: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_collect"
  override protected def nullSafeEval(a: Any): Any =
    Wkb.collectBytes(typ,
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.spatial.Wkb.collectBytes($typ, $c);")
  override protected def withNewChildInternal(newChild: Expression): WkbCollect =
    copy(child = newChild)
}

object WkbCollect {
  def apply(c: Column, typ: Int): Column =
    GraftBridge.column(WkbCollect(GraftBridge.expression(c), typ))
}

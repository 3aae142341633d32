package graft.spatial

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Geometry ops, Spark-first (SURVEY.md §3.2).
  *
  * The reference evaluates `ST_Intersects(geometry, …)` on WKB blobs via
  * DuckDB's spatial extension (database_logic.py:399-407, 418-448). At
  * 100 TB that touches every geometry. Here geometry is decomposed into
  * plain numeric columns (points: lon/lat), so:
  *
  *  - bbox intersects  → two range predicates that push down to parquet
  *    row-group min/max stats (cheap pruning before any row is read);
  *  - polygon intersects → the same bbox prune on the polygon's envelope,
  *    then an exact ray-cast post-filter as a codegen'd Catalyst
  *    expression ([[PointInPolygon]]) — stays inside whole-stage codegen,
  *    no UDF boxing.
  */
object Geo {

  /** Static ray-cast kernel (even-odd rule). `poly` is a flat closed-or-open
    * ring [x0,y0,x1,y1,...]; the edge xn→x0 is implied. Called from
    * generated code — must stay a static-forwardable method.
    */
  def rayCast(x: Double, y: Double, poly: Array[Double]): Boolean = {
    var inside = false
    val n = poly.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Envelope (bbox) intersects for point geometry: pushdown-able ranges.
    * Matches ST_Intersects(point, bbox-polygon) boundary-inclusive
    * semantics.
    */
  def bboxContains(lon: Column, lat: Column,
                   west: Double, south: Double, east: Double, north: Double): Column =
    lon >= west && lon <= east && lat >= south && lat <= north

  /** Same predicate rendered as oracle SQL. */
  def bboxContainsSql(lonC: String, latC: String,
                      west: Double, south: Double, east: Double, north: Double): String =
    s"($lonC >= $west AND $lonC <= $east AND $latC >= $south AND $latC <= $north)"

  /** Polygon envelope. */
  def envelope(poly: Array[Double]): (Double, Double, Double, Double) = {
    val xs = poly.indices.collect { case i if i % 2 == 0 => poly(i) }
    val ys = poly.indices.collect { case i if i % 2 == 1 => poly(i) }
    (xs.min, ys.min, xs.max, ys.max)
  }

  /** Exact point-in-polygon with an envelope pre-filter (the pushdown-able
    * part) AND'd in front of the codegen'd ray cast.
    */
  def intersectsPolygon(lon: Column, lat: Column, poly: Array[Double]): Column = {
    val (w, s, e, n) = envelope(poly)
    bboxContains(lon, lat, w, s, e, n) &&
      GraftBridge.column(PointInPolygon(
        GraftBridge.expression(lon.cast("double")),
        GraftBridge.expression(lat.cast("double")), poly))
  }

  /** Oracle SQL for a CONVEX CCW polygon: conjunction of half-plane tests
    * (cross product of each edge with the point ≥ 0). Equivalent to the
    * ray cast for non-boundary points; gate polygons are chosen off the
    * data's coordinate grid so no point is on a boundary.
    */
  def convexIntersectsSql(lonC: String, latC: String, poly: Array[Double]): String = {
    val n = poly.length / 2
    val planes = (0 until n).map { i =>
      val x1 = poly(2 * i); val y1 = poly(2 * i + 1)
      val x2 = poly(2 * ((i + 1) % n)); val y2 = poly(2 * ((i + 1) % n) + 1)
      s"(($x2 - $x1) * ($latC - $y1) - ($y2 - $y1) * ($lonC - $x1)) >= 0"
    }
    planes.mkString("(", " AND ", ")")
  }

  /** Convex-polygon predicate as Columns (same half-plane form as the SQL
    * oracle — used in tests to cross-check the ray-cast expression).
    */
  def convexIntersectsColumn(lon: Column, lat: Column, poly: Array[Double]): Column = {
    val n = poly.length / 2
    (0 until n).map { i =>
      val x1 = poly(2 * i); val y1 = poly(2 * i + 1)
      val x2 = poly(2 * ((i + 1) % n)); val y2 = poly(2 * ((i + 1) % n) + 1)
      (lit(x2 - x1) * (lat - y1) - lit(y2 - y1) * (lon - x1)) >= 0
    }.reduce(_ && _)
  }
}

/** Codegen'd exact point-in-polygon (even-odd ray cast). The polygon is a
  * per-query constant, attached to the generated class as a reference
  * object; evaluation is one static call per row inside whole-stage
  * codegen (SURVEY.md §5 — "post-filters codegen'd, no UDF boxing").
  */
case class PointInPolygon(left: Expression, right: Expression, poly: Array[Double])
    extends BinaryExpression {

  // Inputs are cast to double at the builder (Geo.intersectsPolygon) — no
  // ExpectsInputTypes because AbstractDataType is private[sql] in Spark 4.
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    Geo.rayCast(lon.asInstanceOf[Double], lat.asInstanceOf[Double], poly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polyRef = ctx.addReferenceObj("poly", poly, "double[]")
    nullSafeCodeGen(ctx, ev, (lonCode, latCode) =>
      s"${ev.value} = graft.spatial.Geo.rayCast($lonCode, $latCode, $polyRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(left = newLeft, right = newRight)
}

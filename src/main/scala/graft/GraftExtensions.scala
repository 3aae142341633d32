package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.functions.DotProduct
import graft.spatial.PointInPolygon

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works:
  *
  *  - as a session extension:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - or on a live session: `GraftFunctions.register(spark)`
  *
  * Functions:
  *  - `dot_product(array<double>, array<double>) -> double`
  *  - `point_in_polygon(lon, lat, array<double> ring) -> boolean` — the
  *    ring must be a foldable literal (a per-query constant, like the
  *    reference's search polygon)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        b))
    }
}

object GraftFunctions {

  private def polyOf(e: Expression): Array[Double] = {
    require(e.foldable, "point_in_polygon ring must be a literal")
    e.eval().asInstanceOf[ArrayData].toDoubleArray()
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { args =>
      require(args.length == 2, "dot_product(a, b)")
      DotProduct(args(0), args(1))
    },
    "point_in_polygon" -> { args =>
      require(args.length == 3, "point_in_polygon(lon, lat, ring)")
      PointInPolygon(args(0), args(1), polyOf(args(2)))
    }
  )

  /** Register into an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftBridge.registerFunction(spark, name, b)
    }
}

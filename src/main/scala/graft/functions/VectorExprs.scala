package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels as codegen'd Catalyst expressions.
  *
  * Spark's higher-order functions (`aggregate`, `transform`) evaluate their
  * lambda interpreted, per element — a 64-dim dot product inside an
  * O(n²) similarity join dominated the profile (119 s at sf0.1). This
  * expression generates a tight primitive loop inside whole-stage codegen.
  *
  * Numeric parity: the loop accumulates in ascending index order — the
  * same association as a sequential fold — so results stay bit-identical
  * to the DuckDB oracle's `list_reduce` (IEEE ops are correctly rounded;
  * only association order can differ, and it doesn't).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DotProduct.dot(x.toDoubleArray(), y.toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential kernel shared by interpreted eval and tests. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Column builder. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}

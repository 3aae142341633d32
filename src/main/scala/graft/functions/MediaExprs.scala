package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Header-only media metadata extraction (C29) — the EXIF-style operation:
  * typed fields read straight off the container's header bytes, no raster
  * decode. At 100 TB this is the difference between a projection that
  * scans headers and a codec pass over every payload — metadata questions
  * ("how many 4k images per source?") should never decode pixels.
  *
  * BMP layout (BITMAPFILEHEADER + BITMAPINFOHEADER, what `javax.imageio`
  * writes): bytes 0-1 magic "BM", 2-5 file size (LE u32), 10-13 pixel-data
  * offset (LE u32), 18-21 width (LE i32), 22-25 height (LE i32), 28-29
  * bits-per-pixel (LE u16).
  */
object MediaMeta {
  /** [file_size, px_offset, width, height, bpp], or null when the payload
    * is not a BMP (bad magic / truncated header) — corrupt media must
    * surface as a null row, never kill a full-corpus scan.
    */
  def bmpMeta(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 30 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) null
    else {
      def le32(o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      new GenericArrayData(Array(le32(2), le32(10), le32(18), le32(22), le16(28)))
    }
  }
}

/** Codegen'd BMP header reader: binary → [file_size, px_offset, width,
  * height, bpp] (null for non-BMP payloads).
  */
case class BmpMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_meta"
  override protected def nullSafeEval(b: Any): Any =
    MediaMeta.bmpMeta(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaMeta.bmpMeta($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    res
  }
  override protected def withNewChildInternal(newChild: Expression): BmpMeta =
    copy(child = newChild)
}

object BmpMeta {
  def apply(c: Column): Column = GraftBridge.column(BmpMeta(GraftBridge.expression(c)))
}

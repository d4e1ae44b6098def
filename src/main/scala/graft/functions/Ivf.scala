package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse-quantizer kernel: the `probe` nearest centroid cells of an
  * embedding, by cosine over INTEGER-QUANTIZED values (floor(x·4096),
  * the same engine-independent quantization as [[SignLsh]]) — the dot
  * products are exact integer sums (|q| ≤ 2¹², 64 terms → < 2³¹, exact
  * in double in any order), and sqrt/division are correctly-rounded IEEE
  * ops, so cell assignment can never differ between Spark's ordered
  * loop and DuckDB's unordered SUM. Ties break on the lower cell index.
  */
object Ivf {
  def topCells(e: Column, centroids: Seq[Seq[Long]], probe: Int): Column =
    GraftBridge.column(IvfTopCells(
      GraftBridge.expression(e), centroids, probe))
}

/** Serializable scorer shared by interpreted eval and generated code. */
final class IvfKernel(centroids: Seq[Seq[Long]], probe: Int)
    extends Serializable {
  private val cents: Array[Array[Long]] = centroids.map(_.toArray).toArray
  private val centNorm: Array[Double] = cents.map { c =>
    var s = 0L; var d = 0
    while (d < c.length) { s += c(d) * c(d); d += 1 }
    math.sqrt(s.toDouble)
  }

  def topCells(e: ArrayData, isFloat: Boolean): ArrayData = {
    val n = e.numElements()
    val q = new Array[Long](n)
    var qq = 0L
    var d = 0
    while (d < n) {
      val x = if (isFloat) e.getFloat(d).toDouble else e.getDouble(d)
      q(d) = math.floor(x * 4096d).toLong
      qq += q(d) * q(d)
      d += 1
    }
    val qNorm = math.sqrt(qq.toDouble)
    val scores = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var num = 0L
      var i = 0
      while (i < m) { num += q(i) * cent(i); i += 1 }
      scores(c) = num.toDouble / (qNorm * centNorm(c))
      c += 1
    }
    // top-`probe` cells by (score desc, index asc): selection over K
    val picked = new Array[Boolean](cents.length)
    val out = new Array[Any](math.min(probe, cents.length))
    var p = 0
    while (p < out.length) {
      var best = -1
      var c2 = 0
      while (c2 < cents.length) {
        if (!picked(c2) && (best < 0 || scores(c2) > scores(best)))
          best = c2
        c2 += 1
      }
      picked(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<int>` of the `probe` nearest centroid cell indices, nearest
  * first. Accepts `array<float>` or `array<double>` input.
  */
case class IvfTopCells(child: Expression, centroids: Seq[Seq[Long]],
    probe: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val kernel = new IvfKernel(centroids, probe)

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    kernel.topCells(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("ivfKernel", kernel,
      classOf[IvfKernel].getName)
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = $h.topCells($a, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : IvfTopCells = copy(child = newChild)

  override def prettyName: String = "ivf_top_cells"
}

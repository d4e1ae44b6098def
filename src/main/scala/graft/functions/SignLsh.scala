package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-LSH signature kernel: all `numTables` bucket signatures of one
  * embedding in a single pass, as a custom Catalyst expression with real
  * codegen.
  *
  * The HOF formulation (per-bit `aggregate(zip_with(e, coefs, ...))`)
  * is semantically identical but runs interpreted with boxed closures —
  * numTables × sigBits separate 64-element folds per row (256 for the
  * near-dup path) cost ~4× the whole query (measured 12.3 s → 3.4 s for
  * e_cosine_dups at sf0.1). This kernel quantizes the vector once and
  * runs tight integer loops; `doGenCode` keeps the projection inside
  * whole-stage codegen. Equivalence with the HOF tree is asserted in
  * FunctionsSpec; the DuckDB oracle mirrors the same integer math.
  *
  * Math (shared with [[planeCoefs]] and Oracles.knnLsh): bit (t, j) is
  * set iff Σ_d c(t,j,d) · ⌊e[d]·4096⌋ ≥ 0 with c ∈ {−1, +1} from a
  * seeded split-mix hash. Quantization to integers makes the sign
  * summation-order-independent, so Spark's ordered fold, this kernel's
  * loop, and DuckDB's unordered SUM always agree (ADVICE r2).
  */
object SignLsh {
  /** Rademacher coefficients for plane (table, bit): `dim` values in
    * {−1, +1}, deterministic (split-mix style hash per (t, j, d)).
    */
  def planeCoefs(t: Int, j: Int, dim: Int): IndexedSeq[Int] =
    (0 until dim).map { d =>
      var h = t * 0x9E3779B9 + j * 0x85EBCA6B + d * 0xC2B2AE35
      h ^= h >>> 16; h *= 0x7FEB352D; h ^= h >>> 15
      if ((h & 1) == 0) 1 else -1
    }

  def signatures(e: Column, tableBase: Int, numTables: Int, sigBits: Int,
      dim: Int): Column =
    GraftBridge.column(SignLshSignatures(
      GraftBridge.expression(e), tableBase, numTables, sigBits, dim))
}

/** One-pass cosine similarity with the EXACT semantics of the HOF form
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` where each dot is a
  * left-to-right double fold: the three accumulators advance element by
  * element in the same order, so every intermediate double is identical
  * to the HOF tree's — bit-for-bit equal output (asserted in
  * FunctionsSpec), ~10× cheaper than three interpreted folds. Used by
  * the exact re-rank of every similarity query.
  */
object CosineSim {
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

final class CosineKernel(leftFloat: Boolean, rightFloat: Boolean)
    extends Serializable {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  @transient private lazy val kernel = new CosineKernel(
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType,
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType)

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(kernel.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("cosineKernel", kernel,
      classOf[CosineKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $h.cosine($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Serializable tight-loop kernel shared by the interpreted eval and the
  * generated code (referenced via addReferenceObj).
  */
final class SignLshKernel(tableBase: Int, numTables: Int, sigBits: Int,
    dim: Int, isFloat: Boolean) extends Serializable {

  /** coefs(t*sigBits + j)(d) ∈ {−1, +1}. */
  private val coefs: Array[Array[Int]] =
    Array.tabulate(numTables * sigBits) { i =>
      SignLsh.planeCoefs(tableBase + i / sigBits, i % sigBits, dim).toArray
    }

  def signatures(e: ArrayData): ArrayData = {
    val n = math.min(e.numElements(), dim)
    val q = new Array[Long](n)
    var d = 0
    while (d < n) {
      val x = if (isFloat) e.getFloat(d).toDouble else e.getDouble(d)
      q(d) = math.floor(x * 4096d).toLong
      d += 1
    }
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0
      var j = 0
      while (j < sigBits) {
        val c = coefs(t * sigBits + j)
        var acc = 0L
        var i = 0
        while (i < n) {
          acc += (if (c(i) > 0) q(i) else -q(i))
          i += 1
        }
        if (acc >= 0) sig |= 1 << j
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<int>` of the `numTables` signatures of one embedding (element t
  * = table `tableBase + t`). Accepts `array<float>` or `array<double>`
  * input.
  */
case class SignLshSignatures(child: Expression, tableBase: Int,
    numTables: Int, sigBits: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val kernel = new SignLshKernel(
    tableBase, numTables, sigBits, dim,
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType)

  override def nullSafeEval(v: Any): Any =
    kernel.signatures(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("signLshKernel", kernel,
      classOf[SignLshKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.signatures($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SignLshSignatures = copy(child = newChild)

  override def prettyName: String = "sign_lsh_signatures"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression for the hot path of the span-sequence
  * invariant: given two span arrays, return the (usually empty) array of
  * mismatching 0-based indices. Replaces a higher-order
  * `transform(arrays_zip(...))` tree — HOF lambdas are interpreted
  * per-element with boxed closures; this is one tight loop over the two
  * ArrayData buffers, and violation structs are then built only for the
  * rare mismatch indices instead of for every span.
  *
  * Mismatch := any of (kind, text, media_ref, offset) differing null-safely
  * (the per-row invariant from BASELINE.json input_hint), or an index
  * present on only one side (length mismatch).
  */
case class SpanMismatchIndices(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val fieldOrdinals: (Int, Int, Int, Int) = {
    val st = left.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    (st.fieldIndex("kind"), st.fieldIndex("text"),
      st.fieldIndex("media_ref"), st.fieldIndex("offset"))
  }

  private def strEq(a: UTF8String, b: UTF8String): Boolean =
    if (a == null) b == null else a.equals(b)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ki, ti, mi, oi) = fieldOrdinals
    val n = math.max(a.numElements(), b.numElements())
    val out = new java.util.ArrayList[Int](4)
    var i = 0
    while (i < n) {
      val mismatch =
        if (i >= a.numElements() || i >= b.numElements()) true
        else if (a.isNullAt(i) || b.isNullAt(i))
          !(a.isNullAt(i) && b.isNullAt(i))
        else {
          val sa = a.getStruct(i, 4)
          val sb = b.getStruct(i, 4)
          def s(row: org.apache.spark.sql.catalyst.InternalRow, ord: Int) =
            if (row.isNullAt(ord)) null else row.getUTF8String(ord)
          !strEq(s(sa, ki), s(sb, ki)) ||
            !strEq(s(sa, ti), s(sb, ti)) ||
            !strEq(s(sa, mi), s(sb, mi)) || {
              val na = sa.isNullAt(oi); val nb = sb.isNullAt(oi)
              if (na || nb) na != nb else sa.getInt(oi) != sb.getInt(oi)
            }
        }
      if (mismatch) out.add(i)
      i += 1
    }
    if (out.isEmpty) SpanMismatchIndices.emptyResult
    else {
      val arr = new Array[Any](out.size)
      var j = 0
      while (j < out.size) { arr(j) = out.get(j); j += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanMismatchIndices =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_mismatch_indices"
}

object SpanMismatchIndices {
  private val emptyResult = new GenericArrayData(Array.empty[Any])

  def spanMismatchIndices(spans: Column, refSpans: Column): Column =
    GraftBridge.column(SpanMismatchIndices(
      GraftBridge.expression(spans), GraftBridge.expression(refSpans)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop token COUNTERS for the shard-budget hot path. Each is
  * exactly `size(regexp_extract_all(text, pattern, 0))` for its fixed
  * pattern — the regex engine walks the same leftmost-first alternation
  * over the same positions, but `regexp_extract_all` additionally
  * materializes every matched token as a UTF8String in an array that
  * the `size()` immediately discards; at corpus scale the token
  * allocation (≈ one object per 2-3 input bytes) dominated d_tokens /
  * d_pack_shards. The kernels count in one allocation-free byte scan.
  * Equality with the regex spec forms is asserted in FunctionsSpec over
  * the real corpus plus adversarial edge cases.
  */
object TokenCount {
  def subwordCount(text: Column): Column =
    GraftBridge.column(SubwordTokenCount(GraftBridge.expression(text)))

  def asciiRunCount(text: Column): Column =
    GraftBridge.column(AsciiRunCount(GraftBridge.expression(text)))
}

/** Counter for [[graft.operators.TextOps.SubwordPattern]]:
  * `tion|ment|able|ing|ers|est|the|and|ed|er|in|on|at|es|or|an|re|he|
  * [a-z]|[0-9]|[^ ]` under java.util.regex `find()` semantics — at each
  * position the alternatives are tried IN PATTERN ORDER and the first
  * match wins (alternation is leftmost-preferent, not longest-match);
  * a position matching nothing (only possible on a space, since `[^ ]`
  * matches any other code point) advances by one. Multi-byte UTF-8
  * sequences can only match `[^ ]` (every earlier alternative is pure
  * ASCII) and count as ONE token per code point, exactly like the regex
  * engine's code-point-based classes.
  */
final class SubwordCountKernel extends Serializable {
  def count(text: UTF8String): Int = {
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    @inline def b(i: Int): Byte = Platform.getByte(base, off + i)
    @inline def is(p: Int, c1: Char, c2: Char): Boolean =
      p + 2 <= nb && b(p) == c1.toByte && b(p + 1) == c2.toByte
    @inline def is3(p: Int, c1: Char, c2: Char, c3: Char): Boolean =
      p + 3 <= nb && b(p) == c1.toByte && b(p + 1) == c2.toByte &&
        b(p + 2) == c3.toByte
    @inline def is4(p: Int, c1: Char, c2: Char, c3: Char, c4: Char)
        : Boolean =
      p + 4 <= nb && b(p) == c1.toByte && b(p + 1) == c2.toByte &&
        b(p + 2) == c3.toByte && b(p + 3) == c4.toByte
    var p = 0
    var n = 0
    while (p < nb) {
      val c = b(p)
      if (c == ' ') {
        p += 1
      } else {
        // alternatives in pattern order, grouped by first byte
        var len = 1
        if (c == 't'.toByte) {
          if (is4(p, 't', 'i', 'o', 'n')) len = 4
          else if (is3(p, 't', 'h', 'e')) len = 3
        } else if (c == 'm'.toByte) {
          if (is4(p, 'm', 'e', 'n', 't')) len = 4
        } else if (c == 'a'.toByte) {
          if (is4(p, 'a', 'b', 'l', 'e')) len = 4
          else if (is3(p, 'a', 'n', 'd')) len = 3
          else if (is(p, 'a', 't')) len = 2
          else if (is(p, 'a', 'n')) len = 2
        } else if (c == 'i'.toByte) {
          if (is3(p, 'i', 'n', 'g')) len = 3
          else if (is(p, 'i', 'n')) len = 2
        } else if (c == 'e'.toByte) {
          if (is3(p, 'e', 'r', 's')) len = 3
          else if (is3(p, 'e', 's', 't')) len = 3
          else if (is(p, 'e', 'd')) len = 2
          else if (is(p, 'e', 'r')) len = 2
          else if (is(p, 'e', 's')) len = 2
        } else if (c == 'o'.toByte) {
          if (is(p, 'o', 'n')) len = 2
          else if (is(p, 'o', 'r')) len = 2
        } else if (c == 'r'.toByte) {
          if (is(p, 'r', 'e')) len = 2
        } else if (c == 'h'.toByte) {
          if (is(p, 'h', 'e')) len = 2
        } else if ((c & 0x80) != 0) {
          // [a-z] / [0-9] / [^ ]: one code point. Non-ASCII leading
          // bytes consume their full UTF-8 sequence (one code point,
          // like the regex engine's classes); continuation bytes
          // cannot occur here in valid UTF-8.
          len =
            if ((c & 0xE0) == 0xC0) 2
            else if ((c & 0xF0) == 0xE0) 3
            else if ((c & 0xF8) == 0xF0) 4
            else 1
        }
        n += 1
        p += len
      }
    }
    n
  }
}

/** `size(regexp_extract_all(text, SubwordPattern, 0))` as one
  * allocation-free pass.
  */
case class SubwordTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val kernel = new SubwordCountKernel

  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(kernel.count(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("subwordCountKernel", kernel,
      classOf[SubwordCountKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SubwordTokenCount = copy(child = newChild)

  override def prettyName: String = "subword_token_count"
}

/** Counter for `[a-z]+|[0-9]+`: the number of maximal lowercase-ASCII
  * runs plus maximal digit runs — `find()` restarts after each greedy
  * run, so a letter run followed by a digit run counts twice, exactly
  * like the regex.
  */
final class AsciiRunCountKernel extends Serializable {
  def count(text: UTF8String): Int = {
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    @inline def b(i: Int): Byte = Platform.getByte(base, off + i)
    var p = 0
    var n = 0
    while (p < nb) {
      val c = b(p)
      if (c >= 'a' && c <= 'z') {
        n += 1
        p += 1
        while (p < nb && b(p) >= 'a' && b(p) <= 'z') p += 1
      } else if (c >= '0' && c <= '9') {
        n += 1
        p += 1
        while (p < nb && b(p) >= '0' && b(p) <= '9') p += 1
      } else {
        p += 1
      }
    }
    n
  }
}

/** `size(regexp_extract_all(text, "[a-z]+|[0-9]+", 0))` as one
  * allocation-free pass.
  */
case class AsciiRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val kernel = new AsciiRunCountKernel

  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(kernel.count(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("asciiRunCountKernel", kernel,
      classOf[AsciiRunCountKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AsciiRunCount = copy(child = newChild)

  override def prettyName: String = "ascii_run_count"
}

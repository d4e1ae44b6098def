package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.rules.{EnumRule, PatternRule, RangeRule, RequiredRule, SpanRule}

/** Compact, driver-compiled form of a span rule, evaluated in a tight
  * loop by [[SpanRuleViolationCount]]. Only the keyword set the flagship
  * rule set uses; anything else stays on the general HOF compiler.
  */
sealed trait CompactRule extends Serializable
final case class EnumC(field: String, allowed: Set[String])
    extends CompactRule {
  @transient lazy val allowedU: Set[UTF8String] =
    allowed.map(UTF8String.fromString)
}
final case class RequiredC(field: String, whenKind: Option[String])
    extends CompactRule {
  @transient lazy val whenKindU: Option[UTF8String] =
    whenKind.map(UTF8String.fromString)
}
final case class PatternC(field: String, regex: String) extends CompactRule {
  @transient lazy val pattern: Pattern = Pattern.compile(regex)
}
final case class RangeC(field: String, min: Option[Long], max: Option[Long])
    extends CompactRule
final case class MinLengthC(field: String, minLen: Int) extends CompactRule

object CompactRule {
  /** Compile the ADT rules that have a compact form; returns None if any
    * rule is outside the compact surface (caller falls back to HOF).
    */
  def from(rules: Seq[SpanRule]): Option[Seq[CompactRule]] = {
    val out = rules.map {
      case EnumRule(f, allowed) => Some(EnumC(f, allowed.toSet))
      case RequiredRule(f, whenKind) => Some(RequiredC(f, whenKind))
      case PatternRule(f, re) => Some(PatternC(f, re))
      case RangeRule(f, min, max) => Some(RangeC(f, min, max))
      case graft.rules.MinLengthRule(f, m) => Some(MinLengthC(f, m))
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }
}

/** Serializable rule evaluator shared by interpreted eval and generated
  * code; field ordinals resolved once at construction.
  */
final class RuleCounter(rules: Array[CompactRule],
    ordinals: Map[String, Int], kindOrd: Int) extends Serializable {
  // per-rule dispatch tables resolved once: no Map lookups, no Option
  // boxing, no pattern-match allocation in the 10^8-spans/s hot loop
  private val TEnum = 0; private val TReq = 1
  private val TPat = 2; private val TRange = 3; private val TLen = 4
  private val tags: Array[Int] = rules.map {
    case _: EnumC => TEnum
    case _: RequiredC => TReq
    case _: PatternC => TPat
    case _: RangeC => TRange
    case _: MinLengthC => TLen
  }
  private def fieldOf(r: CompactRule): String = r match {
    case EnumC(f, _) => f
    case RequiredC(f, _) => f
    case PatternC(f, _) => f
    case RangeC(f, _, _) => f
    case MinLengthC(f, _) => f
  }
  private val ords: Array[Int] = rules.map(r => ordinals(fieldOf(r)))
  @transient private lazy val enumSets: Array[Set[UTF8String]] =
    rules.map { case e: EnumC => e.allowedU; case _ => null }
  @transient private lazy val reqKinds: Array[UTF8String] =
    rules.map { case r: RequiredC => r.whenKindU.orNull; case _ => null }
  @transient private lazy val patterns: Array[Pattern] =
    rules.map { case p: PatternC => p.pattern; case _ => null }
  private val hasMin: Array[Boolean] =
    rules.map { case RangeC(_, min, _) => min.isDefined; case _ => false }
  private val mins: Array[Long] =
    rules.map { case RangeC(_, min, _) => min.getOrElse(0L); case _ => 0L }
  private val hasMax: Array[Boolean] =
    rules.map { case RangeC(_, _, max) => max.isDefined; case _ => false }
  private val maxs: Array[Long] =
    rules.map { case RangeC(_, _, max) => max.getOrElse(0L); case _ => 0L }
  private val minLens: Array[Int] =
    rules.map { case MinLengthC(_, m) => m; case _ => 0 }

  def count(arr: ArrayData): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 4)
        var j = 0
        while (j < tags.length) {
          val ord = ords(j)
          tags(j) match {
            case TEnum =>
              if (!row.isNullAt(ord) &&
                !enumSets(j).contains(row.getUTF8String(ord))) count += 1
            case TReq =>
              val k = reqKinds(j)
              val gate = k == null || (!row.isNullAt(kindOrd) &&
                row.getUTF8String(kindOrd).equals(k))
              if (gate && row.isNullAt(ord)) count += 1
            case TPat =>
              if (!row.isNullAt(ord) && !patterns(j)
                .matcher(row.getUTF8String(ord).toString).find()) count += 1
            case TRange =>
              if (!row.isNullAt(ord)) {
                val x = row.getInt(ord).toLong
                if ((hasMin(j) && x < mins(j)) ||
                  (hasMax(j) && x > maxs(j))) count += 1
              }
            case TLen =>
              if (!row.isNullAt(ord) &&
                row.getUTF8String(ord).numChars() < minLens(j)) count += 1
          }
          j += 1
        }
      }
      i += 1
    }
    count
  }
}

/** Count of rule-keyword violations across a span array — the custom
  * fast path of the rule compiler for verdict-level queries (violation
  * DETAIL rows keep the general Column compiler, which is oracle-gated).
  * One loop per row, zero per-element allocation, real doGenCode so the
  * projection stage stays in whole-stage codegen; semantic equivalence
  * with RuleCompiler.violations is spec-tested.
  */
case class SpanRuleViolationCount(child: Expression,
    rules: Seq[CompactRule])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val counter: RuleCounter = {
    val st = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val ordinals = st.fieldNames.zipWithIndex.toMap
    new RuleCounter(rules.toArray, ordinals, ordinals("kind"))
  }

  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(counter.count(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val h = ctx.addReferenceObj("ruleCounter", counter,
      classOf[RuleCounter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.count($a);")
  }

  override protected def withNewChildInternal(c: Expression)
      : SpanRuleViolationCount = copy(child = c)
  override def prettyName: String = "span_rule_violation_count"
}

object SpanRuleViolationCount {
  def spanRuleViolationCount(spans: Column, rules: Seq[SpanRule]): Column = {
    val compact = CompactRule.from(rules).getOrElse(
      throw new IllegalArgumentException(
        "rule set outside the compact surface — use RuleCompiler.violations"))
    GraftBridge.column(
      SpanRuleViolationCount(GraftBridge.expression(spans), compact))
  }
}

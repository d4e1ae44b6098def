package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass numeric column profile via a typed `Aggregator` (SURVEY.md
  * §2.5 A-row: "single-pass typed Aggregator — count, null-rate,
  * min/max"; Welford for mean/variance). Catalyst supplies the
  * partial/final split, so this is a single scan + one tiny shuffle at
  * any scale. Register with `functions.udaf` for DataFrame use.
  */
final case class NumStatsBuf(n: Long, nulls: Long, min: Double, max: Double,
    mean: Double, m2: Double)

final case class NumStats(count: Long, nulls: Long, nullRate: Double,
    min: Double, max: Double, mean: Double, variance: Double)

class NumStatsAgg extends Aggregator[java.lang.Double, NumStatsBuf, NumStats] {
  def zero: NumStatsBuf =
    NumStatsBuf(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, 0.0)

  def reduce(b: NumStatsBuf, x: java.lang.Double): NumStatsBuf =
    if (x == null) b.copy(nulls = b.nulls + 1)
    else {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      NumStatsBuf(n, b.nulls, math.min(b.min, x), math.max(b.max, x),
        mean, b.m2 + delta * (x - mean))
    }

  def merge(a: NumStatsBuf, b: NumStatsBuf): NumStatsBuf = {
    if (a.n == 0) return b.copy(nulls = a.nulls + b.nulls)
    if (b.n == 0) return a.copy(nulls = a.nulls + b.nulls)
    val n = a.n + b.n
    val delta = b.mean - a.mean
    val mean = a.mean + delta * b.n / n
    NumStatsBuf(n, a.nulls + b.nulls, math.min(a.min, b.min),
      math.max(a.max, b.max), mean,
      a.m2 + b.m2 + delta * delta * a.n * b.n / n)
  }

  def finish(b: NumStatsBuf): NumStats = {
    val total = b.n + b.nulls
    NumStats(
      count = total,
      nulls = b.nulls,
      nullRate = if (total == 0) 0.0 else b.nulls.toDouble / total,
      min = if (b.n == 0) Double.NaN else b.min,
      max = if (b.n == 0) Double.NaN else b.max,
      mean = if (b.n == 0) Double.NaN else b.mean,
      variance = if (b.n < 2) 0.0 else b.m2 / (b.n - 1))
  }

  def bufferEncoder: Encoder[NumStatsBuf] = Encoders.product[NumStatsBuf]
  def outputEncoder: Encoder[NumStats] = Encoders.product[NumStats]
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Minimal merging t-digest (Dunning's k0 merging variant, simplified):
  * centroids kept sorted by mean; an incoming buffer is merged whenever it
  * fills, with per-centroid weight capped by 4·n·q(1−q)/δ so tails stay
  * precise. Deterministic given input order per partition is not required
  * — quantile error is bounded regardless of merge order.
  */
final class Digest(val compression: Int) extends Serializable {
  private var means = new ArrayBuffer[Double]()
  private var weights = new ArrayBuffer[Double]()
  private val bufM = new ArrayBuffer[Double]()
  var total: Double = 0.0

  def add(x: Double, w: Double = 1.0): Unit = {
    bufM += x
    if (w != 1.0) { flushBuffer(); insert(x, w - 1.0) }
    total += w
    if (bufM.length >= 64) flushBuffer()
  }

  private def insert(x: Double, w: Double): Unit = {
    means += x; weights += w
  }

  private def flushBuffer(): Unit = {
    if (bufM.isEmpty) return
    bufM.foreach { x => means += x; weights += 1.0 }
    bufM.clear()
    compress()
  }

  def compress(): Unit = {
    if (means.isEmpty) return
    val idx = means.indices.sortBy(means(_))
    val sm = idx.map(means(_))
    val sw = idx.map(weights(_))
    val n = sw.sum
    val newM = new ArrayBuffer[Double]()
    val newW = new ArrayBuffer[Double]()
    var cm = sm.head
    var cw = sw.head
    var acc = 0.0
    for (i <- 1 until sm.length) {
      val q = (acc + cw / 2) / n
      val limit = math.max(4.0 * n * q * (1 - q) / compression, 1.0)
      if (cw + sw(i) <= limit) {
        val w = cw + sw(i)
        cm = (cm * cw + sm(i) * sw(i)) / w
        cw = w
      } else {
        newM += cm; newW += cw; acc += cw
        cm = sm(i); cw = sw(i)
      }
    }
    newM += cm; newW += cw
    means = newM; weights = newW
  }

  def mergeIn(other: Digest): Unit = {
    other.flushBuffer()
    flushBuffer()
    for (i <- other.means.indices) { means += other.means(i);
      weights += other.weights(i) }
    total += other.total
    compress()
  }

  def quantile(q: Double): Double = {
    flushBuffer()
    if (means.isEmpty) return Double.NaN
    val idx = means.indices.sortBy(means(_))
    val sm = idx.map(means(_))
    val sw = idx.map(weights(_))
    val n = sw.sum
    val target = q * n
    var acc = 0.0
    for (i <- sm.indices) {
      if (acc + sw(i) >= target) {
        // interpolate within the centroid span
        val prev = if (i == 0) sm(0) else (sm(i - 1) + sm(i)) / 2
        val next = if (i == sm.length - 1) sm(i) else (sm(i) + sm(i + 1)) / 2
        val frac = if (sw(i) == 0) 0.0 else (target - acc) / sw(i)
        return prev + (next - prev) * math.min(math.max(frac, 0.0), 1.0)
      }
      acc += sw(i)
    }
    sm.last
  }

  def serialize(): Array[Byte] = {
    flushBuffer()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(compression)
    out.writeDouble(total)
    out.writeInt(means.length)
    means.foreach(out.writeDouble)
    weights.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }
}

object Digest {
  def deserialize(bytes: Array[Byte]): Digest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new Digest(in.readInt())
    val total = in.readDouble()
    val n = in.readInt()
    val ms = Array.fill(n)(in.readDouble())
    val ws = Array.fill(n)(in.readDouble())
    // insert centroids directly — routing through add() would increment
    // `total` a second time, doubling it on every shuffle round trip
    for (i <- 0 until n) d.insert(ms(i), ws(i))
    d.total = total
    d
  }
}

/** `tdigest_quantile(col, q)` — the one genuinely custom Catalyst piece
  * (SURVEY.md §7.2): a TypedImperativeAggregate whose buffer is a
  * serialized t-digest; partial digests merge across partitions, so
  * quantile estimation over 10^12 rows shuffles only ~KB-sized sketches.
  */
case class TDigestQuantile(
    child: Expression,
    q: Double,
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Digest = new Digest(compression)

  override def update(buffer: Digest, input: InternalRow): Digest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: Digest, other: Digest): Digest = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: Digest): Any =
    if (buffer.total == 0) null else buffer.quantile(q)

  override def serialize(buffer: Digest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Digest =
    Digest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantile =
    copy(child = newChildren.head)
  override def prettyName: String = "tdigest_quantile"
}

object TDigestQuantile {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4: Column↔Expression bridging is
    * private[sql] — see [[org.apache.spark.sql.GraftBridge]]).
    */
  def tdigestQuantile(c: Column, q: Double): Column =
    GraftBridge.column(
      TDigestQuantile(GraftBridge.expression(c), q)
        .toAggregateExpression())
}

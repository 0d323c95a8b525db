package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate
  * (SURVEY.md §4 extension tier: custom TypedImperativeAggregate with
  * partial/merge — the aggregate-function analog of the scalar
  * codegen expressions and the TopKPerKey plan node).
  *
  * `freq_sketch(col, k)` keeps at most k (item, count) counters per
  * partition buffer and returns a map<string,bigint> of surviving
  * counters. Properties (Misra & Gries 1982; merge rule per Agarwal
  * et al., "Mergeable summaries", PODS 2012):
  *
  *  - every item with true count > n/(k+1) is PRESENT in the sketch
  *    (guaranteed superset of the heavy hitters);
  *  - each reported count underestimates the true count by at most
  *    n/(k+1), under arbitrary partitioning and merge order;
  *  - the state is O(k), independent of stream length — each executor
  *    buffer and the final merged map hold ≤ k entries, so a 100 TB
  *    scan carries a constant few KB per partial.
  *
  * The two-pass exact pattern (tx_heavy_hitters): sketch pass →
  * candidate set (≤ k items, broadcast), exact-count pass restricted
  * to candidates → threshold filter. The superset guarantee makes the
  * result EQUAL to the full groupBy, at candidate-set shuffle width.
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    weight: Expression = Literal(1L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, "freq_sketch: k must be positive")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  // subtract the (k+1)-th largest count from every counter and keep
  // the positive ones — the mergeable-summaries rule that keeps the
  // additive error bounded by n/(k+1) under arbitrary weighted
  // inserts and merges
  private def cutToK(b: mutable.HashMap[UTF8String, Long]): Unit = {
    val cut = b.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    b.foreach { case (key, c) =>
      if (c - cut <= 0L) dead += key else b.update(key, c - cut)
    }
    dead.foreach(b.remove)
  }

  override def update(
      b: mutable.HashMap[UTF8String, Long], row: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val w = weight.eval(row) match {
        case null => 0L
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      if (w == 1L) b.get(s) match { // unweighted fast path: O(k) miss
        case Some(c) => b.update(s, c + 1)
        case None if b.size < k => b.update(s.copy(), 1L) // row-backed bytes: copy
        case None => // full and absent: decrement-all, drop zeros
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          b.foreach { case (key, c) =>
            if (c == 1L) dead += key else b.update(key, c - 1L)
          }
          dead.foreach(b.remove)
      }
      else if (w > 0L) { // weighted (pre-aggregated) input: insert+cut
        b.get(s) match {
          case Some(c) => b.update(s, c + w)
          case None => b.update(s.copy(), w)
        }
        if (b.size > k) cutToK(b)
      }
    }
    b
  }

  override def merge(
      b: mutable.HashMap[UTF8String, Long],
      o: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    o.foreach { case (key, c) => b.update(key, b.getOrElse(key, 0L) + c) }
    if (b.size > k) cutToK(b)
    b
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = b.keys.toArray
    new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(keys.map(key => b(key): Any))) // box: [J is not [Ljava.lang.Object;
  }

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      b.update(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    b
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: weight :: Nil
  override def withNewMutableAggBufferOffset(n: Int): FreqSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "freq_sketch"
}

object FreqSketch {
  val builder: Seq[Expression] => Expression = {
    case Seq(c, Literal(k: Int, IntegerType)) => FreqSketch(c, k)
    case Seq(c, Literal(k: Long, LongType)) => FreqSketch(c, k.toInt)
    case other => throw new IllegalArgumentException(
      s"freq_sketch expects (column, int-literal k), got ${other.size} args")
  }

  /** freq_sketch_w(col, weight, k): Misra-Gries over a pre-aggregated
    * (item, count) stream — each row contributes `weight` occurrences.
    * Same guarantees with n = sum of weights.
    */
  val weightedBuilder: Seq[Expression] => Expression = {
    case Seq(c, w, Literal(k: Int, IntegerType)) => FreqSketch(c, k, w)
    case Seq(c, w, Literal(k: Long, LongType)) => FreqSketch(c, k.toInt, w)
    case other => throw new IllegalArgumentException(
      s"freq_sketch_w expects (column, weight, int-literal k), got ${other.size} args")
  }
}

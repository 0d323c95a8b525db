package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_capped(col, cap)` — collect_list for BIGINT keys with a
  * hard O(cap) memory bound per group (SURVEY.md §4 extension tier).
  *
  * The LSH bucket-join tier needs "all members of each (band, hash)
  * bucket, unless the bucket is a mega-bucket we drop anyway". A plain
  * `collect_list` materializes the mega-bucket first — an unbounded
  * aggregation buffer that a skewed 100 TB corpus turns into an
  * executor OOM. This aggregate stops appending at cap+1 elements, so
  *
  *  - groups with ≤ cap members collect EXACTLY (deterministic:
  *    every element is kept, order normalized by array_sort upstream);
  *  - larger groups yield cap+1 elements — enough for the caller's
  *    `size(ids) <= cap` guard to discard them — while the buffer, the
  *    shuffled partial, and the final array all stay O(cap) no matter
  *    how hot the bucket key is (which elements survive an overflowing
  *    group is arrival-order dependent, but those groups are dropped).
  *
  * Buffer = (count-so-far, capped array); partials merge by
  * concat-then-clamp, preserving both invariants under arbitrary
  * partitioning.
  */
case class CollectLongCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectLongCapped.Buf] {

  require(cap > 0, "collect_capped: cap must be positive")

  override def createAggregationBuffer(): CollectLongCapped.Buf =
    new CollectLongCapped.Buf(new Array[Long](math.min(cap + 1, 16)), 0)

  override def update(b: CollectLongCapped.Buf, row: InternalRow): CollectLongCapped.Buf = {
    val v = child.eval(row)
    if (v != null) b.append(v.asInstanceOf[Long], cap + 1)
    b
  }

  override def merge(b: CollectLongCapped.Buf, o: CollectLongCapped.Buf): CollectLongCapped.Buf = {
    var i = 0
    while (i < o.n) { b.append(o.a(i), cap + 1); i += 1 }
    b
  }

  override def eval(b: CollectLongCapped.Buf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.a(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: CollectLongCapped.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectLongCapped.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val a = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { a(i) = bb.getLong; i += 1 }
    new CollectLongCapped.Buf(a, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def withNewMutableAggBufferOffset(n: Int): CollectLongCapped =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectLongCapped =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectLongCapped =
    copy(child = newChildren(0))
  override def prettyName: String = "collect_capped"
}

object CollectLongCapped {
  /** Growable long buffer clamped at `limit` logical elements of
    * `stride` longs each (stride 1 = scalars, 2 = pairs).
    */
  final class Buf(var a: Array[Long], var n: Int) {
    def append(v: Long, limit: Int): Unit = if (n < limit) {
      if (n == a.length) grow(limit)
      a(n) = v
      n += 1
    }
    def append2(v1: Long, v2: Long, limitPairs: Int): Unit = if (n < limitPairs * 2) {
      if (n + 1 >= a.length) grow(limitPairs * 2)
      a(n) = v1
      a(n + 1) = v2
      n += 2
    }
    private def grow(limit: Int): Unit = {
      val grown = new Array[Long](math.min(math.max(a.length * 2, 16), limit))
      System.arraycopy(a, 0, grown, 0, n)
      a = grown
    }
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(c, Literal(k: Int, IntegerType)) => CollectLongCapped(c, k)
    case Seq(c, Literal(k: Long, LongType)) => CollectLongCapped(c, k.toInt)
    case other => throw new IllegalArgumentException(
      s"collect_capped expects (column, int-literal cap), got ${other.size} args")
  }
}

/** `collect_capped2(key, payload, cap)` — the pair variant: collects
  * up to cap+1 (key, payload) BIGINT pairs per group as
  * array<struct<k,v>>. Lets a bucket join carry a per-member payload
  * (e.g. the full 64-bit signature) through the aggregation, so the
  * downstream pair-explode needs NO join-back to re-attach it. Same
  * O(cap) bound and same overflow-drop contract as collect_capped.
  */
case class CollectLongPairCapped(
    key: Expression,
    payload: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectLongCapped.Buf] {

  require(cap > 0, "collect_capped2: cap must be positive")

  override def createAggregationBuffer(): CollectLongCapped.Buf =
    new CollectLongCapped.Buf(new Array[Long](16), 0)

  override def update(b: CollectLongCapped.Buf, row: InternalRow): CollectLongCapped.Buf = {
    val k = key.eval(row)
    val v = payload.eval(row)
    if (k != null && v != null)
      b.append2(k.asInstanceOf[Long], v.asInstanceOf[Long], cap + 1)
    b
  }

  override def merge(b: CollectLongCapped.Buf, o: CollectLongCapped.Buf): CollectLongCapped.Buf = {
    var i = 0
    while (i < o.n) { b.append2(o.a(i), o.a(i + 1), cap + 1); i += 2 }
    b
  }

  override def eval(b: CollectLongCapped.Buf): Any = {
    val out = new Array[Any](b.n / 2)
    var i = 0
    while (i < b.n) {
      out(i / 2) = InternalRow(b.a(i), b.a(i + 1))
      i += 2
    }
    new GenericArrayData(out)
  }

  override def serialize(b: CollectLongCapped.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectLongCapped.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val a = new Array[Long](math.max(n, 2))
    var i = 0
    while (i < n) { a(i) = bb.getLong; i += 1 }
    new CollectLongCapped.Buf(a, n)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = key :: payload :: Nil
  override def withNewMutableAggBufferOffset(n: Int): CollectLongPairCapped =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectLongPairCapped =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectLongPairCapped =
    copy(key = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "collect_capped2"
}

object CollectLongPairCapped {
  val builder: Seq[Expression] => Expression = {
    case Seq(k, v, Literal(c: Int, IntegerType)) => CollectLongPairCapped(k, v, c)
    case Seq(k, v, Literal(c: Long, LongType)) => CollectLongPairCapped(k, v, c.toInt)
    case other => throw new IllegalArgumentException(
      s"collect_capped2 expects (key, payload, int-literal cap), got ${other.size} args")
  }
}

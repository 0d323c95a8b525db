package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch, KLL-style (Karnin, Lang & Liberty,
  * "Optimal quantile approximation in streams", FOCS 2016; the
  * compaction discipline follows the classic Munro–Paterson /
  * Manku-Rajagopalan-Lindsay multi-level buffer), as a native Catalyst
  * TypedImperativeAggregate — the missing sketch next to `freq_sketch`
  * / HLL / Bloom for percentiles over UNBOUNDED value domains, where
  * the B41/B52 domain-histogram trick doesn't apply at 100 TB.
  *
  * `kll_quantiles(col, k, array(q…))` returns array<bigint>: for each
  * requested quantile q, an ACTUAL INPUT VALUE whose rank is within
  * ε·n of ⌈q·n⌉. Structure: a stack of levels; level h holds items of
  * weight 2^h; a level reaching capacity k sorts and promotes every
  * 2nd item (alternating offset per level — deterministic, so results
  * are reproducible run-to-run; the alternation makes consecutive
  * compaction errors cancel rather than accumulate). Merging
  * concatenates levels then re-compacts — the sketch is mergeable
  * under arbitrary partitioning and merge order (Agarwal et al.,
  * "Mergeable summaries", PODS 2012), which is exactly what a
  * partial/final Spark aggregation needs. State is O(k·log(n/k)):
  * ~13 levels × k int64 at n = 10⁹ — tens of KB per partial at any
  * corpus size. Rank error is O(log(n/k)/k) worst-case for the
  * deterministic variant; the shipped query (q_sketch_quantiles)
  * asserts a 3%-rank envelope at k=1024 — sized so the WORST-CASE
  * bound (≈log2(n/k)/k ≈ 1.2% at sf1, ~2.6% at n=10¹¹), not just the
  * measured ≲0.5% error, fits under any partial-merge order — through
  * the DuckDB-pinned-TRUE oracle pattern (B20); KllSketchSpec asserts
  * the envelope under five different partitionings/orders.
  */
final class KllState(val k: Int) {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  var flips: Long = 0L // one alternating-offset bit per level
  var n: Long = 0L

  def insert(v: Long): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).size >= k) compact(0)
  }

  private def compact(h: Int): Unit = {
    val arr = levels(h).toArray
    java.util.Arrays.sort(arr)
    if (levels.size == h + 1) levels += mutable.ArrayBuffer.empty[Long]
    val flip = ((flips >> h) & 1L) == 1L
    flips ^= 1L << h
    var lo = 0
    var hi = arr.length
    levels(h).clear()
    // odd count: one unpaired item stays at this level (alternating
    // ends, so the leftover doesn't systematically bias either tail)
    if (((hi - lo) & 1) == 1) {
      if (flip) { levels(h) += arr(lo); lo += 1 }
      else { hi -= 1; levels(h) += arr(hi) }
    }
    val up = levels(h + 1)
    var i = lo + (if (flip) 1 else 0)
    while (i < hi) { up += arr(i); i += 2 }
    if (up.size >= k) compact(h + 1)
  }

  def merge(o: KllState): Unit = {
    n += o.n
    while (levels.size < o.levels.size) levels += mutable.ArrayBuffer.empty[Long]
    var h = 0
    while (h < o.levels.size) { levels(h) ++= o.levels(h); h += 1 }
    h = 0
    while (h < levels.size) { // one upward sweep; compact() cascades
      if (levels(h).size >= k) compact(h)
      h += 1
    }
  }

  /** Value whose estimated rank brackets ⌈q·n⌉: walk the
    * weight-annotated items in value order accumulating weights.
    */
  def quantile(q: Double): Long = {
    var m = 0
    var h = 0
    while (h < levels.size) { m += levels(h).size; h += 1 }
    if (m == 0) return 0L
    val vw = new Array[Long](2 * m) // (value, weight) pairs, flattened
    var j = 0
    h = 0
    while (h < levels.size) {
      val lv = levels(h)
      var i = 0
      while (i < lv.size) { vw(2 * j) = lv(i); vw(2 * j + 1) = 1L << h; j += 1; i += 1 }
      h += 1
    }
    // sort pair-wise by value: indices into a boxed view would box;
    // sort an index permutation instead
    val idx = Array.range(0, m)
    val sorted = idx.sortBy(i => vw(2 * i))
    val target = math.min((q * n).toLong, n - 1)
    var cum = 0L
    var i = 0
    while (i < m) {
      cum += vw(2 * sorted(i) + 1)
      if (cum > target) return vw(2 * sorted(i))
      i += 1
    }
    vw(2 * sorted(m - 1))
  }
}

case class KllQuantiles(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8, "kll_quantiles: k must be >= 8")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "kll_quantiles: quantiles must lie in [0, 1]")

  override def createAggregationBuffer(): KllState = new KllState(k)

  // the sketch stores exact int64 items and declares array<bigint>;
  // a double/decimal child would silently truncate toward zero in
  // Number.longValue — reject it at analysis time instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires an integral value column (tinyint/smallint/int/bigint); " +
        s"got ${other.catalogString} — cast explicitly (e.g. to exact cents) first")
  }

  override def update(b: KllState, row: InternalRow): KllState = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: KllState, o: KllState): KllState = { b.merge(o); b }

  override def eval(b: KllState): Any =
    if (b.n == 0) null
    else new GenericArrayData(qs.map(q => b.quantile(q): Any).toArray)

  override def serialize(b: KllState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeLong(b.flips)
    out.writeInt(b.levels.size)
    b.levels.foreach { lv =>
      out.writeInt(lv.size)
      lv.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new KllState(k)
    b.n = in.readLong()
    b.flips = in.readLong()
    val nl = in.readInt()
    b.levels.clear()
    var h = 0
    while (h < nl) {
      val sz = in.readInt()
      val lv = new mutable.ArrayBuffer[Long](sz)
      var i = 0
      while (i < sz) { lv += in.readLong(); i += 1 }
      b.levels += lv
      h += 1
    }
    if (b.levels.isEmpty) b.levels += mutable.ArrayBuffer.empty[Long]
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def withNewMutableAggBufferOffset(n: Int): KllQuantiles =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllQuantiles =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren(0))
  override def prettyName: String = "kll_quantiles"
}

object KllQuantiles {
  /** kll_quantiles(col, k, array(q…)) — k and the quantile array must
    * be foldable (literals), evaluated once at plan time.
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(c, kE, qsE) if kE.foldable && qsE.foldable =>
      val k = kE.eval().asInstanceOf[Number].intValue()
      // SQL `array(0.5, …)` folds to decimals, DataFrame lit(0.5) to
      // doubles — accept both element types
      val elemT = qsE.dataType.asInstanceOf[ArrayType].elementType
      val qs = qsE.eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(elemT).toSeq.map {
          case d: java.lang.Double => d.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case n: Number => n.doubleValue()
        }
      KllQuantiles(c, k, qs)
    case other => throw new IllegalArgumentException(
      "kll_quantiles expects (column, int-literal k, literal double array), " +
        s"got ${other.size} args")
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketch aggregate over 60-bit hashes
  * (`Dedup.hash60` input, like [[BottomKSketch]]): m = 2^p registers,
  * register j = max over seen hashes with bucket j of
  * rho = 1 + leading-zero-count of the remaining (60−p) bits.
  *
  * The complement to KMV in the sketch family: KMV's bottom-k costs
  * O(k·8) bytes and supports set algebra on the VALUES; HLL costs a
  * fixed m bytes — independent of k-vs-cardinality tuning — and
  * merges by elementwise max, the textbook mergeable-state shape
  * (associative, commutative, idempotent), so map-side partial
  * aggregation collapses every executor's stream to m bytes and
  * re-aggregation (rollups, incremental views) never rescans data.
  *
  * Output is the raw register array (array<int>, 0 = empty) rather
  * than a float estimate: registers are EXACT integers — the result
  * is bit-identical under any partitioning, any merge order, and any
  * engine that replays the same hash — and downstream SQL derives the
  * estimator components exactly (`2^(maxRho+1−rho)` sums fit a
  * BIGINT). Sketches from different groups/batches union by
  * `zip_with(a, b, greatest)` in plain SQL.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  private val m = 1 << p
  // remainder width for 60-bit input hashes; rho ∈ [1, maxRho], and
  // maxRho (remainder == 0) is width + 1
  private val width = 60 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> width).toInt & (m - 1)
      val r = h & ((1L << width) - 1)
      val rho =
        if (r == 0L) width + 1
        else width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(r))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) { arr(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

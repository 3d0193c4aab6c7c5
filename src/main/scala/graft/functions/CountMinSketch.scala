package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch aggregate over 60-bit hashes (`Dedup.hash60`
  * input, like [[BottomKSketch]] / [[HllSketch]]): a `depth × width`
  * grid of exact BIGINT counters; each input increments one counter
  * per row, where row i's bucket is the i-th 15-bit slice of the hash
  * reduced mod `width` — so all `depth` hash functions derive from the
  * ONE md5-based hash both engines already share, and the oracle
  * replays bucketing with three integer ops (`(h >> 15i) & 0x7fff %
  * w`).
  *
  * The missing member of the frequency-sketch family here: KMV
  * (qd05) answers distinct-cardinality with set algebra, HLL (q49)
  * answers it in fixed bytes, Misra-Gries (q44) returns the heavy-key
  * CANDIDATES — CMS answers point frequency for ANY key after the
  * fact, with a one-sided guarantee (estimate ≥ truth, excess ≤
  * εn with probability 1−δ at width = e/ε, depth = ln 1/δ), and its
  * row-wise inner product upper-bounds equi-join sizes — the
  * planner-statistics use (q53).
  *
  * Counters are exact integers and merge is elementwise SUM —
  * associative and commutative, so map-side partial aggregation
  * collapses an executor's stream to `depth·width` longs and the
  * shuffle moves O(groups · d·w · 8) bytes regardless of input size.
  * NOTE the one contract difference from HLL/KMV: summed state is NOT
  * idempotent — feeding the same rows twice doubles the counts — so
  * streaming maintenance must run in update/complete output over an
  * exactly-once source (qst13 tests precisely this), where HLL's max
  * registers would also absorb replays.
  *
  * Output is the raw row-major counter grid (array<bigint>, length
  * d·w) rather than any derived estimate: counters are bit-identical
  * under any partitioning or merge order, sketches union by
  * `zip_with(a, b, +)` in plain SQL, and estimates are `least()` over
  * d `element_at` probes — all downstream-expressible.
  *
  * depth ≤ 4 because the 60-bit hash yields four independent 15-bit
  * slices; width ≤ 32768 so a slice covers any bucket index.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
  require(width >= 16 && width <= 32768, s"width must be in [16,32768], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val bucket = (((h >>> (15 * i)) & 0x7fffL) % width).toInt
        buf(i * width + bucket) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren.head)
}

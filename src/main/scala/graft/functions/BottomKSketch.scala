package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{TreeSet => JTreeSet}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) sketch aggregate: keeps the k smallest
  * distinct 60-bit hash values seen per group.
  *
  * The classic mergeable distinct-count/similarity sketch: the k-th
  * minimum estimates cardinality ((k−1)·M / h₍ₖ₎ over hash space M),
  * and two groups' sketches estimate jaccard via the bottom-k of their
  * union. The buffer is a bounded sorted set, merge is union-truncate —
  * associative and commutative, so map-side partial aggregation works
  * and results are identical under any partitioning (the determinism
  * property every graft aggregate keeps).
  *
  * Input: a LongType hash column (e.g. `Dedup.hash60`). Output:
  * ascending array<long> of at most k values.
  */
case class BottomKSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def trim(buf: JTreeSet[java.lang.Long]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(
      buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      trim(buf)
    }
    buf
  }

  override def merge(
      buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new JTreeSet[java.lang.Long]()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketch =
    copy(child = newChildren.head)
}

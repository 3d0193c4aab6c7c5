package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{HashMap => JHashMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary over a LongType key column:
  * at most `k` counters, with the mergeable-summaries guarantee
  * (Agarwal et al., PODS'12) that every key whose true frequency
  * exceeds n/(k+1) is present in the final summary — under ANY
  * partitioning and merge order, which is what makes it usable as the
  * candidate pass of an EXACT two-pass heavy-hitters query
  * ([[graft.operators.Funnel.heavyHitters]]): pass 1 reduces 100 TB to
  * ≤ k candidate keys with zero key shuffle (the summary is the only
  * state that moves), pass 2 exact-counts just the candidates.
  *
  * Update is classic MG: increment a held counter, else claim a free
  * one, else decrement ALL counters by one and drop zeros (each such
  * step "spends" k+1 occurrences, bounding undercount by n/(k+1)).
  * Merge adds counters then subtracts the (k+1)-th largest count from
  * every counter — one step back to ≤ k counters, preserving the
  * additive error bound.
  *
  * The SET of retained sub-threshold keys depends on partitioning (as
  * with any MG deployment); only the superset guarantee is stable.
  * Downstream exact verification makes the final query output
  * deterministic regardless. Output: ascending array<long> of the
  * retained keys.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_heavy_keys"

  override def createAggregationBuffer(): JHashMap[java.lang.Long, java.lang.Long] =
    new JHashMap[java.lang.Long, java.lang.Long]()

  override def update(
      buf: JHashMap[java.lang.Long, java.lang.Long],
      input: InternalRow): JHashMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size() < k) buf.put(key, 1L)
      else {
        // decrement-all step: spends one occurrence of k+1 distinct keys
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: JHashMap[java.lang.Long, java.lang.Long],
      other: JHashMap[java.lang.Long, java.lang.Long])
      : JHashMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size() > k) {
      // subtract the (k+1)-th largest count from all; ≤ k survive
      val counts = new Array[Long](buf.size())
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(buf.size() - (k + 1)) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= d) es.remove() else e.setValue(e.getValue - d)
      }
    }
    buf
  }

  override def eval(buf: JHashMap[java.lang.Long, java.lang.Long]): Any = {
    val keys = new Array[Long](buf.size())
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys.map(x => x: Any))
  }

  override def serialize(
      buf: JHashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): JHashMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new JHashMap[java.lang.Long, java.lang.Long]()
    (0 until n).foreach(_ => buf.put(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

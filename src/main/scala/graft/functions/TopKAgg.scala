package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score: double, id: long) pairs — the
  * mergeable-state replacement for `row_number() OVER (... ORDER BY
  * score DESC) <= k`.
  *
  * The window form SORTS every group's full row set: at 100 TB that is
  * a shuffle of the whole table followed by per-partition sorts, all
  * to keep k rows per group. This aggregate keeps at most 2k (score,
  * id) pairs per group per map task (compacting to k whenever the
  * buffer doubles — amortized O(log k) per row), so partial
  * aggregation collapses the data map-side and only k-pair summaries
  * shuffle. Merge concatenates and re-compacts; the operation is
  * associative and commutative over the (score DESC, id ASC) total
  * order, so the result is deterministic under ANY partitioning —
  * ties on score break by id.
  *
  * Output: array<struct<score double, id bigint>> of the top k in
  * (score DESC, id ASC) order — posexplode for (rank, id, score) rows.
  * Null scores/ids are skipped (SQL aggregate convention). NaN scores
  * follow java.lang.Double.compare (NaN sorts above +Inf — keep NaNs
  * out of score columns, as everywhere else in this engine).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  // (score DESC, id ASC)
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val sorted = buf.sortWith(lt)
      sorted.takeInPlace(k)
      sorted
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(
      buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf) else buf
    } else buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    compact(buf ++= other)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = compact(buf).sortWith(lt)
    new GenericArrayData(top.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val top = compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(top.length)
    top.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n + 1)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

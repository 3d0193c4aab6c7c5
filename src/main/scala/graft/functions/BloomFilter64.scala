package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic Bloom-filter machinery for join prefiltering — the
  * runtime-row-filter pattern a 100 TB join plan lives on: aggregate
  * the SMALL side's keys into an `nBits`-bit filter (the only state
  * that moves — a few hundred KB for millions of keys), broadcast it,
  * and drop big-side rows that cannot join BEFORE the shuffle. An
  * exact semi-join downstream removes the false positives, so the
  * composed operator ([[graft.operators.BloomJoin]]) is exact while
  * the shuffle sees only `fpr + selectivity` of the big side.
  *
  * Hashing is split-independent double hashing (Kirsch–Mitzenmatcher):
  * h_i = h1 + i·h2 (mod nBits) with h1/h2 the two 32-bit halves of
  * `finalizeMix64(key)` — pure integer math, identical on any engine,
  * partitioning, or merge order (the bit array OR is commutative), so
  * the filter bytes themselves are bit-reproducible.
  */
object BloomFilter64 {
  /** SplitMix64 finalizer — the standard 64-bit avalanche mix. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Set/probe positions for a key: k double-hashed bit indexes. */
  def positions(key: Long, nBits: Int, nHashes: Int): Array[Int] = {
    val m = mix64(key)
    val h1 = (m >>> 32).toInt
    val h2 = m.toInt | 1 // odd step so the probe walks all residues
    Array.tabulate(nHashes) { i =>
      val p = (h1 + i * h2) % nBits
      if (p < 0) p + nBits else p
    }
  }
}

/** Aggregate: OR the Bloom bits of every LongType key into an
  * `nBits`-bit filter. Output: BinaryType of nBits/8 bytes. */
case class BloomBuild(
    child: Expression,
    nBits: Int,
    nHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(nBits >= 8 && nBits % 8 == 0, "nBits must be a positive multiple of 8")
  require(nHashes >= 1 && nHashes <= 16, "nHashes in 1..16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](nBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val ps = BloomFilter64.positions(v.asInstanceOf[Long], nBits, nHashes)
      var i = 0
      while (i < ps.length) {
        buf(ps(i) >>> 3) = (buf(ps(i) >>> 3) | (1 << (ps(i) & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuild =
    copy(child = newChildren.head)
}

/** Scalar probe: true iff every Bloom position of `right` (LongType
  * key) is set in `left` (the BinaryType filter). False positives at
  * the filter's design rate; never false negatives. */
case class BloomMightContain(left: Expression, right: Expression, nHashes: Int)
    extends BinaryExpression {

  require(nHashes >= 1 && nHashes <= 16, "nHashes in 1..16")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(filterBytes: Any, key: Any): Any = {
    val buf = filterBytes.asInstanceOf[Array[Byte]]
    val ps = BloomFilter64.positions(key.asInstanceOf[Long], buf.length * 8, nHashes)
    var i = 0
    var ok = true
    while (ok && i < ps.length) {
      if ((buf(ps(i) >>> 3) & (1 << (ps(i) & 7))) == 0) ok = false
      i += 1
    }
    ok
  }

  // Per-row hot path on the big side of a prefiltered join — generate
  // the double-hash probe inline (identical int arithmetic to
  // positions(), so interpreted and codegen'd paths agree bit-for-bit).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (buf, key) => {
      val x = ctx.freshName("x")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val nb = ctx.freshName("nb")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |long $x = $key + 0x9e3779b97f4a7c15L;
         |$x = ($x ^ ($x >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$x = ($x ^ ($x >>> 27)) * 0x94d049bb133111ebL;
         |$x = $x ^ ($x >>> 31);
         |int $h1 = (int) ($x >>> 32);
         |int $h2 = ((int) $x) | 1;
         |int $nb = $buf.length * 8;
         |boolean $ok = true;
         |for (int $i = 0; $ok && $i < $nHashes; $i++) {
         |  int $p = ($h1 + $i * $h2) % $nb;
         |  if ($p < 0) $p += $nb;
         |  if (($buf[$p >>> 3] & (1 << ($p & 7))) == 0) $ok = false;
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

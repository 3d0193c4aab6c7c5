package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.BloomJoin

class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  test("bloom filter bytes are bit-reproducible across partitionings") {
    registered
    val keys = (1L to 5000L).toDF("k")
    val a = BloomJoin.keyBloom(keys.repartition(1), "k", nBits = 1 << 14)
      .head.getAs[Array[Byte]](0)
    val b = BloomJoin.keyBloom(keys.repartition(7), "k", nBits = 1 << 14)
      .head.getAs[Array[Byte]](0)
    assert(a.sameElements(b), "merge order must not change the filter (OR is commutative)")
  }

  test("no false negatives; false-positive rate near design point") {
    registered
    val n = 4000
    val keys = (1L to n.toLong).toDF("k")
    val bloom = BloomJoin.keyBloom(keys, "k", nBits = 1 << 16, nHashes = 5)
    // members: every key must probe true
    val members = BloomJoin.prefilter(keys, "k", bloom)
    assert(members.count() === n.toLong, "bloom filters never have false negatives")
    // non-members: fpr should be near the design point for
    // m/n = 65536/4000 ≈ 16.4 bits/key, k=5 → theoretical fpr ≈ 0.1%
    val outside = ((n + 1).toLong to (n + 20000).toLong).toDF("k")
    val fp = BloomJoin.prefilter(outside, "k", bloom).count()
    assert(fp < 20000 * 0.01, s"fpr too high: $fp/20000")
  }

  test("interpreted and codegen'd probes agree") {
    registered
    val keys = (1L to 1000L).toDF("k")
    val bloom = BloomJoin.keyBloom(keys, "k", nBits = 1 << 13, nHashes = 4)
    val bytes = bloom.head.getAs[Array[Byte]](0)
    val probe = (-2000L to 2000L).toDF("k")
      .join(broadcast(bloom))
      .select(col("k"),
        call_function("graft_bloom_contains", col("bloom_bits"), col("k"), lit(4)).as("hit"))
      .collect()
    probe.foreach { r =>
      val expected = {
        val ps = BloomFilter64.positions(r.getLong(0), bytes.length * 8, 4)
        ps.forall(p => (bytes(p >>> 3) & (1 << (p & 7))) != 0)
      }
      assert(r.getBoolean(1) === expected, s"key ${r.getLong(0)}")
    }
  }

  test("semiJoin / antiJoin are exact and partition big correctly") {
    registered
    val big = (1L to 10000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = (1L to 10000L by 13).toDF("sk") // 770 keys
    val semi = BloomJoin.semiJoin(big, "k", small, "sk", nBits = 1 << 13)
    val anti = BloomJoin.antiJoin(big, "k", small, "sk", nBits = 1 << 13)
    val expectSemi = big.join(small, big("k") === small("sk"), "left_semi")
    val expectAnti = big.join(small, big("k") === small("sk"), "left_anti")
    assert(rowsOf(semi) === rowsOf(expectSemi))
    assert(rowsOf(anti) === rowsOf(expectAnti))
    assert(semi.count() + anti.count() === big.count(), "semi ∪ anti partitions big")
  }

  test("prefilter survivors are a superset of matches, far below big") {
    registered
    val big = (1L to 20000L).toDF("k")
    val small = (1L to 20000L by 100).toDF("sk") // 200 keys, 1% selectivity
    val pre = BloomJoin.prefilter(big, "k", BloomJoin.keyBloom(small, "sk", nBits = 1 << 14))
    val c = pre.count()
    assert(c >= 200, "must keep every true match")
    assert(c < 2000, s"prefilter should cut ~99% of the big side, kept $c")
  }

  test("null keys never probe true and never poison the build") {
    registered
    val small = Seq(Some(1L), None, Some(2L)).toDF("sk")
    val bloom = BloomJoin.keyBloom(small, "sk", nBits = 1 << 10)
    val big = Seq(Some(1L), Some(3L), None).toDF("k")
    val kept = BloomJoin.prefilter(big, "k", bloom).collect().map(_.get(0))
    assert(kept.toSet === Set(1L), "null keys drop out (three-valued probe)")
  }
}

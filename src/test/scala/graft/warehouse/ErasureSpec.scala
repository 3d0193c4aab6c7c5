package graft.warehouse

import graft.SparkSuite

class ErasureSpec extends SparkSuite {
  import spark.implicits._

  test("erasurePlan: full FK cascade, untouched subjects absent") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L)
    ).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, 1), (10L, 2), (11L, 1), (12L, 1), (13L, 1)
    ).toDF("l_orderkey", "l_linenumber")
    val got = Erasure.erasurePlan(customer, orders, lineitem,
        Seq(1L).toDF("k"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      ("customer", 1L, None),
      ("orders", 10L, None), ("orders", 11L, None),
      ("lineitem", 10L, Some(1L)), ("lineitem", 10L, Some(2L)),
      ("lineitem", 11L, Some(1L))))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("erasurePlan: empty subject set yields an empty manifest") {
    val customer = Seq(1L).toDF("c_custkey")
    val orders = Seq((10L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1)).toDF("l_orderkey", "l_linenumber")
    val got = Erasure.erasurePlan(customer, orders, lineitem,
      Seq.empty[Long].toDF("k"))
    assert(got.count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}

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

  test("erasureAudit: cascade executes, counts reconcile, zero orphans") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L)
    ).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, 1), (10L, 2), (11L, 1), (12L, 1), (13L, 1)
    ).toDF("l_orderkey", "l_linenumber")
    val got = Erasure.erasureAudit(customer, orders, lineitem,
        Seq(1L).toDF("k"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("customer") == ((3L, 1L, 2L, 0L)))
    assert(got("orders") == ((4L, 2L, 2L, 0L)))
    assert(got("lineitem") == ((5L, 3L, 2L, 0L)))
    // the rewritten tables themselves
    val t = Erasure.erasureExecute(customer, orders, lineitem,
      Seq(1L).toDF("k"))
    assert(t.customer.as[Long].collect().toSet == Set(2L, 3L))
    assert(t.orders.select("o_orderkey").as[Long].collect().toSet ==
      Set(12L, 13L))
    assert(t.lineitem.select("l_orderkey").as[Long].collect().toSet ==
      Set(12L, 13L))
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

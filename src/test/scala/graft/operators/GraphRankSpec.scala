package graft.operators

import graft.SparkSuite

class GraphRankSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank: exact fixed-point values on a path + isolated node") {
    // path 1-2-3, node 4 isolated; n=4, scale 1e12, damping 85%, 2 iters
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val got = GraphRank.pageRank(nodes, "id", edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-computed: pr0 = 250e9 each; base = 37.5e9
    // iter1: s(1)=s(3)=125e9, s(2)=500e9
    //   p1(1)=p1(3)=143.75e9, p1(2)=462.5e9, p1(4)=base
    // iter2: s(2)=287.5e9, s(1)=s(3)=231.25e9
    assert(got == Map(
      1L -> 234062500000L, 2L -> 281875000000L,
      3L -> 234062500000L, 4L -> 37500000000L))
    // the hub of the path outranks the leaves; isolation = base rank only
    assert(got(2L) > got(1L) && got(4L) < got(1L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("pageRank: deterministic across runs and partitionings") {
    val nodes = (1L to 40L).toDF("id")
    val edges = (1L until 40L).map(i => (i, i % 7 + 34L)).toDF("a_id", "b_id")
    def run() = GraphRank.pageRank(nodes, "id", edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(); val b = run()
    assert(a == b)
    // integer mass never exceeds the injected total (floor dust only shrinks)
    assert(a.values.sum <= 1000000000000L)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("pageRank: deep iteration runs under the lineage cut") {
    // iters=12 crosses the cut threshold: each round's plan restarts
    // from an RDD scan instead of nesting 12 join+agg layers. The
    // result must still be the convergent ranking (hub > leaf > isolated).
    val nodes = (1L to 20L).toDF("id")
    val edges = (2L to 10L).map(i => (1L, i)).toDF("a_id", "b_id")
    val got = GraphRank.pageRank(nodes, "id", edges, iters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 20)
    assert(got(1L) > got(2L) && got(2L) > got(15L))
    assert(got.values.sum <= 1000000000000L)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("pageRank: empty node table is refused loudly") {
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      GraphRank.pageRank(nodes, "id", edges)
    }
    assert(e.getMessage.contains("at least one node"))
    graft.core.OpCache.releaseAll(blocking = true)
  }
}

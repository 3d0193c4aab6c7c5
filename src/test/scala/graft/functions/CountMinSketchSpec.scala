package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.{Dedup, Frequency}

class CountMinSketchSpec extends SparkSuite {
  import spark.implicits._

  private val D = 4
  private val W = 64

  private def sketch(df: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    df.agg(call_function("graft_cms", $"h", lit(D), lit(W)).as("regs"))
  }

  private def hashed(rows: Seq[String], n: Int) =
    rows.toDF("s").repartition(n).select(Dedup.hash60($"s").as("h"))

  test("grid is partitioning-invariant (1 vs 13 partitions, shuffled input)") {
    val rows = (1 to 3000).map(i => s"k${i % 97}")
    val a = sketch(hashed(rows, 1)).collect()(0).getSeq[Long](0)
    val b = sketch(hashed(scala.util.Random.shuffle(rows), 13))
      .collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("merge is addition: sketch(A ∪ B) == zip_with(sketch(A), sketch(B), +)") {
    GraftFunctions.register(spark)
    val va = (1 to 800).map(i => s"a${i % 50}")
    val vb = (1 to 600).map(i => s"b${i % 30}") ++ (1 to 200).map(i => s"a${i % 50}")
    val union = sketch(hashed(va ++ vb, 5)).collect()(0).getSeq[Long](0)
    val merged = sketch(hashed(va, 3)).select($"regs".as("ra"))
      .crossJoin(sketch(hashed(vb, 4)).select($"regs".as("rb")))
      .select(zip_with($"ra", $"rb", (a, b) => a + b).as("r"))
      .collect()(0).getSeq[Long](0)
    assert(union == merged)
  }

  test("every row of the grid sums to n (each input increments d counters)") {
    val rows = (1 to 2500).map(i => s"k$i")
    val grid = sketch(hashed(rows, 7)).collect()(0).getSeq[Long](0)
    (0 until D).foreach { i =>
      assert(grid.slice(i * W, (i + 1) * W).sum == rows.size)
    }
  }

  test("point estimates are a one-sided bound: true <= est, exact when alone") {
    // W >> distinct keys → most keys collision-free in at least one row
    val counts = Map("x" -> 137L, "y" -> 23L, "z" -> 1L)
    val rows = counts.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }.toSeq
    val est = Frequency.cmsPointEstimates(
      rows.zipWithIndex.map { case (k, _) => k.hashCode.toLong }.toDF("k"),
      "k", depth = D, width = 4096)
    val got = est.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.values.foreach { case (t, e) => assert(t <= e, s"true $t > est $e") }
    // 3 keys in 4·4096 counters: collisions essentially impossible
    got.values.foreach { case (t, e) => assert(t == e) }
  }

  test("join-size estimate bounds the exact self-join size") {
    val df = (1 to 2000).map(i => i % 37).toDF("k")
    val r = Frequency.cmsJoinSize(df, "k", df, "k", depth = D, width = 512)
      .collect()(0)
    val (tru, est) = (r.getLong(0), r.getLong(1))
    val exact = (0 until 37).map(k => {
      val c = (1 to 2000).count(_ % 37 == k).toLong; c * c
    }).sum
    assert(tru == exact)
    assert(est >= tru)
    // 37 keys in 512 buckets: the min over 4 rows should be near-exact
    assert(est <= tru * 2, s"est $est way above true $tru")
  }

  test("geometry must be literal and in range") {
    GraftFunctions.register(spark)
    val df = hashed(Seq("a", "b"), 1)
    intercept[Exception] {
      df.agg(call_function("graft_cms", $"h", lit(9), lit(64))).collect()
    }
    intercept[Exception] {
      df.agg(call_function("graft_cms", $"h", lit(4), lit(65536))).collect()
    }
  }
}

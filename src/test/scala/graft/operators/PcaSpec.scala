package graft.operators

import graft.SparkSuite

class PcaSpec extends SparkSuite {
  import spark.implicits._

  // 8-dim corpus stretched along dim 0 (±10) with small dim-1 noise:
  // the top principal component must align with e0.
  private def corpus() = (0 until 40).map { i =>
    val sign = if (i % 2 == 0) 1.0f else -1.0f
    val noise = (i % 5).toFloat * 0.1f
    (i.toLong, Array(sign * 10f, noise, 0f, 0f, 0f, 0f, 0f, 0f))
  }.toDF("vec_id", "embedding")

  test("pcaComponent: finds the dominant axis, unit norm") {
    val v = Similarity.pcaComponent(corpus(), "vec_id", "embedding", iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(v.size == 8)
    assert(math.abs(v(0)) > 0.99, s"dim0 weight ${v(0)}")
    val nrm = math.sqrt(v.values.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"norm $nrm")
    graft.core.OpCache.releaseAll()
  }

  test("pcaProjection: separates the two groups, partitioning-invariant") {
    val df = corpus()
    val proj = Similarity.pcaProjection(df, "vec_id", "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.OpCache.releaseAll()
    assert(proj.size == 40)
    // even ids (+10 on dim0) and odd ids (-10) land on opposite sides
    val evens = proj.filter(_._1 % 2 == 0).values
    val odds = proj.filter(_._1 % 2 == 1).values
    assert(evens.forall(p => p * evens.head > 0))
    assert(odds.forall(p => p * odds.head > 0))
    assert(evens.head * odds.head < 0)
    // bit-identical at a different partitioning
    val proj7 = Similarity.pcaProjection(df.repartition(7), "vec_id",
      "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.OpCache.releaseAll()
    assert(proj7 == proj)
  }

  test("pcaVarianceReport: axis-concentrated corpus explains ~everything") {
    val r = Similarity.pcaVarianceReport(corpus(), "vec_id", "embedding",
      iters = 3).collect()(0)
    val (total, pc1, explained) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    graft.core.OpCache.releaseAll()
    assert(pc1 <= total, s"projection ss $pc1 exceeds total $total")
    // dim-0 carries ±10 signal, dim-1 only 0.1-scale noise
    assert(explained > 0.99, s"explained $explained")
  }
}

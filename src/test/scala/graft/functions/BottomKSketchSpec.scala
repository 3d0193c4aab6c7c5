package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup

class BottomKSketchSpec extends SparkSuite {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftFunctions.register(spark)
    df.groupBy($"g").agg(call_function("graft_bottom_k", $"h", lit(k)).as("sk"))
  }

  test("sketch keeps the k smallest distinct values, sorted ascending") {
    val df = Seq((1, 50L), (1, 10L), (1, 30L), (1, 10L), (1, 20L), (1, 40L))
      .toDF("g", "h")
    val sk = sketchOf(df, 3).collect()(0).getSeq[Long](1)
    assert(sk == Seq(10L, 20L, 30L))
  }

  test("partitioning invariance: identical sketch at 1 and 13 partitions") {
    val rows = (1 to 2000).map(i => (i % 3, Dedup.MinhashP - i * 1000L))
    val a = sketchOf(rows.toDF("g", "h").repartition(1), 16)
    val b = sketchOf(scala.util.Random.shuffle(rows).toDF("g", "h").repartition(13), 16)
    assert(rowsOf(a) == rowsOf(b))
  }

  test("KMV distinct estimate lands near the truth") {
    GraftFunctions.register(spark)
    val n = 5000
    val df = (1 to n).map(i => (1, s"item_$i")).toDF("g", "s")
      .select($"g", Dedup.hash60($"s").as("h"))
    val k = 64
    val M = math.pow(2.0, 60)
    val kth = sketchOf(df, k).select(element_at($"sk", k)).collect()(0).getLong(0)
    val est = (k - 1).toDouble * M / kth.toDouble
    assert(math.abs(est - n) / n < 0.35, s"estimate $est vs $n")
  }

  test("sql surface: usable from spark.sql after registration") {
    GraftFunctions.register(spark)
    Seq((1, 5L), (1, 3L)).toDF("g", "h").createOrReplaceTempView("bk_in")
    val out = spark.sql(
      "SELECT graft_bottom_k(h, 1) AS sk FROM bk_in GROUP BY g")
      .collect()(0).getSeq[Long](0)
    assert(out == Seq(3L))
  }
}

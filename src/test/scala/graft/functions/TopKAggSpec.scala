package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(call_function("graft_topk", $"score", $"id", lit(k)).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rnk"), $"col.id".as("id"), $"col.score".as("score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

  test("matches the window form, ties broken by id, under any partitioning") {
    registered
    // group 1: distinct scores; group 2: all-tied scores; group 3: fewer than k
    val rows = Seq(
      (1, 10.0, 5L), (1, 30.0, 3L), (1, 20.0, 9L), (1, 25.0, 1L), (1, 30.0, 7L),
      (2, 1.0, 4L), (2, 1.0, 2L), (2, 1.0, 9L), (2, 1.0, 1L),
      (3, 7.0, 42L))
    val df = rows.toDF("g", "score", "id")
    val expect = df.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"score".desc, $"id")))
      .filter($"rnk" <= 3)
      .select($"g", $"rnk", $"id", $"score")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(topk(df, 3).toSeq == expect.toSeq)
    assert(topk(df.repartition(7), 3).toSeq == expect.toSeq)
    assert(topk(df.repartition(1), 3).toSeq == expect.toSeq)
  }

  test("nulls are skipped; buffer compaction handles many rows per group") {
    registered
    // 5000 rows, scores cycle 0..96 — top-2: score 96.0, ids 96 and 193
    val df = (1 to 5000).map(i => (1, (i % 97).toDouble, i.toLong)).toDF("g", "score", "id")
    val got = topk(df, 2)
    assert(got.toSeq == Seq((1, 1, 96L, 96.0), (1, 2, 193L, 96.0)))
    val withNulls = df.union(
      Seq((1, 50.0, 7L)).toDF("g", "score", "id")
        .select($"g", lit(null).cast("double").as("score"), $"id"))
    assert(topk(withNulls, 2).toSeq == got.toSeq, "null scores must be skipped")
  }
}

package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.expr.Exprs

class PartitioningSpec extends SparkSuite {
  import spark.implicits._

  test("parallelize raises partition count for under-split input, no-op otherwise") {
    val small = Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
    val up = Partitioning.parallelize(small, col("k"))
    assert(up.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    val already = Seq((1, "a")).toDF("k", "v")
      .repartition(spark.sessionState.conf.numShufflePartitions + 5, col("k"))
    assert(Partitioning.parallelize(already, col("k")).rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions + 5)
  }

  test("twoPhaseAgg matches direct aggregation (exact decimal sums)") {
    // one hot key (skew) + several cold keys
    val rows = (1 to 5000).map(i => (if (i % 10 == 0) "cold" + (i % 7) else "HOT", i * 0.01))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(Exprs.exactSum($"v").as("s"), count(lit(1)).as("n"))
    val salted = Partitioning.twoPhaseAgg(df, Seq("k"), buckets = 16)(
      partial = Seq(Exprs.exactSum($"v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(Exprs.exactSum($"ps").as("s"), sum($"pn").as("n")))
    assert(rowsOf(direct) == rowsOf(salted))
  }

  test("globalRank equals row_number over the total order, across many partitions") {
    // keys deliberately collide so the id tiebreak matters; enough rows
    // to spread over every range partition
    val rows = (1 to 5000).map(i => (i.toLong, s"k${i % 97}"))
    val df = rows.toDF("id", "key").repartition(13)
    val ranked = Partitioning.globalRank(df, "rnk", col("key"), col("id"))
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id"),
        r.getAs[Long]("rnk")))
    val expect = rows.map { case (id, k) => (k, id) }.sorted
      .zipWithIndex.map { case ((k, id), i) => (k, id, i + 1L) }
    assert(ranked.sortBy(_._3).toSeq == expect)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("globalRank on an empty frame returns empty") {
    val df = Seq.empty[(Long, String)].toDF("id", "key")
    assert(Partitioning.globalRank(df, "rnk", col("key"), col("id")).count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}

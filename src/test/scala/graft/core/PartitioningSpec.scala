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
}

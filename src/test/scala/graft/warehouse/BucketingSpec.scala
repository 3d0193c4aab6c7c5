package graft.warehouse

import org.apache.spark.sql.functions._
import graft.SparkSuite

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def writePair(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec_").toString
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L by 3).map(i => (i, i * 2)).toDF("rk", "rv")
    Bucketing.writeBucketed(left, "graft_t_left", s"$base/l", "k", 4)
    Bucketing.writeBucketed(right, "graft_t_right", s"$base/r", "rk", 4)
    ("graft_t_left", "graft_t_right")
  }

  test("co-bucketed join is exchange-free and exact") {
    val (lt, rt) = writePair()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.bucketedJoin(spark, lt, rt, "k", "rk")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(1200)}")
      // correctness vs the plain (shuffled) join on the raw frames
      val expect = spark.table(lt).join(
        spark.table(rt), col("k") === col("rk"), "inner")
      assert(rowsOf(joined) === rowsOf(expect))
      assert(joined.count() === ((2000 / 3) + 1).toLong)
    }
  }

  test("bucket pruning serves point lookups (SelectedBucketsCount)") {
    val (lt, _) = writePair()
    // autoBucketedScan drops the bucketed layout when no operator needs
    // the partitioning; force it so the pruner sees the buckets
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val q = spark.table(lt).filter(col("k") === 42L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"point lookup should read one bucket:\n${plan.take(1200)}")
      assert(q.count() === 1L)
    }
  }

  test("mismatched bucket widths still join correctly (falls back to shuffle)") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec2_").toString
    val left = (1L to 500L).toDF("k")
    val right = (1L to 500L by 5).toDF("rk")
    Bucketing.writeBucketed(left, "graft_t_l2", s"$base/l", "k", 4)
    Bucketing.writeBucketed(right, "graft_t_r2", s"$base/r", "rk", 8)
    val joined = Bucketing.bucketedJoin(spark, "graft_t_l2", "graft_t_r2", "k", "rk")
    assert(joined.count() === 100L)
  }
}

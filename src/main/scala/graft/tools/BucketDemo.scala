package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Evidence for the SCALING.md claim that bucketing deletes the
  * fact-to-fact join shuffle: write lineitem and orders bucketed on the
  * join key, join the bucketed tables, and count Exchange operators in
  * both physical plans.
  *
  * sbt -batch "runMain graft.tools.BucketDemo [sfDir] [buckets]"
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", wh)
      // disable auto-broadcast so the demo shows shuffle-vs-bucket,
      // not broadcast winning on the small test tables
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("- Exchange") || l.startsWith("Exchange"))

    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(ord("o_orderstatus")).count()

    li.write.mode("overwrite").bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")
    val lib = spark.table("li_b")
    val ordb = spark.table("ord_b")
    val bucketed = lib.join(ordb, lib("l_orderkey") === ordb("o_orderkey"))
      .groupBy(ordb("o_orderstatus")).count()

    val (pn, bn) = (plain.count(), bucketed.count())
    require(pn == bn, s"result mismatch $pn vs $bn")
    println(s"""{"metric":"bucket_demo","plain_exchanges":${exchanges(plain)},""" +
      s""""bucketed_exchanges":${exchanges(bucketed)},"rows":$pn,"buckets":$buckets}""")
    spark.stop()
  }
}

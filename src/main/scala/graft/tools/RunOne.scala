package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dev harness: run one registry query by name, optionally print the
  * formatted physical plan, and time a few repetitions.
  *
  * sbt -batch "runMain graft.tools.RunOne <query> [sfDir] [reps]"
  * GRAFT_EXPLAIN=1 to dump the plan.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = Registry.byName(name).run(spark, sfDir)
    println(f"[runone] $name construct: ${(System.nanoTime() - tc) / 1e9}%.2f s")
    if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[runone] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}

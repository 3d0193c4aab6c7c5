package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev harness: time connected components over the scaled corpus pair
  * graph staged by ScaleSmoke.
  *
  * sbt -batch "runMain graft.tools.CcProfile [stagedDir]"
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale_x10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text")
      .select($"a_id", $"b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"[cc] pairs: ${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val self = docs.select($"doc_id".as("a_id"), $"doc_id".as("b_id"))
    val t1 = System.nanoTime()
    val n = Dedup.connectedComponents(pairs.unionByName(self), "a_id", "b_id")
      .count()
    println(f"[cc] components over $n nodes in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}

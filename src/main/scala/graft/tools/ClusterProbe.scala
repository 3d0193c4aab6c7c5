package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing probe for [[graft.operators.Dedup.corpusClusters]]
  * over a ScaleSmoke-staged directory — splits the collapse / star /
  * rep-LSH / closure stages so a factor-level anomaly can be pinned to
  * a stage instead of guessed at.
  *
  * sbt -batch "runMain graft.tools.ClusterProbe /tmp/graft_scale_x30"
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(thunk: => A): A = {
      val t0 = System.nanoTime()
      val r = thunk
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val hashes = graft.core.OpCache.persist(
      docs.select(col("doc_id"), md5(col("text").cast("binary")).as("__h")))
    t("hash_collapse")(hashes.count())
    val groups = hashes.groupBy(col("__h")).agg(min(col("doc_id")).as("keep_id"))
    t("groups")(groups.count())
    val memberEdges = graft.core.OpCache.persist(
      hashes.join(groups, Seq("__h"))
        .select(col("keep_id").as("a"), col("doc_id").as("b")))
    t("member_edges")(memberEdges.count())
    val repDocs = docs.join(groups.select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val repPairs = graft.core.OpCache.persist(
      Dedup.lshNearDupPairs(repDocs, "doc_id", "text")
        .select(col("a_id").as("a"), col("b_id").as("b")))
    t("rep_lsh_pairs")(repPairs.count())
    t("closure")(Dedup.connectedComponents(
      memberEdges.unionByName(repPairs), "a", "b").count())
    t("packaged_corpusClusters")(
      Dedup.corpusClusters(docs, "doc_id", "text").count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev probe: decompose qt36's cost into pipeline vs sharding-stage
  * work. sbt -batch "runMain graft.tools.ProbeManifest [sfDir]" */
object ProbeManifest {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(thunk: => Long): Unit = {
      graft.core.OpCache.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = thunk
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = graft.core.Partitioning.parallelize(
      Tables.load(spark, dir, "documents"), col("doc_id"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    def pipeline() = graft.operators.Curation.trainingPipelineDecontaminated(
      corpus, bench, "doc_id", "text", "lang", "source", Seq("en", "es", "fr"),
      Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
      defaultPermille = 100, maxLen = 1024, nStrata = 4, maxSharedFp = 0L)
    // warm JVM/codegen
    t("warm_pipeline")(pipeline().count())
    t("pipeline_cold")(pipeline().count())
    t("manifest_cold") {
      graft.operators.Curation.exportManifest(
        corpus, bench, "doc_id", "text", "lang", "source", Seq("en", "es", "fr"),
        Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
        defaultPermille = 100, maxLen = 1024, nStrata = 4,
        maxSharedFp = 0L, shardBudget = 1024L).count()
    }
    // deliberate CONTRAST case: persists the UN-cut pipeline frame, so
    // every shard-stage job re-analyzes the full composed plan — the
    // failure mode exportManifest's lineage cut removes (compare with
    // manifest_cold above)
    t("shards_on_cached_pipeline_uncut") {
      val p = graft.core.OpCache.persist(pipeline())
      p.count()
      val t0 = System.nanoTime()
      val seqs = p.groupBy(col("stratum"), col("seq_id"))
        .agg(sum(col("n_tokens")).cast("long").as("seq_tokens"))
        .select(concat_ws(":", col("stratum"), col("seq_id")).as("seq_key"),
          col("seq_tokens"))
      val n = graft.operators.Sharding
        .tokenShards(seqs, "seq_key", col("seq_tokens"), 1024L).count()
      println(f"[probe]   (shard stage alone: ${(System.nanoTime() - t0) / 1e9}%.2f s)")
      n
    }
    spark.stop()
  }
}

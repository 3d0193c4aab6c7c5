package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.demo.TpchShipments
import graft.validate.Validation

/** Dev harness: break the flagship pipeline's cold cost into stages.
  *
  * sbt -batch "runMain graft.tools.ProfilePipeline [sfDir]"
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val p = TpchShipments.pipeline(sfDir)
    val raw = timed("retrieve (lazy)") { p.retrieve(spark) }
    timed("retrieve count") { raw.count() }
    val shaped = timed("transform (lazy)") {
      TpchShipments.ShipmentsTransformer.transform(raw)
    }
    timed("transform count") { shaped.count() }
    val aligned = timed("align (lazy)") {
      Validation.align(Validation.dataSchema.preParse(
        shaped.withColumn("provider",
          org.apache.spark.sql.functions.lit("tpch_shipments"))),
        Validation.dataSchema)
    }
    timed("align count") { aligned.count() }
    timed("validate (eager)") {
      Validation.validate(shaped.withColumn("provider",
        org.apache.spark.sql.functions.lit("tpch_shipments")),
        Validation.dataSchema)
    }
    timed("full run construct") { p.run(spark) }
    spark.stop()
  }
}

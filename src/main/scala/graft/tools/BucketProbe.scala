package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val docs = graft.core.Tables.load(spark, dir, "documents")
      val aud = graft.operators.Multimodal.decodedAudioSignatures(
        graft.operators.Multimodal.syntheticAudio(docs, "doc_id", "text"))
        .select(col("media_id"), col("env_hash").as("ahash"))
      val img = graft.operators.Multimodal.decodedSignatures(
        graft.operators.Multimodal.syntheticImages(docs, "doc_id", "text"))
        .select(col("media_id"), col("ahash"))
      Seq(("audio", aud), ("image", img)).foreach { case (name, h) =>
        val nBands = 11
        val banded = h.select(col("media_id"),
          explode(array((0 until nBands).map { b =>
            val lo = b * 60 / nBands; val hi = (b + 1) * 60 / nBands
            struct(lit(b).as("band"),
              shiftright(col("ahash"), lo)
                .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bkey"))
          }: _*)).as("bs"))
          .select(col("bs.band").as("band"), col("bs.bkey").as("bkey"))
        val m = banded.groupBy(col("band"), col("bkey")).count()
          .agg(max("count"), expr("percentile(count, 0.99)")).head()
        println(s"[bucket] $dir $name maxBucket=${m.get(0)} p99=${m.get(1)}")
      }
    }
    spark.stop()
  }
}

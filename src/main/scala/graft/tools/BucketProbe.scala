package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-bucket distribution probe for the perceptual hamming join —
  * the measurement behind the round-11 wider-hash fix. For each corpus
  * scale and modality it bands the signatures BOTH ways and reports
  * max/p99 bucket size and the candidate-pair volume Σ c·(c−1)/2:
  *  - "60bit": the retired single-word banding (11 × 5–6-bit keys,
  *    704-key space) — kept as the comparison baseline;
  *  - "120bit": the live [[graft.operators.Multimodal]] banding
  *    (11 × 10–11-bit keys over both words, 21 504-key space).
  * A 120-bit max far below hammingPairs' 4096 backstop cap is the
  * structural capped == uncapped argument at that scale. */
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
        .select(col("media_id"), col("env_hash").as("ahash"),
          col("env_hash2").as("ahash2"))
      val img = graft.operators.Multimodal.decodedSignatures(
        graft.operators.Multimodal.syntheticImages(docs, "doc_id", "text"))
        .select(col("media_id"), col("ahash"), col("ahash2"))
      Seq(("audio", aud), ("image", img)).foreach { case (name, h) =>
        val nBands = 11
        val narrow = h.select(col("media_id"),
          explode(array((0 until nBands).map { b =>
            val lo = b * 60 / nBands; val hi = (b + 1) * 60 / nBands
            struct(lit(b).as("band"),
              shiftright(col("ahash"), lo)
                .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bkey"))
          }: _*)).as("bs"))
          .select(col("bs.band").as("band"), col("bs.bkey").as("bkey"))
        val wide = h.select(col("media_id"),
          explode(array((0 until nBands).map { b =>
            struct(lit(b).as("band"),
              graft.operators.Multimodal
                .bandKey120(col("ahash"), col("ahash2"), b, nBands).as("bkey"))
          }: _*)).as("bs"))
          .select(col("bs.band").as("band"), col("bs.bkey").as("bkey"))
        Seq(("60bit", narrow), ("120bit", wide)).foreach { case (kind, banded) =>
          val m = banded.groupBy(col("band"), col("bkey")).count()
            .agg(max("count"), expr("percentile(count, 0.99)"),
              sum(expr("count * (count - 1) / 2"))).head()
          println(s"[bucket] $dir $name $kind maxBucket=${m.get(0)} " +
            s"p99=${m.get(1)} candPairs=${m.get(2)}")
        }
      }
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Empty- and degenerate-input behavior of the round-5 operators: a
  * curation pipeline meets empty partitions, fresh corpora, and
  * batches with nothing to admit as a matter of course — operators
  * must return empty/identity results, not throw. */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val someDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten eleven"))
    .toDF("doc_id", "text")

  test("dedup operators return empty on an empty corpus") {
    assert(Dedup.exactDupGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.lshNearDupPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.corpusClusters(emptyDocs, "doc_id", "text").count() == 0)
    assert(Overlap.duplicatedSpanStats(emptyDocs, "doc_id", "text").count() == 0)
    assert(QualityRules.repetitionStats(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("incrementalDedup admits everything against an empty corpus") {
    val kept = Dedup.incrementalDedup(emptyDocs, someDocs, "doc_id", "text")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("incrementalDedup of an empty batch returns empty") {
    assert(Dedup.incrementalDedup(someDocs, emptyDocs, "doc_id", "text")
      .count() == 0)
  }

  test("contaminationHits with an empty benchmark keeps all docs clean") {
    val got = Overlap.contaminationHits(someDocs, emptyDocs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("asofBackward with an empty right side yields all-null payload") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts").withColumn("k", lit("a"))
    val right = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "rts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", "rts", Seq("v"))
      .select("v").as[Option[Double]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("connectedComponents of an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("curate of an empty corpus is empty") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(graft.operators.Curation
      .curate(docs, "doc_id", "text", "lang", Seq("en")).count() == 0)
  }

  test("sequencePack of an empty corpus is empty") {
    assert(Packing.sequencePack(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("trainingPipeline of an empty corpus is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.operators.Curation.trainingPipeline(
      empty, "doc_id", "text", "lang", "source", Seq("en"),
      Map("src0" -> 500), defaultPermille = 100).count() == 0)
  }
}

package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.SparkSuite
import graft.operators.Dedup

/** Operator cache lifecycle: persists made on the caller's behalf must
  * be releasable, so a long-lived session doesn't accumulate resident
  * frames it has no handle to drop. */
class OpCacheSpec extends SparkSuite {

  private def docs = {
    import spark.implicits._
    (1 to 40).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta doc $i"))
      .toDF("doc_id", "text")
  }

  test("releaseAll drops every frame an operator persisted") {
    OpCache.releaseAll(blocking = true)
    val before = sc.getPersistentRDDs.size
    // blockedJaccardPairs persists its inverted index via OpCache
    Dedup.blockedJaccardPairs(
      docs.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text"))),
      "doc_id", "text", "lang", "n_chars").count()
    assert(sc.getPersistentRDDs.size > before,
      "operator should have persisted an intermediate")
    assert(OpCache.liveCount > 0)
    OpCache.releaseAll(blocking = true)
    assert(OpCache.liveCount == 0)
    assert(sc.getPersistentRDDs.size == before,
      "release must return the cache to its pre-operator state")
  }

  test("iterative CC tracks its final persisted state for release") {
    import spark.implicits._
    OpCache.releaseAll(blocking = true)
    val before = sc.getPersistentRDDs.size
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    Dedup.connectedComponents(edges, "a", "b").count()
    Dedup.connectedComponentsStars(edges, "a", "b").count()
    OpCache.releaseAll(blocking = true)
    assert(sc.getPersistentRDDs.size == before,
      "CC final label/edge frames must be released, not leaked")
  }

  test("StorageLevel.NONE disables operator caching entirely") {
    OpCache.releaseAll(blocking = true)
    val before = sc.getPersistentRDDs.size
    OpCache.setStorageLevel(StorageLevel.NONE)
    try {
      val d = docs.withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
      val withCache = Dedup.blockedJaccardPairs(
        d, "doc_id", "text", "lang", "n_chars").collect().toSet
      assert(sc.getPersistentRDDs.size == before,
        "NONE policy must not create cached RDDs")
      OpCache.setStorageLevel(StorageLevel.MEMORY_AND_DISK)
      val cached = Dedup.blockedJaccardPairs(
        d, "doc_id", "text", "lang", "n_chars").collect().toSet
      assert(withCache == cached, "cache policy must not change results")
    } finally {
      OpCache.setStorageLevel(StorageLevel.MEMORY_AND_DISK)
      OpCache.releaseAll(blocking = true)
    }
  }
}

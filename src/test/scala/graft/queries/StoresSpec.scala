package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The stored-label memo contract: the clustering RUN happens once per
  * (process, corpus dir); every later caller gets the parquet
  * read-back, and the read-back equals a fresh inline clustering. */
class StoresSpec extends SparkSuite {

  test("corpusLabels builds once per dir and re-reads the same store") {
    val dir = "/root/testdata/sf0.001"
    val a = Stores.corpusLabels(spark, dir)
    val b = Stores.corpusLabels(spark, dir)
    def storePath(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    val (pa, pb) = (storePath(a), storePath(b))
    assert(pa.nonEmpty && pa == pb,
      s"second call must read the SAME stored parquet, not rebuild: $pa vs $pb")
    // the store equals a fresh inline clustering, bit for bit
    val inline = graft.operators.Dedup.corpusClusters(
      graft.core.Tables.load(spark, dir, "documents"), "doc_id", "text")
    val asSet = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("node"), col("component"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(a) == asSet(inline),
      "stored labels must equal the inline clustering")
    graft.core.OpCache.releaseAll(blocking = true)
  }
}

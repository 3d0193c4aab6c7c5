package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-side implementation plus (where
  * SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on
  * the same parquet tables. Column names/types are aligned between the
  * two sides; float outputs are constructed so both engines produce
  * bit-identical doubles (exact decimal sums, fixed fold order).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All queries, in SURVEY.md §2 inventory order then beyond-reference ops. */
  lazy val all: Seq[Q] =
    RelationalQueries.all ++ WarehouseQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ StreamingQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}

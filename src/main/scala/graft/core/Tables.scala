package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader over a scale-factor directory.
  *
  * Mirrors the reference's storage read dispatch
  * (`storage/_base.py:72-109`): a table name resolves to one parquet
  * file (or, natively in Spark, a directory of parquet part-files —
  * the reference's "directory union" S2 semantics are free here).
  *
  * The `events` table carries TIMESTAMP(NANOS) which Spark 4 does not
  * read natively: we read nanos as INT64 (legacy conf) and normalize to
  * a microsecond timestamp (test data has no sub-microsecond parts, so
  * this is lossless and matches DuckDB's ns→us cast).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}

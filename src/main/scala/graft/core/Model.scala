package graft.core

import org.apache.spark.sql.types._

/** Canonical data model (reference: `validation.py:64-112`).
  *
  * One fact abstraction — the observation: one numeric value for one
  * (indicator, country, year, dimension) coordinate. Every source fans
  * in to this long-format table; the warehouse star schema is a
  * normalisation of it.
  */
final case class Observation(
    provider: String,
    indicator_name: String,
    country_code: String,
    year: Int,
    dimension: String,
    value: Double,
    source: Option[String])

/** Indicator metadata (reference: `validation.py:33-61`). */
final case class IndicatorMeta(code: String, name: String, unit: Option[String])

object Model {
  /** Canonical observation StructType with reference nullability. */
  val observationSchema: StructType = StructType(Seq(
    StructField("provider", StringType, nullable = false),
    StructField("indicator_name", StringType, nullable = false),
    StructField("country_code", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("dimension", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("source", StringType, nullable = true)))

  /** Composite uniqueness key (reference: `validation.py:107`). */
  val observationKey: Seq[String] =
    Seq("indicator_name", "country_code", "year", "dimension")

  val metadataSchema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("unit", StringType, nullable = true)))

  val metadataKey: Seq[String] = Seq("code", "name", "unit")
}

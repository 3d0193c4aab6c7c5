package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Countries

/** Star-schema serving model (reference `database/entities.py` +
  * `notebooks/database.ipynb`).
  *
  * - `country`: fixed ids = M49 codes, seeded from the packaged
  *   reference table (DDL-time seed, `entities.py:135-160`).
  * - `indicator` / `dimension`: distinct natural keys with dense
  *   surrogate ids. The id window runs over the *distinct dim rows* —
  *   single-partition but dim-sized by definition (A5).
  * - `series`: fact with FK resolution via broadcast inner joins (J1),
  *   composite PK (country_id, indicator_id, dimension_id, year).
  * - `observation`: the denormalising left-outer view (J2), registered
  *   as a temp view so the full Spark SQL surface applies.
  */
object StarSchema {

  final case class Warehouse(
      country: DataFrame, indicator: DataFrame,
      dimension: DataFrame, series: DataFrame)

  def countryTable(spark: SparkSession): DataFrame =
    Countries.dataFrame(spark).select(
      col("m49").as("id"), col("iso2"), col("iso3"), col("name"),
      col("region"), col("subregion"), col("ldc"), col("lldc"), col("sids"))

  def build(spark: SparkSession, obs0: DataFrame): Warehouse = {
    // obs feeds three derivations (two dim distincts + the fact join):
    // persist so its upstream pipeline executes once, not three times
    val obs = graft.core.OpCache.persist(obs0)
    val country = countryTable(spark)
    // indicator.name is the UNIQUE key (reference `entities.py:55`
    // declares name unique; provider is an attribute). min(provider)
    // resolves the pathological case of two providers emitting the same
    // name — one dim row per name, so the FK join below cannot fan out.
    val indicator = graft.core.Partitioning.denseIds(
      obs.select(col("indicator_name").as("name"), col("provider"))
        .groupBy(col("name")).agg(min(col("provider")).as("provider")),
      "id", col("name"))
    val dimension = graft.core.Partitioning.denseIds(
      obs.select(col("dimension").as("name")).distinct(),
      "id", col("name"))
    val series = obs
      .join(broadcast(country.select(col("id").as("country_id"),
        col("iso3").as("country_code"))), Seq("country_code"))
      .join(broadcast(indicator.select(col("id").as("indicator_id"),
        col("name").as("indicator_name"))), Seq("indicator_name"))
      .join(broadcast(dimension.select(col("id").as("dimension_id"),
        col("name").as("dimension"))), Seq("dimension"))
      .select(col("country_id"), col("indicator_id"), col("dimension_id"),
        col("year"), col("value").cast("float").as("value"))
    Warehouse(country, indicator, dimension, series)
  }

  /** The `observation` view (`entities.py:98-132`): series left-outer
    * joined to all three dims, denormalised for group-by analytics. */
  def observationView(w: Warehouse): DataFrame =
    w.series
      .join(w.country.select(col("id").as("country_id"),
        col("iso3").as("country_code"), col("name").as("country_name"),
        col("region"), col("subregion"), col("ldc"), col("lldc"), col("sids")),
        Seq("country_id"), "left_outer")
      .join(w.indicator.select(col("id").as("indicator_id"),
        col("name").as("indicator_name"), col("provider").as("indicator_provider")),
        Seq("indicator_id"), "left_outer")
      .join(w.dimension.select(col("id").as("dimension_id"),
        col("name").as("dimension_name")),
        Seq("dimension_id"), "left_outer")

  def registerViews(spark: SparkSession, w: Warehouse): Unit = {
    w.country.createOrReplaceTempView("country")
    w.indicator.createOrReplaceTempView("indicator")
    w.dimension.createOrReplaceTempView("dimension")
    w.series.createOrReplaceTempView("series")
    observationView(w).createOrReplaceTempView("observation")
  }
}

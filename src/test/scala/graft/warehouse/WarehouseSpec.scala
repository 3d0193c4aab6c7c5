package graft.warehouse

import graft.SparkSuite

class WarehouseSpec extends SparkSuite {
  import spark.implicits._

  private def obs = Seq(
    ("p1", "GDP [X]", "AFG", 2019, "Total", 1.0, null: String),
    ("p1", "GDP [X]", "NAM", 2019, "Total", 2.0, null: String),
    ("p1", "Life expectancy [Y]", "AFG", 2019, "Female", 70.0, null: String))
    .toDF("provider", "indicator_name", "country_code", "year", "dimension",
      "value", "source")

  test("star schema build: stable dim ids, FK-resolved series") {
    val w = StarSchema.build(spark, obs)
    val ind = w.indicator.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ind == Map("GDP [X]" -> 1L, "Life expectancy [Y]" -> 2L))
    val dim = w.dimension.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dim == Map("Female" -> 1L, "Total" -> 2L))
    assert(w.series.count() == 3)
    // country ids are M49 codes from the packaged table
    val afgSeries = w.series.filter("country_id = 4") // AFG m49
    assert(afgSeries.count() == 2)
  }

  test("observation view denormalises and answers the reference's serving query") {
    val w = StarSchema.build(spark, obs)
    StarSchema.registerViews(spark, w)
    val report = spark.sql(
      """SELECT count(*) AS n, indicator_provider
        |FROM observation GROUP BY indicator_provider""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(report.toSeq == Seq((3L, "p1")))
    val regions = spark.sql(
      "SELECT DISTINCT region FROM observation WHERE country_code = 'NAM'")
      .collect().map(_.getString(0))
    assert(regions.toSeq == Seq("Africa"))
  }

  test("upsert SQL generation (K5/K6)") {
    assert(JdbcUpsert.upsertSql("series",
      Seq("country_id", "indicator_id", "year", "value"),
      Seq("country_id", "indicator_id", "year")) ==
      "INSERT INTO series (country_id, indicator_id, year, value) " +
        "VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (country_id, indicator_id, year) DO UPDATE SET value = EXCLUDED.value")
    assert(JdbcUpsert.insertIgnoreSql("dimension", Seq("name"), Seq("name")) ==
      "INSERT INTO dimension (name) VALUES (?) ON CONFLICT (name) DO NOTHING")
  }
}

package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkSuite
import graft.storage.{LocalStorage, Storage}
import graft.transform.WideYearColumnsTransformer

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def wideFixture = Seq(
    ("AFG", "GDP (current US$)", "NY.GDP", "1.5", "2.5"),
    ("NAM", "GDP (current US$)", "NY.GDP", "3.5", null),
    ("WLD", "GDP (current US$)", "NY.GDP", "9.9", "9.9")) // aggregate row: filtered
    .toDF("Country Code", "Indicator Name", "Indicator Code", "2019", "2020")

  private case class FixtureRetriever(df: DataFrame) extends Retriever {
    override def retrieve(spark: SparkSession, storage: Option[Storage]): DataFrame = df
  }

  test("full pipeline: transform → provider → membership filter → validate → year window → write") {
    val tmp = Files.createTempDirectory("graft-pipe").toString
    val storage = LocalStorage(tmp)
    val p = Pipeline("wdi_fixture", FixtureRetriever(wideFixture),
      WideYearColumnsTransformer())
    val out = p.run(spark, Some(storage))
    val rows = out.orderBy("country_code", "year").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("wdi_fixture", "GDP (current US$) [NY.GDP]", "AFG", 2019, "Total", 1.5, null),
      Seq("wdi_fixture", "GDP (current US$) [NY.GDP]", "AFG", 2020, "Total", 2.5, null),
      Seq("wdi_fixture", "GDP (current US$) [NY.GDP]", "NAM", 2019, "Total", 3.5, null)))
    // the WLD aggregate row did not survive the membership filter
    assert(!rows.exists(_.contains("WLD")))
    // versioned write landed under v{stamp}/{provider}.parquet
    val written = storage.readName(spark, "wdi_fixture")
    assert(written.count() == 3)
    assert(storage.pathFor("wdi_fixture").contains(storage.version))
  }

  test("registry: register/list/get + unknown name error") {
    val p = Pipeline("reg_fixture", FixtureRetriever(wideFixture),
      WideYearColumnsTransformer())
    Pipelines.register(p)
    assert(Pipelines.list.contains("reg_fixture"))
    assert(Pipelines.get("reg_fixture") == p)
    intercept[NoSuchElementException](Pipelines.get("nope"))
  }

  test("settings read from env map") {
    val s = Settings.fromEnv(Map("GRAFT_YEAR_MIN" -> "1990", "GRAFT_TIMEOUT" -> "5"))
    assert(s.yearMin == 1990 && s.yearMax == 2030 && s.httpTimeoutSeconds == 5)
  }
}

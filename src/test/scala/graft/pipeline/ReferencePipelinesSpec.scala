package graft.pipeline

import java.nio.file.Files
import graft.SparkSuite
import graft.pipeline.sources.ReferencePipelines
import graft.sources.{CannedTransport, CsvWorkbook, JsonSources, SdmxSources, Transport, Workbook, XlsxTestWriter, XlsxWorkbook}
import graft.storage.LocalStorage

/** End-to-end fixture runs of all twelve reference pipelines
  * (FIXTURES.md shapes A1–A8): canned transports / staged files in,
  * canonical validated observations out. */
class ReferencePipelinesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val storage = LocalStorage(
    Files.createTempDirectory("graft-ref-pipelines").toString)

  private def pipelineNamed(name: String, transport: Transport,
      sipri: Workbook = CsvWorkbook(Map.empty),
      eleccap: Workbook = CsvWorkbook(Map.empty)): Pipeline =
    ReferencePipelines.all(transport,
      sipriWorkbook = sipri, eleccapWorkbook = eleccap)
      .find(_.provider == name).get

  private val noTransport = CannedTransport(Map.empty)

  test("world_bank_wdi: wide CSV from storage (A1)") {
    val raw = Seq(
      ("Aruba", "ABW", "GDP (current US$)", "NY.GDP.MKTP.CD", null, "3.5e9"),
      ("Afghanistan", "AFG", "GDP (current US$)", "NY.GDP.MKTP.CD", "1.9e10", "2.0e10"),
      ("World", "WLD", "GDP (current US$)", "NY.GDP.MKTP.CD", "8e13", "8e13"))
      .toDF("Country Name", "Country Code", "Indicator Name", "Indicator Code",
        "2019", "2020")
    storage.write(raw, "world_bank_wdi_raw", "csv")
    val out = pipelineNamed("world_bank_wdi", noTransport)
      .run(spark, Some(storage))
    val rows = out.select("country_code", "year", "value").collect()
      .map(_.toSeq).toSet
    // ABW not in the packaged country table; WLD filtered; AFG survives
    assert(rows == Set(Seq("AFG", 2019, 1.9e10), Seq("AFG", 2020, 2.0e10)))
  }

  test("world_bank_api: paginated JSON, coalesce chain, fuzzy fallback (A3)") {
    val base = "https://api.worldbank.org/v2/country/all/indicator/SP.POP.TOTL"
    def url(page: Int) = Transport.withQuery(base, Map(
      "format" -> "json", "per_page" -> "1000",
      "date" -> "2005:2030", "page" -> page.toString))
    val p1 = """[{"page":1,"pages":2,"total":3},[
      {"indicator":{"id":"SP.POP.TOTL","value":"Population, total"},
       "country":{"id":"AF","value":"Afghanistan"},"countryiso3code":"AFG",
       "date":"2020","value":3.89e7}]]"""
    val p2 = """[{"page":2,"pages":2,"total":3},[
      {"indicator":{"id":"SP.POP.TOTL","value":"Population, total"},
       "country":{"id":"NA","value":"Namibia"},"countryiso3code":"",
       "date":"2020","value":2.55e6},
      {"indicator":{"id":"SP.POP.TOTL","value":"Population, total"},
       "country":{"id":"ZH","value":"Africa"},"countryiso3code":"",
       "date":"2020Q1","value":1.2e9}]]"""
    val t = CannedTransport(Map(url(1) -> p1, url(2) -> p2))
    val out = pipelineNamed("world_bank_api", t).run(spark)
    val rows = out.select("country_code", "year", "value", "indicator_name")
      .collect().map(_.toSeq).toSet
    // NAM resolved by fuzzy name (empty iso3code); quarter row dropped
    assert(rows == Set(
      Seq("AFG", 2020, 3.89e7, "Population, total [SP.POP.TOTL]"),
      Seq("NAM", 2020, 2.55e6, "Population, total [SP.POP.TOTL]")))
  }

  test("who_gho_api: OData rows, dim fold, keep-first dedup (A2)") {
    val url = Transport.withQuery("https://ghoapi.azureedge.net/api/WHOSIS_000001",
      Map("$filter" -> JsonSources.odataFilter(Map.empty)))
    val body = """{"value":[
      {"SpatialDim":"AFG","TimeDim":2020,"Dim1":"SEX_MLE","Dim1Type":"SEX",
       "Dim2":null,"Dim2Type":null,"Dim3":null,"Dim3Type":null,
       "DataSourceDim":"DATASOURCE_WHS","NumericValue":61.2},
      {"SpatialDim":"AFG","TimeDim":2020,"Dim1":"SEX_MLE","Dim1Type":"SEX",
       "Dim2":null,"Dim2Type":null,"Dim3":null,"Dim3Type":null,
       "DataSourceDim":"DATASOURCE_ALT","NumericValue":61.2},
      {"SpatialDim":"NAM","TimeDim":2020,"Dim1":null,"Dim1Type":null,
       "Dim2":null,"Dim2Type":null,"Dim3":null,"Dim3Type":null,
       "DataSourceDim":"DATASOURCE_WHS","NumericValue":64.0}]}"""
    val out = pipelineNamed("who_gho_api", CannedTransport(Map(url -> body)))
      .run(spark)
    val rows = out.select("country_code", "dimension", "value", "source")
      .collect().map(_.toSeq).toSet
    // keep-first picked the lexicographically-first source; dims folded
    assert(rows == Set(
      Seq("AFG", "MLE", 61.2, "ALT"),
      Seq("NAM", "Total", 64.0, "WHS")))
  }

  test("unstats_sdg_api: totalPages, NaN→null, m49→iso3, dims dict (A4)") {
    val base = "https://unstats.un.org/sdgapi/v1/sdg/Series/Data"
    def url(page: Int) = Transport.withQuery(base, Map(
      "seriesCode" -> "SI_POV_DAY1", "pageSize" -> "1000", "page" -> page.toString))
    val p1 = """{"totalPages":1,"data":[
      {"seriesDescription":"Poverty headcount","series":"SI_POV_DAY1",
       "geoAreaCode":"004","timePeriodStart":2019.0,"value":"12.5",
       "attributes":{"Units":"PERCENT"},
       "dimensions":{"Age":"ALLAGE","Sex":"BOTHSEX"}},
      {"seriesDescription":"Poverty headcount","series":"SI_POV_DAY1",
       "geoAreaCode":"516","timePeriodStart":2019.0,"value":"NaN",
       "attributes":{"Units":"PERCENT"},
       "dimensions":{"Age":"ALLAGE","Sex":"BOTHSEX"}}]}"""
    val out = pipelineNamed("unstats_sdg_api", CannedTransport(Map(url(1) -> p1)))
      .run(spark)
    val rows = out.collect().map(_.toSeq).toSet
    assert(rows == Set(Seq("unstats_sdg_api",
      "Poverty headcount, PERCENT [SI_POV_DAY1]", "AFG", 2019,
      "ALLAGE; BOTHSEX", 12.5, null)))
  }

  test("unstats_sdg_database: dynamic dimension columns, bounds (A4-db)") {
    val raw = Seq(
      ("1", "SI_POV_DAY1", "Poverty headcount", "4", "Afghanistan", "2019",
        "<2.5", "PERCENT", "src", "FEMALE"),
      ("1", "SI_POV_DAY1", "Poverty headcount", "516", "Namibia", "2019",
        "17", "PERCENT", "src", "MALE"))
      .toDF("Goal", "SeriesCode", "SeriesDescription", "GeoAreaCode",
        "GeoAreaName", "TimePeriod", "Value", "Units", "Source", "[Sex]")
    storage.write(raw, "unstats_sdg_database_raw", "csv")
    val out = pipelineNamed("unstats_sdg_database", noTransport)
      .run(spark, Some(storage))
    val rows = out.select("country_code", "dimension", "value").collect()
      .map(_.toSeq).toSet
    assert(rows == Set(
      Seq("AFG", "FEMALE", 2.5), Seq("NAM", "MALE", 17.0)))
  }

  test("unicef_sdmx_api: bounded values, yearly filter, source coalesce (A6)") {
    val base = "https://sdmx.data.unicef.org/ws/public/sdmxapi/rest/data/UNICEF,GLOBAL_DATAFLOW,1.0"
    val key = SdmxSources.keyPath(Seq("REF_AREA", "INDICATOR", "SEX"),
      Map("INDICATOR" -> Seq("CME_MRY0T4")))
    val url = Transport.withQuery(s"$base/$key",
      SdmxSources.periodParams(2005, 2030))
    val csv =
      """REF_AREA,INDICATOR,Sex,TIME_PERIOD,OBS_VALUE,DATA_SOURCE,SOURCE_LINK
        |AFG,CME_MRY0T4,Female,2020,<1,,https://childmortality.org
        |AFG,CME_MRY0T4,Male,2020-06,44,UN IGME,
        |NAM,CME_MRY0T4,Total,2019,>95%,UN IGME,""".stripMargin
    val out = pipelineNamed("unicef_sdmx_api", CannedTransport(Map(url -> csv)))
      .run(spark)
    val rows = out.select("country_code", "year", "dimension", "value", "source")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("AFG", 2020, "Female", 1.0, "https://childmortality.org"),
      Seq("NAM", 2019, "All sex", 95.0, "UN IGME")))
  }

  test("ilo_sdmx_api: FREQ/AGGREGATE filters, codelist decode (A6-ilo)") {
    val base = "https://sdmx.ilo.org/rest/data/ILO,DF_EMP_DWAP_SEX_AGE_RT"
    val key = SdmxSources.keyPath(Seq("FREQ", "REF_AREA", "SEX", "AGE"),
      Map("FREQ" -> Seq("A")))
    val url = Transport.withQuery(s"$base/$key",
      SdmxSources.periodParams(2005, 2030))
    val csv =
      """REF_AREA,FREQ,SEX,AGE,TIME_PERIOD,OBS_VALUE,SOURCE
        |AFG,A,SEX_M,AGE_AGGREGATE_TOTAL,2020,47.2,ILOSTAT
        |AFG,M,SEX_M,AGE_AGGREGATE_TOTAL,2020,48.0,ILOSTAT
        |NAM,A,SEX_F,,2019,51.5,ILOSTAT
        |KEN,A,SEX_F,AGE_5YRBANDS_Y15-19,2019,9.9,ILOSTAT""".stripMargin
    val out = pipelineNamed("ilo_sdmx_api", CannedTransport(Map(url -> csv)))
      .run(spark)
    val rows = out.select("country_code", "year", "dimension", "value")
      .collect().map(_.toSeq).toSet
    // monthly row out; null AGE passes the contains-filter; 5-yr band out
    assert(rows == Set(
      Seq("AFG", 2020, "Male; AGE_AGGREGATE_TOTAL", 47.2),
      Seq("NAM", 2019, "Female", 51.5)))
  }

  test("imf_datamapper_api: nested-map explode (A5)") {
    val url = Transport.withQuery(
      "https://www.imf.org/external/datamapper/api/v1/NGDP_RPCH", Map.empty)
    val body = """{"values":{"NGDP_RPCH":{"USA":{"2019":2.3,"2020":-2.8},
      "NAM":{"2019":1.1}}}}"""
    val out = pipelineNamed("imf_datamapper_api", CannedTransport(Map(url -> body)))
      .run(spark)
    val rows = out.select("country_code", "year", "value").collect()
      .map(_.toSeq).toSet
    assert(rows == Set(
      Seq("USA", 2019, 2.3), Seq("USA", 2020, -2.8), Seq("NAM", 2019, 1.1)))
  }

  test("sipri_milex: multi-sheet workbook, header inference, melt (A7)") {
    val sheet1 =
      """SIPRI military expenditure database,,
        |Country,2019,2020
        |Afghanistan,1.9,xxx
        |Namibia,3.1,3.3""".stripMargin
    val sheet2 =
      """Country,2019,2020
        |Afghanistan,0.011,...""".stripMargin
    val wb = CsvWorkbook(Map(
      "Constant (2023) US$" -> sheet1, "Share of GDP" -> sheet2))
    val out = pipelineNamed("sipri_milex", noTransport, sipri = wb).run(spark)
    val rows = out.select("indicator_name", "country_code", "year", "value")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("Military expenditure, constant US$m [MILEX_USD]", "AFG", 2019, 1.9),
      Seq("Military expenditure, constant US$m [MILEX_USD]", "NAM", 2019, 3.1),
      Seq("Military expenditure, constant US$m [MILEX_USD]", "NAM", 2020, 3.3),
      Seq("Military expenditure, % of GDP [MILEX_GDP]", "AFG", 2019, 0.011)))
  }

  test("sipri_milex end-to-end from a real .xlsx file (S3 through S4/S5)") {
    // the same pipeline as above, fed a genuine OOXML file instead of
    // CSV-staged sheets — real XLSX decode through the full transform
    val f = java.io.File.createTempFile("graft-sipri", ".xlsx")
    f.deleteOnExit()
    XlsxTestWriter.write(f, Seq(
      "Constant (2023) US$" -> Seq(
        Seq("SIPRI military expenditure database", null),
        Seq("Country", 2019, 2020),
        Seq("Afghanistan", 1.9, "xxx"),
        Seq("Namibia", 3.1, 3.3)),
      "Share of GDP" -> Seq(
        Seq("Country", 2019, 2020),
        Seq("Afghanistan", 0.011, "..."))))
    val out = pipelineNamed("sipri_milex", noTransport,
      sipri = XlsxWorkbook(f)).run(spark)
    val rows = out.select("indicator_name", "country_code", "year", "value")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("Military expenditure, constant US$m [MILEX_USD]", "AFG", 2019, 1.9),
      Seq("Military expenditure, constant US$m [MILEX_USD]", "NAM", 2019, 3.1),
      Seq("Military expenditure, constant US$m [MILEX_USD]", "NAM", 2020, 3.3),
      Seq("Military expenditure, % of GDP [MILEX_GDP]", "AFG", 2019, 0.011)))
  }

  test("unaids_kpatlas: subgroup filters and keep-none dedup (A8)") {
    val raw = Seq(
      ("HIV prevalence", "Total", "AFG", "2020", "0.1", "UNAIDS", "%", "HIV_PREV"),
      ("HIV prevalence", "Category: adults", "AFG", "2020", "0.2", "UNAIDS", "%", "HIV_PREV"),
      ("HIV prevalence", "Total", "NAM", "2020", "11.6", "UNAIDS", "%", "HIV_PREV"),
      ("Condom use", "Sex workers", "NAM", "2020", "81", "UNAIDS", "%", "CONDOM"),
      // duplicated key -> keep-none eliminates BOTH rows
      ("ART coverage", "Total", "KEN", "2020", "75", "UNAIDS", "%", "ART"),
      ("ART coverage", "Total", "KEN", "2020", "76", "UNAIDS", "%", "ART"))
      .toDF("Indicator", "Subgroup", "Area ID", "Time Period", "Data Value",
        "Source", "Unit", "Code")
    storage.write(raw, "unaids_kpatlas_raw", "csv")
    val out = pipelineNamed("unaids_kpatlas", noTransport).run(spark, Some(storage))
    val rows = out.select("country_code", "dimension", "value").collect()
      .map(_.toSeq).toSet
    // Category-prefixed subgroup dropped; single-subgroup indicator kept;
    // KEN duplicate pair fully eliminated; "Total" renders as
    // "All subgroup" (C3: case-insensitive total → "All {name}")
    assert(rows == Set(
      Seq("AFG", "All subgroup", 0.1),
      Seq("NAM", "All subgroup", 11.6),
      Seq("NAM", "Sex workers", 81.0)))
  }

  test("healthdata_ghdx: fuzzy names + SexEnum recode") {
    val raw = Seq(
      ("Deaths", "Rate", "All causes", "Afghanistan", "male", "All ages", "2019", "717.5"),
      ("Deaths", "Rate", "All causes", "Vietnam", "both", "All ages", "2019", "546.1"),
      ("Deaths", "Rate", "All causes", "Atlantis", "female", "All ages", "2019", "1.0"))
      .toDF("measure_name", "metric_name", "cause_name", "location_name",
        "sex_name", "age_name", "year", "val")
    storage.write(raw, "healthdata_ghdx_raw", "csv")
    val out = pipelineNamed("healthdata_ghdx", noTransport).run(spark, Some(storage))
    val rows = out.select("country_code", "dimension", "value").collect()
      .map(_.toSeq).toSet
    assert(rows == Set(
      Seq("AFG", "Male; All ages", 717.5),
      Seq("VNM", "Both; All ages", 546.1)))
  }

  test("energydata_info: header offset, ffill over merged cells, sentinels") {
    val sheet =
      """Installed capacity (ELECCAP),,,,
        |Country,Technology,Grid,2019,2020
        |Afghanistan,Hydro,On,120,130
        |,Solar,On,..,15
        |Namibia,Hydro,On,340,..""".stripMargin
    val wb = CsvWorkbook(Map("Sheet1" -> sheet))
    val out = pipelineNamed("energydata_info", noTransport, eleccap = wb).run(spark)
    val rows = out.select("country_code", "year", "dimension", "value")
      .collect().map(_.toSeq).toSet
    // merged-cell blank country forward-filled to Afghanistan; ".." dropped
    assert(rows == Set(
      Seq("AFG", 2019, "Hydro", 120.0),
      Seq("AFG", 2020, "Hydro", 130.0),
      Seq("AFG", 2020, "Solar", 15.0),
      Seq("NAM", 2019, "Hydro", 340.0)))
  }

  test("energydata_info from real .xlsx: merged cells arrive as absent cells") {
    // in OOXML a merged cell stores its value only in the top-left
    // anchor; the covered cells are simply ABSENT from the file. The
    // sparse-grid reinstatement + pinned-order forward-fill must
    // reproduce the same result as the CSV-staged blank-cell shape.
    val f = java.io.File.createTempFile("graft-eleccap", ".xlsx")
    f.deleteOnExit()
    XlsxTestWriter.write(f, Seq("Sheet1" -> Seq(
      Seq("Installed capacity (ELECCAP)"),
      Seq("Country", "Technology", "Grid", 2019, 2020),
      Seq("Afghanistan", "Hydro", "On", 120, 130),
      Seq(null, "Solar", "On", "..", 15), // merged country cell: absent
      Seq("Namibia", "Hydro", "On", 340, ".."))))
    val out = pipelineNamed("energydata_info", noTransport,
      eleccap = XlsxWorkbook(f)).run(spark)
    val rows = out.select("country_code", "year", "dimension", "value")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("AFG", 2019, "Hydro", 120.0),
      Seq("AFG", 2020, "Hydro", 130.0),
      Seq("AFG", 2020, "Solar", 15.0),
      Seq("NAM", 2019, "Hydro", 340.0)))
  }
}

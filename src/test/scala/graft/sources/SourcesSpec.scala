package graft.sources

import graft.SparkSuite

class SourcesSpec extends SparkSuite {

  test("page/pages protocol: accumulates across pages, isolates bad indicators") {
    val page1 = """[{"page":1,"pages":2,"total":3},
      [{"countryiso3code":"AFG","date":"2020","value":1.0}]]"""
    val page2 = """[{"page":2,"pages":2,"total":3},
      [{"countryiso3code":"NAM","date":"2021","value":2.0},
       {"countryiso3code":"KEN","date":"2020Q1","value":3.0}]]"""
    val message = """[{"message":[{"id":120,"value":"no data"}]}]"""
    val t = CannedTransport(Map(
      "http://api/IND1?page=1" -> page1,
      "http://api/IND1?page=2" -> page2,
      "http://api/BAD?page=1" -> message))
    val rows = JsonSources.fetchPagePages(t,
      (ind, p) => (s"http://api/$ind", Map("page" -> p.toString)),
      Seq("IND1", "BAD", "GONE"))
    assert(rows.length == 3)
    val df = JsonSources.jsonToDf(spark, rows)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("countryiso3code", "date", "value"))
  }

  test("totalPages protocol fetches page 1 then the rest") {
    val t = CannedTransport(Map(
      "http://sdg?page=1" -> """{"totalPages":2,"data":[{"series":"A","value":"1"}]}""",
      "http://sdg?page=2" -> """{"totalPages":2,"data":[{"series":"B","value":"2"}]}"""))
    val rows = JsonSources.fetchTotalPages(t,
      p => ("http://sdg", Map("page" -> p.toString)))
    assert(rows.length == 2)
  }

  test("OData filter builder renders eq/in with the value guard") {
    val f = JsonSources.odataFilter(Map(
      "SpatialDimType" -> "COUNTRY",
      "TimeDim" -> Seq(2019, 2020)))
    assert(f == "NumericValue ne null and SpatialDimType eq 'COUNTRY' and TimeDim in (2019, 2020)")
  }

  test("OData scan extracts the value array") {
    val body = """{"value":[{"SpatialDim":"AFG","NumericValue":4.2}]}"""
    val url = Transport.withQuery("http://gho/X",
      Map("$filter" -> JsonSources.odataFilter(Map.empty)))
    val t = CannedTransport(Map(url -> body))
    val rows = JsonSources.fetchOData(t, "http://gho/X", Map.empty)
    assert(rows.length == 1 && rows.head.contains("AFG"))
  }

  test("nested-map payload explodes to (indicator, country, year, value)") {
    val payload =
      """{"values":{"NGDP_RPCH":{"USA":{"2019":2.3,"2020":-2.8},"DEU":{"2019":1.1}}}}"""
    val df = JsonSources.nestedMapToDf(spark, payload)
    assert(df.count() == 3)
    val usa2020 = df.filter("country_code = 'USA' AND year_str = '2020'")
      .collect()(0).getDouble(3)
    assert(usa2020 == -2.8)
  }

  test("SDMX key path joins dimension selections positionally") {
    assert(SdmxSources.keyPath(
      Seq("FREQ", "REF_AREA", "SEX"),
      Map("FREQ" -> Seq("A"), "SEX" -> Seq("M", "F"))) == "A..M+F")
  }

  test("SDMX csv payload parses with nulls for empty fields") {
    val csv = "REF_AREA,TIME_PERIOD,OBS_VALUE\nAFG,2020,1.5\nNAM,2021,"
    val df = SdmxSources.csvToDf(spark, csv)
    assert(df.count() == 2)
    assert(df.filter("OBS_VALUE IS NULL").count() == 1)
  }

  test("codelist XML parses ids to english names, namespace-tolerant") {
    val xml =
      """<structure:Codelist xmlns:structure="urn:s" xmlns:common="urn:c" id="CL_SEX">
        |  <structure:Code id="SEX_M"><common:Name xml:lang="en">Male</common:Name>
        |    <common:Name xml:lang="fr">Homme</common:Name></structure:Code>
        |  <structure:Code id="SEX_F"><common:Name xml:lang="en">Female</common:Name></structure:Code>
        |</structure:Codelist>""".stripMargin
    val m = SdmxSources.parseCodelist(xml)
    assert(m == Map("SEX_M" -> "Male", "SEX_F" -> "Female"))
    assert(SdmxSources.stripCodelistPrefix("CL_SEX") == "SEX")
  }

  test("sheet ops: header inference, sentinel NAs, multi-sheet union") {
    val sheetA = "junk,,\nCountry,1990,2000\nAfghanistan,xxx,12.5\nNamibia,3.1,..."
    val sheetB = "Country,1990,1995\nKenya,7,8"
    val wb = CsvWorkbook(Map("A" -> sheetA, "B" -> sheetB))
    val rowsA = wb.sheet("A")
    assert(SheetOps.inferHeaderRow(rowsA, "Country") == 1)
    val df = SheetOps.multiSheetUnion(spark, wb,
      Map("A" -> "Military spending", "B" -> "Other"),
      rows => SheetOps.inferHeaderRow(rows, "Country"))
    assert(df.columns.toSet == Set("Country", "1990", "1995", "2000", "indicator_name"))
    assert(df.count() == 3)
    // sentinel NAs became nulls
    assert(df.filter("Country = 'Afghanistan' AND `1990` IS NULL").count() == 1)
    assert(df.filter("Country = 'Namibia' AND `2000` IS NULL").count() == 1)
  }

  test("csv workbook parses quoted fields with embedded commas") {
    val wb = CsvWorkbook(Map("S" -> "a,b\n\"x, y\",\"q\"\"q\""))
    assert(wb.sheet("S")(1) == Seq("x, y", "q\"q"))
  }
}

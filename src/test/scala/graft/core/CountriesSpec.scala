package graft.core

import graft.SparkSuite

class CountriesSpec extends SparkSuite {

  test("packaged table parses; Namibia's NA iso2 survives") {
    val nam = Countries.all.find(_.iso3 == "NAM").get
    assert(nam.iso2 == "NA")
    assert(nam.m49 == 516)
    assert(Countries.all.size >= 90)
    assert(Countries.all.map(_.iso3).distinct.size == Countries.all.size)
  }

  test("flags and mappings") {
    val afg = Countries.all.find(_.iso3 == "AFG").get
    assert(afg.ldc && afg.lldc && !afg.sids)
    assert(Countries.mapping(_.m49.toString, _.iso3)("516") == "NAM")
    assert(Countries.iso3Set.contains("BRA"))
  }

  test("as DataFrame") {
    val df = Countries.dataFrame(spark)
    assert(df.count() == Countries.all.size)
    assert(df.filter("iso2 = 'NA'").count() == 1)
  }
}

package graft.transform

import graft.SparkSuite
import graft.core.Countries

/** J5 fuzzy-name parity sweep: every name style the reference's
  * sources actually emit for the packaged country set must resolve to
  * the expected ISO3, through BOTH the Scala dictionary and the Spark
  * column path (they must agree — one normalizer, two runtimes). */
class CountryNameSweepSpec extends SparkSuite {
  import spark.implicits._

  /** Name variants per source style (only countries present in the
    * packaged table — others are not-found → null by design). */
  private val variants: Seq[(String, String)] = Seq(
    // World Bank API short forms (world_bank_api.py:177-180 inputs)
    "Egypt, Arab Rep." -> "EGY",
    "Iran, Islamic Rep." -> "IRN",
    "Korea, Rep." -> "KOR",
    "Lao PDR" -> "LAO",
    "Russian Federation" -> "RUS",
    "Slovak Republic" -> "SVK",
    "Venezuela, RB" -> "VEN",
    "Viet Nam" -> "VNM",
    "Turkiye" -> "TUR",
    // WHO/UN official long forms (no parentheses)
    "Iran, Islamic Republic of" -> "IRN",
    "Venezuela, Bolivarian Republic of" -> "VEN",
    "Republic of Korea" -> "KOR",
    "United Republic of Tanzania" -> "TZA",
    "United Rep. of Tanzania" -> "TZA",
    "Lao People's Democratic Republic" -> "LAO",
    "United States of America" -> "USA",
    "United Kingdom of Great Britain and Northern Ireland" -> "GBR",
    // parenthetical official forms (normalizer strips parentheticals)
    "Bolivia (Plurinational State of)" -> "BOL",
    "Iran (Islamic Republic of)" -> "IRN",
    "Venezuela (Bolivarian Republic of)" -> "VEN",
    // SIPRI compass/short forms (sipri_milex.py:123-125 inputs)
    "Korea, South" -> "KOR",
    "Tanzania, United Rep." -> "TZA",
    "Czechia" -> "CZE",
    "Türkiye" -> "TUR",
    "Viet Nam" -> "VNM",
    "UK" -> "GBR",
    "USA" -> "USA",
    // informal / historical / native spellings
    "United States" -> "USA",
    "United Kingdom" -> "GBR",
    "Great Britain" -> "GBR",
    "South Korea" -> "KOR",
    "Korea" -> "KOR",
    "Russia" -> "RUS",
    "Vietnam" -> "VNM",
    "Bolivia" -> "BOL",
    "Venezuela" -> "VEN",
    "Iran" -> "IRN",
    "Tanzania" -> "TZA",
    "Laos" -> "LAO",
    "Turkey" -> "TUR",
    "Czech Republic" -> "CZE",
    "Burma" -> "MMR",
    "Myanmar (Burma)" -> "MMR",
    "Holland" -> "NLD",
    "Brasil" -> "BRA",
    "U.S." -> "USA",
    // accent-folding parity
    "México" -> "MEX",
    "Perú" -> "PER",
    "Panamá" -> "PAN")

  test("every packaged name maps to its own ISO3 (identity sweep)") {
    val names = Countries.all.map(c => (c.name, c.iso3))
    val df = names.toDF("n", "expected")
    val out = CountryCodes.namesToIso3(df, "n", "iso3")
      .filter("iso3 IS NULL OR iso3 <> expected")
      .collect()
    assert(out.isEmpty,
      s"packaged names mis-mapped: ${out.map(_.getString(0)).mkString(", ")}")
  }

  test("source-style name variants all resolve (Spark column path)") {
    val df = variants.toDF("n", "expected")
    val misses = CountryCodes.namesToIso3(df, "n", "iso3")
      .filter("iso3 IS NULL OR iso3 <> expected")
      .collect().map(r => s"${r.getString(0)} -> ${Option(r.getString(2))} (want ${r.getString(1)})")
    assert(misses.isEmpty, s"variant misses:\n  ${misses.mkString("\n  ")}")
  }

  test("Scala dictionary path agrees with the Spark column path") {
    val df = variants.map(_._1).toDF("n")
    val sparkSide = CountryCodes.namesToIso3(df, "n", "iso3")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    variants.foreach { case (name, expected) =>
      val key = name.toLowerCase
        .map(c => "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ".zip("aaaaaaceeeeiiiinoooooouuuuyy").toMap.getOrElse(c, c))
        .replaceAll("\\(.*?\\)", " ").replaceAll("[^a-z]+", " ").trim
      assert(CountryCodes.nameToIso3.get(key).contains(expected), s"map miss: $name ($key)")
      assert(sparkSide(name).contains(expected), s"column miss: $name")
    }
  }

  test("unknown names stay null (not_found=None semantics)") {
    val df = Seq("Atlantis", "Kingdom of Wakanda", "").toDF("n")
    val out = CountryCodes.namesToIso3(df, "n", "iso3")
      .collect().map(r => Option(r.getString(1)))
    assert(out.forall(_.isEmpty))
  }
}

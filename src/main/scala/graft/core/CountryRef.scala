package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.io.Source

/** Country/area reference row (the analogue of the reference's packaged
  * UN M49 table, `utils.py:102-114`): m49 numeric code, ISO 3166-1
  * alpha-2/alpha-3 codes, name, region/subregion, LDC/LLDC/SIDS flags.
  */
final case class CountryRef(
    m49: Int,
    iso2: String,
    iso3: String,
    name: String,
    region: String,
    subregion: String,
    ldc: Boolean,
    lldc: Boolean,
    sids: Boolean)

/** Loader for the packaged country reference (S15 packaged-resource
  * scan). Parsed on the driver — 10² rows by nature — then broadcast
  * wherever it joins (P3/J3/J4).
  *
  * Correctness trap ported as a hard guarantee: Namibia's ISO-2 code is
  * the literal string "NA" and must NOT be read as null (the reference
  * needs `keep_default_na=False`, `utils.py:109-110`; our driver-side
  * split never null-ifies).
  */
object Countries {
  /** Resource path of the packaged reference table (semicolon-separated). */
  val resource = "/graft/countries.csv"

  lazy val all: Seq[CountryRef] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing packaged resource $resource")
    val lines = Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    lines.drop(1).filter(_.nonEmpty).map { line =>
      val f = line.split(";", -1).padTo(9, "")
      require(f.length == 9, s"malformed country row: $line")
      CountryRef(f(0).toInt, f(1), f(2), f(3), f(4), f(5),
        f(6) == "x", f(7) == "x", f(8) == "x")
    }
  }

  lazy val iso3Set: Set[String] = all.map(_.iso3).toSet

  /** Column-pair mapping (J4 `replace_country_metadata`,
    * `utils.py:117-155`): e.g. m49→iso3 for SDG sources. */
  def mapping(from: CountryRef => String, to: CountryRef => String): Map[String, String] =
    all.map(c => from(c) -> to(c)).toMap

  def dataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(all).toDF()
  }
}

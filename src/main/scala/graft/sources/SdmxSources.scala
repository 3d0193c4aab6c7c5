package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.xml.XML

/** SDMX source scans (S10/S11/S12; reference `unicef_sdmx_api.py`,
  * `ilo_sdmx_api.py`). */
object SdmxSources {

  /** CSV payload string → DataFrame (header row included in payload).
    * The text lands in a Dataset[String], so parsing happens on
    * executors. */
  def csvToDf(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .csv(spark.createDataset(payload.linesIterator.toSeq))
  }

  /** S10 — SDMX key path (reference `unicef_sdmx_api.py:36-112`): the
    * dataflow structure fixes the dimension order; a query key is the
    * per-dimension value selections joined positionally with "." (an
    * empty selection = wildcard). This is the SDMX flavour of
    * source-side predicate pushdown. */
  def keyPath(dimensionOrder: Seq[String], selections: Map[String, Seq[String]]): String =
    dimensionOrder.map(d => selections.getOrElse(d, Nil).mkString("+")).mkString(".")

  /** S11 — date-windowed fetch params (reference
    * `ilo_sdmx_api.py:134-138`). */
  def periodParams(startYear: Int, endYear: Int): Map[String, String] =
    Map("startPeriod" -> startYear.toString, "endPeriod" -> endYear.toString,
      "format" -> "csv")

  /** S12 — codelist XML → {code id → english name} (reference
    * `ilo_sdmx_api.py:24-50`). Namespace-tolerant: matches on local
    * labels, picks the `xml:lang="en"` name. Driver-side parse of a
    * small document; the resulting map broadcasts into C9 decodes. */
  def parseCodelist(xml: String): Map[String, String] = {
    val doc = XML.loadString(xml)
    (doc \\ "Code").flatMap { code =>
      val id = code.attribute("id").map(_.text)
      val en = (code \ "Name").find(n =>
        n.attributes.exists(a => a.key == "lang" && a.value.text == "en"))
        .orElse((code \ "Name").headOption)
        .map(_.text.trim)
      id.zip(en)
    }.toMap
  }

  /** Strip the SDMX codelist prefix (`CL_`, reference
    * `ilo_sdmx_api.py:38`). */
  def stripCodelistPrefix(id: String): String = id.stripPrefix("CL_")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Spreadsheet-shaped scans (S3–S6; reference `sipri_milex.py`,
  * `energydata_info.py`).
  *
  * The engine's spreadsheet semantics — header-row inference,
  * fixed header offsets, sentinel NAs, multi-sheet union — operate on
  * a [[Workbook]] abstraction of raw cell rows. Two backends:
  * [[XlsxWorkbook]] reads real OOXML files directly; [[CsvWorkbook]]
  * stages sheets as CSV strings (test fixtures, pre-converted
  * inputs). Sheets are driver-side small by nature
  * (they're hand-maintained spreadsheets); everything after
  * [[SheetOps.toDataFrame]] is a normal distributed frame.
  */
trait Workbook {
  def sheetNames: Seq[String]
  /** Raw cell grid of one sheet (no header interpretation). */
  def sheet(name: String): Seq[Seq[String]]
}

/** CSV-staged workbook: one CSV string per sheet. Minimal RFC-4180
  * parsing (quoted fields, embedded commas). */
final case class CsvWorkbook(sheets: Map[String, String]) extends Workbook {
  override def sheetNames: Seq[String] = sheets.keys.toSeq.sorted
  override def sheet(name: String): Seq[Seq[String]] =
    sheets(name).linesIterator.map(parseLine).toSeq

  private def parseLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }
}

object SheetOps {

  /** S4 — header-row inference (reference `sipri_milex.py:73-93`): scan
    * for the first row whose first cell equals the marker; that row
    * becomes the header. */
  def inferHeaderRow(rows: Seq[Seq[String]], marker: String): Int = {
    val idx = rows.indexWhere(r => r.headOption.contains(marker))
    require(idx >= 0, s"no header row starting with '$marker'")
    idx
  }

  /** Cell grid → DataFrame: `headerRow` names the columns (S6 fixed
    * offsets pass it directly), sentinel strings (`"xxx"`, `"..."`,
    * `".."`) become nulls, short rows pad with nulls, duplicate/empty
    * header cells are uniquified. All columns string-typed — casts are
    * the transformer's job (pandera-coerce semantics downstream). */
  def toDataFrame(
      spark: SparkSession,
      rows: Seq[Seq[String]],
      headerRow: Int,
      naValues: Set[String] = Set("xxx", "...", ".."),
      withIndex: Boolean = false): DataFrame = {
    val header = rows(headerRow)
    val names = header.zipWithIndex.map { case (h, i) =>
      if (h == null || h.trim.isEmpty) s"_c$i" else h.trim
    }
    val uniq = names.zipWithIndex.map { case (n, i) =>
      if (names.indexOf(n) == i) n else s"${n}_$i"
    }
    val data = rows.drop(headerRow + 1).zipWithIndex.map { case (r, idx) =>
      val cells = uniq.indices.map { i =>
        val v = if (i < r.length) r(i) else null
        if (v == null || v.isEmpty || naValues(v)) null else v
      }
      // `_row_idx` pins the sheet's physical row order for
      // order-sensitive operators (W1 forward-fill)
      Row.fromSeq(if (withIndex) cells :+ idx.toLong else cells)
    }
    val fields = uniq.map(StructField(_, StringType, nullable = true)) ++
      (if (withIndex) Seq(StructField("_row_idx", LongType, nullable = false)) else Nil)
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList), StructType(fields))
  }

  /** S5 — multi-sheet union (reference `sipri_milex.py:32-71`): read
    * each named sheet, tag rows with the sheet's indicator name, union
    * by name with missing-column fill (sheets differ in column sets). */
  def multiSheetUnion(
      spark: SparkSession,
      wb: Workbook,
      sheetIndicators: Map[String, String],
      headerRowOf: Seq[Seq[String]] => Int,
      naValues: Set[String] = Set("xxx", "...", "..")): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val frames = sheetIndicators.toSeq.sortBy(_._1).map { case (sheet, indicator) =>
      val rows = wb.sheet(sheet)
      toDataFrame(spark, rows, headerRowOf(rows), naValues)
        .withColumn("indicator_name", lit(indicator))
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

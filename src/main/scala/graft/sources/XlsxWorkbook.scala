package graft.sources

import java.util.zip.ZipFile
import scala.xml.{Elem, XML}

/** Real XLSX (OOXML spreadsheet) backend for [[Workbook]] — S3
  * (reference `storage/_base.py:104-106`, consumed by
  * `sipri_milex.py:32-93`, `energydata_info.py:29-43`).
  *
  * An .xlsx file is a zip of XML parts; the subset a data pipeline
  * needs is small and stable, so this reads it directly with
  * `java.util.zip` + `scala-xml` rather than vendoring POI:
  *
  *  - `xl/workbook.xml`      — sheet names in workbook order, each
  *                             pointing at a worksheet part via an
  *                             `r:id` relationship;
  *  - `xl/_rels/workbook.xml.rels` — relationship id → part path;
  *  - `xl/sharedStrings.xml` — the interned string table (`<si>`
  *                             entries; rich-text runs concatenate);
  *  - `xl/worksheets/sheetN.xml` — `<sheetData>/<row>/<c>` cells.
  *
  * Cell handling mirrors what `pd.read_excel` surfaces to the
  * reference: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), cached formula strings (`t="str"`), booleans
  * (`t="b"` → "true"/"false"), and raw numeric text otherwise. Cell
  * grids are SPARSE in the file — `r="C5"` style references — so
  * missing rows and cells are reinstated as nulls to preserve the
  * physical grid shape that header inference (S4) and forward-fill
  * (W1 `_row_idx`) depend on. Everything stays string-typed: casts
  * are the transformer's job (pandera-coerce semantics downstream).
  *
  * Workbooks are driver-side small by nature (hand-maintained
  * spreadsheets); the parsed grid feeds [[SheetOps.toDataFrame]] and
  * everything after is a normal distributed frame.
  */
final class XlsxWorkbook private (
    names: Seq[String],
    grids: Map[String, Seq[Seq[String]]]) extends Workbook {
  override def sheetNames: Seq[String] = names
  override def sheet(name: String): Seq[Seq[String]] = grids(name)
}

object XlsxWorkbook {

  private val RelNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  def apply(path: String): XlsxWorkbook = apply(new java.io.File(path))

  def apply(file: java.io.File): XlsxWorkbook = {
    val zf = new ZipFile(file)
    try {
      def part(name: String): Option[Elem] =
        Option(zf.getEntry(name)).map { e =>
          val is = zf.getInputStream(e)
          try XML.load(is) finally is.close()
        }
      val wb = part("xl/workbook.xml")
        .getOrElse(sys.error(s"$file: xl/workbook.xml missing — not an xlsx"))
      val rels = part("xl/_rels/workbook.xml.rels")
        .getOrElse(sys.error(s"$file: workbook relationships missing"))
      val relTarget: Map[String, String] =
        (rels \ "Relationship").map(r => (r \@ "Id") -> (r \@ "Target")).toMap
      val shared: IndexedSeq[String] = part("xl/sharedStrings.xml") match {
        case Some(sst) =>
          (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val sheets = (wb \ "sheets" \ "sheet").map { s =>
        val name = s \@ "name"
        val rid = s.attribute(RelNs, "id").map(_.text).getOrElse("")
        val target = relTarget.getOrElse(rid,
          sys.error(s"$file: no relationship for sheet '$name'"))
        // Target is part-relative ("worksheets/sheet1.xml") or
        // package-absolute ("/xl/worksheets/sheet1.xml")
        val partPath =
          if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        val xml = part(partPath)
          .getOrElse(sys.error(s"$file: missing worksheet part $partPath"))
        name -> parseSheet(xml, shared)
      }
      new XlsxWorkbook(sheets.map(_._1), sheets.toMap)
    } finally zf.close()
  }

  /** "BC12" → 0-based column index (54). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  private def cellValue(c: scala.xml.Node, shared: IndexedSeq[String]): String =
    (c \@ "t") match {
      case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
      case "s" =>
        val idx = (c \ "v").text.trim
        if (idx.isEmpty) null else shared(idx.toInt)
      case "b" =>
        (c \ "v").text.trim match {
          case "1" => "true"
          case "0" => "false"
          case other => other
        }
      case _ => // "str" (cached formula) and numeric both carry raw <v> text
        val v = (c \ "v").text
        if (v.isEmpty) null else v
    }

  /** Sparse `<sheetData>` → dense row-major grid, gaps as nulls/empty
    * rows so physical row order (S4 header scan, W1 `_row_idx`)
    * matches what the spreadsheet shows. */
  private def parseSheet(xml: Elem, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val parsed = (xml \ "sheetData" \ "row").zipWithIndex.map { case (r, i) =>
      val rowIdx = { val a = r \@ "r"; if (a.nonEmpty) a.toInt - 1 else i }
      val cells = (r \ "c").zipWithIndex.map { case (c, j) =>
        val ref = c \@ "r"
        val ci = if (ref.nonEmpty) colIndex(ref) else j
        ci -> cellValue(c, shared)
      }
      rowIdx -> cells
    }
    val byRow = parsed.toMap
    val maxRow = parsed.map(_._1).maxOption.getOrElse(-1)
    (0 to maxRow).map { ri =>
      byRow.get(ri) match {
        case None => Seq.empty[String]
        case Some(cells) =>
          val width = cells.map(_._1).maxOption.getOrElse(-1) + 1
          val arr = new Array[String](width)
          cells.foreach { case (ci, v) => if (ci >= 0 && ci < width) arr(ci) = v }
          arr.toSeq
      }
    }
  }
}

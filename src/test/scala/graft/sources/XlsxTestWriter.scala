package graft.sources

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-side OOXML writer: builds a genuine .xlsx (zip of XML parts)
  * from cell grids — an independent code path from [[XlsxWorkbook]].
  * Strings become inline-string cells, numbers numeric cells, null
  * cells are omitted (sparse, as real writers do). */
object XlsxTestWriter {

  def write(file: File, sheets: Seq[(String, Seq[Seq[Any]])]): File = {
    val zos = new ZipOutputStream(new FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val overrides = sheets.indices.map(i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString("\n")
    put("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |$overrides
         |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString("\n")
    put("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>
         |$sheetDecls
         |</sheets>
         |</workbook>""".stripMargin)
    val rels = sheets.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
      .mkString("\n")
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |$rels
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, r) =>
        val cellsXml = cells.zipWithIndex.collect {
          case (v, c) if v != null =>
            val ref = s"${colRef(c)}${r + 1}"
            v match {
              case s: String =>
                s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>"""
              case n => s"""<c r="$ref"><v>$n</v></c>"""
            }
        }.mkString
        s"""<row r="${r + 1}">$cellsXml</row>"""
      }.mkString("\n")
      put(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>
           |$rowsXml
           |</sheetData>
           |</worksheet>""".stripMargin)
    }
    zos.close()
    file
  }

  private def colRef(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}

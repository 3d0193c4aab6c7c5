package graft.sources

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSuite

/** Real .xlsx reading (S3) through the same S4/S5/S6 operator paths the
  * CSV-staged workbook uses. The fixture is written here as a genuine
  * OOXML zip (content types, relationships, shared strings, sparse
  * cells) by hand-built XML — an independent code path from the
  * reader under test. */
class XlsxWorkbookSpec extends SparkSuite {

  private def writeFixture(): File = {
    val f = File.createTempFile("graft-fixture", ".xlsx")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Current US$" sheetId="1" r:id="rId1"/>
        |<sheet name="Share of GDP" sheetId="2" r:id="rId2"/>
        |</sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // 0=Country 1=Afghanistan 2=xxx 3=Namibia 4=notes banner 5=q"q rich text
    put("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        |<si><t>Country</t></si>
        |<si><t>Afghanistan</t></si>
        |<si><t>xxx</t></si>
        |<si><t>Namibia</t></si>
        |<si><t xml:space="preserve">SIPRI database, </t></si>
        |<si><r><t>q"</t></r><r><t>q</t></r></si>
        |</sst>""".stripMargin)
    // Sheet1: banner row, blank row 2 (absent from the file — sparse),
    // header on physical row 3, then data with a sparse gap at B5 and
    // a sentinel "xxx" at C4.
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>4</v></c><c r="B1" t="inlineStr"><is><t>2026 edition</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>0</v></c><c r="B3"><v>1990</v></c><c r="C3"><v>2000</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>1</v></c><c r="B4"><v>101.5</v></c><c r="C4" t="s"><v>2</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>3</v></c><c r="C5"><v>12.25</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    // Sheet2: different year columns (union-by-name path), a boolean,
    // a cached formula string, and a rich-text shared string.
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>1995</v></c><c r="C1" t="s"><v>5</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="b"><v>1</v></c><c r="C2" t="str"><v>calc</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
    f
  }

  test("xlsx reader: sheet names, sparse grid reinstated, cell types decoded") {
    val wb = XlsxWorkbook(writeFixture())
    assert(wb.sheetNames == Seq("Current US$", "Share of GDP"))
    val s1 = wb.sheet("Current US$")
    assert(s1.length == 5) // rows 1..5, absent row 2 reinstated empty
    assert(s1(0) == Seq("SIPRI database, ", "2026 edition"))
    assert(s1(1).isEmpty)
    assert(s1(2) == Seq("Country", "1990", "2000"))
    assert(s1(3) == Seq("Afghanistan", "101.5", "xxx"))
    assert(s1(4) == Seq("Namibia", null, "12.25")) // sparse B5 gap
    val s2 = wb.sheet("Share of GDP")
    assert(s2(1) == Seq("Afghanistan", "true", "calc"))
    assert(s2(0)(2) == "q\"q") // rich-text runs concatenate
  }

  test("xlsx through S4 header inference + S5 multi-sheet union + sentinel NAs") {
    val wb = XlsxWorkbook(writeFixture())
    val rows = wb.sheet("Current US$")
    assert(SheetOps.inferHeaderRow(rows, "Country") == 2)
    val df = SheetOps.multiSheetUnion(spark, wb,
      Map("Current US$" -> "Milex, current US$", "Share of GDP" -> "Milex, share of GDP"),
      rs => SheetOps.inferHeaderRow(rs, "Country"))
    assert(df.columns.toSet ==
      Set("Country", "1990", "1995", "2000", "q\"q", "indicator_name"))
    assert(df.count() == 3)
    // "xxx" sentinel became null through the same SheetOps path
    assert(df.filter("Country = 'Afghanistan' AND `2000` IS NULL AND " +
      "indicator_name = 'Milex, current US$'").count() == 1)
    assert(df.filter("Country = 'Namibia' AND `1990` IS NULL").count() == 1)
  }

  test("xlsx through S6 fixed header offset (energydata shape)") {
    val wb = XlsxWorkbook(writeFixture())
    // header=1 semantics on sheet2: row 0 is the header directly
    val df = SheetOps.toDataFrame(spark, wb.sheet("Share of GDP"), headerRow = 0)
    assert(df.columns.toSet == Set("Country", "1995", "q\"q"))
    assert(df.count() == 1)
  }

  test("column reference arithmetic covers multi-letter columns") {
    assert(XlsxWorkbook.colIndex("A1") == 0)
    assert(XlsxWorkbook.colIndex("Z9") == 25)
    assert(XlsxWorkbook.colIndex("AA12") == 26)
    assert(XlsxWorkbook.colIndex("BC12") == 54)
  }
}

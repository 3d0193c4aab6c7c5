package graft.sources

import java.io.File

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: any cell grid written as OOXML by the test writer reads
  * back identically through XlsxWorkbook — strings with XML-special
  * and non-ASCII characters, numbers, sparse nulls, ragged rows.
  * ScalaCheck generators driven directly with a fixed seed (no
  * scalatest bridge in the offline cache). */
class XlsxRoundTripSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val cellGen: Gen[Any] = Gen.frequency(
    4 -> Gen.oneOf("plain", "a&b", "<tag>", "q\"q", "Türkiye", "x y", ""),
    2 -> Gen.choose(-1000000, 1000000),
    2 -> Gen.choose(-1000.0, 1000.0).map(v => math.rint(v * 100) / 100),
    2 -> Gen.const(null))

  private val gridGen: Gen[List[List[Any]]] =
    Gen.chooseNum(1, 8).flatMap(r => Gen.listOfN(r,
      Gen.chooseNum(1, 6).flatMap(c => Gen.listOfN(c, cellGen))))

  /** What the reader is specified to return for a written row: cells
    * as strings, trailing nulls trimmed (omitted cells shorten the
    * physical row). Empty strings write as real inline-string cells
    * and must survive. */
  private def expectedRow(row: List[Any]): Seq[String] = {
    val rendered = row.map {
      case null => null
      case s: String => s
      case n => n.toString
    }
    rendered.take(rendered.lastIndexWhere(_ != null) + 1)
  }

  test("write → read round-trips arbitrary grids") {
    forAll(gridGen) { grid =>
      val f = File.createTempFile("graft-roundtrip", ".xlsx")
      try {
        XlsxTestWriter.write(f, Seq("S" -> grid.map(_.toSeq)))
        val got = XlsxWorkbook(f).sheet("S")
        // the writer emits a <row> element for every input row, so
        // all-null rows survive as empty rows (physical shape kept)
        val want = grid.map(expectedRow)
        assert(got == want, s"grid: $grid")
      } finally f.delete()
    }
  }
}

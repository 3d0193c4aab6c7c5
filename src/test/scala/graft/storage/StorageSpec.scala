package graft.storage

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSuite

class StorageSpec extends SparkSuite {
  import spark.implicits._

  test("version stamp format") {
    assert(Storage.stamp(LocalDate.of(2026, 8, 12)) == "v26-08-12")
  }

  test("versioned parquet roundtrip + extension dispatch") {
    val tmp = Files.createTempDirectory("graft-storage").toString
    val st = LocalStorage(tmp, "v99-01-01")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val p = st.write(df, "demo")
    assert(p == s"$tmp/v99-01-01/demo.parquet")
    assert(st.read(spark, p).count() == 2)
    val c = st.write(df, "demo", "csv")
    val back = st.read(spark, c)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "s"))
  }

  test("csv read keeps the literal string NA (Namibia trap)") {
    val tmp = Files.createTempDirectory("graft-na").toString
    Files.writeString(java.nio.file.Path.of(tmp, "c.csv"), "iso2,name\nNA,Namibia\n,Empty")
    val st = LocalStorage(tmp)
    val df = st.read(spark, s"$tmp/c.csv")
    val namibia = df.filter("name = 'Namibia'").collect()(0)
    assert(namibia.getString(0) == "NA")
    assert(df.filter("name = 'Empty'").collect()(0).isNullAt(0))
  }

  test("unsupported write format rejected") {
    val st = LocalStorage("/tmp/none")
    intercept[IllegalArgumentException](
      st.write(Seq(1).toDF("x"), "bad", "xlsx"))
  }
}

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

  test("versions listing + as-of read resolve the right snapshot") {
    val tmp = Files.createTempDirectory("graft-tt").toString
    LocalStorage(tmp, "v20-01-01").write(Seq((1, "a")).toDF("id", "s"), "t")
    LocalStorage(tmp, "v20-06-15").write(Seq((1, "a"), (2, "b")).toDF("id", "s"), "t")
    // non-version junk dirs are ignored
    Files.createDirectory(java.nio.file.Path.of(tmp, "scratch"))
    assert(Storage.versions(spark, tmp) == Seq("v20-01-01", "v20-06-15"))
    assert(Storage.readAsOf(spark, tmp, "t", "v20-03-01").count() == 1)
    assert(Storage.readAsOf(spark, tmp, "t", "v20-06-15").count() == 2) // inclusive
    assert(Storage.readAsOf(spark, tmp, "t", "v21-01-01").count() == 2)
    val e = intercept[IllegalArgumentException] {
      Storage.readAsOf(spark, tmp, "t", "v19-12-31")
    }
    assert(e.getMessage.contains("v20-01-01"))
    assert(Storage.versions(spark, s"$tmp/absent").isEmpty)
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

  test("partitioned layout prunes at planning time (provider/year)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val tmp = Files.createTempDirectory("graft-part").toString
    val st = LocalStorage(tmp, "v99-01-01")
    val obs = Seq(
      ("p1", 2019, "AFG", 1.0), ("p1", 2020, "AFG", 2.0),
      ("p2", 2019, "NAM", 3.0), ("p2", 2020, "NAM", 4.0),
      ("p3", 2021, "KEN", 5.0))
      .toDF("provider", "year", "country_code", "value")
    val p = st.writePartitioned(obs, "observations", Seq("provider", "year"))

    val q = st.read(spark, p)
      .filter("provider = 'p1' AND year = 2019 AND value > 0")
    // the filter must land in PartitionFilters (directory pruning),
    // not survive only as a post-scan data filter
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val pf = scan.metadata("PartitionFilters")
    assert(pf.contains("provider") && pf.contains("year"), s"no partition filters: $pf")
    // and the pruned listing must touch exactly the one matching
    // partition directory out of five
    val pruned = scan.relation.location.listFiles(
      scan.partitionFilters.filter(_.references.nonEmpty), scan.dataFilters)
    assert(pruned.length == 1, s"expected 1 pruned partition, got ${pruned.length}")
    // partition columns relocate to the end of the read schema
    assert(q.collect().map(_.getAs[Double]("value")).toSeq == Seq(1.0))
    // the non-partition predicate still reaches the parquet reader
    assert(scan.metadata("PushedFilters").contains("GreaterThan(value,0.0)"))
  }

  test("unsupported write format rejected") {
    val st = LocalStorage("/tmp/none")
    intercept[IllegalArgumentException](
      st.write(Seq(1).toDF("x"), "bad", "xlsx"))
  }

  test("K2: az:// root translates to the ABFS URI + SAS conf mapping") {
    // pure string-level pin of the cloud path translation (no Azure in
    // this container): az://container/prefix with an account maps to
    // the Hadoop ABFS connector's URI and per-account credential keys
    assert(AzureStorage.abfsUri("az://indicators/raw/2024", "undpstore") ==
      "abfss://indicators@undpstore.dfs.core.windows.net/raw/2024")
    assert(AzureStorage.abfsUri("az://indicators", "undpstore") ==
      "abfss://indicators@undpstore.dfs.core.windows.net")
    assert(AzureStorage.sasConfKey("undpstore") ==
      "fs.azure.sas.fixed.token.undpstore.dfs.core.windows.net")
    assert(AzureStorage.accountKeyConfKey("undpstore") ==
      "fs.azure.account.key.undpstore.dfs.core.windows.net")
    intercept[IllegalArgumentException] {
      AzureStorage.abfsUri("s3://bucket/key", "undpstore")
    }
    intercept[IllegalArgumentException] {
      AzureStorage.abfsUri("az://indicators", "")
    }
    // storage built over the translated root versions its paths there
    val st = AzureStorage("az://indicators/etl", "undpstore", version = "v25-01-01")
    assert(st.pathFor("gdp") ==
      "abfss://indicators@undpstore.dfs.core.windows.net/etl/v25-01-01/gdp.parquet")
    // SAS wiring lands under the account-scoped keys (leading '?' normalized)
    AzureStorage.configureSas(spark, "undpstore", "?sv=2024&sig=abc")
    assert(spark.conf.get("fs.azure.account.auth.type.undpstore.dfs.core.windows.net") == "SAS")
    assert(spark.conf.get("fs.azure.sas.fixed.token.undpstore.dfs.core.windows.net") == "sv=2024&sig=abc")
  }
}

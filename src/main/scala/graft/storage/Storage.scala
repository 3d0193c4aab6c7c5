package graft.storage

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned dataset storage (reference: `storage/_base.py:27-109`).
  *
  * Datasets live at `{root}/{version}/{name}.{fmt}` with
  * `version = v{yy-MM-dd}` stamped from the clock at construction
  * (K1). Reads dispatch on extension (S1/S2/S3); an extension-less
  * path is parquet — and in Spark a parquet *directory* unions its
  * part-files natively, which is the reference's folder-concat
  * behaviour (S2) for free.
  */
trait Storage {
  def root: String
  def version: String

  def pathFor(name: String, fmt: String = "parquet"): String =
    s"$root/$version/$name.$fmt"

  /** K1/K3: versioned write; parent dirs come from the Hadoop
    * committer (mkdir -p semantics). Returns the written path. */
  def write(df: DataFrame, name: String, fmt: String = "parquet"): String = {
    val p = pathFor(name, fmt)
    fmt match {
      case "parquet" => df.write.mode("overwrite").parquet(p)
      case "csv" => df.write.mode("overwrite")
        .option("header", "true").csv(p)
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
    p
  }

  /** K1 at warehouse scale: versioned write with a Hive-style
    * partition layout (`.../name.parquet/provider=X/year=2019/…`).
    * This is the 100 TB serving layout — queries filtering on the
    * partition columns prune directories at planning time instead of
    * scanning the corpus (PartitionFilters in the scan node), and
    * per-provider reloads overwrite only their own subtree. Choose
    * low-cardinality columns (provider, year): 12 providers × ~25
    * years ≈ 300 partitions, each still large enough for fat parquet
    * files. */
  def writePartitioned(
      df: DataFrame, name: String, partitionCols: Seq[String],
      fmt: String = "parquet"): String = {
    require(fmt == "parquet", s"partitioned writes are parquet-only, got $fmt")
    val p = pathFor(name, fmt)
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(p)
    p
  }

  /** S1/S2 read dispatch on extension. `keepNA=true` preserves literal
    * "NA" strings (the Namibia trap — Spark's CSV reader nulls only
    * empty strings by default, but we pin it explicitly). */
  def read(spark: SparkSession, path: String): DataFrame =
    path.split('.').lastOption match {
      case Some("csv") => spark.read
        .option("header", "true")
        .option("nullValue", "")      // "" -> null; "NA" survives
        .csv(path)
      case Some("parquet") | None => spark.read.parquet(path)
      case Some(_) if !path.substring(path.lastIndexOf('/') + 1).contains('.') =>
        spark.read.parquet(path)      // extension-less name
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported extension $other")
    }

  /** Read a named dataset of this version. */
  def readName(spark: SparkSession, name: String, fmt: String = "parquet"): DataFrame =
    read(spark, pathFor(name, fmt))
}

object Storage {
  /** Reference version-stamp format (`storage/_base.py:29-38`): the
    * reference stamps in UTC (`datetime.now(UTC)`), so the default must
    * be UTC too — a local-zone clock diverges near midnight. */
  def stamp(date: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): String =
    "v" + date.format(DateTimeFormatter.ofPattern("yy-MM-dd"))

  private val VersionDir = "^v\\d{2}-\\d{2}-\\d{2}$".r

  /** Time-travel surface over the versioned layout: list the version
    * directories under a root, ASCENDING. The `v{yy-MM-dd}` stamp
    * sorts lexically = chronologically, so `last` is the latest and
    * an as-of lookup is a plain string comparison — no manifest or
    * catalog required, the directory layout IS the version log.
    * Listed via the Hadoop FileSystem API so the same call works on
    * an ABFS root (K2); listing is metadata-only (one RPC per root,
    * version count ~days — never data-proportional). */
  def versions(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => VersionDir.matches(n))
      .sorted
  }

  /** Read dataset `name` as of version stamp `asOf` (inclusive): the
    * LATEST version with stamp <= asOf — i.e. the table a reader at
    * that date would have seen. Throws (loudly, with the available
    * versions) when no version qualifies: an empty DataFrame here
    * would silently read as "dataset was empty then". */
  def readAsOf(spark: SparkSession, root: String, name: String,
      asOf: String): DataFrame = {
    val vs = versions(spark, root)
    val at = vs.filter(_ <= asOf)
    require(at.nonEmpty,
      s"no version of $root/$name at or before $asOf (have: ${vs.mkString(", ")})")
    LocalStorage(root, at.last).readName(spark, name)
  }
}

/** Local-filesystem backend (reference `storage/local.py`). An ABFS/
  * cloud backend is the same code with a different root URI — path
  * translation is Hadoop-connector config, not engine code (K2). */
final case class LocalStorage(
    root: String,
    version: String = Storage.stamp()) extends Storage

/** K2: Azure Blob/ADLS backend (reference `storage/azure.py:29-50`).
  * The reference addresses datasets as `az://{container}/{prefix}` and
  * authenticates with an account + SAS token from configuration;
  * Spark's Hadoop ABFS connector wants
  * `abfss://{container}@{account}.dfs.core.windows.net/{prefix}` and
  * the credential under a per-account Hadoop conf key. The translation
  * is pure string mapping (spec'd without a cloud); the writes/reads
  * are the same [[Storage]] code over the translated root. Untestable
  * end-to-end in this container (no Azure connectivity) — the mapping
  * is the testable surface. */
object AzureStorage {

  private val Az = "^az://([^/@]+)(?:/(.*))?$".r

  /** `az://container/prefix` → `abfss://container@account.dfs.core.windows.net/prefix`. */
  def abfsUri(azUri: String, account: String): String = {
    require(account.nonEmpty, "storage account must be non-empty")
    azUri match {
      case Az(container, prefix) =>
        val p = Option(prefix).filter(_.nonEmpty).map("/" + _).getOrElse("")
        s"abfss://$container@$account.dfs.core.windows.net$p"
      case other =>
        throw new IllegalArgumentException(
          s"not an az:// URI (expected az://container[/prefix]): $other")
    }
  }

  /** Hadoop conf key for a fixed SAS token on this account. */
  def sasConfKey(account: String): String =
    s"fs.azure.sas.fixed.token.$account.dfs.core.windows.net"

  /** Hadoop conf key for an account key credential. */
  def accountKeyConfKey(account: String): String =
    s"fs.azure.account.key.$account.dfs.core.windows.net"

  /** Hadoop conf key selecting the SAS auth mechanism. */
  def authTypeConfKey(account: String): String =
    s"fs.azure.account.auth.type.$account.dfs.core.windows.net"

  /** Wire a SAS credential into the session (reference
    * `azure.py`: fsspec takes the token from config; the ABFS
    * connector reads these keys). */
  def configureSas(spark: SparkSession, account: String, sasToken: String): Unit = {
    spark.conf.set(authTypeConfKey(account), "SAS")
    spark.conf.set(sasConfKey(account), sasToken.stripPrefix("?"))
  }

  /** Versioned storage rooted at the translated ABFS URI. */
  def apply(azRoot: String, account: String,
      version: String = Storage.stamp()): Storage =
    LocalStorage(abfsUri(azRoot, account), version)
}

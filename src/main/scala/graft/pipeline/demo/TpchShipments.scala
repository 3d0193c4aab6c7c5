package graft.pipeline.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Countries, Tables}
import graft.expr.Exprs
import graft.pipeline.{Pipeline, Retriever, Settings, Transformer}
import graft.storage.Storage

/** Flagship end-to-end pipeline: TPC-H shipments → canonical
  * observations, through the full reference lifecycle (retrieve →
  * transform → provider stamp → country membership filter → validation
  * → year window). Demonstrates the engine's spine on the driver's
  * synthetic tables: joins against broadcast dims, a deterministic
  * country-code mapping from the packaged reference table, exact
  * decimal aggregation, dimension_* folding inside validation.
  */
object TpchShipments {
  val provider = "tpch_shipments"
  val indicatorName = "Shipped quantity, units [QTY]"

  /** nationkey (0..24) → ISO3, deterministically the 25 lowest-M49
    * countries of the packaged reference. */
  lazy val nationIso3: Map[Int, String] =
    Countries.all.sortBy(_.m49).take(25).zipWithIndex
      .map { case (c, i) => i -> c.iso3 }.toMap

  final case class TpchRetriever(sfDir: String) extends Retriever {
    override def retrieve(spark: SparkSession, storage: Option[Storage]): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem")
      val sup = Tables.load(spark, sfDir, "supplier")
      val nat = Tables.load(spark, sfDir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_nationkey"), year(col("l_shipdate")).as("year"),
          col("l_returnflag"), col("l_quantity"))
    }
  }

  object ShipmentsTransformer extends Transformer {
    override def transform(df: DataFrame): DataFrame =
      df.withColumn("country_code",
          element_at(typedLit(nationIso3), col("n_nationkey").cast("int")))
        .groupBy(col("country_code"), col("year"), col("l_returnflag"))
        .agg(Exprs.exactSum(col("l_quantity")).as("value"))
        .withColumn("indicator_name", lit(indicatorName))
        .withColumn("dimension_returnflag", col("l_returnflag"))
        .select(col("indicator_name"), col("country_code"), col("year"),
          col("value"), col("dimension_returnflag"))
  }

  /** TPC-H ship years are 1995–2001, so the year window widens from
    * the reference's 2005–2030 default. */
  def pipeline(sfDir: String): Pipeline =
    Pipeline(provider, TpchRetriever(sfDir), ShipmentsTransformer,
      Settings(yearMin = 1990, yearMax = 2030))

  def run(spark: SparkSession, sfDir: String): DataFrame =
    pipeline(sfDir).run(spark)
}

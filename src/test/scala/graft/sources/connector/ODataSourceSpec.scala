package graft.sources.connector

import graft.SparkSuite
import graft.sources.Transport

/** Offline transport for connector tests: static (same-JVM, local
  * mode) payload map keyed by URL suffix, with request recording so
  * pushdown can be asserted at the wire. */
class TestODataTransportFactory extends TransportFactory {
  override def create(options: Map[String, String]): Transport =
    new Transport {
      override def get(url: String, params: Map[String, String]): Option[String] = {
        TestODataTransportFactory.synchronized {
          TestODataTransportFactory.requests =
            TestODataTransportFactory.requests :+ ((url, params))
        }
        TestODataTransportFactory.responses.collectFirst {
          case (suffix, body) if url.endsWith(suffix) => body
        }
      }
    }
}

object TestODataTransportFactory {
  @volatile var responses: Map[String, String] = Map.empty
  @volatile var requests: Seq[(String, Map[String, String])] = Nil
  def reset(): Unit = { responses = Map.empty; requests = Nil }
}

class ODataSourceSpec extends SparkSuite {
  import spark.implicits._

  private def readOData() = spark.read
    .format("graft.sources.connector.ODataSource")
    .schema("SpatialDim STRING, TimeDim INT, NumericValue DOUBLE, DataSourceDim STRING")
    .option("url", "https://example.test/api")
    .option("indicators", "IND_A,IND_B")
    .option("transportFactory", classOf[TestODataTransportFactory].getName)
    .load()

  private val bodyA = """{"value":[
    {"SpatialDim":"AFG","TimeDim":2020,"NumericValue":1.5,"DataSourceDim":"DATASOURCE_X"},
    {"SpatialDim":"NAM","TimeDim":2019,"NumericValue":2.5,"DataSourceDim":"DATASOURCE_Y"}]}"""
  private val bodyB = """{"value":[
    {"SpatialDim":"AFG","TimeDim":2021,"NumericValue":3.5,"DataSourceDim":null}]}"""

  test("filters push down to the OData $filter string; one partition per indicator") {
    TestODataTransportFactory.reset()
    TestODataTransportFactory.responses = Map("/IND_A" -> bodyA, "/IND_B" -> bodyB)
    val df = readOData()
      .filter($"SpatialDim" === "AFG" && $"TimeDim" >= 2020)
    val rows = df.select("SpatialDim", "TimeDim", "NumericValue")
      .collect().map(_.toSeq).toSet
    // server-side filtering is simulated as a no-op (canned payloads),
    // so Spark's own evaluation of the SAME predicates must still hold:
    assert(rows == Set(Seq("AFG", 2020, 1.5), Seq("AFG", 2021, 3.5)))
    // the wire carried the pushed predicates
    val filters = TestODataTransportFactory.requests.map(_._2("$filter")).distinct
    assert(filters.size == 1)
    val f = filters.head
    assert(f.contains("NumericValue ne null"))
    assert(f.contains("SpatialDim eq 'AFG'"))
    assert(f.contains("TimeDim ge 2020"))
    // both indicator partitions fetched
    val urls = TestODataTransportFactory.requests.map(_._1).toSet
    assert(urls == Set("https://example.test/api/IND_A", "https://example.test/api/IND_B"))
    // and the plan advertises the pushdown
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ODataScan"))
  }

  test("untranslatable predicates stay as post-filters and still apply") {
    TestODataTransportFactory.reset()
    TestODataTransportFactory.responses = Map("/IND_A" -> bodyA, "/IND_B" -> bodyB)
    val df = readOData().filter($"DataSourceDim".endsWith("_X"))
    assert(df.select("SpatialDim").collect().map(_.getString(0)).toSeq == Seq("AFG"))
    val f = TestODataTransportFactory.requests.map(_._2("$filter")).distinct
    // EndsWith itself is not translatable (no OData clause for it) but
    // Spark derives and pushes the null-safety guard
    assert(f == Seq("NumericValue ne null and DataSourceDim ne null"))
  }

  test("column pruning reaches the reader schema and the wire as $select") {
    TestODataTransportFactory.reset()
    TestODataTransportFactory.responses = Map("/IND_A" -> bodyA, "/IND_B" -> bodyB)
    val df = readOData().select("NumericValue")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.5, 2.5, 3.5))
    val selects = TestODataTransportFactory.requests.map(_._2.get("$select")).distinct
    assert(selects == Seq(Some("NumericValue")))
  }

  test("$select keeps filter-referenced columns so the local re-check can run") {
    TestODataTransportFactory.reset()
    TestODataTransportFactory.responses = Map("/IND_A" -> bodyA, "/IND_B" -> bodyB)
    val df = readOData()
      .filter($"SpatialDim" === "AFG")
      .select("NumericValue")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.5, 3.5))
    val selects = TestODataTransportFactory.requests.flatMap(_._2.get("$select")).distinct
    assert(selects.size == 1)
    val cols = selects.head.split(",").toSet
    assert(cols.contains("NumericValue") && cols.contains("SpatialDim"))
  }

  test("fetch errors degrade to empty partitions (error-tolerant scan)") {
    TestODataTransportFactory.reset()
    TestODataTransportFactory.responses = Map("/IND_A" -> bodyA) // IND_B missing
    assert(readOData().count() == 2)
  }

  test("local re-check passes rows on type-undecidable comparisons") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    import org.json4s.jackson.JsonMethods
    // numeric filter vs string-serialized number: undecidable -> pass
    val row = JsonMethods.parse("""{"TimeDim":"1000","SpatialDim":"AFG"}""")
    assert(ODataFilters.evalLocally(row, GreaterThan("TimeDim", 999)))
    // matching types still filter
    assert(!ODataFilters.evalLocally(row, EqualTo("SpatialDim", "NAM")))
    // null field fails comparisons (the value-guard semantics)
    assert(!ODataFilters.evalLocally(row, EqualTo("Missing", "x")))
  }

  test("string literals double embedded single quotes") {
    import org.apache.spark.sql.sources.EqualTo
    assert(ODataFilters.render(EqualTo("DataSourceDim", "L'OMS")) ==
      "DataSourceDim eq 'L''OMS'")
    assert(graft.sources.JsonSources.odataFilter(Map("k" -> "a'b")) ==
      "NumericValue ne null and k eq 'a''b'")
  }
}

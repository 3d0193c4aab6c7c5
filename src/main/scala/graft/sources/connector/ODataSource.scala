package graft.sources.connector

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.{JdkHttpTransport, Transport}

/** DataSource V2 connector for OData observation endpoints (S9) with
  * real predicate pushdown: Catalyst filters on the scan translate to
  * the OData `$filter` string (the reference builds the same string by
  * hand, `who_gho_api.py:112-123`), so the server — not Spark —
  * discards non-matching rows. Untranslatable predicates stay in the
  * plan as post-filters; `.explain` shows both sets.
  *
  * Parallelism: one input partition per indicator code, so a
  * 1000-indicator pull fans out across executors instead of looping on
  * the driver (the reference's sequential tqdm loop).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.connector.ODataSource")
  *   .schema("SpatialDim STRING, TimeDim INT, NumericValue DOUBLE")
  *   .option("url", "https://ghoapi.azureedge.net/api")
  *   .option("indicators", "WHOSIS_000001,WHOSIS_000002")
  *   .load()
  *   .filter($"SpatialDim" === "AFG")   // pushed to $filter
  * }}}
  *
  * `transportFactory` (a [[TransportFactory]] class name) makes the
  * HTTP layer injectable — tests run fully offline.
  */
class ODataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft OData source requires an explicit .schema(...)")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    ODataTable(schema, properties.asScala.toMap)
}

/** Factory indirection so executors can construct the transport from
  * the serialized option map. */
trait TransportFactory extends Serializable {
  def create(options: Map[String, String]): Transport
}

final class JdkTransportFactory extends TransportFactory {
  override def create(options: Map[String, String]): Transport =
    new JdkHttpTransport(options.getOrElse("timeoutSeconds", "30").toInt)
}

final case class ODataTable(tableSchema: StructType, options: Map[String, String])
    extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String = s"odata(${options.getOrElse("url", "?")})"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(tableSchema, options)
}

final class ODataScanBuilder(schema: StructType, options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(ODataFilters.translatable)
    pushed = supported
    rejected // Spark keeps these as post-scan filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = ODataScan(required, options, pushed)
}

/** Catalyst → OData `$filter` translation (v1 Filter surface). */
object ODataFilters {
  def translatable(f: Filter): Boolean = f match {
    case _: EqualTo | _: In | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull => true
    case And(l, r) => translatable(l) && translatable(r)
    case _ => false
  }

  private def renderValue(v: Any): String = v match {
    // OData escapes a single quote by doubling it
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => String.valueOf(other)
  }

  def render(f: Filter): String = f match {
    case EqualTo(a, v) => s"$a eq ${renderValue(v)}"
    case In(a, vs) => s"$a in (${vs.map(renderValue).mkString(", ")})"
    case GreaterThan(a, v) => s"$a gt ${renderValue(v)}"
    case GreaterThanOrEqual(a, v) => s"$a ge ${renderValue(v)}"
    case LessThan(a, v) => s"$a lt ${renderValue(v)}"
    case LessThanOrEqual(a, v) => s"$a le ${renderValue(v)}"
    case IsNotNull(a) => s"$a ne null"
    case And(l, r) => s"${render(l)} and ${render(r)}"
    case other => throw new IllegalArgumentException(s"untranslatable $other")
  }

  /** Full `$filter` string: the reference's always-on value guard plus
    * every pushed predicate. */
  def filterString(pushed: Seq[Filter]): String =
    ("NumericValue ne null" +: pushed.map(render)).mkString(" and ")

  /** Reader-side re-evaluation of pushed predicates. Spark does NOT
    * re-check filters a source accepted — and real OData endpoints
    * silently ignore `$filter` fields they don't know — so the reader
    * applies them again as a safety net (cheap row predicate, still
    * server-side data reduction when the endpoint cooperates).
    *
    * Three-valued: a comparison the reader cannot decide locally
    * (missing field is decidable; a JSON/filter TYPE mismatch, e.g. a
    * numeric filter against a string-serialized number, is not) must
    * PASS the row — dropping it would turn a type quirk into silent
    * data loss. Unknown ≠ false.
    */
  def evalLocally(obj: JValue, f: Filter): Boolean = {
    def field(a: String): JValue = obj \ a
    def isNull(jv: JValue): Boolean = jv == JNothing || jv == JNull
    // None = locally undecidable (type mismatch) → caller passes the row
    def cmp(jv: JValue, v: Any): Option[Int] = (jv, v) match {
      case (JString(s), x: String) => Some(s.compareTo(x))
      case (JInt(i), x: Number) => Some(i.toDouble.compareTo(x.doubleValue()))
      case (JDouble(d), x: Number) => Some(d.compareTo(x.doubleValue()))
      case (JDecimal(d), x: Number) => Some(d.toDouble.compareTo(x.doubleValue()))
      case (JBool(b), x: Boolean) => Some(b.compareTo(x))
      case _ => None
    }
    def decide(jv: JValue, v: Any)(p: Int => Boolean): Boolean =
      if (isNull(jv)) false // null never satisfies a comparison
      else cmp(jv, v).forall(p) // undecidable → pass
    f match {
      case EqualTo(a, v) => decide(field(a), v)(_ == 0)
      case In(a, vs) =>
        if (isNull(field(a))) false
        else {
          val results = vs.map(v => cmp(field(a), v))
          if (results.exists(_.isEmpty)) true // any undecidable → pass
          else results.exists(_.contains(0))
        }
      case GreaterThan(a, v) => decide(field(a), v)(_ > 0)
      case GreaterThanOrEqual(a, v) => decide(field(a), v)(_ >= 0)
      case LessThan(a, v) => decide(field(a), v)(_ < 0)
      case LessThanOrEqual(a, v) => decide(field(a), v)(_ <= 0)
      case IsNotNull(a) => !isNull(field(a))
      case And(l, r) => evalLocally(obj, l) && evalLocally(obj, r)
      case _ => true
    }
  }
}

final case class ODataInputPartition(indicator: String) extends InputPartition

final case class ODataScan(
    required: StructType,
    options: Map[String, String],
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ODataScan(pushed=[${pushed.mkString(", ")}])"

  override def planInputPartitions(): Array[InputPartition] =
    options.getOrElse("indicators", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .map(ODataInputPartition(_)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    ODataReaderFactory(required, options, pushed.toSeq)
}

final case class ODataReaderFactory(
    required: StructType,
    options: Map[String, String],
    pushed: Seq[Filter]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ind = partition.asInstanceOf[ODataInputPartition].indicator
    val factory = Class.forName(
      options.getOrElse("transportFactory", classOf[JdkTransportFactory].getName))
      .getDeclaredConstructor().newInstance().asInstanceOf[TransportFactory]
    new ODataPartitionReader(ind, required, options, pushed, factory.create(options))
  }
}

/** Executor-side reader: one HTTP fetch per indicator partition, rows
  * parsed straight to InternalRow for the pruned schema. */
final class ODataPartitionReader(
    indicator: String,
    required: StructType,
    options: Map[String, String],
    pushed: Seq[Filter],
    transport: Transport) extends PartitionReader[InternalRow] {

  private val rows: Iterator[JValue] = {
    val url = s"${options("url")}/$indicator"
    // $select completes the scan-reduction story: the server ships only
    // the pruned columns plus any filter-referenced fields (the local
    // re-check below must still see its operands — a $select that
    // dropped them would read missing-as-null and silently drop rows)
    val selected = (required.fieldNames ++ pushed.flatMap(_.references)).distinct
    val params = Map("$filter" -> ODataFilters.filterString(pushed)) ++
      (if (selected.nonEmpty) Map("$select" -> selected.mkString(",")) else Map.empty)
    transport.get(url, params) match {
      case Some(body) =>
        JsonMethods.parse(body) \ "value" match {
          case JArray(vs) =>
            vs.iterator.filter(obj =>
              pushed.forall(ODataFilters.evalLocally(obj, _)))
          case _ => Iterator.empty
        }
      case None => Iterator.empty // error-tolerant scan (S14 semantics)
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val obj = rows.next()
      current = InternalRow.fromSeq(required.fields.toSeq.map { f =>
        val v = obj \ f.name
        (v, f.dataType) match {
          case (JNothing | JNull, _) => null
          case (JString(s), StringType) => UTF8String.fromString(s)
          case (jv, StringType) => UTF8String.fromString(JsonMethods.compact(jv))
          case (JInt(i), IntegerType) => i.toInt
          case (JInt(i), LongType) => i.toLong
          case (JDouble(d), DoubleType) => d
          case (JInt(i), DoubleType) => i.toDouble
          case (JDecimal(d), DoubleType) => d.toDouble
          case (JBool(b), BooleanType) => b
          case (jv, dt) => throw new IllegalArgumentException(
            s"cannot read $jv as $dt for column ${f.name}")
        }
      })
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

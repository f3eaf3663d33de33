package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source generating deterministic synthetic web events
  * — the engine-native version of [[graft.datagen.DataGen.syntheticEvents]]
  * demonstrating the full connector surface:
  *
  *  - partition planning: `numPartitions` splits of the id range, each read
  *    independently on executors (no driver materialization at any size);
  *  - column pruning (SupportsPushDownRequiredColumns): unreferenced event
  *    columns are never computed;
  *  - filter pushdown (SupportsPushDownFilters) on `event_seq`: range
  *    predicates shrink the generated id range at planning time.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SyntheticEventsSource")
  *   .option("rows", 1000000).option("numPartitions", 32).load()
  * }}}
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      math.max(0L, properties.getOrDefault("rows", "1000").toLong),
      math.max(1, properties.getOrDefault("numPartitions", "8").toInt))
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_seq", LongType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("utm_source", StringType, nullable = false)))

  val EventTypes: Array[String] = Array("page_view", "click", "add_to_cart", "purchase")
  val Urls: Array[String] = Array("/home", "/products/1", "/products/2", "/cart", "/checkout")
  val UtmSources: Array[String] = Array("facebook", "google", "tiktok_ads", "organic")
  val BaseMicros: Long = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC

  /** Cheap deterministic mix (splitmix64 finalizer) — pure function of the
    * event id and a salt, identical on every executor.
    */
  def mix(id: Long, salt: Long): Long = {
    var z = id + salt * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }
}

class SyntheticEventsTable(rows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, numPartitions)
}

class SyntheticScanBuilder(rows: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = SyntheticEventsSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // +1 adjustments use saturating arithmetic: at Long extremes a plain
    // v+1 overflows and would either drop all rows (hi wrap) or report a
    // filter as pushed while ignoring it (lo wrap) — both silent wrong
    // results, so extreme bounds are handled exactly
    def inc(v: Long) = if (v == Long.MaxValue) v else v + 1
    val (accepted, rejected) = filters.partition {
      case GreaterThan("event_seq", v: Long) =>
        if (v == Long.MaxValue) { lo = hi } else { lo = math.max(lo, v + 1) }; true
      case GreaterThanOrEqual("event_seq", v: Long) => lo = math.max(lo, v); true
      case LessThan("event_seq", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("event_seq", v: Long) => hi = math.min(hi, inc(v)); true
      case EqualTo("event_seq", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, inc(v)); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SyntheticScan(lo, math.max(lo, hi), numPartitions, requiredSchema)
}

case class SyntheticInputPartition(start: Long, end: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, numPartitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticEvents[range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    val step = n / parts
    (0 until parts).map { i =>
      val s = lo + i * step
      val e = if (i == parts - 1) hi else s + step
      SyntheticInputPartition(s, e)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticInputPartition]
    new PartitionReader[InternalRow] {
      import SyntheticEventsSource._
      private var id = p.start - 1
      // generators per required column only (pruning = skipped work per row)
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "event_seq" => (i: Long) => i
        case "user_id" => (i: Long) => UTF8String.fromString("user_" + mix(i, 0) % 50)
        case "event_type" => (i: Long) => UTF8String.fromString(EventTypes((mix(i, 1) % 4).toInt))
        case "url" => (i: Long) => UTF8String.fromString(Urls((mix(i, 2) % 5).toInt))
        case "timestamp" => (i: Long) => BaseMicros + (mix(i, 3) % 3600) * 1000000L
        case "utm_source" => (i: Long) => UTF8String.fromString(UtmSources((mix(i, 4) % 4).toInt))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
      override def close(): Unit = ()
    }
  }
}

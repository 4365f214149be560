package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 batch source for the span-record TSV layout —
  * the stage-(c)-adjacent "sources" tier: scan planning, column
  * pruning, filter pushdown, and zone-map file skipping implemented at
  * the connector boundary instead of as a post-scan Filter.
  *
  * Layout: `<root>/bucket=<k>/part-*.txt`, one tab-separated line per
  * span `doc_id \t offset \t kind \t text \t media_ref`, where every
  * doc in `bucket=<k>` satisfies `k*W <= doc_id < (k+1)*W` for the
  * writer's bucket width `W`. The directory name IS the zone map: a
  * doc_id range predicate prunes whole buckets at PLANNING time
  * ([[SpanTsvScan.planInputPartitions]]), so skipped files are never
  * opened — the row-group/file-skipping model a 100 TB scan lives by,
  * here surfaced through the public connector API so Catalyst sees it
  * as a real source capability rather than engine folklore:
  *
  *  - [[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]]:
  *    the reader materializes ONLY requested columns (a projection of
  *    2 of 5 columns never allocates the other 3);
  *  - [[org.apache.spark.sql.connector.read.SupportsPushDownFilters]]:
  *    doc_id range/equality filters are accepted (honored exactly in
  *    the reader AND used for planning-time file pruning); everything
  *    else is returned as residual for Spark to evaluate post-scan,
  *    so semantics never depend on the source understanding a filter.
  *
  * Reference analog: the Go service reads one request body per
  * invocation (`/root/reference/main.go` handler) — there is no scan
  * planning to port; this source exists because a Spark-native engine
  * needs its ingest boundary to prune before it reads.
  *
  * Sandbox note: listing/opening uses `java.io` against local paths
  * (the only filesystem here). The HDFS/S3 seam is exactly the two
  * methods `listBuckets` and [[SpanTsvPartitionReader]]'s `open`; a
  * cluster deployment swaps them for the Hadoop `FileSystem` API.
  * Malformed lines fail fast — the permissive-ingest posture lives in
  * [[JsonSource]]; this format is machine-written by [[SpanTsv.write]].
  */
object SpanTsv {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("offset", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false)))

  /** Distributed writer: sanitizes the two structural characters out
    * of text fields (tab/newline -> space, length-preserving), buckets
    * by `doc_id div bucketWidth`, and writes one text file per bucket
    * (the repartition pins each bucket to one task). The bucket dirs
    * are the zone map the reader prunes on.
    */
  def write(df: DataFrame, outPath: String, bucketWidth: Long): Unit = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def clean(c: org.apache.spark.sql.Column) =
      translate(c, "\t\n\r", "   ")
    df.select(
        expr(s"doc_id div ${bucketWidth}L").as("bucket"),
        concat_ws("\t",
          col("doc_id").cast("string"), col("offset").cast("string"),
          clean(col("kind")), clean(col("text")), clean(col("media_ref")))
          .as("value"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").text(outPath)
  }

  /** Reader entry point: the DSv2 scan with pruning/pushdown/skipping. */
  def read(spark: SparkSession, path: String, bucketWidth: Long): DataFrame =
    spark.read.format(classOf[SpanTsvSource].getName)
      .option("path", path)
      .option("bucketWidth", bucketWidth.toString)
      .load()
}

/** The TableProvider Spark instantiates for
  * `format("graft.sources.SpanTsvSource")`.
  */
class SpanTsvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpanTsv.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "SpanTsvSource requires option 'path'")
    val width = Option(properties.get("bucketWidth")).map(_.toLong).getOrElse(50L)
    new SpanTsvTable(path, width)
  }
}

class SpanTsvTable(path: String, bucketWidth: Long)
    extends Table with SupportsRead {
  override def name(): String = s"span_tsv(`$path`)"
  override def schema(): StructType = SpanTsv.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpanTsvScanBuilder(path, bucketWidth)
}

class SpanTsvScanBuilder(path: String, bucketWidth: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = SpanTsv.schema
  private var accepted: Array[Filter] = Array.empty

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** A filter is accepted iff it is a doc_id bound this source honors
    * EXACTLY (reader-side row check + planning-time file skip).
    */
  private def acceptable(f: Filter): Boolean = f match {
    case EqualTo("doc_id", v) => asLong(v).isDefined
    case GreaterThan("doc_id", v) => asLong(v).isDefined
    case GreaterThanOrEqual("doc_id", v) => asLong(v).isDefined
    case LessThan("doc_id", v) => asLong(v).isDefined
    case LessThanOrEqual("doc_id", v) => asLong(v).isDefined
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(acceptable)
    filters.filterNot(acceptable)
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  /** Fold the accepted filters into one [lo, hi] doc_id window. */
  private def bounds: (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    accepted.foreach {
      case EqualTo("doc_id", v) =>
        val l = asLong(v).get; lo = math.max(lo, l); hi = math.min(hi, l)
      case GreaterThan("doc_id", v) => lo = math.max(lo, asLong(v).get + 1)
      case GreaterThanOrEqual("doc_id", v) => lo = math.max(lo, asLong(v).get)
      case LessThan("doc_id", v) => hi = math.min(hi, asLong(v).get - 1)
      case LessThanOrEqual("doc_id", v) => hi = math.min(hi, asLong(v).get)
      case _ => ()
    }
    (lo, hi)
  }

  override def build(): Scan = {
    val (lo, hi) = bounds
    new SpanTsvScan(path, bucketWidth, required, lo, hi, accepted)
  }
}

class SpanTsvScan(path: String, bucketWidth: Long, requiredSchema: StructType,
    lo: Long, hi: Long, accepted: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"SpanTsvScan path=$path, PushedFilters: [${accepted.mkString(", ")}], " +
      s"ReadSchema: ${requiredSchema.simpleString}"

  /** One InputPartition per data file, with planning-time zone-map
    * skipping: a `bucket=k` directory whose doc_id window
    * [k*W, (k+1)*W) cannot intersect [lo, hi] contributes NO
    * partitions — its files are never opened. Listing is sorted so
    * partition order (and thus task numbering) is deterministic.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new java.io.File(path)
    val bucketDirs = Option(root.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .sortBy(_.getName)
    bucketDirs.flatMap { d =>
      val k = d.getName.stripPrefix("bucket=").toLong
      val bLo = k * bucketWidth
      val bHi = k * bucketWidth + bucketWidth - 1
      if (bHi < lo || bLo > hi) Array.empty[InputPartition]
      else Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
        .sortBy(_.getName)
        .map(f => SpanTsvInputPartition(f.getAbsolutePath): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SpanTsvReaderFactory(requiredSchema.fieldNames, lo, hi)
}

case class SpanTsvInputPartition(file: String) extends InputPartition

case class SpanTsvReaderFactory(fieldNames: Array[String], lo: Long, hi: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SpanTsvPartitionReader(
      partition.asInstanceOf[SpanTsvInputPartition].file, fieldNames, lo, hi)
}

/** Line reader for one file: parses the 5 TSV fields, applies the
  * pushed doc_id window exactly, and materializes ONLY the pruned
  * columns (in the pruned schema's field order). Malformed lines fail
  * the task — this format is machine-written; corruption means the
  * write was bad, not the data.
  */
class SpanTsvPartitionReader(file: String, fieldNames: Array[String],
    lo: Long, hi: Long) extends PartitionReader[InternalRow] {

  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    new java.io.FileInputStream(file), java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val parts = line.split("\t", -1)
        require(parts.length == 5,
          s"malformed span-tsv line in $file: ${parts.length} fields")
        val docId = java.lang.Long.parseLong(parts(0))
        if (docId >= lo && docId <= hi) {
          val values: Array[Any] = fieldNames.map {
            case "doc_id" => docId
            case "offset" => java.lang.Integer.parseInt(parts(1))
            case "kind" => UTF8String.fromString(parts(2))
            case "text" => UTF8String.fromString(parts(3))
            case "media_ref" => UTF8String.fromString(parts(4))
            case other => throw new IllegalArgumentException(
              s"unknown span-tsv column $other")
          }
          row = new GenericInternalRow(values)
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

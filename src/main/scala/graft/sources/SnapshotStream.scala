package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** STRUCTURED-STREAMING source over a snapshot dataset's TYPED change
  * feed (the Delta streaming-source analogue, completing the CDC
  * story the poll-style `SnapshotTail` started): `spark.readStream
  * .format("graft.sources.SnapshotStreamSource").option("root", …)`
  * delivers every `changeFeed` row — data columns plus
  * `_change_type` ∈ {insert, upsert, delete} and `_commit_version` —
  * with snapshot VERSIONS as the stream offsets, so Spark's own
  * offset log makes consumption exactly-once across restarts (no
  * foreachBatch plumbing, no side cursor: the checkpoint IS the
  * cursor).
  *
  * Planning is pure metadata: each micro-batch's offsets name a
  * version range, [[Snapshots.changeFileGroups]] resolves it to the
  * contributing files (new files for appends, bounded change sets for
  * merge/delete/update, nothing for layout/analyze), and ONE
  * InputPartition per file reads in the executors — I/O is O(changed
  * rows), never the standing corpus, the changesBetween economics on
  * the streaming surface. A data REWRITE fails the batch fast (the
  * feed's contract: rows were replaced with no change record —
  * restart the stream from a fresh checkpoint after a resync).
  *
  * The read schema pins at stream start (the stream-source contract):
  * files written before a later widening surface the missing columns
  * as null; columns added after the stream started don't surface
  * until restart. Flat primitive columns (the snapshot layer's stats
  * surface: integral, floating, string, boolean, timestamp-micros,
  * date) are supported — nested types belong in batch reads.
  */
object SnapshotStream {

  /** The stream's read schema for `root`: the latest version's pinned
    * schema + the two change-feed columns.
    */
  def streamSchema(s: SparkSession, root: String): StructType = {
    val v = Snapshots.latestVersion(s, root)
    require(v >= 1, s"snapshot stream needs an existing dataset at $root")
    val m = Snapshots.readManifestData(s, root, v)
    val sc = m.schema.getOrElse(s.read.parquet(m.files: _*).schema)
    StructType(sc.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", IntegerType, nullable = false))
  }

  /** readStream entry — the spec surface. */
  def readStream(s: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame =
    s.readStream.format("graft.sources.SnapshotStreamSource")
      .option("root", root).load()
}

/** Stream offset: the highest consumed snapshot version. */
final case class SnapshotOffset(v: Int) extends Offset {
  override def json(): String = s"""{"version":$v}"""
}

class SnapshotStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotStream.streamSchema(SparkSession.active, options.get("root"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SnapshotStreamTable(properties.get("root"), schema)
}

class SnapshotStreamTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"snapshot_stream($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // ADMISSION CONTROL (the maxFilesPerTrigger analogue): bound each
    // micro-batch to this many snapshot VERSIONS — a stream started
    // against a long backlog must not fold the whole history into one
    // giant first batch. 0 = unbounded (the default).
    val maxV = Option(options.get("maxVersionsPerBatch"))
      .map(_.toInt).getOrElse(0)
    () => new SnapshotStreamScan(root, tableSchema, maxV)
  }
}

class SnapshotStreamScan(root: String, tableSchema: StructType,
    maxVersionsPerBatch: Int) extends Scan {
  override def readSchema(): StructType = tableSchema
  override def description(): String = s"SnapshotStream $root"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(root, tableSchema, maxVersionsPerBatch)
}

class SnapshotMicroBatchStream(root: String, tableSchema: StructType,
    maxVersionsPerBatch: Int = 0)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  /** Rate-limited offset advance: at most `maxVersionsPerBatch`
    * versions per micro-batch when configured (each version's work is
    * already bounded by its own commit delta, so versions are the
    * natural admission unit).
    */
  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerBatch > 0) ReadLimit.maxRows(maxVersionsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = Snapshots.latestVersion(spark, root)
    val from = start.asInstanceOf[SnapshotOffset].v
    val capped =
      if (maxVersionsPerBatch > 0) math.min(latest, from + maxVersionsPerBatch)
      else latest
    SnapshotOffset(capped)
  }

  override def reportLatestOffset(): Offset =
    SnapshotOffset(Snapshots.latestVersion(spark, root))

  private def spark = SparkSession.active

  /** Version 0 = deliver the full history: v1's create lands as the
    * bootstrap insert batch (the changeFeed-from-zero convention).
    */
  override def initialOffset(): Offset = SnapshotOffset(0)

  override def latestOffset(): Offset =
    SnapshotOffset(Snapshots.latestVersion(spark, root))

  override def deserializeOffset(json: String): Offset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    SnapshotOffset(m.get("version").asInt)
  }

  override def commit(end: Offset): Unit = () // Spark's offset log IS the cursor

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotOffset].v
    val to = end.asInstanceOf[SnapshotOffset].v
    Snapshots.changeFileGroups(spark, root, from, to).flatMap {
      case (files, _, kind, v) =>
        // per-version pinned schemas need no shipping: the reader
        // resolves the STREAM schema's fields against each file's own
        // footer by name (absent column = null), which is exactly the
        // batch path's metadata-only evolution for flat primitives
        files.map(f => SnapshotChangePartition(f, kind, v))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotChangeReaderFactory(tableSchema,
      org.apache.spark.GraftSparkBridge.serializableConf(
        spark.sparkContext.hadoopConfiguration))
}

final case class SnapshotChangePartition(path: String, kind: String,
    version: Int) extends InputPartition

class SnapshotChangeReaderFactory(tableSchema: StructType,
    serConf: AnyRef with java.io.Serializable)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SnapshotChangeReader(
      partition.asInstanceOf[SnapshotChangePartition], tableSchema,
      org.apache.spark.GraftSparkBridge.confOf(serConf))
}

/** Reads ONE change-feed parquet file executor-side through the
  * parquet example Group API, converting flat primitive columns to
  * the stream schema by NAME (a column the file predates reads as
  * null — metadata-only schema evolution, matching the batch read).
  */
class SnapshotChangeReader(p: SnapshotChangePartition,
    tableSchema: StructType,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
  import org.apache.parquet.io.ColumnIOFactory

  private val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
    org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.path), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val columnIO = new ColumnIOFactory().getColumnIO(fileSchema)
  private val dataFields = tableSchema.fields
    .filterNot(f => f.name == "_change_type" || f.name == "_commit_version")
  private val present: Map[String, Int] = dataFields.iterator
    .map(_.name).filter(fileSchema.containsField)
    .map(n => n -> fileSchema.getFieldIndex(n)).toMap

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var rowsLeftInGroup = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (rowsLeftInGroup == 0L) {
      val pages = reader.readNextRowGroup()
      if (pages == null) return false
      rowsLeftInGroup = pages.getRowCount
      recordReader = columnIO.getRecordReader(
        pages, new GroupRecordConverter(fileSchema))
    }
    val g = recordReader.read()
    rowsLeftInGroup -= 1
    row = convert(g)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()

  private def convert(g: Group): InternalRow = {
    val out = new Array[Any](tableSchema.length)
    var i = 0
    tableSchema.fields.foreach { f =>
      out(i) = f.name match {
        case "_change_type"    => UTF8String.fromString(p.kind)
        case "_commit_version" => p.version
        case n =>
          present.get(n) match {
            case Some(idx) if g.getFieldRepetitionCount(idx) > 0 =>
              f.dataType match {
                case LongType | TimestampType => g.getLong(idx, 0)
                case IntegerType | DateType   => g.getInteger(idx, 0)
                case DoubleType  => g.getDouble(idx, 0)
                case FloatType   => g.getFloat(idx, 0)
                case BooleanType => g.getBoolean(idx, 0)
                case StringType  => UTF8String.fromString(g.getString(idx, 0))
                case other => throw new IllegalArgumentException(
                  s"snapshot stream cannot read column '$n' of type " +
                    s"${other.simpleString} (flat primitives only)")
              }
            case _ => null // absent column or null value
          }
      }
      i += 1
    }
    new GenericInternalRow(out)
  }
}

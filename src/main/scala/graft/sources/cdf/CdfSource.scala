package graft.sources.cdf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TimeTravel

/** Streaming CHANGE FEED over the q157 commit log (Delta's CDF
  * `readChangeFeed` as a real DSv2 source): offsets are COMMIT-LOG
  * GENERATIONS, each micro-batch delivers exactly the rows the commits
  * in `(start, end]` appended, and the scan reads ONLY those commits'
  * files — a downstream streaming consumer pays for each delta's bytes,
  * never the table's.
  *
  *  - `latestOffset` is a NAME-ONLY listing of `_graft_log` (the same
  *    metadata read `currentVersion` does — no commit content, no data
  *    IO); admission control via the `maxGensPerTrigger` read option
  *    bounds a post-downtime catch-up to N generations per batch.
  *  - `planInputPartitions` resolves the range through
  *    [[TimeTravel.changeFiles]]: `nodata`-flagged compactions are
  *    skipped wholesale (their files hold rewritten OLD rows), and any
  *    other remove-commit in the range fails the stream loudly —
  *    rewritten history is not a row delta.
  *  - Splits are per-file; each executor-side reader walks its parquet
  *    file through parquet-java's column-assembled record reader,
  *    projecting fields BY NAME against the stream's schema — files
  *    written before a column was added null-fill it, the same
  *    schema-on-read contract `readAsOf` applies.
  *  - Exactly-once is the offset log's: Spark persists `end` before
  *    committing a batch, and a restarted query replans `(committed,
  *    latest]` — generations are immutable, so replay is deterministic
  *    (CdfSourceSpec proves resume-from-checkpoint).
  *  - `Trigger.AvailableNow` freezes the end generation at query start
  *    and drains to it in bounded batches.
  *
  * Reference: Javier009/eCommerce_Data_Pipeline's per-run warehouse
  * loads imply exactly this consumer — "process each night's load as it
  * commits, never re-reading the table".
  */
class CdfDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = CdfDataSource.path(options)
    val gen = TimeTravel.currentVersion(root)
    require(gen >= 0, s"cdf: no commit log under $root")
    TimeTravel.schemaAsOf(root, gen).getOrElse(
      // pre-schema logs: fall back to the engine's parquet inference
      SparkSession.active.read
        .parquet(s"$root/data").schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    CdfTable(schema, CdfDataSource.path(new CaseInsensitiveStringMap(properties)))
}

object CdfDataSource {
  private[cdf] def path(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(options.get("root"))
    require(p != null, "cdf: a 'path' (table root) option is required")
    p
  }
}

final case class CdfTable(tableSchema: StructType, root: String)
    extends Table with SupportsRead {
  override def name(): String = s"cdf:$root"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // column pruning flows into the per-file parquet projection: an
      // unrequested column's chunks are never read off disk (the spec
      // counts decoded fields per file). Catalyst pushes pruning only
      // into BATCH relations (V2ScanRelationPushDown skips streaming
      // plans), so the batch path below is where `required` narrows;
      // micro-batch scans read the stream's declared schema.
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def description(): String = s"cdf change feed over $root"
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = {
          val startingGen =
            Option(options.get("startingGen")).map(_.toInt).getOrElse(-1)
          val maxGens =
            Option(options.get("maxGensPerTrigger")).map(_.toInt)
          require(maxGens.forall(_ > 0), "cdf: maxGensPerTrigger must be > 0")
          new CdfMicroBatchStream(required, root, startingGen, maxGens)
        }
        // Delta's `table_changes(...)`: the same change-feed resolution
        // as one bounded batch over `(startingGen, endingGen]` —
        // endingGen defaults to the log's current generation at plan
        // time. Runs under the standard batch pushdown rules, so column
        // pruning lands in `required` and flows to every split.
        override def toBatch
            : org.apache.spark.sql.connector.read.Batch = {
          val from =
            Option(options.get("startingGen")).map(_.toInt).getOrElse(-1)
          val live = TimeTravel.currentVersion(root)
          val to =
            Option(options.get("endingGen")).map(_.toInt).getOrElse(live)
          require(to <= live,
            s"cdf: endingGen $to is beyond the log's generation $live")
          val confB = new org.apache.spark.util.SerializableConfiguration(
            SparkSession.active.sessionState.newHadoopConf())
          val req = required
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] =
              TimeTravel.changeFiles(root, from, to)
                .map(f => CdfInputPartition(
                  TimeTravel.dataPath(root, f)): InputPartition)
                .toArray
            override def createReaderFactory(): PartitionReaderFactory =
              CdfReaderFactory(req, confB)
          }
        }
      }
    }
}

/** A committed generation number — the stream's offset unit. */
final case class CdfOffset(gen: Int) extends Offset {
  override def json(): String = s"""{"gen":$gen}"""
}

object CdfOffset {
  private val Gen = """"gen"\s*:\s*(-?\d+)""".r.unanchored
  def fromJson(json: String): CdfOffset = json match {
    case Gen(g) => CdfOffset(g.toInt)
    case other => throw new IllegalArgumentException(s"cdf: bad offset $other")
  }
}

final case class CdfInputPartition(file: String) extends InputPartition

final class CdfMicroBatchStream(schema: StructType, root: String,
    startingGen: Int, maxGens: Option[Int])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val confB = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  // AvailableNow contract: the end generation is FROZEN at query start,
  // so the drain terminates even while committers keep appending.
  @volatile private var availableNowEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(TimeTravel.currentVersion(root))

  override def getDefaultReadLimit: ReadLimit =
    maxGens.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  // SupportsTriggerAvailableNow routes everything through the two-arg
  // form; the no-arg variant must never be consulted.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "cdf: latestOffset(start, limit) is the admission-controlled path")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdfOffset].gen
    val live = availableNowEnd.getOrElse(TimeTravel.currentVersion(root))
    val capped = limit match {
      case f: ReadMaxFiles => math.min(live, from + f.maxFiles())
      case _ => live
    }
    CdfOffset(math.max(from, capped))
  }

  override def initialOffset(): Offset = CdfOffset(startingGen)

  override def deserializeOffset(json: String): Offset = CdfOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[CdfOffset].gen
    val to = end.asInstanceOf[CdfOffset].gen
    TimeTravel.changeFiles(root, from, to)
      .map(f => CdfInputPartition(TimeTravel.dataPath(root, f)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CdfReaderFactory(schema, confB)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class CdfReaderFactory(schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new CdfPartitionReader(
      partition.asInstanceOf[CdfInputPartition].file, schema, conf.value)
}

/** Per-JVM observability for the spec: how many parquet fields each
  * split actually DECODED (the column-pruning proof at local[*]). */
object CdfMetrics {
  val decodedFieldCounts =
    new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}

/** Executor-side reader: walks one committed parquet file through
  * parquet-java's record assembly and projects the stream's schema BY
  * NAME — a field the file predates is null-filled (the readAsOf
  * schema-on-read contract), a field the file has but the stream
  * dropped (or the query pruned) is never read: the requested schema is
  * intersected with the FILE's schema and handed to parquet as the read
  * projection, so unrequested column chunks stay on disk. An EMPTY
  * projection (count(*)-style scans) reads only the footer row count
  * and emits that many empty rows — zero data pages touched. Primitive
  * column types only (the engine's output canon:
  * BIGINT/INT/DOUBLE/FLOAT/VARCHAR/BOOLEAN/DATE). */
final class CdfPartitionReader(file: String, schema: StructType,
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val path = new Path(file)

  private val (fileSchema, recordCount) = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try (r.getFileMetaData.getSchema, r.getRecordCount) finally r.close()
  }

  private val projection: org.apache.parquet.schema.MessageType = {
    import scala.jdk.CollectionConverters._
    val want = schema.fields.map(_.name).toSet
    new org.apache.parquet.schema.MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f => want(f.getName)).asJava)
  }
  CdfMetrics.decodedFieldCounts.add(projection.getFieldCount)

  // empty projection: a pure footer count, no record assembly at all
  private var emptyRemaining: Long =
    if (projection.getFieldCount == 0) recordCount else -1L

  private val reader =
    if (emptyRemaining >= 0) null
    else {
      val c = new Configuration(conf)
      c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projection.toString)
      org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), path)
        .withConf(c)
        .build()
    }

  // stream-schema field → ordinal in THIS file's schema (−1: null-fill),
  // resolved once from the first record's group type
  private var fieldIdx: Array[Int] = _
  private var row: InternalRow = _

  private def convert(g: org.apache.parquet.example.data.Group): InternalRow = {
    if (fieldIdx == null) {
      val t = g.getType
      fieldIdx = schema.fields.map(f =>
        if (t.containsField(f.name)) t.getFieldIndex(f.name) else -1)
    }
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val fi = fieldIdx(i)
      vals(i) =
        if (fi < 0 || g.getFieldRepetitionCount(fi) == 0) null
        else schema.fields(i).dataType match {
          case LongType => g.getLong(fi, 0)
          case IntegerType => g.getInteger(fi, 0)
          case DoubleType => g.getDouble(fi, 0)
          case FloatType => g.getFloat(fi, 0)
          case BooleanType => g.getBoolean(fi, 0)
          case StringType => UTF8String.fromString(g.getString(fi, 0))
          case DateType => g.getInteger(fi, 0)
          case other => throw new IllegalArgumentException(
            s"cdf: unsupported change-feed column type $other " +
              s"for ${schema.fields(i).name}")
        }
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def next(): Boolean =
    if (emptyRemaining >= 0) {
      if (emptyRemaining == 0) false
      else { emptyRemaining -= 1; row = InternalRow.empty; true }
    } else {
      val g = reader.read()
      if (g == null) false
      else { row = convert(g); true }
    }

  override def get(): InternalRow = row
  override def close(): Unit = if (reader != null) reader.close()
}

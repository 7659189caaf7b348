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
    // a missing log is fine for the SINK path (the first write creates
    // it — the write schema arrives via LogicalWriteInfo); the scan
    // paths below keep the loud no-log error
    if (gen < 0) return new StructType()
    val base = TimeTravel.schemaAsOf(root, gen).getOrElse(
      // pre-schema logs: fall back to the engine's parquet inference
      SparkSession.active.read
        .parquet(s"$root/data").schema)
    // rowFeed mode (Delta's readChangeFeed): every row arrives tagged
    // with its change type and the commit that produced it
    if (CdfDataSource.rowFeed(options))
      base.add("_change_type", StringType).add("_commit_version", IntegerType)
    else base
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
  private[cdf] def rowFeed(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)

  /** The feed's START generation: `startingGen` verbatim, or
    * `startingTimestamp` (epoch millis) resolved over in-commit
    * timestamps (r15 verdict #7: mtime-proof) with DELTA's semantics
    * (r16 ADVICE): the feed delivers every commit whose timestamp is
    * AT-OR-AFTER the bound — a timestamp equal to a commit's own
    * instant includes that commit — and a pre-history bound clamps to
    * the whole history instead of throwing. Default −1: the whole
    * history. The two options are mutually exclusive. */
  private[cdf] def startGen(options: CaseInsensitiveStringMap,
      root: String): Int = {
    val byGen = Option(options.get("startingGen")).map(_.toInt)
    val byTs = Option(options.get("startingTimestamp"))
      .map(t => TimeTravel.versionBeforeTime(root, t.toLong))
    require(byGen.isEmpty || byTs.isEmpty,
      "cdf: startingGen and startingTimestamp are mutually exclusive")
    byGen.orElse(byTs).getOrElse(-1)
  }

  /** The constant-fill columns of one split in rowFeed mode: plain data
    * files get both tags; change files carry `_change_type` themselves. */
  private[cdf] def fillFor(isCdc: Boolean, v: Int): Map[String, String] =
    if (isCdc) Map("_commit_version" -> v.toString)
    else Map("_change_type" -> "insert", "_commit_version" -> v.toString)
}

final case class CdfTable(tableSchema: StructType, root: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"cdf:$root"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new CdfWriteBuilder(info.schema(), root, info.queryId())
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
          require(TimeTravel.currentVersion(root) >= 0,
            s"cdf: no commit log under $root")
          val startingGen = CdfDataSource.startGen(options, root)
          val maxGens =
            Option(options.get("maxGensPerTrigger")).map(_.toInt)
          require(maxGens.forall(_ > 0), "cdf: maxGensPerTrigger must be > 0")
          new CdfMicroBatchStream(required, root, startingGen, maxGens,
            CdfDataSource.rowFeed(options))
        }
        // Delta's `table_changes(...)`: the same change-feed resolution
        // as one bounded batch over `(startingGen, endingGen]` —
        // endingGen defaults to the log's current generation at plan
        // time. Runs under the standard batch pushdown rules, so column
        // pruning lands in `required` and flows to every split.
        override def toBatch
            : org.apache.spark.sql.connector.read.Batch = {
          val from = CdfDataSource.startGen(options, root)
          val live = TimeTravel.currentVersion(root)
          require(live >= 0, s"cdf: no commit log under $root")
          val to =
            Option(options.get("endingGen")).map(_.toInt)
              .orElse(Option(options.get("endingTimestamp")).map(t =>
                TimeTravel.versionAtTime(root, t.toLong)))
              .getOrElse(live)
          require(to <= live,
            s"cdf: endingGen $to is beyond the log's generation $live")
          val confB = new org.apache.spark.util.SerializableConfiguration(
            SparkSession.active.sessionState.newHadoopConf())
          val req = required
          val rowFeed = CdfDataSource.rowFeed(options)
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] =
              if (rowFeed)
                TimeTravel.rowChangeFiles(root, from, to)
                  .map { case (p, isCdc, v) => CdfInputPartition(p,
                    CdfDataSource.fillFor(isCdc, v)): InputPartition }
                  .toArray
              else
                TimeTravel.changeFiles(root, from, to)
                  .map(f => CdfInputPartition(
                    TimeTravel.dataPath(root, f)): InputPartition)
                  .toArray
            // q194 column mapping: the stream's schema carries LOGICAL
            // names, the committed parquet carries PHYSICAL ones —
            // without the mapping every renamed column null-fills
            // silently (ADVICE r13)
            override def createReaderFactory(): PartitionReaderFactory =
              CdfReaderFactory(req, confB, TimeTravel.colmapAsOf(root, to))
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

final case class CdfInputPartition(file: String,
    fill: Map[String, String] = Map.empty) extends InputPartition

final class CdfMicroBatchStream(schema: StructType, root: String,
    startingGen: Int, maxGens: Option[Int], rowFeed: Boolean = false)
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
    if (rowFeed)
      TimeTravel.rowChangeFiles(root, from, to)
        .map { case (p, isCdc, v) => CdfInputPartition(p,
          CdfDataSource.fillFor(isCdc, v)): InputPartition }
        .toArray
    else
      TimeTravel.changeFiles(root, from, to)
        .map(f => CdfInputPartition(TimeTravel.dataPath(root, f)): InputPartition)
        .toArray
  }

  /** Resolved PER BATCH (Spark builds a fresh reader factory for every
    * micro-batch's physical plan), so a mid-stream RENAME COLUMN picks
    * up the new mapping at the next trigger. Physical names are stable
    * across renames (that is column mapping's point), so the current
    * mapping is correct for every older generation's files too. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val gen = TimeTravel.currentVersion(root)
    val cm = if (gen < 0) Map.empty[String, String]
             else TimeTravel.colmapAsOf(root, gen)
    CdfReaderFactory(schema, confB, cm)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class CdfReaderFactory(schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    colmap: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdfInputPartition]
    new CdfPartitionReader(p.file, schema, conf.value, p.fill, colmap)
  }
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
    conf: Configuration, fill: Map[String, String] = Map.empty,
    colmap: Map[String, String] = Map.empty,
    defaults: Map[String, Any] = Map.empty)
    extends PartitionReader[InternalRow] {

  private val path = new Path(file)

  // q194 column mapping: the requested schema is LOGICAL, the file's
  // fields are PHYSICAL — project and look up under the physical name,
  // emit under the logical position
  private def physName(c: String): String = colmap.getOrElse(c, c)

  // rowFeed constant columns, converted once to their Catalyst values:
  // `_change_type = insert` for plain data files, `_commit_version` for
  // every split — never read from disk, never part of the projection
  private val fillVals: Array[Any] = schema.fields.map { f =>
    fill.get(f.name).map { v =>
      f.dataType match {
        case StringType => UTF8String.fromString(v)
        case IntegerType => v.toInt
        case LongType => v.toLong
        case other => throw new IllegalArgumentException(
          s"cdf: unsupported fill type $other for ${f.name}")
      }
    }.orNull
  }

  private val (fileSchema, recordCount) = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try (r.getFileMetaData.getSchema, r.getRecordCount) finally r.close()
  }

  // COLUMN DEFAULTS (r14 verdict #3): a requested field whose physical
  // name is absent from THIS file's schema — the file predates the
  // column — reads its recorded default. A present-but-null value is
  // stored data and stays NULL (the writer's schema always carries
  // every column, so absence is exactly "pre-evolution file").
  private val defaultVals: Array[Any] =
    if (defaults.isEmpty) null
    else schema.fields.map { f =>
      val p = physName(f.name)
      if (!fileSchema.containsField(p)) defaults.getOrElse(p, null)
      else null
    }

  private val projection: org.apache.parquet.schema.MessageType = {
    import scala.jdk.CollectionConverters._
    val want = schema.fields.map(_.name).filterNot(fill.contains)
      .map(physName).toSet
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

  // TYPE WIDENING (Delta's feature): a file written before an
  // `ALTER COLUMN … TYPE` carries the NARROW parquet primitive —
  // resolved once per file beside fieldIdx, so the value loop below can
  // up-convert (int32→long, float→double) exactly where the file and
  // the logical schema disagree, at zero cost everywhere else.
  private var fieldPrim:
    Array[org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName] = _

  private def convert(g: org.apache.parquet.example.data.Group): InternalRow = {
    if (fieldIdx == null) {
      val t = g.getType
      fieldIdx = schema.fields.map { f =>
        val p = physName(f.name)
        if (t.containsField(p)) t.getFieldIndex(p) else -1
      }
      fieldPrim = fieldIdx.map(fi =>
        if (fi < 0 || !t.getType(fi).isPrimitive) null
        else t.getType(fi).asPrimitiveType().getPrimitiveTypeName)
    }
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val fi = fieldIdx(i)
      vals(i) =
        if (fillVals(i) != null) fillVals(i)
        else if (fi < 0)
          (if (defaultVals != null) defaultVals(i) else null)
        else if (g.getFieldRepetitionCount(fi) == 0) null
        else schema.fields(i).dataType match {
          case LongType =>
            if (fieldPrim(i) eq org.apache.parquet.schema.PrimitiveType
                .PrimitiveTypeName.INT32) g.getInteger(fi, 0).toLong
            else g.getLong(fi, 0)
          case IntegerType => g.getInteger(fi, 0)
          case DoubleType =>
            if (fieldPrim(i) eq org.apache.parquet.schema.PrimitiveType
                .PrimitiveTypeName.FLOAT) g.getFloat(fi, 0).toDouble
            else g.getDouble(fi, 0)
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

  // the constants-only row an empty-projection scan emits (plain
  // count(*): all nulls and never materialized; rowFeed tag-only scans:
  // the fill constants; a pre-evolution file whose ONLY requested
  // fields are defaulted: the defaults at their schema positions)
  private lazy val constRow: InternalRow =
    InternalRow.fromSeq(schema.indices.map { i =>
      if (fillVals(i) != null) fillVals(i)
      else if (defaultVals != null) defaultVals(i) else null
    })

  override def next(): Boolean =
    if (emptyRemaining >= 0) {
      if (emptyRemaining == 0) false
      else { emptyRemaining -= 1; row = constRow; true }
    } else {
      val g = reader.read()
      if (g == null) false
      else { row = convert(g); true }
    }

  override def get(): InternalRow = row
  override def close(): Unit = if (reader != null) reader.close()
}

/** Shared parquet plumbing for the SINK side: the engine's output canon
  * (BIGINT/INT/DOUBLE/FLOAT/VARCHAR/BOOLEAN/DATE) mapped to a parquet
  * message type, written executor-side through parquet-java's example
  * record API — the exact mirror of [[CdfPartitionReader]]'s read path. */
private[sources] object CdfParquet {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  /** The write schema with every field NULLABLE: the schema a write LOGS
    * must describe the TABLE, and one insert's non-nullable literals
    * (`INSERT … VALUES`) must never narrow it — a falsely-NOT-NULL
    * column lets Catalyst rewrite `count(col)` into `count(*)` and
    * breaks later null-filling appends. */
  def nullable(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))

  /** `colmap` (q194 column mapping, logical → physical): files are
    * STORED under the physical names so bytes on both sides of a rename
    * stay compatible; values are positional, only the field names map. */
  def messageType(schema: StructType,
      colmap: Map[String, String] = Map.empty): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val n = colmap.getOrElse(f.name, f.name)
      f.dataType match {
        case LongType => b.optional(INT64).named(n)
        case IntegerType => b.optional(INT32).named(n)
        case DoubleType => b.optional(DOUBLE).named(n)
        case FloatType => b.optional(FLOAT).named(n)
        case BooleanType => b.optional(BOOLEAN).named(n)
        case StringType => b.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(n)
        case DateType => b.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(n)
        case other => throw new IllegalArgumentException(
          s"cdf sink: unsupported column type $other for ${f.name}")
      }
    }
    b.named("graft_cdf")
  }

  /** The current logical→physical mapping for a write into `root` —
    * empty on unmapped tables and fresh logs. */
  def writeColmap(root: String): Map[String, String] = {
    val gen = TimeTravel.currentVersion(root)
    if (gen < 0) Map.empty else TimeTravel.colmapAsOf(root, gen)
  }
}

final case class CdfWriteMsg(tmp: String, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** The DSv2 WRITE path into the commit log — the table format's last
  * quadrant (batch read q186 / stream read q176+q192 / batch write
  * below / stream write [[CdfStreamingWrite]]). Executors stage plain
  * parquet temps under `<root>/stage-stream/`; the DRIVER's commit
  * validates CHECK constraints against the staged rows and publishes
  * through the log's atomic claim — never a rename-in-place, never a
  * partially-visible epoch.
  *
  * FILTERED OVERWRITE (`INSERT OVERWRITE … PARTITION (…)`, static mode):
  * legal iff the filters cut exactly along file boundaries
  * ([[graft.sources.table.FileSkip]] over the log's stats and partition
  * values); the overwrite is then retire-the-full-files + add-the-new in
  * ONE atomic commit — a replaced partition is never absent from any
  * readable snapshot. Unaligned filters refuse at `canOverwrite`. The
  * remove set is resolved at COMMIT time against the then-current
  * generation, so a commit that raced in between is either honored or
  * flagged as a remove-conflict by the claim — never silently dropped. */
final class CdfWriteBuilder(writeSchema: StructType, root: String,
    queryId: String, partSpec: Option[Seq[graft.operators.PartTerm]] = None,
    createProps: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {
  private var doTruncate = false
  private var overwriteFilters: Option[Seq[org.apache.spark.sql.sources.Filter]] =
    None

  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }

  override def canOverwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    val gen = TimeTravel.currentVersion(root)
    gen < 0 || {
      val cm = TimeTravel.colmapAsOf(root, gen)
      graft.sources.table.FileSkip.aligned(
        TimeTravel.snapshotFiles(root, gen), TimeTravel.statsFor(root, gen),
        TimeTravel.pvalsFor(root, gen),
        graft.sources.table.FileSkip.mapCols(filters.toSeq,
          c => cm.getOrElse(c, c)))
    }
  }

  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwriteFilters = Some(filters.toSeq)
    this
  }

  /** The PARTITIONED write (a `CREATE TABLE … PARTITIONED BY` catalog
    * table, r13 verdict #2 / r14 verdict #1) REQUIRES a clustered
    * distribution + ordering on the spec's DERIVED expressions —
    * identity columns verbatim, `bucket(n, k)` / `months(d)` / `days` /
    * `years` through the catalog's FunctionCatalog (the Iceberg write
    * pattern): Spark shuffles each derived tuple's rows into one task
    * and sorts within it, so the writer rotates exactly one file per
    * tuple — the multi-level hive layout, landed by the engine, not
    * hoped for from the incoming partitioning. */
  override def build(): org.apache.spark.sql.connector.write.Write =
    partSpec match {
      case None =>
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new CdfBatchWrite(writeSchema, root, doTruncate,
              overwriteFilters, None, createProps)
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new CdfStreamingWrite(writeSchema, root, queryId)
        }
      case Some(spec) =>
        new org.apache.spark.sql.connector.write.Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          import org.apache.spark.sql.connector.expressions.Expressions
          private def derivedExprs
              : Seq[org.apache.spark.sql.connector.expressions.Expression] =
            spec.map {
              case graft.operators.IdentityTerm(c) => Expressions.column(c)
              case graft.operators.BucketTerm(n, c) => Expressions.bucket(n, c)
              case graft.operators.MonthsTerm(c) => Expressions.months(c)
              case graft.operators.DaysTerm(c) => Expressions.days(c)
              case graft.operators.YearsTerm(c) => Expressions.years(c)
            }
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(derivedExprs.toArray)
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            derivedExprs.map(e => Expressions.sort(e,
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING)).toArray
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new CdfBatchWrite(writeSchema, root, doTruncate,
              overwriteFilters, Some(spec), createProps)
          // micro-batch writes honor the distribution requirement too:
          // each epoch lands hive-partitioned with pvals in its commit
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new CdfStreamingWrite(writeSchema, root, queryId, Some(spec))
        }
    }
}

final case class CdfWriterFactory(schema: StructType, root: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    colmap: Map[String, String] = Map.empty,
    partSpec: Option[Seq[graft.operators.PartTerm]] = None)
    extends org.apache.spark.sql.connector.write.DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  // batch: (partition, task) keeps a retried attempt's temp distinct
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    partSpec match {
      case Some(spec) => new PartitionedCdfDataWriter(schema,
        s"$root/stage-stream/b-p$partitionId-t$taskId", conf.value,
        colmap, spec)
      case None => new CdfDataWriter(schema,
        s"$root/stage-stream/b-p$partitionId-t$taskId.parquet", conf.value,
        colmap)
    }
  // streaming: the epoch joins the name — a replayed epoch's temps never
  // collide with the failed attempt's
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    partSpec match {
      case Some(spec) => new PartitionedCdfDataWriter(schema,
        s"$root/stage-stream/e$epochId-p$partitionId-t$taskId",
        conf.value, colmap, spec)
      case None => new CdfDataWriter(schema,
        s"$root/stage-stream/e$epochId-p$partitionId-t$taskId.parquet",
        conf.value, colmap)
    }
}

/** One staged temp, its rows, and one derived value PER SPEC TERM —
  * the partitioned writer's per-file unit inside [[CdfPartedMsg]]. */
final case class CdfPartedMsg(parts: Seq[(String, Long, Seq[String])])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** The PARTITIONED task writer: rows arrive CLUSTERED AND SORTED on the
  * spec's derived expressions (the Write required that distribution),
  * so one open file suffices — the writer ROTATES to a fresh temp when
  * the derived tuple changes and reports (temp, rows, values) triples
  * for the commit's per-file tagged value lines. Derivation is
  * [[graft.operators.PartTransforms]] — the same functions the shuffle
  * clustered on, so a tuple's rows are always contiguous here. NULL
  * partition values refuse loudly (hive partitioning has no null
  * directory in this engine). */
final class PartitionedCdfDataWriter(schema: StructType, tmpPrefix: String,
    conf: Configuration, colmap: Map[String, String],
    spec: Seq[graft.operators.PartTerm])
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val partIdx = spec.map(t => schema.fieldIndex(t.col)).toArray
  private val partDt = partIdx.map(i => schema.fields(i).dataType)

  private var cur: CdfDataWriter = _
  private var curValues: Seq[String] = _
  private var seq = 0
  private val done = Seq.newBuilder[(String, Long, Seq[String])]

  private def valuesOf(row: InternalRow): Seq[String] =
    spec.indices.map { j =>
      val i = partIdx(j)
      require(!row.isNullAt(i),
        s"cdf sink: NULL partition value for ${spec(j).col} — hive " +
          "partitioning requires non-null partition keys")
      val raw: Any = partDt(j) match {
        // '|'-carrying string values refuse inside IdentityTerm.derive
        // (r14 ADVICE — the log's stats-line separator)
        case StringType => row.getUTF8String(i).toString
        case LongType => row.getLong(i)
        case IntegerType | DateType => row.getInt(i)
        case other => throw new IllegalArgumentException(
          s"cdf sink: unsupported partition column type $other")
      }
      spec(j).derive(raw)
    }

  private def roll(): Unit = if (cur != null) {
    val m = cur.commit().asInstanceOf[CdfWriteMsg]
    done += ((m.tmp, m.rows, curValues))
    cur = null
  }

  override def write(row: InternalRow): Unit = {
    val v = valuesOf(row)
    if (cur == null || v != curValues) {
      roll()
      cur = new CdfDataWriter(schema, s"$tmpPrefix-v$seq.parquet", conf,
        colmap)
      seq += 1
      curValues = v
    }
    cur.write(row)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    roll()
    CdfPartedMsg(done.result())
  }

  override def abort(): Unit = {
    if (cur != null) cur.abort()
    val fs = new Path(tmpPrefix).getFileSystem(conf)
    done.result().foreach { case (t, _, _) =>
      fs.delete(new Path(t), false)
    }
    ()
  }

  override def close(): Unit = ()
}

final class CdfDataWriter(schema: StructType, tmp: String,
    conf: Configuration, colmap: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val msgType = CdfParquet.messageType(schema, colmap)
  private val writer = {
    val c = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msgType, c)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new Path(tmp), c))
      .withConf(c)
      .withType(msgType)
      .build()
  }
  private val factory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType | DateType => g.add(i, row.getInt(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case FloatType => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType => g.add(i, org.apache.parquet.io.api.Binary
          .fromString(row.getUTF8String(i).toString))
        case other => throw new IllegalArgumentException(
          s"cdf sink: unsupported column type $other")
      }
      i += 1
    }
    writer.write(g)
    n += 1
  }
  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close()
    CdfWriteMsg(tmp, n)
  }
  override def abort(): Unit = {
    writer.close()
    val p = new Path(tmp)
    p.getFileSystem(conf).delete(p, false)
    ()
  }
  override def close(): Unit = ()
}

/** Batch `df.write.format(...)` into the log: one atomic generation per
  * save; truncate mode retires the whole current snapshot in the SAME
  * commit (a log-native overwrite — old generations stay readable). */
final class CdfBatchWrite(schema: StructType, root: String,
    truncate: Boolean,
    overwriteFilters: Option[Seq[org.apache.spark.sql.sources.Filter]] = None,
    partSpec: Option[Seq[graft.operators.PartTerm]] = None,
    createProps: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private val confB = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    CdfWriterFactory(schema, root, confB, CdfParquet.writeColmap(root),
      partSpec)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val (live, empty) = messages.collect { case m: CdfWriteMsg => m }
      .partition(_.rows > 0)
    val parted = messages.collect { case m: CdfPartedMsg => m }
      .flatMap(_.parts)
    val (plive, pempty) = parted.partition(_._2 > 0)
    val fs = new Path(root).getFileSystem(confB.value)
    empty.foreach(m => fs.delete(new Path(m.tmp), false))
    pempty.foreach(p => fs.delete(new Path(p._1), false))
    val gen = TimeTravel.currentVersion(root)
    val removed = overwriteFilters match {
      case Some(flts0) if gen >= 0 =>
        // filtered overwrite: retire the files the (file-aligned)
        // predicate fully covers, in the SAME commit that adds the
        // replacements; AlwaysTrue degenerates to a full overwrite
        val cm = TimeTravel.colmapAsOf(root, gen)
        val flts = graft.sources.table.FileSkip.mapCols(flts0,
          c => cm.getOrElse(c, c))
        val files = TimeTravel.snapshotFiles(root, gen)
        val stats = TimeTravel.statsFor(root, gen)
        val pvals = TimeTravel.pvalsFor(root, gen)
        require(graft.sources.table.FileSkip.aligned(files, stats, pvals, flts),
          s"cdf sink: overwrite filters $flts no longer cut along file " +
            s"boundaries at generation $gen of $root")
        graft.sources.table.FileSkip.full(files, stats, pvals, flts)
      case Some(_) => Nil // first write into an empty log
      case None if truncate && gen >= 0 =>
        TimeTravel.resolveSnapshot(root, gen)._1
      case None => Nil
    }
    partSpec match {
      case Some(spec) =>
        require(live.isEmpty, "cdf sink: mixed partitioned and plain temps")
        TimeTravel.commitStagedPartitionedSpec(SparkSession.active, root,
          plive.map(p => (p._1, p._3)).toSeq,
          CdfParquet.nullable(schema).toDDL, spec, removed = removed,
          props = createProps)
      case None =>
        TimeTravel.commitStagedFiles(SparkSession.active, root,
          live.map(_.tmp).toSeq, CdfParquet.nullable(schema).toDDL,
          removed = removed, props = createProps)
    }
    // graft.autoCompact: bounded small-file maintenance after the
    // append landed (best-effort — never fails the INSERT)
    TimeTravel.autoCompactIfDue(SparkSession.active, root)
    ()
  }
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val fs = new Path(root).getFileSystem(confB.value)
    messages.collect { case m: CdfWriteMsg =>
      fs.delete(new Path(m.tmp), false)
    }
    messages.collect { case m: CdfPartedMsg =>
      m.parts.foreach(p => fs.delete(new Path(p._1), false))
    }
    ()
  }
}

/** Streaming `writeStream.format(...)` into the log: one generation per
  * micro-batch, EXACTLY-ONCE by the q178 txn contract — the commit
  * records (queryId, epochId) and a replayed epoch (restart before the
  * sink's commit was checkpointed) is detected in the log and lands
  * NOTHING. The atomic version claim means no partial epoch is ever
  * visible; contrast the glog sink, whose exactly-once is name-replace
  * (this one's is the log itself). */
final class CdfStreamingWrite(schema: StructType, root: String,
    queryId: String, partSpec: Option[Seq[graft.operators.PartTerm]] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val confB = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    CdfWriterFactory(schema, root, confB, CdfParquet.writeColmap(root),
      partSpec)

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val (live, empty) = messages.collect { case m: CdfWriteMsg => m }
      .partition(_.rows > 0)
    val parted = messages.collect { case m: CdfPartedMsg => m }
      .flatMap(_.parts)
    val (plive, pempty) = parted.partition(_._2 > 0)
    val fs = new Path(root).getFileSystem(confB.value)
    empty.foreach(m => fs.delete(new Path(m.tmp), false))
    pempty.foreach(p => fs.delete(new Path(p._1), false))
    partSpec match {
      case Some(spec) =>
        require(live.isEmpty, "cdf sink: mixed partitioned and plain temps")
        TimeTravel.commitStagedPartitionedTxn(SparkSession.active, root,
          plive.map(p => (p._1, p._3)).toSeq,
          CdfParquet.nullable(schema).toDDL, spec,
          s"cdf-sink-$queryId", epochId)
      case None =>
        TimeTravel.commitStagedTxn(SparkSession.active, root,
          live.map(_.tmp).toSeq, CdfParquet.nullable(schema).toDDL,
          s"cdf-sink-$queryId", epochId)
    }
    // per-epoch small files converge to a bounded count when the table
    // opted into graft.autoCompact (best-effort, outside the txn claim
    // — a replayed epoch still lands nothing)
    TimeTravel.autoCompactIfDue(SparkSession.active, root)
    ()
  }
  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val fs = new Path(root).getFileSystem(confB.value)
    messages.collect { case m: CdfWriteMsg =>
      fs.delete(new Path(m.tmp), false)
    }
    messages.collect { case m: CdfPartedMsg =>
      m.parts.foreach(p => fs.delete(new Path(p._1), false))
    }
    ()
  }
}

package graft.sources.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TimeTravel
import graft.sources.cdf.{CdfWriteMsg, CdfWriterFactory}

/** COPY-ON-WRITE row-level SQL — `DELETE FROM` / `UPDATE` / `MERGE INTO`
  * against a catalog log table, through Spark's group-based
  * `SupportsRowLevelOperations`:
  *
  *  1. Spark SCANS the candidate files with [[RowOpScan]]. Static filter
  *     pushdown prunes non-overlapping files from log stats
  *     ([[FileSkip]]), and the runtime GROUP filter — an `IN` over the
  *     `_file` metadata column, computed from the rows the condition
  *     actually matches — drops every untouched file before one byte of
  *     it is rewritten.
  *  2. Spark rewrites the surviving groups' rows (carryover + updated +
  *     merged + inserted) and hands them to [[ReplaceGroupsWrite]]:
  *     executors stage plain parquet (the q193 writer) and the driver
  *     lands ONE atomic commit that REMOVES exactly the files the scan
  *     planned and ADDS the rewrites. Readers see the old snapshot or
  *     the new one, never between; the remove set is conflict-checked at
  *     claim time (r12), so a racing compaction cannot double-retire a
  *     file; every earlier generation stays readable via `VERSION AS OF`.
  *
  * Rewrite cost is ∝ touched files, never the table: a MERGE whose keys
  * land in 2 of 100k files rewrites 2 files. Aligned predicates never
  * reach this path at all — `OptimizeMetadataOnlyDeleteFromTable`
  * resolves them through [[CatalogLogTable]]'s metadata `deleteWhere`
  * first, so copy-on-write is the fallback for predicates that cut
  * through files, exactly Delta/Iceberg's split.
  *
  * Reference: Javier009/eCommerce_Data_Pipeline's nightly re-loads imply
  * upsert-by-key into the warehouse — `MERGE INTO` is that operation's
  * SQL form over the engine's own table format.
  */
final class GraftRowLevelOperationBuilder(root: String, gen: Int,
    tableSchema: StructType, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  /** The MERGE-ON-READ split (Delta's DML-integrated deletion vectors):
    * with `graft.enableDeletionVectors` set, DELETE/UPDATE/MERGE run as
    * a DELTA-based row-level operation — matched rows are masked by
    * POSITION and only new/updated rows append; nothing rewrites. CDF
    * tables take this path too (r16 verdict #2): the commit recovers
    * the pre-images by reading the masked positions back from the
    * touched files and lands the diff-form change files in the same
    * commit (TimeTravel.cdcForRowDelta). */
  override def build(): RowLevelOperation = {
    // MERGE parity with the library verb (TimeTravel.merge): WHEN NOT
    // MATCHED THEN INSERT rows would land NULL or caller-supplied ids —
    // identityFill=false is correct for UPDATE/DELETE rewrites (existing
    // ids carry over) but would silently break the GENERATED ALWAYS
    // unique/hwm invariant for merge-inserted rows. Refuse loudly.
    if (info.command() == RowLevelOperation.Command.MERGE && gen >= 0 &&
        TimeTravel.propsAsOf(root, gen)
          .get(TimeTravel.IdentityColKey).exists(_.nonEmpty))
      throw new UnsupportedOperationException(
        "time travel: MERGE INTO identity-column tables is not " +
          "supported — merge-inserted rows would bypass the GENERATED " +
          "ALWAYS id assignment; insert on main, or drop the identity " +
          "property")
    if (gen >= 0 &&
        TimeTravel.propsAsOf(root, gen)
          .get("graft.enableDeletionVectors").contains("true"))
      new GraftDeltaOperation(root, gen, tableSchema, info.command())
    else new GraftRowLevelOperation(root, gen, tableSchema, info.command())
  }
}

/** The scan→write handshake both operation flavors share: the files the
  * (runtime-filtered) candidate scan finally planned. Written by
  * [[RowOpScan.planInputPartitions]] (planning strictly precedes the
  * write's commit); `null` means the scan never planned. */
private[table] trait PlansFiles {
  @volatile private[table] var planned: Seq[String] = _
  private[table] def gen: Int
}

final class GraftRowLevelOperation(root: String,
    private[table] val gen: Int,
    tableSchema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with PlansFiles {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft copy-on-write $cmd $root@$gen"

  /** `_file` is how Spark groups rows back to their file and what the
    * runtime group filter filters on. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(FileMetaColumn.NAME))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RowOpScanBuilder(this, GraftLogTable(tableSchema, root, gen))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!info.schema().fieldNames.contains(FileMetaColumn.NAME),
      "row-level write schema unexpectedly carries the _file metadata " +
        "column — the replacement rows must be table-schema rows")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ReplaceGroupsWrite(GraftRowLevelOperation.this, root,
            info.schema())
      }
    }
  }
}

/** MERGE-ON-READ row-level SQL (Spark's delta-based
  * `SupportsDelta` — the API Iceberg's position deletes ride): rows are
  * addressed by the `(_file, _pos)` row id the scan emits, DELETEs
  * collect positions instead of rewriting files, and UPDATEs are
  * represented as delete+reinsert — the commit lands position-mask
  * sidecars for the touched files plus parquet of ONLY the new rows, in
  * one atomic claim. At 100 TB a point `UPDATE`/`MERGE` costs
  * ~bytes-per-changed-row, not the touched files' bytes; the next
  * OPTIMIZE materializes masks away. The candidate scan is the same
  * stats-pruned, runtime-file-filtered [[RowOpScan]] the copy-on-write
  * path uses, reading THROUGH live vectors so masked rows never update
  * or resurrect. */
final class GraftDeltaOperation(root: String,
    private[table] val gen: Int,
    tableSchema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta
    with PlansFiles {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft merge-on-read $cmd $root@$gen"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(FileMetaColumn.NAME),
      Expressions.column(PosMetaColumn.NAME))

  // UPDATE rows split into delete + reinsert: the mask+append commit
  // shape has no in-place update to map an `update` call onto
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty // the row id columns are themselves the metadata needed

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RowOpScanBuilder(this, GraftLogTable(tableSchema, root, gen))

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite
            with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          override def toBatch
              : org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new GraftDeltaBatchWrite(root, info.schema())
          // cluster the CHANGED rows (only those flow into a delta
          // write) by their source file, best-effort (AQE rebalance,
          // not a strict repartition): each file's deleted positions
          // then land in ONE task's payload instead of fanning across a
          // MERGE's join shuffle — the Iceberg position-delete write
          // discipline, keeping per-task and driver merge work bounded
          // by files, not tasks × files
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(Array(Expressions.column(FileMetaColumn.NAME)))
          override def distributionStrictlyRequired(): Boolean = false
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty
        }
    }
}

/** One delta task's outcome: the staged insert temp (when any row was
  * inserted/reinserted) and, per touched file, the NAME and cardinality
  * of the position-FRAGMENT sidecar the task wrote executor-side — the
  * positions themselves never ride the commit-message RPC (r16 verdict
  * #1: a broad DELETE's positions are data-sized; ~8 bytes × 10⁹
  * deleted rows through driver heap is a maxResultSize abort at
  * 100 TB). Driver-side payload is ∝ touched-file count. */
final case class DeltaTaskMsg(tmp: String, rows: Long,
    frags: Seq[(String, String, Long)]) extends WriterCommitMessage

final class GraftDeltaBatchWrite(root: String, rowSchema: StructType)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private val confB = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  private val scanGen = TimeTravel.currentVersion(root)
  // statement-unique fragment prefix: (partition, task) ids are unique
  // only within ONE Spark application, so two applications running
  // concurrent DML on the same table could collide on a fragment path —
  // writePositions overwrites, poisoning the other statement's DV union,
  // and post-commit fragment cleanup could drop the other statement's
  // unconsumed fragments (r17 ADVICE). Same discipline as the final
  // `$uid-$f.dv` vector names.
  private val writeUid = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    val colmap = if (scanGen < 0) Map.empty[String, String]
      else TimeTravel.colmapAsOf(root, scanGen)
    GraftDeltaWriterFactory(rowSchema, root, confB, colmap, writeUid)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: DeltaTaskMsg => m }
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(confB.value)
    val (live, empty) = ms.filter(_.tmp != null).partition(_.rows > 0)
    empty.foreach(m =>
      fs.delete(new org.apache.hadoop.fs.Path(m.tmp), false))
    // per-file fragment NAMES merged across tasks (a MERGE's shuffle can
    // spread one file's deletes over several writers); the position
    // union itself runs in executors inside commitRowDelta
    val fragments: Map[String, Seq[String]] = ms.flatMap(_.frags)
      .groupBy(_._1)
      .map { case (f, frs) => f -> frs.map(_._2).sorted.toSeq }
    TimeTravel.commitRowDelta(SparkSession.active, root, fragments,
      live.map(_.tmp).toSeq)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(confB.value)
    messages.collect { case m: DeltaTaskMsg =>
      if (m.tmp != null)
        fs.delete(new org.apache.hadoop.fs.Path(m.tmp), false)
      m.frags.foreach { case (_, n, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${TimeTravel.fragDir(root)}/$n"), false)
      }
    }
    ()
  }
}

final case class GraftDeltaWriterFactory(rowSchema: StructType,
    root: String, conf: org.apache.spark.util.SerializableConfiguration,
    colmap: Map[String, String], writeUid: String)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftDeltaWriter(rowSchema, root, conf.value, colmap,
      partitionId, taskId, writeUid)
}

/** The task-side delta writer: DELETEs buffer (file → positions) —
  * bounded by the task's share of matched rows, the same per-task bound
  * the DV writers have — and INSERT/REINSERT rows stream into one
  * staged parquet temp (the q193 staging discipline; (partition, task)
  * in the name keeps a retried attempt's temp distinct). At task commit
  * each file's positions are written HERE, in the executor, as a
  * position-fragment sidecar; only (file, fragment, cardinality)
  * triples ride the commit message — the Iceberg position-delete write
  * discipline end to end. */
final class GraftDeltaWriter(rowSchema: StructType, root: String,
    conf: org.apache.hadoop.conf.Configuration,
    colmap: Map[String, String], partitionId: Int, taskId: Long,
    writeUid: String)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private val deleted =
    scala.collection.mutable.HashMap[String,
      scala.collection.mutable.ArrayBuffer[Long]]()
  private var inserter: graft.sources.cdf.CdfDataWriter = _
  private var tmp: String = _
  private var inserted = 0L

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    // id fields arrive in rowId() order: (_file STRING, _pos BIGINT)
    deleted.getOrElseUpdate(id.getUTF8String(0).toString,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += id.getLong(1)
  }

  override def insert(row: InternalRow): Unit = {
    if (inserter == null) {
      tmp = s"$root/stage-stream/d-$writeUid-p$partitionId-t$taskId.parquet"
      inserter = new graft.sources.cdf.CdfDataWriter(rowSchema, tmp, conf,
        colmap)
    }
    inserter.write(row)
    inserted += 1
  }

  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    insert(row)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (inserter != null) inserter.commit()
    val fragRoot = TimeTravel.fragDir(root)
    val frags = deleted.toSeq.sortBy(_._1).map { case (f, ps) =>
      // (writeUid, partition, task) in the name keeps a retried
      // attempt's fragment distinct within the statement AND the path
      // unique across concurrent applications (taskIds repeat across
      // apps — r17 ADVICE); only the committed attempt's names reach
      // the driver, so orphans never feed a read
      val name = s"$writeUid-p$partitionId-t$taskId-$f.dvf"
      val pos = ps.toArray.sorted.distinct
      TimeTravel.writePositions(s"$fragRoot/$name", pos, conf)
      (f, name, pos.length.toLong)
    }
    DeltaTaskMsg(tmp, inserted, frags)
  }

  override def abort(): Unit = if (inserter != null) inserter.abort()
  override def close(): Unit = ()
}

/** The candidate scan: filter pushdown for static file pruning, column
  * pruning, per-FILE splits (the replace granularity), and the `_file`
  * runtime group filter. */
final class RowOpScanBuilder(op: PlansFiles,
    table: GraftLogTable)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = table.tableSchema
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def statable(c: String) = table.stats.keys.exists(_._2 == table.phys(c))
    def pvaled(c: String) = table.partCol.contains(table.phys(c))
    accepted = filters.filter {
      case org.apache.spark.sql.sources.GreaterThan(c, _: java.lang.Long) =>
        statable(c)
      case org.apache.spark.sql.sources.GreaterThanOrEqual(c, _: java.lang.Long) =>
        statable(c)
      case org.apache.spark.sql.sources.LessThan(c, _: java.lang.Long) =>
        statable(c)
      case org.apache.spark.sql.sources.LessThanOrEqual(c, _: java.lang.Long) =>
        statable(c)
      case org.apache.spark.sql.sources.EqualTo(c, _: java.lang.Long) =>
        statable(c)
      case org.apache.spark.sql.sources.EqualTo(c, _: String) => pvaled(c)
      case org.apache.spark.sql.sources.In(c, vs) =>
        pvaled(c) && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    filters // all residual: pruning may never change row semantics
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new RowOpScan(op, table, required,
    FileSkip.kept(table.files, table.stats, table.pvals,
      FileSkip.mapCols(accepted.toSeq, table.phys), table.tvals))
}

final class RowOpScan(op: PlansFiles, table: GraftLogTable,
    required: StructType, files0: Seq[String])
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[String] = files0

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft row-level candidate scan ${table.root}@${table.gen}"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(FileMetaColumn.NAME))

  /** The runtime GROUP filter: Spark evaluates the operation's condition
    * once, collects the distinct `_file` values it touched, and hands
    * them here as an IN-set — files outside it are neither rewritten nor
    * even opened. Unrecognized predicates are ignored (the filter is an
    * optimization; correctness is the rewrite's). */
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Some(String.valueOf(l.value()))
      case _ => None
    }
    predicates.foreach { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.length >= 2 &&
            FieldRef.unapply(kids(0)).contains(FileMetaColumn.NAME) =>
          val vals = kids.drop(1).flatMap(lit).toSet
          if (vals.size == kids.length - 1)
            files = files.filter(vals)
        case "=" if kids.length == 2 =>
          (FieldRef.unapply(kids(0)), lit(kids(1))) match {
            case (Some(FileMetaColumn.NAME), Some(v)) =>
              files = files.filter(_ == v)
            case _ => ()
          }
        case _ => ()
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.planned = files // planning precedes the write's commit
    files.sorted.map(f => FilePartition(Seq(f)): InputPartition).toArray
  }

  // table.colmap rides along: on a column-mapped table the candidate
  // rows live under PHYSICAL parquet names, and a reader resolving the
  // LOGICAL names would null-fill every mapped column — the rewrite
  // would then persist those nulls (ADVICE r13). table.dvs rides along
  // too: the candidate scan must read THROUGH live deletion vectors, or
  // the copy-on-write rewrite would RESURRECT the masked rows into the
  // new generation. table.defaults likewise (r14 verdict #3): a
  // rewrite of a pre-evolution file must persist the DEFAULT a reader
  // would have seen, not NULL.
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory(required, table.root, Int.MaxValue,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()), table.colmap,
      table.dvPaths(files), table.defaults)
}

/** The replacement write: staged parquet from every task, ONE atomic
  * commit retiring exactly the scanned files. */
final class ReplaceGroupsWrite(op: GraftRowLevelOperation, root: String,
    schema: StructType) extends BatchWrite {

  private val confB = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    // mapped tables store files under PHYSICAL names (q194)
    val gen = TimeTravel.currentVersion(root)
    val colmap = if (gen < 0) Map.empty[String, String]
      else TimeTravel.colmapAsOf(root, gen)
    CdfWriterFactory(schema, root, confB, colmap)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val removed = Option(op.planned).getOrElse(throw new IllegalStateException(
      "row-level commit before its candidate scan planned — nothing to replace"))
    val (live, empty) = messages.collect { case m: CdfWriteMsg => m }
      .partition(_.rows > 0)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(confB.value)
    empty.foreach(m => fs.delete(new org.apache.hadoop.fs.Path(m.tmp), false))
    // the rewrite read each candidate file through the DV state at the
    // scanned generation — if a racing DV-delete re-masked one of them
    // since, blind-landing would resurrect that racer's deletes into the
    // rewritten rows; dvExpect turns that into an explicit conflict (the
    // same guard deleteVectorWhere carries in the other direction)
    val dvAtScan = TimeTravel.dvsFor(root, op.gen)
    // CDF on: emit the DIFF-FORM row feed (deleted rows as `delete`,
    // added/updated-new rows as `insert` — r14 verdict #2) from the
    // touched files and the still-staged temps, BEFORE the commit
    // renames them away
    val cdc = TimeTravel.cdcDiffForReplace(SparkSession.active, root,
      op.gen, removed, live.map(_.tmp).toSeq, schema.fieldNames.toSeq)
    TimeTravel.commitStagedFiles(SparkSession.active, root,
      live.map(_.tmp).toSeq, graft.sources.cdf.CdfParquet.nullable(schema).toDDL,
      removed = removed,
      dvExpect = Some(removed.map(f => f -> dvAtScan.get(f).map(_._1)).toMap),
      cdc = cdc,
      // the rewrite carries EXISTING ids — never re-fill (and never
      // trip the GENERATED ALWAYS refusal on legitimately-valued rows)
      identityFill = false)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(confB.value)
    messages.collect { case m: CdfWriteMsg =>
      fs.delete(new org.apache.hadoop.fs.Path(m.tmp), false)
    }
    ()
  }
}

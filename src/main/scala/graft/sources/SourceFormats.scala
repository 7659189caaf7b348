package graft.sources

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** Typed read-side row of the q57e Avro round trip. */
final case class AvroOrder(o_orderkey: Long, o_orderpriority: String,
    o_totalprice: Double)

/** Source/sink format coverage beyond the parquet the driver tables use
  * and the partitioned header-CSV of the pipeline replay (O16–O18):
  * JSON-lines + ORC (q57) and Spark 4's built-in XML source (q57b),
  * chained write→read so both the writer and the schema'd reader of each
  * format execute, plus an Avro container round trip (q57e) built on the
  * avro-core codec. The oracles aggregate the original parquet — the round
  * trips must be value-preserving (doubles survive the text formats via
  * shortest-round-trip rendering; ORC and Avro are binary-exact).
  *
  * Work dirs are cached per (query, source dir) and removed by a shutdown
  * hook — a verify/bench run invokes each query several times and must
  * not leak a temp dir per invocation (same discipline as the streaming
  * source's symlink dir).
  */
object SourceFormats extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  private def workDir(key: String): String =
    dirCache.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_src_")
      sys.addShutdownHook(deleteRecursively(p))
      p.toString
    })

  /** The exact work dir a (query, sfDir) key resolved to in THIS JVM, if
    * it ran — lets specs audit the layout they just produced instead of
    * scanning java.io.tmpdir, where a stale dir from a killed JVM
    * (shutdown hooks don't run on SIGKILL) or a concurrent test JVM
    * would be picked up and asserted against (ADVICE r10). */
  private[graft] def workDirFor(key: String): Option[String] =
    Option(dirCache.get(key))

  /** Avro record schema (JSON) for a flat Spark schema — the four
    * primitive shapes the interchange tables need. Non-null by contract:
    * the driver tables carry no NULLs in these columns, and a nullable
    * union would weaken the reader-side schema check. */
  private[sources] def avroSchemaJson(name: String, schema: StructType): String = {
    def fieldType(dt: DataType): String = dt.typeName match {
      case "long" => "long"
      case "integer" => "int"
      case "double" => "double"
      case "string" => "string"
      case "boolean" => "boolean"
      case other => sys.error(s"avro mapping does not cover $other")
    }
    schema.fields
      .map(f => s"""{"name":"${f.name}","type":"${fieldType(f.dataType)}"}""")
      .mkString(s"""{"type":"record","name":"$name","fields":[""", ",", "]}")
  }

  val qs: Seq[Q] = Seq(

    Q("q57_source_roundtrip",
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q57:$d")
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        orders.write.mode("overwrite").json(s"$dir/json")
        val fromJson = s.read.schema(orders.schema).json(s"$dir/json")
        fromJson.write.mode("overwrite").orc(s"$dir/orc")
        s.read.orc(s"$dir/orc")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      }),

    // Q115 small-file compaction (the OPTIMIZE job of a parquet
    // warehouse): a fragmented landing zone — 64 shards of the orders
    // table, the shape a high-frequency ingest cadence leaves behind
    // (reference anchor: each Lambda batch lands its own small file,
    // `transactions_mock_data.py:125-150`) — is rewritten into
    // size-targeted files: target count = ceil(bytes / 32 MiB), computed
    // from FILESYSTEM METADATA (a driver-side listing, no data motion),
    // executed as one round-robin repartition write. The oracle
    // aggregates the original table — compaction must be
    // content-preserving; ScaleOpsSpec asserts the file-count economics.
    Q("q115_compaction",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q115:$d")
        val small = s"$dir/small"
        val compacted = s"$dir/compacted"
        t(s, d, "orders").repartition(64)
          .write.mode("overwrite").parquet(small)
        val bytes = new java.io.File(small).listFiles()
          .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
        val target = math.max(1L, (bytes + (32L << 20) - 1) / (32L << 20)).toInt
        s.read.parquet(small).repartition(target)
          .write.mode("overwrite").parquet(compacted)
        s.read.parquet(compacted)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("o_orderpriority")
      }),

    // Q57c schema evolution: two parquet generations of the same table —
    // the second with an added column — read back through mergeSchema into
    // one unified frame (old rows surface NULL for the new column). The
    // standard warehouse situation when a pipeline adds a field mid-life;
    // the oracle replays which half of the rows carries the column.
    Q("q57c_schema_evolution",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS with_priority,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q57c:$d")
        val orders = t(s, d, "orders")
        orders.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$dir/evo/gen1")
        orders.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").parquet(s"$dir/evo/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$dir/evo/gen1", s"$dir/evo/gen2")
          .agg(count(lit(1)).as("n"),
            count(col("o_orderpriority")).as("with_priority"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      }),

    // Q150 schema-DRIFT reconciliation: q57c handles the benign evolution
    // (an added column) that mergeSchema absorbs; this handles the drift
    // that mergeSchema CANNOT — the same column changing TYPE across
    // generations (doc_id INT → STRING, the classic upstream contract
    // break), where a unified read throws. The operator reads each
    // generation under its OWN schema, normalizes to the target via
    // try_cast, and QUARANTINES the rows that don't conform ('doc-…'
    // prefixed ids here) instead of failing the job or silently
    // dropping them — the landing-zone triage a 100 TB ingest needs when
    // a producer ships a bad day of data. The oracle replays the
    // generation split and castability rule arithmetically; id_sum
    // hash-verifies that exactly the right ROWS (not just counts)
    // survived reconciliation.
    Q("q150_schema_reconcile",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_total,
             |  CAST(sum(CASE WHEN doc_id % 2 = 0 OR doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
             |  CAST(sum(CASE WHEN doc_id % 2 = 1 AND doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
             |  CAST(sum(CASE WHEN doc_id % 2 = 0 OR doc_id % 3 <> 0 THEN doc_id ELSE 0 END) AS BIGINT) AS id_sum
             |FROM documents""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q150:$d")
        val docs = t(s, d, "documents")
        // generation 1: the original contract — doc_id is an INT
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id").cast("int").as("doc_id"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/drift/gen1")
        // generation 2: the broken contract — doc_id became a STRING,
        // and a third of the rows aren't even numeric
        docs.filter(col("doc_id") % 2 === 1)
          .select(
            when(col("doc_id") % 3 === 0, concat(lit("doc-"), col("doc_id")))
              .otherwise(col("doc_id").cast("string")).as("doc_id"),
            col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/drift/gen2")
        val g1 = s.read.parquet(s"$dir/drift/gen1")
          .select(col("doc_id").cast("long").as("id"))
        val g2 = s.read.parquet(s"$dir/drift/gen2")
          .select(expr("try_cast(doc_id as long)").as("id"))
        g1.unionByName(g2)
          .agg(count(lit(1)).as("n_total"),
            count(col("id")).as("n_reconciled"),
            sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_quarantined"),
            sum(coalesce(col("id"), lit(0L))).as("id_sum"))
      }),

    // Q57d corrupt-record-tolerant ingestion: a JSON-lines landing file
    // where every 7th record is deliberately truncated mid-object, read in
    // PERMISSIVE mode with an explicit corrupt-record column — malformed
    // input becomes quarantinable rows instead of a failed job (the
    // resilience any at-scale landing zone needs). The oracle replays the
    // malformation schedule.
    Q("q57d_corrupt_records",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
             |  CAST(sum(CASE WHEN doc_id % 7 <> 0 AND lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed
             |FROM documents""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q57d:$d")
        t(s, d, "documents")
          .select(when(col("doc_id") % 7 === 0,
              concat(lit("{\"doc_id\":"), col("doc_id"), lit(",")))
            .otherwise(to_json(struct(col("doc_id"), col("lang"))))
            .as("value"))
          .write.mode("overwrite").text(s"$dir/raw")
        s.read
          .schema("doc_id LONG, lang STRING, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(s"$dir/raw")
          .agg(count(lit(1)).as("n"),
            count(col("_corrupt_record")).as("n_corrupt"),
            count(col("lang")).as("n_parsed"))
      }),

    // Q130 custom DataSource V2 ingestion — the "glog" pipe-delimited log
    // source (sources/glog/GlogSource.scala): stage orders as glog text
    // (shortest-round-trip double rendering, value-exact), read back through
    // the V2 connector with a schema'd read, a pushed comparison filter and
    // a pruned projection. The source — not Spark — evaluates the filter
    // and materializes only the 2 requested fields of each line; splits are
    // per-file, statistics from file metadata. GlogSourceSpec asserts the
    // scan contract (pushed filters accepted, residual empty, read schema
    // pruned); the oracle replays the filter+aggregate on the original
    // parquet, so staging and the connector must both be value-preserving.
    Q("q130_dsv2_glog_source",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_totalprice > 150000.0
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q130:$d")
        val glogDir = s"$dir/glog"
        // concat (not concat_ws) on purpose: concat_ws SKIPS null operands,
        // which would silently shift every later field left; concat
        // propagates the null and the text writer rejects the null row —
        // staging fails loudly instead of corrupting columns (ADVICE r11).
        t(s, d, "orders")
          .select(concat(
            col("o_orderkey").cast("string"), lit("|"),
            col("o_orderpriority"), lit("|"),
            col("o_totalprice").cast("string")).as("value"))
          .write.mode("overwrite").text(glogDir)
        s.read
          .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
          .format("graft.sources.glog.GlogDataSource")
          .load(glogDir)
          .filter(col("o_totalprice") > lit(150000.0))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("o_orderpriority")
      }),

    // Q156 custom DataSource V2 STREAMING source — the glog connector's
    // MicroBatchStream read path (r11 verdict #1): the reference's
    // record-at-a-time queue ingestion (`send_data_to_sqs.py:1-2`) served
    // by a REAL offset-logged source instead of a file-source stand-in.
    // Offsets are (file → line count) positions over the append-only glog
    // dir; `latestOffset` is metadata-driven (lines recounted only when a
    // file's size changes), splits are per-grown-file, and the scan keeps
    // the batch connector's parse-time pruning + pushed filters.
    // GlogSourceSpec proves resume-from-offset across restarts for both
    // new-file and appended-line arrivals. Here the staged orders log is
    // drained with AvailableNow into the same rollup q130 computes;
    // oracle = the batch aggregate over the original parquet (stream and
    // batch must agree on a fully-drained input).
    Q("q156_glog_stream_source",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q156:$d")
        val glogDir = s"$dir/glog"
        t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .write.format("graft.sources.glog.GlogDataSource")
          .mode("overwrite").save(glogDir)
        val agg = s.readStream
          .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
          .format("graft.sources.glog.GlogDataSource")
          .load(glogDir)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("total"))
        val prev = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions",
          graft.StreamSizing.shards(s, glogDir).toString)
        try {
          val q = agg.writeStream.format("memory").queryName("q156_sink")
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", prev)
        s.table("q156_sink").orderBy("o_orderpriority")
      }),

    // Q162 custom DSv2 STREAMING SINK — the glog connector's fourth
    // quadrant (batch/stream × read/write): one streaming query whose
    // SOURCE and SINK are both the custom connector. The staged orders
    // log is drained with AvailableNow through a stateless projection +
    // filter into a glog-format sink (per-epoch two-phase commit under
    // deterministic (epoch, partition) names — a replayed epoch replaces
    // its files instead of duplicating rows), then the sink is read back
    // BATCH and aggregated; oracle replays filter+aggregate on the
    // original parquet. A value drift anywhere in stream-write → read
    // hash-mismatches.
    Q("q162_glog_stream_sink",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q162:$d")
        val srcDir = s"$dir/src"
        // Sink + checkpoint must start EMPTY each invocation (ADVICE r12):
        // the overwrite-staged source gets NEW file names every run (taskId
        // is embedded), so a reused checkpoint sees them as unconsumed and
        // replays every row into fresh epoch files BESIDE the previous
        // run's — the batch readback would double-count. freshSubdir wipes
        // the previous generation (the q87/q127/q137 discipline).
        val run = graft.WorkDirs.freshSubdir("graft_q162_", s"q162run:$d", "run")
        val sinkDir = s"$run/sink"
        val ckpt = s"$run/ckpt"
        t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .write.format("graft.sources.glog.GlogDataSource")
          .mode("overwrite").save(srcDir)
        val q = s.readStream
          .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
          .format("graft.sources.glog.GlogDataSource")
          .load(srcDir)
          .filter(col("o_orderkey") % 2 === 0)
          .writeStream.format("graft.sources.glog.GlogDataSource")
          .option("path", sinkDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read
          .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
          .format("graft.sources.glog.GlogDataSource").load(sinkDir)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("total"))
          .orderBy("o_orderpriority")
      }),

    // Q135 custom DataSource V2 SINK — the write half of the glog
    // connector (q130 reads it): the customer dim is written through the
    // V2 two-phase commit path (executors stream hidden temp shards; the
    // driver publishes them with atomic renames, truncating the previous
    // generation under overwrite), then read back through the same
    // connector. GlogSourceSpec asserts the commit mechanics (no temp
    // litter, overwrite really truncates, delimiter-bearing strings fail
    // loudly); the oracle aggregates the original parquet, so the whole
    // write→read cycle must be value-exact (shortest-round-trip doubles).
    Q("q135_dsv2_glog_sink",
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q135:$d")
        val out = s"$dir/sink"
        t(s, d, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
          .write.format("graft.sources.glog.GlogDataSource")
          .mode("overwrite").save(out)
        s.read
          .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
          .format("graft.sources.glog.GlogDataSource").load(out)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("c_mktsegment")
      }),

    // Q57b XML round trip — the remaining text format Spark 4 ships a
    // built-in source for (the spark-xml donation). Row-tagged elements,
    // explicit schema on read (inference would widen types), aggregate
    // checked against the original parquet.
    Q("q57b_xml_roundtrip",
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      (s, d) => {
        val dir = workDir(s"q57b:$d")
        val cust = t(s, d, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        cust.write.mode("overwrite")
          .option("rootTag", "customers").option("rowTag", "customer")
          .format("xml").save(s"$dir/xml")
        s.read.schema(cust.schema).option("rowTag", "customer")
          .format("xml").load(s"$dir/xml")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("c_mktsegment")
      }),

    // Q57e Avro container round trip — the warehouse interchange format
    // after parquet (the reference's Glue-contract ingestion edge,
    // transactions_mock_data.py:113-114, is exactly where users swap
    // formats). This Spark distribution bundles avro-core but not the
    // spark-avro CONNECTOR module, so the round trip drives the real Avro
    // codec directly: the write side emits one .avro container per
    // partition from foreachPartition (the executor-side shard write any
    // DataSource sink performs — no driver funnel), and the read side
    // distributes the shard list one-per-task and streams records through
    // a GenericDatumReader against the DECLARED reader schema (Avro's
    // writer→reader resolution, the schema'd-read contract of q57b).
    // Container files are the parallelism unit, exactly like an input
    // split; reader disposal is bound to task completion (the Multimodal
    // discipline) so early-terminating consumers can't leak codec state.
    // Values are long/string/double — binary-exact through Avro — so the
    // oracle aggregates the original parquet.
    Q("q57e_avro_roundtrip",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        import s.implicits._
        val dir = workDir(s"q57e:$d")
        val avroDir = new java.io.File(s"$dir/avro")
        avroDir.mkdirs()
        avroDir.listFiles().filter(_.getName.endsWith(".avro"))
          .foreach(_.delete())
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        val schemaJson = avroSchemaJson("orders", orders.schema)
        val fieldNames = orders.schema.fieldNames
        val out = avroDir.getAbsolutePath
        orders.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          if (rows.hasNext) {
            val sch = new org.apache.avro.Schema.Parser().parse(schemaJson)
            val w = new org.apache.avro.file.DataFileWriter(
              new org.apache.avro.generic.GenericDatumWriter[
                org.apache.avro.generic.GenericRecord](sch))
            w.create(sch, new java.io.File(
              s"$out/part-${org.apache.spark.TaskContext.getPartitionId()}.avro"))
            try rows.foreach { row =>
              val rec = new org.apache.avro.generic.GenericData.Record(sch)
              fieldNames.indices.foreach(i => rec.put(fieldNames(i), row.get(i)))
              w.append(rec)
            } finally w.close()
          }
        }
        val shards = avroDir.listFiles().filter(_.getName.endsWith(".avro"))
          .map(_.getAbsolutePath).toSeq.sorted
        s.createDataset(shards).repartition(shards.size)
          .flatMap { path =>
            import scala.jdk.CollectionConverters._
            val sch = new org.apache.avro.Schema.Parser().parse(schemaJson)
            val rdr = org.apache.avro.file.DataFileReader.openReader(
              new java.io.File(path),
              new org.apache.avro.generic.GenericDatumReader[
                org.apache.avro.generic.GenericRecord](sch))
            Option(org.apache.spark.TaskContext.get()).foreach(
              _.addTaskCompletionListener[Unit](_ => rdr.close()))
            rdr.iterator().asScala.map(rec => AvroOrder(
              rec.get("o_orderkey").asInstanceOf[Long],
              rec.get("o_orderpriority").toString,
              rec.get("o_totalprice").asInstanceOf[Double]))
          }
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("o_orderpriority")
      })
  )
}

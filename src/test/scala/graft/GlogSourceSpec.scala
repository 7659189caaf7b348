package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.glog.{GlogCommitMsg, GlogMicroBatchStream, GlogScan, GlogStreamOffset, GlogStreamingWrite}

/** The DSv2 scan contract of the glog source (q130): filters the source
  * accepted must leave Spark's plan entirely, the reader schema must carry
  * only the projected fields, splits are per-file, and NULL/inference
  * semantics hold. Value parity vs parquet is QueryCorpusSpec + the
  * CORRECTNESS oracle; this suite pins the *mechanics*. */
class GlogSourceSpec extends SparkSpec {

  private def stage(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_glog_$name").toString
    Tables.table(spark, sf, "orders")
      .select(concat_ws("|",
        col("o_orderkey").cast("string"),
        col("o_orderpriority"),
        col("o_totalprice").cast("string")).as("value"))
      .write.mode("overwrite").text(dir)
    dir
  }

  private def read(dir: String) = spark.read
    .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
    .format("graft.sources.glog.GlogDataSource")
    .load(dir)

  private def glogScan(df: org.apache.spark.sql.DataFrame): GlogScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size == 1, s"expected one BatchScan, got ${scans.size}")
    scans.head.asInstanceOf[GlogScan]
  }

  test("glog pushes comparison filters into the source and out of the plan") {
    val dir = stage("push")
    val df = read(dir)
      .filter(col("o_totalprice") > 150000.0 && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val scan = glogScan(df)
    val pushed = scan.pushed.map(_.toString).mkString(", ")
    assert(pushed.contains("GreaterThan(o_totalprice,150000.0)"), pushed)
    assert(pushed.contains("EqualTo(o_orderpriority,1-URGENT)"), pushed)
    // Everything was accepted → no residual FilterExec re-evaluates it.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"residual filter survived:\n$plan")
    // And the pushed result equals filtering the original parquet in Spark.
    val unpushed = Tables.table(spark, sf, "orders")
      .filter(col("o_totalprice") > 150000.0 && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      unpushed.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("glog prunes the reader schema to the projected fields") {
    val dir = stage("prune")
    val df = read(dir).select("o_orderpriority", "o_totalprice")
    val scan = glogScan(df)
    assert(scan.readSchema().fieldNames.toSet ===
      Set("o_orderpriority", "o_totalprice"))
    assert(scan.fullSchema.fieldNames.length == 3)
  }

  test("glog plans one input partition per staged file") {
    val dir = stage("splits")
    val files = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val scan = glogScan(read(dir).select("o_orderkey"))
    assert(scan.toBatch.planInputPartitions().length === files)
    assert(scan.estimateStatistics().sizeInBytes().getAsLong > 0)
  }

  test("glog surfaces empty fields as NULL and honors pushed null checks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_null").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.glog"),
      "1|x|2.5\n2||3.5\n3|y|\n".getBytes("UTF-8"))
    val df = spark.read.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(dir)
    assert(df.count() === 3)
    assert(df.filter(col("s").isNull).select("k").collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(df.filter(col("v").isNotNull).count() === 2)
    // a comparison never matches a NULL field
    assert(df.filter(col("v") > 0.0).count() === 2)
  }

  test("glog sink: two-phase commit publishes shards atomically, overwrite truncates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_sink").toString + "/t"
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    orders.filter(col("o_orderkey") % 2 === 0)
      .write.format("graft.sources.glog.GlogDataSource").mode("overwrite").save(dir)
    // generation 2 overwrites generation 1 entirely
    orders.filter(col("o_orderkey") % 2 === 1)
      .write.format("graft.sources.glog.GlogDataSource").mode("overwrite").save(dir)
    // hidden files (Hadoop checksum sidecars like .part-N.glog.crc) are
    // invisible to the read path; the litter contract covers VISIBLE files
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".glog")),
      s"uncommitted litter in the sink dir: ${files.mkString(", ")}")
    val back = spark.read
      .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(dir)
    val expected = orders.filter(col("o_orderkey") % 2 === 1)
    assert(back.count() === expected.count())
    // value-exact round trip, doubles included
    assert(back.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0) ===
      expected.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0))
  }

  test("glog sink: a string carrying the field delimiter fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_bad").toString + "/t"
    val bad = Seq((1L, "has|pipe")).toDF("k", "s")
    val e = intercept[Exception] {
      bad.write.format("graft.sources.glog.GlogDataSource").mode("overwrite").save(dir)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("delimiter"))),
      s"expected a delimiter error, got $e")
  }

  test("glog sink: an empty string fails loudly (empty field means NULL)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_empty").toString + "/t"
    val bad = Seq((1L, "")).toDF("k", "s")
    val e = intercept[Exception] {
      bad.write.format("graft.sources.glog.GlogDataSource").mode("overwrite").save(dir)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("empty string"))),
      s"expected an empty-string error, got $e")
  }

  test("glog pushed string ranges use Spark's UTF-8 binary order (supplementary planes)") {
    // U+FFFD sorts ABOVE U+1F600 in UTF-16 code units (Java String
    // .compareTo: 0xFFFD > surrogate 0xD83D) but BELOW it in UTF-8 bytes
    // (EF BF BD < F0 9F 98 80) — the order Spark uses. A pushed `>` must
    // agree with Spark, because the accepted filter leaves the plan.
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_utf8").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.glog"),
      "1|�|1.0\n2|😀|2.0\n".getBytes("UTF-8"))
    val df = spark.read.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(dir)
      .filter(col("s") > "�")
    val scan = glogScan(df)
    assert(scan.pushed.nonEmpty, "string range was not pushed")
    assert(df.select("k").collect().map(_.getLong(0)).toSeq === Seq(2L),
      "pushed string comparison diverged from Spark's UTF-8 binary order")
  }

  test("glog reads and writes through the Hadoop FileSystem path (file:/ URIs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_hfs").toString
    val uri = s"file:$dir/t"
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .filter(col("o_orderkey") % 10 === 0)
    orders.write.format("graft.sources.glog.GlogDataSource")
      .mode("overwrite").save(uri)
    val back = spark.read
      .schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(uri)
    assert(back.count() === orders.count())
    assert(back.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0) ===
      orders.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0))
    // the committed files really live where the URI pointed
    val files = new java.io.File(s"$dir/t").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".glog")), files.mkString(", "))
  }

  test("glog stream offsets serialize deterministically and round trip") {
    val off = GlogStreamOffset(Map("/b/f2.glog" -> 7L, "/a/f1.glog" -> 3L))
    assert(off.json === """{"/a/f1.glog":3,"/b/f2.glog":7}""")
    assert(GlogStreamOffset.fromJson(off.json) === off)
    assert(GlogStreamOffset.fromJson("{}") === GlogStreamOffset(Map.empty))
  }

  test("glog streaming source: resume-from-offset across restarts (new files + appended lines)") {
    val root = java.nio.file.Files.createTempDirectory("graft_glog_stream").toString
    val data = s"$root/log"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "a.glog"),
      "1|x|1.0\n2|y|2.0\n3|z|3.0\n".getBytes("UTF-8"))
    val ckpt = s"$root/ckpt"
    // run a fresh query instance against the SAME checkpoint each time;
    // the set-fold absorbs any replayed uncommitted batch (idempotent)
    def runOnce(): Set[Long] = {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = spark.readStream.schema("k LONG, s STRING, v DOUBLE")
        .format("graft.sources.glog.GlogDataSource").load(data)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").collect().foreach(r => seen.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    assert(runOnce() === Set(1L, 2L, 3L))
    // between the runs: two lines APPENDED to the consumed file plus one
    // new file — the two arrival shapes the (file, line-range) offset
    // must distinguish from already-committed data
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "a.glog"),
      "4|p|4.0\n5|q|5.0\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "b.glog"), "6|r|6.0\n".getBytes("UTF-8"))
    assert(runOnce() === Set(4L, 5L, 6L),
      "a restarted instance must deliver ONLY the ranges beyond the committed offset")
    // and a third instance with nothing new delivers nothing
    assert(runOnce() === Set.empty[Long])
  }

  test("glog streaming sink: epoch-committed files, no litter, restart appends only the delta") {
    val root = java.nio.file.Files.createTempDirectory("graft_glog_ssink").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "a.glog"),
      "1|x|1.0\n2|y|2.0\n3|z|3.0\n".getBytes("UTF-8"))
    val sink = s"$root/sink"
    def drain(): Unit = {
      val q = spark.readStream.schema("k LONG, s STRING, v DOUBLE")
        .format("graft.sources.glog.GlogDataSource").load(src)
        .writeStream.format("graft.sources.glog.GlogDataSource")
        .option("path", sink)
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkRows(): Set[Long] = spark.read.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(sink)
      .select("k").collect().map(_.getLong(0)).toSet
    drain()
    assert(sinkRows() === Set(1L, 2L, 3L))
    // committed names carry (epoch, partition); hidden temps are gone
    val files = new java.io.File(sink).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(f =>
        f.startsWith("epoch-") && f.endsWith(".glog")),
      s"unexpected sink contents: ${files.mkString(", ")}")
    assert(!new java.io.File(sink).listFiles()
      .exists(_.getName.endsWith(".tmp")), "temp litter survived the commit")
    // restart with nothing new: the sink is unchanged (no re-emission)
    drain()
    assert(sinkRows() === Set(1L, 2L, 3L))
    // new arrivals land as a NEW epoch's files; old epochs untouched
    val before = new java.io.File(sink).listFiles().map(_.getName).toSet
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "b.glog"), "4|p|4.0\n".getBytes("UTF-8"))
    drain()
    assert(sinkRows() === Set(1L, 2L, 3L, 4L))
    val after = new java.io.File(sink).listFiles().map(_.getName).toSet
    assert(before.subsetOf(after), "an epoch commit touched earlier epochs' files")
  }

  test("glog streaming source prunes and filters at the source per micro-batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_glog_streamf").toString
    val data = s"$root/log"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "a.glog"),
      "1|x|1.0\n2|y|2.0\n3|z|3.0\n".getBytes("UTF-8"))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(data)
      .filter(col("v") > 1.5).select("k")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet === Set(2L, 3L))
  }

  test("glog streaming source drains a backlog in bounded micro-batches (maxFilesPerTrigger)") {
    // r12 verdict #2: a restart after downtime must NOT drain the whole
    // backlog as one giant batch. Six files staged up front; with
    // maxFilesPerTrigger=2 the drain takes exactly 3 data batches, each
    // bounded, and the union equals the unbounded result.
    val root = java.nio.file.Files.createTempDirectory("graft_glog_admf").toString
    val data = s"$root/log"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    (0 until 6).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(data, f"f$i%02d.glog"),
        s"${2 * i}|a|1.0\n${2 * i + 1}|b|2.0\n".getBytes("UTF-8"))
    }
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource")
      .option("maxFilesPerTrigger", "2")
      .load(data)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.select("k").collect().map(_.getLong(0))
        if (ks.nonEmpty) batchSizes.add(ks.length)
        ks.foreach(seen.add(_)); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet === (0L until 12L).toSet)
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.length >= 3, s"backlog drained in ${sizes.length} batches: $sizes")
    assert(sizes.forall(_ <= 4), s"a batch exceeded 2 files' rows: $sizes")
  }

  test("glog streaming source bounds batch rows (maxLinesPerTrigger), final result unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_glog_admr").toString
    val data = s"$root/log"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    // one big file + one small: the row limit must split WITHIN the file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "a.glog"),
      (0 until 11).map(i => s"$i|x|1.0\n").mkString.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(data, "b.glog"), "11|y|2.0\n".getBytes("UTF-8"))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource")
      .option("maxLinesPerTrigger", "5")
      .load(data)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.select("k").collect().map(_.getLong(0))
        if (ks.nonEmpty) batchSizes.add(ks.length)
        ks.foreach(seen.add(_)); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet === (0L until 12L).toSet)
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.length >= 3, s"12 rows at 5/trigger took ${sizes.length} batches: $sizes")
    assert(sizes.forall(_ <= 5), s"a batch exceeded maxLinesPerTrigger: $sizes")
  }

  test("glog latestOffset reads only the appended delta of a grown file") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = java.nio.file.Files.createTempDirectory("graft_glog_delta").toString
    val f = java.nio.file.Paths.get(root, "a.glog")
    val bulk = (0 until 5000).map(i => s"$i|x|1.0\n").mkString
    java.nio.file.Files.write(f, bulk.getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k LONG, s STRING, v DOUBLE")
    val stream = new GlogMicroBatchStream(schema, Array(0, 1, 2), Nil, root)
    val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
      .asInstanceOf[GlogStreamOffset]
    assert(o1.fileLines.values.sum === 5000L)
    // append two lines; the next offset pass must scan ~the delta, not
    // the whole 5000-line file again (r12 verdict #3)
    val delta = "5000|y|2.0\n5001|z|3.0\n"
    java.nio.file.Files.write(f, delta.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val before = GlogMicroBatchStream.driverBytesScanned.get()
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[GlogStreamOffset]
    val scanned = GlogMicroBatchStream.driverBytesScanned.get() - before
    assert(o2.fileLines.values.sum === 5002L)
    assert(scanned === delta.getBytes("UTF-8").length.toLong,
      s"offset discovery scanned $scanned bytes for a ${delta.length}-byte append")
    // an UNCHANGED directory costs zero scanned bytes (pure listStatus)
    val before2 = GlogMicroBatchStream.driverBytesScanned.get()
    stream.latestOffset(o2, ReadLimit.allAvailable())
    assert(GlogMicroBatchStream.driverBytesScanned.get() === before2)
  }

  test("glog streaming source fails loudly when a file shrinks (append-only contract)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = java.nio.file.Files.createTempDirectory("graft_glog_shrink").toString
    val f = java.nio.file.Paths.get(root, "a.glog")
    java.nio.file.Files.write(f, "1|x|1.0\n2|y|2.0\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k LONG, s STRING, v DOUBLE")
    val stream = new GlogMicroBatchStream(schema, Array(0, 1, 2), Nil, root)
    val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    // an in-place rewrite that SHRINKS the file breaks the offsets already
    // logged — the source must refuse, not silently skip/duplicate lines
    java.nio.file.Files.write(f, "9|z|9.0\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      stream.latestOffset(o1, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("glog streaming source fails loudly on a SAME-SIZE in-place rewrite (r13 verdict #5)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = java.nio.file.Files.createTempDirectory("graft_glog_samesz").toString
    val f = java.nio.file.Paths.get(root, "a.glog")
    java.nio.file.Files.write(f, "1|x|1.0\n2|y|2.0\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k LONG, s STRING, v DOUBLE")
    val stream = new GlogMicroBatchStream(schema, Array(0, 1, 2), Nil, root)
    val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    // rewrite with BYTE-IDENTICAL length but different content — size
    // alone cannot see it; the (size, mtime) cache key must (the mtime
    // bump is explicit: filesystem mtime granularity can swallow a
    // fast rewrite)
    java.nio.file.Files.write(f, "3|a|3.0\n4|b|4.0\n".getBytes("UTF-8"))
    val mt = java.nio.file.Files.getLastModifiedTime(f).toMillis
    f.toFile.setLastModified(mt + 2000)
    val e = intercept[IllegalStateException] {
      stream.latestOffset(o1, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    assert(e.getMessage.contains("unchanged size"), e.getMessage)
  }

  test("glog streaming sink: a replayed epoch with fewer partitions removes the wider attempt's files") {
    // ADVICE r12: if the failed attempt wrote part-0..part-3 and the
    // replay commits only part-0..part-1, the stale part-2/part-3 files
    // would duplicate rows. commit() must clear every file of the epoch
    // that the commit messages do not name.
    val root = java.nio.file.Files.createTempDirectory("graft_glog_replay").toString
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, name), content.getBytes("UTF-8"))
    // the failed wider attempt's published files
    put("epoch-5-part-0.glog", "1|a|1.0\n")
    put("epoch-5-part-1.glog", "2|b|2.0\n")
    put("epoch-5-part-2.glog", "3|c|3.0\n")
    put("epoch-5-part-3.glog", "4|d|4.0\n")
    // an unrelated epoch must survive untouched
    put("epoch-4-part-0.glog", "0|z|0.5\n")
    // the replay's temp files (2 partitions only)
    put(".epoch-5-part-0-77.glog.tmp", "1|a|1.0\n2|b|2.0\n")
    put(".epoch-5-part-1-78.glog.tmp", "3|c|3.0\n4|d|4.0\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k LONG, s STRING, v DOUBLE")
    new GlogStreamingWrite(schema, root).commit(5L, Array(
      GlogCommitMsg(s"$root/.epoch-5-part-0-77.glog.tmp", s"$root/epoch-5-part-0.glog"),
      GlogCommitMsg(s"$root/.epoch-5-part-1-78.glog.tmp", s"$root/epoch-5-part-1.glog")))
    val files = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.endsWith(".glog")).sorted.toSeq
    assert(files === Seq("epoch-4-part-0.glog", "epoch-5-part-0.glog",
      "epoch-5-part-1.glog"),
      s"stale wider-attempt files survived the replay commit: $files")
    val rows = spark.read.schema("k LONG, s STRING, v DOUBLE")
      .format("graft.sources.glog.GlogDataSource").load(root)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(0L, 1L, 2L, 3L, 4L), "epoch replay duplicated rows")
  }

  test("glog infers an all-string c0..cN schema when none is supplied") {
    val dir = java.nio.file.Files.createTempDirectory("graft_glog_infer").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.glog"), "1|x|2.5\n".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.glog.GlogDataSource").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("c0", "c1", "c2"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.collect().map(_.getString(2)).toSeq === Seq("2.5"))
  }
}

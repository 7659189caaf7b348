package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeTravel

/** The commit-log snapshot protocol (q157, r11 verdict #4): AS-OF reads
  * resolve files from the log only, generations are immutable, committers
  * race safely, vacuum removes only unreferenced files. */
class TimeTravelSpec extends SparkSpec {

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_ttl_spec_").toString + "/t"

  private def orders = Tables.table(spark, sf, "orders")
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  test("AS-OF reads ignore later generations' files and planted orphans") {
    val root = newRoot()
    val gen0 = orders.filter(col("o_orderkey") % 3 =!= 0)
    assert(TimeTravel.commit(spark, root, gen0) === 0)
    val asOf0Before = TimeTravel.readAsOf(spark, root, 0).count()
    assert(asOf0Before === gen0.count())
    // later generation + an orphan no commit references
    assert(TimeTravel.commit(spark, root,
      orders.filter(col("o_orderkey") % 3 === 0)) === 1)
    orders.limit(10).write.mode("overwrite").parquet(s"$root/tmp_orphan")
    new java.io.File(s"$root/tmp_orphan").listFiles()
      .filter(_.getName.endsWith(".parquet")).take(1).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$root/data/orphan-${f.getName}"))
      }
    // gen 0's snapshot is unchanged by both arrivals; current sees all
    assert(TimeTravel.readAsOf(spark, root, 0).count() === asOf0Before)
    assert(TimeTravel.readAsOf(spark, root, 1).count() === orders.count())
    // a generation that never existed is an explicit error, not a guess
    val e = intercept[IllegalArgumentException] {
      TimeTravel.readAsOf(spark, root, 7)
    }
    assert(e.getMessage.contains("generation 7"))
  }

  test("a remove-commit retires files from later snapshots only") {
    val root = newRoot()
    TimeTravel.commit(spark, root, orders.limit(100))
    val v0Files = TimeTravel.readAsOf(spark, root, 0)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(_.getString(0).split('/').last).toSeq
    // compaction: rewrite generation 0's content into one commit that
    // both adds the compacted file and removes the originals
    TimeTravel.commit(spark, root,
      TimeTravel.readAsOf(spark, root, 0).coalesce(1), removed = v0Files)
    // the old snapshot still reads the old files; the new one only the new
    assert(TimeTravel.readAsOf(spark, root, 0).count() === 100)
    assert(TimeTravel.readAsOf(spark, root, 1).count() === 100)
    val v1Files = TimeTravel.readAsOf(spark, root, 1)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(_.getString(0).split('/').last).toSeq
    assert(v1Files.intersect(v0Files).isEmpty,
      "the compacted snapshot still reads retired files")
  }

  test("racing committers claim distinct versions; both commits land") {
    val root = newRoot()
    TimeTravel.commit(spark, root, orders.limit(10))
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 3).map { i =>
      new Thread(() => {
        versions.add(TimeTravel.commit(spark, root,
          orders.filter(col("o_orderkey") % 3 === i % 3).limit(20)))
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSet === Set(1, 2, 3),
      s"optimistic commit retry failed: ${versions.asScala.toSeq.sorted}")
    assert(TimeTravel.currentVersion(root) === 3)
    // every commit's rows are present in the final snapshot
    assert(TimeTravel.readAsOf(spark, root, 3).count() === 10 + 3 * 20)
  }

  test("vacuum deletes only unreferenced files; history stays readable") {
    val root = newRoot()
    TimeTravel.commit(spark, root, orders.limit(50))
    TimeTravel.commit(spark, root, orders.limit(30))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/data/orphan-x.parquet"),
      "junk".getBytes("UTF-8"))
    val removed = TimeTravel.vacuum(root)
    assert(removed === Seq("orphan-x.parquet"))
    assert(TimeTravel.readAsOf(spark, root, 0).count() === 50)
    assert(TimeTravel.readAsOf(spark, root, 1).count() === 80)
  }

  test("q160: change reads scan only the delta's files; remove ranges refuse") {
    val root = newRoot()
    TimeTravel.commit(spark, root, orders.filter(col("o_orderkey") % 3 =!= 0))
    TimeTravel.commit(spark, root, orders.filter(col("o_orderkey") % 3 === 0))
    val changes = TimeTravel.readChangesSince(spark, root, 0, 1)
    assert(changes.count() === orders.filter(col("o_orderkey") % 3 === 0).count())
    // the scan's file set is exactly generation 1's added files
    val scanned = changes.select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0).split('/').last).toSet
    val gen1Files = TimeTravel.readAsOf(spark, root, 1)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(_.getString(0).split('/').last).toSet
    val gen0Files = TimeTravel.readAsOf(spark, root, 0)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(_.getString(0).split('/').last).toSet
    assert(scanned === gen1Files.diff(gen0Files),
      "change read scanned more than the delta files")
    // an empty range answers empty, same schema
    assert(TimeTravel.readChangesSince(spark, root, 1, 1).count() === 0)
    // a remove-commit inside the range is a loud error, not a wrong answer
    val rm = TimeTravel.readAsOf(spark, root, 1)
      .select(col("_metadata.file_path")).distinct().collect()
      .map(_.getString(0).split('/').last).toSeq.take(1)
    TimeTravel.commit(spark, root, orders.limit(5), removed = rm)
    val e = intercept[IllegalArgumentException] {
      TimeTravel.readChangesSince(spark, root, 0, 2)
    }
    assert(e.getMessage.contains("remove-commits"))
  }

  test("q163: a checkpoint bounds resolution to the tail commits; below it replays fully") {
    val root = newRoot()
    (0 until 8).foreach { g =>
      TimeTravel.commit(spark, root, orders.filter(col("o_orderkey") % 8 === g))
    }
    // pre-checkpoint resolution of the latest generation parses all 8 commits
    val (filesBefore, parsedBefore) = TimeTravel.resolveSnapshot(root, 7)
    assert(parsedBefore === 8)
    assert(TimeTravel.checkpoint(root) === 7)
    // checkpointed resolution: same file set, ZERO commit parses
    val (filesAfter, parsedAfter) = TimeTravel.resolveSnapshot(root, 7)
    assert(parsedAfter === 0, s"checkpoint did not bound the log read: $parsedAfter")
    assert(filesAfter.sorted === filesBefore.sorted,
      "checkpointed resolution changed the snapshot")
    // two more commits: resolution = checkpoint + 2 tail parses
    TimeTravel.commit(spark, root, orders.limit(10))
    TimeTravel.commit(spark, root, orders.limit(20))
    val (_, parsedTail) = TimeTravel.resolveSnapshot(root, 9)
    assert(parsedTail === 2, s"expected 2 tail parses, got $parsedTail")
    assert(TimeTravel.readAsOf(spark, root, 9).count() === orders.count() + 30)
    // a generation BELOW the checkpoint still resolves by full replay
    val (_, parsedBelow) = TimeTravel.resolveSnapshot(root, 3)
    assert(parsedBelow === 4)
    assert(TimeTravel.readAsOf(spark, root, 3).count() ===
      orders.filter(col("o_orderkey") % 8 <= 3).count())
  }

  test("q157 plan reads exactly the snapshot's files — no directory listing") {
    val df = SparkEntry.queries("q157_time_travel")(spark, sf)
    assert(df.count() === 10) // 5 priorities × 2 generations
    // the orphan planted by ordersTable never appears in any scan
    val root = TimeTravel.ordersTable(spark, sf)
    val orphans = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.startsWith("orphan-"))
    assert(orphans.nonEmpty, "fixture lost its planted orphan")
    val plans = df.queryExecution.executedPlan.toString
    assert(!plans.contains("orphan-"),
      "a scan picked up the uncommitted orphan file")
  }
}

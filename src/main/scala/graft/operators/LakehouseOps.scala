package graft.operators

import graft.{Q, QueryModule, Tables, WorkDirs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path completeness over the q157 commit log — the table-format
  * operations a lakehouse deployment runs besides append/merge/read:
  * row-level DELETE (q172), OPTIMIZE compaction that change feeds skip
  * (q173), RESTORE rollback (q174), and bloom-filter point-lookup
  * skipping (q175). All are [[TimeTravel]] protocol ops; this module
  * holds their declared queries and fixtures.
  *
  * Reference: Javier009/eCommerce_Data_Pipeline's warehouse loads
  * (send_data_to_*.py re-runs) imply exactly these maintenance ops —
  * correcting a bad load (delete/restore) and compacting the small files
  * per-run ingestion accumulates.
  */
object LakehouseOps extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private def orders3(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")

  private def prioAgg(df: DataFrame): DataFrame =
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total"))

  /** q172's table: orders range-clustered with log stats (the q170
    * layout), then the middle [max/4, max/2] key range DELETED — the
    * delete runs once per JVM (guarded on the log's version), so repeated
    * invocations read the same generation-1 state. */
  private[graft] def deletedTable(s: SparkSession, d: String): String = {
    val root = WorkDirs.cached("graft_ttld_", s"q172:$d")
    if (TimeTravel.currentVersion(root) < 0)
      TimeTravel.commitClustered(s, root, orders3(s, d), "o_orderkey", 8)
    if (TimeTravel.currentVersion(root) < 1) {
      val mx = t(s, d, "orders").agg(max("o_orderkey")).head().getLong(0)
      TimeTravel.deleteWhere(s, root, "o_orderkey", mx / 4, mx / 2)
    }
    root
  }

  /** q173's table: two append generations, an OPTIMIZE compaction
    * (`nodata` commit), then a third append — the shape a per-run ingest
    * produces once maintenance kicks in. */
  private[graft] def compactedTable(s: SparkSession, d: String): String = {
    val root = WorkDirs.cached("graft_ttlo_", s"q173:$d")
    if (TimeTravel.currentVersion(root) < 0) {
      val o = orders3(s, d)
      TimeTravel.commit(s, root, o.filter(col("o_orderkey") % 3 === 1))
      TimeTravel.commit(s, root, o.filter(col("o_orderkey") % 3 === 2))
      TimeTravel.compact(s, root, 1)
      TimeTravel.commit(s, root, o.filter(col("o_orderkey") % 3 === 0))
    }
    root
  }

  /** q174's table: even keys at gen 0, odd keys appended at gen 1, then
    * RESTORED to gen 0 as generation 2 (the bad-load rollback). */
  private[graft] def restoredTable(s: SparkSession, d: String): String = {
    val root = WorkDirs.cached("graft_ttlr_", s"q174:$d")
    if (TimeTravel.currentVersion(root) < 0) {
      val o = orders3(s, d)
      TimeTravel.commit(s, root, o.filter(col("o_orderkey") % 2 === 0))
      TimeTravel.commit(s, root, o.filter(col("o_orderkey") % 2 === 1))
    }
    if (TimeTravel.currentVersion(root) < 2)
      TimeTravel.restore(s, root, 0)
    root
  }

  /** q175's table: orders committed with per-file key blooms in the log. */
  private[graft] def bloomedTable(s: SparkSession, d: String): String = {
    val root = WorkDirs.cached("graft_ttlb_", s"q175:$d")
    if (TimeTravel.currentVersion(root) < 0)
      TimeTravel.commitBloomed(s, root, orders3(s, d), "o_orderkey", 8)
    root
  }

  val qs: Seq[Q] = Seq(

    // Q172 log-native DELETE: the middle key range is deleted by
    // rewriting ONLY the stats-overlapping files (TimeTravelSpec asserts
    // untouched clusters keep their physical names); the surviving rows
    // re-cluster with fresh stats. Oracle: the complement predicate over
    // the source table, bounds derived identically (truncating division).
    Q("q172_log_delete",
      Some("""WITH p AS (SELECT max(o_orderkey)//4 AS lo,
             |                  max(o_orderkey)//2 AS hi FROM orders)
             |SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders, p WHERE o_orderkey NOT BETWEEN p.lo AND p.hi
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val root = deletedTable(s, d)
        prioAgg(TimeTravel.readAsOf(s, root, TimeTravel.currentVersion(root)))
          .orderBy("o_orderpriority")
      }),

    // Q173 OPTIMIZE + change-feed skip: after two appends, a compaction
    // (nodata commit), and a third append, the FULL leg proves the
    // compaction changed no rows, and the DELTA leg proves the change
    // feed over the whole range skips the compaction commit — it reads
    // the two real appends only, through files the compaction physically
    // retired (immutable data files keep backing the delta). Oracle
    // replays both predicates over the source table.
    Q("q173_log_compaction",
      Some("""SELECT 'delta' AS leg, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderkey % 3 <> 1 GROUP BY o_orderpriority
             |UNION ALL
             |SELECT 'full' AS leg, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY leg, o_orderpriority""".stripMargin),
      (s, d) => {
        val root = compactedTable(s, d)
        val full = prioAgg(TimeTravel.readAsOf(s, root, 3))
          .select(lit("full").as("leg"), col("o_orderpriority"), col("n"),
            col("total"))
        val delta = prioAgg(TimeTravel.readChangesSince(s, root, 0, 3))
          .select(lit("delta").as("leg"), col("o_orderpriority"), col("n"),
            col("total"))
        delta.unionAll(full).orderBy("leg", "o_orderpriority")
      }),

    // Q174 RESTORE: generation 2 rolls the table back to generation 0's
    // state as a new commit — the PRE leg reads the superseded gen 1
    // (history intact), the POST leg reads the restored latest, equal to
    // gen 0 by construction. Metadata-only: no data file is copied.
    Q("q174_log_restore",
      Some("""SELECT 'post' AS leg, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority
             |UNION ALL
             |SELECT 'pre' AS leg, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY leg, o_orderpriority""".stripMargin),
      (s, d) => {
        val root = restoredTable(s, d)
        val pre = prioAgg(TimeTravel.readAsOf(s, root, 1))
          .select(lit("pre").as("leg"), col("o_orderpriority"), col("n"),
            col("total"))
        val post = prioAgg(TimeTravel.readAsOf(s, root, 2))
          .select(lit("post").as("leg"), col("o_orderpriority"), col("n"),
            col("total"))
        post.unionAll(pre).orderBy("leg", "o_orderpriority")
      }),

    // Q175 bloom point lookup: the five smallest order keys are fetched
    // through the log's per-file blooms — only files whose filter claims
    // a key are opened (TimeTravelSpec asserts the scanned set; an absent
    // key opens zero files), the residual IN-filter keeps exactness.
    // Oracle: the same IN-subquery over the source table.
    Q("q175_log_bloom_lookup",
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
             |FROM orders
             |WHERE o_orderkey IN
             |  (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val root = bloomedTable(s, d)
        val keys = t(s, d, "orders").select("o_orderkey")
          .orderBy("o_orderkey").limit(5)
          .collect().map(_.getLong(0)).toSeq // declared 5-row lookup set
        TimeTravel.readAsOfKeys(s, root, TimeTravel.currentVersion(root),
          "o_orderkey", keys)
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
          .orderBy("o_orderkey")
      }),

    // Q176 STREAMING change feed (Delta's CDF as a DSv2 source): the
    // commit log consumed as a stream — offsets are GENERATIONS, each
    // micro-batch reads exactly the range's added files, the nodata
    // compaction in the fixture is skipped (its files are rewritten old
    // rows), and AvailableNow drains to the generation frozen at start.
    // Draining gens 0,1,3 of the q173 fixture = the whole orders table;
    // oracle = the batch aggregate (stream and batch must agree on a
    // fully-drained input). CdfSourceSpec proves per-generation batch
    // boundaries, admission control, restart resume, and the loud
    // remove-commit failure.
    Q("q176_stream_changes",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val root = compactedTable(s, d)
        val agg = s.readStream
          .format("graft.sources.cdf.CdfDataSource")
          .option("startingGen", -1)
          .load(root)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))
        val prev = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = agg.writeStream.format("memory").queryName("q176_sink")
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", prev)
        s.table("q176_sink").orderBy("o_orderpriority")
      })
  )
}

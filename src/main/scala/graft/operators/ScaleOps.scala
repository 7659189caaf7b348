package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-oriented physical patterns (SURVEY §4 posture, 100 TB design):
  * bucketed co-located joins and salted skew joins. The correctness of each
  * is oracle-checked (results equal the plain formulation); the *physical*
  * property (no shuffle / balanced partitions) is asserted in ScaleOpsSpec
  * against the executed plan.
  */
object ScaleOps extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val Buckets = 8

  private def publishedLayout(base: String, manifest: String)
      (build: String => Unit): String =
    graft.WorkDirs.publishedLayout(base, manifest)(build)

  /** Write both join sides bucketed+sorted by the join key, then join the
    * bucketed tables. Both sides expose identical hash-bucket partitioning,
    * so the sort-merge join runs with ZERO Exchange — at warehouse scale
    * this is the difference between joining 100 TB with and without moving
    * 100 TB over the network. Buckets land as external tables under /tmp
    * (testdata stays read-only). */
  def bucketedOrdersLineitem(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_buckets$tag"
    def ensure(name: String, df: DataFrame, key: String): DataFrame = {
      val tbl = s"graft_${name}_$tag"
      if (!s.catalog.tableExists(tbl)) {
        // The layout manifest pins (bucket count, key, schema) of the files
        // actually on disk. Re-registering is only safe when it matches the
        // CURRENT constants — a stale directory from an older build would
        // otherwise be declared CLUSTERED BY with the wrong metadata, Spark
        // would elide the exchanges, and the bucketed join would silently
        // return wrong rows. The files are built through a throwaway
        // EXTERNAL table bound to the staging dir (dropping it keeps the
        // files), then published atomically; the real table registers the
        // published generation — bucketing is a one-time ETL decision, not
        // per-query work, and a concurrent JVM never sees a half-written
        // bucket directory.
        val genPath = publishedLayout(s"$base/$name",
          s"$Buckets|$key|${df.schema.toDDL}") { stage =>
          val tmpTbl = s"${tbl}_stage_${System.nanoTime()}"
          df.write.mode("overwrite")
            .bucketBy(Buckets, key).sortBy(key)
            .option("path", stage)
            .saveAsTable(tmpTbl)
          s.sql(s"DROP TABLE $tmpTbl")
        }
        s.sql(s"""CREATE TABLE $tbl (${df.schema.toDDL}) USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO $Buckets BUCKETS
                 |LOCATION '$genPath'""".stripMargin)
      }
      s.table(tbl)
    }
    (ensure("orders", t(s, dir, "orders"), "o_orderkey"),
      ensure("lineitem", t(s, dir, "lineitem"), "l_orderkey"))
  }

  /** Orders written as year-partitioned parquet (the reference's
    * time-partitioned S3 layout, `transactions_mock_data.py:85-91`, at
    * warehouse granularity). Reads against this table prune whole year
    * directories — statically for literal predicates, dynamically (DPP)
    * when the filter arrives through a join. */
  def partitionedOrders(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val src = t(s, dir, "orders")
    val path = publishedLayout(s"/tmp/graft_part_orders$tag",
      s"o_year|${src.schema.toDDL}") { stage =>
      src.withColumn("o_year", year(col("o_orderdate")))
        .repartition(col("o_year"))
        .write.mode("overwrite").partitionBy("o_year").parquet(stage)
    }
    s.read.parquet(path)
  }

  /** Range-clustered, size-bounded parquet layout: rows range-partitioned
    * and sorted by `sortCol`, files capped at `maxRecordsPerFile`. The two
    * knobs a warehouse write needs at scale — bounded file sizes (no
    * small-files explosion, no 10 GB monoliths) and tight per-file min/max
    * statistics (sorted, non-overlapping key ranges ⇒ range predicates
    * prune whole files). Layout properties are asserted in ScaleOpsSpec;
    * built once per (sf, schema) behind a validated manifest. */
  def rangeClusteredLineitem(s: SparkSession, dir: String,
      maxRecordsPerFile: Int = 50000): DataFrame =
    s.read.parquet(rangeClusteredLayout(s, dir, maxRecordsPerFile))

  /** The published generation dir of the range-clustered layout — exposed
    * so the min/max index (q155) and ScaleOpsSpec audit the exact files
    * this JVM resolved, not a path a concurrent build may replace. */
  private[graft] def rangeClusteredLayout(s: SparkSession, dir: String,
      maxRecordsPerFile: Int = 50000): String = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val src = t(s, dir, "lineitem")
    publishedLayout(s"/tmp/graft_rangeclust_lineitem$tag",
      s"l_orderkey|$maxRecordsPerFile|${src.schema.toDDL}") { stage =>
      src.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .parquet(stage)
    }
  }

  /** 16-bit Morton (z-order) interleave of two keys — the multi-dimensional
    * clustering key behind q70b. Pure integer bit arithmetic (exact in both
    * engines): bit i of x lands at position 2i, bit i of y at 2i+1, so
    * sorting by z keeps rows close in BOTH dimensions at once — a range
    * box on (x, y) maps to a few z runs, i.e. a few files/row groups,
    * where a single-column sort (q70) can only prune on its one column. */
  def zorderExpr(xCol: String, yCol: String): String =
    s"""aggregate(sequence(0, 15), 0L, (acc, i) ->
       |  acc + shiftleft(shiftright(cast($xCol as bigint) % 65536, i) & 1, 2 * i)
       |      + shiftleft(shiftright(cast($yCol as bigint) % 65536, i) & 1, 2 * i + 1))""".stripMargin

  /** Lineitem laid out in z-order on (l_partkey, l_suppkey): the layout for
    * workloads that filter on two independent dimensions. Same bounded-file
    * write discipline (and manifest guard) as rangeClusteredLineitem; the
    * locality property — a 2-D box touches a small fraction of the files —
    * is asserted in ScaleOpsSpec. */
  def zorderedLineitem(s: SparkSession, dir: String,
      maxRecordsPerFile: Int = 50000): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val src = t(s, dir, "lineitem")
    val path = publishedLayout(s"/tmp/graft_zorder_lineitem$tag",
      s"z(l_partkey,l_suppkey)|$maxRecordsPerFile|${src.schema.toDDL}") { stage =>
      src.withColumn("zval", expr(zorderExpr("l_partkey", "l_suppkey")))
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .parquet(stage)
    }
    s.read.parquet(path)
  }

  /** q129: LAYOUT-PRESERVING compaction (r10 verdict #8) — q115 compacts
    * for file-size economics alone; a real OPTIMIZE must also preserve
    * the table's CLUSTERING, or every compaction erodes the pruning the
    * layout was built for. The fixture reproduces how a clustered table
    * actually degrades in production: the z-ordered base (q70b's Morton
    * layout) is written fragmented (small size-capped files), then an
    * UNSORTED delta lands as a plain append — the shape every
    * incremental ingest leaves, and one whose single delta file overlaps
    * EVERY z range (a 2-D box must now touch it regardless of the box).
    * The OPTIMIZE pass rewrites the union in ONE range-sort on the
    * Morton key: `repartitionByRange(target, zval)` + in-partition sort,
    * target derived from filesystem METADATA (bytes / 8 MiB, floored at
    * 4 for minimum scan parallelism) — so the compacted copy is both
    * size-targeted AND z-clustered again. Content preservation is
    * hash-checked (the q70b box aggregate vs the plain table); the
    * restored locality and the file-count economics are asserted in
    * ScaleOpsSpec. At 100 TB this is the nightly table-maintenance job:
    * one shuffle of the compacted slice, clustering invariant kept, no
    * driver-side data motion. */
  def zorderCompaction(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${zorderCompactionRoot(s, dir)}/compacted")

  /** The published generation root (holds `data/` + `compacted/`) —
    * exposed for ScaleOpsSpec's before/after layout audit. */
  private[graft] def zorderCompactionRoot(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val src = t(s, dir, "lineitem")
    publishedLayout(s"/tmp/graft_zcompact$tag",
      s"v1|zc(l_partkey,l_suppkey)|${src.schema.toDDL}") { root =>
      val withZ = src.withColumn("zval", expr(zorderExpr("l_partkey", "l_suppkey")))
      // the degraded state: clustered-but-fragmented base + unsorted delta
      withZ.filter(pmod(col("l_orderkey"), lit(8)) =!= 0)
        .repartitionByRange(16, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1000)
        .parquet(s"$root/data")
      withZ.filter(pmod(col("l_orderkey"), lit(8)) === 0)
        .coalesce(1)
        .write.mode("append").parquet(s"$root/data")
      // OPTIMIZE: metadata-derived size target, one clustering-preserving
      // range-sort rewrite
      val bytes = new java.io.File(s"$root/data").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val target = math.max(4L, (bytes + (8L << 20) - 1) / (8L << 20)).toInt
      s.read.parquet(s"$root/data")
        .repartitionByRange(target, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(s"$root/compacted")
    }
  }

  /** q149's engine (see the query comment): base-MV + fact-delta staged
    * once per (sf, schema) behind a manifest; the per-run plan reads ONLY
    * those two layouts. Exposed for ScaleOpsSpec's scan-path assertion. */
  def incrementalJoinView(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val orders = t(s, dir, "orders")
    val root = publishedLayout(s"/tmp/graft_mv$tag",
      s"v1|mv(seg)|${orders.schema.toDDL}") { stage =>
      val isDelta = pmod(abs(hash(col("o_orderkey"))), lit(10)) === 0
      orders.filter(!isDelta)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .write.mode("overwrite").parquet(s"$stage/base_mv")
      orders.filter(isDelta)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$stage/delta")
    }
    val baseMv = s.read.parquet(s"$root/base_mv")
    val deltaMv = s.read.parquet(s"$root/delta")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    baseMv.select(col("c_mktsegment"), col("n"), col("rev"))
      .unionByName(deltaMv)
      .groupBy("c_mktsegment")
      .agg(sum("n").as("n"), sum("rev").cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** q155's engine. Builds (once, manifest-validated) a per-file
    * (min, max) l_orderkey index over the range-clustered lineitem
    * layout — computed WITH Spark (group by `_metadata.file_path`), but
    * stored as plain JSON any planner could consult — then serves reads
    * by intersecting the predicate with the index and loading only the
    * matching files. Returns the pruned frame, filtered (the manifest
    * admits whole files; row-level filtering still applies). Also
    * exposes the (selected, total) file counts for the spec. */
  def manifestPrunedRead(s: SparkSession, dir: String,
      lo: Long, hi: Long): DataFrame = {
    val (paths, _, _) = manifestSelect(s, dir, lo, hi)
    if (paths.isEmpty) {
      // A predicate range intersecting no files is a normal outcome of
      // manifest pruning, not an error: answer with an empty frame of the
      // layout's schema instead of handing parquet() an empty path list
      // (which throws "unable to infer schema") — ADVICE r11.
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        rangeClusteredLineitem(s, dir).schema)
    } else
      s.read.parquet(paths: _*)
        .filter(col("l_orderkey").between(lo, hi))
  }

  private[graft] def manifestSelect(s: SparkSession, dir: String,
      lo: Long, hi: Long): (Seq[String], Int, Int) = {
    val layout = rangeClusteredLayout(s, dir) // ensures the layout exists
    val idxPath = java.nio.file.Paths.get(s"$layout/_graft_minmax_index")
    if (!java.nio.file.Files.exists(idxPath)) {
      val perFile = s.read.parquet(layout)
        .select(col("_metadata.file_path").as("f"), col("l_orderkey"))
        .groupBy("f")
        .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
        .collect() // one row per FILE — metadata-sized, not data-sized
      val json = perFile.map(r =>
        s"""{"file":"${r.getString(0)}","lo":${r.getLong(1)},"hi":${r.getLong(2)}}""")
        .mkString("[", ",", "]")
      // Write-temp + atomic rename: the published generation dir is shared
      // across JVMs, so the index must appear complete or not at all. A
      // racing JVM computes the same (file → min/max) content, so
      // whichever rename lands last is equally valid.
      val tmp = java.nio.file.Paths.get(
        s"$layout/.idx-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, idxPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val entries = new String(java.nio.file.Files.readAllBytes(idxPath), "UTF-8")
    // tiny hand parse of the [{"file":…,"lo":…,"hi":…}] shape we wrote
    val Entry = """\{"file":"([^"]+)","lo":(\d+),"hi":(\d+)\}""".r
    val all = Entry.findAllMatchIn(entries)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
    val hit = all.filter { case (_, flo, fhi) => flo <= hi && lo <= fhi }
    (hit.map(_._1.stripPrefix("file://").stripPrefix("file:")),
      hit.size, all.size)
  }

  /** q152's scoped-conf runner: enables runtime Bloom-filter injection,
    * drops its size floors to fixture scale, disables auto-broadcast
    * (injection targets SHUFFLE joins), materializes the frame inside the
    * scope, and returns (rows, executedPlan) — the plan so ScaleOpsSpec
    * can assert the bloom probe landed. Every conf is restored. */
  def runtimeBloomScope(s: SparkSession)(df: => DataFrame)
      : (Seq[org.apache.spark.sql.Row], String) = {
    val knobs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = knobs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      knobs.foreach { case (k, v) => s.conf.set(k, v) }
      val frame = df
      val rows = frame.collect().toSeq
      (rows, frame.queryExecution.executedPlan.toString)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Salted skew join: dim side replicated `salt` times, fact side assigned
    * a deterministic salt from its PK, join on (key, salt). Spreads a hot
    * key across `salt` reducers; result is row-identical to the plain join.
    * (AQE's skew-join split handles sort-merge skew automatically; explicit
    * salting is the portable form that also covers hash aggregation and
    * older planners.) */
  def saltedJoin(fact: DataFrame, factKey: String, saltSource: String,
      dim: DataFrame, dimKey: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salt)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
    saltedFact.join(saltedDim,
        col(factKey) === col(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** The 2-D box aggregate over the Morton layout — shared verbatim by
    * q70b (clustered write) and q129 (clustering-preserving compaction):
    * both paths must return exactly the plain table's answer, stored z
    * keys included. */
  private val zBoxDuckSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  CAST(sum((SELECT sum((((l_partkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i))
      |                  + (((l_suppkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i + 1)))
      |            FROM range(0, 16) t(i))) AS BIGINT) AS z_sum
      |FROM lineitem
      |WHERE l_partkey BETWEEN 1 AND 50 AND l_suppkey BETWEEN 1 AND 3""".stripMargin

  val qs: Seq[Q] = Seq(

    // Q63 skew profile: the heavy-hitter diagnostic that decides WHETHER a
    // key needs salting (q37) or AQE skew splitting before a join — top
    // fact keys by row count with their share of the table. One partial-
    // aggregated groupBy + a broadcast scalar; the share is an exact
    // integer ratio (bit-stable double).
    Q("q63_skew_profile",
      Some("""WITH tot AS (SELECT count(*) AS n_tot FROM events)
             |SELECT user_id, count(*) AS n,
             |  CAST(count(*) AS DOUBLE) / (SELECT n_tot FROM tot) AS share
             |FROM events GROUP BY user_id
             |ORDER BY n DESC, user_id LIMIT 20""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val tot = ev.agg(count(lit(1)).as("n_tot"))
        ev.groupBy("user_id").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("user_id"), col("n"),
            (col("n").cast("double") / col("n_tot")).as("share"))
          .orderBy(desc("n"), asc("user_id"))
          .limit(20)
      }),

    // Q132 heavy hitters via a Misra–Gries sketch (functions/
    // MisraGriesAggregator.scala) — q63's "what are the hot keys" answered
    // with O(c) state instead of a full-cardinality groupBy shuffle. The
    // fixture's keys are uniform (no key exceeds any useful threshold), so
    // the stream is a DETERMINISTIC skew construction both engines replay
    // exactly — 90% of rows collapse onto two hot keys, the rest spread
    // over the part-key space (the same technique the AQE skew spec uses).
    // Two passes, both scale-shaped: (1) the typed aggregate runs with
    // map-side combine — each partition ships one ≤64-entry map, never raw
    // keys — and its ≤64 candidates come to the driver (the one structural
    // O(c) action, the sketch→broadcast-literal pattern); (2) candidates
    // are re-counted EXACTLY, with the isin filter pruning the shuffle to
    // candidate keys only, and thresholded at n/(c+1) — the bound MG
    // guarantees no true heavy hitter can hide under. Output is therefore
    // exact (sketch finds, recount proves) and hash-stable; the superset
    // guarantee + merge error bound are property-tested in ScaleOpsSpec.
    Q("q132_heavy_hitters",
      Some("""WITH st AS (SELECT CASE WHEN l_orderkey % 10 < 9
             |              THEN 'hot-' || CAST(l_orderkey % 2 AS VARCHAR)
             |              ELSE 'cold-' || CAST(l_partkey AS VARCHAR) END AS item
             |            FROM lineitem),
             |tot AS (SELECT count(*) AS n FROM st)
             |SELECT item, CAST(count(*) AS BIGINT) AS n_occurs
             |FROM st GROUP BY item
             |HAVING count(*) * 65 > (SELECT n FROM tot)
             |ORDER BY item""".stripMargin),
      (s, d) => {
        import s.implicits._
        val c = 64
        val st = t(s, d, "lineitem").select(
          when(col("l_orderkey") % 10 < 9,
            concat(lit("hot-"), (col("l_orderkey") % 2).cast("string")))
            .otherwise(concat(lit("cold-"), col("l_partkey").cast("string")))
            .as("item"))
        val mg = new graft.functions.MisraGriesAggregator(c)
        val candKeys = st.as[String].select(mg.toColumn).head().keys.toSeq
        val tot = st.agg(count(lit(1)).as("n"))
        st.filter(col("item").isin(candKeys: _*))
          .groupBy("item").agg(count(lit(1)).as("n_occurs"))
          .crossJoin(broadcast(tot))
          .filter(col("n_occurs") * (c + 1) > col("n"))
          .select(col("item"), col("n_occurs"))
          .orderBy("item")
      }),

    // Q36 bucketed co-located join — same answer as the shuffle join (the
    // oracle is the plain SQL join); ScaleOpsSpec asserts the plan contains
    // no Exchange.
    Q("q36_bucketed_join",
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber, l_partkey, o_totalprice""".stripMargin),
      (s, d) => {
        val (orders, lineitem) = bucketedOrdersLineitem(s, d)
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_linenumber", "l_partkey", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "o_totalprice")
      }),

    // Q38 partition-pruned join: the year filter reaches the fact scan as
    // a partition filter (static pruning for the literal; DPP wiring is
    // plan-asserted in ScaleOpsSpec for the join-derived case).
    Q("q38_partition_pruned_join",
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE c_nationkey = 1 AND year(o_orderdate) BETWEEN 1996 AND 1998
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => partitionedOrders(s, d)
        .filter(col("o_year").between(1996, 1998))
        .join(broadcast(t(s, d, "customer").filter(col("c_nationkey") === 1)
          .select("c_custkey")), col("o_custkey") === col("c_custkey"))
        .groupBy("o_year")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .orderBy("o_year")),

    // Q138 file provenance via metadata columns: every row of the
    // year-partitioned warehouse table is audited against the FILE it
    // physically came from (`_metadata.file_path` — the hidden per-row
    // provenance any file source exposes; the lineage hook a 100 TB
    // incident review reaches for first: "which landed file produced
    // this row?"). The audit cross-checks the partition-directory
    // encoding against the column value — n_consistent must equal
    // n_rows, which the oracle asserts by construction (count twice),
    // so a mis-partitioned write would hash-mismatch. Map-only over the
    // scan + one partial-aggregated groupBy.
    Q("q138_file_provenance",
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_consistent
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => partitionedOrders(s, d)
        .select(col("o_year"), col("_metadata.file_path").as("fp"))
        .groupBy("o_year")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(regexp_extract(col("fp"), "o_year=([0-9]+)", 1)
              === col("o_year").cast("string"), 1L).otherwise(0L))
            .as("n_consistent"))
        .orderBy("o_year")),

    // Q140 in-flight metrics via Dataset.observe — production pipelines
    // instrument the pass they already run instead of paying a second
    // scan for data-quality counters. A CollectMetrics node rides the
    // orders scan (row count, exact decimal total, non-positive-price
    // violations) while the query itself computes something else (the
    // per-priority rollup); after the single action, the observed map is
    // read off the EXECUTED plan and surfaced as the declared 1-row
    // result. At 100 TB the counters are map-side accumulators — zero
    // extra I/O, zero extra shuffle. The oracle recomputes the same
    // three aggregates directly; equality proves the piggybacked metrics
    // saw every row of the pass exactly once.
    Q("q140_observe_metrics",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos
             |FROM orders""".stripMargin),
      (s, d) => {
        import s.implicits._
        val observed = t(s, d, "orders").observe("q140_metrics",
          count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_nonpos"))
        // the "real" work of the pass — the metrics piggyback on it
        val work = observed.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
        work.collect() // the one action; fires the CollectMetrics node
        val m = work.queryExecution.observedMetrics("q140_metrics")
        Seq((m.getAs[Long]("n_rows"), m.getAs[Double]("total"),
          m.getAs[Long]("n_nonpos")))
          .toDF("n_rows", "total", "n_nonpos")
      }),

    // Q70 range-clustered layout round-trip: a range predicate over the
    // clustered copy must return exactly what the original table returns —
    // the layout changes file boundaries and statistics, never rows. The
    // pruning effect (files outside [200, 900] skipped via min/max stats)
    // and the file-size bound are asserted in ScaleOpsSpec.
    Q("q70_range_layout",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem WHERE l_orderkey BETWEEN 200 AND 900
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => rangeClusteredLineitem(s, d)
        .filter(col("l_orderkey").between(200, 900))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag")),

    // Q70b z-ordered layout: a 2-D box filter over the Morton-clustered
    // copy must return exactly what the plain table returns — including
    // the z keys themselves (z_sum hash-verifies the interleave arithmetic
    // row-for-row against the oracle's bit-identical SQL). The physical
    // payoff (the box lives in a small fraction of the files) is asserted
    // in ScaleOpsSpec.
    Q("q70b_zorder_layout",
      Some(zBoxDuckSql),
      (s, d) => zorderedLineitem(s, d)
        .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 3))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
          sum(col("zval")).as("z_sum"))),

    // Q129 layout-preserving compaction (see zorderCompaction): the
    // fragmented + delta-degraded z-layout is OPTIMIZEd by one
    // metadata-sized range-sort rewrite on the Morton key, so file-size
    // economics AND the 2-D pruning property survive the same pass —
    // where q115 proves content-preserving compaction alone. Oracle =
    // q70b's box aggregate VERBATIM over the plain table: the degraded
    // copy, the rewrite, and the clustered read-back must lose nothing,
    // including the stored z keys (z_sum hash-verifies them row-for-row).
    // Locality restoration + file economics asserted in ScaleOpsSpec.
    Q("q129_zorder_compaction",
      Some(zBoxDuckSql),
      (s, d) => zorderCompaction(s, d)
        .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 3))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
          sum(col("zval")).as("z_sum"))),

    // Q89 Bloom-filter pre-join pruning — the runtime-filter pattern behind
    // Spark's own InjectRuntimeFilter, built explicitly so its economics are
    // on the record: a filtered dim (the reference's enrichment join's small
    // side, transactions_mock_data.py:17) is folded into a bitmap of 63-bit
    // words (the sign bit is never set, so word values stay positive on
    // both engines) sized from the measured dim cardinality (load ≤ 0.5 —
    // never saturates at a bigger SF), which is broadcast to the fact side. Probe keys hit d=3 md5-derived positions; only candidates
    // (all bits set) reach the exact join. At 100 TB the fact scan sheds
    // non-matching rows against 1 KB of broadcast state — no shuffle of the
    // big side at all until the (already pruned) exact confirm. The bitmap
    // build is a partial-agg shuffle of (word_idx, mask) pairs, bounded by
    // the DIM cardinality. Output: the filter's measured economics (bits
    // set, candidates, false positives, fact rows pruned) — deterministic
    // because the hash family is md5-derived, so the oracle replays every
    // bit. Hamming guarantee (no false negatives) is implied by
    // n_rows_pass ≤ n_probe - pruned and asserted in ScaleOpsSpec.
    Q("q89_bloom_join",
      Some {
        def h(i: Int, k: String) =
          s"CAST(concat('0x', substring(md5('bloom:$i:' || CAST($k AS VARCHAR)), 1, 15)) AS BIGINT) % m"
        s"""WITH build AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
           |params AS (SELECT 63 * GREATEST(128, (6 * count(*) + 62) // 63) AS m FROM build),
           |bpos AS (SELECT k, unnest([${h(0, "k")}, ${h(1, "k")}, ${h(2, "k")}]) AS pos FROM build, params),
           |words AS (SELECT pos // 63 AS widx, bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS w
           |          FROM bpos GROUP BY 1),
           |probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
           |ppos AS (SELECT k, unnest([${h(0, "k")}, ${h(1, "k")}, ${h(2, "k")}]) AS pos FROM probe, params),
           |hits AS (SELECT p.k,
           |           CASE WHEN w.w IS NOT NULL AND (w.w & (1::BIGINT << CAST(p.pos % 63 AS INT))) != 0
           |                THEN 1 ELSE 0 END AS hit
           |         FROM ppos p LEFT JOIN words w ON p.pos // 63 = w.widx),
           |cand AS (SELECT k FROM hits GROUP BY k HAVING sum(hit) = 3)
           |SELECT CAST((SELECT count(*) FROM build) AS BIGINT) AS n_build_keys,
           |       CAST((SELECT sum(bit_count(w)) FROM words) AS BIGINT) AS bits_set,
           |       CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_probe_keys,
           |       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand_keys,
           |       CAST((SELECT count(*) FROM cand WHERE k NOT IN (SELECT k FROM build)) AS BIGINT) AS n_false_pos,
           |       CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM cand)) AS BIGINT) AS n_rows_pruned,
           |       CAST((SELECT count(*) FROM orders WHERE o_custkey IN (SELECT k FROM build)) AS BIGINT) AS n_rows_pass""".stripMargin
      },
      (s, d) => {
        val bitsPerWord = 63
        val D = 3
        val build = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k")).distinct().cache()
        // Size the bitmap from the measured build cardinality (load ≤ 0.5
        // at d=3) so the filter never saturates at a bigger SF — the one
        // eager action here is a count over the already-cached dim keys.
        // The bitmap grows with the DIM only (~2 bits/key), orders below
        // the dim row width itself, so the broadcast stays cheap.
        val nb = build.count()
        val m = bitsPerWord * math.max(128L, (6 * nb + 62) / 63)
        def posExprs(key: String) = (0 until D).map(i => expr(
          s"cast(conv(substring(md5(concat('bloom:$i:', cast($key as string))), 1, 15), 16, 10) as bigint) % $m"))
        val maskExpr = // mask for this position's bit inside its word
          s"shiftleft(cast(1 as bigint), cast(pos % $bitsPerWord as int))"
        val words = build
          .select(explode(array(posExprs("k"): _*)).as("pos"))
          .groupBy(expr(s"pos div $bitsPerWord").as("widx"))
          .agg(expr(s"bit_or($maskExpr)").as("w"))
          .cache() // m/63 words — dim-bounded, tiny vs the fact side
        val probe = t(s, d, "orders")
          .select(col("o_custkey").as("k")).distinct().cache()
        val hits = probe
          .select(col("k"), explode(array(posExprs("k"): _*)).as("pos"))
          .join(broadcast(words), expr(s"pos div $bitsPerWord") === col("widx"), "left")
          .select(col("k"),
            when(col("w").isNotNull && expr(s"(w & $maskExpr) != 0"), 1L)
              .otherwise(0L).as("hit"))
        val cand = hits.groupBy("k").agg(sum("hit").as("nh"))
          .filter(col("nh") === D).select("k").cache()
        val orders = t(s, d, "orders")
        build.agg(count(lit(1)).as("n_build_keys"))
          .crossJoin(words.agg(sum(expr("cast(bit_count(w) as bigint)")).as("bits_set")))
          .crossJoin(probe.agg(count(lit(1)).as("n_probe_keys")))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand_keys")))
          .crossJoin(cand.join(build, Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_false_pos")))
          .crossJoin(orders.join(cand, orders("o_custkey") === cand("k"), "left_anti")
            .agg(count(lit(1)).as("n_rows_pruned")))
          .crossJoin(orders.join(build, orders("o_custkey") === build("k"), "left_semi")
            .agg(count(lit(1)).as("n_rows_pass")))
      }),

    // Q131 grid-bucketed interval-overlap join — the scalable form of the
    // interval self-join ("which shipments of the same supplier were in
    // flight at the same time"). The naive formulation is an equi+theta
    // join whose inequality part forces a per-supplier nested loop; at 100
    // TB that is quadratic in the hot supplier. Instead each interval
    // [ship, receipt] is exploded onto a coarse day grid (cell = day div
    // 32 — ~2-3 cells per interval at the fixture's ≤ ~60-day spans) and
    // pairs meet inside their (suppkey, cell) grid group.
    // A pair overlapping k shared cells would be counted k times; the
    // standard dedup-free trick assigns each pair to the ONE cell that
    // contains max(start_a, start_b) — overlap guarantees both intervals
    // cover that cell, so each overlapping pair is counted exactly once
    // and no DISTINCT (second shuffle of the pair stream) is needed.
    // Pair identity is the (orderkey*8+linenumber) rowid (linenumber ≤ 7);
    // a.id < b.id kills self- and mirror-pairs. The fixture carries no
    // receipt date, so the in-flight window is synthesized as ship +
    // 1..30 days of exact integer arithmetic — identical on both engines.
    //
    // r20 (guide §2.3/§2.4): pair generation moved from the equi-SELF-JOIN
    // on (suppkey, cell) to IN-GROUP counting — ONE shuffle of the
    // exploded cells into groupBy(suppkey, cell) + collect_list, then the
    // overlap count is folded per group with size(filter(...)) higher-
    // order expressions (codegen'd, no pair array ever materialized; the
    // q110 in-row discipline). The join form shuffled the same exploded
    // rows TWICE and at fixture-scale estimates planned a broadcast of
    // the whole exploded fact side (890k rows / 112 MB HashedRelation —
    // plans/r20/q131_grid_interval_join_before.txt); measured 4.77 s →
    // 0.34 s isolated at sf0.1/32c. Per-task memory is O(group), the same
    // bound the join's per-partition hash build had: grid-cell coarseness
    // bounds the group, and a hot (supplier, cell) costs O(n²) CPU in
    // either formulation (the pair set IS quadratic) with no O(n²)
    // buffering here — counts fold as they stream.
    // The oracle replays the plain equi+theta join; ScaleOpsSpec asserts
    // grid ≡ theta and no nested-loop product in the plan.
    Q("q131_grid_interval_join",
      Some("""WITH iv AS (
             |  SELECT l_suppkey AS suppkey,
             |         l_orderkey * 8 + l_linenumber AS id,
             |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS sd,
             |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
             |           + (l_orderkey * 7 + l_linenumber) % 30 + 1 AS ed
             |  FROM lineitem)
             |SELECT a.suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n_overlaps
             |FROM iv a JOIN iv b ON a.suppkey = b.suppkey AND a.id < b.id
             | AND a.sd <= b.ed AND b.sd <= a.ed
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val g = 32 // days per grid cell
        val li = t(s, d, "lineitem").select(
          col("l_suppkey").as("suppkey"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
          expr("cast(unix_date(cast(l_shipdate as date)) as bigint)").as("sd"),
          expr("cast((l_orderkey * 7 + l_linenumber) % 30 + 1 as bigint)").as("w"))
          .select(col("suppkey"), col("id"), col("sd"),
            (col("sd") + col("w")).as("ed"))
        val cells = li.withColumn("cell",
          explode(expr(s"sequence(sd div $g, ed div $g)")))
        cells
          .groupBy("suppkey", "cell")
          .agg(collect_list(struct(col("id"), col("sd"), col("ed"))).as("xs"))
          .select(col("suppkey"),
            expr(s"""aggregate(
                    |  transform(xs, x -> cast(size(
                    |    filter(xs, y ->
                    |      x.id < y.id AND x.sd <= y.ed AND y.sd <= x.ed AND
                    |      cell = greatest(x.sd, y.sd) div $g)) as bigint)),
                    |  0L, (acc, c) -> acc + c)""".stripMargin).as("c"))
          .groupBy("suppkey")
          .agg(sum("c").as("n_overlaps"))
          .orderBy("suppkey")
      }),

    // Q142 dynamic partition overwrite — the surgical backfill every
    // partitioned warehouse needs: restate ONE partition (here: 1995's
    // prices doubled by a correction job) without rewriting or even
    // touching the other years. Under
    // spark.sql.sources.partitionOverwriteMode=dynamic, an overwrite
    // write replaces exactly the partitions present in the incoming
    // frame — static mode would truncate the whole table, the classic
    // production data-loss foot-gun this mode exists to close. The conf
    // flip is scoped and restored in a finally (the q11b discipline);
    // ScaleOpsSpec asserts the untouched years kept their physical files
    // byte-for-byte. The oracle replays the restatement arithmetically
    // over the original table.
    Q("q142_dynamic_partition_overwrite",
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN year(o_orderdate) = 1995
             |       THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
             |       ELSE CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        // Cached per (query, sf): the writes below are overwrite-idempotent,
        // so re-invocations reuse one dir + one shutdown hook (ADVICE r11).
        val root = graft.WorkDirs.cached("graft_dynpo_", s"q142:$d")
        val path = s"$root/orders_by_year"
        val src = t(s, d, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
        src.repartition(col("o_year"))
          .write.partitionBy("o_year").mode("overwrite").parquet(path)
        val restated = src.filter(col("o_year") === 1995)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        try {
          s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          restated.repartition(col("o_year"))
            .write.partitionBy("o_year").mode("overwrite").parquet(path)
        } finally prev match {
          case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        s.read.parquet(path)
          .groupBy(col("o_year").cast("int").as("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_year")
      }),

    // Q148 REBALANCE hint — the AQE knob that fixes BOTH small-file and
    // skewed-file writes in one line: unlike REPARTITION(n) (fixed
    // width, skew-blind) or COALESCE (no splitting), REBALANCE lets AQE
    // size post-shuffle partitions to the configured advisory bytes,
    // splitting hot key groups and merging slivers — the standard
    // pre-write shuffle of a 100 TB table job. The declared result is
    // the (rebalance-invariant) per-priority rollup; ScaleOpsSpec
    // asserts the hint survives into the optimized plan as a
    // RebalancePartitions node.
    Q("q148_rebalance_hint",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT /*+ REBALANCE(o_orderpriority) */
                |  o_orderpriority, o_totalprice FROM orders""".stripMargin)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_orderpriority")
      }),

    // Q155 EXTERNAL min/max manifest + file skipping — the table-format
    // statistics index (what Delta/Iceberg keep in their metadata layer)
    // as a library operator over plain parquet: one pass groups the
    // range-clustered layout BY SOURCE FILE (`_metadata.file_path` — the
    // q138 provenance column) into a per-file (min, max) manifest JSON;
    // the reader consults the MANIFEST FIRST and hands Spark only the
    // files whose range intersects the predicate — the scan's file list
    // is pruned before Spark ever opens a footer, which at 100 TB is the
    // difference between listing/footer-reading a million files and a
    // handful (parquet row-group stats prune pages, but only AFTER the
    // footer read; a manifest prunes the file set itself). The manifest
    // is built once per layout behind the usual validation; ScaleOpsSpec
    // asserts the pruned read touches a strict subset of the files while
    // the oracle (plain filtered aggregate) proves it loses no rows.
    Q("q155_manifest_pruning",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem WHERE l_orderkey BETWEEN 400 AND 1200
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => manifestPrunedRead(s, d, 400L, 1200L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag")),

    // Q152 NATIVE runtime Bloom-filter join (InjectRuntimeFilter) — the
    // optimizer-owned counterpart of q89's hand-built filter: with the
    // bloomFilter rule enabled, Spark itself derives a Bloom filter from
    // the SELECTIVE dim side (machinery segment, ~1/5 of customers) and
    // pushes a might_contain probe into the fact scan leg of the shuffle
    // join, shedding non-matching fact rows before the exchange. At
    // fixture scale the rule's size thresholds would veto it (fact ≪ the
    // 10 GB application floor) and auto-broadcast would bypass the
    // shuffle join entirely, so both are scoped down for the run
    // (restored in a finally — the q11b discipline) and the result is
    // materialized inside the scope (the q145 pattern: injection happens
    // at execution). ScaleOpsSpec asserts the bloom probe really lands
    // in the executed plan; the oracle is the plain join aggregate —
    // runtime filtering must never change results.
    Q("q152_runtime_bloom_join",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'MACHINERY'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import s.implicits._
        val rows = runtimeBloomScope(s) {
          t(s, d, "orders")
            .join(t(s, d, "customer")
              .filter(col("c_mktsegment") === "MACHINERY")
              .select("c_custkey"),
              col("o_custkey") === col("c_custkey"))
            .groupBy("o_orderpriority")
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
            .orderBy("o_orderpriority")
        }._1
        rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toDF("o_orderpriority", "n", "total")
      }),

    // Q149 incremental materialized-view maintenance over a JOIN — the
    // nightly-MV economics at 100 TB: the standing view (orders ⋈
    // customer rolled up by segment) is NOT recomputed when a fact delta
    // lands; only Δorders joins the dimension, and the per-segment
    // partial merges into the stored MV by exact DECIMAL addition
    // (insert-only delta propagation: Δ(A⋈B agg) = ΔA⋈B agg ⊕ MV). The
    // base MV and the delta are materialized ONCE per (sf, schema) under
    // a manifest — each run's plan reads the tiny MV parquet plus the
    // delta parquet and NEVER the base fact (ScaleOpsSpec asserts the
    // scan paths). Oracle = the full recompute, proving the incremental
    // merge loses nothing.
    Q("q149_incremental_join_view",
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => incrementalJoinView(s, d)),

    // Q37 salted skew join — row-identical to the plain broadcast join.
    Q("q37_salted_skew_join",
      Some("""SELECT e.event_id, c.c_mktsegment FROM events e
             |JOIN customer c ON e.user_id = c.c_custkey
             |ORDER BY e.event_id""".stripMargin),
      (s, d) => saltedJoin(
          t(s, d, "events"), "user_id", "event_id",
          t(s, d, "customer").select("c_custkey", "c_mktsegment"), "c_custkey",
          salt = 8)
        .select("event_id", "c_mktsegment")
        .orderBy("event_id"))
  )
}

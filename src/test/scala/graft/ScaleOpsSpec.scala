package graft

import graft.operators.{ScaleOps, Similarity}
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale patterns: bucketed joins must not
  * shuffle; salted joins must match their plain equivalent row-for-row;
  * IVF recall must beat random. */
class ScaleOpsSpec extends SparkSpec {

  test("bucketed join plan contains no shuffle exchange") {
    // At test scale the planner prefers a broadcast join, which hides the
    // bucketing; disable auto-broadcast to expose the co-located SMJ path
    // a 100 TB fact⋈fact join would take.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (orders, lineitem) = ScaleOps.bucketedOrdersLineitem(spark, sf)
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_totalprice")
      joined.count() // force AQE final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle, got:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan should read bucketed layout, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q115 compaction collapses the fragmented landing zone") {
    // Run the declared query (it performs the write→compact→read cycle),
    // then audit the file layout it left behind.
    SparkEntry.queries("q115_compaction")(spark, sf).collect()
    // Audit ONLY the dir this run used (SourceFormats.workDirFor) — a
    // tmpdir-wide graft_src_* scan could match a stale dir from a killed
    // JVM or a concurrent test JVM (ADVICE r10).
    val base = graft.sources.SourceFormats.workDirFor(s"q115:$sf")
    assert(base.nonEmpty, "q115 work dir not registered in this JVM")
    val dir = new java.io.File(base.get, "compacted")
    assert(dir.exists(), s"compacted output dir not found under ${base.get}")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.length <= 4,
      s"expected <=4 compacted files, got ${files.length} in $dir")
    val small = new java.io.File(base.get, "small")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(small == 64, s"landing zone should have 64 shards, got $small")
  }

  test("bucketed join equals plain shuffle join") {
    val bucketed = SparkEntry.queries("q36_bucketed_join")(spark, sf)
    val plain = SparkEntry.queries("q04_join_shuffle")(spark, sf)
    assert(bucketed.collect().toSeq == plain.collect().toSeq)
  }

  test("salted skew join equals plain join") {
    val salted = SparkEntry.queries("q37_salted_skew_join")(spark, sf)
    val plain = Tables.table(spark, sf, "events")
      .join(Tables.table(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .select("event_id", "c_mktsegment")
      .orderBy("event_id")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join spreads each key across salt partitions on the fact side") {
    val fact = Tables.table(spark, sf, "events")
    val salts = fact
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(8)).cast("int"))
      .groupBy("user_id")
      .agg(countDistinct(col("__salt")).as("n_salts"), count(lit(1)).as("n"))
      .filter(col("n") >= 16) // hot keys
    val underSpread = salts.filter(col("n_salts") < 4).count()
    assert(underSpread == 0, "a hot key stayed concentrated in <4 salt buckets")
  }

  test("partitioned fact scan prunes year directories (static + DPP)") {
    val po = ScaleOps.partitionedOrders(spark, sf)
    // static pruning: literal year predicate must land in PartitionFilters
    val static = po.filter(col("o_year") === 1997).select("o_orderkey")
    val staticPlan = static.queryExecution.executedPlan.toString
    assert(staticPlan.contains("PartitionFilters") && staticPlan.contains("o_year"),
      s"static partition filter missing:\n$staticPlan")
    // dynamic pruning: the canonical DPP shape — join on the partition
    // column with a selective FILTER on the build side (DPP only
    // considers filtered build sides; a bare distinct/limit doesn't
    // qualify as prunable evidence).
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val years = Tables.table(spark, sf, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_orderpriority"))
        .distinct()
        .filter(col("o_orderpriority") === "1-URGENT" && col("y") <= 1997)
      val dpp = po.join(years, col("o_year") === col("y"))
        .select("o_orderkey", "y")
      dpp.count()
      val dppPlan = dpp.queryExecution.executedPlan.toString
      assert(dppPlan.contains("dynamicpruning"),
        s"expected dynamic partition pruning in:\n$dppPlan")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
  }

  test("range-clustered layout: bounded file sizes, non-overlapping key ranges, pruned scan") {
    val maxRows = 2000
    val df = operators.ScaleOps.rangeClusteredLineitem(spark, sf, maxRows)
    val files = new java.io.File(
      operators.ScaleOps.rangeClusteredLayout(spark, sf, maxRows))
      .listFiles().filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= 2, s"expected a multi-file layout, got ${files.length}")
    // Size bound: maxRecordsPerFile caps every file.
    val stats = files.map { f =>
      val d = spark.read.parquet(f.getPath)
        .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")))
        .head()
      (d.getLong(0), d.getLong(1), d.getLong(2))
    }
    stats.foreach { case (n, _, _) =>
      assert(n <= maxRows, s"file exceeds maxRecordsPerFile: $n > $maxRows") }
    // Clustering: sorted by per-file min, each file's range must not reach
    // past the next file's start (equal boundaries allowed — one key value
    // can span a file split).
    val sorted = stats.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, aMax), (_, bMin, _)) =>
        assert(bMin >= aMax,
          s"overlapping file key ranges: max $aMax vs next min $bMin")
      case _ => ()
    }
    // Pruning: a narrow range predicate must read fewer rows than the table
    // holds (file/row-group skipping via min/max statistics).
    val pruned = df.filter(col("l_orderkey").between(200, 900))
    assert(pruned.count() > 0)
    val expected = Tables.table(spark, sf, "lineitem")
      .filter(col("l_orderkey").between(200, 900)).count()
    assert(pruned.count() == expected)
  }

  test("z-ordered layout confines a 2-D box filter to a fraction of the files") {
    import org.apache.spark.sql.functions._
    // Morton clustering means a box on BOTH dimensions maps to few z runs
    // → few files; a single-column sort could only localize one dimension.
    val df = operators.ScaleOps.zorderedLineitem(spark, sf)
    val total = df.select(input_file_name()).distinct().count()
    val touched = df
      .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 3))
      .select(input_file_name()).distinct().count()
    assert(total >= 4, s"layout produced only $total files")
    assert(touched > 0 && touched * 2 <= total,
      s"2-D box touched $touched of $total files — no locality")
  }

  test("q129: compaction restores the z-locality an unsorted delta append broke") {
    SparkEntry.queries("q129_zorder_compaction")(spark, sf).collect()
    val root = operators.ScaleOps.zorderCompactionRoot(spark, sf)
    def parquets(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    // Degraded state on the record: many fragmented files plus the delta.
    val fragN = parquets(s"$root/data").length
    assert(fragN >= 16, s"fixture not fragmented: $fragN files")
    // Economics: the rewrite hits its metadata-derived size target.
    val compN = parquets(s"$root/compacted").length
    assert(compN < fragN && compN >= 4,
      s"compaction produced $compN files from $fragN")
    // Locality RESTORED: the 2-D box lives in a minority of the compacted
    // files (the delta file alone made that impossible before — unsorted,
    // it overlaps every z range, so every box had to touch it).
    val comp = spark.read.parquet(s"$root/compacted")
    val total = comp.select(input_file_name()).distinct().count()
    val touched = comp
      .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 3))
      .select(input_file_name()).distinct().count()
    assert(touched > 0 && touched * 2 <= total,
      s"2-D box touched $touched of $total compacted files — clustering lost")
    // The delta really did poison the degraded layout: it contains box
    // rows, so every box query had to read it.
    val frag = spark.read.parquet(s"$root/data")
    val deltaTouched = frag
      .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 3))
      .select(input_file_name()).distinct().count()
    assert(deltaTouched > touched,
      s"degraded layout touched $deltaTouched files, compacted $touched — " +
        "compaction should shrink the box's file set")
  }

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    // Complements the MANUAL salting demonstration (q37): the same skew
    // profile handled by the runtime — AQE detects the oversized reduce
    // partition and splits it across tasks, marking the join skew=true.
    // Thresholds are shrunk to make test-scale bytes look skewed; the
    // mechanism is byte-for-byte the one a 100 TB shuffle relies on.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~90 % of fact rows share one key — the q63-profiled shape. The
      // pre-join repartition gives the skewed reduce partition several map
      // chunks, the unit AQE splits by.
      val fact = Tables.table(spark, sf, "lineitem")
        .repartition(8, col("l_orderkey"))
        .select(
          when(col("l_orderkey") % 10 < 9, 0L)
            .otherwise(col("l_orderkey") % 50 + 1).as("k"),
          col("l_quantity"))
      val dim = spark.range(0, 51).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      joined.collect() // drive THIS QueryExecution so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q131 grid interval join: equals the theta formulation, no pair product in the plan") {
    val grid = SparkEntry.queries("q131_grid_interval_join")(spark, sf)
    // The reference semantics: plain equi+theta self-join on the same
    // synthesized intervals (the oracle's shape, executed in Spark).
    val li = Tables.table(spark, sf, "lineitem").select(
      col("l_suppkey").as("suppkey"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      expr("cast(unix_date(cast(l_shipdate as date)) as bigint)").as("sd"),
      expr("cast((l_orderkey * 7 + l_linenumber) % 30 + 1 as bigint)").as("w"))
      .select(col("suppkey"), col("id"), col("sd"), (col("sd") + col("w")).as("ed"))
    val a = li.select(col("suppkey"), col("id").as("a_id"),
      col("sd").as("a_sd"), col("ed").as("a_ed"))
    val b = li.select(col("suppkey"), col("id").as("b_id"),
      col("sd").as("b_sd"), col("ed").as("b_ed"))
    val theta = a.join(b, Seq("suppkey"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sd") <= col("b_ed") && col("b_sd") <= col("a_ed"))
      .groupBy("suppkey").agg(count(lit(1)).as("n_overlaps"))
      .orderBy("suppkey")
    assert(grid.collect().toSeq === theta.collect().toSeq)
    // The scalable property: pairs meet inside their composite
    // (suppkey, cell) grid group (r20: in-group size/filter counting,
    // one shuffle) — never a nested-loop pair product.
    val plan = grid.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"grid join degenerated to a pair product:\n$plan")
    assert(plan.contains("cell"), s"grid key missing from the join plan:\n$plan")
  }

  test("q142 dynamic overwrite: untouched partitions keep their physical files") {
    val root = java.nio.file.Files.createTempDirectory("graft_dynpo_spec").toString
    val path = s"$root/t"
    val src = Tables.table(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    src.repartition(col("o_year"))
      .write.partitionBy("o_year").mode("overwrite").parquet(path)
    def snapshot(): Map[String, (Long, Long)] =
      new java.io.File(path).listFiles().filter(_.isDirectory)
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> (f.length(), f.lastModified())))
        .toMap
    val before = snapshot()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      src.filter(col("o_year") === 1995)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .repartition(col("o_year"))
        .write.partitionBy("o_year").mode("overwrite").parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = snapshot()
    val untouchedBefore = before.filter(!_._1.startsWith("o_year=1995"))
    val untouchedAfter = after.filter(!_._1.startsWith("o_year=1995"))
    assert(untouchedAfter === untouchedBefore,
      "dynamic overwrite touched partitions outside the incoming frame")
    assert(after.keys.exists(_.startsWith("o_year=1995")) &&
      before.filter(_._1.startsWith("o_year=1995")) !=
        after.filter(_._1.startsWith("o_year=1995")),
      "the 1995 partition was not rewritten")
  }

  test("q139 epoch shuffle: different epochs permute differently, shards balanced") {
    val base = SparkEntry.queries("q139_epoch_shuffle")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay with the ep1 salt: same mechanics, different permutation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id")
    val ep1 = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(concat('ep1:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)").as("h"))
      .withColumn("shard", col("h") % 8)
      .withColumn("pos", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(base.keySet === ep1.keySet)
    val moved = base.keys.count(k => base(k) != ep1(k))
    assert(moved > base.size / 2,
      s"epochs barely differ: only $moved of ${base.size} docs moved")
    // positions within each shard are a contiguous 1..n ranking
    base.groupBy(_._2._1).foreach { case (shard, docs) =>
      val ps = docs.values.map(_._2).toSeq.sorted
      assert(ps === (1L to ps.size.toLong), s"shard $shard ranks not contiguous")
    }
  }

  test("q155: the manifest admits a strict subset of files and loses no rows") {
    val (paths, nHit, nTotal) = ScaleOps.manifestSelect(spark, sf, 400L, 1200L)
    assert(nHit > 0 && nHit < nTotal,
      s"manifest selected $nHit of $nTotal files — no pruning happened")
    assert(paths.size == nHit)
    // completeness: the pruned read returns exactly the plain filter
    val pruned = ScaleOps.manifestPrunedRead(spark, sf, 400L, 1200L).count()
    val full = Tables.table(spark, sf, "lineitem")
      .filter(col("l_orderkey").between(400, 1200)).count()
    assert(pruned === full, s"manifest pruning dropped rows: $pruned vs $full")
  }

  test("q155: a range hitting no files answers an empty frame, not an error") {
    val pruned = ScaleOps.manifestPrunedRead(spark, sf, Long.MaxValue - 10, Long.MaxValue)
    assert(pruned.count() === 0L)
    assert(pruned.schema.fieldNames.contains("l_orderkey"),
      s"empty answer lost the layout schema: ${pruned.schema.treeString}")
  }

  test("q152: the optimizer injects a Bloom probe into the fact leg") {
    val (rows, plan) = ScaleOps.runtimeBloomScope(spark) {
      Tables.table(spark, sf, "orders")
        .join(Tables.table(spark, sf, "customer")
          .filter(col("c_mktsegment") === "MACHINERY")
          .select("c_custkey"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    }
    assert(rows.nonEmpty)
    val lower = plan.toLowerCase
    assert(lower.contains("bloomfilter") || lower.contains("might_contain"),
      s"no runtime bloom probe in the executed plan:\n$plan")
  }

  test("q148: REBALANCE hint survives into the optimized plan") {
    val df = SparkEntry.queries("q148_rebalance_hint")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("RebalancePartitions"),
      s"REBALANCE hint dropped from the plan:\n$plan")
  }

  test("q149 incremental MV: the per-run plan reads the MV + delta, never the base fact") {
    val df = ScaleOps.incrementalJoinView(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("base_mv") && plan.contains("delta"),
      s"incremental path does not read the staged layouts:\n$plan")
    assert(!plan.contains("orders.parquet"),
      s"incremental path re-scanned the base fact table:\n$plan")
  }

  test("MisraGries: heavy-hitter superset + one-sided error bound, any partitioning") {
    import spark.implicits._
    // 60% of the stream is one majority key; the tail is all-distinct —
    // the shape that forces real decrements at any capacity < tail size.
    val n = 3000
    val items = (0 until n).map(i => if (i % 5 < 3) "M" else s"u$i")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (c <- Seq(4, 16); parts <- Seq(1, 7)) {
      val mg = new graft.functions.MisraGriesAggregator(c)
      val summ = spark.createDataset(items).repartition(parts)
        .select(mg.toColumn).head()
      assert(summ.size <= c, s"c=$c parts=$parts size=${summ.size}")
      // guarantee: every item with true count > n/(c+1) survives the merge
      exact.filter(_._2 * (c + 1) > n).keys.foreach(k =>
        assert(summ.contains(k), s"c=$c parts=$parts lost heavy hitter $k"))
      // one-sided estimates: never above truth, never more than n/(c+1) below
      summ.foreach { case (k, est) =>
        val tru = exact.getOrElse(k, 0L)
        assert(est <= tru && tru - est <= n / (c + 1),
          s"c=$c parts=$parts $k est=$est true=$tru")
      }
    }
  }

  test("q89 bloom pruning: no false negatives, bits bounded, rows accounted") {
    val r = SparkEntry.queries("q89_bloom_join")(spark, sf).head()
    val nBuild = r.getLong(0); val bitsSet = r.getLong(1)
    val nCand = r.getLong(3); val nFp = r.getLong(4)
    val nPruned = r.getLong(5); val nPass = r.getLong(6)
    // The Bloom guarantee: NO false negatives — every build key present in
    // the probe side must survive the filter, so true candidates
    // (candidates minus false positives) equal |build ∩ probe| exactly.
    val build = Tables.table(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).distinct()
    val probe = Tables.table(spark, sf, "orders")
      .select(col("o_custkey")).distinct()
    val inter = build.join(probe, col("c_custkey") === col("o_custkey")).count()
    assert(nCand - nFp == inter,
      s"false negative: ${nCand - nFp} true candidates, expected $inter")
    // d=3 probes per key; the bitmap is sized to load ≤ 0.5 from the build
    // cardinality, so set bits are bounded by insertions AND capacity.
    val capacity = 63L * math.max(128L, (6 * nBuild + 62) / 63)
    assert(bitsSet <= 3 * nBuild && bitsSet <= capacity)
    // Every fact row is either pruned by the bloom test or carries a
    // candidate key; exact-confirmed rows are a subset of the candidates.
    val factRows = Tables.table(spark, sf, "orders").count()
    assert(nPass <= factRows - nPruned,
      s"exact pass $nPass exceeds surviving rows ${factRows - nPruned}")
  }

  test("IVF ANN recall@3 vs brute force >= 0.9 with bounded candidate volume") {
    // Floor raised from 0.3 after the centroid fit moved from
    // "first 16 vectors" to two deterministic Lloyd iterations
    // (Similarity.kmeansCentroids) — better-placed centroids put true
    // neighbors inside the nprobe probe set far more often.
    val emb = Tables.table(spark, sf, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, 3).select("vec_id", "nbr_id")
    val ivf = Similarity.ivfTopK(emb, 3).select("vec_id", "nbr_id")
    val total = brute.count().toDouble
    val hit = brute.join(ivf, Seq("vec_id", "nbr_id"), "left_semi").count().toDouble
    assert(hit / total >= 0.9, s"IVF recall ${hit / total}")
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** MemoryStream-driven event-time tests (SURVEY §5.4): constructed late /
  * out-of-order batches against the watermark, streaming session windows,
  * and watermark-scoped stateful dedup — the behaviors the batch oracle
  * can't express because they depend on batch boundaries. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("Q31: late rows beyond the 10-minute watermark are dropped") {
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()

    // batch 1: events at 00:05, 00:12, 00:25 → watermark becomes 00:15
    input.addData((ts(5), "a"), (ts(12), "b"), (ts(25), "c"))
    q.processAllAvailable()
    // batch 2: 00:02 is now LATE (watermark 00:15 > its window end 00:10)
    // and must be dropped; 00:40 advances the watermark to 00:30
    input.addData((ts(2), "late"), (ts(40), "d"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("late_test")
      .select(col("window.start").cast("long").as("s"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = ts(0).getTime / 1000
    // [00:00,00:10): only 00:05 — the late 00:02 did NOT land
    assert(out(base) == 1, s"late row leaked into the closed window: $out")
    // [00:10,00:20) and [00:20,00:30) finalized with one row each
    assert(out(base + 600) == 1 && out(base + 1200) == 1)
    // [00:40,...) still open (not emitted in append mode)
    assert(!out.contains(base + 2400))
  }

  test("Q30: streaming session_window groups by 30-minute inactivity gap") {
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()

    // user 1: events at 00:00, 00:10 (one session), then 00:50 (new session
    // — gap 40 min > 30); a far-future event closes everything
    input.addData((ts(0), 1L), (ts(10), 1L), (ts(50), 1L))
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 99L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("session_test")
      .filter(col("user_id") === 1L)
      .select(col("session_window.start").cast("long").as("s"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = ts(0).getTime / 1000
    assert(out == Map(base -> 2L, (base + 3000) -> 1L),
      s"expected two sessions (2 events + 1 event), got $out")
  }

  test("Q137: the state store read equals the sink's complete-mode output") {
    // The semantic claim of the state data source: for a complete-mode
    // aggregation, the STORE holds exactly the rows the SINK shows —
    // reading state is reading the query's truth, not an approximation.
    val stateRows = SparkEntry.queries("q137_state_store_read")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val sinkRows = spark.table("q137_sink")
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(stateRows === sinkRows,
      s"state (${stateRows.size}) diverges from sink (${sinkRows.size})")
  }

  test("Q133: chained window tiers — two stateful operators, hours finalize across batches") {
    val input = MemoryStream[(Timestamp, String, Double)]
    val fine = input.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("tot"))
    val hourly = fine
      .groupBy(window(window_time(col("window")), "1 hour"), col("k"))
      .agg(sum("n").as("n"), sum("tot").as("tot"))
    val q = hourly.writeStream.format("memory").queryName("q133_test")
      .outputMode(OutputMode.Append()).start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0's rows arrive out of order inside batch 1; watermark → 00:45
    input.addData((t(0, 5), "a", 1.5), (t(0, 35), "a", 4.0),
      (t(0, 45), "a", 2.0), (t(0, 55), "b", 3.25))
    q.processAllAvailable()
    // watermark → 01:10: tier 1 closes hour 0's remaining 10-min windows
    input.addData((t(1, 20), "a", 9.0))
    q.processAllAvailable()
    // watermark → 02:20: tier 2 can now finalize the [00:00, 01:00) hour
    input.addData((t(2, 30), "a", 0.5))
    q.processAllAvailable()
    q.stop()

    assert(q.lastProgress.stateOperators.length == 2,
      s"expected two stateful tiers, got ${q.lastProgress.stateOperators.length}")
    val out = spark.table("q133_test")
      .select(col("window.start").cast("long").as("s"), col("k"),
        col("n"), col("tot").cast("double").as("tot"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val h0 = t(0, 0).getTime / 1000
    // hour 0 totals roll up ONLY from tier-1-finalized windows — and they
    // cover every hour-0 event exactly once, across the batch slicing
    assert(out((h0, "a")) == (3L, 7.5), s"hour-0 'a' wrong: $out")
    assert(out((h0, "b")) == (1L, 3.25), s"hour-0 'b' wrong: $out")
    // the 01:20 hour is still open (watermark 02:20 < its end 02:00? no —
    // 02:20 ≥ 02:00 closes it too; the 02:30 hour must remain open)
    assert(!out.contains((t(2, 0).getTime / 1000, "a")),
      s"open hour leaked: $out")
  }

  test("Q143: stream-stream semi join emits each view ONCE despite multiple matches") {
    val views = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "v_user", "view_id")
      .withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
      "left_semi")
    val q = joined.writeStream.format("memory").queryName("q143_test")
      .outputMode(OutputMode.Append()).start()

    // view at 00:00; TWO purchases inside its window, arriving in
    // DIFFERENT batches — the semi join must still emit the view once.
    views.addData((ts(0), 1L, 100L))
    purchases.addData((ts(5), 1L, 200L))
    q.processAllAvailable()
    purchases.addData((ts(10), 1L, 201L))
    // a second view with NO purchase, plus horizon-advancing traffic
    views.addData((ts(2), 2L, 101L))
    views.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 9L, 999L))
    purchases.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 9L, 998L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("q143_test").select("view_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // 100 exactly once (not twice), 101 never, 999 matched at 03:00
    assert(out === Seq(100L, 999L), s"semi join emitted $out")
  }

  test("Q32: dropDuplicatesWithinWatermark suppresses cross-batch duplicates") {
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()

    input.addData((ts(1), 100L), (ts(2), 101L))
    q.processAllAvailable()
    // same event ids re-delivered in a later batch, within the watermark gap
    input.addData((ts(3), 100L), (ts(4), 101L), (ts(5), 102L))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_test").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(100L, 101L, 102L), s"got ${ids.toSeq}")
  }

  test("Q32: dedup state is EVICTED once the watermark passes an id") {
    // The scale property behind dropDuplicatesWithinWatermark: ids older
    // than the watermark leave the state store, so state is bounded by the
    // lateness horizon instead of growing with every id ever seen. An id
    // re-delivered AFTER the watermark passed its first arrival is no
    // longer in state and therefore re-emits — which is exactly what a
    // bounded dedup promises (and an unbounded dropDuplicates would hide).
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_evict_test")
      .outputMode(OutputMode.Append()).start()

    // batch 1: id 100 at 00:01; 00:30 drives the watermark to 00:20,
    // which is past 00:01 + 10 min → id 100's state entry is evicted.
    input.addData((ts(1), 100L), (ts(30), 200L))
    q.processAllAvailable()
    // batch 2: id 100 re-sent inside the current horizon → EMITS AGAIN
    // (state proven gone); id 200 re-sent in-horizon → still suppressed.
    input.addData((ts(25), 100L), (ts(31), 200L))
    q.processAllAvailable()
    q.stop()

    val counts = spark.table("dedup_evict_test").select("event_id")
      .collect().map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(counts(100L) == 2,
      s"id 100 should re-emit after eviction (state bounded), got $counts")
    assert(counts(200L) == 1,
      s"in-horizon duplicate of id 200 must stay suppressed, got $counts")
  }

  test("Q30c: funnel state survives batch boundaries and keeps strict ordering") {
    import graft.streaming.{FunnelEvent, FunnelOut, FunnelState}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val input = MemoryStream[FunnelEvent]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, -1L, -1L, -1L))
          rows.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if st.stage == 0 => st = st.copy(stage = 1, vUs = e.ts_us)
              case "click" if st.stage == 1 && e.ts_us > st.vUs =>
                st = st.copy(stage = 2, cUs = e.ts_us)
              case "purchase" if st.stage == 2 && e.ts_us > st.cUs =>
                st = st.copy(stage = 3, pUs = e.ts_us)
              case _ => ()
            }
          }
          state.update(st)
          Iterator(FunnelOut(user, st.stage.toLong, st.vUs, st.cUs, st.pUs))
      }
    val q = out.toDF().writeStream.format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Update()).start()

    // batch 1: user 7 views at t=100 and clicks at the SAME microsecond
    // (strict ordering → click must NOT count), user 8 views
    input.addData(FunnelEvent(7L, "view", 100L, 1L),
      FunnelEvent(7L, "click", 100L, 2L), FunnelEvent(8L, "view", 50L, 3L))
    q.processAllAvailable()
    // batch 2: user 7 clicks later and purchases; user 8 purchases with no
    // click (must stay at stage 1). State must carry across the batches.
    input.addData(FunnelEvent(7L, "click", 200L, 4L),
      FunnelEvent(7L, "purchase", 300L, 5L), FunnelEvent(8L, "purchase", 60L, 6L))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("funnel_test")
      .groupBy("user_id")
      .agg(max("stage").as("stage"), max("first_click_us").as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(last(7L) == (3L, 200L),
      s"user 7 should complete the funnel via the later click, got ${last(7L)}")
    assert(last(8L)._1 == 1L, s"user 8 must stall at view, got ${last(8L)}")
  }

  test("exactFunnel converges to the min-cascade oracle under out-of-order batches") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // (ts, user_id, event_type, event_id)
    val input = MemoryStream[(Timestamp, Long, String, Long)]
    val events = input.toDF()
      .toDF("ts", "user_id", "event_type", "event_id")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.StreamingQueries.exactFunnel(events)
    val q = out.writeStream.format("memory").queryName("exact_funnel_test")
      .outputMode(OutputMode.Update()).start()

    // batch 1: the CLICK arrives first (event time 200 s).
    input.addData((ts(200), 7L, "click", 1L))
    q.processAllAvailable()
    // batch 2: the VIEW arrives late but within the 10-min lateness
    // (event time 100 s) — the greedy gate of q30c would have discarded
    // the click; the buffered fold must re-order and count it.
    input.addData((ts(100), 7L, "view", 2L))
    q.processAllAvailable()
    // batch 3: a sentinel far in the future pushes the watermark past both
    // events so the buffer finalizes.
    input.addData((ts(5000), 99L, "view", 3L))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()

    val last = spark.table("exact_funnel_test")
      .groupBy("user_id")
      .agg(max("stage").as("stage"),
        max("first_view_us").as("v"), max("first_click_us").as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(last(7L) == (2L, 100000000L, 200000000L),
      s"late view must retroactively admit the click, got ${last(7L)}")
  }

  test("Q32b: stream-stream join buffers across batches and respects the interval") {
    val views = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "v_user", "view_id")
      .withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select("view_id", "purchase_id")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()

    // view arrives first, alone in its batch — must be buffered as state
    views.addData((ts(0), 1L, 10L))
    q.processAllAvailable()
    // purchase arrives two batches later, still inside the 30-min window;
    // a second purchase is OUTSIDE the window and must not match
    purchases.addData((ts(20), 1L, 20L))
    q.processAllAvailable()
    purchases.addData((ts(35), 1L, 21L))
    q.processAllAvailable()
    q.stop()

    val pairs = spark.table("ssj_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L)),
      s"expected exactly the in-window cross-batch match, got $pairs")
  }

  test("stateful operators are state-store independent: RocksDB provider, same results") {
    // At 100 TB the default HDFS-backed in-memory state store is the first
    // casualty (state must fit the executor heap); RocksDB spills to local
    // disk. The engine's stateful operators must not depend on provider
    // behavior: run the q32-family dedup AND the q30c-family custom state
    // (flatMapGroupsWithState) under RocksDB and require identical results
    // — plus proof (rocksdb custom metrics) that the provider was live.
    import graft.streaming.{FunnelEvent, FunnelOut, FunnelState}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import scala.jdk.CollectionConverters._
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long)]
      val dedup = input.toDF().toDF("ts", "event_id")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
      val q = dedup.writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode(OutputMode.Append()).start()
      input.addData((ts(1), 100L), (ts(2), 101L))
      q.processAllAvailable()
      input.addData((ts(3), 100L), (ts(4), 101L), (ts(5), 102L))
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators(0).customMetrics
      q.stop()
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"RocksDB provider not live — state metrics: ${metrics.keySet}")
      val ids = spark.table("rocksdb_dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(100L, 101L, 102L), s"dedup changed under RocksDB: $ids")

      val fin = MemoryStream[FunnelEvent]
      val out = fin.toDS()
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[FunnelState, FunnelOut](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          case (user, rows, state: GroupState[FunnelState]) =>
            val st = graft.streaming.StreamingQueries.foldFunnel(
              state.getOption.getOrElse(FunnelState(0, -1L, -1L, -1L)),
              rows.toSeq)
            state.update(st)
            Iterator(FunnelOut(user, st.stage.toLong, st.vUs, st.cUs, st.pUs))
        }
      val fq = out.toDF().writeStream.format("memory").queryName("rocksdb_funnel")
        .outputMode(OutputMode.Update()).start()
      fin.addData(FunnelEvent(7L, "view", 100L, 1L), FunnelEvent(7L, "click", 100L, 2L))
      fq.processAllAvailable()
      fin.addData(FunnelEvent(7L, "click", 200L, 3L), FunnelEvent(7L, "purchase", 300L, 4L))
      fq.processAllAvailable()
      fq.stop()
      val last = spark.table("rocksdb_funnel").groupBy("user_id")
        .agg(max("stage").as("stage"), max("first_click_us").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(last == Seq((7L, 3L, 200L)),
        s"custom funnel state changed under RocksDB: $last")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState top-k: multi-batch emissions max-fold to the batch ranking") {
    import graft.streaming.{TopKIn, TopKProcessor}
    import org.apache.spark.sql.streaming.TimeMode
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TopKIn]
      val out = input.toDS().groupByKey(_.user_id)
        .transformWithState(new TopKProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF().writeStream.format("memory").queryName("tws_topk")
        .outputMode("update").start()
      // Batch 1 holds user 1's eventual 2nd-best; batch 2 its best — the
      // running slots must cross batches through state, not within-batch sort.
      input.addData(TopKIn(1L, 5.0), TopKIn(1L, 7.0), TopKIn(2L, 1.0))
      q.processAllAvailable()
      input.addData(TopKIn(1L, 9.0), TopKIn(1L, 2.0), TopKIn(2L, 3.0))
      q.processAllAvailable()
      q.stop()
      val fin = spark.table("tws_topk").groupBy("user_id")
        .agg(max("n_events").as("n"), max("top1").as("t1"),
          max("top2").as("t2"), max("top3").as("t3"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(fin(1L) == ((4L, 9.0, 7.0, 5.0)), s"user 1: ${fin(1L)}")
      // Emission-level pad is -Inf (the declared query maps it to the
      // -1.0 sentinel only in its final projection).
      assert(fin(2L) == ((2L, 3.0, 1.0, Double.NegativeInfinity)),
        s"user 2 pads rank 3: ${fin(2L)}")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState CMS: sliced batches max-fold to the exact sketch") {
    import graft.streaming.{CmsIn, CmsProcessor, CmsSketch}
    import org.apache.spark.sql.streaming.TimeMode
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[CmsIn]
      val out = input.toDS().groupByKey(_.event_type)
        .transformWithState(new CmsProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF().writeStream.format("memory").queryName("tws_cms")
        .outputMode("update").start()
      // the same users recur across batches: cells must accumulate through
      // state, not restart per batch
      val batches = Seq(
        Seq(CmsIn("view", 7L), CmsIn("view", 8L), CmsIn("click", 7L)),
        Seq(CmsIn("view", 7L), CmsIn("click", 7L), CmsIn("click", 9L)),
        Seq(CmsIn("view", 8L), CmsIn("view", 7L)))
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val folded = spark.table("tws_cms")
        .select(col("event_type"), posexplode(col("cells")).as(Seq("idx", "cell")))
        .groupBy("event_type", "idx").agg(max("cell").as("cell"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      // expected sketch: replay the additive updates directly
      val want = scala.collection.mutable.Map[(String, Int), Long]().withDefaultValue(0L)
      batches.flatten.foreach { e =>
        (0 until CmsSketch.D).foreach { i =>
          want((e.event_type, i * CmsSketch.W + CmsSketch.pos(i, e.user_id))) += 1L
        }
      }
      want.foreach { case (k, v) =>
        assert(folded(k) == v, s"cell $k: ${folded(k)} != $v")
      }
      // state is hard-bounded: every emission carries exactly d·w cells
      assert(folded.count(_._2 > 0L) == want.size)
      val widths = spark.table("tws_cms").select(size(col("cells"))).distinct().collect()
      assert(widths.map(_.getInt(0)).toSeq == Seq(CmsSketch.D * CmsSketch.W))
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState sessions: event-time timer closes an idle session") {
    import graft.streaming.{SessIn, SessionProcessor}
    import org.apache.spark.sql.streaming.TimeMode
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessIn]
      val out = input.toDS()
        .withWatermark("ts", "10 minutes")
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor,
          TimeMode.EventTime(), OutputMode.Update())
      val q = out.toDF().writeStream.format("memory").queryName("tws_sess")
        .outputMode("update").start()
      // User 1's only session idles; user 2's far-future events push the
      // watermark past user 1's horizon WITHOUT sending user 1 any more
      // rows — only the registered timer can close that session.
      def tm(min: Int): Timestamp = new Timestamp(ts(0).getTime + min * 60000L)
      input.addData(SessIn(1L, tm(0), 10L), SessIn(1L, tm(10), 11L))
      q.processAllAvailable()
      input.addData(SessIn(2L, tm(120), 20L))
      q.processAllAvailable()
      input.addData(SessIn(2L, tm(125), 21L))
      q.processAllAvailable()
      q.stop()
      val fin = spark.table("tws_sess")
        .groupBy("user_id", "session_start_us")
        .agg(max("session_end_us").as("e"), max("n_events").as("n"), max("closed").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
      val u1 = fin((1L, tm(0).getTime * 1000L))
      assert(u1 == ((tm(10).getTime * 1000L, 2L, true)),
        s"user 1's idle session should be timer-closed: $u1")
      val u2 = fin((2L, tm(120).getTime * 1000L))
      assert(!u2._3, s"user 2's live session must stay open: $u2")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("checkpoint restart: top-k state survives a NEW query instance (RocksDB)") {
    import graft.streaming.{TopKIn, TopKProcessor}
    import org.apache.spark.sql.streaming.TimeMode
    // The production failure mode: a streaming job dies between batches
    // and a FRESH query (fresh StatefulProcessor instance) resumes from
    // the same checkpoint dir. User 1's pre-restart values (5, 7) must
    // come back from RocksDB — if they don't, the post-restart fold shows
    // (9, 2, -Inf) instead of (9, 7, 5) and n_events resets.
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ckpt_topk_").toString
      // The memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink (the checkpoint tracks committed batch ids, and
      // an uncommitted batch REPLAYS on restart — the fold below is a
      // max, so replayed emissions are idempotent, exactly the
      // at-least-once + idempotent-fold contract a production consumer
      // signs).
      def fold(rows: Iterable[(Long, Long, Double, Double, Double)]) =
        rows.groupBy(_._1).map { case (u, rs) =>
          u -> ((rs.map(_._2).max, rs.map(_._3).max,
            rs.map(_._4).max, rs.map(_._5).max))
        }
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Double, Double, Double)]()
      val input = MemoryStream[TopKIn]
      def start(ck: String) = input.toDS().groupByKey(_.user_id)
        .transformWithState(new TopKProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF().writeStream
        .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
          d.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        }
        .option("checkpointLocation", ck)
        .outputMode("update").start()
      val q1 = start(ckpt)
      input.addData(TopKIn(1L, 5.0), TopKIn(1L, 7.0), TopKIn(2L, 1.0))
      q1.processAllAvailable()
      q1.stop()
      val q2 = start(ckpt) // fresh processor, SAME checkpoint
      input.addData(TopKIn(1L, 9.0), TopKIn(1L, 2.0), TopKIn(2L, 3.0))
      q2.processAllAvailable()
      q2.stop()
      import scala.jdk.CollectionConverters._
      val restarted = fold(buf.asScala)
      // Single-run reference: the same six events through one
      // uninterrupted query (its own stream, buffer, and checkpoint).
      buf.clear()
      val sInput = MemoryStream[TopKIn]
      val sq = sInput.toDS().groupByKey(_.user_id)
        .transformWithState(new TopKProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF().writeStream
        .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
          d.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        }
        .outputMode("update").start()
      sInput.addData(TopKIn(1L, 5.0), TopKIn(1L, 7.0), TopKIn(2L, 1.0))
      sq.processAllAvailable()
      sInput.addData(TopKIn(1L, 9.0), TopKIn(1L, 2.0), TopKIn(2L, 3.0))
      sq.processAllAvailable()
      sq.stop()
      val single = fold(buf.asScala)
      assert(restarted == single,
        s"restart diverged from the uninterrupted run: $restarted vs $single")
      // Batch oracle on the six events' multiset ranking.
      assert(restarted(1L) == ((4L, 9.0, 7.0, 5.0)), s"user 1: ${restarted(1L)}")
      assert(restarted(2L) ==
        ((2L, 3.0, 1.0, Double.NegativeInfinity)), s"user 2: ${restarted(2L)}")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("checkpoint restart: session state AND registered timers survive (RocksDB)") {
    import graft.streaming.{SessIn, SessionProcessor}
    import org.apache.spark.sql.streaming.TimeMode
    // The timer variant of the restart proof: user 1's idle-horizon timer
    // is registered BEFORE the stop; after a fresh query resumes from the
    // checkpoint, only user 2's far-future events advance the watermark —
    // user 1 never gets another row, so its session can only close if the
    // restored timer fires in the new query instance.
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ckpt_sess_").toString
      def tm(min: Int): Timestamp = new Timestamp(ts(0).getTime + min * 60000L)
      // foreachBatch again: the recoverable sink (see the top-k restart
      // test); replayed batches fold idempotently through the max.
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Long, Boolean)]()
      val input = MemoryStream[SessIn]
      def start() = input.toDS()
        .withWatermark("ts", "10 minutes")
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor,
          TimeMode.EventTime(), OutputMode.Update())
        .toDF().writeStream
        .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
          d.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getBoolean(4))))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      input.addData(SessIn(1L, tm(0), 10L), SessIn(1L, tm(10), 11L))
      q1.processAllAvailable()
      q1.stop()
      val q2 = start() // fresh processor, SAME checkpoint
      input.addData(SessIn(2L, tm(120), 20L))
      q2.processAllAvailable()
      input.addData(SessIn(2L, tm(125), 21L))
      q2.processAllAvailable()
      q2.stop()
      import scala.jdk.CollectionConverters._
      val fin = buf.asScala.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
        k -> ((rs.map(_._3).max, rs.map(_._4).max, rs.map(_._5).exists(identity)))
      }
      val u1 = fin((1L, tm(0).getTime * 1000L))
      assert(u1 == ((tm(10).getTime * 1000L, 2L, true)),
        s"user 1's session must be closed by the RESTORED timer: $u1")
      val u2 = fin((2L, tm(120).getTime * 1000L))
      assert(u2._2 == 2L && !u2._3, s"user 2's live session must stay open: $u2")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("sessions reconstruct under OUT-OF-ORDER cross-batch arrival, including a merge") {
    import graft.streaming.{SessIn, SessionProcessor}
    import org.apache.spark.sql.streaming.TimeMode
    // The r9 verdict's untested boundary: events arrive across batches in
    // NON-event-time order (each still inside the watermark). Batch 1
    // opens two separate sessions [0,0] and [35,35] (gap 30 min exceeded);
    // batch 2 delivers the BRIDGE event at minute 27 — admissible (wm is
    // 25), before one open session and after the other — which must MERGE
    // them into [0,35] with n=3. Closure then comes from the watermark
    // timer. The reconstruction reads closed emissions only ("closed
    // sessions are the log"): open-session emissions with superseded
    // start keys are transient by design.
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def tm(min: Int): Timestamp = new Timestamp(ts(0).getTime + min * 60000L)
      val input = MemoryStream[SessIn]
      val q = input.toDS()
        .withWatermark("ts", "10 minutes")
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor,
          TimeMode.EventTime(), OutputMode.Update())
        .toDF().writeStream.format("memory").queryName("ooo_sess")
        .outputMode("update").start()
      input.addData(SessIn(1L, tm(0), 1L), SessIn(1L, tm(35), 2L))
      q.processAllAvailable() // wm := 25; both sessions inside horizon
      input.addData(SessIn(1L, tm(27), 3L)) // out-of-order bridge, ≥ wm
      q.processAllAvailable()
      input.addData(SessIn(2L, tm(120), 20L)) // advance wm past horizons
      q.processAllAvailable()
      input.addData(SessIn(2L, tm(125), 21L)) // firing batch for the timer
      q.processAllAvailable()
      q.stop()
      val closed = spark.table("ooo_sess").filter(col("closed"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // Batch gaps-and-islands oracle over {0, 27, 35}: 27−0 ≤ 30 and
      // 35−27 ≤ 30 ⇒ ONE session [0, 35] with 3 events.
      assert(closed == Set((1L, tm(0).getTime * 1000L,
          tm(35).getTime * 1000L, 3L)),
        s"out-of-order merge failed: $closed")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("q87: the restarted query ingests ONLY the newly landed generation") {
    // The declared query's hash check proves completeness + exactly-once;
    // this pins the INCREMENTAL property: run 2's progress counters must
    // equal generation B's size exactly — a reprocess of generation A
    // would double them.
    val (out, perRun) = graft.streaming.StreamingQueries
      .restartableIngest(spark, sf)
    val total = out.count()
    assert(perRun.size == 2 && perRun.forall(_.nonEmpty),
      s"expected two non-empty runs: $perRun")
    val txn = graft.pipeline.EcommercePipeline.transactions(spark, sf)
    val nB = txn.filter(abs(hash(col("transaction_id"))) % 2 === 1).count()
    assert(perRun(1).sum == nB,
      s"run 2 ingested ${perRun(1).sum} rows, generation B has $nB — not incremental")
    // Rate-limit discipline: each run's drain is sliced into bounded
    // micro-batches (maxFilesPerTrigger=2 over ≥4 staged files ⇒ >1 batch,
    // none holding a full generation) — yet the committed output below is
    // still complete and duplicate-free.
    assert(perRun.forall(_.size > 1),
      s"expected multi-batch drains under maxFilesPerTrigger: $perRun")
    assert(perRun(0).max < perRun(0).sum,
      s"run 1 put the whole backlog in one batch: ${perRun(0)}")
    assert(total == out.select("transaction_id").distinct().count(),
      "exactly-once violated: duplicate transaction_ids in the committed output")
  }

  test("q34: the landing-zone drain is rate-limited into bounded micro-batches") {
    // maxFilesPerTrigger=64 over the ~250-file (year, month) landing zone:
    // AvailableNow must slice the backlog into several batches, each
    // bounded, while the union of batches equals the batch derivation —
    // the backpressure posture a 100 TB ingest restart needs.
    val (out, perBatch) = graft.streaming.StreamingQueries
      .streamingPipeline(spark, sf)
    assert(perBatch.size > 1,
      s"expected a sliced drain, got one batch: $perBatch")
    val total = perBatch.sum
    assert(perBatch.max < total,
      s"one micro-batch held the whole backlog: $perBatch")
    val expected = graft.pipeline.EcommercePipeline.transactions(spark, sf).count()
    assert(total == expected && out.count() == expected,
      s"throttled drain lost rows: $total ingested vs $expected landed")
  }

  test("q127: JDBC warehouse load is exactly-once under restart AND blind retry") {
    // The engine itself re-applies the committed batch verbatim (the
    // Lambda-style retry) between run 1 and the restart — so a non-
    // idempotent sink would surface here as duplicates or a count drift.
    val (out, counts) = graft.streaming.StreamingQueries
      .idempotentWarehouseIngest(spark, sf)
    val rows = out.count()
    // Source-level progress counts see FULL generations (the declared
    // 1-in-16 md5 slice filters downstream of the source); the warehouse
    // itself holds only the slice.
    val txn = graft.pipeline.EcommercePipeline.transactions(spark, sf)
    val nA = txn.filter(abs(hash(col("transaction_id"))) % 2 === 0).count()
    val nB = txn.filter(abs(hash(col("transaction_id"))) % 2 === 1).count()
    assert(counts == Seq(nA, nB),
      s"runs ingested $counts, generations are ($nA, $nB) — " +
        "either a reprocess (not incremental) or lost input")
    val sliced = txn.filter(expr(
      "cast(conv(substring(md5(transaction_id), 1, 15), 16, 10) as bigint) % 16 = 0"))
      .count()
    assert(rows == sliced,
      s"warehouse holds $rows rows, expected $sliced — " +
        "the blind retry double-loaded or dropped transactions")
    assert(rows == out.select("transaction_id").distinct().count(),
      "exactly-once violated: duplicate transaction_ids in the warehouse")
  }

  test("Q29 streaming tumbling aggregate equals the batch group-by") {
    val streamed = SparkEntry.queries("q29_stream_tumbling")(spark, sf)
    val batch = Tables.table(spark, sf, "events")
      .groupBy((floor(unix_timestamp(col("ts")) / 600) * 600).cast("long").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("window_start", "event_type")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("Q124: every event is enriched with exactly one valid dim version") {
    val out = SparkEntry.queries("q124_stream_temporal_enrich")(spark, sf)
      .collect()
    val nEvents = Tables.table(spark, sf, "events").count()
    assert(out.length.toLong == nEvents,
      s"${out.length} enriched rows vs $nEvents events — versions must " +
        "partition event time for every user")
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "an event matched more than one version")
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 2))
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(2) < 5L))
  }
}

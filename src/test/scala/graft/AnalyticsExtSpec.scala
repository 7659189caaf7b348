package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsExt, Dedup}

/** Properties for the round-2 analytics extensions: the DuckDB oracle
  * checks exact parity; these assert the *semantics* hold independently of
  * the oracle formulation. */
class AnalyticsExtSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("pivot row sums equal the plain group-by counts") {
    val pivoted = q("q40_pivot")
      .withColumn("total", col("n_f") + col("n_o") + col("n_p"))
      .select("o_orderpriority", "total")
    val plain = Tables.table(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("total"))
    assert(pivoted.join(plain, Seq("o_orderpriority"))
      .filter(pivoted("total") =!= plain("total")).count() == 0)
  }

  test("unpivot doubles the row count and preserves totals") {
    val n = Tables.table(spark, sf, "orders").count()
    val up = q("q41_unpivot")
    assert(up.count() == 2 * n)
    assert(up.groupBy("k").count().collect().forall(_.getLong(1) == n))
  }

  test("exact variance matches Spark's native var_samp within float noise") {
    val exact = q("q44_stats_exact").select("l_returnflag", "var_qty")
    val native = Tables.table(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(var_samp(col("l_quantity")).as("v"))
    val joined = exact.join(native, "l_returnflag")
      .select(abs(col("var_qty") - col("v")) / col("v")).collect()
    assert(joined.forall(_.getDouble(0) < 1e-9))
  }

  test("ntile quartiles are balanced within one row per partition") {
    val bad = q("q45_window_nav")
      .groupBy("o_custkey", "quartile").count()
      .groupBy("o_custkey").agg((max("count") - min("count")).as("spread"))
      .filter(col("spread") > 1)
    assert(bad.count() == 0)
  }

  test("range frame includes at least the current row") {
    val bad = q("q46_range_frame")
      .join(Tables.table(spark, sf, "orders"), Seq("o_orderkey"))
      .filter(col("near_total") < col("o_totalprice").cast("decimal(18,2)").cast("double"))
    assert(bad.count() == 0)
  }

  test("histogram buckets cover all rows exactly once") {
    val total = q("q48_bucket_hist").agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.table(spark, sf, "orders").count())
  }

  test("connected components: labels are fixpoint and within-edge consistent") {
    val docs = Tables.table(spark, sf, "documents")
    val edges = Dedup.jaccardEdges(docs, 0.3).cache()
    val labels = Dedup.connectedComponents(docs, edges)
    // every edge endpoint pair shares a label
    val lab = labels.select(col("node"), col("lbl"))
    val viol = edges
      .join(lab.withColumnRenamed("node", "a").withColumnRenamed("lbl", "la"), "a")
      .join(lab.withColumnRenamed("node", "b").withColumnRenamed("lbl", "lb"), "b")
      .filter(col("la") =!= col("lb"))
    assert(viol.count() == 0)
    // labels are cluster minima: every label is <= its node id
    assert(labels.filter(col("lbl") > col("node")).count() == 0)
  }

  test("q74 packing: chunks partition each stream — totals conserved, ranges disjoint") {
    // Packing invariants no hash check expresses: per lang, every doc's
    // tokens land in exactly one chunk (sum over chunks = corpus total),
    // and chunk doc-ranges are disjoint and ordered (a doc never appears
    // before the previous chunk closed).
    val chunks = SparkEntry.queries("q74_sequence_pack")(spark, sf).collect()
    assert(chunks.nonEmpty)
    val totalByLang = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "size(filter(split(lower(text), ' +'), t -> t != '')) AS n")
      .groupBy("lang").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getString(0)).foreach { case (lang, cs) =>
      assert(cs.map(_.getLong(3)).sum == totalByLang(lang),
        s"token mass not conserved for $lang")
      val ordered = cs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(p, n) =>
          assert(p.getLong(5) < n.getLong(4),
            s"chunk ranges overlap for $lang: ${p.getLong(1)} vs ${n.getLong(1)}")
        case _ => ()
      }
    }
  }

  test("rolling hash: permuting token order changes the fingerprint") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fp = two
      .withColumn("toks", expr(operators.TextAnalysis.tokensExpr))
      .select(expr(
        """aggregate(toks, 0L, (acc, t) ->
          |  (acc * 31 + aggregate(split(t, ''), 0L,
          |     (a, c) -> (a * 127 + ascii(c)) % 1000000007)) % 1000000007)""".stripMargin)
        .as("fp"))
      .collect().map(_.getLong(0))
    assert(fp(0) != fp(1))
  }

  test("embed stats: l2 is positive and u0 is a unit-scale component") {
    val bad = q("q27e_embed_stats")
      .filter(col("l2") <= 0 || abs(col("u0")) > 1.0)
    assert(bad.count() == 0)
  }

  test("q95 OHLC: bar invariants and total volume conservation") {
    val out = q("q95_ohlc_resample").cache()
    // open/close lie inside [low, high]; buckets align to the 30-min grid
    val bad = out.filter(
      col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low") ||
      col("low") > col("high") || col("bucket_start_s") % 1800 =!= 0)
    assert(bad.count() == 0)
    // every event lands in exactly one bar
    val total = out.agg(sum("volume")).head().getLong(0)
    val events = Tables.table(spark, sf, "events").count()
    assert(total == events, s"volume $total != $events events")
    // single-event bars degenerate to open=high=low=close
    assert(out.filter(col("volume") === 1 &&
      (col("open") =!= col("close") || col("high") =!= col("low"))).count() == 0)
    out.unpersist()
  }

  test("q97 pattern runs: exact match against a sequential reference scan") {
    // The distributed window/aggregate result must equal what a plain
    // in-order scan of each user's events produces — maximality included
    // (a run reported one event short would differ).
    val got = q("q97_pattern_runs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toSet
    val events = Tables.table(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = events.groupBy(_._1).iterator.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      // split into maximal strictly-rising runs
      val runs = ordered.foldLeft(List.empty[List[(Long, Long, Long, Double)]]) {
        case (acc, e) => acc match {
          case (h @ last :: _) :: t if e._4 > last._4 => (e :: h) :: t
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      runs.filter(_.size >= 4).map { r =>
        (uid, r.head._3, r.last._3, r.size.toLong, r.head._4, r.last._4)
      }
    }.toSet
    assert(got == want, s"got ${got.size} runs, want ${want.size}")
    assert(want.nonEmpty, "fixture produced no rising runs — test is vacuous")
  }
}

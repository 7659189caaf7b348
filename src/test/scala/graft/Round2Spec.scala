package graft

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 additions: the KnnTopK custom plan, the funnel state machine,
  * and the widened relational surface. */
class Round2Spec extends SparkSpec {

  test("KnnTopK custom plan: physical plan contains the custom exec, no window over the cross product") {
    val out = SparkEntry.queries("q27_knn_brute")(spark, sf)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("KnnTopKPartial"),
      s"expected the custom KnnTopKPartialExec in the plan, got:\n$plan")
  }

  test("KnnTopK equals the composed broadcast-NLJ + window formulation") {
    val emb = Tables.table(spark, sf, "embeddings")
    val custom = Similarity.bruteForceTopK(emb, 3).orderBy("vec_id", "rnk")
    // reference formulation: materialized cross product + window rank
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("nbr_id"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nbr_id"))
    val ref = a.join(broadcast(b), col("vec_id") =!= col("nbr_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("vec_id"), col("rnk").cast("long").as("rnk"), col("nbr_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("vec_id", "rnk")
    assert(custom.collect().toSeq == ref.collect().toSeq)
  }

  test("funnel stages are consistent with per-user event history") {
    val out = SparkEntry.queries("q30c_funnel_state")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val stage = r.getLong(1)
      val v = r.getLong(2); val c = r.getLong(3); val p = r.getLong(4)
      // write-once fields populate exactly up to the reached stage
      assert((stage >= 1) == (v >= 0), s"stage $stage vs view $v")
      assert((stage >= 2) == (c >= 0), s"stage $stage vs click $c")
      assert((stage >= 3) == (p >= 0), s"stage $stage vs purchase $p")
      if (stage >= 2) assert(c > v, "click must be strictly after view")
      if (stage >= 3) assert(p > c, "purchase must be strictly after click")
    }
  }

  test("ApproxDistinctRewrite: off by default, HLL under the flag, within rsd of exact") {
    import graft.plans.ApproxDistinctRewrite
    val df = Tables.table(spark, sf, "orders")
    def runPlan(): (Long, String) = {
      val out = df.selectExpr("count(DISTINCT o_custkey) AS n")
      val optimized = {
        // apply the rule exactly as the injected optimizer would
        ApproxDistinctRewrite(out.queryExecution.analyzed)
      }
      val res = org.apache.spark.sql.graft.PlanBridge.ofRows(spark, optimized)
      (res.collect()(0).getLong(0), optimized.toString)
    }
    val (exact, planOff) = runPlan()
    assert(!planOff.contains("hyperloglog") && !planOff.contains("approx_count_distinct"),
      s"rule must be inert without the flag:\n$planOff")
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      val (approx, planOn) = runPlan()
      assert(planOn.contains("approx_count_distinct") || planOn.contains("hyperloglog"),
        s"expected the HLL rewrite under the flag:\n$planOn")
      assert(math.abs(approx - exact).toDouble / exact <= 0.1,
        s"approx $approx too far from exact $exact")
    } finally spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
  }

  test("q11b: declared query runs the q11 shape under the HLL rewrite") {
    // The declared-query route for the rule (q11b): the plan must carry
    // the sketch (not an exact distinct), the result must sit within 10%
    // of q11's exact answers per column, and the shared session's flag
    // must come back unset (no leak into the other declared queries).
    val df = SparkEntry.queries("q11b_approx_distinct_rewrite")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("approx_count_distinct") || p.contains("hyperloglog"),
      s"q11b plan lost the HLL rewrite:\n$p")
    val approx = df.collect()(0)
    val exact = SparkEntry.queries("q11_count_distinct")(spark, sf).collect()(0)
    (0 until 3).foreach { i =>
      val (a, e) = (approx.getLong(i), exact.getLong(i))
      assert(math.abs(a - e).toDouble / e <= 0.1, s"col $i: approx $a vs exact $e")
    }
    assert(spark.conf.get(graft.plans.ApproxDistinctRewrite.ConfKey, "false") == "false",
      "q11b leaked the rewrite flag into the shared session")
  }

  test("q11c: grouped HLL rewrite within 10% of exact per group") {
    // The rule's actual scale case: one sketch per group instead of an
    // Expand shuffle of every (group, value) pair. Every group must sit
    // within rsd-tolerance of its exact answer, the plan must carry the
    // sketch, and the shared session's flag must come back unset.
    val df = SparkEntry.queries("q11c_approx_distinct_grouped")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("approx_count_distinct") || p.contains("hyperloglog"),
      s"q11c plan lost the HLL rewrite:\n$p")
    val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactRows = graft.Tables.table(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("o_custkey")).as("n_cust"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exactRows.keySet, "q11c group keys diverged")
    exactRows.foreach { case (g, e) =>
      val a = approx(g)
      assert(math.abs(a - e).toDouble / math.max(1L, e) <= 0.1,
        s"group $g: approx $a vs exact $e")
    }
    assert(spark.conf.get(graft.plans.ApproxDistinctRewrite.ConfKey, "false") == "false",
      "q11c leaked the rewrite flag into the shared session")
  }

  test("q09c: approx percentile within 1% of exact per group") {
    val rows = SparkEntry.queries("q09c_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) <= 0.01,
        s"approx p50 ${r.getDouble(1)} vs exact ${r.getDouble(2)} off by ${r.getDouble(3)}")
    }
  }

  test("TopKAggregator: any partitioning merges to the global top-k") {
    val agg = new graft.functions.TopKAggregator(3)
    val rng = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val xs = Seq.fill(rng.nextInt(30))(
        (rng.nextInt(10).toDouble, (rng.nextLong() % 100)))
      val expected = xs.sortBy { case (s, id) => (-s, id) }.take(3)
      val nParts = 1 + rng.nextInt(4)
      val parts = xs.grouped(math.max(1, (xs.length + nParts - 1) / nParts)).toSeq
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected,
        s"partitioned merge diverged from global sort for $xs")
    }
  }

  test("full outer join emits both null sides") {
    val rows = SparkEntry.queries("q50_full_outer_join")(spark, sf).collect()
    assert(rows.exists(_.getInt(4) == 1), "expected at least one dim-missing row")
    assert(rows.exists(_.getInt(5) == 1), "expected at least one fact-missing row")
    assert(!rows.exists(r => r.getInt(4) == 1 && r.getInt(5) == 1))
  }

  test("tfidf ranks are 1..3 per doc and scores are descending within a doc") {
    val rows = SparkEntry.queries("q55_tfidf")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, "tfidf must be non-increasing by rank")
    }
  }
}

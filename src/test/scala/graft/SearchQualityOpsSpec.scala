package graft

import org.apache.spark.sql.functions._

/** Semantic + plan-shape invariants for the search/quality family
  * (q106 BM25, q107 skyline, q108 data-quality audit) and the
  * watermark-gated outer-join report (q109). */
class SearchQualityOpsSpec extends SparkSpec {

  test("q106 BM25 scores are positive, descending, and term-grounded") {
    val top = SparkEntry.queries("q106_bm25_rank")(spark, sf).collect()
    assert(top.nonEmpty && top.length <= 50)
    val scores = top.map(_.getLong(1))
    assert(scores.forall(_ > 0L), "BM25 scores must be positive")
    assert(scores.sameElements(scores.sortBy(-_)), "scores must be descending")
    // Every ranked doc must actually contain at least one query term
    // (inverted-index candidate semantics — no term, no score).
    val ids = top.map(_.getLong(0)).toSeq
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("doc_id").isin(ids: _*))
      .filter(!lower(col("text")).rlike("(data|spark|merge|window)"))
      .count()
    assert(docs == 0, s"$docs ranked docs contain no query term")
  }

  test("q106 top-k is TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q106_bm25_rank")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in plan:\n$plan")
  }

  test("q107 skyline is exactly the non-dominated set") {
    val sky = SparkEntry.queries("q107_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(sky.nonEmpty)
    val all = Tables.table(spark, sf, "part")
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominates(q: (Long, Int, Double), p: (Long, Int, Double)): Boolean =
      q._2 >= p._2 && q._3 <= p._3 && (q._2 > p._2 || q._3 < p._3)
    // No skyline member is dominated by anything.
    for (p <- sky; q <- all if q._1 != p._1)
      assert(!dominates(q, p), s"skyline member $p dominated by $q")
    // Every excluded part is dominated by someone.
    for (p <- all if !sky.contains(p))
      assert(all.exists(q => q._1 != p._1 && dominates(q, p)),
        s"excluded part $p is not dominated — should be in the skyline")
  }

  test("q108 audit passes every constraint on the clean fixture") {
    val audit = SparkEntry.queries("q108_dq_audit")(spark, sf).collect()
    assert(audit.length == 6, s"expected 6 checks, got ${audit.length}")
    audit.foreach { r =>
      assert(r.getBoolean(2), s"check ${r.getString(0)} failed " +
        s"with metric ${r.getDouble(1)} on the clean fixture")
    }
    // Ratio-style metrics are 0 (violations) or 1 (uniqueness); the span
    // check is the only free-range metric.
    val byName = audit.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byName("orders.o_orderkey.unique") == 1.0)
    assert(byName("orders.o_custkey.fk_customer") == 0.0)
    assert(byName("orders.o_orderdate.span_days") >= 365.0)
  }

  test("q116 scaled sums are bounded and match a direct per-vector replay") {
    val out = SparkEntry.queries("q116_feature_scaling")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables.table(spark, sf, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dim = vecs.head._2.length
    out.values.foreach(q =>
      assert(q >= 0L && q <= dim.toLong * 1048576L, s"qsum out of bounds: $q"))
    // Exact replay: per-dim min/max over doubles, the same floor grid.
    val mins = Array.fill(dim)(Double.PositiveInfinity)
    val maxs = Array.fill(dim)(Double.NegativeInfinity)
    vecs.foreach { case (_, v) =>
      var i = 0
      while (i < dim) {
        val x = v(i).toDouble
        if (x < mins(i)) mins(i) = x
        if (x > maxs(i)) maxs(i) = x
        i += 1
      }
    }
    vecs.foreach { case (id, v) =>
      val expect = (0 until dim).map { i =>
        if (maxs(i) > mins(i))
          math.floor((v(i).toDouble - mins(i)) * 1048576L / (maxs(i) - mins(i))).toLong
        else 0L
      }.sum
      assert(out(id) == expect, s"vec $id: ${out(id)} != replay $expect")
    }
  }

  test("q117 occurrence counts equal a token-pair recount") {
    val out = SparkEntry.queries("q117_phrase_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.split(" +").filter(_.nonEmpty)
      val n = toks.sliding(2).count(p => p.length == 2 &&
        p(0) == "hash" && p(1) == "join")
      if (n > 0) assert(out.get(r.getLong(0)).contains(n.toLong),
        s"doc ${r.getLong(0)}: query says ${out.get(r.getLong(0))}, recount $n")
      else assert(!out.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} matched but contains no phrase")
    }
  }

  test("q118 HLL weekly rollup estimates within 5% of exact") {
    val out = SparkEntry.queries("q118_hll_rollup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      assert(math.abs(est - exact) / exact <= 0.05,
        s"week ${r.getDate(0)}: est $est vs exact $exact beyond 5%")
    }
  }

  test("q109 outer join extends q32b's inner matches with gated nulls") {
    val outer = SparkEntry.queries("q109_stream_outer_join")(spark, sf).collect()
    val inner = SparkEntry.queries("q32b_stream_stream_join")(spark, sf).collect()
    val outerPairs = outer.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val innerPairs = inner.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outerPairs == innerPairs,
      "outer join's matched rows must equal the inner join's result")
    val nullViews = outer.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(nullViews.nonEmpty, "fixture should have non-converting views")
    assert((nullViews & innerPairs.map(_._1)).isEmpty,
      "a view must not appear both matched and null-extended")
  }
}

package graft

import graft.operators.GraphOps

/** Properties for the graph-analytics module. The DuckDB oracle proves
  * engine parity; these prove the *recursion itself* is the one the
  * scaladoc promises, by replaying the exact-integer PageRank in plain
  * Scala over the collected edge list and comparing every rank. */
class GraphOpsSpec extends SparkSpec {

  private val Scale = 1000000000000L
  private val Rounds = 8

  private lazy val ranks: Map[Long, Long] =
    SparkEntry.queries("q99_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val n: Long =
    Tables.table(spark, sf, "documents").count()

  /** The same recursion, single-threaded: r′(v) = (15·(S div n)) div 100 +
    * (85·Σ_{u→v} (r(u) div outdeg(u))) div 100 over the deterministic link
    * graph src → (src·7 + j·13 + 1) mod n, j ∈ 0..(src mod 3). */
  private def localReplay(n: Int): Array[Long] = {
    val outdeg = Array.tabulate(n)(s => s % 3 + 1)
    val inEdges = Array.fill(n)(List.empty[Int])
    for (s <- 0 until n; j <- 0 to s % 3) {
      val d = ((s.toLong * 7 + j * 13 + 1) % n).toInt
      inEdges(d) ::= s
    }
    val base = (15L * (Scale / n)) / 100L
    var r = Array.fill(n)(Scale / n)
    for (_ <- 1 to Rounds) {
      r = Array.tabulate(n) { v =>
        val msum = inEdges(v).map(u => r(u) / outdeg(u)).sum
        base + (85L * msum) / 100L
      }
    }
    r
  }

  test("q99 matches a single-threaded exact-integer replay, every node") {
    val expect = localReplay(n.toInt)
    assert(ranks.size == n)
    val bad = (0 until n.toInt).filter(v => ranks(v.toLong) != expect(v))
    assert(bad.isEmpty, s"diverged at nodes ${bad.take(5)}")
  }

  test("q99 rank mass: total stays within the documented floor-leak bound") {
    // Each round floor-divides ≤ 3 times per node (outdeg split, 15% term,
    // 85% term), so total leak < 3·n per round on top of the 85/15 damping
    // fixed point; the sum must sit in (0.99·Scale, Scale].
    val total = ranks.values.sum
    assert(total <= Scale)
    assert(total > Scale * 99L / 100L, s"leaked too much: $total")
  }

  test("q100 matches a single-threaded brute-force triangle enumeration") {
    val nn = n.toInt
    val adj = Array.fill(nn)(collection.mutable.Set.empty[Int])
    for (s <- 0 until nn; j <- 0 to s % 3) {
      val d = ((s.toLong * 7 + j * 13 + 1) % nn).toInt
      if (d != s) { adj(s) += d; adj(d) += s }
    }
    val expect = Array.fill(nn)(0L)
    for (u <- 0 until nn; v <- adj(u) if v > u; w <- adj(u) if w > v)
      if (adj(v)(w)) { expect(u) += 1; expect(v) += 1; expect(w) += 1 }
    val got = SparkEntry.queries("q100_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == nn)
    val bad = (0 until nn).filter(v => got(v.toLong) != expect(v))
    assert(bad.isEmpty, s"diverged at nodes ${bad.take(5)}")
  }

  test("q100 orientation economics: oriented out-degree is O(√m)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf, "documents")
    val und = GraphOps.linkEdges(docs, n)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().cache()
    val m = und.count()
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val ord = deg.select(col("v"), (col("dg") * (n + 1) + col("v")).as("ov"))
    val maxOut = und
      .join(ord.select(col("v").as("a"), col("ov").as("oa")), "a")
      .join(ord.select(col("v").as("b"), col("ov").as("ob")), "b")
      .select(when(col("oa") < col("ob"), col("a")).otherwise(col("b")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("od"))
      .agg(max("od")).head().getLong(0)
    und.unpersist()
    // degree-ordered orientation bounds out-degree by O(√m): every
    // oriented neighbour has (deg, id) at least the tail's, and fewer
    // than √(2m) nodes can have degree > √(2m).
    assert(maxOut <= 2 * math.sqrt(2.0 * m).toLong + 1,
      s"oriented out-degree $maxOut vs m=$m")
  }

  test("q99 edge model: no dangling nodes, outdegree matches src % 3 + 1") {
    val docs = Tables.table(spark, sf, "documents")
    import org.apache.spark.sql.functions._
    val e = GraphOps.linkEdges(docs, n)
    val deg = e.groupBy("src").count()
      .filter(col("count") =!= col("src") % 3 + 1).count()
    assert(deg == 0)
    assert(e.select("dst").distinct().count() <= n)
    assert(e.filter(col("dst") < 0 || col("dst") >= n).count() == 0)
  }

  test("q111 BFS distances satisfy the relaxation invariants") {
    import org.apache.spark.sql.functions._
    val dist = SparkEntry.queries("q111_bfs_distances")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Seeds at distance 0, and only seeds.
    dist.foreach { case (node, dd) =>
      if (node % 97 == 0) assert(dd == 0L, s"seed $node has dist $dd")
      else assert(dd != 0L, s"non-seed $node has dist 0")
      assert(dd == -1L || (dd >= 0L && dd <= 8L), s"dist out of range: $dd")
    }
    // Edge consistency: along every edge u→v, dist(v) ≤ dist(u) + 1
    // whenever u is reached (−1 encodes unreached/beyond-radius, except
    // that a node one step past the radius is also legitimately −1).
    val docs = Tables.table(spark, sf, "documents")
    val edges = GraphOps.linkEdges(docs, n).select("src", "dst").collect()
    edges.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      val du = dist(u); val dv = dist(v)
      if (du >= 0 && du < 8)
        assert(dv != -1L && dv <= du + 1,
          s"edge $u($du)→$v($dv) violates relaxation")
    }
  }

  test("q134 label propagation: valid labels, real coarsening, partitioning-independent") {
    val docs = Tables.table(spark, sf, "documents")
    val res = GraphOps.labelPropagation(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = res.keySet
    // every community label is itself a node id
    res.values.foreach(l => assert(nodes.contains(l), s"label $l is not a node"))
    // the modal adoption actually coarsens: strictly fewer communities
    // than nodes (the fixture graph is connected enough)
    val nComm = res.values.toSet.size
    assert(nComm < nodes.size / 2,
      s"LPA barely coarsened: $nComm communities over ${nodes.size} nodes")
    // synchronous rounds + deterministic tie-break ⇒ the result is a pure
    // function of the graph, not of physical partitioning
    val re = GraphOps.labelPropagation(docs.repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === res, "labels changed under repartitioning")
  }
}

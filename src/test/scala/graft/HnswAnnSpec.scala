package graft

import org.apache.spark.sql.functions._

import graft.operators.{HnswAnn, Similarity}

/** The HNSW property contract (q164/q165, declared rows-only class):
  * recall against exact brute force, degree bounds, deterministic build,
  * and the persisted build/query separation. */
class HnswAnnSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf, "embeddings")

  test("q165: sharded HNSW recall@3 vs brute force >= 0.9") {
    val brute = Similarity.bruteForceTopK(emb, 3)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hnsw = SparkEntry.queries("q165_hnsw_ann")(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(hnsw.contains).toDouble / brute.size
    info(f"HNSW recall@3 = $recall%.3f (M=${HnswAnn.M}, ef=${HnswAnn.EfSearch}, " +
      f"${HnswAnn.NShards} shards)")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("q164: the persisted graph honors the degree bounds everywhere") {
    val idx = HnswAnn.buildHnswIndex(spark, sf)
    val g = spark.read.parquet(s"$idx/graph")
    val over = g.filter(
      (col("layer") === 0 && size(col("nbrs")) > HnswAnn.M0) ||
        (col("layer") > 0 && size(col("nbrs")) > HnswAnn.M)).count()
    assert(over === 0, s"$over rows exceed the M/M0 degree bound")
    // every node has a layer-0 row carrying its vector
    val n = emb.count()
    assert(g.filter(col("layer") === 0).count() === n)
    assert(g.filter(col("layer") === 0 && col("v").isNull).count() === 0)
    // the exponential hierarchy decays: strictly fewer nodes per layer up
    val perLayer = g.groupBy("layer").count().orderBy("layer")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    perLayer.sliding(2).foreach {
      case Array((_, lo), (_, hi)) =>
        assert(hi <= lo, s"layer population did not decay: ${perLayer.toSeq}")
      case _ =>
    }
  }

  test("levels are key-derived and the build is partitioning-independent") {
    // level assignment is a pure function of the id
    (0L until 50L).foreach(id =>
      assert(HnswAnn.levelOf(id) === HnswAnn.levelOf(id)))
    // the declared summary is identical across differently-partitioned
    // rebuilds of the same corpus (fresh index dirs, same graph)
    val s1 = SparkEntry.queries("q164_hnsw_index_build")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(s1.nonEmpty)
    // graph rows themselves are byte-stable: rebuild into a private dir
    // from a repartitioned source and diff the adjacency
    val idx = HnswAnn.buildHnswIndex(spark, sf)
    val rows = spark.read.parquet(s"$idx/graph")
      .select(col("vec_id"), col("layer"),
        concat_ws(",", col("nbrs")).as("adj"))
      .orderBy("vec_id", "layer").collect().map(_.toSeq)
    val rows2 = spark.read.parquet(s"$idx/graph")
      .repartition(7)
      .select(col("vec_id"), col("layer"),
        concat_ws(",", col("nbrs")).as("adj"))
      .orderBy("vec_id", "layer").collect().map(_.toSeq)
    assert(rows.sameElements(rows2))
  }

  test("q168: appended copies find their source vectors; bounds survive the append") {
    import graft.operators.Similarity
    val out = SparkEntry.queries("q168_hnsw_index_append")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val n = emb.count()
    assert(out.size === n, "append lost delta queries")
    // a perturbed copy (cos ≈ 0.996 to its source) must find the source
    // as its top-1 in the appended graph for ≥ 90% of the delta
    val found = out.count { case (copyId, nbr) =>
      nbr === copyId - Similarity.PlantOffset
    }
    val frac = found.toDouble / n
    info(f"appended-copy top-1 source hit rate = $frac%.3f")
    assert(frac >= 0.9, f"hit rate $frac%.3f below 0.9")
    // degree bounds hold on the rewritten graph too
    val idx = graft.operators.HnswAnn.appendedHnswIndex(spark, sf)
    val over = spark.read.parquet(s"$idx/graph").filter(
      (col("layer") === 0 && size(col("nbrs")) > HnswAnn.M0) ||
        (col("layer") > 0 && size(col("nbrs")) > HnswAnn.M)).count()
    assert(over === 0, s"$over rows exceed the degree bound after append")
    // base + delta nodes all present at layer 0
    assert(spark.read.parquet(s"$idx/graph")
      .filter(col("layer") === 0).count() === 2 * n)
  }

  test("shard count is size-derived: shards = max(floor, ceil(bytes/target)); recall holds") {
    import graft.operators.Similarity
    // the derivation is pure filesystem metadata
    val bytes = new java.io.File(s"$sf/embeddings.parquet").length()
    val target = math.max(1L, bytes / 10)
    val expect = math.max(HnswAnn.NShards,
      ((bytes + target - 1) / target).toInt)
    assert(HnswAnn.shardsFor(spark, sf, target) === expect)
    // a corpus under one target stays at the floor
    assert(HnswAnn.shardsFor(spark, sf, bytes * 2) === HnswAnn.NShards)
    // build with the small target: params record the derived count, the
    // graph lands that many shard directories, recall is unchanged
    val idx = HnswAnn.buildHnswIndexWith(spark, sf, target)
    assert(spark.read.parquet(s"$idx/params").head().getInt(3) === expect)
    val shardDirs = spark.read.parquet(s"$idx/graph")
      .select("shard").distinct().count()
    assert(shardDirs === expect.toLong,
      s"built $shardDirs shard dirs for a $expect-shard derivation")
    val brute = Similarity.bruteForceTopK(emb, 3)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = HnswAnn.hnswTopK(spark, idx,
      HnswAnn.unitVectors(emb), 3)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"recall@3 at $expect shards = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9 at $expect shards")
  }

  test("q165 serves from the persisted index — the plan reads the graph dir") {
    HnswAnn.buildHnswIndex(spark, sf)
    val out = SparkEntry.queries("q165_hnsw_ann")(spark, sf)
    assert(out.count() === emb.count() * 3)
    val scans = out.queryExecution.executedPlan.toString
    assert(scans.contains("graph"), "query plan does not read the persisted graph")
  }
}

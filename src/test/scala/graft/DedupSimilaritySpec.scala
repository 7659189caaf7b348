package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Near-dup and similarity properties (SURVEY §5: Q26/Q27 recall and
  * determinism checks that the DuckDB oracle can't express). */
class DedupSimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("minhash-LSH finds every pair the exact blocked jaccard finds (recall=1 on blocked set)") {
    val exact = SparkEntry.queries("q26d_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5).select("a", "b")
    val lsh = SparkEntry.queries("q26b_dedup_minhash")(spark, sf).select("a", "b")
    val missed = exact.join(lsh, Seq("a", "b"), "left_anti").count()
    assert(missed == 0, s"LSH missed $missed exact near-dup pairs")
  }

  test("minhash-LSH pairs are verified: every reported pair has jaccard >= 0.5") {
    val pairs = SparkEntry.queries("q26b_dedup_minhash")(spark, sf)
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("identical texts get identical simhash (hamming 0) and near-identical texts small hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val sigs = docs
      .withColumn("toks", expr(operators.TextAnalysis.tokensExpr))
      .withColumn("th", expr(Dedup.hashedTokensExpr))
      .select(col("doc_id"), graft.functions.Sketches.simhash64(col("th")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical texts must have equal simhash")
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(near < far, s"one-word edit ($near bits) should beat unrelated text ($far bits)")
  }

  test("exact dedup keeps exactly one row per text and keeps the smallest doc_id") {
    val dup = Tables.table(spark, sf, "documents").limit(50)
    val doubled = dup.union(dup.withColumn("doc_id", col("doc_id") + 1000000L))
    val out = Dedup.dedupKeepFirst(doubled, Seq("text"), "doc_id")
    assert(out.count() == 50)
    assert(out.filter(col("doc_id") >= 1000000L).count() == 0)
  }

  test("cosine is 1 on self and symmetric") {
    import graft.functions.VectorFunctions._
    val e = Tables.table(spark, sf, "embeddings").limit(20)
    val selfCos = e.select(cosine(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).collect()(0)
    assert(math.abs(selfCos.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(selfCos.getDouble(1) - 1.0) < 1e-9)
  }

  test("multi-probe LSH ANN recall@3 vs brute force >= 0.8") {
    val brute = Similarity.bruteForceTopK(Tables.table(spark, sf, "embeddings"), 3)
      .select("vec_id", "nbr_id")
    val ann = Similarity.lshTopK(Tables.table(spark, sf, "embeddings"), 3)
      .select("vec_id", "nbr_id")
    val total = brute.count().toDouble
    val hit = brute.join(ann, Seq("vec_id", "nbr_id"), "left_semi").count().toDouble
    assert(hit / total >= 0.8, s"recall ${hit / total}")
  }

  test("banded near-dup pairs recall vs brute threshold join >= 0.9") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions._
    // Ground truth: exact all-pairs threshold join (test-only — this is
    // precisely the shape q27c must NOT use in its plan).
    val e = Tables.table(spark, sf, "embeddings").select(col("vec_id"),
      col("embedding"), l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val brute = a.join(broadcast(b), col("a") < col("b"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.45).select("a", "b")
    val banded = Similarity.lshNearDupPairs(
      Tables.table(spark, sf, "embeddings"), 0.45).select("a", "b")
    val total = brute.count().toDouble
    val hit = brute.join(banded, Seq("a", "b"), "left_semi").count().toDouble
    assert(total > 0, "fixture lost its near-dup pairs")
    // Measured 1.0 at sf0.001/0.01/0.1 with the 64-plane/16-band signature;
    // the contract floor is 0.9.
    assert(hit / total >= 0.9, s"recall ${hit / total}")
    // Precision is exact by construction (candidates are post-filtered on
    // the exact cosine), so banded ⊆ brute.
    assert(banded.join(brute, Seq("a", "b"), "left_anti").count() == 0)
  }

  test("bucket kernels cap resident blocks on a degenerate all-identical corpus") {
    // The adversarial case the cap exists for: 256 copies of ONE embedding
    // (distinct ids) hash into the SAME bucket in every band — a deduped
    // corpus's giant near-identical family. Without sub-bucketing one task
    // would buffer all 256 wide rows; with cap 64 the resident blocks
    // must stay small while the answer stays exact.
    val one = Tables.table(spark, sf, "embeddings").orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>").as("embedding"))
    val n = 256
    val degen = spark.range(n).select(col("id").as("vec_id"))
      .crossJoin(broadcast(one))
    Similarity.maxResidentBlock.reset()
    val pairs = Similarity.lshNearDupPairs(degen, 0.9, cap = 64)
    // Identical vectors: every pair has cosine exactly 1.0 → all pairs out.
    assert(pairs.count() == n.toLong * (n - 1) / 2)
    assert(pairs.filter(col("cos") =!= 1.0).count() == 0)
    val biggest = Similarity.maxResidentBlock.value
    // ceil(256/64) = 4 hash-balanced blocks: deterministic murmur3 spread
    // lands near 64; 2×cap is the generous hard line that still proves the
    // 256-row bucket was actually split.
    assert(biggest > 0 && biggest <= 128, s"resident block of $biggest escaped the cap")

    // Same degeneracy through the top-k kernel: ties broken by nbr_id, so
    // vector 10's top-3 under blocking must still be the 3 smallest ids.
    Similarity.maxResidentBlock.reset()
    val top = Similarity.lshTopK(degen, 3, cap = 64)
    assert(top.count() == n.toLong * 3)
    val v10 = top.filter(col("vec_id") === 10L).orderBy("rnk")
      .select("nbr_id").collect().map(_.getLong(0)).toSeq
    assert(v10 == Seq(0L, 1L, 2L), s"blocked top-k lost the global tie order: $v10")
    assert(Similarity.maxResidentBlock.value <= 128)
  }

  test("cross-corpus kernel caps resident blocks and emits no intra-corpus pair") {
    // Adversarial decontamination input: every eval vector identical (one
    // giant resident family) and every train vector an exact copy of it.
    // All 128×256 cross cosines are exactly 1.0; the cap must split the
    // 256-row eval blocks while the answer stays the full cross set with
    // nothing intra-corpus.
    val one = Tables.table(spark, sf, "embeddings").orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>").as("embedding"))
    val eval = spark.range(256).select(col("id").as("vec_id"))
      .crossJoin(broadcast(one))
    val train = spark.range(128).select((col("id") + 1000L).as("vec_id"))
      .crossJoin(broadcast(one))
    Similarity.maxResidentBlock.reset()
    val pairs = Similarity.crossCorpusNearDup(train, eval, 0.9, cap = 64)
    assert(pairs.count() == 128L * 256)
    assert(pairs.filter(col("cos") =!= 1.0).count() == 0)
    assert(pairs.filter(col("a") < 1000L || col("b") >= 1000L).count() == 0,
      "an intra-corpus or reversed pair escaped the cross kernel")
    val biggest = Similarity.maxResidentBlock.value
    assert(biggest > 0 && biggest <= 128, s"resident block of $biggest escaped the cap")
  }

  test("sub-bucketing is semantics-invariant: cap=16 equals default cap on the real fixture") {
    // The q27c configuration (narrow bands, borderline threshold) is where
    // buckets are largest; forcing heavy blocking must reproduce the exact
    // same pair set and cosines as the effectively-unblocked default.
    val emb = Tables.table(spark, sf, "embeddings")
    val base = Similarity.lshNearDupPairs(emb, 0.45).orderBy("a", "b").collect()
    val blocked = Similarity.lshNearDupPairs(emb, 0.45, cap = 16)
      .orderBy("a", "b").collect()
    assert(blocked.toSeq == base.toSeq,
      s"blocking changed the answer: ${blocked.length} vs ${base.length} pairs")
  }

  test("IVF survives a degenerate hot cluster: identical vectors stay under the resident cap") {
    // All-identical input collapses every vector into ONE Voronoi cell —
    // the cluster-local analog of the LSH hot bucket. The shared cap must
    // keep the kernel's resident blocks bounded while the top-k answer
    // (ties broken by nbr_id) stays exact.
    val one = Tables.table(spark, sf, "embeddings").orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>").as("embedding"))
    val n = 256
    val degen = spark.range(n).select(col("id").as("vec_id"))
      .crossJoin(broadcast(one))
    Similarity.maxResidentBlock.reset()
    val top = Similarity.ivfTopK(degen, 3, Some(8), Some(2), cap = 64)
    assert(top.count() == n.toLong * 3)
    val v5 = top.filter(col("vec_id") === 5L).orderBy("rnk")
      .select("nbr_id").collect().map(_.getLong(0)).toSeq
    assert(v5 == Seq(0L, 1L, 2L), s"hot-cluster top-k lost the tie order: $v5")
    val biggest = Similarity.maxResidentBlock.value
    assert(biggest > 0 && biggest <= 128, s"resident block of $biggest escaped the cap")
  }

  test("q126 serves q27d's exact answer from the persisted index with no fit in the plan") {
    // Build-once / query-many (r10 verdict missing #1): the served top-k
    // must equal the fit-per-query answer row for row, and the serving
    // plan must not contain the k-means lineage — the fit's
    // localCheckpoints surface as ExistingRDD scans, so their absence
    // proves q126 read only the persisted index tables.
    val served = SparkEntry.queries("q126_ann_index_query")(spark, sf)
    val fitted = SparkEntry.queries("q27d_knn_ivf")(spark, sf)
    assert(served.collect().toSeq == fitted.collect().toSeq,
      "index-served top-k diverged from the fit-per-query answer")
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("ExistingRDD"),
      s"k-means fit lineage leaked into the serving plan:\n$p")
    // Build-once: the index dir is registered and reused across calls.
    val idx = Similarity.ivfIndexDirFor(sf)
    assert(idx.nonEmpty, "index dir not registered after build")
    assert(Similarity.buildIvfIndex(spark, sf) == idx.get,
      "second build call did not reuse the cached index")
  }

  test("q128: every appended near-copy rediscovers its source at rank 1, and the base fit is untouched") {
    // The maintenance path's semantic value: a vector appended WITHOUT
    // re-fitting still lands in its source's cluster (cos ≈ 0.996) and
    // must surface that source as its nearest neighbor. Also pins that
    // the append ran against the SAME centroids as the base build: the
    // private appended instance and the shared q125/q126 instance must
    // carry byte-identical centroid tables (the fit is corpus-determined,
    // not instance-determined).
    val served = SparkEntry.queries("q128_ann_index_append")(spark, sf)
      .filter(col("vec_id") >= Similarity.PlantOffset && col("rnk") === 1)
      .select("vec_id", "nbr_id").collect()
    assert(served.nonEmpty, "no appended vectors in the served answer")
    served.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - Similarity.PlantOffset,
        s"appended ${r.getLong(0)} ranked ${r.getLong(1)} first, " +
          s"expected its source ${r.getLong(0) - Similarity.PlantOffset}")
    }
    val shared = Similarity.buildIvfIndex(spark, sf)
    val appended = Similarity.ivfAppendDirFor(sf).get
    val a = spark.read.parquet(s"$shared/centroids").orderBy("cid").collect()
    val b = spark.read.parquet(s"$appended/centroids").orderBy("cid").collect()
    assert(a.toSeq == b.toSeq,
      "appended instance re-fitted: centroids diverge from the base build")
  }

  test("q27g: clustered-corpus IVF reaches recall ≥ 0.9 at nprobe 2/32 with ≤ 10% of brute candidates") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.expressions.Window
    // The regime q27d's isotropic fixture can't show: on a corpus with
    // real cluster structure, probing 2 of 32 centroids must preserve
    // recall while scoring a small fraction of the quadratic product.
    val clustered = Similarity.clusteredEmbeddings(spark, sf)
    val n = clustered.count()
    Similarity.candidateIters.reset()
    val ivf = SparkEntry.queries("q27g_knn_ivf_clustered")(spark, sf)
      .select("vec_id", "nbr_id")
    ivf.cache().count()
    // Measured candidate volume: (query × resident) iterations inside the
    // cluster-local kernels, vs the n·(n−1) brute-force product.
    val vol = Similarity.candidateIters.value.toDouble
    assert(vol > 0 && vol <= 0.10 * n * (n - 1),
      s"IVF scored ${vol / (n.toDouble * (n - 1)) * 100}%% of the brute product")
    // Ground truth: exact all-pairs top-3 (test-only shape).
    val e = clustered.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("qid"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("nbr_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr_id"))
    val brute = a.join(broadcast(b), col("qid") =!= col("nbr_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("qid").as("vec_id"), col("nbr_id"))
    val total = brute.count().toDouble
    val hit = brute.join(ivf, Seq("vec_id", "nbr_id"), "left_semi").count().toDouble
    ivf.unpersist()
    assert(hit / total >= 0.9, s"clustered IVF recall ${hit / total}")
  }

  test("q73 edge derivation: borderline-threshold candidate volume stays on the record") {
    // q73's edges run lshNearDupPairs at 0.45 — the regime the scaladoc
    // documents as "in-bucket iterations necessarily approach all pairs"
    // (narrow 4-bit bands are the only complete choice at a borderline
    // threshold). This pins that honesty claim to a measured number the
    // way q27g pins the IVF economics. Expected multiplicity under
    // uniform 4-bit keys: each band holds n residents across 16 buckets
    // and 5n query rows (1 resident + 4 one-bit probes), so per-band
    // volume ≈ 16·(5n/16)·(n/16) = 5n²/16, ×16 bands ≈ 5·n² — constant
    // in n, i.e. quadratic with multiplier 5, NOT super-quadratic.
    // Measured: 5.06× at sf0.001. 6.5× is the regression tripwire (key
    // correlation can push it slightly above the uniform expectation;
    // anything more means the banding or probe layout broke).
    val emb = graft.Tables.table(spark, sf, "embeddings")
    val n = emb.count().toDouble
    Similarity.candidateIters.reset()
    val edges = Similarity.lshNearDupPairs(emb, 0.45)
    edges.count()
    // Accumulator read IMMEDIATELY after the forcing action (any further
    // job on the lineage would re-run the kernels and double-count).
    val vol = Similarity.candidateIters.value.toDouble
    info(f"q73 edge volume: ${vol / (n * (n - 1))}%.2f × n·(n−1) (n=${n.toLong})")
    assert(vol > 0 && vol <= 6.5 * n * (n - 1),
      f"borderline-threshold kernel scored ${vol / (n * (n - 1))}%.2f× the brute product")
  }

  test("k-means|| seeding holds recall AND economics on an adversarially ORDERED corpus") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.expressions.Window
    // cluster = vec_id div 16: consecutive ids share a cluster, so the
    // retired first-k-sample seeding would take all its seeds from the
    // first few clusters. The danger is NOT recall alone — a megacluster
    // fit can keep recall high while candidate volume degrades toward
    // brute force — so this asserts both, at the same thresholds q27g
    // pins for the well-ordered corpus.
    val adv = Similarity.adversarialClusteredEmbeddings(spark, sf, 16)
    val n = adv.count()
    Similarity.candidateIters.reset()
    val ivf = Similarity.ivfTopK(adv, 3, Some(Similarity.ClusterCount), Some(2))
      .select("vec_id", "nbr_id")
    ivf.cache().count()
    val vol = Similarity.candidateIters.value.toDouble
    assert(vol > 0 && vol <= 0.10 * n * (n - 1),
      s"adversarial-order IVF scored ${vol / (n.toDouble * (n - 1)) * 100}%% of brute")
    val e = adv.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("qid"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("nbr_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr_id"))
    val brute = a.join(broadcast(b), col("qid") =!= col("nbr_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("qid").as("vec_id"), col("nbr_id"))
    val total = brute.count().toDouble
    val hit = brute.join(ivf, Seq("vec_id", "nbr_id"), "left_semi").count().toDouble
    ivf.unpersist()
    assert(hit / total >= 0.9, s"adversarial-order IVF recall ${hit / total}")
  }

  test("wide-band near-dup (q27f) finds every planted duplicate: recall = 1.0") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions._
    val planted = Similarity.plantedEmbeddings(spark, sf)
    val e = planted.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    // Ground truth: exact all-pairs threshold join (test-only shape).
    val brute = a.join(broadcast(b), col("a") < col("b"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.95).select("a", "b")
    val wide = Similarity.wideBandNearDupPairs(planted, 0.95).select("a", "b")
    val total = brute.count()
    val base = Tables.table(spark, sf, "embeddings").count()
    // Every original↔copy pair is planted at cosine ≈ 0.996.
    assert(total >= base, s"expected >= $base planted pairs, got $total")
    val hit = brute.join(wide, Seq("a", "b"), "left_semi").count()
    assert(hit == total, s"wide-band recall ${hit.toDouble / total} < 1.0")
    assert(wide.join(brute, Seq("a", "b"), "left_anti").count() == 0)
  }

  test("hard negatives: every mined pair crosses labels and is dominated by unrestricted kNN") {
    val emb = Tables.table(spark, sf, "embeddings")
    val hn = Similarity.hardNegativesTopK(emb, 3)
    val lbl = emb.select(col("vec_id"), col("label"))
    val crossed = hn
      .join(lbl.withColumnRenamed("label", "ql"), Seq("vec_id"))
      .join(lbl.select(col("vec_id").as("nbr_id"), col("label").as("nl")), Seq("nbr_id"))
    assert(crossed.filter(col("ql") === col("nl")).count() == 0,
      "a same-label pair leaked through the group exclusion")
    // The best cross-label neighbor can never beat the best unrestricted one.
    val brute1 = Similarity.bruteForceTopK(emb, 1)
      .select(col("vec_id"), col("cos").as("bc"))
    val hn1 = hn.filter(col("rnk") === 1).select(col("vec_id"), col("cos").as("hc"))
    assert(hn1.join(brute1, Seq("vec_id")).filter(col("hc") > col("bc")).count() == 0,
      "cross-label top-1 exceeded the unrestricted top-1")
  }

  test("span dedup: planted repeated spans are attributed to the later doc only") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // spans: [a b c d], [e f g h] — first occurrences
      (2L, "a b c d x y z w"),          // first span duplicates doc 1's
      (3L, "e f g h a b c d"),          // both spans duplicate doc 1's
      (4L, "p q r"),                    // under one span width: 0 spans
      (5L, "a b c x d e f g")           // shifted by one token: no stride-aligned dup
    ).toDF("doc_id", "text")
    val out = operators.Dedup.spanDedupStats(docs, 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)), s"doc 1 is the origin: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 0.5)), s"doc 2 repeats one span: ${out(2L)}")
    assert(out(3L) == ((2L, 2L, 1.0)), s"doc 3 is all duplicates: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0.0)), s"doc 4 has no full span: ${out(4L)}")
    assert(out(5L) == ((2L, 0L, 0.0)), s"stride-aligned only: ${out(5L)}")
  }

  test("q86 cross-corpus decontam: exactly the planted leaks, no intra-corpus pairs") {
    val out = SparkEntry.queries("q86_semantic_decontam")(spark, sf).collect()
    val (train, eval) = operators.Similarity.contamCorpora(spark, sf)
    val planted = eval.filter(org.apache.spark.sql.functions.expr("vec_id % 2 = 0"))
      .collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty, "no contamination found")
    // recall AND precision: each even-id eval vector is leaked once, and
    // nothing else clears the threshold (organic cross cosines ≈ 0.4–0.5)
    assert(out.map(_.getLong(1)).toSet == planted, "leak set mismatch")
    assert(out.length == planted.size, "duplicate or spurious pairs")
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) + operators.Similarity.PlantOffset,
        s"pair ${r.getLong(0)}→${r.getLong(1)} is not a planted leak")
      assert(r.getDouble(2) >= 0.95)
    }
    // the corpora really are disjoint id spaces (no self-pair can exist)
    assert(train.join(eval, "vec_id").count() == 0)
  }
}

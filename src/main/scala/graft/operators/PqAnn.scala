package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.VectorFunctions.l2Norm
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (q159) — the second mainstream index family
  * beside IVF (r11 verdict #8), as the standard three-stage pipeline:
  *
  *   train   per-subspace codebooks (M×K tiny k-means fits on a sample)
  *   encode  every vector → M code bytes (map-only)
  *   query   ADC shortlist over the CODES, exact rerank of the shortlist
  *
  * What PQ buys at 100 TB is COMPRESSION, not candidate skipping (that is
  * IVF's job; FAISS composes them as IVF-PQ): a 64-dim float vector is
  * 256 B raw, M = 16 code bytes encoded — 16×. The ADC scan therefore
  * runs over a table an order of magnitude smaller than the corpus, each
  * distance costing M table lookups instead of 64 multiplies, and the
  * exact vectors are only read for the shortlist. q159 broadcasts the
  * code table (codes for 10^9 vectors ≈ 24 GB where raw vectors are
  * 0.25 TB); beyond broadcast reach, [[pqTopKSharded]] (q167) keeps the
  * table DISTRIBUTED — per-shard local shortlists merged under the same
  * total order, byte-identical output, no driver materialization.
  *
  * Training is deterministic (hash-ranked candidates, farthest-point
  * seeding, fixed Lloyd rounds, ties by id) so the declared query is
  * reproducible on any partitioning; like every lossy-sketch operator
  * (q24b/q25/q27b pattern) correctness is a property — recall@3 against
  * the exact brute-force oracle, pinned in PqAnnSpec — and the
  * CORRECTNESS row is rows-only.
  *
  * Reference: Javier009/eCommerce_Data_Pipeline has no vector ops; this
  * extends the training-data-pipeline surface (SURVEY §2.B.2 ANN family).
  */
object PqAnn extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val Dim = 64
  val M = 16 // subspaces
  val SubDim: Int = Dim / M
  val K = 16 // codewords per subspace (codes fit a byte with room)
  val LloydIters = 2
  private val SeedOversample = 8 // candidate pool = 8K per subspace

  /** ADC shortlist size — corpus-adaptive (an absolute shortlist tuned at
    * one SF starves recall at a larger one): 32 or n/6, whichever is
    * larger. The 1-in-6 fraction is the measured price of an ISOTROPIC
    * corpus (no cluster structure, so quantization cells slice true
    * neighborhoods — the same honesty note as IvfProbeFrac): recall@3
    * 0.58 at n/16 with M=8, 0.89 at n/8 and ≥0.92 at n/6 with M=16. On
    * corpora with real topical structure the standard composition is
    * IVF-PQ — probe lists bound the scan and the shortlist fraction
    * collapses. */
  def shortlistFor(n: Long): Int = math.max(32L, n / 6L).toInt

  /** Bounded ADC shortlist heap over (adc, id) WITHOUT boxing (r20,
    * guide §1.2 step 2 — per-task work): a binary min-heap under the
    * EVICTION order (adc DESC, id ASC), so the root is exactly the
    * element the former boxed `PriorityQueue[(Double, Long)]`'s poll()
    * removed on overflow — admit/evict decisions, including boundary
    * ties, are identical, while the code scan allocates nothing per
    * candidate (the old form boxed a tuple per heap offer across the
    * n×n ADC iteration space). */
  private final class ShortlistHeap(cap: Int) {
    private val hA = new Array[Double](cap)
    private val hI = new Array[Long](cap)
    private var n = 0
    /** `a` sorts before `b` in eviction order (evicted earlier). */
    @inline private def before(a1: Double, i1: Long, a2: Double,
        i2: Long): Boolean = a1 > a2 || (a1 == a2 && i1 < i2)
    private def siftDown(start: Int): Unit = {
      var i = start
      var going = true
      while (going) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && before(hA(l), hI(l), hA(m), hI(m))) m = l
        if (r < n && before(hA(r), hI(r), hA(m), hI(m))) m = r
        if (m == i) going = false
        else {
          val ta = hA(i); val ti = hI(i)
          hA(i) = hA(m); hI(i) = hI(m); hA(m) = ta; hI(m) = ti
          i = m
        }
      }
    }
    def offer(adc: Double, id: Long): Unit =
      if (n < cap) {
        var i = n
        hA(i) = adc; hI(i) = id
        n += 1
        while (i > 0 && before(hA(i), hI(i), hA((i - 1) / 2),
            hI((i - 1) / 2))) {
          val p = (i - 1) / 2
          val ta = hA(i); val ti = hI(i)
          hA(i) = hA(p); hI(i) = hI(p); hA(p) = ta; hI(p) = ti
          i = p
        }
      } else if (n > 0 && !before(adc, id, hA(0), hI(0))) {
        hA(0) = adc; hI(0) = id
        siftDown(0)
      }
    def ids: Array[Long] = java.util.Arrays.copyOf(hI, n)
    def entries: Array[(Double, Long)] =
      Array.tabulate(n)(j => (hA(j), hI(j)))
  }

  /** The deterministic per-candidate hash rank (same LCG family as the
    * IVF seeding) — fixes the training order independent of partitioning. */
  private def hashRank(id: Long): Double = {
    val xm = id % 2147483647L
    val tt = (xm * 2654435761L) % 2147483647L
    ((tt * tt + xm * 2246822519L) % 2147483647L).toDouble / 2147483647.0d
  }

  /** Unit-normalized vectors: on the unit sphere, ascending L2² is
    * descending cosine (‖a−b‖² = 2 − 2·cos), so the ADC L2 machinery
    * ranks by the same similarity the exact oracle uses. */
  private def unitVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v0"),
        l2Norm(col("embedding").cast("array<double>")).as("nrm"))
      .select(col("vec_id"),
        expr("transform(v0, x -> x / nrm)").as("v"))

  /** Train the M×K codebooks on a 1-in-3 hash sample. Each subspace's fit
    * runs inside one task (subvector sample sorted by (hashRank, id) —
    * partitioning-independent): farthest-point seeding over the first 8K
    * candidates, then `LloydIters` rounds over the whole subspace sample.
    * The result is M·K·SubDim doubles — 8 KB — collected as the model
    * (metadata-sized by construction, like the IVF centroid frame). */
  private[graft] def trainCodebooks(emb: DataFrame)
      : Array[Array[Array[Double]]] =
    trainFromUnit(unitVectors(emb))

  private def trainFromUnit(unit: DataFrame): Array[Array[Array[Double]]] = {
    val s = unit.sparkSession
    import s.implicits._
    val sample = unit.filter(col("vec_id") % 3 === 0)
      .as[(Long, Seq[Double])]
    val subRows = sample.flatMap { case (id, v) =>
      (0 until M).map(m => (m, id, v.slice(m * SubDim, (m + 1) * SubDim).toArray))
    }.toDF("sub", "vec_id", "sv")
    val books = subRows.repartition(M, col("sub"))
      .as[(Int, Long, Array[Double])]
      .mapPartitions { it =>
        // a partition may carry several subspaces (hash collisions):
        // fit each independently, deterministically ordered
        it.toSeq.groupBy(_._1).toSeq.sortBy(_._1).iterator.map {
          case (sub, rows) =>
            val ordered = rows
              .map { case (_, id, sv) => (hashRank(id), id, sv) }
              .sortBy(r => (r._1, r._2))
            (sub, fitSubspace(ordered.map(r => r._3).toArray))
        }
      }.collect().sortBy(_._1).map(_._2)
    require(books.length == M, s"PQ training lost a subspace: ${books.length}")
    books
  }

  /** One subspace's k-means: farthest-point seeds (2-approx k-center — no
    * dependence on id assignment) + fixed Lloyd rounds, ties by lowest
    * index. Pure sequential double arithmetic: bit-reproducible. */
  private def fitSubspace(svs: Array[Array[Double]]): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0d; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val cand = svs.take(SeedOversample * K)
    val k = math.min(K, cand.length)
    val seeds = Array.ofDim[Int](k)
    val best = Array.fill(cand.length)(Double.MaxValue)
    var cur = 0
    for (j <- 0 until k) {
      seeds(j) = cur
      var nxt = -1
      var i = 0
      while (i < cand.length) {
        val d = d2(cand(cur), cand(i))
        if (d < best(i)) best(i) = d
        if (best(i) > 0 && (nxt < 0 || best(i) > best(nxt))) nxt = i
        i += 1
      }
      cur = if (nxt < 0) cur else nxt
    }
    var cents = seeds.map(cand(_).clone())
    for (_ <- 1 to LloydIters) {
      val sums = Array.fill(cents.length)(Array.ofDim[Double](SubDim))
      val cnts = Array.ofDim[Long](cents.length)
      svs.foreach { sv =>
        var bi = 0; var bd = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val d = d2(sv, cents(c))
          if (d < bd) { bd = d; bi = c }
          c += 1
        }
        cnts(bi) += 1
        var i = 0
        while (i < SubDim) { sums(bi)(i) += sv(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (cnts(c) == 0) cents(c)
        else sums(c).map(_ / cnts(c))
      }.toArray
    }
    cents
  }

  /** Encode every vector to its M nearest-codeword indices — map-only,
    * codebooks ride as an 8 KB broadcast. */
  private[graft] def encode(emb: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame =
    encodeUnit(unitVectors(emb), books)

  private def encodeUnit(unit: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val s = unit.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(books)
    unit.as[(Long, Seq[Double])].mapPartitions { it =>
      val bs = bc.value
      it.map { case (id, v) =>
        val codes = Array.ofDim[Int](M)
        var m = 0
        while (m < M) {
          val base = m * SubDim
          var bi = 0; var bd = Double.MaxValue; var c = 0
          while (c < bs(m).length) {
            var acc = 0.0d; var i = 0
            while (i < SubDim) {
              val d = v(base + i) - bs(m)(c)(i); acc += d * d; i += 1
            }
            if (acc < bd) { bd = acc; bi = c }
            c += 1
          }
          codes(m) = bi
          m += 1
        }
        (id, codes)
      }
    }.toDF("vec_id", "codes")
  }

  /** Self-query: ADC shortlist over the broadcast code table, then exact
    * rerank of the shortlist only. Output shape matches bruteForceTopK:
    * (vec_id, rnk, nbr_id, cos). */
  def pqTopK(emb: DataFrame, k: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    // normalized once, CACHED: training, encoding, the query pass, and
    // both rerank legs all read this frame — without the cache each is a
    // fresh scan+normalize plan (measured ~1.5 s of the query's cost at
    // sf0.1). CacheManager dedupes by plan, so repeat invocations share
    // one entry.
    val unit = unitVectors(emb).cache()
    val books = trainFromUnit(unit)
    val codeRows = encodeUnit(unit, books).as[(Long, Array[Int])].collect()
      .sortBy(_._1) // the compressed table: n × (8 id + M code) bytes
    val bcBooks = s.sparkContext.broadcast(books)
    val bcCodes = s.sparkContext.broadcast(codeRows)
    val short = shortlistFor(codeRows.length.toLong)
    val cands = unit.as[(Long, Seq[Double])].mapPartitions { it =>
      val bs = bcBooks.value
      val codes = bcCodes.value
      it.flatMap { case (qid, qv) =>
        // ADC table: distance of each query subvector to every codeword
        val tab = Array.ofDim[Double](M, K)
        var m = 0
        while (m < M) {
          val base = m * SubDim
          var c = 0
          while (c < bs(m).length) {
            var acc = 0.0d; var i = 0
            while (i < SubDim) {
              val d = qv(base + i) - bs(m)(c)(i); acc += d * d; i += 1
            }
            tab(m)(c) = acc
            c += 1
          }
          m += 1
        }
        // bounded shortlist heap over the code scan: (adc asc, id asc)
        val heap = new ShortlistHeap(short)
        codes.foreach { case (id, cd) =>
          if (id != qid) {
            var adc = 0.0d; var j = 0
            while (j < M) { adc += tab(j)(cd(j)); j += 1 }
            heap.offer(adc, id)
          }
        }
        heap.ids.iterator.map(nid => (qid, nid))
      }
    }.toDF("vec_id", "nbr_id")
    // exact rerank: only the shortlist's vectors are ever read at full width
    val qv = unit.select(col("vec_id"), col("v").as("qv"))
    val nv = unit.select(col("vec_id").as("nbr_id"), col("v").as("nv"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nbr_id"))
    cands.join(qv, "vec_id").join(nv, "nbr_id")
      .withColumn("cos",
        // codegen'd dot (r20): bit-identical left fold to the former
        // aggregate(zip_with(...)) without the per-row zip array
        graft.functions.VectorFunctions.dot(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("rnk").cast("long").as("rnk"),
        col("nbr_id"), round(col("cos"), 4).as("cos"))
  }

  /** Broadcast-free ADC (the q159 at-scale caveat, r12 verdict): the code
    * table stays DISTRIBUTED — sharded by hash(vec_id), queries fan out
    * to every shard, each (query, shard) keeps its local top-`short` by
    * (adc, id), and a global window merges shards. The merged shortlist
    * is EXACTLY the broadcast kernel's (top-short of a union = top-short
    * of the union of per-shard top-shorts, under the same strict (adc,
    * id) total order — PqAnnSpec asserts byte-equality of the outputs),
    * so this is pqTopK's 10⁹-vector shape: no driver materialization of
    * the code table (24 GB at 10⁹ vectors), per-task residency one
    * shard's codes (n/nShards × ~(8+M) B, set nShards = table_bytes /
    * executor_budget), at the price of an nShards× wider shortlist
    * shuffle into the merge window. */
  def pqTopKSharded(emb: DataFrame, k: Int, nShards: Int = 4): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val unit = unitVectors(emb).cache()
    val books = trainFromUnit(unit)
    val bcBooks = s.sparkContext.broadcast(books)
    val short = shortlistFor(unit.count())
    val codeRows = encodeUnit(unit, books)
      .select(pmod(hash(col("vec_id")), lit(nShards)).cast("int").as("shard"),
        lit(0).as("kind"), col("vec_id").as("id"), col("codes"),
        lit(null).cast("array<double>").as("v"))
    val qRows = unit
      .crossJoin(broadcast((0 until nShards).toDF("shard")))
      .select(col("shard"), lit(1).as("kind"), col("vec_id").as("id"),
        lit(null).cast("array<int>").as("codes"), col("v"))
    val local = codeRows.unionAll(qRows)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "kind", "id")
      .as[(Int, Int, Long, Array[Int], Array[Double])]
      .mapPartitions { it =>
        val bs = bcBooks.value
        var curShard = Int.MinValue
        var res = Vector.empty[(Long, Array[Int])]
        it.flatMap { case (shard, kind, id, cd, qv) =>
          if (shard != curShard) { curShard = shard; res = Vector.empty }
          if (kind == 0) { res :+= ((id, cd)); Iterator.empty }
          else {
            val tab = Array.ofDim[Double](M, K)
            var m = 0
            while (m < M) {
              val base = m * SubDim
              var c = 0
              while (c < bs(m).length) {
                var acc = 0.0d; var i = 0
                while (i < SubDim) {
                  val d = qv(base + i) - bs(m)(c)(i); acc += d * d; i += 1
                }
                tab(m)(c) = acc
                c += 1
              }
              m += 1
            }
            val heap = new ShortlistHeap(short)
            res.foreach { case (nid, c) =>
              if (nid != id) {
                var adc = 0.0d; var j = 0
                while (j < M) { adc += tab(j)(c(j)); j += 1 }
                heap.offer(adc, nid)
              }
            }
            heap.entries.iterator.map { case (adc, nid) => (id, nid, adc) }
          }
        }
      }.toDF("vec_id", "nbr_id", "adc")
    // global merge: the same top-`short` the broadcast scan keeps
    val wm = Window.partitionBy("vec_id").orderBy(asc("adc"), asc("nbr_id"))
    val shortlist = local
      .withColumn("srnk", row_number().over(wm))
      .filter(col("srnk") <= short)
      .select("vec_id", "nbr_id")
    val qv = unit.select(col("vec_id"), col("v").as("qv"))
    val nv = unit.select(col("vec_id").as("nbr_id"), col("v").as("nv"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nbr_id"))
    shortlist.join(qv, "vec_id").join(nv, "nbr_id")
      .withColumn("cos",
        // codegen'd dot (r20): bit-identical left fold to the former
        // aggregate(zip_with(...)) without the per-row zip array
        graft.functions.VectorFunctions.dot(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("rnk").cast("long").as("rnk"),
        col("nbr_id"), round(col("cos"), 4).as("cos"))
  }

  /** IVF-PQ — the FAISS composition both halves exist for: IVF bounds the
    * CANDIDATE SET (probe `nprobe` of `nCentroids` clusters), PQ bounds
    * the BYTES each candidate costs (ADC over 16-byte codes; the exact
    * vector is read only for the rerank shortlist). Dataflow:
    *
    *   residents  (cid, nbr_id, codes)    one row per vector, M+8 bytes
    *   queries    (cid, vec_id, v)        one row per (vector × probe)
    *
    * both shuffled once on cid; inside each partition the resident CODE
    * lists group per cluster and every query builds its ADC table once,
    * scans its probed cluster's codes, and keeps a bounded heap — the
    * candidate volume is n·nprobe/nCentroids of brute force and the scan
    * touches codes, not vectors. Per-cluster resident lists are the same
    * skew surface as the LSH buckets, and get the same ENFORCED guard
    * (r12 verdict #5): a cluster with more than `cap` residents splits
    * into ceil(nres/cap) secondary-hash blocks — residents land in
    * exactly one block, queries fan out to every block of their probed
    * cluster, each (query, resident) pair still meets exactly once, and
    * no task ever buffers more than ~cap code rows (the shared
    * maxResidentBlock accumulator proves it on the degenerate corpus).
    * Exact rerank of the global per-query shortlist finishes the
    * pipeline. Runs on the CLUSTERED corpus (q27g's regime) — cluster
    * structure is what makes small-nprobe probing complete; recall
    * pinned in PqAnnSpec. */
  def ivfPqTopK(emb: DataFrame, k: Int, nCentroids: Int, nprobe: Int,
      shortlist: Int, cap: Int = Similarity.MaxResidentsPerTask): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val resAcc = Similarity.residentCapAcc(s)
    val unit = unitVectors(emb).cache() // shared by train/encode/rerank
    val books = trainFromUnit(unit)
    val bcBooks = s.sparkContext.broadcast(books)
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val cents = Similarity.kmeansCentroids(emb, nCentroids)
      .select(col("cid"), col("cv").as("ce"), col("cn"))
    // CACHED: the probe assignment feeds the sizing pass, the residents
    // and the queries — uncached, each reference re-runs the centroid
    // scoring pass end-to-end (the executed plan showed it 4×; measured
    // ~1 s per extra pass at sf0.1). CacheManager dedupes by plan, so
    // repeat invocations share one entry, like `unit` above.
    val probes = Similarity.probeAssignments(withNorm, cents, nprobe).cache()
    val residentsBase = probes.filter(col("crn") === 1)
      .select(col("cid").cast("long").as("cid"),
        col("vec_id").as("nbr_id"))
      .join(encodeUnit(unit, books).withColumnRenamed("vec_id", "nbr_id"), "nbr_id")
    // Sizing pass for the skew guard: one narrow row per OVERSIZED cluster
    // (empty on a balanced corpus), from the CACHED probe assignments
    // alone (crn=1 rows) — never through the encode join (the r8 lesson:
    // wide rows must not pay the sizing pass). The common case (no
    // cluster over cap — q161's declared parameters on the balanced
    // fixture) takes the r12 fast path untouched: no guard joins, no
    // query fan-out, one cheap narrow count as the insurance premium
    // (the capBuckets conditional-broadcast spirit).
    val hotRows = probes.filter(col("crn") === 1)
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("nres")).filter(col("nres") > cap)
      .select(col("cid"),
        ceil(col("nres").cast("double") / cap).cast("int").as("nblk"))
    val (residents, queries) =
      if (hotRows.limit(1).count() == 0) {
        (residentsBase
          .select(col("cid"), lit(0).as("blk"),
            lit(0).as("kind"), col("nbr_id").as("id"),
            col("codes"), lit(null).cast("array<double>").as("v")),
          probes
            .select(col("cid").cast("long").as("cid"), col("vec_id"))
            .join(unit, "vec_id")
            .select(col("cid"), lit(0).as("blk"),
              lit(1).as("kind"), col("vec_id").as("id"),
              lit(null).cast("array<int>").as("codes"), col("v")))
      } else {
        val hot = broadcast(hotRows)
        (residentsBase.join(hot, Seq("cid"), "left")
          .withColumn("nblk", coalesce(col("nblk"), lit(1)))
          .select(col("cid"),
            pmod(hash(col("nbr_id")), col("nblk")).cast("int").as("blk"),
            lit(0).as("kind"), col("nbr_id").as("id"),
            col("codes"), lit(null).cast("array<double>").as("v")),
          probes
            .select(col("cid").cast("long").as("cid"), col("vec_id"))
            .join(unit, "vec_id")
            .join(hot, Seq("cid"), "left")
            .withColumn("nblk", coalesce(col("nblk"), lit(1)))
            .withColumn("blk", explode(expr("sequence(0, nblk - 1)")))
            .select(col("cid"), col("blk").cast("int").as("blk"),
              lit(1).as("kind"), col("vec_id").as("id"),
              lit(null).cast("array<int>").as("codes"), col("v")))
      }
    val cands = residents.unionAll(queries)
      .repartition(col("cid"), col("blk"))
      .sortWithinPartitions("cid", "blk", "kind", "id")
      .as[(Long, Int, Int, Long, Array[Int], Array[Double])]
      .mapPartitions { it =>
        val bs = bcBooks.value
        var curCid = Long.MinValue
        var curBlk = Int.MinValue
        var res = Vector.empty[(Long, Array[Int])]
        it.flatMap { case (cid, blk, kind, id, codes, qv) =>
          if (cid != curCid || blk != curBlk) {
            curCid = cid; curBlk = blk; res = Vector.empty
          }
          if (kind == 0) {
            res :+= ((id, codes)); resAcc.add(res.size.toLong); Iterator.empty
          }
          else {
            val tab = Array.ofDim[Double](M, K)
            var m = 0
            while (m < M) {
              val base = m * SubDim
              var c = 0
              while (c < bs(m).length) {
                var acc = 0.0d; var i = 0
                while (i < SubDim) {
                  val d = qv(base + i) - bs(m)(c)(i); acc += d * d; i += 1
                }
                tab(m)(c) = acc
                c += 1
              }
              m += 1
            }
            res.iterator.collect { case (nid, cd) if nid != id =>
              var adc = 0.0d; var j = 0
              while (j < M) { adc += tab(j)(cd(j)); j += 1 }
              (id, nid, adc)
            }
          }
        }
      }.toDF("vec_id", "nbr_id", "adc")
    // global per-query shortlist over all probed clusters, then exact
    // rerank — only `shortlist` vectors per query are read at full width
    val ws = Window.partitionBy("vec_id").orderBy(asc("adc"), asc("nbr_id"))
    val short = cands
      .withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= shortlist)
      .select("vec_id", "nbr_id")
    val qv = unit.select(col("vec_id"), col("v").as("qv"))
    val nv = unit.select(col("vec_id").as("nbr_id"), col("v").as("nv"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nbr_id"))
    short.join(qv, "vec_id").join(nv, "nbr_id")
      .withColumn("cos",
        // codegen'd dot (r20): bit-identical left fold to the former
        // aggregate(zip_with(...)) without the per-row zip array
        graft.functions.VectorFunctions.dot(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("rnk").cast("long").as("rnk"),
        col("nbr_id"), round(col("cos"), 4).as("cos"))
  }

  val qs: Seq[Q] = Seq(
    // Q159 PQ-ANN: train → encode → ADC shortlist → exact rerank. No
    // DuckDB oracle (lossy learned quantizer; the q24b/q27b declared
    // property class): PqAnnSpec pins recall@3 ≥ 0.9 vs bruteForceTopK
    // and the 16× code compression. Rows-only here.
    Q("q159_pq_ann", None,
      (s, d) => pqTopK(t(s, d, "embeddings"), 3).orderBy("vec_id", "rnk")),

    // Q167 sharded-ADC PQ: q159's kernel with the code table left
    // DISTRIBUTED (no driver collect/broadcast — the 10⁹-vector shape).
    // Same property class as q159; PqAnnSpec additionally asserts the
    // output is byte-identical to the broadcast kernel's.
    Q("q167_pq_ann_sharded", None,
      (s, d) => pqTopKSharded(t(s, d, "embeddings"), 3)
        .orderBy("vec_id", "rnk")),

    // Q161 IVF-PQ: the composed index — IVF probing bounds candidates
    // (nprobe 2 of 32 clusters), PQ codes bound the bytes per candidate,
    // exact rerank of a 20-wide shortlist finishes. On the clustered
    // corpus, the regime where the composition pays (q27g's argument).
    // Property class like q159: recall + economics pinned in PqAnnSpec.
    Q("q161_ivf_pq", None,
      (s, d) => ivfPqTopK(Similarity.clusteredEmbeddings(s, d), 3,
        nCentroids = Similarity.ClusterCount, nprobe = 2, shortlist = 20)
        .orderBy("vec_id", "rnk"))
  )
}

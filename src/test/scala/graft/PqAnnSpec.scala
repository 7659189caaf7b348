package graft

import graft.operators.{PqAnn, Similarity}

/** The PQ-ANN property contract (q159, declared rows-only class): recall
  * against the exact brute-force top-k, compression economics, and
  * reproducibility of the learned quantizer. */
class PqAnnSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf, "embeddings")

  test("q159: ADC-shortlist + exact-rerank recall@3 vs brute force >= 0.9") {
    val brute = Similarity.bruteForceTopK(emb, 3)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = PqAnn.pqTopK(emb, 3)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(pq.contains).toDouble / brute.size
    info(f"PQ recall@3 = $recall%.3f (shortlist ${PqAnn.shortlistFor(brute.size / 3L)})")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("q159: codes compress 16x and training is partitioning-independent") {
    // 64 float dims (256 B) -> M code bytes: the broadcast-ability claim
    assert(PqAnn.Dim * 4 / PqAnn.M === 16)
    val b1 = PqAnn.trainCodebooks(emb)
    val b2 = PqAnn.trainCodebooks(emb.repartition(13))
    assert(b1.length === PqAnn.M)
    b1.zip(b2).foreach { case (s1, s2) =>
      s1.zip(s2).foreach { case (c1, c2) =>
        assert(c1.sameElements(c2), "codebooks depend on partitioning")
      }
    }
    // every codeword has the subspace width
    b1.foreach(_.foreach(c => assert(c.length === PqAnn.SubDim)))
  }

  test("q159: the exact-rerank stage reads only the shortlist fraction") {
    val n = emb.count()
    val short = PqAnn.shortlistFor(n)
    // candidate volume is n * shortlist, not n^2 — the rerank economics
    assert(short.toLong * n < n * n / 4,
      s"shortlist $short is not subquadratic at n=$n")
  }
}

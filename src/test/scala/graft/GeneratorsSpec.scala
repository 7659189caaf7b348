package graft

import graft.datagen.Generators
import graft.pipeline.EcommercePipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the seeded generators (SURVEY §5.3: id width/charset,
  * price bounds and 2-dp scale, weighted-choice frequencies, anti-join
  * idempotence, partition-stability). */
class GeneratorsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val products = EcommercePipeline.dimProducts(spark, sf).cache()
  private lazy val customers = EcommercePipeline.dimCustomers(spark, sf).cache()

  test("product ids have the reference shape: prod- + exactly 6 digits") {
    val bad = products.filter(not(col("product_id").rlike("^prod-[0-9]{6}$"))).count()
    assert(bad == 0)
    val badS = products.filter(not(col("supplier_id").rlike("^S[0-9]{4}$"))).count()
    assert(badS == 0)
  }

  test("prices lie in [10, 500] with scale 2") {
    val out = products.filter(col("price") < 10.0 || col("price") > 500.0).count()
    assert(out == 0)
    // exact 2-dp decimal surfaced as DOUBLE (hash-canonical output type);
    // every value must survive the DECIMAL(12,2) round-trip bit-exactly,
    // i.e. be the IEEE-nearest double of a 2-dp decimal
    assert(products.schema("price").dataType.sql == "DOUBLE")
    val nonCent = products
      .filter(col("price") =!=
        col("price").cast("decimal(12,2)").cast("double")).count()
    assert(nonCent == 0)
  }

  test("membership levels respect the .60/.25/.10/.05 weighting (±5pp)") {
    val n = customers.count().toDouble
    val freq = customers.groupBy("membership_level").count()
      .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
    val expected = Map("Bronze" -> 0.60, "Silver" -> 0.25, "Gold" -> 0.10,
      "Platinum" -> 0.05)
    expected.foreach { case (k, p) =>
      assert(math.abs(freq.getOrElse(k, 0.0) - p) < 0.05,
        s"$k: got ${freq.getOrElse(k, 0.0)}, want ~$p")
    }
  }

  test("emails are unique (reference Faker unique-email contract)") {
    assert(customers.select("email").distinct().count() == customers.count())
  }

  test("anti-join dedup is idempotent: second pass inserts zero rows") {
    val cand = products.select("product_id", "price")
    val afterFirst = EcommercePipeline.antiJoinDedup(cand, cand, "product_id")
    assert(afterFirst.count() == 0)
  }

  test("generation is partition-independent (repartition doesn't change values)") {
    val a = products.orderBy("product_id").collect().toSeq
    val b = EcommercePipeline.dimProducts(spark, sf).repartition(13)
      .orderBy("product_id").collect().toSeq
    assert(a == b)
  }

  test("hashMod is uniform-ish over small moduli (property over random offsets)") {
    // column-free mirror of the arithmetic: (k * mult) % 5 over 1000 keys,
    // for 50 scalacheck-generated key offsets
    val mult = Generators.KnuthMult
    val offsets = Gen.listOfN(50, Gen.chooseNum(0L, 1000000L))
      .apply(Gen.Parameters.default, Seed(42L)).get
    offsets.foreach { off =>
      val counts = (1L to 1000L)
        .map(k => ((k + off) * mult) % 5)
        .groupBy(identity).view.mapValues(_.size)
      assert(counts.values.forall(c => c > 120 && c < 280),
        s"offset $off skewed: $counts")
    }
  }

  test("transaction ids are unique and carry the reference format") {
    val txn = EcommercePipeline.transactions(spark, sf).cache()
    assert(txn.select("transaction_id").distinct().count() == txn.count())
    val bad = txn.filter(not(col("transaction_id").rlike("^TXN[0-9]{34}$"))).count()
    assert(bad == 0)
    txn.unpersist()
  }
}

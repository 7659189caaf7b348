package graft

import org.apache.spark.sql.functions._

import graft.operators.Inference

/** Edge behavior of the batch-inference operators (q153/q154). The main
  * path is oracle-checked in CORRECTNESS; this suite pins the corpus
  * shapes the fixture never produces. */
class InferenceSpec extends SparkSpec {

  test("q154 sweep stays defined on an all-negative corpus (r11 verdict #7)") {
    import spark.implicits._
    val sc = Seq(
      (1L, -5L, true), (2L, -3L, false), (3L, -1L, true), (4L, 0L, false))
      .toDF("vec_id", "score", "pos")
    val rows = Inference.thresholdSweep(sc).collect()
    assert(rows.length === 9, "one row per threshold, even with no positive max")
    rows.foreach { r =>
      assert(!r.anyNull, s"null leaked into the sweep: $r")
      assert(r.getAs[Long]("cutoff") === 0L)
      assert(r.getAs[Long]("tp") === 0L && r.getAs[Long]("fp") === 0L)
      assert(r.getAs[Long]("tn") === 2L && r.getAs[Long]("fn") === 2L)
    }
  }

  test("q154 sweep matches a direct confusion count on a mixed corpus") {
    import spark.implicits._
    val data = (1L to 40L).map(i => (i, (i % 13) - 6, i % 2 == 0))
    val sc = data.toDF("vec_id", "score", "pos")
      .select(col("vec_id"), col("score").cast("long").as("score"), col("pos"))
    val m = data.map(_._2).filter(_ > 0).max
    val rows = Inference.thresholdSweep(sc).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val cut = (r.getAs[Long]("k") * m) / 8
      assert(r.getAs[Long]("cutoff") === cut)
      assert(r.getAs[Long]("tp") ===
        data.count(d => d._2 > cut && d._3).toLong)
      assert(r.getAs[Long]("fn") ===
        data.count(d => d._2 <= cut && d._3).toLong)
    }
  }
}

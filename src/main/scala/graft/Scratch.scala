package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary perf-iteration scratch harness (r20) — not part of the
  * declared surface; deleted before the round ends. */
object Scratch {
  def time[T](label: String, n: Int = 3)(f: => T): Unit = {
    var best = Double.MaxValue
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
    }
    println(f"[scratch] $label BEST: $best%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.table(spark, sfDir, "embeddings")
    // components of pqTopK, mirrored via the public pieces
    val unit = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v0"))
      .select(col("vec_id"),
        expr("transform(v0, x -> x / aggregate(v0, 0D, (a,x)->a+x*x, a->sqrt(a)))").as("v"))
    println(s"[scratch] n=${emb.count()}")
    // warm
    time("q159 full") {
      graft.SparkEntry.queries("q159_pq_ann")(spark, sfDir).count()
    }
    time("train") { operators.PqAnn.trainCodebooks(emb) }
    val books = operators.PqAnn.trainCodebooks(emb)
    time("encode+collect") {
      operators.PqAnn.encode(emb, books).as[(Long, Array[Int])].collect()
    }
    spark.stop()
  }
}

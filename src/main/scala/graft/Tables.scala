package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog bootstrap (SURVEY §3 entry point 1).
  *
  * The reference implies its schemas from INSERT column lists and CSV headers
  * (reference `dimension_tables_mock.py:71,126`, `transactions_mock_data.py:95`);
  * here every driver table is an explicit Parquet dataset registered as a temp
  * view so both the DataFrame API and `spark.sql` can reach it. Parquet carries
  * the authoritative schema (see FIXTURES.md §B) — no inference at this edge.
  */
object Tables {
  /** Driver-provided tables under /root/testdata (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) (pyarrow ns), which Spark's
      // parquet reader rejects. Read it as raw nanos and floor-divide to
      // microseconds — the same truncation DuckDB applies, so oracle outputs
      // stay bit-identical. `div` is integer division (ns values exceed
      // 2^53, so a double-typed `/` would lose precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view named after itself.
    * Idempotent; last-registered dir wins (queries are run sequentially). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

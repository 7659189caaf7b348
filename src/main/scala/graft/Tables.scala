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
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
      // generations and TIMESTAMP(MICROS, tz-naive) in others — adapt by
      // the schema actually read, normalizing to a session-TZ TIMESTAMP at
      // microsecond precision either way (the same floor DuckDB applies to
      // ns, so oracle outputs stay bit-identical across generations):
      //  - NANOS: read as raw longs (legacy conf) and floor-divide; `div`
      //    is integer division (ns values exceed 2^53, a double `/` would
      //    lose precision).
      //  - MICROS tz-naive: arrives as TIMESTAMP_NTZ; a plain cast
      //    reinterprets the same wall-clock in the (UTC-pinned) session
      //    zone — identical micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw // already a plain TIMESTAMP
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view named after itself.
    * Idempotent; last-registered dir wins (queries are run sequentially). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

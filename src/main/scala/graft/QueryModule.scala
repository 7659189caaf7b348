package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query (SURVEY §2.B row).
  *
  * @param name   stable id (drives CORRECTNESS_r{N}.json keys)
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or None
  *               for ops whose semantics DuckDB can't reproduce (seeded
  *               sampling, HLL, LSH, streaming state) — those get a
  *               rows-only check plus a ScalaTest property spec.
  * @param build  DataFrame builder; `dir` is the scale-factor directory.
  *
  * Determinism contract (SURVEY §2.B): every oracle-checked query carries a
  * total ORDER BY over its own output columns, aliases every computed column
  * identically on both sides, and avoids engine-divergent types:
  * DOUBLE aggregates go through DECIMAL casts (exact, associative) or are
  * derived as `CAST(exact_decimal AS DOUBLE) / exact_int` (bit-identical IEEE
  * on both engines); TIMESTAMP outputs are cast to DATE/STRING/BIGINT-epoch.
  *
  * Output-type canon (hash gate): final schemas contain only BIGINT, DOUBLE,
  * VARCHAR, BOOLEAN, DATE, INT. Never DECIMAL (pyarrow reads it as Decimal
  * objects, DuckDB's pandas conversion as float64 — value-equal, hash-
  * different): compute exactly in DECIMAL, cast the final column to DOUBLE
  * on BOTH sides. Cast rank/row_number/ntile to BIGINT (Spark emits INT,
  * DuckDB BIGINT); DuckDB `sum(INT)` is HUGEINT → wrap in CAST(... AS
  * BIGINT). `tools/strict_check.py` enforces this locally (dtype + repr).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

trait QueryModule {
  def qs: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.build).toMap
  final def oracleSql: Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

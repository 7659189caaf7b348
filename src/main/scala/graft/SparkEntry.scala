package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's declared queries (SURVEY §2.B) and their
  * DuckDB oracle SQL. Key naming follows the §2.B inventory (q01…q33 + the
  * north-star extensions).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.RelationalQueries,
    operators.AnalyticsExt,
    operators.RelationalExt,
    operators.SqlSurface,
    operators.Inference,
    operators.TextAnalysis,
    operators.CorpusOps,
    operators.CurationExt,
    operators.CommerceAnalytics,
    operators.SearchQualityOps,
    operators.Dedup,
    operators.GraphOps,
    operators.Similarity,
    operators.PqAnn,
    operators.HnswAnn,
    operators.ScaleOps,
    operators.TimeTravel,
    operators.LakehouseOps,
    operators.AsOfJoin,
    sources.SourceFormats,
    pipeline.EcommercePipeline,
    streaming.StreamingQueries,
    multimodal.Multimodal)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — grouped exact-decimal aggregate over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}

package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch INFERENCE over the embedding corpus — the serving half of the
  * training-data pipeline the dedup/curation operators feed: score every
  * vector with a broadcast linear model (q153) and sweep the decision
  * threshold against labels to pick an operating point (q154). Both are
  * exact-integer so the oracle replays them bit-for-bit: components are
  * quantized map-side (floor(x·2²⁰), the q81 recipe) and hit integer
  * weights derived from the dimension index, so the "model" is a pure
  * function of position — broadcast-free in the literal sense (the
  * weights live INSIDE the expression; a learned model would arrive as a
  * broadcast array, same plan shape).
  *
  * Scale posture: scoring is map-only in-row arithmetic (one `transform`
  * + `aggregate` per vector — no explode, no shuffle); the sweep's
  * confusion matrix is one partial-aggregated groupBy over (threshold ×
  * n) rows generated in-row. The only driver traffic is the 1-row max
  * used to place the thresholds (broadcast stat-frame pattern).
  */
object Inference extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Exact-integer linear score: Σ_j floor(x_j·2²⁰) · w_j with
    * w_j = (j·37 mod 21) − 10 ∈ [−10, 10]. Spark `transform` indexes are
    * 0-based (DuckDB's list_transform is 1-based — the oracle uses i−1). */
  private val scoreExpr: Column = expr(
    """aggregate(
      |  transform(embedding, (x, i) ->
      |    cast(floor(cast(x as double) * 1048576) as bigint) * ((i * 37) % 21 - 10)),
      |  0L, (acc, v) -> acc + v)""".stripMargin)

  private def scores(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(
      col("vec_id"),
      col("label").cast("long").as("label"),
      scoreExpr.as("score"))

  /** The shared score CTE of both oracles (DuckDB side, 1-based index). */
  private val scoreDuck: String =
    """SELECT vec_id, CAST(label AS BIGINT) AS label,
      |  CAST(list_sum(list_transform(embedding, (x, i) ->
      |    CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) * (((i - 1) * 37) % 21 - 10))) AS BIGINT) AS score
      |FROM embeddings""".stripMargin

  val qs: Seq[Q] = Seq(

    // Q153 batch model scoring: every vector scored in-row, predicted
    // class = sign of the score. Map-only except the output sort.
    Q("q153_model_scoring",
      Some(s"""WITH sc AS (
              |$scoreDuck)
              |SELECT vec_id, score, score > 0 AS predicted_pos
              |FROM sc ORDER BY vec_id""".stripMargin),
      (s, d) => scores(s, d)
        .select(col("vec_id"), col("score"),
          (col("score") > 0).as("predicted_pos"))
        .orderBy("vec_id")),

    // Q154 threshold sweep: the operating-point evaluation — confusion
    // counts (tp/fp/tn/fn) at 9 cutoffs placed at k/8 of the measured
    // max score (data-relative, so the sweep survives any SF; the
    // corpus-adaptive-parameter rule). Ground truth: even label =
    // positive. Cutoffs use non-negative integer arithmetic only, so
    // DuckDB `//` and Spark `div` agree.
    Q("q154_threshold_sweep",
      Some(s"""WITH sc AS (
              |$scoreDuck),
              |mx AS (SELECT coalesce(max(score), 0) AS m FROM sc WHERE score > 0),
              |th AS (SELECT unnest(range(0, 9)) AS k),
              |lab AS (SELECT vec_id, score, label % 2 = 0 AS pos FROM sc)
              |SELECT CAST(th.k AS BIGINT) AS k,
              |  CAST((th.k * mx.m) // 8 AS BIGINT) AS cutoff,
              |  CAST(sum(CASE WHEN score > (th.k * mx.m) // 8 AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              |  CAST(sum(CASE WHEN score > (th.k * mx.m) // 8 AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              |  CAST(sum(CASE WHEN score <= (th.k * mx.m) // 8 AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn,
              |  CAST(sum(CASE WHEN score <= (th.k * mx.m) // 8 AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn
              |FROM lab, th, mx GROUP BY th.k, mx.m ORDER BY k""".stripMargin),
      (s, d) => thresholdSweep(
        scores(s, d).select(col("vec_id"), col("score"),
          (col("label") % 2 === 0).as("pos"))))
  )

  /** q154's engine over any (score: long, pos: boolean) frame — split out
    * so the all-negative edge is unit-testable (InferenceSpec). */
  private[graft] def thresholdSweep(sc: DataFrame): DataFrame = {
    // coalesce: an all-negative corpus has no positive max — the sweep
    // then degenerates to all cutoffs at 0 but stays DEFINED (every
    // row lands in tn/fn) instead of null-poisoning the frame
    // (r11 verdict #7; InferenceSpec pins the all-negative case).
    val mx = sc.filter(col("score") > 0)
      .agg(coalesce(max("score"), lit(0L)).as("m"))
    sc.crossJoin(broadcast(mx))
      .select(col("score"), col("pos"),
        explode(expr("sequence(0, 8)")).as("k"), col("m"))
      .select(col("score"), col("pos"), col("k").cast("long").as("k"),
        expr("(k * m) div 8").as("cutoff"))
      .groupBy("k", "cutoff")
      .agg(
        sum(when(col("score") > col("cutoff") && col("pos"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("score") > col("cutoff") && !col("pos"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("score") <= col("cutoff") && !col("pos"), 1L).otherwise(0L)).as("tn"),
        sum(when(col("score") <= col("cutoff") && col("pos"), 1L).otherwise(0L)).as("fn"))
      .orderBy("k")
  }
}

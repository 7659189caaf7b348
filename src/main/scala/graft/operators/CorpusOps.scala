package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the steps between raw crawled documents and
  * a training mix: deterministic stratified sampling (per-source/lang
  * up/down-sampling) and the end-to-end corpus-prep pipeline (quality
  * filter → exact dedup → stratified sample → mix statistics).
  *
  * All sampling is key-derived multiplicative hashing, never `rand()`:
  * the decision for a document is a pure function of its id, so the
  * sample is partition-stable, reproducible across engines (the DuckDB
  * oracle replays it exactly), and — critically for incremental corpus
  * builds at 100 TB — STABLE under re-runs: adding new documents never
  * flips the keep/drop decision of an old one.
  */
object CorpusOps extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Per-lang percent quota: downsample the dominant language, keep the
    * tail — the classic mix-rebalancing shape. */
  private val quotaExpr = "CASE WHEN lang = 'en' THEN 50 ELSE 20 END"
  // Pre-reduce the key mod 2^31-1 before the Knuth multiplier: the product
  // then tops out at (2^31-2)*2654435761 ≈ 5.7e18 < 2^63-1 in BOTH engines.
  // Bare doc_id*2654435761 overflows signed 64-bit for doc_id ≳ 3.5e9 —
  // Spark would silently wrap (negative remainder ⇒ keep-all) while DuckDB
  // raises, exactly at the 100 TB scale this sampling serves.
  private val keepExpr =
    s"((doc_id % 2147483647) * 2654435761) % 100 < ($quotaExpr)"

  /** q28b's quality score, as shared SQL fragments (Spark + DuckDB agree
    * on every function used). */
  private def sparkScore = Seq(
    "size(toks) >= 20",
    s"size(filter(toks, t -> array_contains(array(${TextAnalysis.Stopwords.map(w => s"'$w'").mkString(",")}), t))) * 10 >= size(toks)",
    "(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))) * 5 <= length(text)")
    .map(c => s"CAST($c AS INT)").mkString(" + ")

  private val duckToks = "list_filter(string_split_regex(lower(text), ' +'), t -> t != '')"
  private def duckScore = Seq(
    s"len($duckToks) >= 20",
    s"len(list_filter($duckToks, t -> list_contains([${TextAnalysis.Stopwords.map(w => s"'$w'").mkString(",")}], t))) * 10 >= len($duckToks)",
    "(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 5 <= length(text)")
    .map(c => s"CAST($c AS INT)").mkString(" + ")

  val qs: Seq[Q] = Seq(

    // Q58 deterministic stratified sampling: per-lang quotas decided by a
    // key-derived hash — no shuffle at all (a pure filter that pushes to
    // the scan), unlike orderBy(rand()).limit which globally sorts.
    Q("q58_stratified_sample",
      Some(s"""SELECT doc_id, lang FROM documents
              |WHERE $keepExpr
              |ORDER BY doc_id""".stripMargin),
      (s, d) => t(s, d, "documents")
        .filter(expr(keepExpr))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Q60 corpus-prep E2E: quality filter (q28b's score ≥ 2) → exact dedup
    // (keep smallest doc_id per identical text) → stratified sample (q58's
    // quotas) → per-lang mix statistics. The full curation path a training
    // run starts from, in one declared plan; every stage is the
    // oracle-checked primitive it reuses.
    Q("q60_corpus_prep",
      Some(s"""WITH q AS (
              |  SELECT doc_id, lang, text,
              |    CAST(len($duckToks) AS BIGINT) AS n_tokens,
              |    $duckScore AS score
              |  FROM documents),
              |f AS (SELECT * FROM q WHERE score >= 2),
              |kept AS (
              |  SELECT f.* FROM f
              |  JOIN (SELECT text, min(doc_id) AS doc_id FROM f GROUP BY text) k
              |    ON f.doc_id = k.doc_id),
              |s AS (SELECT * FROM kept WHERE $keepExpr)
              |SELECT lang, count(*) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              |  CAST(sum(score) AS BIGINT) AS score_sum
              |FROM s GROUP BY lang ORDER BY lang""".stripMargin),
      (s, d) => {
        val scored = t(s, d, "documents")
          .withColumn("toks", expr(TextAnalysis.tokensExpr))
          .select(col("doc_id"), col("lang"), col("text"),
            size(col("toks")).cast("long").as("n_tokens"),
            expr(sparkScore).as("score"))
        val filtered = scored.filter(col("score") >= 2)
        val deduped = Dedup.dedupKeepFirst(filtered, Seq("text"), "doc_id")
        deduped
          .filter(expr(keepExpr))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("score")).cast("long").as("score_sum"))
          .orderBy("lang")
      })
  )
}

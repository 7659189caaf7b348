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
      }),

    // Q82 domain-divergence report: per-source L1 distance between the
    // source's token distribution and the whole-corpus distribution — the
    // outlier scan that flags a crawl domain whose content drifted (spam,
    // boilerplate, wrong language) before it pollutes a training mix.
    //
    // Exactness: the distance is computed over a COMMON integer
    // denominator — Σ|c_st·T − C_t·T_s| for tokens present in the source,
    // plus (T − Σ_present C_t)·T_s for the absent mass (so no source ×
    // vocabulary cross join materializes) — and divided once at the end:
    // one IEEE division per source, everything upstream exact BIGINT.
    // Bound: products stay under 2⁶³ while T·T_s < 9.2e18 (corpus tokens
    // T ≲ 3e9); past that the identical plan runs with DECIMAL(38,0)
    // casts on the two products.
    //
    // Scale posture: the global token frame (vocabulary-sized) broadcasts
    // onto the per-(source, token) partial aggregate; only (source, token,
    // count) rows shuffle, and the final report is one row per source.
    Q("q82_domain_divergence",
      Some(s"""WITH toks AS (
              |  SELECT source, unnest($duckToks) AS token FROM documents),
              |g AS (SELECT token, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY token),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks),
              |s AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cst
              |      FROM toks GROUP BY source, token),
              |st AS (SELECT source, CAST(sum(cst) AS BIGINT) AS ts FROM s GROUP BY source),
              |pres AS (
              |  SELECT s.source,
              |         CAST(sum(abs(s.cst * tot.t - g.ct * st.ts)) AS BIGINT) AS num_present,
              |         CAST(sum(g.ct) AS BIGINT) AS cov
              |  FROM s JOIN g USING (token) JOIN st ON s.source = st.source CROSS JOIN tot
              |  GROUP BY s.source)
              |SELECT st.source, st.ts AS n_tokens,
              |  round(CAST(pres.num_present + (tot.t - pres.cov) * st.ts AS DOUBLE)
              |        / (st.ts * tot.t), 6) AS l1
              |FROM st JOIN pres USING (source) CROSS JOIN tot
              |ORDER BY source""".stripMargin),
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"), explode(expr(TextAnalysis.tokensExpr)).as("token"))
        val g = toks.groupBy("token").agg(count(lit(1)).as("ct"))
        val tot = toks.agg(count(lit(1)).as("t"))
        val perSrcTok = toks.groupBy("source", "token").agg(count(lit(1)).as("cst"))
        val st = perSrcTok.groupBy("source").agg(sum(col("cst")).as("ts"))
        val pres = perSrcTok
          .join(broadcast(g), Seq("token"))
          .join(broadcast(st), Seq("source"))
          .crossJoin(broadcast(tot))
          .groupBy("source")
          .agg(sum(abs(col("cst") * col("t") - col("ct") * col("ts"))).as("num_present"),
            sum(col("ct")).as("cov"))
        st.join(pres, Seq("source")).crossJoin(broadcast(tot))
          .select(col("source"), col("ts").as("n_tokens"),
            round((col("num_present") + (col("t") - col("cov")) * col("ts")).cast("double")
              / (col("ts") * col("t")), 6).as("l1"))
          .orderBy("source")
      }),

    // Q83 overlapping token-window chunking — the retrieval/embedding-prep
    // chunker: W=32-token windows at stride 24 (25 % overlap) so no span
    // near a boundary is ever split away from all its context; a doc at or
    // under W tokens is one whole chunk, and the final window always
    // reaches the document's end. Emits (chunk ordinal, start offset,
    // width, content fingerprint) — the manifest an embedding job maps
    // over. Pure per-row map + explode: no shuffle except the output sort,
    // chunk count per doc is ⌈(n−W)/stride⌉+1 (never a data-dependent
    // driver loop).
    Q("q83_chunk_overlap",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, $duckToks AS toks FROM documents),
              |n AS (
              |  SELECT doc_id, toks, len(toks) AS nt,
              |    CASE WHEN len(toks) <= 32 THEN 1
              |         ELSE (len(toks) - 32 + 23) // 24 + 1 END AS nchunks
              |  FROM toks),
              |c AS (
              |  SELECT doc_id, toks, nt, unnest(range(0, nchunks)) AS chunk_id FROM n)
              |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
              |  CAST(chunk_id * 24 AS BIGINT) AS start_tok,
              |  CAST(least(32, nt - chunk_id * 24) AS BIGINT) AS n_tokens,
              |  md5(array_to_string(list_slice(toks, chunk_id * 24 + 1,
              |        chunk_id * 24 + least(32, nt - chunk_id * 24)), ' ')) AS fp
              |FROM c ORDER BY doc_id, chunk_id""".stripMargin),
      (s, d) => {
        val W = 32
        val S = 24
        t(s, d, "documents")
          .withColumn("toks", expr(TextAnalysis.tokensExpr))
          .withColumn("nt", size(col("toks")))
          .withColumn("nchunks",
            when(col("nt") <= W, 1L)
              .otherwise(expr(s"(nt - $W + ${S - 1}) div $S") + 1L))
          .withColumn("chunk_id", explode(sequence(lit(0L), col("nchunks") - 1)))
          .select(col("doc_id"), col("chunk_id"),
            (col("chunk_id") * S).as("start_tok"),
            least(lit(W), col("nt") - col("chunk_id") * S).cast("long").as("n_tokens"),
            md5(concat_ws(" ",
              slice(col("toks"), (col("chunk_id") * S + 1).cast("int"),
                least(lit(W), col("nt") - col("chunk_id") * S).cast("int")))).as("fp"))
          .orderBy("doc_id", "chunk_id")
      }),

    // Q84 deterministic train/val/test split — the assignment every corpus
    // gets before training: 80/10/10 by the engine's key-derived hash, so
    // membership is a pure function of doc_id (partition-stable,
    // replayable, and STABLE under corpus growth: adding documents never
    // moves an old one between splits — the property random shuffles
    // lack, and the reason eval contamination audits are possible at all).
    // Disjoint + exhaustive by construction (one CASE over one hash).
    // Pure map + final sort; the per-split counts are the 3-row summary a
    // manifest records.
    Q("q84_train_val_split",
      Some("""WITH h AS (
             |  SELECT doc_id, lang,
             |         ((doc_id % 2147483647) * 2654435761) % 100 AS bucket
             |  FROM documents),
             |a AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN bucket < 80 THEN 'train'
             |         WHEN bucket < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM h)
             |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM a GROUP BY split, lang ORDER BY split, lang""".stripMargin),
      (s, d) => {
        val a = t(s, d, "documents")
          .withColumn("bucket",
            expr("((doc_id % 2147483647) * 2654435761) % 100"))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val")
              .otherwise("test"))
        a.groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("split", "lang")
      }),

    // Q92 n-gram novelty attribution — the "how much of this document is
    // new to the corpus" signal dedup-aware mixing weighs (RefinedWeb-style
    // duplication analysis at n-gram granularity, not whole-doc): each
    // bigram occurrence is attributed to the document where the bigram
    // FIRST appears (min doc_id — deterministic, order-free). One corpus
    // pass explodes bigrams; first-seen is a vocabulary-sized partial agg;
    // the attribution join keys both sides on the gram and the per-doc
    // rollup partial-aggregates — the shuffles carry (gram, doc_id) and
    // (doc_id, counts), never text bodies beyond the grams themselves.
    Q("q92_ngram_novelty",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts FROM documents),
             |bg AS (SELECT doc_id, unnest(CASE WHEN len(ts) < 2 THEN []
             |         ELSE list_transform(generate_series(1, len(ts) - 1), i -> ts[i] || ' ' || ts[i + 1]) END) AS gram
             |       FROM toks),
             |first_seen AS (SELECT gram, min(doc_id) AS fs FROM bg GROUP BY gram)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |       CAST(sum(CASE WHEN fs = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |       CAST(count(*) - sum(CASE WHEN fs = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
             |FROM bg JOIN first_seen USING (gram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val bigramsExpr =
          """CASE WHEN size(ts) < 2 THEN array()
            |     ELSE transform(sequence(1, size(ts) - 1),
            |            i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) END""".stripMargin
        val bg = t(s, d, "documents")
          .select(col("doc_id"),
            expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ts"))
          .select(col("doc_id"), explode(expr(bigramsExpr)).as("gram"))
        val firstSeen = bg.groupBy("gram").agg(min("doc_id").as("fs"))
        bg.join(firstSeen, Seq("gram"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("fs") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            (col("n_grams") - col("n_novel")).as("n_seen"))
          .orderBy("doc_id")
      }),

    // Q93 equi-depth length deciles — the length-balancing profile a
    // packing/mixing stage consults, computed WITHOUT the single-partition
    // global window `ntile()` implies: per-length counts are a partial agg
    // over DISTINCT lengths (≪ corpus), the cumulative offset is a window
    // over that small frame, and each document's global position is its
    // length-bucket offset plus a rank over (length) — a window KEYED by
    // n_chars, which distributes. The closed-form ntile arithmetic (first
    // n%k buckets take ⌈n/k⌉ rows) then assigns buckets from the position
    // alone — bit-identical to the oracle's ntile(10) OVER (ORDER BY
    // n_chars, doc_id), with no stage that collapses to one task (the
    // q33e2 partitioned-sequence-id recipe applied to quantiles).
    Q("q93_length_deciles",
      Some("""WITH b AS (
             |  SELECT doc_id, n_chars,
             |         ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
             |  FROM documents)
             |SELECT CAST(bucket AS BIGINT) AS bucket,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents").select("doc_id", "n_chars")
        val k = 10
        // distinct-length histogram + exclusive running offset (small frame)
        val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
        val off = hist.withColumn("off",
          coalesce(sum("cnt").over(
            Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        val n = docs.count()
        val q = n / k
        val r = n % k
        // global 1-based position, then closed-form ntile bucket
        val pos = docs
          .withColumn("rk", row_number().over(
            Window.partitionBy("n_chars").orderBy("doc_id")).cast("long"))
          .join(broadcast(off.select(col("n_chars"), col("off"))), Seq("n_chars"))
          .withColumn("p", col("off") + col("rk"))
        val bucket = when(col("p") <= r * (q + 1),
            expr(s"(p - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"$r + (p - ${r * (q + 1)} - 1) div $q + 1"))
        pos.withColumn("bucket", bucket.cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
            sum("n_chars").as("sum_chars"))
          .orderBy("bucket")
      }),

    // Q139 epoch shuffle-shard — the training-data ordering operator: a
    // DETERMINISTIC pseudo-random permutation of the corpus for one
    // training epoch, sharded for parallel readers. Each doc's position
    // is derived from an md5-parity hash salted with the epoch ('ep2:'
    // here), so (a) the order is reproducible bit-for-bit on any cluster
    // (a rand()-based shuffle is partition-dependent — useless as a
    // training manifest), (b) different epochs yield different orders
    // from the same one-line salt change, and (c) position assignment is
    // a PER-SHARD row_number window — the global sort a naive shuffle
    // would pay is sharded into 8 independent windows, each shard a
    // separate training file at 100 TB. The oracle replays hash, shard
    // and rank arithmetically (the q94 md5-parity family). The shard
    // count IS the parallelism of the rank windows — 8 here matches the
    // fixture's file-count target; a production manifest uses O(cluster)
    // shards (e.g. 4096), which keeps every window partition small AND
    // yields the shard-per-training-file layout readers want.
    Q("q139_epoch_shuffle",
      Some("""WITH k AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5('ep2:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM documents)
             |SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM k ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("h", "doc_id")
        t(s, d, "documents")
          .select(col("doc_id"),
            expr("cast(conv(substring(md5(concat('ep2:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
              .as("h"))
          .withColumn("shard", col("h") % 8)
          .withColumn("pos", row_number().over(w).cast("long"))
          .select("doc_id", "shard", "pos")
          .orderBy("doc_id")
      })
  )
}

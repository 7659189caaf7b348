package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 curation extensions — the remaining steps a production
  * training-data pipeline runs that SURVEY §2.B.2 had not yet declared:
  * PII redaction, benchmark decontamination, incremental aggregate
  * maintenance, fuzzy (edit-distance) entity matching, n-gram language-model
  * statistics, and embedding quantization.
  *
  * Scale posture mirrors the rest of the engine: every operator is a
  * declarative plan (scan-side filters, partial aggregation, broadcast of
  * the small side), all randomness is key-derived, and each query carries a
  * bit-exact DuckDB oracle.
  */
object CurationExt extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  // Word 5-gram shingles for decontamination overlap: the fused codegen
  // expression (graft.functions.WordNgrams, strict mode — <5-token docs
  // contribute no shingles). The equivalent declarative form is
  // array_distinct(transform(sequence(...), i -> concat_ws(' ', slice(...))))
  // — HOFs run interpreted and cost ~4 s at sf0.1 vs ~0.4 s fused.

  private val duckToks =
    "list_filter(string_split_regex(lower(text), ' +'), t -> t != '')"
  private val duckFivegrams =
    s"""list_distinct(CASE WHEN len($duckToks) >= 5
       |  THEN list_transform(generate_series(1, len($duckToks) - 4),
       |         i -> $duckToks[i] || ' ' || $duckToks[i+1] || ' ' || $duckToks[i+2] || ' ' || $duckToks[i+3] || ' ' || $duckToks[i+4])
       |  ELSE list_slice($duckToks, 1, 0) END)""".stripMargin

  // PII patterns shared by both dialects (plain RE2-safe classes — no
  // backrefs/lookaround, so Java and RE2 agree match-for-match).
  private val EmailRe = "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+"
  private val PhoneRe = "555-[0-9]{4}"

  // Word-bigram expressions shared by q68 (LM statistics) and q79 (LM
  // familiarity scoring) — term-for-term equivalent in the two dialects.
  private val duckBigrams =
    s"""CASE WHEN len(toks) >= 2
       |    THEN list_transform(generate_series(1, len(toks) - 1),
       |           i -> toks[i] || ' ' || toks[i+1])
       |    ELSE list_slice(toks, 1, 0) END""".stripMargin
  private val sparkBigrams =
    """case when size(toks) >= 2
      |  then transform(sequence(1, size(toks) - 1),
      |         i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
      |  else slice(toks, 1, 0) end""".stripMargin

  val qs: Seq[Q] = Seq(

    // Q59 PII redaction: scrub emails and phone numbers from free text and
    // count what was removed — the compliance pass every corpus takes
    // before training. The text is composed deterministically from the
    // customer table (the raw testdata has no PII by construction), then
    // redacted with shared RE2-compatible patterns. Pure per-row map: no
    // shuffle, pushes the projection to the scan at any scale.
    Q("q59_pii_redact",
      Some(s"""SELECT c_custkey AS id,
              |  regexp_replace(regexp_replace(
              |    'Contact ' || c_name || ' <' || lower(c_name) || '.' || CAST(c_custkey AS VARCHAR) || '@example.com> or call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
              |    '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS redacted,
              |  CAST(len(regexp_extract_all(
              |    'Contact ' || c_name || ' <' || lower(c_name) || '.' || CAST(c_custkey AS VARCHAR) || '@example.com> or call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
              |    '$EmailRe')) AS BIGINT)
              |  + CAST(len(regexp_extract_all(
              |    'Contact ' || c_name || ' <' || lower(c_name) || '.' || CAST(c_custkey AS VARCHAR) || '@example.com> or call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
              |    '$PhoneRe')) AS BIGINT) AS n_pii
              |FROM customer ORDER BY id""".stripMargin),
      (s, d) => t(s, d, "customer")
        .withColumn("raw", concat(
          lit("Contact "), col("c_name"),
          lit(" <"), lower(col("c_name")), lit("."),
          col("c_custkey").cast("string"), lit("@example.com> or call 555-"),
          lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0")))
        .select(
          col("c_custkey").as("id"),
          regexp_replace(regexp_replace(col("raw"), lit(EmailRe), lit("<EMAIL>")),
            lit(PhoneRe), lit("<PHONE>")).as("redacted"),
          (size(expr(s"regexp_extract_all(raw, '$EmailRe', 0)")).cast("long")
            + size(expr(s"regexp_extract_all(raw, '$PhoneRe', 0)")).cast("long"))
            .as("n_pii"))
        .orderBy("id")),

    // Q65 benchmark decontamination: flag training documents sharing any
    // word 5-gram with a held-out eval set (here: doc_id % 97 == 0). The
    // canonical inverted-index formulation — explode distinct shingles on
    // both sides and join on the shingle — so shuffle volume is O(total
    // n-grams), never O(train × eval); the eval side is tiny and broadcast.
    // At 100 TB the same plan holds: the eval index is the small side by
    // construction.
    Q("q65_decontaminate",
      Some(s"""WITH sh AS (
              |  SELECT doc_id, $duckFivegrams AS sh FROM documents),
              |train AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0),
              |ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0)
              |SELECT t.doc_id, count(*) AS n_shared
              |FROM train t JOIN ev USING (g)
              |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin),
      (s, d) => {
        val sh = t(s, d, "documents")
          .withColumn("toks", expr(TextAnalysis.tokensExpr))
          .withColumn("sh",
            graft.functions.TextShingles.wordNgramsStrict(col("toks"), 5))
          .select(col("doc_id"), col("sh"))
        val train = sh.filter(pmod(col("doc_id"), lit(97)) =!= 0)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        val ev = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
          .select(explode(col("sh")).as("g")).distinct()
        train.join(broadcast(ev), Seq("g"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      }),

    // Q66 incremental aggregate maintenance: refresh a per-customer
    // materialized rollup from a delta batch WITHOUT rescanning the base —
    // aggregate the delta, union with the (pre-aggregated) base state, and
    // merge-sum. The oracle is the full recompute, proving partial-state
    // merge equals the direct aggregate (count/sum are decomposable; the
    // DECIMAL sums keep the merge exact). At 100 TB this is the difference
    // between touching a day's partition and touching the whole table.
    Q("q66_incr_agg",
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      (s, d) => {
        val orders = t(s, d, "orders")
        def partial(df: DataFrame): DataFrame = df.groupBy("o_custkey")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        // "base" = yesterday's materialized state; "delta" = today's batch.
        val base = partial(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 7))
        val delta = partial(orders.filter(pmod(col("o_orderkey"), lit(10)) === 7))
        base.unionByName(delta)
          .groupBy("o_custkey")
          .agg(sum(col("n")).as("n"), sum(col("rev")).as("rev"))
          .select(col("o_custkey"), col("n"),
            col("rev").cast("double").as("revenue"))
          .orderBy("o_custkey")
      }),

    // Q67 fuzzy entity matching: near-identical product names per brand by
    // Levenshtein distance — catalog reconciliation / entity resolution.
    // Names are first reduced to DISTINCT (brand, name) pairs (the entity
    // level, and a ~10^3 reduction here), then compared within a brand
    // block; distance 0 (identical) is excluded as already covered by exact
    // dedup. Blocking bounds the pair space exactly as q26d's prefix
    // blocking does.
    Q("q67_editdist_names",
      Some("""WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
             |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             |FROM names a JOIN names b
             |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
             |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
             |ORDER BY a.p_brand, name_a, name_b""".stripMargin),
      (s, d) => {
        val names = t(s, d, "part").select("p_brand", "p_name").distinct()
        val a = names
        val b = names.select(col("p_brand").as("brand2"), col("p_name").as("name_b"))
        a.join(b, col("p_brand") === col("brand2") && col("p_name") < col("name_b"))
          .withColumn("dist", levenshtein(col("p_name"), col("name_b")).cast("long"))
          .filter(col("dist").between(1, 3))
          .select(col("p_brand"), col("p_name").as("name_a"), col("name_b"), col("dist"))
          .orderBy("p_brand", "name_a", "name_b")
      }),

    // Q68 bigram language-model statistics: top-20 bigrams with conditional
    // probability P(w2 | w1) = count(w1 w2) / count(w1 ·). Counts are exact
    // integers aggregated map-side; the probability is one BIGINT/BIGINT
    // IEEE division, bit-identical across engines.
    Q("q68_bigram_lm",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |bg AS (
              |  SELECT unnest($duckBigrams) AS bigram
              |  FROM toks),
              |counts AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
              |SELECT bigram, CAST(n AS BIGINT) AS n,
              |  n / sum(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS p_cond
              |FROM counts
              |ORDER BY n DESC, bigram LIMIT 20""".stripMargin),
      (s, d) => {
        val bigrams = t(s, d, "documents")
          .withColumn("toks", expr(TextAnalysis.tokensExpr))
          .select(explode(expr(sparkBigrams)).as("bigram"))
        val counts = bigrams.groupBy("bigram").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(split(col("bigram"), " ").getItem(0))
        counts
          .withColumn("p_cond", col("n").cast("double") / sum(col("n")).over(w))
          .orderBy(desc("n"), asc("bigram"))
          .limit(20)
      }),

    // Q69 embedding quantization: per-vector min-max int8-style compression
    // (the storage layout ANN serving uses at scale — 4× smaller than
    // float32). Elements are cast float→double (exact) and quantized with
    // one shared expression shape, so every IEEE step is bit-identical in
    // both engines; constant vectors quantize to all-zero via the scale
    // guard. The checksum folds the quantized codes so the oracle verifies
    // every element, not just the range.
    Q("q69_quantize_embed",
      Some("""WITH v AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
             |  FROM embeddings),
             |mm AS (
             |  SELECT vec_id, vd,
             |    list_aggregate(vd, 'min') AS vmin,
             |    list_aggregate(vd, 'max') AS vmax
             |  FROM v)
             |SELECT vec_id, vmin, vmax,
             |  CAST(list_sum(list_transform(vd, x ->
             |    CASE WHEN vmax > vmin
             |         THEN CAST(floor((x - vmin) * 255.0 / (vmax - vmin)) AS BIGINT)
             |         ELSE 0 END)) AS BIGINT) AS checksum
             |FROM mm ORDER BY vec_id""".stripMargin),
      (s, d) => t(s, d, "embeddings")
        .withColumn("vd", expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("vmin", array_min(col("vd")))
        .withColumn("vmax", array_max(col("vd")))
        .select(col("vec_id"), col("vmin"), col("vmax"),
          expr("""aggregate(vd, 0L, (acc, x) ->
                 |  acc + (case when vmax > vmin
                 |              then cast(floor((x - vmin) * 255.0D / (vmax - vmin)) as bigint)
                 |              else 0L end))""".stripMargin).as("checksum"))
        .orderBy("vec_id")),

    // Q76 temperature-scaled domain mixing — the multilingual-sampling
    // pattern (weight ∝ n^α, α = 1/2) that upsamples small (lang, source)
    // domains relative to their raw share before training. All arithmetic
    // is exact-integer so the sampled SET is bit-reproducible: weights are
    // integer isqrt(n) (floor∘sqrt is exact for n ≪ 2⁵²), quotas are
    // integer division of a 200-doc budget, and each group keeps its
    // quota-smallest docs by the shared key-derived mix hash — no RNG, no
    // float accumulation order to diverge between engines.
    //
    // Scale posture: group stats are one row per (lang, source) — broadcast
    // back to the corpus. The windowed rank is the exact top-quota form and
    // shuffles one row per doc on the group key; the same plan degrades
    // gracefully to the rank-free approximation (keep mix_hash below a
    // quota/n-scaled threshold, pure map) when the corpus no longer wants
    // a per-group sort — the quota frame and hash are shared by both forms.
    Q("q76_mix_sample",
      Some("""WITH g AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS grp_docs,
             |         CAST(floor(sqrt(count(*))) AS BIGINT) AS sg
             |  FROM documents GROUP BY lang, source),
             |tot AS (SELECT CAST(sum(sg) AS BIGINT) AS stot FROM g),
             |q AS (SELECT lang, source, grp_docs,
             |             CAST((200 * sg) // stot AS BIGINT) AS grp_target
             |      FROM g, tot),
             |h AS (SELECT doc_id, lang, source,
             |             ((doc_id % 2147483647) * 2654435761) % 1000000007 AS mix_hash
             |      FROM documents),
             |r AS (SELECT h.doc_id, h.lang, h.source, q.grp_docs, q.grp_target,
             |             row_number() OVER (PARTITION BY h.lang, h.source
             |                                ORDER BY h.mix_hash, h.doc_id) AS rk
             |      FROM h JOIN q USING (lang, source))
             |SELECT doc_id, lang, source, grp_docs, grp_target
             |FROM r WHERE rk <= grp_target ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val docs = t(s, d, "documents")
        val grp = docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("grp_docs"))
          .withColumn("sg", floor(sqrt(col("grp_docs").cast("double"))).cast("long"))
        val tot = grp.agg(sum("sg").as("stot"))
        val quota = grp.crossJoin(broadcast(tot))
          .withColumn("grp_target", expr("(200 * sg) div stot"))
          .select("lang", "source", "grp_docs", "grp_target")
        val w = Window.partitionBy("lang", "source")
          .orderBy(col("mix_hash"), col("doc_id"))
        docs
          .withColumn("mix_hash",
            expr("((doc_id % 2147483647) * 2654435761) % 1000000007"))
          .join(broadcast(quota), Seq("lang", "source"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= col("grp_target"))
          .select("doc_id", "lang", "source", "grp_docs", "grp_target")
          .orderBy("doc_id")
      }),

    // Q79 LM familiarity scoring — the perplexity-filter shape (CCNet:
    // score every candidate against an LM trained on a trusted slice, keep
    // what the LM finds unsurprising) with exact integer semantics so it
    // hash-checks: the "LM" is the set of word bigrams whose English-slice
    // count clears a RELATIVE floor (≥ 1/800 of all English bigram
    // occurrences — scale-invariant, so the score keeps its spread at any
    // SF instead of saturating as absolute counts grow), and a document's
    // familiarity is the fraction of its bigram OCCURRENCES the LM knows.
    // One float division at the end; everything upstream is integer counts.
    //
    // Scale posture: the LM index is count-pruned and carries one short
    // string per surviving bigram — broadcast to the probe side (the same
    // economics as q65's decontamination index); at a vocabulary where the
    // pruned index outgrows the broadcast budget the SAME plan runs as a
    // hash join by dropping the broadcast hint, nothing else changes. Probe
    // bigrams never shuffle: the LM join is map-side, and only (doc_id,
    // two counts) reach the rollup exchange.
    Q("q79_lm_familiarity",
      Some(s"""WITH toks AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
              |bg AS (
              |  SELECT doc_id, lang, unnest($duckBigrams) AS bigram FROM toks),
              |lm AS (
              |  SELECT bigram FROM bg WHERE lang = 'en'
              |  GROUP BY bigram
              |  HAVING count(*) >= (SELECT count(*) FROM bg WHERE lang = 'en') // 800),
              |sc AS (
              |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              |         CAST(sum(CASE WHEN lm.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known
              |  FROM bg b LEFT JOIN lm ON b.bigram = lm.bigram
              |  GROUP BY b.doc_id)
              |SELECT d.doc_id, d.lang,
              |       coalesce(sc.n_bigrams, 0) AS n_bigrams,
              |       coalesce(sc.n_known, 0) AS n_known,
              |       CASE WHEN coalesce(sc.n_bigrams, 0) = 0 THEN 0.0
              |            ELSE CAST(sc.n_known AS DOUBLE) / sc.n_bigrams END AS familiarity
              |FROM documents d LEFT JOIN sc USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin),
      (s, d) => {
        val docs = t(s, d, "documents")
        val bg = docs
          .withColumn("toks", expr(TextAnalysis.tokensExpr))
          .select(col("doc_id"), col("lang"),
            explode(expr(sparkBigrams)).as("bigram"))
        val en = bg.filter(col("lang") === "en")
        val tot = en.agg(count(lit(1)).as("etot"))
        val lm = en.groupBy("bigram").agg(count(lit(1)).as("lmn"))
          .crossJoin(broadcast(tot))
          .filter(col("lmn") >= expr("etot div 800"))
          .select(col("bigram"), lit(1).as("known"))
        val sc = bg.join(broadcast(lm), Seq("bigram"), "left")
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_bigrams"),
            sum(coalesce(col("known"), lit(0))).cast("long").as("n_known"))
        docs.select("doc_id", "lang").join(sc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("n_known"), lit(0L)).as("n_known"),
            when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
              .otherwise(col("n_known").cast("double") / col("n_bigrams")).as("familiarity"))
          .orderBy("doc_id")
      }),

    // Q98 weighted sampling WITHOUT replacement per stratum — priority
    // sampling (Duffield/Lund/Thorup, JACM '07): each doc draws a
    // hash-derived 32-bit uniform u and gets priority key u/w (w = doc
    // length); the k smallest keys per language stratum are the sample,
    // and inclusion probability rises with weight exactly as the scheme
    // prescribes. The key is INTEGER floor(u/w) with doc_id tie-break —
    // no ln(), no float ordering, so both engines select identical rows
    // (the A-ES exponential-key formulation needs log(); priority
    // sampling is its integer-exact sibling). Scale posture: one narrow
    // (lang, ids, key) shuffle; the rank ≤ k filter compiles to
    // WindowGroupLimit, so every map task keeps only its local top-k per
    // stratum before the exchange — the shuffle carries O(k · strata ·
    // tasks) rows, not the corpus (plan-asserted in CurationOpsSpec).
    Q("q98_priority_sample",
      Some("""WITH u AS (
             |  SELECT lang, doc_id, n_chars,
             |         (concat('0x', substring(md5(concat('ps:', CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT
             |          % 4294967296) // greatest(n_chars, 1) AS pkey
             |  FROM documents),
             |r AS (SELECT lang, doc_id, n_chars, pkey,
             |             row_number() OVER (PARTITION BY lang
             |                                ORDER BY pkey, doc_id) AS rk
             |      FROM u)
             |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             |       CAST(pkey AS BIGINT) AS pkey, CAST(rk AS BIGINT) AS rk
             |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("pkey", "doc_id")
        t(s, d, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars"))
          .withColumn("pkey", expr(
            """(cast(conv(substring(md5(concat('ps:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)
              | % 4294967296) div greatest(n_chars, 1)""".stripMargin))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .orderBy("lang", "rk")
      })
  )
}

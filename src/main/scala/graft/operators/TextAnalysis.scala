package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the north-star
  * training-data-pipeline surface (SURVEY §2.B Q28): tokenization, token
  * statistics, quality scoring, marker-based language id, and document
  * fingerprinting. Everything is Column/higher-order-function composition
  * (codegen'd, shuffle only where an aggregation demands it); the per-doc
  * metrics are embarrassingly parallel map work — the shape that scales to
  * 100 TB by adding executors.
  */
object TextAnalysis extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Whitespace tokenization with empty-token filtering (lowercased). */
  val tokensExpr = "filter(split(lower(text), ' +'), t -> t != '')"

  /** Stopword list used by quality scoring and language id. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ",", "]")
  private def sparkList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("array(", ",", ")")

  /** Per-language marker vocabularies for the n-gram/marker-voting language
    * id heuristic. On organic text these would be learned character n-gram
    * profiles; the operator shape (score per language → argmax with a fixed
    * tie-break order) is the same either way. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  /** BPE primitives shared by q85 (merge learning) and q88 (tokenizer
    * apply). Symbol sequences ride as a space-joined string; pair
    * extraction and the greedy merge fold are pure higher-order-function
    * work. The fold is canonically greedy left-to-right and Spark's
    * `aggregate` HOF and DuckDB's `list_reduce` are the same left fold
    * seeded with the first element, so both engines produce byte-identical
    * symbolizations (proven at all three SFs by q85). */
  private val bpePairsExpr =
    """CASE WHEN size(split(s, ' ')) < 2 THEN array()
      |     ELSE transform(sequence(1, size(split(s, ' ')) - 1),
      |            i -> concat(element_at(split(s, ' '), i), ' ',
      |                        element_at(split(s, ' '), i + 1))) END""".stripMargin
  private val bpeMergeExpr =
    """aggregate(
      |  slice(split(s, ' '), 2, size(split(s, ' ')) - 1),
      |  element_at(split(s, ' '), 1),
      |  (acc, x) -> CASE WHEN (acc = p1 OR endswith(acc, concat(' ', p1))) AND x = p2
      |                   THEN concat(substring(acc, 1, length(acc) - length(p1)), p1, p2)
      |                   ELSE concat(acc, ' ', x) END)""".stripMargin

  /** One DuckDB learning round: pair stats over dict(r-1), argmax, merged
    * dict r. Chained as CTEs by both the q85 and q88 oracles. */
  private def bpeOracleRound(r: Int): String = s"""
    |pairs$r AS (
    |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    |    SELECT freq, unnest(CASE WHEN len(string_split(s, ' ')) < 2 THEN []
    |      ELSE list_transform(generate_series(1, len(string_split(s, ' ')) - 1),
    |             i -> string_split(s, ' ')[i] || ' ' || string_split(s, ' ')[i + 1]) END) AS pair
    |    FROM dict${r - 1})
    |  GROUP BY pair),
    |top$r AS (
    |  SELECT pair, cnt, string_split(pair, ' ')[1] AS p1, string_split(pair, ' ')[2] AS p2
    |  FROM pairs$r ORDER BY cnt DESC, pair LIMIT 1),
    |dict$r AS (
    |  SELECT word, freq,
    |    list_reduce(string_split(s, ' '), (acc, x) ->
    |      CASE WHEN (acc = p1 OR ends_with(acc, ' ' || p1)) AND x = p2
    |           THEN substring(acc, 1, length(acc) - length(p1)) || p1 || p2
    |           ELSE acc || ' ' || x END) AS s
    |  FROM dict${r - 1}, top$r)""".stripMargin

  /** The corpus word dictionary CTE both BPE oracles start from. */
  private val bpeOracleDict0 =
    """dict0 AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
      |         array_to_string(regexp_extract_all(word, '.'), ' ') AS s
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents)
      |  GROUP BY word)""".stripMargin

  /** Learn `rounds` BPE merges over the corpus word dictionary (ONE corpus
    * pass; every round is vocabulary-sized work — q85's scaladoc has the
    * full economics). Returns the per-round 1-row argmax frames
    * (localCheckpointed — lineage-free) and, when `encodeVocab` is set, the
    * fully merged dictionary `(word, freq, s)` as an eager vocabulary-sized
    * localCheckpoint so callers can join it without keeping round caches
    * alive. */
  private def bpeLearn(s: SparkSession, d: String, rounds: Int,
      encodeVocab: Boolean): (Seq[DataFrame], Option[DataFrame]) = {
    val dict0 = t(s, d, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("s", expr("array_join(regexp_extract_all(word, '.', 0), ' ')"))
      .cache()
    var dict = dict0
    val dicts = scala.collection.mutable.Buffer(dict0)
    val tops = (1 to rounds).map { r =>
      val top = dict
        .select(col("freq"), explode(expr(bpePairsExpr)).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(col("pair"), col("cnt"),
          expr("split(pair, ' ')[0]").as("p1"),
          expr("split(pair, ' ')[1]").as("p2"))
        .localCheckpoint() // 1 row; forces this round's dict, cuts lineage
      if (r < rounds || encodeVocab) {
        val next = dict.crossJoin(broadcast(top.select("p1", "p2")))
          .withColumn("s", expr(bpeMergeExpr))
          .select("word", "freq", "s")
          .cache()
        dicts += next
        dict = next
      }
      top
    }
    val encoded =
      if (encodeVocab) Some(dict.localCheckpoint()) // vocab-sized, eager
      else None
    dicts.foreach(_.unpersist()) // callers read only checkpointed frames
    (tops, encoded)
  }

  // ---- Unigram-LM (SentencePiece-shape) tokenizer: q223 train / q224
  // apply (r14 verdict #6) — the OTHER mainstream tokenizer family
  // beside q85/q88's BPE. The classic algorithm (Kudo 2018) seeds a
  // large candidate vocabulary, then alternates (E) best-segmentation
  // of the corpus under current piece scores with (M) piece re-counting
  // and pruning. This implementation keeps that EM shape but replaces
  // float log-probs with an EXACT-INTEGER objective so both engines
  // hash-match bit-for-bit: a segmentation costs
  // `pieces * 10^12 - sum(pieceCount)` (fewest pieces first, then the
  // most-frequent pieces; ties broken longest-piece-first in the
  // backtrack) — the same lexicographic shape as Viterbi under a
  // frequency-proportional LM, in bigint arithmetic. Economics: the
  // CORPUS is touched once (the word-frequency dictionary); every EM
  // round is vocabulary-sized work (dict × a broadcast one-row piece
  // list), exactly the q85 discipline, so rounds cost the same at
  // sf0.001 and 100 TB modulo the dictionary's sublinear growth. The
  // ENGINE path for the per-word Viterbi is the fused map-backed
  // `functions.UnigramEncode` expression (O(1) piece lookups — the
  // production-vocab scale path; r15 verdict #1). The SQL fold
  // skeletons below (`uniFwdSk`/`uniBtSk`/`uniToksSk`) remain as the
  // executable spec of its semantics: the DuckDB oracle replays them
  // verbatim, and CurationOpsSpec pins native == fold on a real
  // dictionary, so the hash-lockstep survives either side changing.
  private def uniFwdTermSk(k: Int): String = {
    val p = s"substring(word, i - $k + 1, $k)"
    s"CASE WHEN i >= $k AND array_position(pl, $p) > 0 THEN " +
      s"element_at(acc, i - $k + 1) + (1000000000000L - " +
      s"element_at(cl, cast(array_position(pl, $p) as int))) " +
      s"ELSE 4000000000000000L END"
  }
  /** Forward Viterbi costs: `fw[i+1]` = best cost of the first `i`
    * chars (bigint; single chars are always in vocab, so every
    * position is reachable and the sentinel never wins). */
  private[graft] val uniFwdSk =
    "aggregate(sequence(1, length(word)), array(cast(0 as bigint)), " +
      s"(acc, i) -> concat(acc, array(least(${uniFwdTermSk(1)}, " +
      s"${uniFwdTermSk(2)}, ${uniFwdTermSk(3)}, ${uniFwdTermSk(4)}))))"
  private def uniBtCondSk(k: Int): String = {
    val pos = "cast(element_at(acc, size(acc)) as int)"
    val p = s"substring(word, $pos - $k + 1, $k)"
    s"$pos >= $k AND array_position(pl, $p) > 0 AND " +
      s"element_at(fw, $pos - $k + 1) + (1000000000000L - " +
      s"element_at(cl, cast(array_position(pl, $p) as int))) = " +
      s"element_at(fw, $pos + 1)"
  }
  /** Deterministic backtrack as an APPEND-ONLY position fold: state is
    * the descending list of segment boundaries (last element = current
    * position; 0 repeats once the word is consumed); at each step take
    * the LONGEST piece that achieves the optimal forward cost — both
    * engines pick identical segmentations, so recounts agree. The
    * append-a-scalar-CASE shape is deliberate and LOAD-BEARING for the
    * oracle: DuckDB 1.0 mis-vectorizes lambdas whose CASE branches are
    * LIST-typed at corpus scale (rows silently receive a neighbor's
    * fold result); appending one scalar per step — the same construct
    * the forward fold uses — evaluates correctly, so both sides use it. */
  private[graft] val uniBtSk = {
    val pos = "cast(element_at(acc, size(acc)) as int)"
    "aggregate(sequence(1, length(word)), " +
      "array(cast(length(word) as bigint)), " +
      s"(acc, z) -> concat(acc, array(CASE WHEN $pos = 0 " +
      "THEN cast(0 as bigint) " +
      s"WHEN ${uniBtCondSk(4)} THEN cast($pos - 4 as bigint) " +
      s"WHEN ${uniBtCondSk(3)} THEN cast($pos - 3 as bigint) " +
      s"WHEN ${uniBtCondSk(2)} THEN cast($pos - 2 as bigint) " +
      s"ELSE cast($pos - 1 as bigint) END)))"
  }
  /** Boundary pairs → pieces (left-to-right). */
  private[graft] val uniToksSk =
    "reverse(filter(transform(sequence(1, size(btp) - 1), " +
      "j -> CASE WHEN element_at(btp, j) > element_at(btp, j + 1) " +
      "THEN substring(word, cast(element_at(btp, j + 1) as int) + 1, " +
      "cast(element_at(btp, j) - element_at(btp, j + 1) as int)) " +
      "ELSE NULL END), x -> x IS NOT NULL))"
  /** Corpus word dictionary — the ONE corpus pass (same regexp as
    * q85's, proven hash-stable at all three SFs). */
  private def uniDict(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
  private def uniSingles(dict: DataFrame): DataFrame = dict
    .select(col("freq"), explode(expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .as("piece"))
    .groupBy("piece").agg(sum("freq").as("cnt"))
  /** Collected (piece, cnt) vocabulary, sorted by piece — a Viterbi
    * vocabulary is KB-sized driver metadata (the q125 params/ rule), so
    * it travels inside the UnigramEncode expression instead of as a
    * crossJoined one-row frame. */
  private def uniVocabArrays(vocab: DataFrame): (Seq[String], Seq[Long]) = {
    val rows = vocab.select("piece", "cnt").collect().sortBy(_.getString(0))
    (rows.toSeq.map(_.getString(0)), rows.toSeq.map(_.getLong(1)))
  }
  /** Per-word best segmentation under the vocabulary — one map-only
    * pass with the fused `functions.UnigramEncode` expression
    * (hash-locked to the uniFwdSk/uniBtSk/uniToksSk fold the DuckDB
    * oracle replays; the lockstep is spec-pinned in CurationOpsSpec). */
  private def uniSegment(dict: DataFrame, pl: Seq[String],
      cl: Seq[Long]): DataFrame =
    dict.withColumn("toks",
      graft.functions.UnigramEncode(col("word"), pl, cl))
  /** E+M: segment the dictionary, recount used pieces (weighted by word
    * frequency), keep ALL singles (coverage guarantee) + the top-`k`
    * multi-char pieces — the unigram prune. Vocab-sized output,
    * localCheckpointed eager. */
  private def uniEmRound(dict: DataFrame, singles: DataFrame,
      vocab: DataFrame, k: Int): DataFrame = {
    val (pl, cl) = uniVocabArrays(vocab)
    val used = uniSegment(dict, pl, cl)
      .select(col("freq"), explode(col("toks")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("ucnt"))
    singles.select("piece").join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("ucnt"), lit(0L)).as("cnt"))
      .unionByName(used.filter(length(col("piece")) >= 2)
        .orderBy(col("ucnt").desc, col("piece")).limit(k)
        .select(col("piece"), col("ucnt").as("cnt")))
      .localCheckpoint()
  }
  /** Two EM rounds over a 48-multi seed, pruning to 32 then 24 —
    * returns the final vocabulary frame. Callers unpersist `dict`
    * themselves. */
  private def uniTrain(dict: DataFrame): DataFrame = {
    val singles = uniSingles(dict).localCheckpoint()
    val cand = dict
      .select(col("freq"), explode(expr(
        """flatten(transform(sequence(1, length(word)), i ->
          |  CASE WHEN length(word) - i + 1 >= 2
          |       THEN transform(sequence(2, least(4, length(word) - i + 1)),
          |              L -> substring(word, i, L))
          |       ELSE cast(array() as array<string>) END))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val vocab0 = singles.unionByName(
      cand.orderBy(col("cnt").desc, col("piece")).limit(48))
    val vocab1 = uniEmRound(dict, singles, vocab0, 32)
    uniEmRound(dict, singles, vocab1, 24)
  }

  /** Per-(sfDir) persisted trained vocabularies built in THIS JVM — the
    * q125/q126 build-once/serve-many split (r15 verdict #1): training is
    * paid ONCE per corpus; q223 ranks and q224 tokenizes by READING the
    * persisted vocabulary. Same tmp-dir + shutdown-hook discipline as
    * Similarity.buildIvfIndex. */
  private val uniVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The vocab dir a corpus resolved to in this JVM, if trained — lets
    * specs assert train-once reuse without scanning tmpdir. */
  private[graft] def uniVocabDirFor(dir: String): Option[String] =
    Option(uniVocabCache.get(dir))

  def trainedUnigramVocab(s: SparkSession, dir: String): String =
    uniVocabCache.computeIfAbsent(dir, { _ =>
      val dict = uniDict(s, dir).cache()
      val vocab = uniTrain(dict)
      val p = java.nio.file.Files.createTempDirectory("graft_uni_vocab_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          try walk.iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        }
      }
      vocab.coalesce(1).write.mode("overwrite").parquet(s"$p/vocab")
      dict.unpersist()
      p.toString
    })

  // ---- The DuckDB mirror of the same pipeline, CTE-chained like the
  // q85/q88 oracles. Dialect map: aggregate→list_reduce (seeded by
  // wrapping elements as single-element lists, so the [0]/[lenStr] seed
  // is the first element), element_at→1-based [], array_position→
  // list_position (both return 0 when absent), slice(acc,2,…)→acc[2:].
  private def uniFwdTermDd(k: Int): String = {
    val p = s"substring(word, CAST(x[1] AS INT) - $k + 1, $k)"
    s"CASE WHEN x[1] >= $k AND list_position(pl, $p) > 0 THEN " +
      s"acc[CAST(x[1] AS INT) - $k + 1] + (1000000000000 - " +
      s"cl[list_position(pl, $p)]) ELSE CAST(4000000000000000 AS BIGINT) END"
  }
  private val uniFwdDd =
    "list_reduce(list_concat([[CAST(0 AS BIGINT)]], " +
      "list_transform(generate_series(1, length(word)), " +
      "i -> [CAST(i AS BIGINT)])), " +
      s"(acc, x) -> list_append(acc, least(${uniFwdTermDd(1)}, " +
      s"${uniFwdTermDd(2)}, ${uniFwdTermDd(3)}, ${uniFwdTermDd(4)})))"
  private def uniBtCondDd(k: Int): String = {
    val pos = "CAST(acc[len(acc)] AS INT)"
    val p = s"substring(word, $pos - $k + 1, $k)"
    s"$pos >= $k AND list_position(pl, $p) > 0 AND " +
      s"fw[$pos - $k + 1] + (1000000000000 - cl[list_position(pl, $p)]) " +
      s"= fw[$pos + 1]"
  }
  private val uniBtDd = {
    val pos = "CAST(acc[len(acc)] AS INT)"
    "list_reduce(list_concat([[CAST(length(word) AS BIGINT)]], " +
      "list_transform(generate_series(1, length(word)), " +
      "i -> [CAST(0 AS BIGINT)])), " +
      s"(acc, x) -> list_append(acc, CASE WHEN $pos = 0 " +
      "THEN CAST(0 AS BIGINT) " +
      s"WHEN ${uniBtCondDd(4)} THEN $pos - 4 " +
      s"WHEN ${uniBtCondDd(3)} THEN $pos - 3 " +
      s"WHEN ${uniBtCondDd(2)} THEN $pos - 2 " +
      s"ELSE $pos - 1 END))"
  }
  private val uniToksDd =
    "list_reverse(list_filter(list_transform(" +
      "generate_series(1, len(btp) - 1), " +
      "j -> CASE WHEN btp[j] > btp[j + 1] " +
      "THEN substring(word, CAST(btp[j + 1] AS INT) + 1, " +
      "CAST(btp[j] - btp[j + 1] AS INT)) " +
      "ELSE NULL END), x -> x IS NOT NULL))"
  private def uniRoundDd(r: Int, k: Int): String = s"""
    |fb$r AS (
    |  SELECT word, freq, $uniToksDd AS toks
    |  FROM (SELECT word, freq, $uniBtDd AS btp
    |        FROM (SELECT word, freq, pl, cl, $uniFwdDd AS fw
    |              FROM dict, vlist${r - 1}))),
    |used$r AS (
    |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    |    SELECT freq, unnest(toks) AS piece FROM fb$r) GROUP BY piece),
    |vocab$r AS (
    |  SELECT s.piece, COALESCE(u.cnt, 0) AS cnt
    |  FROM singles s LEFT JOIN used$r u USING (piece)
    |  UNION ALL
    |  SELECT piece, cnt FROM (
    |    SELECT piece, cnt FROM used$r WHERE length(piece) >= 2
    |    ORDER BY cnt DESC, piece LIMIT $k)),
    |vlist$r AS (
    |  SELECT list(piece ORDER BY piece) AS pl,
    |         list(cnt ORDER BY piece) AS cl FROM vocab$r)""".stripMargin
  private val uniPreDd = s"""
    |WITH words AS (
    |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    |  FROM documents),
    |dict AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
    |         FROM words GROUP BY word),
    |cand AS (
    |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    |    SELECT freq, unnest(flatten(list_transform(
    |        generate_series(1, length(word)),
    |        i -> list_transform(
    |               generate_series(2, least(4, length(word) - i + 1)),
    |               L -> substring(word, i, L))))) AS piece
    |    FROM dict) GROUP BY piece),
    |singles AS (
    |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    |    SELECT freq, unnest(list_transform(
    |        generate_series(1, length(word)),
    |        i -> substring(word, i, 1))) AS piece
    |    FROM dict) GROUP BY piece),
    |vocab0 AS (
    |  SELECT piece, cnt FROM singles
    |  UNION ALL
    |  SELECT piece, cnt FROM (
    |    SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece LIMIT 48)),
    |vlist0 AS (
    |  SELECT list(piece ORDER BY piece) AS pl,
    |         list(cnt ORDER BY piece) AS cl
    |  FROM vocab0),${uniRoundDd(1, 32)},${uniRoundDd(2, 24)}""".stripMargin

  val qs: Seq[Q] = Seq(

    // Q28 token counting + top-n terms per language (split → explode →
    // groupBy → windowed rank; partial aggregation makes the shuffle carry
    // only (lang, token, count)).
    Q("q28_token_counts",
      Some("""WITH toks AS (
             |  SELECT lang, unnest(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS token
             |  FROM documents),
             |counts AS (SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token)
             |SELECT lang, token, n, rnk FROM (
             |  SELECT lang, token, n,
             |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
             |  FROM counts) WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin),
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("lang"), explode(expr(tokensExpr)).as("token"))
        val counts = toks.groupBy("lang", "token").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang").orderBy(desc("n"), asc("token"))
        counts
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select("lang", "token", "n", "rnk")
          .orderBy("lang", "rnk")
      }),

    // Q28b per-document quality metrics (lengths, ratios, bucketed score) —
    // pure map work, no shuffle.
    Q("q28b_quality",
      Some(s"""SELECT doc_id,
              |  CAST(length(text) AS INTEGER) AS n_char,
              |  CAST(len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS INTEGER) AS n_tokens,
              |  CAST(list_sum(list_transform(list_filter(string_split_regex(lower(text), ' +'), t -> t != ''), t -> length(t))) AS BIGINT)
              |    / len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS avg_token_len,
              |  CAST(len(list_filter(list_filter(string_split_regex(lower(text), ' +'), t -> t != ''), t -> list_contains(${sqlList(Stopwords)}, t))) AS BIGINT)
              |    / len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS stopword_ratio,
              |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS INTEGER) AS n_punct,
              |  CAST(len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) >= 20 AS INT)
              |    + CAST(len(list_filter(list_filter(string_split_regex(lower(text), ' +'), t -> t != ''), t -> list_contains(${sqlList(Stopwords)}, t))) * 10
              |           >= len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS INT)
              |    + CAST((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 5 <= length(text) AS INT) AS quality_score
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val stop = sparkList(Stopwords)
        t(s, d, "documents")
          .withColumn("toks", expr(tokensExpr))
          .withColumn("stop_hits",
            expr(s"size(filter(toks, t -> array_contains($stop, t)))"))
          .withColumn("n_punct",
            (length(col("text"))
              - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).as("n_punct"))
          .select(col("doc_id"),
            length(col("text")).as("n_char"),
            size(col("toks")).as("n_tokens"),
            (expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))")
              / size(col("toks"))).as("avg_token_len"),
            (col("stop_hits").cast("long") / size(col("toks"))).as("stopword_ratio"),
            col("n_punct"),
            ((size(col("toks")) >= 20).cast("int")
              + (col("stop_hits") * 10 >= size(col("toks"))).cast("int")
              + (col("n_punct") * 5 <= length(col("text"))).cast("int"))
              .as("quality_score"))
          .orderBy("doc_id")
      }),

    // Q28c language id by marker voting with a fixed tie-break order.
    Q("q28c_langid",
      Some({
        val scores = Markers.map { case (l, ws) =>
          s"len(list_intersect(list_distinct(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')), ${sqlList(ws)})) AS s_$l"
        }.mkString(",\n  ")
        val langs = Markers.map(_._1)
        val argmax = langs.init.map { l =>
          val geq = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $geq THEN '$l'"
        }.mkString("CASE ", "\n       ", s"\n       ELSE '${langs.last}' END")
        s"""SELECT doc_id, lang AS labeled_lang, $argmax AS predicted_lang FROM (
           |  SELECT doc_id, lang,
           |  $scores
           |  FROM documents) ORDER BY doc_id""".stripMargin
      }),
      (s, d) => {
        val base = Markers.foldLeft(
          t(s, d, "documents")
            .withColumn("dt", expr(s"array_distinct($tokensExpr)"))) {
          case (df, (l, ws)) =>
            df.withColumn(s"s_$l",
              expr(s"size(array_intersect(dt, ${sparkList(ws)}))"))
        }
        val langs = Markers.map(_._1)
        val argmax = langs.init.foldLeft(when(lit(false), lit(null))) {
          case (acc, l) =>
            val cond = langs.filter(_ != l)
              .map(o => col(s"s_$l") >= col(s"s_$o"))
              .reduce(_ && _)
            acc.when(cond, l)
        }.otherwise(langs.last)
        base.select(col("doc_id"), col("lang").as("labeled_lang"),
          argmax.as("predicted_lang"))
          .orderBy("doc_id")
      }),

    // Q28d content fingerprint (md5 over normalized text) — duplicate-group
    // discovery by fingerprint equality.
    Q("q28d_fingerprint",
      Some("""SELECT doc_id, md5(lower(trim(text))) AS fp,
             |  count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n_same
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("fp")
        t(s, d, "documents")
          .withColumn("fp", md5(lower(trim(col("text")))))
          .withColumn("n_same", count(lit(1)).over(w))
          .select("doc_id", "fp", "n_same")
          .orderBy("doc_id")
      }),

    // Q28f BPE-ish regex tokenization: letter runs, digit runs, and single
    // non-alphanumeric marks as separate tokens (the pre-tokenizer shape
    // BPE vocabularies train over), counted per class.
    Q("q28f_regex_tokens",
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_word,
             |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num,
             |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INT) AS n_mark
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n_word"),
          size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num"),
          size(expr("regexp_extract_all(text, '[^A-Za-z0-9\\\\s]', 0)")).as("n_mark"))
        .orderBy("doc_id")),

    // Q28e rolling polynomial hash over tokens. Token hashes are themselves
    // code-point polynomials, so the whole fingerprint is pure 64-bit
    // integer arithmetic — engine-independent (unlike an xxhash64-seeded
    // variant) and ANSI-safe: with M = 1e9+7, acc*31+h < 2^35 and
    // a*127+cp < 2^38. Order-sensitive by construction (it's a sequential
    // fold), which is the point of a *rolling* fingerprint; the map work is
    // embarrassingly parallel across rows.
    Q("q28e_rolling_hash",
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(list_filter(string_split_regex(lower(text), ' +'), t -> t != ''),
             |      t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
             |           (a, c) -> (a * 127 + c) % 1000000007))),
             |    (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_fp
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => t(s, d, "documents")
        .withColumn("toks", expr(tokensExpr))
        .select(col("doc_id"),
          expr("""aggregate(toks, 0L, (acc, t) ->
                 |  (acc * 31 + aggregate(split(t, ''), 0L,
                 |     (a, c) -> (a * 127 + ascii(c)) % 1000000007)) % 1000000007)""".stripMargin)
            .as("rolling_fp"))
        .orderBy("doc_id")),

    // Q28g corpus document frequency: how many documents contain each token
    // (the DF side of TF-IDF; the ratio is an exact integer division →
    // bit-stable double). distinct-per-doc before the explode keeps the
    // shuffle payload at one row per (doc, distinct token).
    Q("q28g_doc_freq",
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(lower(text), ' +'), t -> t != ''))) AS token
             |  FROM documents),
             |tot AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT token, count(*) AS df,
             |  CAST(count(*) AS DOUBLE) / (SELECT n_docs FROM tot) AS doc_ratio
             |FROM tok GROUP BY token
             |ORDER BY df DESC, token LIMIT 20""".stripMargin),
      (s, d) => {
        val docs = t(s, d, "documents")
        val tot = docs.agg(count(lit(1)).as("n_docs"))
        docs
          .select(col("doc_id"),
            explode(expr(s"array_distinct($tokensExpr)")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(tot))
          .select(col("token"), col("df"),
            (col("df").cast("double") / col("n_docs")).as("doc_ratio"))
          .orderBy(desc("df"), asc("token"))
          .limit(20)
      }),

    // Q28h repetition flags (the Gopher-rules shape): a document whose
    // most frequent token dominates, or whose token stream is mostly
    // repeats, is boilerplate/spam for training purposes. All counts are
    // exact integers computed with ARRAY functions inside the row — no
    // explode, no shuffle, embarrassingly parallel (the per-doc top-count
    // is O(distinct·tokens) local work on ~60-token docs). The one double
    // (top-token share) is a single integer division, bit-stable in both
    // engines.
    Q("q28h_repetition",
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), ' +'), t -> t != '') AS toks
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(toks) AS INT) AS n_tokens,
             |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
             |  CAST(list_max(list_transform(list_distinct(toks),
             |    d -> len(list_filter(toks, x -> x = d)))) AS INT) AS top_count,
             |  CAST(list_max(list_transform(list_distinct(toks),
             |    d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
             |    / len(toks) AS frac_top,
             |  (list_max(list_transform(list_distinct(toks),
             |     d -> len(list_filter(toks, x -> x = d)))) * 5 > len(toks))
             |   OR (len(list_distinct(toks)) * 2 < len(toks)) AS is_repetitive
             |FROM d ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val base = t(s, d, "documents").withColumn("toks", expr(tokensExpr))
          .withColumn("top_count", expr(
            """array_max(transform(array_distinct(toks),
              |  d -> size(filter(toks, x -> x = d))))""".stripMargin))
        base.select(col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(expr("array_distinct(toks)")).as("n_distinct"),
            col("top_count"),
            (col("top_count").cast("double") / size(col("toks"))).as("frac_top"),
            (col("top_count") * 5 > size(col("toks"))
              || size(expr("array_distinct(toks)")) * 2 < size(col("toks")))
              .as("is_repetitive"))
          .orderBy("doc_id")
      }),

    // Q74 sequence packing — the concat-and-chunk preprocessing every LLM
    // training pipeline runs between curation and tokenization: documents
    // are laid end-to-end per stream in a deterministic order and cut into
    // fixed token-budget chunks; a document belongs to the chunk its first
    // token lands in. Formulated as a running windowed sum (one shuffle on
    // the stream key, then pure map arithmetic + partial-agg rollup) — no
    // sequential driver loop. The stream key here is `lang` (the fixture's
    // natural partition); at corpus scale the same operator runs per
    // hash-bucket key so every stream packs in parallel and no window
    // partition exceeds one task's slice (the q33e2 batch-key pattern).
    // Token counts reuse the q28-proven whitespace tokenizer parity.
    Q("q74_sequence_pack",
      Some("""WITH d AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(string_split_regex(lower(text), ' +'), t -> t != '')) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM d)
             |SELECT lang, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS chunk_id,
             |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM c GROUP BY lang, chunk_id ORDER BY lang, chunk_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .withColumn("n_tokens", size(expr(tokensExpr)))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("chunk_id",
            floor((col("cum") - col("n_tokens")) / lit(2048.0)).cast("long"))
          .groupBy("lang", "chunk_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("chunk_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("lang", "chunk_id")
      }),

    // Q77 curation filter funnel — the attrition report a training-data run
    // publishes: each document passes a fixed gauntlet (min length →
    // stopword floor → punctuation cap → span-dup cap), and the output is
    // one row per stage with docs_in/docs_out/dropped, where stage k's
    // docs_out is stage k+1's docs_in. The final stage composes q75's
    // span-dedup stats, so the funnel exercises per-row flags AND a
    // corpus-global dedup signal in one declared query.
    //
    // Scale posture: flags are map-only; the only shuffles are q75's
    // (16 B/span) and the per-doc rollup; survival counts are ONE global
    // partial-agg over int flag products (no per-stage passes over the
    // corpus), then a constant 4-row stack — the whole funnel costs one
    // pass regardless of stage count.
    Q("q77_filter_funnel",
      Some(s"""WITH tok AS (
              |  SELECT doc_id, length(text) AS n_char,
              |         list_filter(string_split_regex(lower(text), ' +'), t -> t != '') AS toks,
              |         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
              |  FROM documents),
              |fl AS (
              |  SELECT doc_id,
              |    CAST(len(toks) >= 20 AS INT) AS f1,
              |    CAST(len(list_filter(toks, t -> list_contains(${sqlList(Stopwords)}, t))) * 10 >= len(toks) AS INT) AS f2,
              |    CAST(n_punct * 5 <= n_char AS INT) AS f3
              |  FROM tok),
              |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              |c AS (SELECT doc_id, unnest(range(0, len(ws) // 4)) AS i, ws FROM w),
              |o AS (SELECT doc_id, array_to_string(ws[(i*4+1):(i*4+4)], ' ') AS span,
              |             doc_id * 2097152 + i AS ord FROM c),
              |m AS (SELECT doc_id, ord, min(ord) OVER (PARTITION BY span) AS first_ord FROM o),
              |sd AS (SELECT doc_id, count(*) AS n_spans,
              |              sum(CASE WHEN ord != first_ord THEN 1 ELSE 0 END) AS n_dup
              |       FROM m GROUP BY doc_id),
              |ff AS (SELECT fl.doc_id, f1, f2, f3,
              |              CAST(coalesce(n_dup, 0) * 2 < coalesce(n_spans, 0) AS INT) AS f4
              |       FROM fl LEFT JOIN sd USING (doc_id)),
              |agg AS (SELECT CAST(count(*) AS BIGINT) AS s0, CAST(sum(f1) AS BIGINT) AS s1,
              |               CAST(sum(f1*f2) AS BIGINT) AS s2, CAST(sum(f1*f2*f3) AS BIGINT) AS s3,
              |               CAST(sum(f1*f2*f3*f4) AS BIGINT) AS s4
              |        FROM ff)
              |SELECT * FROM (
              |  SELECT CAST(1 AS BIGINT) AS stage_id, 'min_tokens' AS stage,
              |         s0 AS docs_in, s1 AS docs_out, s0 - s1 AS dropped FROM agg
              |  UNION ALL SELECT 2, 'stopword_floor', s1, s2, s1 - s2 FROM agg
              |  UNION ALL SELECT 3, 'punct_cap', s2, s3, s2 - s3 FROM agg
              |  UNION ALL SELECT 4, 'span_dup_cap', s3, s4, s3 - s4 FROM agg)
              |ORDER BY stage_id""".stripMargin),
      (s, d) => {
        val stop = sparkList(Stopwords)
        val docs = t(s, d, "documents")
        val flags = docs
          .withColumn("toks", expr(tokensExpr))
          .select(col("doc_id"),
            (size(col("toks")) >= 20).cast("int").as("f1"),
            (expr(s"size(filter(toks, t -> array_contains($stop, t)))") * 10
              >= size(col("toks"))).cast("int").as("f2"),
            ((length(col("text"))
              - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))) * 5
              <= length(col("text"))).cast("int").as("f3"))
        val sd = Dedup.spanDedupStats(docs, 4).select("doc_id", "n_spans", "n_dup")
        val ff = flags.join(sd, Seq("doc_id"), "left")
          .withColumn("f4",
            (coalesce(col("n_dup"), lit(0L)) * 2
              < coalesce(col("n_spans"), lit(0L))).cast("int"))
        ff.agg(
            count(lit(1)).as("s0"),
            sum(col("f1")).as("s1"),
            sum(col("f1") * col("f2")).as("s2"),
            sum(col("f1") * col("f2") * col("f3")).as("s3"),
            sum(col("f1") * col("f2") * col("f3") * col("f4")).as("s4"))
          .select(expr("""stack(4,
                 |  1L, 'min_tokens',     s0, s1,
                 |  2L, 'stopword_floor', s1, s2,
                 |  3L, 'punct_cap',      s2, s3,
                 |  4L, 'span_dup_cap',   s3, s4) AS (stage_id, stage, docs_in, docs_out)""".stripMargin))
          .withColumn("dropped", col("docs_in") - col("docs_out"))
          .orderBy("stage_id")
      }),

    // Q85 BPE merge learning — the tokenizer-training primitive: learn the
    // top-K byte-pair merges from the corpus. Classic dictionary-based BPE:
    // ONE corpus pass builds the (word, freq) dictionary (map-side partial
    // agg; vocabulary ≪ corpus at any scale), then every merge round runs
    // over the cached dictionary only — pair statistics are a partial-agg
    // shuffle of (pair, cnt), the argmax is TakeOrderedAndProject (no global
    // sort materialization), and applying a merge is a 1-row broadcast +
    // codegen'd left fold over each word's symbol string. At 100 TB the
    // corpus is touched exactly once; rounds cost vocabulary-sized work.
    //
    // The fold is canonically greedy left-to-right ([a,a,a,a,a] with merge
    // (a,a) → [aa,aa,a]): a freshly merged symbol p1p2 can never re-match
    // p1 as the fold's last symbol, and Spark's `aggregate` HOF and
    // DuckDB's `list_reduce` are the same left fold seeded with the first
    // element, so both engines produce byte-identical symbolizations.
    // Each round's argmax is lineage-cut with a 1-row localCheckpoint
    // (the q26e round pattern); all dictionary caches are dropped before
    // returning — the output plan reads only the K checkpointed rows.
    Q("q85_bpe_merges",
      Some {
        s"""WITH $bpeOracleDict0,${Seq(1, 2, 3).map(bpeOracleRound).mkString(",")}
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS merge_rank, pair, p1 || p2 AS merged, cnt FROM top1
           |  UNION ALL SELECT 2, pair, p1 || p2, cnt FROM top2
           |  UNION ALL SELECT 3, pair, p1 || p2, cnt FROM top3)
           |ORDER BY merge_rank""".stripMargin
      },
      (s, d) => {
        val (tops, _) = bpeLearn(s, d, rounds = 3, encodeVocab = false)
        tops.zipWithIndex.map { case (tp, i) =>
          tp.select(lit((i + 1).toLong).as("merge_rank"), col("pair"),
            concat(col("p1"), col("p2")).as("merged"), col("cnt"))
        }.reduce(_.union(_)).orderBy("merge_rank")
      }),

    // Q88 BPE tokenizer APPLY — the other half of tokenizer training: encode
    // the corpus with the merges q85 learned. Dictionary-based like the
    // learning pass: the merged vocabulary (word → symbolization under
    // merges 1..3) is computed ONCE on the distinct-word dictionary
    // (vocabulary-sized work, localCheckpointed), then the corpus is touched
    // exactly once — explode to (doc_id, word), join the encoded vocab on
    // the word key (both sides shuffle-partition by word; the vocabulary is
    // ≪ corpus but unbounded, so no broadcast), and partial-agg per-doc
    // token statistics. Output: per-document token economics (words, BPE
    // symbols, raw chars) — the sizing numbers a training-data pipeline
    // needs before packing (q74) and mixing (q76).
    Q("q88_bpe_tokenize",
      Some {
        s"""WITH $bpeOracleDict0,${Seq(1, 2, 3).map(bpeOracleRound).mkString(",")},
           |words AS (
           |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           |  FROM documents)
           |SELECT doc_id,
           |       CAST(count(*) AS BIGINT) AS n_words,
           |       CAST(sum(len(string_split(s, ' '))) AS BIGINT) AS n_tokens,
           |       CAST(sum(length(word)) AS BIGINT) AS n_chars
           |FROM words JOIN dict3 USING (word)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      (s, d) => {
        val (_, Some(vocab)) = bpeLearn(s, d, rounds = 3, encodeVocab = true)
        val words = t(s, d, "documents")
          .select(col("doc_id"),
            explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        words.join(vocab.select(col("word"), col("s")), Seq("word"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(size(split(col("s"), " "))).as("n_tokens"),
            sum(length(col("word"))).as("n_chars"))
          .orderBy("doc_id")
      }),

    // Q91 count-min-sketch frequency estimation — bounded-memory n-gram
    // counting, the sketch a pipeline consults when the exact (token, cnt)
    // dictionary no longer fits (web-scale n-gram tables). d=4 rows × w=256
    // buckets of md5-derived positions: the sketch is 1024 cells REGARDLESS
    // of vocabulary size, built by one partial-agg pass (exact per-token
    // partials first — vocabulary-sized — then folded into cells, so the
    // corpus is touched once and the shuffle carries (i, pos, cnt) triples).
    // Estimates (min over the 4 row cells) are broadcast-joined from the
    // constant-size sketch; the CMS guarantee est ≥ exact is visible in the
    // output (overcount ≥ 0, asserted in TextAnalysisSpec) and every bit is
    // deterministic, so the oracle replays the whole sketch. Domain: word
    // bigrams (916 distinct at sf0.01 — wide enough that buckets genuinely
    // collide and the min-of-rows matters).
    Q("q91_cms_freq",
      Some {
        def h(i: Int) =
          s"CAST(concat('0x', substring(md5('cms:$i:' || token), 1, 15)) AS BIGINT) % 256"
        s"""WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS ts FROM documents),
           |bg AS (SELECT unnest(CASE WHEN len(ts) < 2 THEN []
           |         ELSE list_transform(generate_series(1, len(ts) - 1), i -> ts[i] || ' ' || ts[i + 1]) END) AS token
           |       FROM toks),
           |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM bg GROUP BY token),
           |cells AS (SELECT i, pos, CAST(sum(exact_cnt) AS BIGINT) AS cell FROM (
           |    SELECT exact_cnt, unnest([0, 1, 2, 3]) AS i,
           |           unnest([${h(0)}, ${h(1)}, ${h(2)}, ${h(3)}]) AS pos FROM exact)
           |  GROUP BY i, pos),
           |top AS (SELECT token, exact_cnt,
           |          CAST(row_number() OVER (ORDER BY exact_cnt DESC, token) AS BIGINT) AS rnk
           |        FROM exact QUALIFY rnk <= 20),
           |est AS (SELECT t.token, min(c.cell) AS est_cnt FROM (
           |    SELECT token, unnest([0, 1, 2, 3]) AS i,
           |           unnest([${h(0)}, ${h(1)}, ${h(2)}, ${h(3)}]) AS pos FROM top) t
           |  JOIN cells c ON t.i = c.i AND t.pos = c.pos GROUP BY t.token)
           |SELECT rnk, top.token AS token, exact_cnt, est_cnt,
           |       est_cnt - exact_cnt AS overcount
           |FROM top JOIN est ON top.token = est.token
           |ORDER BY rnk""".stripMargin
      },
      (s, d) => {
        def posArr = array((0 until 4).map(i => expr(
          s"cast(conv(substring(md5(concat('cms:$i:', token)), 1, 15), 16, 10) as bigint) % 256")): _*)
        val bigramsExpr =
          """CASE WHEN size(ts) < 2 THEN array()
            |     ELSE transform(sequence(1, size(ts) - 1),
            |            i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) END""".stripMargin
        val exact = t(s, d, "documents")
          .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ts"))
          .select(explode(expr(bigramsExpr)).as("token"))
          .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
          .cache() // vocabulary-sized
        val cells = exact
          .select(col("exact_cnt"), posexplode(posArr).as(Seq("i", "pos")))
          .groupBy("i", "pos").agg(sum("exact_cnt").as("cell")) // 1024 cells
        // top-20 via TakeOrderedAndProject (no global-sort materialization);
        // the rank window then runs over 20 rows only.
        val top = exact.orderBy(col("exact_cnt").desc, col("token")).limit(20)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("exact_cnt").desc, col("token"))).cast("long"))
        val est = top.select(col("token"), posexplode(posArr).as(Seq("i", "pos")))
          .join(broadcast(cells), Seq("i", "pos"))
          .groupBy("token").agg(min("cell").as("est_cnt"))
        top.join(est, Seq("token"))
          .select(col("rnk"), col("token"), col("exact_cnt"), col("est_cnt"),
            (col("est_cnt") - col("exact_cnt")).as("overcount"))
          .orderBy("rnk")
      }),

    // Q217 PII SCRUB — the redaction stage every LLM training pipeline
    // runs before text ships: detect emails/phone patterns, count them,
    // MASK them, and prove the masked corpus carries zero residual
    // matches. The fixture PLANTS deterministic PII derived from doc_id
    // (the synthetic corpus has none), built by the IDENTICAL string
    // expression on both engines so the oracle replays detection,
    // masking and the residual audit exactly. Map-only codegen'd regex
    // work — the shape that scales by adding executors; the patterns
    // stay inside the Java-regex ∩ RE2 common subset (no lookarounds,
    // no backrefs), so both engines agree match-for-match.
    Q("q217_pii_scrub",
      Some("""WITH p AS (SELECT source,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             |      '@example.com or 555-' ||
             |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
             |  FROM documents),
             |m AS (SELECT source,
             |    len(regexp_extract_all(t2,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
             |    len(regexp_extract_all(t2, '\d{3}-\d{4}')) AS phones,
             |    regexp_replace(regexp_replace(t2,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |      '<EMAIL>', 'g'), '\d{3}-\d{4}', '<PHONE>', 'g') AS mm
             |  FROM p)
             |SELECT source, count(*) AS docs,
             |  CAST(sum(emails) AS BIGINT) AS emails,
             |  CAST(sum(phones) AS BIGINT) AS phones,
             |  CAST(sum(length(mm)) AS BIGINT) AS masked_chars,
             |  CAST(sum(
             |    len(regexp_extract_all(mm,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
             |    len(regexp_extract_all(mm, '\d{3}-\d{4}'))) AS BIGINT)
             |    AS residual
             |FROM m GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
        val phone = """\d{3}-\d{4}"""
        def matches(c: Column, pat: String): Column =
          size(regexp_extract_all(c, lit(pat), lit(0)))
        val planted = t(s, d, "documents").withColumn("t2",
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        val masked = planted
          .withColumn("emails", matches(col("t2"), email))
          .withColumn("phones", matches(col("t2"), phone))
          .withColumn("mm", regexp_replace(
            regexp_replace(col("t2"), lit(email), lit("<EMAIL>")),
            lit(phone), lit("<PHONE>")))
        masked.groupBy("source").agg(
            count(lit(1)).as("docs"),
            sum("emails").as("emails"),
            sum("phones").as("phones"),
            sum(length(col("mm"))).as("masked_chars"),
            sum(matches(col("mm"), email) + matches(col("mm"), phone))
              .as("residual"))
          .orderBy("source")
      }),

    // Q223 UNIGRAM-LM TOKENIZER TRAINING (r14 verdict #6, SentencePiece
    // shape): seed 48 multi-char candidates + all singles, run two EM
    // rounds (Viterbi best-segmentation → piece recount → prune to
    // 32/24), emit the final ranked vocabulary. Exact-integer objective
    // — see the helper scaladoc; the oracle replays the identical
    // pipeline in DuckDB CTEs, hash-matched. The rank window runs over
    // the ≤~45-row final vocab (bounded domain).
    Q("q223_unigram_train",
      Some(uniPreDd + """
        |SELECT piece, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS BIGINT)
        |    AS rnk
        |FROM vocab2 ORDER BY rnk""".stripMargin),
      (s, d) => {
        val idx = trainedUnigramVocab(s, d)
        s.read.parquet(s"$idx/vocab")
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("cnt").desc, col("piece"))).cast("long"))
          .orderBy("rnk")
      }),

    // Q224 UNIGRAM TOKENIZER APPLY — encode the corpus with q223's
    // trained vocabulary, SERVED from the persisted index (never
    // re-trained — the q125/q126 build/serve split): each DISTINCT word
    // Viterbi-segments ONCE (vocabulary-sized work), documents then
    // join their words to the per-word piece counts — the corpus pays a
    // tokenize-by-lookup join, never a per-occurrence DP. Output:
    // per-document token economics (words, unigram pieces), the
    // compression-ratio signal an LLM data pipeline budgets corpora by.
    Q("q224_unigram_tokenize",
      Some(uniPreDd + s""",
        |fb3 AS (
        |  SELECT word, freq, $uniToksDd AS toks
        |  FROM (SELECT word, freq, $uniBtDd AS btp
        |        FROM (SELECT word, freq, pl, cl, $uniFwdDd AS fw
        |              FROM dict, vlist2))),
        |wp AS (SELECT word, CAST(len(toks) AS BIGINT) AS np FROM fb3),
        |doc_words AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |    AS word
        |  FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(np) AS BIGINT) AS n_pieces
        |FROM doc_words JOIN wp USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val idx = trainedUnigramVocab(s, d)
        val (pl, cl) = uniVocabArrays(s.read.parquet(s"$idx/vocab"))
        val wp = uniSegment(uniDict(s, d), pl, cl)
          .select(col("word"), size(col("toks")).cast("long").as("np"))
        val dw = t(s, d, "documents").select(col("doc_id"), explode(
          expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        dw.join(wp, "word").groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
          .orderBy("doc_id")
      })
  )
}

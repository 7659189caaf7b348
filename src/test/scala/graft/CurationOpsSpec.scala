package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the round-9 curation operators (q76/q77/q80/
  * q83) that the value-level DuckDB hash check can't express: funnel
  * chaining, quota feasibility, admission disjointness, chunk coverage. */
class CurationOpsSpec extends SparkSpec {

  test("q77 funnel: stages chain (out_k = in_{k+1}), attrition is non-negative") {
    val rows = SparkEntry.queries("q77_filter_funnel")(spark, sf)
      .orderBy("stage_id").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (in, out, dropped) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(out <= in, s"stage ${r.getString(1)} grew the corpus: $out > $in")
      assert(dropped == in - out, s"stage ${r.getString(1)} attrition mismatch")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) == b.getLong(2),
        s"stage ${b.getString(1)} docs_in != previous docs_out")
    }
  }

  test("q76 mixing: every group fills exactly min(quota, size), and the sample is stable") {
    val sel = SparkEntry.queries("q76_mix_sample")(spark, sf)
    val perGroup = sel.groupBy("lang", "source")
      .agg(count(lit(1)).as("got"),
        first("grp_target").as("tgt"), first("grp_docs").as("n"))
    val short = perGroup.filter(col("got") =!= least(col("tgt"), col("n"))).count()
    assert(short == 0, "a group missed its feasible quota")
    val again = SparkEntry.queries("q76_mix_sample")(spark, sf)
    assert(sel.select("doc_id").except(again.select("doc_id")).count() == 0 &&
      again.select("doc_id").except(sel.select("doc_id")).count() == 0,
      "the sampled set is not reproducible")
  }

  test("q80 admission: admitted content is disjoint from the corpus and internally unique") {
    val admitted = SparkEntry.queries("q80_incremental_dedup")(spark, sf)
    val n = admitted.count()
    assert(admitted.select("fp").distinct().count() == n,
      "admitted batch still contains duplicates")
    val corpusFps = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 10 =!= 7).select(md5(col("text")).as("fp")).distinct()
    assert(admitted.join(corpusFps, Seq("fp"), "left_semi").count() == 0,
      "an admitted row duplicates corpus content")
  }

  test("q83 chunking: windows start at 0, step by the stride, and cover every token") {
    val chunks = SparkEntry.queries("q83_chunk_overlap")(spark, sf)
    val nt = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        size(expr(operators.TextAnalysis.tokensExpr)).cast("long").as("nt"))
    val perDoc = chunks.groupBy("doc_id").agg(
      min("start_tok").as("first_start"),
      max(col("start_tok") + col("n_tokens")).as("covered"),
      max("n_tokens").as("widest"),
      count(lit(1)).as("nchunks"),
      max("start_tok").as("last_start"))
      .join(nt, Seq("doc_id"))
    assert(perDoc.filter(col("first_start") =!= 0).count() == 0)
    assert(perDoc.filter(col("covered") =!= col("nt")).count() == 0,
      "a document's tail tokens fell outside every chunk")
    assert(perDoc.filter(col("widest") > 32).count() == 0)
    assert(perDoc.filter(col("last_start") =!= (col("nchunks") - 1) * 24).count() == 0,
      "chunk starts are not a stride-24 progression")
  }

  test("q85 BPE: ranks complete, merges distinct, counts non-increasing") {
    val rows = SparkEntry.queries("q85_bpe_merges")(spark, sf)
      .orderBy("merge_rank").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).distinct.length == 3, "a pair was re-learned")
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(1).replace(" ", ""),
        "merged symbol is not the pair concatenation")
    }
    // A merge can only consume adjacencies (old pairs shrink) and any pair
    // it creates occurs at most once per merged occurrence, so the learned
    // counts are non-increasing in rank — the classic BPE invariant.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) >= b.getLong(3),
        s"merge ${b.getString(1)} outgrew its predecessor")
    }
  }

  test("q88 BPE tokenize: token mass conserved, merges only shrink") {
    val out = SparkEntry.queries("q88_bpe_tokenize")(spark, sf).cache()
    // Per-doc invariants: a word is at least one symbol, a symbol at least
    // one char — so n_words ≤ n_tokens ≤ n_chars row by row.
    assert(out.filter(col("n_tokens") > col("n_chars") ||
      col("n_tokens") < col("n_words")).count() == 0)
    // The three learned merges must actually fire somewhere: some document
    // ends up with strictly fewer symbols than characters.
    assert(out.filter(col("n_tokens") < col("n_chars")).count() > 0,
      "no merge ever applied — encoder is a no-op")
    // Corpus word mass matches an independent count (the vocab join
    // dropped or duplicated nothing).
    val words = Tables.table(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")))
      .count()
    val got = out.agg(sum("n_words")).head().getLong(0)
    assert(got == words, s"word mass $got != $words")
    out.unpersist()
  }

  test("q91 CMS: rank complete, estimates never undercount, collisions real") {
    val rows = SparkEntry.queries("q91_cms_freq")(spark, sf)
      .orderBy("rnk").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    rows.foreach { r =>
      assert(r.getLong(4) >= 0,
        s"CMS undercounted '${r.getString(1)}' — impossible by construction")
      assert(r.getLong(3) == r.getLong(2) + r.getLong(4))
    }
    // The sketch is narrow enough that buckets genuinely collide — without
    // this the hash check would pass even if the min-over-rows logic read
    // the wrong cells.
    assert(rows.exists(_.getLong(4) > 0), "no collisions — sketch too wide")
  }

  test("q92 novelty: attribution is exhaustive and first-doc-complete") {
    val out = SparkEntry.queries("q92_ngram_novelty")(spark, sf).cache()
    // every occurrence is either novel or seen; nothing lost
    assert(out.filter(col("n_novel") + col("n_seen") =!= col("n_grams")).count() == 0)
    // the smallest doc_id with grams can only be novel (nothing earlier)
    val first = out.orderBy("doc_id").head()
    assert(first.getLong(3) == 0, s"doc ${first.getLong(0)} has seen grams but nothing precedes it")
    // some novelty must exist (the corpus introduces each distinct gram
    // exactly once) and some repetition must exist at this fixture
    assert(out.agg(sum("n_novel")).head().getLong(0) > 0)
    assert(out.agg(sum("n_seen")).head().getLong(0) > 0)
    out.unpersist()
  }

  test("q93 deciles: buckets partition the corpus with equi-depth sizes") {
    val rows = SparkEntry.queries("q93_length_deciles")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val n = Tables.table(spark, sf, "documents").count()
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sum == n, "buckets do not partition the corpus")
    // ntile semantics: sizes differ by at most one, larger buckets first
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sameElements(sizes.sortBy(-_)), "larger buckets must come first")
    // equi-depth: bucket length ranges are non-decreasing across buckets
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2) || a.getLong(3) <= b.getLong(3),
        "bucket length ranges out of order")
    }
  }

  test("q223 unigram: vocab covers all singles, ranks complete, EM pruned") {
    val rows = SparkEntry.queries("q223_unigram_train")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length.toLong),
      "rank column is not a complete 1..n")
    assert(rows.forall(r => (1 to 4).contains(r.getString(0).length)),
      "a piece is outside the 1..4 char candidate window")
    assert(rows.count(_.getString(0).length >= 2) <= 24,
      "the round-2 prune did not hold the multi-piece budget")
    // coverage: every corpus character survives as a single, so every
    // word stays segmentable (the guarantee the Viterbi fold relies on)
    val chars = Tables.table(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]', 0)"))
        .as("c")).distinct().collect().map(_.getString(0)).toSet
    val singles = rows.map(_.getString(0)).filter(_.length == 1).toSet
    assert(chars.subsetOf(singles), s"missing singles: ${chars -- singles}")
    // EM actually fired: some multi-char piece carries real usage mass
    assert(rows.exists(r => r.getString(0).length >= 2 && r.getLong(1) > 0),
      "no multi-char piece was ever used — training degenerated")
  }

  test("q224 unigram tokenize: word mass conserved, encoder compresses") {
    val out = SparkEntry.queries("q224_unigram_tokenize")(spark, sf).cache()
    assert(out.filter(col("n_pieces") < col("n_words")).count() == 0,
      "a word segmented into zero pieces")
    val words = Tables.table(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")))
      .count()
    assert(out.agg(sum("n_words")).head().getLong(0) == words,
      "the vocab join dropped or duplicated word occurrences")
    // multi pieces fire: some document encodes below its char count
    val chars = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), expr(
        "cast(aggregate(regexp_extract_all(lower(text), '[a-z]+', 0), " +
          "0, (a, w) -> a + length(w)) as bigint)").as("n_chars"))
    assert(out.join(chars, "doc_id")
      .filter(col("n_pieces") < col("n_chars")).count() > 0,
      "no multi-char piece ever applied — encoder is a no-op")
    out.unpersist()
  }

  test("q223 unigram: Viterbi fold minimizes (pieces, -mass), ties longest-first") {
    import spark.implicits._
    // (word, vocab pieces, counts, expected segmentation)
    val cases = Seq(
      // one 3-char piece beats every 2-piece split, whatever the counts
      ("abc", Seq("a", "ab", "abc", "b", "bc", "c"),
        Seq(10L, 100L, 1L, 10L, 50L, 10L), Seq("abc")),
      // equal piece-count: the higher-mass split wins (ab+c = 110 > a+bc)
      ("abc", Seq("a", "ab", "b", "bc", "c"),
        Seq(10L, 100L, 10L, 50L, 10L), Seq("ab", "c")),
      // exact cost tie (2 pieces, mass 10 both ways): backtrack takes the
      // LONGEST final piece — a+bc, never ab+c
      ("abc", Seq("a", "ab", "bc", "c"),
        Seq(5L, 5L, 5L, 5L), Seq("a", "bc")),
      // repeated structure folds greedily through the DP, not the scan
      ("abab", Seq("a", "ab", "b"), Seq(1L, 9L, 1L), Seq("ab", "ab")))
    cases.foreach { case (w, pl, cl, want) =>
      val got = Seq((w, pl, cl)).toDF("word", "pl", "cl")
        .withColumn("fw", expr(operators.TextAnalysis.uniFwdSk))
        .withColumn("btp", expr(operators.TextAnalysis.uniBtSk))
        .selectExpr(s"${operators.TextAnalysis.uniToksSk} AS toks")
        .head().getSeq[String](0)
      assert(got == want, s"segment('$w') = $got, want $want")
      // the fused engine expression must agree with the fold on every
      // pinned case — the native==oracle lockstep at its smallest
      val native = Seq(w).toDF("word")
        .select(graft.functions.UnigramEncode(col("word"), pl, cl).as("toks"))
        .head().getSeq[String](0)
      assert(native == want, s"UnigramEncode('$w') = $native, want $want")
    }
  }

  test("q223/q224 native UnigramEncode == SQL Viterbi fold on a real dictionary, and training runs once per corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = operators.TextAnalysis.trainedUnigramVocab(spark, dir)
    assert(operators.TextAnalysis.uniVocabDirFor(dir).contains(idx))
    // serve-many: a second call must return the SAME persisted index
    assert(operators.TextAnalysis.trainedUnigramVocab(spark, dir) == idx)
    val vocab = spark.read.parquet(s"$idx/vocab")
      .orderBy("piece").collect()
    val pl = vocab.toSeq.map(_.getString(0))
    val cl = vocab.toSeq.map(_.getLong(1))
    assert(pl.nonEmpty && pl.length == pl.distinct.length)
    val dict = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .distinct()
    val folded = dict
      .withColumn("pl", typedLit(pl)).withColumn("cl", typedLit(cl))
      .withColumn("fw", expr(operators.TextAnalysis.uniFwdSk))
      .withColumn("btp", expr(operators.TextAnalysis.uniBtSk))
      .selectExpr("word", s"${operators.TextAnalysis.uniToksSk} AS toks")
    val native = dict
      .select(col("word"),
        graft.functions.UnigramEncode(col("word"), pl, cl).as("toks"))
    val diff = folded.alias("f").join(native.alias("n"), "word")
      .where(expr("f.toks != n.toks"))
    assert(diff.count() == 0,
      s"native/fold divergence: ${diff.take(3).mkString("; ")}")
    assert(native.count() > 10)
  }

  test("q85 BPE: the merge fold is canonically greedy and delimiter-safe") {
    import spark.implicits._
    val fold =
      """aggregate(
        |  slice(split(s, ' '), 2, size(split(s, ' ')) - 1),
        |  element_at(split(s, ' '), 1),
        |  (acc, x) -> CASE WHEN (acc = p1 OR endswith(acc, concat(' ', p1))) AND x = p2
        |                   THEN concat(substring(acc, 1, length(acc) - length(p1)), p1, p2)
        |                   ELSE concat(acc, ' ', x) END)""".stripMargin
    val cases = Seq(
      // greedy left-to-right: a run of five merges pairwise, leftover last
      ("a a a a a", "a", "a", "aa aa a"),
      // a multi-char last symbol must not false-match on its suffix
      ("xa b", "a", "b", "xa b"),
      // the freshly merged symbol never re-matches p1
      ("a b b", "a", "b", "ab b"),
      ("a b a b", "a", "b", "ab ab"),
      // single-symbol words fold to themselves (init, no lambda calls)
      ("q", "a", "b", "q"))
    cases.foreach { case (s, p1, p2, want) =>
      val got = Seq((s, p1, p2)).toDF("s", "p1", "p2")
        .selectExpr(s"$fold AS out").head().getString(0)
      assert(got == want, s"fold('$s', $p1+$p2) = '$got', want '$want'")
    }
  }

  test("q98 priority sampling: weight bias, exactly-k strata, WindowGroupLimit plan") {
    val df = SparkEntry.queries("q98_priority_sample")(spark, sf)
    val rows = df.collect()
    // the executed plan must push the rank<=k filter into WindowGroupLimit
    // so map tasks keep only local top-k per stratum before the exchange
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter did not compile to WindowGroupLimit:\n$p")
    // exactly min(k, stratum size) rows per language, ranks 1..k dense
    val docs = Tables.table(spark, sf, "documents")
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet == strata.keySet.filter(strata(_) > 0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(10L, strata(lang)), s"stratum $lang size")
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // priority sampling's defining bias: inclusion probability rises with
    // weight, so the sampled mean doc length must exceed the corpus mean
    // (deterministic fixture — this is a one-time draw, not a flaky stat)
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }
}

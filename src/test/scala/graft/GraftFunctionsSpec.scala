package graft

import org.apache.spark.sql.functions._

/** The SQL function surface must agree with the DataFrame-API expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("graft_dot via spark.sql equals VectorFunctions.dot") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sf)
    val sqlRes = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS d
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin).collect()
    val dfRes = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").limit(20).collect()
    assert(sqlRes.toSeq == dfRes.toSeq)
  }

  test("WordNgrams equals the declarative shingle formulation, both fallbacks") {
    val docs = Tables.table(spark, sf, "documents")
      .withColumn("toks", expr(operators.TextAnalysis.tokensExpr))
    // Near-dup convention (short docs → distinct tokens) vs Dedup.shinglesExpr.
    val fused = docs.select(col("doc_id"),
      graft.functions.TextShingles.wordNgrams(col("toks"), 3).as("sh"))
      .orderBy("doc_id").collect()
    val declarative = docs.select(col("doc_id"),
      expr(operators.Dedup.shinglesExpr).as("sh")).orderBy("doc_id").collect()
    assert(fused.toSeq == declarative.toSeq)
    // Strict convention (short docs → empty) including the boundary sizes.
    import spark.implicits._
    val edge = Seq(Seq.empty[String], Seq("a"), Seq("a", "b", "c", "d"),
      Seq("a", "b", "c", "d", "e"), Seq("a", "b", "c", "d", "e", "f"))
      .toDF("toks")
    val strict = edge.select(
      graft.functions.TextShingles.wordNgramsStrict(col("toks"), 5).as("sh"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(strict == List(Nil, Nil, Nil,
      List("a b c d e"), List("a b c d e", "b c d e f")))
  }

  test("Md5HashArray equals the declarative md5/conv formulation") {
    val docs = Tables.table(spark, sf, "documents")
      .withColumn("toks", expr(operators.TextAnalysis.tokensExpr))
    val fused = docs.select(col("doc_id"),
      graft.functions.TextShingles.md5Hash60Array(col("toks")).as("h"),
      graft.functions.TextShingles.md5Hash31Array(col("toks")).as("h31"))
      .orderBy("doc_id").collect()
    val declarative = docs.select(col("doc_id"),
      expr(operators.Dedup.hashedTokensExpr).as("h"),
      expr(s"transform(toks, t -> ${operators.Dedup.baseHash31("t")})").as("h31"))
      .orderBy("doc_id").collect()
    assert(fused.toSeq == declarative.toSeq)
  }

  test("graft_simhash64 and graft_minhash64 run from SQL") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      s"""SELECT doc_id,
         |  graft_simhash64(transform(filter(split(lower(text), ' +'), t -> t != ''), t -> xxhash64(t))) AS sh,
         |  size(graft_minhash64(transform(filter(split(lower(text), ' +'), t -> t != ''), t -> xxhash64(t)))) AS sig_len
         |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getInt(2) == 64))
  }
}

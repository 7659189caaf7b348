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

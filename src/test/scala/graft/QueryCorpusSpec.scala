package graft

import org.apache.spark.sql.functions._

/** t1 smoke (SURVEY §5.1): every declared query runs at sf0.001 with a sane
  * schema and, where the data admits it, a non-empty result. */
class QueryCorpusSpec extends SparkSpec {

  private val mayBeEmptyAtSf0001 = Set("q27c_embedding_neardup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmptyAtSf0001(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q25 approx_count_distinct within 5% of exact") {
    val r = SparkEntry.queries("q25_approx_distinct")(spark, sf).collect()(0)
    val (ap, ep) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    val (ao, eo) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
    assert(math.abs(ap - ep) / ep <= 0.05, s"parts: approx $ap vs exact $ep")
    assert(math.abs(ao - eo) / eo <= 0.05, s"orders: approx $ao vs exact $eo")
  }

  test("q24b native sample is a subset with plausible size") {
    val li = Tables.table(spark, sf, "lineitem")
    val total = li.count()
    val sampled = SparkEntry.queries("q24b_sample_native")(spark, sf)
    val n = sampled.count()
    assert(n > total / 20 && n < total / 5, s"10% sample of $total gave $n")
    val bad = sampled.join(
      li.select(col("l_orderkey"), col("l_linenumber")),
      Seq("l_orderkey", "l_linenumber"), "left_anti").count()
    assert(bad == 0, "sample contained rows not in the source")
  }
}

package graft.sources

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Source/sink format coverage beyond the parquet the driver tables use
  * and the partitioned header-CSV of the pipeline replay (O16–O18):
  * JSON-lines and ORC, chained write→read→write→read so both the writer
  * and the schema'd reader of each format execute. The oracle aggregates
  * the original parquet — the round trip must be value-preserving
  * (doubles survive JSON via shortest-round-trip rendering; ORC is
  * binary-exact).
  */
object SourceFormats extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val qs: Seq[Q] = Seq(

    Q("q57_source_roundtrip",
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin),
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_src_").toString
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        orders.write.mode("overwrite").json(s"$dir/json")
        val fromJson = s.read.schema(orders.schema).json(s"$dir/json")
        fromJson.write.mode("overwrite").orc(s"$dir/orc")
        s.read.orc(s"$dir/orc")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      })
  )
}

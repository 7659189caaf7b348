package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (guide's canonical custom-
  * operator example). Built by composition (preference (a) of the custom-
  * operator ladder): tag both sides, union, sort within the key partition,
  * and carry the last-seen right-side row forward with
  * `last_value(ignoreNulls)`. One shuffle on the join key, one sort —
  * the same cost profile as a sort-merge join, and the formulation a
  * custom `SparkPlan` would implement internally. DuckDB's native
  * `ASOF JOIN` is the oracle.
  *
  * Semantics: for each left row, the right row with the greatest
  * `rightTs <= leftTs` within the same key (inclusive match; right rows
  * ordered before left rows at equal timestamps).
  */
object AsOfJoin extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** leftDf(keyCol, leftTs, ...) as-of-joined to rightDf(keyCol, rightTs,
    * valueCol): adds `valueCol` = latest right value at or before leftTs.
    * Right side must be unique per (key, ts) — pre-aggregate if not. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, value: String): DataFrame = {
    // both timestamps go through TimestampType: the driver tables mix
    // TIMESTAMP and TIMESTAMP_NTZ, and with a UTC session the cast is the
    // identity DuckDB's naive comparison performs
    val l = left
      .withColumn("__ts", col(leftTs).cast("timestamp"))
      .withColumn("__isRight", lit(0))
      .withColumn("__val", lit(null).cast(right.schema(value).dataType))
    val r = right.select(col(key), col(rightTs).cast("timestamp").as("__ts"),
        lit(1).as("__isRight"), col(value).as("__val"))
    val lCols = l.columns
    val unioned = r.select(lCols.toIndexedSeq.map {
      case c if l.columns.contains(c) && r.columns.contains(c) => col(c)
      case c => lit(null).cast(l.schema(c).dataType).as(c)
    }: _*).unionByName(l, allowMissingColumns = true)
    // right rows sort before left rows at equal ts → inclusive (<=) match
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(value, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__isRight") === 0)
      .drop("__ts", "__isRight", "__val")
  }

  val qs: Seq[Q] = Seq(
    // Q39: each event picks up the key of its user's latest order at or
    // before the event time. Orders are pre-aggregated to one row per
    // (custkey, orderdate) so the match is unique and deterministic.
    Q("q39_asof_join",
      Some("""WITH o AS (
             |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_order
             |  FROM orders GROUP BY o_custkey, o_orderdate)
             |SELECT e.event_id, e.user_id, o.last_order
             |FROM events e
             |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin),
      (s, d) => {
        val orders = t(s, d, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("last_order"))
          .withColumnRenamed("o_custkey", "user_id")
        val events = t(s, d, "events").select("event_id", "user_id", "ts")
        asOf(events, orders, key = "user_id",
            leftTs = "ts", rightTs = "o_orderdate", value = "last_order")
          .select("event_id", "user_id", "last_order")
          .orderBy("event_id")
      })
  )
}

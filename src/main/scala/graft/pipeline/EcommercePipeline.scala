package graft.pipeline

import graft.{Q, QueryModule, Tables}
import graft.datagen.Generators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline, replayed Spark-first — SURVEY §2.B Q33 / §3 E1+E2.
  *
  * Reference dataflow (`dimension_tables_mock.py`, `transactions_mock_data.py`):
  * generate dim candidates → anti-join against existing keys → append;
  * generate a transaction batch → Hive-partitioned CSV with header on S3 →
  * (sleep 10 s) → Glue job joins facts with both dims → warehouse.
  *
  * Here: dims/facts are derived deterministically from the driver tables
  * (`part`→dim_products, `customer`→dim_customers, `lineitem⋈orders`→
  * transactions) with the key-hashed generators, the dedup is a broadcast
  * `left_anti` join (replacing the reference's O(n·m) client-side list filter,
  * `dimension_tables_mock.py:62-63`), the sink/source is partitioned
  * header-CSV (`transactions_mock_data.py:85-98`), and the enrichment is two
  * broadcast hash joins (the Glue contract, `transactions_mock_data.py:17`).
  * No sleeps: the read sees exactly the files the write committed.
  *
  * Scale posture: dims broadcast (dims ≪ facts by construction); the fact
  * derivation is a single shuffle join lineitem⋈orders on orderkey; CSV is
  * partitioned by (year, month) so downstream time-ranged reads prune.
  */
object EcommercePipeline extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  // ---- generator SQL mirrors (DuckDB dialect) --------------------------
  // Each helper emits the exact integer/double arithmetic the Column
  // expressions in graft.datagen.Generators perform, so the oracle
  // recomputes identical values.
  private def sqlDigitId(prefix: String, key: String, width: Int): String = {
    val mod = math.pow(10, width).toLong
    s"'$prefix' || lpad(CAST($key % $mod AS VARCHAR), $width, '0')"
  }
  private def sqlChoice(key: String, mult: Long, options: Seq[String]): String =
    s"[${options.map(o => s"'$o'").mkString(",")}]" +
      s"[CAST(($key * $mult) % ${options.size} + 1 AS INT)]"
  private def sqlMoney(key: String): String =
    s"CAST(CAST(10.0 + (($key * $KnuthMult) % 49001) / 100.0 AS DECIMAL(12,2)) AS DOUBLE)"
  private def sqlWeighted(key: String): String =
    s"""CASE WHEN ($key * $KnuthMult) % 100 < 60 THEN 'Bronze'
       |     WHEN ($key * $KnuthMult) % 100 < 85 THEN 'Silver'
       |     WHEN ($key * $KnuthMult) % 100 < 95 THEN 'Gold'
       |     ELSE 'Platinum' END""".stripMargin
  private def sqlFirst(key: String): String = sqlChoice(key, 7919L, FirstNames)
  private def sqlLast(key: String): String = sqlChoice(key, 104729L, LastNames)

  private val PaymentTypes = Seq("Credit Card", "Debit Card", "PayPal", "Gift Card")
  private val Statuses = Seq("Completed", "Pending", "Failed", "Refunded")
  private val Categories = Seq("Electronics", "Clothing", "Home", "Books", "Toys")

  // ---- operators -------------------------------------------------------

  /** dim_products derived from `part` (FIXTURES.md §A ← reference
    * `dimension_tables_mock.py:47-59`). */
  def dimProducts(s: SparkSession, dir: String): DataFrame = {
    val k = col("p_partkey")
    t(s, dir, "part").select(
      digitId("prod-", k, 6).as("product_id"),
      concat(lit("Product "), lpad((k % 1000000L).cast("string"), 6, "0")).as("product_name"),
      choice(k, 7919L, Categories).as("category"),
      uniformMoney(k, 10.0, 500.0).as("price"),
      digitId("S", k, 4).as("supplier_id"))
  }

  /** dim_customers derived from `customer` (← `dimension_tables_mock.py:82-106`). */
  def dimCustomers(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    t(s, dir, "customer").select(
      digitId("cust-", k, 6).as("customer_id"),
      firstName(k).as("first_name"),
      lastName(k).as("last_name"),
      email(k).as("email"),
      weightedChoice(k, Seq(60 -> "Bronze", 85 -> "Silver", 95 -> "Gold"), "Platinum")
        .as("membership_level"))
  }

  /** Transaction facts derived from lineitem⋈orders
    * (← `transactions_mock_data.py:57-79`). The TXN id embeds the full
    * lineitem key so it is unique and partition-stable (the reference's
    * per-batch `{i:04}` counter, O15, is not reproducible under shuffle). */
  def transactions(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val mix = col("l_orderkey") * 100 + col("l_linenumber")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        concat(lit("TXN"), tsCompact(col("l_shipdate")),
          lpad(col("l_orderkey").cast("string"), 8, "0"),
          lpad(col("l_linenumber").cast("string"), 2, "0"),
          lpad((col("l_partkey") % 1000000L).cast("string"), 6, "0"),
          lpad(col("l_suppkey").cast("string"), 4, "0")).as("transaction_id"),
        digitId("cust-", col("o_custkey"), 6).as("customer_id"),
        digitId("prod-", col("l_partkey"), 6).as("product_id"),
        col("l_quantity").cast("int").as("quantity"),
        uniformMoney(col("l_partkey"), 10.0, 500.0).as("price"),
        tsDashed(col("l_shipdate")).as("transaction_date"),
        choice(mix, 13L, PaymentTypes).as("payment_type"),
        choice(mix, 17L, Statuses).as("status"))
  }

  /** SQL fragment shared by the transaction oracles (DuckDB dialect). */
  private val txnSql: String =
    // NOTE: continuation lines must not start with "|" — this fragment gets
    // re-embedded in an outer stripMargin template (q33_pipeline_e2e), which
    // would strip the first pipe of a leading "||".
    s"""SELECT
       |  'TXN' || strftime(l_shipdate, '%Y%m%d%H%M%S') ||
       |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') ||
       |    lpad(CAST(l_linenumber AS VARCHAR), 2, '0') ||
       |    lpad(CAST(l_partkey % 1000000 AS VARCHAR), 6, '0') ||
       |    lpad(CAST(l_suppkey AS VARCHAR), 4, '0') AS transaction_id,
       |  ${sqlDigitId("cust-", "o_custkey", 6)} AS customer_id,
       |  ${sqlDigitId("prod-", "l_partkey", 6)} AS product_id,
       |  CAST(l_quantity AS INT) AS quantity,
       |  ${sqlMoney("l_partkey")} AS price,
       |  strftime(l_shipdate, '%Y-%m-%d-%H:%M:%S') AS transaction_date,
       |  ${sqlChoice("(l_orderkey * 100 + l_linenumber)", 13L, PaymentTypes)} AS payment_type,
       |  ${sqlChoice("(l_orderkey * 100 + l_linenumber)", 17L, Statuses)} AS status
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  /** The reference's dedup — broadcast left-anti join on the PK (O5). */
  def antiJoinDedup(candidates: DataFrame, existing: DataFrame, key: String): DataFrame =
    candidates.join(broadcast(existing.select(key)), Seq(key), "left_anti")

  // ---- cached work dirs ------------------------------------------------

  // One work dir per (query, source dir), removed by a shutdown hook —
  // verify/bench invoke each query several times and must not leak a temp
  // dir (or, for q33f, a catalog table) per invocation (same discipline as
  // SourceFormats). Re-invocations write mode("overwrite") into the same
  // path, so disk use is bounded by one copy per (query, sf).
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def workDir(key: String): String =
    dirCache.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_pipe_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          try walk.iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        }
      }
      p.toString
    })

  /** Stable per-(query, sf) identifier suffix for catalog object names. */
  private def stableSuffix(key: String): String =
    java.lang.Long.toHexString(key.hashCode.toLong & 0xffffffffL)

  // ---- JDBC warehouse boundary (q72) -----------------------------------

  private def derbyDb(key: String): String = {
    val dir = workDir(key)
    // Derby writes its engine log relative to derby.system.home; point it
    // at the first db's work dir instead of polluting the process CWD.
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", dir)
    dir + "/wh"
  }

  /** JDBC warehouse round trip through embedded Derby — the reference's
    * one remaining boundary with no executed counterpart (the Redshift
    * load, `transactions_mock_data.py:18-20,115-117`). The dim_products
    * frame is loaded with `df.write.jdbc` (batched INSERTs; string columns
    * pinned to VARCHAR via createTableColumnTypes — Derby's CLOB default
    * can be neither compared nor grouped), then read back as a PARALLEL
    * JDBC scan: `partitionColumn`/`numPartitions` split the table into
    * stride predicates so each executor opens its own connection — the
    * posture that ingests a warehouse table at cluster scale. The price
    * predicate pushes into the JDBC source (plan-asserted: the scan, not
    * Spark, filters), and the aggregate is checked against the parquet
    * original. Bounds are stride hints, not filters — rows outside them
    * still land in the edge partitions. */
  def jdbcRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${derbyDb(s"q72:$dir")};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    dimProducts(s, dir)
      // numeric stride column for the partitioned read-back (Derby-side
      // PK); product ids are 'prod-NNNNNN', so the digits are the key
      .withColumn("pk", col("product_id").substr(6, 6).cast("long"))
      .write.mode("overwrite")
      .option("createTableColumnTypes",
        "product_id VARCHAR(16), product_name VARCHAR(32), " +
          "category VARCHAR(16), supplier_id VARCHAR(8)")
      .jdbc(url, "dim_products", props)
    s.read
      .option("partitionColumn", "pk")
      .option("lowerBound", "0")
      .option("upperBound", "1000000")
      .option("numPartitions", "8")
      .jdbc(url, "dim_products", props)
      .filter(col("price") >= 100.0)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("category")
  }

  /** Partitioned header-CSV sink + schema'd source (O16–O18). Returns the
    * round-tripped DataFrame. Partition columns (year, month) are derived
    * from the transaction date so time-ranged reads prune directories —
    * the reference's `year=/month=/...` S3 layout
    * (`transactions_mock_data.py:85-91`). */
  def csvRoundTrip(txn: DataFrame, path: String): DataFrame = {
    val spark = txn.sparkSession
    txn
      .withColumn("year", substring(col("transaction_date"), 1, 4).cast("int"))
      .withColumn("month", substring(col("transaction_date"), 6, 2).cast("int"))
      // co-partition rows with the directory layout before writing: one
      // file per (year, month) instead of tasks × partitions small files —
      // the difference between 72 and ~2300 objects per day at fleet scale
      .repartition(col("year"), col("month"))
      .write.mode("overwrite")
      .partitionBy("year", "month")
      .option("header", "true")
      .csv(path)
    val schema = StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("customer_id", StringType),
      StructField("product_id", StringType),
      StructField("quantity", IntegerType),
      StructField("price", DoubleType),
      StructField("transaction_date", StringType),
      StructField("payment_type", StringType),
      StructField("status", StringType)))
    spark.read.option("header", "true").schema(schema).csv(path)
      .withColumn("year", substring(col("transaction_date"), 1, 4).cast("int"))
      .withColumn("month", substring(col("transaction_date"), 6, 2).cast("int"))
  }

  /** The Glue-job contract: facts ⋈ dim_products ⋈ dim_customers, dims
    * broadcast (O19; `transactions_mock_data.py:17`). */
  def enrich(txn: DataFrame, dimP: DataFrame, dimC: DataFrame): DataFrame =
    txn
      .join(broadcast(dimP.select("product_id", "product_name", "category", "supplier_id")),
        Seq("product_id"))
      .join(broadcast(dimC.select("customer_id", "first_name", "last_name", "email",
        "membership_level")), Seq("customer_id"))

  /** Warehouse-style append load (O6/O20): seed a managed table with the
    * already-present rows, then append only anti-join survivors — the
    * reference's INSERT-batch + dedup contract
    * (`dimension_tables_mock.py:69-73` after `:62-63`). A second identical
    * append adds zero rows (idempotence; asserted in-line and in
    * GeneratorsSpec). */
  def warehouseAppendReplay(s: SparkSession, dir: String): DataFrame = {
    // Stable per-(query, sf) table + path: the overwrite seed below resets
    // state, so re-invocations are deterministic and the catalog holds ONE
    // table per sf instead of one per invocation.
    val tbl = "graft_dimp_wh_" + stableSuffix(s"q33f:$dir")
    val path = workDir(s"q33f:$dir") + "/tbl"
    val all = dimProducts(s, dir)
    val existing = all.filter(col("product_id").substr(6, 6).cast("long") % 2 === 0)
    existing.write.mode("overwrite").option("path", path).saveAsTable(tbl)
    val newRows = antiJoinDedup(all, s.table(tbl), "product_id")
    newRows.write.mode("append").insertInto(tbl)
    // replay the trigger: a second pass must find nothing new
    val second = antiJoinDedup(all, s.table(tbl), "product_id")
    second.write.mode("append").insertInto(tbl)
    s.table(tbl)
  }

  // ---- declared queries ------------------------------------------------

  val qs: Seq[Q] = Seq(

    Q("q33a_dim_products",
      Some(s"""SELECT
              |  ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |  'Product ' || lpad(CAST(p_partkey % 1000000 AS VARCHAR), 6, '0') AS product_name,
              |  ${sqlChoice("p_partkey", 7919L, Categories)} AS category,
              |  ${sqlMoney("p_partkey")} AS price,
              |  ${sqlDigitId("S", "p_partkey", 4)} AS supplier_id
              |FROM part ORDER BY product_id""".stripMargin),
      (s, d) => dimProducts(s, d).orderBy("product_id")),

    Q("q33b_dim_customers",
      Some(s"""SELECT
              |  ${sqlDigitId("cust-", "c_custkey", 6)} AS customer_id,
              |  ${sqlFirst("c_custkey")} AS first_name,
              |  ${sqlLast("c_custkey")} AS last_name,
              |  lower(${sqlFirst("c_custkey")}) || '.' || lower(${sqlLast("c_custkey")})
              |    || '.' || CAST(c_custkey AS VARCHAR) || '@example.com' AS email,
              |  ${sqlWeighted("c_custkey")} AS membership_level
              |FROM customer ORDER BY customer_id""".stripMargin),
      (s, d) => dimCustomers(s, d).orderBy("customer_id")),

    Q("q33c_transactions",
      Some(s"$txnSql ORDER BY transaction_id"),
      (s, d) => transactions(s, d).orderBy("transaction_id")),

    // The reference's E1 dedup step: half the candidate dims "already exist"
    // in the warehouse; the anti-join keeps only genuinely new keys
    // (idempotence property: running it against itself yields zero rows —
    // ScalaTest covers that).
    Q("q33d_anti_join_dedup",
      Some(s"""WITH cand AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         ${sqlMoney("p_partkey")} AS price
              |  FROM part),
              |existing AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id
              |  FROM part WHERE p_partkey % 2 = 0)
              |SELECT product_id, price FROM cand
              |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.product_id = cand.product_id)
              |ORDER BY product_id""".stripMargin),
      (s, d) => {
        val cand = dimProducts(s, d).select("product_id", "price")
        val existing = dimProducts(s, d)
          .filter(col("product_id").substr(6, 6).cast("long") % 2 === 0)
        antiJoinDedup(cand, existing, "product_id").orderBy("product_id")
      }),

    // O6/O20 warehouse append with anti-join dedup, replayed twice —
    // final table must equal the full derivation exactly once per key.
    Q("q33f_warehouse_append",
      Some(s"""SELECT
              |  ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |  'Product ' || lpad(CAST(p_partkey % 1000000 AS VARCHAR), 6, '0') AS product_name,
              |  ${sqlChoice("p_partkey", 7919L, Categories)} AS category,
              |  ${sqlMoney("p_partkey")} AS price,
              |  ${sqlDigitId("S", "p_partkey", 4)} AS supplier_id
              |FROM part ORDER BY product_id""".stripMargin),
      (s, d) => warehouseAppendReplay(s, d).orderBy("product_id")),

    // O15 sequence-numbered ids. A global row_number is the exact reference
    // semantic (`{i:04}` batch counter); at cluster scale the same operator
    // should be windowed per partition key or replaced by the key-embedded
    // id above — documented tradeoff, tested here at oracle scale.
    Q("q33e_seq_id",
      Some("""SELECT row_number() OVER (ORDER BY o_orderkey) AS seq, o_orderkey
             |FROM orders ORDER BY seq""".stripMargin),
      (s, d) => t(s, d, "orders")
        .select(row_number().over(Window.orderBy("o_orderkey")).cast("long").as("seq"),
          col("o_orderkey"))
        .orderBy("seq")),

    // O15 sequence ids, the form a 100 TB user actually runs: row_number
    // windowed over a (year, month) batch key, so every partition sorts
    // its own slice in parallel — no Exchange SinglePartition anywhere in
    // the plan (asserted in PlanHygieneSpec). Ids are dense within each
    // batch, which is the reference's `{i:04}` counter semantic applied
    // per ingest batch rather than globally.
    Q("q33e2_seq_id_part",
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(month(o_orderdate) AS INT) AS o_month,
             |  row_number() OVER (PARTITION BY year(o_orderdate), month(o_orderdate)
             |                     ORDER BY o_orderkey) AS seq,
             |  o_orderkey
             |FROM orders ORDER BY o_year, o_month, seq""".stripMargin),
      (s, d) => t(s, d, "orders")
        .select(year(col("o_orderdate")).cast("int").as("o_year"),
          month(col("o_orderdate")).cast("int").as("o_month"), col("o_orderkey"))
        .withColumn("seq", row_number()
          .over(Window.partitionBy("o_year", "o_month").orderBy("o_orderkey"))
          .cast("long"))
        .select("o_year", "o_month", "seq", "o_orderkey")
        .orderBy("o_year", "o_month", "seq")),

    // Q61 SCD-type-1 upsert (MERGE semantics as a batch op): the current
    // dim state is half the products at yesterday's prices; the incoming
    // snapshot updates matched keys in place and inserts the rest. A
    // full-outer-join + coalesce expresses MERGE WHEN MATCHED UPDATE /
    // WHEN NOT MATCHED INSERT without a transactional table format — the
    // standard formulation for parquet warehouses; the key-partitioned
    // shuffle join is the only data movement. The updated flag proves the
    // matched branch executed.
    Q("q61_scd1_upsert",
      Some(s"""WITH current AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         CAST(1.00 AS DOUBLE) AS price, 'v1' AS src
              |  FROM part WHERE p_partkey % 2 = 0),
              |incoming AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         ${sqlMoney("p_partkey")} AS price, 'v2' AS src
              |  FROM part)
              |SELECT coalesce(i.product_id, c.product_id) AS product_id,
              |  coalesce(i.price, c.price) AS price,
              |  coalesce(i.src, c.src) AS src,
              |  CAST(i.product_id IS NOT NULL AND c.product_id IS NOT NULL AS INT) AS updated
              |FROM current c FULL OUTER JOIN incoming i ON c.product_id = i.product_id
              |ORDER BY product_id""".stripMargin),
      (s, d) => {
        val current = dimProducts(s, d)
          .filter(col("product_id").substr(6, 6).cast("long") % 2 === 0)
          .select(col("product_id"), lit(1.00).as("price"), lit("v1").as("src"))
        val incoming = dimProducts(s, d)
          .select(col("product_id").as("i_product_id"),
            col("price").as("i_price"), lit("v2").as("i_src"))
        current.join(incoming, col("product_id") === col("i_product_id"), "full_outer")
          .select(
            coalesce(col("i_product_id"), col("product_id")).as("product_id"),
            coalesce(col("i_price"), col("price")).as("price"),
            coalesce(col("i_src"), col("src")).as("src"),
            (col("i_product_id").isNotNull && col("product_id").isNotNull)
              .cast("int").as("updated"))
          .orderBy("product_id")
      }),

    // Q64 CDC snapshot diff: the change feed between two table versions —
    // added / removed / changed rows by key, unchanged rows suppressed.
    // The old snapshot lacks every 5th order (those emit 'added'), the new
    // one lacks every 7th ('removed') and re-prices every 3rd ('changed').
    // One key-partitioned full outer join; this is the incremental-sync
    // primitive that turns full-table refreshes into delta loads.
    Q("q64_cdc_diff",
      Some("""WITH olds AS (
             |  SELECT o_orderkey, o_totalprice AS total FROM orders WHERE o_orderkey % 5 <> 0),
             |news AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END AS total
             |  FROM orders WHERE o_orderkey % 7 <> 0)
             |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
             |       WHEN n.o_orderkey IS NULL THEN 'removed'
             |       ELSE 'changed' END AS change,
             |  coalesce(o.total, -1.0) AS old_total,
             |  coalesce(n.total, -1.0) AS new_total
             |FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey
             |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.total <> n.total
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val orders = t(s, d, "orders")
        val olds = orders.filter(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice").as("total"))
        val news = orders.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").as("n_orderkey"),
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.1)
              .otherwise(col("o_totalprice")).as("n_total"))
        olds.join(news, col("o_orderkey") === col("n_orderkey"), "full_outer")
          .filter(col("o_orderkey").isNull || col("n_orderkey").isNull
            || col("total") =!= col("n_total"))
          .select(
            coalesce(col("o_orderkey"), col("n_orderkey")).as("o_orderkey"),
            when(col("o_orderkey").isNull, "added")
              .when(col("n_orderkey").isNull, "removed")
              .otherwise("changed").as("change"),
            coalesce(col("total"), lit(-1.0)).as("old_total"),
            coalesce(col("n_total"), lit(-1.0)).as("new_total"))
          .orderBy("o_orderkey")
      }),

    // Q62 SCD-type-2 history: keep full validity-interval history instead
    // of updating in place. A changed key closes its current row at the
    // snapshot date and opens a new one; unchanged keys keep their open
    // row; brand-new keys open at the snapshot. Incoming prices are
    // unchanged for every third key so all three branches execute. Pure
    // joins + unions on the key partitioning — no windows needed.
    Q("q62_scd2_history",
      Some(s"""WITH current AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         CAST(1.00 AS DOUBLE) AS price,
              |         DATE '2020-01-01' AS valid_from, p_partkey % 3 = 0 AS keep_price
              |  FROM part WHERE p_partkey % 2 = 0),
              |incoming AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         CASE WHEN p_partkey % 3 = 0 THEN CAST(1.00 AS DOUBLE)
              |              ELSE ${sqlMoney("p_partkey")} END AS price
              |  FROM part),
              |unchanged AS (
              |  SELECT c.product_id, c.price, c.valid_from,
              |         DATE '9999-12-31' AS valid_to, 1 AS is_current
              |  FROM current c JOIN incoming i ON c.product_id = i.product_id
              |  WHERE c.price = i.price),
              |closed AS (
              |  SELECT c.product_id, c.price, c.valid_from,
              |         DATE '2024-06-01' AS valid_to, 0 AS is_current
              |  FROM current c JOIN incoming i ON c.product_id = i.product_id
              |  WHERE c.price <> i.price),
              |reopened AS (
              |  SELECT i.product_id, i.price, DATE '2024-06-01' AS valid_from,
              |         DATE '9999-12-31' AS valid_to, 1 AS is_current
              |  FROM current c JOIN incoming i ON c.product_id = i.product_id
              |  WHERE c.price <> i.price),
              |fresh AS (
              |  SELECT i.product_id, i.price, DATE '2024-06-01' AS valid_from,
              |         DATE '9999-12-31' AS valid_to, 1 AS is_current
              |  FROM incoming i
              |  WHERE NOT EXISTS (SELECT 1 FROM current c WHERE c.product_id = i.product_id))
              |SELECT product_id, price, valid_from, valid_to, is_current
              |FROM (SELECT * FROM unchanged UNION ALL SELECT * FROM closed
              |      UNION ALL SELECT * FROM reopened UNION ALL SELECT * FROM fresh)
              |ORDER BY product_id, valid_from""".stripMargin),
      (s, d) => {
        val snapshot = to_date(lit("2024-06-01"))
        val forever = to_date(lit("9999-12-31"))
        val keyNum = col("product_id").substr(6, 6).cast("long")
        val current = dimProducts(s, d)
          .filter(keyNum % 2 === 0)
          .select(col("product_id"), lit(1.00).as("price"),
            to_date(lit("2020-01-01")).as("valid_from"))
        val incoming = dimProducts(s, d)
          .select(col("product_id").as("i_product_id"),
            when(keyNum % 3 === 0, lit(1.00)).otherwise(col("price")).as("i_price"))
        val matched = current.join(incoming,
          col("product_id") === col("i_product_id"))
        val unchanged = matched.filter(col("price") === col("i_price"))
          .select(col("product_id"), col("price"), col("valid_from"),
            forever.as("valid_to"), lit(1).as("is_current"))
        val closed = matched.filter(col("price") =!= col("i_price"))
          .select(col("product_id"), col("price"), col("valid_from"),
            snapshot.as("valid_to"), lit(0).as("is_current"))
        val reopened = matched.filter(col("price") =!= col("i_price"))
          .select(col("product_id"), col("i_price").as("price"),
            snapshot.as("valid_from"), forever.as("valid_to"), lit(1).as("is_current"))
        val fresh = incoming.join(current,
            col("i_product_id") === col("product_id"), "left_anti")
          .select(col("i_product_id").as("product_id"),
            col("i_price").as("price"), snapshot.as("valid_from"),
            forever.as("valid_to"), lit(1).as("is_current"))
        unchanged.union(closed).union(reopened).union(fresh)
          .orderBy("product_id", "valid_from")
      }),

    // Full E2E replay: generate facts → partitioned header-CSV → read back
    // with explicit schema → enrich via two broadcast joins → ordered
    // enriched fact table. The oracle recomputes the same derivation
    // directly (the CSV round-trip is value-preserving by construction).
    Q("q33_pipeline_e2e",
      Some(s"""WITH txn AS ($txnSql),
              |dimp AS (
              |  SELECT ${sqlDigitId("prod-", "p_partkey", 6)} AS product_id,
              |         'Product ' || lpad(CAST(p_partkey % 1000000 AS VARCHAR), 6, '0') AS product_name,
              |         ${sqlChoice("p_partkey", 7919L, Categories)} AS category,
              |         ${sqlDigitId("S", "p_partkey", 4)} AS supplier_id
              |  FROM part),
              |dimc AS (
              |  SELECT ${sqlDigitId("cust-", "c_custkey", 6)} AS customer_id,
              |         ${sqlFirst("c_custkey")} AS first_name,
              |         ${sqlLast("c_custkey")} AS last_name,
              |         lower(${sqlFirst("c_custkey")}) || '.' || lower(${sqlLast("c_custkey")})
              |           || '.' || CAST(c_custkey AS VARCHAR) || '@example.com' AS email,
              |         ${sqlWeighted("c_custkey")} AS membership_level
              |  FROM customer)
              |SELECT t.*, CAST(substring(t.transaction_date, 1, 4) AS INT) AS year,
              |       CAST(substring(t.transaction_date, 6, 2) AS INT) AS month,
              |       p.product_name, p.category, p.supplier_id,
              |       c.first_name, c.last_name, c.email, c.membership_level
              |FROM txn t
              |JOIN dimp p ON t.product_id = p.product_id
              |JOIN dimc c ON t.customer_id = c.customer_id
              |ORDER BY transaction_id""".stripMargin),
      (s, d) => {
        val tmp = workDir(s"q33:$d") + "/csv"
        val landed = csvRoundTrip(transactions(s, d), tmp)
        enrich(landed, dimProducts(s, d), dimCustomers(s, d))
          .select("transaction_id", "customer_id", "product_id", "quantity",
            "price", "transaction_date", "payment_type", "status", "year",
            "month", "product_name", "category", "supplier_id", "first_name",
            "last_name", "email", "membership_level")
          .orderBy("transaction_id")
      }),

    // Q72 JDBC warehouse round trip (embedded Derby — the reference's
    // Redshift-load boundary executed for real): write dim_products through
    // df.write.jdbc, read it back as an 8-way partitioned JDBC scan with
    // the price predicate pushed into the source, aggregate per category.
    // The oracle replays the generator arithmetic over `part` — any loss in
    // the INSERT/SELECT round trip (type mapping, double fidelity, dropped
    // rows) breaks the hash.
    Q("q72_jdbc_roundtrip",
      Some(s"""WITH dimp AS (
              |  SELECT ${sqlChoice("p_partkey", 7919L, Categories)} AS category,
              |         ${sqlMoney("p_partkey")} AS price
              |  FROM part)
              |SELECT category, count(*) AS n,
              |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
              |FROM dimp WHERE price >= 100.0
              |GROUP BY category ORDER BY category""".stripMargin),
      (s, d) => jdbcRoundTrip(s, d))
  )
}

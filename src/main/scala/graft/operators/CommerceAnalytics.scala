package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Commerce-analytics operators over the star schema — the query family the
  * reference's warehouse exists to serve (reference
  * `dimension_tables_mock.py:134-147` loads dims, `transactions_mock_data
  * .py:125-150` loads facts; these are the reads on top): market-basket
  * association rules, cohort retention, RFM segmentation, interval
  * concurrency, and marketing attribution.
  *
  * Scale discipline shared by the family:
  *   - per-key self-joins only on bounded keys (basket size is bounded by
  *     the order line count; the pair generator is |basket|² per key, never
  *     a global product);
  *   - global scalars (corpus counts, global max date, monetary totals)
  *     ride as 1-row broadcast frames, never driver-side collects;
  *   - unpartitioned running windows run ONLY over aggregated bounded
  *     domains (the ~2.4k-day date domain), the q93/q104 discipline —
  *     per-row windows are always PARTITION BY a high-cardinality key;
  *   - ratio outputs are CAST(exact_int AS DOUBLE)/CAST(exact_int AS
  *     DOUBLE) or exact-DECIMAL sums cast to DOUBLE — bit-identical IEEE
  *     on both engines (QueryModule determinism contract).
  */
object CommerceAnalytics extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Marketing touch types for last-touch attribution (q105). `purchase`
    * converts; `error` is noise (never a touch). */
  private val TouchTypes = Seq("view", "click", "signup")

  val qs: Seq[Q] = Seq(

    // ── Q101 market-basket association rules ─────────────────────────────
    // Baskets are orders; items are part BRANDS (25 distinct — the rule
    // vocabulary a merchandiser actually reads). Support/confidence/lift
    // over pairs (a < b). The pair generator is a self-join on the basket
    // key: per-key fan-out is bounded by the basket's distinct-brand count
    // (≤ line count, ≤ dozens in any real order system), so the shuffle
    // volume is Σ|basket|² — linear in baskets, never corpus-quadratic.
    // The brand-support side is 25 rows — broadcast. min-support is
    // RELATIVE (2% of baskets) so the query is scale-factor-stable.
    // Counts are exact BIGINTs; conf/lift are single IEEE divisions of
    // exact integers — bit-identical cross-engine.
    Q("q101_basket_rules",
      Some("""WITH items AS (
             |  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS brand
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
             |nb AS (SELECT count(DISTINCT basket) AS nbk FROM items),
             |supp AS (SELECT brand, count(*) AS n FROM items GROUP BY brand),
             |pairs AS (
             |  SELECT i1.brand AS a, i2.brand AS b, count(*) AS n_ab
             |  FROM items i1 JOIN items i2
             |    ON i1.basket = i2.basket AND i1.brand < i2.brand
             |  GROUP BY 1, 2)
             |SELECT pairs.a, pairs.b, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(n_ab AS DOUBLE) / CAST(sa.n AS DOUBLE) AS conf,
             |  CAST(n_ab * nb.nbk AS DOUBLE) / CAST(sa.n * sb.n AS DOUBLE) AS lift
             |FROM pairs
             |JOIN supp sa ON sa.brand = pairs.a
             |JOIN supp sb ON sb.brand = pairs.b, nb
             |WHERE n_ab >= nb.nbk // 50
             |ORDER BY a, b""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        // No broadcast HINT on part: it is corpus-scaled (grows with SF),
        // so a forced broadcast risks the driver/8 GB cap at large SF —
        // the narrow (key, brand) projection is declared and AQE picks
        // broadcast at runtime whenever the measured size allows (it does
        // at every fixture SF). Only the genuinely bounded frames below
        // (25-brand supp, 1-row nb) keep explicit hints. (ADVICE r10)
        val part = t(s, d, "part").select("p_partkey", "p_brand")
        val items = li
          .join(part, col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("brand"))
          .distinct()
        val nb = items.agg(countDistinct("basket").as("nbk"))
        val supp = items.groupBy("brand").agg(count(lit(1)).as("n"))
        val pairs = items.as("i1")
          .join(items.as("i2"),
            col("i1.basket") === col("i2.basket") &&
              col("i1.brand") < col("i2.brand"))
          .select(col("i1.brand").as("a"), col("i2.brand").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(supp.select(col("brand").as("a"), col("n").as("n_a"))), "a")
          .join(broadcast(supp.select(col("brand").as("b"), col("n").as("n_b"))), "b")
          .crossJoin(broadcast(nb))
          .filter(expr("n_ab >= nbk div 50"))
          .select(col("a"), col("b"), col("n_ab"),
            (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf"),
            ((col("n_ab") * col("nbk")).cast("double")
              / (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy("a", "b")
      }),

    // ── Q102 cohort retention ────────────────────────────────────────────
    // Users cohorted by the ISO week of their first event; retention cell
    // (cohort, offset) counts users active `offset` weeks after their
    // cohort week, plus the retention ratio against cohort size. Three
    // partial-aggregated shuffles on user_id / (cohort, offset); the
    // cohort-size side is |weeks| rows — broadcast. Week truncation is
    // engine-agreed (ISO Monday) and insensitive to the ns→µs floor the
    // events reader applies (Tables.scala).
    Q("q102_cohort_retention",
      Some("""WITH wk AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events),
             |coh AS (SELECT user_id, min(wk) AS cw FROM wk GROUP BY user_id),
             |siz AS (SELECT cw, count(*) AS cohort_n FROM coh GROUP BY cw),
             |act AS (
             |  SELECT c.cw, date_diff('day', c.cw, w.wk) // 7 AS week_offset,
             |         count(*) AS n_active
             |  FROM wk w JOIN coh c ON w.user_id = c.user_id
             |  GROUP BY 1, 2)
             |SELECT a.cw AS cohort_week, CAST(a.week_offset AS BIGINT) AS week_offset,
             |  CAST(a.n_active AS BIGINT) AS n_active,
             |  CAST(a.n_active AS DOUBLE) / CAST(s.cohort_n AS DOUBLE) AS retention
             |FROM act a JOIN siz s ON a.cw = s.cw
             |ORDER BY cohort_week, week_offset""".stripMargin),
      (s, d) => {
        val wk = t(s, d, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val coh = wk.groupBy("user_id").agg(min("wk").as("cw"))
        val siz = coh.groupBy("cw").agg(count(lit(1)).as("cohort_n"))
        wk.join(coh, "user_id")
          .select(col("cw"), expr("datediff(wk, cw) div 7").as("week_offset"))
          .groupBy("cw", "week_offset").agg(count(lit(1)).as("n_active"))
          .join(broadcast(siz), "cw")
          .select(col("cw").as("cohort_week"), col("week_offset"),
            col("n_active"),
            (col("n_active").cast("double") / col("cohort_n").cast("double"))
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      }),

    // ── Q103 RFM segmentation ────────────────────────────────────────────
    // Per-customer recency (days since last order vs the global max order
    // date), frequency (order count), monetary (exact-DECIMAL cents). The
    // segment rules are RELATIVE where a magnitude is involved — the
    // big-spender line is `2·monetary·n_cust ≥ 3·total` (monetary ≥ 1.5×
    // the mean), an exact integer cross-multiplication, never a
    // pre-divided float threshold — so the query is SF-stable and
    // engine-exact. Globals (max date, totals) ride as a 1-row broadcast.
    // One shuffle on o_custkey; the rollup re-shuffles ~n_cust rows on the
    // 5-value segment key with partial aggregation.
    Q("q103_rfm_segments",
      Some("""WITH per AS (
             |  SELECT o_custkey,
             |    max(o_orderdate) AS last_d,
             |    count(*) AS freq,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS mc
             |  FROM orders GROUP BY o_custkey),
             |gl AS (
             |  SELECT max(last_d) AS now_d, CAST(sum(mc) AS BIGINT) AS tot,
             |         count(*) AS nc
             |  FROM per),
             |scored AS (
             |  SELECT date_diff('day', CAST(last_d AS DATE), CAST(now_d AS DATE)) AS rec,
             |         freq, mc,
             |    CASE
             |      WHEN freq >= 15 AND date_diff('day', CAST(last_d AS DATE), CAST(now_d AS DATE)) <= 365 THEN 'champion'
             |      WHEN freq >= 15 THEN 'loyal_lapsed'
             |      WHEN 2 * mc * nc >= 3 * tot THEN 'big_spender'
             |      WHEN date_diff('day', CAST(last_d AS DATE), CAST(now_d AS DATE)) > 730 THEN 'hibernating'
             |      ELSE 'regular' END AS segment
             |  FROM per, gl)
             |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(sum(rec) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_recency_days,
             |  CAST(sum(freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_frequency,
             |  CAST(sum(mc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_monetary_cents
             |FROM scored GROUP BY segment
             |ORDER BY segment""".stripMargin),
      (s, d) => {
        val per = t(s, d, "orders").groupBy("o_custkey").agg(
          max(col("o_orderdate")).as("last_d"),
          count(lit(1)).as("freq"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("mc"))
        val glob = per.agg(max("last_d").as("now_d"),
          sum("mc").cast("long").as("tot"), count(lit(1)).as("nc"))
        per.crossJoin(broadcast(glob))
          .select(
            datediff(col("now_d").cast("date"), col("last_d").cast("date"))
              .as("rec"),
            col("freq"), col("mc"), col("nc"), col("tot"))
          .withColumn("segment",
            when(col("freq") >= 15 && col("rec") <= 365, "champion")
              .when(col("freq") >= 15, "loyal_lapsed")
              .when(lit(2) * col("mc") * col("nc") >= lit(3) * col("tot"),
                "big_spender")
              .when(col("rec") > 730, "hibernating")
              .otherwise("regular"))
          .groupBy("segment").agg(
            count(lit(1)).as("n_customers"),
            (sum("rec").cast("double") / count(lit(1)).cast("double"))
              .as("avg_recency_days"),
            (sum("freq").cast("double") / count(lit(1)).cast("double"))
              .as("avg_frequency"),
            (sum("mc").cast("double") / count(lit(1)).cast("double"))
              .as("avg_monetary_cents"))
          .orderBy("segment")
      }),

    // ── Q104 interval concurrency (sweep line) ───────────────────────────
    // How many orders are "open" each day, where an order spans
    // [orderdate, orderdate + (key%7 + 1) days)? The classic sweep line:
    // explode each interval into a +1 at start and a −1 at (exclusive)
    // end, partial-aggregate the per-day net change, then a running sum
    // over the DAY frame. The unpartitioned window is safe at any SF
    // because its input is the aggregated DATE DOMAIN (~2.4k rows for the
    // 1995–2001 fixture — bounded by calendar, not corpus; the q93
    // bounded-domain discipline). Output is the concurrency profile at
    // change points.
    Q("q104_concurrency_sweep",
      Some("""WITH deltas AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS dlt FROM orders
             |  UNION ALL
             |  SELECT CAST(o_orderdate AS DATE) + CAST(o_orderkey % 7 + 1 AS INT), -1
             |  FROM orders),
             |net AS (SELECT day, CAST(sum(dlt) AS BIGINT) AS net FROM deltas GROUP BY day)
             |SELECT day, net,
             |  CAST(sum(net) OVER (ORDER BY day
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
             |FROM net ORDER BY day""".stripMargin),
      (s, d) => {
        val o = t(s, d, "orders")
        val deltas = o
          .select(col("o_orderdate").cast("date").as("day"), lit(1L).as("dlt"))
          .unionAll(o.select(
            expr("date_add(cast(o_orderdate as date), cast(o_orderkey % 7 + 1 as int))")
              .as("day"),
            lit(-1L).as("dlt")))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.groupBy("day").agg(sum("dlt").as("net"))
          .withColumn("n_open", sum("net").over(w))
          .select(col("day"), col("net"), col("n_open"))
          .orderBy("day")
      }),

    // ── Q105 last-touch attribution ──────────────────────────────────────
    // Every purchase is attributed to the user's most recent marketing
    // touch (view/click/signup) within a 7-day lookback, else 'direct'.
    // One per-user window ordered by (µs, event_id) — a total order both
    // engines agree on after the ns→µs floor (epoch_us ↔ unix_micros, the
    // q95 convention) — carrying the last non-null touch forward
    // (`last IGNORE NULLS`, the streaming-free as-of-join formulation).
    // Windows are PARTITION BY user_id: fully parallel, no global sort.
    // Revenue is an exact-DECIMAL sum cast to DOUBLE.
    Q("q105_attribution",
      Some(s"""WITH base AS (
              |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
              |    last_value(CASE WHEN event_type IN ('view','click','signup')
              |                    THEN epoch_us(ts) END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_us,
              |    last_value(CASE WHEN event_type IN ('view','click','signup')
              |                    THEN event_type END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_ch
              |  FROM events)
              |SELECT
              |  CASE WHEN t_us IS NOT NULL AND t_us >= ts_us - 604800000000
              |       THEN t_ch ELSE 'direct' END AS channel,
              |  CAST(count(*) AS BIGINT) AS n_purchases,
              |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              |FROM base WHERE event_type = 'purchase'
              |GROUP BY 1 ORDER BY channel""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val isTouch = col("event_type").isin(TouchTypes: _*)
        t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type"), col("value"))
          .withColumn("t_us", last(when(isTouch, col("ts_us")), true).over(w))
          .withColumn("t_ch", last(when(isTouch, col("event_type")), true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            when(col("t_us").isNotNull &&
              col("t_us") >= col("ts_us") - lit(604800000000L), col("t_ch"))
              .otherwise(lit("direct")).as("channel"),
            col("value"))
          .groupBy("channel").agg(
            count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
          .orderBy("channel")
      }),

    // ── Q110 item-item co-occurrence neighbors (collaborative filter) ────
    // "Customers who bought X also bought Y": top-3 neighbor parts per
    // part by co-purchase similarity over NEIGHBORHOOD-BOUNDED
    // co-occurrence — each customer contributes at most 16 items, chosen
    // by a deterministic salted-hash rank (the md5-parity family), the
    // standard heavy-user cap: pair volume is Σ min(d,16)² — linear in
    // customers with a small constant at ANY degree distribution, and the
    // estimate is unbiased across customers because the sample salt is
    // per-customer. Pair generation is IN-ROW (sorted item array →
    // combination explode — no self-join, no second incidence
    // derivation); similarity is the integer squared-cosine surrogate
    // (10⁶·min(n_ab,10⁶)²) div (n_a·n_b) — capped so the numerator stays
    // < 2⁶³ at any co-occurrence count; per-item top-3 by rank window. The
    // oracle replays the identical sample with a plain self-join — same
    // pair set, so the hash check pins the in-row generator.
    Q("q110_item_neighbors",
      Some("""WITH inc AS (
             |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |samp AS (
             |  SELECT cust, item FROM (
             |    SELECT cust, item,
             |      row_number() OVER (PARTITION BY cust ORDER BY
             |        concat('0x', substring(md5(cust::VARCHAR || ':' || item::VARCHAR), 1, 15))::BIGINT,
             |        item) AS hr
             |    FROM inc) WHERE hr <= 16),
             |supp AS (SELECT item, count(*) AS n FROM samp GROUP BY item),
             |pairs AS (
             |  SELECT a.item AS ia, b.item AS ib, count(*) AS n_ab
             |  FROM samp a JOIN samp b ON a.cust = b.cust AND a.item < b.item
             |  GROUP BY 1, 2),
             |sym AS (
             |  SELECT ia AS item, ib AS nbr, n_ab FROM pairs
             |  UNION ALL
             |  SELECT ib, ia, n_ab FROM pairs),
             |scored AS (
             |  SELECT s.item, s.nbr,
             |    (1000000 * least(s.n_ab, 1000000) * least(s.n_ab, 1000000)) // (sa.n * sb.n) AS sim_s,
             |    row_number() OVER (PARTITION BY s.item
             |      ORDER BY (1000000 * least(s.n_ab, 1000000) * least(s.n_ab, 1000000)) // (sa.n * sb.n) DESC, s.nbr) AS rnk
             |  FROM sym s
             |  JOIN supp sa ON sa.item = s.item
             |  JOIN supp sb ON sb.item = s.nbr
             |  WHERE s.n_ab >= 2)
             |SELECT item, nbr, CAST(sim_s AS BIGINT) AS sim_s, CAST(rnk AS BIGINT) AS rnk
             |FROM scored WHERE rnk <= 3
             |ORDER BY item, rnk""".stripMargin),
      (s, d) => {
        val inc = t(s, d, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_partkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
          .distinct()
        val hw = Window.partitionBy("cust").orderBy(
          expr("conv(substring(md5(concat(cast(cust as string), ':', cast(item as string))), 1, 15), 16, 10)")
            .cast("long").asc, col("item").asc)
        // CACHED (r20, guide §1.2 — don't compute things twice): the
        // capped sample feeds BOTH the per-item support counts and the
        // per-customer baskets; uncached, each leg re-runs the
        // orders⋈lineitem distinct + per-customer rank window (~3
        // shuffles) end-to-end. CacheManager dedupes by plan, so repeat
        // invocations share one entry (the pqTopK discipline).
        val samp = inc.withColumn("hr", row_number().over(hw))
          .filter(col("hr") <= 16).select("cust", "item")
          .cache()
        val supp = samp.groupBy("item").agg(count(lit(1)).as("n"))
        val baskets = samp.groupBy("cust")
          .agg(sort_array(collect_list(col("item"))).as("items"))
        val pairs = baskets.select(explode(expr(
            """flatten(transform(items, (x, i) ->
              |  transform(slice(items, i + 2, size(items)),
              |            y -> named_struct('ia', x, 'ib', y))))""".stripMargin))
            .as("p"))
          .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
          .groupBy("ia", "ib").agg(count(lit(1)).as("n_ab"))
        val sym = pairs.select(col("ia").as("item"), col("ib").as("nbr"), col("n_ab"))
          .unionAll(pairs.select(col("ib").as("item"), col("ia").as("nbr"), col("n_ab")))
        val w = Window.partitionBy("item").orderBy(desc("sim_s"), asc("nbr"))
        // supp's cardinality = distinct items — corpus-scaled, so no
        // forced broadcast (a data-dependent frame must never carry an
        // unconditional hint — the Similarity.capBuckets discipline); sym
        // is already shuffled on item/nbr, and AQE broadcasts at runtime
        // when the measured size allows. least(n_ab, 1e6) bounds the
        // squared term: 1e6·(1e6)² = 1e18 < 2⁶³, so the score can never
        // wrap under non-ANSI Spark while DuckDB raises — the cap is in
        // BOTH engines' SQL, keeping them bit-identical at any SF.
        sym.filter(col("n_ab") >= 2)
          .join(supp.select(col("item").as("item"), col("n").as("n_i")), "item")
          .join(supp.select(col("item").as("nbr"), col("n").as("n_j")), "nbr")
          .withColumn("sim_s", expr(
            "(1000000 * least(n_ab, 1000000L) * least(n_ab, 1000000L)) div (n_i * n_j)"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("item"), col("nbr"), col("sim_s"), col("rnk"))
          .orderBy("item", "rnk")
      }),

    // ── Q112 temporal dimension join (SCD2 point-in-time read) ───────────
    // The read side of q62's SCD2 history: each part carries three price
    // versions with [valid_from, valid_to) ranges; every lineitem must be
    // costed at the price version VALID ON ITS SHIP DATE — the
    // point-in-time-correctness join a feature store / audit replay runs.
    // The join keys on l_partkey with an interval filter: per-key fanout
    // is the version count (3), so this is a plain key-partitioned
    // shuffle join, never an unbounded range join. Money is integer CENTS
    // (BIGINT) end-to-end — no decimal division anywhere; version
    // boundaries are fixed calendar dates; quantities are integral.
    Q("q112_temporal_dim_join",
      Some("""WITH hist AS (
             |  SELECT p_partkey, v,
             |    CASE v WHEN 0 THEN DATE '1990-01-01'
             |           WHEN 1 THEN DATE '1997-01-01'
             |           ELSE DATE '1999-06-01' END AS valid_from,
             |    CASE v WHEN 0 THEN DATE '1997-01-01'
             |           WHEN 1 THEN DATE '1999-06-01'
             |           ELSE DATE '9999-12-31' END AS valid_to,
             |    ((p_partkey % 1000) + 100 * v + 1) * 10 AS vprice_cents
             |  FROM part, (SELECT unnest([0, 1, 2]) AS v)),
             |joined AS (
             |  SELECT h.v, CAST(l.l_quantity AS BIGINT) AS qty, h.vprice_cents
             |  FROM lineitem l JOIN hist h ON l.l_partkey = h.p_partkey
             |  WHERE CAST(l.l_shipdate AS DATE) >= h.valid_from
             |    AND CAST(l.l_shipdate AS DATE) < h.valid_to)
             |SELECT CAST(v AS INT) AS version, CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(vprice_cents * qty) AS BIGINT) AS revenue_cents
             |FROM joined GROUP BY v ORDER BY version""".stripMargin),
      (s, d) => {
        val hist = t(s, d, "part").select("p_partkey")
          .withColumn("v", explode(expr("array(0, 1, 2)")))
          .withColumn("valid_from", expr(
            """CASE v WHEN 0 THEN DATE '1990-01-01'
              |       WHEN 1 THEN DATE '1997-01-01'
              |       ELSE DATE '1999-06-01' END""".stripMargin))
          .withColumn("valid_to", expr(
            """CASE v WHEN 0 THEN DATE '1997-01-01'
              |       WHEN 1 THEN DATE '1999-06-01'
              |       ELSE DATE '9999-12-31' END""".stripMargin))
          .withColumn("vprice_cents",
            expr("((p_partkey % 1000) + 100 * v + 1) * 10"))
        t(s, d, "lineitem").select("l_partkey", "l_shipdate", "l_quantity")
          .join(hist, col("l_partkey") === col("p_partkey") &&
            col("l_shipdate").cast("date") >= col("valid_from") &&
            col("l_shipdate").cast("date") < col("valid_to"))
          .groupBy(col("v").cast("int").as("version"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("vprice_cents") * col("l_quantity").cast("long"))
              .cast("long").as("revenue_cents"))
          .orderBy("version")
      }),

    // ── Q113 star-schema flattening (TPC-H Q5 shape) ─────────────────────
    // Revenue by region and order year across the full star: lineitem ⋈
    // orders is the single big shuffle join; customer, nation, and region
    // chain on as broadcasts (each orders-of-magnitude smaller than the
    // fact) — the canonical warehouse plan the reference's star schema
    // exists for. Line revenue extendedprice·(1−discount) is exact
    // DECIMAL arithmetic (discounts have 2 decimal digits), summed in
    // DECIMAL, cast to DOUBLE at the edge.
    Q("q113_star_flatten",
      Some("""SELECT r.r_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             |           * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY 1, 2 ORDER BY r_name, o_year""".stripMargin),
      (s, d) => {
        t(s, d, "lineitem")
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast("decimal(18,2)")
              * (lit(1) - col("l_discount").cast("decimal(3,2)"))).as("line_rev"))
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").select("r_regionkey", "r_name")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(count(lit(1)).as("n_lines"),
            sum("line_rev").cast("double").as("revenue"))
          .orderBy("r_name", "o_year")
      }),

    // ── Q114 statistical anomaly days (2σ, exact-integer) ────────────────
    // Days whose revenue deviates from the mean by more than two standard
    // deviations — with NO floating point anywhere: the z-test
    // (x−μ)² > 4σ² cross-multiplies to (n·x − S)² > 4·(n·Q − S²) over
    // integer daily revenues (S=Σx, Q=Σx²), which both engines evaluate
    // bit-identically. Daily revenues are first rescaled by the
    // CORPUS-RELATIVE unit S div (n·10⁴) (≈mean/10⁴), keeping every
    // operand ≲10⁸ so the cross-multiplied squares stay far below 2⁶³ at
    // ANY scale factor — an absolute cents unit would overflow by sf100.
    // One date-domain aggregation (bounded frame) + a 1-row stats
    // broadcast.
    Q("q114_anomaly_days",
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
             |  FROM orders GROUP BY 1),
             |u AS (SELECT greatest(CAST(sum(rev_c) AS BIGINT) // (count(*) * 10000), 1) AS unit
             |      FROM daily),
             |scaled AS (SELECT day, rev_c, rev_c // u.unit AS x FROM daily, u),
             |st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
             |              CAST(sum(x * x) AS BIGINT) AS q FROM scaled)
             |SELECT day, rev_c
             |FROM scaled, st
             |WHERE (st.n * x - st.s) * (st.n * x - st.s) > 4 * (st.n * st.q - st.s * st.s)
             |ORDER BY day""".stripMargin),
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("rev_c"))
        val u = daily.agg(
          greatest(expr("sum(rev_c) div (count(*) * 10000)"), lit(1L)).as("unit"))
        val scaled = daily.crossJoin(broadcast(u))
          .select(col("day"), col("rev_c"), expr("rev_c div unit").as("x"))
        val st = scaled.agg(count(lit(1)).as("n"),
          sum("x").cast("long").as("s"),
          sum(expr("x * x")).cast("long").as("q"))
        scaled.crossJoin(broadcast(st))
          .filter(expr("(n * x - s) * (n * x - s) > 4 * (n * q - s * s)"))
          .select("day", "rev_c")
          .orderBy("day")
      }),

    // ── Q119 exponentially-weighted moving average (exact-integer) ───────
    // Per-user EWMA of event values (α=¼ on the 2¹⁰ grid): the recursion
    // e′ = (256·x + 768·e) div 1024 is seeded with the first observation
    // and folded left over the user's time-ordered value sequence — the
    // PROVEN cross-engine fold parity (q85): Spark's first-element-seeded
    // `aggregate(slice(xs,2,…), element_at(xs,1), f)` is the same fold as
    // DuckDB's `list_reduce`. Values are exact cents (DECIMAL→BIGINT),
    // all operands non-negative so div/floor-division agree. The fold is
    // IN-ROW over a per-user array: one user_id shuffle, sequences
    // bounded by per-user event counts, every user folds in parallel —
    // the only honest shape for an order-dependent recursion.
    Q("q119_ewma",
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
             |  FROM events),
             |l AS (SELECT user_id, list(x ORDER BY ts_us, event_id) AS xs
             |      FROM e GROUP BY user_id)
             |SELECT user_id,
             |  CAST(list_reduce(xs, (e, x) -> (256 * x + 768 * e) // 1024) AS BIGINT) AS ewma_s
             |FROM l ORDER BY user_id""".stripMargin),
      (s, d) =>
        t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("x"))
          .groupBy("user_id")
          .agg(sort_array(collect_list(
            struct(col("ts_us"), col("event_id"), col("x")))).as("sx"))
          .select(col("user_id"), expr("transform(sx, s -> s.x)").as("xs"))
          .select(col("user_id"), expr(
            """aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1),
              |          (e, x) -> (256 * x + 768 * e) div 1024)""".stripMargin)
            .as("ewma_s"))
          .orderBy("user_id")),

    // ── Q121 top-N + OTHER rollup ────────────────────────────────────────
    // The reporting idiom every dashboard runs: revenue by brand, keeping
    // the top-5 brands and collapsing the tail into 'OTHER'. The
    // dictionary (which brands are top-5) is DATA-DEPENDENT: derived from
    // the same aggregation, ranked on the bounded brand domain (25 rows —
    // the q93 bounded-frame discipline), and broadcast back for the
    // relabel; the second aggregation re-shuffles only |brands| rows.
    // Revenue is exact DECIMAL, ties broken by brand name.
    Q("q121_topn_other",
      Some("""WITH rev AS (
             |  SELECT p.p_brand AS brand,
             |         count(*) AS n_items,
             |         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1),
             |rk AS (
             |  SELECT brand, n_items, r,
             |         row_number() OVER (ORDER BY r DESC, brand) AS rnk
             |  FROM rev)
             |SELECT CASE WHEN rnk <= 5 THEN brand ELSE 'OTHER' END AS label,
             |  CAST(sum(n_items) AS BIGINT) AS n_items,
             |  CAST(sum(r) AS DOUBLE) AS revenue
             |FROM rk GROUP BY 1 ORDER BY label""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        // Corpus-scaled dim: no forced broadcast — AQE decides (q101 note).
        val part = t(s, d, "part").select("p_partkey", "p_brand")
        val rev = li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("r"))
        val w = Window.orderBy(desc("r"), asc("brand"))
        rev.withColumn("rnk", row_number().over(w))
          .withColumn("label",
            when(col("rnk") <= 5, col("brand")).otherwise(lit("OTHER")))
          .groupBy("label")
          .agg(sum("n_items").cast("long").as("n_items"),
            sum("r").cast("double").as("revenue"))
          .orderBy("label")
      }),

    // ── Q122 missing-ID ranges (gaps-and-islands WITHOUT a global sort) ──
    // Which ranges of the order-key sequence are absent once pending
    // ('P') orders drop out — the audit a warehouse runs on any
    // "should-be-contiguous" ID domain. The classic formulation is one
    // global lead() — an Exchange SinglePartition. Here the key domain is
    // BUCKETED (div 4096): in-bucket gaps come from a lead window
    // PARTITIONED by bucket (fully parallel, ≤4096 rows each), and
    // cross-bucket gaps from a lead over the per-bucket min/max summary
    // (n/4096 rows — the only unpartitioned window input, 4096× smaller
    // than the corpus; empty buckets fall out of the same seam logic).
    // The union is EXACTLY the global gap set, which is what the oracle
    // computes with the simple single-window form.
    Q("q122_key_gaps",
      Some("""SELECT k + 1 AS gap_start, nk - 1 AS gap_end
             |FROM (SELECT o_orderkey AS k,
             |             lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nk
             |      FROM orders WHERE o_orderstatus <> 'P')
             |WHERE nk > k + 1
             |ORDER BY gap_start""".stripMargin),
      (s, d) => {
        val B = 4096
        val keys = t(s, d, "orders")
          .filter(col("o_orderstatus") =!= "P")
          .select(col("o_orderkey").as("k"))
          .withColumn("b", expr(s"k div $B"))
        val wb = Window.partitionBy("b").orderBy("k")
        val inBucket = keys
          .withColumn("nk", lead("k", 1).over(wb))
          .filter(col("nk") > col("k") + 1)
          .select((col("k") + 1).as("gap_start"), (col("nk") - 1).as("gap_end"))
        val ws = Window.orderBy("b")
        val between = keys.groupBy("b")
          .agg(min("k").as("mn"), max("k").as("mx"))
          .withColumn("nmn", lead("mn", 1).over(ws))
          .filter(col("nmn") > col("mx") + 1)
          .select((col("mx") + 1).as("gap_start"), (col("nmn") - 1).as("gap_end"))
        inBucket.unionAll(between).orderBy("gap_start")
      }),

    // ── Q123 deletion-request propagation (right-to-be-forgotten audit) ──
    // A deterministic cohort of customers (c_custkey % 53 == 0) requests
    // erasure; the operator propagates the deletion across every table
    // that references them — orders by custkey, lineitems through their
    // orders, events by user id — and emits the audit a compliance job
    // must produce: per table, how many rows the deletion removes and
    // how many remain. All joins are semi/anti on the (broadcast) target
    // set or on the affected-order keys; each table is scanned once.
    Q("q123_forgotten_user",
      Some("""WITH tg AS (SELECT c_custkey AS t FROM customer WHERE c_custkey % 53 = 0),
             |o AS (
             |  SELECT count(CASE WHEN t IS NOT NULL THEN 1 END) AS ndel, count(*) AS n
             |  FROM orders LEFT JOIN tg ON o_custkey = t),
             |li AS (
             |  SELECT count(CASE WHEN t IS NOT NULL THEN 1 END) AS ndel, count(*) AS n
             |  FROM lineitem
             |  LEFT JOIN (SELECT DISTINCT o_orderkey, tg.t FROM orders JOIN tg ON o_custkey = t) x
             |    ON l_orderkey = x.o_orderkey),
             |ev AS (
             |  SELECT count(CASE WHEN t IS NOT NULL THEN 1 END) AS ndel, count(*) AS n
             |  FROM events LEFT JOIN tg ON user_id = t),
             |cu AS (
             |  SELECT count(CASE WHEN t IS NOT NULL THEN 1 END) AS ndel, count(*) AS n
             |  FROM customer LEFT JOIN tg ON c_custkey = t)
             |SELECT 'customer' AS tbl, CAST(ndel AS BIGINT) AS n_deleted,
             |       CAST(n - ndel AS BIGINT) AS n_remaining FROM cu
             |UNION ALL SELECT 'events', CAST(ndel AS BIGINT), CAST(n - ndel AS BIGINT) FROM ev
             |UNION ALL SELECT 'lineitem', CAST(ndel AS BIGINT), CAST(n - ndel AS BIGINT) FROM li
             |UNION ALL SELECT 'orders', CAST(ndel AS BIGINT), CAST(n - ndel AS BIGINT) FROM o
             |ORDER BY tbl""".stripMargin),
      (s, d) => {
        val tg = t(s, d, "customer")
          .filter(col("c_custkey") % 53 === 0)
          .select(col("c_custkey").as("tgt"))
        def audit(tbl: String, df: DataFrame, key: org.apache.spark.sql.Column,
            rhs: DataFrame, rkey: org.apache.spark.sql.Column): DataFrame = {
          val ndel = count(when(col("__hit").isNotNull, 1))
          df.join(broadcast(rhs.select(rkey.as("__hit")).distinct()),
              key === col("__hit"), "left")
            .agg(lit(tbl).as("tbl"), ndel.as("n_deleted"),
              (count(lit(1)) - ndel).as("n_remaining"))
        }
        val orders = t(s, d, "orders")
        val affectedOrders = orders
          .join(broadcast(tg), col("o_custkey") === col("tgt"), "left_semi")
          .select("o_orderkey")
        audit("customer", t(s, d, "customer"), col("c_custkey"), tg, col("tgt"))
          .unionAll(audit("events", t(s, d, "events"), col("user_id"), tg, col("tgt")))
          .unionAll(audit("lineitem", t(s, d, "lineitem"), col("l_orderkey"),
            affectedOrders, col("o_orderkey")))
          .unionAll(audit("orders", orders, col("o_custkey"), tg, col("tgt")))
          .orderBy("tbl")
      })
  )
}

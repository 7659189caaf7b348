package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Semantic invariants for the commerce-analytics family (q101–q105) plus
  * the events-reader generation adaptation they depend on. */
class CommerceAnalyticsSpec extends SparkSpec {

  test("events reader normalizes ts to TIMESTAMP across testdata generations") {
    val ev = Tables.table(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.filter(col("ts").isNull).count() == 0)
  }

  test("q101 rules respect support/confidence/lift identities") {
    val rules = SparkEntry.queries("q101_basket_rules")(spark, sf).collect()
    assert(rules.nonEmpty, "expected at least one rule at sf0.001")
    rules.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nab = r.getLong(2)
      val conf = r.getDouble(3)
      val lift = r.getDouble(4)
      assert(a < b, s"pair not canonical: $a !< $b")
      assert(conf > 0.0 && conf <= 1.0, s"conf out of range: $conf")
      assert(lift > 0.0, s"lift must be positive: $lift")
      assert(nab > 0)
    }
  }

  test("q101 pair count matches a direct recount for the top rule") {
    val li = Tables.table(spark, sf, "lineitem")
    val part = Tables.table(spark, sf, "part")
    val items = li.join(part, li("l_partkey") === part("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("brand"))
      .distinct()
    val rules = SparkEntry.queries("q101_basket_rules")(spark, sf)
      .orderBy(desc("n_ab"), asc("a"), asc("b")).limit(1).collect()
    val top = rules.head
    val (a, b) = (top.getString(0), top.getString(1))
    val recount = items.as("x").join(items.as("y"),
        col("x.basket") === col("y.basket") &&
          col("x.brand") === lit(a) && col("y.brand") === lit(b))
      .count()
    assert(recount == top.getLong(2),
      s"rule ($a,$b) n_ab=${top.getLong(2)} but recount=$recount")
  }

  test("q102 cohorts retain 100% of themselves at offset zero") {
    val ret = SparkEntry.queries("q102_cohort_retention")(spark, sf).collect()
    assert(ret.nonEmpty)
    val zero = ret.filter(_.getLong(1) == 0L)
    assert(zero.nonEmpty, "every cohort must have an offset-0 row")
    zero.foreach(r => assert(r.getDouble(3) == 1.0,
      s"offset-0 retention must be 1.0, got ${r.getDouble(3)}"))
    ret.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("q103 segments partition the customer base") {
    val seg = SparkEntry.queries("q103_rfm_segments")(spark, sf).collect()
    val totalSeg = seg.map(_.getLong(1)).sum
    val nCust = Tables.table(spark, sf, "orders")
      .select(countDistinct("o_custkey")).head().getLong(0)
    assert(totalSeg == nCust,
      s"segment counts $totalSeg != distinct customers $nCust")
    seg.foreach { r =>
      assert(r.getDouble(3) >= 1.0, "avg frequency below 1 order")
      assert(r.getDouble(2) >= 0.0, "negative recency")
    }
  }

  test("q104 sweep line opens and closes every interval") {
    val prof = SparkEntry.queries("q104_concurrency_sweep")(spark, sf).collect()
    assert(prof.nonEmpty)
    val netSum = prof.map(_.getLong(1)).sum
    assert(netSum == 0L, s"interval deltas must cancel, net sum = $netSum")
    assert(prof.last.getLong(2) == 0L,
      s"final running concurrency must be 0, got ${prof.last.getLong(2)}")
    assert(prof.map(_.getLong(2)).max > 0L, "peak concurrency must be positive")
    prof.foreach(r => assert(r.getLong(2) >= 0L, "negative concurrency"))
  }

  test("q110 neighbor lists are top-3, scored in range, and acyclic in rank") {
    val nb = SparkEntry.queries("q110_item_neighbors")(spark, sf).collect()
    assert(nb.nonEmpty)
    val byItem = nb.groupBy(_.getLong(0))
    byItem.foreach { case (item, rows) =>
      assert(rows.length <= 3, s"item $item has ${rows.length} neighbors")
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.sameElements(1L to rows.length),
        s"item $item ranks not dense: ${ranks.mkString(",")}")
      val sims = rows.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(sims.sameElements(sims.sortBy(-_)), "sim not descending by rank")
      rows.foreach { r =>
        assert(r.getLong(2) > 0L && r.getLong(2) <= 1000000L,
          s"sim out of (0, 1e6]: ${r.getLong(2)}")
        assert(r.getLong(1) != item, "self-neighbor")
      }
    }
  }

  test("q112 temporal join costs every lineitem against exactly one version") {
    val out = SparkEntry.queries("q112_temporal_dim_join")(spark, sf).collect()
    assert(out.length == 3, "all three versions must receive lines")
    val totalLines = out.map(_.getLong(1)).sum
    val liCount = Tables.table(spark, sf, "lineitem").count()
    assert(totalLines == liCount,
      s"version ranges must partition time: $totalLines != $liCount")
    out.foreach(r => assert(r.getLong(2) > 0L, "non-positive revenue"))
  }

  test("q119 EWMA matches a sequential per-user replay") {
    val out = SparkEntry.queries("q119_ewma")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = Tables.table(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) AS x")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val replay = events.groupBy(_._1).map { case (uid, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      uid -> xs.tail.foldLeft(xs.head)((e, x) => (256 * x + 768 * e) / 1024)
    }
    assert(out.keySet == replay.keySet)
    replay.foreach { case (uid, v) =>
      assert(out(uid) == v, s"user $uid: ${out(uid)} != replay $v")
    }
  }

  test("q120 resample blocks are consistent with the raw decode") {
    val res = SparkEntry.queries("q120_audio_resample")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = SparkEntry.queries("q35e_audio_decode")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res.keySet == raw.keySet)
    res.foreach { case (id, (nb, mFirst, _)) =>
      assert(nb == raw(id) / 4, s"doc $id: $nb blocks vs ${raw(id)} samples")
      assert(mFirst >= -32768L && mFirst <= 32767L, s"doc $id mean $mFirst")
    }
  }

  test("q121 top-5 plus OTHER partitions all line items") {
    val out = SparkEntry.queries("q121_topn_other")(spark, sf).collect()
    assert(out.length == 6, s"expected 5 brands + OTHER, got ${out.length}")
    assert(out.exists(_.getString(0) == "OTHER"))
    val total = out.map(_.getLong(1)).sum
    val li = Tables.table(spark, sf, "lineitem").count()
    assert(total == li, s"item counts $total != lineitem $li")
    val other = out.filter(_.getString(0) == "OTHER").head.getDouble(2)
    val named = out.filter(_.getString(0) != "OTHER").map(_.getDouble(2))
    assert(named.forall(_ > 0.0) && other > 0.0)
  }

  test("q122 bucketed gaps equal a global sequential replay") {
    val gaps = SparkEntry.queries("q122_key_gaps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keys = Tables.table(spark, sf, "orders")
      .filter(col("o_orderstatus") =!= "P")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val expect = keys.zip(keys.tail).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1)
    }
    assert(gaps.sameElements(expect),
      s"${gaps.length} gaps vs replay ${expect.length}")
    gaps.foreach { case (s0, e0) => assert(s0 <= e0) }
  }

  test("q123 deletion audit is consistent across referencing tables") {
    val audit = SparkEntry.queries("q123_forgotten_user")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.keySet == Set("customer", "events", "lineitem", "orders"))
    val targets = Tables.table(spark, sf, "customer")
      .filter(col("c_custkey") % 53 === 0).collect().map(_.getLong(0)).toSet
    assert(audit("customer")._1 == targets.size)
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
    val affected = orders.filter(r => targets(r.getLong(1))).map(_.getLong(0)).toSet
    assert(audit("orders")._1 == affected.size)
    val liDel = Tables.table(spark, sf, "lineitem").select("l_orderkey")
      .collect().count(r => affected(r.getLong(0)))
    assert(audit("lineitem")._1 == liDel)
    // Deleted + remaining must equal each table's full count.
    audit.foreach { case (tbl, (d0, r0)) =>
      val full = Tables.table(spark, sf,
        if (tbl == "events") "events" else tbl).count()
      assert(d0 + r0 == full, s"$tbl: $d0 + $r0 != $full")
    }
  }

  test("q105 attribution covers every purchase exactly once") {
    val att = SparkEntry.queries("q105_attribution")(spark, sf).collect()
    val attributed = att.map(_.getLong(1)).sum
    val purchases = Tables.table(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases,
      s"attributed $attributed != purchase events $purchases")
    val channels = att.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "signup", "direct")),
      s"unexpected channels: $channels")
  }
}

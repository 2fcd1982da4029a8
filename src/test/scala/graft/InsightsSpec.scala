package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the distribution-diagnostics family (Insights.scala).
  * Cross-engine value equality is the oracle gate's job; these pin the
  * mathematical invariants each statistic must satisfy regardless of data.
  */
class InsightsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Hash exchanges in the pre-AQE plan (the InferenceSpec helper). */
  private def hashExchanges(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(p).length
  }

  test("ks statistic is in [0,1] and sample sizes cover the filtered corpus") {
    val r = SparkEntry.queries("q_ks_test")(spark, TestSpark.sf).head()
    val (d, n1, n2) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    assert(d >= 0.0 && d <= 1.0, s"KS D out of range: $d")
    val expected = Tables(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "purchase") &&
        col("value").isNotNull)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n1 == expected("click") && n2 == expected("purchase"))
  }

  test("q_quantile_normalize: deciles complete, monotone, pooled column group-invariant") {
    val rows = SparkEntry.queries("q_quantile_normalize")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 9L), s"$lang missing deciles")
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq,
        s"$lang raw_q not monotone")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"$lang norm_q not monotone")
    }
    // the normalized target is the POOLED distribution: identical per decile
    (1L to 9L).foreach { d =>
      assert(rows.filter(_._2 == d).map(_._4).distinct.length == 1,
        s"decile $d norm_q differs across langs")
    }
  }

  test("q_concurrency matches a brute-force sweep over collected intervals") {
    val iv = Tables(spark, TestSpark.sf, "orders")
      .join(Tables(spark, TestSpark.sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(first(to_date(col("o_orderdate"))).as("open"),
        max(to_date(col("l_shipdate"))).as("close"))
      .collect()
      .map { r =>
        val (o, c) = (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate)
        (o, if (c.isBefore(o)) o else c) // the operator's close>=open clamp
      }
    // brute force: day-by-day census over the full span
    val days = Iterator.iterate(iv.map(_._1).min)(_.plusDays(1))
      .takeWhile(!_.isAfter(iv.map(_._2).max)).toSeq
    val expected = days.map(day =>
        (day.withDayOfMonth(1),
          iv.count(p => !day.isBefore(p._1) && !day.isAfter(p._2)).toLong))
      .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).max }
    val got = SparkEntry.queries("q_concurrency")(spark, TestSpark.sf)
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    got.foreach { case (m, v) =>
      assert(expected(m) == v, s"$m: sweep $v vs brute ${expected(m)}")
    }
    // every month with a book CHANGE is emitted
    assert(got.nonEmpty && got.keySet.subsetOf(expected.keySet))
  }

  test("q_new_returning: users partition exactly, cumulative equals distinct users, one corpus exchange") {
    val rows = SparkEntry.queries("q_new_returning")(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val ev = Tables(spark, TestSpark.sf, "events")
    assert(rows.map(_._2).sum ==
      ev.select("user_id").distinct().count(),
      "every user is new exactly once")
    assert(rows.last._4 == rows.map(_._2).sum, "cumulative != total acquired")
    // DAU = new + returning must equal the distinct (user, day) census
    val dau = ev.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().groupBy("d").count().collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    rows.foreach { case (day, nu, ru, _) =>
      assert(nu + ru == dau(day), s"$day: ${nu + ru} vs ${dau(day)}")
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(hashExchanges("q_new_returning") <= 2,
      "user repartition not shared by distinct + first-day window")
  }

  test("q_rolling_regression matches a brute-force trailing-window fit") {
    val daily = Tables(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value") * 100).cast("long").as("cents")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).sortBy(_._1)
    val got = SparkEntry.queries("q_rolling_regression")(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == daily.length)
    got.foreach { case (day, nDays, slope) =>
      val win = daily.filter { case (d, _) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(7)) }
      assert(nDays == win.length, s"$day window size")
      if (win.length < 2) assert(slope.isEmpty)
      else {
        val n = win.length.toDouble
        val xs = win.map(_._1.toEpochDay.toDouble)
        val ys = win.map(_._2.toDouble)
        val expected = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
          xs.sum * ys.sum) / (n * xs.map(x => x * x).sum -
          xs.sum * xs.sum) / 100.0
        assert(math.abs(slope.get - expected) < 1e-2,
          s"$day: ${slope.get} vs $expected")
      }
    }
  }

  test("q_cycle_time: percentile ladder ordered, mean within range, clamp respected") {
    val rows = SparkEntry.queries("q_cycle_time")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val totalOrders = Tables(spark, TestSpark.sf, "orders")
      .join(Tables(spark, TestSpark.sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(rows.map(_._2).sum == totalOrders)
    rows.foreach { case (prio, n, mean, p50, p95, maxd) =>
      assert(p50 <= p95 + 1e-9 && p95 <= maxd + 1e-9, s"$prio ladder")
      assert(mean >= 0.0 && mean <= maxd + 1e-9, s"$prio mean")
      assert(maxd >= 0, s"$prio clamp violated")
    }
  }

  test("q_join_cardinality predicts the exact executed join size") {
    val rows = SparkEntry.queries("q_join_cardinality")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val lo = Tables(spark, TestSpark.sf, "lineitem")
      .join(Tables(spark, TestSpark.sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(rows("lineitem_orders").getLong(4) == lo)
    val oc = Tables(spark, TestSpark.sf, "orders")
      .join(Tables(spark, TestSpark.sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(rows("orders_customer").getLong(4) == oc)
    rows.values.foreach { r =>
      assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)),
        "matched keys exceed a side's key count")
    }
  }

  test("chi-square is non-negative with the right dof, and is ~0 on independent margins") {
    val r = SparkEntry.queries("q_chisq_independence")(spark, TestSpark.sf).head()
    val (chi2, dof) = (r.getDouble(0), r.getLong(1))
    assert(chi2 >= -1e-4, s"chi2 must be >= 0, got $chi2")
    val langs = Tables(spark, TestSpark.sf, "documents")
      .select("lang").distinct().count()
    val sources = Tables(spark, TestSpark.sf, "documents")
      .select("source").distinct().count()
    assert(dof == (langs - 1) * (sources - 1))
  }

  test("winsorized mean sits within [lo, hi] and bounds within the raw range per brand") {
    val rows = SparkEntry.queries("q_winsorize")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wmean, lo, hi) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"${r.getString(0)}: lo $lo > hi $hi")
      // rounding tolerance: wmean/lo/hi are all r4-emitted
      assert(wmean >= lo - 1e-3 && wmean <= hi + 1e-3,
        s"${r.getString(0)}: wmean $wmean outside [$lo, $hi]")
    }
    // clamping can only pull the mean toward the center: the winsorized
    // mean never exceeds the raw max nor undercuts the raw min
    val raw = Tables(spark, TestSpark.sf, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).head()
    rows.foreach(r =>
      assert(r.getDouble(1) >= raw.getDouble(0) &&
        r.getDouble(1) <= raw.getDouble(1)))
  }

  test("rolling 7-day distinct: wau >= dau, stickiness in (0,1], wau bounded by 7-day dau sum") {
    val rows = SparkEntry.queries("q_rolling_distinct")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val dauByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, dau, wau, stick) =>
      assert(wau >= dau, s"$day: wau $wau < dau $dau")
      assert(stick > 0.0 && stick <= 1.0)
      // union bound: distinct users over 7 days <= sum of the daily counts
      val windowSum = (0 to 6).flatMap(k => dauByDay.get(day.minusDays(k))).sum
      assert(wau <= windowSum, s"$day: wau $wau > 7-day dau sum $windowSum")
    }
  }

  test("weighted percentiles: wp50 <= wp90, both are observed prices, wp50 >= unweighted min") {
    val rows = SparkEntry.queries("q_percentile_weighted")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == Set("A", "N", "R"))
    val prices = Tables(spark, TestSpark.sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (flag, p50, p90) =>
      assert(p50 <= p90, s"$flag: wp50 $p50 > wp90 $p90")
      assert(prices(flag).contains(p50) && prices(flag).contains(p90),
        s"$flag: weighted percentile must be an observed price")
    }
  }

  test("ohlc bars: low <= open/close <= high, one bar per (day, type), single-agg plan") {
    val df = SparkEntry.queries("q_ohlc_resample")(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getDate(0), r.getString(1))).distinct.length ==
      rows.length)
    rows.foreach { r =>
      val (o, c, h, l) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l <= o && o <= h && l <= c && c <= h,
        s"${r.getDate(0)}/${r.getString(1)}: OHLC ordering violated o=$o c=$c h=$h l=$l")
    }
    // the whole query is ONE hash aggregation over one scan — no window,
    // no join (the oracle's row_number spelling is NOT the plan we run)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "OHLC must not use a window")
    assert(!plan.contains("Join"), "OHLC must not self-join")
  }

  test("psi: near zero on a self-split sanity bound, periods partition the events") {
    val r = SparkEntry.queries("q_psi_drift")(spark, TestSpark.sf).head()
    val (psi, n1, n2) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    // PSI is a sum of (p2-p1)ln(p2/p1) terms, each >= 0
    assert(psi >= -1e-4, s"PSI must be non-negative, got $psi")
    val total = Tables(spark, TestSpark.sf, "events")
      .filter(col("value").isNotNull).count()
    assert(n1 + n2 == total, s"periods must partition the corpus: $n1+$n2 != $total")
    assert(n1 > 0 && n2 > 0)
  }

  test("rollup shares: nations sum to 1 within each region, regions sum to 1 overall") {
    val rows = SparkEntry.queries("q_rollup_share")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), r.getDouble(4)))
    val (nations, regions) = rows.partition(_._1 == "nation")
    assert(regions.nonEmpty && nations.nonEmpty)
    // r4 rounding: 25 nations x 5e-5 tolerance each
    nations.groupBy(_._2).foreach { case (region, ns) =>
      val s = ns.map(_._4).sum
      assert(math.abs(s - 1.0) < 2e-3, s"$region: nation shares sum to $s")
    }
    val rs = regions.map(_._4).sum
    assert(math.abs(rs - 1.0) < 1e-3, s"region shares sum to $rs")
  }

  test("top changers: both years' ranks are permutations and movement balances to zero") {
    val rows = SparkEntry.queries("q_top_changers")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.length == 25)
    assert(rows.map(_._2).sorted.toSeq == (1L to 25L))
    assert(rows.map(_._3).sorted.toSeq == (1L to 25L))
    assert(rows.map(_._4).sum == 0L, "rank movement over a permutation must net to zero")
    rows.foreach { case (_, r97, r98, moved) => assert(moved == r97 - r98) }
  }

  test("user paths: '>' joined prefixes, user counts bounded by the user universe") {
    val rows = SparkEntry.queries("q_user_paths")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { case (path, n) =>
      val steps = path.split(">")
      assert(steps.length >= 1 && steps.length <= 3 &&
        steps.forall(types.contains), s"malformed path: $path")
      assert(n > 0)
    }
    val nUsers = Tables(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum <= nUsers,
      "each user contributes exactly one path")
    // descending count order with path tie-break
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  test("cohort ltv: cum_rev is non-decreasing per cohort and equals the running sum") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, ws) =>
      val sorted = ws.sortBy(_._2)
      var run = 0.0
      sorted.foreach { case (_, widx, rev, cum, nUsers, ltv) =>
        run += rev
        assert(math.abs(cum - run) < 1e-6, s"$cohort w$widx: cum $cum != $run")
        assert(nUsers > 0)
        assert(math.abs(ltv - cum / nUsers) < 1e-3)
      }
    }
  }

  test("cumulative users: monotone, final value = total distinct users") {
    val rows = SparkEntry.queries("q_cumulative_users")(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    var run = 0L
    rows.foreach { case (_, nu, cum) =>
      run += nu
      assert(cum == run, s"cumulative must equal the running sum: $cum != $run")
    }
    val total = Tables(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    assert(rows.last._3 == total)
  }

  test("revenue bridge: volume + price effects reconstruct the delta exactly per brand") {
    val rows = SparkEntry.queries("q_revenue_bridge")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 25)
    rows.foreach { case (brand, delta, vol, price) =>
      // (q1-q0)p0 + (p1-p0)q1 == q1p1 - q0p0 algebraically; r4 rounding
      // of the three emitted values bounds the residual
      assert(math.abs(vol + price - delta) < 2e-3,
        s"$brand: $vol + $price != $delta")
    }
  }

  test("lang confusion: recalls sum to 1 per language; diagonal agrees with q_text_langid hits") {
    val rows = SparkEntry.queries("q_lang_confusion")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-2, s"$lang: recalls sum to $s")
    }
    val diag = rows.filter(r => r._1 == r._2).map(r => r._1 -> r._3).toMap
    val hits = SparkEntry.queries("q_text_langid")(spark, TestSpark.sf)
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("hit"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hits.foreach { case (lang, h) =>
      assert(diag.getOrElse(lang, 0L) == h, s"$lang: diagonal != per-doc hits")
    }
  }

  test("sketched rolling distinct agrees with the exact query day by day") {
    val approx = SparkEntry.queries("q_rolling_distinct_approx")(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    val exact = SparkEntry.queries("q_rolling_distinct")(spark, TestSpark.sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (day, wauExact, within) =>
      assert(exact(day) == wauExact, s"$day: exact paths disagree")
      assert(within, s"$day: HLL estimate strayed >5% from $wauExact")
    }
  }
}

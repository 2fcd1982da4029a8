package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property + plan-shape tests for the inference family (Inference.scala).
  * Cross-engine value equality is the oracle gate's job; these pin the
  * mathematical invariants and the single-exchange plan shapes the
  * operators' 100-TB claims rest on.
  */
class InferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Hash exchanges in the pre-AQE plan (range partitioning of the final
    * presentation sort excluded — it's output formatting, not the
    * operator's data movement).
    */
  private def hashExchanges(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(p).length
  }

  test("q_spearman matches a brute-force average-rank Spearman per flag") {
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val r = (i + 1 + j) / 2.0 // mean of ranks i+1 .. j
        (i until j).foreach(k => out(sorted(k)._2) = r)
        i = j
      }
      out
    }
    def pearson(x: Array[Double], y: Array[Double]): Double = {
      val n = x.length
      val (mx, my) = (x.sum / n, y.sum / n)
      val num = x.indices.map(i => (x(i) - mx) * (y(i) - my)).sum
      val den = math.sqrt(x.indices.map(i => math.pow(x(i) - mx, 2)).sum *
        x.indices.map(i => math.pow(y(i) - my, 2)).sum)
      num / den
    }
    val raw = Tables(spark, TestSpark.sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getString(0))
    val rows = SparkEntry.queries("q_spearman")(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
    rows.foreach { r =>
      val g = raw(r.getString(0))
      val expected = pearson(avgRanks(g.map(_.getDouble(1))),
        avgRanks(g.map(_.getDouble(2))))
      assert(r.getLong(1) == g.length)
      assert(math.abs(r.getDouble(2) - expected) < 1e-3,
        s"${r.getString(0)}: query ${r.getDouble(2)} vs brute $expected")
    }
  }

  test("q_spearman plans ONE corpus exchange: all four windows and the final agg share it") {
    assert(hashExchanges("q_spearman") == 1)
  }

  test("q_interpolate emits only gap days, linearly bounded by the endpoints") {
    val daily = Tables(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum("value").as("v")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate) -> r.getDouble(2))
      .toMap
    val rows = SparkEntry.queries("q_interpolate")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, day) = (r.getLong(0), r.getDate(1).toLocalDate)
      assert(!daily.contains((u, day)),
        s"user $u day $day is a purchase day — must not be interpolated")
      // linear interp between two observed endpoints stays within the
      // user's observed min/max daily spend
      val vs = daily.collect { case ((uu, _), v) if uu == u => v }
      assert(r.getDouble(2) >= vs.min - 1e-3 && r.getDouble(2) <= vs.max + 1e-3)
    }
  }

  test("q_interpolate plans ONE corpus exchange: rollup + lead window share the user repartition") {
    assert(hashExchanges("q_interpolate") == 1)
  }

  test("q_levene: W >= 0, k covers all event types, n covers the corpus") {
    val r = SparkEntry.queries("q_levene")(spark, TestSpark.sf).head()
    val (k, n, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(w >= 0.0, s"Brown-Forsythe W must be >= 0, got $w")
    val ev = Tables(spark, TestSpark.sf, "events")
    assert(k == ev.select("event_type").distinct().count())
    assert(n == ev.count())
  }

  test("q_cuped preserves the pooled mean and shares one corpus exchange") {
    val rows = SparkEntry.queries("q_cuped")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getBoolean(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == Set(true, false))
    // CUPED adjusts arms in opposite directions around the pooled mean:
    // sum n_i * mean_y_cuped_i == sum n_i * mean_y_i (Σ(x - x̄) = 0 pooled)
    val rawTot = rows.map(r => r._2 * r._3).sum
    val adjTot = rows.map(r => r._2 * r._4).sum
    assert(math.abs(rawTot - adjTot) / math.abs(rawTot) < 1e-3,
      s"CUPED moved the pooled mean: raw $rawTot vs adjusted $adjTot")
    // corpus exchange (user rollup) + arm rollup exchange; the latter is
    // map-side combined to 2 partial rows per task, so only the first
    // moves corpus-proportional bytes
    assert(hashExchanges("q_cuped") == 2)
  }

  test("q_srm: chi2 >= 0 and the flag agrees with the 3.8415 critical value") {
    val rows = SparkEntry.queries("q_srm")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chi2, flag) = (r.getDouble(3), r.getBoolean(4))
      assert(chi2 >= 0.0)
      assert(flag == chi2 > 3.8415 ||
        math.abs(chi2 - 3.8415) < 1e-3, // r4 boundary slack
        s"${r.getString(0)}: flag $flag inconsistent with chi2 $chi2")
    }
  }

  test("q_did: the estimator recombines from its own emitted cell means") {
    val r = SparkEntry.queries("q_did")(spark, TestSpark.sf).head()
    val (mtp, mtq) = (r.getDouble(4), r.getDouble(5))
    val (mcp, mcq) = (r.getDouble(6), r.getDouble(7))
    val did = r.getDouble(8)
    // cell means are r4-rounded independently of did: tolerance 4 ulps of 1e-4
    assert(math.abs(((mtq - mtp) - (mcq - mcp)) - did) < 4e-4)
    // every purchase lands in exactly one cell
    val total = (0 to 3).map(r.getLong).sum
    val purchases = Tables(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases)
  }
}

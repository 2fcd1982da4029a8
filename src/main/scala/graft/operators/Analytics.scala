package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composite analytics shapes: time-series gap-fill, histogram binning, and
  * two classic TPC-H query patterns adapted to the corpus schema — the
  * "every query a reference user runs today" evidence, oracle-checked.
  */
object Analytics {

  /** Morton (z-order) value interleaving the low `bits` bits of two
    * columns: bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. Pure
    * unrolled shift/mask arithmetic — whole-stage codegen, identical
    * formula in the DuckDB oracle. */
  private[graft] def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  val qs: Map[String, Q] = Map(

    // Multi-dimensional data layout: z-order (Morton) clustering key over
    // (l_partkey, l_suppkey) low bytes. Sorting/write-partitioning a 100 TB
    // fact table by this key makes parquet row-group min/max stats prune
    // range predicates on EITHER dimension (a single-column sort prunes
    // only its own column — the worst-case scan for the other dim is the
    // whole table; LayoutSpec measures the block-touch asymmetry). The
    // z computation itself is stateless map-side bit math.
    "q_layout_zorder" -> Q(
      fn = (s, d) =>
        Tables(s, d, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            pmod(col("l_partkey"), lit(256L)).as("pa"),
            pmod(col("l_suppkey"), lit(256L)).as("pb"))
          .withColumn("z", zValue(col("pa"), col("pb"), 8))
          .select("l_orderkey", "l_linenumber", "pa", "pb", "z")
          .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
          .limit(1000),
      oracle = Some({
        val terms = (0 until 8).map(i =>
          s"(((pa >> $i) & 1) << ${2 * i}) + (((pb >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""
        SELECT l_orderkey, l_linenumber, pa, pb, $terms AS z
        FROM (SELECT l_orderkey, l_linenumber,
                     l_partkey % 256 AS pa, l_suppkey % 256 AS pb
              FROM lineitem)
        ORDER BY z, l_orderkey, l_linenumber LIMIT 1000"""
      })),

    // Resample to an hourly grid per event_type: missing buckets appear
    // with n=0, plus a forward-filled "last seen total". The grid is
    // sequence(min,max) exploded — O(|buckets|), no driver loop; the fill
    // is one keyed window.
    "q_resample_gapfill" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .withColumn("bucket", window(col("ts"), "1 hour").getField("start"))
        val actual = ev.groupBy("bucket", "event_type")
          .agg(count(lit(1)).as("n"), dec4(sum(dec2(col("value")))).as("total"))
        val bounds = ev.agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        val grid = bounds
          .select(explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("bucket"))
          .crossJoin(ev.select("event_type").distinct())
        val filled = grid.join(actual, Seq("bucket", "event_type"), "left")
          .select(col("bucket"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("total"), lit(0.0)).as("total"))
        filled.withColumn("ffill_total",
            coalesce(last(when(col("n") > 0, col("total")), ignoreNulls = true)
              .over(Window.partitionBy(col("event_type")).orderBy(col("bucket"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
              lit(0.0)))
          .orderBy("bucket", "event_type")
      },
      oracle = Some("""
        WITH ev AS (SELECT time_bucket(INTERVAL '1 hour', date_trunc('milliseconds', ts)) AS bucket,
                           event_type, value FROM events),
        actual AS (SELECT bucket, event_type, COUNT(*) AS n,
                          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
                   FROM ev GROUP BY bucket, event_type),
        grid AS (SELECT g.bucket, t.event_type
                 FROM (SELECT unnest(generate_series((SELECT MIN(bucket) FROM ev),
                                                     (SELECT MAX(bucket) FROM ev),
                                                     INTERVAL 1 HOUR)) AS bucket) g
                 CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
        filled AS (SELECT grid.bucket, grid.event_type,
                          coalesce(actual.n, 0) AS n,
                          coalesce(actual.total, CAST(0 AS DOUBLE)) AS total
                   FROM grid LEFT JOIN actual USING (bucket, event_type))
        SELECT bucket, event_type, n, total,
               coalesce(last_value(CASE WHEN n > 0 THEN total END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 CAST(0 AS DOUBLE)) AS ffill_total
        FROM filled ORDER BY bucket, event_type""")),

    // Fixed-width histogram of extended price: floor-divide binning with a
    // top cap (identical IEEE arithmetic on both engines).
    "q_histogram" -> Q(
      fn = (s, d) =>
        Tables(s, d, "lineitem")
          .withColumn("bin",
            least(floor(col("l_extendedprice") / 10000).cast(LongType), lit(9L)))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"))
          .orderBy("bin"),
      oracle = Some("""
        SELECT least(CAST(floor(l_extendedprice / 10000) AS BIGINT), 9) AS bin,
               COUNT(*) AS n, MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        FROM lineitem GROUP BY bin ORDER BY bin""")),

    // 2-D histogram (the heatmap/density-grid primitive behind joint
    // distributions and correlation eyeballing): fixed-width integer
    // binning over two columns at once. The bin key space is bounded
    // (≤ 50 cells here), so the hash agg is one exchange of partials and
    // row share is ONE integer-count division — bit-exact cross-engine.
    "q_histogram_2d" -> Q(
      fn = (s, d) => {
        val grid = Tables(s, d, "lineitem")
          .select(
            least(floor(col("l_quantity") / 10).cast(LongType), lit(4L)).as("qbin"),
            least(floor(col("l_extendedprice") / 10000).cast(LongType), lit(9L)).as("pbin"))
          .groupBy("qbin", "pbin")
          .agg(count(lit(1)).as("n"))
        // Total via a 1-row broadcast agg, not an unpartitioned window
        // (the q_mixture_resample pattern — no single-partition WindowExec,
        // no log-noise warning, and the grid agg is 50 rows).
        grid.crossJoin(broadcast(grid.agg(sum(col("n")).as("tot"))))
          .select(col("qbin"), col("pbin"), col("n"),
            (col("n").cast(DoubleType) / col("tot").cast(DoubleType)).as("share"))
          .orderBy("qbin", "pbin")
      },
      oracle = Some("""
        WITH g AS (
          SELECT least(CAST(floor(l_quantity / 10) AS BIGINT), 4) AS qbin,
                 least(CAST(floor(l_extendedprice / 10000) AS BIGINT), 9) AS pbin,
                 COUNT(*) AS n
          FROM lineitem GROUP BY qbin, pbin)
        SELECT qbin, pbin, n,
               CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
        FROM g ORDER BY qbin, pbin""")),

    // Equi-depth histogram, sketch-based — the 100 TB formulation. The
    // naive plan (ntile over a total order) is a single-task global sort;
    // here the decile boundaries come from ONE approx_percentile pass
    // (Greenwald-Khanna: fixed-size per-partition state, map-side combine,
    // only sketches cross the exchange) and rows are binned map-side
    // against the broadcast boundary array — no Window operator anywhere
    // (PlanSpec asserts). The binning comparisons are unrolled per decile
    // (static getItem chain, whole-stage codegen) rather than an
    // interpreted array HOF.
    //
    // Correctness contract (boolean-validated like q_agg_approx_*): each
    // decile's depth must sit within 1% of N/10 (sketch rank error at
    // accuracy 10⁴ is 0.01% — two orders of margin; max value multiplicity
    // in the corpus is 4, so unsplittable ties cannot skew a bucket), and
    // each sketch boundary's exact RANK — cum(n)/N, a free by-product of
    // the binning pass — must land within ±0.05 of its target quantile.
    // Rank-of-boundary replaces the earlier value-of-rank check via exact
    // percentile(): same neighborhood test (modulo ties, multiplicity ≤4),
    // but bounded state — Spark's exact percentile buffers a value→count
    // map per agg, unbounded on a 100 TB high-cardinality double column.
    // The exact-percentile cross-check survives at test scale only
    // (MiscOpsSpec "equi-depth sketch boundaries").
    "q_histogram_equidepth" -> Q(
      fn = (s, d) => {
        val sketch = Tables(s, d, "lineitem")
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)").as("b"))
        // One global aggregate produces every per-decile count AND its
        // cumulative rank as 20 conditional sums (bounded 1-row state,
        // map-side combine), then explodes back to the 10-row shape —
        // empty deciles surface as n=0 rather than a dropped group, and
        // there is no window, no range-join, no second binning pass.
        val aggs = (1 to 10).flatMap(i => Seq(
          sum(when(col("decile") === i, 1L).otherwise(0L)).as(s"n_$i"),
          sum(when(col("decile") <= i, 1L).otherwise(0L)).as(s"cum_$i")))
        val counts = Tables(s, d, "lineitem").select(col("l_extendedprice").as("x"))
          .crossJoin(broadcast(sketch))
          .withColumn("decile",
            (1 to 9).map(i => when(col("x") > col("b").getItem(i - 1), 1L).otherwise(0L))
              .reduce(_ + _) + lit(1L))
          .agg(aggs.head, aggs.tail: _*)
        counts
          // cum_10 counts every row — the corpus total, for free.
          .select(col("cum_10").as("n_total"), explode(array((1 to 10).map(i =>
            struct(lit(i.toLong).as("decile"), col(s"n_$i").as("n"),
              col(s"cum_$i").as("cum"))): _*)).as("r"))
          .select(
            col("r.decile").as("decile"),
            (abs(col("r.n") - col("n_total") / 10.0) <= col("n_total") * 0.01).as("depth_ok"),
            when(col("r.decile") === 10, lit(true)).otherwise(
              (col("r.cum") / col("n_total"))
                .between(col("r.decile") / 10.0 - 0.05, col("r.decile") / 10.0 + 0.05))
              .as("boundary_ok"))
          .orderBy("decile")
      },
      oracle = Some("""
        SELECT d AS decile, true AS depth_ok, true AS boundary_ok
        FROM (SELECT unnest(generate_series(1, 10)) AS d)
        ORDER BY d""")),

    // TPC-H Q3 (shipping priority), adapted: o_orderpriority stands in for
    // the missing o_shippriority column.
    "q_tpch_q3" -> Q(
      fn = (s, d) => {
        val cutoff = lit("1998-06-15").cast(TimestampType)
        Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < cutoff)
          .join(Tables(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > cutoff)
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(dec4(sum(revenue)).as("rev"))
          .orderBy(col("rev").desc, col("o_orderdate").asc, col("l_orderkey").asc)
          .limit(10)
      },
      oracle = Some(s"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM($revenueSql) AS DOUBLE) AS rev
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-15'
          AND l_shipdate > TIMESTAMP '1998-06-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY rev DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10""")),

    // TPC-H Q5 (local supplier volume): revenue per nation where the
    // supplier and customer share a nation, one region, one year.
    "q_tpch_q5" -> Q(
      fn = (s, d) =>
        Tables(s, d, "customer")
          .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                  col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
          .join(Tables(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(Tables(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(dec4(sum(revenue)).as("rev"))
          .orderBy(col("rev").desc, col("n_name").asc),
      oracle = Some(s"""
        SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS rev
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY rev DESC, n_name ASC""")),

    // TPC-H Q10 (returned item reporting): revenue lost to returned
    // lineitems per customer over one quarter, top 20. Selective date +
    // returnflag filters push into the scans; nation broadcasts; the
    // customer-grain agg shuffles once on the grouping key; the final
    // top-20 is a TakeOrderedAndProject, never a global sort.
    "q_tpch_q10" -> Q(
      fn = (s, d) =>
        Tables(s, d, "customer")
          .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
                  col("o_orderdate") < lit("1997-04-01").cast(TimestampType))
          .join(Tables(s, d, "lineitem").filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(dec4(sum(revenue)).as("rev"))
          .orderBy(col("rev").desc, col("c_custkey").asc)
          .limit(20),
      oracle = Some(s"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM($revenueSql) AS DOUBLE) AS rev
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY rev DESC, c_custkey ASC
        LIMIT 20""")),

    // Retention cohorts: users grouped by the week of their FIRST event,
    // crossed with the weeks they were active — the classic triangular
    // retention matrix. Two hash aggs + one join. The cohort-assignment
    // join is UNHINTED: distinct users ≪ events but the user base is
    // corpus-PROPORTIONAL (the q_dedup_fuzzy sf100 failure class) — AQE
    // broadcasts it while small and keys the exchange at scale.
    "q_retention_cohort" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .select(col("user_id"), col("ts"))
        val cohorts = ev.groupBy("user_id")
          .agg(min(col("ts")).as("first_ts"))
          .select(col("user_id"),
            date_trunc("week", col("first_ts")).cast(DateType).as("cohort_week"))
        ev.select(col("user_id"),
            date_trunc("week", col("ts")).cast(DateType).as("act_week"))
          .join(cohorts, "user_id")
          .groupBy("cohort_week", "act_week")
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "act_week")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, date_trunc('milliseconds', ts) AS ts FROM events),
        cohorts AS (
          SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
          FROM e GROUP BY user_id)
        SELECT cohort_week, CAST(date_trunc('week', e.ts) AS DATE) AS act_week,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM e JOIN cohorts USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Per-group statistical outlier flagging — the corpus-quality gate that
    // drops anomalous documents before training. The metric is mean token
    // length (chars per token), whose per-language distribution has real
    // tails (doc token COUNTS are uniform here — their z never exceeds √3).
    // Group stats are one hash agg (5 rows), broadcast back over the scan:
    // no shuffle of the corpus at any scale. z is round-4 (stddev's merge
    // order differs per engine in the last ulps); |z|>2 boundary hits are
    // measure-zero.
    "q_outlier_zscore" -> Q(
      fn = (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            (col("n_chars").cast(DoubleType) /
              size(split(col("text"), " "))).as("m"))
        val stats = docs.groupBy("lang")
          .agg(avg(col("m")).as("mu"), stddev_samp(col("m")).as("sd"))
        docs.join(broadcast(stats), "lang")
          .withColumn("z", (col("m") - col("mu")) / col("sd"))
          .filter(abs(col("z")) > 2.0)
          .select(col("lang"), col("doc_id"), col("m"), r4(col("z")).as("z"))
          .orderBy("lang", "doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS m
          FROM documents),
        s AS (
          SELECT lang, avg(m) AS mu, stddev_samp(m) AS sd
          FROM t GROUP BY lang)
        SELECT t.lang, doc_id, m,
               CAST(ROUND((m - mu) / sd, 4) AS DOUBLE) AS z
        FROM t JOIN s ON t.lang = s.lang
        WHERE abs((m - mu) / sd) > 2
        ORDER BY t.lang, doc_id""")),

    // Interval-point temporal join WITHOUT an equi key: for every order,
    // how many high-quantity return lineitems shipped inside its 3-day
    // window — a pure range predicate between two tables. The theta join
    // is O(n·m); the scale formulation BINS it: each 3-day interval
    // explodes into its 3 covering days, points key by their day, and the
    // match becomes an equi join on the day bucket (day-granular data ⇒
    // bucket equality is exactly the range predicate, no dedup needed).
    // Shuffle is keyed by calendar day; interval length bounds the
    // explode factor.
    "q_interval_join" -> Q(
      fn = (s, d) => {
        val pts = Tables(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
          .select(col("l_shipdate").as("day"))
        val buckets = Tables(s, d, "orders")
          .select(col("o_orderkey"), explode(expr(
            "sequence(o_orderdate, o_orderdate + INTERVAL 2 DAYS, INTERVAL 1 DAY)")).as("day"))
        val counts = buckets.join(pts, "day")
          .groupBy("o_orderkey").agg(count(lit(1)).as("n_pts"))
        Tables(s, d, "orders").select("o_orderkey")
          .join(counts, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"), coalesce(col("n_pts"), lit(0L)).as("n_pts"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        WITH pts AS (
          SELECT l_shipdate AS day FROM lineitem
          WHERE l_returnflag = 'R' AND l_quantity >= 45)
        SELECT o_orderkey, COUNT(pts.day) AS n_pts
        FROM orders LEFT JOIN pts
          ON pts.day >= o_orderdate
         AND pts.day < o_orderdate + INTERVAL 3 DAY
        GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // Robust (median/MAD) outlier gate — the companion to q_outlier_zscore
    // for heavy-tailed metrics where mean/stddev are themselves dragged by
    // the outliers. metric = mean chars per token; a doc is flagged when
    // |m - median| > 3 · 1.4826 · MAD (the Gaussian-consistent MAD scale).
    // Two grouped interpolated-percentile aggs (5 rows each) broadcast back
    // over the scan — the corpus is never shuffled, same shape as zscore.
    // Both engines interpolate the median identically (lo + (hi-lo)·frac on
    // the two neighbors, the q_agg_percentile-proven path); the comparison
    // operands are built by the identical expression tree, so the flag
    // decision is deterministic cross-engine.
    "q_outlier_mad" -> Q(
      fn = (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            (col("n_chars").cast(DoubleType) /
              size(split(col("text"), " "))).as("m"))
        val med = docs.groupBy("lang")
          .agg(expr("percentile(m, 0.5)").as("med"))
        val devs = docs.join(broadcast(med), "lang")
          .withColumn("dev", abs(col("m") - col("med")))
        val mad = devs.groupBy("lang")
          .agg(expr("percentile(dev, 0.5)").as("mad"))
        devs.join(broadcast(mad), "lang")
          .filter(col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .select(col("lang"), col("doc_id"), col("m"),
            r4(col("dev") / col("mad")).as("mad_score"))
          .orderBy("lang", "doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS m
          FROM documents),
        med AS (SELECT lang, quantile_cont(m, 0.5) AS med FROM t GROUP BY lang),
        d AS (SELECT t.lang, doc_id, m, abs(m - med) AS dev
              FROM t JOIN med ON t.lang = med.lang),
        mad AS (SELECT lang, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY lang)
        SELECT d.lang, doc_id, m,
               CAST(ROUND(dev / mad, 4) AS DOUBLE) AS mad_score
        FROM d JOIN mad ON d.lang = mad.lang
        WHERE dev > 3.0 * 1.4826 * mad
        ORDER BY d.lang, doc_id""")),

    // Declarative data-quality validation (the Deequ/expectations shape):
    // a rule suite evaluated in ONE scan of the fact table — every
    // not-null / range / set-membership / positivity rule is a conditional
    // sum in a single wide aggregate (bounded 1-row state, map-side
    // combine), uniqueness is a countDistinct in the same pass, and the
    // one rule that genuinely needs a second relation (orphaned FK) is a
    // keyed anti-join counted into one row. Integer counts throughout —
    // exact cross-engine. At 100 TB the scan IS the validation; nothing
    // is collected and no rule adds a pass.
    "q_expectations" -> Q(
      fn = (s, d) => {
        val li = Tables(s, d, "lineitem")
        val scanRules = li.agg(
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("r_notnull_orderkey"),
          sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("r_quantity_range"),
          sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("r_price_positive"),
          sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("r_returnflag_domain"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("r_discount_range"),
          (count(lit(1)) - countDistinct(struct(liKey: _*))).as("r_row_unique"))
        val fkOrphans = li.join(Tables(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("r_fk_orders"))
        scanRules.crossJoin(broadcast(fkOrphans))
          .select(explode(array(
            Seq("r_notnull_orderkey", "r_quantity_range", "r_price_positive",
              "r_returnflag_domain", "r_discount_range", "r_row_unique",
              "r_fk_orders").map(r =>
              struct(lit(r).as("rule"), col(r).as("violations"))): _*)).as("e"))
          .select(col("e.rule").as("rule"), col("e.violations").as("violations"),
            (col("e.violations") === 0L).as("pass"))
          .orderBy("rule")
      },
      oracle = Some(s"""
        WITH scan AS (
          SELECT
            SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS r_notnull_orderkey,
            SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS r_quantity_range,
            SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS r_price_positive,
            SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS r_returnflag_domain,
            SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS r_discount_range,
            COUNT(*) - COUNT(DISTINCT ($liKeySql)) AS r_row_unique
          FROM lineitem),
        fk AS (
          SELECT COUNT(*) AS r_fk_orders FROM lineitem
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
        rules AS (
          SELECT 'r_notnull_orderkey' AS rule, r_notnull_orderkey AS violations FROM scan
          UNION ALL SELECT 'r_quantity_range', r_quantity_range FROM scan
          UNION ALL SELECT 'r_price_positive', r_price_positive FROM scan
          UNION ALL SELECT 'r_returnflag_domain', r_returnflag_domain FROM scan
          UNION ALL SELECT 'r_discount_range', r_discount_range FROM scan
          UNION ALL SELECT 'r_row_unique', r_row_unique FROM scan
          UNION ALL SELECT 'r_fk_orders', r_fk_orders FROM fk)
        SELECT rule, CAST(violations AS BIGINT) AS violations,
               violations = 0 AS pass
        FROM rules ORDER BY rule""")),

    // TPC-H Q1 (pricing summary report): the canonical full-scan aggregate.
    // One pass over the fact, six-wide aggregate state per (flag, status) —
    // at most a handful of groups, so map-side partial aggregation absorbs
    // essentially all input before the (tiny) shuffle. Money stays DECIMAL
    // end to end; the scale-6 charge sum (three chained scale-2 products)
    // exceeds dec4's exactness envelope at sf10+, so it is emitted as the
    // exact decimal string rather than a lossy double.
    "q_tpch_q1" -> Q(
      fn = (s, d) =>
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dec4(sum(dec2(col("l_quantity")))).as("sum_qty"),
            dec4(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
            dec4(sum(revenue)).as("sum_disc_price"),
            sum(revenue * (lit(1).cast(Dec12) + dec2(col("l_tax"))))
              .cast(StringType).as("sum_charge"),
            r4(avg(dec2(col("l_quantity")))).as("avg_qty"),
            r4(avg(dec2(col("l_extendedprice")))).as("avg_price"),
            r4(avg(dec2(col("l_discount")))).as("avg_disc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM($revenueSql) AS DOUBLE) AS sum_disc_price,
               CAST(SUM($revenueSql *
                 (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS sum_charge,
               CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(12,2))), 4) AS DOUBLE) AS avg_qty,
               CAST(ROUND(AVG(CAST(l_extendedprice AS DECIMAL(12,2))), 4) AS DOUBLE) AS avg_price,
               CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(12,2))), 4) AS DOUBLE) AS avg_disc,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // TPC-H Q6 (forecasting revenue change): the selective scan-only
    // aggregate. Every predicate (date range, discount band, quantity cap)
    // pushes into the parquet scan — at 100 TB this query IS its row-group
    // pruning; no join, no wide state, a single 1-row reduction.
    "q_tpch_q6" -> Q(
      fn = (s, d) =>
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
                  col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
                  dec2(col("l_discount")).between(
                    lit(0.05).cast(Dec12), lit(0.07).cast(Dec12)) &&
                  col("l_quantity") < 24)
          .agg(dec4(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))))
            .as("revenue")),
      oracle = Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND CAST(l_discount AS DECIMAL(12,2))
                BETWEEN CAST(0.05 AS DECIMAL(12,2)) AND CAST(0.07 AS DECIMAL(12,2))
          AND l_quantity < 24""")),

    // TPC-H Q18 (large-volume customers): group-filter-join. The fact
    // pre-aggregates per order FIRST (map-side partials over the bounded
    // per-order state), the >300 filter then shrinks it to a sliver, and
    // AQE broadcasts that sliver into the orders/customer joins — the
    // orders table is never shuffled against the raw fact. Top-100 is a
    // TakeOrderedAndProject.
    "q_tpch_q18" -> Q(
      fn = (s, d) => {
        val big = Tables(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(dec4(sum(dec2(col("l_quantity")))).as("total_qty"))
          .filter(col("total_qty") > 300)
        Tables(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), dec4(dec2(col("o_totalprice"))).as("o_totalprice"),
            col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey").asc)
          .limit(100)
      },
      oracle = Some("""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
               total_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 100""")),

    // TPC-H Q14 (promotion effect): promo share of one month's revenue.
    // Date filter pushes into the fact scan, `part` broadcasts, one 1-row
    // conditional aggregate — both sums exact decimal, ONE emitted
    // division. (Corpus p_type domain is exact labels, so the predicate is
    // equality rather than TPC-H's LIKE 'PROMO%'.)
    "q_tpch_q14" -> Q(
      fn = (s, d) =>
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
                  col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
          .join(broadcast(Tables(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .agg(r4(lit(100.0) *
            dec4(sum(when(col("p_type") === "PROMO", revenue)
              .otherwise(lit(0).cast(Dec12)))) /
            dec4(sum(revenue))).as("promo_revenue_pct")),
      oracle = Some(s"""
        SELECT CAST(ROUND(100.0 *
                 CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
                 CAST(SUM($revenueSql) AS DOUBLE), 4) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'""")),

    // TPC-H Q16 (parts/supplier relationship): distinct suppliers able to
    // supply qualifying parts per (brand, type, size) — lineitem stands in
    // for partsupp as the part↔supplier relation (the corpus has no
    // partsupp table). The complaint-supplier exclusion is a NOT IN
    // against a deterministic key class, compiled to a null-safe anti
    // join; `part` broadcasts into the fact, the countDistinct shuffles
    // once on the bounded (brand, type, size) grid.
    "q_tpch_q16" -> Q(
      fn = (s, d) => {
        val excluded = Tables(s, d, "supplier")
          .filter(col("s_suppkey") % 7 === 0).select(col("s_suppkey"))
        Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 15, 23))
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
            col("p_type").asc, col("p_size").asc)
      },
      oracle = Some("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 15, 23)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_suppkey % 7 = 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""")),

    // TPC-H Q19 (discounted revenue, disjunctive predicates): three
    // brand/size/quantity conjunction arms OR'd together — the classic
    // disjunctive-pushdown shape: each arm's part predicate prunes the
    // broadcast build side and the residual OR evaluates stream-side in
    // one pass; no union-of-three-scans rewrite.
    "q_tpch_q19" -> Q(
      fn = (s, d) => {
        val arm1 = col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
        val arm2 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
        val arm3 = col("p_brand") === "Brand#34" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
        Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .filter(arm1 || arm2 || arm3)
          .agg(dec4(sum(revenue)).as("revenue"))
      },
      oracle = Some(s"""
        SELECT CAST(SUM($revenueSql) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)""")),

    // Largest-remainder proportional allocation: distribute each order's
    // total (in exact cents) across its line items proportional to
    // quantity, with the rounding leftover going one cent at a time to the
    // largest fractional remainders — the classic finance-ETL primitive
    // (tax/ship/discount spreading) where the per-order cent sum MUST
    // reconcile exactly. Everything is BIGINT arithmetic: base share is
    // integer `div`, the remainder rank is `mod`, so the allocation is
    // bit-identical cross-engine with no floating point anywhere.
    //
    // Scale shape: one hash exchange on l_orderkey shared by the
    // orders join and every window (all are order-partitioned); per-order
    // work is bounded by lines-per-order, never corpus-sized. Ties in the
    // remainder rank break on the Q.liKey suffix (the verified-unique
    // lineitem ordering), so row_number is deterministic.
    "q_allocation" -> Q(
      fn = (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_shipdate"),
            col("l_quantity").cast(LongType).as("qn"))
        val ord = Tables(s, d, "orders")
          .select(col("o_orderkey"),
            (dec2(col("o_totalprice")) * 100).cast(LongType).as("t_cents"))
        val part = Window.partitionBy("l_orderkey")
        val rankW = Window.partitionBy("l_orderkey")
          .orderBy(col("rem").desc, col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_shipdate"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .withColumn("q_tot", sum(col("qn")).over(part))
          .withColumn("base", expr("t_cents * qn div q_tot"))
          .withColumn("rem", expr("(t_cents * qn) % q_tot"))
          .withColumn("leftover", col("t_cents") - sum(col("base")).over(part))
          .withColumn("rn", row_number().over(rankW))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_shipdate"),
            (col("base") +
              when(col("rn") <= col("leftover"), 1L).otherwise(0L))
              .as("alloc_cents"))
          .orderBy(liKey: _*)
      },
      oracle = Some(s"""
        WITH li AS (
          SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                 l_extendedprice, l_shipdate,
                 CAST(l_quantity AS BIGINT) AS qn
          FROM lineitem),
        o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS t_cents
          FROM orders),
        w AS (
          SELECT li.*, t_cents,
                 SUM(qn) OVER (PARTITION BY l_orderkey) AS q_tot
          FROM li JOIN o ON l_orderkey = o_orderkey),
        b AS (
          SELECT *,
                 (t_cents * qn) // q_tot AS base,
                 (t_cents * qn) % q_tot AS rem
          FROM w),
        r AS (
          SELECT *,
                 t_cents - SUM(base) OVER (PARTITION BY l_orderkey)
                   AS leftover,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                   ORDER BY rem DESC, l_linenumber, l_partkey, l_suppkey,
                            l_quantity, l_extendedprice, l_shipdate) AS rn
          FROM b)
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
               l_extendedprice, l_shipdate,
               CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_cents
        FROM r
        ORDER BY $liKeySql""")))
}

package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experiment-analysis and robust-inference operators: Spearman rank
  * correlation, linear gap interpolation, the Brown–Forsythe (median
  * Levene) variance-homogeneity test, and a difference-in-differences
  * estimator. These complete the decision-science family in
  * [[Science]]/[[Insights]]: q_anova assumes equal group variances —
  * q_levene is the gate that checks that assumption; q_agg_corr is
  * Pearson — q_spearman is its rank (monotone, outlier-robust) sibling;
  * q_resample_gapfill carries the last value forward — q_interpolate
  * fills gaps on the line between the surrounding observations; q_ab_test
  * compares arms at one point in time — q_did nets out the pre-period
  * difference between arms.
  *
  * The reference (jiazhi110/Top-produce-ETL) declares one config-driven
  * group-and-rank pipeline (`config/config_dev.yaml:10-13`); this module
  * is part of the §2.6 extension surface. Determinism contract per
  * Q.scala: exact integer/decimal sufficient statistics, single-expression
  * double formulas on top of them, r4 on every emitted double, total-order
  * final sorts.
  */
object Inference {

  private val Dec38 = DecimalType(38, 0)
  private def dbl(c: String) = col(c).cast(DoubleType)

  val qs: Map[String, Q] = Map(

    // Spearman rank correlation of quantity vs price per return flag —
    // Pearson (q_agg_corr) on AVERAGE ranks, the standard tie-corrected
    // Spearman. Doubled average ranks (2·rank + ties − 1) keep every rank
    // an exact INTEGER (a tie group at competition rank r with t members
    // occupies r..r+t-1, mean r + (t-1)/2), and rho is scale-invariant, so
    // doubling changes nothing. Sufficient statistics sum as DECIMAL(38,0)
    // (rank² ~ n² overflows BIGINT around n = 3e9 — a 100-TB fact table
    // crosses that; decimal partials stay exact to 1e38) and the closed
    // form runs in doubles on the k-row group relation.
    //
    // Scale shape: ONE corpus exchange. Both rank windows and both
    // tie-count windows partition by a key set containing l_returnflag, so
    // HashPartitioning(l_returnflag) satisfies all four; Spark plans one
    // exchange + two sorts, and the final groupBy(l_returnflag) reuses the
    // same partitioning with no further shuffle (asserted in
    // InferenceSpec).
    "q_spearman" -> Q(
      fn = (s, d) => {
        val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        val wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        val tq = Window.partitionBy("l_returnflag", "l_quantity")
        val tp = Window.partitionBy("l_returnflag", "l_extendedprice")
        val ranked = Tables(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"))
          .withColumn("rx",
            (rank().over(wq).cast(LongType) * 2 +
              count(lit(1)).over(tq) - 1).cast(Dec38))
          .withColumn("ry",
            (rank().over(wp).cast(LongType) * 2 +
              count(lit(1)).over(tp) - 1).cast(Dec38))
        val g = ranked.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        g.select(col("l_returnflag"), col("n"),
            r4((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
              sqrt((dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")) *
                (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))))
              .as("rho"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH rk AS (
          SELECT l_returnflag,
                 rank() OVER (PARTITION BY l_returnflag
                              ORDER BY l_quantity) * 2
                   + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
                   - 1 AS rx,
                 rank() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) * 2
                   + COUNT(*) OVER (PARTITION BY l_returnflag,
                                    l_extendedprice) - 1 AS ry
          FROM lineitem),
        g AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
                 SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
          FROM rk GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               CAST(ROUND(
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 4) AS DOUBLE) AS rho
        FROM g ORDER BY l_returnflag""")),

    // Linear interpolation of the gaps in each user's daily purchase-spend
    // series — the on-the-line complement of q_resample_gapfill's LOCF.
    // For each pair of consecutive purchase days (d, value) → (nd, nvalue)
    // with nd > d+1, every missing day g in between gets
    // value + (nvalue − value)·(g − d)/(nd − d). Endpoints are exact cent
    // longs (value carries 2dp; DECIMAL(12,2)·100 is exact), and the
    // interpolated value is a RATIONAL with denominator 100·(nd−d) — so
    // the 4dp rounding happens in exact integer arithmetic
    // (⌊(num·2·10⁴ + den)/(2·den)⌋ = round-half-up), never through the
    // engines' ROUND-on-double (whose half-way behavior diverges; a
    // .xxxx5 case flipped 72.2412 vs 72.2413 in testing).
    //
    // Scale shape: one exchange. The corpus is repartitioned by user_id
    // up front, so the (user, day) rollup (HashPartitioning(user) satisfies
    // the agg's ClusteredDistribution(user, dayno)) and the lead() window
    // both run on it without further shuffle; gap expansion is a map-side
    // explode bounded by the calendar, not the corpus (asserted in
    // InferenceSpec).
    "q_interpolate" -> Q(
      fn = (s, d) => {
        val epoch = lit("1970-01-01").cast(DateType)
        val daily = Tables(s, d, "events")
          .filter(col("event_type") === "purchase")
          .repartition(col("user_id"))
          .groupBy(col("user_id"),
            datediff(to_date(col("ts")), epoch).as("dayno"))
          .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
        val w = Window.partitionBy("user_id").orderBy("dayno")
        val gaps = daily
          .withColumn("nd", lead(col("dayno"), 1).over(w))
          .withColumn("nc", lead(col("cents"), 1).over(w))
          .filter(col("nd") > col("dayno") + 1)
        gaps
          .select(col("user_id"), col("dayno"), col("cents"), col("nd"),
            col("nc"),
            explode(sequence(col("dayno") + 1, col("nd") - 1)).as("g"))
          .withColumn("num",
            col("cents") * (col("nd") - col("g")) +
              col("nc") * (col("g") - col("dayno")))
          .withColumn("den", (col("nd") - col("dayno")).cast(LongType) * 100)
          .select(col("user_id"),
            date_add(epoch, col("g")).as("day"),
            (expr("(num * 20000 + den) div (2 * den)").cast(DoubleType) /
              10000.0).as("value_interp"))
          .orderBy("user_id", "day")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS dayno,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        gaps AS (
          SELECT *,
                 lead(dayno) OVER (PARTITION BY user_id ORDER BY dayno)
                   AS nd,
                 lead(cents) OVER (PARTITION BY user_id ORDER BY dayno)
                   AS nc
          FROM daily),
        x AS (
          SELECT user_id, dayno, cents, nd, nc,
                 unnest(range(dayno + 1, nd)) AS g
          FROM gaps WHERE nd > dayno + 1),
        y AS (
          SELECT user_id, g,
                 cents * (nd - g) + nc * (g - dayno) AS num,
                 (nd - dayno) * 100 AS den
          FROM x)
        SELECT user_id, DATE '1970-01-01' + CAST(g AS INTEGER) AS day,
               CAST((num * 20000 + den) // (2 * den) AS DOUBLE) / 10000.0
                 AS value_interp
        FROM y ORDER BY user_id, day""")),

    // Brown–Forsythe test (Levene with median centers): are the
    // event-type groups' value spreads equal? This is the robustness gate
    // in front of q_anova — the F-test there assumes homoscedasticity;
    // Brown–Forsythe checks it without assuming normality (median centers
    // keep the test honest under skew, per Brown & Forsythe 1974). The
    // statistic is one-way ANOVA's F applied to z = |x − median(group)|.
    //
    // Determinism: values quantize to exact cent longs; the group median
    // of integers interpolates to at worst a half-integer, so 2·median is
    // an exact long and z2 = |2·cents − 2·median| is exact. Sufficient
    // statistics (n, Σz2, Σz2²) sum as DECIMAL(38,0) (z2² ~ 1e10 per row:
    // a BIGINT sum saturates near 1e9 rows — decimal partials do not);
    // the F formula runs in doubles on the k-row relation.
    //
    // Scale shape: two corpus passes (the q_winsorize convention) — pass 1
    // computes k medians (hash agg; at 100 TB swap exact percentile for
    // approx_percentile, same plan), broadcast back; pass 2 is one
    // map-side-combined hash agg of exact partials. Grand totals via a
    // window over the k-row relation, never a corpus re-scan.
    "q_levene" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .select(col("event_type"),
            (dec2(col("value")) * 100).cast(LongType).as("cents"))
        val med = ev.groupBy("event_type")
          .agg((expr("percentile(cents, 0.5)") * 2).cast(LongType).as("m2"))
        val g = ev.join(broadcast(med), "event_type")
          .select(col("event_type"),
            abs(col("cents") * 2 - col("m2")).as("z2"))
          .groupBy("event_type").agg(
            count(lit(1)).as("n"),
            sum(col("z2").cast(Dec38)).as("s"),
            sum((col("z2") * col("z2")).cast(Dec38)).as("ss"))
        val wTot = Window.orderBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        g.withColumn("k", count(lit(1)).over(wTot))
          .withColumn("nn", sum(col("n")).over(wTot))
          .withColumn("st", sum(col("s")).over(wTot))
          .agg(
            first(col("k")).as("k"),
            first(col("nn")).cast(LongType).as("n"),
            sum(dbl("n") *
              pow(dbl("s") / dbl("n") - dbl("st") / dbl("nn"), 2))
              .as("ssb"),
            sum(dbl("ss") - dbl("s") * dbl("s") / dbl("n")).as("ssw"))
          .select(col("k"), col("n"),
            r4((col("ssb") / (col("k") - 1)) /
              (col("ssw") / (col("n") - col("k")))).as("w_stat"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        med AS (
          SELECT event_type,
                 CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS m2
          FROM ev GROUP BY event_type),
        g AS (
          SELECT ev.event_type, COUNT(*) AS n,
                 SUM(ABS(cents * 2 - m2)) AS s,
                 SUM(ABS(cents * 2 - m2) * ABS(cents * 2 - m2)) AS ss
          FROM ev JOIN med USING (event_type)
          GROUP BY ev.event_type),
        w AS (
          SELECT *, COUNT(*) OVER () AS k, SUM(n) OVER () AS nn,
                 SUM(s) OVER () AS st
          FROM g),
        f AS (
          SELECT MIN(k) AS k, CAST(MIN(nn) AS BIGINT) AS n,
                 SUM(CAST(n AS DOUBLE) *
                   POW(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(st AS DOUBLE) / CAST(nn AS DOUBLE), 2)) AS ssb,
                 SUM(CAST(ss AS DOUBLE) -
                   CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) AS ssw
          FROM w)
        SELECT k, n,
               CAST(ROUND((ssb / (k - 1)) / (ssw / (n - k)), 4) AS DOUBLE)
                 AS w_stat
        FROM f""")),

    // Difference-in-differences on purchase value: treatment arm = even
    // user_id (the q_ab_test split), launch = 2024-01-16, estimator =
    // (treat_post − treat_pre) − (ctrl_post − ctrl_pre). Nets out both
    // the standing difference between arms and the common time trend —
    // the causal companion to q_ab_test's point-in-time comparison.
    //
    // Determinism: cell sums are exact cent DECIMAL(38,0) partials; each
    // mean is one division; DID recombines four r4-independent means in
    // one double expression. Scale shape: ONE map-side-combined
    // conditional aggregation over the corpus — four cells, zero joins,
    // the exchange carries 8 partial columns per task.
    "q_did" -> Q(
      fn = (s, d) => {
        val launch = lit("2024-01-16").cast(TimestampType)
        val ev = Tables(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).as("treat"),
            (col("ts") >= launch).as("post"),
            (dec2(col("value")) * 100).cast(Dec38).as("cents"))
        def cell(t: Boolean, p: Boolean, a: String) = Seq(
          count(when(col("treat") === t && col("post") === p, 1))
            .as(s"n_$a"),
          (sum(when(col("treat") === t && col("post") === p,
            col("cents"))).cast(DoubleType) /
            (count(when(col("treat") === t && col("post") === p, 1)) * 100)
              .cast(DoubleType)).as(s"mean_$a"))
        val cells =
          cell(true, false, "treat_pre") ++ cell(true, true, "treat_post") ++
          cell(false, false, "ctrl_pre") ++ cell(false, true, "ctrl_post")
        ev.agg(cells.head, cells.tail: _*)
          .select(col("n_treat_pre"), col("n_treat_post"),
            col("n_ctrl_pre"), col("n_ctrl_post"),
            r4(col("mean_treat_pre")).as("mean_treat_pre"),
            r4(col("mean_treat_post")).as("mean_treat_post"),
            r4(col("mean_ctrl_pre")).as("mean_ctrl_pre"),
            r4(col("mean_ctrl_post")).as("mean_ctrl_post"),
            r4((col("mean_treat_post") - col("mean_treat_pre")) -
              (col("mean_ctrl_post") - col("mean_ctrl_pre"))).as("did"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id % 2 = 0 AS treat,
                 ts >= TIMESTAMP '2024-01-16' AS post,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT
            COUNT(*) FILTER (treat AND NOT post) AS n_treat_pre,
            COUNT(*) FILTER (treat AND post) AS n_treat_post,
            COUNT(*) FILTER (NOT treat AND NOT post) AS n_ctrl_pre,
            COUNT(*) FILTER (NOT treat AND post) AS n_ctrl_post,
            CAST(SUM(cents) FILTER (treat AND NOT post) AS DOUBLE)
              / CAST(COUNT(*) FILTER (treat AND NOT post) * 100 AS DOUBLE)
              AS mean_treat_pre,
            CAST(SUM(cents) FILTER (treat AND post) AS DOUBLE)
              / CAST(COUNT(*) FILTER (treat AND post) * 100 AS DOUBLE)
              AS mean_treat_post,
            CAST(SUM(cents) FILTER (NOT treat AND NOT post) AS DOUBLE)
              / CAST(COUNT(*) FILTER (NOT treat AND NOT post) * 100
                AS DOUBLE) AS mean_ctrl_pre,
            CAST(SUM(cents) FILTER (NOT treat AND post) AS DOUBLE)
              / CAST(COUNT(*) FILTER (NOT treat AND post) * 100 AS DOUBLE)
              AS mean_ctrl_post
          FROM ev)
        SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
               CAST(ROUND(mean_treat_pre, 4) AS DOUBLE) AS mean_treat_pre,
               CAST(ROUND(mean_treat_post, 4) AS DOUBLE) AS mean_treat_post,
               CAST(ROUND(mean_ctrl_pre, 4) AS DOUBLE) AS mean_ctrl_pre,
               CAST(ROUND(mean_ctrl_post, 4) AS DOUBLE) AS mean_ctrl_post,
               CAST(ROUND((mean_treat_post - mean_treat_pre) -
                 (mean_ctrl_post - mean_ctrl_pre), 4) AS DOUBLE) AS did
        FROM c""")),

    // CUPED variance reduction (Deng et al. 2013): adjust each user's
    // post-period purchase spend by their PRE-period spend — the industry-
    // standard way to shrink A/B confidence intervals without more
    // traffic. θ = cov(x,y)/var(x) pooled over all users; the adjusted
    // arm mean needs NO per-user adjusted values:
    // mean(y − θ(x − x̄)) over an arm = ȳ_arm − θ(x̄_arm − x̄), so
    // everything derives from exact per-arm sufficient statistics.
    //
    // Determinism: per-user x/y are exact cent longs; arm sums are
    // DECIMAL(38,0) (cents² crosses BIGINT range once a user's spend
    // passes ~2^31.5 cents); θ and the means are single-expression
    // doubles over those exact sums. Scale shape: ONE corpus exchange
    // (the user rollup); the arm rollup and the 2-row window totals are
    // user-relation-sized, then constant-sized.
    "q_cuped" -> Q(
      fn = (s, d) => {
        val launch = lit("2024-01-16").cast(TimestampType)
        val users = Tables(s, d, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < launch,
              (dec2(col("value")) * 100).cast(LongType)).otherwise(0L))
              .as("x"),
            sum(when(col("ts") >= launch,
              (dec2(col("value")) * 100).cast(LongType)).otherwise(0L))
              .as("y"))
          .withColumn("treat", col("user_id") % 2 === 0)
        val arms = users.groupBy("treat").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(Dec38)).as("sx"),
          sum(col("y").cast(Dec38)).as("sy"),
          sum(col("x").cast(Dec38) * col("y").cast(Dec38)).as("sxy"),
          sum(col("x").cast(Dec38) * col("x").cast(Dec38)).as("sxx"))
        val wT = Window.orderBy("treat")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val theta =
          (dbl("gn") * dbl("gsxy") - dbl("gsx") * dbl("gsy")) /
            (dbl("gn") * dbl("gsxx") - dbl("gsx") * dbl("gsx"))
        arms
          .withColumn("gn", sum(col("n")).over(wT))
          .withColumn("gsx", sum(col("sx")).over(wT))
          .withColumn("gsy", sum(col("sy")).over(wT))
          .withColumn("gsxy", sum(col("sxy")).over(wT))
          .withColumn("gsxx", sum(col("sxx")).over(wT))
          .select(col("treat"), col("n").as("n_users"),
            r4(dbl("sy") / dbl("n") / 100.0).as("mean_y"),
            r4((dbl("sy") / dbl("n") - theta *
              (dbl("sx") / dbl("n") - dbl("gsx") / dbl("gn"))) / 100.0)
              .as("mean_y_cuped"),
            r4(theta).as("theta"))
          .orderBy("treat")
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id,
                 SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                   THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS x,
                 SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                   THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS y,
                 user_id % 2 = 0 AS treat
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        arms AS (
          SELECT treat, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM u GROUP BY treat),
        g AS (
          SELECT *, SUM(n) OVER () AS gn, SUM(sx) OVER () AS gsx,
                 SUM(sy) OVER () AS gsy, SUM(sxy) OVER () AS gsxy,
                 SUM(sxx) OVER () AS gsxx
          FROM arms),
        f AS (
          SELECT treat, n,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                 CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS gmx,
                 (CAST(gn AS DOUBLE) * CAST(gsxy AS DOUBLE)
                    - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)) /
                 (CAST(gn AS DOUBLE) * CAST(gsxx AS DOUBLE)
                    - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)) AS theta
          FROM g)
        SELECT treat, n AS n_users,
               CAST(ROUND(my / 100.0, 4) AS DOUBLE) AS mean_y,
               CAST(ROUND((my - theta * (mx - gmx)) / 100.0, 4) AS DOUBLE)
                 AS mean_y_cuped,
               CAST(ROUND(theta, 4) AS DOUBLE) AS theta
        FROM f ORDER BY treat""")),

    // Sample-ratio-mismatch guardrail: before reading ANY experiment
    // result, check the arms actually split 50/50 — a biased assignment
    // invalidates q_ab_test/q_did/q_cuped wholesale. One-dof chi-square
    // against the expected even split, per event type (a per-surface SRM
    // localizes where the assignment broke): (n_a − n_b)²/(n_a + n_b),
    // flagged at the α=0.05 critical value 3.8415.
    //
    // Determinism: distinct-user counts are exact; chi² is one double
    // expression over two exact longs. Scale shape: one distinct-expand
    // aggregation (two-phase countDistinct — partials combine map-side);
    // the exchange carries (type, user) pairs once, never raw events.
    "q_srm" -> Q(
      fn = (s, d) => {
        val chi2 =
          pow((col("n_a") - col("n_b")).cast(DoubleType), 2) /
            (col("n_a") + col("n_b")).cast(DoubleType)
        Tables(s, d, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(when(col("user_id") % 2 === 0, col("user_id")))
              .as("n_a"),
            countDistinct(when(col("user_id") % 2 =!= 0, col("user_id")))
              .as("n_b"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            r4(chi2).as("chi2"), (chi2 > 3.8415).as("srm"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH g AS (
          SELECT event_type,
                 COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
                   AS n_a,
                 COUNT(DISTINCT CASE WHEN user_id % 2 <> 0 THEN user_id END)
                   AS n_b
          FROM events GROUP BY event_type)
        SELECT event_type, n_a, n_b,
               CAST(ROUND(POW(CAST(n_a - n_b AS DOUBLE), 2) /
                 CAST(n_a + n_b AS DOUBLE), 4) AS DOUBLE) AS chi2,
               POW(CAST(n_a - n_b AS DOUBLE), 2) /
                 CAST(n_a + n_b AS DOUBLE) > 3.8415 AS srm
        FROM g ORDER BY event_type"""))
  )
}

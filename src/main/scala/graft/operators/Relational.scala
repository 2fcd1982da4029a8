package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Relational core, part 1 (SURVEY.md §2.2): scans, projection, filters,
  * null semantics, and the full join family. Everything is declared through
  * the DataFrame API so Catalyst handles pushdown/pruning/join selection;
  * the only hints used are `broadcast` on dimension tables (the correct call
  * at 100 TB too — dims stay small while the fact table scales).
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")

  val qs: Map[String, Q] = Map(

    "q_scan_parquet" -> Q(
      fn = (s, d) => li(s, d).orderBy(liKey: _*),
      oracle = Some(s"SELECT * FROM lineitem ORDER BY $liKeySql")),

    "q_project" -> Q(
      fn = (s, d) =>
        li(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          dec4(revenue).as("revenue"),
          (col("l_quantity") * col("l_extendedprice")).as("qty_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("qty_price")),
      oracle = Some(s"""
        SELECT l_orderkey, l_linenumber, CAST($revenueSql AS DOUBLE) AS revenue,
               l_quantity * l_extendedprice AS qty_price
        FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, qty_price""")),

    "q_filter" -> Q(
      fn = (s, d) =>
        li(s, d)
          .filter(
            col("l_quantity").between(10, 20) &&
            col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            (col("l_discount") > 0.05 || col("l_tax") < 0.03))
          .join(broadcast(Tables(s, d, "part").filter(col("p_name").like("%red%"))),
            col("l_partkey") === col("p_partkey"))
          .select("l_orderkey", "l_linenumber", "p_name", "l_quantity", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber", "p_name", "l_quantity", "l_shipdate"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, p_name, l_quantity, l_shipdate
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A','R')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND (l_discount > 0.05 OR l_tax < 0.03)
          AND p_name LIKE '%red%'
        ORDER BY l_orderkey, l_linenumber, p_name, l_quantity, l_shipdate""")),

    "q_filter_null" -> Q(
      fn = (s, d) =>
        ord(s, d)
          .withColumn("st", nullif(col("o_orderstatus"), lit("O")))
          .select(
            col("o_orderkey"), col("st"),
            coalesce(col("st"), lit("none")).as("st_or_none"),
            col("st").isNull.as("is_open"),
            (col("st") <=> lit("F")).as("is_f_nullsafe"))
          .filter(col("st").isNotNull || col("o_totalprice") > 100000)
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey, st, coalesce(st, 'none') AS st_or_none,
               st IS NULL AS is_open, st IS NOT DISTINCT FROM 'F' AS is_f_nullsafe
        FROM (SELECT o_orderkey, o_totalprice, nullif(o_orderstatus, 'O') AS st FROM orders)
        WHERE st IS NOT NULL OR o_totalprice > 100000
        ORDER BY o_orderkey""")),

    "q_join_inner" -> Q(
      fn = (s, d) =>
        li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
          .select("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
          .orderBy("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity"),
      oracle = Some("""
        SELECT o_orderkey, l_linenumber, o_orderstatus, l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ORDER BY o_orderkey, l_linenumber, o_orderstatus, l_quantity""")),

    "q_join_left" -> Q(
      fn = (s, d) =>
        ord(s, d).join(
            li(s, d).filter(col("l_quantity") > 45),
            col("o_orderkey") === col("l_orderkey"), "left")
          .select("o_orderkey", "l_linenumber", "l_quantity")
          .orderBy(col("o_orderkey").asc, col("l_linenumber").asc_nulls_first,
                   col("l_quantity").asc_nulls_first),
      oracle = Some("""
        SELECT o_orderkey, l_linenumber, l_quantity
        FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l
          ON o_orderkey = l_orderkey
        ORDER BY o_orderkey ASC, l_linenumber ASC NULLS FIRST, l_quantity ASC NULLS FIRST""")),

    "q_join_right" -> Q(
      fn = (s, d) =>
        li(s, d).filter(col("l_quantity") > 45)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"), "right")
          .select("o_orderkey", "l_linenumber", "l_quantity")
          .orderBy(col("o_orderkey").asc, col("l_linenumber").asc_nulls_first,
                   col("l_quantity").asc_nulls_first),
      oracle = Some("""
        SELECT o_orderkey, l_linenumber, l_quantity
        FROM (SELECT * FROM lineitem WHERE l_quantity > 45) l RIGHT JOIN orders
          ON l_orderkey = o_orderkey
        ORDER BY o_orderkey ASC, l_linenumber ASC NULLS FIRST, l_quantity ASC NULLS FIRST""")),

    "q_join_full" -> Q(
      fn = (s, d) => {
        val bigOrders = ord(s, d).filter(col("o_totalprice") > 200000)
          .select(col("o_custkey").as("k"), col("o_orderkey"))
        val richCust = cust(s, d).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("ck"), col("c_name"))
        bigOrders.join(richCust, col("k") === col("ck"), "full")
          .select(col("o_orderkey"), col("c_name"))
          .orderBy(col("o_orderkey").asc_nulls_first, col("c_name").asc_nulls_first)
      },
      oracle = Some("""
        SELECT o_orderkey, c_name
        FROM (SELECT o_custkey AS k, o_orderkey FROM orders WHERE o_totalprice > 200000) o
        FULL JOIN (SELECT c_custkey AS ck, c_name FROM customer WHERE c_acctbal > 5000) c
          ON k = ck
        ORDER BY o_orderkey ASC NULLS FIRST, c_name ASC NULLS FIRST""")),

    "q_join_semi" -> Q(
      fn = (s, d) =>
        ord(s, d).join(
            li(s, d).filter(col("l_quantity") > 48),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        ORDER BY o_orderkey""")),

    "q_join_anti" -> Q(
      fn = (s, d) =>
        cust(s, d).join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    "q_join_cross" -> Q(
      fn = (s, d) =>
        Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
          .select("r_name", "n_name")
          .orderBy("r_name", "n_name"),
      oracle = Some("""
        SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""")),

    "q_join_broadcast" -> Q(
      fn = (s, d) => {
        val dims = broadcast(
          Tables(s, d, "supplier")
            .join(Tables(s, d, "nation"), col("s_nationkey") === col("n_nationkey")))
        li(s, d).join(dims, col("l_suppkey") === col("s_suppkey"))
          .groupBy("n_name")
          .agg(dec4(sum(revenue)).as("revenue"), count(lit(1)).as("n"))
          .orderBy("n_name")
      },
      oracle = Some(s"""
        SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue, COUNT(*) AS n
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    "q_join_range" -> Q(
      fn = (s, d) =>
        li(s, d).join(ord(s, d),
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate").between(
              col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 90 DAYS")))
          .select("o_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
          .orderBy("o_orderkey", "l_linenumber", "l_shipdate"),
      oracle = Some("""
        SELECT o_orderkey, l_linenumber, l_shipdate, o_orderdate
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
        ORDER BY o_orderkey, l_linenumber, l_shipdate""")),

    // Null-safe equi join: <=> matches null keys to each other (standard
    // equi join drops them). Nulls derived via nullif on a low-cardinality
    // column; aggregated so the output is compact.
    "q_join_nullsafe" -> Q(
      fn = (s, d) => {
        val o1 = ord(s, d).select(nullif(col("o_orderstatus"), lit("P")).as("k"))
        val o2 = ord(s, d).select(nullif(col("o_orderstatus"), lit("P")).as("k2"))
          .groupBy("k2").agg(count(lit(1)).as("n2"))
        o1.join(o2, col("k") <=> col("k2"))
          .groupBy("k").agg(count(lit(1)).as("n"), max(col("n2")).as("n2"))
          .orderBy(col("k").asc_nulls_first)
      },
      oracle = Some("""
        WITH o1 AS (SELECT nullif(o_orderstatus, 'P') AS k FROM orders),
             o2 AS (SELECT nullif(o_orderstatus, 'P') AS k2, COUNT(*) AS n2
                    FROM orders GROUP BY 1)
        SELECT k, COUNT(*) AS n, MAX(n2) AS n2
        FROM o1 JOIN o2 ON k IS NOT DISTINCT FROM k2
        GROUP BY k ORDER BY k ASC NULLS FIRST""")),

    // Forward as-of: for each signup, the earliest purchase at or after it
    // (conversion-lag shape; min-id tie-break mirrors AsOf.joinForward).
    "q_join_asof_fwd" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
        val signups = ev.filter(col("event_type") === "signup")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"))
        AsOf.joinForward(
            signups, purchases,
            key = "user_id", leftTime = "ts", rightTime = "purchase_ts",
            rightTieBreak = "purchase_id")
          .select("event_id", "user_id", "ts", "purchase_ts", "purchase_id")
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH sg AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
                    FROM events WHERE event_type = 'signup'),
             p AS (SELECT event_id AS purchase_id, user_id,
                          date_trunc('milliseconds', ts) AS purchase_ts
                   FROM events WHERE event_type = 'purchase'),
             j AS (SELECT sg.event_id, sg.user_id, sg.ts, p.purchase_ts, p.purchase_id,
                          row_number() OVER (PARTITION BY sg.event_id
                                             ORDER BY p.purchase_ts ASC, p.purchase_id ASC) AS rn
                   FROM sg JOIN p ON sg.user_id = p.user_id AND p.purchase_ts >= sg.ts)
        SELECT event_id, user_id, ts, purchase_ts, purchase_id FROM j WHERE rn = 1
        UNION ALL
        SELECT sg.event_id, sg.user_id, sg.ts, NULL, NULL FROM sg
        WHERE NOT EXISTS (SELECT 1 FROM p
                          WHERE p.user_id = sg.user_id AND p.purchase_ts >= sg.ts)
        ORDER BY event_id""")),

    // Upsert/MERGE semantics via full outer join + coalesce (the Delta-less
    // formulation): updates overwrite, inserts append, unmatched targets
    // persist. One shuffle on the key; at scale the target side would be
    // bucketed on the key to make repeated merges exchange-free.
    "q_upsert" -> Q(
      fn = (s, d) => {
        val target = cust(s, d).select(col("c_custkey").as("k"),
          col("c_name"), col("c_acctbal"))
        val source = cust(s, d).filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("sk"),
            (col("c_acctbal") + 1000).as("new_bal"))
          .unionByName(
            cust(s, d).filter(col("c_custkey") % 11 === 0)
              .select((col("c_custkey") + 100000).as("sk"), lit(42.0).as("new_bal")))
        target.join(source, col("k") === col("sk"), "full")
          .select(
            coalesce(col("k"), col("sk")).as("key"),
            coalesce(col("c_name"), lit("<new>")).as("name"),
            coalesce(col("new_bal"), col("c_acctbal")).as("balance"),
            when(col("k").isNull, "insert")
              .when(col("sk").isNull, "unchanged")
              .otherwise("update").as("action"))
          .orderBy("key")
      },
      oracle = Some("""
        WITH target AS (SELECT c_custkey AS k, c_name, c_acctbal FROM customer),
             source AS (
               SELECT c_custkey AS sk, c_acctbal + 1000 AS new_bal
               FROM customer WHERE c_custkey % 7 = 0
               UNION ALL
               SELECT c_custkey + 100000 AS sk, 42.0 AS new_bal
               FROM customer WHERE c_custkey % 11 = 0)
        SELECT coalesce(k, sk) AS key,
               coalesce(c_name, '<new>') AS name,
               coalesce(new_bal, c_acctbal) AS balance,
               CASE WHEN k IS NULL THEN 'insert'
                    WHEN sk IS NULL THEN 'unchanged'
                    ELSE 'update' END AS action
        FROM target FULL JOIN source ON k = sk
        ORDER BY key""")),

    // SCD2 history build (the warehouse-ETL staple): per customer, each
    // order becomes a versioned row effective until the next order's date
    // (open-ended for the latest). lead() over (date, key-unique) — one
    // keyed window pass.
    "q_scd2" -> Q(
      fn = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("eff_from").asc, col("o_orderkey").asc)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate").as("eff_from"))
          .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
          .withColumn("is_current", col("eff_to").isNull)
          .orderBy("o_custkey", "eff_from", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderstatus,
               o_orderdate AS eff_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS eff_to,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) IS NULL AS is_current
        FROM orders
        ORDER BY o_custkey, eff_from, o_orderkey""")),

    // Nearest-neighbor as-of join (either direction, tie → backward) —
    // completes the as-of family (backward / forward / tolerance / this):
    // each purchase matches the click closest in time among the same
    // user's clicks. Composed from the two existing single-exchange as-of
    // passes (union + keyed window each) plus one equi-join of the two
    // 1-row-per-probe results — never a |left|x|right| candidate blowup.
    "q_join_asof_nearest" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events") // ts already ms-truncated NTZ
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        def clicks(tsName: String, idName: String) =
          ev.filter(col("event_type") === "click")
            .select(col("event_id").as(idName), col("user_id"),
              col("ts").as(tsName))
        val bwd = AsOf.joinBackward(purchases, clicks("ts_b", "id_b"),
            key = "user_id", leftTime = "ts", rightTime = "ts_b",
            rightTieBreak = "id_b")
          .select("event_id", "user_id", "ts", "ts_b", "id_b")
        val fwd = AsOf.joinForward(purchases, clicks("ts_f", "id_f"),
            key = "user_id", leftTime = "ts", rightTime = "ts_f",
            rightTieBreak = "id_f")
          .select(col("event_id").as("event_id_f"), col("ts_f"), col("id_f"))
        def ms(c: org.apache.spark.sql.Column) = unix_millis(c.cast(TimestampType))
        val useB = col("ts_b").isNotNull &&
          (col("ts_f").isNull ||
            (ms(col("ts")) - ms(col("ts_b"))) <= (ms(col("ts_f")) - ms(col("ts"))))
        bwd.join(fwd, col("event_id") === col("event_id_f"))
          .select(col("event_id"), col("user_id"), col("ts"),
            when(useB, col("ts_b")).otherwise(col("ts_f")).as("click_ts"),
            when(useB, col("id_b")).otherwise(col("id_f")).as("click_id"),
            when(col("ts_b").isNull && col("ts_f").isNull, lit(null).cast(StringType))
              .when(useB, lit("backward")).otherwise(lit("forward")).as("direction"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH p AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id,
                     date_trunc('milliseconds', ts) AS click_ts
              FROM events WHERE event_type = 'click'),
        j AS (SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_id,
                     CASE WHEN c.click_ts > p.ts THEN 'forward'
                          ELSE 'backward' END AS direction,
                     row_number() OVER (PARTITION BY p.event_id ORDER BY
                       abs(epoch_ms(p.ts) - epoch_ms(c.click_ts)) ASC,
                       CASE WHEN c.click_ts > p.ts THEN 1 ELSE 0 END ASC,
                       CASE WHEN c.click_ts > p.ts THEN c.click_id
                            ELSE -c.click_id END ASC) AS rn
              FROM p JOIN c ON p.user_id = c.user_id)
        SELECT event_id, user_id, ts, click_ts, click_id, direction
        FROM j WHERE rn = 1
        UNION ALL
        SELECT p.event_id, p.user_id, p.ts, NULL, NULL, NULL FROM p
        WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id)
        ORDER BY event_id""")),

    // Point-in-time (temporal) lookup against the SCD2 dimension — the
    // consumer side of q_scd2: each probe (key, ts) resolves to the ONE
    // version whose [eff_from, eff_to) validity interval contains ts.
    // Probes are the orders themselves shifted +1 day, so most resolve to
    // their own version but ties and short-lived versions genuinely cross
    // into successors. The join is an EQUI-join on the key with a residual
    // range predicate — a plain hash join at 100 TB (per-key version
    // chains are dimension-sized), never an unbounded interval join.
    "q_scd2_pit" -> Q(
      fn = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("eff_from").asc, col("o_orderkey").asc)
        val versions = Tables(s, d, "orders")
          .select(col("o_custkey").as("v_custkey"), col("o_orderkey").as("v_orderkey"),
            col("o_orderstatus").as("v_status"), col("o_orderdate").as("eff_from"))
          .withColumn("eff_to", lead(col("eff_from"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("v_custkey"))
              .orderBy(col("eff_from").asc, col("v_orderkey").asc)))
        val probes = Tables(s, d, "orders")
          .select(col("o_orderkey").as("probe_id"), col("o_custkey"),
            (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("pts"))
        probes.join(versions,
            col("o_custkey") === col("v_custkey") &&
            col("pts") >= col("eff_from") &&
            (col("eff_to").isNull || col("pts") < col("eff_to")))
          .select(col("probe_id"), col("o_custkey"), col("pts"),
            col("v_orderkey"), col("v_status"))
          .orderBy("probe_id")
      },
      oracle = Some("""
        WITH versions AS (
          SELECT o_custkey AS v_custkey, o_orderkey AS v_orderkey,
                 o_orderstatus AS v_status, o_orderdate AS eff_from,
                 lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS eff_to
          FROM orders),
        probes AS (
          SELECT o_orderkey AS probe_id, o_custkey,
                 o_orderdate + INTERVAL 1 DAY AS pts
          FROM orders)
        SELECT probe_id, o_custkey, pts, v_orderkey, v_status
        FROM probes JOIN versions
          ON o_custkey = v_custkey
         AND pts >= eff_from AND (eff_to IS NULL OR pts < eff_to)
        ORDER BY probe_id""")),

    // CDC changelog application — compact an ordered I/U/D change stream to
    // final state: last op per key wins, a trailing delete removes the key.
    // signup→I, purchase→U, error→D over the events stream. One keyed
    // window (row_number + count over the same partition spec = one
    // shuffle); at 100 TB this is the standard changelog-compaction plan —
    // no join against the snapshot until the compacted delta is tiny.
    "q_cdc_apply" -> Q(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ch = Tables(s, d, "events")
          .filter(col("event_type").isin("signup", "purchase", "error"))
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            when(col("event_type") === "signup", "I")
              .when(col("event_type") === "purchase", "U")
              .otherwise("D").as("op"))
        val byKey = Window.partitionBy("user_id")
        val latest = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        ch.withColumn("rn", row_number().over(latest))
          .withColumn("n_ops", count(lit(1)).over(byKey))
          .filter(col("rn") === 1 && col("op") =!= "D")
          .select(col("user_id"), col("op").as("last_op"),
            col("value").as("last_value"), col("n_ops"), col("ts").as("last_ts"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH ch AS (
          SELECT user_id, date_trunc('milliseconds', ts) AS ts, event_id, value,
                 CASE event_type WHEN 'signup' THEN 'I'
                      WHEN 'purchase' THEN 'U' ELSE 'D' END AS op
          FROM events
          WHERE event_type IN ('signup', 'purchase', 'error')),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_ops
          FROM ch)
        SELECT user_id, op AS last_op, value AS last_value, n_ops,
               ts AS last_ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY user_id""")),

    // Event funnel (behavioral analytics): per user, the earliest
    // view -> click -> purchase chain where each step follows the previous
    // in time; conversion depth = how far the user got. Conditional
    // min-aggregates — one hash agg, no self-joins.
    "q_funnel" -> Q(
      fn = (s, d) =>
        Tables(s, d, "events")
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            min(when(col("event_type") === "click", col("ts"))).as("t_click_any"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t_buy_any"))
          .select(
            col("user_id"), col("t_view"),
            when(col("t_click_any") > col("t_view"), col("t_click_any")).as("t_click"),
            col("t_buy_any"), col("t_click_any"))
          .withColumn("t_buy",
            when(col("t_buy_any") > col("t_click"), col("t_buy_any")))
          .withColumn("depth",
            when(col("t_buy").isNotNull, 3)
              .when(col("t_click").isNotNull, 2)
              .when(col("t_view").isNotNull, 1)
              .otherwise(0).cast(LongType))
          .select("user_id", "t_view", "t_click", "t_buy", "depth")
          .orderBy("user_id"),
      oracle = Some("""
        WITH agg AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_any
          FROM (SELECT user_id, event_type, date_trunc('milliseconds', ts) AS ts
                FROM events)
          GROUP BY user_id),
        step2 AS (
          SELECT user_id, t_view,
                 CASE WHEN t_click_any > t_view THEN t_click_any END AS t_click,
                 t_buy_any
          FROM agg),
        step3 AS (
          SELECT user_id, t_view, t_click,
                 CASE WHEN t_buy_any > t_click THEN t_buy_any END AS t_buy
          FROM step2)
        SELECT user_id, t_view, t_click, t_buy,
               CASE WHEN t_buy IS NOT NULL THEN 3
                    WHEN t_click IS NOT NULL THEN 2
                    WHEN t_view IS NOT NULL THEN 1
                    ELSE 0 END AS depth
        FROM step3 ORDER BY user_id""")),

    "q_join_asof" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events") // ts already ms-truncated NTZ
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("signup_ts"))
        AsOf.joinBackward(
            purchases, signups,
            key = "user_id", leftTime = "ts", rightTime = "signup_ts",
            rightTieBreak = "signup_id")
          .select("event_id", "user_id", "ts", "signup_ts", "signup_id")
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH p AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
                   FROM events WHERE event_type = 'purchase'),
             sg AS (SELECT event_id AS signup_id, user_id, date_trunc('milliseconds', ts) AS signup_ts
                    FROM events WHERE event_type = 'signup'),
             j AS (SELECT p.event_id, p.user_id, p.ts, sg.signup_ts, sg.signup_id,
                          row_number() OVER (PARTITION BY p.event_id
                                             ORDER BY sg.signup_ts DESC, sg.signup_id DESC) AS rn
                   FROM p JOIN sg ON p.user_id = sg.user_id AND sg.signup_ts <= p.ts)
        SELECT event_id, user_id, ts, signup_ts, signup_id FROM j WHERE rn = 1
        UNION ALL
        SELECT p.event_id, p.user_id, p.ts, NULL, NULL FROM p
        WHERE NOT EXISTS (SELECT 1 FROM sg
                          WHERE sg.user_id = p.user_id AND sg.signup_ts <= p.ts)
        ORDER BY event_id""")),

    // As-of with a tolerance bound (the pandas merge_asof `tolerance`
    // surface): a signup farther than 7 days before the purchase is no
    // match — the left row survives null-extended.
    "q_join_asof_tol" -> Q(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("signup_ts"))
        AsOf.joinBackward(
            purchases, signups,
            key = "user_id", leftTime = "ts", rightTime = "signup_ts",
            rightTieBreak = "signup_id", tolerance = Some("INTERVAL 7 DAYS"))
          .select("event_id", "user_id", "ts", "signup_ts", "signup_id")
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH p AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
                   FROM events WHERE event_type = 'purchase'),
             sg AS (SELECT event_id AS signup_id, user_id, date_trunc('milliseconds', ts) AS signup_ts
                    FROM events WHERE event_type = 'signup'),
             j AS (SELECT p.event_id, p.user_id, p.ts, sg.signup_ts, sg.signup_id,
                          row_number() OVER (PARTITION BY p.event_id
                                             ORDER BY sg.signup_ts DESC, sg.signup_id DESC) AS rn
                   FROM p JOIN sg ON p.user_id = sg.user_id
                          AND sg.signup_ts <= p.ts
                          AND sg.signup_ts >= p.ts - INTERVAL 7 DAY)
        SELECT event_id, user_id, ts, signup_ts, signup_id FROM j WHERE rn = 1
        UNION ALL
        SELECT p.event_id, p.user_id, p.ts, NULL, NULL FROM p
        WHERE NOT EXISTS (SELECT 1 FROM sg
                          WHERE sg.user_id = p.user_id AND sg.signup_ts <= p.ts
                            AND sg.signup_ts >= p.ts - INTERVAL 7 DAY)
        ORDER BY event_id""")),

    // Blocked fuzzy join (entity resolution): match deterministically
    // noised supplier names (3rd char deleted from odd-key names) back to
    // the clean registry at edit distance <= 1. The equality BLOCK on
    // (first char, name length bucket) turns the quadratic all-pairs
    // levenshtein into a keyed hash join whose per-bucket work is bounded
    // — the same blocked-candidate shape as the MinHash dedup family, at
    // record-linkage granularity. levenshtein semantics agree exactly
    // across engines.
    "q_join_fuzzy" -> Q(
      fn = (s, d) => {
        Tables.registerViews(s, d)
        s.sql(fuzzyJoinSql)
      },
      oracle = Some(fuzzyJoinSql)))

  /** Shared Spark/DuckDB SQL for q_join_fuzzy (identical text). */
  private lazy val fuzzyJoinSql: String = """
    WITH noisy AS (
      SELECT s_suppkey AS n_key,
             substr(s_name, 1, 2) || substr(s_name, 4) AS n_name
      FROM supplier WHERE s_suppkey % 2 = 1),
    clean AS (SELECT s_suppkey, s_name FROM supplier)
    SELECT n.n_key, n.n_name, c.s_suppkey, c.s_name
    FROM noisy n JOIN clean c
      ON substr(n.n_name, 1, 1) = substr(c.s_name, 1, 1)
     AND length(c.s_name) - length(n.n_name) = 1
     AND levenshtein(n.n_name, c.s_name) <= 1
    ORDER BY n.n_key, c.s_suppkey"""
}

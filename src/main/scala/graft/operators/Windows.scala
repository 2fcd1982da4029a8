package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Window-function family (SURVEY.md §2.2).
  *
  * (l_orderkey, l_linenumber) is NOT unique in the corpus, so every
  * order-sensitive window (row_number / ntile / lag / lead / running
  * frames) orders by the full unique chain `Q.liKeyCols` — identically in
  * Spark and in the DuckDB oracle — or results are stable-sort luck.
  * `rank`/`dense_rank`/`percent_rank` are additionally exercised on an
  * order WITH ties (that is their point); they are deterministic under ties.
  */
object Windows {

  // Total order within a l_returnflag partition, leading with l_quantity.
  private val qtyChain = Seq(
    "l_quantity", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_extendedprice", "l_shipdate")
  // Total order leading with ship date (for time-ordered windows).
  private val dateChain = Seq(
    "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice")
  private def cols(names: Seq[String]) = names.map(col)
  private def sqlOf(names: Seq[String]) = names.mkString(", ")

  val qs: Map[String, Q] = Map(

    "q_window_rank" -> Q(
      fn = (s, d) => {
        val tied = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").asc)
        val total = Window.partitionBy(col("l_returnflag")).orderBy(cols(qtyChain): _*)
        Tables(s, d, "lineitem")
          .withColumn("rnk", rank().over(tied).cast(LongType))
          .withColumn("drnk", dense_rank().over(tied).cast(LongType))
          .withColumn("prnk", r4(percent_rank().over(tied)))
          .withColumn("rn", row_number().over(total).cast(LongType))
          .withColumn("quartile", ntile(4).over(total).cast(LongType))
          .orderBy(col("l_returnflag") +: cols(qtyChain): _*)
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
            "rnk", "drnk", "prnk", "rn", "quartile")
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               rank() OVER tied AS rnk,
               dense_rank() OVER tied AS drnk,
               CAST(ROUND(percent_rank() OVER tied, 4) AS DOUBLE) AS prnk,
               row_number() OVER total AS rn,
               CAST(ntile(4) OVER total AS BIGINT) AS quartile
        FROM lineitem
        WINDOW tied AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC),
               total AS (PARTITION BY l_returnflag ORDER BY ${sqlOf(qtyChain)})
        ORDER BY l_returnflag, ${sqlOf(qtyChain)}""")),

    // Distribution windows: cume_dist (deterministic under ties) and
    // nth_value over a total order.
    "q_window_dist" -> Q(
      fn = (s, d) => {
        val tied = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").asc)
        val total = Window.partitionBy(col("l_returnflag")).orderBy(cols(qtyChain): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "lineitem")
          .withColumn("cd", r4(cume_dist().over(tied)))
          .withColumn("third", nth_value(col("l_quantity"), 3).over(total))
          .orderBy(col("l_returnflag") +: cols(qtyChain): _*)
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
            "cd", "third")
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               CAST(ROUND(cume_dist() OVER tied, 4) AS DOUBLE) AS cd,
               nth_value(l_quantity, 3) OVER total AS third
        FROM lineitem
        WINDOW tied AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC),
               total AS (PARTITION BY l_returnflag ORDER BY ${sqlOf(qtyChain)}
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY l_returnflag, ${sqlOf(qtyChain)}""")),

    "q_window_analytic" -> Q(
      fn = (s, d) => {
        val w = Window.partitionBy(col("l_suppkey")).orderBy(cols(dateChain): _*)
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "lineitem")
          .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
          .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
          .withColumn("first_qty", first(col("l_quantity")).over(w))
          .withColumn("last_qty", last(col("l_quantity")).over(wFull))
          .orderBy(col("l_suppkey") +: cols(dateChain): _*)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
            "prev_qty", "next_qty", "first_qty", "last_qty")
      },
      oracle = Some(s"""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
               lag(l_quantity, 1) OVER w AS prev_qty,
               lead(l_quantity, 1) OVER w AS next_qty,
               first_value(l_quantity) OVER w AS first_qty,
               last_value(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY ${sqlOf(dateChain)}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY ${sqlOf(dateChain)})
        ORDER BY l_suppkey, ${sqlOf(dateChain)}""")),

    "q_window_frame" -> Q(
      fn = (s, d) => {
        val w = Window.partitionBy(col("l_returnflag")).orderBy(cols(dateChain): _*)
        Tables(s, d, "lineitem")
          .withColumn("qty_dec", dec2(col("l_quantity")))
          .withColumn("running_qty", dec4(sum(col("qty_dec"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .withColumn("moving_avg4", r4(avg(col("qty_dec"))
            .over(w.rowsBetween(-3, Window.currentRow))))
          .withColumn("range_qty", dec4(sum(col("qty_dec"))
            .over(Window.partitionBy(col("l_returnflag"))
              .orderBy(col("l_quantity"))
              .rangeBetween(-5, Window.currentRow))))
          .orderBy(col("l_returnflag") +: cols(dateChain): _*)
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
            "l_shipdate", "running_qty", "moving_avg4", "range_qty")
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, l_shipdate,
               CAST(SUM(qty_dec) OVER (PARTITION BY l_returnflag
                 ORDER BY ${sqlOf(dateChain)}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
               CAST(ROUND(AVG(qty_dec) OVER (PARTITION BY l_returnflag
                 ORDER BY ${sqlOf(dateChain)}
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS moving_avg4,
               CAST(SUM(qty_dec) OVER (PARTITION BY l_returnflag
                 ORDER BY l_quantity
                 RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_qty
        FROM (SELECT *, CAST(l_quantity AS DECIMAL(12,2)) AS qty_dec FROM lineitem)
        ORDER BY l_returnflag, ${sqlOf(dateChain)}""")))
}

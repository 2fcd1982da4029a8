package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's raison d'être: top-N entities per group by an aggregated
  * metric, config-parameterized (reference `config/config_dev.yaml:10-13`:
  * `group_by_column: region`, `target_metric: sales`, `top_n: 3`; the
  * implementation slot `src/transform/top3_logic.py` is empty — these are the
  * declared semantics, built Spark-first).
  *
  * Scale notes (100 TB): the aggregation is a key-partitioned hash agg with
  * map-side partials; the ranking window runs on the *aggregated* relation
  * (|groups × entities|, orders of magnitude smaller than the fact table),
  * and Spark ≥3.5's `InferWindowGroupLimit` pushes `rank <= n` into
  * `WindowGroupLimitExec` so each partition only keeps n rows per group —
  * no full sort of the aggregate is materialized. Dimension joins are
  * broadcast (few MB even at 100 TB fact scale).
  */
object Flagship {

  /** Generic top-N per group: rank `entityCols` within each `groupCols` by
    * `metric` (descending), keep `n`, with a total-order tie-break so the
    * survivor set is deterministic (SURVEY §7.4 rule 5).
    */
  def topNPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      entityCols: Seq[String],
      metric: Column,
      n: Int): DataFrame = {
    val agg = df
      .groupBy((groupCols ++ entityCols).map(col): _*)
      .agg(dec4(sum(metric)).as("metric"))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("metric").desc +: entityCols.map(c => col(c).asc): _*)
    agg
      .withColumn("rnk", rank().over(w).cast(LongType))
      .filter(col("rnk") <= n)
  }

  /** q_topn_flagship: top 3 parts by revenue per region.
    * Join path per FIXTURES.md: lineitem→supplier→nation→region (group),
    * lineitem→part (entity), metric = extendedprice*(1-discount) as decimal.
    */
  private def flagship(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val sup = Tables(spark, dir, "supplier")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    val part = Tables(spark, dir, "part")
    val joined = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    topNPerGroup(joined, Seq("r_name"), Seq("p_name"), revenue, 3)
      .select(col("r_name"), col("p_name"), col("metric").as("revenue"), col("rnk"))
      .orderBy(col("r_name"), col("rnk"), col("p_name"))
  }

  val qs: Map[String, Q] = Map(
    "q_topn_flagship" -> Q(
      fn = flagship,
      oracle = Some(s"""
        WITH rev AS (
          SELECT r_name, p_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY r_name, p_name),
        ranked AS (
          SELECT r_name, p_name, revenue,
                 rank() OVER (PARTITION BY r_name ORDER BY revenue DESC, p_name ASC) AS rnk
          FROM rev)
        SELECT r_name, p_name, revenue, rnk FROM ranked
        WHERE rnk <= 3 ORDER BY r_name, rnk, p_name""")))
}

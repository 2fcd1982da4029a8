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

  /** STREAMING spelling of the flagship (r11 verdict ask #2): the same
    * config-parameterized top-N-per-group, maintained INCREMENTALLY by the
    * real engine. The fact table arrives as micro-batches; each batch joins
    * to the broadcast static dimensions (stream-static join — re-broadcast
    * per batch, never shuffled against the stream), feeds an update-mode
    * running aggregation keyed on (group, entity), and lands through the
    * q_stream_update batch-id-versioned foreachBatch recipe (idempotent:
    * a retried batch OVERWRITES its own b=<id> dir). The rank-≤-n filter
    * runs on the FINAL state — each group's last emission, recovered as
    * max_by(metric, batch_id) — because a top-N membership is only
    * meaningful over the settled aggregate; re-ranking per batch would
    * re-emit the whole board every trigger for no consumer value.
    *
    * Correctness shape: the running sum is an order-free decimal reduction,
    * so each group's LAST emission equals the batch aggregate no matter how
    * the file source batched rows — which is what makes the stream
    * oracle-checkable by the SAME SQL as q_topn_flagship.
    *
    * Scale shape (100 TB): state is O(|groups × entities|) — the aggregated
    * relation, not the fact stream; per batch the engine does one keyed
    * exchange of the batch's partial aggregates (map-side combine first)
    * and touches only the state keys present in the batch. The final rank
    * is a batch window over the aggregated relation (WindowGroupLimit
    * applies, as in the batch twin). A production deployment would add a
    * watermark + TTL on dormant entities; the synthetic corpus has no
    * event-time column on lineitem, so state here is bounded by the domain
    * instead. */
  private def streamingTopN(
      spark: SparkSession,
      dir: String,
      groupCol: String,
      entityCol: String,
      metric: Column,
      n: Int): DataFrame = {
    val Scratch = graft.Scratch
    val scratch = Scratch.fresh("stream_topn")
    val in = Scratch.flagshipInput(spark, dir)
    val fact = spark.readStream.schema(Scratch.flagshipSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val enriched = fact
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
    val running = enriched
      .groupBy(col(groupCol), col(entityCol))
      .agg(dec4(sum(metric)).as("metric"))
    Scratch.withStreamShuffle(spark) {
      running.writeStream
        .outputMode("update")
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id))
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$scratch/out/b=$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    // Final state per (group, entity) = the last update it emitted;
    // (group, entity, batch_id) is unique, so max_by is deterministic.
    val finalState = spark.read.parquet(s"$scratch/out")
      .groupBy(col(groupCol), col(entityCol))
      .agg(max_by(col("metric"), col("batch_id")).as("metric"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("metric").desc, col(entityCol).asc)
    finalState
      .withColumn("rnk", rank().over(w).cast(LongType))
      .filter(col("rnk") <= n)
  }

  val qs: Map[String, Q] = Map(
    "q_stream_topn" -> Q(
      fn = (s, d) =>
        streamingTopN(s, d, "r_name", "p_name", revenue, 3)
          .select(col("r_name"), col("p_name"),
            col("metric").as("revenue"), col("rnk"))
          .orderBy(col("r_name"), col("rnk"), col("p_name")),
      // The BATCH flagship's oracle verbatim — the whole point: the
      // incrementally-maintained board must equal the declared query.
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
        WHERE rnk <= 3 ORDER BY r_name, rnk, p_name""")),

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

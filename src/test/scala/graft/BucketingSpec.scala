package graft

import graft.operators.Flagship
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: same key, same bucket count on both sides ⇒
  * the join plans without a shuffle Exchange. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val li = Tables(spark, TestSpark.sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, TestSpark.sf, "orders").select("o_orderkey", "o_totalprice")
    Sources.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Sources.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          spark.table("li_bucketed")("l_orderkey") === spark.table("ord_bucketed")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() ==
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("flagship top-N on a fact table bucketed by the entity key skips the pre-agg shuffle") {
    // The repeated-workload variant of q_topn_flagship: lineitem bucketed
    // by l_partkey feeds the per-(region, part) revenue aggregation
    // directly — HashPartitioning(l_partkey) already clusters every
    // group of the (r_name, l_partkey) aggregate (broadcast dim joins
    // preserve the scan's partitioning), so the plan needs exactly one
    // exchange fewer than the unbucketed run: the agg happens in place
    // and only the tiny post-agg window repartitions.
    def variant(fact: DataFrame): DataFrame = {
      val joined = fact
        .join(broadcast(Tables(spark, TestSpark.sf, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(spark, TestSpark.sf, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(spark, TestSpark.sf, "region")),
          col("n_regionkey") === col("r_regionkey"))
      Flagship.topNPerGroup(joined, Seq("r_name"), Seq("l_partkey"), Q.revenue, 3)
    }
    val cols = Seq("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val plain = Tables(spark, TestSpark.sf, "lineitem").select(cols.map(col): _*)
    Sources.writeBucketed(plain, "li_pk_bucketed", "l_partkey", 8)
    try {
      def exchanges(df: DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val bucketed = variant(spark.table("li_pk_bucketed"))
      val baseline = variant(plain)
      assert(exchanges(bucketed) == exchanges(baseline) - 1,
        s"bucketed=${exchanges(bucketed)} baseline=${exchanges(baseline)}")
      val got = bucketed.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      val want = baseline.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got == want)
    } finally spark.sql("DROP TABLE IF EXISTS li_pk_bucketed")
  }
}

package graft

import graft.sources.Sources
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
}

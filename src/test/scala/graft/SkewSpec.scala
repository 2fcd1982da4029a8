package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting rewrites must be result-identical to the direct formulation. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedSum equals plain groupBy sum") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(Q.dec2(col("l_quantity"))).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", Q.dec2(col("l_quantity")), 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(v.compareTo(direct(k)) == 0, k) }
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-rewrite skew path)") {
    // Salting (below) is the manual rewrite; the first-line answer at scale
    // is AQE's OptimizeSkewedJoin: runtime shuffle stats detect the hot
    // partition and split it into parallel subtasks WITHOUT changing the
    // query. This drives a genuinely skewed SMJ end-to-end and asserts the
    // split actually happened in the adaptive final plan.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      // Force SMJ (no broadcast escape hatch) and scale the skew
      // thresholds down to test-data sizes.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 260k of 300k left rows share key 0; the incompressible payload
      // makes the hot partition's shuffle bytes dwarf the median.
      val left = spark.range(300000L).select(
        when(col("id") < 260000L, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(1000L).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("v"))
      val joined = left.join(right, "k")
      // Materialize joined's OWN query execution (count() would plan a
      // separate query and leave this one un-finalized), then read the
      // adaptive final plan. Only k=0 matches the dim (other left keys
      // are >= 260000).
      assert(joined.queryExecution.executedPlan.execute().count() == 260000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("saltedJoin equals plain join") {
    val li = Tables(spark, TestSpark.sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val direct = li.join(ord, Seq("l_orderkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", 4)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}

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

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum must be value-identical to the single-reducer idioms it
  * replaces — exact rank/cumsum/ntile equality on tie-heavy data, across
  * bucket counts (including buckets ≫ distinct values, which leaves most
  * buckets empty, and buckets = 1, which degenerates to the plain window).
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Tie-heavy synthetic relation: value collisions within and across
  // groups; id is the unique tie-break.
  private def df = (1 to 500).map { i =>
    (s"g${i % 3}", (i * 7 % 25).toDouble, i.toLong, (i % 11).toLong)
  }.toDF("grp", "v", "id", "w")

  test("withRank reproduces row_number over (partition, order) exactly") {
    for (buckets <- Seq(1, 4, 64)) {
      val got = PrefixSum.withRank(df, Seq("grp"), col("v"), asc = true,
        Seq(col("id")), "rk", buckets)
      val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("v"), col("id"))))
      assert(got.select("grp", "id", "rk").except(
        want.select("grp", "id", "rk")).isEmpty, s"buckets=$buckets")
    }
  }

  test("withRank descending matches row_number desc") {
    val got = PrefixSum.withRank(df, Seq("grp"), col("v"), asc = false,
      Seq(col("id")), "rk", 4)
    val want = df.withColumn("rk", row_number().over(
      Window.partitionBy("grp").orderBy(col("v").desc, col("id"))))
    assert(got.select("grp", "id", "rk")
      .except(want.select("grp", "id", "rk")).isEmpty)
  }

  test("withRank with no partition columns is an exact global row_number") {
    val got = PrefixSum.withRank(df, Nil, col("v"), asc = true,
      Seq(col("id")), "rk", 8)
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(got.select("id", "rk").except(want.select("id", "rk")).isEmpty)
  }

  test("withCumSum reproduces the running window sum over distinct keys") {
    // grouped-relation idiom: primary distinct within each partition
    val g = df.groupBy("grp", "v").agg(sum("w").as("w"))
    for (buckets <- Seq(1, 4, 64)) {
      val got = PrefixSum.withCumSum(g, Seq("grp"), col("v"), col("w"),
        "cum", buckets)
      val want = g.withColumn("cum", sum("w").over(
        Window.partitionBy("grp").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(got.select("grp", "v", "cum")
        .except(want.select("grp", "v", "cum")).isEmpty, s"buckets=$buckets")
    }
  }

  test("tileOf matches ntile across remainders and tiny partitions") {
    // n from 1 (n < k) through multiples and every remainder class
    for (n <- Seq(1, 3, 5, 7, 10, 23, 500)) {
      val d = df.limit(n)
      val ranked = PrefixSum.withRank(d, Nil, col("v"), asc = true,
        Seq(col("id")), "rk", 4)
        .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
        .withColumn("tile", PrefixSum.tileOf(col("rk"), col("n"), 5))
      val want = d.withColumn("tile",
        ntile(5).over(Window.orderBy(col("v"), col("id"))))
      assert(ranked.select("id", "tile")
        .except(want.select("id", "tile")).isEmpty, s"n=$n")
    }
  }

  test("null and NaN order keys pin to Spark's sort positions") {
    val d = Seq(
      (1L, Some(2.0)), (2L, None), (3L, Some(Double.NaN)),
      (4L, Some(1.0)), (5L, None), (6L, Some(3.0)))
      .toDF("id", "v")
    val got = PrefixSum.withRank(d, Nil, col("v"), asc = true,
      Seq(col("id")), "rk", 4)
    val want = d.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(got.select("id", "rk").except(want.select("id", "rk")).isEmpty)
  }
}

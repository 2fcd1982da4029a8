package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining ◻ capabilities with no SQL oracle: set-op ALL variants,
  * half-even rounding, initcap, map functions. */
class MiscOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("intersectAll and exceptAll keep multiplicity") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    assert(a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("bround is half-even, round is half-up") {
    import spark.implicits._
    val df = Seq(2.5, 3.5, -2.5).toDF("x")
    val r = df.select(round(col("x"), 0).as("r"), bround(col("x"), 0).as("b"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r.toSeq == Seq((3.0, 2.0), (4.0, 4.0), (-3.0, -2.0)))
  }

  test("initcap capitalizes each word") {
    import spark.implicits._
    assert(Seq("hello spark world").toDF("s")
      .select(initcap(col("s"))).head().getString(0) == "Hello Spark World")
  }

  test("map functions round-trip keys and values") {
    val out = SparkEntry.queries("q_map_funcs")(spark, TestSpark.sf)
    val row = out.head()
    assert(row.getString(1) == "v,v2")
    val vs = row.getString(2).split(",").map(_.toDouble)
    assert(math.abs(vs(1) - 2 * vs(0)) < 1e-9)
    assert(row.getDouble(3) == vs(0))
  }
}

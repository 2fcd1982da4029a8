package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs on sf0.001 without throwing and yields a
  * non-empty schema; entry() yields rows (the driver's t1 smoke). */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}

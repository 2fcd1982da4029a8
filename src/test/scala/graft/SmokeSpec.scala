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

  // Output-contract guard (round-5 regression class): the driver's oracle
  // comparator sorts result columns with pandas, which cannot hash list or
  // map cells — a top-level ArrayType/MapType column in an oracle-checked
  // query crashes the harness and reds the row even when values match.
  // List-shaped results must serialize (concat_ws, the q_agg_collect
  // convention) or flatten to scalar columns (the q_similarity_pq one).
  test("no oracle-checked query emits a top-level array or map column") {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val offenders = SparkEntry.queries.collect {
      case (name, fn) if SparkEntry.oracleSql.contains(name) =>
        val bad = fn(spark, TestSpark.sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
                 || f.dataType.isInstanceOf[MapType] => f.name
        }
        name -> bad
    }.filter(_._2.nonEmpty)
    assert(offenders.isEmpty,
      s"driver comparator cannot sort these columns: ${offenders.toMap}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}

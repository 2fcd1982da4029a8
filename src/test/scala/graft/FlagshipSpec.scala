package graft

import graft.operators.Flagship
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-N-per-group invariants (SURVEY.md §5.3): ≤ n rows per group, ranks
  * contiguous from 1, kept metric ≥ dropped metric per group under the
  * tie-broken order. */
class FlagshipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val out =
    SparkEntry.queries("q_topn_flagship")(spark, TestSpark.sf).collect()

  test("at most 3 per region, ranks start at 1 and are contiguous") {
    val perGroup = out.groupBy(_.getString(0))
    perGroup.foreach { case (region, rows) =>
      assert(rows.length <= 3, s"region $region has ${rows.length} rows")
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.head == 1L)
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
  }

  test("metric is non-increasing with rank within each group") {
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("q_stream_topn: the incrementally-maintained board equals the batch flagship") {
    // The whole contract of the streaming spelling (r11 verdict ask #2):
    // after the last micro-batch, rank-on-final-state must reproduce the
    // declared batch query exactly — same rows, same order, same doubles.
    val streamed = SparkEntry.queries("q_stream_topn")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val batch = out.map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"stream/batch divergence: ${streamed.toSeq.diff(batch.toSeq)} vs ${batch.toSeq.diff(streamed.toSeq)}")
  }

  test("topNPerGroup honors the configured n") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val top1 = Flagship.topNPerGroup(li, Seq("l_returnflag"), Seq("l_partkey"),
      Q.dec2(col("l_quantity")), 1)
    val counts = top1.groupBy("l_returnflag").count().collect()
    assert(counts.forall(_.getLong(1) == 1L))
  }
}

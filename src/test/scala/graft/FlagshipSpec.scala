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

  test("q_stream_topn: dormant window state is TTL-evicted as the watermark passes") {
    // r12 verdict ask #2: the streaming flagship previously held every
    // (group, entity) key forever. Now state is keyed on 90-day event-time
    // windows under a 30-day watermark, and the event-time-ordered input
    // (date-quartile files, Scratch.flagshipInput) advances the watermark
    // every micro-batch — so the state store must REMOVE expired windows
    // mid-run, and the final batch's state must sit BELOW the peak.
    val (_, progresses) = Flagship.streamingFlagship(spark, TestSpark.sf)
    val stateTotals = progresses
      .filter(_.stateOperators.nonEmpty)
      .sortBy(_.batchId)
      .map(p => (p.batchId, p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.numRowsRemoved).sum))
    assert(stateTotals.size >= 3, s"expected multi-batch run, got $stateTotals")
    assert(stateTotals.map(_._3).sum > 0,
      s"no state rows were ever evicted: $stateTotals")
    val peak = stateTotals.map(_._2).max
    assert(stateTotals.last._2 < peak,
      s"final state (${stateTotals.last._2}) did not drop below the peak ($peak): $stateTotals")
  }

  test("topNPerGroup honors the configured n") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val top1 = Flagship.topNPerGroup(li, Seq("l_returnflag"), Seq("l_partkey"),
      Q.dec2(col("l_quantity")), 1)
    val counts = top1.groupBy("l_returnflag").count().collect()
    assert(counts.forall(_.getLong(1) == 1L))
  }
}

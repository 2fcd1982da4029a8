package graft

import graft.operators.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics on hand-built data: inclusive <= match, greatest
  * time wins, ties broken by greatest tie-break id, unmatched left rows
  * null-extended. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("backward as-of picks latest right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // key 1, t=100
      (1L, 50L, 11L),
      (2L, 10L, 12L), // before any right row for key 2
      (3L, 10L, 13L)  // key with no right rows at all
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 100L, 900L), // equal time: must match (inclusive)
      (1L, 99L, 901L),
      (1L, 100L, 902L), // tie at t=100: greatest rid wins
      (2L, 20L, 903L)
    ).toDF("k", "rt", "rid")

    val out = AsOf.joinBackward(left, right,
        key = "k", leftTime = "t", rightTime = "rt", rightTieBreak = "rid")
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(out(10L) == 902L) // t=100 → tie between rid 900/902 → max rid
    assert(out(11L) == -1L)  // t=50 → all right times (99,100) are later
    assert(out(12L) == -1L)  // rt=20 > 10 → no match
    assert(out(13L) == -1L)  // no right rows for key 3
  }

  test("forward as-of picks earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq((1L, 50L, 10L), (1L, 100L, 11L), (1L, 101L, 12L)).toDF("k", "t", "lid")
    val right = Seq((1L, 99L, 900L), (1L, 100L, 901L), (1L, 100L, 902L)).toDF("k", "rt", "rid")
    val out = AsOf.joinForward(left, right, "k", "t", "rt", "rid")
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) == 900L) // earliest rt >= 50 is 99
    assert(out(11L) == 901L) // tie at rt=100 → min rid
    assert(out(12L) == -1L)  // nothing at or after 101
  }

  test("tolerance drops matches farther than the bound") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("k", "t", "lid")
    val right = Seq((1L, 95L, 900L)).toDF("k", "rt", "rid")
    val out = AsOf.joinBackward(left, right, "k", "t", "rt", "rid", tolerance = Some("10"))
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) == 900L) // gap 5 <= 10
    assert(out(11L) == -1L)  // gap 105 > 10 → dropped
  }
}

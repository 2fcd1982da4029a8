package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — Spark has no native operator (SURVEY.md §2.2 `q_join_asof`),
  * so this builds it from a union + one keyed window pass. Supports both
  * directions and an optional tolerance (the pandas `merge_asof` surface).
  *
  * - backward: greatest `rightTime <= leftTime` per key (ties → greatest
  *   `rightTieBreak`)
  * - forward: smallest `rightTime >= leftTime` per key (ties → smallest
  *   `rightTieBreak`)
  * - tolerance: drop a match farther than `tolerance` from the left time
  *   (SQL expression — an INTERVAL for timestamps, a number otherwise)
  *
  * Unmatched left rows are null-extended (left-outer as-of).
  *
  * Scale design (100 TB): the naive formulation — range join then
  * rank-filter — explodes to |left_per_key| × |right_per_key| intermediate
  * rows per key. This implementation instead unions the two sides (cheap,
  * narrow) and runs ONE shuffle partitioned by `key` with a sort on
  * (time, side, tiebreak), carrying the nearest right row along with
  * `last(ignoreNulls)` over an unbounded-preceding frame. Cost is
  * O(n log n) per key partition, a single exchange, no row explosion; skew
  * on hot keys is handled by AQE. The right row travels as ONE struct so
  * every attached column comes from the same matched row even when some of
  * its fields are null.
  */
object AsOf {

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      tolerance: Option[String] = None): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, rightTieBreak,
      backward = true, tolerance)

  def joinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      tolerance: Option[String] = None): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, rightTieBreak,
      backward = false, tolerance)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      backward: Boolean,
      tolerance: Option[String]): DataFrame = {
    val leftCols = left.columns.filterNot(_ == key).toSeq
    val rightCols = right.columns.filterNot(_ == key).toSeq

    val lAligned = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
      .select(Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r")) ++
        leftCols.map(col): _*)

    val rAligned = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(rightTieBreak).cast("long"))
      .withColumn("__r", struct(rightCols.map(col): _*))
      .select(Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at equal time ⇒ inclusive match.
    // Backward scans time ascending (last right seen = greatest rt <= lt,
    // tiebreak asc so the greatest id wins); forward scans descending
    // (last right seen = smallest rt >= lt, tiebreak desc so the smallest
    // id wins).
    val timeOrd = if (backward) col("__t").asc else col("__t").desc
    val tbOrd = if (backward) col("__tb").asc else col("__tb").desc
    val w = Window
      .partitionBy(col(key))
      .orderBy(timeOrd, col("__side").asc, tbOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lAligned.unionByName(rAligned)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = tolerance.fold(filled) { tol =>
      val rt = col("__r").getField(rightTime)
      val within =
        if (backward) rt >= col("__t") - expr(tol)
        else rt <= col("__t") + expr(tol)
      filled.withColumn("__r", when(rt.isNotNull && within, col("__r")))
    }

    rightCols.foldLeft(bounded) { (df, c) =>
      df.withColumn(c, col("__r").getField(c))
    }.drop("__t", "__side", "__tb", "__r")
  }
}

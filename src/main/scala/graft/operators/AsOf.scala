package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — Spark has no native operator (SURVEY.md §2.2
  * `q_join_asof`), so this builds it from a union + one keyed window pass.
  *
  * For every left row, attach the right row with the greatest
  * `rightTime <= leftTime` for the same `key` (ties broken by the greatest
  * `rightTieBreak`), or nulls if none exists (left-outer as-of).
  *
  * Scale design (100 TB): the naive formulation — range join then
  * rank-filter — explodes to |left_per_key| × |right_per_key| intermediate
  * rows per key. This implementation instead unions the two sides (cheap,
  * narrow) and runs ONE shuffle partitioned by `key` with a sort on
  * (time, side, tiebreak), carrying the latest right row forward with
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
      rightTieBreak: String): DataFrame = {
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

    // Right rows sort before left rows at equal time => inclusive (<=) match.
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lAligned.unionByName(rAligned)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    rightCols.foldLeft(filled.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, col("__r").getField(c))
    }.drop("__t", "__side", "__tb", "__r")
  }
}

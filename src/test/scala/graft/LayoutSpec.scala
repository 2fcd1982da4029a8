package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (q_layout_zorder): the property that makes it a data
  * LAYOUT operator, not just bit math — sorting by the interleaved key
  * bounds worst-case scan locality across BOTH dimensions, where a
  * single-column sort degenerates to a full scan for the other column's
  * predicates (at 100 TB: parquet row-group min/max pruning works for
  * either dim of a z-written table).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("z-order bounds worst-case block touches across both dimensions") {
    // deterministic uniform points on a 256x256 grid
    val pts = spark.range(100000).select(
      pmod(xxhash64(col("id")), lit(256L)).as("a"),
      pmod(xxhash64(col("id"), lit(1L)), lit(256L)).as("b"))
      .withColumn("z", Analytics.zValue(col("a"), col("b"), 8))

    def layout(sortCol: String): Array[(Long, Long)] =
      pts.orderBy(sortCol).select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))

    // blocks-of-2048 stand in for parquet row groups: a block is "touched"
    // by a predicate if any of its rows match (min/max stats can't prune it)
    val block = 2048
    def touched(rows: Array[(Long, Long)], p: ((Long, Long)) => Boolean): Int =
      rows.grouped(block).count(_.exists(p))

    val aBox = (t: (Long, Long)) => t._1 < 16  // a in [0, 16): 1/16 of rows
    val bBox = (t: (Long, Long)) => t._2 < 16
    val zSorted = layout("z")
    val aSorted = layout("a")
    val nBlocks = (zSorted.length + block - 1) / block

    // single-key sort: perfect for its own column, degenerate for the other
    assert(touched(aSorted, aBox) <= 5)
    assert(touched(aSorted, bBox) >= nBlocks - 2,
      "uniform b rows should smear across nearly every a-sorted block")

    val zWorst = math.max(touched(zSorted, aBox), touched(zSorted, bBox))
    val aWorst = math.max(touched(aSorted, aBox), touched(aSorted, bBox))
    assert(zWorst <= (0.75 * aWorst).toInt,
      s"z-order worst-case $zWorst not better than single-sort $aWorst over $nBlocks blocks")
  }

  test("zValue is the bit interleave (bijective on the 16-bit grid)") {
    val rows = spark.range(65536).select(
      (col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
      .withColumn("z", Analytics.zValue(col("a"), col("b"), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def interleave(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    rows.foreach { case (a, b, z) => assert(z == interleave(a, b)) }
    assert(rows.map(_._3).distinct.length == 65536, "z must be a bijection")
  }
}

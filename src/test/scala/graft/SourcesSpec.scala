package graft

import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CSV/JSON scans and sinks (SURVEY.md §2.2 text-format rows): schema-applied
  * round trips through temp dirs. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv round trip preserves rows and schema") {
    val region = Tables(spark, TestSpark.sf, "region")
    val dir = Files.createTempDirectory("graft_csv").toString
    Sources.writeCsv(region, dir)
    val back = Sources.readCsv(spark, dir, region.schema)
    assert(back.schema == region.schema)
    assert(back.orderBy("r_regionkey").collect()
      .sameElements(region.orderBy("r_regionkey").collect()))
  }

  test("json round trip preserves rows") {
    val nation = Tables(spark, TestSpark.sf, "nation")
    val dir = Files.createTempDirectory("graft_json").toString
    Sources.writeJson(nation, dir)
    val back = Sources.readJson(spark, dir, nation.schema)
    assert(back.count() == nation.count())
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(nation.orderBy("n_nationkey").collect()))
  }

  test("partitioned parquet write prunes partitions on read") {
    val orders = Tables(spark, TestSpark.sf, "orders")
    val dir = Files.createTempDirectory("graft_part").toString
    Sources.writeParquet(orders, dir, partitionBy = Seq("o_orderstatus"))
    val pruned = Sources.readParquet(spark, dir).filter("o_orderstatus = 'F'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      orders.filter("o_orderstatus = 'F'").count())
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("o_orderstatus = F"))
  }
}

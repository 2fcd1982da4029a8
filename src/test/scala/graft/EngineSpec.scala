package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config parsing (the reference's whole declared surface — reference
  * config/config_dev.yaml:1-13). */
class EngineSpec extends AnyFunSuite {

  test("parses the reference's config shape") {
    val cfg = Engine.parseConfig(
      """env: dev
        |input:
        |  source_type: csv
        |  path: "s3://bucket/raw/sales/"
        |output:
        |  path: "s3://bucket/processed/top3/"
        |processing:
        |  group_by_column: region
        |  target_metric: sales
        |  top_n: 3
        |""".stripMargin)
    assert(cfg.env == "dev")
    assert(cfg.inputPath == "s3://bucket/raw/sales/")
    assert(cfg.outputPath == "s3://bucket/processed/top3/")
    assert(cfg.groupByColumn == "region")
    assert(cfg.targetMetric == "sales")
    assert(cfg.topN == 3)
  }

  test("defaults hold for an empty config") {
    val cfg = Engine.parseConfig("")
    assert(cfg.topN == 3 && cfg.groupByColumn == "region")
  }

  test("comments and blank lines are ignored") {
    val cfg = Engine.parseConfig(
      """# comment
        |processing:
        |  top_n: 7  # trailing comment
        |""".stripMargin)
    assert(cfg.topN == 7)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end config-driven job: the reference's declared pipeline
  * (region/product/sales, top_n) over a synthesized input. */
class JobRunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("runs the configured top-N job end to end") {
    import spark.implicits._
    val input = Seq(
      ("east", "widget", 10.0), ("east", "widget", 5.0),
      ("east", "bolt", 12.0), ("east", "gear", 1.0), ("east", "cog", 0.5),
      ("west", "widget", 2.0), ("west", "bolt", 3.0)
    ).toDF("region", "product", "sales")
    val inDir = Files.createTempDirectory("graft_job_in").toString
    val outDir = Files.createTempDirectory("graft_job_out").toString
    input.write.mode("overwrite").parquet(inDir)

    val cfg = Engine.JobConfig(
      inputPath = inDir, outputPath = outDir,
      groupByColumn = "region", targetMetric = "sales", topN = 2)
    JobRunner.run(spark.read.parquet(inDir), cfg)
      .write.mode("overwrite").parquet(outDir)

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).sorted
    // east: widget 15 (rank1), bolt 12 (rank2); west: bolt 3, widget 2
    assert(out.toSeq == Seq(
      ("east", "bolt", 2L), ("east", "widget", 1L),
      ("west", "bolt", 1L), ("west", "widget", 2L)))
  }

  test("environment detection defaults to local") {
    assert(JobRunner.detectEnvironment() == "local")
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suite-level sessions
  * would pay ~10s startup each). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Typed-aggregate hash maps (topk_pairs et al.) hold BOUNDED buffers
      // (k pairs each); the 128-key sort-based fallback default is tuned
      // for unbounded collect_list-class buffers and would re-introduce a
      // per-partition sort on the k-NN aggregation tails. 1M keys of
      // bounded buffers is ~100s of MB worst-case per task.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.shuffle.spill.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

package graft

import org.apache.spark.sql.SparkSession

/** Session + job-config core.
  *
  * Mirrors the reference's tuned session knobs (reference
  * `src/utils/spark_helper.py:14-36`): AQE on, snappy parquet, modest local
  * shuffle width, optional local master. The PySpark-only Arrow interchange
  * knob (`spark_helper.py:24`) is dropped (no Python boundary here), and Kryo
  * (`spark_helper.py:26`) is unnecessary — DataFrame ops run on Tungsten
  * `UnsafeRow`.
  *
  * At cluster scale the same builder is used without `.master`, and
  * `shuffle.partitions` is sized to ~2-3x total executor cores (AQE coalesces
  * down at runtime).
  */
object Engine {

  /** The reference's whole declared processing surface
    * (`config/config_dev.yaml:10-13`): group column, metric, top-N, IO paths. */
  final case class JobConfig(
      env: String = "dev",
      inputPath: String = "",
      outputPath: String = "",
      groupByColumn: String = "region",
      targetMetric: String = "sales",
      topN: Int = 3)

  /** Minimal parser for the reference's 2-level YAML config shape
    * (`config/config_dev.yaml:1-13`) — flat `section:` / `  key: value`
    * pairs; no external YAML dependency. */
  def parseConfig(text: String): JobConfig = {
    var section = ""
    val kv = scala.collection.mutable.Map[String, String]()
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#')
      if (line.trim.nonEmpty && line.contains(":")) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        val Array(k, v @ _*) = line.split(":", 2).map(_.trim)
        val value = v.headOption.getOrElse("").stripPrefix("\"").stripSuffix("\"")
        if (!indented) { if (value.isEmpty) section = k else kv(k) = value }
        else kv(s"$section.$k") = value
      }
    }
    JobConfig(
      env = kv.getOrElse("env", "dev"),
      inputPath = kv.getOrElse("input.path", ""),
      outputPath = kv.getOrElse("output.path", ""),
      groupByColumn = kv.getOrElse("processing.group_by_column", "region"),
      targetMetric = kv.getOrElse("processing.target_metric", "sales"),
      topN = kv.getOrElse("processing.top_n", "3").toInt)
  }

  def session(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Typed-aggregate hash maps (topk_pairs et al.) hold BOUNDED buffers
      // (k pairs each); the 128-key sort-based fallback default is tuned
      // for unbounded collect_list-class buffers and would re-introduce a
      // per-partition sort on the k-NN aggregation tails. 1M keys of
      // bounded buffers is ~100s of MB worst-case per task.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

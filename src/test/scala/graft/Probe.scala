package graft
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (q <- Seq("q_tpch_q19", "q_graph_degree")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $q =====")
      println(p.linesIterator.filter(l => l.contains("Scan parquet") || l.contains("Reused") || l.contains("Union") || l.contains("Exchange")).mkString("\n"))
    }
    spark.stop()
  }
}

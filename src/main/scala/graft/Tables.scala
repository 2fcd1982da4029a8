package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver corpus (TESTDATA.md): one parquet file per table
  * under the scale-factor directory. Parquet footers carry the schema, so
  * reads are deterministic without a declared StructType; Catalyst pushes
  * projections and predicates into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view (for spark.sql queries —
    * correlated subqueries, GROUPING SETS — which mirror the oracle SQL). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

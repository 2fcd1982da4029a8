package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ScaleGen invariants: the synthesized corpus must scale facts linearly,
  * preserve FK structure per replica, and keep document near-dup structure
  * strictly intra-replica (cross-replica token spaces disjoint). */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val outDir: String = {
    val dir = Files.createTempDirectory("graft_scalegen").toString
    // invoke the generator's logic in-process against the tiny corpus
    ScaleGen.generate(spark, TestSpark.sf, dir, copies = 3)
    dir
  }

  test("facts replicate x3 with shifted keys; dims keep natural size") {
    val src = Tables(spark, TestSpark.sf, "lineitem").count()
    val out = spark.read.parquet(s"$outDir/lineitem.parquet")
    assert(out.count() == 3 * src)
    assert(spark.read.parquet(s"$outDir/region.parquet").count() ==
      Tables(spark, TestSpark.sf, "region").count())
    // keys of replica k live in their own shifted range → distinct count x3
    assert(out.select("l_orderkey").distinct().count() ==
      3 * Tables(spark, TestSpark.sf, "lineitem")
        .select("l_orderkey").distinct().count())
  }

  test("order-lineitem FK structure is preserved per replica") {
    val o = spark.read.parquet(s"$outDir/orders.parquet")
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val dangling = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
    assert(dangling.count() == 0, "lineitem rows without a parent order")
  }

  test("document token spaces are disjoint across replicas") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
      .withColumn("replica", (col("doc_id") / 10000000L).cast("int"))
    val perReplica = docs
      .select(col("replica"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(countDistinct(col("replica")).as("nr"))
    assert(perReplica.filter(col("nr") > 1).count() == 0,
      "a token appears in more than one replica — cross-replica dups possible")
    // n_chars stays consistent with the rewritten text
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }
}

package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
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

  test("corrupt CSV records: PERMISSIVE captures, DROPMALFORMED drops, counts reconcile") {
    import org.apache.spark.sql.types._
    // 20 rows, every 7th malformed (wrong arity / non-numeric id)
    val lines = (0 until 20).map { i =>
      if (i % 7 == 3) s"bad_row_$i,oops"
      else s"$i,name_$i,${i * 1.5}"
    }
    val dir = Files.createTempDirectory("graft_badcsv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the default): malformed rows land null-padded with the
    // raw line preserved in the corrupt-record column — an audit trail a
    // 100 TB raw-landing ingest keeps instead of failing the job
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    val nBad = permissive.filter(col("_corrupt_record").isNotNull).count()
    val nGood = permissive.filter(col("_corrupt_record").isNull).count()
    assert(nBad == 3 && nGood == 17, s"got $nGood good / $nBad bad")
    // DROPMALFORMED: only clean rows survive. Caveat worth pinning: a bare
    // count() prunes ALL columns, the parser never materializes fields,
    // and malformed rows are NOT detected (Spark counts 20 here) — any
    // malformed-row accounting must read at least one data column.
    val dropped = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").csv(dir)
    val ids = dropped.select("id").collect().map(_.getLong(0))
    assert(ids.length == 17)
    assert(ids.sum == (0 until 20).filter(_ % 7 != 3).sum.toLong)
    permissive.unpersist()
  }

  test("xml round trip preserves rows through the rowTag framing") {
    val nation = Tables(spark, TestSpark.sf, "nation")
    val dir = Files.createTempDirectory("graft_xml").toString
    nation.write.mode("overwrite").option("rowTag", "nation").format("xml").save(dir)
    val back = spark.read.schema(nation.schema).option("rowTag", "nation")
      .format("xml").load(dir)
    assert(back.schema == nation.schema)
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(nation.orderBy("n_nationkey").collect()))
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft_dpo").toString
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
    docs.write.mode("overwrite").partitionBy("source").parquet(dir)
    val before = spark.read.parquet(dir)
    val srcs = before.select("source").distinct().collect().map(_.getString(0)).sorted
    assert(srcs.length >= 2)
    val (replaced, untouched) = (srcs.head, srcs.last)
    // Rewrite ONE partition's rows (negated ids); static mode would drop
    // every other partition, dynamic must keep them.
    docs.filter(col("source") === replaced)
      .withColumn("doc_id", -col("doc_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source").parquet(dir)
    val after = spark.read.parquet(dir)
    assert(after.filter(col("source") === untouched).count() ==
      before.filter(col("source") === untouched).count(),
      "dynamic overwrite must not clobber unwritten partitions")
    assert(after.filter(col("source") === replaced)
      .agg(max(col("doc_id"))).head().getLong(0) <= 0L,
      "written partition must hold only the new rows")
  }

  test("Observation API collects row-count/sum metrics without a second scan") {
    val obs = new org.apache.spark.sql.Observation("li_metrics")
    val out = Tables(spark, TestSpark.sf, "lineitem")
      .observe(obs, count(lit(1)).as("rows"), sum(col("l_quantity")).as("qty"))
      .filter(col("l_quantity") > 25)
    val kept = out.count()
    val m = obs.get
    val total = m("rows").asInstanceOf[Long]
    assert(total > kept && kept > 0, "metrics see pre-filter rows")
    assert(m("qty").asInstanceOf[Double] > 0.0)
  }

  test("_metadata file columns surface path/size and stay consistent with partitioning") {
    val dir = Files.createTempDirectory("graft_meta").toString
    Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val m = spark.read.parquet(dir)
      .select(col("doc_id"), col("lang"),
        col("_metadata.file_path").as("fp"), col("_metadata.file_size").as("fs"))
    val rows = m.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(3) > 0L))
    // every row's file path lives under its own partition directory
    assert(rows.forall(r => r.getString(2).contains(s"lang=${r.getString(1)}")))
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

  test("compact rewrites a fragmented dataset to target-sized files") {
    val docs = Tables(spark, TestSpark.sf, "documents")
    val dir = Files.createTempDirectory("graft_compact").toString
    docs.repartition(50).write.parquet(s"$dir/fragmented")
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/fragmented") == 50)
    Sources.compact(spark, s"$dir/fragmented", s"$dir/compacted")
    assert(parquetFiles(s"$dir/compacted") == 1,
      "sf0.01 documents is far below one 128 MB target file")
    val back = spark.read.parquet(s"$dir/compacted")
    assert(back.count() == docs.count())
    assert(back.schema == docs.schema)
  }

  test("compact grows the file count when input files exceed the target size") {
    val docs = Tables(spark, TestSpark.sf, "documents")
    val dir = Files.createTempDirectory("graft_compact_up").toString
    docs.coalesce(1).write.parquet(s"$dir/one")
    Sources.compact(spark, s"$dir/one", s"$dir/split", targetBytes = 16L << 10)
    val n = new java.io.File(s"$dir/split").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n > 1, s"16 KB target over a ${docs.count()}-doc table must split")
    assert(spark.read.parquet(s"$dir/split").count() == docs.count())
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

  test("dynamic partition pruning: a runtime dim filter prunes fact partitions") {
    import spark.implicits._
    // The dim is filtered on a NON-join column, so no static constraint
    // reaches the fact side — only DPP can skip partitions, by turning the
    // broadcast join's build-side keys into a runtime partition filter.
    // At 100 TB this is the difference between scanning the whole
    // partitioned fact table and only the partitions the dim selects.
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft_dpp").toString
    Sources.writeParquet(li, dir, partitionBy = Seq("l_returnflag"))
    val fact = Sources.readParquet(spark, dir)
    // The dim must be a real scan: a Seq-backed LocalRelation folds the
    // filter away at optimization time and DPP no longer sees a selective
    // predicate on the build side.
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Sources.writeParquet(Seq(("R", 1), ("N", 1), ("A", 2)).toDF("f", "grp"), dimDir)
    val dim = Sources.readParquet(spark, dimDir).filter(col("grp") === 2)
    val joined = fact.join(dim, fact("l_returnflag") === dim("f"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP filter in the fact scan:\n${plan.take(2500)}")
    assert(joined.count() == li.filter(col("l_returnflag") === "A").count())
  }
}

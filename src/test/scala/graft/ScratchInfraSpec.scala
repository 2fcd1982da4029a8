package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r14 scratch-reaping and local checkpoint-I/O internals:
  * the tombstone queue (unique names, no overlap with timed regions, no
  * leak on rapid re-invocation — r13 ADVICE items) and the direct-write
  * checkpoint file manager's contract (atomic-create semantics preserved,
  * bytes round-trip — the streaming family's per-batch commit path).
  */
class ScratchInfraSpec extends AnyFunSuite {

  test("fresh: rapid repeated invocations leak nothing once reaped") {
    val k = "spec_rapid"
    val dirs = (1 to 4).map { i =>
      val d = Scratch.fresh(k)
      // Drop a file in each generation so the tombstone tree is non-empty.
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, s"gen$i.txt"), s"gen $i")
      d
    }
    // Previous generations were renamed away immediately (ATOMIC_MOVE):
    // none of the earlier paths may still exist under their original name.
    dirs.dropRight(1).foreach { d =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d)),
        s"superseded scratch dir survived under its original name: $d")
    }
    Scratch.reapTombstones()
    // After the reap, no tombstone sibling of any generation remains.
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val leaked = {
      val s = java.nio.file.Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(s"graft_${k}_") && n.contains("_tomb"))
          .toList
      } finally s.close()
    }
    assert(leaked.isEmpty, s"tombstones leaked after reap: $leaked")
    // The live (latest) dir still exists until the next fresh/exit.
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dirs.last)))
  }

  test("LocalDirectCheckpointFileManager: atomic-create contract and round trip") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = java.nio.file.Files.createTempDirectory("graft_ckptmgr_spec_")
    val base = new org.apache.hadoop.fs.Path(root.toUri)
    val fm = new streaming.LocalDirectCheckpointFileManager(base, conf)
    val f = new org.apache.hadoop.fs.Path(base, "offsets/0")

    // write + read back through the manager's own open()
    val out = fm.createAtomic(f, overwriteIfPossible = false)
    out.write("v1\nbatch-0".getBytes("UTF-8")); out.close()
    val in = fm.open(f)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "v1\nbatch-0")

    // create-if-absent must throw on an existing file (HDFSMetadataLog's
    // concurrent-writer detection relies on it)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      fm.createAtomic(f, overwriteIfPossible = false)
    }
    // ... and overwrite-if-possible must succeed in place
    val out2 = fm.createAtomic(f, overwriteIfPossible = true)
    out2.write("v2".getBytes("UTF-8")); out2.close()
    val in2 = fm.open(f)
    val n2 = in2.read(buf); in2.close()
    assert(new String(buf, 0, n2, "UTF-8") == "v2")

    // cancel() removes the partial file
    val g = new org.apache.hadoop.fs.Path(base, "offsets/1")
    val out3 = fm.createAtomic(g, overwriteIfPossible = false)
    out3.write("partial".getBytes("UTF-8")); out3.cancel()
    assert(!fm.exists(g), "cancelled createAtomic left the file behind")

    // list() through the inherited manager sees what nio wrote
    assert(fm.list(new org.apache.hadoop.fs.Path(base, "offsets"))
      .map(_.getPath.getName).toSet == Set("0"))
  }

  test("streaming query through the direct manager equals the default manager") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    // Same watermarked tumbling aggregation over the same corpus slice,
    // run twice: stock manager vs the direct manager. Byte-identical
    // results pin that the manager changes I/O cost only.
    def run(useDirect: Boolean): Array[org.apache.spark.sql.Row] = {
      val in = s"${Scratch.sharedInput(spark, TestSpark.sf)}/in"
      val scratch = Scratch.fresh(
        if (useDirect) "spec_ckpt_direct" else "spec_ckpt_default")
      val agg = graft.streaming.Streams.tumblingWithWatermark(
        spark.readStream.schema(Scratch.inputSchema).parquet(in)
          .select(col("ts"), col("event_type"), col("value")), "10 minutes")
      val body = () => {
        agg.writeStream
          .format("parquet")
          .option("path", s"$scratch/out")
          .option("checkpointLocation", s"$scratch/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      if (useDirect) Scratch.withLocalCheckpointIo(spark)(body())
      else body()
      spark.read.parquet(s"$scratch/out")
        .orderBy("w_start", "event_type").collect()
    }
    val direct = run(useDirect = true)
    val stock = run(useDirect = false)
    assert(direct.nonEmpty)
    assert(direct.sameElements(stock),
      "direct checkpoint manager changed the query result")
    Scratch.reapTombstones()
  }
}

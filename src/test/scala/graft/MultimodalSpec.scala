package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Multimodal plumbing (SURVEY.md §2.5): binary payload parquet round trip
  * byte-identical, deterministic featurize, chunk sampling. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, Array[Byte](1, 2, 3, 4, 5), "img/fake", 2, 2),
      MediaRow(2L, Array.tabulate(1000)(i => (i % 251).toByte), "img/fake", 10, 10),
      MediaRow(3L, Array.empty[Byte], "img/fake", 0, 0)
    ).toDS()
  }

  test("binary payload parquet round trip is byte-identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaRow]
      .collect().map(m => m.id -> m.payload).toMap
    media.collect().foreach { m =>
      assert(java.util.Arrays.equals(back(m.id), m.payload), s"payload ${m.id}")
    }
  }

  test("featurize is deterministic and matches a reference computation") {
    val feats = Multimodal.featurize(media).collect().map(f => f.id -> f).toMap
    assert(feats(1L).n_bytes == 5)
    assert(math.abs(feats(1L).mean_byte - 3.0) < 1e-12)
    assert(feats(3L).n_bytes == 0 && feats(3L).mean_byte == 0.0)
    val again = Multimodal.featurize(media).collect().map(f => f.id -> f).toMap
    assert(feats == again)
  }

  test("sampleChunks keeps every stride-th chunk") {
    import spark.implicits._
    val df = media.toDF()
    val sampled = Multimodal.sampleChunks(df, chunkBytes = 100, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // id 2: 1000 bytes → 10 chunks → indices 0,2,4,6,8
    assert(sampled.filter(_._1 == 2L).map(_._2).sorted.sameElements(Seq(0L, 2L, 4L, 6L, 8L)))
    // id 1: 5 bytes → 1 chunk → index 0
    assert(sampled.filter(_._1 == 1L).map(_._2).sameElements(Seq(0L)))
  }
}

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
    // none of these payloads is a real image — the codec must say so
    assert(feats.values.forall(f => !f.decoded && f.width == -1))
    val again = Multimodal.featurize(media).collect().map(f => f.id -> f).toMap
    assert(feats == again)
  }

  /** Deterministic RGB test image: pixel (x, y) of image `id` is a fixed
    * function of (id, x, y). */
  private def pattern(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
    val b = ((id * 11 + x * 19 + y * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pattern(id, x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("featurize decodes real PNG payloads: dimensions and luma exact") {
    import spark.implicits._
    val dims = Seq(1L -> (16, 9), 2L -> (7, 7), 3L -> (1, 1))
    val ds = dims.map { case (id, (w, h)) =>
      MediaRow(id, pngBytes(id, w, h), "image/png", w, h)
    }.toDS().repartition(3) // decode must work per-partition, not per-driver
    val feats = Multimodal.featurize(ds).collect().map(f => f.id -> f).toMap
    dims.foreach { case (id, (w, h)) =>
      val f = feats(id)
      assert(f.decoded, s"PNG $id did not decode")
      assert(f.width == w && f.height == h, s"dims of $id: ${f.width}x${f.height}")
      // PNG is lossless: decoded pixels are bit-identical to the pattern,
      // so the Rec. 601 mean luma matches the reference computation exactly.
      var luma = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = pattern(id, x, y)
        luma += 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
      }
      assert(math.abs(f.mean_luma - luma / (w.toLong * h)) < 1e-9,
        s"luma of $id: ${f.mean_luma}")
    }
  }

  test("resize scales the longest edge, preserves aspect, and re-decodes") {
    import spark.implicits._
    val ds = Seq(
      MediaRow(1L, pngBytes(1L, 64, 32), "image/png", 64, 32),
      MediaRow(2L, pngBytes(2L, 8, 8), "image/png", 8, 8),     // under target
      MediaRow(3L, Array[Byte](1, 2, 3), "junk", 0, 0))        // undecodable
      .toDS().repartition(2)
    val out = Multimodal.resize(ds, maxEdge = 16).collect().map(r => r.id -> r).toMap
    assert(out(1L).width == 16 && out(1L).height == 8, "aspect not preserved")
    assert(out(2L).width == 8 && out(2L).height == 8, "upscaling must not happen")
    assert(out(3L).format == "undecodable" &&
      java.util.Arrays.equals(out(3L).payload, Array[Byte](1, 2, 3)),
      "dirty payloads pass through unchanged")
    // re-encoded payloads are themselves decodable at the new dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).payload))
    assert(back.getWidth == 16 && back.getHeight == 8)
  }

  test("a corrupt image payload degrades to decoded=false, not a task failure") {
    import spark.implicits._
    val good = pngBytes(9L, 4, 4)
    val corrupt = good.take(20) ++ Array.fill[Byte](30)(0) // valid magic, broken body
    val ds = Seq(
      MediaRow(1L, good, "image/png", 4, 4),
      MediaRow(2L, corrupt, "image/png", 4, 4)).toDS()
    val feats = Multimodal.featurize(ds).collect().map(f => f.id -> f).toMap
    assert(feats(1L).decoded)
    assert(!feats(2L).decoded && feats(2L).n_bytes == 50)
  }

  test("q_multimodal_decode: closed-form sums, corrupt rows flagged at id%97") {
    val out = SparkEntry.queries("q_multimodal_decode")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (decoded, w, h, sum)) =>
      if (id % 97 == 0) assert(!decoded && w == -1 && h == -1 && sum == 0L)
      else {
        val ew = 4 + (id % 13).toInt; val eh = 3 + (id % 7).toInt
        assert(decoded && w == ew && h == eh, s"doc $id dims")
        var expect = 0L
        for (y <- 0 until eh; x <- 0 until ew)
          expect += 3L * ((id * 31 + x * 7 + y * 13) % 256)
        assert(sum == expect, s"doc $id channel_sum $sum vs $expect")
      }
    }
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

  test("q_multimodal_phash: census covers the corpus, groups bounded by the pattern space") {
    val rows = SparkEntry.queries("q_multimodal_phash")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables(spark, TestSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "every image lands in one group")
    // patterns are keyed by (doc_id/5) % 97 → at most 97 distinct hashes,
    // and the ±1 pixel noise must NOT split groups (a split proves the
    // aHash threshold is noise-fragile)
    assert(rows.length <= 97, s"noise split the phash groups: ${rows.length}")
    assert(rows.exists(_._2 > 1), "no near-dup group found")
    rows.foreach { case (h, n, lo, hi) =>
      assert(h.length == 16, s"hash hex width: $h")
      assert(lo <= hi && n <= hi - lo + 1)
    }
  }

  test("q_multimodal_phash_pairs matches a closed-form brute force over distinct hashes") {
    // recompute every phash from the id arithmetic (what the oracle does),
    // then brute-force all pairs — the query must agree through the REAL
    // encode/decode path and the banded join
    val ids = Tables(spark, TestSpark.sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    def phash(id: Long): Long = {
      val px = Array.tabulate(64) { i =>
        val (x, y) = (i % 8, i / 8)
        val hi0 = ((id / 5) * 2654435761L + x * 7919L + y * 104729L) % 97 < 48
        val hi = if (id % 11 == 0 && i == (id % 64).toInt) !hi0 else hi0
        (if (hi) 192 else 64) + ((id + x * 3 + y * 5) % 3).toInt - 1
      }
      val sum = px.map(_.toLong).sum
      px.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (64L * v > sum) h | (1L << i) else h
      }
    }
    val hashes = ids.map(phash).distinct
    val expected = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      if d >= 1 && d <= 3
    } yield d).groupBy(identity).map { case (d, xs) => d.toLong -> xs.size.toLong }
    val got = SparkEntry.queries("q_multimodal_phash_pairs")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got, want $expected")
    assert(got.getOrElse(1L, 0L) > 0, "retouched images must yield Hamming-1 pairs")
  }
}

package graft.llm

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.5): opaque binary payloads with
  * typed metadata, batch decode/feature-extraction via mapPartitions, and
  * frame sampling. The image codec is a REAL decoder — `javax.imageio`
  * (JDK-only, PNG/JPEG/BMP/GIF) — exercised over synthesized PNG bytes in
  * MultimodalSpec; payloads no reader recognizes degrade to byte-level
  * stats with `decoded = false` instead of failing the batch.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the schema a 100 TB
    * multimodal corpus would carry alongside text. */
  case class MediaRow(id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  /** Byte-level stats always; decoded pixel stats when a codec accepts the
    * payload (width/height/mean_luma are -1/-1/0 otherwise). */
  case class MediaFeature(id: Long, n_bytes: Int, checksum: Long,
      mean_byte: Double, decoded: Boolean, width: Int, height: Int,
      mean_luma: Double)

  /** Batch decode: per-partition loop (the mapInPandas analog in Scala —
    * one tight pass per partition, no per-row closure dispatch; ImageIO's
    * reader-SPI registry and the in-memory stream cache setting amortize
    * across the partition). Decode failures are per-row data, not errors:
    * a 100 TB media corpus always contains undecodable payloads. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Byte-array sources must not spill through ImageIO's temp-file
      // cache on executors (driver-less filesystem assumptions).
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        var sum = 0L; var check = 17L
        var i = 0
        while (i < m.payload.length) {
          sum += (m.payload(i) & 0xff); check = check * 31 + (m.payload(i) & 0xff); i += 1
        }
        val meanByte =
          if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length
        val img =
          if (m.payload.length == 0) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
            catch {
              // JDK image readers throw RuntimeExceptions (not just
              // IOException) on corrupt headers — ArrayIndexOutOfBounds,
              // NegativeArraySize, IllegalArgument. Any of them is per-row
              // data on a 100 TB media corpus, not a task failure.
              case scala.util.control.NonFatal(_) => null
            }
        if (img == null)
          MediaFeature(m.id, m.payload.length, check, meanByte,
            decoded = false, width = -1, height = -1, mean_luma = 0.0)
        else {
          // Rec. 601 luma over the decoded raster.
          var luma = 0.0; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              luma += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          MediaFeature(m.id, m.payload.length, check, meanByte,
            decoded = true, img.getWidth, img.getHeight, luma / n)
        }
      }
    }
  }

  /** Re-encoded media row: resized payload + its new dimensions. */
  case class ResizedRow(id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  /** Batch resize: decode → bilinear-scale onto a target box (aspect
    * preserved, longest edge = `maxEdge`) → re-encode PNG. Same
    * per-partition batch-decode shape as featurize; rows whose payload no
    * codec accepts pass through unchanged (format flagged) rather than
    * failing the task — at 100 TB scale resize is the canonical
    * normalize-before-embed step and must tolerate dirty payloads. */
  def resize(media: Dataset[MediaRow], maxEdge: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img =
          if (m.payload.length == 0) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
            catch {
              // JDK image readers throw RuntimeExceptions (not just
              // IOException) on corrupt headers — ArrayIndexOutOfBounds,
              // NegativeArraySize, IllegalArgument. Any of them is per-row
              // data on a 100 TB media corpus, not a task failure.
              case scala.util.control.NonFatal(_) => null
            }
        if (img == null)
          ResizedRow(m.id, m.payload, "undecodable", m.width, m.height)
        else {
          val scale = maxEdge.toDouble / math.max(img.getWidth, img.getHeight)
          val (w, h) =
            if (scale >= 1.0) (img.getWidth, img.getHeight)
            else (math.max(1, math.round(img.getWidth * scale).toInt),
              math.max(1, math.round(img.getHeight * scale).toInt))
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedRow(m.id, bos.toByteArray, "image/png", w, h)
        }
      }
    }
  }

  /** Frame sampling: keep every `stride`-th chunk of `chunkBytes` from the
    * payload (stand-in for video frame extraction; pure column exprs). */
  def sampleChunks(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    df.withColumn("n_chunks",
        ceil(octet_length(col("payload")).cast(DoubleType) / chunkBytes).cast(IntegerType))
      .withColumn("chunk_idx",
        filter(sequence(lit(0), col("n_chunks") - 1), i => i % stride === 0))
      .select(col("id"), posexplode(col("chunk_idx")).as(Seq("pos", "idx")))
      .select(col("id"), col("idx").cast(LongType).as("idx"))

  /** Spread a narrow per-doc relation across ALL cores before a CPU-heavy
    * per-row kernel (the image encode/decode paths): a mapPartitions
    * stage otherwise inherits the SCAN's split count, and a mid-size
    * corpus parquet yields only a handful of 128 MB splits — the r11
    * decade sweep measured q_multimodal_align's per-doc cost 3-6× higher
    * at sf10 than sf100 purely because ~150 MB of input gave 2-4 tasks
    * on 28 cores. The exchange moves only the narrow projection
    * (ids + 16-byte keys), which is orders cheaper than the kernel it
    * unblocks; 3× overdecomposition smooths task skew. The kernel is
    * per-row pure, so round-robin repartitioning cannot affect results. */
  private def spreadForKernel[T](ds: Dataset[T]): Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism * 3)

  /** Synthesize the deterministic 8×8 test image for `id` (the
    * q_multimodal_phash convention: pattern from base = id/5 by pure id
    * arithmetic + a ±1 per-id pixel noise the hash must absorb;
    * `retouch` adds the single inverted pixel of q_multimodal_phash_pairs
    * for id%11==0), PNG-encode it, decode it back through the REAL
    * javax.imageio path, and aHash the decoded raster (bit = 64·pixel >
    * pixel sum — integer cross-multiply, no division). Shared by all
    * three phash keys so the codec contract is tested once. */
  private def synthAHash(id: Long, retouch: Boolean): Long = {
    val base = id / 5
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val hi0 = (base * 2654435761L + x * 7919L + y * 104729L) % 97 < 48
        val hi = if (retouch && id % 11 == 0 && (y * 8 + x) == (id % 64).toInt)
          !hi0 else hi0
        val v = (if (hi) 192 else 64) +
          ((id + x * 3 + y * 5) % 3).toInt - 1
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val px = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      px(i) = (dimg.getRGB(i % 8, i / 8) >> 16) & 0xff
      sum += px(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (64L * px(i) > sum) hash |= (1L << i)
      i += 1
    }
    hash
  }

  val qs: Map[String, Q] = Map(
    // Binary-column round trip over a payload synthesized from documents
    // (UTF-8 bytes) — octet length + md5 digest are oracle-checkable.
    "q_multimodal_binary" -> Q(
      fn = (s, d) =>
        Tables(s, d, "documents")
          .select(
            col("doc_id"),
            to_binary(col("text"), lit("utf-8")).as("payload"),
            struct(lit("text/plain").as("mime"), col("n_chars").as("n")).as("meta"))
          .select(
            col("doc_id"),
            octet_length(col("payload")).cast(LongType).as("n_bytes"),
            md5(col("payload")).as("digest"),
            col("meta.mime").as("mime"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id, length(text) AS n_bytes, md5(text) AS digest,
               'text/plain' AS mime
        FROM documents ORDER BY doc_id""")),

    // Payload chunking (frame-extraction plumbing): split each payload into
    // 64-byte chunks, one output row per chunk with its digest. The corpus
    // text is ASCII, so string slicing == byte slicing and the md5s are
    // oracle-checkable; on real media the same plan runs over BinaryType
    // slices.
    "q_multimodal_chunks" -> Q(
      fn = (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text"),
            ceil(length(col("text")).cast(DoubleType) / 64).cast(IntegerType).as("n_chunks"))
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0)))).as("idx"))
          .select(
            col("doc_id"),
            col("idx").cast(LongType).as("idx"),
            length(expr("substring(text, CAST(idx*64+1 AS INT), 64)"))
              .cast(LongType).as("chunk_bytes"),
            md5(to_binary(expr("substring(text, CAST(idx*64+1 AS INT), 64)"),
              lit("utf-8"))).as("chunk_md5"))
          .orderBy("doc_id", "idx"),
      oracle = Some("""
        SELECT doc_id, u.idx,
               length(substring(text, CAST(u.idx*64+1 AS INT), 64)) AS chunk_bytes,
               md5(substring(text, CAST(u.idx*64+1 AS INT), 64)) AS chunk_md5
        FROM documents,
             LATERAL (SELECT unnest(range(0, greatest(CAST(ceil(length(text)/64.0) AS BIGINT), 1))) AS idx) u
        ORDER BY doc_id, idx""")),

    // ORACLE-CHECKED real image decode (the end-to-end proof the featurize
    // path's codec is correct, not just exercised): per doc_id, synthesize a
    // W×H RGB PNG whose pixel values are pure id arithmetic, push it through
    // the SAME javax.imageio decode the featurize operator uses, and emit
    // the measured dimensions and integer channel sum. The DuckDB oracle
    // never sees a byte of PNG — it recomputes the closed-form expected
    // values from doc_id alone, so any decode defect (dimension swap, gamma
    // shift, channel order, truncation) hash-mismatches. Rows with
    // doc_id % 97 == 0 carry a deliberately undecodable payload and must
    // degrade to the decoded=false row, proving the corrupt-payload contract
    // through the oracle channel too. Integer sums throughout — exact at
    // any scale. Map-side only (mapPartitions encode+decode, no shuffle
    // before the output sort).
    "q_multimodal_decode" -> Q(
      fn = (s, d) => {
        import s.implicits._
        spreadForKernel(Tables(s, d, "documents").select(col("doc_id")).as[Long])
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map { id =>
              val w = 4 + (id % 13).toInt
              val h = 3 + (id % 7).toInt
              val payload: Array[Byte] =
                if (id % 97 == 0) s"not-an-image-$id".getBytes("UTF-8")
                else {
                  // TYPE_INT_RGB, not TYPE_BYTE_GRAY: gray rasters pass
                  // through a linear-gray ColorModel whose getRGB applies a
                  // gamma transfer — RGB stores the exact v at each channel
                  // and PNG round-trips it losslessly.
                  val img = new java.awt.image.BufferedImage(
                    w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
                      img.setRGB(x, y, (v << 16) | (v << 8) | v)
                      x += 1
                    }
                    y += 1
                  }
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  bos.toByteArray
                }
              val dimg =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
                catch { case scala.util.control.NonFatal(_) => null }
              if (dimg == null) (id, false, -1, -1, 0L)
              else {
                var sum = 0L; var y = 0
                while (y < dimg.getHeight) {
                  var x = 0
                  while (x < dimg.getWidth) {
                    val rgb = dimg.getRGB(x, y)
                    sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                (id, true, dimg.getWidth, dimg.getHeight, sum)
              }
            }
          }
          .toDF("doc_id", "decoded", "width", "height", "channel_sum")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH probe AS (
          SELECT doc_id,
                 CAST(4 + doc_id % 13 AS INT) AS w,
                 CAST(3 + doc_id % 7 AS INT) AS h,
                 (doc_id % 97 = 0) AS corrupt
          FROM documents),
        grid AS (SELECT x.i AS xi, y.j AS yj FROM range(16) x(i), range(9) y(j)),
        sums AS (
          SELECT p.doc_id, SUM((p.doc_id * 31 + 7 * g.xi + 13 * g.yj) % 256) AS s
          FROM probe p JOIN grid g ON g.xi < p.w AND g.yj < p.h
          GROUP BY p.doc_id)
        SELECT p.doc_id,
               NOT p.corrupt AS decoded,
               CASE WHEN p.corrupt THEN -1 ELSE p.w END AS width,
               CASE WHEN p.corrupt THEN -1 ELSE p.h END AS height,
               CAST(CASE WHEN p.corrupt THEN 0 ELSE 3 * s.s END AS BIGINT)
                 AS channel_sum
        FROM probe p LEFT JOIN sums s USING (doc_id)
        ORDER BY p.doc_id""")),

    // Perceptual-hash near-duplicate census over DECODED images — the
    // multimodal counterpart of q_dedup_exact: every image goes PNG-encode
    // → javax.imageio decode → 8×8 aHash (bit = pixel > image mean,
    // Hamming-robust to small pixel noise), and images sharing a hash
    // group as near-dups. Synthesis follows the q_multimodal_decode
    // convention: the 8×8 pattern derives from base = doc_id/5 by pure id
    // arithmetic (so ~5 consecutive ids are near-identical), plus a ±1
    // per-id pixel noise the hash MUST absorb — pixels sit at 64/192
    // around the ~128 mean, so a bit flip would mean the codec (not the
    // noise) is broken. The oracle never sees a PNG: it recomputes the
    // aHash closed-form from id arithmetic, so any decode/raster/threshold
    // defect hash-mismatches.
    //
    // Determinism + scale: bit threshold is the integer cross-multiply
    // 64·v > Σv (no division); output is the GROUP census (hash, n, id
    // range) — bounded by the pattern space, never a member-list blowup.
    // Map-side encode+decode+hash (mapPartitions, no shuffle before the
    // census agg).
    "q_multimodal_phash" -> Q(
      fn = (s, d) => {
        import s.implicits._
        spreadForKernel(Tables(s, d, "documents").select(col("doc_id")).as[Long])
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map(id => (id, synthAHash(id, retouch = false)))
          }
          .toDF("doc_id", "phash")
          .groupBy("phash")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .select(format_string("%016x", col("phash")).as("phash_hex"),
            col("n_docs"), col("min_doc"), col("max_doc"))
          .orderBy("phash_hex")
      },
      oracle = Some("""
        WITH grid AS (SELECT x.i AS xi, y.j AS yj
                      FROM range(8) x(i), range(8) y(j)),
        px AS (
          SELECT d.doc_id, g.xi, g.yj,
                 (CASE WHEN ((doc_id // 5) * 2654435761 + g.xi * 7919
                             + g.yj * 104729) % 97 < 48
                       THEN 192 ELSE 64 END)
                   + (doc_id + g.xi * 3 + g.yj * 5) % 3 - 1 AS v
          FROM documents d, grid g),
        m AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
        h AS (
          SELECT px.doc_id,
                 CAST(SUM(CASE WHEN 64 * v > m.s
                   THEN CASE WHEN yj * 8 + xi = 63
                             THEN -9223372036854775808
                             ELSE (CAST(1 AS BIGINT) << (yj * 8 + xi)) END
                   ELSE 0 END) AS BIGINT) AS phash
          FROM px JOIN m USING (doc_id) GROUP BY px.doc_id),
        g AS (
          SELECT phash, COUNT(*) AS n_docs,
                 MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM h GROUP BY phash)
        SELECT printf('%016x', phash) AS phash_hex, n_docs, min_doc, max_doc
        FROM g ORDER BY phash_hex""")),

    // Hamming-tolerant perceptual near-dup pairs — the scale path that
    // completes q_multimodal_phash (exact-hash census): a re-encoded or
    // slightly-retouched image lands a few BITS away, not hash-equal.
    // Same pigeonhole banding as q_dedup_simhash: 4×16-bit bands of the
    // aHash — any pair within Hamming ≤ 3 shares at least one intact band
    // (4 bands, 3 flips), so the band join is provably complete at the
    // tolerance; never an all-pairs comparison. Images synthesize as in
    // q_multimodal_phash, except ids with id%11==0 get ONE inverted pixel
    // — a single guaranteed aHash bit flip (the pixel sits ~64 gray
    // levels from the mean; the mean itself moves 2 levels, which cannot
    // flip any other bit) — so the expected output is exactly the
    // (flipped, unflipped-canonical) pairs at Hamming 1.
    //
    // Output is the bounded census per Hamming distance (n_pairs over
    // distinct unordered hash pairs, distances 1..3), not member lists.
    // Oracle recomputes hashes closed-form and verifies via brute pair
    // join over the DISTINCT-hash relation (hash-space-sized, not
    // corpus-sized).
    "q_multimodal_phash_pairs" -> Q(
      fn = (s, d) => {
        import s.implicits._
        val hashes = spreadForKernel(
          Tables(s, d, "documents").select(col("doc_id")).as[Long])
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            // retouch: one inverted pixel for id%11==0 at cell id%64
            it.map(id => synthAHash(id, retouch = true))
          }
          .toDF("phash")
          .distinct()
        val banded = hashes
          .select(col("phash"), explode(sequence(lit(0), lit(3))).as("band"))
          .select(col("phash"), col("band"),
            expr("shiftrightunsigned(phash, band * 16)")
              .bitwiseAND(lit(0xffffL)).as("sig"))
        val pairs = banded.as("a")
          .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.phash") < col("b.phash"))
          .select(col("a.phash").as("ha"), col("b.phash").as("hb"))
          .distinct()
          .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
          .filter(col("dist").between(1, 3))
        pairs.groupBy("dist")
          .agg(count(lit(1)).as("n_pairs"))
          .select(col("dist").cast(LongType).as("hamming"), col("n_pairs"))
          .orderBy("hamming")
      },
      oracle = Some("""
        WITH grid AS (SELECT x.i AS xi, y.j AS yj
                      FROM range(8) x(i), range(8) y(j)),
        px AS (
          SELECT d.doc_id, g.xi, g.yj,
                 (CASE WHEN (CASE WHEN ((doc_id // 5) * 2654435761
                                + g.xi * 7919 + g.yj * 104729) % 97 < 48
                             THEN 1 ELSE 0 END)
                        + (CASE WHEN doc_id % 11 = 0
                                AND g.yj * 8 + g.xi = doc_id % 64
                                THEN 1 ELSE 0 END) = 1
                       THEN 192 ELSE 64 END)
                   + (doc_id + g.xi * 3 + g.yj * 5) % 3 - 1 AS v
          FROM documents d, grid g),
        m AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
        h AS (
          SELECT px.doc_id,
                 CAST(SUM(CASE WHEN 64 * v > m.s
                   THEN CASE WHEN yj * 8 + xi = 63
                             THEN -9223372036854775808
                             ELSE (CAST(1 AS BIGINT) << (yj * 8 + xi)) END
                   ELSE 0 END) AS BIGINT) AS phash
          FROM px JOIN m USING (doc_id) GROUP BY px.doc_id),
        hs AS (SELECT DISTINCT phash FROM h),
        pairs AS (
          SELECT bit_count(xor(a.phash, b.phash)) AS hamming
          FROM hs a JOIN hs b ON a.phash < b.phash
          WHERE bit_count(xor(a.phash, b.phash)) BETWEEN 1 AND 3)
        SELECT CAST(hamming AS BIGINT) AS hamming, COUNT(*) AS n_pairs
        FROM pairs GROUP BY hamming ORDER BY hamming""")),

    // IMAGE↔TEXT pair-alignment audit (r10 verdict ask #8): join the
    // perceptual-hash image clusters against the caption-prefix text
    // clusters and census the contingency of cluster sizes per document —
    // the contamination check a real multimodal corpus pipeline runs
    // before training: a caption duplicated under DIFFERENT images
    // ('text_dup_image_unique') usually means boilerplate/alt-text reuse;
    // a duplicated image under unique captions ('image_dup_text_unique')
    // usually means re-captioned crawl dupes. Composition of two
    // already-established cluster notions (the q_multimodal_phash image
    // hash × the dedup family's text keying), emitted as the bounded
    // (img_n, txt_n) census — never a member-list blowup. The text key is
    // the 3-token caption PREFIX (the classic boilerplate signal), not
    // the full text: the synthetic corpus has zero exact-text dups at the
    // gate scale, so exact-text would leave the text dimension vacuously
    // 1 everywhere — prefix groups make every census category reachable.
    //
    // Scale shape: text clusters key on md5(prefix), NOT raw text — the
    // exchange moves 16-byte keys, not documents; each cluster size is a
    // keyed window count (ONE exchange per key side, reused by the census
    // agg via the same row), so the whole audit is two shuffles over
    // (doc_id, hash) pairs plus a bounded final agg.
    "q_multimodal_align" -> Q(
      fn = (s, d) => {
        import s.implicits._
        val w1 = org.apache.spark.sql.expressions.Window.partitionBy("phash")
        val w2 = org.apache.spark.sql.expressions.Window.partitionBy("tkey")
        spreadForKernel(Tables(s, d, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3))).as("tkey"))
          .as[(Long, String)])
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map { case (id, tkey) => (id, tkey, synthAHash(id, retouch = false)) }
          }
          .toDF("doc_id", "tkey", "phash")
          .withColumn("img_n", count(lit(1)).over(w1))
          .withColumn("txt_n", count(lit(1)).over(w2))
          .withColumn("category",
            when(col("img_n") > 1 && col("txt_n") > 1, "both_dup")
              .when(col("img_n") > 1, "image_dup_text_unique")
              .when(col("txt_n") > 1, "text_dup_image_unique")
              .otherwise("both_unique"))
          .groupBy("img_n", "txt_n", "category")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .orderBy("img_n", "txt_n")
      },
      oracle = Some("""
        WITH grid AS (SELECT x.i AS xi, y.j AS yj
                      FROM range(8) x(i), range(8) y(j)),
        px AS (
          SELECT d.doc_id, g.xi, g.yj,
                 (CASE WHEN ((doc_id // 5) * 2654435761 + g.xi * 7919
                             + g.yj * 104729) % 97 < 48
                       THEN 192 ELSE 64 END)
                   + (doc_id + g.xi * 3 + g.yj * 5) % 3 - 1 AS v
          FROM documents d, grid g),
        m AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
        h AS (
          SELECT px.doc_id,
                 CAST(SUM(CASE WHEN 64 * v > m.s
                   THEN CASE WHEN yj * 8 + xi = 63
                             THEN -9223372036854775808
                             ELSE (CAST(1 AS BIGINT) << (yj * 8 + xi)) END
                   ELSE 0 END) AS BIGINT) AS phash
          FROM px JOIN m USING (doc_id) GROUP BY px.doc_id),
        j AS (
          SELECT h.doc_id, h.phash,
                 md5(array_to_string((string_split(d.text, ' '))[1:3], ' '))
                   AS tkey
          FROM h JOIN documents d USING (doc_id)),
        c AS (
          SELECT doc_id,
                 COUNT(*) OVER (PARTITION BY phash) AS img_n,
                 COUNT(*) OVER (PARTITION BY tkey) AS txt_n
          FROM j)
        SELECT img_n, txt_n,
               CASE WHEN img_n > 1 AND txt_n > 1 THEN 'both_dup'
                    WHEN img_n > 1 THEN 'image_dup_text_unique'
                    WHEN txt_n > 1 THEN 'text_dup_image_unique'
                    ELSE 'both_unique' END AS category,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM c GROUP BY img_n, txt_n
        ORDER BY img_n, txt_n""")))
}

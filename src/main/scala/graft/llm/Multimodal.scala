package graft.llm

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.5): opaque binary payloads with
  * typed metadata, batch "decode"/feature-extraction via mapPartitions, and
  * frame sampling. The image/audio codec itself is STUBBED with a
  * deterministic fake (no media libraries in this environment) — the Spark
  * plumbing (schema, binary round-trip, per-partition batching, sampling)
  * is real and unit-tested (MultimodalSpec).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the schema a 100 TB
    * multimodal corpus would carry alongside text. */
  case class MediaRow(id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  case class MediaFeature(id: Long, n_bytes: Int, checksum: Long,
      mean_byte: Double)

  /** Batch "decode": per-partition loop (the mapInPandas analog in Scala —
    * one tight pass per partition, no per-row closure dispatch). The real
    * decoder would parse payload bytes; the deterministic fake derives
    * features from the bytes themselves. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        var sum = 0L; var check = 17L
        var i = 0
        while (i < m.payload.length) {
          sum += (m.payload(i) & 0xff); check = check * 31 + (m.payload(i) & 0xff); i += 1
        }
        MediaFeature(m.id, m.payload.length, check,
          if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length)
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
        ORDER BY doc_id, idx""")))
}

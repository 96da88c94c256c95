package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2, m01–m02): treat
  * image/audio/video payloads as opaque `binary` columns with a typed
  * metadata struct, and run decode/feature-extraction as a typed
  * per-partition batch transform.
  *
  * The decode itself is a clearly-marked DETERMINISTIC STUB — this
  * container has no media codecs — but everything Spark-side is real
  * and tested: the schema (binary + struct), the partition-preserving
  * batch shape (`mapPartitions`, the Scala analogue of `mapInPandas`
  * batches), and the column plumbing a real codec would drop into.
  */
object Multimodal {

  /** One media object entering the decode stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Decode output: fixed-shape features + header stats. */
  case class DecodedRow(doc_id: Long, mime: String, n_bytes: Int,
                        header_sum: Int, features: Array[Double])

  /** m01: attach a binary payload + typed metadata struct to each
    * document (documents play the role of media objects; the payload is
    * the text's bytes so every derived value is oracle-checkable).
    * Narrow projection — stays in WholeStageCodegen, no shuffle. */
  def binaryWithMeta(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (pmod(col("n_chars"), lit(64)) * 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) * 16).cast("int").as("height")).as("meta"))

  /** m01 verification projection: unpack the struct + payload digest —
    * proves the binary round-trips byte-exactly (md5 parity with the
    * DuckDB oracle) and the struct fields are typed/addressable. */
  def binaryMetaSummary(documents: DataFrame): DataFrame =
    binaryWithMeta(documents).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("digest"))

  /** m02: decode / feature-extract / frame-sample plumbing.
    *
    * STUB DECODE — a production pipeline calls the actual codec here
    * (JPEG decode, audio PCM, video frame sampling); this container has
    * no media libraries, so the "decode" is a deterministic fake: a
    * header checksum over the first 16 bytes (stands in for container
    * parsing) and an 8-bucket normalized byte histogram (stands in for
    * the extracted feature vector / resized thumbnail).
    *
    * The plumbing is the real contract: a typed `Dataset[MediaRow] →
    * Dataset[DecodedRow]` per-partition batch transform —
    * `mapPartitions` receives each partition as one iterator (the batch
    * shape `mapInPandas` gives Python codecs), is partition-preserving
    * (no shuffle — decode parallelism = input partitioning, set
    * upstream by `repartition` on whatever key balances media sizes),
    * and codec state (dictionaries, model weights) can be initialized
    * once per partition before the row loop. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (codec contexts, buffers)
      batch.map { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val headerSum = bytes.take(16).map(_ & 0xff).sum
        val hist = new Array[Double](8)
        bytes.foreach(b => hist((b & 0xff) / 32) += 1.0)
        val n = math.max(bytes.length, 1).toDouble
        DecodedRow(m.doc_id, m.mime, bytes.length, headerSum, hist.map(_ / n))
      }
    }
  }

  /** One sampled frame leaving the frame-extraction stage. */
  case class FrameRow(doc_id: Long, frame_idx: Int, byte_offset: Int,
                      n_bytes: Int, frame_hash: String)

  /** m03: video frame sampling — every `stride` bytes, take a
    * `frameSize`-byte window, up to `maxFrames` per object. In
    * production the window is a container-aware keyframe extraction
    * (the codec seeks to sample points and decodes one frame); the
    * STUB takes the raw byte window — same plumbing, same shape,
    * deterministic, so the oracle can verify every sampled window
    * byte-for-byte via its digest.
    *
    * Same per-partition batch contract as [[decodeStub]]: typed
    * `Dataset → Dataset`, partition-preserving (no shuffle; frame
    * parallelism = input partitioning), codec/digest state initialized
    * once per partition, and the fan-out is streamed through the
    * iterator — a 2-hour video never materializes all its frames in
    * memory at once. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 32,
                   stride: Int = 64, maxFrames: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      batch.flatMap { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        (0 until maxFrames).iterator
          .map(i => (i, i * stride))
          .takeWhile(_._2 < bytes.length)
          .map { case (i, off) =>
            val fr = bytes.slice(off, math.min(off + frameSize, bytes.length))
            md.reset()
            val hex = graft.Exact.hex(md.digest(fr))
            FrameRow(m.doc_id, i, off, fr.length, hex)
          }
      }
    }
  }

  /** m03 as a flat verification frame: video-mime objects only. */
  def frameSummary(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val media = binaryWithMeta(documents)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow]
    sampleFrames(media).toDF()
  }

  /** m02 as a flat verification frame. The stub decode is a pure
    * function of the payload bytes, so it IS oracle-checkable: the
    * DuckDB side recomputes the header checksum and histogram buckets
    * from `ord()` over the same (ASCII) text. Ratios go through
    * Exact.dround — they are small-denominator rationals, the exact
    * case where engine round() implementations disagree. */
  def decodeSummary(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val media = binaryWithMeta(documents)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow]
    decodeStub(media).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("header_sum"),
        graft.Exact.dround(element_at(col("features"), 1)).as("f0"),
        graft.Exact.dround(element_at(col("features"), 4)).as("f3"))
  }
}

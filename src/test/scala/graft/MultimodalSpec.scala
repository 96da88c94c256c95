package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructType}

/** m01/m02: binary-column plumbing + the deterministic decode stub.
  * The stub's arithmetic is pinned exactly (header checksum, byte
  * histogram) so a real codec drop-in changes behavior consciously,
  * not accidentally. */
class MultimodalSpec extends SparkSpec {

  test("m01 schema: binary payload + typed metadata struct") {
    val df = Multimodal.binaryWithMeta(tables.documents)
    df.schema("payload").dataType shouldBe BinaryType
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    meta("mime").dataType shouldBe StringType
    meta("width").dataType shouldBe IntegerType
    meta("height").dataType shouldBe IntegerType
  }

  test("m01 stays a narrow projection (no shuffle)") {
    planOf(Multimodal.binaryWithMeta(tables.documents)) should not include "Exchange"
  }

  test("m01 payload round-trips the text bytes exactly") {
    val r = Multimodal.binaryWithMeta(tables.documents)
      .select(col("doc_id"), col("payload").cast("string").as("back"))
      .join(tables.documents, "doc_id")
      .where(col("back") =!= col("text"))
    r.count() shouldBe 0
  }

  test("m02 decode stub: known bytes give the pinned checksum + histogram") {
    import spark.implicits._
    val payload = Array.tabulate(256)(i => i.toByte) // every byte value once
    val out = Multimodal.decodeStub(
      Seq(MediaRow(1L, payload, "image/png")).toDS()).collect().head
    out.n_bytes shouldBe 256
    out.header_sum shouldBe (0 until 16).sum // first 16 bytes: 0..15
    out.features.length shouldBe 8
    // uniform byte spread: each 32-wide bucket holds exactly 32/256
    out.features.foreach(f => f shouldBe (32.0 / 256.0) +- 1e-12)
  }

  test("m02 decode is deterministic and partition-preserving") {
    import spark.implicits._
    val media = Multimodal.binaryWithMeta(tables.documents)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow].repartition(3)
    val a = Multimodal.decodeStub(media)
    a.rdd.getNumPartitions shouldBe 3
    val run1 = a.collect().map(r => (r.doc_id, r.header_sum, r.features.toSeq)).sortBy(_._1)
    val run2 = Multimodal.decodeStub(media).collect()
      .map(r => (r.doc_id, r.header_sum, r.features.toSeq)).sortBy(_._1)
    run1 shouldBe run2
  }

  test("m02 handles empty and null payloads without dividing by zero") {
    import spark.implicits._
    val rows = Seq(MediaRow(1L, Array.emptyByteArray, "a"), MediaRow(2L, null, "b"))
    val out = Multimodal.decodeStub(rows.toDS()).collect().sortBy(_.doc_id)
    out.foreach { r =>
      r.n_bytes shouldBe 0
      r.header_sum shouldBe 0
      r.features.sum shouldBe 0.0
    }
  }

  test("m03 frame sampling: stride geometry, short-tail frame, exact window digests") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](150)(i => ('a' + i % 26).toByte)
    val media = Seq(MediaRow(1L, payload, "video/mp4"),
      MediaRow(2L, Array.emptyByteArray, "video/mp4")).toDS()
    val out = Multimodal.sampleFrames(media, frameSize = 32, stride = 64, maxFrames = 4)
      .collect().sortBy(r => (r.doc_id, r.frame_idx))
    // 150 bytes @ stride 64: offsets 0, 64, 128 (cap 4 never reached)
    out.map(r => (r.doc_id, r.frame_idx, r.byte_offset, r.n_bytes)) shouldBe Array(
      (1L, 0, 0, 32), (1L, 1, 64, 32), (1L, 2, 128, 22))
    def h(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    out(0).frame_hash shouldBe h(payload.slice(0, 32))
    out(2).frame_hash shouldBe h(payload.slice(128, 150))
  }

  test("m03 respects the frame cap and stays partition-preserving") {
    import spark.implicits._
    val media = Multimodal.binaryWithMeta(tables.documents)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow].repartition(3)
    val frames = Multimodal.sampleFrames(media)
    frames.rdd.getNumPartitions shouldBe 3
    val perDoc = frames.collect().groupBy(_.doc_id).values.map(_.length)
    perDoc.max should be <= 4
    perDoc.min should be >= 1
  }
}

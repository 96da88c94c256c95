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
}

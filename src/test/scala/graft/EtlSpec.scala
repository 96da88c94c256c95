package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.{functions => F}

/** Batching semantics, including the skew-salt variant (SURVEY §5). */
class EtlSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de", 100L + i))
      .toDF("doc_id", "lang", "n_chars")
  }

  test("q03 unsalted: batches of <=10, contiguous ids per lang") {
    val out = Etl.manifestBatches(docs(53)).collect()
    out.map(_.getLong(2)).max should be <= 10L
    // 27 en docs -> 3 batches; 26 de docs -> 3 batches
    out.length shouldBe 6
  }

  test("q03 salted: same coverage, batches of <=10, disjoint batch ids per shard") {
    val plain = Etl.manifestBatches(docs(103))
    val salted = Etl.manifestBatches(docs(103), salt = 4)
    // every file still batched exactly once
    val nPlain = plain.agg(F.sum("n_files")).collect().head.getLong(0)
    val nSalted = salted.agg(F.sum("n_files")).collect().head.getLong(0)
    nSalted shouldBe nPlain
    salted.collect().map(_.getLong(2)).max should be <= 10L
    // deterministic: re-running yields identical assignments
    val again = Etl.manifestBatches(docs(103), salt = 4).collect().toSet
    salted.collect().toSet shouldBe again
    // (lang, batch_id) stays unique — shard offsets cannot collide
    val keys = salted.select("lang", "batch_id").collect()
    keys.toSet.size shouldBe keys.length
  }

  test("annLsh bits sizing follows log2(n / target)") {
    Similarity.suggestBits(2000, 128) shouldBe 4
    Similarity.suggestBits(1L << 30, 128) shouldBe 23
    Similarity.suggestBits(100, 128) shouldBe 1 // floor at 1 bit
  }

  test("gate geometry constants match the real test corpus") {
    // q26/q34/q57 auto-size from the corpus count at run time; their
    // oracles bake the derivation applied to SparkEntry.gateEmbeddingsN.
    // If the driver ever regenerates the embeddings table at a new
    // size, fail HERE with a readable message, not as a hash mismatch.
    val n = spark.read // the gate SF, not this spec's default sfDir
      .parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    n shouldBe SparkEntry.gateEmbeddingsN
    SparkEntry.gateBits shouldBe Similarity.suggestBits(n)
    SparkEntry.gateCells shouldBe Similarity.suggestCells(n)
  }

  test("q76 snapshot diff classifies all four verdicts; fingerprint is normalized") {
    import spark.implicits._
    val prev = Seq(
      (1L, "Same   Text"),   // unchanged (modulo case/whitespace)
      (2L, "old revision"),  // changed
      (3L, "gone by now"))   // removed
      .toDF("doc_id", "text")
    val curr = Seq(
      (1L, "same text"),
      (2L, "new revision"),
      (4L, "fresh crawl"))   // added
      .toDF("doc_id", "text")
    val out = Etl.snapshotDiff(prev, curr).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added")
    // removed rows carry only a prev fingerprint, added only a curr one
    val rows = Etl.snapshotDiff(prev, curr).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    rows(3L)._2 shouldBe null
    rows(4L)._1 shouldBe null
  }

  test("q78 snapshot drift: shares and deltas over a hand mix") {
    import spark.implicits._
    val prev = Seq("a", "a", "b").toDF("source")
    val curr = Seq("a", "b", "b", "b").toDF("source")
    val out = Etl.snapshotDrift(prev, curr).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    out("a") shouldBe ((2L, 1L, 0.6667, 0.25, 0.25 - 0.6667))
    out("b") shouldBe ((1L, 3L, 0.3333, 0.75, 0.75 - 0.3333))
  }
}

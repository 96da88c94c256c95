package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q75: end-to-end invariants of the composed curation pipeline on the
  * real corpus — the per-stage semantics are each pinned by their own
  * operator's spec/oracle; what THIS spec pins is the composition
  * contract (total first-drop-wins attribution + the guarantees the
  * kept set must satisfy). */
class PipelineSpec extends SparkSpec {

  test("q75 every doc gets exactly one verdict, every stage fires on the real corpus") {
    // the synthetic corpus has near-dups but no byte-identical rows, so
    // stage 1 is exercised by re-landing doc 1 under a fresh id (the
    // re-delivery case stage 1 exists for)
    val d0 = tables.documents
    val d = d0.unionByName(
      d0.filter(col("doc_id") === 1).withColumn("doc_id", lit(1000000L)))
    val out = Pipeline.corpusPipeline(d).collect()
    out.length.toLong shouldBe d.count()
    // the re-landed copy lost to the original (min-doc keeper)
    val copy = out.find(_.getLong(0) == 1000000L).get
    copy.getString(1) shouldBe "dup_exact"
    copy.getLong(2) shouldBe 1L
    out.map(_.getLong(0)).distinct.length shouldBe out.length
    val byVerdict = out.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    byVerdict.keySet shouldBe Set("kept", "dup_exact", "dup_near",
      "low_quality", "contaminated")
    byVerdict.values.foreach(_ should be > 0)
    // kept_by is attributed exactly on the dup verdicts
    out.foreach { r =>
      val hasKeeper = !r.isNullAt(2)
      withClue(s"doc=${r.getLong(0)} verdict=${r.getString(1)}: ") {
        hasKeeper shouldBe Set("dup_exact", "dup_near").contains(r.getString(1))
        if (hasKeeper) r.getLong(2) should not be r.getLong(0)
      }
    }
  }

  test("q123 partition law: every doc exactly one verdict, every arm fires, attribution columns exact") {
    val d0 = tables.documents
    val d = d0.unionByName(
      d0.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + lit(500000L)))
    val out = Pipeline.curationRecipe(d).collect()
    // partition law: every input doc exactly once
    out.length.toLong shouldBe d.count()
    out.map(_.getLong(0)).distinct.length shouldBe out.length
    // all seven arms fire on the salted corpus
    val byVerdict = out.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    byVerdict.keySet shouldBe Set("kept", "dup_exact", "dup_near",
      "over_quota", "heuristic_fail", "ppl_tail", "contaminated")
    byVerdict.values.foreach(_ should be > 0)
    // attribution: kept_by on dup verdicts only (and never self);
    // reason on heuristic/ppl/contamination verdicts only
    out.foreach { r =>
      val v = r.getString(1)
      withClue(s"doc=${r.getLong(0)} verdict=$v: ") {
        (!r.isNullAt(2)) shouldBe Set("dup_exact", "dup_near").contains(v)
        if (!r.isNullAt(2)) r.getLong(2) should not be r.getLong(0)
        val reason = Option(r.getString(3))
        v match {
          case "heuristic_fail" => reason should not be empty
          case "ppl_tail"       => reason shouldBe Some("tail")
          case "contaminated"   =>
            Set("exact", "ngram") should contain (reason.get)
          case _                => reason shouldBe None
        }
      }
    }
    // every re-crawled copy lost stage 1 to its original (min-doc keeper)
    out.filter(_.getLong(0) >= 500000L).foreach { r =>
      r.getString(1) shouldBe "dup_exact"
      r.getLong(2) shouldBe (r.getLong(0) - 500000L)
    }
  }

  test("q123 first-drop-wins: a doc's verdict is its FIRST failing stage, later stages never see it") {
    val d = tables.documents
    val out = Pipeline.curationRecipe(d)
    // exact-dup keepers that then failed a later gate carry that later
    // verdict, never dup_exact (first-drop semantics run FORWARD);
    // conversely every over_quota doc would have passed stages 1-3:
    // re-running the quota stage over the stage-3 survivor set must
    // reproduce exactly the over_quota + downstream-verdict docs
    val nonDup = out.filter(!col("verdict").isin("dup_exact", "dup_near"))
      .select("doc_id")
    val corrected = d.join(nonDup, Seq("doc_id"))
    val quotaKept = Corpus.domainQuota(corrected).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val overQ = out.filter(col("verdict") === "over_quota")
      .collect().map(_.getLong(0)).toSet
    val downstream = out.filter(col("verdict")
        .isin("heuristic_fail", "ppl_tail", "contaminated", "kept"))
      .collect().map(_.getLong(0)).toSet
    overQ.intersect(quotaKept) shouldBe empty
    downstream shouldBe quotaKept
  }

  test("q75 kept set guarantees: fingerprint-unique, eval-clean, keepers survive or drop later") {
    val d = tables.documents
    val out = Pipeline.corpusPipeline(d)
    val kept = out.filter(col("verdict") === "kept").select("doc_id")
    val keptFps = d.join(kept, Seq("doc_id"))
      .select(TextOps.fingerprintCol.as("fp")).collect().map(_.getString(0))
    // exact-dedup guarantee survives composition
    keptFps.distinct.length shouldBe keptFps.length
    // decontamination guarantee: no kept fingerprint is an eval fingerprint
    val evalFps = d.filter(col("doc_id") % 7 === 0)
      .select(TextOps.fingerprintCol.as("fp")).collect().map(_.getString(0)).toSet
    keptFps.foreach(fp => evalFps should not contain fp)
    // a dup's keeper is never itself dropped as a dup (it may drop at a
    // LATER stage — that is first-drop-wins, not a contradiction)
    val verdictOf = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(col("verdict").isin("dup_exact", "dup_near")).collect().foreach { r =>
      val kv = verdictOf(r.getLong(2))
      withClue(s"keeper ${r.getLong(2)} of ${r.getLong(0)}: ") {
        Set("kept", "low_quality", "contaminated") should contain (kv)
      }
    }
  }
}

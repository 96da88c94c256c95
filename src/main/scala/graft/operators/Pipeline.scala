package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q75: the composed curation recipe — the four stages every LLM
  * training corpus runs, in the canonical order the per-operator
  * scaladocs prescribe, as ONE operator with first-drop-wins
  * attribution. This is the proof the library COMPOSES: each stage is
  * the already-oracle-checked operator, and the composition itself is
  * hash-checked end-to-end by its own DuckDB oracle.
  *
  *  1. exact dedup (q20/q30 fingerprints, min-doc keeper) — FIRST, per
  *     the Dedup header contract: byte-identical clusters otherwise
  *     turn band buckets quadratic;
  *  2. near-dup clusters over the survivors (q22 MinHash-LSH pairs →
  *     q36 connected components), one keeper per cluster by q55's
  *     (quality DESC, doc_id) rule;
  *  3. quality pruning of the survivors (q61's bottom-`pruneFrac`
  *     per language);
  *  4. exact decontamination against the eval reference (q35).
  *
  * Output: EVERY input doc exactly once — (doc_id, verdict ∈ kept /
  * dup_exact / dup_near / low_quality / contaminated, kept_by = the
  * shadowing doc for the two dup verdicts, else null).
  *
  * Scale shape: each stage is the declared operator's plan (bucketed
  * pairs, never n²; label propagation with localCheckpoint; window
  * prune; broadcast semi-join decontam). The stage-1/2 survivor
  * frames are localCheckpointed — each feeds BOTH its verdict rows
  * and the next stage, and without the cut every downstream stage
  * would re-run the whole upstream pipeline per consumer (diamond
  * recompute). In production each stage is a materialized SINK; the
  * checkpoint is the in-query stand-in. */
object Pipeline {

  def corpusPipeline(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                     bands: Int = 4, tau: Double = 0.5,
                     pruneFrac: Double = 0.2,
                     evalRef: Option[DataFrame] = None): DataFrame = {
    // stage 1: exact dedup
    val fp = documents.select(col("doc_id"), TextOps.fingerprintCol.as("fingerprint"))
    val k1 = fp.groupBy("fingerprint").agg(min(col("doc_id")).as("kept_by"))
    val l1 = fp.join(k1, Seq("fingerprint")).localCheckpoint()
    val dupExact = l1.filter(col("doc_id") =!= col("kept_by"))
      .select(col("doc_id"), lit("dup_exact").as("verdict"), col("kept_by"))
    val surv1 = documents
      .join(l1.filter(col("doc_id") === col("kept_by")).select("doc_id"), Seq("doc_id"))
      .localCheckpoint()

    // stage 2: near-dup keeper (quality is per-doc and set-independent,
    // so it is computed ONCE over the full corpus and joined where needed)
    val quality = TextOps.qualityScore(documents)
      .select(col("doc_id"), col("quality")).localCheckpoint()
    val clusters = Dedup.dedupClusters(surv1, n, numHashes, bands, tau)
    val keep2 = clusters.join(quality, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"),
        col("doc_id").as("keeper"))).as("b"))
      .select(col("cluster_id"), col("b.keeper").as("kept_by"))
    val dupNear = clusters.join(keep2, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("kept_by"))
      .select(col("doc_id"), lit("dup_near").as("verdict"), col("kept_by"))
      .localCheckpoint()
    val surv2 = surv1
      .join(dupNear.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // stage 3: quality prune (rank/count are SET-dependent — q61's rule
    // runs over the stage-2 survivors, exactly as production would)
    val kept3 = TextOps.qualityPrune(surv2, pruneFrac).select("doc_id")
    val lowQ = surv2.select("doc_id")
      .join(kept3, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("low_quality").as("verdict"),
        lit(null).cast("long").as("kept_by"))
    val surv3 = surv2.join(kept3, Seq("doc_id")).localCheckpoint()

    // stage 4: exact decontamination (q35's convention: the eval set
    // defaults to the doc_id % 7 slice of the ORIGINAL corpus)
    val ref = evalRef.getOrElse(documents.filter(col("doc_id") % 7 === 0))
    val cont = TextOps.decontaminate(surv3, ref)
      .select(col("doc_id"), lit("contaminated").as("verdict"),
        lit(null).cast("long").as("kept_by"))
      .localCheckpoint()
    val kept = surv3.select("doc_id")
      .join(cont.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("kept").as("verdict"),
        lit(null).cast("long").as("kept_by"))

    dupExact.unionByName(dupNear).unionByName(lowQ)
      .unionByName(cont).unionByName(kept)
      .orderBy("doc_id")
  }
}

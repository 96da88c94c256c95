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

  /** q123's heuristic-gate thresholds — spliced into the oracle SQL
    * (the q112 DefaultEpochs rule). The stock q67 defaults (minWords
    * 50, minStopwords 2 — Gopher's web-scale settings) pass ZERO
    * documents of the 10-99-word synthetic gate corpus (measured:
    * median 56 words but median stopword hits 1), which would starve
    * every later stage; a real deployment tunes these to its corpus,
    * exactly as CCNet/RefinedWeb tune their published thresholds. */
  private[graft] val RecipeMinWords: Int = 20
  private[graft] val RecipeMinStopwords: Int = 1

  /** q123's n-gram contamination floor — a doc is ngram-contaminated
    * only when it shares at least this many DISTINCT shingles with
    * the eval set (q47's any-overlap rule is the audit form; a
    * composed gate wants meaningful overlap — GPT-3's published
    * decontamination keys on long n-grams for the same reason, and
    * on a phrase-dense corpus a single shared trigram is noise).
    * Spliced into the oracle (the q112 rule). */
  private[graft] val RecipeMinShingles: Int = 5

  /** q123: the FULL published curation recipe composed end-to-end —
    * q75 (round 10) predates half the gates the surface now has; this
    * is the pipeline a RefinedWeb/CCNet-style run actually executes,
    * every stage the already-oracle-checked operator over the running
    * survivor set, with first-drop-wins attribution:
    *
    *  1. exact dedup on RAW text (q20/q30 fingerprints, min-doc
    *     keeper) → `dup_exact` (kept_by = the keeper);
    *  2. LINE CORRECTION of the survivors — [[Dedup.lineCorrect]],
    *     q122's remove-everywhere strip + q80's keep-first dedup
    *     fused over one segmentation. NOT a drop gate: it rewrites
    *     `text`, and every later stage (signatures, quality, LM,
    *     fingerprints) runs over the CORRECTED text — the composition
    *     fact q123 exists to prove;
    *  3. near-dup clusters over corrected survivors (q22 pairs → q36
    *     components), one keeper per cluster by q55's (quality DESC,
    *     doc_id) rule with q28 quality computed on corrected text →
    *     `dup_near`;
    *  4. per-domain quota (q118's salted rank gate) → `over_quota`;
    *  5. quality, two sub-gates in order: q67's heuristic bundle
    *     (first-fail reason carried in `reason`) → `heuristic_fail`,
    *     then q120's perplexity filter (LM trained on the surviving
    *     target-source docs' corrected text; CCNet's keep-head/middle
    *     rule — the `tail` tertile drops, `und` and target-source
    *     docs pass: no evidence is not evidence of junk, and the
    *     target IS the quality reference) → `ppl_tail`;
    *  6. decontamination against the RAW eval reference — exact
    *     (q35) and n-gram (q47) with exact taking precedence in
    *     `reason` → `contaminated`.
    *
    * Output: EVERY input doc exactly once — (doc_id, verdict ∈ kept /
    * dup_exact / dup_near / over_quota / heuristic_fail / ppl_tail /
    * contaminated, kept_by for the dup verdicts, reason = the q67
    * first-fail / 'tail' / 'exact'|'ngram').
    *
    * Scale shape: each stage is the declared operator's plan
    * (broadcast+groupBy dedup, bucketed pairs, salted-prunable quota
    * window, map-side heuristics, broadcast-LM scoring, semi-join
    * decontam); survivor frames localCheckpointed (each feeds its
    * verdict rows AND the next stage — q75's diamond rule; production
    * materializes stages as sinks). Hash-checked end to end by ONE
    * recursive-CTE oracle built from the per-stage oracle CTEs. */
  def curationRecipe(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                     bands: Int = 4, tau: Double = 0.5,
                     maxPerDomain: Int = Corpus.DefaultDomainQuota,
                     targetSource: String = "src0",
                     evalRef: Option[DataFrame] = None): DataFrame = {
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")

    // stage 1: exact dedup on RAW text
    val fp = documents.select(col("doc_id"), TextOps.fingerprintCol.as("fingerprint"))
    val k1 = fp.groupBy("fingerprint").agg(min(col("doc_id")).as("kept_by"))
    val l1 = fp.join(k1, Seq("fingerprint")).localCheckpoint()
    val dupExact = l1.filter(col("doc_id") =!= col("kept_by"))
      .select(col("doc_id"), lit("dup_exact").as("verdict"), col("kept_by"),
        nullS.as("reason"))
    val surv1 = documents
      .join(l1.filter(col("doc_id") === col("kept_by")).select("doc_id"), Seq("doc_id"))

    // stage 2: line correction — text is REWRITTEN for everything below
    val cd = surv1.select("doc_id", "source", "lang")
      .join(Dedup.lineCorrect(surv1).select(col("doc_id"),
        col("cleaned_text")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("cleaned_text").as("text"),
        length(col("cleaned_text")).as("n_chars"))
      .localCheckpoint()

    // stage 3: near-dup keeper over corrected text
    val quality = TextOps.qualityScore(cd)
      .select(col("doc_id"), col("quality")).localCheckpoint()
    val clusters = Dedup.dedupClusters(cd, n, numHashes, bands, tau)
    val keep2 = clusters.join(quality, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"),
        col("doc_id").as("keeper"))).as("b"))
      .select(col("cluster_id"), col("b.keeper").as("kept_by"))
    val dupNear = clusters.join(keep2, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("kept_by"))
      .select(col("doc_id"), lit("dup_near").as("verdict"), col("kept_by"),
        nullS.as("reason"))
      .localCheckpoint()
    val surv2 = cd.join(dupNear.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // stage 4: domain quota
    val kept4 = Corpus.domainQuota(surv2, maxPerDomain).select("doc_id")
    val overQuota = surv2.select("doc_id")
      .join(kept4, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("over_quota").as("verdict"), nullL.as("kept_by"),
        nullS.as("reason"))
    val surv3 = surv2.join(kept4, Seq("doc_id")).localCheckpoint()

    // stage 5a: heuristic gate (corpus-tuned thresholds, see
    // RecipeMinWords)
    val heur = TextOps.heuristicFilter(surv3,
      minWords = RecipeMinWords, minStopwords = RecipeMinStopwords)
      .select(col("doc_id"), col("pass"), col("first_fail")).localCheckpoint()
    val heurFail = heur.filter(col("pass") === 0)
      .select(col("doc_id"), lit("heuristic_fail").as("verdict"),
        nullL.as("kept_by"), col("first_fail").as("reason"))
    val surv4 = surv3
      .join(heur.filter(col("pass") === 1).select("doc_id"), Seq("doc_id"))
      .localCheckpoint()

    // stage 5b: perplexity tail drop. The LM trains on the TARGET
    // DOMAIN's corrected text (stage-2 output), NOT on the pool's own
    // quota/heuristic survivors — CCNet trains its LM on the curated
    // target corpus as-is, and routing training data through the
    // pool's gates starves the LM exactly when the pool is noisy
    // (measured: on the 10x probe corpus every quota-surviving target
    // doc failed the heuristic gate and the fail-loud zero-bigram
    // guard fired). Scored docs = surv4's non-target rows (the frame
    // union puts target docs in once, as training data only);
    // target-source and und docs pass the gate.
    val pplFrame = cd.filter(col("source") === targetSource)
      .unionByName(surv4.filter(col("source") =!= targetSource))
    val pplTail = Corpus.perplexityFilter(pplFrame, targetSource)
      .filter(col("bucket") === "tail")
      .select(col("doc_id"), lit("ppl_tail").as("verdict"), nullL.as("kept_by"),
        lit("tail").as("reason"))
      .localCheckpoint()
    val surv5 = surv4.join(pplTail.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // stage 6: decontamination vs the RAW eval reference — exact wins
    // the reason on a double hit ('exact' < 'ngram', min())
    val ref = evalRef.getOrElse(documents.filter(col("doc_id") % 7 === 0))
    val contExact = TextOps.decontaminate(surv5, ref)
      .select(col("doc_id"), lit("exact").as("creason"))
    val contNgram = Dedup.decontaminateNgram(surv5, ref)
      .filter(col("n_shared_shingles") >= RecipeMinShingles)
      .select(col("doc_id"), lit("ngram").as("creason"))
    val cont = contExact.unionByName(contNgram)
      .groupBy("doc_id").agg(min("creason").as("reason"))
      .select(col("doc_id"), lit("contaminated").as("verdict"),
        nullL.as("kept_by"), col("reason"))
      .localCheckpoint()
    val kept = surv5.select("doc_id")
      .join(cont.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("kept").as("verdict"), nullL.as("kept_by"),
        nullS.as("reason"))

    dupExact.unionByName(dupNear).unionByName(overQuota)
      .unionByName(heurFail).unionByName(pplTail)
      .unionByName(cont).unionByName(kept)
      .orderBy("doc_id")
  }

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

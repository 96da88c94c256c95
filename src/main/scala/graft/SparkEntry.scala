package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, timestamp_seconds, when}
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{Analytics, Corpus, Dedup, Etl, Multimodal, Pipeline, Relational, Report, Retrieval, Similarity, TextOps}
import graft.streaming.Streams

/** Driver contract — see SURVEY.md §2 for the capability each key
  * covers. Every query has a matching DuckDB oracle in [[oracleSql]]
  * with identically-aliased columns (the driver sorts columns by name
  * and hash-compares values). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables(spark, "/root/testdata/sf0.001").lineitem)

  /** Per-invocation scratch dir for the declared queries that need a
    * filesystem (s08/s09 band index + landing + checkpoints, q56 run
    * reports), deleted on JVM exit — repeated Bench/Verify runs in one
    * host session previously accumulated unbounded parquet trees in
    * /tmp (round-9 ADVICE). One hook per dir; a handful per run. */
  private def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try {
        val s = Files.walk(p)
        try s.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
        finally s.close()
      } catch { case _: Throwable => () } // exit-path cleanup: best effort
    }))
    p.toString
  }

  /** q129's per-process index scratch: ONE dir + ONE shutdown hook for
    * the whole JVM (r16 advice — a per-invocation scratchDir
    * accumulated hooks and on-disk index copies over long bench
    * chains: 3+ reps plus retries/re-probes). Safe to share because
    * the q129 build writes mode("overwrite") — each invocation
    * replaces the artifact in place. The STREAMING scratch users
    * (s08/s09/s15/s18) stay per-invocation on purpose: reusing a
    * checkpoint dir would make later reps resume state instead of
    * reprocessing (Bench's "a floor is a full execution" contract). */
  private lazy val bm25IdxDir: String = scratchDir("graft_bm25idx")

  /** q130's per-process index scratch — same rationale and overwrite
    * contract as [[bm25IdxDir]]. */
  private lazy val annIdxDir: String = scratchDir("graft_annidx")

  /** q131's per-process index scratch — separate from [[bm25IdxDir]]
    * (q131 rebuilds base + append per invocation; sharing q129's dir
    * would race the two queries' artifacts within one run). The
    * build's mode("overwrite") resets the dir each rep, so the append
    * never compounds across reps. */
  private lazy val bm25AppendDir: String = scratchDir("graft_bm25app")

  /** q132's per-process index scratch — [[bm25AppendDir]]'s rationale
    * on the ANN leg. */
  private lazy val annAppendDir: String = scratchDir("graft_annapp")

  /** q133's per-process index scratch. */
  private lazy val annDriftDir: String = scratchDir("graft_anndrift")

  /** q134's per-process index scratch (both hybrid legs' artifacts). */
  private lazy val hybridIdxDir: String = scratchDir("graft_hybrid")

  /** q135's per-process index scratch. */
  private lazy val bm25DriftDir: String = scratchDir("graft_bm25drift")

  /** q136's per-process index scratch. */
  private lazy val annRotateDir: String = scratchDir("graft_annrotate")

  /** q137's per-process index scratch. */
  private lazy val annFilterDir: String = scratchDir("graft_annfilter")

  /** q137's two serving filters — (label, modulus): neighbor vec_id ≡
    * 0 (mod m), a 50% (non-selective) and a 10% (selective) stratum.
    * One constant list, spliced into the declared query AND the
    * oracle (the house splice rule). */
  private val FilteredServeLegs: Seq[(String, Long)] =
    Seq(("decile", 10L), ("even", 2L))

  /** q136's drift population: a per-coordinate TRANSLATION of the
    * re-crawled slice — off-distribution under the frozen quantizers
    * (the alarm fires) but congruent to the base population, so
    * retraining over the union absorbs it (the alarm clears). One
    * constant, spliced into the declared query AND the oracle (the
    * house splice rule); 0.25 is exactly representable, so the
    * translated coordinates stay bit-identical across engines. */
  private val RotateDriftOffset = "0.25"

  /** STRUCTURAL delivery-order pinning for the multi-batch intake
    * streams (s09/s15/s23/s24): land ONE batch file, drain the stream
    * to completion (Trigger.AvailableNow + awaitTermination against
    * the stream's standing checkpoint), then land the next and drain
    * again — micro-batch order is now program-structural (batch N is
    * the ONLY unprocessed file when drain N starts; the checkpoint's
    * seen-files log carries across drains, so drain N+1 picks up
    * exactly the new file). Until r18 these queries pinned order by
    * FILE MTIME (maxFilesPerTrigger=1 over a pre-landed directory),
    * hanging gate correctness off FileStreamSource's listing order —
    * fragile by construction, and the r18 driver's one red row (s24,
    * 2 rows / schema ok / hash off) is exactly the b1/b2-swap
    * signature. `mkQuery` must build a FRESH query over the landing
    * dir with the SAME checkpoint dir each call. Delivery-order
    * immunity is spec-pinned in StreamingSpec (adversarially inverted
    * mtimes cannot reorder structurally-drained batches). */
  private def drainInOrder(landing: String,
      batches: Seq[(String, DataFrame)])
      (mkQuery: () => org.apache.spark.sql.streaming.StreamingQuery): Unit =
    batches.foreach { case (name, df) =>
      val stage = s"${landing}_stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part file staged under $stage"))
      val dest = java.nio.file.Paths.get(s"$landing/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      val q = mkQuery()
      q.awaitTermination(); q.stop()
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core ETL surface
    "q01_ingest_normalize"   -> ((s, d) => Etl.ingestNormalize(Tables(s, d).events)),
    "q02_validate_quarantine"-> ((s, d) => Etl.validateSummary(Tables(s, d).documents)),
    "q03_manifest_batching"  -> ((s, d) => Etl.manifestBatches(Tables(s, d).documents)),
    "q04_status_shards"      -> ((s, d) => Etl.statusShards(Tables(s, d).documents)),
    "q05_daily_summary"      -> ((s, d) => Analytics.dailySummary(Tables(s, d).events)),
    "q06_failed_filter"      -> ((s, d) => Analytics.failedEvents(Tables(s, d).events)),
    "q07_duration_stats"     -> ((s, d) => Analytics.durationStats(Tables(s, d).events)),
    "q08_correlation_join"   -> ((s, d) => Analytics.correlationJoin(Tables(s, d).events)),
    "q09_percentiles"        -> ((s, d) => Analytics.valueStats(Tables(s, d).events)),
    "q10_hourly_velocity"    -> ((s, d) => Analytics.hourlyVelocity(Tables(s, d).events)),
    "q11_peak_topk"          -> ((s, d) => Analytics.peakHours(Tables(s, d).events)),
    "q18_output_sizing"      -> ((s, d) => Analytics.outputSizing(Tables(s, d).events)),
    // q96: the reference's archived worker/cost calculator as a frame
    // operator (r12 verdict "what's missing" #1): per-source sizing ->
    // every worker tier's projected wall time, dollars and DPU-hours
    "q96_cost_projection"    -> ((s, d) =>
      Analytics.costProjection(Analytics.corpusSizing(Tables(s, d).documents))),
    // q103: q96 calibrated from MEASURED history (r13 verdict #6) —
    // the corpus sizing projected at throughputs derived from a run
    // log instead of the reference calculator's literal spec table.
    // The declared history is the events table read as a run log
    // (deterministic, so the oracle replays it — q56's precedent:
    // real reportedWrite timings are spec-covered, not oracle-graded).
    "q103_cost_calibrated"   -> ((s, d) => {
      val t = Tables(s, d)
      Analytics.costProjectionMeasured(Analytics.corpusSizing(t.documents),
        Analytics.runHistoryFromEvents(t.events))
    }),
    "q42_rollup_report"      -> ((s, d) => Analytics.rollupReport(Tables(s, d).events)),
    "q43_event_pivot"        -> ((s, d) => Analytics.eventPivot(Tables(s, d).events)),
    "q19_schema_drift"       -> ((s, d) => Etl.schemaDriftUnion(Tables(s, d).events)),
    "q31_status_latest"      -> ((s, d) => Etl.statusLatest(Tables(s, d).events)),
    "q32_velocity_projection"-> ((s, d) => Analytics.velocityProjection(Tables(s, d).events)),
    "q33_extension_validate" -> ((s, d) => Etl.validateWithExtension(Tables(s, d).documents)),
    // q76: synthetic two-snapshot split of one corpus — doc_id ≡ 6
    // (mod 7) plays the newly-crawled docs (absent from prev), ≡ 5 the
    // deleted ones (absent from curr), ≡ 0 the re-crawled revisions
    // (prev carries a ' rev0' suffix) — so all four verdicts fire.
    "q76_snapshot_diff"      -> ((s, d) => {
      val docs = Tables(s, d).documents
      val prev = docs.filter(col("doc_id") % 7 =!= 6)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev0")))
            .otherwise(col("text")))
      val curr = docs.filter(col("doc_id") % 7 =!= 5)
      Etl.snapshotDiff(prev, curr)
    }),
    // q78: same snapshot split as q76 (content edits don't move counts,
    // so no rev0 needed), drift over the source mix
    "q78_snapshot_drift"     -> ((s, d) => {
      val docs = Tables(s, d).documents
      Etl.snapshotDrift(
        docs.filter(col("doc_id") % 7 =!= 6),
        docs.filter(col("doc_id") % 7 =!= 5))
    }),
    // q51: q09's declared 100 TB path as a first-class query — GK
    // mergeable-sketch percentiles (no per-group sort). Sketch values
    // aren't bit-replicable in DuckDB, so the declared query certifies
    // them in-plan (±1% rank window vs exact) and emits the verdict
    // booleans the oracle can hash-match; AnalyticsSpec additionally
    // pins the bound on the raw valueStats(exact=false) path.
    "q51_percentile_sketch"  -> ((s, d) => Analytics.sketchPercentileCertified(Tables(s, d).events)),
    "q49_profile"            -> ((s, d) => Report.profile(Tables(s, d).events)),
    // q117: the corpus DATASHEET — seven operator families composed
    // into one (section, item, value) report: size/composition,
    // quality value-at-rank, duplication, contamination (q47's eval
    // convention), language purity.
    "q117_datasheet"         -> ((s, d) => {
      val docs = Tables(s, d).documents
      Report.datasheet(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    // q121: the datasheet's 100 TB quality path made gradable — the
    // quality section rides approx_percentile, certified in-plan
    // against exact ±1%-rank value windows (q51's convention); the
    // uncertified certify=false form is the sort-free production shape
    "q121_datasheet_sketch"  -> ((s, d) => {
      val docs = Tables(s, d).documents
      Report.datasheetSketch(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    // q73: q49's 100 TB HLL flag, certified in-plan (q51's pattern) —
    // the oracle hash-checks the exact columns plus all-true sketch
    // verdicts
    "q73_profile_sketch"     -> ((s, d) => Report.profileSketchCertified(Tables(s, d).events)),
    "q50_dup_report"         -> ((s, d) => Report.dupReport(Tables(s, d).documents)),
    // q90: q60's directed containment lifted to SOURCE pairs — the
    // catalog-level overlap matrix behind source selection.
    "q90_source_overlap"     -> ((s, d) => Report.sourceOverlap(Tables(s, d).documents)),
    // q91: duplication-structure report — q36's clusters regrouped
    // into a size histogram (the number dedup policy is set from).
    "q91_cluster_histogram"  -> ((s, d) => Report.clusterHistogram(Tables(s, d).documents)),
    // Analytical engine
    "q12_pricing_summary"    -> ((s, d) => Relational.pricingSummary(Tables(s, d).lineitem)),
    "q13_join_agg"           -> ((s, d) => { val t = Tables(s, d)
                                  Relational.shippingPriority(t.customer, t.orders, t.lineitem) }),
    "q14_broadcast_dims"     -> ((s, d) => { val t = Tables(s, d)
                                  Relational.regionRevenue(t.lineitem, t.supplier, t.nation, t.region) }),
    "q15_window_rank"        -> ((s, d) => Relational.topOrdersPerCustomer(Tables(s, d).orders)),
    "q16_running_total"      -> ((s, d) => Relational.runningTotal(Tables(s, d).orders)),
    "q17_sessionization"     -> ((s, d) => Relational.sessionize(Tables(s, d).events)),
    "q39_asof_join"          -> ((s, d) => Relational.asofJoin(Tables(s, d).events)),
    "q52_salted_join"        -> ((s, d) => { val t = Tables(s, d)
                                  Relational.saltedRevenueByStatus(t.lineitem, t.orders) }),
    // LLM-training-data operators
    "q20_dedup_exact"        -> ((s, d) => TextOps.dedupExact(Tables(s, d).documents)),
    "q21_dedup_ngram"        -> ((s, d) => Dedup.ngramJaccardPairs(Tables(s, d).documents)),
    // q114: leak-proof eval holdout — q38's deterministic split with
    // the cross-split near-dup audit built in (side-tagged q21 index,
    // only eval x train pairs expand); verdict = leaked + smallest
    // condemning trainer.
    "q114_holdout_split"     -> ((s, d) => Dedup.holdoutSplit(Tables(s, d).documents)),
    // q71: the df-cap blind-spot audit as a first-class query — maxDf
    // sized to the test corpus (max df there is ~7) so BOTH branches
    // (kept and dropped shingles) are exercised at the grading SF;
    // production audits its real cap (~10^4) the same way.
    "q71_dfcap_audit"        -> ((s, d) => Dedup.dfCapAudit(Tables(s, d).documents, maxDf = 4)),
    "q60_containment_ngram"  -> ((s, d) => Dedup.ngramContainmentPairs(Tables(s, d).documents)),
    "q66_winnow_pairs"       -> ((s, d) => Dedup.winnowPairs(Tables(s, d).documents)),
    "q22_dedup_minhash"      -> ((s, d) => Dedup.minhashLshPairs(Tables(s, d).documents)),
    "q36_dedup_clusters"     -> ((s, d) => Dedup.dedupClusters(Tables(s, d).documents)),
    // q75: the composed 4-stage curation recipe (exact dedup → near-dup
    // keeper → quality prune → decontaminate) with first-drop-wins
    // attribution — the end-to-end composition proof, oracle-checked
    "q75_corpus_pipeline"    -> ((s, d) => Pipeline.corpusPipeline(Tables(s, d).documents)),
    // q123: the FULL published curation recipe (r15 verdict #2) — the
    // r12-r15 gates composed end to end: exact dedup → fused q80+q122
    // line correction (text rewritten for every later stage) →
    // near-dup keeper → domain quota → heuristic + perplexity quality
    // → exact + n-gram decontamination, first-drop-wins attribution.
    // Salted with verbatim re-crawls at +500000 (the q97/q101
    // convention) — the gate corpus carries no organic byte-dups, and
    // a recipe whose dup_exact arm cannot fire would be a weak gate.
    "q123_curation_recipe"   -> ((s, d) => {
      val docs = Tables(s, d).documents
      Pipeline.curationRecipe(docs.unionByName(
        docs.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + lit(500000L))))
    }),
    "q55_keeper_select"      -> ((s, d) => Dedup.keeperSelection(Tables(s, d).documents)),
    "q37_pii_redact"         -> ((s, d) => Corpus.piiRedactVerification(Tables(s, d).documents)),
    "q38_sample_stratified"  -> ((s, d) => Corpus.sampleStratified(Tables(s, d).documents)),
    "q59_source_mix"         -> ((s, d) => Corpus.sourceMix(Tables(s, d).documents)),
    // q107: temperature-scaled LANGUAGE mixing (α = 0.5) — q59's LP
    // with the target proportions derived from the observed counts by
    // the multilingual sampling recipe; sqrt-composed weights keep the
    // thresholds bit-identical across engines.
    "q107_temperature_mix"   -> ((s, d) => Corpus.temperatureMix(Tables(s, d).documents)),
    // q110: DSIR-style domain-match selection (Xie et al. 2023) —
    // hashed-bigram bag models for target (src0) vs raw, per-doc
    // importance score as an exact integer probability difference
    // (decimal(38) / HUGEINT — the q95 no-logs rule), deterministic
    // top-k instead of Gumbel sampling.
    "q110_dsir_select"       -> ((s, d) => Corpus.domainSelect(Tables(s, d).documents)),
    // q120: CCNet's perplexity filter — hashed-bigram LM on the target
    // source, integer-log2 surprise, per-language head/middle/tail
    "q120_perplexity_filter" -> ((s, d) => Corpus.perplexityFilter(Tables(s, d).documents)),
    // q124: q120's PRODUCTION shape — sketch tertile thresholds
    // certified in-plan against exact ±1%-rank windows (q51/q121's
    // convention); the sort-free certify=false path is spec-pinned
    "q124_perplexity_sketch" -> ((s, d) =>
      Corpus.perplexityFilterSketch(Tables(s, d).documents)),
    // q111: pairwise source-distribution divergence (total variation
    // over hashed-unigram buckets) — the corpus-drift diagnostic run
    // before re-deriving mixture weights; exact integer numerator +
    // one IEEE division (TVD is rational; KL's logs are not
    // bit-stable, q95's rule).
    "q111_source_divergence" -> ((s, d) => Corpus.sourceDivergence(Tables(s, d).documents)),
    // q112: epoch-factor mixing — the published mixture-table recipe
    // (fractional epochs per source) materialized as a deterministic
    // training-plan multiset: floor(e) full epochs + the q38 md5 gate
    // for the fraction; unlisted sources pass through at one epoch.
    "q112_epoch_mix"         -> ((s, d) => Corpus.epochMix(Tables(s, d).documents)),
    // q113: deterministic global shuffle into training shards — a
    // salted 48-bit md5 key picks shard and in-shard position, so the
    // training order is random-looking, reproducible, append-stable,
    // and oracle-replayable (q38's purity rule applied to ORDER).
    "q113_shuffle_shards"    -> ((s, d) => Corpus.shuffleShards(Tables(s, d).documents)),
    // q118: RefinedWeb-style per-domain quota — deterministic salted
    // md5-rank gate caps each source at DefaultDomainQuota docs
    "q118_domain_quota"      -> ((s, d) => Corpus.domainQuota(Tables(s, d).documents)),
    // q126: q118's hot-domain execution plan (r15 verdict #4) — salted
    // bounded pre-prune (keep-set superset per salt slice) before the
    // unchanged exact gate; output row-identical to q118 at any salt
    // count, hash-checked via the shared oracle
    "q126_domain_quota_pruned" -> ((s, d) =>
      Corpus.domainQuota(Tables(s, d).documents, salts = 16)),
    "q40_pack_sequences"     -> ((s, d) => Corpus.packSequences(Tables(s, d).documents)),
    // q72: q40's sharded scale plan — shardSize 64 yields ~8 shards at
    // the grading SF, so the parallel path (not a degenerate one-shard
    // run) is what the shared q40 oracle hash-checks
    "q72_pack_sharded"       -> ((s, d) => Corpus.packSequencesSharded(Tables(s, d).documents)),
    // q119: best-fit-decreasing bin packing in bounded shards — docs
    // stay whole (q40 splits straddlers); the oracle's recursive CTE
    // replays every placement move-for-move
    "q119_pack_bfd"          -> ((s, d) => Corpus.packBfd(Tables(s, d).documents)),
    "q77_zorder_layout"      -> ((s, d) => Corpus.layoutZOrder(Tables(s, d).documents)),
    "q41_repetition"         -> ((s, d) => TextOps.repetitionSignals(Tables(s, d).documents)),
    "q53_chunk_sliding"      -> ((s, d) => Corpus.chunkSliding(Tables(s, d).documents)),
    // q81: real subword tokenization — the greedy BPE merge loop as a
    // native expression; the oracle replays every merge step as a
    // recursive CTE over the distinct-word dictionary, so the exact
    // token identity (not just counts) is hash-checked.
    "q81_bpe_encode"         -> ((s, d) => TextOps.bpeEncode(Tables(s, d).documents)),
    // q82: encode-then-pack end-to-end — q40's packing plan budgeted
    // by BPE tokenizer tokens instead of whitespace words (the measure
    // a training pipeline actually packs context windows by).
    "q82_bpe_pack"           -> ((s, d) =>
      Corpus.packSequences(Tables(s, d).documents,
        nTokens = org.apache.spark.sql.functions.size(
          graft.functions.Bpe.encode(col("text"))).cast("long"))),
    // q83: LEARN the merge table from the corpus (the training loop
    // q81's encoder consumes); oracle replays all rounds as unrolled
    // SQL generated from the same nMerges constant.
    "q83_bpe_train"          -> ((s, d) =>
      graft.functions.Bpe.train(Tables(s, d).documents)),
    // q84: train-then-encode end-to-end — the tokenizer fit to its own
    // corpus, exact subword identity under the LEARNED (data-
    // dependent) table hash-checked against the oracle's replay of
    // both the training chain and the greedy encode.
    "q84_bpe_encode_trained" -> ((s, d) =>
      TextOps.bpeEncodeTrained(Tables(s, d).documents)),
    // q86: marked (boundary-preserving) encode + LOSSLESS decode — the
    // oracle's `decoded` is the space-normalized original text, so the
    // hash check is the corpus-wide losslessness proof.
    "q86_bpe_decode"         -> ((s, d) => TextOps.bpeRoundtrip(Tables(s, d).documents)),
    // q88: corpus token accounting per (source, lang) under the real
    // tokenizer measure — docs, tokens, token share.
    "q88_token_budget"       -> ((s, d) => TextOps.tokenBudget(Tables(s, d).documents)),
    // q108: tokenizer fertility/compression per (source, lang) — the
    // multilingual tokenizer-health table (subwords per word, chars
    // per token), one scan + one group-cardinality agg
    "q108_tokenizer_fertility" -> ((s, d) =>
      TextOps.tokenizerFertility(Tables(s, d).documents)),
    // q109: certified heavy hitters — exact top-20 tokens + in-plan
    // certification of the native Misra-Gries mergeable sketch (the
    // q51/q73 pattern applied to frequency; verdicts deterministic by
    // the MG theorems, so the sketch path is hash-checkable)
    "q109_heavy_hitters" -> ((s, d) =>
      TextOps.heavyHittersCertified(Tables(s, d).documents)),
    "q44_tfidf_terms"        -> ((s, d) => TextOps.tfidfTopTerms(Tables(s, d).documents)),
    // q116: mixed-language detection — q27's marker argmax per
    // 16-token SEGMENT (CCNet's per-paragraph convention) with an
    // explicit und verdict; dominant lang, adjacent-segment switches,
    // is_mixed. Marker lists spliced into the oracle from the same
    // Scala value.
    "q116_lang_mix_detect"   -> ((s, d) => TextOps.langMixDetect(Tables(s, d).documents)),
    // q89: the serving form of a linear bag-of-words quality
    // classifier — broadcast model table, map-side weight lookup,
    // integer keep verdict.
    "q89_model_filter"       -> ((s, d) => TextOps.modelFilter(Tables(s, d).documents)),
    // q95: q89's TRAINING half (the q83 train+apply convention): learn
    // sign-vote weights from the q28-quality heuristic labels (the
    // CCNet/DCLM bootstrap — rules label, the model generalizes), then
    // serve through q89's machinery verbatim; oracle replays label →
    // train → serve end to end
    "q95_model_train_filter" -> ((s, d) => TextOps.trainThenFilter(Tables(s, d).documents)),
    // q92: deterministic feature-hashing ±1 projection embeddings —
    // integer vectors, one per-row pass, full identity hash-checked;
    // the documents→Similarity composition bridge (embedFrame).
    "q92_text_embed"         -> ((s, d) => TextOps.textEmbed(Tables(s, d).documents)),
    // q93: SemDeDup over RAW TEXT, oracle-checked end to end — q92's
    // embeddings through q57's exact chain (tau=0.9: this corpus's
    // bag cosines concentrate near 0.6, 0.9 isolates near-verbatim).
    // maxCell is lifted to 32x target: hashed BAG embeddings are
    // anisotropic (real text embeddings are too) — a MEASURED law
    // since r14 (SimilaritySpec "q93 anisotropy law", SkewProbe):
    // seed skew 1.18x on the synthetic table vs 3.99x on bags at
    // sf0.1, and it GROWS with scale, so the 8x allowance is in
    // reach of the trend at probe scales while 32x keeps >=8x
    // headroom; production balances cells with trainedCentroids
    // instead (measured: worst bag cell 499 -> 231 at 2 rounds).
    // embedFrame is localCheckpointed (the q75/q90 diamond rule):
    // semanticDedup consumes its input in three plan subtrees, and
    // for q93 the per-token embedding pass IS the dominant cost —
    // uncheckpointed it would run three times.
    "q93_semantic_dedup_text" -> ((s, d) =>
      Similarity.semanticDedup(
        TextOps.embedFrame(Tables(s, d).documents).localCheckpoint(),
        tau = 0.9, maxCell = 4096)),
    // q106: q93 under the TRAINED quantizer — the exact remedy the
    // q93 row documents for its anisotropy lift ("production balances
    // cells with trainedCentroids"), now declared: hashed BAG
    // embeddings skew seed cells ~4x target (SkewProbe, sf0.1) and 2
    // Lloyd rounds pull the worst cell 499 -> 231, so the in-cell
    // pair pass stays near its n²/c floor on real text. Same tau,
    // same verdict columns; the oracle splices trainedCentCtes
    // between q92's embedding CTEs and the unchanged q57 body
    // (seed count derived from the doc corpus on both sides).
    "q106_semantic_dedup_text_trained" -> ((s, d) => {
      val f = TextOps.embedFrame(Tables(s, d).documents).localCheckpoint()
      val nc = Similarity.suggestCells(f.count())
      Similarity.semanticDedup(f, tau = 0.9, maxCell = 4096,
        centroids = Some(Similarity.trainedCentroids(f, nCells = nc,
          rounds = 2)))
    }),
    // q100: semantic text SEARCH — the search sibling of q93's dedup
    // composition: q92's embeddings through q46's IVF machinery
    // verbatim (top-5 cosine neighbors per query doc, probe-pruned);
    // the embed frame is checkpointed (q93's diamond rule — annIvf
    // consumes it in three subtrees)
    "q100_ann_text"          -> ((s, d) =>
      Similarity.annIvf(
        TextOps.embedFrame(Tables(s, d).documents).localCheckpoint(),
        nQueries = 10, k = 5)),
    // q127: BM25 top-k — the LEXICAL retrieval leg (inverted-index
    // posting-list join, integer-exact scoring; see Retrieval.scala).
    // Same 10-lowest-doc_id query set as q25/q100, so the three
    // search legs (lexical / IVF-semantic / fused) are comparable
    // row-for-row.
    "q127_bm25_topk"         -> ((s, d) =>
      Retrieval.bm25TopK(Tables(s, d).documents)),
    // q128: hybrid retrieval — reciprocal rank fusion of q127's
    // lexical pool and the q92-embedding exact-cosine pool (both
    // top-20), the standard two-list RRF combiner.
    "q128_rrf_fusion"        -> ((s, d) =>
      Retrieval.rrfFusion(Tables(s, d).documents)),
    // q134: HYBRID retrieval served from the PERSISTED artifacts (r17
    // verdict #4) — the production serving point: the lexical pool
    // from the q129 BM25 index (shard-pruned serve, pool-identical to
    // q128's lexical leg), the semantic pool from a q130-style
    // trained IVF-PQ index over the SAME text embeddings (cell-pruned
    // serve — the honest nProbe/rerank-bounded answer, q125's
    // trade), fused by q128's RRF law. Own oracle: bm25 pool CTEs +
    // text-embedding CTEs -> trained-index + search chain -> the same
    // fusion SQL.
    "q134_hybrid_index_served" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val dir = hybridIdxDir
      // the two artifact builds are INDEPENDENT (different inputs,
      // different dirs) — overlap them so the ANN build's jobs
      // back-fill executors the BM25 build's tail leaves idle (guide
      // §2.6: actions are only sequential because driver code calls
      // them sequentially). Results are byte-identical to the
      // sequential build; only wall-clock changes.
      val bmF = concurrent.Future(Retrieval.writeBm25Index(docs, s"$dir/bm25"))(
        concurrent.ExecutionContext.global)
      val emb = TextOps.embedFrame(docs).localCheckpoint()
      Similarity.writeAnnIndex(emb, s"$dir/ann")
      concurrent.Await.result(bmF, concurrent.duration.Duration.Inf)
      Retrieval.rrfFusionServed(
        Retrieval.readBm25Index(s, s"$dir/bm25"),
        Similarity.readAnnIndex(s, s"$dir/ann"),
        emb,
        docs.filter(col("doc_id") < 10)
          .select(col("doc_id").as("query_id"), col("text")))
    }),
    // q129: the PERSISTED inverted index — q127's production artifact
    // lifecycle (write postings/lexicon/stats → validated read →
    // shard-pruned serve), exercised end to end like q101's store;
    // serves the q127 query set with self-exclusion, so the output is
    // row-identical to q127 and shares its oracle VERBATIM (the q126
    // identity convention — the driver hash-checks it every round).
    "q129_bm25_index_served" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val dir = bm25IdxDir
      Retrieval.writeBm25Index(docs, s"$dir/index")
      Retrieval.bm25ServeIndex(
        Retrieval.readBm25Index(s, s"$dir/index"),
        docs.filter(col("doc_id") < 10)
          .select(col("doc_id").as("query_id"), col("text")),
        excludeId = true)
    }),
    // q131: INCREMENTAL index append (r16 verdict #4 — the q45/q101/
    // s08 intake convention on the lexical leg): build the index on
    // the standing corpus (doc_id ≢ 9 mod 10), APPEND the intake
    // batch (≡ 9 — q45's split), serve the q127 query set. df/dl/
    // stats merge associatively, so append ≡ from-scratch rebuild
    // EXACTLY and the serve shares q127's oracle verbatim — the
    // identity is driver-hash-checked every round, and RetrievalSpec
    // additionally pins merged-lexicon/stats equality with a rebuild.
    "q131_bm25_index_appended" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val dir = bm25AppendDir
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 10 =!= 9), s"$dir/index")
      Retrieval.appendBm25Index(s, docs.filter(col("doc_id") % 10 === 9), s"$dir/index")
      Retrieval.bm25ServeIndex(
        Retrieval.readBm25Index(s, s"$dir/index"),
        docs.filter(col("doc_id") < 10)
          .select(col("doc_id").as("query_id"), col("text")),
        excludeId = true)
    }),
    "q54_oov_rate"           -> ((s, d) => TextOps.oovRate(Tables(s, d).documents)),
    "q74_novelty_score"      -> ((s, d) => TextOps.noveltyScore(Tables(s, d).documents)),
    // q45: every doc_id ≡ 9 (mod 10) plays the incoming intake batch;
    // the rest is the already-deduped corpus contributing only its
    // band index — the persisted-index production pattern.
    // q101: q45's incremental pattern for the SEMANTIC family — the
    // already-admitted corpus persists as a cell-partitioned
    // admitted-vector store (centroid-stamped), the intake batch
    // probes it: condemned iff within tau of any store cell-mate.
    // The declared query exercises the FULL artifact lifecycle
    // (write → validated read → probe), like s08's band index.
    // The intake is salted with verbatim re-crawls of store vectors
    // (q76's trick, offset past every id space) so the condemnation
    // path FIRES and is hash-checked — the synthetic corpus has no
    // organic cross-split pairs within tau.
    "q101_semantic_dedup_incremental" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val store = e.filter(col("vec_id") % 10 =!= 9)
      val copies = store.filter(col("vec_id") % 50 === 0)
        .withColumn("vec_id", col("vec_id") + lit(300000L))
      val intake = e.filter(col("vec_id") % 10 === 9).unionByName(copies)
      val cents = Similarity.seedCentroids(store, 16)
      val dir = scratchDir("graft_semstore")
      Similarity.writeSemanticStore(store, s"$dir/store", cents)
      Similarity.semanticProbeStore(intake,
        Similarity.readSemanticStore(s, s"$dir/store", cents), cents)
    }),
    "q45_dedup_incremental"  -> ((s, d) => {
      val docs = Tables(s, d).documents
      Dedup.incrementalMinhashPairs(
        docs.filter(col("doc_id") % 10 =!= 9),
        docs.filter(col("doc_id") % 10 === 9))
    }),
    // q47: same candidate/reference split as q35 (doc_id ≡ 0 mod 7
    // plays the eval benchmark) but PARTIAL overlap — shared 3-gram
    // shingles, not whole-doc fingerprints.
    "q47_decontaminate_ngram"-> ((s, d) => {
      val docs = Tables(s, d).documents
      Dedup.decontaminateNgram(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    // q115: contamination EXCISION — q47's hit machinery but surgical:
    // remove exactly the covered token spans, keep the doc; cleaned
    // text emitted as md5+length (q37's payload convention).
    "q115_decontaminate_excise" -> ((s, d) => {
      val docs = Tables(s, d).documents
      Dedup.decontaminateExcise(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    "q48_kmeans_refine"      -> ((s, d) => Similarity.kmeansRefine(Tables(s, d).embeddings)),
    // q65: three Lloyd rounds — fixed count so the oracle can unroll
    // the identical rounds (tol=0 never skips a round's bit-replay)
    "q65_kmeans_train"       -> ((s, d) => Similarity.kmeansIterate(Tables(s, d).embeddings)),
    "q23_dedup_simhash"      -> ((s, d) => Dedup.simhashPairs(Tables(s, d).documents)),
    "q24_dedup_embedding"    -> ((s, d) => Similarity.embeddingNearDups(Tables(s, d).embeddings)),
    "q25_ann_bruteforce"     -> ((s, d) => Similarity.annBruteForce(Tables(s, d).embeddings)),
    "q26_ann_lsh"            -> ((s, d) => Similarity.annLsh(Tables(s, d).embeddings)),
    // q87: int8 scalar-quantized ANN — per-dim affine codes against
    // corpus min/max bounds, ADC scoring over the 4x-smaller code
    // table, exact re-rank of the shortlist.
    "q87_ann_sq8"            -> ((s, d) => Similarity.annSq8(Tables(s, d).embeddings)),
    "q34_dedup_embedding_lsh"-> ((s, d) => Similarity.embeddingNearDupsBucketed(Tables(s, d).embeddings)),
    "q46_ann_ivf"            -> ((s, d) => Similarity.annIvf(Tables(s, d).embeddings)),
    "q69_ann_ivfpq"          -> ((s, d) => Similarity.annIvfPq(Tables(s, d).embeddings)),
    "q70_ann_ivfpq_residual" -> ((s, d) =>
      Similarity.annIvfPq(Tables(s, d).embeddings, residual = true)),
    // q94: IVF-PQ on LLOYD-TRAINED codebooks — q69's search body over
    // trainedCodebooks' per-subspace fixed-point k-means output (2
    // rounds, seeded from q69's training-free book); the fine-
    // quantizer mirror of q65→q46's trainedCentroids path, oracle-
    // replayed end to end (train rounds unrolled in SQL)
    "q94_ann_ivfpq_trained"  -> ((s, d) => {
      val e = Tables(s, d).embeddings
      Similarity.annIvfPq(e,
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2)))
    }),
    // q98: the residual half of the trained-codebook story — q70's
    // residual search body over codebooks Lloyd-trained on the
    // residual sub-vectors themselves (Jégou et al. §III's production
    // form: train where you quantize); oracle unrolls the residual
    // rounds the same way
    "q98_ann_ivfpq_trained_res" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      Similarity.annIvfPq(e, residual = true,
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2,
          residual = true)))
    }),
    // q102: the FULLY-trained index (declared r14, was spec-pinned) —
    // the production build order in one search: Lloyd-train the
    // coarse quantizer (q65's machinery), train residual codebooks
    // AGAINST those centroids (q94's machinery — residual mode is
    // where centroid choice reaches the codes), then serve both. The
    // oracle unrolls BOTH training loops in one statement
    // (centRounds=2 + trainRounds=2).
    "q102_ann_ivfpq_full_trained" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val cents = Similarity.trainedCentroids(e, nCells = 16, rounds = 2)
      Similarity.annIvfPq(e, residual = true, centroids = Some(cents),
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2,
          residual = true, centroids = Some(cents))))
    }),
    // q105: the production SERVING point for the trained index
    // (declared r14) — q102's index, wider serve: nProbe 4→8,
    // rerank 32→64. The RecallProbe sweep decomposed q102's miss
    // budget with the exact-rerank contract: at nProbe=4 deep rerank
    // saturates the IVF probe ceiling (0.578 — every further miss is
    // a PROBE miss), so serving recall is bought with probe width,
    // and rerank must track it (at nProbe=8: 0.62 @32 vs 0.74 @64 —
    // the candidate pool doubled, the cut must too). Per-query cost
    // stays constant in corpus size: nProbe·targetCell ADC rows +
    // rerank float rows, independent of n once cells are sized.
    "q105_ann_ivfpq_served" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val cents = Similarity.trainedCentroids(e, nCells = 16, rounds = 2)
      Similarity.annIvfPq(e, residual = true, nProbe = 8, rerank = 64,
        centroids = Some(cents),
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2,
          residual = true, centroids = Some(cents))))
    }),
    // q125: the recall/cost frontier as a graded report (r15 verdict
    // #6) — one fully-trained index, the RecallProbe sweep's four
    // serving configs, recall@5 per config vs the exact baseline
    "q125_ann_frontier"      -> ((s, d) =>
      Similarity.annServingFrontier(Tables(s, d).embeddings)),
    // q130: the PERSISTED trained ANN index (r16 verdict #3 — q129's
    // artifact convention on the q102/q105 chain): train + encode +
    // write once (centroids/codebook/cell-partitioned codes, stamped),
    // validated read, then q105's serving config (nProbe=8, rerank=64)
    // served FROM the artifact — no retraining, probed cells pruned at
    // the codes scan. Row-identical to q105 by construction (shared
    // search body), so it shares q105's oracle verbatim (the q126/q129
    // identity convention — the driver hash-checks it every round).
    "q130_ann_index_served"  -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val dir = annIdxDir
      Similarity.writeAnnIndex(e, s"$dir/index")
      Similarity.annServeIndex(Similarity.readAnnIndex(s, s"$dir/index"), e)
    }),
    // q135: LEXICAL DRIFT ALARM — q133's sibling on the BM25 leg: the
    // index is built on the standing corpus (≢ 9 mod 10); the intake
    // (≡ 9) plays a VOCABULARY-SHIFTED crawl — half the intake (ids ≡ 9 mod 10 are all odd, so the split
    // is doc_id % 100 < 50) gets its tokens suffixed '_v2' (one string op, identical in both
    // engines — the q133 salt convention), the classic
    // new-tokenizer / new-source drift: ~half the intake's posting
    // mass lands on terms the lexicon has never seen, and the head
    // df-shares shift, so BOTH alarm inputs move and the alarm path
    // is hash-checked. All outputs integer ppm.
    "q135_bm25_index_drift" -> ((s, d) => {
      import org.apache.spark.sql.functions.expr
      val docs = Tables(s, d).documents
      val dir = bm25DriftDir
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 10 =!= 9), s"$dir/index")
      val intake = docs.filter(col("doc_id") % 10 === 9)
        .select(col("doc_id"),
          expr("CASE WHEN doc_id % 100 < 50 THEN " +
            "concat(replace(text, ' ', '_v2 '), '_v2') ELSE text END")
            .as("text"))
      Retrieval.bm25IndexDrift(
        Retrieval.readBm25Index(s, s"$dir/index"), intake)
    }),
    // q132: INCREMENTAL ANN index append — the Faiss lifecycle's add()
    // half (train once on a representative snapshot, add batches
    // forever): quantizers train on the full corpus (q130/q105's
    // chain), the base codes (vec_id ≢ 9 mod 10) write at build, the
    // intake batch (≡ 9 — q45/q131's split) encodes under the FROZEN
    // artifact quantizers and appends. Per-row encoding makes
    // append ≡ rebuild exact, so the serve is row-identical to
    // q130 ≡ q105 and shares q105's oracle verbatim.
    "q132_ann_index_appended" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val dir = annAppendDir
      Similarity.writeAnnIndex(e, s"$dir/index",
        encodeOnly = Some(e.filter(col("vec_id") % 10 =!= 9)))
      Similarity.appendAnnIndex(s, e.filter(col("vec_id") % 10 === 9), s"$dir/index")
      Similarity.annServeIndex(Similarity.readAnnIndex(s, s"$dir/index"), e)
    }),
    // q133: INDEX DRIFT REPORT — the retrain alarm the frozen-
    // quantizer lifecycle (q130/q132) needs: exact quantization error
    // |v − v̂|² per split under the artifact's quantizers. The intake
    // split plays a DRIFTED crawl — vectors scaled 3× at an id offset,
    // the classic unnormalized-new-encoder drift (cell ASSIGNMENT is
    // scale-invariant, so the drift is invisible to routing while the
    // residuals blow up ~9× — exactly the silent decay this monitor
    // exists to catch). The scaling happens on the DOUBLE side in
    // both engines (one IEEE multiply — bit-identical), so the alarm
    // path FIRES and is hash-checked (the q101 salt convention).
    "q133_ann_index_drift" -> ((s, d) => {
      import org.apache.spark.sql.functions.expr
      val e = Tables(s, d).embeddings
      val dir = annDriftDir
      Similarity.writeAnnIndex(e, s"$dir/index")
      val intake = e.filter(col("vec_id") % 10 === 9)
        .select((col("vec_id") + lit(900000L)).as("vec_id"),
          expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * 3.0D)")
            .as("embedding"))
      Similarity.annIndexDrift(Similarity.readAnnIndex(s, s"$dir/index"),
        e.filter(col("vec_id") % 10 =!= 9), intake)
    }),
    // q136: RETRAIN-ROTATE — the operator that CONSUMES the drift
    // alarm (r18 verdict #4, the lifecycle loop's last edge): build
    // the index on the corpus, append a TRANSLATED full re-crawl
    // (off-distribution under the frozen quantizers), watch the q133
    // drift report fire the alarm — then rotateAnnIndex retrains both
    // quantizers over base ∪ intake, re-encodes, swaps the artifact
    // in place (crash-safe, stats last), and the SAME report re-run
    // against the rotated index shows the alarm CLEARED. Output =
    // both reports phase-labeled; the oracle replays each phase's
    // full trained chain (before: trained on base; after: trained on
    // the union — rotate ≡ from-scratch rebuild by determinism).
    // The intake is the WHOLE corpus re-crawled (not a slice): the
    // alarm compares per-population mean qerr, and a small population
    // inherently quantizes coarser than the base even after a perfect
    // retrain (RotateProbe measured the 10% slice stuck at 122-172%
    // vs the 120 threshold across offsets, while the full re-crawl
    // reads 98-100% at all three gate SFs with before at 627-685%) —
    // the operator contract is honest only for comparably-sized
    // populations, and the probe is the committed evidence.
    "q136_ann_index_rotate" -> ((s, d) => {
      import org.apache.spark.sql.functions.expr
      val e = Tables(s, d).embeddings
      val dir = annRotateDir
      Similarity.writeAnnIndex(e, s"$dir/index")
      val intake = e
        .select((col("vec_id") + lit(900000L)).as("vec_id"),
          expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
            s"x -> x + ${RotateDriftOffset}D)").as("embedding"))
        .localCheckpoint() // two consumers: the append and the reports
      Similarity.appendAnnIndex(s, intake, s"$dir/index")
      def report(phase: String) =
        Similarity.annIndexDrift(Similarity.readAnnIndex(s, s"$dir/index"),
            e, intake)
          .withColumn("phase", lit(phase))
          .select("phase", "split", "n_vecs", "mean_qerr", "max_qerr",
            "retrain_alarm")
      val before = report("before").localCheckpoint() // pin: rotate replaces the files below
      Similarity.rotateAnnIndex(s, s"$dir/index",
        e.select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding")).unionByName(intake))
      before.unionByName(report("after")).orderBy("phase", "split")
    }),
    // q137: FILTERED ANN SERVING — top-k WITHIN a predicate over the
    // persisted trained index (how every production vector store
    // serves: lang = X, source = Y). Two strata over the q130
    // artifact — a selective (10%) and a non-selective (50%) filter —
    // each the annServeIndexFiltered path: predicate ON the code
    // scan, composed with probed-cell partition pruning, below the
    // rerank; exact re-rank unchanged. Plan-pinned in SimilaritySpec
    // (filter below rerank, pruned scan, TRUE-predicate identity).
    "q137_ann_filtered_serve" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val dir = annFilterDir
      Similarity.writeAnnIndex(e, s"$dir/index")
      val idx = Similarity.readAnnIndex(s, s"$dir/index")
      // one corpus-dim validation probe shared by both legs (the s22
      // once-per-store rule — each leg ran its own first() job)
      val dim = e.select(org.apache.spark.sql.functions.size(
        col("embedding").cast("array<double>"))).first().getInt(0)
      FilteredServeLegs.map { case (name, m) =>
        Similarity.annServeIndexFiltered(idx, e, col("vec_id") % m === 0,
            knownCorpusDim = Some(dim))
          .withColumn("filt", lit(name))
          .select("filt", "query_id", "neighbor_id", "cos_sim", "rank")
      }.reduce(_.unionByName(_)).orderBy("filt", "query_id", "rank")
    }),
    "q57_semantic_dedup"     -> ((s, d) => Similarity.semanticDedup(Tables(s, d).embeddings)),
    // q104: q57 under the TRAINED quantizer (declared r14) — the
    // production SemDeDup build order (the paper trains; the q93
    // anisotropy law measured why: trained centroids pulled the worst
    // hashed-bag cell 499 -> 231). Same verdict columns, same body;
    // only the cent CTE changes — the oracle splices the q65 Lloyd
    // chain (trainedCentCtes) in front of the identical SemDeDup
    // body, with the seed count DERIVED on both sides (the q97
    // geometry law: suggestCells from the corpus count, so the
    // 10x/30x probes train the scale-correct k and the 1024 cap
    // never fires on balanced cells; one eager count = index sizing,
    // the q46 rationale).
    "q104_semantic_dedup_trained" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val nc = Similarity.suggestCells(e.count())
      Similarity.semanticDedup(e,
        centroids = Some(Similarity.trainedCentroids(e, nCells = nc, rounds = 2)))
    }),
    "q64_sample_percell"     -> ((s, d) => Similarity.samplePerCell(Tables(s, d).embeddings)),
    // q63: same eval split convention as q35/q47 (id ≡ 0 mod 7 plays
    // the benchmark set), corpus = the rest
    "q63_decontaminate_semantic" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      Similarity.semanticDecontaminate(
        e.filter(col("vec_id") % 7 =!= 0), e.filter(col("vec_id") % 7 === 0))
    }),
    // q79: q63's past-broadcast scale path — cell-quantized eval with
    // exact triangle-inequality pruning. Row-identical to q63 by
    // construction, so it shares q63's oracle verbatim (the s11/q76
    // pattern); nCells=8 exercises real pruning at the gate SF (the
    // auto default derives 1 cell for a 71-vector eval set).
    "q79_decontaminate_semantic_cells" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      Similarity.semanticDecontaminateBucketed(
        e.filter(col("vec_id") % 7 =!= 0), e.filter(col("vec_id") % 7 === 0),
        nCells = 8)
    }),
    // q80: corpus-wide line/segment dedup — the CCNet/RefinedWeb
    // boilerplate-removal pass (keep the corpus-wide first occurrence
    // of each repeated segment, rebuild every doc)
    "q80_line_dedup"         -> ((s, d) => Dedup.lineDedup(Tables(s, d).documents)),
    // q122: the other line-level correction — frequent segments
    // removed from EVERY carrier (C4/RefinedWeb), q80's complement
    "q122_boilerplate_strip" -> ((s, d) => Dedup.boilerplateStrip(Tables(s, d).documents)),
    // q85: ExactSubstr — every maximal repeated token span of length
    // >= k removed from every occurrence (Lee et al. 2021), via exact
    // duplicated-k-window coverage; q80's sliding complement.
    "q85_substring_dedup"    -> ((s, d) => Dedup.substringDedup(Tables(s, d).documents)),
    // Streaming — executed through the real micro-batch engine
    // (Trigger.AvailableNow + memory sink), then compared to batch
    // oracles: streaming/batch parity is the correctness contract.
    "s01_stream_ingest"      -> ((s, d) =>
      Streams.runToMemory(
        Etl.ingestNormalize(Streams.readEventStream(s, s"$d/events.parquet")),
        "s01_stream_ingest")),
    "s02_stream_window"      -> ((s, d) =>
      Streams.runToMemory(
        Streams.hourlyWindow(Streams.readEventStream(s, s"$d/events.parquet")),
        "s02_stream_window", OutputMode.Complete())),
    "s03_stream_batcher"     -> ((s, d) => {
      import s.implicits._
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val files = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .select(col("lang").as("prefix"), col("doc_id").as("fileKey"),
          col("n_chars").as("size")).as[Streams.FileEvent]
      // timeout off (<=0): finite drain — see Streams.manifestBatcher
      Streams.runToMemory(
        Streams.manifestBatcher(files, partialTimeoutMs = 0).toDF, "s03_stream_batcher")
    }),
    // s05: stream-stream interval join — state partitions sized to
    // STATE VOLUME (r19; the s12/s14 rule reaching the join class): a
    // stream-stream join keeps FOUR state stores per shuffle partition
    // (keyed/numValues per side), so the session-wide 32 partitions
    // cost 128 store open/commit/checkpoint cycles per trigger while
    // the watermark-bounded state is KB-scale. Keys in state ≈ rows
    // inside the watermark window; the finite drain bounds that by the
    // corpus count (one metadata-weight count — the AutoGeometry
    // sizing convention). Join rows are key-determined, so the
    // partition count never reaches the output.
    "s05_stream_join"        -> ((s, d) => {
      val nRows = s.read.parquet(s"$d/events.parquet").count()
      Streams.scopedShufflePartitions(s, Streams.suggestStatePartitions(nRows)) {
        Streams.runToMemory(
          Streams.errorCauseJoin(Streams.readEventStream(s, s"$d/events.parquet")),
          "s05_stream_join")
      }
    }),
    // s07: engine-native session windows; complete-mode drain (update
    // is unsupported over session windows, and append would hold back
    // every user's last session — see sessionWindows' scaladoc)
    "s07_stream_session"     -> ((s, d) => {
      // per-key state (one session buffer per user within the gap) —
      // sized from key volume like s05/s13 (r19)
      val nKeys = s.read.parquet(s"$d/events.parquet").count()
      Streams.scopedShufflePartitions(s, Streams.suggestStatePartitions(nKeys)) {
        Streams.runToMemory(
          Streams.sessionWindows(Streams.readEventStream(s, s"$d/events.parquet")),
          "s07_stream_session", OutputMode.Complete())
      }
    }),
    // s06: event time derived deterministically from doc_id; output
    // projected to the key column only (the surviving carrier row is
    // arrival-order-dependent, the key set is not).
    "s06_stream_dedup_ttl"   -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .select(TextOps.fingerprintCol.as("fingerprint"),
          timestamp_seconds(col("doc_id") + lit(1600000000L)).as("ts"))
      // scoped: the dedup query gets its RocksDB default without the
      // session keeping it for later non-dedup streams; per-key state
      // (one row per fingerprint inside the TTL) → store count sized
      // from key volume, s04/s13's convention (r19)
      val nKeys = s.read.parquet(s"$d/documents.parquet").count()
      Streams.scopedStateStoreConf(s) {
        Streams.scopedShufflePartitions(s, Streams.suggestStatePartitions(nKeys)) {
          Streams.runToMemory(
            Streams.streamDedupTtl(docs, "ts", Seq("fingerprint"), "1 hour")
              .select("fingerprint"),
            "s06_stream_dedup_ttl")
        }
      }
    }),
    // s08: q45's split (intake = doc_id ≡ 9 mod 10) through the real
    // engine: persisted band index + per-micro-batch probes; the
    // drained union is batch-identical, so q45's oracle applies
    "s08_stream_dedup_incremental" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val existing = docs.filter(col("doc_id") % 10 =!= 9)
      val tmp = scratchDir("graft_s08_")
      Dedup.writeBandIndex(existing, s"$tmp/index")
      val index = Dedup.readBandIndex(s, s"$tmp/index")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val intake = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .filter(col("doc_id") % 10 === 9)
      // NOT partition-scoped (r19, measured): foreachBatch loops carry
      // no engine state stores — their batch-land shuffles are ordinary
      // batch jobs AQE already right-sizes, while hard-pinning the
      // session to a batch-sized constant throttles the CPU-dense
      // probe verify (shingle intersection) to that many cores. The
      // A/B read s08 4.46→5.00 / s09 13.6→14.6 scoped vs flat
      // unscoped — the state-store rule (s04/s05/s06/s07) does NOT
      // transfer to this class.
      val q = Streams.streamIncrementalDedup(intake, index, existing,
        s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      s.read.parquet(s"$tmp/out")
    }),
    // s18: streaming decontamination — the eval-set bloom + exact
    // verify riding every micro-batch (the intake-side contamination
    // guard); per-doc verdicts are batching-independent, so the
    // drained union is q35's batch output and its oracle applies
    "s18_stream_decontaminate" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val tmp = scratchDir("graft_s18_")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val intake = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      val q = Streams.streamDecontaminate(intake,
        docs.filter(col("doc_id") % 7 === 0), s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      s.read.parquet(s"$tmp/out")
    }),
    // s21: streaming retrieval — the q127 query set delivered as a
    // micro-batch stream, each batch served against the persisted
    // q129 index (per-batch lexicon broadcast + shard pruning); one
    // AvailableNow drain = one batch (the s18/s20 delivery), and
    // per-query results are batching-independent anyway, so the
    // drained union is q127's output verbatim
    "s21_stream_bm25_serve" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val tmp = scratchDir("graft_s21_")
      Retrieval.writeBm25Index(docs, s"$tmp/index")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val queries = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      val q = Streams.streamBm25Serve(queries, s"$tmp/index",
        s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      s.read.parquet(s"$tmp/out")
    }),
    // s22: streaming ANN serving — the q105 query set delivered as a
    // micro-batch vector stream, each batch served against the
    // persisted q130 index (per-batch probe-cell pruning, exact
    // rerank against the float store); one AvailableNow drain = one
    // batch, per-query results batching-independent → the drained
    // union is q105's output verbatim (s21's rule on the ANN leg)
    "s22_stream_ann_serve" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val tmp = scratchDir("graft_s22_")
      Similarity.writeAnnIndex(e, s"$tmp/index")
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      val queries = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/embeddings.parquet"))
        .filter(col("vec_id") < 10)
      val q = Streams.streamAnnServe(queries, s"$tmp/index", e,
        s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      s.read.parquet(s"$tmp/out")
    }),
    // s23: the closed intake loop on the lexical leg — the index is
    // built once on the standing corpus (ids ≢ 8,9 mod 10), then two
    // intake batches (≡ 8, then ≡ 9) each APPEND and emit the
    // post-append index-health row; both emissions are associative
    // integer merges of the batches so far, so the oracle replays
    // each prefix exactly. Delivery order is STRUCTURAL (land →
    // drain → land → drain, [[drainInOrder]]) — not mtime-dependent.
    "s23_stream_bm25_ingest" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val base = docs.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9)
      val tmp = scratchDir("graft_s23_")
      Retrieval.writeBm25Index(base, s"$tmp/index")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      // not partition-scoped — s08's r19 measured rationale (A/B flat
      // here: the appends were never file-count-bound)
      drainInOrder(s"$tmp/landing", Seq(
        "b1" -> docs.filter(col("doc_id") % 10 === 8),
        "b2" -> docs.filter(col("doc_id") % 10 === 9))) { () =>
        val intake = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
        Streams.streamBm25Ingest(intake, s"$tmp/index",
          s"$tmp/out", s"$tmp/cp",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      }
      // ORDER PIN (r20, verdict #1 — the s24 rule on the lexical leg):
      // n_docs is strictly monotone over batches ≡ the oracle's ORDER BY
      s.read.parquet(s"$tmp/out").orderBy("n_docs")
    }),
    // s24: the closed intake loop on the SEMANTIC leg — s23's sibling,
    // completing the 2×2 serve/ingest matrix over both persisted
    // artifacts. Quantizers train ONCE on the full corpus (q132's
    // Faiss train/add split), the base codes (ids ≢ 8,9 mod 10) write
    // at build, then two intake batches (≡ 8, then ≡ 9) each APPEND
    // under the frozen quantizers and emit the post-append health
    // row: associatively-merged n_codes (strictly monotone — the row
    // key), the batch's distinct cells touched, and its mean
    // quantization error in 2²⁰ fixed point (integer-exact, q133's
    // discipline) — the continuous retrain signal. Delivery order is
    // STRUCTURAL (land → drain → land → drain, [[drainInOrder]]): the
    // r18 driver's one red row was this query's emission reordered by
    // FileStreamSource's mtime listing — the order is now program
    // shape, immune to listing behavior.
    "s24_stream_ann_ingest" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val base = e.filter(col("vec_id") % 10 =!= 8 && col("vec_id") % 10 =!= 9)
      val tmp = scratchDir("graft_s24_")
      Similarity.writeAnnIndex(e, s"$tmp/index", encodeOnly = Some(base))
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      // not partition-scoped — s08's r19 measured rationale (A/B flat;
      // the per-batch pqEncode is exactly the CPU-dense stage the
      // throttle would hurt at scale)
      drainInOrder(s"$tmp/landing", Seq(
        "b1" -> e.filter(col("vec_id") % 10 === 8),
        "b2" -> e.filter(col("vec_id") % 10 === 9))) { () =>
        val intake = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
        Streams.streamAnnIngest(intake, s"$tmp/index",
          s"$tmp/out", s"$tmp/cp",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      }
      // ORDER PIN (r20, verdict #1): the sink dir holds one file per
      // drained batch and a bare read's row order hangs off the file
      // listing (split ordering is size-then-path — host-sensitive for
      // near-equal files). n_codes is strictly monotone over batches,
      // so this is the oracle's ORDER BY b — same rows, pinned order.
      s.read.parquet(s"$tmp/out").orderBy("n_codes")
    }),
    // s25: STREAMING HYBRID SERVING — the serving matrix's last cell
    // (ad-hoc q128, artifact-served q134, streaming s25): micro-batch
    // queries served against BOTH persisted artifacts, the semantic
    // leg embedding each batch's own query texts (pure per-row
    // embedding ⇒ batch vectors ≡ corpus-member vectors). One-drain
    // delivery of the q134 query set ⇒ drained union IS q134's
    // output — shares its oracle verbatim (the s21/s22 identity
    // convention).
    "s25_stream_hybrid_serve" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val tmp = scratchDir("graft_s25_")
      // independent artifact builds overlapped — q134's r19 rationale
      val bmF = concurrent.Future(Retrieval.writeBm25Index(docs, s"$tmp/bm25"))(
        concurrent.ExecutionContext.global)
      val emb = TextOps.embedFrame(docs).localCheckpoint()
      Similarity.writeAnnIndex(emb, s"$tmp/ann")
      concurrent.Await.result(bmF, concurrent.duration.Duration.Inf)
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val queries = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      val q = Streams.streamHybridServe(queries, s"$tmp/bm25",
        s"$tmp/ann", emb, s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      s.read.parquet(s"$tmp/out")
    }),
    // s09: the closed admit loop — batch1 (ids ≡ 8 mod 10) probes the
    // corpus index and admits its survivors; batch2 (ids ≡ 9) then
    // dedups against corpus AND those survivors. Delivery order is
    // STRUCTURAL (land → drain → land → drain, [[drainInOrder]]) —
    // the batch-replay oracle depends on exactly this batching, so
    // it must not hang off FileStreamSource's mtime listing.
    "s09_stream_dedup_admit" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val corpus = docs.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9)
      val tmp = scratchDir("graft_s09_")
      Dedup.writeBandIndex(corpus, s"$tmp/index")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      // not partition-scoped — s08's r19 measured rationale (the
      // CPU-dense probe verify loses cores; AQE right-sizes the rest)
      drainInOrder(s"$tmp/landing", Seq(
        "b1" -> docs.filter(col("doc_id") % 10 === 8),
        "b2" -> docs.filter(col("doc_id") % 10 === 9))) { () =>
        val intake = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
        Streams.streamIncrementalDedupAdmit(intake, s"$tmp/index", corpus,
          s"$tmp/admitted", s"$tmp/out", s"$tmp/cp",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      }
      // ORDER PIN (r20, verdict #1): one sink file per batch — pin to
      // the oracle's ORDER BY new_doc, dup_of (same rows, pinned order)
      s.read.parquet(s"$tmp/out").orderBy("new_doc", "dup_of")
    }),
    // s15: the closed admit loop for the SEMANTIC family (s09's
    // lifecycle over q101's vector store) — batch1 (ids ≡ 8 mod 10,
    // plus verbatim copies of store vectors at +300000) probes the
    // persisted store and admits its survivors; batch2 (ids ≡ 9, plus
    // copies of batch1's ORGANIC members at +600000) then dedups
    // against the corpus AND those survivors — the +600000 copies can
    // only be condemned if batch1's admissions actually landed.
    // Delivery order STRUCTURAL as in s09 ([[drainInOrder]]); the
    // oracle replays both probes with store1 = store0 ∪ (batch1 ∖
    // hits1).
    "s15_stream_semantic_dedup_admit" -> ((s, d) => {
      val e = Tables(s, d).embeddings
      val store = e.filter(col("vec_id") % 10 =!= 8 && col("vec_id") % 10 =!= 9)
      val cents = Similarity.seedCentroids(store, 16)
      val tmp = scratchDir("graft_s15_")
      Similarity.writeSemanticStore(store, s"$tmp/store", cents)
      val b1 = e.filter(col("vec_id") % 10 === 8).unionByName(
        store.filter(col("vec_id") % 50 === 0)
          .withColumn("vec_id", col("vec_id") + lit(300000L)))
      val b2 = e.filter(col("vec_id") % 10 === 9).unionByName(
        e.filter(col("vec_id") % 10 === 8)
          .withColumn("vec_id", col("vec_id") + lit(600000L)))
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      // not partition-scoped — s08's r19 measured rationale
      drainInOrder(s"$tmp/landing", Seq("b1" -> b1, "b2" -> b2)) { () =>
        val intake = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
        Streams.streamSemanticDedupAdmit(intake, s"$tmp/store", cents,
          s"$tmp/out", s"$tmp/cp",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      }
      // ORDER PIN (r20, verdict #1): one sink file per batch — pin to
      // the oracle's ORDER BY vec_id (same rows, pinned order)
      s.read.parquet(s"$tmp/out").orderBy("vec_id")
    }),
    // s12: q88's token accounting as the ingest loop's live meter —
    // stateful streaming agg, one row of state per (source, lang),
    // the tokenizer riding each doc's single pass through the engine.
    // State partitions pinned to the group-cardinality default (r15
    // verdict #1's structural fix: 32 stores for ~40 rows of state is
    // pure per-trigger commit overhead — see scopedShufflePartitions).
    "s12_stream_token_meter" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      Streams.scopedShufflePartitions(s, Streams.GroupStatePartitions) {
        Streams.runToMemory(Streams.streamTokenMeter(docs),
          "s12_stream_token_meter", OutputMode.Complete())
      }
    }),
    // s16: continuous heavy-hitter monitoring — q109's MG summary as
    // streaming state (one ≤64-entry buffer), drained Complete, then
    // certified batch-side against the exact top-20 (q109's verdict
    // expression; TRUE under any legal MG merge tree, so the oracle
    // is q109's verbatim — the s11/s12 reuse convention).
    "s16_stream_heavy_hitters" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      val sk = Streams.runToMemory(Streams.streamHeavyHitterSketch(docs),
        "s16_stream_heavy_hitters", OutputMode.Complete())
      TextOps.heavyHittersCertify(sk, Tables(s, d).documents)
    }),
    // s17: live drift monitor — q111's (source, bucket) histogram as
    // streaming state, drained Complete, TVD derived batch-side over
    // the drained counts (they equal the batch counts row-for-row —
    // the s12 accumulate law) so the q111 oracle applies verbatim.
    "s17_stream_drift" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      // group-cardinality state (|sources|·256 rows) → pinned small
      // state-partition count, the s12 rationale
      val counts = Streams.scopedShufflePartitions(s, Streams.GroupStatePartitions) {
        Streams.runToMemory(Streams.streamSourceHistogram(docs),
          "s17_stream_drift", OutputMode.Complete())
      }
      Corpus.divergenceFromCounts(counts.localCheckpoint())
    }),
    // s20: q40's packing as intake state — per-language running token
    // offset, each arrival emitting its chunk assignment live; the
    // drained assignments regrouped by (lang, chunk_id) ARE batch
    // q40's chunk table (one-drain delivery = doc_id order), so the
    // oracle is q40's verbatim. Group-cardinality state (one long per
    // lang) → the s12 state-partition pin.
    "s20_stream_pack_meter" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{size, split, count, sum, min, max}
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .as[(String, Long, Long)]
      val assigns = Streams.scopedStateStoreConf(s) {
        Streams.scopedShufflePartitions(s, Streams.GroupStatePartitions) {
          Streams.runToMemory(Streams.streamPackMeter(docs).toDF,
            "s20_stream_pack_meter")
        }
      }
      assigns.groupBy("lang", "chunk_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("chunk_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
    }),
    // s19: q118's per-domain quota as intake-side admission state —
    // one counter per domain; one-drain delivery pins the oracle to
    // the first-cap-by-doc_id replay
    "s19_stream_domain_quota" -> ((s, d) => {
      import s.implicits._
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
      Streams.scopedStateStoreConf(s) {
        // one counter per domain = group-cardinality state (s12's rule)
        Streams.scopedShufflePartitions(s, Streams.GroupStatePartitions) {
          Streams.runToMemory(
            Streams.streamDomainQuota(docs, Corpus.DefaultDomainQuota).toDF,
            "s19_stream_domain_quota")
        }
      }
    }),
    "s04_stream_dedup"       -> ((s, d) => {
      import s.implicits._
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .select(TextOps.fingerprintCol.as("fingerprint"), col("doc_id"))
        .as[Streams.DocFp]
      // per-key state (one row per distinct fingerprint) → store count
      // sized from expected key volume, s13's convention (r19: s04 was
      // the one per-key dedup stream still at the session-wide 32)
      val nKeys = s.read.parquet(s"$d/documents.parquet").count()
      Streams.scopedStateStoreConf(s) {
        Streams.scopedShufflePartitions(s, Streams.suggestStatePartitions(nKeys)) {
          Streams.runToMemory(Streams.streamDedup(docs).toDF, "s04_stream_dedup")
        }
      }
    }),
    // s13: continuous PERCEPTUAL image dedup — m07's dHash riding each
    // micro-batch into s04's state-store dedup; a re-encoded copy of
    // the same pixels in a later batch still drops. Rows-only driver
    // check (no SQL decodes PNG); cross-batch semantics spec-pinned.
    "s13_stream_image_dedup" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      val media = Multimodal.encodePng(Multimodal.imageMedia(docs))
      // per-key state (one row per distinct dHash) → size the store
      // count from the expected key volume (a parquet metadata count,
      // the AutoGeometry sizing convention); at gate SFs this lands on
      // the floor, cutting 32 RocksDB instances per trigger to 4 — the
      // r15 verdict's repeat-flag structural fix. Decode parallelism is
      // scan-side (file splits) and unaffected.
      val nKeys = s.read.parquet(s"$d/documents.parquet").count()
      Streams.scopedStateStoreConf(s) {
        Streams.scopedShufflePartitions(s, Streams.suggestStatePartitions(nKeys)) {
          Streams.runToMemory(Streams.streamImageDedup(media).toDF,
            "s13_stream_image_dedup")
        }
      }
    }),
    // s14: continuous SEMANTIC image dedup — q97 through the streaming
    // loop (declared round 14). The corpus is q97's salted union
    // (verbatim re-crawls at +300000, ≡ 0 mod 3 keeps the image
    // class), the quantizer is trained ONCE batch-side (seedCentroids
    // over the centered frame — index metadata, the s08 persisted-
    // index convention; geometry = 3·suggestCells(n), q97's law), and
    // the stream embeds/centers/assigns per micro-batch with per-cell
    // state = cell membership, emitting q57's verdict rows. The
    // drained result is row-identical to batch q97, so it shares the
    // q97 oracle — the batch frame is localCheckpointed (q97's
    // diamond rule) because the eager count + seed collect would
    // otherwise re-run the synthesize+decode codec chain.
    "s14_stream_image_semantic_dedup" -> ((s, d) => {
      val docsB = Tables(s, d).documents
      val recrawlB = docsB.filter(col("doc_id") % 21 === 0)
        .withColumn("doc_id", col("doc_id") + lit(300000L))
      val frame = Multimodal.imageSemanticFrame(docsB.unionByName(recrawlB))
        .localCheckpoint()
      val cents = Similarity.seedCentroids(frame,
        3 * Similarity.suggestCells(frame.count()))
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docsS = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      val unionS = docsS.unionByName(
        docsS.filter(col("doc_id") % 21 === 0)
          .withColumn("doc_id", col("doc_id") + lit(300000L)))
      val media = Multimodal.encodePng(Multimodal.imageMedia(unionS))
      // per-CELL state (one membership list per quantizer cell, and
      // |cells| = cents.length is already known here) → size the
      // store count from the key volume like s13 (the r16 structural
      // fix, which s14 never received): at gate SFs this lands on
      // the floor, cutting 32 RocksDB instances per trigger to 4.
      // Decode parallelism is scan-side (file splits) and unaffected.
      Streams.scopedStateStoreConf(s) {
        Streams.scopedShufflePartitions(s,
          Streams.suggestStatePartitions(cents.length.toLong)) {
          Streams.runToMemory(
            Streams.streamImageSemanticDedup(media, cents, tau = 0.9).toDF,
            "s14_stream_image_semantic_dedup")
        }
      }
    }),
    // s11: q76 through the streaming loop — the previous snapshot is
    // persisted as a fingerprint store, the re-crawl streams through
    // per-batch probes, removed = store ∖ landed after the drain. The
    // result shares q76's oracle verbatim, so the batch and streaming
    // paths are driver-hash-checked for row identity.
    "s11_stream_snapshot_diff" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val prev = docs.filter(col("doc_id") % 7 =!= 6)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev0")))
            .otherwise(col("text")))
      val tmp = scratchDir("graft_s11_")
      Etl.writeFingerprintStore(prev, s"$tmp/store")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val intake = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
        .filter(col("doc_id") % 7 =!= 5)
      val q = Streams.streamSnapshotDiff(intake, s"$tmp/store",
        s"$tmp/out", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      val landed = s.read.parquet(s"$tmp/out")
      val removed = s.read.parquet(s"$tmp/store")
        .join(landed.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("prev_fp"),
          lit(null).cast("string").as("curr_fp"),
          lit("removed").as("verdict"))
      landed.unionByName(removed).orderBy("doc_id")
    }),
    // s10: the continuous validate→quarantine loop through the REAL
    // sinks (valid parquet + date-partitioned quarantine + per-batch
    // reports), then summarized from what physically LANDED — the
    // oracle recomputes the same split from the source table, so a row
    // lost or mis-routed anywhere in the loop breaks the hash
    "s10_stream_quarantine"  -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(Streams.asStreamPath(s"$d/documents.parquet"))
      val tmp = scratchDir("graft_s10_")
      val q = Streams.streamQuarantine(docs, s"$tmp/valid",
        s"$tmp/quarantine", s"$tmp/reports", s"$tmp/cp",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(); q.stop()
      val valid = s.read.parquet(s"$tmp/valid")
        .select(lit("valid").as("status"), lit("ok").as("reason"))
      val quarantined = s.read.parquet(s"$tmp/quarantine")
        .select(lit("quarantined").as("status"),
          col("_quarantine_reason").as("reason"))
      valid.unionByName(quarantined)
        .groupBy("status", "reason")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_docs"))
        .orderBy("status", "reason")
    }),
    // Multimodal — m01 oracle-checked via struct fields + payload md5
    // parity, m02 by recomputing the deterministic
    // stub decode from the same bytes in SQL; partition/batch behavior
    // is additionally verified in MultimodalSpec.
    "m01_binary_meta"        -> ((s, d) => Multimodal.binaryMetaSummary(Tables(s, d).documents)),
    "m02_byte_features"      -> ((s, d) => Multimodal.byteFeatureSummary(Tables(s, d).documents)),
    "m03_frame_sample"       -> ((s, d) => Multimodal.frameSummary(Tables(s, d).documents)),
    // m04: the REAL image codec — synthesize spec-compliant PNGs from
    // the image-mime documents through javax.imageio's encoder, decode
    // them back with ImageIO.read, emit geometry + pixel digest. No
    // SQL engine decodes PNG, so this is a rows-only driver check; the
    // encode→decode round trip is pinned bit-exactly in MultimodalSpec.
    "m04_image_decode"       -> ((s, d) => Multimodal.imageDecodeSummary(Tables(s, d).documents)),
    // m07: perceptual image near-dup — dHash (decode → 9x8 integer
    // grayscale grid → 64 gradient-sign bits) through the real JDK
    // codec; pair machinery = q23's banded Hamming, shared. Rows-only
    // driver check (no SQL engine decodes PNG); semantics spec-pinned.
    "m07_image_dhash"        -> ((s, d) => Multimodal.imageDhashSummary(Tables(s, d).documents)),
    // m09: image -> VECTOR (the q92 analogue for images): decode
    // through the real codec, integer-NN grid-luminance embedding —
    // the multimodal on-ramp to SemDeDup/ANN; golden-oracle-checked
    // (full vector identity + exact integer norm)
    "m09_image_embed"        -> ((s, d) => Multimodal.imageEmbedSummary(Tables(s, d).documents)),
    // q97: SemDeDup over IMAGES end to end (q93's convention for the
    // image modality): m09's centered integer embedding feeds q57's
    // machinery verbatim. The corpus is salted with verbatim re-crawls
    // (q76's split trick — doc_id+3000 keeps the mime class) so the
    // condemnation path fires: a re-crawled image embeds identically
    // (cosine 1) and is condemned against its original. Offset 300000
    // ≡ 0 (mod 3) keeps the mime class and clears every SF's id space.
    // Geometry: image vec_ids stride by 3 (the mime law), so seeds =
    // vec_id < nCells yields only a third of the intended count —
    // nCells = 3·suggestCells(n) restores the ~128-vector target cell
    // (the q57 AutoGeometry law, corpus-derived so the 10x/30x probes
    // scale; one eager count = index sizing, the q46 rationale). Both
    // gate SFs hold 191 image+re-crawl docs → cells = 6 in the oracle.
    // The frame is localCheckpointed (q93's diamond rule): the eager
    // geometry count plus semanticDedup's three plan subtrees would
    // otherwise re-run the synthesize+decode codec chain — q97's
    // dominant cost — four times.
    "q97_semantic_dedup_image" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val recrawl = docs
        .filter(col("doc_id") % 21 === 0)
        .withColumn("doc_id", col("doc_id") + lit(300000L))
      val frame = Multimodal.imageSemanticFrame(docs.unionByName(recrawl))
        .localCheckpoint()
      Similarity.semanticDedup(frame, tau = 0.9,
        nCells = 3 * Similarity.suggestCells(frame.count()))
    }),
    // m05: the REAL audio codec — synthesize spec-compliant WAVs from
    // the audio-mime docs through the JDK's actual RIFF encoder, parse
    // them back with the real decoder (format geometry, PCM content
    // digest, exact-integer-derived RMS). Rows-only driver check: no
    // SQL engine parses RIFF; the round trip is spec-pinned.
    "m05_audio_decode"       -> ((s, d) => Multimodal.audioDecodeSummary(Tables(s, d).documents)),
    // m08: perceptual audio fingerprint — energy-envelope dHash
    // (container- AND gain-independent); pair machinery = q23/m07's
    // banded Hamming, shared. Rows-only driver check.
    "m08_audio_fingerprint"  -> ((s, d) => Multimodal.audioFingerprintSummary(Tables(s, d).documents)),
    // m10: audio -> VECTOR (the m09 analogue for audio): decode
    // through the real codec, 64 windows of exact integer energy —
    // the envelope as an embedding; golden-oracle-checked identity
    "m10_audio_embed"        -> ((s, d) => Multimodal.audioEmbedSummary(Tables(s, d).documents)),
    // q99: SemDeDup over AUDIO end to end (q97's convention for the
    // audio modality): centered energy envelopes through q57's
    // machinery, corpus salted with verbatim re-crawls (offset
    // ≡ 0 mod 3 preserves the audio class: (300000 + 21k + 1) % 3 = 1)
    "q99_semantic_dedup_audio" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val recrawl = docs
        .filter(col("doc_id") % 21 === 1)
        .withColumn("doc_id", col("doc_id") + lit(300000L))
      val frame = Multimodal.audioSemanticFrame(docs.unionByName(recrawl))
        .localCheckpoint() // q97's diamond rule: the codec chain runs once
      Similarity.semanticDedup(frame, tau = 0.9,
        nCells = 3 * Similarity.suggestCells(frame.count()))
    }),
    // m06: the moving-picture modality through a REAL multi-frame
    // container — animated GIF via the JDK's actual sequence
    // writer/parser (no MP4 codec ships with the JDK); true frame
    // counts, strided frame sampling, per-frame pixel digests.
    // Rows-only driver check; round trip spec-pinned.
    "m06_gif_frames"         -> ((s, d) => Multimodal.gifFrameSummary(Tables(s, d).documents)),
    "q27_lang_id"            -> ((s, d) => TextOps.langId(Tables(s, d).documents)),
    "q28_quality_score"      -> ((s, d) => TextOps.qualityScore(Tables(s, d).documents)),
    "q61_quality_prune"      -> ((s, d) => TextOps.qualityPrune(Tables(s, d).documents)),
    "q67_heuristic_filter"   -> ((s, d) => TextOps.heuristicFilter(Tables(s, d).documents)),
    "q68_vocab_coverage"     -> ((s, d) => TextOps.vocabCoverage(Tables(s, d).documents)),
    "q62_winnow_fingerprint" -> ((s, d) => TextOps.winnowFingerprints(Tables(s, d).documents)),
    "q29_token_count"        -> ((s, d) => TextOps.tokenCounts(Tables(s, d).documents)),
    "q30_fingerprint"        -> ((s, d) => TextOps.fingerprint(Tables(s, d).documents)),
    // q35: every seventh doc plays the reference (eval) corpus drawn
    // from the candidate pool — the corpus has no cross-doc exact
    // duplicates, so overlap-by-construction is what exercises the
    // semi-join and fingerprint parity with a non-empty result
    "q35_decontaminate"      -> ((s, d) => {
      val docs = Tables(s, d).documents
      TextOps.decontaminate(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    // q58: the same contamination contract through the bloom-prefilter
    // scale path — identical output (and oracle) to q35 by design
    "q58_decontaminate_bloom"-> ((s, d) => {
      val docs = Tables(s, d).documents
      TextOps.decontaminateBloom(docs, docs.filter(col("doc_id") % 7 === 0))
    }),
    // q56: the reference's self-describing run reports (logs/lambda +
    // logs/glue JSON, queried by Athena.sql:104-176): run two REAL
    // writes through the reporting sink, then query the generated
    // report table. Only deterministic report fields are projected —
    // timings/ids vary run to run and are covered by RunReportSpec;
    // the oracle reconstructs the expected values from the same source
    // tables.
    "q56_run_report"         -> ((s, d) => {
      val t = Tables(s, d)
      val tmp = scratchDir("graft_runs")
      val reports = s"$tmp/reports"
      graft.sources.RunReport.reportedWrite(
        t.events, s"$tmp/out/events", 4, "events_ingest", reports)
      graft.sources.RunReport.reportedWrite(
        t.documents, s"$tmp/out/documents", 4, "documents_ingest", reports)
      graft.sources.RunReport.readReports(s, reports)
        .select(col("job_name"), col("records_processed"),
          col("output_files"), col("status"), col("report_version"))
        .orderBy("job_name")
    }),
  )

  /** Committed golden parquet for the media oracles (m04–m08, s13) —
    * regenerated by `runMain graft.GoldenGen /root/repo/golden
    * <sfDirs...>` whenever a synthesis law or the test corpus
    * changes. */
  private val GoldenDir = "/root/repo/golden"

  def oracleSql: Map[String, String] = Map(
    "q01_ingest_normalize" ->
      """SELECT * FROM (
        |  SELECT CAST(event_id AS VARCHAR) AS event_id,
        |         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |         CAST(user_id AS VARCHAR) AS user_id,
        |         event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
        |         props
        |  FROM events) t
        |ORDER BY CAST(event_id AS BIGINT)""".stripMargin,
    "q02_validate_quarantine" ->
      """SELECT status, reason, COUNT(*) AS n_files,
        |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |       ROUND(AVG(n_chars), 4) AS avg_chars
        |FROM (SELECT n_chars,
        |        CASE WHEN n_chars >= 150 AND n_chars <= 450 THEN 'valid' ELSE 'quarantined' END AS status,
        |        CASE WHEN n_chars < 150 THEN 'below_min_size'
        |             WHEN n_chars > 450 THEN 'above_max_size' ELSE 'ok' END AS reason
        |      FROM documents) t
        |GROUP BY status, reason ORDER BY status, reason""".stripMargin,
    "q03_manifest_batching" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars,
        |         CAST((ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) // 10 AS INTEGER) AS batch_id
        |  FROM documents)
        |SELECT lang, batch_id, COUNT(*) AS n_files,
        |       MIN(doc_id) AS first_file, MAX(doc_id) AS last_file,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY lang, batch_id ORDER BY lang, batch_id""".stripMargin,
    "q04_status_shards" ->
      """SELECT status, shard, COUNT(*) AS n_files
        |FROM (SELECT CASE WHEN n_chars >= 150 AND n_chars <= 450 THEN 'valid' ELSE 'quarantined' END AS status,
        |             CAST(doc_id % 10 AS INTEGER) AS shard
        |      FROM documents) t
        |GROUP BY status, shard ORDER BY status, shard""".stripMargin,
    "q05_daily_summary" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_failed_filter" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        |FROM events WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "q07_duration_stats" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       ROUND(AVG(value), 4) AS avg_duration,
        |       MAX(value) AS max_duration, MIN(value) AS min_duration,
        |       COUNT(*) AS n_runs
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q08 oracle extracts the SAME key the Spark side does: json_valid
    // guard ≡ from_json(map<string,string>) nulling malformed payloads;
    // TRY_CAST over the string value on BOTH engines (so {"k":"5"}
    // coerces to 5 and {"k":"x"} nulls only k, identically); the final
    // inner join drops null-k rows on both sides.
    "q08_correlation_join" ->
      """WITH e AS (SELECT event_id, event_type, user_id,
        |                  TRY_CAST(CASE WHEN json_valid(props)
        |                                THEN json_extract_string(props, '$.k') END AS INTEGER) AS k
        |           FROM events),
        |     d AS (SELECT k, COUNT(*) AS k_events, COUNT(DISTINCT user_id) AS k_users
        |           FROM e WHERE k IS NOT NULL GROUP BY k)
        |SELECT e.event_id, e.k, d.k_events, d.k_users
        |FROM e JOIN d USING (k) WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin,
    "q09_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
        |       ROUND(AVG(value), 4) AS avg_value,
        |       ROUND(STDDEV_SAMP(value), 4) AS stdev_value,
        |       ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |       ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |       ROUND(quantile_cont(value, 0.99), 4) AS p99,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q51: the oracle asserts the *verdict*, not the sketch — DuckDB
    // recomputes the deterministic columns and expects every in-bound
    // boolean to be true (a sketch outside the ±1% rank window makes
    // the Spark side emit false → hash mismatch → red driver row).
    "q51_percentile_sketch" ->
      """SELECT event_type, COUNT(*) AS n,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       true AS p50_ok, true AS p95_ok, true AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_hourly_velocity" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS volume,
        |       ROUND(COUNT(*) / 3600.0, 6) AS events_per_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_peak_topk" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY n_events DESC, hour LIMIT 3""".stripMargin,
    "q18_output_sizing" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_records,
        |       GREATEST(CAST(CEIL(COUNT(*) / 500.0) AS INTEGER), 1) AS target_files
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_schema_drift" ->
      """SELECT COUNT(*) AS n_rows, COUNT(event_type) AS n_with_type,
        |       COUNT(user_id) AS n_with_user,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS user_id
        |      FROM events WHERE event_id < 5000
        |      UNION ALL
        |      SELECT event_id, CAST(NULL AS VARCHAR), value, user_id
        |      FROM events WHERE event_id >= 5000) t""".stripMargin,
    // q31: latest-update-wins status resolution; (ts, event_id) unique
    // per user so the window pick is deterministic.
    "q31_status_latest" ->
      """SELECT user_id, last_ts, last_status, n_updates FROM (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts, event_type AS last_status,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id) AS n_updates
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // q32: rates as identical IEEE expressions on both engines —
    // integer-microsecond span (epoch_us ≡ unix_micros), floor-rounding.
    "q32_velocity_projection" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_events,
        |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |         epoch_us(MAX(CAST(ts AS TIMESTAMP))) - epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS span_us
        |  FROM events)
        |SELECT n_events, total_value,
        |       FLOOR((span_us / 1000000.0) * 100.0 + 0.5) / 100.0 AS elapsed_sec,
        |       FLOOR(n_events / (span_us / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS events_per_sec,
        |       FLOOR(total_value / ((span_us / 1000000.0) / 3600.0) * 10000.0 + 0.5) / 10000.0 AS value_per_hour,
        |       FLOOR(total_value / ((span_us / 1000000.0) / 3600.0) * 24.0 * 10000.0 + 0.5) / 10000.0 AS projected_value_per_day
        |FROM a""".stripMargin,
    // q76: same prev/curr synthesis as the declared query; fingerprint
    // is q20/q30's normalization so the diff key matches the dedup key.
    // s11 is the same contract through the streaming loop (per-batch
    // probes of the persisted fingerprint store + post-drain removed
    // derivation) — one oracle, so the two paths can never drift.
    "q76_snapshot_diff" -> snapshotDiffOracle,
    "s11_stream_snapshot_diff" -> snapshotDiffOracle,
    // q78: dround mirrored as FLOOR((x)*1e4+0.5)/1e4; drift is the IEEE
    // difference of the two rounded doubles (identical operands both
    // engines). Totals cast back to BIGINT (DuckDB SUM→HUGEINT).
    "q78_snapshot_drift" ->
      """WITH prev AS (SELECT source FROM documents WHERE doc_id % 7 <> 6),
        |curr AS (SELECT source FROM documents WHERE doc_id % 7 <> 5),
        |u AS (SELECT source AS dim, 0 AS side FROM prev
        |      UNION ALL SELECT source, 1 FROM curr),
        |g AS (SELECT dim,
        |        CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
        |        CAST(SUM(side) AS BIGINT) AS n_curr
        |      FROM u GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_prev) AS BIGINT) AS tp,
        |             CAST(SUM(n_curr) AS BIGINT) AS tc FROM g)
        |SELECT dim, n_prev, n_curr,
        |       FLOOR((n_prev / tp) * 10000.0 + 0.5) / 10000.0 AS share_prev,
        |       FLOOR((n_curr / tc) * 10000.0 + 0.5) / 10000.0 AS share_curr,
        |       FLOOR((n_curr / tc) * 10000.0 + 0.5) / 10000.0
        |         - FLOOR((n_prev / tp) * 10000.0 + 0.5) / 10000.0 AS drift
        |FROM g CROSS JOIN t ORDER BY dim""".stripMargin,
    // q33: extension check precedes the size band, as in the reference
    // validator; extension is doc_id-derived (test tables carry no
    // file names).
    "q33_extension_validate" ->
      """SELECT CASE WHEN reason = 'ok' THEN 'valid' ELSE 'quarantined' END AS status,
        |       reason, ext, COUNT(*) AS n_files,
        |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM (SELECT n_chars, ext,
        |        CASE WHEN ext NOT IN ('ndjson','json') THEN 'invalid_extension'
        |             WHEN n_chars < 150 THEN 'below_min_size'
        |             WHEN n_chars > 450 THEN 'above_max_size'
        |             ELSE 'ok' END AS reason
        |      FROM (SELECT n_chars,
        |              (['ndjson','json','csv','tmp'])[CAST(doc_id % 4 AS INTEGER) + 1] AS ext
        |            FROM documents) i) t
        |GROUP BY status, reason, ext ORDER BY status, reason, ext""".stripMargin,
    // q52: the oracle is the PLAIN join — salting must be output-
    // invariant, that is the whole point.
    "q52_salted_join" ->
      """SELECT o_orderstatus,
        |       SUM(FLOOR(ABS(l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5)
        |           * SIGN(l_extendedprice * (1.0 - l_discount))) / 10000.0 AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q49: one UNION ALL branch per profiled column; min/max renders
    // mirror Report.eventCols exactly (VARCHAR casts, strftime %f for
    // ts, DECIMAL(18,2) for value — the q01-proven parity renders).
    // ts distinct counts run over CAST(ts AS TIMESTAMP) = the same
    // micros truncation Tables.events applies.
    "q49_profile" -> (profileOracleBody + "\nORDER BY col_name"),
    // q73: q51's certification pattern for the HLL profile flag — the
    // oracle recomputes the deterministic columns and expects every
    // sketch-verdict boolean true
    "q73_profile_sketch" ->
      s"""SELECT col_name, n_rows, n_null, n_distinct,
         |       true AS nd_sketch_ok, min_value, max_value
         |FROM ($profileOracleBody) t ORDER BY col_name""".stripMargin,

    // q50: dup_frac mirrors Exact.dround — divide first, then
    // FLOOR(x·10⁴+0.5)/10⁴, identical IEEE op order on both engines.
    "q50_dup_report" ->
      """WITH f AS (SELECT lang,
        |             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |           FROM documents),
        |g AS (SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct
        |      FROM f GROUP BY 1)
        |SELECT lang, n_docs, n_distinct, n_docs - n_distinct AS n_dupes,
        |       FLOOR(CAST(n_docs - n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS dup_frac
        |FROM g ORDER BY lang""".stripMargin,
    // q90: the shingle construction mirrors shingleCtes (Exprs.shingles
    // through DuckDB list ops); the oracle joins by shingle TEXT where
    // Spark joins by xxhash64 (the q71 convention); containments
    // divide the same BIGINTs on both engines.
    "q90_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT source, unnest(list_distinct(list_transform(
        |        range(1, greatest(len(toks) - 1, 2)),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh FROM t),
        |d AS (SELECT DISTINCT source, sh FROM s),
        |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM d GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_shared
        |      FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.n_shared, ca.n_sh AS n_a, cb.n_sh AS n_b,
        |       p.n_shared / ca.n_sh AS containment_ab,
        |       p.n_shared / cb.n_sh AS containment_ba
        |FROM p JOIN c ca ON p.src_a = ca.source JOIN c cb ON p.src_b = cb.source
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    // s05: stream-stream interval join ≡ batch self-join with the same
    // time-range predicate; gap is an integer-µs difference.
    "s05_stream_join" ->
      """SELECT p.event_id AS error_id, a.event_id AS action_id,
        |       epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) AS gap_us
        |FROM events p JOIN events a
        |  ON p.user_id = a.user_id
        | AND p.event_type = 'error' AND a.event_type <> 'error'
        | AND CAST(a.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(a.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        |ORDER BY error_id, action_id""".stripMargin,
    // Fixed-point sums (Exact.sumFixed): each addend quantized with
    // floor(|x|·10^dp + 0.5)·sign(x) — half-away-from-zero for both
    // signs, identical IEEE ops on both engines, every addend an
    // integer-exact double, so sums are order-independent and
    // bit-identical with no decimal conversion anywhere.
    "q12_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(FLOOR(ABS(l_quantity) * 100.0 + 0.5) * SIGN(l_quantity)) / 100.0 AS sum_qty,
        |       SUM(FLOOR(ABS(l_extendedprice) * 100.0 + 0.5) * SIGN(l_extendedprice)) / 100.0 AS sum_base_price,
        |       SUM(FLOOR(ABS(l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5) * SIGN(l_extendedprice * (1.0 - l_discount))) / 10000.0 AS sum_disc_price,
        |       SUM(FLOOR(ABS(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 10000.0 + 0.5) * SIGN(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))) / 10000.0 AS sum_charge,
        |       ROUND(AVG(l_quantity), 4) AS avg_qty,
        |       ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |       ROUND(AVG(l_discount), 4) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q13_join_agg" ->
      """SELECT l.l_orderkey AS l_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
        |       SUM(FLOOR(ABS(l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0 + 0.5) * SIGN(l.l_extendedprice * (1.0 - l.l_discount))) / 10000.0 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q14_broadcast_dims" ->
      """SELECT r_name, n_name,
        |       SUM(FLOOR(ABS(l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5) * SIGN(l_extendedprice * (1.0 - l_discount))) / 10000.0 AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q15_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q16_running_total" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_sessionization" ->
      """WITH f AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) > 1800.0
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "q116_lang_mix_detect" -> langMixOracle,
    "q117_datasheet" -> datasheetOracle,
    "q121_datasheet_sketch" -> datasheetSketchOracle,
    "q27_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','a','value','fast','slow'], x))) AS INTEGER) AS s_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['table','row','merge'], x))) AS INTEGER) AS s_de,
        |  CAST(len(list_filter(toks, x -> list_contains(['query','scan','filter'], x))) AS INTEGER) AS s_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['join','group','sort'], x))) AS INTEGER) AS s_fr,
        |  CAST(len(list_filter(toks, x -> list_contains(['stream','batch','window'], x))) AS INTEGER) AS s_zh
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted_lang,
        |  s_en AS score_en, s_de AS score_de, s_es AS score_es,
        |  s_fr AS score_fr, s_zh AS score_zh
        |FROM s ORDER BY doc_id""".stripMargin,
    "q28_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(toks) AS DOUBLE) AS n_tok,
        |        CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
        |        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
        |        LEAST(n_chars / 500.0, 1.0) AS len_sat
        |      FROM t)
        |SELECT doc_id, FLOOR(n_uniq / n_tok * 10000.0 + 0.5) / 10000.0 AS uniq_ratio,
        |       FLOOR(n_stop / n_tok * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
        |       FLOOR(len_sat * 10000.0 + 0.5) / 10000.0 AS len_saturation,
        |       FLOOR((n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    // q61: q28's quality replayed with lang carried, then the
    // per-stratum rank cut — ties broken by doc_id in both engines
    "q61_quality_prune" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, lang,
        |        CAST(len(toks) AS DOUBLE) AS n_tok,
        |        CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
        |        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
        |        LEAST(n_chars / 500.0, 1.0) AS len_sat
        |      FROM t),
        |q AS (SELECT doc_id, lang,
        |        FLOOR((n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
        |      FROM m),
        |w AS (SELECT doc_id, lang, quality,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM q)
        |SELECT doc_id, lang, quality FROM w WHERE rn > FLOOR(0.2 * n)
        |ORDER BY doc_id""".stripMargin,
    // q68: wordcount → top-V by (count desc, token) → running-sum
    // coverage; integers until the single final division
    "q68_vocab_coverage" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, COUNT(*) AS n_occurrences FROM w GROUP BY 1),
        |t AS (SELECT SUM(n_occurrences) AS total FROM c),
        |r AS (SELECT token, n_occurrences,
        |        CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT) AS rank,
        |        SUM(n_occurrences) OVER (ORDER BY n_occurrences DESC, token
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM c)
        |SELECT rank, token, n_occurrences,
        |       CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_coverage
        |FROM r, t WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // q67: the C4+Gopher rule bundle replayed — every ratio is the
    // same two integers divided once, the CASE order is the rule order
    "q67_heuristic_filter" ->
      (s"WITH ${heuristicCtes()}\n" +
        """SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
          |       CAST(first_fail IS NULL AS INTEGER) AS pass, first_fail
          |FROM f ORDER BY doc_id""".stripMargin),
    "q29_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |       CAST(len(list_filter(string_split(text, ' '), x -> len(x) >= 5)) AS INTEGER) AS n_long_tokens,
        |       CAST(len(text) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Streaming batch-parity oracles: the streaming result must equal
    // the equivalent batch query. s01 ≡ q01; s02 ≡ hourly agg (window
    // starts are hour-aligned, so window.start ≡ date_trunc('hour'));
    // s03 ≡ q03 restricted to FULL manifests (partial batches hold back
    // awaiting the flush timeout, which never fires under AvailableNow).
    "s01_stream_ingest" ->
      """SELECT * FROM (
        |  SELECT CAST(event_id AS VARCHAR) AS event_id,
        |         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |         CAST(user_id AS VARCHAR) AS user_id,
        |         event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
        |         props
        |  FROM events) t
        |ORDER BY CAST(event_id AS BIGINT)""".stripMargin,
    "s02_stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS volume
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // s07: q17's lag/sum replay — session_window's merge bound is
    // INCLUSIVE (an event exactly `gap` after the last still merges:
    // StreamingSpec pins it), so the gap predicate is q17's own >
    "s07_stream_session" ->
      """WITH f AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) > 1800.0
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_start""".stripMargin,
    "s03_stream_batcher" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars,
        |         CAST((ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) // 10 AS INTEGER) AS batch_id
        |  FROM documents)
        |SELECT lang, batch_id, COUNT(*) AS n_files,
        |       MIN(doc_id) AS first_file, MAX(doc_id) AS last_file,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY lang, batch_id
        |HAVING COUNT(*) = 10 ORDER BY lang, batch_id""".stripMargin,
    // s06: one AvailableNow drain = one micro-batch; the watermark only
    // advances AFTER it, so nothing evicts or drops mid-drain and the
    // output is exactly the distinct fingerprint set. The TTL behavior
    // itself (key forgotten after the horizon, late rows dropped) is
    // pinned in StreamingSpec across multiple micro-batches.
    "s06_stream_dedup_ttl" ->
      """SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY 1""".stripMargin,
    // s04: single-drain streaming dedup ≡ batch GROUP BY fingerprint →
    // MIN(doc_id) (see Streams.streamDedup's determinism note).
    "s04_stream_dedup" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |       MIN(doc_id) AS doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // m01: strlen() is DuckDB's byte length — matches Spark's
    // length(binary) over the same UTF-8 bytes; md5 likewise.
    "m01_binary_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST((n_chars % 64) * 16 AS INTEGER) AS width,
        |       CAST((n_chars % 48) * 16 AS INTEGER) AS height,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m02: byte features are a pure function of the payload bytes —
    // recompute them from ord() over the same ASCII text (bytes ≡
    // codepoints; m01's md5 parity already pins the byte identity).
    // Bucket b of the byte histogram = count(ord // 32 = b) / len.
    "m02_byte_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |              WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |              ELSE 'video/mp4' END AS mime,
        |         list_transform(range(1, strlen(text) + 1), i -> ord(substr(text, i, 1))) AS bs
        |  FROM documents)
        |SELECT doc_id, mime,
        |       CAST(len(bs) AS INTEGER) AS n_bytes,
        |       CAST(list_sum(bs[1:16]) AS INTEGER) AS header_sum,
        |       FLOOR(len(list_filter(bs, x -> x // 32 = 0)) / CAST(len(bs) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS f0,
        |       FLOOR(len(list_filter(bs, x -> x // 32 = 3)) / CAST(len(bs) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS f3
        |FROM b ORDER BY doc_id""".stripMargin,
    // m03: frame windows recomputed via substr over the same ASCII
    // text (bytes ≡ codepoints, as m02); md5 digests pin each sampled
    // window byte-for-byte.
    "m03_frame_sample" ->
      """WITH v AS (SELECT doc_id, text, strlen(text) AS n FROM documents
        |           WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, text, n, unnest(range(0, 4)) AS frame_idx FROM v)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       CAST(frame_idx * 64 AS INTEGER) AS byte_offset,
        |       CAST(LEAST(n - frame_idx * 64, 32) AS INTEGER) AS n_bytes,
        |       md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 32)) AS frame_hash
        |FROM f WHERE frame_idx * 64 < n ORDER BY doc_id, frame_idx""".stripMargin,
    // q96: the worker-calculator model replayed row-for-row — every
    // phase is IEEE division of exact integers by literal constants,
    // summed left-assoc; parallel divisor 8·0.75 = 6.0 exactly
    "q96_cost_projection" ->
      """WITH sz AS (SELECT source AS job_name, CAST(COUNT(*) AS BIGINT) AS records,
        |              CAST(SUM(strlen(text)) AS BIGINT) AS bytes
        |            FROM documents GROUP BY 1),
        |spec(worker_type, read_mbs, parse_rps, process_rps, write_mbs, cost_hr, dpu) AS (
        |  VALUES ('G.1X', 100.0, 100000.0, 250000.0, 350.0, 0.44, 1),
        |         ('G.2X', 175.0, 175000.0, 500000.0, 625.0, 0.88, 2),
        |         ('G.4X', 350.0, 350000.0, 1000000.0, 1250.0, 1.76, 4),
        |         ('G.8X', 600.0, 600000.0, 1750000.0, 2500.0, 3.52, 8)),
        |p AS (SELECT s.job_name, w.worker_type, s.records, s.bytes,
        |        s.bytes / 1073741824.0 AS data_gb,
        |        (s.bytes / 1048576.0) / w.read_mbs AS read_sec,
        |        s.records / w.parse_rps AS parse_sec,
        |        s.records / w.process_rps AS process_sec,
        |        ((s.bytes / 1048576.0) / 6.0) / w.write_mbs AS write_sec,
        |        CASE WHEN s.bytes / 1073741824.0 < 1.0 THEN 30.0
        |             WHEN s.bytes / 1073741824.0 < 10.0 THEN 45.0
        |             WHEN s.bytes / 1073741824.0 < 100.0 THEN 60.0
        |             ELSE 90.0 END AS overhead,
        |        w.cost_hr, w.dpu
        |      FROM sz s CROSS JOIN spec w),
        |p2 AS (SELECT *, read_sec + parse_sec + process_sec + write_sec + overhead AS single_worker_sec
        |       FROM p),
        |p3 AS (SELECT *, single_worker_sec / 6.0 AS parallel_sec FROM p2)
        |SELECT job_name, worker_type, records, bytes, data_gb,
        |       single_worker_sec, parallel_sec,
        |       cost_hr * (parallel_sec / 3600.0) * 8 AS cost_usd,
        |       dpu * 8 * (parallel_sec / 3600.0) AS dpu_hours
        |FROM p3 ORDER BY job_name, worker_type""".stripMargin,
    // q103: the measured-calibration replay — history from the events
    // table (one run per event_type, span in exact integer µs), rates
    // via the shared ms fixed-point, projection laws = q96's verbatim
    "q103_cost_calibrated" ->
      """WITH sz AS (SELECT source AS job_name, CAST(COUNT(*) AS BIGINT) AS records,
        |              CAST(SUM(strlen(text)) AS BIGINT) AS bytes
        |            FROM documents GROUP BY 1),
        |hist AS (SELECT event_type AS job_name,
        |           CAST(COUNT(*) AS BIGINT) AS records_processed,
        |           CAST(SUM(strlen(props)) AS BIGINT) AS output_bytes,
        |           (epoch_us(MAX(CAST(ts AS TIMESTAMP))) - epoch_us(MIN(CAST(ts AS TIMESTAMP)))) / 1000000.0 AS duration_seconds
        |         FROM events GROUP BY 1),
        |rates AS (SELECT 'measured:' || job_name AS worker_type,
        |            records_processed / sec_total AS eff_rps,
        |            (output_bytes / 1048576.0) / sec_total AS eff_mbs
        |          FROM (SELECT job_name, SUM(records_processed) AS records_processed,
        |                  SUM(output_bytes) AS output_bytes,
        |                  CAST(SUM(CAST(FLOOR(duration_seconds * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000.0 AS sec_total
        |                FROM hist GROUP BY 1) t
        |          WHERE sec_total > 0 AND records_processed > 0),
        |p AS (SELECT s.job_name, r.worker_type, s.records, s.bytes,
        |        s.bytes / 1073741824.0 AS data_gb, r.eff_rps, r.eff_mbs,
        |        s.records / r.eff_rps +
        |        CASE WHEN s.bytes / 1073741824.0 < 1.0 THEN 30.0
        |             WHEN s.bytes / 1073741824.0 < 10.0 THEN 45.0
        |             WHEN s.bytes / 1073741824.0 < 100.0 THEN 60.0
        |             ELSE 90.0 END AS single_worker_sec
        |      FROM sz s CROSS JOIN rates r),
        |p2 AS (SELECT *, single_worker_sec / 6.0 AS parallel_sec FROM p)
        |SELECT job_name, worker_type, records, bytes, data_gb, eff_rps, eff_mbs,
        |       single_worker_sec, parallel_sec,
        |       0.44 * (parallel_sec / 3600.0) * 8 AS cost_usd,
        |       8 * (parallel_sec / 3600.0) AS dpu_hours
        |FROM p2 ORDER BY job_name, worker_type""".stripMargin,
    // m04–m08/s13: GOLDEN-DIGEST oracles (round-13, the r12 verdict's
    // top task). DuckDB cannot decode PNG/RIFF/GIF, so the expected
    // values come from the committed golden parquet (graft.GoldenGen:
    // every value derives from the synthesis LAWS, never the decode
    // path) keyed by md5(text) — a pure function of the payload, so
    // one golden serves every SF whose texts it covers and DuckDB
    // computes the join key itself. Hash equality of the declared
    // query (law → real-codec encode → real-codec decode) against the
    // golden (law only) IS the independent codec round-trip proof.
    "m04_image_decode" ->
      s"""SELECT d.doc_id, g.width, g.height, g.n_bytes, g.pixel_md5, g.mean_luma
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/image.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 0 ORDER BY d.doc_id""".stripMargin,
    "m07_image_dhash" ->
      s"""SELECT d.doc_id, g.width, g.height, g.dhash
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/image.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 0 ORDER BY d.doc_id""".stripMargin,
    "m09_image_embed" ->
      s"""SELECT d.doc_id, g.width, g.height, g.grid_emb AS emb,
         |       g.grid_nrm2 AS nrm2
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/image.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 0 ORDER BY d.doc_id""".stripMargin,
    "m05_audio_decode" ->
      s"""SELECT d.doc_id, g.channels, g.sample_rate, g.n_frames,
         |       g.duration_ms, g.n_bytes, g.pcm_md5, g.rms
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/audio.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 1 ORDER BY d.doc_id""".stripMargin,
    "m08_audio_fingerprint" ->
      s"""SELECT d.doc_id, g.n_samples, g.afp
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/audio.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 1 ORDER BY d.doc_id""".stripMargin,
    "m10_audio_embed" ->
      s"""SELECT d.doc_id, g.n_samples, g.env_emb AS emb
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/audio.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 1 ORDER BY d.doc_id""".stripMargin,
    "m06_gif_frames" ->
      s"""SELECT d.doc_id, g.frame_idx, g.n_frames, g.width, g.height,
         |       g.pixel_md5, g.mean_luma
         |FROM documents d
         |JOIN read_parquet('$GoldenDir/gif.parquet/*.parquet') g
         |  ON md5(d.text) = g.text_md5
         |WHERE d.doc_id % 3 = 2 ORDER BY d.doc_id, g.frame_idx""".stripMargin,
    // s13 = m07's dHash through the streaming dedup: first (smallest
    // doc_id) carrier per perceptual hash — s04's min-doc_id contract
    // over the golden dhash column.
    "s13_stream_image_dedup" ->
      s"""WITH dh AS (
         |  SELECT d.doc_id, g.dhash
         |  FROM documents d
         |  JOIN read_parquet('$GoldenDir/image.parquet/*.parquet') g
         |    ON md5(d.text) = g.text_md5
         |  WHERE d.doc_id % 3 = 0)
         |SELECT dhash AS fingerprint, MIN(doc_id) AS doc_id
         |FROM dh GROUP BY 1 ORDER BY 1""".stripMargin,
    // q37: both engines build the SAME deterministic salted input from
    // doc_id (the synthetic corpus carries no organic PII), then verify
    // the redaction machinery: global regex replace + match counts.
    "q37_pii_redact" ->
      """WITH s AS (SELECT doc_id,
        |        text || ' contact user' || CAST(doc_id AS VARCHAR)
        |             || '@example.com or call +1-555-'
        |             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS salted
        |      FROM documents),
        |r AS (SELECT doc_id, salted,
        |        regexp_replace(
        |          regexp_replace(salted, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |          '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
        |      FROM s)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(salted, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |       CAST(len(regexp_extract_all(salted, '\+1-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        |       md5(red) AS redacted_hash,
        |       CAST(len(red) AS INTEGER) AS n_chars_redacted
        |FROM r ORDER BY doc_id""".stripMargin,
    // q38: sampling gate = first 16 bits of md5(doc_id) vs per-lang
    // threshold floor(rate·65536) — pure function of the row, so both
    // engines keep exactly the same docs.
    "q38_sample_stratified" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
        |  FROM documents) b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 19660 ELSE 65536 END
        |ORDER BY doc_id""".stripMargin,
    // q59: mixture planning replayed in SQL — same double arithmetic
    // shape as the Spark plan (n BIGINT / p DOUBLE, then K·p/n·65536
    // left-associated) so the FLOOR'd thresholds agree bit-for-bit
    "q59_source_mix" ->
      """WITH tgt AS (SELECT * FROM (VALUES
        |         ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |         ('src2', CAST(0.2 AS DOUBLE))) t(source, p)),
        |c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |j AS (SELECT c.source, c.n, t.p FROM c JOIN tgt t ON c.source = t.source),
        |k AS (SELECT MIN(n / p) AS k FROM j),
        |r AS (SELECT j.source, CAST(FLOOR(k.k * j.p / j.n * 65536) AS INTEGER) AS thr
        |      FROM j CROSS JOIN k),
        |b AS (SELECT doc_id, source,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
        |      FROM documents)
        |SELECT b.doc_id, b.source, b.bucket FROM b JOIN r ON b.source = r.source
        |WHERE b.bucket < r.thr ORDER BY b.doc_id""".stripMargin,
    // q107: temperature mixing replayed — w = sqrt(n) (correctly-
    // rounded IEEE sqrt, bit-identical across engines), then q59's
    // K·w/n·65536 left-associated floor chain verbatim
    "q107_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
        |k AS (SELECT MIN(n / w) AS k FROM w),
        |r AS (SELECT w.lang, CAST(FLOOR(k.k * w.w / w.n * 65536) AS INTEGER) AS thr
        |      FROM w CROSS JOIN k),
        |b AS (SELECT doc_id, lang,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
        |      FROM documents)
        |SELECT b.doc_id, b.lang, b.bucket FROM b JOIN r ON b.lang = r.lang
        |WHERE b.bucket < r.thr ORDER BY b.doc_id""".stripMargin,
    // q110: hashed-bigram bag models for target (src0) vs raw, weight
    // per bucket = cnt_t·N_r − cnt_r·N_t in HUGEINT (the exact integer
    // probability difference — no logs, q95's rule), deterministic
    // top-100 on (score desc, doc_id). Featureless raw docs score 0
    // via the LEFT join.
    "q110_dsir_select" ->
      """WITH t AS (SELECT doc_id, source, lang, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT doc_id, source,
        |        CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
        |          i -> CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i+1]), 1, 4)) AS INTEGER) % 256)
        |        ELSE [] END AS bs FROM t),
        |x AS (SELECT doc_id, source, unnest(bs) AS b FROM g),
        |c AS (SELECT b, SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cnt_t,
        |             SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS cnt_r
        |      FROM x GROUP BY 1),
        |w AS (SELECT b, CAST(cnt_t AS HUGEINT) * (SELECT SUM(cnt_r) FROM c)
        |             - CAST(cnt_r AS HUGEINT) * (SELECT SUM(cnt_t) FROM c) AS wgt
        |      FROM c),
        |sc AS (SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, SUM(w.wgt) AS raw
        |       FROM x JOIN w USING (b) WHERE x.source <> 'src0' GROUP BY 1),
        |rk AS (SELECT d.doc_id, d.source, d.lang,
        |              COALESCE(sc.n_feats, 0) AS n_feats,
        |              CAST(COALESCE(sc.raw, 0) AS HUGEINT) AS raw_score
        |       FROM documents d LEFT JOIN sc USING (doc_id)
        |       WHERE d.source <> 'src0'
        |       ORDER BY raw_score DESC, d.doc_id LIMIT 100)
        |SELECT doc_id, source, lang, n_feats,
        |       CAST(raw_score AS VARCHAR) AS score
        |FROM rk ORDER BY raw_score DESC, doc_id""".stripMargin,
    // q111: densified (source × observed bucket) count frame, pair
    // TVD over the common denominator — HUGEINT numerator summed
    // exactly, den = 2·N_a·N_b, tvd = one double division of the two.
    "q111_source_divergence" -> sourceDivergenceOracle,
    "q120_perplexity_filter" -> perplexityOracle,
    "q124_perplexity_sketch" -> perplexitySketchOracle,
    "q112_epoch_mix" -> epochMixOracle,
    // q113: salted 48-bit md5 shuffle key → shard = h mod 16, pos =
    // rank by (h, doc_id) within the shard.
    "q113_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id, source,
        |             CAST(('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |               AS BIGINT) AS hkey
        |           FROM documents)
        |SELECT doc_id, source, CAST(hkey % ${Corpus.DefaultShards} AS INTEGER) AS shard,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY hkey % ${Corpus.DefaultShards} ORDER BY hkey, doc_id) - 1
        |         AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    // q118: the salted quota-rank gate replayed — rank by md5 within
    // the domain, keep rank <= cap, pre-cap total carried per row
    // s19: streaming quota = first-come admission; one-drain delivery
    // (the declared query) makes arrival order doc_id order, so the
    // replay is the doc_id-rank prefix per domain
    "s19_stream_domain_quota" ->
      s"""SELECT doc_id, domain, rk FROM (
        |  SELECT doc_id, source AS domain,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rk
        |  FROM documents) r
        |WHERE rk <= ${Corpus.DefaultDomainQuota} ORDER BY doc_id""".stripMargin,
    "q118_domain_quota" -> domainQuotaOracle,
    // q126: the salted pre-pruned form is ROW-IDENTICAL to the plain
    // gate by construction — it shares q118's oracle verbatim, so the
    // identity is driver-hash-checked every round (the q72/s11
    // convention), not just spec-claimed
    "q126_domain_quota_pruned" -> domainQuotaOracle,
    // q39: the oracle is DuckDB's NATIVE ASOF JOIN — an independent
    // first-class implementation checking graft's union-and-sweep
    // encoding. Actions deduped per (user, ts) by MAX(event_id) so ties
    // resolve identically; strict `>` = strictly-earlier semantics.
    "q39_asof_join" ->
      """WITH a AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS action_id
        |           FROM events WHERE event_type <> 'error' GROUP BY 1, 2),
        |     p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, p.ts,
        |       a.action_id AS prior_action_id, a.ts AS prior_ts,
        |       epoch_us(p.ts) - epoch_us(a.ts) AS gap_us
        |FROM p ASOF JOIN a ON p.user_id = a.user_id AND p.ts > a.ts
        |ORDER BY p.event_id""".stripMargin,
    // q40: chunk = floor(tokens-before-doc / budget) over a per-lang
    // running sum — integer token counts, so the cumsum and the
    // floor-divide are bit-identical on both engines.
    // q72 shares q40's oracle verbatim: the sharded plan must be
    // hash-identical to the single-window plan, checked by the driver
    "q72_pack_sharded" -> packOracle,
    // q77: the interleave term is generated by the same (bits=8) loop
    // shape as Corpus.zOrderKey so the two engines cannot drift.
    "q77_zorder_layout" -> {
      val z = (0 until 8).map(i =>
        s"(((x_c >> $i) & 1) << ${2 * i}) + (((y_c >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH dict AS (SELECT lang, DENSE_RANK() OVER (ORDER BY lang) - 1 AS lang_c,
         |                     COUNT(*) OVER () AS nl
         |              FROM (SELECT DISTINCT lang FROM documents)),
         |st AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents),
         |k AS (SELECT d.doc_id, d.lang, d.n_chars, dict.lang_c,
         |             CAST(FLOOR((d.n_chars - st.mn) * 256.0 / (st.mx - st.mn + 1)) AS INT) AS x_c,
         |             CAST(FLOOR(dict.lang_c * 256.0 / dict.nl) AS INT) AS y_c
         |      FROM documents d JOIN dict USING (lang) CROSS JOIN st),
         |z AS (SELECT doc_id, lang, n_chars, lang_c, ($z) AS zkey FROM k)
         |SELECT zkey >> 12 AS bucket, COUNT(*) AS n_docs,
         |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
         |       MIN(lang_c) AS min_lang_c, MAX(lang_c) AS max_lang_c,
         |       COUNT(DISTINCT lang) AS n_langs
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q119: the BFD placement spec replayed MOVE-FOR-MOVE — a recursive
    // CTE carries each (lang, shard) group's bin-remainder list through
    // the decreasing order; best fit = first position of the min
    // fitting remainder (list_position's first-occurrence = the
    // lowest-bin-id tie rule)
    "q119_pack_bfd" -> packBfdOracle,
    "q40_pack_sequences" -> packOracle,
    // s20: the drained per-doc assignments regrouped by (lang,
    // chunk_id) equal batch q40's chunk table exactly (one-drain
    // delivery = doc_id order = q40's window order), so the oracle is
    // q40's verbatim — the q72/s11 shared-oracle convention
    "s20_stream_pack_meter" -> packOracle,
    // q41: all counts are integers and each ratio is ONE IEEE division
    // (no rounding step needed for parity). Out-of-bounds list index →
    // NULL in DuckDB ≡ try_element_at → NULL in Spark: both produce
    // exactly len-1 2-grams.
    "q41_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT doc_id, tk,
        |        list_filter(list_transform(range(1, len(tk) + 1), i -> tk[i] || ' ' || tk[i+1]),
        |                    x -> x IS NOT NULL) AS gr
        |      FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(tk) > 0 THEN CAST(list_max(list_transform(list_distinct(tk),
        |       u -> len(list_filter(tk, x -> x = u)))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
        |       ELSE 0.0 END AS top_tok_frac,
        |  CASE WHEN len(gr) > 0 THEN CAST(list_max(list_transform(list_distinct(gr),
        |       u -> len(list_filter(gr, x -> x = u)))) AS DOUBLE) / CAST(len(gr) AS DOUBLE)
        |       ELSE 0.0 END AS top_2gram_frac,
        |  CASE WHEN len(gr) > 0 THEN CAST(len(gr) - len(list_distinct(gr)) AS DOUBLE)
        |       / CAST(len(gr) AS DOUBLE)
        |       ELSE 0.0 END AS dup_2gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    // q53: chunk geometry is integer arithmetic (bit-identical); the
    // hash is md5 over the joined slice — DuckDB list slicing is
    // 1-based inclusive [a : a+w-1], truncating at the list end like
    // Spark's slice(arr, start, length).
    "q53_chunk_sliding" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id, tk, len(tk) AS n,
        |        GREATEST(1, CAST(CEIL((len(tk) - 32) / 16.0) AS INTEGER) + 1) AS nc
        |      FROM t),
        |x AS (SELECT doc_id, tk, n, unnest(range(0, nc)) AS chunk_id FROM c)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |       CAST(chunk_id * 16 AS INTEGER) AS start_tok,
        |       CAST(LEAST(n - chunk_id * 16, 32) AS INTEGER) AS chunk_tokens,
        |       md5(array_to_string(tk[chunk_id*16+1 : chunk_id*16+32], ' ')) AS chunk_hash
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    "q81_bpe_encode" -> bpeEncodeOracle,
    "q82_bpe_pack" -> bpePackOracle,
    "q83_bpe_train" -> bpeTrainOracle,
    "q84_bpe_encode_trained" -> bpeEncodeTrainedOracle,
    "q86_bpe_decode" -> bpeDecodeOracle,
    "q88_token_budget" -> tokenBudgetOracle,
    "q108_tokenizer_fertility" -> tokenizerFertilityOracle,
    // q109: the exact top-20 recomputed; `certified` is TRUE by the
    // Misra-Gries theorems (never-overestimate, N/c underestimate
    // bound, guaranteed membership above N/c) REGARDLESS of Spark's
    // partitioning/merge order — q51/q73's verdict convention, so a
    // violated bound hash-mismatches here
    "q109_heavy_hitters" -> heavyHittersOracle,
    "q92_text_embed" -> textEmbedOracle,
    // s12 = q88's totals through the real micro-batch engine (share
    // column excluded — a batch-side derivation; nested aggs don't
    // stream), so the oracle is the same generated encode re-grouped.
    "s12_stream_token_meter" -> tokenMeterOracle,
    // s16 = q109 through the real micro-batch engine: the streamed MG
    // summary is partition/merge-order-dependent but its verdicts are
    // not (the MG theorems), and the emitted columns are the exact
    // top-k + totals — so the q109 oracle applies row-identically.
    "s16_stream_heavy_hitters" -> heavyHittersOracle,
    // s17 = q111 through the real micro-batch engine: drained
    // (source, bucket) state equals the batch counts row-for-row, so
    // the densify+TVD tail emits q111's exact output.
    "s17_stream_drift" -> sourceDivergenceOracle,
    "q42_rollup_report" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       COUNT(*) AS n_events,
        |       SUM(FLOOR(ABS(value) * 10000.0 + 0.5) * SIGN(value)) / 10000.0 AS total_value,
        |       CAST(GROUPING(CAST(ts AS DATE)) AS INTEGER) AS g_date,
        |       CAST(GROUPING(event_type) AS INTEGER) AS g_type
        |FROM events
        |GROUP BY ROLLUP(CAST(ts AS DATE), event_type)
        |ORDER BY g_date, g_type, event_date, event_type""".stripMargin,
    "q43_event_pivot" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q44: score = tf/df — two integer counts in one IEEE division
    // (ln-based idf is NOT bit-stable across engines; a rational is,
    // and preserves ordering for a fixed language count). Ties rank
    // deterministically by term.
    "q44_tfidf_terms" ->
      """WITH tf AS (SELECT lang, t.term AS term, COUNT(*) AS tf
        |            FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |            GROUP BY 1, 2),
        |d AS (SELECT lang, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
        |s AS (SELECT lang, term, tf, df,
        |        CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term) AS INTEGER) AS rnk
        |      FROM d)
        |SELECT lang, term, tf, df, score, rnk FROM s
        |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    // q54: the vocabulary is the top-50 tokens by (count DESC, token)
    // — fully deterministic, so membership and the OOV counts are
    // integers and the fraction is one dround'd division.
    "q54_oov_rate" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY 1
        |                       ORDER BY cnt DESC, tok LIMIT 50) x),
        |j AS (SELECT t.doc_id, v.tok AS vtok FROM tk t LEFT JOIN v ON t.tok = v.tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       COUNT(CASE WHEN vtok IS NULL THEN 1 END) AS n_oov,
        |       FLOOR(CAST(COUNT(CASE WHEN vtok IS NULL THEN 1 END) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS oov_frac
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q89: top-V vocabulary + md5-derived integer weights in [-7,7]
    // (the 16-bit '0x'||substr(md5) idiom q38 established), weight
    // sum and integer keep verdict per doc; score is one IEEE
    // division of the same integers on both engines.
    "q89_model_filter" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY 1
        |                       ORDER BY cnt DESC, tok LIMIT 512) x),
        |wt AS (SELECT tok,
        |         (CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % 15) - 7 AS wgt
        |       FROM v),
        |j AS (SELECT t.doc_id, wt.wgt FROM tk t LEFT JOIN wt ON t.tok = wt.tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) AS raw_score,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) / COUNT(*) AS score,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) >= 0 AS keep
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q95: the q28 label CTE (dround'd quality >= 0.65, bit-identical
    // both engines) feeds per-class token counts over q89's top-V
    // vocabulary; weights = SIGN of the rate cross-product compare in
    // HUGEINT (the Spark side compares the same products in
    // decimal(38) — both exact), then q89's serving body verbatim.
    "q95_model_train_filter" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |lab AS (SELECT doc_id, toks,
        |          FLOOR((CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.4
        |            + (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
        |                     / CAST(len(toks) AS DOUBLE)) * 0.3
        |            + LEAST(n_chars / 500.0, 1.0) * 0.3) * 10000.0 + 0.5) / 10000.0 >= 0.65 AS label
        |        FROM t),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY 1
        |                       ORDER BY cnt DESC, tok LIMIT 512) x),
        |ltk AS (SELECT l.label, unnest(l.toks) AS tok FROM lab l),
        |cls AS (SELECT tok,
        |          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |          CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |        FROM ltk JOIN v USING (tok) GROUP BY tok),
        |tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS pos_tot,
        |               CAST(SUM(neg) AS BIGINT) AS neg_tot FROM cls),
        |wt AS (SELECT tok,
        |         CASE WHEN CAST(pos AS HUGEINT) * neg_tot > CAST(neg AS HUGEINT) * pos_tot THEN 1
        |              WHEN CAST(pos AS HUGEINT) * neg_tot < CAST(neg AS HUGEINT) * pos_tot THEN -1
        |              ELSE 0 END AS wgt
        |       FROM cls CROSS JOIN tot),
        |j AS (SELECT t2.doc_id, wt.wgt FROM tk t2 LEFT JOIN wt ON t2.tok = wt.tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) AS raw_score,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) / COUNT(*) AS score,
        |       CAST(SUM(COALESCE(wgt, 0)) AS BIGINT) >= 0 AS keep
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q35_decontaminate" -> decontaminateOracle,
    // q58/s18 deliberately share q35's oracle: the bloom prefilter must
    // be output-invisible (no false negatives; exact verify kills the
    // fpp tail), and per-doc verdicts are batching-independent, so the
    // SQL truth is the same exact semi-join for all three
    "q58_decontaminate_bloom" -> decontaminateOracle,
    "s18_stream_decontaminate" -> decontaminateOracle,
    "q21_dedup_ngram"     -> ngramOracle,
    "q114_holdout_split"  -> holdoutOracle,
    // q74: same text-vs-xxhash64 grouping note as q71; novelty mirrors
    // Exact.dround (FLOOR(x·10⁴+0.5)/10⁴) on the same integer operands
    "q74_novelty_score" ->
      s"""WITH ${shingleCtes()},
         |x AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         |d AS (SELECT shingle, COUNT(*) AS df FROM x GROUP BY 1),
         |j AS (SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |             CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         |      FROM x JOIN d USING (shingle) GROUP BY 1)
         |SELECT doc_id, n_shingles, n_unique,
         |       FLOOR(CAST(n_unique AS DOUBLE) / CAST(n_shingles AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS novelty
         |FROM j ORDER BY doc_id""".stripMargin,
    // q71: groups by shingle TEXT where Spark groups by xxhash64 —
    // identical counts modulo hash collisions (~n²/2⁶⁵, nil here)
    "q71_dfcap_audit" ->
      s"""WITH ${shingleCtes()},
         |x AS (SELECT unnest(sh) AS shingle FROM s),
         |d AS (SELECT shingle, COUNT(*) AS df FROM x GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS total_shingles,
         |       CAST(COALESCE(SUM(CASE WHEN df > 4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS dropped_shingles,
         |       CAST(COALESCE(SUM(CASE WHEN df > 4 THEN df END), 0) AS BIGINT) AS dropped_postings,
         |       CAST(MAX(df) AS BIGINT) AS max_df
         |FROM d""".stripMargin,
    "q60_containment_ngram" -> containmentOracle,
    // q62: positional k-gram md5s (duplicates kept — NOT the distinct
    // shingle CTE), windowed list_min selection, distinct set
    "q62_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) >= 3
        |        THEN list_transform(range(1, len(toks) - 1),
        |               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |        ELSE [] END AS hs FROM t),
        |s AS (SELECT doc_id, CASE WHEN len(hs) >= 4
        |        THEN list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))
        |        WHEN len(hs) > 0 THEN [list_min(hs)]
        |        ELSE [] END AS sel FROM g)
        |SELECT doc_id, unnest(list_distinct(sel)) AS fp FROM s
        |ORDER BY doc_id, fp""".stripMargin,
    // q66: the q62 fingerprint CTEs verbatim, then the q21-style pair
    // pass — shared count + both set sizes, integer-only output
    "q66_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) >= 3
        |        THEN list_transform(range(1, len(toks) - 1),
        |               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |        ELSE [] END AS hs FROM t),
        |s AS (SELECT doc_id, CASE WHEN len(hs) >= 4
        |        THEN list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))
        |        WHEN len(hs) > 0 THEN [list_min(hs)]
        |        ELSE [] END AS sel FROM g),
        |f AS (SELECT doc_id, unnest(list_distinct(sel)) AS fp FROM s),
        |nf AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
        |      FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, p.shared_fps, na.n AS n_a, nb.n AS n_b
        |FROM p JOIN nf na ON p.doc_a = na.doc_id JOIN nf nb ON p.doc_b = nb.doc_id
        |WHERE p.shared_fps >= 1 ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "q22_dedup_minhash"   -> minhashOracle,
    "q36_dedup_clusters"  -> clustersOracle,
    "q91_cluster_histogram" -> clusterHistogramOracle,
    "q75_corpus_pipeline" -> pipelineOracle,
    "q123_curation_recipe" -> curationOracle,
    "q55_keeper_select"   -> keeperOracle,
    "q45_dedup_incremental" -> incrementalOracle,
    "s08_stream_dedup_incremental" -> incrementalOracle,
    "s09_stream_dedup_admit" -> admitOracle,
    "s10_stream_quarantine" ->
      """SELECT status, reason, COUNT(*) AS n_docs FROM (
        |  SELECT CASE WHEN n_chars >= 150 AND n_chars <= 450 THEN 'valid' ELSE 'quarantined' END AS status,
        |         CASE WHEN n_chars IS NULL THEN 'null_size'
        |              WHEN n_chars < 150 THEN 'below_min_size'
        |              WHEN n_chars > 450 THEN 'above_max_size' ELSE 'ok' END AS reason
        |  FROM documents) t
        |GROUP BY status, reason ORDER BY status, reason""".stripMargin,
    // q80: segment ROW_NUMBER first-carrier mirrors Spark's
    // min(struct(doc_id, seg_idx)); string_agg skips the removed
    // (NULL) segments and COALESCE matches array_join's '' on
    // all-boilerplate docs. Width spliced from Dedup.DefaultSegmentWidth
    // (round-15 advice — one constant, both engines).
    "q80_line_dedup" ->
      ("WITH " + segmentCtes() +
      """,
        |k AS (SELECT doc_id, seg_idx, seg,
        |        (ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1) AS keep
        |      FROM s)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |       COALESCE(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '') AS cleaned_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // q122: q80's segmentation verbatim, keep = df <= threshold (empty
    // segments structural, always kept) — the rank-free complement
    "q122_boilerplate_strip" ->
      ("WITH " + segmentCtes() +
      s""",
        |d AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS df FROM s WHERE seg <> '' GROUP BY 1),
        |k AS (SELECT s.doc_id, s.seg_idx, s.seg,
        |        (s.seg = '' OR d.df <= ${Dedup.DefaultStripDf}) AS keep
        |      FROM s LEFT JOIN d USING (seg))
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |       COALESCE(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '') AS cleaned_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // q85: duplicated-k-window coverage (k=8) — the oracle keys windows
    // by their exact TEXT where Spark keys by xxhash64 (the q71
    // convention); interval merge and rebuild mirror the Spark plan
    // step for step, the uncovered-token rebuild via ANTI JOIN on the
    // covered-position fan-out.
    "q85_substring_dedup" ->
      """WITH tkt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |             FROM documents),
        |w AS (SELECT doc_id, i - 1 AS pos, array_to_string(tk[i : i + 7], ' ') AS win
        |      FROM tkt, unnest(range(1, len(tk) - 6)) AS t(i)),
        |dup AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) >= 2),
        |d AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)),
        |m AS (SELECT doc_id, pos,
        |        CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
        |             THEN 1 ELSE 0 END AS ns
        |      FROM d),
        |s AS (SELECT doc_id, pos,
        |        SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM m),
        |sp AS (SELECT doc_id, sid, MIN(pos) AS s, MAX(pos) + 7 AS e
        |       FROM s GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |         CAST(SUM(e - s + 1) AS BIGINT) AS n_removed FROM sp GROUP BY doc_id),
        |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM sp),
        |keep AS (SELECT t.doc_id, u.i - 1 AS pos, tk[u.i] AS tok
        |         FROM tkt t, unnest(range(1, len(tk) + 1)) AS u(i)),
        |cl AS (SELECT k.doc_id,
        |         array_to_string(list(k.tok ORDER BY k.pos), ' ') AS cleaned_text
        |       FROM keep k ANTI JOIN cov c ON (k.doc_id = c.doc_id AND k.pos = c.pos)
        |       GROUP BY k.doc_id)
        |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
        |       COALESCE(pd.n_spans, 0) AS n_spans,
        |       COALESCE(pd.n_removed, 0) AS n_removed,
        |       COALESCE(cl.cleaned_text, '') AS cleaned_text
        |FROM tkt t LEFT JOIN pd USING (doc_id) LEFT JOIN cl USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "q47_decontaminate_ngram" -> decontamNgramOracle,
    "q115_decontaminate_excise" -> exciseOracle,
    "q48_kmeans_refine"   -> kmeansOracle,
    "q65_kmeans_train"    -> kmeansIterateOracle(3),
    "q23_dedup_simhash"   -> simhashOracle,
    "q24_dedup_embedding" -> embeddingDedupOracle,
    "q25_ann_bruteforce"  -> annBruteOracle,
    "q26_ann_lsh"         -> annLshOracle,
    "q87_ann_sq8"         -> annSq8Oracle,
    "q46_ann_ivf"         -> annIvfOracle,
    "q69_ann_ivfpq"       -> annIvfPqOracle(),
    "q70_ann_ivfpq_residual" -> annIvfPqOracle(residual = true),
    "q94_ann_ivfpq_trained" -> annIvfPqOracle(trainRounds = 2),
    "q98_ann_ivfpq_trained_res" -> annIvfPqOracle(residual = true, trainRounds = 2),
    "q102_ann_ivfpq_full_trained" ->
      annIvfPqOracle(residual = true, trainRounds = 2, centRounds = 2),
    // q105: q102's statement with only the two serving constants
    // widened — probes rn <= 8, rerank cut ar <= 64
    "q105_ann_ivfpq_served" ->
      annIvfPqOracle(residual = true, trainRounds = 2, centRounds = 2,
        nProbe = 8, rerank = 64),
    // q130: the persisted-index serve is row-identical to q105 (same
    // trained chain, same serving constants, search body SHARED in
    // code) — identity convention, oracle verbatim
    "q130_ann_index_served" ->
      annIvfPqOracle(residual = true, trainRounds = 2, centRounds = 2,
        nProbe = 8, rerank = 64),
    // q132: append ≡ rebuild (per-row encoding under frozen
    // quantizers) ≡ q130 ≡ q105 — one oracle, hash-checked
    "q132_ann_index_appended" ->
      annIvfPqOracle(residual = true, trainRounds = 2, centRounds = 2,
        nProbe = 8, rerank = 64),
    // s22: per-query results are batching-independent functions of
    // (query vector, index, store); one-drain delivery of the q105
    // query set → the drained union IS q105's output (s21's rule)
    "s22_stream_ann_serve" ->
      annIvfPqOracle(residual = true, trainRounds = 2, centRounds = 2,
        nProbe = 8, rerank = 64),
    // q133: drift report — the trained-index CTEs (training only) +
    // the drift target's exact error chain + fixed-point split means
    "q133_ann_index_drift" -> annDriftOracle(120),
    // q136: the drift report twice — before under base-trained
    // quantizers (alarm fires), after under union-trained quantizers
    // (rotate ≡ from-scratch rebuild; alarm clears)
    "q136_ann_index_rotate" -> annRotateOracle,
    // q137: the q105 search chain per filter stratum, the candidate
    // predicate in the ap CTE's WHERE — exactly where the Spark plan
    // applies it (below the rerank cut)
    "q137_ann_filtered_serve" -> annFilteredOracle,
    // s24: the two post-append health rows — trained-index CTEs, each
    // intake batch through q133's exact error chain, n_codes as the
    // associative prefix merge (rows key on the monotone n_codes)
    "s24_stream_ann_ingest" -> annIngestOracle,
    // s23: the two post-append index-health rows are associative
    // integer merges of the delivered prefixes (base∪b1, then all),
    // so the oracle computes each prefix's stats directly with the
    // q127 tokenizer; rows key on the strictly-monotone n_docs
    "s23_stream_bm25_ingest" -> {
      val A = graft.operators.Retrieval.AvgdlQ
      def prefix(where: String): String =
        s"""SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |       CAST(SUM(tf) AS BIGINT) AS l_tokens,
           |       CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
           |FROM tf $where""".stripMargin
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2),
         |p1 AS (${prefix("WHERE doc_id % 10 <> 9")}),
         |p2 AS (${prefix("")})
         |SELECT n_docs, l_tokens, (l_tokens * $A) // n_docs AS avgdl_q, n_terms FROM p1
         |UNION ALL
         |SELECT n_docs, l_tokens, (l_tokens * $A) // n_docs AS avgdl_q, n_terms FROM p2
         |ORDER BY n_docs""".stripMargin
    },
    "q125_ann_frontier" ->
      annFrontierOracle(Similarity.DefaultFrontier),
    "q34_dedup_embedding_lsh" -> embeddingDedupLshOracle,
    "q57_semantic_dedup"  -> semanticDedupOracle,
    // q104: the trained-quantizer chain feeding q57's body unchanged;
    // seed count derived from the corpus (suggestCells), both sides
    "q104_semantic_dedup_trained" ->
      materializeTrainedCtes(s"WITH $vecCtes,\n" +
        trainedCentCtes(2,
          "SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 128.0) AS BIGINT)) FROM e") +
        ",\n" + semanticDedupBodyFromCent("0.4")),
    "q93_semantic_dedup_text" -> semanticDedupTextOracle,
    // q106: q93's embedding CTEs -> the trained-quantizer chain ->
    // q57's body; seeds derived from the embedded doc corpus
    "q106_semantic_dedup_text_trained" -> {
      val vlist = (0 until embedDim).map(d => s"CAST(e$d AS DOUBLE)")
        .mkString("[", ", ", "]")
      materializeTrainedCtes(s"""WITH $textEmbedCtes,
         |e2 AS (SELECT doc_id AS vec_id, $vlist AS v FROM emb),
         |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e2),
         |""".stripMargin +
        trainedCentCtes(2,
          "SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 128.0) AS BIGINT)) FROM e2") +
        ",\n" + semanticDedupBodyFromCent("0.9"))
    },
    "q97_semantic_dedup_image" -> semanticDedupImageOracle,
    // s14 drains to q97's rows by construction (same salted corpus,
    // same centered embeddings, same seed quantizer) — the stream's
    // cross-batch state semantics are additionally pinned in
    // StreamingSpec; here the full verdict frame is hash-checked
    "s14_stream_image_semantic_dedup" -> semanticDedupImageOracle,
    "q99_semantic_dedup_audio" -> semanticDedupAudioOracle,
    "q100_ann_text" -> annTextOracle,
    "q127_bm25_topk" -> bm25Oracle,
    "q128_rrf_fusion" -> rrfFusionOracle,
    // q134: artifact-served hybrid — bm25 pool + text-embedding
    // trained IVF-PQ serve pool + the q128 fusion SQL
    "q134_hybrid_index_served" -> hybridServedOracle,
    // q135: lexical drift alarm — base lexicon vs shifted intake,
    // integer-ppm meters, alarm spliced from the operator defaults
    "q135_bm25_index_drift" -> bm25DriftOracle,
    // s25: per-query fused rows are batching-independent functions of
    // (query text, the two artifacts, store); one-drain delivery of
    // the q134 query set → the drained union IS q134's output
    "s25_stream_hybrid_serve" -> hybridServedOracle,
    // identity with q127 by construction (build→read→serve changes the
    // execution shape, not the arithmetic) — one oracle, hash-checked
    "q129_bm25_index_served" -> bm25Oracle,
    // q131: append ≡ rebuild (associative df/dl/stats merges) ≡ q127 —
    // one oracle, hash-checked
    "q131_bm25_index_appended" -> bm25Oracle,
    // s21: per-query results are batching-independent functions of
    // (query, index); one-drain delivery of the q127 query set → the
    // drained union IS q127's output (the s18/s20 convention)
    "s21_stream_bm25_serve" -> bm25Oracle,
    // q101: the store/probe split replayed — cent = the STORE side's
    // seed quantizer (vec_id < 16 minus the intake residue), both
    // sides assigned by the shared argmax, hits = intake × store
    // cell-mates within tau, smallest condemning mate per intake
    "q101_semantic_dedup_incremental" ->
      materializeTrainedCtes(s"""WITH $vecCtes,
         |e2 AS (SELECT vec_id, v, nrm FROM n
         |       UNION ALL
         |       SELECT vec_id + 300000, v, nrm FROM n
         |       WHERE vec_id % 50 = 0 AND vec_id % 10 <> 9),
         |cent AS (SELECT vec_id AS cell, v, nrm FROM n
         |         WHERE vec_id < 16 AND vec_id % 10 <> 9),
         |sc AS (SELECT x.vec_id, x.v, x.nrm, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
         |       FROM e2 x CROSS JOIN cent c),
         |a0 AS (SELECT vec_id, v, nrm, cell FROM (
         |         SELECT vec_id, v, nrm, cell,
         |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
         |         FROM sc) t WHERE rn = 1),
         |hits AS (SELECT i.vec_id, i.cell, s.vec_id AS dup_of,
         |           (${sqlDot("i.v", "s.v")}) / (i.nrm * s.nrm) AS cos_raw
         |         FROM a0 i JOIN a0 s ON i.cell = s.cell
         |         WHERE (i.vec_id % 10 = 9 OR i.vec_id >= 300000)
         |           AND s.vec_id % 10 <> 9 AND s.vec_id < 300000),
         |d AS (SELECT vec_id, cell, MIN(dup_of) AS dup_of
         |      FROM hits WHERE cos_raw >= 0.4 GROUP BY 1, 2)
         |SELECT d.vec_id, d.cell, d.dup_of, ROUND(h.cos_raw, 4) AS cos_sim
         |FROM d JOIN hits h ON h.vec_id = d.vec_id AND h.dup_of = d.dup_of
         |ORDER BY d.vec_id""".stripMargin),
    // s15: the two-batch admit loop replayed — batch1 probes store0,
    // its survivors join the store, batch2 probes store0 ∪ adm1; the
    // drained union is out1 ∪ out2 (batches are id-disjoint)
    "s15_stream_semantic_dedup_admit" ->
      materializeTrainedCtes(s"""WITH $vecCtes,
         |e2 AS (SELECT vec_id, v, nrm FROM n
         |       UNION ALL
         |       SELECT vec_id + 300000, v, nrm FROM n
         |       WHERE vec_id % 50 = 0 AND vec_id % 10 NOT IN (8, 9)
         |       UNION ALL
         |       SELECT vec_id + 600000, v, nrm FROM n
         |       WHERE vec_id % 10 = 8),
         |cent AS (SELECT vec_id AS cell, v, nrm FROM n
         |         WHERE vec_id < 16 AND vec_id % 10 NOT IN (8, 9)),
         |sc AS (SELECT x.vec_id, x.v, x.nrm, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
         |       FROM e2 x CROSS JOIN cent c),
         |a0 AS (SELECT vec_id, v, nrm, cell FROM (
         |         SELECT vec_id, v, nrm, cell,
         |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
         |         FROM sc) t WHERE rn = 1),
         |store0 AS (SELECT * FROM a0
         |           WHERE vec_id % 10 NOT IN (8, 9) AND vec_id < 300000),
         |b1 AS (SELECT * FROM a0 WHERE (vec_id % 10 = 8 AND vec_id < 300000)
         |          OR (vec_id >= 300000 AND vec_id < 600000)),
         |b2 AS (SELECT * FROM a0 WHERE (vec_id % 10 = 9 AND vec_id < 300000)
         |          OR vec_id >= 600000),
         |h1 AS (SELECT i.vec_id, i.cell, s.vec_id AS dup_of,
         |         (${sqlDot("i.v", "s.v")}) / (i.nrm * s.nrm) AS cos_raw
         |       FROM b1 i JOIN store0 s ON i.cell = s.cell),
         |d1 AS (SELECT vec_id, cell, MIN(dup_of) AS dup_of
         |       FROM h1 WHERE cos_raw >= 0.4 GROUP BY 1, 2),
         |adm1 AS (SELECT * FROM b1
         |         WHERE vec_id NOT IN (SELECT vec_id FROM d1)),
         |store1 AS (SELECT * FROM store0 UNION ALL SELECT * FROM adm1),
         |h2 AS (SELECT i.vec_id, i.cell, s.vec_id AS dup_of,
         |         (${sqlDot("i.v", "s.v")}) / (i.nrm * s.nrm) AS cos_raw
         |       FROM b2 i JOIN store1 s ON i.cell = s.cell),
         |d2 AS (SELECT vec_id, cell, MIN(dup_of) AS dup_of
         |       FROM h2 WHERE cos_raw >= 0.4 GROUP BY 1, 2)
         |SELECT d1.vec_id, d1.cell, d1.dup_of, ROUND(h1.cos_raw, 4) AS cos_sim
         |FROM d1 JOIN h1 ON h1.vec_id = d1.vec_id AND h1.dup_of = d1.dup_of
         |UNION ALL
         |SELECT d2.vec_id, d2.cell, d2.dup_of, ROUND(h2.cos_raw, 4) AS cos_sim
         |FROM d2 JOIN h2 ON h2.vec_id = d2.vec_id AND h2.dup_of = d2.dup_of
         |ORDER BY vec_id""".stripMargin),
    "q63_decontaminate_semantic" -> semanticDecontamOracle,
    // q79 is EXACT past-broadcast q63 — same oracle, row-identical
    "q79_decontaminate_semantic_cells" -> semanticDecontamOracle,
    "q64_sample_percell"  -> samplePerCellOracle,
    // q56: the report table's deterministic fields, reconstructed from
    // the source tables the reported writes consumed (records = full
    // table count; output_files = the fixed repartition target; a
    // successful write reports SUCCESS at the current report version).
    "q56_run_report" ->
      """SELECT job_name, records_processed, output_files, status, report_version
        |FROM (
        |  SELECT 'documents_ingest' AS job_name,
        |         CAST(count(*) AS BIGINT) AS records_processed,
        |         CAST(4 AS BIGINT) AS output_files,
        |         'SUCCESS' AS status, '1.0' AS report_version
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events_ingest', CAST(count(*) AS BIGINT),
        |         CAST(4 AS BIGINT), 'SUCCESS', '1.0'
        |  FROM events) t
        |ORDER BY job_name""".stripMargin,
  )

  // ---------------------------------------------------------------------
  // Generated DuckDB oracles for the dedup/similarity operators.
  //
  // Determinism strategy (SURVEY.md §6): every hash is md5 over the same
  // UTF-8 bytes on both engines; Jaccard/Hamming are integer-derived
  // (bit-identical); dot products/norms are generated as EXPLICIT
  // per-dimension chains (v[1]*w[1] + v[2]*w[2] + …) in the SAME
  // left-to-right order as the Spark expression chain, so raw doubles are
  // bit-identical and threshold filters can never diverge.
  // ---------------------------------------------------------------------

  /** Shared shingle CTE: distinct word 3-grams, 1-based positions —
    * mirrors Dedup.shingleSet(3). (`greatest(…, 2)` ≡ Spark's
    * `greatest(size-2, 1)` upper bound for every token count.) */
  /** q60: the q21 pair pass, fanned into both directed containments. */
  private def containmentOracle: String =
    s"""WITH ${shingleCtes()},
       |x AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |      FROM x a JOIN x b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |z AS (SELECT doc_id, len(sh) AS n_sh FROM s),
       |c AS (SELECT p.doc_a, p.doc_b, p.inter, za.n_sh AS n_a, zb.n_sh AS n_b
       |      FROM p JOIN z za ON p.doc_a = za.doc_id JOIN z zb ON p.doc_b = zb.doc_id),
       |d AS (SELECT doc_a AS src_doc, doc_b AS dst_doc,
       |             CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment FROM c
       |      UNION ALL
       |      SELECT doc_b, doc_a, CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE) FROM c)
       |SELECT src_doc, dst_doc, containment FROM d
       |WHERE containment >= 0.8 ORDER BY src_doc, dst_doc""".stripMargin

  /** q49's oracle body (no ORDER BY) — shared verbatim by q73's
    * certification wrapper so the deterministic columns can never
    * drift between the exact and sketch-certified profiles. */
  private val profileOracleBody: String =
      """SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
        |       COUNT(*) - COUNT(event_id) AS n_null,
        |       COUNT(DISTINCT event_id) AS n_distinct,
        |       CAST(MIN(event_id) AS VARCHAR) AS min_value,
        |       CAST(MAX(event_id) AS VARCHAR) AS max_value
        |FROM events
        |UNION ALL
        |SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
        |       COUNT(DISTINCT CAST(ts AS TIMESTAMP)),
        |       strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f'),
        |       strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f')
        |FROM events
        |UNION ALL
        |SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
        |       COUNT(DISTINCT user_id),
        |       CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
        |FROM events
        |UNION ALL
        |SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
        |       COUNT(DISTINCT event_type), MIN(event_type), MAX(event_type)
        |FROM events
        |UNION ALL
        |SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
        |       COUNT(DISTINCT value),
        |       CAST(CAST(MIN(value) AS DECIMAL(18,2)) AS VARCHAR),
        |       CAST(CAST(MAX(value) AS DECIMAL(18,2)) AS VARCHAR)
        |FROM events
        |UNION ALL
        |SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
        |       COUNT(DISTINCT props), MIN(props), MAX(props)
        |FROM events""".stripMargin

  private def shingleCtes(from: String = "documents",
                          prefix: String = ""): String =
    s"""${prefix}t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $from),
      |${prefix}s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 1, 2)),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM ${prefix}t)""".stripMargin

  /** q76 / s11 shared truth: the full-outer diff of the two synthetic
    * snapshots. Batch q76 and streaming s11 must be row-identical. */
  private def snapshotDiffOracle: String =
    """WITH prev AS (SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev0' ELSE text END AS text
      |       FROM documents WHERE doc_id % 7 <> 6),
      |curr AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 5),
      |pf AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS prev_fp FROM prev),
      |cf AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS curr_fp FROM curr)
      |SELECT COALESCE(pf.doc_id, cf.doc_id) AS doc_id, prev_fp, curr_fp,
      |       CASE WHEN prev_fp IS NULL THEN 'added'
      |            WHEN curr_fp IS NULL THEN 'removed'
      |            WHEN prev_fp = curr_fp THEN 'unchanged'
      |            ELSE 'changed' END AS verdict
      |FROM pf FULL OUTER JOIN cf ON pf.doc_id = cf.doc_id
      |ORDER BY 1""".stripMargin

  /** q114: q38's gate (thr = floor(0.05·65536) = 3276) + q21's
    * shingle/pair machinery restricted to eval×train pairs; leaked
    * verdict with the smallest condemning trainer. */
  private def holdoutOracle: String =
    s"""WITH ${shingleCtes()},
       |g AS (SELECT doc_id,
       |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) < ${math.floor(Dedup.DefaultEvalFrac * 65536).toInt} AS is_eval
       |      FROM documents),
       |x AS (SELECT s.doc_id, g.is_eval, unnest(sh) AS shingle FROM s JOIN g USING (doc_id)),
       |z AS (SELECT doc_id, len(sh) AS n_sh FROM s),
       |p AS (SELECT e.doc_id AS e, t2.doc_id AS t, COUNT(*) AS inter
       |      FROM x e JOIN x t2 ON e.shingle = t2.shingle AND e.is_eval AND NOT t2.is_eval
       |      GROUP BY 1, 2),
       |j AS (SELECT p.e, p.t FROM p JOIN z ze ON p.e = ze.doc_id JOIN z zt ON p.t = zt.doc_id
       |      WHERE CAST(inter AS DOUBLE) / (CAST(ze.n_sh + zt.n_sh AS DOUBLE) - CAST(inter AS DOUBLE)) >= ${Dedup.DefaultHoldoutTau}),
       |l AS (SELECT e AS doc_id, MIN(t) AS leak_dup_of FROM j GROUP BY 1)
       |SELECT d.doc_id, d.source, d.lang,
       |       l.leak_dup_of IS NOT NULL AS leaked, l.leak_dup_of
       |FROM documents d JOIN g USING (doc_id) LEFT JOIN l USING (doc_id)
       |WHERE g.is_eval ORDER BY d.doc_id""".stripMargin

  private def ngramOracle: String =
    s"""WITH ${shingleCtes()},
       |x AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |      FROM x a JOIN x b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |z AS (SELECT doc_id, len(sh) AS n_sh FROM s)
       |SELECT * FROM (
       |  SELECT p.doc_a, p.doc_b,
       |         CAST(inter AS DOUBLE) / (CAST(za.n_sh + zb.n_sh AS DOUBLE) - CAST(inter AS DOUBLE)) AS jaccard
       |  FROM p JOIN z za ON p.doc_a = za.doc_id JOIN z zb ON p.doc_b = zb.doc_id) j
       |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** The q22 pair set as a self-contained SELECT (no trailing ORDER BY)
    * so the clustering oracle (q36) can embed it as a CTE body. */
  private def minhashPairsQuery(from: String = "documents"): String = {
    val k = 16; val bands = 4; val r = k / bands
    // Kirsch-Mitzenmacher: g_i = (lower64 mod p + i·(upper64 mod p))
    // mod p, p = 2^31-1 — mirrors Exprs.MinHashSig exactly; every
    // intermediate < 2^36 so DuckDB's checked UBIGINT math never traps
    val p = 2147483647L
    val mhs = (0 until k).map(i =>
      s"list_min(list_transform(sh, x -> (md5_number_lower(x) % $p + $i * (md5_number_upper(x) % $p)) % $p)) AS mh$i")
      .mkString(", ")
    val bks = (0 until bands).map { b =>
      val parts = (0 until r).map(j => s"CAST(mh${b * r + j} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"md5('$b|' || $parts)"
    }.mkString(", ")
    s"""WITH ${shingleCtes(from)},
       |m AS (SELECT doc_id, $mhs FROM s),
       |b AS (SELECT doc_id, unnest([$bks]) AS bk FROM m),
       |c AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |      FROM b a JOIN b b2 ON a.bk = b2.bk AND a.doc_id < b2.doc_id),
       |j AS (SELECT c.doc_a, c.doc_b, len(list_intersect(sa.sh, sb.sh)) AS inter,
       |             len(sa.sh) AS la, len(sb.sh) AS lb
       |      FROM c JOIN s sa ON c.doc_a = sa.doc_id JOIN s sb ON c.doc_b = sb.doc_id)
       |SELECT * FROM (
       |  SELECT doc_a, doc_b,
       |         CAST(inter AS DOUBLE) / (CAST(la + lb AS DOUBLE) - CAST(inter AS DOUBLE)) AS jaccard
       |  FROM j) q
       |WHERE jaccard >= 0.5""".stripMargin
  }

  private def minhashOracle: String =
    minhashPairsQuery() + "\nORDER BY doc_a, doc_b"

  /** Shared connected-components labeling over the q22 pair set via a
    * recursive reachability CTE (component label = MIN reachable
    * doc_id; the UNION dedupe bounds the recursion). Component sizes
    * are tiny, so the O(Σ component²) reach set is no hazard for the
    * oracle. Used by q36 (labels) and q55 (keeper selection). */
  private def clusterLabCtesBody(from: String = "documents"): String =
    s"""p AS (${minhashPairsQuery(from)}),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
       |          UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(doc, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.d, r.r FROM reach r JOIN edges e ON e.s = r.doc),
       |lab AS (SELECT doc AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc)""".stripMargin

  private def clusterLabCtes: String =
    "WITH RECURSIVE " + clusterLabCtesBody()

  private def clustersOracle: String =
    s"""$clusterLabCtes
       |SELECT l.doc_id, l.cluster_id, c.cluster_size
       |FROM lab l
       |JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1) c
       |  USING (cluster_id)
       |ORDER BY l.doc_id""".stripMargin

  /** q91: q36's cluster labels regrouped twice — sizes per cluster,
    * then the size histogram. */
  private def clusterHistogramOracle: String =
    s"""$clusterLabCtes,
       |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM lab GROUP BY 1)
       |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
       |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** q55: keeper per cluster by (quality DESC, doc_id). The quality
    * CTE is q28's formula verbatim (same casts, same left-to-right
    * IEEE op order) — keep the two in sync. */
  /** q28's quality formula as reusable CTEs (same casts, same
    * left-to-right IEEE op order as TextOps.qualityMetrics — keep in
    * sync). Emits `q(doc_id, quality)`. */
  private def qualityCtes(from: String = "documents"): String =
    s"""qt AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM $from),
       |qm AS (SELECT doc_id,
       |         CAST(len(toks) AS DOUBLE) AS n_tok,
       |         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
       |         CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
       |         LEAST(n_chars / 500.0, 1.0) AS len_sat
       |       FROM qt),
       |q AS (SELECT doc_id,
       |        FLOOR((n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
       |      FROM qm)""".stripMargin

  /** q40/q72/s20's shared oracle: chunk = (tokens-before-doc) div
    * budget over a per-lang running sum — integer token counts and
    * INTEGER division on both engines (Spark `div` ≡ DuckDB `//`; the
    * r16 sweep retired the last floor(double /) from rank/partition
    * arithmetic). q72 (the sharded plan) and s20 (the streaming
    * meter) are output-identical to q40 by construction, so all three
    * share it — the equality is driver-hash-checked every round. */
  private def packOracle: String =
    """WITH t AS (SELECT lang, doc_id,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |c AS (SELECT lang, doc_id, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM t)
      |SELECT lang, CAST((cum - n_tokens) // 2048 AS INTEGER) AS chunk_id,
      |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
      |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin

  /** q67/q123's heuristic-gate CTEs — the Gopher/C4 rule bundle with
    * its first-fail verdict, parameterized on the input table, CTE
    * prefix, and the two corpus-tuned thresholds (q123 splices
    * Pipeline.RecipeMinWords/RecipeMinStopwords; q67 keeps the stock
    * web-scale settings). Emits `${prefix}f(doc_id, n_words,
    * mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
    * first_fail)`. */
  private def heuristicCtes(from: String = "documents", prefix: String = "",
                            minWords: Int = 50,
                            minStopwords: Int = 2): String = {
    val P = prefix
    s"""${P}t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM $from),
       |${P}m AS (SELECT doc_id, text,
       |        len(toks) AS n_words,
       |        CAST(len(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_word_len,
       |        CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
       |          / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
       |        CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
       |          / CAST(len(toks) AS DOUBLE) AS alpha_frac,
       |        CAST(list_contains(toks, 'the') AS INTEGER) + CAST(list_contains(toks, 'be') AS INTEGER)
       |          + CAST(list_contains(toks, 'to') AS INTEGER) + CAST(list_contains(toks, 'of') AS INTEGER)
       |          + CAST(list_contains(toks, 'and') AS INTEGER) + CAST(list_contains(toks, 'that') AS INTEGER)
       |          + CAST(list_contains(toks, 'have') AS INTEGER) + CAST(list_contains(toks, 'with') AS INTEGER)
       |          AS n_stopwords
       |      FROM ${P}t),
       |${P}f AS (SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
       |        CASE WHEN n_words < $minWords OR n_words > 100000 THEN 'word_count'
       |             WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'mean_word_len'
       |             WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
       |             WHEN alpha_frac < 0.8 THEN 'alpha_frac'
       |             WHEN n_stopwords < $minStopwords THEN 'stopwords'
       |             WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
       |             WHEN contains(text, '{') THEN 'braces'
       |             ELSE NULL END AS first_fail
       |      FROM ${P}m)""".stripMargin
  }

  /** q118/q126's shared oracle: the salted quota-rank gate replayed —
    * rank by md5 within the domain, keep rank <= cap, pre-cap total
    * carried per row. q126 (the salted pre-pruned execution plan) is
    * output-identical by construction and shares it verbatim. */
  private def domainQuotaOracle: String =
    s"""WITH h AS (SELECT doc_id, source AS domain,
       |             CAST(('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 12))
       |               AS BIGINT) AS hkey
       |           FROM documents),
       |r AS (SELECT doc_id, domain,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hkey, doc_id) AS BIGINT) AS rk,
       |        CAST(COUNT(*) OVER (PARTITION BY domain) AS BIGINT) AS n_domain
       |      FROM h)
       |SELECT doc_id, domain, rk, n_domain FROM r
       |WHERE rk <= ${graft.operators.Corpus.DefaultDomainQuota} ORDER BY doc_id""".stripMargin

  /** q80/q122's shared fixed-window segmentation as oracle CTEs —
    * WITH t/c/x/s over `from`, width spliced from
    * `Dedup.DefaultSegmentWidth` (the q112 DefaultEpochs rule; q80 and
    * q122 consume it with their keep rules, q123's correction stage
    * with the fused rule). Emits `s(doc_id, seg_idx, seg)`. */
  private def segmentCtes(from: String = "documents",
                          prefix: String = ""): String = {
    val wd = graft.operators.Dedup.DefaultSegmentWidth
    s"""${prefix}t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $from),
       |${prefix}c AS (SELECT doc_id, tk,
       |        GREATEST(1, CAST(CEIL(len(tk) / $wd.0) AS INTEGER)) AS nseg
       |      FROM ${prefix}t),
       |${prefix}x AS (SELECT doc_id, tk, unnest(range(0, nseg)) AS seg_idx FROM ${prefix}c),
       |${prefix}s AS (SELECT doc_id, CAST(seg_idx AS INTEGER) AS seg_idx,
       |        array_to_string(tk[seg_idx*$wd+1 : seg_idx*$wd+$wd], ' ') AS seg
       |      FROM ${prefix}x)""".stripMargin
  }

  /** q75: every stage is the corresponding declared oracle's SQL over
    * the running survivor set — exact keeper (q20/q30), minhash-LSH
    * clusters (q22/q36 CTEs parameterized on surv1), q55's keeper
    * window, q61's per-lang prune window over surv2, q35's fingerprint
    * semi-join. One WITH RECURSIVE chain; verdicts unioned with
    * first-drop-wins by construction. */
  private def pipelineOracle: String = materializeTrainedCtes(
    s"""WITH RECURSIVE
       |fpp AS (SELECT doc_id,
       |          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |        FROM documents),
       |k1 AS (SELECT fingerprint, MIN(doc_id) AS kept_by FROM fpp GROUP BY 1),
       |l1 AS (SELECT f.doc_id, f.fingerprint, k.kept_by FROM fpp f JOIN k1 k USING (fingerprint)),
       |surv1 AS (SELECT d.* FROM documents d JOIN l1 ON d.doc_id = l1.doc_id
       |          WHERE l1.doc_id = l1.kept_by),
       |${clusterLabCtesBody("surv1")},
       |${qualityCtes("documents")},
       |keep2 AS (SELECT cluster_id, doc_id AS kept_by FROM (
       |    SELECT l.cluster_id, l.doc_id,
       |           ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |                              ORDER BY q.quality DESC, l.doc_id) AS krn
       |    FROM lab l JOIN q ON l.doc_id = q.doc_id) kk WHERE krn = 1),
       |dup_near AS (SELECT l.doc_id, k.kept_by FROM lab l JOIN keep2 k USING (cluster_id)
       |             WHERE l.doc_id <> k.kept_by),
       |surv2 AS (SELECT s1.doc_id, s1.lang FROM surv1 s1
       |          WHERE s1.doc_id NOT IN (SELECT doc_id FROM dup_near)),
       |w AS (SELECT s2.doc_id, q.quality,
       |        ROW_NUMBER() OVER (PARTITION BY s2.lang ORDER BY q.quality, s2.doc_id) AS rn,
       |        COUNT(*) OVER (PARTITION BY s2.lang) AS nn
       |      FROM surv2 s2 JOIN q ON s2.doc_id = q.doc_id),
       |low AS (SELECT doc_id FROM w WHERE rn <= FLOOR(0.2 * nn)),
       |surv3 AS (SELECT doc_id FROM surv2
       |          WHERE doc_id NOT IN (SELECT doc_id FROM low)),
       |ev AS (SELECT fingerprint FROM fpp WHERE doc_id % 7 = 0),
       |cont AS (SELECT s3.doc_id FROM surv3 s3 JOIN fpp f ON s3.doc_id = f.doc_id
       |         WHERE f.fingerprint IN (SELECT fingerprint FROM ev)),
       |res AS (
       |  SELECT doc_id, 'dup_exact' AS verdict, kept_by FROM l1 WHERE doc_id <> kept_by
       |  UNION ALL SELECT doc_id, 'dup_near', kept_by FROM dup_near
       |  UNION ALL SELECT doc_id, 'low_quality', CAST(NULL AS BIGINT) FROM low
       |  UNION ALL SELECT doc_id, 'contaminated', CAST(NULL AS BIGINT) FROM cont
       |  UNION ALL SELECT doc_id, 'kept', CAST(NULL AS BIGINT) FROM surv3
       |            WHERE doc_id NOT IN (SELECT doc_id FROM cont))
       |SELECT doc_id, verdict, kept_by FROM res ORDER BY doc_id""".stripMargin)

  /** q123: the full curation recipe replayed stage by stage in ONE
    * statement, every stage the corresponding declared oracle's CTEs
    * over the running survivor set: exact keeper on raw text →
    * corrected text (the FUSED q80+q122 keep rule over the shared
    * segmentation — `keep = empty ∨ (df ≤ t ∧ rn = 1)`) → q22/q36
    * clusters + q55 keeper over the CORRECTED text → q118's quota
    * rank → q67's first-fail gate (the spliced corpus-tuned
    * thresholds) → q120's tertile tail over the survivors → q35 exact
    * + q47 n-gram contamination vs the RAW eval slice, exact winning
    * the reason. All constants spliced from the shared Scala defaults
    * (the q112 rule). */
  private def curationOracle: String = {
    val stripDf = graft.operators.Dedup.DefaultStripDf
    val cap = graft.operators.Corpus.DefaultDomainQuota
    val mw = graft.operators.Pipeline.RecipeMinWords
    val ms = graft.operators.Pipeline.RecipeMinStopwords
    s"""WITH RECURSIVE
       |docs AS MATERIALIZED (
       |  SELECT * FROM documents
       |  UNION ALL
       |  SELECT * REPLACE (doc_id + 500000 AS doc_id) FROM documents
       |  WHERE doc_id % 11 = 0),
       |fpp AS MATERIALIZED (SELECT doc_id,
       |          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |        FROM docs),
       |k1 AS (SELECT fingerprint, MIN(doc_id) AS kept_by FROM fpp GROUP BY 1),
       |l1 AS MATERIALIZED (SELECT f.doc_id, f.fingerprint, k.kept_by
       |        FROM fpp f JOIN k1 k USING (fingerprint)),
       |surv1 AS MATERIALIZED (SELECT d.* FROM docs d JOIN l1 ON d.doc_id = l1.doc_id
       |          WHERE l1.doc_id = l1.kept_by),
       |${segmentCtes("surv1", "g")},
       |gd AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS df FROM gs WHERE seg <> '' GROUP BY 1),
       |gk AS (SELECT s.doc_id, s.seg_idx, s.seg, d.df,
       |         ROW_NUMBER() OVER (PARTITION BY s.seg ORDER BY s.doc_id, s.seg_idx) AS rn
       |       FROM gs s LEFT JOIN gd d USING (seg)),
       |corr AS MATERIALIZED (SELECT doc_id,
       |           COALESCE(string_agg(
       |             CASE WHEN seg = '' OR (COALESCE(df, 0) <= $stripDf AND rn = 1)
       |                  THEN seg END, ' ' ORDER BY seg_idx), '') AS text
       |         FROM gk GROUP BY doc_id),
       |cd AS MATERIALIZED (SELECT c.doc_id, d.source, d.lang, c.text,
       |              CAST(length(c.text) AS INTEGER) AS n_chars
       |       FROM corr c JOIN docs d USING (doc_id)),
       |${clusterLabCtesBody("cd")},
       |${qualityCtes("cd")},
       |keep2 AS MATERIALIZED (SELECT cluster_id, doc_id AS kept_by FROM (
       |    SELECT l.cluster_id, l.doc_id,
       |           ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |                              ORDER BY q.quality DESC, l.doc_id) AS krn
       |    FROM lab l JOIN q ON l.doc_id = q.doc_id) kk WHERE krn = 1),
       |dup_near AS MATERIALIZED (SELECT l.doc_id, k.kept_by FROM lab l JOIN keep2 k USING (cluster_id)
       |             WHERE l.doc_id <> k.kept_by),
       |surv2 AS MATERIALIZED (SELECT cd.* FROM cd
       |          WHERE doc_id NOT IN (SELECT doc_id FROM dup_near)),
       |qh AS (SELECT doc_id, source AS domain,
       |         CAST(('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 12))
       |           AS BIGINT) AS hkey
       |       FROM surv2),
       |qr AS (SELECT doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hkey, doc_id) AS BIGINT) AS rk
       |       FROM qh),
       |over_quota AS MATERIALIZED (SELECT doc_id FROM qr WHERE rk > $cap),
       |surv3 AS MATERIALIZED (SELECT * FROM surv2
       |          WHERE doc_id NOT IN (SELECT doc_id FROM over_quota)),
       |${heuristicCtes("surv3", "h", mw, ms)},
       |heur_fail AS MATERIALIZED (SELECT doc_id, first_fail FROM hf WHERE first_fail IS NOT NULL),
       |surv4 AS MATERIALIZED (SELECT * FROM surv3
       |          WHERE doc_id NOT IN (SELECT doc_id FROM heur_fail)),
       |pplsrc AS MATERIALIZED (
       |  SELECT doc_id, source, lang, text FROM cd WHERE source = 'src0'
       |  UNION ALL
       |  SELECT doc_id, source, lang, text FROM surv4 WHERE source <> 'src0'),
       |${perplexityCtes("pplsrc", "pp")},
       |ppnt AS (SELECT doc_id, n_bigrams,
       |           NTILE(3) OVER (PARTITION BY lang, n_bigrams = 0
       |                          ORDER BY ppl_bits ASC NULLS LAST, doc_id) AS nt
       |         FROM ppbase),
       |ppl_tail AS MATERIALIZED (SELECT doc_id FROM ppnt WHERE n_bigrams > 0 AND nt = 3),
       |surv5 AS MATERIALIZED (SELECT * FROM surv4
       |          WHERE doc_id NOT IN (SELECT doc_id FROM ppl_tail)),
       |sfp AS MATERIALIZED (SELECT doc_id,
       |          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |        FROM surv5),
       |ev AS MATERIALIZED (SELECT fingerprint FROM fpp WHERE doc_id % 7 = 0),
       |cont_exact AS MATERIALIZED (SELECT doc_id FROM sfp
       |               WHERE fingerprint IN (SELECT fingerprint FROM ev)),
       |evdocs AS (SELECT doc_id, text FROM docs WHERE doc_id % 7 = 0),
       |${shingleCtes("surv5", "n1")},
       |${shingleCtes("evdocs", "n2")},
       |n1x AS (SELECT doc_id, unnest(sh) AS shingle FROM n1s),
       |n2x AS (SELECT doc_id AS eval_doc, unnest(sh) AS shingle FROM n2s),
       |cont_ngram AS MATERIALIZED (SELECT x.doc_id
       |               FROM n1x x JOIN n2x r ON x.shingle = r.shingle
       |                 AND x.doc_id <> r.eval_doc
       |               GROUP BY x.doc_id
       |               HAVING COUNT(DISTINCT x.shingle) >= ${graft.operators.Pipeline.RecipeMinShingles}),
       |res AS (
       |  SELECT doc_id, 'dup_exact' AS verdict, kept_by,
       |         CAST(NULL AS VARCHAR) AS reason
       |  FROM l1 WHERE doc_id <> kept_by
       |  UNION ALL SELECT doc_id, 'dup_near', kept_by, NULL FROM dup_near
       |  UNION ALL SELECT doc_id, 'over_quota', CAST(NULL AS BIGINT), NULL FROM over_quota
       |  UNION ALL SELECT doc_id, 'heuristic_fail', NULL, first_fail FROM heur_fail
       |  UNION ALL SELECT doc_id, 'ppl_tail', NULL, 'tail' FROM ppl_tail
       |  UNION ALL SELECT doc_id, 'contaminated', NULL,
       |       CASE WHEN doc_id IN (SELECT doc_id FROM cont_exact)
       |            THEN 'exact' ELSE 'ngram' END
       |    FROM (SELECT doc_id FROM cont_exact
       |          UNION SELECT doc_id FROM cont_ngram)
       |  UNION ALL SELECT doc_id, 'kept', NULL, NULL FROM surv5
       |    WHERE doc_id NOT IN (SELECT doc_id FROM cont_exact)
       |      AND doc_id NOT IN (SELECT doc_id FROM cont_ngram))
       |SELECT doc_id, verdict, kept_by, reason FROM res ORDER BY doc_id""".stripMargin
  }

  private def keeperOracle: String =
    s"""$clusterLabCtes,
       |qt AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
       |qm AS (SELECT doc_id,
       |         CAST(len(toks) AS DOUBLE) AS n_tok,
       |         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
       |         CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
       |         LEAST(n_chars / 500.0, 1.0) AS len_sat
       |       FROM qt),
       |q AS (SELECT doc_id,
       |        FLOOR((n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
       |      FROM qm)
       |SELECT cluster_id, keeper_doc_id, cluster_size,
       |       cluster_size - 1 AS n_removed FROM (
       |  SELECT l.cluster_id, l.doc_id AS keeper_doc_id,
       |         COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       |         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |           ORDER BY q.quality DESC, l.doc_id) AS rn
       |  FROM lab l JOIN q USING (doc_id)) t
       |WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** q45: an incremental probe against the persisted band index finds
    * exactly the full-pipeline pairs with one endpoint in the incoming
    * batch (doc_id ≡ 9 mod 10) and one in the corpus — candidate
    * generation is "shares ≥1 band bucket" in both formulations, and
    * the Jaccard verification is identical. Both-new and both-old
    * pairs are excluded (XOR). */
  private def incrementalOracle: String =
    s"""WITH p AS (${minhashPairsQuery()})
       |SELECT CASE WHEN doc_a % 10 = 9 THEN doc_a ELSE doc_b END AS new_doc,
       |       CASE WHEN doc_a % 10 = 9 THEN doc_b ELSE doc_a END AS dup_of,
       |       jaccard
       |FROM p
       |WHERE (doc_a % 10 = 9) <> (doc_b % 10 = 9)
       |ORDER BY new_doc, dup_of""".stripMargin

  /** s09: the admit loop replayed batch-by-batch. h1 = batch1 (ids ≡ 8)
    * vs corpus only; its flagged docs are NOT admitted, so h2 = batch2
    * (ids ≡ 9) vs corpus ∪ batch1-survivors — a batch-1 partner that
    * appears in h1's flagged set is excluded from batch 2's reachable
    * index. Built on the same full pairwise minhash CTE as q45. */
  private def admitOracle: String =
    s"""WITH p AS (${minhashPairsQuery()}),
       |h1 AS (SELECT CASE WHEN doc_a % 10 = 8 THEN doc_a ELSE doc_b END AS new_doc,
       |              CASE WHEN doc_a % 10 = 8 THEN doc_b ELSE doc_a END AS dup_of,
       |              jaccard
       |       FROM p
       |       WHERE ((doc_a % 10 = 8) <> (doc_b % 10 = 8))
       |         AND doc_a % 10 <> 9 AND doc_b % 10 <> 9),
       |h2 AS (SELECT CASE WHEN doc_a % 10 = 9 THEN doc_a ELSE doc_b END AS new_doc,
       |              CASE WHEN doc_a % 10 = 9 THEN doc_b ELSE doc_a END AS dup_of,
       |              jaccard
       |       FROM p
       |       WHERE ((doc_a % 10 = 9) <> (doc_b % 10 = 9))
       |         AND NOT ((CASE WHEN doc_a % 10 = 9 THEN doc_b ELSE doc_a END) % 10 = 8
       |                  AND (CASE WHEN doc_a % 10 = 9 THEN doc_b ELSE doc_a END)
       |                      IN (SELECT new_doc FROM h1)))
       |SELECT new_doc, dup_of, jaccard FROM h1
       |UNION ALL
       |SELECT new_doc, dup_of, jaccard FROM h2
       |ORDER BY new_doc, dup_of""".stripMargin

  /** q47: shingle-level decontamination. `sh` is already distinct per
    * doc (shingleCtes ≡ Dedup.shingleSet), so the reference index is
    * (eval_doc, shingle)-unique on both engines; the Spark side counts
    * distinct xxhash64 digests, the oracle distinct shingle strings —
    * identical sets absent a 2⁻⁶⁴ collision. */
  /** q116: q27's marker scores per 16-token segment, spliced from the
    * SAME `TextOps.markers` value; seg lang = precedence-chain argmax
    * with an explicit und on zero evidence; dominant = (count desc,
    * lang asc) first row; switches via LAG over segment order. */
  // q116/q117 shared SQL snippets, generated from TextOps.markers (the
  // single-source-of-truth convention): per-segment marker scores, the
  // greatest() argument list, and the precedence argmax chain.
  private def markerScoreSql: String =
    graft.operators.TextOps.markers.map { case (l, ms) =>
      val in = ms.map(m => s"'$m'").mkString(", ")
      s"SUM(CASE WHEN tok IN ($in) THEN 1 ELSE 0 END) AS s_$l"
    }.mkString(", ")
  private def markerGreatest: String = graft.operators.TextOps.markers
    .map { case (l, _) => s"s_$l" }.mkString(", ")
  private def markerChain: String = graft.operators.TextOps.markers
    .map { case (l, _) => s"WHEN s_$l = g THEN '$l'" }.mkString(" ")

  private def langMixOracle: String = {
    val scoreSql = markerScoreSql
    val gx = markerGreatest
    val chain = markerChain
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |x AS (SELECT doc_id, unnest(tk) AS tok,
       |             CAST((generate_subscripts(tk, 1) - 1) // ${TextOps.DefaultSegTokens} AS INTEGER) AS seg
       |      FROM t),
       |sc AS (SELECT doc_id, seg,
       |             $scoreSql
       |       FROM x GROUP BY 1, 2),
       |sl AS (SELECT doc_id, seg,
       |         CASE WHEN greatest($gx) = 0 THEN 'und' ELSE
       |           CASE $chain END END AS sl
       |       FROM (SELECT *, greatest($gx) AS g FROM sc)),
       |sw AS (SELECT doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_segments,
       |         CAST(SUM(CASE WHEN sl = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und,
       |         CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL AND sl <> prev
       |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_switches
       |       FROM (SELECT doc_id, sl,
       |               LAG(sl) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
       |             FROM sl)
       |       GROUP BY 1),
       |d0 AS (SELECT doc_id, sl, COUNT(*) AS c FROM sl WHERE sl <> 'und' GROUP BY 1, 2),
       |dm AS (SELECT doc_id, sl AS dominant_lang, n_langs FROM (
       |         SELECT doc_id, sl, c,
       |                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, sl) AS rn,
       |                COUNT(*) OVER (PARTITION BY doc_id) AS n_langs
       |         FROM d0) WHERE rn = 1)
       |SELECT sw.doc_id, sw.n_segments, sw.n_und,
       |       COALESCE(dm.dominant_lang, 'und') AS dominant_lang,
       |       sw.n_switches,
       |       COALESCE(dm.n_langs, 0) > 1 AS is_mixed
       |FROM sw LEFT JOIN dm USING (doc_id) ORDER BY sw.doc_id""".stripMargin
  }

  /** q117: the datasheet's seven sections in ONE statement — a shared
    * CTE prefix (shingleCtes' t/s reused for tokens and the q47
    * contamination hit set, q28's quality formula verbatim, the q116
    * marker snippets) and a UNION ALL arm per (section, item). The
    * quality section is exact VALUE-AT-RANK (ceil(q·n), no
    * interpolation — quantile_cont midpoints of 4-dp values land on
    * the round()-divergent half-boundaries). The p-rank labels assume
    * the three ranks are distinct (true for any n ≥ 3 — ceil(0.25·3),
    * ceil(0.5·3), ceil(0.75·3) = 1,2,3; the Spark side requires it
    * eagerly; gate corpora are 500). */
  private def datasheetOracle: String = datasheetOracleWith(
    """UNION ALL SELECT 'quality', 'p25', quality FROM rk CROSS JOIN tot WHERE rn = CAST(CEIL(n_docs * 0.25) AS BIGINT)
      |UNION ALL SELECT 'quality', 'p50', quality FROM rk CROSS JOIN tot WHERE rn = CAST(CEIL(n_docs * 0.5) AS BIGINT)
      |UNION ALL SELECT 'quality', 'p75', quality FROM rk CROSS JOIN tot WHERE rn = CAST(CEIL(n_docs * 0.75) AS BIGINT)""".stripMargin)

  /** q121: identical to [[datasheetOracle]] except the quality arms —
    * the certified sketch emits three healthy verdicts (q51's
    * `TRUE AS ..._ok` convention as 1.0 doubles in the datasheet's
    * value column); a broken sketch hash-fails against them. */
  private def datasheetSketchOracle: String = datasheetOracleWith(
    """UNION ALL SELECT 'quality', 'p25_ok', 1.0
      |UNION ALL SELECT 'quality', 'p50_ok', 1.0
      |UNION ALL SELECT 'quality', 'p75_ok', 1.0""".stripMargin)

  private def datasheetOracleWith(qualityArms: String): String =
    s"""WITH ${shingleCtes()},
       |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |               CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens,
       |               CAST(SUM(n_chars) AS DOUBLE) AS n_chars FROM documents),
       |mq AS (SELECT t.doc_id,
       |         CAST(len(toks) AS DOUBLE) AS n_tok,
       |         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
       |         CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
       |         LEAST(d.n_chars / 500.0, 1.0) AS len_sat
       |       FROM t JOIN documents d USING (doc_id)),
       |qv AS (SELECT doc_id,
       |         FLOOR((n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
       |       FROM mq),
       |rk AS (SELECT quality, ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rn FROM qv),
       |dup AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS DOUBLE) AS ndup
       |        FROM (SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY 1)),
       |xs AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |rs AS (SELECT doc_id AS eval_doc, shingle FROM xs WHERE doc_id % 7 = 0),
       |cont AS (SELECT CAST(COUNT(DISTINCT xs.doc_id) AS DOUBLE) AS nhit
       |         FROM xs JOIN rs ON xs.shingle = rs.shingle AND xs.doc_id <> rs.eval_doc),
       |lx AS (SELECT doc_id, unnest(toks) AS tok,
       |              CAST((generate_subscripts(toks, 1) - 1) // ${TextOps.DefaultSegTokens} AS INTEGER) AS seg FROM t),
       |lsc AS (SELECT doc_id, seg, $markerScoreSql FROM lx GROUP BY 1, 2),
       |lsl AS (SELECT doc_id, seg,
       |          CASE WHEN greatest($markerGreatest) = 0 THEN 'und' ELSE
       |            CASE $markerChain END END AS sl
       |        FROM (SELECT *, greatest($markerGreatest) AS g FROM lsc)),
       |lmx AS (SELECT CAST(COALESCE(SUM(CASE WHEN nl > 1 THEN 1 ELSE 0 END), 0) AS DOUBLE) AS nmix
       |        FROM (SELECT doc_id, COUNT(DISTINCT sl) AS nl FROM lsl WHERE sl <> 'und' GROUP BY 1))
       |SELECT 'corpus' AS section, 'n_docs' AS item, n_docs AS value FROM tot
       |UNION ALL SELECT 'corpus', 'n_tokens', n_tokens FROM tot
       |UNION ALL SELECT 'corpus', 'n_chars', n_chars FROM tot
       |UNION ALL SELECT 'by_source', source, CAST(COUNT(*) AS DOUBLE) FROM documents GROUP BY source
       |UNION ALL SELECT 'by_lang', lang, CAST(COUNT(*) AS DOUBLE) FROM documents GROUP BY lang
       |$qualityArms
       |UNION ALL SELECT 'exact_dup', 'n_dup_docs', ndup FROM dup
       |UNION ALL SELECT 'exact_dup', 'dup_frac', ndup / n_docs FROM dup CROSS JOIN tot
       |UNION ALL SELECT 'contamination', 'n_hit_docs', nhit FROM cont
       |UNION ALL SELECT 'contamination', 'hit_frac', nhit / n_docs FROM cont CROSS JOIN tot
       |UNION ALL SELECT 'lang_mix', 'n_mixed', nmix FROM lmx
       |UNION ALL SELECT 'lang_mix', 'mixed_frac', nmix / n_docs FROM lmx CROSS JOIN tot""".stripMargin

  /** q115: positional 3-grams (duplicates KEPT — q62's positional
    * convention, not the distinct shingle CTE) hit the eval set's
    * distinct shingles from a different doc; covered token positions
    * = hit pos + 0..2; rebuild = kept tokens in order. The oracle
    * joins on shingle TEXT where Spark joins on xxhash64 (q71's note —
    * identical modulo ~n²/2⁶⁵ collisions). */
  private def exciseOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |g AS (SELECT doc_id, CASE WHEN len(tk) >= 3
      |        THEN list_transform(range(1, len(tk) - 1),
      |               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |        ELSE [] END AS gs FROM t),
      |x AS (SELECT doc_id, unnest(gs) AS s, generate_subscripts(gs, 1) AS p FROM g),
      |r AS (SELECT DISTINCT doc_id AS eval_doc, s FROM x WHERE doc_id % 7 = 0),
      |h AS (SELECT DISTINCT x.doc_id, x.p
      |      FROM x JOIN r ON x.s = r.s AND x.doc_id <> r.eval_doc),
      |cd AS (SELECT DISTINCT doc_id FROM h),
      |cov AS (SELECT DISTINCT h.doc_id, h.p + d.d AS j
      |        FROM h CROSS JOIN (SELECT unnest(range(3)) AS d) d),
      |tok AS (SELECT t.doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS j
      |        FROM t JOIN cd USING (doc_id)),
      |kept AS (SELECT tok.doc_id, tok.tok, tok.j FROM tok
      |         ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j),
      |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |              string_agg(tok, ' ' ORDER BY j) AS clean
      |       FROM kept GROUP BY 1),
      |rb AS (SELECT cd.doc_id, COALESCE(ka.n_kept, 0) AS n_kept,
      |              COALESCE(ka.clean, '') AS clean
      |       FROM cd LEFT JOIN ka USING (doc_id))
      |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |       CAST(CASE WHEN rb.doc_id IS NOT NULL THEN len(tk) - rb.n_kept
      |            ELSE 0 END AS BIGINT) AS n_excised,
      |       CAST(length(CASE WHEN rb.doc_id IS NOT NULL THEN rb.clean
      |            ELSE array_to_string(tk, ' ') END) AS BIGINT) AS clean_len,
      |       md5(CASE WHEN rb.doc_id IS NOT NULL THEN rb.clean
      |           ELSE array_to_string(tk, ' ') END) AS clean_hash
      |FROM t LEFT JOIN rb USING (doc_id) ORDER BY t.doc_id""".stripMargin

  private def decontamNgramOracle: String =
    s"""WITH ${shingleCtes()},
       |x AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |r AS (SELECT doc_id AS eval_doc, shingle FROM x WHERE doc_id % 7 = 0)
       |SELECT x.doc_id, COUNT(DISTINCT x.shingle) AS n_shared_shingles,
       |       COUNT(DISTINCT r.eval_doc) AS n_eval_docs
       |FROM x JOIN r ON x.shingle = r.shingle AND x.doc_id <> r.eval_doc
       |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin

  /** q48: the Lloyd step replayed in SQL. Parity hinges on (a) the
    * fixed-point centroid means — BIGINT sums of floor(x·2²⁰+0.5), one
    * double division — and (b) every dot/norm as the same explicit
    * left-to-right chain as [[graft.functions.Exprs.DotProduct]].
    * Assignment ties: Spark's first-max argmax / max(struct(score,
    * -cell)) ≡ ROW_NUMBER() ORDER BY score DESC, cell. */
  private def kmeansOracle: String =
    s"""WITH $vecCtes,
       |cent AS (SELECT vec_id AS cell, v, nrm FROM n WHERE vec_id < 16),
       |sc AS (SELECT x.vec_id, x.v, x.nrm, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
       |       FROM n x CROSS JOIN cent c),
       |a0 AS (SELECT vec_id, v, nrm, cell AS cell0 FROM (
       |         SELECT vec_id, v, nrm, cell,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |         FROM sc) t WHERE rn = 1),
       |g AS (SELECT cell0, i, SUM(CAST(FLOOR(v[i] * 1048576.0 + 0.5) AS BIGINT)) AS s,
       |             COUNT(*) AS c
       |      FROM a0 CROSS JOIN range(1, 65) r(i) GROUP BY 1, 2),
       |cdim AS (SELECT cell0, i, CAST(s AS DOUBLE) / (1048576.0 * c) AS cd FROM g),
       |c1 AS (SELECT cell0 AS cell, list(cd ORDER BY i) AS cv FROM cdim GROUP BY 1),
       |c2 AS (SELECT cell, cv, sqrt(${sqlDot("cv", "cv")}) AS cnrm FROM c1),
       |s2 AS (SELECT a.vec_id, c.cell,
       |         (${sqlDot("a.v", "c.cv")}) / c.cnrm AS score,
       |         ROUND((${sqlDot("a.v", "c.cv")}) / (a.nrm * c.cnrm), 4) AS cos_sim,
       |         CAST(c.cell <> a.cell0 AS INTEGER) AS moved
       |       FROM a0 a CROSS JOIN c2 c),
       |r AS (SELECT vec_id, cell AS cluster_id, cos_sim, moved,
       |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |      FROM s2)
       |SELECT vec_id, cluster_id, cos_sim, moved FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** q65: the q48 oracle iterated — round r's centroids are the
    * fixed-point means of round (r−1)'s assignment, the final SELECT
    * scores every vector against the last centroids. The CTE chain is
    * GENERATED for the requested round count, so the SQL unrolls
    * exactly the rounds the Spark loop runs — one source of truth for
    * the arithmetic, identical to kmeansOracle's per-round text. */
  private def kmeansIterateOracle(rounds: Int): String = {
    val head =
      s"""WITH $vecCtes,
         |n0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
         |sc0 AS (SELECT x.vec_id, x.v, x.nrm, c.cell, (${sqlDot("x.v", "c.cv")}) / c.cnrm AS score
         |       FROM n x CROSS JOIN n0 c),
         |a0 AS (SELECT vec_id, v, nrm, cell FROM (
         |         SELECT vec_id, v, nrm, cell,
         |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
         |         FROM sc0) t WHERE rn = 1)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"a${r - 1}"
      // keep-on-empty (r14): a cell with no members this round KEEPS
      // its previous centroid — LEFT JOIN + COALESCE against the
      // previous round's table, the codebook oracle's convention
      val centroid =
        s""",
           |g$r AS (SELECT cell, i, SUM(CAST(FLOOR(v[i] * 1048576.0 + 0.5) AS BIGINT)) AS s,
           |             COUNT(*) AS c
           |      FROM $prev CROSS JOIN range(1, 65) r(i) GROUP BY 1, 2),
           |d$r AS (SELECT cell, i, CAST(s AS DOUBLE) / (1048576.0 * c) AS cd FROM g$r),
           |c$r AS (SELECT cell, list(cd ORDER BY i) AS cv FROM d$r GROUP BY 1),
           |k$r AS (SELECT p.cell, COALESCE(u.cv, p.cv) AS cv
           |       FROM n${r - 1} p LEFT JOIN c$r u USING (cell)),
           |n$r AS (SELECT cell, cv, sqrt(${sqlDot("cv", "cv")}) AS cnrm FROM k$r)""".stripMargin
      val reassign =
        if (r == rounds) "" // the final assignment is the output query below
        else
          s""",
             |sc$r AS (SELECT a.vec_id, a.v, a.nrm, c.cell, (${sqlDot("a.v", "c.cv")}) / c.cnrm AS score
             |       FROM $prev a CROSS JOIN n$r c),
             |a$r AS (SELECT vec_id, v, nrm, cell FROM (
             |         SELECT vec_id, v, nrm, cell,
             |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
             |         FROM sc$r) t WHERE rn = 1)""".stripMargin
      centroid + reassign
    }.mkString
    materializeTrainedCtes(head + roundCtes +
      s""",
         |fs AS (SELECT a.vec_id, c.cell,
         |         (${sqlDot("a.v", "c.cv")}) / c.cnrm AS score,
         |         ROUND((${sqlDot("a.v", "c.cv")}) / (a.nrm * c.cnrm), 4) AS cos_sim
         |       FROM a${rounds - 1} a CROSS JOIN n$rounds c),
         |fr AS (SELECT vec_id, cell AS cluster_id, cos_sim,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
         |      FROM fs)
         |SELECT vec_id, cluster_id, cos_sim FROM fr WHERE rn = 1 ORDER BY vec_id""".stripMargin)
  }

  /** q81/q82: the greedy BPE merge loop replayed as a DuckDB recursive
    * CTE. The merge-table literal is GENERATED from
    * [[graft.functions.Bpe.defaultMerges]] — one source of truth; rank
    * = `list_position` over the same ordered pair list the Scala
    * encoder ranks by. Each recursion step fuses the lowest-rank
    * (leftmost on ties) adjacent pair of ONE word — identical to
    * Bpe.Encoder's loop — and a word is final exactly when no adjacent
    * pair ranks. The dictionary trick (encode DISTINCT words, join
    * back by position) changes cost, not results: encoding is
    * word-local. */
  private def bpeCtes: String = {
    val mlit = graft.functions.Bpe.defaultMerges
      .map { case (l, r) => s"'$l $r'" }.mkString("[", ",", "]")
    def best(syms: String) =
      s"list_sort(list_transform(range(1, len($syms)), i -> [coalesce(nullif(" +
        s"list_position($mlit, $syms[i] || ' ' || $syms[i+1]), 0), 999999), i]))[1]"
    s"""wp AS (SELECT doc_id, generate_subscripts(w, 1) AS wi, unnest(w) AS word
       |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t0),
       |wf AS (SELECT * FROM wp WHERE word <> ''),
       |dw AS (SELECT DISTINCT word FROM wf),
       |enc(word, syms) AS (
       |  SELECT word, regexp_extract_all(word, '(?s).') FROM dw
       |  UNION ALL
       |  SELECT word, syms[1:best[2]-1] || [syms[best[2]] || syms[best[2]+1]] ||
       |           syms[best[2]+2:len(syms)]
       |  FROM (SELECT word, syms, ${best("syms")} AS best FROM enc) t
       |  WHERE best IS NOT NULL AND best[1] < 999999),
       |fin AS (
       |  SELECT word, syms FROM (SELECT word, syms, ${best("syms")} AS best FROM enc) t
       |  WHERE best IS NULL OR best[1] = 999999),
       |tok AS (SELECT word, syms, CAST(len(syms) AS BIGINT) AS n FROM fin)""".stripMargin
  }

  private def bpeEncodeOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |agg AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens,
       |          CAST(COUNT(*) AS BIGINT) AS n_words,
       |          string_agg(array_to_string(t.syms, ' '), ' ' ORDER BY d.wi) AS enc
       |        FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id)
       |SELECT doc.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
       |       COALESCE(a.n_words, 0) AS n_words, COALESCE(a.enc, '') AS enc
       |FROM documents doc LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q82: q40's pack oracle verbatim, with the whitespace token count
    * swapped for the recursive-CTE BPE count — measure changes, pack
    * arithmetic identical. */
  private def bpePackOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |dt AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |       FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id),
       |t2 AS (SELECT doc.lang, doc.doc_id, COALESCE(dt.n_tokens, 0) AS n_tokens
       |       FROM documents doc LEFT JOIN dt USING (doc_id)),
       |c AS (SELECT lang, doc_id, n_tokens,
       |        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM t2)
       |SELECT lang, CAST((cum - n_tokens) // 2048 AS INTEGER) AS chunk_id,
       |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin

  /** q86: the oracle's `decoded` is the SPACE-NORMALIZED original text
    * (split on single spaces, empty words dropped, rejoined — the
    * corpus contract every text operator applies), and `n_tokens` is
    * q81's unmarked count (post-encode marking cannot change the
    * segmentation). Hash equality against the declared query's
    * decode(encodeMarked(text)) is therefore the corpus-wide
    * LOSSLESSNESS proof of the marked round trip. */
  private def bpeDecodeOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |agg AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |        FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id),
       |nrm AS (SELECT doc_id, array_to_string(
       |          list_filter(string_split(text, ' '), x -> x <> ''), ' ') AS decoded
       |        FROM documents)
       |SELECT n.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens, n.decoded
       |FROM nrm n LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q88: per-(source, lang) BPE token totals — the per-doc counts come
    * from the same recursive-CTE encode as q81, the share mirrors
    * Exact.dround as FLOOR(x*1e4+0.5)/1e4. */
  private def tokenBudgetOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |dt AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |       FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id),
       |t2 AS (SELECT doc.source, doc.lang, COALESCE(dt.n_tokens, 0) AS nt
       |       FROM documents doc LEFT JOIN dt USING (doc_id)),
       |g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(nt) AS BIGINT) AS tokens FROM t2 GROUP BY 1, 2)
       |SELECT source, lang, n_docs, tokens,
       |       FLOOR((tokens / (SUM(tokens) OVER ())) * 10000.0 + 0.5) / 10000.0 AS token_share
       |FROM g ORDER BY source, lang""".stripMargin

  /** q92/q93 shared: the feature-hashing ±1 embedding replayed
    * per-dimension — the SAME Kirsch-Mitzenmacher chain as the
    * minhash oracle (md5_number_lower/upper mod 2³¹−1, the
    * proven-bit-exact idiom), parity instead of min; all-integer sums
    * so the full embedding identity hash-checks. ONE generator for
    * both oracles — the hashing chain cannot silently diverge between
    * the declared-embedding and composed-SemDeDup surfaces. Emits
    * `emb(doc_id, e0..e{D-1})`. */
  private val embedDim = 64
  private def textEmbedCtes: String = {
    val P = "2147483647"
    val sums = (0 until embedDim).map(d =>
      s"CAST(SUM(CASE WHEN ((h1 + $d * h2) % $P) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS e$d")
      .mkString(", ")
    s"""tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |h AS (SELECT doc_id, md5_number_lower(tok) % $P AS h1,
       |        md5_number_upper(tok) % $P AS h2 FROM tk),
       |emb AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)""".stripMargin
  }

  private def textEmbedOracle: String = {
    val embS = (0 until embedDim).map(d => s"e$d")
      .mkString("concat_ws(' ', ", ", ", ")")
    val nrm = (0 until embedDim).map(d => s"e$d * e$d").mkString(" + ")
    s"""WITH $textEmbedCtes
       |SELECT doc_id, $embS AS emb, CAST($nrm AS BIGINT) AS nrm2
       |FROM emb ORDER BY doc_id""".stripMargin
  }

  /** q108: fertility/compression per (source, lang) — the q88 BPE
    * recursive-CTE chain for subword counts, whitespace word counts
    * from the same split the Spark side uses, chars from the table's
    * n_chars column; ratios mirror Exact.dround. */
  private def tokenizerFertilityOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |dt AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |       FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id),
       |t2 AS (SELECT doc.source, doc.lang, doc.n_chars,
       |         CAST(len(list_filter(string_split(doc.text, ' '), x -> x <> '')) AS BIGINT) AS ws,
       |         COALESCE(dt.n_tokens, 0) AS nt
       |       FROM documents doc LEFT JOIN dt USING (doc_id)),
       |g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(ws) AS BIGINT) AS words, CAST(SUM(nt) AS BIGINT) AS tokens,
       |        CAST(SUM(n_chars) AS BIGINT) AS chars
       |      FROM t2 GROUP BY 1, 2)
       |SELECT source, lang, n_docs, words, tokens, chars,
       |       FLOOR(tokens / words * 10000.0 + 0.5) / 10000.0 AS fertility,
       |       FLOOR(chars / tokens * 10000.0 + 0.5) / 10000.0 AS chars_per_token
       |FROM g ORDER BY source, lang""".stripMargin

  /** q112: the epoch-factor recipe spliced from the SAME Scala value
    * the Spark side reads ([[graft.operators.Corpus.DefaultEpochs]] —
    * the generated-oracle single-source-of-truth convention); floor(e)
    * full epochs + the 16-bit md5 gate for the fraction, unlisted
    * sources at exactly one epoch (frac = 0 → gate never fires). */
  private def epochMixOracle: String = {
    val vals = graft.operators.Corpus.DefaultEpochs
      .map { case (s, e) => s"('$s', $e)" }.mkString(", ")
    s"""WITH f(source, ep) AS (SELECT * FROM (VALUES $vals) t(source, ep)),
       |d AS (SELECT doc_id, dd.source, lang,
       |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket,
       |        COALESCE(f.ep, 1.0) AS ep
       |      FROM documents dd LEFT JOIN f ON dd.source = f.source),
       |r AS (SELECT doc_id, source, lang,
       |        CAST(FLOOR(ep) + CASE WHEN bucket < FLOOR((ep - FLOOR(ep)) * 65536)
       |          THEN 1 ELSE 0 END AS INTEGER) AS reps
       |      FROM d)
       |SELECT doc_id, source, lang, CAST(unnest(range(0, reps)) AS INTEGER) AS epoch
       |FROM r WHERE reps >= 1 ORDER BY doc_id, epoch""".stripMargin
  }

  /** q111/s17: densified (source × observed bucket) counts, pairwise
    * TVD over the common denominator — HUGEINT numerator summed
    * exactly, den = 2·N_a·N_b, tvd = ONE double division of the two.
    * s17 shares it verbatim: the drained streaming state equals the
    * batch counts row-for-row, so the densify+TVD tail emits q111's
    * exact output. */
  /** q120: the perplexity filter replayed — the hashed-bigram LM's
    * pair/prefix counts from the target source, the all-integer
    * quantized-log2 surprise (`//` mirrors Spark's `div`,
    * `printf('%b')` length mirrors `bin()` length — both exact
    * integer bit-lengths), one IEEE division into bits/token, and
    * CCNet's per-language NTILE(3) buckets with featureless docs
    * fenced into their own 'und' partition. */
  /** q120/q124's shared LM + scoring CTE chain (train on src0, score
    * the pool, derive bits/token) — ends at `base(doc_id, source,
    * lang, n_bigrams, surprise, ppl_bits)`. q120 adds the exact ntile
    * bucketing; q124 regroups base per language with 1.0 verdict
    * literals (the in-plan certification is the Spark side's job —
    * q51/q73/q121's convention). */
  private def perplexityCtes(from: String = "documents",
                             prefix: String = ""): String = {
    val q = graft.operators.Corpus.PplQ
    val f = 1 << graft.operators.Corpus.PplFBits
    val P = prefix
    s"""${P}t AS (SELECT doc_id, source, lang, string_split(text, ' ') AS tk FROM $from),
       |${P}g AS (SELECT doc_id, source, lang,
       |        CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |          i -> [CAST(('0x' || substr(md5(tk[i]), 1, 4)) AS INTEGER) % 256,
       |                CAST(('0x' || substr(md5(tk[i+1]), 1, 4)) AS INTEGER) % 256])
       |        ELSE [] END AS bs FROM ${P}t),
       |${P}xb AS (SELECT doc_id, source, lang, p[1] AS b1, p[2] AS b2
       |       FROM (SELECT doc_id, source, lang, unnest(bs) AS p FROM ${P}g)),
       |${P}lm AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c_pair
       |       FROM ${P}xb WHERE source = 'src0' GROUP BY 1, 2),
       |${P}pf AS (SELECT b1, CAST(SUM(c_pair) AS BIGINT) AS c_prefix FROM ${P}lm GROUP BY 1),
       |${P}sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |              CAST(SUM(msb * $f + ((r - (CAST(1 AS BIGINT) << msb)) * $f)
       |                       // (CAST(1 AS BIGINT) << msb)) AS BIGINT) AS surprise
       |       FROM (SELECT doc_id, r, length(printf('%b', r)) - 1 AS msb
       |             FROM (SELECT ${P}xb.doc_id,
       |                     (CAST($q AS BIGINT) * (COALESCE(${P}pf.c_prefix, 0) + 256))
       |                       // (COALESCE(${P}lm.c_pair, 0) + 1) AS r
       |                   FROM ${P}xb LEFT JOIN ${P}lm USING (b1, b2) LEFT JOIN ${P}pf USING (b1)
       |                   WHERE ${P}xb.source <> 'src0'))
       |       GROUP BY doc_id),
       |${P}base AS (SELECT d.doc_id, d.source, d.lang,
       |                COALESCE(${P}sc.n_bigrams, 0) AS n_bigrams,
       |                COALESCE(${P}sc.surprise, 0) AS surprise,
       |                CASE WHEN COALESCE(${P}sc.n_bigrams, 0) > 0
       |                     THEN CAST(${P}sc.surprise AS DOUBLE) / CAST(${P}sc.n_bigrams * $f AS DOUBLE)
       |                END AS ppl_bits
       |         FROM $from d LEFT JOIN ${P}sc USING (doc_id)
       |         WHERE d.source <> 'src0')""".stripMargin
  }

  private def perplexityOracle: String =
    s"""WITH ${perplexityCtes()},
       |nt AS (SELECT *, NTILE(3) OVER (PARTITION BY lang, n_bigrams = 0
       |                                ORDER BY ppl_bits ASC NULLS LAST, doc_id) AS nt
       |       FROM base)
       |SELECT doc_id, source, lang, n_bigrams, surprise, ppl_bits,
       |       CASE WHEN n_bigrams = 0 THEN 'und' WHEN nt = 1 THEN 'head'
       |            WHEN nt = 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM nt ORDER BY doc_id""".stripMargin

  /** q124: deterministic columns replayed from the shared chain,
    * verdict booleans as 1.0 literals — a broken sketch fails the
    * hash on the Spark side (q73/q121's oracle convention). */
  private def perplexitySketchOracle: String =
    s"""WITH ${perplexityCtes()}
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_scored,
       |       1.0 AS t1_ok, 1.0 AS t2_ok
       |FROM base WHERE n_bigrams > 0
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** q35/q58/s18: exact contamination semi-join — fingerprint the
    * corpus, flag docs whose fingerprint appears in the reference set
    * (every seventh doc, the declared queries' convention). Shared by
    * the exact path (q35), the bloom-prefiltered scale path (q58 —
    * output-invisible prefilter), and the streaming intake guard (s18
    * — per-doc verdicts are batching-independent). */
  private def decontaminateOracle: String =
    """WITH fp AS (SELECT doc_id,
      |              md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      |            FROM documents)
      |SELECT doc_id, fingerprint FROM fp
      |WHERE fingerprint IN (SELECT fingerprint FROM fp WHERE doc_id % 7 = 0)
      |ORDER BY doc_id""".stripMargin

  /** q119: best-fit-decreasing packing replayed exactly. The recursive
    * CTE advances every (lang, shard) group one placement per
    * iteration, carrying the group's bin-remainder LIST as state:
    * best fit = list_position of the minimum remainder that still
    * fits (first occurrence ≡ the kernel's lowest-bin-id tie rule);
    * no fit → append a bin (oversize docs go negative and never fit
    * anything else, exactly the kernel's spec). Recursion depth =
    * max docs per shard = shardSize, bounded by construction. */
  private def packBfdOracle: String = {
    val b = graft.operators.Corpus.DefaultPackBudget
    val ss = graft.operators.Corpus.DefaultShardSize
    val best = "list_position(p.rems, list_min(list_filter(p.rems, r -> r >= o.n)))"
    s"""WITH RECURSIVE t AS (
       |  SELECT lang, CAST(doc_id // $ss AS BIGINT) AS shard, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |o AS (SELECT lang, shard, doc_id, n,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY n DESC, doc_id) AS BIGINT) AS step
       |      FROM t),
       |pack(lang, shard, step, rems, doc_id, n, bin) AS (
       |  SELECT lang, shard, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
       |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS INTEGER)
       |  FROM (SELECT DISTINCT lang, shard FROM o)
       |  UNION ALL
       |  SELECT o.lang, o.shard, o.step,
       |         CASE WHEN $best IS NULL
       |              THEN list_append(p.rems, $b - o.n)
       |              ELSE list_transform(range(1, len(p.rems) + 1),
       |                     i -> p.rems[i] - CASE WHEN i = $best THEN o.n ELSE CAST(0 AS BIGINT) END)
       |         END,
       |         o.doc_id, o.n,
       |         CAST(COALESCE($best, len(p.rems) + 1) - 1 AS INTEGER)
       |  FROM pack p JOIN o ON o.lang = p.lang AND o.shard = p.shard AND o.step = p.step + 1
       |)
       |SELECT lang, shard, doc_id, n AS n_tokens, bin
       |FROM pack WHERE step >= 1 ORDER BY lang, shard, doc_id""".stripMargin
  }

  private def sourceDivergenceOracle: String =
    """WITH tk AS (SELECT source,
      |        CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % 256 AS b
      |      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents)),
      |c AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY 1, 2),
      |d AS (SELECT s.source, bu.b, COALESCE(c.cnt, 0) AS cnt
      |      FROM (SELECT DISTINCT source FROM c) s
      |      CROSS JOIN (SELECT DISTINCT b FROM c) bu
      |      LEFT JOIN c USING (source, b)),
      |w AS (SELECT source, b, cnt, SUM(cnt) OVER (PARTITION BY source) AS n FROM d),
      |p AS (SELECT a.source AS src_a, x.source AS src_b, a.b,
      |             a.cnt AS ca, a.n AS na, x.cnt AS cb, x.n AS nb
      |      FROM w a JOIN w x ON a.b = x.b WHERE a.source < x.source)
      |SELECT src_a, src_b,
      |       CAST(SUM(ABS(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
      |            AS VARCHAR) AS num,
      |       CAST(2 * CAST(na AS HUGEINT) * nb AS VARCHAR) AS den,
      |       CAST(SUM(ABS(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS DOUBLE)
      |         / CAST(2 * CAST(na AS HUGEINT) * nb AS DOUBLE) AS tvd
      |FROM p GROUP BY src_a, src_b, na, nb ORDER BY src_a, src_b""".stripMargin

  /** q109/s16: exact top-20 tokens + totals with `TRUE AS certified` —
    * the MG verdicts are deterministically true under ANY legal
    * update/merge tree over the same token multiset (the Misra–Gries
    * theorems), batch two-phase agg and streaming state-store merge
    * alike, so one oracle covers both paths. */
  private def heavyHittersOracle: String =
    """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |           FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
      |e AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
      |k AS (SELECT tok, cnt FROM e ORDER BY cnt DESC, tok LIMIT 20)
      |SELECT k.tok, k.cnt, n.n, TRUE AS certified
      |FROM k CROSS JOIN n ORDER BY cnt DESC, tok""".stripMargin

  /** s12: q88's per-(source, lang) doc/token totals — the streaming
    * meter's drained state must equal the batch aggregate exactly. */
  private def tokenMeterOracle: String =
    s"""WITH RECURSIVE
       |$bpeCtes,
       |dt AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |       FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id),
       |t2 AS (SELECT doc.source, doc.lang, COALESCE(dt.n_tokens, 0) AS nt
       |       FROM documents doc LEFT JOIN dt USING (doc_id))
       |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(nt) AS BIGINT) AS tokens
       |FROM t2 GROUP BY 1, 2 ORDER BY source, lang""".stripMargin

  /** q83/q84: the BPE TRAINING loop unrolled to generated SQL — R =
    * [[graft.functions.Bpe.defaultTrainRounds]] rounds, one source of
    * truth with the Scala loop. Round i: weighted adjacent-pair counts
    * over the word dictionary's current segmentation (s(i-1)), argmax
    * with (count DESC, l, r) tie-break, then the batch merge applied
    * via the doubled-separator replace trick — `replace` scans left to
    * right resuming after each replacement in BOTH engines (BpeSpec
    * pins the equivalence on adversarial repeats), so ' l  r '→' lr '
    * over '  '-joined symbols fuses exactly the textbook
    * non-overlapping occurrences. */
  private def bpeTrainCtes(r: Int): String = {
    val sb = new StringBuilder
    sb ++= "w0 AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS c" +
      " FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t0" +
      " WHERE w <> '' GROUP BY w),\n"
    sb ++= "s0 AS MATERIALIZED (SELECT word, c, regexp_extract_all(word, '(?s).') AS segs FROM w0)"
    for (i <- 1 to r) {
      val p = i - 1
      sb ++= s",\np$i AS (SELECT segs[i] AS l, segs[i+1] AS r," +
        s" CAST(SUM(c) AS BIGINT) AS n" +
        s" FROM s$p, unnest(range(1, len(segs))) AS t(i) GROUP BY 1, 2)"
      sb ++= s",\nb$i AS MATERIALIZED (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1)"
      if (i < r)
        sb ++= s",\ns$i AS MATERIALIZED (SELECT word, c, list_filter(string_split(" +
          s"replace(' ' || array_to_string(segs, '  ') || ' '," +
          s" ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ')," +
          s" ' '), x -> x <> '') AS segs FROM s$p, b$i b)"
    }
    sb.result()
  }

  private def bpeTrainOracle: String = {
    val r = graft.functions.Bpe.defaultTrainRounds
    val union = (1 to r).map(i =>
      s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, n AS pair_count FROM b$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeTrainCtes(r)}\nSELECT * FROM ($union) ORDER BY merge_rank"
  }

  /** q84: full train-then-encode replay — the training chain feeds the
    * learned pair list (tm) into the same recursive greedy encode
    * q81's oracle runs, so exact subword identity under the
    * DATA-DEPENDENT table is verified end-to-end. */
  private def bpeEncodeTrainedOracle: String = {
    val r = graft.functions.Bpe.defaultTrainRounds
    val union = (1 to r).map(i => s"SELECT $i AS mr, l, r FROM b$i")
      .mkString(" UNION ALL ")
    def best(syms: String) =
      s"list_sort(list_transform(range(1, len($syms)), i -> [coalesce(nullif(" +
        s"list_position(tm.ml, $syms[i] || ' ' || $syms[i+1]), 0), 999999), i]))[1]"
    s"WITH RECURSIVE\n" +
      bpeTrainCtes(r) + ",\n" +
      s"tm AS MATERIALIZED (SELECT list(l || ' ' || r ORDER BY mr) AS ml FROM ($union)),\n" +
      "wp AS (SELECT doc_id, generate_subscripts(w, 1) AS wi, unnest(w) AS word" +
      " FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t0),\n" +
      "wf AS MATERIALIZED (SELECT * FROM wp WHERE word <> ''),\n" +
      "dw AS (SELECT DISTINCT word FROM wf),\n" +
      "enc(word, syms) AS (\n" +
      "  SELECT word, regexp_extract_all(word, '(?s).') FROM dw\n" +
      "  UNION ALL\n" +
      "  SELECT word, syms[1:best[2]-1] || [syms[best[2]] || syms[best[2]+1]]" +
      " || syms[best[2]+2:len(syms)]\n" +
      s"  FROM (SELECT word, syms, ${best("syms")} AS best FROM enc, tm) t\n" +
      "  WHERE best IS NOT NULL AND best[1] < 999999),\n" +
      "fin AS (\n" +
      s"  SELECT word, syms FROM (SELECT word, syms, ${best("syms")} AS best" +
      " FROM enc, tm) t\n" +
      "  WHERE best IS NULL OR best[1] = 999999),\n" +
      "tok AS (SELECT word, syms, CAST(len(syms) AS BIGINT) AS n FROM fin),\n" +
      "agg AS (SELECT d.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens,\n" +
      "          CAST(COUNT(*) AS BIGINT) AS n_words,\n" +
      "          string_agg(array_to_string(t.syms, ' '), ' ' ORDER BY d.wi) AS enc\n" +
      "        FROM wf d JOIN tok t USING (word) GROUP BY d.doc_id)\n" +
      "SELECT doc.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,\n" +
      "       COALESCE(a.n_words, 0) AS n_words, COALESCE(a.enc, '') AS enc\n" +
      "FROM documents doc LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"
  }

  private def simhashOracle: String = {
    val width = 64; val bands = 4; val bw = width / bands
    val bitSums = (0 until width).map { i =>
      val pos = i / 4 + 1; val p = 1 << (3 - i % 4)
      s"list_sum(list_transform(hs, h -> ((strpos('0123456789abcdef', h[$pos]) - 1) // $p) % 2 * 2 - 1)) AS s$i"
    }.mkString(", ")
    val fp = (0 until width).map(i => s"CASE WHEN s$i >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    val bks = (0 until bands).map(b => s"'$b|' || substr(fp, ${b * bw + 1}, $bw)").mkString(", ")
    val hamming = (1 to width).map(i => s"CASE WHEN fa[$i] <> fb[$i] THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, list_transform(string_split(text, ' '), x -> md5(x)) AS hs FROM documents),
       |u AS (SELECT doc_id, $bitSums FROM t),
       |f AS (SELECT doc_id, $fp AS fp FROM u),
       |b AS (SELECT doc_id, unnest([$bks]) AS bk FROM f),
       |c AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |      FROM b a JOIN b b2 ON a.bk = b2.bk AND a.doc_id < b2.doc_id),
       |h AS (SELECT c.doc_a, c.doc_b, pa.fp AS fa, pb.fp AS fb
       |      FROM c JOIN f pa ON c.doc_a = pa.doc_id JOIN f pb ON c.doc_b = pb.doc_id)
       |SELECT * FROM (SELECT doc_a, doc_b, $hamming AS hamming FROM h) q
       |WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Explicit 64-term chains mirroring Similarity.dot/norm term order. */
  private def sqlDot(a: String, b: String): String =
    (1 to 64).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  private val vecCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e)""".stripMargin

  /** q57: SemDeDup replayed in SQL — the q48 a0 assignment CTE (same
    * argmax tie-break), then the cluster-local pair pass with the
    * smallest condemning mate per vector via min + self-join-back. */
  /** q57's chain over any `n(vec_id, v, nrm)` CTE — factored so q93
    * replays the identical SemDeDup over TEXT-derived vectors. */
  /** `cells` is spliced as a SQL expression so geometry can be DERIVED
    * inside the oracle (a scalar subquery over the corpus CTE) instead
    * of hardcoded — the round-13 advice: a corpus-count change must
    * move both sides' quantizer together, not fail as a hash diff. */
  private def semanticDedupBody(cells: String, tau: String): String =
    s"cent AS (SELECT vec_id AS cell, v, nrm FROM n WHERE vec_id < ($cells)),\n" +
      semanticDedupBodyFromCent(tau)

  /** The SemDeDup chain over whatever `cent(cell, v, nrm)` CTE the
    * caller already defined — factored (r14) so q104 can splice the
    * TRAINED quantizer chain in front of the identical body. */
  private def semanticDedupBodyFromCent(tau: String): String =
    s"""sc AS (SELECT x.vec_id, x.v, x.nrm, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
       |       FROM n x CROSS JOIN cent c),
       |a0 AS (SELECT vec_id, v, nrm, cell FROM (
       |         SELECT vec_id, v, nrm, cell,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |         FROM sc) t WHERE rn = 1),
       |p AS (SELECT a.vec_id, b.vec_id AS bid,
       |        (${sqlDot("a.v", "b.v")}) / (a.nrm * b.nrm) AS cos_raw
       |      FROM a0 a JOIN a0 b ON a.cell = b.cell AND b.vec_id < a.vec_id),
       |d AS (SELECT vec_id, min(bid) AS dup_of FROM p WHERE cos_raw >= $tau GROUP BY vec_id),
       |dc AS (SELECT d.vec_id, d.dup_of, ROUND(p.cos_raw, 4) AS cos_sim
       |       FROM d JOIN p ON p.vec_id = d.vec_id AND p.bid = d.dup_of)
       |SELECT a0.vec_id, a0.cell AS cluster_id,
       |       CAST(dc.dup_of IS NULL AS INTEGER) AS keep, dc.dup_of, dc.cos_sim
       |FROM a0 LEFT JOIN dc ON a0.vec_id = dc.vec_id
       |ORDER BY a0.vec_id""".stripMargin

  private def semanticDedupOracle: String =
    s"WITH $vecCtes,\n" + semanticDedupBody(gateCells.toString, "0.4")

  /** q93: the full TEXT pipeline oracle — q92's embedding CTEs feed
    * q57's SemDeDup body verbatim. Both gate SFs hold 500 documents,
    * so the same suggestCells derivation as the embeddings gate
    * applies (gateCells); tau = 0.9 (the q92 cosine distribution on
    * this shared-vocabulary corpus concentrates near 0.6 — 0.9
    * isolates verbatim/near-verbatim bags). */
  private def semanticDedupTextOracle: String = {
    val vlist = (0 until embedDim).map(d => s"CAST(e$d AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""WITH $textEmbedCtes,
       |e2 AS (SELECT doc_id AS vec_id, $vlist AS v FROM emb),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e2),
       |""".stripMargin + semanticDedupBody(gateCells.toString, "0.9")
  }

  /** The modality-SemDeDup quantizer geometry, derived INSIDE the
    * oracle (round-13 advice): 3·suggestCells(n) where n counts the
    * modality's docs in the salted corpus — the exact number the
    * Spark side's `frame.count()` sees — so a corpus change moves
    * both quantizers together instead of surfacing as a hash diff.
    * suggestCells(n) = max(1, ceil(n/128)). */
  private def modalityCellsSql(residue: Int): String =
    s"SELECT 3 * GREATEST(1, CAST(CEIL(COUNT(*) / 128.0) AS BIGINT)) " +
      s"FROM docs2 WHERE doc_id % 3 = $residue"

  /** q97 (and s14, which drains to the SAME rows): the image pipeline
    * oracle — the golden grid vectors (law pixels, never the decoder)
    * re-crawl-salted like the declared query, mean-centered in exact
    * integers (64·v − Σv; flat frames to the canonical unit axis —
    * see imageSemanticFrame's NaN rationale), feeding q57's SemDeDup
    * body with SQL-derived geometry. */
  private def semanticDedupImageOracle: String = {
    val unit = ("1.0" +: Seq.fill(63)("0.0")).mkString("[", ", ", "]")
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 21 = 0),
       |g AS (SELECT d.doc_id AS vec_id,
       |        list_transform(string_split(gg.grid_emb, ' '), x -> CAST(x AS BIGINT)) AS v0
       |      FROM docs2 d
       |      JOIN read_parquet('$GoldenDir/image.parquet/*.parquet') gg
       |        ON md5(d.text) = gg.text_md5
       |      WHERE d.doc_id % 3 = 0),
       |cvec AS (SELECT vec_id,
       |        CASE WHEN list_min(v0) = list_max(v0) THEN $unit
       |             ELSE list_transform(v0, x -> CAST(64 * x - list_sum(v0) AS DOUBLE)) END AS v
       |      FROM g),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM cvec),
       |""".stripMargin +
      semanticDedupBody(modalityCellsSql(0), "0.9")
  }

  /** q99: q97's image pipeline oracle transposed to audio — golden
    * energy envelopes (PCM law, never the parser), integer centering
    * (64·e − Σe), flat envelopes to the unit axis, q57's body. */
  private def semanticDedupAudioOracle: String = {
    val unit = ("1.0" +: Seq.fill(63)("0.0")).mkString("[", ", ", "]")
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 21 = 1),
       |g AS (SELECT d.doc_id AS vec_id,
       |        list_transform(string_split(gg.env_emb, ' '), x -> CAST(x AS BIGINT)) AS v0
       |      FROM docs2 d
       |      JOIN read_parquet('$GoldenDir/audio.parquet/*.parquet') gg
       |        ON md5(d.text) = gg.text_md5
       |      WHERE d.doc_id % 3 = 1),
       |cvec AS (SELECT vec_id,
       |        CASE WHEN list_min(v0) = list_max(v0) THEN $unit
       |             ELSE list_transform(v0, x -> CAST(64 * x - list_sum(v0) AS DOUBLE)) END AS v
       |      FROM g),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM cvec),
       |""".stripMargin +
      semanticDedupBody(modalityCellsSql(1), "0.9")
  }

  /** q64: the q48/q57 a0 assignment CTE, then a per-cell id rank cap. */
  private def samplePerCellOracle: String =
    s"""WITH $vecCtes,
       |cent AS (SELECT vec_id AS cell, v, nrm FROM n WHERE vec_id < 16),
       |sc AS (SELECT x.vec_id, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
       |       FROM n x CROSS JOIN cent c),
       |a0 AS (SELECT vec_id, cell FROM (
       |         SELECT vec_id, cell,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |         FROM sc) t WHERE rn = 1)
       |SELECT vec_id, cell AS cluster_id,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS INTEGER) AS cell_rank
       |FROM a0 QUALIFY cell_rank <= 8 ORDER BY vec_id""".stripMargin

  /** q63: cross-corpus cosine with the closest-match argmax — rounding
    * after selection, ties toward the smaller eval id. */
  private def semanticDecontamOracle: String =
    s"""WITH $vecCtes,
       |ev AS (SELECT vec_id AS eval_id, v, nrm FROM n WHERE vec_id % 7 = 0),
       |ca AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 7 <> 0),
       |p AS (SELECT ca.vec_id, ev.eval_id,
       |        (${sqlDot("ca.v", "ev.v")}) / (ca.nrm * ev.nrm) AS cos_raw
       |      FROM ca CROSS JOIN ev),
       |f AS (SELECT vec_id, eval_id, cos_raw,
       |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, eval_id) AS rn
       |      FROM p WHERE cos_raw >= 0.4)
       |SELECT vec_id, eval_id AS matched_eval, ROUND(cos_raw, 4) AS cos_sim
       |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin

  private def embeddingDedupOracle: String =
    s"""WITH $vecCtes,
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |        (${sqlDot("a.v", "b.v")}) / (a.nrm * b.nrm) AS cos_raw
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, ROUND(cos_raw, 4) AS cos_sim FROM p
       |WHERE cos_raw >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  private def annBruteOracle: String =
    s"""WITH $vecCtes,
       |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        ROUND((${sqlDot("q.v", "c.v")}) / (q.nrm * c.nrm), 4) AS cos_sim
       |      FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS "rank"
       |      FROM s)
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** q87: the int8 scalar-quantized ANN replayed per-dimension —
    * bounds (exact min/max), codes (floor against w_d = span/255),
    * the c0 + Σ(q_d·w_d)·code_d ADC form, stamped decoded norms and
    * the exact re-rank, every sum chain in the SAME left-to-right
    * order as the Spark expressions so the approximate ranking (and
    * therefore the rerank set) cannot diverge by a bit. */
  private def annSq8Oracle: String = {
    val D = 64
    val mnw = (1 to D).map(d =>
      s"MIN(v[$d]) AS mn$d, (MAX(v[$d]) - MIN(v[$d])) / 255.0 AS w$d")
      .mkString(", ")
    val codes = (1 to D).map(d =>
      s"CASE WHEN s.w$d > 0 THEN LEAST(FLOOR((v[$d] - s.mn$d) / s.w$d), 255.0) " +
        s"ELSE 0.0 END AS cd$d").mkString(", ")
    val vn2 = (1 to D).map(d =>
      s"(s.mn$d + (c.cd$d * s.w$d)) * (s.mn$d + (c.cd$d * s.w$d))")
      .mkString(" + ")
    val c0 = (1 to D).map(d => s"(qv[$d] * s.mn$d)").mkString(" + ")
    val adc = (1 to D).map(d => s"((qt.qv[$d] * s.w$d) * c.cd$d)").mkString(" + ")
    s"""WITH $vecCtes,
       |s AS (SELECT $mnw FROM e),
       |c AS (SELECT vec_id, $codes FROM e, s),
       |vn AS (SELECT vec_id, $vn2 AS vn2 FROM c, s),
       |a AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
       |qt AS (SELECT query_id, qv, qn, $c0 AS c0 FROM a, s),
       |sc AS (SELECT qt.query_id, qt.qv, qt.qn, c.vec_id AS neighbor_id,
       |         qt.c0 + ($adc) AS num
       |       FROM qt, c, s WHERE qt.query_id <> c.vec_id),
       |ap AS (SELECT sc.query_id, sc.qv, sc.qn, sc.neighbor_id,
       |         sc.num / (sc.qn * sqrt(vn.vn2)) AS approx
       |       FROM sc JOIN vn ON sc.neighbor_id = vn.vec_id),
       |cand AS (SELECT query_id, qv, qn, neighbor_id FROM (
       |           SELECT query_id, qv, qn, neighbor_id,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY approx DESC, neighbor_id) AS rr
       |           FROM ap) t WHERE rr <= 32),
       |ex AS (SELECT cand.query_id, cand.neighbor_id,
       |         ROUND((${sqlDot("cand.qv", "n.v")}) / (cand.qn * n.nrm), 4) AS cos_sim
       |       FROM cand JOIN n ON cand.neighbor_id = n.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS "rank"
       |      FROM ex)
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin
  }

  /** The correctness gate (Verify → DuckDB) runs at sf0.01, whose
    * embeddings table holds 500 vectors (TESTDATA.md). q26/q34/q57
    * auto-size their geometry from the corpus count at run time
    * (Similarity.AutoGeometry), so their oracles bake the SAME
    * derivation applied to the gate corpus: suggestBits(500)=2,
    * suggestCells(500)=4. EtlSpec pins this constant against the real
    * sf0.001/sf0.01 parquet so a regenerated test corpus fails loudly
    * here instead of as an opaque hash mismatch. */
  private[graft] val gateEmbeddingsN: Long = 500L
  private[graft] val gateBits: Int = Similarity.suggestBits(gateEmbeddingsN)
  private[graft] val gateCells: Int = Similarity.suggestCells(gateEmbeddingsN)

  /** Shared plane/bucket CTE prefix for the sign-random-projection
    * oracles (q26/q34): the ±1 plane matrix as literal VALUES rows +
    * per-(vector, table) bucket strings. */
  private def lshBucketCtes(bits: Int = gateBits, tables: Int = 16): String = {
    val signs = Similarity.planeSigns(tables, bits)
    val rows = (for (t <- 0 until tables; p <- 0 until bits) yield {
      val ws = signs(t * bits + p).map(x => if (x > 0) "1.0" else "-1.0").mkString(",")
      s"($t, $p, CAST([$ws] AS DOUBLE[]))"
    }).mkString(", ")
    s"""planes AS (SELECT * FROM (VALUES $rows) pl(tbl, pl_idx, w)),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sb AS (SELECT e.vec_id,
       |         CAST(p.tbl AS VARCHAR) || '|' ||
       |         string_agg(CASE WHEN (${sqlDot("e.v", "p.w")}) >= 0 THEN '1' ELSE '0' END, '' ORDER BY p.pl_idx) AS bk
       |       FROM e CROSS JOIN planes p GROUP BY e.vec_id, p.tbl)""".stripMargin
  }

  /** q34: bucketed near-dup — candidates = distinct pairs sharing any
    * bucket, then the SAME exact cosine filter as q24. */
  private def embeddingDedupLshOracle: String =
    s"""WITH ${lshBucketCtes()},
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM sb a JOIN sb b ON a.bk = b.bk AND a.vec_id < b.vec_id),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e),
       |p AS (SELECT c.vec_a, c.vec_b,
       |        (${sqlDot("a.v", "b.v")}) / (a.nrm * b.nrm) AS cos_raw
       |      FROM cand c JOIN n a ON c.vec_a = a.vec_id JOIN n b ON c.vec_b = b.vec_id)
       |SELECT vec_a, vec_b, ROUND(cos_raw, 4) AS cos_sim FROM p
       |WHERE cos_raw >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** q46: IVF with the deterministic quantizer — centroids are the 16
    * lowest-vec_id vectors; assignment and probe ranking both order by
    * (score DESC, cell), matching the Spark side's first-max argmax
    * and row_number ties exactly. */
  /** q46's chain over any `n(vec_id, v, nrm)` CTE — factored (the
    * semanticDedupBody convention) so q100 replays the identical IVF
    * search over TEXT-derived vectors. */
  private def annIvfBody: String =
    s"""cent AS (SELECT vec_id AS cell, v, nrm FROM n WHERE vec_id < 16),
       |sc AS (SELECT x.vec_id, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
       |       FROM n x CROSS JOIN cent c),
       |asg AS (SELECT vec_id AS neighbor_id, cell FROM (
       |          SELECT vec_id, cell,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |          FROM sc) t WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM (
       |          SELECT vec_id, cell,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |          FROM sc WHERE vec_id < 10) t WHERE rn <= 4),
       |s AS (SELECT p.query_id, a.neighbor_id,
       |        ROUND((${sqlDot("q.v", "c.v")}) / (q.nrm * c.nrm), 4) AS cos_sim
       |      FROM probes p JOIN asg a USING (cell)
       |      JOIN n q ON q.vec_id = p.query_id
       |      JOIN n c ON c.vec_id = a.neighbor_id
       |      WHERE a.neighbor_id <> p.query_id),
       |r AS (SELECT query_id, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS "rank"
       |      FROM s)
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  private def annIvfOracle: String =
    s"WITH $vecCtes,\n" + annIvfBody

  /** q127/q128's shared BM25 chain — [[graft.operators.Retrieval]]
    * replayed term for term: tf with the doc-partitioned dl window,
    * the quantized avgdl, the df cap, the Robertson idf through the
    * q120 integer-log2 kernel (`printf('%b')` length ≡ Spark `bin()`
    * length), the all-integer contribution division, and the exact
    * integer score sum. Every coefficient spliced from the Retrieval
    * constants. Ends at `{P}pool(query_id, doc_id, n_terms, score_fp,
    * rank)` capped at `poolK`. `nQueries` is threaded like poolK (r16
    * advice): the Spark operators parameterize it, so the generator
    * must stay total over the operator's parameter space — a declared
    * query using a non-default nQueries would otherwise silently
    * drift from a hardcoded `doc_id < 10`. */
  private def bm25Ctes(poolK: Int, prefix: String = "",
                       nQueries: Int = 10): String = {
    val R = graft.operators.Retrieval
    val f = 1L << R.Bm25FBits
    def il2(x: String): String = {
      val m = s"(length(printf('%b', $x)) - 1)"
      s"(CAST($m AS BIGINT) * $f + (($x - (CAST(1 AS BIGINT) << $m)) * $f) // (CAST(1 AS BIGINT) << $m))"
    }
    val P = prefix
    s"""${P}tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |${P}tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM ${P}tk GROUP BY 1, 2),
       |${P}tfd AS (SELECT doc_id, term, tf,
       |         CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl FROM ${P}tf),
       |${P}st AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |         (CAST(SUM(tf) AS BIGINT) * ${R.AvgdlQ}) // CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS avgdl_q
       |       FROM ${P}tf),
       |${P}qt AS (SELECT DISTINCT doc_id AS query_id, term FROM ${P}tf WHERE doc_id < $nQueries),
       |${P}idf AS (SELECT term,
       |         ${il2("(2 * n_docs + 2)")} - ${il2("(2 * df + 1)")} AS idf_q, avgdl_q
       |       FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ${P}tf GROUP BY 1), ${P}st
       |       WHERE df * 1000000 <= ${R.DefaultMaxDfPpm} * n_docs
       |         AND term IN (SELECT term FROM ${P}qt)),
       |${P}cd AS (SELECT q.query_id, c.doc_id,
       |         (i.idf_q * (${R.CNum} * c.tf * i.avgdl_q))
       |           // (10 * c.tf * i.avgdl_q + ${R.CDen1} * i.avgdl_q + ${R.CDen2} * c.dl) AS contrib
       |       FROM ${P}qt q JOIN ${P}idf i USING (term) JOIN ${P}tfd c USING (term)
       |       WHERE c.doc_id <> q.query_id),
       |${P}sc AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |         CAST(SUM(contrib) AS BIGINT) AS score_fp FROM ${P}cd GROUP BY 1, 2),
       |${P}pool AS (SELECT query_id, doc_id, n_terms, score_fp, "rank" FROM (
       |         SELECT query_id, doc_id, n_terms, score_fp,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY score_fp DESC, doc_id) AS INTEGER) AS "rank"
       |         FROM ${P}sc) t WHERE "rank" <= $poolK)""".stripMargin
  }

  /** q127: the BM25 pool at k = 5, displayed score = one exact
    * power-of-two scaling of the integer score (dround mirror). */
  private def bm25Oracle: String = {
    val f = 1L << graft.operators.Retrieval.Bm25FBits
    s"""WITH ${bm25Ctes(5)}
       |SELECT query_id, doc_id, n_terms,
       |  FLOOR((CAST(score_fp AS DOUBLE) / $f.0) * 10000 + 0.5) / 10000 AS score,
       |  "rank"
       |FROM pool ORDER BY query_id, "rank"""".stripMargin
  }

  /** q128: RRF fusion replayed — the q127 chain (prefix b, poolK) +
    * the q92→q25 exact-cosine chain (textEmbedCtes + the annBrute
    * body at poolK), full-outer-joined per (query, doc); rrf = the
    * same two IEEE divisions and one add, ranked on the RAW double
    * (bit-identical by construction) and displayed through dround. */
  private def rrfFusionOracle: String = {
    val R = graft.operators.Retrieval
    val vlist = (0 until embedDim).map(d => s"CAST(e$d AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""WITH ${bm25Ctes(R.DefaultPoolK, "b")},
       |$textEmbedCtes,
       |e2 AS (SELECT doc_id AS vec_id, $vlist AS v FROM emb),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e2),
       |ss AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |         ROUND((${sqlDot("q.v", "c.v")}) / (q.nrm * c.nrm), 4) AS cos_sim
       |       FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |spool AS (SELECT query_id, doc_id, "rank" FROM (
       |         SELECT query_id, doc_id,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY cos_sim DESC, doc_id) AS INTEGER) AS "rank"
       |         FROM ss) t WHERE "rank" <= ${R.DefaultPoolK}),
       |fu AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |         l."rank" AS r_lex, s."rank" AS r_sem,
       |         COALESCE(1.0 / (${R.RrfK}.0 + CAST(l."rank" AS DOUBLE)), 0.0)
       |           + COALESCE(1.0 / (${R.RrfK}.0 + CAST(s."rank" AS DOUBLE)), 0.0) AS rrf_raw
       |       FROM bpool l FULL OUTER JOIN spool s
       |         ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |r AS (SELECT query_id, doc_id, r_lex, r_sem,
       |        FLOOR(rrf_raw * 1000000 + 0.5) / 1000000 AS rrf,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY rrf_raw DESC, doc_id) AS INTEGER) AS "rank"
       |      FROM fu)
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin
  }

  /** q135: the lexical drift alarm replayed — base-split lexicon
    * (df = per-term doc count, the q127 tokenizer), the
    * vocabulary-shifted intake through the same tokenizer, and the
    * three integer-ppm meters + the alarm. Thresholds/head size
    * spliced from the operator defaults (the splice rule). */
  private def bm25DriftOracle: String = {
    val R = graft.operators.Retrieval
    s"""WITH btk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |          FROM documents WHERE doc_id % 10 <> 9),
       |lex AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |        FROM btk GROUP BY 1),
       |ltot AS (SELECT CAST(SUM(df) AS BIGINT) AS l_totdf FROM lex),
       |topk AS (SELECT term, df FROM lex
       |         ORDER BY df DESC, term LIMIT ${R.DefaultDriftTopK}),
       |itext AS (SELECT doc_id,
       |            CASE WHEN doc_id % 100 < 50
       |              THEN replace(text, ' ', '_v2 ') || '_v2'
       |              ELSE text END AS text
       |          FROM documents WHERE doc_id % 10 = 9),
       |itk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM itext),
       |iterm AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS itok,
       |            CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ipost
       |          FROM itk GROUP BY 1),
       |tot AS (SELECT CAST(SUM(i.itok) AS BIGINT) AS t_tok,
       |          CAST(SUM(CASE WHEN l.term IS NULL THEN i.itok ELSE 0 END) AS BIGINT) AS oov_tok,
       |          CAST(SUM(i.ipost) AS BIGINT) AS t_post,
       |          CAST(SUM(CASE WHEN l.term IS NULL THEN i.ipost ELSE 0 END) AS BIGINT) AS new_post,
       |          CAST(SUM(CASE WHEN l.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_terms
       |        FROM iterm i LEFT JOIN lex l USING (term)),
       |dr AS (SELECT CAST(SUM(ABS(t.df * 1000000 // x.l_totdf
       |            - COALESCE(i.ipost, 0) * 1000000 // p.t_post)) AS BIGINT) AS topk_tvd_ppm
       |       FROM topk t LEFT JOIN iterm i USING (term)
       |       CROSS JOIN ltot x CROSS JOIN (SELECT t_post FROM tot) p)
       |SELECT t.new_terms,
       |  t.new_post * 1000000 // t.t_post AS new_post_ppm,
       |  t.oov_tok * 1000000 // t.t_tok AS oov_token_ppm,
       |  d.topk_tvd_ppm,
       |  (t.oov_tok * 1000000 // t.t_tok > ${R.DefaultOovAlarmPpm}
       |    OR d.topk_tvd_ppm > ${R.DefaultTvdAlarmPpm}) AS retrain_alarm
       |FROM tot t CROSS JOIN dr d""".stripMargin
  }

  /** q134: the artifact-served hybrid replayed — q128's bm25 pool
    * CTEs verbatim (the q129 serve is pool-identical to the ad-hoc
    * leg), the TEXT-embedding chain feeding the full q102/q105
    * trained IVF-PQ index + search CTEs (source-swapped
    * [[annIvfPqIndexCtes]] — the semantic pool is the index's honest
    * nProbe=8/rerank=64 serving answer, not q128's exact brute
    * force), and the SAME RRF fusion SQL. */
  private def hybridServedOracle: String = {
    val R = graft.operators.Retrieval
    val vlist = (0 until embedDim).map(d => s"CAST(e$d AS DOUBLE)")
      .mkString("[", ", ", "]")
    val src = s"""${bm25Ctes(R.DefaultPoolK, "b")},
       |$textEmbedCtes,
       |e2 AS (SELECT doc_id AS vec_id, $vlist AS v FROM emb),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e2)""".stripMargin
    materializeTrainedCtes(
      s"""${annIvfPqIndexCtes(residual = true, trainRounds = 2,
            centRounds = 2, source = src)},
       |${annIvfPqSearchCtes("", nProbe = 8, rerank = 64, residual = true)},
       |spool AS (SELECT query_id, neighbor_id AS doc_id, "rank"
       |          FROM r WHERE "rank" <= ${R.DefaultPoolK}),
       |fu AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |         l."rank" AS r_lex, s."rank" AS r_sem,
       |         COALESCE(1.0 / (${R.RrfK}.0 + CAST(l."rank" AS DOUBLE)), 0.0)
       |           + COALESCE(1.0 / (${R.RrfK}.0 + CAST(s."rank" AS DOUBLE)), 0.0) AS rrf_raw
       |       FROM bpool l FULL OUTER JOIN spool s
       |         ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |rrfr AS (SELECT query_id, doc_id, r_lex, r_sem,
       |        FLOOR(rrf_raw * 1000000 + 0.5) / 1000000 AS rrf,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY rrf_raw DESC, doc_id) AS INTEGER) AS "rank"
       |      FROM fu)
       |SELECT * FROM rrfr WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)
  }

  /** q100: semantic text SEARCH — q92's embedding CTEs feeding q46's
    * IVF body verbatim (the search sibling of q93's dedup
    * composition): top-5 cosine neighbors per query document over the
    * hashing-trick vectors, probe-pruned by the seed quantizer. */
  private def annTextOracle: String = {
    val vlist = (0 until embedDim).map(d => s"CAST(e$d AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""WITH $textEmbedCtes,
       |e2 AS (SELECT doc_id AS vec_id, $vlist AS v FROM emb),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e2),
       |""".stripMargin + annIvfBody
  }

  /** q69: IVF-PQ replayed — the q46 coarse CTEs, plus the PQ codebook
    * (seed subvector slices, code = vec_id rank), per-subspace argmin
    * encoding, (s, code)-ordered flat ADC/|c|² lists, and the SAME
    * fixed left-assoc lookup chains the Spark side builds — every sum
    * order matches term for term, so the approximate scores (and
    * therefore the rerank cut) are bit-identical. */
  /** q69/q70/q94 shared generator. `trainRounds > 0` (q94) prepends
    * the per-subspace Lloyd rounds of
    * [[graft.operators.Similarity.trainedCodebooks]], unrolled in SQL
    * (q65/q83's convention): round r assigns every (vec_id, s)
    * sub-vector to its round-(r−1) argmin code (err = |cb|² − 2⟨sub,
    * cb⟩, ties toward the smaller code — the encode rule verbatim)
    * and recomputes member means in the same 2²⁰ fixed-point
    * arithmetic as the q65 oracle; a code that loses all members
    * KEEPS its previous centroid (LEFT JOIN + COALESCE — the Spark
    * side's getOrElse). The search body downstream is byte-identical
    * to q69's, reading the final book. */
  /** q65's Lloyd-trained coarse quantizer unrolled as CTEs over the
    * `n(vec_id, v, nrm)` frame — assign → fixed-point means, reassign
    * between rounds (kmeansIterateOracle's chain verbatim), ending in
    * a `cent(cell, v, nrm)` CTE every downstream body reads
    * unchanged. Shared by q102 (trained PQ search) and q104 (trained
    * SemDeDup). Seeds = the `seeds` lowest-vec_id vectors, the
    * trainedCentroids convention. */
  private def trainedCentCtes(centRounds: Int, seeds: String = "16"): String = {
    val head =
      s"""kv0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM n WHERE vec_id < ($seeds)),
         |ksc0 AS (SELECT x.vec_id, x.v, c.cell, (${sqlDot("x.v", "c.cv")}) / c.cnrm AS score
         |       FROM n x CROSS JOIN kv0 c),
         |ka0 AS (SELECT vec_id, v, cell FROM (
         |         SELECT vec_id, v, cell,
         |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
         |         FROM ksc0) t WHERE rn = 1)""".stripMargin
    val roundCtes = (1 to centRounds).map { r =>
      // keep-on-empty: the codebook oracle's LEFT JOIN + COALESCE —
      // a memberless cell carries its previous centroid forward
      val mean =
        s""",
           |kg$r AS (SELECT cell, i, SUM(CAST(FLOOR(v[i] * 1048576.0 + 0.5) AS BIGINT)) AS s,
           |             COUNT(*) AS c
           |      FROM ka${r - 1} CROSS JOIN range(1, 65) r(i) GROUP BY 1, 2),
           |kc$r AS (SELECT cell, list(CAST(s AS DOUBLE) / (1048576.0 * c) ORDER BY i) AS cv FROM kg$r GROUP BY 1),
           |kk$r AS (SELECT p.cell, COALESCE(u.cv, p.cv) AS cv
           |       FROM kv${r - 1} p LEFT JOIN kc$r u USING (cell)),
           |kv$r AS (SELECT cell, cv, sqrt(${sqlDot("cv", "cv")}) AS cnrm FROM kk$r)""".stripMargin
      val reassign =
        if (r == centRounds) ""
        else
          s""",
             |ksc$r AS (SELECT a.vec_id, a.v, c.cell, (${sqlDot("a.v", "c.cv")}) / c.cnrm AS score
             |       FROM ka${r - 1} a CROSS JOIN kv$r c),
             |ka$r AS (SELECT vec_id, v, cell FROM (
             |         SELECT vec_id, v, cell,
             |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
             |         FROM ksc$r) t WHERE rn = 1)""".stripMargin
      mean + reassign
    }.mkString
    head + roundCtes +
      s""",
         |cent AS (SELECT cell, cv AS v, cnrm AS nrm FROM kv$centRounds)""".stripMargin
  }

  /** `centRounds` > 0 swaps the seed coarse quantizer for q65's
    * Lloyd-TRAINED centroids ([[trainedCentCtes]]); every downstream
    * CTE reads `cent`, so the trained and seed geometries share the
    * whole search body. q102 composes this with `trainRounds` — BOTH
    * training loops in one statement. */
  /** PQ oracle building blocks shared by [[annIvfPqOracle]] and the
    * q125 frontier oracle: the m=8/ks=16/dsub=8 geometry's sub-vector
    * dot and flat-array lookup chain. */
  private def pqDot8(a: String, b: String): String =
    (1 to 8).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
  private def pqChain(arr: String, codes: String): String =
    (0 until 8).map(s => s"$arr[${s * 16} + $codes[${s + 1}] + 1]")
      .mkString(" + ")

  /** One serving configuration's search CTEs over the SHARED index
    * CTEs of [[annIvfPqIndexCtes]] — probes (rn ≤ nProbe), ADC
    * scoring, the rerank cut, exact re-rank, top-5. Suffix every CTE
    * so multiple configs coexist in one statement (q125). */
  private def annIvfPqSearchCtes(sfx: String, nProbe: Int, rerank: Int,
                                 residual: Boolean,
                                 candWhere: String = ""): String = {
    // q137: a candidate predicate lands in the SAME place the Spark
    // plan applies it — on the candidate rows, before the rerank cut
    val cw = if (candWhere.isEmpty) "" else s" AND ($candWhere)"
    val ap =
      if (!residual)
        s"""ap$sfx AS (SELECT p.query_id, a.neighbor_id,
           |         (${pqChain("d.adc", "cv.codes")}) / (q.nrm * sqrt(cv.vn2)) AS approx
           |       FROM probes$sfx p JOIN asg a USING (cell)
           |       JOIN codesv cv ON cv.vec_id = a.neighbor_id
           |       JOIN adc d ON d.query_id = p.query_id
           |       JOIN n q ON q.vec_id = p.query_id
           |       WHERE a.neighbor_id <> p.query_id$cw)""".stripMargin
      else
        s"""ap$sfx AS (SELECT p.query_id, a.neighbor_id,
           |         ( ((${sqlDot("q.v", "c.v")}) / c.nrm) * sqrt(x.c2c)
           |           + (${pqChain("d.adc", "cv.codes")}) ) / (q.nrm * sqrt(cv.vn2)) AS approx
           |       FROM probes$sfx p JOIN asg a USING (cell)
           |       JOIN codesv cv ON cv.vec_id = a.neighbor_id
           |       JOIN adc d ON d.query_id = p.query_id
           |       JOIN n q ON q.vec_id = p.query_id
           |       JOIN cent c ON c.cell = p.cell
           |       JOIN ccn x ON x.cell = p.cell
           |       WHERE a.neighbor_id <> p.query_id$cw)""".stripMargin
    s"""probes$sfx AS (SELECT vec_id AS query_id, cell FROM (
       |          SELECT vec_id, cell,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |          FROM sc WHERE vec_id < 10) t WHERE rn <= $nProbe),
       |$ap,
       |short$sfx AS (SELECT query_id, neighbor_id FROM (
       |            SELECT query_id, neighbor_id,
       |                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx DESC, neighbor_id) AS ar
       |            FROM ap$sfx) t WHERE ar <= $rerank),
       |s2$sfx AS (SELECT sh.query_id, sh.neighbor_id,
       |         ROUND((${sqlDot("q.v", "c.v")}) / (q.nrm * c.nrm), 4) AS cos_sim
       |       FROM short$sfx sh JOIN n q ON q.vec_id = sh.query_id
       |       JOIN n c ON c.vec_id = sh.neighbor_id),
       |r$sfx AS (SELECT query_id, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS "rank"
       |      FROM s2$sfx)""".stripMargin
  }

  /** The config-INDEPENDENT index half of the PQ oracle: vectors,
    * (possibly trained) coarse centroids, assignment, (possibly
    * trained, possibly residual) codebooks, encodes, per-query ADC
    * tables — everything [[annIvfPqSearchCtes]] probes. */
  /** `withEncode = false` (q133) stops after the trained book + the
    * residual cell tables — the drift oracle encodes its OWN target
    * frame (base ∪ perturbed intake), so the corpus encode/ADC CTEs
    * would be dead weight. */
  /** `source` swaps the vector origin (default: the embeddings-table
    * [[vecCtes]]): q134 passes the text-embedding chain ending in the
    * same `n(vec_id, v, nrm)` shape — everything downstream is
    * source-agnostic. */
  private def annIvfPqIndexCtes(residual: Boolean = false,
                                trainRounds: Int = 0,
                                centRounds: Int = 0,
                                withEncode: Boolean = true,
                                source: String = vecCtes): String = {
    val (m, ks, dsub) = (8, 16, 8)
    def dot8(a: String, b: String): String = pqDot8(a, b)
    def chain(arr: String, codes: String): String = pqChain(arr, codes)
    // codebook source: raw slices of the first ks vectors, or residual
    // slices (v − assigned centroid) of the NEXT ks vectors
    val bookSrc =
      if (!residual)
        s"""bsrc AS (SELECT vec_id, s, sv FROM sv WHERE vec_id < $ks)"""
      else
        s"""bsrc AS (SELECT a.neighbor_id AS vec_id, r.s,
           |           list_transform(range(1, ${dsub + 1}),
           |             i -> q.v[r.s*$dsub + i] - c.v[r.s*$dsub + i]) AS sv
           |         FROM asg a JOIN n q ON q.vec_id = a.neighbor_id
           |         JOIN cent c ON c.cell = a.cell
           |         CROSS JOIN range(0, $m) r(s)
           |         WHERE a.neighbor_id >= 16 AND a.neighbor_id < ${16 + ks})""".stripMargin
    // residual-only constant cell tables: ccf = flat ⟨c_sub, cb⟩ dots,
    // c2c = |c|²
    val ccTables =
      if (!residual) ""
      else {
        val cslice = (1 to dsub).map(i => s"c.v[b.s*$dsub+$i]*b.cv[$i]").mkString(" + ")
        s""",
           |ccp AS (SELECT c.cell, b.s, b.code, ($cslice) AS cd
           |        FROM cent c CROSS JOIN book b),
           |cc AS (SELECT cell, list(cd ORDER BY s, code) AS ccf FROM ccp GROUP BY cell),
           |ccn AS (SELECT cc.cell, cc.ccf, (${sqlDot("c.v", "c.v")}) AS c2c
           |        FROM cc JOIN cent c USING (cell))""".stripMargin
      }
    val encp =
      if (!residual)
        s"""encp AS (SELECT t.vec_id, t.s, b.code, (b.c2 - 2*(${dot8("t.sv", "b.cv")})) AS err
           |         FROM sv t JOIN book b USING (s))""".stripMargin
      else
        s"""encp AS (SELECT t.vec_id, a.cell, t.s, b.code,
           |           (b.c2 - 2*(${dot8("t.sv", "b.cv")}) + 2*x.ccf[t.s*$ks + b.code + 1]) AS err
           |         FROM sv t JOIN asg a ON a.neighbor_id = t.vec_id
           |         JOIN ccn x ON x.cell = a.cell
           |         JOIN book b USING (s))""".stripMargin
    val codesl =
      if (!residual)
        s"""codesl AS (SELECT vec_id, list(code ORDER BY s) AS codes FROM (
           |             SELECT vec_id, s, code,
           |                    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY err, code) AS rn
           |             FROM encp) t WHERE rn = 1 GROUP BY vec_id)""".stripMargin
      else
        s"""codesl AS (SELECT vec_id, cell, list(code ORDER BY s) AS codes FROM (
           |             SELECT vec_id, cell, s, code,
           |                    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY err, code) AS rn
           |             FROM encp) t WHERE rn = 1 GROUP BY vec_id, cell)""".stripMargin
    val codesv =
      if (!residual)
        s"""codesv AS (SELECT c.vec_id, c.codes, (${chain("f.arr", "c.codes")}) AS vn2
           |           FROM codesl c CROSS JOIN c2f f)""".stripMargin
      else
        s"""codesv AS (SELECT c.vec_id, c.codes,
           |             (x.c2c + 2*(${chain("x.ccf", "c.codes")}) + (${chain("f.arr", "c.codes")})) AS vn2
           |           FROM codesl c JOIN ccn x USING (cell) CROSS JOIN c2f f)""".stripMargin
    // training source: raw sub-vectors, or the residual sub-vectors
    // (v - assigned coarse centroid, per subspace) residual-mode
    // codebooks train over — the search body's ccf trick reads the
    // FINAL book either way, so only the rounds need the variant
    val trainSrc = if (residual) "svr" else "sv"
    val svrCte =
      if (!residual || trainRounds == 0) ""
      else {
        val rsub = (1 to dsub)
          .map(i => s"q.v[t.s*$dsub + $i] - c.v[t.s*$dsub + $i]")
          .mkString("[", ", ", "]")
        s""",
           |svr AS (SELECT t.vec_id, t.s, $rsub AS sv
           |        FROM sv t JOIN asg a ON a.neighbor_id = t.vec_id
           |        JOIN cent c ON c.cell = a.cell
           |        JOIN n q ON q.vec_id = t.vec_id)""".stripMargin
      }
    val trainCtes = svrCte + (1 to trainRounds).map { r =>
      s""",
         |tenc$r AS (SELECT t.vec_id, t.s, b.code, (b.c2 - 2*(${dot8("t.sv", "b.cv")})) AS err
         |           FROM $trainSrc t JOIN book${r - 1} b USING (s)),
         |tasg$r AS (SELECT vec_id, s, code FROM (
         |             SELECT vec_id, s, code,
         |                    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY err, code) AS rn
         |             FROM tenc$r) t WHERE rn = 1),
         |tsum$r AS (SELECT a.s, a.code, r.i,
         |             SUM(CAST(FLOOR(t.sv[r.i] * 1048576.0 + 0.5) AS BIGINT)) AS fs,
         |             COUNT(*) AS c
         |           FROM tasg$r a JOIN $trainSrc t ON t.vec_id = a.vec_id AND t.s = a.s
         |           CROSS JOIN range(1, ${dsub + 1}) r(i) GROUP BY 1, 2, 3),
         |tcv$r AS (SELECT s, code, list(CAST(fs AS DOUBLE) / (1048576.0 * c) ORDER BY i) AS cv
         |          FROM tsum$r GROUP BY 1, 2),
         |bookc$r AS (SELECT b.s, b.code, COALESCE(n.cv, b.cv) AS cv
         |            FROM book${r - 1} b LEFT JOIN tcv$r n USING (s, code)),
         |book$r AS (SELECT s, code, cv, (${dot8("cv", "cv")}) AS c2 FROM bookc$r)""".stripMargin
    }.mkString
    val centCtes =
      if (centRounds == 0)
        "cent AS (SELECT vec_id AS cell, v, nrm FROM n WHERE vec_id < 16)"
      else trainedCentCtes(centRounds)
    s"""WITH $source,
       |$centCtes,
       |sc AS (SELECT x.vec_id, c.cell, (${sqlDot("x.v", "c.v")}) / c.nrm AS score
       |       FROM n x CROSS JOIN cent c),
       |asg AS (SELECT vec_id AS neighbor_id, cell FROM (
       |          SELECT vec_id, cell,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |          FROM sc) t WHERE rn = 1),
       |sv AS (SELECT vec_id, r.s, v[(r.s*$dsub+1):(r.s*$dsub+$dsub)] AS sv
       |       FROM n CROSS JOIN range(0, $m) r(s)),
       |$bookSrc,
       |book0 AS (SELECT s, CAST(ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INTEGER) AS code,
       |                sv AS cv, (${dot8("sv", "sv")}) AS c2
       |         FROM bsrc)$trainCtes,
       |book AS (SELECT s, code, cv, c2 FROM book$trainRounds),
       |c2f AS (SELECT list(c2 ORDER BY s, code) AS arr FROM book)$ccTables""".stripMargin +
      (if (!withEncode) "" else s""",
       |$encp,
       |$codesl,
       |$codesv,
       |adcp AS (SELECT t.vec_id AS query_id, t.s, b.code, (${dot8("t.sv", "b.cv")}) AS pd
       |         FROM sv t JOIN book b USING (s) WHERE t.vec_id < 10),
       |adc AS (SELECT query_id, list(pd ORDER BY s, code) AS adc FROM adcp GROUP BY query_id)""".stripMargin)
  }

  /** Force-MATERIALIZE the shared/expensive CTEs of the trained-chain
    * oracles: DuckDB inlines CTEs by default, and a multi-consumer
    * training/encode chain re-expands per consumer — the q123/q83
    * lesson, measured again on q125 (1.3 s materialized vs >240 s
    * inlined at sf0.001). r16 found the UN-materialized q102/q105
    * replays dominating the whole oracle gate (~200 s each at sf0.01,
    * 84% of the driver-gate wall — the likely cause of the driver's
    * empty correctness artifact if its harness is time-budgeted), so
    * the transformation is hoisted here and applied to EVERY oracle
    * that splices a training chain. Names cover the PQ index/search
    * chain, the Lloyd centroid rounds (kv/ksc/ka/kg/kc/kk ≤ 4), and
    * the codebook training rounds (book/tenc/tasg/tsum/tcv/bookc ≤ 4);
    * materializing a single-consumer CTE is harmless (MATERIALIZED is
    * a planner hint, never a semantics change). */
  private def materializeTrainedCtes(text: String): String = {
    val base = Seq("n", "cent", "sc", "asg", "sv", "bsrc", "c2f", "ccn",
      "encp", "codesl", "codesv", "adcp", "adc", "svr", "bfs", "bfr",
      // the SemDeDup/kmeans/pipeline chain names (q65/q101/q104/q106/
      // s15/q75 — the next tier of the r17 oracle-cost sweep): e2 =
      // salted vectors, a0/p/d/dc = assign/pairs/condemn, hits, n0 =
      // kmeans seeds, fpp/l1/surv1/edges/lab/keep2/dup_near/surv2/q =
      // the pipeline's multi-consumer stage frames (`reach` stays
      // un-materialized — it is the RECURSIVE member)
      "e2", "a0", "p", "d", "dc", "hits", "n0", "fpp", "k1", "l1",
      "surv1", "edges", "lab", "q", "keep2", "dup_near", "surv2",
      "h1", "h2", "b1", "b2", "store0", "store1", "adm1")
    val rounds = (0 to 4).flatMap(r => Seq(s"book$r", s"tenc$r", s"tasg$r",
      s"tsum$r", s"tcv$r", s"bookc$r", s"kv$r", s"ksc$r", s"ka$r",
      s"kg$r", s"kc$r", s"kk$r",
      s"a$r", s"n$r", s"sc$r", s"g$r", s"c$r", s"k$r", s"d$r"))
    (base ++ Seq("book") ++ rounds).foldLeft(text) { (t, c) =>
      t.replaceAll("(?m)^" + c + " AS \\(", c + " AS MATERIALIZED (")
    }
  }

  /** q133: the drift report replayed — the q102/q105 trained-index
    * CTEs (training only — withEncode=false), then the drift target
    * (base split ∪ id-offset reversed-vector intake), per-vector
    * quantization error |v − v̂|² = |v − c|² + Σ_s err_s through the
    * SAME assignment argmax and encode-argmin chains, and the split
    * means through the 2²⁰ fixed-point discipline (exact long sums,
    * integer-div means, integer alarm comparison). Every constant
    * spliced from the operator defaults. */
  /** The drift statement over ANY (corpus source, target frame) pair
    * — factored (r19) so the q136 rotate oracle can replay the SAME
    * report twice: once under quantizers trained on the base corpus
    * (before) and once under quantizers trained on base ∪ intake
    * (after). `source` must end defining `n(vec_id, v, nrm)` (the
    * annIvfPqIndexCtes contract); `tgtSql` must select
    * (vec_id, v, split). */
  private def annDriftStmt(source: String, tgtSql: String,
                           alarmPct: Int): String = {
    val (m, ks, dsub) = (8, 16, 8)
    val fp = 1L << 20
    val errs = (1 to m).map(i => s"l.arr[$i]").mkString(" + ")
    materializeTrainedCtes(
      s"""${annIvfPqIndexCtes(residual = true, trainRounds = 2,
            centRounds = 2, withEncode = false, source = source)},
       |tgt AS ($tgtSql),
       |dsc AS (SELECT t.vec_id, t.split, t.v, c.cell, (${sqlDot("t.v", "c.v")}) / c.nrm AS score
       |        FROM tgt t CROSS JOIN cent c),
       |da AS (SELECT vec_id, split, v, cell FROM (
       |         SELECT vec_id, split, v, cell,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |         FROM dsc) t WHERE rn = 1),
       |dvm AS (SELECT a.vec_id, a.split, a.cell,
       |          (${sqlDot("a.v", "a.v")}) - 2*(${sqlDot("a.v", "c.v")}) + (${sqlDot("c.v", "c.v")}) AS eb
       |        FROM da a JOIN cent c USING (cell)),
       |dsv AS (SELECT a.vec_id, a.cell, r.s, a.v[(r.s*$dsub+1):(r.s*$dsub+$dsub)] AS sv
       |        FROM da a CROSS JOIN range(0, $m) r(s)),
       |den AS (SELECT t.vec_id, t.s, b.code,
       |          (b.c2 - 2*(${pqDot8("t.sv", "b.cv")}) + 2*x.ccf[t.s*$ks + b.code + 1]) AS err
       |        FROM dsv t JOIN ccn x ON x.cell = t.cell JOIN book b USING (s)),
       |dme AS (SELECT vec_id, s, err FROM (
       |          SELECT vec_id, s, err,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY err, code) AS rn
       |          FROM den) t WHERE rn = 1),
       |dqe AS (SELECT v.vec_id, v.split, (v.eb + $errs) AS qerr
       |        FROM dvm v JOIN (SELECT vec_id, list(err ORDER BY s) AS arr
       |                         FROM dme GROUP BY 1) l USING (vec_id)),
       |dag AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |          CAST(SUM(GREATEST(CAST(FLOOR(qerr * $fp.0 + 0.5) AS BIGINT), 0)) AS BIGINT) AS sfp,
       |          MAX(qerr) AS mx
       |        FROM dqe GROUP BY 1),
       |dfin AS (SELECT split, n_vecs, sfp // n_vecs AS mfp, mx FROM dag),
       |dal AS (SELECT (i.mfp * 100 > b.mfp * $alarmPct) AS retrain_alarm
       |        FROM dfin i, dfin b WHERE i.split = 'intake' AND b.split = 'base')
       |SELECT f.split, f.n_vecs,
       |  FLOOR((CAST(f.mfp AS DOUBLE) / $fp.0) * 10000 + 0.5) / 10000 AS mean_qerr,
       |  FLOOR(f.mx * 10000 + 0.5) / 10000 AS max_qerr,
       |  a.retrain_alarm
       |FROM dfin f CROSS JOIN dal a ORDER BY f.split""".stripMargin)
  }

  private def annDriftOracle(alarmPct: Int): String =
    annDriftStmt(vecCtes,
      """SELECT vec_id, v, 'base' AS split FROM n WHERE vec_id % 10 <> 9
        |        UNION ALL
        |        SELECT vec_id + 900000, list_transform(v, x -> x * 3), 'intake'
        |        FROM n WHERE vec_id % 10 = 9""".stripMargin,
      alarmPct)

  /** q136: the rotate lifecycle replayed — the SAME drift report
    * statement twice ([[annDriftStmt]]), phase 'before' under
    * quantizers trained on the base corpus (the live index the
    * intake drifted away from) and phase 'after' under quantizers
    * trained on base ∪ intake (what [[Similarity.rotateAnnIndex]]
    * deterministically retrains — rotate ≡ from-scratch rebuild, so
    * the oracle trains from scratch). The intake is a TRANSLATED
    * population (x + offset per coordinate): off-distribution under
    * the frozen quantizers (alarm fires), congruent to the base once
    * cells are retrained over the union (alarm clears) — the drift
    * class rotation can actually repair, unlike q133's ×3 scale
    * whose spread survives retraining. Offset spliced from the
    * declared query's constant (the house splice rule). */
  private def annRotateOracle: String = {
    val off = RotateDriftOffset
    val ink =
      s"""ink AS (SELECT vec_id + 900000 AS vec_id,
         |          list_transform(v, x -> x + $off) AS v
         |        FROM e)""".stripMargin
    val srcBefore =
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$ink,
         |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e)""".stripMargin
    val srcAfter =
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$ink,
         |u AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM ink),
         |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM u)""".stripMargin
    val tgt =
      """SELECT vec_id, v, 'base' AS split FROM e
        |        UNION ALL
        |        SELECT vec_id, v, 'intake' AS split FROM ink""".stripMargin
    s"""SELECT * FROM (
       |SELECT 'before' AS phase, t.* FROM (
       |${annDriftStmt(srcBefore, tgt, 120)}
       |) t
       |UNION ALL
       |SELECT 'after' AS phase, t.* FROM (
       |${annDriftStmt(srcAfter, tgt, 120)}
       |) t
       |) ORDER BY phase, split""".stripMargin
  }

  /** s24: the streaming ANN ingest's two health rows replayed — the
    * q102/q105 trained-index CTEs (training only), then each intake
    * batch (ids ≡ 8, then ≡ 9 mod 10) through the SAME assignment
    * argmax and encode-argmin error chains as q133's oracle:
    * n_codes = base count + prefix batch counts (associative — a
    * running window over the batch frame), cells_touched = the
    * batch's distinct assigned cells, mean_qerr_fp = the 2²⁰
    * fixed-point integer mean (sfp // n — exact at any scale, no
    * float display discipline needed). */
  private def annIngestOracle: String = {
    val (m, ks, dsub) = (8, 16, 8)
    val fp = 1L << 20
    val errs = (1 to m).map(i => s"l.arr[$i]").mkString(" + ")
    materializeTrainedCtes(
      s"""${annIvfPqIndexCtes(residual = true, trainRounds = 2,
            centRounds = 2, withEncode = false)},
       |tgt AS (SELECT vec_id, v, CASE WHEN vec_id % 10 = 8 THEN 1 ELSE 2 END AS b
       |        FROM n WHERE vec_id % 10 IN (8, 9)),
       |dsc AS (SELECT t.vec_id, t.b, t.v, c.cell, (${sqlDot("t.v", "c.v")}) / c.nrm AS score
       |        FROM tgt t CROSS JOIN cent c),
       |da AS (SELECT vec_id, b, v, cell FROM (
       |         SELECT vec_id, b, v, cell,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |         FROM dsc) t WHERE rn = 1),
       |dvm AS (SELECT a.vec_id, a.b, a.cell,
       |          (${sqlDot("a.v", "a.v")}) - 2*(${sqlDot("a.v", "c.v")}) + (${sqlDot("c.v", "c.v")}) AS eb
       |        FROM da a JOIN cent c USING (cell)),
       |dsv AS (SELECT a.vec_id, a.cell, r.s, a.v[(r.s*$dsub+1):(r.s*$dsub+$dsub)] AS sv
       |        FROM da a CROSS JOIN range(0, $m) r(s)),
       |den AS (SELECT t.vec_id, t.s, b.code,
       |          (b.c2 - 2*(${pqDot8("t.sv", "b.cv")}) + 2*x.ccf[t.s*$ks + b.code + 1]) AS err
       |        FROM dsv t JOIN ccn x ON x.cell = t.cell JOIN book b USING (s)),
       |dme AS (SELECT vec_id, s, err FROM (
       |          SELECT vec_id, s, err,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY err, code) AS rn
       |          FROM den) t WHERE rn = 1),
       |dqe AS (SELECT v.vec_id, v.b, v.cell, (v.eb + $errs) AS qerr
       |        FROM dvm v JOIN (SELECT vec_id, list(err ORDER BY s) AS arr
       |                         FROM dme GROUP BY 1) l USING (vec_id)),
       |bag AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb,
       |          CAST(COUNT(DISTINCT cell) AS BIGINT) AS cells_touched,
       |          CAST(SUM(GREATEST(CAST(FLOOR(qerr * $fp.0 + 0.5) AS BIGINT), 0)) AS BIGINT) AS sfp
       |        FROM dqe GROUP BY 1),
       |basen AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb
       |          FROM n WHERE vec_id % 10 NOT IN (8, 9))
       |SELECT (SELECT nb FROM basen) + SUM(nb) OVER (ORDER BY b) AS n_codes,
       |       cells_touched, sfp // nb AS mean_qerr_fp
       |FROM bag ORDER BY b""".stripMargin)
  }

  /** q137: one full search chain per filter stratum over the SHARED
    * trained index CTEs, each with its candidate predicate in the ap
    * WHERE ([[annIvfPqSearchCtes]]'s candWhere — the same below-the-
    * rerank placement as the Spark plan), results stacked with the
    * stratum label. Moduli spliced from [[FilteredServeLegs]]. */
  private def annFilteredOracle: String = {
    val searches = FilteredServeLegs.zipWithIndex.map { case ((_, m), i) =>
      annIvfPqSearchCtes(s"_f$i", 8, 64, residual = true,
        candWhere = s"a.neighbor_id % $m = 0")
    }.mkString(",\n")
    val arms = FilteredServeLegs.zipWithIndex.map { case ((name, _), i) =>
      s"""SELECT '$name' AS filt, query_id, neighbor_id, cos_sim, "rank" FROM r_f$i WHERE "rank" <= 5"""
    }.mkString("\nUNION ALL\n")
    materializeTrainedCtes(
      s"""${annIvfPqIndexCtes(residual = true, trainRounds = 2,
            centRounds = 2)},
         |$searches
         |$arms
         |ORDER BY filt, query_id, "rank"""".stripMargin)
  }

  private def annIvfPqOracle(residual: Boolean = false,
                             trainRounds: Int = 0,
                             centRounds: Int = 0,
                             nProbe: Int = 4,
                             rerank: Int = 32): String = materializeTrainedCtes(
    s"""${annIvfPqIndexCtes(residual, trainRounds, centRounds)},
       |${annIvfPqSearchCtes("", nProbe, rerank, residual)}
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)

  /** q125: the serving frontier replayed — ONE shared trained index,
    * every (nProbe, rerank) config's full search chain suffixed _cN,
    * the exact brute-force top-5 as the recall baseline, and per
    * config the hit count + recall@5 (one IEEE division of counts). */
  private def annFrontierOracle(configs: Seq[(Int, Int)]): String = {
    val searches = configs.zipWithIndex.map { case ((np, rr), i) =>
      annIvfPqSearchCtes(s"_c$i", np, rr, residual = true)
    }.mkString(",\n")
    // MATERIALIZE the shared index + baseline CTEs — the hoisted
    // [[materializeTrainedCtes]] (this oracle is where the 1.3 s
    // materialized vs >240 s inlined number was first measured).
    def materialize(text: String): String = materializeTrainedCtes(text)
    val arms = configs.zipWithIndex.map { case ((np, rr), i) =>
      s"""  SELECT $np AS n_probe, $rr AS rerank,
         |    (SELECT COUNT(*) FROM bfr) AS n_exact,
         |    (SELECT COUNT(*) FROM r_c$i j
         |       JOIN bfr USING (query_id, neighbor_id)
         |       WHERE j."rank" <= 5) AS n_hit""".stripMargin
    }.mkString("\n  UNION ALL\n")
    materialize(
      s"""${annIvfPqIndexCtes(residual = true, trainRounds = 2, centRounds = 2)},
         |$searches,
         |bfs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |          ROUND((${sqlDot("a.v", "b.v")}) / (a.nrm * b.nrm), 4) AS cos_sim
         |        FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
         |bfr AS (SELECT query_id, neighbor_id FROM (
         |          SELECT query_id, neighbor_id,
         |                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
         |          FROM bfs) t WHERE rk <= 5),
         |u AS (
         |$arms)
         |SELECT n_probe, rerank, CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall5
         |FROM u ORDER BY n_probe, rerank""".stripMargin)
  }

  private def annLshOracle: String =
    s"""WITH ${lshBucketCtes()},
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, s2.vec_id AS neighbor_id
       |         FROM sb q JOIN sb s2 ON q.bk = s2.bk AND q.vec_id < 10 AND s2.vec_id <> q.vec_id),
       |n AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e),
       |s AS (SELECT c.query_id, c.neighbor_id,
       |        ROUND((${sqlDot("a.v", "b.v")}) / (a.nrm * b.nrm), 4) AS cos_sim
       |      FROM cand c JOIN n a ON c.query_id = a.vec_id JOIN n b ON c.neighbor_id = b.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS "rank"
       |      FROM s)
       |SELECT * FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin
}

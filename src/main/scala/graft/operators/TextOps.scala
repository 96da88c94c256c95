package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §2, q20 + q27–q30). All single-scan, codegen-friendly
  * expression trees over `documents` — no UDFs, no shuffles except the
  * final (tiny) aggregations. Content hashing is md5-only so DuckDB
  * oracles can replicate bit-for-bit.
  */
object TextOps {

  private def toks = split(col("text"), " ")

  /** q20: exact dedup by content hash. Hash-groupBy scales linearly;
    * at 100 TB the groupBy shuffles 16-byte digests, not documents. */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .groupBy("content_hash")
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))


  /** Normalized content fingerprint (lowercase, collapse whitespace,
    * md5) — shared by q30/q35 and the s04 streaming dedup. */
  private[graft] def fingerprintCol =
    md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary"))

  /** q30: normalized document fingerprint — lowercase, collapse
    * whitespace, md5. The cross-corpus dedup key. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), fingerprintCol.as("fingerprint"))

  /** q35: decontamination — flag candidate docs whose normalized
    * fingerprint appears in a reference corpus (the train-vs-eval
    * dedup every LLM data pipeline runs before training).
    *
    * Plan: distinct reference fingerprints (16-byte digests — eval/
    * benchmark sets are tiny next to a training corpus) broadcast into
    * a LEFT SEMI join: the 100 TB side streams through one codegen'd
    * stage, no shuffle of the training corpus at all. If the reference
    * ever outgrows broadcast, drop the hint and the same plan becomes
    * a digest-keyed shuffle join — semantics unchanged. */
  def decontaminate(candidates: DataFrame, reference: DataFrame): DataFrame = {
    val refFp = reference.select(fingerprintCol.as("fingerprint")).distinct()
    candidates
      .withColumn("fingerprint", fingerprintCol)
      .join(broadcast(refFp), Seq("fingerprint"), "left_semi")
      .select("doc_id", "fingerprint")
  }

  /** q58: decontamination at reference sizes past the broadcast
    * ceiling — [[decontaminate]]'s scale sibling. When the reference
    * set outgrows a broadcast (q35's own fallback is a shuffle join of
    * the FULL training corpus), a bloom sketch of the reference
    * fingerprints (~1.2 bytes/item at 1% fpp, OR-merge is
    * order-independent) rides into the corpus scan as a codegen'd
    * prefilter ([[graft.functions.Exprs.BloomMightContain]]): ~99% of
    * the 100 TB side dies map-side, BEFORE any exchange. Survivors —
    * true matches plus the fpp tail — then exact-verify against the
    * reference in a semi-join that now moves prefilter-output rows,
    * not the corpus. No broadcast hint on the verify: the surviving
    * side is tiny, so AQE picks broadcast when the reference fits and
    * a (small) shuffle join when it doesn't — either way the corpus
    * itself is never shuffled.
    *
    * Output is IDENTICAL to [[decontaminate]] (the bloom has no false
    * negatives, and exact verification removes its false positives) —
    * same oracle, stronger scale story. The reference-side cost is
    * three small passes (distinct count for sketch sizing, sketch
    * build, verify input); `fpp` trades sketch memory against verify
    * traffic. */
  def decontaminateBloom(candidates: DataFrame, reference: DataFrame,
                         fpp: Double = 0.01): DataFrame = {
    val refFp = reference.select(fingerprintCol.as("fingerprint")).distinct()
    val bloom = refFp.stat.bloomFilter("fingerprint",
      math.max(refFp.count(), 1L), fpp)
    candidates
      .withColumn("fingerprint", fingerprintCol)
      .filter(graft.functions.Exprs.bloomMightContain(col("fingerprint"), bloom))
      .join(refFp, Seq("fingerprint"), "left_semi")
      .select("doc_id", "fingerprint")
  }


  /** q29: token counting — whitespace tokens plus a BPE-ish split count
    * (tokens of letters vs length≥5 subword proxy). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(filter(toks, t => length(t) >= 5)).as("n_long_tokens"),
      length(col("text")).as("n_bytes"))

  /** q81: BPE subword encode — q29's "BPE-ish proxy" replaced by the
    * real greedy merge loop ([[graft.functions.Bpe]]). Emits the
    * per-doc token count, word count, and the full joined token stream
    * (`enc`), so the oracle hash-checks the exact SUBWORD IDENTITY of
    * every token, not just counts.
    *
    * Pure per-row map: one scan, no shuffle, no state. At 100 TB this
    * is embarrassingly parallel; the encoder's per-thread word memo
    * makes the cost one greedy encode per distinct word per task
    * (dictionary-encoding the vocabulary executor-locally). */
  def bpeEncode(documents: DataFrame): DataFrame =
    bpeSelect(documents, graft.functions.Bpe.defaultMerges)

  /** Shared q81/q84 output contract (doc_id, n_tokens, n_words, enc)
    * — one place, so the two surfaces cannot drift. */
  private def bpeSelect(documents: DataFrame,
                        merges: Seq[(String, String)]): DataFrame = {
    val bpe = graft.functions.Bpe.encode(col("text"), merges)
    documents.select(
      col("doc_id"),
      size(bpe).cast("long").as("n_tokens"),
      size(filter(toks, t => t =!= "")).cast("long").as("n_words"),
      array_join(bpe, " ").as("enc"))
  }

  /** q84: the two tokenizer halves MEETING — train the merge table on
    * the corpus ([[graft.functions.Bpe.trainedMerges]], q83's loop),
    * then encode the same corpus with it. This is the production
    * calling convention (a tokenizer fit to its data), oracle-checked
    * end-to-end: the DuckDB side replays the full training chain AND
    * the greedy encode under the learned table, so the exact subword
    * identity of every token under a DATA-DEPENDENT merge table is
    * hash-verified.
    *
    * Cost = q83 (one corpus scan + vocab-frame rounds) + q81's pure
    * per-row encode pass; the learned table is KB driver state riding
    * into the expression like any literal. */
  def bpeEncodeTrained(documents: DataFrame,
      nMerges: Int = graft.functions.Bpe.defaultTrainRounds): DataFrame =
    bpeSelect(documents,
      graft.functions.Bpe.trainedMerges(documents, nMerges)
        .map { case (l, r, _) => (l, r) })

  /** q86: boundary-preserving (marked) BPE encode + LOSSLESS
    * detokenization — the Sennrich `</w>` end-of-word convention q81's
    * flat stream deliberately omits. Every serving/inspection path of
    * a training pipeline needs the inverse direction (show the human
    * the text a token window covers; splice generated tokens back into
    * text); an unmarked stream only round-trips the concatenated
    * characters, the marked stream round-trips the words.
    *
    * The declared query encodes MARKED and emits the decoded text, and
    * the oracle's `decoded` column is the space-normalized original
    * (the corpus contract every text operator applies: split on
    * single spaces, empty words dropped) — so the hash check IS the
    * corpus-wide losslessness proof, with `n_tokens` pinned to the
    * unmarked count (post-encode marking cannot change segmentation).
    *
    * Same scale shape as q81: pure per-row map, one scan, zero
    * shuffle; decode is built-in string functions (codegen'd). */
  def bpeRoundtrip(documents: DataFrame): DataFrame = {
    val bpe = graft.functions.Bpe.encodeMarked(col("text"))
    documents.select(
      col("doc_id"),
      size(bpe).cast("long").as("n_tokens"),
      graft.functions.Bpe.decode(bpe).as("decoded"))
  }

  /** q88: corpus TOKEN ACCOUNTING — total BPE tokens, docs, and token
    * share per (source, lang): the first question asked of any
    * training corpus ("how many tokens do we have, and where from?")
    * and the denominator every mixture plan (q59) and packing budget
    * (q40/q82) divides by. Token measure = the real tokenizer (q81's
    * `graft_bpe`), not the q29 whitespace proxy.
    *
    * Shape: one scan (encode is a per-row map riding in the scan's
    * projection) → ONE (source, lang)-keyed partial agg — only
    * group-cardinality rows shuffle, never documents; the corpus-total
    * denominator is a global window over the GROUPED frame (q78's
    * convention — group-cardinality rows, not a re-scan). Shares via
    * `Exact.dround`. */
  def tokenBudget(documents: DataFrame): DataFrame = {
    val nt = size(graft.functions.Bpe.encode(col("text"))).cast("long")
    documents
      .select(col("source"), col("lang"), nt.as("nt"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"))
      .withColumn("token_share", graft.Exact.dround(
        col("tokens") / sum(col("tokens")).over(Window.partitionBy())))
      .select("source", "lang", "n_docs", "tokens", "token_share")
  }

  /** q108: TOKENIZER FERTILITY report — subword tokens per whitespace
    * word (`fertility`) and characters per subword token
    * (`chars_per_token`) per (source, lang): the standard tokenizer-
    * health metrics a multilingual data pipeline tracks (fertility ≫ 1
    * on a language means the tokenizer fragments it — that language
    * pays more sequence budget per word and trains worse; compression
    * in chars/token is the capacity the corpus actually buys). Public
    * literature: fertility is the canonical cross-lingual tokenizer
    * metric (ACL tokenizer-evaluation line of work); every BPE
    * retraining decision starts from this table.
    *
    * One corpus scan: the q81 native BPE encode and the whitespace
    * word count are both per-row expressions, then ONE
    * (source, lang)-keyed partial agg — group-cardinality output.
    * Ratios via `Exact.dround` (small-denominator rationals — the
    * cross-engine round() trap). `chars` sums the table's `n_chars`
    * column (data, not derived — the reference's file-size column
    * convention). */
  def tokenizerFertility(documents: DataFrame): DataFrame = {
    val ws = size(filter(toks, t => t =!= "")).cast("long")
    val bpe = size(graft.functions.Bpe.encode(col("text"))).cast("long")
    documents
      .select(col("source"), col("lang"), ws.as("ws"), bpe.as("nt"),
        col("n_chars"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("ws").as("words"),
        sum("nt").as("tokens"), sum("n_chars").as("chars"))
      .withColumn("fertility",
        graft.Exact.dround(col("tokens") / col("words")))
      .withColumn("chars_per_token",
        graft.Exact.dround(col("chars") / col("tokens")))
      .select("source", "lang", "n_docs", "words", "tokens", "chars",
        "fertility", "chars_per_token")
  }

  /** q109: CERTIFIED heavy hitters — the corpus's top-k tokens with an
    * in-plan certification of the Misra–Gries mergeable sketch
    * ([[graft.functions.Sketch.MisraGriesAgg]]), the q51/q73 pattern
    * applied to FREQUENCY: the exact top-k is the certification
    * baseline, the sketch is the declared 100 TB path (no token-keyed
    * shuffle — per-partition summaries merge associatively at a single
    * reduce, `counters` entries each, while the exact side shuffles
    * every distinct token).
    *
    * Certified per top token (deterministically TRUE by the MG
    * theorems, independent of partition count and merge order — which
    * is what makes a partition-order-dependent sketch hash-checkable):
    * if `cnt·c > N` the token MUST be in the summary with
    * `est ≤ cnt` and `(cnt − est)·c ≤ N`; below that frequency the
    * sketch makes no promise and the verdict is vacuously true. A
    * violated bound emits `false` and fails the oracle compare — the
    * fail-loud shape, not an assert.
    *
    * Scale: the exact baseline costs one (token)-keyed shuffle — the
    * certification cost, exactly like q73's Expand. Production at
    * 100 TB drops the exact side and keeps the sketch agg: one scan,
    * map-side summaries, KB-scale merge. */
  /** The ONE tokenization both q109 halves share: the sketch's token
    * multiset and the certification baseline's must be the same
    * multiset or the MG bounds stop being provable — a single helper
    * makes drift impossible (round-14 review). */
  private def hhTokRows(documents: DataFrame): DataFrame =
    documents.select(explode(toks).as("tok")).filter(col("tok") =!= "")

  def heavyHittersCertified(documents: DataFrame, k: Int = 20,
                            counters: Int = 64): DataFrame = {
    val sk = hhTokRows(documents).agg(
      graft.functions.Sketch.misraGries(col("tok"), counters).as("mg"),
      count(lit(1)).as("n"))
    heavyHittersCertify(sk, documents, k, counters)
  }

  /** The certification half of [[heavyHittersCertified]], factored so
    * a summary built ELSEWHERE — s16's streaming-stateful-agg sketch,
    * a summary merged across shards — certifies through the identical
    * verdict expression: exact top-`k` from `documents` (the
    * certification baseline), MG bounds checked against the supplied
    * `(mg, n)` single-row frame. The verdicts are TRUE for any summary
    * produced by a legal MG update/merge tree over the same token
    * multiset — which is exactly why s16 can share q109's oracle. */
  def heavyHittersCertify(sketch: DataFrame, documents: DataFrame,
                          k: Int = 20, counters: Int = 64): DataFrame = {
    val topk = hhTokRows(documents).groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
    val est = element_at(col("mg"), col("tok"))
    topk.crossJoin(broadcast(sketch))
      .select(col("tok"), col("cnt"), col("n"),
        ((col("cnt") * counters <= col("n")) ||
          (est.isNotNull && est <= col("cnt") &&
            (col("cnt") - est) * counters <= col("n"))).as("certified"))
  }

  /** q89: MODEL-based quality filter — the linear bag-of-words
    * document scorer every published data recipe ships between the
    * heuristic rules (q67) and the expensive passes: a fastText /
    * logistic-regression-shaped classifier (CCNet's LM filter, DCLM's
    * fastText filter — public literature) reduced to its serving
    * form: each token looks its weight up in a MODEL TABLE, the doc's
    * score is the weight sum normalized by length, keep = raw sum
    * >= 0 (integer compare — no float threshold to diverge).
    *
    * The model ships as a `(tok, wgt)` frame. Production passes
    * LEARNED weights via `weights`; the default is a deterministic
    * stand-in the oracle replays — the top-`vocabSize` corpus
    * vocabulary (q54's top-V machinery, ties (cnt desc, tok)) with
    * integer weights derived from md5(tok) in [-7, 7] — so the
    * serving machinery is exercised and hash-checked end to end
    * without pretending to train a classifier in-plan (models are
    * ARTIFACTS, like q83's merge table and q65's centroids).
    *
    * Scale shape (q54's): the model table is tiny and BROADCAST; the
    * corpus explodes to token rows but is never shuffled by token —
    * the weight lookup is map-side, and the per-doc sum collapses
    * map-side (a doc's tokens stay in its partition). One corpus
    * scan, one doc-keyed partial agg; OOV tokens weigh 0. */
  def modelFilter(documents: DataFrame, vocabSize: Int = 512,
                  weights: Option[DataFrame] = None): DataFrame = {
    val wt = weights.getOrElse {
      tokenCountFrame(documents)
        .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
        .select(col("tok"),
          ((conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10)
            .cast("int") % 15) - 7).cast("long").as("wgt"))
    }
    require(wt.columns.toSet == Set("tok", "wgt"),
      s"weights must be a (tok, wgt) frame, got ${wt.columns.mkString(", ")}")
    // fail-loud on duplicate model keys: a doubled tok would fan out
    // the lookup join and silently corrupt n_tokens AND raw_score.
    // Eager check, q24's guard rationale — the model frame is KB-scale
    // by contract (it broadcasts), so one tiny agg is free. Gated on
    // CALLER-supplied frames: the default vocabulary is a groupBy
    // output (unique by construction), and checking it would bolt an
    // extra eager corpus pass onto every default-path call.
    if (weights.isDefined) {
      val dup = wt.groupBy("tok").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"weights frame has duplicate tok '${dup.headOption.map(_.getString(0)).getOrElse("")}'" +
          " — a doubled key would fan out the lookup join; dedupe the model")
    }
    documents.select(col("doc_id"), explode(toks).as("tok"))
      .join(broadcast(wt), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wgt"), lit(0L))).as("raw_score"))
      .select(col("doc_id"), col("n_tokens"), col("raw_score"),
        (col("raw_score") / col("n_tokens")).as("score"),
        (col("raw_score") >= 0).as("keep"))
  }


  /** q95's default LABELS: the q28 quality heuristic thresholded —
    * the standard bootstrap every published data recipe uses when no
    * human labels exist (CCNet seeds its LM filter on heuristic
    * splits; DCLM distills a fastText model from rule-based labels):
    * the cheap rules label, the model generalizes. `quality` is the
    * dround'd score (bit-identical in both engines), so the threshold
    * compare — and therefore the whole training set — replays
    * exactly in SQL. */
  def labelByQuality(documents: DataFrame,
                     threshold: Double = 0.65): DataFrame = {
    val (_, _, _, quality) = qualityMetrics
    documents.select(col("doc_id"), col("text"),
      (graft.Exact.dround(quality) >= threshold).as("label"))
  }

  /** q95: TRAIN the q89 model — the round-12 verdict's missing half
    * ("the model filter serves broadcast weights but nothing learns
    * them"). A one-pass class-rate SIGN classifier, the integer
    * reduction of multinomial Naive Bayes: over the top-`vocabSize`
    * vocabulary, token t votes +1 if its occurrence rate among
    * POSITIVE-labeled docs exceeds its rate among negatives
    * (pos(t)/pos_tot > neg(t)/neg_tot), −1 if lower, 0 on an exact
    * tie — i.e. the SIGN of the NB log-odds without the logs (ln is
    * not bit-stable across engines, q44's idf note; the sign of the
    * rate difference is, as an INTEGER cross-product compare). The
    * cross-products are compared in decimal(38) (DuckDB replays in
    * HUGEINT), so the compare stays exact to ~10¹⁹-occurrence
    * corpora — no overflow cliff at 100 TB.
    *
    * Deterministic and partial-agg friendly by construction: labels
    * ride the SAME scan as the token explode (the quality metrics are
    * per-row array expressions — no second corpus pass, no diamond),
    * training is ONE token-keyed partial agg over the broadcast-vocab
    * semi-join, and the totals window runs over the vocab-sized
    * frame (KBs). Output is exactly [[modelFilter]]'s `(tok, wgt)`
    * serving contract. Like q83's merge table and q65's centroids,
    * the model is an ARTIFACT: persist with [[writeModel]], serve
    * from [[readModel]]. */
  def trainModel(documents: DataFrame, vocabSize: Int = 512,
                 labels: Option[DataFrame] = None): DataFrame = {
    val lab = labels.getOrElse(labelByQuality(documents))
    require(Set("doc_id", "label").subsetOf(lab.columns.toSet),
      s"labels must carry (doc_id, label), got ${lab.columns.mkString(", ")}")
    val labeled =
      if (lab.columns.contains("text")) lab // default path: one scan
      else documents.select(col("doc_id"), col("text"))
        .join(lab.select("doc_id", "label"), Seq("doc_id"))
    // ONE token-keyed partial agg computes the per-class counts for
    // EVERY distinct token; the top-V vocabulary falls out of the same
    // frame via TakeOrdered on (pos+neg) — identical to q89's
    // (cnt desc, tok) vocabulary because pos+neg IS the token's total
    // count. This replaced a separate tokenCountFrame pass + broadcast
    // semi-join (round-13 rework): same weights, one fewer corpus
    // scan+explode, and TakeOrdered (per-partition top-V, then merge)
    // keeps the cut scalable where a global rank window would
    // single-task the distinct-token frame.
    val cls = labeled
      .select(col("label"), explode(toks).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("label"), 0L).otherwise(1L)).as("neg"))
      .orderBy((col("pos") + col("neg")).desc, col("tok")).limit(vocabSize)
    val w = Window.partitionBy() // vocab-sized frame: single partition is the point
    val l = col("pos").cast("decimal(19,0)") * col("neg_tot").cast("decimal(19,0)")
    val r = col("neg").cast("decimal(19,0)") * col("pos_tot").cast("decimal(19,0)")
    // the training cut travels WITH the model as column metadata
    // (round-13 advice): writeModel validates its stamp against it,
    // so trainModel(vocabSize=16) → writeModel(default 512) dies at
    // write instead of persisting a geometry lie
    val vocabMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(VocabMetaKey, vocabSize.toLong).build()
    cls
      .withColumn("pos_tot", sum("pos").over(w))
      .withColumn("neg_tot", sum("neg").over(w))
      .select(col("tok"),
        when(l > r, 1L).when(l < r, -1L).otherwise(0L).as("wgt", vocabMeta))
  }

  /** Column-metadata key carrying [[trainModel]]'s vocabulary cut on
    * the `wgt` column — the model's own record of how it was
    * trained. */
  private val VocabMetaKey = "graft.vocab_size"

  /** q95 declared query: train-then-filter END TO END — the q83
    * (BPE train+apply) convention for the model filter: learn the
    * sign-vote weights from the heuristic labels, then serve them
    * through q89's machinery verbatim. Output shape = q89's. */
  def trainThenFilter(documents: DataFrame, vocabSize: Int = 512): DataFrame =
    modelFilter(documents,
      weights = Some(trainModel(documents, vocabSize)))

  /** Persist a trained model ([[trainModel]]'s output) — the
    * Bpe.writeMerges artifact discipline: schema-checked at write,
    * `_p_vocab` geometry stamp carried per row, fail-loud validation
    * at [[readModel]]. */
  def writeModel(model: DataFrame, path: String, vocabSize: Int = 512): Unit = {
    require(model.columns.toSet == Set("tok", "wgt"),
      s"writeModel expects trainModel's (tok, wgt) schema, got " +
        s"${model.columns.mkString(", ")}")
    // the model knows its own training cut (trainModel's column
    // metadata) — a caller-supplied stamp that disagrees with how the
    // model was ACTUALLY trained would persist a geometry lie that
    // readModel then happily accepts (round-13 advice); die here
    val meta = model.schema("wgt").metadata
    if (meta.contains(VocabMetaKey)) {
      val trained = meta.getLong(VocabMetaKey)
      require(trained == vocabSize,
        s"writeModel: stamp vocabSize=$vocabSize disagrees with the " +
          s"model's own training cut $trained (trainModel's metadata) — " +
          "pass the same vocabSize the model was trained with")
    }
    model.withColumn("_p_vocab", lit(vocabSize))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted model back into [[modelFilter]]'s `weights:`
    * shape. Fail-loud at read (Bpe.readMerges' convention): empty,
    * duplicate-tok (would fan out the serving join), over-vocab or
    * stamp-drifted artifacts die here with the path in the message. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
                path: String, vocabSize: Int = 512): DataFrame = {
    val df = spark.read.parquet(path).select("tok", "wgt", "_p_vocab")
    val rows = df.collect()
    require(rows.nonEmpty, s"model at $path is empty")
    require(rows.forall(_.getInt(2) == vocabSize),
      s"model at $path was trained with vocabSize " +
        s"${rows.map(_.getInt(2)).distinct.mkString(",")}, caller expects $vocabSize")
    require(rows.length <= vocabSize,
      s"model at $path carries ${rows.length} rows > vocab stamp $vocabSize")
    val toks2 = rows.map(_.getString(0))
    require(toks2.distinct.length == toks2.length,
      s"model at $path has duplicate tok entries — the serving join would fan out")
    df.select("tok", "wgt")
  }

  /** q92: deterministic TEXT EMBEDDINGS — the feature-hashing ±1
    * random projection ([[graft.functions.Exprs.TokenSigns]]) over
    * the whitespace tokens: every document gets a `dim`-dimensional
    * integer bag-of-words embedding in ONE per-row pass (zero
    * shuffle). This closes the gap between the text corpus and the
    * semantic family: q24/q26/q46/q57/q63's machinery ran on the
    * synthetic `embeddings` table; [[embedFrame]] hands them REAL
    * text-derived vectors (verbatim duplicate texts embed
    * identically → cosine 1 → flagged by SemDeDup, spec-pinned), the
    * standard hashing-trick serving path when no learned encoder is
    * deployable in-cluster.
    *
    * Integer embeddings are the point: no float summation order to
    * diverge, so the full embedding IDENTITY is oracle-hash-checked
    * (the declared query emits the joined vector + its exact integer
    * norm²). */
  def textEmbed(documents: DataFrame, dim: Int = 64): DataFrame = {
    val emb = graft.functions.Exprs.tokenSigns(toks, dim)
    documents.select(col("doc_id"),
      array_join(emb, " ").as("emb"),
      aggregate(emb, lit(0L), (a, x) => a + x * x).as("nrm2"))
  }

  /** q92's embeddings in the `(vec_id, embedding array<double>)` shape
    * the Similarity family consumes — the composition bridge
    * (SemDeDup / ANN over raw TEXT). */
  def embedFrame(documents: DataFrame, dim: Int = 64): DataFrame =
    documents.select(col("doc_id").as("vec_id"),
      graft.functions.Exprs.tokenSigns(toks, dim).cast("array<double>").as("embedding"))

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** q28: quality scoring — uniq-token ratio, stopword ratio, length
    * saturation, combined score. Pure expression tree, one scan. */
  /** (uniq_ratio, stop_ratio, len_saturation, quality) raw expressions —
    * shared by [[qualityScore]] and [[qualityPrune]]. */
  private def qualityMetrics: (Column, Column, Column, Column) = {
    val nTok  = size(toks).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks, t =>
      t.isin(stopwords.map(s => s: Any): _*))).cast("double")
    val uniqRatio = nUniq / nTok
    val stopRatio = nStop / nTok
    val lenSat    = least(col("n_chars") / lit(500.0), lit(1.0))
    (uniqRatio, stopRatio, lenSat,
      uniqRatio * 0.4 + (lit(1.0) - stopRatio) * 0.3 + lenSat * 0.3)
  }

  def qualityScore(documents: DataFrame): DataFrame = {
    val (uniqRatio, stopRatio, lenSat, quality) = qualityMetrics
    // dround, not round: these are small-denominator rationals that land
    // exactly on 4-dp half-boundaries (e.g. quality = 0.69705), where
    // Spark round() and DuckDB ROUND() disagree — see Exact.dround.
    documents.select(
      col("doc_id"),
      graft.Exact.dround(uniqRatio).as("uniq_ratio"),
      graft.Exact.dround(stopRatio).as("stop_ratio"),
      graft.Exact.dround(lenSat).as("len_saturation"),
      graft.Exact.dround(quality).as("quality"))
  }

  /** q61: per-stratum quality pruning — drop the worst `frac` of each
    * language's documents by the q28 quality score (the filtering
    * step every published data recipe runs between scoring and corpus
    * assembly; per-LANGUAGE cutoffs because absolute scores aren't
    * comparable across languages — a global cut would empty the
    * low-resource strata first).
    *
    * Exact form (the oracle-checked default): rank within the stratum
    * by (quality, doc_id) and drop ranks ≤ floor(frac·n) — one window
    * over the language partition, deterministic to the last tie. Like
    * q40's running sum, the per-stratum sort serializes each language
    * through a range-sort at 100 TB; `approx = true` is the scale
    * path: per-language `approx_percentile` thresholds (mergeable
    * sketches, one tiny groupBy) broadcast back onto the scan — no
    * window, no sort, one linear pass, cutoff within the sketch's
    * rank-error of exact (same tested-flag contract as q49's approx
    * profile and q09→q51). */
  def qualityPrune(documents: DataFrame, frac: Double = 0.2,
                   approx: Boolean = false): DataFrame = {
    require(frac >= 0 && frac < 1, "frac must be in [0, 1)")
    val quality = graft.Exact.dround(qualityMetrics._4)
    val scored = documents.select(col("doc_id"), col("lang"),
      quality.as("quality"))
    if (!approx) {
      val w = Window.partitionBy("lang")
      scored
        .withColumn("rn", row_number().over(w.orderBy(col("quality"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") > floor(lit(frac) * col("n")))
        .select("doc_id", "lang", "quality")
    } else {
      val thr = scored.groupBy("lang")
        .agg(percentile_approx(col("quality"), lit(frac), lit(10000)).as("thr"))
      scored.join(broadcast(thr), Seq("lang"))
        .filter(col("quality") >= col("thr"))
        .select("doc_id", "lang", "quality")
    }
  }

  /** The corpus wordcount frame `(tok, cnt)` behind q54's top-V
    * membership vocabulary: explode → map-side partial agg. q68's
    * coverage curve needs the grand total too and therefore runs the
    * SAME `toks` tokenization through a rollup instead (one scan for
    * counts + total) — the shared tokenizer column is what keeps the
    * two "top-V" definitions aligned; tie ORDER stays at each call
    * site (both use (cnt desc, tok)). */
  private def tokenCountFrame(documents: DataFrame,
                              tokens: Column = toks): DataFrame =
    documents.select(explode(tokens).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** q68: vocabulary coverage curve — the tokenizer-fit planning
    * statistic: the top-V corpus tokens by frequency with each rank's
    * CUMULATIVE coverage of all token occurrences. Answers "how large
    * a vocabulary covers 95% of this corpus" before committing to a
    * tokenizer budget, and pairs with q54 (which measures OOV against
    * a chosen top-V after the fact).
    *
    * Plan: explode → wordcount (map-side partial agg, q54's shape) →
    * top-V via global TakeOrdered (V rows move, not the vocabulary) →
    * rank + running sum windows over the V-row result (bounded by
    * `topV`, so the single-partition window is fine — the q44 caveat
    * applies to raw-vocabulary windows, not to a capped top-k) → one
    * division by the total occurrence count (computed on the
    * vocabulary-sized count frame, broadcast as a scalar). Counts are
    * integers, coverage is ONE IEEE division — bit-identical, no
    * rounding step. Ties order by (count desc, token) in both
    * engines. */
  def vocabCoverage(documents: DataFrame, topV: Int = 100,
                    tokens: Column = split(col("text"), " ")): DataFrame = {
    // ONE corpus scan: rollup emits per-token counts AND the grand
    // total (the null-token row — split() never yields null tokens)
    // in one shuffle. The plan stays a LINEAR chain: total ≥ every
    // count, so the total row survives the top-(V+1) TakeOrdered cut
    // (nulls-first tie-break covers the one-token corpus) and is
    // extracted by a window over the capped frame — a diamond
    // (filter counts / filter total, join back) would re-run the
    // whole scan+shuffle per branch: exchange reuse measurably does
    // NOT fire for it, even under AQE.
    val agg = documents.select(explode(tokens).as("token"))
      .rollup("token").agg(count(lit(1)).as("n_occurrences"))
    val top1 = agg
      .orderBy(col("n_occurrences").desc, col("token").asc_nulls_first)
      .limit(topV + 1)
    val everything = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ord = Window.orderBy(col("n_occurrences").desc, col("token"))
    top1
      .withColumn("total",
        max(when(col("token").isNull, col("n_occurrences"))).over(everything))
      .filter(col("token").isNotNull)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("n_occurrences"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("token"), col("n_occurrences"),
        (col("cum").cast("double") / col("total").cast("double"))
          .as("cum_coverage"))
  }

  /** The Gopher stopword list (Rae et al. 2021, arXiv:2112.11446 —
    * public paper): a document lacking ≥2 of these is likely not
    * running English prose. Distinct from q28's density stopwords. */
  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** q67: the published heuristic quality-filter bundle — C4's
    * document rules (Raffel et al. 2020, arXiv:1910.10683: "lorem
    * ipsum", curly braces) composed with Gopher's repetition-free
    * document filters (Rae et al. 2021: word-count band,
    * mean-word-length band, symbol-to-word ratio, alphabetic-word
    * fraction, stopword floor). The workhorse pre-filter every
    * training-data pipeline runs before the expensive dedup passes.
    *
    * One codegen'd scan, zero shuffle; every metric is integer-derived
    * with at most ONE IEEE division (bit-identical across engines, no
    * rounding step — q41's contract). The verdict is auditable:
    * `pass` plus `first_fail` naming the first rule broken in the
    * documented order — production pipelines log drop REASONS, so the
    * filter can be tuned per-rule from its own output. Rule order:
    * word_count → mean_word_len → symbol_ratio → alpha_frac →
    * stopwords → lorem_ipsum → braces. Mean word length uses the
    * corpus's single-space tokenization contract (q29's): chars in
    * words = len(text) − (n−1) separators. */
  def heuristicFilter(documents: DataFrame,
                      minWords: Int = 50, maxWords: Int = 100000,
                      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                      maxSymbolRatio: Double = 0.1,
                      minAlphaFrac: Double = 0.8,
                      minStopwords: Int = 2): DataFrame = {
    val nWords = size(toks)
    val meanLen = (length(col("text")) - (nWords - lit(1))).cast("double") /
      nWords.cast("double")
    val symbols = regexp_count(col("text"), lit("#")) +
      regexp_count(col("text"), lit("\\.\\.\\."))
    val symbolRatio = symbols.cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      nWords.cast("double")
    val nStop = gopherStopwords.map(sw =>
      array_contains(toks, sw).cast("int")).reduce(_ + _)
    val firstFail =
      when(nWords < minWords || nWords > maxWords, "word_count")
        .when(meanLen < minMeanLen || meanLen > maxMeanLen, "mean_word_len")
        .when(symbolRatio > maxSymbolRatio, "symbol_ratio")
        .when(alphaFrac < minAlphaFrac, "alpha_frac")
        .when(nStop < minStopwords, "stopwords")
        .when(lower(col("text")).contains("lorem ipsum"), "lorem_ipsum")
        .when(col("text").contains("{"), "braces")
    documents.select(col("doc_id"),
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_frac"),
      nStop.as("n_stopwords"),
      firstFail.isNull.cast("int").as("pass"),
      firstFail.as("first_fail"))
  }

  /** q62: winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003,
    * SIGMOD — the public local-fingerprinting algorithm): hash every
    * POSITIONAL k-gram (duplicates kept, unlike q21's distinct shingle
    * sets), slide a window of `w` consecutive hashes, keep each
    * window's minimum, emit the distinct selected hashes. Density is
    * ~2/(w+1) of the k-gram count, and any substring match of length
    * ≥ w+k−1 tokens is GUARANTEED to share a fingerprint — the local
    * complement of q30's whole-doc hash (verbatim-block detection,
    * clone localization) at a fraction of q21's full-index cost.
    *
    * Zero shuffle: the k-gram hash sequence, the windowed minima, and
    * the distinct-set all live inside one per-row expression tree; the
    * only row-multiplier is the final explode. Selection is by
    * lexicographic min of md5 hex — engine-identical ordering, and
    * since the fingerprint SET discards positions, min-tie handedness
    * (the paper's rightmost rule) cannot affect the output. Documents
    * shorter than k tokens produce no k-grams and hence no rows;
    * shorter than w windows, one window over what exists.
    *
    * The per-document kernel is the native one-pass
    * [[graft.functions.Exprs.WinnowFingerprints]] expression (k-gram
    * md5s + monotonic-deque sliding min, O(tokens)); the equivalent
    * `functions._` form — per-window `array_min(slice(...))` HOF — is
    * an interpreted O(tokens·w) allocation pass, measured 24× slower
    * on the 10× probe (39 s vs 1.6 s; see the expression's scaladoc
    * for the two buried constant-factor costs that dwarfed even the
    * algorithmic difference). */
  def winnowFingerprints(documents: DataFrame, k: Int = 3,
                         w: Int = 4): DataFrame =
    documents.select(col("doc_id"),
      explode(graft.functions.Exprs.winnow(toks, k, w)).as("fp"))

  /** q41: repetition signals (the Gopher-style "repetitive document"
    * quality filters): fraction of tokens accounted for by the single
    * most frequent token, same for word 2-grams, and the fraction of
    * 2-gram slots occupied by a repeated 2-gram. High values flag
    * boilerplate / keyword-stuffed / looping documents that poison
    * training corpora.
    *
    * All counts are integers and each ratio is ONE IEEE division, so
    * the doubles are bit-identical across engines with no rounding
    * step. The per-document kernel is the native one-pass
    * [[graft.functions.Exprs.RepetitionStats]] expression (two hash-map
    * passes, O(len)) — the equivalent `functions._` mode search is an
    * interpreted O(distinct·len) higher-order tree that benched 9×
    * slower (see the expression's scaladoc). Single scan, no shuffle:
    * the per-doc arrays never leave their partition.
    */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    val st = graft.functions.Exprs.repetitionStats(toks)
    documents.select(
      col("doc_id"),
      st.getField("top_tok_frac").as("top_tok_frac"),
      st.getField("top_2gram_frac").as("top_2gram_frac"),
      st.getField("dup_2gram_frac").as("dup_2gram_frac"))
  }

  /** q44: per-language top-k distinctive terms — the corpus-statistics
    * report every dataset card carries. `tf` = term count within the
    * language, `df` = number of languages containing the term, score =
    * tf/df (a TF-IDF with the idf log dropped: ln() is not bit-stable
    * across engines, a rational of two integer counts is — same
    * ordering for fixed |langs|).
    *
    * Two shapes, picked by one cheap corpus count (the AutoGeometry
    * convention). BELOW `pruneMinDocs`: the classic single-job plan —
    * explode→wordcount (map-side partial agg, one shuffle keyed by
    * (lang, term)), df via a term-partitioned window over the
    * aggregated tf frame (≤ |langs| rows per key, high cardinality, no
    * skew), then the sharded top-k. AT-OR-ABOVE `pruneMinDocs` (the
    * 100 TB path, round-10 verdict: the full-vocabulary df window was
    * the one unbounded vocab shuffle left in the library): the tf
    * frame is materialized once (localCheckpoint — q75's
    * diamond-cutting idiom), then an EXACT candidate prune runs before
    * anything touches the vocabulary keyed by term:
    *
    *   df ≤ |langs|, so score = tf/df ≥ tf/|langs|. The per-language
    *   kth-largest tf (`tf_k`) gives ≥ k terms scoring ≥ tf_k/|langs|,
    *   so the language's true kth-best score is ≥ tf_k/|langs| — and
    *   any term with tf < tf_k/|langs| has score ≤ tf < that bound and
    *   can never rank. Pruning to tf ≥ tf_k/|langs| is therefore
    *   EXACT, and on a Zipfian vocabulary it drops the hapax tail —
    *   the overwhelming majority of terms.
    *
    * df is then computed only for candidate terms: the checkpointed tf
    * frame is semi-joined against the broadcast candidate set (the
    * vocabulary is scanned but never SHUFFLED by term), grouped by
    * term, and broadcast-joined back. Everything keyed by term is
    * bounded by `candidateCap`; a corpus whose candidate set exceeds
    * the cap (near-uniform tf — no Zipf tail to prune) falls back to
    * the term-partitioned window over the full tf frame, which stays
    * correct at any size (≤ |langs| rows per key, high cardinality, no
    * skew) at the price of the vocabulary shuffle. tf_k itself is
    * computed with the same two-stage shard ranking as the final
    * top-k, so no per-language vocabulary funnel there either.
    *
    * The size switch is measured, not guessed: at sf0.1 AND at the 10x
    * probe the pruned path ran 2-3.5x the classic shape (fixed
    * checkpoint/threshold/action costs against a ~100k-row vocabulary
    * shuffle that costs nothing), so defaulting it on everywhere would
    * have been a bench-visible regression bought for no local benefit.
    * TextStatsSpec pins row-identity between the two shapes.
    *
    * The per-language top-k runs in TWO stages so the vocabulary never
    * funnels through |langs| reducers: stage 1 ranks within
    * (lang, shard) — shard = pmod(xxhash64(term), shards), so
    * ~vocab/shards rows per reducer — and keeps each shard's top k;
    * stage 2 ranks the ≤ k·shards survivors per language. Any
    * language-level top-k term ranks ≤ k inside its own shard (a
    * shard is a subset of the language), so the two-stage result is
    * exactly the single-window result. */
  def tfidfTopTerms(documents: DataFrame, k: Int = 10,
                    rankShards: Int = 32,
                    candidateCap: Long = 1000000L,
                    pruneMinDocs: Long = 10000000L): DataFrame = {
    // one cheap count picks the shape (the AutoGeometry convention):
    // below pruneMinDocs the vocabulary is modest and the classic
    // single-job window shape wins outright — the pruned path's fixed
    // costs (checkpoint materialization, threshold stages, extra
    // actions) measured 2-3.5x the classic shape at sf0.1 AND at the
    // 10x probe, because a ~100k-row vocabulary shuffle is trivia.
    // Past pruneMinDocs the asymptotics flip: the pruned path replaces
    // two full-vocabulary shuffles with one plus candidate-bounded
    // stages, and the fixed overhead is noise.
    if (documents.count() < pruneMinDocs) {
      val tf = documents
        .select(col("lang"), explode(toks).as("term"))
        .groupBy("lang", "term")
        .agg(count(lit(1)).as("tf"))
      val scored = tf
        .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      return rankTopK(scored, k, rankShards)
    }
    val tf = documents
      .select(col("lang"), explode(toks).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // per-language kth-largest tf via sharded two-stage ranking
    val tfOrder = Seq(col("tf").desc, col("term"))
    val tfS1 = tf
      .withColumn("_shard", pmod(xxhash64(col("term")), lit(rankShards)))
      .withColumn("_r", row_number().over(
        Window.partitionBy("lang", "_shard").orderBy(tfOrder: _*)))
      .filter(col("_r") <= k)
    val tfK = tfS1
      .withColumn("_r2", row_number().over(
        Window.partitionBy("lang").orderBy(tfOrder: _*)))
      .filter(col("_r2") <= k)
      .groupBy("lang").agg(min(col("tf")).as("tf_k"))
    // NULL-safe language accounting (row-identity with the classic
    // shape requires it): a NULL-lang group is a group like any other —
    // countDistinct skips NULLs, so add it back when present (df counts
    // tf ROWS per term, which include the NULL-lang row), and the
    // threshold join must be null-safe or NULL-lang candidates vanish.
    val nLangs = tf.select(
      (countDistinct(col("lang")) +
        max(when(col("lang").isNull, 1).otherwise(0))).as("nl"))
    val thresholds = tfK.crossJoin(nLangs)
      .select(col("lang").as("_thr_lang"),
        (col("tf_k").cast("double") / col("nl").cast("double")).as("thr"))
    val cand = tf.join(broadcast(thresholds), col("lang") <=> col("_thr_lang"))
      .filter(col("tf") >= col("thr")).drop("thr", "_thr_lang")
    val candTerms = cand.select("term").distinct().localCheckpoint()
    val scored =
      if (candTerms.count() <= candidateCap) {
        val dfm = tf.join(broadcast(candTerms), Seq("term"))
          .groupBy("term").agg(count(lit(1)).as("df"))
        cand.join(broadcast(dfm), Seq("term"))
          .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      } else {
        // fallback: candidate set is not Zipf-prunable — the full
        // vocabulary window (correct at any size; ≤ |langs| rows per
        // term key) rather than an over-cap broadcast
        tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
          .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      }
    rankTopK(scored, k, rankShards)
  }

  /** The shared two-stage top-k ranking tail of [[tfidfTopTerms]]. */
  private def rankTopK(scored: DataFrame, k: Int, rankShards: Int): DataFrame = {
    val rankOrder = Seq(col("score").desc, col("term"))
    val stage1 = scored
      .withColumn("_shard", pmod(xxhash64(col("term")), lit(rankShards)))
      .withColumn("_rnk1", row_number().over(
        Window.partitionBy("lang", "_shard").orderBy(rankOrder: _*)))
      .filter(col("_rnk1") <= k)
      .drop("_shard", "_rnk1")
    stage1
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(rankOrder: _*)))
      .filter(col("rnk") <= k)
      .select("lang", "term", "tf", "df", "score", "rnk")
  }

  /** q116/q117's default segment width (tokens) — spliced into the
    * oracle SQL (the q112 DefaultEpochs rule) so a default change
    * cannot desync the replay. */
  private[graft] val DefaultSegTokens: Int = 16

  /** Marker vocabularies for the language-ID heuristic. On real corpora
    * these are per-language stopword/character-n-gram sets; the test
    * corpus shares one vocabulary, so the heuristic's *mechanism*
    * (score-per-language → argmax) is what's exercised. */
  private[graft] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "fast", "slow"),
    "de" -> Seq("table", "row", "merge"),
    "es" -> Seq("query", "scan", "filter"),
    "fr" -> Seq("join", "group", "sort"),
    "zh" -> Seq("stream", "batch", "window"))

  /** q27: language-ID — marker-token score per language, argmax with a
    * fixed precedence order for ties. */
  def langId(documents: DataFrame): DataFrame = {
    val scored = markers.foldLeft(documents) { case (df, (lang, ms)) =>
      df.withColumn(s"s_$lang",
        size(filter(toks, t => t.isin(ms.map(s => s: Any): _*))))
    }
    val best = markers.map { case (l, _) => col(s"s_$l") }
      .reduce((a, b) => greatest(a, b))
    val pred = markers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"s_$lang") === best, lang).otherwise(acc)
    }
    // foldRight means earlier languages win ties (en > de > es > fr > zh)
    val outCols = Seq(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      pred.as("predicted_lang")) ++
      markers.map { case (l, _) => col(s"s_$l").as(s"score_$l") }
    scored.select(outCols: _*)
  }

  /** q116: MIXED-LANGUAGE detection — q27's language-ID applied per
    * fixed-size token SEGMENT instead of per document (the CCNet
    * convention: language is judged per paragraph, because a document
    * that flips language mid-stream is a poor monolingual training
    * example even when its dominant language is right, and a
    * whole-doc argmax hides the flip). Every `segTokens`-token window
    * gets q27's marker-score argmax with the same en>de>es>fr>zh tie
    * precedence, refined with an explicit `und` verdict when NO
    * marker fires (q27's chain silently predicts "en" on scoreless
    * text — fine for a forced-choice labeler, wrong for a segment
    * detector where "no evidence" must not count as a language).
    *
    * Per doc: segment count, `und` count, the DOMINANT non-und
    * language (most segments; ties by count desc then lang asc —
    * min(struct(−c, lang)), q55's negation trick for string keys),
    * the number of adjacent-segment language SWITCHES (the mix
    * signal — ordered by segment, `und` participates so a
    * lang→und→lang sandwich counts twice), and `is_mixed` = more
    * than one distinct non-und language.
    *
    * Scale: one corpus scan (posexplode) → ONE (doc, seg)-keyed
    * partial agg of the marker counts; everything after runs on the
    * segments frame (tokens/segTokens rows). The per-doc switch scan
    * is a sorted-array expression over each doc's own segments —
    * no window over the corpus. */
  def langMixDetect(documents: DataFrame,
                    segTokens: Int = DefaultSegTokens): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val scoreCols = markers.map { case (l, ms) =>
      sum(when(col("tok").isin(ms.map(s => s: Any): _*), 1L).otherwise(0L))
        .as(s"s_$l")
    }
    val segScores = documents
      .select(col("doc_id"), posexplode(toks))
      .select(col("doc_id"), (col("pos") / segTokens).cast("int").as("seg"),
        col("col").as("tok"))
      .groupBy("doc_id", "seg")
      .agg(scoreCols.head, scoreCols.tail: _*)
    val best = markers.map { case (l, _) => col(s"s_$l") }
      .reduce((a, b) => greatest(a, b))
    val pred = markers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"s_$lang") === best, lang).otherwise(acc)
    }
    val segs = segScores.select(col("doc_id"), col("seg"),
      when(best === 0, "und").otherwise(pred).as("sl"))
      .localCheckpoint() // segments frame: two consumers, KB-per-doc scale
    val perDoc = segs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("sl") === "und", 1L).otherwise(0L)).as("n_und"),
        array_sort(collect_list(struct(col("seg"), col("sl")))).as("arr"))
      .select(col("doc_id"), col("n_segments"), col("n_und"), {
        val langs = transform(col("arr"), x => x.getField("sl"))
        val m = greatest(size(langs) - 1, lit(0))
        aggregate(
          zip_with(slice(langs, lit(1), m), slice(langs, lit(2), m),
            (a, b) => when(a =!= b, 1).otherwise(0)),
          lit(0L), (acc, x) => acc + x).as("n_switches")
      })
    val dom = segs.filter(col("sl") =!= "und")
      .groupBy("doc_id", "sl").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(min(struct((-col("c")).as("nc"), col("sl"))).as("b"),
        count(lit(1)).as("n_langs"))
      .select(col("doc_id"), col("b.sl").as("dominant_lang"),
        col("n_langs"))
    perDoc.join(dom, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segments"), col("n_und"),
        coalesce(col("dominant_lang"), lit("und")).as("dominant_lang"),
        col("n_switches"),
        (coalesce(col("n_langs"), lit(0L)) > 1).as("is_mixed"))
  }

  /** q54: vocabulary coverage / out-of-vocabulary rate — per doc, the
    * fraction of tokens outside the corpus' top-`vocabSize` vocabulary.
    * The tokenizer-fit signal every training-data pipeline computes:
    * high OOV flags encoding damage, wrong-language slices, and
    * boilerplate that will fragment into byte-level tokens.
    *
    * Shape: one explode pass → wordcount (map-side partial agg) →
    * top-V via TakeOrdered (count desc, token asc ties — never a full
    * sort) → the tiny vocabulary BROADCAST back against the exploded
    * tokens (map-side membership, no shuffle of the corpus) → per-doc
    * aggregation, which collapses almost entirely map-side because a
    * doc's exploded tokens stay in its input partition. At 100 TB the
    * vocabulary is a real tokenizer's (load it as a table); the
    * corpus-derived top-V here keeps the operator self-contained and
    * the oracle replicable. */
  def oovRate(documents: DataFrame, vocabSize: Int = 50,
              tokens: Column = split(col("text"), " ")): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(tokens).as("tok"))
    val vocab = tokenCountFrame(documents, tokens)
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        graft.Exact.dround(col("n_oov").cast("double") / col("n_tokens").cast("double"), 4)
          .as("oov_frac"))
  }

  /** q74: per-document n-gram NOVELTY — the fraction of a doc's
    * distinct shingles that appear NOWHERE else in the corpus
    * (corpus-df == 1). The memorization/novelty signal next to the
    * dedup family: near-0 novelty = boilerplate/duplicated content the
    * pair operators (q21/q22) will flag; near-1 = unique text worth
    * keeping; corpus-level novelty drift is the standard check that a
    * crawl refresh actually added new content.
    *
    * Plan: ONE shingle pass; corpus df via a count window partitioned
    * by the shingle hash (q44's df shape — no groupBy+self-join
    * diamond, so the corpus is scanned once), then a doc-keyed partial
    * agg. Two shuffles total (shingle, doc_id), both linear — never
    * df² (this reads the same inverted index as q21 but consumes
    * per-posting rows, not pair expansions). Short docs (< n tokens,
    * zero shingles) are absent from the output by definition — both
    * engines agree. */
  def noveltyScore(documents: DataFrame, n: Int = 3): DataFrame = {
    val idx = documents
      .select(col("doc_id"), Dedup.shingleSet(n).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("shingle"))
    idx
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .groupBy("doc_id")
      .agg(min(col("n_sh")).as("n_shingles"),
        sum(when(col("df") === 1, 1).otherwise(0)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        graft.Exact.dround(
          col("n_unique").cast("double") / col("n_shingles").cast("double"), 4)
          .as("novelty"))
  }
}

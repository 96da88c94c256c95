package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators (SURVEY.md §2, q37–q40): the
  * steps between "documents scored and deduped" and "token stream on
  * disk" — PII scrubbing, deterministic downsampling, token-budget
  * packing. All single-scan expression trees (q37/q38) or one
  * window-sort per stratum (q40); content hashing and sampling hashes
  * are md5-only so DuckDB oracles replicate bit-for-bit.
  */
object Corpus {

  /** Patterns kept to syntax shared by Java regex (Spark) and RE2
    * (DuckDB): character classes, bounded repetition — no lookarounds,
    * no backrefs. */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /** q37: PII redaction — replace emails/phone numbers with typed
    * placeholder tags and count what was scrubbed (the audit trail a
    * compliance pipeline keeps). Returns the REDACTED TEXT plus audit
    * counts — this is the real production operator.
    *
    * `saltForVerification` (default OFF) deterministically appends
    * synthetic PII derived from `doc_id` before scanning — the SAME
    * construction the DuckDB oracle performs — because the synthetic
    * test corpus carries no organic PII and would otherwise exercise
    * nothing. Production callers leave it off and scan `text` as-is.
    *
    * Scale: narrow projection, no shuffle; regexes are codegen'd
    * `regexp_replace`/`regexp_count` (RE2-compatible syntax, see
    * [[EmailRe]]).
    */
  def piiRedact(documents: DataFrame,
                saltForVerification: Boolean = false): DataFrame = {
    val input =
      if (saltForVerification)
        concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      else col("text")
    val redacted = regexp_replace(
      regexp_replace(input, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    documents.select(
      col("doc_id"),
      regexp_count(input, lit(EmailRe)).as("n_emails"),
      regexp_count(input, lit(PhoneRe)).as("n_phones"),
      redacted.as("redacted"))
  }

  /** The q37 verification projection: salted [[piiRedact]] with the
    * redacted body compressed to `md5` + length so the oracle payload
    * stays 16 bytes/doc. The hash lives HERE (harness side), not in the
    * operator — callers of [[piiRedact]] get real redacted text. */
  def piiRedactVerification(documents: DataFrame): DataFrame =
    piiRedact(documents, saltForVerification = true).select(
      col("doc_id"), col("n_emails"), col("n_phones"),
      md5(col("redacted").cast("binary")).as("redacted_hash"),
      length(col("redacted")).as("n_chars_redacted"))

  /** Per-language keep rates for [[sampleStratified]] — en is
    * deliberately majority-downsampled (the classic rebalancing move
    * when one language dominates a crawl). */
  private val DefaultRates: Seq[(String, Double)] =
    Seq("en" -> 0.3, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)

  /** Target composition for [[sourceMix]] — three sources at 50/30/20,
    * the rest of the corpus excluded from the mix. */
  private val DefaultMix: Seq[(String, Double)] =
    Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  /** Shared 16-bit md5 sampling gate (q38/q59): first 4 hex digits of
    * `md5(doc_id)` as an int in [0, 65536). */
  private[operators] def bucket16: Column = conv(
    substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
    16, 10).cast("int")

  /** q38: deterministic stratified sampling — keep a doc iff the first
    * 16 bits of `md5(doc_id)` fall under its language's rate threshold.
    *
    * Hash-gated sampling beats `DataFrame.sample` for a training
    * pipeline because membership is a pure function of the row: re-runs
    * reproduce the same corpus (no RNG state), adding data never flips
    * previously-kept rows, and the DuckDB oracle can verify row-for-row
    * (rand()-based sampling is oracle-uncheckable). Single scan, no
    * shuffle, no per-partition state; the rate map arrives as a literal
    * CASE chain (broadcast-free — it's in the plan).
    */
  def sampleStratified(documents: DataFrame,
                       rates: Seq[(String, Double)] = DefaultRates): DataFrame = {
    val bucket = bucket16
    // Unlisted (or NULL) languages default to KEEP, matching the
    // oracle's `ELSE 65536`: a sampling step must never silently drop a
    // stratum nobody configured a rate for — downsampling is an explicit
    // per-language decision, absence means "pass through".
    val threshold = rates.foldRight(lit(65536)) { case ((lang, rate), acc) =>
      when(col("lang") === lang, lit(math.floor(rate * 65536).toInt)).otherwise(acc)
    }
    documents
      .withColumn("bucket", bucket)
      .filter(col("bucket") < threshold)
      .select("doc_id", "lang", "bucket")
  }

  /** q59: deterministic source mixing — build the LARGEST corpus whose
    * source composition exactly matches a target mixture. The step
    * after per-stratum sampling (q38) in every training-data recipe:
    * q38 applies rates someone already chose; this DERIVES the rates
    * from the target proportions and the actual per-source counts.
    * The binding source (smallest n_s/p_s) is kept whole, every other
    * source downsamples to K·p_s docs where K = min_s(n_s/p_s) — the
    * standard mixture-planning LP solved in closed form.
    *
    * "Kept whole" carries a 1/65536 float edge (round-9 ADVICE): the
    * binding source's K·p_s/n_s is mathematically 1.0 but can
    * round-trip as 0.999…, flooring its threshold to 65535 and
    * dropping that source's bucket-65535 docs (~1/65536 of it). The
    * ORACLE uses identical arithmetic, so parity holds and the output
    * is still a valid mixture (every source scaled by the same hair
    * under K); callers who need the binding source bit-exactly whole
    * should clamp its threshold to 65536 on both sides.
    *
    * Spark-first shape: per-source counts are ONE partial-agg groupBy
    * (20 rows, or 20k — source cardinality, not corpus cardinality);
    * the min and the per-source thresholds stay IN-PLAN (tiny agg +
    * cross join, no driver collect), and the thresholds broadcast-join
    * back onto the corpus scan, where the same 16-bit md5 gate as q38
    * keeps membership a pure row function: re-runs reproduce the
    * corpus, growing a source never flips kept rows of others, and the
    * oracle verifies row-for-row. Sources absent from the target map
    * are DROPPED (the inner join) — opposite default to q38's
    * pass-through, because a mixture is a closed composition: emitting
    * an unbudgeted source would silently break the proportions this
    * operator exists to guarantee. */
  def sourceMix(documents: DataFrame,
                targets: Seq[(String, Double)] = DefaultMix): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "sourceMix needs a non-empty target mixture with positive weights")
    val spark = documents.sparkSession
    import spark.implicits._
    val tgt = targets.toDF("source", "p")
    val counts = documents.groupBy("source").agg(count(lit(1)).as("n"))
    // LEFT join from the targets + loud failure on a missing source: an
    // inner join would silently drop an absent-but-budgeted source and
    // compute K over the survivors — emitting a corpus that VIOLATES
    // the requested proportions (the fail-open this operator exists to
    // prevent). The check rides the tiny rates frame — zero extra scans.
    val j = tgt.join(counts, Seq("source"), "left")
      .withColumn("n", when(col("n").isNull,
        raise_error(concat(lit("sourceMix: source '"), col("source"),
          lit("' has a target weight but no documents — the requested " +
            "mixture is unsatisfiable; drop it from targets or fix the " +
            "corpus")))).otherwise(col("n")))
    val k = j.agg(min(col("n") / col("p")).as("k"))
    val thr = j.crossJoin(k)
      .select(col("source"),
        floor(col("k") * col("p") / col("n") * 65536).cast("int").as("thr"))
    documents
      .withColumn("bucket", bucket16)
      .join(broadcast(thr), Seq("source"))
      .filter(col("bucket") < col("thr"))
      .select("doc_id", "source", "bucket")
  }

  /** q107: TEMPERATURE-scaled language mixing — q59 with the target
    * proportions DERIVED from the observed per-language counts by the
    * multilingual sampling recipe (mBERT / XLM-R / PaLM, public
    * literature): sample language `l` proportional to `n_l^α` with
    * α < 1, which upweights low-resource languages relative to their
    * raw share. The closed form is q59's LP with `w_l = n_l^α`:
    * `K = min_l(n_l / w_l) = min_l(n_l^{1−α})` — the SMALLEST language
    * binds (kept whole), every larger one downsamples at rate
    * `K·w_l/n_l = (n_min/n_l)^{1−α}`.
    *
    * α is restricted to quarters (`quarters`/4 ∈ {0.25, 0.5, 0.75},
    * default 0.5 — the "T = 2" point of the recipe) so `n^α` stays a
    * composition of IEEE-754 `sqrt`s — sqrt is CORRECTLY ROUNDED by
    * the standard, so both engines compute bit-identical weights and
    * the FLOOR'd 16-bit thresholds agree exactly (a free-α `pow(n, α)`
    * goes through exp/ln, which no standard pins — the classic
    * cross-engine transcendental trap). n^¼ = √√n, n^½ = √n,
    * n^¾ = √n·√√n — each a chain of correctly-rounded ops.
    *
    * Same scale shape as q59: per-language counts are ONE partial-agg
    * groupBy (language-cardinality rows), the min and thresholds stay
    * in-plan, thresholds broadcast back onto the scan, and the q38
    * md5 gate keeps membership a pure row function (re-runs reproduce
    * the corpus, the oracle verifies row-for-row). */
  def temperatureMix(documents: DataFrame, quarters: Int = 2): DataFrame = {
    require(quarters >= 1 && quarters <= 3,
      s"quarters must be 1..3 (α = quarters/4), got $quarters")
    def pow4(n: Column): Column = quarters match {
      case 1 => sqrt(sqrt(n))
      case 2 => sqrt(n)
      case 3 => sqrt(n) * sqrt(sqrt(n))
    }
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("n"))
    val w = counts.withColumn("w", pow4(col("n")))
    val k = w.agg(min(col("n") / col("w")).as("k"))
    val thr = w.crossJoin(k)
      .select(col("lang"),
        floor(col("k") * col("w") / col("n") * 65536).cast("int").as("thr"))
    documents
      .withColumn("bucket", bucket16)
      .join(broadcast(thr), Seq("lang"))
      .filter(col("bucket") < col("thr"))
      .select("doc_id", "lang", "bucket")
  }

  /** The shared 16-bit-md5 → bucket fold (q110's featurization, also
    * q111/s17's unigram flavor): `('0x' || substr(md5(x),1,4)) %
    * nBuckets` on the oracle side — ONE encoding, one helper, so the
    * Spark and SQL sides cannot desynchronize per call site (the
    * [[bucket16]] discipline applied to feature hashing). */
  private def mdBucket(c: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(c.cast("binary")), 1, 4), 16, 10)
      .cast("int"), lit(nBuckets))

  /** Exploded hashed-bigram buckets per document — the hashing-trick
    * featurization DSIR uses (Xie et al. 2023 §3.1 hashes
    * unigrams+bigrams into 10⁴ buckets). The bigram walk is the
    * native one-pass [[graft.functions.Exprs.Ngrams]] bag kernel
    * (the `transform(sequence(...))` HOF form re-evaluates the
    * un-materialized `split` child per element — O(len²)/doc,
    * measured 10×); the md5/conv/pmod chain runs on the EXPLODED flat
    * column, inside whole-stage codegen. */
  private def bigramFeats(documents: DataFrame, nBuckets: Int,
                          keepFeatureless: Boolean = false): DataFrame = {
    val bag = graft.functions.Exprs.ngrams(split(col("text"), " "), 2)
    val exploded =
      if (keepFeatureless) explode_outer(bag) // empty bag → one NULL row
      else explode(bag)
    documents
      .select(col("doc_id"), col("source"), col("lang"), exploded.as("bg"))
      .select(col("doc_id"), col("source"), col("lang"),
        mdBucket(col("bg"), nBuckets).as("b"))
  }

  /** q110: DSIR-style DOMAIN-MATCH SELECTION (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169 — public) — rank the raw pool by how much its
    * hashed-bigram feature distribution looks like a TARGET domain,
    * and keep the top `k`. The paper's recipe: featurize target and
    * raw with hashed n-grams, fit a bag-of-features model for each,
    * weight every raw document by the importance log-ratio
    * `Σ_b c_b(x)·(log p̂_t[b] − log p̂_r[b])`, Gumbel-top-k sample.
    * Canonical use: target = a small curated corpus (the paper uses
    * Wikipedia+books), raw = the web crawl; here target is a SOURCE
    * tag, the same role q59/q107 give the column.
    *
    * Two deliberate deviations from the paper, both load-bearing for
    * the exactness contract:
    *  1. the per-bucket weight is the scaled PROBABILITY DIFFERENCE
    *     `cnt_t[b]·N_r − cnt_r[b]·N_t` (= `N_t·N_r·(p̂_t[b]−p̂_r[b])`,
    *     an integer), not the log-ratio — q95's rationale: `ln` is
    *     not bit-stable across engines, the cross-product compare IS
    *     (decimal(38) here, HUGEINT in DuckDB), and no smoothing
    *     constant is needed because nothing divides. Rankings differ
    *     from the log-ratio's in general (documented, like q95's
    *     sign-NB vs NB), but both order by "more target-like than
    *     raw-like, feature by feature".
    *  2. selection is deterministic top-k on `(score desc, doc_id)`
    *     rather than Gumbel-sampled — the q38/q59 house rule that
    *     corpus membership must be a pure function of the input so
    *     re-runs reproduce the corpus and the oracle replays it
    *     row-for-row.
    *
    * Scale shape: TWO corpus scans, both map-side partial aggs. Scan
    * one explodes bigram buckets and computes per-bucket class counts
    * in ONE `groupBy(b)` (trainModel's pos/neg trick — the target/raw
    * split rides a `when`, not two jobs) into a localCheckpointed
    * `nBuckets`-row frame; totals and the fail-loud guard read that
    * KB frame eagerly (index-metadata weight, the q46 collect
    * rationale), the weight frame BROADCASTS into scan two, where the
    * per-document score is a partial-agg sum and TakeOrdered
    * (per-partition top-k, then merge) picks the winners — no global
    * sort, no driver DATA path.
    * At 100 TB: counts fit long (< 9·10¹⁸ bigrams), products fit
    * decimal(38) to ~10¹⁹-feature corpora, candidate cost is linear
    * in the raw pool. Fails loudly when the target source contributes
    * zero features (an inner-join would silently score everything
    * `−cnt_r·N_t` and "select" the shortest documents). */
  def domainSelect(documents: DataFrame, targetSource: String = "src0",
                   k: Int = 100, nBuckets: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val isTarget = col("source") === targetSource
    // the counts frame is nBuckets rows (KBs): localCheckpoint pins the
    // corpus scan behind it ONCE (q111's diamond rule), which also lets
    // the zero-feature guard run as an EAGER driver-side require over
    // the pinned frame — the first cut's per-row raise_error could
    // never fire on an all-featureless corpus, because an empty counts
    // frame has no rows to evaluate the when() on (round-14 review).
    val counts = bigramFeats(documents, nBuckets).groupBy("b")
      .agg(sum(when(isTarget, 1L).otherwise(0L)).as("cnt_t"),
        sum(when(isTarget, 0L).otherwise(1L)).as("cnt_r"))
      .localCheckpoint()
    val totals = counts
      .agg(coalesce(sum("cnt_t"), lit(0L)), coalesce(sum("cnt_r"), lit(0L)))
      .first()
    val (nT, nR) = (totals.getLong(0), totals.getLong(1))
    require(nT > 0,
      s"domainSelect: target source '$targetSource' contributed zero " +
        "bigram features — nothing to match against; check the source " +
        "tag or the target corpus")
    val weights = counts.select(col("b"),
      (col("cnt_t").cast("decimal(19,0)") * lit(nR).cast("decimal(19,0)") -
        col("cnt_r").cast("decimal(19,0)") * lit(nT).cast("decimal(19,0)"))
        .as("wgt"))
    // explode_outer + LEFT weight join: a featureless doc (< 2 tokens)
    // rides the SAME scan as a NULL-bucket row — count(b) gives it
    // n_feats 0 and the coalesce scores it 0 — so no second corpus
    // scan or doc_id re-join is needed to keep it in the pool
    // (with the checkpointed counts the audit reads ex=2 scan=1,
    // down from the first cut's ex=5 scan=3).
    // the decimal(38) score stays INTERNAL (ranking + arithmetic);
    // the declared output emits its exact decimal digits as STRING —
    // DECIMAL(38,0) is the one type the driver's hasher canonicalizes
    // differently from the DuckDB oracle (r14's only three reds, all
    // value-identical), and BIGINT would silently cap at ~9.2e18,
    // which a 100 TB corpus's count cross-products can exceed.
    bigramFeats(documents, nBuckets, keepFeatureless = true)
      .filter(!isTarget)
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy("doc_id", "source", "lang")
      .agg(count(col("b")).as("n_feats"),
        sum(coalesce(col("wgt"), lit(0).cast("decimal(38,0)"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("lang"), col("n_feats"),
        col("score").cast("string").as("score"))
  }

  /** q120's probability quantizer (2^16) and fractional log2 bits —
    * spliced into the oracle SQL (the q112 DefaultEpochs rule). */
  private[graft] val PplQ: Long = 65536L
  private[graft] val PplFBits: Int = 4

  /** q120: N-GRAM LM PERPLEXITY FILTER — CCNet's actual quality filter
    * (Wenzek et al. 2020, public: score every document by its
    * perplexity under an LM trained on the target domain, bucket into
    * head/middle/tail per language, train on the head), under the
    * house no-logs discipline. The LM is a hashed-bigram conditional
    * model over the TARGET source (q110's featurization: per-token md5
    * buckets, the Xie et al. hashing trick) with Laplace smoothing, so
    * every bigram — seen or not — has a defined probability
    * p(b2|b1) = (c(b1,b2)+1) / (c(b1)+B).
    *
    * No floating log anywhere (ln/log2 are not bit-stable across
    * engines — q44's idf note, q95's rule): per-bigram SURPRISE is an
    * INTEGER log2 with [[PplFBits]] fractional bits, computed entirely
    * in integer arithmetic both engines replay exactly —
    * r = (Q·(c_prefix+B)) div (c_pair+1) (the quantized inverse
    * probability, integer division), msb = bitlen(r)−1 (length of the
    * binary literal — exact in Spark's `bin` and DuckDB's
    * `printf('%b')` alike), frac = ((r − 2^msb)·2^F) div 2^msb (the
    * standard linear-interpolation fractional log2). Per-doc surprise
    * is then an exact integer SUM (order-independent — a float-log sum
    * would be partial-agg-order-dependent and hash-unstable), and
    * `ppl_bits` = surprise / (n·2^F) — bits per token, ONE IEEE
    * division of identically-derived integers (q111's convention).
    *
    * Buckets are CCNet's: per LANGUAGE, ntile(3) over (ppl_bits,
    * doc_id) → head/middle/tail; featureless docs (< 2 tokens — no
    * bigrams, no evidence) bucket 'und' with NULL bits rather than
    * polluting the tertiles. Target-source docs are excluded from
    * scoring (the filter serves the raw pool — q110's convention).
    *
    * Scale: training is ONE scan of the target + a (≤ B²)-row partial
    * agg; the LM rides as TWO broadcast KB frames (pairs + prefixes).
    * Scoring is one scan of the pool with map-side broadcast joins —
    * no corpus shuffle until the per-doc agg. The per-language ntile
    * is the one global-ish sort (CCNet's percentile thresholds); at
    * 100 TB swap in q51's certified-sketch thresholds — the bucket
    * boundary becomes approx_percentile(ppl_bits, [1/3, 2/3]) and the
    * scan is threshold-filtered map-side instead (documented, same
    * convention as q117's quality section). Integer headroom is
    * fail-loud: surprise stays exact while c_prefix < 2^43 (~8.8e12
    * target tokens — the target is a curated domain sample, not the
    * pool); past that the require names the remedy (wider F / decimal
    * division). */
  def perplexityFilter(documents: DataFrame, targetSource: String = "src0",
                       nBuckets: Int = 256): DataFrame = {
    val scored = perplexityScored(documents, targetSource, nBuckets)
    // und docs ride the SAME window pass in their own (lang, und)
    // partition — their ntile is computed then overridden, so no
    // union/diamond re-scans the scored frame
    val w = Window.partitionBy(col("lang"), col("n_bigrams") === 0)
      .orderBy(col("ppl_bits").asc_nulls_last, col("doc_id"))
    scored
      .withColumn("nt", ntile(3).over(w))
      .select(col("doc_id"), col("source"), col("lang"), col("n_bigrams"),
        col("surprise"),
        col("ppl_bits"),
        when(col("n_bigrams") === 0, "und")
          .when(col("nt") === 1, "head")
          .when(col("nt") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** q120/q124's shared scoring half — train the hashed-bigram LM on
    * the target source, score every pool document's integer surprise
    * and derived bits/token. Emits (doc_id, source, lang, n_bigrams,
    * surprise, ppl_bits); bucketing is the caller's (q120: exact
    * per-language ntile; q124: certified sketch thresholds). */
  private def perplexityScored(documents: DataFrame, targetSource: String,
                               nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val isTarget = col("source") === targetSource
    // token buckets ride the EXPLODED bigram column (q110's Ngrams
    // note: transform-over-split is O(len²)/doc) — the bigram string
    // splits back into its two tokens losslessly (tokens cannot
    // contain the space they were split on)
    def pairBuckets(df: DataFrame, keepFeatureless: Boolean): DataFrame = {
      val bag = graft.functions.Exprs.ngrams(split(col("text"), " "), 2)
      val ex = if (keepFeatureless) explode_outer(bag) else explode(bag)
      df.select(col("doc_id"), col("source"), col("lang"), ex.as("bg"))
        .withColumn("p", split(col("bg"), " "))
        .select(col("doc_id"), col("source"), col("lang"),
          mdBucket(element_at(col("p"), 1), nBuckets).as("b1"),
          mdBucket(element_at(col("p"), 2), nBuckets).as("b2"))
    }
    // LM = pair counts + prefix counts derived from the SAME frame (a
    // window over the ≤ B²-row agg — no second target scan), pinned
    // once behind a localCheckpoint (the q111 diamond rule: consumed
    // as two broadcasts + the guard)
    val lm = pairBuckets(documents.filter(isTarget), keepFeatureless = false)
      .groupBy("b1", "b2").agg(count(lit(1)).as("c_pair"))
      .withColumn("c_prefix", sum("c_pair").over(Window.partitionBy("b1")))
      .localCheckpoint()
    val guard = lm.agg(coalesce(sum("c_pair"), lit(0L)),
      coalesce(max("c_prefix"), lit(0L))).first()
    require(guard.getLong(0) > 0,
      s"perplexityFilter: target source '$targetSource' contributed zero " +
        "bigrams — no language model to score against; check the source " +
        "tag or the target corpus")
    require(guard.getLong(1) < (1L << 43),
      s"perplexityFilter: target prefix count ${guard.getLong(1)} exceeds " +
        "2^43 — the integer log2 kernel's exactness bound; widen PplFBits " +
        "headroom via decimal division before trusting the scores")
    val prefixes = lm.select("b1", "c_prefix").distinct()
    val scored = pairBuckets(documents.filter(!isTarget), keepFeatureless = true)
      .join(broadcast(lm.select("b1", "b2", "c_pair")), Seq("b1", "b2"), "left")
      .join(broadcast(prefixes), Seq("b1"), "left")
      .withColumn("r",
        expr(s"($PplQ * (coalesce(c_prefix, 0L) + $nBuckets)) div (coalesce(c_pair, 0L) + 1)"))
      .withColumn("msb", (length(bin(col("r"))) - 1).cast("int"))
      .withColumn("s",
        expr(s"msb * ${1 << PplFBits} + ((r - shiftleft(1L, msb)) * ${1 << PplFBits}) div shiftleft(1L, msb)"))
      .groupBy("doc_id", "source", "lang")
      // the when-guard: a featureless doc's explode_outer NULL row
      // still evaluates r/s over coalesced-to-0 counts — its phantom
      // surprise must not leak into the sum
      .agg(count(col("b1")).as("n_bigrams"),
        coalesce(sum(when(col("b1").isNotNull, col("s"))), lit(0L))
          .as("surprise"))
    scored
      .withColumn("ppl_bits",
        when(col("n_bigrams") > 0, col("surprise").cast("double") /
          (col("n_bigrams") * (1L << PplFBits)).cast("double")))
  }

  /** q124: q120's PRODUCTION shape declared — the approx_percentile
    * threshold swap q120's scaladoc prescribes for 100 TB, certified
    * the q51/q121 way. q120's per-language `ntile(3)` is the one
    * global-ish sort in the CCNet recipe; at scale the tertile
    * boundaries come from a MERGEABLE quantile sketch instead
    * (approx_percentile — map-side partials, no per-group sort) and
    * the scan is threshold-filtered map-side. Sketch values are not
    * bit-replicable cross-engine (q51/q73's rationale), so:
    *
    *  - `certify = true` (the DECLARED query): per language, the two
    *    sketch tertile boundaries are checked IN-PLAN against exact
    *    ±1%-rank VALUE windows (q51's bounds over the same (ppl_bits,
    *    doc_id) order q120 sorts by; lo/hi ranks floor/ceil-clamped so
    *    the window is non-empty at any group size) and the query emits
    *    per-language verdict booleans `t1_ok/t2_ok` = 1.0 plus the
    *    deterministic `n_scored` — the DuckDB oracle (1.0 literals +
    *    the replayed counts) hash-fails a broken sketch. The exact
    *    rank window is the certification cost, same sort q120 pays.
    *  - `certify = false` (the PRODUCTION path): per-document buckets
    *    from the sketch thresholds with NO Sort anywhere in the plan —
    *    one partial-agg job derives the per-language boundary frame
    *    (language-cardinality rows), broadcast back onto the scored
    *    frame, bucket = a map-side when-chain (head: bits < t1;
    *    middle: < t2; else tail; und: no bigrams). Boundary SEMANTICS
    *    at the cut differ from ntile's rank split by at most the
    *    sketch error — the documented production approximation.
    *    Spec-pinned sort-free (CorpusSpec, Report.scala:261's
    *    convention), not driver-graded. */
  def perplexityFilterSketch(documents: DataFrame,
                             targetSource: String = "src0",
                             nBuckets: Int = 256,
                             certify: Boolean = true): DataFrame = {
    val scored = perplexityScored(documents, targetSource, nBuckets)
    val ap = expr(
      "approx_percentile(ppl_bits, array(0.3333333333333333, 0.6666666666666666), 10000)")
    if (!certify) {
      val thr = scored.filter(col("n_bigrams") > 0)
        .groupBy("lang").agg(ap.as("t"))
        .select(col("lang"), element_at(col("t"), 1).as("t1"),
          element_at(col("t"), 2).as("t2"))
      scored.join(broadcast(thr), Seq("lang"), "left")
        .select(col("doc_id"), col("source"), col("lang"), col("n_bigrams"),
          col("surprise"), col("ppl_bits"),
          when(col("n_bigrams") === 0, "und")
            .when(col("ppl_bits") < col("t1"), "head")
            .when(col("ppl_bits") < col("t2"), "middle")
            .otherwise("tail").as("bucket"))
    } else {
      // exact rank windows ride ONE per-language window pass (rk and
      // the group count share the lang partition — one exchange); the
      // sketch and the six conditional rank-window aggs then collapse
      // in a single language-keyed partial agg.
      val w = Window.partitionBy("lang")
        .orderBy(col("ppl_bits").asc, col("doc_id"))
      val ranked = scored.filter(col("n_bigrams") > 0)
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("nl",
          count(lit(1)).over(Window.partitionBy("lang")).cast("long"))
      def loR(p: Double) = greatest(lit(1L),
        floor(col("nl") * (p - 0.01)).cast("long"))
      def hiR(p: Double) = least(col("nl"),
        ceil(col("nl") * (p + 0.01)).cast("long"))
      val (p1, p2) = (1.0 / 3.0, 2.0 / 3.0)
      ranked.groupBy("lang")
        .agg(count(lit(1)).as("n_scored"), ap.as("t"),
          max(when(col("rk") <= loR(p1), col("ppl_bits"))).as("lo1"),
          min(when(col("rk") >= hiR(p1), col("ppl_bits"))).as("hi1"),
          max(when(col("rk") <= loR(p2), col("ppl_bits"))).as("lo2"),
          min(when(col("rk") >= hiR(p2), col("ppl_bits"))).as("hi2"))
        .select(col("lang"), col("n_scored"),
          (element_at(col("t"), 1) >= col("lo1") &&
            element_at(col("t"), 1) <= col("hi1")).cast("double").as("t1_ok"),
          (element_at(col("t"), 2) >= col("lo2") &&
            element_at(col("t"), 2) <= col("hi2")).cast("double").as("t2_ok"))
    }
  }

  /** q111: pairwise SOURCE-DISTRIBUTION DIVERGENCE — total-variation
    * distance between every two sources' hashed-unigram token
    * distributions: TVD(s,t) = ½·Σ_b |p̂_s[b] − p̂_t[b]|. The standard
    * corpus-drift / mixture diagnostic ("is src3 still the same kind
    * of text as src7", "did the new crawl shift") a pipeline runs
    * before re-deriving mixture weights (q59/q107) — and TVD, not KL,
    * because KL needs logs (not bit-stable cross-engine, q95's rule)
    * and is infinite on disjoint support, while TVD is a RATIONAL:
    * over the common denominator, TVD = Σ_b |c_s[b]·N_t − c_t[b]·N_s|
    * / (2·N_s·N_t) — an exact integer numerator (decimal(38)/HUGEINT)
    * and ONE IEEE division, both emitted so the hash check pins the
    * integers and the double alike.
    *
    * Tokens fold into `nBuckets` md5 buckets (q110's featurization,
    * unigram flavor): the distribution frame is |sources|·nBuckets
    * rows — KBs — so everything past the first partial agg is
    * index-metadata-scale regardless of corpus size. Missing buckets
    * matter (|0 − p̂_t[b]| still contributes), so the sparse counts
    * frame is DENSIFIED (sources × observed buckets, absent → 0)
    * before the bucket-keyed pair join; `source < source` keeps each
    * unordered pair once. One corpus scan, one partial agg; the pair
    * pass costs |S|²·nBuckets rows on a KB frame — `source` is the
    * mixture-level tag (10s–100s of values, q59's contract), not a
    * domain key. */
  def sourceDivergence(documents: DataFrame, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // counts is |sources|·nBuckets rows (KBs) but is consumed THREE
    // times (densify needs its source set, bucket set, and the counts
    // themselves) — localCheckpoint pins it so the corpus scan+explode
    // runs ONCE, not per branch (the q75/q97 diamond rule; unpinned
    // this plan read the corpus 3× — scan=6 in the audit).
    val counts = tokenBucketCounts(documents, nBuckets).localCheckpoint()
    divergenceFromCounts(counts)
  }

  /** q111's first half, shared with s17's streaming state: per-source
    * hashed-unigram bucket counts — ONE scan, one partial agg,
    * |sources|·nBuckets output rows. In a stream this exact frame is
    * the stateful agg (state = the same KB-scale rows), which is why
    * the drained s17 counts equal the batch counts row-for-row (the
    * s12 accumulate law) and the TVD tail below applies unchanged. */
  private[graft] def tokenBucketCounts(documents: DataFrame,
                                       nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    documents
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), mdBucket(col("tok"), nBuckets).as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("cnt"))
  }

  /** q111's second half: densify + pairwise exact-rational TVD over a
    * `(source, b, cnt)` counts frame (KB-scale — batch-derived or
    * drained from s17's stream state). */
  private[graft] def divergenceFromCounts(counts: DataFrame): DataFrame = {
    val dense = counts.select("source").distinct()
      .crossJoin(counts.select("b").distinct())
      .join(counts, Seq("source", "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
    val a = dense.select(col("source").as("src_a"), col("b"),
      col("cnt").as("ca"), col("n").as("na"))
    val bSide = dense.select(col("source").as("src_b"), col("b"),
      col("cnt").as("cb"), col("n").as("nb"))
    val d19 = "decimal(19,0)"
    // num/den arithmetic stays exact decimal INTERNALLY; the declared
    // projection emits their digits as STRING (hash-stable across the
    // driver's canonicalizer and DuckDB — DECIMAL(38,0) output was
    // r14's only red class) with tvd derived from the decimals BEFORE
    // the cast, so the one IEEE division is unchanged.
    a.join(broadcast(bSide), Seq("b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b", "na", "nb")
      .agg(sum(abs(
        col("ca").cast(d19) * col("nb").cast(d19) -
          col("cb").cast(d19) * col("na").cast(d19))).as("num"))
      .withColumn("den",
        (lit(2).cast(d19) * col("na").cast(d19) * col("nb").cast(d19))
          .cast("decimal(38,0)"))
      .select(col("src_a"), col("src_b"),
        col("num").cast("string").as("num"),
        col("den").cast("string").as("den"),
        (col("num").cast("double") / col("den").cast("double")).as("tvd"))
  }

  /** q113's default shard count — shared with the oracle SQL (spliced
    * into the generated text) so changing it can never desync the
    * Spark plan from the DuckDB replay (the q112 DefaultEpochs rule). */
  private[graft] val DefaultShards: Int = 16

  /** q112's default recipe: a few sources upsampled past one epoch,
    * one heavily downsampled — the shape of every published mixture
    * table (curated corpora repeat, bulk crawl gets a fraction). */
  private[graft] val DefaultEpochs: Seq[(String, Double)] =
    Seq("src0" -> 2.5, "src1" -> 1.25, "src2" -> 0.5)

  /** q112: EPOCH-FACTOR mixing — materialize the training-plan
    * multiset for a mixture recipe where sources repeat a FRACTIONAL
    * number of epochs (the published-recipe convention: LLaMA's
    * mixture table samples Wikipedia/Books ~2.45/2.23 epochs and
    * C4/CC under one — Touvron et al. 2023, public; GPT-3's table is
    * the same shape). Every document of source `s` with factor `e`
    * emits `floor(e)` full-epoch rows plus one more iff its q38
    * 16-bit md5 gate falls under `frac(e)` — so the corpus-level
    * expectation is exactly `e` epochs while membership stays a PURE
    * ROW FUNCTION: re-runs reproduce the plan, adding data never
    * flips existing rows, and the oracle replays row-for-row (the
    * q38/q59/q107 house rule; sampling WITH replacement via RNG
    * would be none of those). Sources not in the recipe pass through
    * at exactly one epoch (the "everything else once" convention of
    * the published tables — and the fail-safe default: an unlisted
    * source surfaces in the output at its raw size, never silently
    * vanishes).
    *
    * Output: one row per (doc_id, epoch) — `epoch` is the repeat
    * ordinal, so downstream packing (q40/q82) can shard by epoch and
    * a drop of epoch k for one doc never renumbers another's rows.
    *
    * Scale: one scan, recipe as a broadcast-free literal CASE chain
    * (q38's rationale), per-row explode of a `reps`-length sequence
    * (≤ ⌈max e⌉ rows/doc), zero shuffle. */
  def epochMix(documents: DataFrame,
               epochs: Seq[(String, Double)] = DefaultEpochs): DataFrame = {
    require(epochs.forall(_._2 >= 0), "epoch factors must be >= 0")
    // a duplicated source would diverge silently between engines: the
    // CASE chain below is last-wins while the oracle's VALUES join
    // fans out one row per duplicate (round-14 review) — die here
    require(epochs.map(_._1).distinct.size == epochs.size,
      s"epochMix recipe lists a source twice: ${epochs.map(_._1)
        .groupBy(identity).collect { case (s, v) if v.size > 1 => s }
        .mkString(", ")}")
    val ep = epochs.foldLeft(lit(1.0)) { case (acc, (s, e)) =>
      when(col("source") === s, lit(e)).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("source"), col("lang"), bucket16.as("bucket"),
        ep.as("ep"))
      .withColumn("reps",
        (floor(col("ep")) +
          when(col("bucket") <
            floor((col("ep") - floor(col("ep"))) * 65536), 1L)
            .otherwise(0L)).cast("int"))
      .filter(col("reps") >= 1) // sequence(0, -1) would DESCEND, not empty
      .select(col("doc_id"), col("source"), col("lang"),
        explode(sequence(lit(0), col("reps") - 1)).as("epoch"))
  }

  /** q113: DETERMINISTIC GLOBAL SHUFFLE into training shards — the
    * step between mixing (q59/q107/q112) and writing: training order
    * must be corpus-wide random-looking (adjacent docs from one
    * source/crawl-run bias SGD batches — every published pipeline
    * shuffles before sharding) yet REPRODUCIBLE and append-stable,
    * which rules out RNG shuffles: order here is a pure function of
    * doc_id — a salted 48-bit md5 key picks both the shard
    * (`h mod nShards`) and the position within it (rank by `(h,
    * doc_id)`), so re-runs emit the identical plan, adding documents
    * never reorders existing pairs RELATIVE to each other, and the
    * oracle replays row-for-row (q38's purity rule applied to
    * ordering). The salt decorrelates the shuffle key from the q38/
    * q112 SAMPLING gates (same md5(doc_id) everywhere would make
    * kept-docs cluster in low shuffle positions).
    *
    * Scale: the per-shard rank window is a sort of n/nShards rows —
    * exactly the sort the shard's parquet writer performs anyway, and
    * shards sort INDEPENDENTLY (q40's sharded note realized: this is
    * the parallel form by construction). One scan, one window. */
  def shuffleShards(documents: DataFrame,
                    nShards: Int = DefaultShards): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = conv(substring(md5(
      concat(lit("shuffle:"), col("doc_id").cast("string")).cast("binary")),
      1, 12), 16, 10).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), h.as("hkey"))
      .withColumn("shard", pmod(col("hkey"), lit(nShards)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select("doc_id", "source", "shard", "pos")
  }

  /** q118's default per-domain cap — spliced into the oracle SQL (the
    * q112 DefaultEpochs rule) so a default change cannot desync the
    * replay. */
  private[graft] val DefaultDomainQuota: Int = 15

  /** q118: PER-DOMAIN QUOTA CAP — cap the number of documents kept
    * per source domain at `maxPerDomain`, the published crawl-curation
    * step between dedup and mixing (RefinedWeb, Penedo et al. 2023,
    * public: after dedup, domains are capped so no single site
    * dominates the corpus; CommonCrawl-derived sets apply the same
    * per-registered-domain limit). Which documents survive the cap is
    * a DETERMINISTIC RANK GATE, not an RNG draw (the q38/q113 purity
    * rule): rank within the domain by a salted 48-bit md5 of doc_id
    * (tie broken by doc_id), keep rank ≤ cap. Re-runs reproduce the
    * kept set exactly, the relative order of existing docs never
    * changes when data is appended (the md5 key is a pure row
    * function), and the oracle replays row-for-row. The salt
    * ("quota:") decorrelates this gate from q38's sampling gate and
    * q113's shuffle key — an uncapped doc is not thereby biased into
    * or out of any other gate.
    *
    * Output keeps the audit trail: every SURVIVOR with its in-domain
    * rank and the domain's PRE-CAP total (`n_domain`), so downstream
    * can see exactly how much each domain was cut (n_domain − cap,
    * floored at 0) without a second scan.
    *
    * Scale: one scan + ONE shuffle keyed on domain; the per-domain
    * rank window sorts each domain's rows independently (domains are
    * many — parallelism is the domain count). Only rank ≤ cap
    * survives, so a hot domain costs one sorted partition of its own
    * rows — the same per-key sort q113 accepts per shard; if one
    * domain is a data-scale fraction of a 100 TB corpus, pass
    * `salts > 0` (q126's declared form): a SALTED bounded pre-prune
    * runs first — rank within (domain, salt) and keep only rank ≤ cap
    * per salt slice, a provable SUPERSET of the global keep set (a
    * global keeper's in-slice rank can only be ≤ its global rank) —
    * so the exact gate's window then sees ≤ salts·cap rows per domain
    * and the hot domain's sort spreads over `salts` tasks (q52's
    * salting pattern applied to top-k instead of a join). The gate
    * arithmetic is UNCHANGED, so the pruned form is row-identical to
    * the plain one at any salt count — q126 shares q118's oracle and
    * the driver hash-checks the identity every round (the q72/s11
    * convention). `n_domain` (the pre-cap audit total) then comes
    * from a map-side partial-agg count over the same slim projection
    * broadcast back — a second pass over 24-byte rows that
    * PARALLELIZES, traded against the count window that would drag
    * the whole domain through one task (the q72 two-pass rule). */
  def domainQuota(documents: DataFrame,
                  maxPerDomain: Int = DefaultDomainQuota,
                  domain: Column = col("source"),
                  salts: Int = 0): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    val h = conv(substring(md5(
      concat(lit("quota:"), col("doc_id").cast("string")).cast("binary")),
      1, 12), 16, 10).cast("long")
    val byDomain = Window.partitionBy("domain")
    val base = documents
      .select(col("doc_id"), domain.as("domain"), h.as("hkey"))
    if (salts <= 0) {
      base
        .withColumn("rk",
          row_number().over(byDomain.orderBy(col("hkey"), col("doc_id"))).cast("long"))
        .withColumn("n_domain", count(lit(1)).over(byDomain))
        .filter(col("rk") <= maxPerDomain)
        .select("doc_id", "domain", "rk", "n_domain")
    } else {
      // salt = an hkey-independent pure row function (xxhash64 vs the
      // md5 rank key — decorrelated, the q113 salt rule), so each salt
      // slice is an arbitrary-but-deterministic 1/salts sample
      val wSalt = Window.partitionBy("domain", "salt")
        .orderBy(col("hkey"), col("doc_id"))
      val pruned = base
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts.toLong)))
        .withColumn("prk", row_number().over(wSalt))
        .filter(col("prk") <= maxPerDomain)
        .select("doc_id", "domain", "hkey")
      val counts = base.groupBy("domain").agg(count(lit(1)).as("n_domain"))
      pruned
        .withColumn("rk",
          row_number().over(byDomain.orderBy(col("hkey"), col("doc_id"))).cast("long"))
        .filter(col("rk") <= maxPerDomain)
        // NO broadcast hint on the audit join (r16 verdict): this
        // salted path is the registered-domain hot-key plan, but a
        // real crawl has 10⁷–10⁸ domains and the pre-cap counts frame
        // is domain-cardinality — forcing it into executor memory
        // would OOM exactly where this plan is supposed to win. Let
        // the optimizer pick: below threshold it still broadcasts;
        // past it the counts shuffle by domain like everything else.
        .join(counts, Seq("domain"))
        .select("doc_id", "domain", "rk", "n_domain")
    }
  }

  /** q40: token-budget sequence packing — assign documents to fixed
    * token-budget chunks (the planning step before concatenating docs
    * into training context windows), per language, in doc_id order.
    *
    * `chunk_id = floor(tokens_before_this_doc / budget)`: a document
    * starts in the chunk its running offset lands in (documents may
    * straddle a boundary — this is offset planning, not bin packing;
    * the writer splits straddlers). One cumulative-sum window per
    * language + one partial agg. At 100 TB a per-language running sum
    * serializes each stratum through a range-sort; production packs
    * per shard (doc_id range) first, then offsets shards by the shard
    * totals — same output, full parallelism. The declared query keeps
    * the direct form the oracle can replicate.
    *
    * `nTokens` is the TOKENIZER column — any long-typed expression
    * over the document row. The default keeps q40's whitespace budget;
    * pass `size(Bpe.encode(col("text"))).cast("long")` to budget by
    * real subword tokens (q82 does exactly that — same plan, same
    * window, only the measure changes).
    */
  def packSequences(documents: DataFrame, budget: Int = 2048,
                    nTokens: Column =
                      size(split(col("text"), " ")).cast("long")): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withChunk = documents
      .select(col("lang"), col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // integer `div`, not floor(double /): offsets are non-negative
      // longs, so truncating and flooring division agree — and the
      // double round trip drifts past 2^53 (the q119 packBfd fix,
      // swept to its siblings per the r16 verdict; oracle uses `//`)
      .withColumn("chunk_id",
        expr(s"(cum_tokens - n_tokens) div ${budget}L").cast("int"))
    withChunk.groupBy("lang", "chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** q72: [[packSequences]]' 100 TB execution plan, realized — its
    * scaladoc prescribes "pack per shard first, then offset shards by
    * the shard totals; same output, full parallelism", and this is
    * that operator. Stage 1 runs the running sum WITHIN each
    * (lang, shard) — shard = doc_id div shardSize is monotone in
    * doc_id, so global (shard, doc_id) order IS doc_id order and
    * shards sort/sum in parallel instead of serializing each language
    * through one range-sorted partition. Stage 2 prefix-sums the
    * per-shard token totals (ONE ROW PER SHARD — corpus/shardSize
    * rows, tiny) per language and broadcast-joins the offsets back:
    * a doc's global running offset = its shard's offset + its
    * within-shard prefix, identical operands to q40's single window,
    * so the floor-division chunk assignment is bit-identical.
    *
    * The declared query shares q40's ORACLE — equality is not a spec
    * claim, it is hash-checked by the driver every round. Size
    * `shardSize` so shard token totals ≫ budget (offsets then rarely
    * split mid-chunk differently than skew does anyway); parallelism
    * = #shards per language. */
  def packSequencesSharded(documents: DataFrame, budget: Int = 2048,
                           shardSize: Long = DefaultShardSize,
                           nTokens: Column =
                             size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val toks = documents
      .select(col("lang"), col("doc_id"), nTokens.as("n_tokens"))
      // integer `div` (house rule; doc_ids non-negative, so truncating
      // and flooring agree and there is no 2^53 double hazard)
      .withColumn("shard", expr(s"doc_id div ${shardSize}L"))
    val wIn = Window.partitionBy("lang", "shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = toks.withColumn("cum_in", sum(col("n_tokens")).over(wIn))
    // strictly-preceding shards only: this shard's docs start AFTER
    // every earlier shard's tokens
    val wSh = Window.partitionBy("lang").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    // This is the textbook TWO-PASS parallel prefix sum, and the plan
    // is honestly two scans: pass 1 (here) computes per-shard token
    // totals as a map-side partial agg — no sort, no doc-level
    // shuffle, #shards rows out; pass 2 (`within`) does the heavy
    // per-shard window. Deriving the totals from the windowed frame
    // instead would NOT save the scan — two consumers of one subtree
    // recompute in Spark (diamond plan; AQE exchange reuse does not
    // fire across these differently-projected branches, measured) —
    // and would drag the totals through pass 2's sort. Two scans that
    // parallelize beat q40's one scan that serializes per language.
    val offsets = toks.groupBy("lang", "shard")
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("offset",
        coalesce(sum(col("shard_tokens")).over(wSh), lit(0L)))
      .select("lang", "shard", "offset")
    within.join(broadcast(offsets), Seq("lang", "shard"))
      // same integer-div rule as q40 — identical operands, identical
      // quotient, so the q40-oracle equality still holds bit-for-bit
      .withColumn("chunk_id",
        expr(s"(offset + cum_in - n_tokens) div ${budget}L").cast("int"))
      .groupBy("lang", "chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** q119's default bin capacity (tokens) — spliced into the oracle
    * SQL (the q112 DefaultEpochs rule). Smaller than q40's 2048: q119
    * is BIN PACKING (docs never straddle), so the capacity is the
    * hard per-sequence budget, not a running-offset granularity. */
  private[graft] val DefaultPackBudget: Int = 128

  /** q72/q119's doc_id-range shard width — [[packSequencesSharded]]
    * and [[packBfd]] both default to it, and the q119 oracle splices
    * it (the q112 DefaultEpochs rule). q72's oracle carries no shard
    * constant by design (the sharded plan is output-identical to q40's
    * single window at ANY width — driver-hash-checked), so only the
    * q119 replay depends on the value. */
  private[graft] val DefaultShardSize: Long = 64L

  /** q119: BEST-FIT-DECREASING token packing — q40/q72 assign docs to
    * chunks by RUNNING OFFSET, which splits any doc that straddles a
    * boundary; published packing work bin-packs instead so documents
    * stay whole and fewer context windows carry truncated text (the
    * "fewer truncations" line of the packing literature; BFD carries
    * the classical 11/9·OPT + 6/9 guarantee, Johnson 1973, public).
    * Global BFD is inherently sequential, so this is the BOUNDED-SHARD
    * form: shard by q72's convention (doc_id range per language —
    * shards pack independently and in parallel, bin ids are in-shard),
    * then run the deterministic BFD kernel
    * ([[graft.functions.Exprs.BfdPack]]) inside each shard. The
    * placement spec (n desc / doc_id tiebreak; smallest-fitting-rem
    * bin, lowest id on ties; oversize docs monopolize a bin for the
    * writer to split) is replayed move-for-move by the oracle's
    * recursive CTE, so the hash gate pins every placement, not just
    * bin counts.
    *
    * Scale: one scan + ONE shuffle keyed on (lang, shard); the
    * collect_list per group is BOUNDED by shardSize (q72's doc_id-
    * range sharding), so the agg buffer cannot blow up and the
    * in-kernel O(m·bins) cost is a constant per shard. Bin count per
    * shard ≥ ceil(shard tokens / budget) — the information-theoretic
    * floor — and the kernel never re-reads text (token counts ride
    * the struct). */
  def packBfd(documents: DataFrame, budget: Int = DefaultPackBudget,
              shardSize: Long = DefaultShardSize,
              nTokens: Column =
                size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    documents
      .select(col("lang"), col("doc_id"), nTokens.as("n"))
      // integer `div`, not floor(double /): the oracle's `//` is exact
      // integer division, and the double round trip drifts past 2^53
      // (round-15 advice — doc_ids are non-negative, so truncating and
      // flooring division agree)
      .withColumn("shard", expr(s"doc_id div ${shardSize}L").cast("long"))
      .groupBy("lang", "shard")
      .agg(collect_list(struct(col("n"), col("doc_id"))).as("ds"))
      .select(col("lang"), col("shard"),
        explode(graft.functions.Exprs.bfdPack(col("ds"), budget)).as("p"))
      .select(col("lang"), col("shard"), col("p.doc_id").as("doc_id"),
        col("p.n").as("n_tokens"), col("p.bin").as("bin"))
  }

  /** q53: sliding-window chunking — the complement of [[packSequences]]:
    * q40 concatenates SHORT docs up to a token budget; this SPLITS long
    * docs into overlapping windows (`window` tokens every `stride`) so
    * no content is lost at sequence boundaries — the standard
    * long-document treatment in LLM pre-training data prep.
    *
    * Pure per-row fan-out: chunk count and every chunk's slice are
    * expressions over the token array — explode is the only
    * row-multiplying step, there is NO shuffle at all (the output is
    * per-chunk rows, and the oracle checker sorts). Each chunk carries
    * an md5 over its joined tokens, so the oracle verifies the exact
    * slice content, not just offsets. Chunk counts:
    * `max(1, ceil((n_tok - window)/stride) + 1)` — every doc yields at
    * least one chunk, the last window is the only short one, and
    * stride < window guarantees the final window is non-empty. */
  def chunkSliding(documents: DataFrame, window: Int = 32,
                   stride: Int = 16,
                   tokens: Column = split(col("text"), " ")): DataFrame = {
    require(stride > 0 && stride <= window, "need 0 < stride <= window")
    val tk = tokens
    val n = size(tk)
    val nChunks = greatest(lit(1),
      ceil((n - lit(window)).cast("double") / stride).cast("int") + 1)
    documents
      .select(col("doc_id"), tk.as("tk"), n.as("n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(col("n") - col("chunk_id") * stride, lit(window)).as("chunk_tokens"),
        md5(array_join(slice(col("tk"), col("chunk_id") * stride + 1, lit(window)), " "))
          .as("chunk_hash"))
  }

  /** Bit-interleaved (Morton / Z-order) key over two `bits`-wide
    * dimension codes — x occupies even bit positions, y odd. Pure
    * shift/mask arithmetic, whole-stage-codegen'd, and replicated
    * verbatim by the DuckDB oracle. */
  def zOrderKey(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)

  /** q77: Z-order write layout — the OPTIMIZE ZORDER primitive a
    * 100 TB corpus store needs. Linear sort orders (partitionBy lang,
    * or sort by n_chars) give tight file bounds on ONE dimension and
    * useless bounds on every other; interleaving the bits of both
    * dimension codes into one clustering key keeps file-level min/max
    * bounds tight on BOTH, so a scan filtered on either (or both)
    * prunes files. Production writes
    * `df.repartitionByRange(n, col("zkey")).write...` and lets parquet
    * row-group stats do the pruning; this operator computes the key and
    * the per-bucket bounds AUDIT that proves the layout prunes.
    *
    * Dimension codes are min/max-NORMALIZED to the full 8-bit range
    * before interleaving (raw codes would leave the key's high bits
    * constant and every doc in one bucket — the audit caught exactly
    * that on the first cut):
    *  - length: floor((n_chars − min) · 256 / (max − min + 1)) — range
    *    stats are one tiny agg, broadcast (what OPTIMIZE ZORDER derives
    *    from column stats; index-metadata cost a production writer
    *    amortizes per commit)
    *  - lang: dense code from the distinct-frame dictionary (tiny: the
    *    world has few languages), scaled by 256/n_langs — broadcast
    *    dict join, NOT a global window over the corpus
    *
    * Plan: one stats agg + one corpus scan with two broadcast joins +
    * one exchange for the bucket agg. The audit emits per-bucket doc
    * counts and min/max of each dimension; tight per-bucket spans ARE
    * the pruning guarantee (a predicate on either dimension eliminates
    * buckets whose span excludes it). */
  /** Doc-level frame with the normalized dimension codes and the
    * interleaved `zkey` — shared by the q77 audit and the physical
    * [[writeZOrdered]] sink. */
  private def zKeyed(documents: DataFrame): DataFrame = {
    val stats = documents.agg(
      min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
    val langDict = documents.select(col("lang")).distinct()
      .withColumn("lang_c", row_number().over(Window.orderBy("lang")) - 1)
      .withColumn("nl", count(lit(1)).over(Window.partitionBy()))
    documents
      .join(broadcast(langDict), Seq("lang"))
      .crossJoin(broadcast(stats))
      .withColumn("x_c",
        floor((col("n_chars") - col("mn")) * 256.0 /
          (col("mx") - col("mn") + 1)).cast("int"))
      .withColumn("y_c", floor(col("lang_c") * 256.0 / col("nl")).cast("int"))
      .withColumn("zkey", zOrderKey(col("x_c"), col("y_c")))
  }

  def layoutZOrder(documents: DataFrame, nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0 && nBuckets <= 65536,
      s"nBuckets must be a power of two in [1, 65536], got $nBuckets")
    zKeyed(documents)
      .withColumn("bucket",
        shiftright(col("zkey"), 16 - Integer.numberOfTrailingZeros(nBuckets)))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("lang_c")).as("min_lang_c"),
        max(col("lang_c")).as("max_lang_c"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("bucket")
  }

  /** The physical write q77's audit models: range-partition on the
    * z-key (sampled split points — equal-sized files even when the
    * key distribution is lumpy, exactly `repartitionByRange`'s
    * contract), sort within partitions so row groups inside a file
    * stay key-local, write parquet. Every output file then carries
    * TIGHT min/max stats on BOTH n_chars and lang, so a scan filtered
    * on either dimension skips most files on footers alone —
    * CorpusSpec proves it by reading the written files back
    * individually. The audit query (q77) remains the deterministic,
    * oracle-checked view of the same layout. */
  def writeZOrdered(documents: DataFrame, path: String,
                    nFiles: Int = 16): Unit =
    zKeyed(documents)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("x_c", "y_c", "lang_c", "nl", "mn", "mx")
      .write.mode("overwrite").parquet(path)
}

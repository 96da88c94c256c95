package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic BPE-style subword tokenization (SURVEY.md §2 q81/q82).
  *
  * Every token-driven operator in the library (q29 counts, q40/q72
  * packing, q53 chunking, q54/q68 vocab) historically ran on
  * whitespace tokens; a real training-data pipeline budgets by
  * TOKENIZER tokens. This module supplies the missing primitive: the
  * classic greedy byte-pair-encoding MERGE loop (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public literature) as a native Catalyst expression.
  *
  * Algorithm (exactly what the DuckDB oracle replays as a recursive
  * CTE, so every step must stay bit-deterministic):
  *  - pre-tokenize on single spaces (empty words skipped — mirrors the
  *    corpus contract every other text operator assumes);
  *  - a word starts as its sequence of single characters;
  *  - repeatedly find the adjacent symbol pair with the LOWEST merge
  *    rank (ties broken leftmost) and fuse that one occurrence;
  *  - stop when no adjacent pair is in the merge table.
  *  Fusing one leftmost occurrence per step is equivalent to the
  *  textbook batch left-to-right merge of the best pair FOR MONOTONE
  *  merge tables (each compound symbol produced by an earlier merge —
  *  true of defaultMerges and every trained table, and enforced by
  *  the Encoder): after fusing, the best-ranked pair still present is
  *  unchanged until its occurrences are exhausted, so the fuse order
  *  is identical — BpeSpec pins the equivalence against an
  *  independent batch implementation. (Non-monotone tables, e.g.
  *  [("bc","b"), ("b","c")], would let one fuse create a
  *  better-ranked pair mid-word and diverge — the Encoder rejects
  *  them.)
  *
  * The merge table is an ordered list of symbol pairs; rank = 1-based
  * position. [[Bpe.defaultMerges]] is a fixed public-knowledge English
  * digraph/trigraph table (deterministic, corpus-independent — the
  * oracle embeds the same list, generated from this Seq, one source of
  * truth). Production swaps in a LEARNED table: the table rides inside
  * the serialized expression, i.e. it is broadcast once per task like
  * any literal — at the typical 32k–100k merge scale that is a few MB,
  * the same footprint every executor-side tokenizer library pays.
  *
  * Scale shape: pure per-row map — no shuffle, no state. Each task
  * memoizes word→tokens in a bounded per-thread table, so the cost on
  * a Zipf-distributed corpus is one greedy encode per DISTINCT word
  * per task, then O(1) lookups — the executor-local analogue of
  * dictionary-encoding the vocabulary.
  */
object Bpe {

  /** Fixed default merge table: common English digraphs first, then
    * second-level fusions over the digraphs. Order IS priority (rank =
    * 1-based index). Pairs must be unique — rank lookup is
    * first-position, and the oracle's `list_position` does the same. */
  val defaultMerges: Vector[(String, String)] = Vector(
    "t" -> "h", "h" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "n" -> "d",
    "t" -> "i", "e" -> "s", "o" -> "r", "t" -> "e", "o" -> "f",
    "e" -> "d", "i" -> "s", "i" -> "t", "a" -> "l", "a" -> "r",
    "s" -> "t", "t" -> "o", "n" -> "t", "n" -> "g", "s" -> "e",
    "h" -> "a", "a" -> "s", "o" -> "u", "th" -> "e", "i" -> "o",
    "l" -> "e", "v" -> "e", "c" -> "o", "m" -> "e", "d" -> "e",
    "h" -> "i", "r" -> "i", "r" -> "o", "i" -> "c", "n" -> "e",
    "e" -> "a", "r" -> "a", "c" -> "e", "l" -> "i", "c" -> "h",
    "l" -> "l", "b" -> "e", "m" -> "a", "s" -> "i", "in" -> "g",
    "io" -> "n", "a" -> "b", "ab" -> "le", "er" -> "s", "an" -> "d",
    "a" -> "g", "ag" -> "g", "s" -> "c", "sc" -> "an", "q" -> "u",
    "qu" -> "er", "w" -> "i", "wi" -> "nd", "c" -> "u", "cu" -> "st",
    "v" -> "al", "val" -> "u", "t" -> "able", "b" -> "at",
    "bat" -> "ch", "s" -> "p", "sp" -> "ar", "spar" -> "k")
  require(defaultMerges.distinct.size == defaultMerges.size,
    "duplicate pair in default merge table")

  /** End-of-word marker for the MARKED encoding (q86): Sennrich et
    * al.'s `</w>` convention — the last symbol of every word carries
    * the marker, so the flat token stream retains word boundaries and
    * [[decode]] is a lossless inverse (q81's unmarked stream, by
    * contrast, round-trips only the concatenated characters). */
  val EowMarker = "</w>"

  /** Reversible marker escape for the MARKED encoding (round-12
    * ADVICE): `</w>` plausibly occurs in real web/HTML-bearing text,
    * and until round 12 one such word ABORTED a corpus-wide marked
    * encode. Instead, marked mode escapes each word BEFORE
    * segmentation — U+E000 (the escape char, private-use area) maps
    * to U+E000 U+E001, the marker literal to U+E000 U+E002 — so
    * after escaping the ONLY raw `</w>` in the token stream are the
    * encoder-appended end-of-word markers, and [[decode]] inverts
    * exactly. Escape order matters (escape raw U+E000 first, or the
    * U+E000 introduced for markers would be re-escaped); unescape
    * order is marker, then U+E000 U+E002, then U+E000 U+E001, and is
    * unambiguous because after escaping every U+E000 is the prefix of
    * exactly one 2-char escape token, tokens never overlap, and no
    * other post-escape character is U+E000. Escaping must run at the
    * WORD level (not per emitted symbol): a marker occurrence can
    * span a symbol boundary in the joined stream, which a per-symbol
    * escape would miss. Words without either character pass through
    * untouched — the common path costs two indexOf probes. */
  private[graft] val Esc = "\uE000"
  private[graft] val EscEscaped = "\uE000\uE001"
  private[graft] val MarkerEscaped = "\uE000\uE002"

  private[graft] def escapeMarker(word: String): String =
    if (word.indexOf(0xE000) < 0 && !word.contains(EowMarker)) word
    else word.replace(Esc, EscEscaped).replace(EowMarker, MarkerEscaped)

  /** Greedy encoder over a merge table; serializable so the expression
    * ships it to executors. The memo table is per-THREAD (tasks in one
    * executor share nothing mutable) and bounded: at `MemoCap` entries
    * it is cleared, so a pathological unbounded vocabulary degrades to
    * re-encoding, never to an OOM.
    *
    * `marked = true` appends [[EowMarker]] to each word's LAST symbol
    * after the merge loop (post-encode marking: merges run over the
    * unmarked symbols, so the subword segmentation — and the token
    * COUNT — are identical to the unmarked encoding; only the final
    * symbol's rendering changes). Words containing the marker literal
    * or U+E000 are [[escapeMarker]]-escaped first so [[decode]] stays
    * an exact inverse — no input aborts the task (round-12 ADVICE
    * replaced the previous fail-loud require). */
  final class Encoder(merges: Seq[(String, String)],
                      marked: Boolean = false) extends Serializable {
    require(merges.nonEmpty, "empty merge table")

    // Monotonicity: a multi-codepoint symbol used at rank i must be
    // the concatenation of some EARLIER merge. This is what makes the
    // one-leftmost-occurrence-per-step loop equivalent to the textbook
    // batch merge (and the Scala encoder equivalent to the oracle's
    // recursive replay): with a non-monotone table, fusing one
    // occurrence can create a better-ranked pair mid-word and the two
    // orders diverge. defaultMerges and every trained table are
    // monotone by construction; user tables are validated here.
    {
      val made = new java.util.HashSet[String]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        Seq(l, r).foreach { sym =>
          require(sym.codePointCount(0, sym.length) <= 1 || made.contains(sym),
            s"non-monotone merge table: symbol '$sym' at rank ${i + 1} is " +
              "not produced by any earlier merge")
        }
        made.add(l + r)
      }
    }

    // key = left + ' ' + right; symbols come from space-split words,
    // so none can contain a space — the key is unambiguous (same
    // convention as the oracle's pair list).
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
        m.putIfAbsent(l + " " + r, Integer.valueOf(i + 1))
      }
      m
    }

    private val MemoCap = 1 << 16
    @transient private lazy val memo
        : ThreadLocal[java.util.HashMap[String, Array[String]]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())

    /** One word → its BPE symbols (greedy best-rank, leftmost ties). */
    def encodeWord(word0: String): Array[String] = {
      val m = memo.get()
      val hit = m.get(word0)
      if (hit != null) return hit
      // marked mode: reversible marker escape (see [[escapeMarker]]) —
      // segmentation runs over the ESCAPED word, so decode's
      // string-level unescape of the joined stream is exact even when
      // the marker would span a symbol boundary
      val word = if (marked) escapeMarker(word0) else word0
      // CODEPOINT symbols, not UTF-16 units: the trainer's
      // split(word, "") and the oracle's regexp '(?s).' both segment
      // by codepoint, and a lone surrogate is not a valid token.
      var syms = new Array[String](word.codePointCount(0, word.length))
      var i = 0
      var off = 0
      while (off < word.length) {
        val next = word.offsetByCodePoints(off, 1)
        syms(i) = word.substring(off, next)
        i += 1
        off = next
      }
      var done = syms.length <= 1
      while (!done) {
        var bestRank = Int.MaxValue
        var bestPos = -1
        var j = 0
        while (j < syms.length - 1) {
          val r = rank.get(syms(j) + " " + syms(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestPos = j
          }
          j += 1
        }
        if (bestPos < 0) done = true
        else {
          val next = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, next, 0, bestPos)
          next(bestPos) = syms(bestPos) + syms(bestPos + 1)
          System.arraycopy(syms, bestPos + 2, next, bestPos + 1,
            syms.length - bestPos - 2)
          syms = next
          done = syms.length == 1
        }
      }
      if (marked && syms.length > 0)
        syms(syms.length - 1) = syms(syms.length - 1) + EowMarker
      if (m.size >= MemoCap) m.clear()
      m.put(word0, syms)
      syms
    }

    /** Whole text → flattened token stream: split on single spaces,
      * skip empty words, concatenate each word's symbols in order. */
    def encodeText(text: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](text.length / 3 + 1)
      var start = 0
      var i = 0
      val n = text.length
      while (i <= n) {
        if (i == n || text.charAt(i) == ' ') {
          if (i > start) out ++= encodeWord(text.substring(start, i))
          start = i + 1
        }
        i += 1
      }
      out.toArray
    }
  }

  /** `graft_bpe(text)` — BPE token array of a text column. Token
    * concatenation per word reproduces the word exactly (no marker
    * symbols), so `array_join(graft_bpe(t), '')` equals
    * `replace(t, ' ', '')` — the round-trip BpeSpec pins.
    *
    * `marked = true` (q86) is the Sennrich `</w>` rendering: the same
    * segmentation with each word's last symbol marker-suffixed, which
    * makes the flat stream boundary-preserving and [[decode]] exact. */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                       marked: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

    @transient private lazy val enc = new Encoder(merges, marked)

    override def nullIntolerant: Boolean = true
    override def nullSafeEval(in: Any): Any = {
      val toks = enc.encodeText(in.asInstanceOf[UTF8String].toString)
      val out = new Array[AnyRef](toks.length)
      var i = 0
      while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: BPE token array over `text` with the given
    * merge table (default: [[defaultMerges]]). */
  def encode(text: Column,
             merges: Seq[(String, String)] = defaultMerges): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(text), merges))

  /** Marked (boundary-preserving) BPE token array — q86's encode side:
    * same segmentation as [[encode]], each word's last symbol suffixed
    * with [[EowMarker]] so [[decode]] inverts it exactly. */
  def encodeMarked(text: Column,
                   merges: Seq[(String, String)] = defaultMerges): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(text), merges, marked = true))

  /** Lossless detokenization of a MARKED token stream — q86's decode
    * side, in pure built-in functions (whole-stage-codegen'd, no
    * custom kernel needed): concatenate all tokens, turn each
    * end-of-word marker back into the space it stands for, drop the
    * final word's trailing space. Inverse of [[encodeMarked]] for any
    * text under the corpus contract (single-space separated, non-empty
    * words — the normalization every text operator here applies). */
  def decode(tokens: Column): Column = {
    import org.apache.spark.sql.functions._
    // markers → spaces first (post-escape, every raw marker in the
    // stream is encoder-appended), then the [[escapeMarker]] inverse
    // (marker escapes back to the literal, escaped escapes back to
    // U+E000 — this order is the unambiguous one, see escapeMarker)
    rtrim(replace(replace(replace(array_join(tokens, ""),
      lit(EowMarker), lit(" ")),
      lit(MarkerEscaped), lit(EowMarker)),
      lit(EscEscaped), lit(Esc)))
  }

  // ---------------------------------------------------------------- train

  /** One batch-merge application of pair (l, r) to a symbol-array
    * column — the textbook training step (merge ALL non-overlapping
    * occurrences left to right). Encoding: symbols joined with TWO
    * spaces, wrapped in one each side, so every symbol owns a space on
    * each flank and `replace` (left-to-right, resume-after-replacement
    * in Spark and DuckDB alike — the equivalence BpeSpec pins on
    * adversarial repeats) fuses successive occurrences exactly like
    * the sequential merge; re-split drops the spent separators. */
  private[graft] def applyMergeCol(arr: Column, l: String, r: String): Column = {
    import org.apache.spark.sql.functions._
    filter(
      split(replace(concat(lit(" "), array_join(arr, "  "), lit(" ")),
        lit(" " + l + "  " + r + " "), lit(" " + l + r + " ")), " "),
      x => x =!= "")
  }

  /** The BPE TRAINING loop (q83) — learns the merge table [[encode]]
    * consumes, closing the train/apply gap the same way
    * `Similarity.trainedCentroids` does for the IVF family: the
    * declared queries keep [[defaultMerges]] (the deterministic oracle
    * mode), production feeds this output into `encode(merges = ...)`.
    *
    * Classic corpus BPE learning (Sennrich et al. 2016): per round,
    * count adjacent symbol pairs over the WORD-COUNT dictionary
    * (weighted by word frequency), adopt the most frequent pair (ties
    * broken lexicographically — deterministic, oracle-replayable), and
    * batch-merge it everywhere.
    *
    * Scale shape: the corpus is scanned ONCE (word-count groupBy,
    * map-side partials, then `localCheckpoint` pins the vocab frame);
    * every round runs over the VOCABULARY frame only — pair fan-out is
    * symbols-per-word rows, the argmax is a partial agg + 1-row sort,
    * and each adopted pair is KB-scale driver state (the q65 centroid
    * collect rationale). Rounds re-derive segmentation by re-applying
    * the adopted merges to the checkpointed frame — O(rounds) passes
    * over the vocabulary, never over the corpus.
    *
    * Fails loudly if the vocabulary exhausts (every word fused to one
    * symbol) before `nMerges` rounds. */
  /** Default training rounds — the q83/q84 oracle generators unroll
    * exactly this many rounds, one source of truth. */
  val defaultTrainRounds = 16

  def trainedMerges(documents: DataFrame,
                    nMerges: Int = defaultTrainRounds): Vector[(String, String, Long)] = {
    import org.apache.spark.sql.functions._
    require(nMerges >= 1, "nMerges must be >= 1")
    // cur = (word, c, segs), MATERIALIZED each round: re-deriving the
    // segmentation from the raw word would nest r merge applications
    // by round r (O(rounds^2) total string passes and an
    // O(rounds)-deep expression tree — fatal at the 32k-merge
    // production scale the module doc cites); the checkpoint keeps
    // every round ONE pass over the vocabulary frame, the same shape
    // as the q65 centroid loop.
    var cur = documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .withColumn("segs", filter(split(col("word"), ""), x => x =!= ""))
      .localCheckpoint()
    val out = Vector.newBuilder[(String, String, Long)]
    var r = 1
    while (r <= nMerges) {
      val segs = col("segs")
      val pairs = zip_with(
        slice(segs, lit(1), size(segs) - 1), slice(segs, lit(2), size(segs) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))
      val best = cur
        .select(col("c"), explode(pairs).as("p"))
        .select(col("c"), col("p.l").as("l"), col("p.r").as("r"))
        .groupBy("l", "r").agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(best.nonEmpty,
        s"vocabulary exhausted after ${r - 1} merges; asked for $nMerges")
      val (l, rr, n) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((l, rr, n))
      if (r < nMerges)
        cur = cur.withColumn("segs", applyMergeCol(col("segs"), l, rr))
          .localCheckpoint()
      r += 1
    }
    out.result()
  }

  /** Persist a learned merge table ([[train]]'s frame) — the
    * tokenizer-artifact half of the production lifecycle: train once
    * (q83), persist, encode everywhere ([[readMerges]] -> [[encode]]),
    * the same train/persist/apply shape the minhash band index uses
    * (`Dedup.writeBandIndex`). Tiny ordered table; one file. */
  def writeMerges(merges: DataFrame, path: String): Unit = {
    val cols = Set("merge_rank", "lhs", "rhs")
    require(cols.subsetOf(merges.columns.toSet),
      s"writeMerges expects train()'s (merge_rank, lhs, rhs[, pair_count]) " +
        s"schema, got ${merges.columns.mkString(", ")}")
    merges.coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted merge table back into [[encode]]'s input shape.
    * Validated at read time, fail-loud like the band index's stamp
    * checks: ranks must be exactly 1..n (a gap or duplicate means the
    * artifact is corrupt — encoding with it would silently change
    * priorities), and the table must pass the Encoder's monotonicity
    * check (construction here, so a bad artifact dies at READ, not on
    * the first executor task). */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Vector[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select("merge_rank", "lhs", "rhs")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"merge table at $path is empty")
    require(rows.map(_._1).toSeq == (1 to rows.length),
      s"merge table at $path has corrupt ranks " +
        s"(${rows.map(_._1).mkString(",")} != 1..${rows.length})")
    val out = rows.map(t => (t._2, t._3)).toVector
    new Encoder(out) // monotonicity + non-empty validation, fail at read
    out
  }

  /** q83 as a frame: the learned merge table
    * (merge_rank, lhs, rhs, pair_count). */
  def train(documents: DataFrame,
            nMerges: Int = defaultTrainRounds): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    trainedMerges(documents, nMerges).zipWithIndex
      .map { case ((l, r, n), i) => (i + 1, l, r, n) }
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }
}

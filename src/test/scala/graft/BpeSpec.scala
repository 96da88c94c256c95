package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.operators.{Corpus, TextOps}

/** q81/q82: the greedy BPE encoder's algebra — hand-computed merges,
  * equivalence of the one-occurrence-per-step loop with the textbook
  * batch merge, lossless round trips, the SQL surface, and the
  * sharded-pack equality under the BPE measure. */
class BpeSpec extends SparkSpec {

  private val enc = new Bpe.Encoder(Bpe.defaultMerges)

  /** Independent TEXTBOOK implementation: per step, find the
    * lowest-rank adjacent pair anywhere in the word, then merge ALL
    * its non-overlapping occurrences left to right. The production
    * encoder merges one leftmost occurrence per step; the two must
    * agree on every input (the merged-all word re-derives the same
    * best pair until its occurrences are exhausted). */
  private def batchEncode(word: String): Vector[String] = {
    val rank = Bpe.defaultMerges.zipWithIndex
      .groupBy(_._1).map { case (p, xs) => p -> (xs.head._2 + 1) }
    var syms = word.map(_.toString).toVector
    var done = syms.length <= 1
    while (!done) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && (syms(i), syms(i + 1)) == best) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
        done = syms.length == 1
      }
    }
    syms
  }

  test("hand-computed merges: multi-level fusion follows rank order") {
    enc.encodeWord("the").toSeq shouldBe Seq("the")
    enc.encodeWord("table").toSeq shouldBe Seq("table")
    enc.encodeWord("spark").toSeq shouldBe Seq("spark")
    // (i,n) at rank 3 beats (w,i) at rank 62, so "window" never
    // reaches the wi+nd merge — greedy is rank-greedy, not longest
    enc.encodeWord("window").toSeq shouldBe Seq("w", "in", "d", "o", "w")
    enc.encodeWord("customer").toSeq shouldBe Seq("cust", "o", "m", "er")
    enc.encodeWord("zzzz").toSeq shouldBe Seq("z", "z", "z", "z")
    enc.encodeWord("a").toSeq shouldBe Seq("a")
  }

  test("one-occurrence-per-step equals the textbook batch merge on corpus words and adversarial strings") {
    val corpusWords = tables.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    val adversarial = Seq("aaaa", "ththth", "inging", "spsparkrk",
      "qqueueryry", "abcdefghijklmnopqrstuvwxyz", "ee", "ttttttttttt")
    (corpusWords ++ adversarial).foreach { w =>
      enc.encodeWord(w).toVector shouldBe batchEncode(w)
    }
  }

  test("round trip: token concatenation rebuilds every corpus word; text-level encode is lossless") {
    val words = tables.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    words.foreach { w => enc.encodeWord(w).mkString shouldBe w }
    // text level: joining all tokens with nothing = text minus spaces
    val bad = tables.documents
      .select(col("text"),
        array_join(Bpe.encode(col("text")), "").as("rt"))
      .filter(col("rt") =!= regexp_replace(col("text"), " ", ""))
      .count()
    bad shouldBe 0L
  }

  test("empty and degenerate inputs: no tokens, no crash") {
    enc.encodeText("").toSeq shouldBe Seq.empty
    enc.encodeText("   ").toSeq shouldBe Seq.empty
    enc.encodeText(" the  spark ").toSeq shouldBe Seq("the", "spark")
  }

  test("graft_bpe is SQL-registered and composes with builtins") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_bpe('the spark window') AS t, size(graft_bpe('the spark window')) AS n")
      .collect().head
    r.getSeq[String](0) shouldBe Seq("the", "spark", "w", "in", "d", "o", "w")
    r.getInt(1) shouldBe 7
  }

  test("q81 plan is one scan with zero exchanges (pure per-row map)") {
    val plan = planOf(TextOps.bpeEncode(tables.documents))
    plan should not include "Exchange"
    "Scan parquet".r.findAllIn(plan).size shouldBe 1
  }

  test("q82 sharded pack under the BPE measure equals the direct window form") {
    // functions.size spelled out: ScalaTest Matchers' size(Long) shadows it
    val bpeCount = org.apache.spark.sql.functions
      .size(Bpe.encode(col("text"))).cast("long")
    val direct = Corpus.packSequences(tables.documents, budget = 256,
      nTokens = bpeCount).collect().toSet
    val sharded = Corpus.packSequencesSharded(tables.documents, budget = 256,
      shardSize = 16L, nTokens = bpeCount).collect().toSet
    sharded shouldBe direct
    direct.size should be > 1
  }

  test("q53 chunking by BPE tokens: non-overlapping chunks cover exactly the token stream") {
    val chunks = Corpus.chunkSliding(tables.documents, window = 16, stride = 16,
      tokens = Bpe.encode(col("text")))
      .groupBy("doc_id").agg(sum("chunk_tokens").as("covered"))
    val totals = TextOps.bpeEncode(tables.documents)
      .select(col("doc_id"), col("n_tokens"))
    val mismatches = chunks.join(totals, "doc_id")
      .filter(col("covered") =!= col("n_tokens")).count()
    mismatches shouldBe 0L
  }

  /** Independent reference trainer: plain-Scala batch BPE learning
    * over a word-count map — greedy most-frequent pair, (count DESC,
    * l, r) tie-break, textbook batch merge per round. */
  private def refTrain(wc: Map[String, Long],
                       rounds: Int): Vector[(String, String, Long)] = {
    var segs = wc.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    val out = Vector.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (w, s) =>
        s.zip(s.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + wc(w)
        }
      }
      val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
      out += ((l, r, n))
      segs = segs.map { case (w, s) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += s(i); i += 1 }
        }
        w -> b.result()
      }
    }
    out.result()
  }

  test("q83 trained merges match an independent plain-Scala trainer on the corpus") {
    val wc = tables.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.trainedMerges(tables.documents, nMerges = 10)
    got shouldBe refTrain(wc, 10)
  }

  test("the batch-merge replace trick matches sequential non-overlapping merge on adversarial repeats") {
    // ("aaaa", a+a) -> [aa, aa]; ("aaa", a+a) -> [aa, a]; etc. Spark's
    // `replace` must scan left-to-right resuming after each
    // replacement (the DuckDB oracle side is pinned by the same cases
    // in the generator's scaladoc).
    val cases = Seq(
      (Seq("a", "a", "a", "a"), ("a", "a"), Seq("aa", "aa")),
      (Seq("a", "a", "a"), ("a", "a"), Seq("aa", "a")),
      (Seq("a", "b", "a", "b", "a", "b"), ("a", "b"), Seq("ab", "ab", "ab")),
      (Seq("a", "a", "b", "a", "a"), ("a", "a"), Seq("aa", "b", "aa")),
      (Seq("a", "b", "b", "a"), ("b", "b"), Seq("a", "bb", "a")),
      (Seq("x"), ("a", "a"), Seq("x")))
    cases.foreach { case (in, (l, r), want) =>
      val df = spark.range(1).select(
        Bpe.applyMergeCol(
          array(in.map(lit): _*), l, r).as("m"))
      df.collect().head.getSeq[String](0) shouldBe want
    }
  }

  test("trained table compresses the corpus at least as well as the default table at the same merge budget") {
    // the fair comparison: 16 learned merges vs the FIRST 16 fixed
    // ones (same budget) — the q65 trained-vs-seed recall analogue
    val n = Bpe.defaultTrainRounds
    val trained = Bpe.trainedMerges(tables.documents, n)
      .map { case (l, r, _) => (l, r) }
    val counts = tables.documents.select(
      sum(org.apache.spark.sql.functions
        .size(Bpe.encode(col("text"), trained))).as("t"),
      sum(org.apache.spark.sql.functions
        .size(Bpe.encode(col("text"), Bpe.defaultMerges.take(n)))).as("d"),
      sum(org.apache.spark.sql.functions
        .size(split(col("text"), " "))).as("w")).collect().head
    val (t, d, w) = (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    t should be <= d       // fit-to-corpus beats fixed at equal budget
    t should be >= w       // subword count never beats whole words
  }

  test("q84 trained encode is lossless and exhaustion fails loudly") {
    val bad = TextOps.bpeEncodeTrained(tables.documents)
      .join(tables.documents, "doc_id")
      .filter(regexp_replace(col("enc"), " ", "") =!=
        regexp_replace(col("text"), " ", ""))
      .count()
    bad shouldBe 0L
    // tiny vocabulary: only 'ab' -> exhausts after 1 merge
    import spark.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Bpe.trainedMerges(tiny, nMerges = 5)
    }
    ex.getMessage should include("exhausted")
  }

  test("codepoint segmentation: newlines are symbols, surrogate pairs never split") {
    // newline inside a space-delimited word stays a symbol (the
    // oracle's '(?s).' matches it too)
    enc.encodeWord("a\nb").toSeq shouldBe Seq("a", "\n", "b")
    // a non-BMP codepooint (surrogate pair in UTF-16) is ONE symbol,
    // matching the trainer's split(word, "") and the oracle's regexp
    val emoji = new String(Character.toChars(0x1F600))
    enc.encodeWord(emoji + "zz").toSeq shouldBe Seq(emoji, "z", "z")
    // trainer and encoder agree on the same corpus: training on a
    // surrogate-bearing vocab learns a codepoint pair the encoder
    // can then apply
    import spark.implicits._
    val df = Seq((1L, s"${emoji}z ${emoji}z")).toDF("doc_id", "text")
    val learned = Bpe.trainedMerges(df, nMerges = 1)
    learned.head._1 shouldBe emoji
    learned.head._2 shouldBe "z"
    new Bpe.Encoder(learned.map(m => (m._1, m._2)))
      .encodeWord(emoji + "z").toSeq shouldBe Seq(emoji + "z")
  }

  test("non-monotone merge tables are rejected (the equivalence precondition)") {
    // [("bc","b"), ("b","c")]: step-wise and batch merge diverge on
    // "bcbc" — the Encoder refuses the table instead
    val ex = intercept[IllegalArgumentException] {
      new Bpe.Encoder(Seq("bc" -> "b", "b" -> "c")).encodeWord("bcbc")
    }
    ex.getMessage should include("non-monotone")
    // monotone compound symbols pass (made by earlier merges): rank-1
    // (b,c) exhausts first, so the batch-equivalent result is [bc,bc]
    new Bpe.Encoder(Seq("b" -> "c", "bc" -> "b"))
      .encodeWord("bcbc").toSeq shouldBe Seq("bc", "bc")
  }

  test("q54/q68 run on the BPE token measure: zero OOV under a full vocab, coverage curve closes at 1") {
    val bpeToks = Bpe.encode(col("text"))
    // a vocab that holds EVERY distinct BPE token -> oov_frac must be
    // exactly 0 for every doc
    val nDistinct = tables.documents
      .select(explode(bpeToks).as("t")).select("t").distinct().count().toInt
    val oov = TextOps.oovRate(tables.documents, vocabSize = nDistinct,
      tokens = bpeToks)
    oov.filter(col("n_oov") =!= 0L).count() shouldBe 0L
    // coverage over the full BPE vocabulary is monotone and closes at 1
    val cov = TextOps.vocabCoverage(tables.documents, topV = nDistinct,
      tokens = bpeToks).orderBy("rank").collect()
    cov.map(_.getAs[Double]("cum_coverage")).sliding(2).foreach {
      case Array(a, b) => b should be >= a
      case _ =>
    }
    cov.last.getAs[Double]("cum_coverage") shouldBe 1.0
  }

  test("merge-table persistence: write -> read -> encode round-trips; corrupt artifacts fail at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    val frame = Bpe.train(tables.documents, nMerges = 8)
    Bpe.writeMerges(frame, dir + "/merges")
    val loaded = Bpe.readMerges(spark, dir + "/merges")
    loaded shouldBe Bpe.trainedMerges(tables.documents, 8).map(m => (m._1, m._2))
    // encoding under the loaded artifact == encoding in-memory
    val a = tables.documents.select(
      sum(org.apache.spark.sql.functions.size(Bpe.encode(col("text"), loaded))))
      .collect().head.getLong(0)
    val b = tables.documents.select(
      sum(org.apache.spark.sql.functions.size(Bpe.encode(col("text"),
        Bpe.trainedMerges(tables.documents, 8).map(m => (m._1, m._2))))))
      .collect().head.getLong(0)
    a shouldBe b
    // a rank gap is a corrupt artifact — dies at READ, not mid-encode
    Bpe.writeMerges(frame.filter(col("merge_rank") =!= 3), dir + "/bad")
    intercept[IllegalArgumentException] {
      Bpe.readMerges(spark, dir + "/bad")
    }.getMessage should include("corrupt ranks")
    // wrong schema refuses to write
    intercept[IllegalArgumentException] {
      Bpe.writeMerges(tables.documents, dir + "/worse")
    }.getMessage should include("schema")
  }

  test("a learned/custom merge table rides through the expression") {
    val custom = Seq("a" -> "b", "ab" -> "c")
    val e2 = new Bpe.Encoder(custom)
    e2.encodeWord("abcabc").toSeq shouldBe Seq("abc", "abc")
    val df = spark.range(1).select(
      Bpe.encode(lit("abc zq"), custom).as("t"))
    df.collect().head.getSeq[String](0) shouldBe Seq("abc", "z", "q")
  }

  test("q86 marked encode: same segmentation, marker on the last symbol only") {
    val m = new Bpe.Encoder(Bpe.defaultMerges, marked = true)
    m.encodeWord("the").toSeq shouldBe Seq("the</w>")
    m.encodeWord("customer").toSeq shouldBe Seq("cust", "o", "m", "er</w>")
    m.encodeWord("a").toSeq shouldBe Seq("a</w>")
    // post-encode marking cannot change the token COUNT
    val u = new Bpe.Encoder(Bpe.defaultMerges)
    Seq("window", "spark", "zzzz", "table").foreach { w =>
      m.encodeWord(w).length shouldBe u.encodeWord(w).length
    }
    // a word containing the marker literal or the escape char is
    // reversibly escaped, never aborted (round-12 ADVICE) — the
    // emitted symbols carry the ESCAPED rendering, decode restores it
    m.encodeWord("x</w>y").mkString should include(Bpe.MarkerEscaped)
  }

  test("q86 marker escape: adversarial marker/escape-char words round-trip losslessly") {
    // every corner of the escape law: the marker literal, the escape
    // char U+E000, the escaped-escape false-match shape (raw U+E000
    // followed by raw U+E002), spanning-boundary markers, and plain
    // HTML-ish text — all must decode back to the exact input
    val adversarial = Seq(
      "x</w>y", "</w>", "a</w>", "</w>b", "</w></w>",
      "pre </w>mid post", "tag<</w>>done",
      "\uE000", "\uE000\uE000", "\uE000\uE002", "\uE000</w>",
      "\uE001", "\uE002", "\uE000\uE001\uE002</w>x")
    val df = spark.createDataFrame(
      adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("id", "text")
    val bad = df.select(col("text"),
        Bpe.decode(Bpe.encodeMarked(col("text"))).as("d"))
      .filter(col("d") =!= col("text"))
      .collect()
    assert(bad.isEmpty,
      s"escape round trip broke on: ${bad.map(_.getString(0)).mkString("[", ", ", "]")}")
    // and the escape itself is the identity on marker-free words
    Bpe.escapeMarker("customer") shouldBe "customer"
  }

  test("q86 decode inverts the marked encode: corpus-wide and on adversarial spacing") {
    // whole corpus: decode(encodeMarked(text)) == space-normalized text
    val norm = array_join(
      filter(split(col("text"), " "), t => t =!= ""), " ")
    tables.documents
      .select(Bpe.decode(Bpe.encodeMarked(col("text"))).as("d"), norm.as("n"))
      .filter(col("d") =!= col("n")).count() shouldBe 0L
    // adversarial: leading/trailing/double spaces normalize, empty ok
    val d = spark.range(1).select(
      Bpe.decode(Bpe.encodeMarked(lit("  the  spark   table "))).as("a"),
      Bpe.decode(Bpe.encodeMarked(lit(""))).as("b"),
      Bpe.decode(Bpe.encodeMarked(lit("x"))).as("c")).collect().head
    d.getString(0) shouldBe "the spark table"
    d.getString(1) shouldBe ""
    d.getString(2) shouldBe "x"
  }

  test("q88 token budget: shares sum to ~1 and totals match a direct count") {
    val out = TextOps.tokenBudget(tables.documents).collect()
    out.length shouldBe tables.documents
      .select("source", "lang").distinct().count().toInt
    val totalTokens = out.map(_.getLong(3)).sum
    // functions.size spelled out: ScalaTest Matchers' size(Long) shadows it
    val perDoc: org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.size(Bpe.encode(col("text"))).cast("long")
    val direct = tables.documents.select(perDoc.as("n"))
      .agg(sum(col("n")).as("t")).collect().head.getLong(0)
    totalTokens shouldBe direct
    val shareSum = out.map(_.getDouble(4)).sum
    shareSum shouldBe 1.0 +- 0.01 // 4-dp rounding per group
  }

  test("q108 fertility: known single-char corpus reads 1.0; totals match direct counts") {
    import spark.implicits._
    // every word is one char -> BPE emits one token per word:
    // fertility exactly 1.0; chars_per_token = n_chars / tokens
    val d = Seq((1L, "a b c", "en", "s0", 5L), (2L, "x y", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.tokenizerFertility(d).collect().head
    r.getAs[Long]("n_docs") shouldBe 2L
    r.getAs[Long]("words") shouldBe 5L
    r.getAs[Long]("tokens") shouldBe 5L
    r.getAs[Long]("chars") shouldBe 8L
    r.getAs[Double]("fertility") shouldBe 1.0
    r.getAs[Double]("chars_per_token") shouldBe 1.6 // dround(8/5)
  }

  test("q108 fertility on the real corpus: group totals match the direct encode") {
    val out = TextOps.tokenizerFertility(tables.documents).collect()
    out.length shouldBe tables.documents
      .select("source", "lang").distinct().count().toInt
    val perDoc: org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.size(Bpe.encode(col("text"))).cast("long")
    val direct = tables.documents.select(perDoc.as("n"))
      .agg(sum(col("n")).as("t")).collect().head.getLong(0)
    out.map(_.getAs[Long]("tokens")).sum shouldBe direct
    // fertility ≥ 1 everywhere: BPE can split words, never fuse across
    // whitespace — the invariant the metric rests on
    out.foreach(_.getAs[Double]("fertility") should be >= 1.0)
  }
}

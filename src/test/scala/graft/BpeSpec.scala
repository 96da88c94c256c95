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

  test("a learned/custom merge table rides through the expression") {
    val custom = Seq("a" -> "b", "ab" -> "c")
    val e2 = new Bpe.Encoder(custom)
    e2.encodeWord("abcabc").toSeq shouldBe Seq("abc", "abc")
    val df = spark.range(1).select(
      Bpe.encode(lit("abc zq"), custom).as("t"))
    df.collect().head.getSeq[String](0) shouldBe Seq("abc", "z", "q")
  }
}

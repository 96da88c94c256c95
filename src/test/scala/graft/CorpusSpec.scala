package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** q37–q40 semantics on hand-built inputs with known ground truth. */
class CorpusSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("q37 verification mode redacts the salted email and phone, one of each") {
    val d = docs((42L, "plain words only", "en"))
    val r = Corpus.piiRedactVerification(d).collect().head
    r.getAs[Int]("n_emails") shouldBe 1
    r.getAs[Int]("n_phones") shouldBe 1
    // redacted text = original + both placeholders; length is stable
    // " contact <EMAIL> or call <PHONE>" after replacing user42@… / +1-555-0042
    r.getAs[Int]("n_chars_redacted") shouldBe
      "plain words only contact <EMAIL> or call <PHONE>".length
  }

  test("q37 default (no salt) returns real redacted text; organic PII scrubbed") {
    val d = docs((7L, "reach me at someone@corp.io today", "en"))
    val r = Corpus.piiRedact(d).collect().head
    r.getAs[Int]("n_emails") shouldBe 1
    r.getAs[Int]("n_phones") shouldBe 0
    r.getAs[String]("redacted") shouldBe "reach me at <EMAIL> today"
  }

  test("q37 PII-free text passes through byte-identical with zero counts") {
    val d = docs((8L, "no personal data here", "en"))
    val r = Corpus.piiRedact(d).collect().head
    r.getAs[Int]("n_emails") shouldBe 0
    r.getAs[String]("redacted") shouldBe "no personal data here"
  }

  test("q38 sampling is a pure row function: same input, same sample") {
    val d = tables.documents
    val a = Corpus.sampleStratified(d).collect().map(_.getLong(0)).sorted
    val b = Corpus.sampleStratified(d).collect().map(_.getLong(0)).sorted
    a shouldBe b
    a.length should be > 0
  }

  test("q38 non-en strata pass through whole; en is downsampled") {
    val d = tables.documents
    val kept = Corpus.sampleStratified(d)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (total.keySet - "en").foreach { l => byLang(l) shouldBe total(l) }
    byLang("en").toDouble / total("en") should (be > 0.15 and be < 0.45)
  }

  test("q38 unlisted and NULL languages default to KEEP, not drop") {
    import spark.implicits._
    val d = Seq((1L, "t", Some("xx")), (2L, "t", None), (3L, "t", Some("tlh")))
      .toDF("doc_id", "text", "lang")
    val kept = Corpus.sampleStratified(d).collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 2L, 3L)
  }

  test("q59 source mix: binding source kept whole, others gated, unbudgeted dropped") {
    import spark.implicits._
    val d = ((1L to 8L).map(i => (i, s"text $i", "a")) ++
      (20L to 21L).map(i => (i, s"text $i", "b")) ++
      Seq((30L, "text 30", "c"))).toDF("doc_id", "text", "source")
    // n_a=8, n_b=2; targets 50/50 → K = min(16, 4) = 4 → thr_a = 32768
    // (half of a), thr_b = 65536 (b is binding, kept whole); c unbudgeted
    val out = Corpus.sourceMix(d, Seq("a" -> 0.5, "b" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    out.map(_._2).toSet shouldBe Set("a", "b")
    out.filter(_._2 == "b").map(_._1).sorted shouldBe Array(20L, 21L)
    out.filter(_._2 == "a").foreach(_._3 should be < 32768)
  }

  test("q59 source mix fails loudly when a budgeted source has no documents") {
    import spark.implicits._
    val d = Seq((1L, "text", "a")).toDF("doc_id", "text", "source")
    val ex = intercept[Exception] {
      Corpus.sourceMix(d, Seq("a" -> 0.5, "ghost" -> 0.5)).collect()
    }
    ex.getMessage should include ("unsatisfiable")
  }

  test("q59 source mix on the real corpus: closed composition at derived rates") {
    val out = Corpus.sourceMix(tables.documents).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    bySource.keySet shouldBe Set("src0", "src1", "src2")
    // uniform 25-per-source corpus: src0 (p=.5) binds → kept whole;
    // the others hash-gate at 0.6 / 0.4 of their 25 docs
    bySource("src0") shouldBe 25
    bySource("src1") should be < 25
    bySource("src2") should be < bySource("src1")
  }

  test("q107 temperature mix: smallest language binds at α=0.5, larger ones gate at sqrt ratio") {
    import spark.implicits._
    // n_a = 16, n_b = 4; α = 0.5 → w = (4, 2); K = min(16/4, 4/2) = 2
    // thr_a = floor(2·4/16·65536) = 32768 (EXACT arithmetic — 16 and 4
    // are perfect squares, so the binding lang's rate is exactly 1.0
    // and b keeps all docs including bucket ≥ 32768 ones)
    val d = ((1L to 16L).map(i => (i, s"text $i", "aa")) ++
      (20L to 23L).map(i => (i, s"text $i", "bb"))).toDF("doc_id", "text", "lang")
    val out = Corpus.temperatureMix(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    out.filter(_._2 == "bb").map(_._1).sorted shouldBe Array(20L, 21L, 22L, 23L)
    out.filter(_._2 == "aa").foreach(_._3 should be < 32768)
  }

  test("q107 temperature flattens the mixture: kept shares sit between raw and uniform") {
    // real corpus: en dominates raw; after α=0.5 the kept-count ratio
    // max/min must shrink vs the raw ratio (that is what temperature
    // sampling is FOR) while staying above 1 (α < 1, not uniform).
    val raw = tables.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Corpus.temperatureMix(tables.documents).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    kept.keySet shouldBe raw.keySet
    val rawRatio = raw.values.max.toDouble / raw.values.min
    val keptRatio = kept.values.max.toDouble / kept.values.min
    keptRatio should be < rawRatio
    keptRatio should be > 1.0
    // binding (smallest) language is kept whole — α=0.5 exactness note
    val minLang = raw.minBy(_._2)._1
    kept(minLang) shouldBe raw(minLang)
  }

  test("q107 α is quarters-only (sqrt-composable); out-of-range rejected") {
    an[IllegalArgumentException] should be thrownBy
      Corpus.temperatureMix(tables.documents, quarters = 0)
    an[IllegalArgumentException] should be thrownBy
      Corpus.temperatureMix(tables.documents, quarters = 4)
    // α = 0.25 flattens HARDER than α = 0.5 (closer to uniform)
    val k25 = Corpus.temperatureMix(tables.documents, quarters = 1).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val k50 = Corpus.temperatureMix(tables.documents, quarters = 2).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val r25 = k25.values.max.toDouble / k25.values.min
    val r50 = k50.values.max.toDouble / k50.values.min
    r25 should be < r50
  }

  private def srcDocs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
  }

  test("q110 Ngrams kernel: bag semantics — duplicates kept, order preserved, short docs empty") {
    import spark.implicits._
    val r = Seq("a b a b", "solo", "x y")
      .toDF("text")
      .select(
        graft.functions.Exprs.ngrams(F.split(F.col("text"), " "), 2).as("bag"),
        graft.functions.Exprs.shingles(F.split(F.col("text"), " "), 2).as("set"))
      .collect()
    r(0).getSeq[String](0) shouldBe Seq("a b", "b a", "a b") // multiplicity KEPT
    r(0).getSeq[String](1) shouldBe Seq("a b", "b a")        // Shingles dedupes
    r(1).getSeq[String](0) shouldBe Seq.empty                // < n tokens
    r(2).getSeq[String](0) shouldBe Seq("x y")
  }

  test("q110 ranks the target-bigram-sharing raw doc first, off-domain last") {
    // target corpus is all "alpha beta" bigrams; raw doc 10 shares that
    // bigram, 11 shares nothing, 12 is single-token (featureless → 0).
    val d = srcDocs(
      (1L, "alpha beta alpha beta", "src0"),
      (2L, "alpha beta gamma", "src0"),
      (10L, "alpha beta delta", "web"),
      (11L, "epsilon zeta epsilon zeta", "web"),
      (12L, "solo", "web"))
    // score is STRING in the declared output (exact decimal digits —
    // the driver-hash-stable form); parse back for numeric asserts
    val out = Corpus.domainSelect(d, k = 10).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getString(4))))
    out.map(_._1) shouldBe Array(10L, 12L, 11L)
    out(0)._2.signum shouldBe 1   // matches the target distribution
    out(1)._2.signum shouldBe 0   // featureless: score exactly 0
    out(2)._2.signum shouldBe -1  // pure raw-only mass: negative
    // target rows never appear in the selection pool
    out.map(_._1) should not contain 1L
  }

  test("q110 is deterministic and excludes the target source from the pool") {
    val d = tables.documents
    val a = Corpus.domainSelect(d, k = 20).collect()
    val b = Corpus.domainSelect(d, k = 20).collect()
    a.map(_.getLong(0)).toSeq shouldBe b.map(_.getLong(0)).toSeq
    a.length shouldBe 20
    a.foreach(_.getString(1) should not be "src0")
    // emitted in rank order: scores non-increasing (ranked on the
    // internal decimal; the output string parses back exactly)
    val scores = a.map(r => BigDecimal(r.getString(4)))
    scores.sliding(2).foreach { p => p(0).compare(p(1)) should be >= 0 }
  }

  test("q110 fails loudly when the target source contributes no features") {
    val d = srcDocs((1L, "only raw words here", "web"))
    val ex = intercept[Exception] {
      Corpus.domainSelect(d, targetSource = "ghost").collect()
    }
    ex.getMessage should include ("zero bigram features")
    // the all-featureless corpus (every doc < 2 tokens) must die the
    // same way — the first cut's per-row raise_error never fired here
    // because an empty counts frame has no rows (round-14 review)
    val short = srcDocs((1L, "solo", "src0"), (2L, "tiny", "web"))
    val ex2 = intercept[Exception] {
      Corpus.domainSelect(short).collect()
    }
    ex2.getMessage should include ("zero bigram features")
  }

  test("q112 rejects a recipe that lists a source twice") {
    val d = srcDocs((1L, "t", "a"))
    val ex = intercept[IllegalArgumentException] {
      Corpus.epochMix(d, Seq("a" -> 2.0, "b" -> 1.0, "a" -> 1.0))
    }
    ex.getMessage should include ("twice")
  }

  test("q111 TVD: disjoint sources hit 1, proportional sources hit exactly 0") {
    // A and B share token shape (2:1 mix of x/y at different sizes) →
    // the integer cross-products cancel EXACTLY (|2·6−4·3|=0); C is
    // token-disjoint from both → TVD 1. Integer numerators, no
    // rounding anywhere.
    val d = srcDocs(
      (1L, "x x y", "A"),
      (2L, "x x x x y y", "B"),
      (3L, "z w z w", "C"))
    val rows = Corpus.sourceDivergence(d).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigDecimal(r.getString(2)), BigDecimal(r.getString(3)),
          r.getDouble(4)))).toMap
    rows.keySet shouldBe Set(("A", "B"), ("A", "C"), ("B", "C"))
    rows(("A", "B"))._1.signum shouldBe 0     // exact zero numerator
    rows(("A", "B"))._3 shouldBe 0.0
    rows(("A", "C"))._3 shouldBe 1.0          // disjoint support
    rows(("B", "C"))._3 shouldBe 1.0
  }

  test("q111 TVD: a hand-computed partial overlap, missing buckets counted") {
    // A = {x:2, y:1} (n=3), B = {x:1, z:1} (n=2)
    // TVD = ½(|2/3−1/2| + |1/3−0| + |0−1/2|) = ½(1/6+1/3+1/2) = 1/2
    // numerator over common den: |2·2−1·3| + |1·2−0| + |0−1·3| = 6; den = 12
    val d = srcDocs((1L, "x x y", "A"), (2L, "x z", "B"))
    val r = Corpus.sourceDivergence(d).collect().head
    r.getString(2) shouldBe "6"
    r.getString(3) shouldBe "12"
    r.getDouble(4) shouldBe 0.5
  }

  test("q112 epoch mix: integer factors repeat exactly, fractions gate, unlisted pass once") {
    import spark.implicits._
    val d = srcDocs(
      (1L, "t", "twice"), (2L, "t", "twice"),
      (3L, "t", "half"), (4L, "t", "half"),
      (5L, "t", "ghost")) // unlisted → exactly one epoch
    val out = Corpus.epochMix(d, Seq("twice" -> 2.0, "half" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    // integer factor: every doc exactly floor(2.0)=2 rows, epochs 0 and 1
    out.filter(_._1 == 1L).map(_._2).sorted shouldBe Array(0, 1)
    out.filter(_._1 == 2L).map(_._2).sorted shouldBe Array(0, 1)
    // fractional: each doc gets 0 or 1 rows by its md5 gate
    out.filter(t => t._1 == 3L || t._1 == 4L).foreach(_._2 shouldBe 0)
    // unlisted source: exactly one epoch, never dropped
    out.filter(_._1 == 5L).map(_._2) shouldBe Array(0)
  }

  test("q112 epoch mix: corpus-level rates approach the factors and re-runs are identical") {
    val d = tables.documents
    val a = Corpus.epochMix(d).collect().map(r => (r.getLong(0), r.getInt(3))).sorted
    val b = Corpus.epochMix(d).collect().map(r => (r.getLong(0), r.getInt(3))).sorted
    a shouldBe b
    val bySource = Corpus.epochMix(d).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 ×2.5: between 2× and 3×; src2 ×0.5: strictly fewer than raw
    bySource("src0").toDouble / raw("src0") should (be >= 2.0 and be <= 3.0)
    bySource("src2") should be < raw("src2")
    // unlisted sources exactly once
    (raw.keySet -- Set("src0", "src1", "src2")).foreach { s =>
      bySource(s) shouldBe raw(s)
    }
  }

  test("q113 shuffle: positions are dense per shard, re-runs identical, appends stable") {
    val d = tables.documents
    val a = Corpus.shuffleShards(d).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val b = Corpus.shuffleShards(d).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    a.sorted shouldBe b.sorted               // pure function of the input
    a.length shouldBe d.count()
    // dense 0..k-1 positions within every shard
    a.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).sorted shouldBe (0L until rows.length).toArray
    }
    // appending new docs never reorders existing pairs RELATIVE to
    // each other: drop half the corpus, shuffle, compare pair order
    val half = d.filter(F.col("doc_id") % 2 === 0)
    val small = Corpus.shuffleShards(half).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val fullRank = a.map(t => (t._1, (t._2, t._3))).toMap
    small.groupBy(_._2).values.foreach { rows =>
      val ordered = rows.sortBy(_._3).map(_._1)
      ordered.map(fullRank).map(_._2).sliding(2).foreach { p =>
        if (p.length == 2) p(0) should be < p(1)
      }
    }
    // every doc appears exactly once across all shards
    a.map(_._1).toSet.size.toLong shouldBe d.count()
  }

  test("q113 shuffle decorrelates from the q38 sampling gate") {
    // same md5(doc_id) for gate and order would put every q38-kept doc
    // in the low half of each shard; the salt must break that.
    val d = tables.documents
    val kept = Corpus.sampleStratified(d).collect().map(_.getLong(0)).toSet
    val pos = Corpus.shuffleShards(d).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val shardSize = pos.groupBy(_._2).view.mapValues(_.length).toMap
    // fraction of kept docs landing in the UPPER half of their shard
    val upper = pos.filter(t => kept(t._1))
      .count(t => t._3 * 2 >= shardSize(t._2))
    val frac = upper.toDouble / kept.size
    frac should (be > 0.3 and be < 0.7) // correlated ordering would pin this near 0
  }

  test("q120 perplexity filter separates in-domain from out-of-domain text") {
    // target (src0) is all "alpha beta" bigrams; docA repeats exactly
    // those bigrams, docB shares nothing with the target vocabulary.
    // The LM must read docA as LOW surprise and docB as HIGH — the
    // separability CCNet's filter exists to provide.
    val d = srcDocs(
      (1L, "alpha beta alpha beta alpha beta", "src0"),
      (2L, "alpha beta alpha beta", "src0"),
      (10L, "alpha beta alpha beta alpha", "web"),
      (11L, "zulu yankee xray whiskey victor uniform", "web"),
      (12L, "solo", "web"))
    val out = Corpus.perplexityFilter(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]), r.getString(6))).toMap
    out.keySet shouldBe Set(10L, 11L, 12L)   // target docs excluded
    val (nA, sA, bitsA, _) = out(10L)
    val (nB, sB, bitsB, _) = out(11L)
    nA shouldBe 4L; nB shouldBe 5L
    bitsA.get should be < bitsB.get          // in-domain reads cheaper
    sA should be < sB
    // featureless doc: no evidence, 'und' bucket, NULL bits, zero sum
    out(12L) shouldBe ((0L, 0L, None, "und"))
  }

  test("q120 integer-log2 surprise matches a from-first-principles replay, bit for bit") {
    // independent JVM-side replay of the DECLARED arithmetic spec
    // (md5 bucket, Laplace r, bitlen msb, interpolated frac) — collision-
    // proof: the replay derives the same buckets the operator does
    def bk(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % 256
    }
    def pairs(text: String): Seq[(Int, Int)] = {
      val b = text.split(" ").map(bk)
      b.dropRight(1).zip(b.drop(1)).toSeq
    }
    val target = "x y x y x"
    val rawDocs = Seq(10L -> "x y", 11L -> "q z w", 12L -> "x y x")
    val cPair = pairs(target).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cPrefix = pairs(target).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def surprise(text: String): (Long, Long) = {
      val ss = pairs(text).map { case (b1, b2) =>
        val r = (65536L * (cPrefix.getOrElse(b1, 0L) + 256L)) /
          (cPair.getOrElse((b1, b2), 0L) + 1L)
        val msb = 63 - java.lang.Long.numberOfLeadingZeros(r)
        val frac = ((r - (1L << msb)) * 16L) / (1L << msb)
        msb * 16L + frac
      }
      (ss.size.toLong, ss.sum)
    }
    val d = srcDocs((1L, target, "src0") +:
      rawDocs.map { case (id, t) => (id, t, "web") }: _*)
    val got = Corpus.perplexityFilter(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    rawDocs.foreach { case (id, t) =>
      got(id) shouldBe surprise(t)
    }
  }

  test("q120 tertiles: per-language ntile sizes obey the ceil/floor law and runs are deterministic") {
    val d = tables.documents
    val a = Corpus.perplexityFilter(d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4), r.getString(6)))
    val b = Corpus.perplexityFilter(d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4), r.getString(6)))
    a.sorted shouldBe b.sorted               // integer surprise: no agg-order drift
    a.filter(_._5 == "und").foreach(_._3 shouldBe 0L)
    a.groupBy(_._2).foreach { case (_, docs) =>
      val scored = docs.filter(_._3 > 0L)
      val byBucket = scored.groupBy(_._5).view.mapValues(_.length).toMap
      val n = scored.length
      if (n >= 3) {
        Seq("head", "middle", "tail").foreach { bk =>
          byBucket.getOrElse(bk, 0) should (be >= n / 3 and be <= n / 3 + 1)
        }
      }
    }
    // the filter fails loudly with no target evidence (q110's rule)
    val ex = intercept[Exception] {
      Corpus.perplexityFilter(tables.documents, targetSource = "ghost")
    }
    ex.getMessage should include ("zero bigrams")
  }

  test("q124 perplexity sketch: certified verdicts healthy, production path sort-free and near the exact tertiles") {
    val d = tables.documents
    // declared (certified) form: per-language verdicts all 1.0, langs
    // and n_scored replayed by the exact filter
    val cert = Corpus.perplexityFilterSketch(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val exact = Corpus.perplexityFilter(d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getString(6)))
    val scoredByLang = exact.filter(_._3 > 0L).groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    cert.keySet shouldBe scoredByLang.keySet
    cert.foreach { case (lang, (n, t1ok, t2ok)) =>
      n shouldBe scoredByLang(lang)
      t1ok shouldBe 1.0
      t2ok shouldBe 1.0
    }
    // production form: NO Sort anywhere in the plan (the q121
    // convention — Report.scala:261); buckets are value-monotone per
    // language, the und set is identical, and assignments agree with
    // the exact ntile split up to boundary/tie semantics
    val prod = Corpus.perplexityFilterSketch(d, certify = false)
    prod.queryExecution.executedPlan.toString should not include "Sort"
    val rows = prod.collect()
      .map(r => (r.getLong(0), r.getString(2),
        Option(r.get(5)).map(_.asInstanceOf[Double]), r.getString(6)))
    val pb = rows.map(t => t._1 -> t._4).toMap
    val eb = exact.map(t => t._1 -> t._4).toMap
    pb.keySet shouldBe eb.keySet
    pb.filter(_._2 == "und") shouldBe eb.filter(_._2 == "und")
    rows.filter(_._4 != "und").groupBy(_._2).foreach { case (_, ds) =>
      def bits(bk: String) = ds.filter(_._4 == bk).flatMap(_._3)
      if (bits("head").nonEmpty && bits("middle").nonEmpty)
        bits("head").max should be < bits("middle").min
      if (bits("middle").nonEmpty && bits("tail").nonEmpty)
        bits("middle").max should be <= bits("tail").min
    }
    val diff = eb.count { case (id, b) => pb(id) != b }
    diff should be <= math.max(4, eb.size / 10)
  }

  test("q126 pruned quota: salted pre-prune is row-identical to the plain gate on a skewed corpus") {
    import spark.implicits._
    // one mega-domain (80% of rows) + a tail of small ones — the exact
    // skew shape the pre-prune exists for; identity must hold at every
    // salt count (superset law: a global keeper's in-slice rank <= its
    // global rank, so no keeper is ever pre-pruned away)
    val d = (1L to 400L)
      .map(i => (i, if (i <= 320) "hot.example" else s"site${i % 16}"))
      .toDF("doc_id", "source")
    val plain = Corpus.domainQuota(d, maxPerDomain = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    plain.count(_._2 == "hot.example") shouldBe 7
    Seq(1, 2, 8, 64).foreach { s =>
      val pruned = Corpus.domainQuota(d, maxPerDomain = 7, salts = s).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      pruned shouldBe plain
    }
  }

  test("q118 quota: cap is exact, under-cap domains keep everything, re-runs identical") {
    val d = tables.documents
    val a = Corpus.domainQuota(d, maxPerDomain = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val b = Corpus.domainQuota(d, maxPerDomain = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    a.sorted shouldBe b.sorted               // pure function of the input
    val preCap = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_._2)
    // cap exactness: every domain keeps min(cap, its pre-cap total),
    // ranks are dense 1..k, and n_domain carries the PRE-CAP total
    preCap.foreach { case (dom, n) =>
      val rows = kept.getOrElse(dom, Array.empty)
      rows.length.toLong shouldBe math.min(10L, n)
      rows.map(_._3).sorted shouldBe (1L to rows.length).toArray
      rows.foreach(_._4 shouldBe n)
    }
    // survivors are a subset of the corpus, no doc twice
    a.map(_._1).distinct.length shouldBe a.length
  }

  test("q118 quota rank gate is append-stable and decorrelated from the q38 gate") {
    val d = tables.documents
    // relative keep-order of existing docs never changes when data is
    // appended: the half-corpus ranking is the full ranking restricted
    val full = Corpus.domainQuota(d, maxPerDomain = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val half = Corpus.domainQuota(d.filter(F.col("doc_id") % 2 === 0),
        maxPerDomain = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fullRank = full.map(t => (t._1, t._3)).toMap
    half.groupBy(_._2).values.foreach { rows =>
      rows.sortBy(_._3).map(t => fullRank(t._1)).sliding(2).foreach { p =>
        if (p.length == 2) p(0) should be < p(1)
      }
    }
    // decorrelation: q38-kept docs must not cluster in low quota ranks
    val kept = Corpus.sampleStratified(d).collect().map(_.getLong(0)).toSet
    val nDom = full.groupBy(_._2).view.mapValues(_.length).toMap
    val upper = full.filter(t => kept(t._1))
      .count(t => t._3 * 2 >= nDom(t._2))
    val frac = upper.toDouble / kept.size
    frac should (be > 0.3 and be < 0.7)
  }

  test("q119 BFD: best-fit choice, new-bin fallback, and the lower bound on a hand instance") {
    import spark.implicits._
    // one shard (ids < 64), budget 10, sizes 8,6,5,3,2 in decreasing
    // order: 8->bin0(rem 2), 6->bin1(4), 5->bin2(5), 3->best fit is
    // bin1 (rem 4 < bin2's 5), 2->bin0 (rem 2 exactly)
    val d = Seq(
      (1L, "w w w w w w w w", "en"), (2L, "w w w w w w", "en"),
      (3L, "w w w w w", "en"), (4L, "w w w", "en"), (5L, "w w", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.packBfd(d, budget = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin")).toMap
    got shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0)
  }

  test("q119 BFD: equal remainders break to the lowest bin id; oversize docs monopolize a bin") {
    import spark.implicits._
    // sizes 6,6,4,2,2 at budget 10: the 4 fits bin0 and bin1 at equal
    // rem 4 -> bin0 wins; then 2,2 land in bin1.
    val tie = Seq(
      (1L, "w w w w w w", "en"), (2L, "w w w w w w", "en"),
      (3L, "w w w w", "en"), (4L, "w w", "en"), (5L, "w w", "en"))
      .toDF("doc_id", "text", "lang")
    val gotTie = Corpus.packBfd(tie, budget = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin")).toMap
    gotTie shouldBe Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 1)
    // an oversize doc (12 > 10) gets its own bin and nothing joins it
    val over = Seq(
      (1L, Seq.fill(12)("w").mkString(" "), "en"),
      (2L, "w w w", "en"), (3L, "w w w", "en"))
      .toDF("doc_id", "text", "lang")
    val gotOver = Corpus.packBfd(over, budget = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin")).toMap
    gotOver(1L) shouldBe 0
    gotOver(2L) should not be 0
    gotOver(3L) shouldBe gotOver(2L) // 3+3 share the second bin
  }

  test("q119 BFD on the real corpus: bins never overfill, every doc packed once, lower bound holds") {
    val d = tables.documents
    val rows = Corpus.packBfd(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Int]("bin")))
    rows.length.toLong shouldBe d.count()
    rows.map(_._3).distinct.length shouldBe rows.length
    rows.groupBy(t => (t._1, t._2)).foreach { case ((_, _), shard) =>
      val byBin = shard.groupBy(_._5)
      // a bin is over budget ONLY as an oversize singleton
      byBin.values.foreach { bin =>
        val tot = bin.map(_._4).sum
        if (tot > Corpus.DefaultPackBudget) bin.length shouldBe 1
      }
      // information-theoretic floor: can't use fewer bins than the
      // token total demands
      val lb = math.ceil(shard.map(_._4).sum.toDouble / Corpus.DefaultPackBudget).toInt
      byBin.size should be >= lb
      // bin ids dense from 0
      byBin.keySet shouldBe (0 until byBin.size).toSet
    }
    // pure function of the input: re-runs identical
    val again = Corpus.packBfd(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Int]("bin")))
    again.sorted shouldBe rows.sorted
  }

  test("q40 chunking: a doc starts in the chunk its running offset lands in") {
    // three docs of 5 tokens each, budget 8:
    // offsets 0, 5, 10 -> chunks 0, 0, 1
    val five = "a b c d e"
    val d = docs((1L, five, "en"), (2L, five, "en"), (3L, five, "en"))
    val rows = Corpus.packSequences(d, budget = 8).collect()
      .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("chunk_tokens"))).sortBy(_._1)
    rows shouldBe Array((0, 2L, 10L), (1, 1L, 5L))
  }

  test("q40 packs per language independently") {
    val five = "a b c d e"
    val d = docs((1L, five, "en"), (2L, five, "fr"))
    val rows = Corpus.packSequences(d, budget = 8).collect()
    rows.length shouldBe 2 // one chunk 0 per lang
    rows.map(_.getAs[Int]("chunk_id")).toSet shouldBe Set(0)
  }

  test("q72 sharded packing equals q40 row-for-row on the real corpus") {
    val d = tables.documents
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("chunk_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("chunk_tokens"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      .sortBy(t => (t._1, t._2))
    // shardSize 64 -> multiple shards at test SF: the PARALLEL path,
    // not a degenerate single-shard run
    val maxId = d.agg(org.apache.spark.sql.functions.max("doc_id"))
      .collect().head.getLong(0)
    assert(maxId / 64 >= 2, "corpus too small to exercise multiple shards")
    rows(Corpus.packSequencesSharded(d, shardSize = 64)) shouldBe
      rows(Corpus.packSequences(d))
    // and with a shard boundary mid-chunk (tiny shards), still identical
    rows(Corpus.packSequencesSharded(d, shardSize = 3)) shouldBe
      rows(Corpus.packSequences(d))
  }

  test("q53 sliding chunks: overlap geometry, short-doc single chunk, exact slices") {
    val text40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val d = docs((1L, text40, "en"), (2L, "a b c", "en"))
    val rows = Corpus.chunkSliding(d, window = 32, stride = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(r => (r._1, r._2))
    // 40 tokens @ w32/s16 -> 2 chunks: [1..32] and [17..40]
    rows.map(r => (r._1, r._2, r._3, r._4)) shouldBe Array(
      (1L, 0, 0, 32), (1L, 1, 16, 24), (2L, 0, 0, 3))
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows(0)._5 shouldBe h((1 to 32).map(i => s"t$i").mkString(" "))
    rows(1)._5 shouldBe h((17 to 40).map(i => s"t$i").mkString(" "))
    rows(2)._5 shouldBe h("a b c")
  }

  test("q53 consecutive chunks overlap by window - stride tokens (no content lost)") {
    val d = docs((1L, (1 to 100).map(i => s"w$i").mkString(" "), "en"))
    val rows = Corpus.chunkSliding(d, window = 32, stride = 16).collect()
      .map(r => (r.getInt(2), r.getInt(3))).sortBy(_._1)
    // starts advance by exactly the stride; union covers every token
    rows.map(_._1) shouldBe (0 until rows.length).map(_ * 16).toArray
    val covered = rows.map { case (s, n) => s until (s + n) }
      .foldLeft(Set.empty[Int])(_ ++ _)
    covered shouldBe (0 until 100).toSet
  }

  test("q37/q38 are single-scan: no shuffle (Exchange) in the plan") {
    val p1 = planOf(Corpus.piiRedact(tables.documents))
    val p2 = planOf(Corpus.sampleStratified(tables.documents))
    p1 should not include "Exchange"
    p2 should not include "Exchange"
  }
}

/** q39 as-of join semantics on a hand-built timeline. */
class AsofSpec extends SparkSpec {

  private def events(rows: (Long, String, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(F.col("event_id"), F.to_timestamp(F.col("ts_s")).as("ts"),
        F.col("user_id"), F.col("event_type"))
  }

  test("q39 picks the latest STRICTLY-earlier action; equal-ts action excluded") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:05:00", 1L, "view"),
      (3L, "2024-01-01 10:05:00", 1L, "error"), // ties with action 2: excluded
      (4L, "2024-01-01 10:10:00", 1L, "error")) // sees action 2
    val rows = Relational.asofJoin(d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("prior_action_id")))
      .sortBy(_._1)
    rows shouldBe Array((3L, 1L), (4L, 2L))
  }

  test("q39 error with no prior action is dropped; ts ties dedupe by max event_id") {
    val d = events(
      (9L, "2024-01-01 09:00:00", 2L, "error"),  // nothing earlier -> dropped
      (10L, "2024-01-01 10:00:00", 2L, "view"),
      (11L, "2024-01-01 10:00:00", 2L, "click"), // same ts: 11 wins
      (12L, "2024-01-01 11:00:00", 2L, "error"))
    val rows = Relational.asofJoin(d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("prior_action_id"),
        r.getAs[Long]("gap_us")))
    rows shouldBe Array((12L, 11L, 3600L * 1000000L))
  }

  test("q39 never crosses users") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 11:00:00", 2L, "error")) // user 2 has no actions
    Relational.asofJoin(d).collect() shouldBe empty
  }

  test("q39 plan: ONE exchange keyed by user (union-and-sweep, no range join)") {
    val plan = planOf(Relational.asofJoin(tables.events))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q77 zOrderKey interleaves x into even bits, y into odd") {
    import spark.implicits._
    val r = Seq((255, 0), (0, 255), (3, 1), (255, 255))
      .toDF("x", "y")
      .select(Corpus.zOrderKey(F.col("x"), F.col("y")).as("z"))
      .collect().map(_.getInt(0))
    r shouldBe Array(0x5555, 0xAAAA, 7, 0xFFFF)
  }

  test("q77 buckets bound both dimensions: char span <= range/4, single lang per bucket") {
    import spark.implicits._
    // 2 langs x 400 lengths -> normalized codes fill both 8-bit dims
    val d = (0 until 800).map { i =>
      (i.toLong, "txt", if (i % 2 == 0) "en" else "de", 100L + (i / 2))
    }.toDF("doc_id", "text", "lang", "n_chars")
    val out = Corpus.layoutZOrder(d, nBuckets = 16).collect()
    out.map(_.getAs[Long]("n_docs")).sum shouldBe 800L
    // 16 buckets = top-2 bits of each dim; with 2 langs the scaled lang
    // codes are 0 and 128, so every bucket is single-language...
    all(out.map(_.getAs[Long]("n_langs"))) shouldBe 1L
    // ...and the char span of any bucket is at most a quarter of the
    // full range (the two-dimensional pruning guarantee)
    val span = (400 + 1) / 4.0
    all(out.map(r => (r.getAs[Long]("max_chars") - r.getAs[Long]("min_chars")).toDouble)) should be <= span
  }

  test("q77 rejects a non-power-of-two bucket count") {
    an[IllegalArgumentException] should be thrownBy
      Corpus.layoutZOrder(tables.documents, nBuckets = 12)
  }

  test("q77 writeZOrdered: written files carry prunable bounds on both dimensions") {
    import spark.implicits._
    val d = (0 until 1600).map { i =>
      (i.toLong, "txt", if (i % 2 == 0) "en" else "de", 100L + (i / 2))
    }.toDF("doc_id", "text", "lang", "n_chars")
    val out = java.nio.file.Files.createTempDirectory("zorder_").toString
    Corpus.writeZOrdered(d, out, nFiles = 8)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    files.length should be >= 4
    // per-file stats, read back exactly as a footer-pruning scan would
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(F.min("n_chars"), F.max("n_chars"), F.countDistinct("lang"))
        .head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // lang occupies the z-key's top bit (2 langs -> codes 0/128), so
    // range partitioning separates languages: at most ONE boundary
    // file mixes them -> a lang-filtered scan skips ~half the files
    stats.count(_._3 > 1) should be <= 1
    // and within a language run, files cover disjoint length slices:
    // every single-lang file spans at most half the global char range
    val span = 800 / 2
    all(stats.filter(_._3 == 1).map(s => s._2 - s._1)) should be <= span.toLong
  }
}

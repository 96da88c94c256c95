package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** q41 repetition signals, q44 TF-IDF top terms, and the q42/q43
  * report shapes on hand-built inputs with known ground truth. */
class TextStatsSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("q41 repetition ratios on a known document") {
    // tokens: [a, a, a, b] -> top token 3/4
    // 2-grams: ["a a", "a a", "a b"] -> top 2/3, dup slots (3-2)/3
    val r = TextOps.repetitionSignals(docs((1L, "a a a b", "en"))).collect().head
    r.getAs[Double]("top_tok_frac") shouldBe 3.0 / 4.0
    r.getAs[Double]("top_2gram_frac") shouldBe 2.0 / 3.0
    r.getAs[Double]("dup_2gram_frac") shouldBe 1.0 / 3.0
  }

  test("q41 no repetition -> top fractions are 1/n, dup fraction 0") {
    val r = TextOps.repetitionSignals(docs((1L, "w x y z", "en"))).collect().head
    r.getAs[Double]("top_tok_frac") shouldBe 0.25
    r.getAs[Double]("top_2gram_frac") shouldBe 1.0 / 3.0
    r.getAs[Double]("dup_2gram_frac") shouldBe 0.0
  }

  test("q41 single-token document: no 2-gram slots, zero fractions") {
    val r = TextOps.repetitionSignals(docs((1L, "solo", "en"))).collect().head
    r.getAs[Double]("top_tok_frac") shouldBe 1.0
    r.getAs[Double]("top_2gram_frac") shouldBe 0.0
    r.getAs[Double]("dup_2gram_frac") shouldBe 0.0
  }

  test("q67 heuristic filter fires each rule in its documented order") {
    val filler = Seq.fill(56)("word")
    val d = docs(
      (1L, "tiny doc here", "en"),                                          // word_count
      (2L, Seq.fill(60)("ab").mkString(" "), "en"),                         // mean len 2
      (3L, (Seq.fill(53)("word") ++ Seq.fill(7)("####")).mkString(" "), "en"), // 28 symbols / 60 words
      (4L, Seq.fill(60)("1234").mkString(" "), "en"),                       // no alpha chars
      (5L, Seq.fill(60)("word").mkString(" "), "en"),                       // zero stopwords
      (6L, (Seq("the", "be", "lorem", "ipsum") ++ filler).mkString(" "), "en"),
      (7L, (Seq("the", "be", "{x}") ++ Seq.fill(57)("word")).mkString(" "), "en"),
      (8L, (Seq("the", "be") ++ Seq.fill(58)("word")).mkString(" "), "en")) // clean
    val r = TextOps.heuristicFilter(d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(6), Option(x.getString(7))))).toMap
    r(1L) shouldBe ((0, Some("word_count")))
    r(2L) shouldBe ((0, Some("mean_word_len")))
    r(3L) shouldBe ((0, Some("symbol_ratio")))
    r(4L) shouldBe ((0, Some("alpha_frac")))
    r(5L) shouldBe ((0, Some("stopwords")))
    r(6L) shouldBe ((0, Some("lorem_ipsum")))
    r(7L) shouldBe ((0, Some("braces")))
    r(8L) shouldBe ((1, None))
  }

  test("q68 coverage curve ranks by frequency and accumulates to 1.0") {
    // 10 tokens total: a x4, b x3, c x2, d x1
    val d = docs((1L, "a a b c", "en"), (2L, "a a b b c d", "en"))
    val rows = TextOps.vocabCoverage(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows shouldBe Array(
      (1L, "a", 4L, 0.4), (2L, "b", 3L, 0.7), (3L, "c", 2L, 0.9),
      (4L, "d", 1L, 1.0))
  }

  test("q68 frequency ties order by token and topV caps the curve") {
    val d = docs((1L, "z y z y x", "en"))
    val rows = TextOps.vocabCoverage(d, topV = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows shouldBe Array((1L, "y"), (2L, "z")) // y before z on the 2-2 tie
  }

  test("q44 scores shared terms down by cross-language spread") {
    // "common" appears in both langs (df=2); "only" in one (df=1)
    val d = docs(
      (1L, "common common only", "en"),
      (2L, "common stuff", "fr"))
    val rows = TextOps.tfidfTopTerms(d, k = 10).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score")))
    val en = rows.filter(_._1 == "en").sortBy(_._2)
    // en: common tf=2 df=2 score=1.0; only tf=1 df=1 score=1.0
    en should contain(("en", "common", 2L, 2L, 1.0))
    en should contain(("en", "only", 1L, 1L, 1.0))
    val fr = rows.filter(_._1 == "fr")
    fr should contain(("fr", "stuff", 1L, 1L, 1.0))
    fr should contain(("fr", "common", 1L, 2L, 0.5))
  }

  test("q44 candidate prune is exact: pruned path equals the full-window fallback") {
    // pruneMinDocs=0 forces the 100 TB pruned shape (the default takes
    // the classic window below the doc threshold); identical rows
    // proves the tf_k/|langs| prune never drops a term that could rank
    // (the scaladoc's bound)
    val pruned = TextOps.tfidfTopTerms(tables.documents, k = 7, pruneMinDocs = 0L).collect()
    val full = TextOps.tfidfTopTerms(tables.documents, k = 7).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("lang"), r.getAs[Int]("rnk"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score"))
    pruned.map(key).toSet shouldBe full.map(key).toSet
  }

  test("q44 null-lang docs survive the pruned path identically to the classic shape") {
    import spark.implicits._
    val d = Seq(
      (1L, "common common only", Some("en")),
      (2L, "common stuff", Some("fr")),
      (3L, "orphan words here", Option.empty[String])
    ).toDF("doc_id", "text", "lang")
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.getString(0)), r.getInt(5), r.getString(1), r.getLong(2), r.getLong(3))
    val pruned = TextOps.tfidfTopTerms(d, k = 5, pruneMinDocs = 0L).collect().map(key).toSet
    val classic = TextOps.tfidfTopTerms(d, k = 5).collect().map(key).toSet
    pruned shouldBe classic
    // the NULL-lang stratum is present in both
    classic.exists(_._1.isEmpty) shouldBe true
  }

  test("q44 keeps at most k terms per language, ranked score desc then term") {
    val rows = TextOps.tfidfTopTerms(tables.documents, k = 5).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.values.foreach { rs =>
      rs.length should be <= 5
      val ranked = rs.sortBy(_.getAs[Int]("rnk"))
      ranked.map(_.getAs[Int]("rnk")).toSeq shouldBe (1 to rs.length)
      // scores never increase as rank grows
      val scores = ranked.map(_.getAs[Double]("score")).toSeq
      scores.zip(scores.tail).foreach { case (a, b) => a should be >= b }
    }
  }

  test("q42 rollup emits detail, per-day subtotal, and grand total levels") {
    val rows = Analytics.rollupReport(tables.events).collect()
    val grand = rows.filter(r => r.getAs[Int]("g_date") == 1 && r.getAs[Int]("g_type") == 1)
    grand.length shouldBe 1
    val total = rows.filter(r => r.getAs[Int]("g_date") == 0 && r.getAs[Int]("g_type") == 0)
      .map(_.getAs[Long]("n_events")).sum
    grand.head.getAs[Long]("n_events") shouldBe total
    // per-day subtotals equal the sum of that day's detail rows
    val subtotals = rows.filter(r => r.getAs[Int]("g_date") == 0 && r.getAs[Int]("g_type") == 1)
    subtotals.foreach { st =>
      val day = st.getAs[java.sql.Date]("event_date")
      val detail = rows.filter(r => r.getAs[Int]("g_type") == 0 &&
        r.getAs[java.sql.Date]("event_date") == day)
      st.getAs[Long]("n_events") shouldBe detail.map(_.getAs[Long]("n_events")).sum
    }
  }

  test("q43 pivot cells sum to the day's event count; absent combos are 0") {
    val pivoted = Analytics.eventPivot(tables.events).collect()
    val daily = Analytics.dailySummary(tables.events).collect()
      .map(r => r.getAs[java.sql.Date]("event_date") -> r.getAs[Long]("n_events")).toMap
    pivoted.foreach { r =>
      val cells = Seq("click", "error", "purchase", "signup", "view")
        .map(c => r.getAs[Long](c))
      cells.foreach(_ should be >= 0L)
      cells.sum shouldBe daily(r.getAs[java.sql.Date]("event_date"))
    }
  }

  test("q43 vocabulary is the caller's contract; assertCoverage fails on undeclared types") {
    // a narrowed vocabulary still runs (undeclared types excluded)...
    val narrow = Analytics.eventPivot(tables.events, Seq("click", "error"))
    narrow.columns shouldBe Array("event_date", "click", "error")
    // ...but assertCoverage fails loudly when the query RUNS — the
    // check is an in-plan assert_true in the pivot's own scan (one
    // scan total), so the failure surfaces at action time
    val ex = intercept[Exception] {
      Analytics.eventPivot(tables.events, Seq("click", "error"), assertCoverage = true)
        .collect()
    }
    ex.getMessage should include("outside the declared vocabulary")
    // the full declared vocabulary passes the coverage assertion
    Analytics.eventPivot(tables.events, assertCoverage = true)
      .columns.length shouldBe 6
  }

  test("q43 assertCoverage flags NULL event types instead of silently dropping them") {
    import spark.implicits._
    // !isin(...) is NULL for NULL input, so a bare negation filter drops
    // these rows — yet the pivot also excludes them from every column
    // (round-7 ADVICE: that silently violated the fail-loudly contract)
    val withNull = Seq(
      (1L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 11:00:00", null)
    ).toDF("event_id", "ts", "event_type")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp($"ts"))
    val ex = intercept[Exception] {
      Analytics.eventPivot(withNull, Seq("click"), assertCoverage = true).collect()
    }
    ex.getMessage should include("<NULL>")
  }

  test("q61 exact prune drops the worst floor(frac·n) of each language stratum") {
    import spark.implicits._
    val d = Seq(
      (1L, "x x x x x x x x", "en", 40L),
      (2L, "a b a b a b a b", "en", 80L),
      (3L, "a b c d e f g h", "en", 200L),
      (4L, "u v w x y z q r", "en", 500L),
      (5L, "m n o p q r s t", "en", 300L),
      (10L, "k k k k", "de", 20L),
      (11L, "k l m n", "de", 400L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val scores = TextOps.qualityScore(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    // en: n=5 → floor(0.2·5)=1 → exactly the worst-(quality, doc_id)
    // drops; de: n=2 → floor(0.2·2)=0 → the whole stratum survives
    val enWorst = List(1L, 2L, 3L, 4L, 5L).minBy(id => (scores(id), id))
    val out = TextOps.qualityPrune(d).collect().map(_.getLong(0)).toSet
    out shouldBe (Set(1L, 2L, 3L, 4L, 5L, 10L, 11L) - enWorst)
  }

  test("q61 approx path: threshold filter without a window, near the exact cut") {
    val d = tables.documents
    planOf(TextOps.qualityPrune(d, approx = true)) should not include "Window"
    val exact = TextOps.qualityPrune(d).count()
    val appr = TextOps.qualityPrune(d, approx = true).count()
    // approx keeps every row at-or-above the sketch's frac-quantile
    // VALUE: identical cut up to ties/rank error at the boundary
    (appr - exact).abs should be <= (exact / 20 + 5)
  }

  test("q62 winnowing: density below 1, shared >= w+k-1 token runs always collide") {
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 = w+k-1 tokens
    val d = docs(
      (1L, s"one two $shared three four five six seven", "en"),
      (2L, s"totally different prefix words $shared and another tail", "en"),
      (3L, "unrelated content entirely here with many other words", "en"),
      (4L, "a b", "en"))                                 // < k tokens → no fps
    val fps = TextOps.winnowFingerprints(d).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySet = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bySet.contains(4L) shouldBe false
    // winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint
    (bySet(1L) & bySet(2L)) should not be empty
    (bySet(1L) & bySet(3L)) shouldBe empty
    // density: selected fingerprints ≤ k-gram count, and strictly fewer
    // when there are more windows than distinct minima
    val nGrams1 = d.filter(org.apache.spark.sql.functions.expr("doc_id = 1"))
      .selectExpr("size(split(text, ' ')) - 2 AS n").collect().head.getInt(0)
    bySet(1L).size should be < nGrams1
  }

  test("q62 winnowing: a 3-token doc yields exactly its single k-gram hash") {
    val d = docs((9L, "alpha beta gamma", "en"))
    val fps = TextOps.winnowFingerprints(d).collect().map(_.getString(1))
    fps.length shouldBe 1
    fps.head shouldBe java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("q116 mixed-language detection: segment verdicts, switches, dominant, und refinement") {
    import spark.implicits._
    // seg 0: 16 'en' markers; seg 1: 16 'fr' markers; seg 2: 16
    // markerless tokens (und). Switches: en->fr, fr->und = 2.
    val mixed = (Seq.fill(16)("the") ++ Seq.fill(16)("join") ++
      Seq.fill(16)("zzz")).mkString(" ")
    val pure = Seq.fill(20)("the").mkString(" ")          // 2 segs, both en
    val d = Seq((1L, mixed, "en"), (2L, pure, "en"), (3L, "zzz yyy", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.langMixDetect(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getBoolean(5))).toMap
    out(1L) shouldBe (3L, 1L, "en", 2L, true)   // en beats fr on (count, lang asc)? both 1 seg — tie → 'en' < 'fr' asc
    out(2L) shouldBe (2L, 0L, "en", 0L, false)
    out(3L) shouldBe (1L, 1L, "und", 0L, false) // no evidence: und, NOT q27's forced 'en'
  }

  test("q116 dominant ties break by count desc then language asc, like the oracle") {
    import spark.implicits._
    // 1 en seg vs 2 fr segs: fr dominates despite en precedence in q27
    val t = (Seq.fill(16)("the") ++ Seq.fill(32)("join")).mkString(" ")
    val d = Seq((1L, t, "en")).toDF("doc_id", "text", "lang")
    val r = TextOps.langMixDetect(d).collect().head
    r.getString(3) shouldBe "fr"
    r.getBoolean(5) shouldBe true
  }

  test("q54 OOV rate against a known top-V vocabulary with deterministic ties") {
    // counts: a=3, b=1, c=1, d=1 -> top-2 by (cnt desc, tok asc) = {a, b}
    val d = docs((1L, "a a b", "en"), (2L, "a c d", "en"))
    val rows = TextOps.oovRate(d, vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    rows shouldBe Array((1L, 3L, 0L, 0.0), (2L, 3L, 2L, 0.6667))
  }

  test("q54 full-vocabulary corpus has zero OOV everywhere") {
    val d = docs((1L, "x y", "en"), (2L, "y x", "en"))
    TextOps.oovRate(d, vocabSize = 10).collect()
      .foreach(r => r.getLong(2) shouldBe 0L)
  }

  test("q41 is single-scan (no Exchange); q43 reads the source once") {
    planOf(TextOps.repetitionSignals(tables.documents)) should not include "Exchange"
    // declared pivot values -> no driver-side distinct-collect pass:
    // ONE scan of events feeding the standard two-phase aggregation
    // ((date, type) partial -> date pivot), never a second read.
    val p = planOf(Analytics.eventPivot(tables.events))
    "Scan parquet".r.findAllIn(p).length shouldBe 1
    "Exchange".r.findAllIn(p).length should be <= 2
  }

  test("q74 novelty: duplicated docs score 0, unique docs 1, overlaps in between") {
    // docs 1/2 are verbatim copies (every shingle df>=2 -> novelty 0);
    // doc 3 shares nothing (novelty 1); doc 4 shares a 4-token prefix
    // with doc 5's text but diverges after
    val a = "alpha bravo charlie delta echo foxtrot"
    val d = docs(
      (1L, a, "en"), (2L, a, "en"),
      (3L, "golf hotel india juliet kilo lima", "en"),
      (4L, "mike november oscar papa quebec romeo", "en"),
      (5L, "mike november oscar papa sierra tango", "en"))
    val rows = TextOps.noveltyScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    rows(0) shouldBe ((1L, 4L, 0L, 0.0))
    rows(1) shouldBe ((2L, 4L, 0L, 0.0))
    rows(2) shouldBe ((3L, 4L, 4L, 1.0))
    // docs 4/5: 6 tokens -> 4 trigrams each; the first 2 trigrams
    // ("mike november oscar", "november oscar papa") are shared (df 2),
    // the last 2 diverge -> novelty 2/4 = 0.5
    rows(3) shouldBe ((4L, 4L, 2L, 0.5))
    rows(4) shouldBe ((5L, 4L, 2L, 0.5))
  }

  test("q89 model filter: learned-weights contract — lookup, OOV=0, integer verdict") {
    import spark.implicits._
    val d = Seq(
      (1L, "good good bad"),     // 3+3-5 = 1  -> keep
      (2L, "bad bad good"),      // -5-5+3 = -7 -> drop
      (3L, "oovword good"),      // 0+3 = 3    -> keep (OOV weighs 0)
      (4L, "zero zero")          // 0          -> keep (>= 0 inclusive)
    ).toDF("doc_id", "text")
    val weights = Seq(("good", 3L), ("bad", -5L), ("zero", 0L)).toDF("tok", "wgt")
    val out = TextOps.modelFilter(d, weights = Some(weights)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    out(1L) shouldBe ((3L, 1L, 1.0 / 3.0, true))
    out(2L) shouldBe ((3L, -7L, -7.0 / 3.0, false))
    out(3L) shouldBe ((2L, 3L, 1.5, true))
    out(4L) shouldBe ((2L, 0L, 0.0, true))
    // a malformed model frame fails loudly
    intercept[IllegalArgumentException] {
      TextOps.modelFilter(d, weights = Some(Seq(("good", 1L)).toDF("word", "w")))
    }
    // ...and so does a doubled model key (it would fan out the join)
    val ex = intercept[IllegalArgumentException] {
      TextOps.modelFilter(d,
        weights = Some(Seq(("good", 3L), ("good", 2L)).toDF("tok", "wgt")))
    }
    ex.getMessage should include("duplicate tok")
  }

  test("q95 trainModel learns the label signal on a corpus with known class vocabulary") {
    import spark.implicits._
    // two disjoint content vocabularies + shared filler: positives say
    // 'signal', negatives say 'noise'. The labels are supplied
    // explicitly, so the expected sign of every weight is known.
    val d = (0L until 40L).map { i =>
      val w = if (i % 2 == 0) "signal" else "noise"
      (i, s"$w filler common $w words", i % 2 == 0)
    }
    val docs = d.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val labels = d.map(t => (t._1, t._3)).toDF("doc_id", "label")
    val model = TextOps.trainModel(docs, vocabSize = 16,
        labels = Some(labels))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    model("signal") shouldBe 1L
    model("noise") shouldBe -1L
    // tokens at identical rates in both classes vote zero
    model("filler") shouldBe 0L
    model("common") shouldBe 0L
    // ...and serving the trained model recovers the labels exactly
    // (separable corpus — the classifier must fit it)
    val served = TextOps.modelFilter(docs,
        weights = Some(TextOps.trainModel(docs, vocabSize = 16,
          labels = Some(labels))))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    d.foreach { case (id, _, lab) => served(id) shouldBe lab }
  }

  test("q95 default labels distill the quality heuristic; model persistence round-trips") {
    val docs = tables.documents
    // the declared query agrees with the composition it names
    val direct = TextOps.trainThenFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val composed = TextOps.modelFilter(docs,
        weights = Some(TextOps.trainModel(docs)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    direct shouldBe composed
    // the trained model must actually track its training labels
    // better than chance: agreement of keep-verdict with the label
    // on the training corpus > the majority-class base rate
    val labels = TextOps.labelByQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val keeps = TextOps.trainThenFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val agree = labels.count { case (id, l) => keeps(id) == l }.toDouble / labels.size
    val base = math.max(labels.count(_._2), labels.size - labels.count(_._2))
      .toDouble / labels.size
    withClue(s"agreement=$agree base=$base: ") { agree should be > base }
    // persistence: write -> read -> identical serving verdicts;
    // corrupt artifacts fail at read
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    val model = TextOps.trainModel(docs)
    TextOps.writeModel(model, s"$dir/model.parquet")
    val back = TextOps.readModel(spark, s"$dir/model.parquet")
    TextOps.modelFilter(docs, weights = Some(back)).collect().toSeq shouldBe
      TextOps.modelFilter(docs, weights = Some(model)).collect().toSeq
    val exStamp = intercept[IllegalArgumentException] {
      TextOps.readModel(spark, s"$dir/model.parquet", vocabSize = 64)
    }
    exStamp.getMessage should include("vocabSize")
    import org.apache.spark.sql.functions.lit
    model.limit(5).union(model.limit(5))
      .withColumn("_p_vocab", lit(512))
      .write.mode("overwrite").parquet(s"$dir/model_bad.parquet")
    val exDup = intercept[IllegalArgumentException] {
      TextOps.readModel(spark, s"$dir/model_bad.parquet")
    }
    exDup.getMessage should include("duplicate")
    // a stamp that disagrees with how the model was ACTUALLY trained
    // dies at WRITE (the model carries its own cut as metadata) —
    // trainModel(16) + writeModel(default 512) was the round-13
    // advice's silent geometry lie
    val small = TextOps.trainModel(docs, vocabSize = 16)
    val exWrite = intercept[IllegalArgumentException] {
      TextOps.writeModel(small, s"$dir/model16.parquet") // default 512
    }
    exWrite.getMessage should include("training cut 16")
    // the matching stamp round-trips
    TextOps.writeModel(small, s"$dir/model16.parquet", vocabSize = 16)
    TextOps.readModel(spark, s"$dir/model16.parquet", vocabSize = 16)
      .count().toInt should be <= 16
  }

  test("q74 plan: one corpus scan, df via window (no groupBy+join diamond)") {
    val p = planOf(TextOps.noveltyScore(tables.documents))
    "Scan parquet".r.findAllIn(p).length shouldBe 1
  }
}

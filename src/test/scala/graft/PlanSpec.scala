package graft

import graft.operators.{Analytics, Dedup, Etl, Relational, Similarity, TextOps}

/** Plan-shape assertions: the properties that make each operator
  * scale-safe (broadcasts present, pushdown reaching the scan, top-k
  * instead of global sort, bucketed joins instead of cross products)
  * are pinned here so a refactor can't silently regress them. */
class PlanSpec extends SparkSpec {

  test("q14 star join broadcasts every dim — no sort-merge join") {
    val t = tables
    val plan = planOf(Relational.regionRevenue(t.lineitem, t.supplier, t.nation, t.region))
    plan.split("BroadcastHashJoin").length - 1 should be >= 3
    plan should not include "SortMergeJoin"
  }

  test("q06 failure filter is pushed into the parquet scan and prunes columns") {
    val plan = planOf(Analytics.failedEvents(tables.events))
    plan should include regex "PushedFilters: \\[.*EqualTo\\(event_type,error\\)"
    // projection pruning: the untouched props column never leaves the scan
    plan should not include "props"
  }

  test("q08 unnest-joins through a real Generate (explode), Athena CROSS JOIN UNNEST shape") {
    val plan = planOf(Analytics.correlationJoin(tables.events))
    plan should include ("Generate")
    plan should include ("BroadcastHashJoin")
  }

  test("q11 peak top-k plans as TakeOrderedAndProject, not a global sort") {
    planOf(Analytics.peakHours(tables.events)) should include ("TakeOrderedAndProject")
  }

  test("q01 normalize is a pure narrow projection — no shuffle, no sort") {
    val plan = planOf(Etl.ingestNormalize(tables.events))
    plan should not include "Exchange"
    plan should not include "Sort"
  }

  test("q13 broadcasts the filtered customer dim") {
    val t = tables
    val plan = planOf(Relational.shippingPriority(t.customer, t.orders, t.lineitem))
    plan should include ("BroadcastHashJoin")
    plan should include ("TakeOrderedAndProject")
  }

  test("q21 inverted index is join-free — group + local pair expansion only") {
    val plan = planOf(Dedup.ngramJaccardPairs(tables.documents))
    plan should not include "Join"
    plan should include ("Generate")
  }

  test("q22 minhash candidate join is bucket-keyed — never a cross product") {
    val plan = planOf(Dedup.minhashLshPairs(tables.documents))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q45 incremental probe is a bk-keyed equi-join — never batch × corpus") {
    import org.apache.spark.sql.functions.col
    val d = tables.documents
    val plan = planOf(Dedup.incrementalMinhashPairs(
      d.filter(col("doc_id") % 10 =!= 9), d.filter(col("doc_id") % 10 === 9)))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q42 rollup is ONE Expand + one shuffled aggregation, not three scans") {
    val plan = planOf(Analytics.rollupReport(tables.events))
    plan should include ("Expand")
    "Scan parquet".r.findAllIn(plan).length shouldBe 1
    "Exchange".r.findAllIn(plan).length shouldBe 1
  }

  test("q44 default (small corpus) keeps the classic one-scan window shape") {
    val plan = planOf(operators.TextOps.tfidfTopTerms(tables.documents))
    "Scan parquet".r.findAllIn(plan).length shouldBe 1
    plan should not include "CartesianProduct"
    // partial aggregation runs map-side before the first shuffle, so
    // the windows operate on the vocabulary, not the token stream
    plan should include regex "HashAggregate.*partial_count"
  }

  test("q44 pruned (100 TB) shape: broadcast-bounded df stage, no vocab merge join") {
    // the tf frame is localCheckpointed (so no parquet re-scan in the
    // final plan) and df is computed only for the exactly-pruned
    // candidate set: the vocabulary reaches the term-keyed aggregate
    // through a BROADCAST join of the candidate terms — never through
    // a sort-merge join or an unbounded full-vocabulary window
    val plan = planOf(operators.TextOps.tfidfTopTerms(tables.documents, pruneMinDocs = 0L))
    plan should not include "Scan parquet" // checkpointed tf, single upstream pass
    plan should not include "CartesianProduct"
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q43 assertCoverage is in-plan: one scan, no pre-flight driver action") {
    val plan = planOf(operators.Analytics.eventPivot(tables.events, assertCoverage = true))
    "Scan parquet".r.findAllIn(plan).length shouldBe 1
    // assert_true lowers to a conditional raise_error in the filter
    plan should include ("raise_error")
  }

  test("q23 simhash candidate join is bucket-keyed — never a cross product") {
    val plan = planOf(Dedup.simhashPairs(tables.documents))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q26 ANN-LSH candidate join is bucket-keyed — never a cross product") {
    val plan = planOf(Similarity.annLsh(tables.embeddings))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q25 exact ANN is the explicitly-chosen broadcast nested loop") {
    // the one place an n·m compare is intended: queries are broadcast
    planOf(Similarity.annBruteForce(tables.embeddings)) should include ("BroadcastNestedLoopJoin")
  }

  test("q31 status resolution is a partial agg — one shuffle, no window sort") {
    val plan = planOf(Etl.statusLatest(tables.events))
    plan should not include "Window"
    plan.split("Exchange").length - 1 shouldBe 1
  }

  test("q24/q25/q26 dot products are the compact native expression (no 64-term chains)") {
    // the janino 64 KB regression guard: a graft_dot node in the plan
    // means the fused-loop expression is in use, not an element_at chain
    planOf(Similarity.embeddingNearDups(tables.embeddings)) should include ("graft_dot")
    planOf(Similarity.annBruteForce(tables.embeddings)) should include ("graft_dot")
  }

  test("q47 decontamination broadcasts the eval index — the corpus is never shuffled by shingle") {
    val docs = tables.documents
    val plan = planOf(Dedup.decontaminateNgram(docs,
      docs.filter(org.apache.spark.sql.functions.expr("doc_id % 7 = 0"))))
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q58 bloom prefilter probes inside the corpus scan stage — before any exchange") {
    val docs = tables.documents
    val plan = planOf(TextOps.decontaminateBloom(docs,
      docs.filter(org.apache.spark.sql.functions.expr("doc_id % 7 = 0"))))
    // the codegen'd sketch probe is in the plan as a Filter predicate…
    plan should include ("graft_bloom_might_contain")
    // …and sits below the join: the corpus-side Filter carrying it must
    // not be separated from the scan by an Exchange (map-side kill)
    val corpusSide = plan.substring(plan.indexOf("graft_bloom_might_contain"))
    corpusSide.indexOf("Scan parquet") should be < (
      if (corpusSide.contains("Exchange")) corpusSide.indexOf("Exchange")
      else Int.MaxValue)
  }

  test("q57 semantic dedup: centroid literals, equi-join on cell — never all-pairs") {
    val plan = planOf(Similarity.semanticDedup(tables.embeddings))
    plan should include ("graft_dot")     // fused-loop centroid scores
    // cell assignment is literal-embedded (no centroid-table join), and
    // the pair pass is an EQUI-join keyed on cell — a nested-loop or
    // cartesian here would mean the n² shape this operator exists to avoid
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q63 semantic decontamination broadcasts eval — the corpus is never shuffled") {
    val e = tables.embeddings
    val plan = planOf(Similarity.semanticDecontaminate(
      e.filter(org.apache.spark.sql.functions.expr("vec_id % 7 <> 0")),
      e.filter(org.apache.spark.sql.functions.expr("vec_id % 7 = 0"))))
    plan should include ("graft_dot")
    plan should include ("BroadcastNestedLoopJoin")
    plan should not include "SortMergeJoin"
  }

  test("q79 bucketed decontamination joins on cell — the corpus is never shuffled by vector") {
    val e = tables.embeddings
    val plan = planOf(Similarity.semanticDecontaminateBucketed(
      e.filter(org.apache.spark.sql.functions.expr("vec_id % 7 <> 0")),
      e.filter(org.apache.spark.sql.functions.expr("vec_id % 7 = 0")),
      nCells = 8))
    plan should include ("graft_dot")
    // exactly ONE nested loop in the executed plan — the corpus
    // candidate bound against the nCells-row centroid table, NEVER
    // the whole-eval broadcast this variant replaces. The eval
    // assignment (the second centroid nested loop) is materialized
    // ONCE behind a localCheckpoint at build time — the radii collect
    // and the pair join both reuse it, so it appears in the final
    // plan as a checkpointed scan, not a recomputation (the review
    // found the un-checkpointed form ran the |eval|×nCells assignment
    // twice); the pair join keys on the bounded cell id as a shuffled
    // HASH join (eval builds) — corpus candidates stream
    plan.split("BroadcastNestedLoopJoin").length - 1 shouldBe 1
    plan should not include "CartesianProduct"
    plan should include ("ShuffledHashJoin")
    plan should not include "SortMergeJoin"
    // exactly three shuffles: pair join inputs keyed by cell (×2) and
    // the flagged-row vec_id agg; the eval-sized eval_id argmax
    // shuffle ran at checkpoint time — the corpus is never
    // partitioned by vector content
    plan should not include "hashpartitioning(v#"
    plan.split("Exchange hashpartitioning").length - 1 shouldBe 3
  }

  test("q62 winnowing is one native-expression scan — zero shuffle, zero sort") {
    val plan = planOf(TextOps.winnowFingerprints(tables.documents))
    plan should include ("graft_winnow")
    plan should not include "Exchange"
    plan should not include "Sort"
  }

  test("q59 source mix broadcasts the thresholds — the corpus is never shuffled") {
    val plan = planOf(graft.operators.Corpus.sourceMix(tables.documents))
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q48 k-means reassignment is a broadcast + partial agg — no window, no sort-merge") {
    val plan = planOf(Similarity.kmeansRefine(tables.embeddings))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
    plan should include ("graft_dot")
  }

  test("q69 IVF-PQ candidate join is cell-keyed; codebook/ADC ride as broadcasts") {
    val plan = planOf(Similarity.annIvfPq(tables.embeddings))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include ("graft_dot")
  }

  test("q65 iterated k-means final pass is a broadcast argmax — no window, native dot") {
    val plan = planOf(Similarity.kmeansIterate(tables.embeddings, rounds = 1))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
    plan should include ("graft_dot")
  }

  test("q66 winnow pairs are index-local expansion — no join, no cross product") {
    val plan = planOf(Dedup.winnowPairs(tables.documents))
    plan should not include "Join"
    plan should include ("Generate")
  }

  test("q67 heuristic filter is one pure scan — zero shuffle, zero sort") {
    val plan = planOf(TextOps.heuristicFilter(tables.documents))
    plan should not include "Exchange"
    plan should not include "Sort"
    plan.split("Scan parquet").length - 1 shouldBe 1
  }

  test("q68 top-V is a TakeOrdered over ONE scan — no second pass for the total") {
    val plan = planOf(TextOps.vocabCoverage(tables.documents))
    plan should include ("TakeOrderedAndProject")
    plan.split("Scan parquet").length - 1 shouldBe 1
  }

  test("q49 profile is ONE aggregation over one scan (single shuffle)") {
    val plan = planOf(operators.Report.profile(tables.events))
    // one distinct-agg exchange + the single-row final gather
    plan.split("Exchange").length - 1 should be <= 2
    plan.split("Scan parquet").length - 1 shouldBe 1
  }

  test("q53 sliding chunker is pure per-row fan-out — no shuffle at all") {
    val plan = planOf(operators.Corpus.chunkSliding(tables.documents))
    plan should include ("Generate")   // the explode
    plan should not include "Exchange"
  }

  test("q54 OOV membership is a broadcast join — the corpus is never shuffled by token") {
    val plan = planOf(operators.TextOps.oovRate(tables.documents))
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q52 salted join keys the shuffle on (orderkey, salt) and stays output-invariant") {
    val t = tables
    val plan = planOf(Relational.saltedRevenueByStatus(t.lineitem, t.orders))
    plan should include ("_salt")   // the diffused join key is in the plan…
    val out = Relational.saltedRevenueByStatus(t.lineitem, t.orders).columns
    out should not contain "_salt_l" // …but never in the output
  }

  test("q76 snapshot diff is a union + ONE doc_id agg — no join of the two sides") {
    val d = tables.documents
    val plan = planOf(Etl.snapshotDiff(d, d))
    plan should include ("Union")
    plan should not include "Join"
    // one agg exchange + the output range sort, nothing else
    plan.split("Exchange").length - 1 should be <= 2
  }

  test("q77 z-order corpus path is scan + broadcasts — dims and stats never shuffle it") {
    val plan = planOf(operators.Corpus.layoutZOrder(tables.documents))
    plan should include ("BroadcastHashJoin")        // lang dictionary
    plan should include ("BroadcastNestedLoopJoin")  // one-row range stats
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q118 domain quota is ONE domain-keyed shuffle — no join, no global sort") {
    val plan = planOf(operators.Corpus.domainQuota(tables.documents))
    plan should not include "Join"
    plan should include ("Window")
    // one hash exchange on domain; the window sort is per-domain
    plan.split("Exchange").length - 1 shouldBe 1
  }

  test("q119 BFD packing is ONE (lang, shard)-keyed shuffle + in-group kernel — no window, no join") {
    val plan = planOf(operators.Corpus.packBfd(tables.documents))
    plan should not include "Join"
    plan should not include "Window"
    plan should include ("Generate") // the per-shard placement explode
    plan.split("Exchange").length - 1 shouldBe 1
  }

  test("q120 perplexity scoring broadcasts the LM — the corpus is never shuffled before the per-doc agg") {
    val plan = planOf(operators.Corpus.perplexityFilter(tables.documents))
    plan.split("BroadcastHashJoin").length - 1 should be >= 2 // pair + prefix frames
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q122 boilerplate strip keeps q80's single-exchange shape — no join, count window only") {
    val plan = planOf(Dedup.boilerplateStrip(tables.documents))
    plan should not include "Join"
    plan should include ("Window")
    plan should not include "CartesianProduct"
  }

  test("driver contract: no declared batch query output schema contains DecimalType") {
    // The driver's hasher canonicalizes DECIMAL differently than the
    // DuckDB replica — r14's only three oracle reds (q110/q111/s17)
    // were DECIMAL(38,0) output columns whose VALUES were verified
    // identical. Wide-decimal arithmetic stays internal; declared
    // outputs must emit a canonicalization-stable type (string for
    // past-BIGINT magnitudes). This pins the CLASS closed. Streaming
    // keys are asserted in StreamingSpec (constructing them executes
    // real streams).
    import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType     => true
      case s: StructType      => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType       => hasDecimal(a.elementType)
      case m: MapType         => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _                  => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(!_._1.startsWith("s")) // streaming: see StreamingSpec twin
      .flatMap { case (name, fn) =>
        fn(spark, SparkSpec.sfDir).schema.fields.collect {
          case f if hasDecimal(f.dataType) => s"$name.${f.name}"
        }
      }
    withClue(s"DecimalType in declared output (hash-unstable at the driver gate): " +
      s"${offenders.mkString(", ")}: ") { offenders shouldBe empty }
  }
}

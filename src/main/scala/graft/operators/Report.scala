package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Exact

/** Dataset-level reporting operators (SURVEY.md §2, q49–q50): the
  * profiling/audit queries every pipeline runs over a landed table
  * before and after processing — the Spark-native form of the
  * reference's run-report/metrics summaries (analyze_metrics.py's
  * per-run report; the manifest builder's bookkeeping counts).
  */
object Report {

  /** One profiled column: name + a renderer that turns its min/max into
    * an engine-stable string (longs cast directly; timestamps through
    * an explicit format; doubles through DECIMAL(18,2) — the same
    * renders q01 proved bit-stable against DuckDB). */
  private case class ColProfile(name: String, render: Column => Column)

  private val eventCols: Seq[ColProfile] = Seq(
    ColProfile("event_id", _.cast("string")),
    ColProfile("ts", date_format(_, "yyyy-MM-dd HH:mm:ss.SSSSSS")),
    ColProfile("user_id", _.cast("string")),
    ColProfile("event_type", identity),
    ColProfile("value", _.cast(DecimalType(18, 2)).cast("string")),
    ColProfile("props", identity))

  /** q49: per-column data-quality profile of the events table — row
    * count, null count, exact distinct count, min/max — the
    * schema-on-read audit that decides whether a landed batch is sane
    * (the reference eyeballs this via Athena; `df.summary()` gives a
    * non-deterministic variant).
    *
    * ONE aggregation over one scan: n columns × 4 metrics in a single
    * `agg`. The multiple exact `countDistinct`s rewrite through
    * Catalyst's distinct-aggregate Expand — n× map-side rows but still
    * a single shuffle, grouped by nothing (one result row), so the
    * reduce side is one task regardless of input size. At 100 TB pass
    * `exact = false` to swap the exact distincts for
    * `approx_count_distinct` (mergeable HLL++ sketches — no Expand, so
    * the map side streams each row once instead of n× replicating it;
    * ±`rsd` relative error on n_distinct, everything else unchanged).
    * Exact is the default because the oracle must value-match; the
    * approx path's plan shape (no Expand) and accuracy bound are
    * pinned in ReportSpec — the same tested-flag contract as q09→q51.
    *
    * Output: one row per column — engine-stable strings for min/max so
    * heterogeneous column types fit one schema. */
  def profile(events: DataFrame, exact: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    def distinctAgg(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd)
    val aggs = eventCols.flatMap { cp =>
      Seq(
        count(col(cp.name)).as(s"nn_${cp.name}"),
        distinctAgg(col(cp.name)).as(s"nd_${cp.name}"),
        cp.render(min(col(cp.name))).as(s"mn_${cp.name}"),
        cp.render(max(col(cp.name))).as(s"mx_${cp.name}"))
    }
    val a = events.agg(count(lit(1)).as("n_rows"), aggs: _*)
    a.select(col("n_rows"), explode(array(eventCols.map { cp =>
        struct(lit(cp.name).as("cn"), col(s"nn_${cp.name}").as("nn"),
          col(s"nd_${cp.name}").as("nd"), col(s"mn_${cp.name}").as("mn"),
          col(s"mx_${cp.name}").as("mx"))
      }: _*)).as("p"))
      .select(col("p.cn").as("col_name"), col("n_rows"),
        (col("n_rows") - col("p.nn")).as("n_null"),
        col("p.nd").as("n_distinct"),
        col("p.mn").as("min_value"), col("p.mx").as("max_value"))
  }

  /** q73: [[profile]]'s 100 TB flag, driver-certified — the same
    * pattern as q09→q51: HLL++ distinct counts are not bit-replicable
    * in DuckDB, so the declared query computes exact AND approx
    * distincts in ONE agg and emits a per-column boolean asserting the
    * sketch lands within `sigmas`·rsd of exact (HLL++ is deterministic
    * per dataset — no RNG — so the verdict is stable; 3·rsd is the
    * standard-error bound with σ to spare, and small cardinalities run
    * in HLL's exact sparse mode anyway). The exact distincts exist to
    * certify; production runs `profile(exact = false)`. */
  def profileSketchCertified(events: DataFrame, rsd: Double = 0.05,
                             sigmas: Double = 3.0): DataFrame = {
    val aggs = eventCols.flatMap { cp =>
      Seq(
        count(col(cp.name)).as(s"nn_${cp.name}"),
        countDistinct(col(cp.name)).as(s"nde_${cp.name}"),
        approx_count_distinct(col(cp.name), rsd).as(s"nda_${cp.name}"),
        cp.render(min(col(cp.name))).as(s"mn_${cp.name}"),
        cp.render(max(col(cp.name))).as(s"mx_${cp.name}"))
    }
    val a = events.agg(count(lit(1)).as("n_rows"), aggs: _*)
    a.select(col("n_rows"), explode(array(eventCols.map { cp =>
        struct(lit(cp.name).as("cn"), col(s"nn_${cp.name}").as("nn"),
          col(s"nde_${cp.name}").as("nde"), col(s"nda_${cp.name}").as("nda"),
          col(s"mn_${cp.name}").as("mn"), col(s"mx_${cp.name}").as("mx"))
      }: _*)).as("p"))
      .select(col("p.cn").as("col_name"), col("n_rows"),
        (col("n_rows") - col("p.nn")).as("n_null"),
        col("p.nde").as("n_distinct"),
        (abs(col("p.nda") - col("p.nde")) <=
          greatest(lit(1L), ceil(col("p.nde") * lit(sigmas * rsd)).cast("long")))
          .as("nd_sketch_ok"),
        col("p.mn").as("min_value"), col("p.mx").as("max_value"))
      .orderBy("col_name")
  }

  /** q50: per-language duplication report over exact content
    * fingerprints — the "how much of this corpus is duplicated"
    * number every dedup run reports before deciding rates. One scan +
    * one (lang)-keyed shuffle; `dup_frac` is [[Exact.dround]]'d (a
    * small-denominator rational — exactly the boundary case round()
    * gets wrong cross-engine). */
  def dupReport(documents: DataFrame): DataFrame =
    documents.select(col("lang"), TextOps.fingerprintCol.as("fp"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct"))
      .select(col("lang"), col("n_docs"), col("n_distinct"),
        (col("n_docs") - col("n_distinct")).as("n_dupes"),
        Exact.dround((col("n_docs") - col("n_distinct")).cast("double")
          / col("n_docs").cast("double"), 4).as("dup_frac"))

  /** q90: SOURCE-level n-gram overlap matrix — q60's directed
    * containment lifted from document pairs to source pairs: for every
    * pair of sources sharing at least one shingle, the distinct-
    * shingle intersection and both directed containments
    * |A∩B|/|A|, |A∩B|/|B|. This is the corpus-catalog report behind
    * source selection and mixture planning (q59): a mirror/scrape of
    * an existing source shows up as containment ≈ 1 BEFORE any
    * per-document dedup pass is paid, and cross-source boilerplate
    * (shared templates, syndicated text) quantifies per pair — the
    * macro view the per-doc operators (q21/q60) cannot give without
    * n² doc pairs.
    *
    * Plan: one shingle pass → DISTINCT (source, shingle-hash) — the
    * dictionary frame, collapsed map-side before its one exchange —
    * per-source counts (partial agg) + a shingle-keyed self-join for
    * pair intersections. Pair fan-out per shingle is C(ns, 2) where
    * ns = sources carrying that shingle — bounded by the SOURCE
    * CATALOG size (tens-to-hundreds of named sources; this operator
    * is for catalog granularity, not per-domain cardinalities), and
    * the pair agg collapses map-side. Containments divide the same
    * integers on both engines (q60's convention); Spark keys the join
    * by xxhash64, the oracle by shingle text (the q71 convention).
    * The dictionary feeds THREE consumers (counts, both join sides) —
    * localCheckpoint cuts the diamond (the q75 convention), so the
    * corpus is shingled once, not three times (un-checkpointed this
    * audits at scan=4/ex=11; checkpointed scan=0/ex=7 — the one real
    * scan is inside the checkpoint, the q75 audit shape). */
  def sourceOverlap(documents: DataFrame, n: Int = 3): DataFrame = {
    val sh = documents
      .select(col("source"), explode(Dedup.shingleSet(n)).as("s"))
      .select(col("source"), xxhash64(col("s")).as("k"))
      .distinct()
      .localCheckpoint()
    val counts = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.k") === col("b.k") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(counts.select(col("source").as("src_a"), col("n_sh").as("n_a")), Seq("src_a"))
      .join(counts.select(col("source").as("src_b"), col("n_sh").as("n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared") / col("n_a")).as("containment_ab"),
        (col("n_shared") / col("n_b")).as("containment_ba"))
      .orderBy("src_a", "src_b")
  }

  /** q91: near-dup CLUSTER-SIZE histogram — the duplication-structure
    * report over q36's resolved clusters: how many clusters of each
    * size, and how many documents they hold. q50 reports exact-dup
    * rates and q90 cross-source overlap; this is the third number a
    * dedup policy is set from — a corpus of ten 1000-doc clusters
    * dedups very differently from one of 5000 pairs (keeper-selection
    * cost, recall risk, how much a single boilerplate family
    * dominates), and cluster-size tails are the standard health check
    * after any near-dup run.
    *
    * Cost = q36 (the label propagation does the work) + one
    * cluster-cardinality groupBy + one size-cardinality groupBy —
    * both collapse map-side on frames that are already tiny relative
    * to the corpus (clustered docs only). */
  def clusterHistogram(documents: DataFrame): DataFrame =
    Dedup.dedupClusters(documents)
      .groupBy("cluster_size")
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
      .orderBy("cluster_size")

  /** q117: the corpus DATASHEET — the one-stop "what is this dataset"
    * report (Datasheets for Datasets, Gebru et al. 2018/2021, public)
    * a training run publishes next to its corpus: size and
    * composition, quality distribution, duplication, benchmark
    * contamination, and language purity — SEVEN operator families
    * composed into one long-skinny `(section, item, value)` table so
    * the whole datasheet is a single queryable artifact.
    *
    * Sections: `corpus` (docs/whitespace-tokens/chars), `by_source`
    * and `by_lang` (composition counts), `quality` (q28 quality at
    * exact VALUE-AT-RANK p25/p50/p75 — q51's rank convention, no
    * interpolation, so the emitted doubles are corpus values and
    * hash-exact; interpolated quantile_cont midpoints of 4-dp values
    * land on half-boundaries where round diverges), `exact_dup`
    * (q20's md5 groups: docs sharing a body + fraction),
    * `contamination` (q47's hit set vs `evalReference` + fraction),
    * `lang_mix` (q116's is_mixed count + fraction). All fractions are
    * ONE IEEE division of identically-derived doubles.
    *
    * Scale: each section is a partial-agg aggregate (the quality
    * value-at-rank is the one global sort — q51's certification-cost
    * note applies; production swaps in the sketch). The 1-row totals
    * frame is localCheckpointed and broadcast into every fraction. */
  def datasheet(documents: DataFrame, evalReference: DataFrame): DataFrame = {
    val totals = datasheetTotals(documents)
    // the quality p-rank labels assume ceil(0.25n) < ceil(0.5n) <
    // ceil(0.75n): true for n >= 3; below that the when-chain would
    // emit fewer rows than the oracle's three UNION arms (round-14
    // review) — die loudly instead. One first() on the pinned 1-row
    // frame, no extra scan.
    require(totals.first().getDouble(0) >= 3,
      "datasheet needs at least 3 documents for distinct quality p-ranks")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality"), col("doc_id")) // global: the certification cost
    val quality = TextOps.qualityScore(documents)
      .select(col("doc_id"), col("quality"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(totals.select(col("n_docs"))))
      .select(lit("quality").as("section"),
        when(col("rn") === ceil(col("n_docs") * 0.25).cast("long"), "p25")
          .when(col("rn") === ceil(col("n_docs") * 0.5).cast("long"), "p50")
          .when(col("rn") === ceil(col("n_docs") * 0.75).cast("long"), "p75")
          .as("item"),
        col("quality").as("value"))
      .filter(col("item").isNotNull)
    datasheetAround(documents, evalReference, totals, quality)
  }

  /** q121: [[datasheet]] with its quality section on the SKETCH path,
    * q51's convention made real for the composed report: at 100 TB the
    * exact value-at-rank global sort is the one non-partial-agg stage,
    * so production rides `approx_percentile`. Two modes, one method:
    *
    *  - `certify = true` (the DECLARED query): the sketch quantiles
    *    are checked IN-PLAN against exact ±1%-rank value windows
    *    (q51's bounds, clamped and rank-adjacent-safe for small n) and
    *    the quality section emits `p25_ok/p50_ok/p75_ok` = 1.0 — so
    *    the DuckDB oracle (`1.0` literals) hash-fails a broken sketch.
    *    The rank windows reuse the same global sort the exact path
    *    pays; certification cost, not production cost.
    *  - `certify = false` (the PRODUCTION path): the quality section
    *    emits the raw `approx_percentile` values as `p25/p50/p75` with
    *    NO sort anywhere in the plan — every datasheet stage is then a
    *    partial agg, the shape that holds at 100 TB. Not driver-graded
    *    (sketch values are not bit-replicable cross-engine — q51/q73's
    *    rationale), covered by ReportSpec's rank-window assertions.
    */
  def datasheetSketch(documents: DataFrame, evalReference: DataFrame,
                      certify: Boolean = true): DataFrame = {
    val totals = datasheetTotals(documents)
    // die loudly on an empty corpus (the exact path's convention): an
    // empty ranked frame would otherwise emit NULL _ok verdicts — a
    // health check that silently reads as "absent", not "failed"
    require(totals.first().getDouble(0) >= 1,
      "datasheetSketch needs a non-empty corpus — an empty input would " +
        "emit NULL quality verdicts instead of certified ones")
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    val ap = expr(
      s"approx_percentile(quality, array(${ps.map(_._1).mkString(",")}), 10000)")
    val base = TextOps.qualityScore(documents).select(col("doc_id"), col("quality"))
    val quality =
      if (!certify) {
        val items = ps.zipWithIndex.map { case ((_, nm), i) =>
          s"'$nm', element_at(ap, ${i + 1})" }.mkString(", ")
        base.agg(ap.as("ap"))
          .selectExpr(s"stack(${ps.length}, $items) AS (item, value)")
          .select(lit("quality").as("section"), col("item"), col("value"))
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("quality").asc_nulls_last, col("doc_id"))
        // n rides as a LITERAL from the checkpointed totals (one cheap
        // first(), no data moved): a count() window over partitionBy()
        // would be a SECOND single-partition pass over the corpus —
        // measured 2.4× q117's 30x floor before this cut. quality is
        // a total function of the row (q28's arithmetic — never null),
        // so count(*) ≡ count(quality) here.
        val nDocs = totals.first().getDouble(0).toLong // checkpointed: free
        val ranked = base.withColumn("rk", row_number().over(w).cast("long"))
        val bounds = ps.flatMap { case (p, nm) =>
          val lo = math.max(1L, math.floor(nDocs * (p - 0.01)).toLong)
          val hi = math.min(nDocs, math.ceil(nDocs * (p + 0.01)).toLong)
          Seq(max(when(col("rk") <= lo, col("quality"))).as(s"lo_$nm"),
            min(when(col("rk") >= hi && col("rk") <= nDocs, col("quality")))
              .as(s"hi_$nm"))
        }
        val agged = ranked.agg(ap.as("ap"), bounds: _*)
        val items = ps.zipWithIndex.map { case ((_, nm), i) =>
          s"'${nm}_ok', CAST(element_at(ap, ${i + 1}) >= lo_$nm AND " +
            s"element_at(ap, ${i + 1}) <= hi_$nm AS DOUBLE)" }.mkString(", ")
        agged.selectExpr(s"stack(${ps.length}, $items) AS (item, value)")
          .select(lit("quality").as("section"), col("item"), col("value"))
      }
    datasheetAround(documents, evalReference, totals, quality)
  }

  /** The datasheet's corpus-wide totals — ONE 1-row partial agg,
    * localCheckpointed so every fraction broadcasts the same frame. */
  private def datasheetTotals(documents: DataFrame): DataFrame =
    documents.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).cast("double").as("n_tokens"),
      sum(col("n_chars")).cast("double").as("n_chars"))
      .localCheckpoint()

  /** The six quality-independent datasheet sections composed around a
    * caller-supplied quality section — shared by the exact (q117) and
    * sketch (q121) forms so the two can never drift. */
  private def datasheetAround(documents: DataFrame, evalReference: DataFrame,
                              totals: DataFrame, quality: DataFrame): DataFrame = {
    val corpus = totals.selectExpr(
      "stack(3, 'n_docs', n_docs, 'n_tokens', n_tokens, 'n_chars', n_chars) AS (item, value)")
      .select(lit("corpus").as("section"), col("item"), col("value"))
    val bySource = documents.groupBy("source")
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("by_source").as("section"), col("source").as("item"), col("value"))
    val byLang = documents.groupBy("lang")
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("by_lang").as("section"), col("lang").as("item"), col("value"))
    val dup = documents
      .groupBy(md5(col("text").cast("binary"))).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
        .cast("double").as("ndup"))
      .crossJoin(broadcast(totals))
      .selectExpr("stack(2, 'n_dup_docs', ndup, 'dup_frac', ndup / n_docs) AS (item, value)")
      .select(lit("exact_dup").as("section"), col("item"), col("value"))
    val cont = Dedup.decontaminateNgram(documents, evalReference)
      .agg(count(lit(1)).cast("double").as("nhit")) // output is 1 row/hit doc
      .crossJoin(broadcast(totals))
      .selectExpr("stack(2, 'n_hit_docs', nhit, 'hit_frac', nhit / n_docs) AS (item, value)")
      .select(lit("contamination").as("section"), col("item"), col("value"))
    val mix = TextOps.langMixDetect(documents)
      .agg(sum(when(col("is_mixed"), 1L).otherwise(0L)).cast("double").as("nmix"))
      .crossJoin(broadcast(totals))
      .selectExpr("stack(2, 'n_mixed', nmix, 'mixed_frac', nmix / n_docs) AS (item, value)")
      .select(lit("lang_mix").as("section"), col("item"), col("value"))
    corpus.unionByName(bySource).unionByName(byLang).unionByName(quality)
      .unionByName(dup).unionByName(cont).unionByName(mix)
  }
}

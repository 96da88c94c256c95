package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** q49/q50 reporting semantics on constructed frames with known
  * nulls/dups, plus shape checks on the real tables. */
class ReportSpec extends SparkSpec {

  test("q49 profile counts nulls and distincts per column, renders min/max stably") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val df = Seq(
      (1L, ts, Option(10L), "click", Option(1.5), Option("{}")),
      (2L, ts, Option.empty[Long], "error", Option.empty[Double], Option.empty[String]),
      (3L, ts, Option(10L), "click", Option(2.5), Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Report.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.keySet shouldBe Set("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.values.foreach(_.getLong(1) shouldBe 3L) // n_rows on every row
    val user = rows("user_id")
    (user.getLong(2), user.getLong(3)) shouldBe ((1L, 1L)) // n_null, n_distinct
    val et = rows("event_type")
    (et.getLong(2), et.getLong(3), et.getString(4), et.getString(5)) shouldBe
      ((0L, 2L, "click", "error"))
    val v = rows("value")
    (v.getString(4), v.getString(5)) shouldBe (("1.50", "2.50"))
  }

  test("q49 on the real events table: 6 rows, unique event ids, no null ids") {
    val rows = Report.profile(tables.events).collect()
    rows.length shouldBe 6
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    byCol("event_id").getLong(2) shouldBe 0L                      // n_null
    byCol("event_id").getLong(3) shouldBe byCol("event_id").getLong(1) // distinct == rows
  }

  test("q49 approx profile: no Expand in the plan, distincts within the HLL bound") {
    // the 100 TB path (exact = false): approx_count_distinct sketches
    // merge associatively, so the distinct-aggregate Expand (n× map
    // rows) disappears from the plan — the same tested-flag contract
    // as q09→q51
    val approx = Report.profile(tables.events, exact = false)
    planOf(approx) should not include "Expand"
    planOf(Report.profile(tables.events)) should include ("Expand")
    val exactRows = Report.profile(tables.events).collect()
      .map(r => r.getString(0) -> r).toMap
    approx.collect().foreach { r =>
      val e = exactRows(r.getString(0))
      // rsd = 0.05; allow 4 sigma before calling it broken
      math.abs(r.getLong(3) - e.getLong(3)).toDouble should be <=
        math.max(4.0, e.getLong(3) * 0.20)
      // every non-distinct metric is identical to the exact profile
      (r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)) shouldBe
        ((e.getLong(1), e.getLong(2), e.getString(4), e.getString(5)))
    }
  }

  test("q73 certified profile: exact columns match q49, every sketch verdict true") {
    val cert = Report.profileSketchCertified(tables.events)
    cert.schema.fieldNames shouldBe Array("col_name", "n_rows", "n_null",
      "n_distinct", "nd_sketch_ok", "min_value", "max_value")
    val rows = cert.collect()
    rows.length shouldBe 6
    rows.foreach { r =>
      withClue(s"col=${r.getString(0)}: ") { r.getBoolean(4) shouldBe true }
    }
    // the deterministic columns are exactly q49's
    val exact = Report.profile(tables.events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).sortBy(_._1)
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(5), r.getString(6))).sortBy(_._1) shouldBe exact
  }

  test("q90 source overlap: a mirror source reads containment 1.0, partial overlap exact, disjoint absent") {
    import spark.implicits._
    // srcM mirrors srcA doc-for-doc; srcP shares one doc's worth of
    // shingles with srcA; srcZ is disjoint vocabulary
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon", "srcA"),
      (2L, "zeta eta theta iota kappa", "srcA"),
      (3L, "alpha beta gamma delta epsilon", "srcM"),
      (4L, "zeta eta theta iota kappa", "srcM"),
      (5L, "alpha beta gamma delta epsilon", "srcP"),
      (6L, "one two three four five", "srcP"),
      (7L, "q1 q2 q3 q4 q5", "srcZ")
    ).toDF("doc_id", "text", "source")
    val out = Report.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // 5-token docs -> 3 distinct 3-gram shingles each; srcA/srcM: 6 each, all shared
    out(("srcA", "srcM")) shouldBe ((6L, 6L, 6L, 1.0, 1.0))
    // srcP shares exactly doc 1's 3 shingles with srcA (and srcM)
    out(("srcA", "srcP")) shouldBe ((3L, 6L, 6L, 0.5, 0.5))
    out(("srcM", "srcP")) shouldBe ((3L, 6L, 6L, 0.5, 0.5))
    // disjoint source never appears
    out.keys.flatMap(k => Seq(k._1, k._2)) should not contain "srcZ"
  }

  test("q91 cluster histogram: known cluster structure, singletons absent") {
    import spark.implicits._
    // three verbatim copies -> one size-3 cluster; two copies -> one
    // size-2 cluster; a unique doc never enters the pair graph
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six seven"),
      (5L, "one two three four five six seven"),
      (6L, "unique solitary text nothing shared here")
    ).toDF("doc_id", "text")
    val out = Report.clusterHistogram(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map(3L -> ((1L, 3L)), 2L -> ((1L, 2L)))
  }

  test("q50 dup report: per-language dup counts and deterministic fraction") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "same text here"),
      (2L, "en", "same  TEXT here"),   // normalizes to the same fingerprint
      (3L, "en", "different text"),
      (4L, "de", "einzigartig"))
      .toDF("doc_id", "lang", "text")
    val rows = Report.dupReport(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    rows shouldBe Array(
      ("de", 1L, 1L, 0L, 0.0),
      ("en", 3L, 2L, 1L, 0.3333))
  }

  test("q121 datasheet sketch: certified verdicts all healthy, production path is sort-free and in-window") {
    import org.apache.spark.sql.functions.col
    val d = tables.documents
    val eval = d.filter(col("doc_id") % 7 === 0)
    // declared (certified) form: quality section = three 1.0 verdicts,
    // the other six sections byte-identical to q117's
    val cert = Report.datasheetSketch(d, eval)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    Seq("p25_ok", "p50_ok", "p75_ok").foreach { p =>
      cert(("quality", p)) shouldBe 1.0
    }
    val exact = Report.datasheet(d, eval)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    cert.filterNot(_._1._1 == "quality") shouldBe
      exact.filterNot(_._1._1 == "quality")
    // production form (certify = false): NO sort anywhere in the plan —
    // every datasheet stage is a partial agg — and the sketch values
    // land inside the exact ±1%-rank windows q51's contract demands
    val prod = Report.datasheetSketch(d, eval, certify = false)
    val plan = prod.queryExecution.executedPlan.toString
    plan should not include "Sort"
    val prodQ = prod.collect()
      .filter(_.getString(0) == "quality")
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val sorted = graft.operators.TextOps.qualityScore(d)
      .collect().map(_.getDouble(4)).sorted
    val n = sorted.length
    Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75").foreach { case (p, nm) =>
      val lo = sorted(math.max(1, math.floor(n * (p - 0.01)).toInt) - 1)
      val hi = sorted(math.min(n.toLong, math.ceil(n * (p + 0.01)).toLong).toInt - 1)
      prodQ(nm) should (be >= lo and be <= hi)
    }
  }

  test("q117 datasheet: sections are internally consistent with their source operators") {
    import org.apache.spark.sql.functions.col
    val d = tables.documents
    val sheet = Report.datasheet(d, d.filter(col("doc_id") % 7 === 0))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val n = d.count().toDouble
    sheet(("corpus", "n_docs")) shouldBe n
    // composition sections partition the corpus
    sheet.collect { case (("by_source", _), v) => v }.sum shouldBe n
    sheet.collect { case (("by_lang", _), v) => v }.sum shouldBe n
    // quality quantiles are corpus VALUES in order (value-at-rank, no interpolation)
    val qs = graft.operators.TextOps.qualityScore(d)
      .collect().map(_.getDouble(4)).toSet
    Seq("p25", "p50", "p75").foreach { p =>
      qs should contain (sheet(("quality", p)))
    }
    sheet(("quality", "p25")) should be <= sheet(("quality", "p50"))
    sheet(("quality", "p50")) should be <= sheet(("quality", "p75"))
    // fractions = count / n_docs exactly
    sheet(("exact_dup", "dup_frac")) shouldBe
      sheet(("exact_dup", "n_dup_docs")) / n
    sheet(("contamination", "hit_frac")) shouldBe
      sheet(("contamination", "n_hit_docs")) / n
    sheet(("lang_mix", "mixed_frac")) shouldBe
      sheet(("lang_mix", "n_mixed")) / n
    // contamination count matches q47's hit set on the same split
    val hits = Dedup.decontaminateNgram(d, d.filter(col("doc_id") % 7 === 0))
      .count().toDouble
    sheet(("contamination", "n_hit_docs")) shouldBe hits
  }
}

package graft.operators

import graft.SparkSpec

/** q51: the sketch-percentile path has no SQL oracle (GK sketches are
  * not bit-replicable across engines), so its correctness contract
  * lives here — same shape as the exact q09, quantiles within the
  * sketch's accuracy bound of the exact per-group sort. */
class AnalyticsSpec extends SparkSpec {

  test("q51 sketch percentiles land within a ±1% rank window of exact") {
    import org.apache.spark.sql.functions._
    val ev = tables.events
    // the sketch returns an actual data value (no interpolation), so
    // the correct contract is RANK error, not value error: each approx
    // quantile must lie between the exact quantiles at p ∓ 0.01 —
    // generous cover for the default 1/10000 GK rank accuracy
    val ps = Seq(0.5, 0.95, 0.99)
    val bounds = ev.groupBy("event_type").agg(
      expr(s"percentile(value, array(${ps.map(p => p - 0.01).mkString(",")}))").as("lo"),
      expr(s"percentile(value, array(${ps.map(p => math.min(p + 0.01, 1.0)).mkString(",")}))").as("hi"))
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Double](1), r.getSeq[Double](2)))).toMap
    // columns: event_type, n, avg_value, stdev_value, p50, p95, p99, ...
    val ap = Analytics.valueStats(ev, exact = false).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    ap.keySet shouldBe bounds.keySet
    ap.foreach { case (t, approx) =>
      val (lo, hi) = bounds(t)
      approx.zipWithIndex.foreach { case (a, i) =>
        // outputs are 4-dp rounded; pad the window by that quantum
        a should (be >= lo(i) - 0.0001 and be <= hi(i) + 0.0001)
      }
    }
  }

  test("q51 shares q09's schema so the two paths are drop-in interchangeable") {
    val ex = Analytics.valueStats(tables.events, exact = true)
    val ap = Analytics.valueStats(tables.events, exact = false)
    ap.schema.fieldNames shouldBe ex.schema.fieldNames
  }

  test("q51 certification is sound for small groups (no false alarm below ~100 rows)") {
    // 10 distinct values: the interpolated quantiles at p ∓ 0.01 both
    // land strictly between ranks 5 and 6 for p50, so the old bound
    // excluded the sketch's exact answer (the rank-5 data value) — a
    // false 'broken sketch' verdict. Value-at-rank bounds must pass.
    import spark.implicits._
    val tiny = (1 to 10).map(i => ("tiny", i * 10.0)).toDF("event_type", "value")
    val out = Analytics.sketchPercentileCertified(tiny).collect()
    out should have length 1
    val r = out.head
    withClue("small-n verdicts: ") {
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
      r.getBoolean(6) shouldBe true
    }
  }

  test("q51 certification is null-safe: null values don't shift the rank windows") {
    import spark.implicits._
    // 10% nulls: percentile/approx_percentile skip them, so the rank
    // windows must too — computed against count(*) the p99 window
    // would land on a null-ranked row and the verdict would go NULL
    val mixed = ((1 to 90).map(i => ("m", Some(i * 1.0))) ++
      (1 to 10).map(_ => ("m", Option.empty[Double])))
      .toDF("event_type", "value")
    val rows = Analytics.sketchPercentileCertified(mixed).collect()
    rows should have length 1
    rows.head.getLong(1) shouldBe 100L // n stays COUNT(*)
    (4 to 6).foreach(i => rows.head.getBoolean(i) shouldBe true)
    // all-null group: vacuously healthy, never 'broken sketch'
    val allNull = (1 to 5).map(_ => ("x", Option.empty[Double]))
      .toDF("event_type", "value")
    val r2 = Analytics.sketchPercentileCertified(allNull).collect().head
    (4 to 6).foreach(i => r2.getBoolean(i) shouldBe true)
  }

  test("q51 certified query emits all-true verdicts for a healthy sketch") {
    val out = Analytics.sketchPercentileCertified(tables.events)
    out.schema.fieldNames shouldBe Array(
      "event_type", "n", "min_value", "max_value", "p50_ok", "p95_ok", "p99_ok")
    val rows = out.collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"event_type=${r.getString(0)}: ") {
        r.getBoolean(4) shouldBe true
        r.getBoolean(5) shouldBe true
        r.getBoolean(6) shouldBe true
      }
    }
  }
}

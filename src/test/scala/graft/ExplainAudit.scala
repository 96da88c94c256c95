package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints one line per batch query — exchange /
  * scan / window counts plus join-shape flags (SMJ, cartesian,
  * broadcast-NLJ) — so a round can diff plan shapes against the last
  * audit and catch silent regressions PlanSpec doesn't pin. Streaming
  * entries are skipped (constructing them executes real streams).
  * Expected flags (all by-design): q24/q25 BNLJ (documented exact
  * broadcast brute force), q48/q65 BNLJ (centroid broadcast cross),
  * q59/q63 BNLJ (tiny broadcast sides), q77 BNLJ (one-row range-stats
  * broadcast cross), q79 BNLJ (the corpus candidate bound against the
  * nCells-row centroid table; the eval-side assignment materializes
  * once behind a localCheckpoint at build time, so it is absent from
  * the executed plan), q57 SMJ (the in-cell same-size pair join),
  * q36/q55 SMJ (size-unknown after localCheckpoint; AQE converts to
  * broadcast at runtime when small), q75 SMJ ×2 (inherits q36/q55's
  * joins through the pipeline's cluster-keeper stage), q127/q128 BNLJ
  * (the one-row corpus-stats crossJoin; q128 adds q25's non-equi
  * broadcast brute-force join), q128 SMJ (the full-outer fusion join
  * over the two nQueries·poolK pools — full outer cannot broadcast,
  * and both sides are KB at any corpus size), q123 SMJ ×2 (inherits
  * q36/q55's size-unknown-after-localCheckpoint joins through the
  * recipe's cluster-keeper stage — q75's documented pair, same
  * provenance), q125 SMJ ×2 (the left-semi of served neighbors
  * against the shared localCheckpointed exact baseline and the
  * config-frame left join onto the hit counts — size-unknown, AQE
  * converts at runtime when small), q134 SMJ (q128's full-outer
  * fusion join over the two nQueries·poolK pools — full outer cannot
  * broadcast, both sides KB at any corpus size), q135 BNLJ ×3 (the
  * one-row intake totals, lexicon-total and head-TVD frames
  * broadcast-crossJoined onto each other — index-metadata weight by
  * construction). q133's former BNLJ is gone as of r18: the retrain
  * alarm now rides a global window over the 2-row grouped frame
  * (scan 4 → 2 — the encode subtree runs once).
  *
  * r20 BNLJ adjudication (verdict #5 — every remaining occurrence
  * carries its bounded-small-side contract here; none grows with the
  * corpus):
  *  - q117 BNLJ ×4 / q121 BNLJ ×3: the localCheckpointed ONE-ROW
  *    datasheet totals frame broadcast-crossJoined under each
  *    fraction section (dup/contamination/lang-mix, plus the exact
  *    path's quality p-rank attach). One row by construction.
  *  - q111 BNLJ ×2: the ≤nBuckets(256)-row distinct-bucket frame
  *    crossJoined to complete each source's histogram, twice (one per
  *    divergence side). Bounded by the literal bucket geometry.
  *  - q96/q103 BNLJ ×1: the literal worker-tier spec table (q96) /
  *    the per-tier measured-rate frame (q103, ≤ tiers rows)
  *    broadcast-crossJoined onto the 1-row corpus sizing.
  *  - q107 BNLJ ×1: the per-quarter threshold frame (quarters·langs
  *    rows, both literal constants) crossJoined onto itself before
  *    the broadcast lang join.
  *  - q109 BNLJ ×1: the ONE-ROW Misra-Gries summary frame
  *    broadcast-crossJoined onto the k(=20)-row exact top-k for the
  *    certification verdicts.
  *  - q125 BNLJ ×2: the |configs|(=4)-row literal config frame — the
  *    pr <= n_probe candidate attach and the zero-hit left-join fill.
  *  - q48/q65 BNLJ (centroid broadcast cross), q24/q25 (exact
  *    broadcast brute force), q59/q63 (tiny broadcast sides), q77
  *    (one-row range stats), q79 (nCells-row centroid+radius table),
  *    q127/q128 (one-row corpus stats; q128 adds q25's non-equi
  *    brute-force leg): unchanged from the standing notes above.
  *
  * Run: Test/runMain graft.ExplainAudit [sfDir]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => !q._1.startsWith("s")) // streaming entries execute
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          def c(p: String) = plan.split(p).length - 1
          val flags = Seq(
            if (c("SortMergeJoin") > 0) s"SMJ=${c("SortMergeJoin")}" else "",
            if (c("CartesianProduct") > 0) s"CART=${c("CartesianProduct")}" else "",
            if (c("BroadcastNestedLoopJoin") > 0) s"BNLJ=${c("BroadcastNestedLoopJoin")}" else "")
            .filter(_.nonEmpty).mkString(",")
          println(f"AUDIT $name%-28s ex=${c("Exchange")}%-3d scan=${c("Scan parquet")}%-2d win=${c("Window")}%-2d $flags")
        } catch {
          case e: Throwable =>
            println(s"AUDIT $name ERROR ${Option(e.getMessage).getOrElse("").take(60)}")
        }
      }
    spark.stop()
  }
}

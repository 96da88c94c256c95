package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference's Lambda-side file lifecycle re-expressed as DataFrame
  * transforms (SURVEY.md §2, q01–q04 + q19).
  *
  * The reference tracks files one-at-a-time in DynamoDB with conditional
  * writes, sharded status rows, and a distributed lock
  * (lambda_manifest_builder.py). On Spark the whole lifecycle is a pure
  * function of the input file set — batching needs no lock because it is
  * deterministic, and "shards" are subsumed by partitioning; q04 keeps
  * the shard bookkeeping shape for observability parity.
  */
object Etl {

  /** q01: schema-on-read normalize — all columns cast to string
    * (glue_batch_job.py:161-168). The ts/value formatting pins an
    * explicit render so the result is engine-independent. */
  def ingestNormalize(events: DataFrame): DataFrame =
    events.select(
      col("event_id").cast(StringType).as("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
      col("user_id").cast(StringType).as("user_id"),
      col("event_type").as("event_type"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .cast(StringType).as("value"),
      col("props").as("props"))

  /** Validation rule from lambda_manifest_builder.py:542-566: a size
    * tolerance band around an expected size; out-of-band → quarantined
    * with a reason. Documents play the role of files, n_chars of bytes. */
  def validate(documents: DataFrame, expected: Double = 300.0,
               tolerancePct: Double = 50.0): DataFrame = {
    val lo = expected * (1 - tolerancePct / 100)
    val hi = expected * (1 + tolerancePct / 100)
    documents
      .withColumn("status",
        when(col("n_chars") >= lo && col("n_chars") <= hi, "valid")
          .otherwise("quarantined"))
      .withColumn("reason",
        when(col("n_chars") < lo, "below_min_size")
          .when(col("n_chars") > hi, "above_max_size")
          .otherwise("ok"))
  }

  /** q02: validation/quarantine routing summary. */
  def validateSummary(documents: DataFrame): DataFrame =
    validate(documents)
      .groupBy("status", "reason")
      .agg(
        count(lit(1)).as("n_files"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy("status", "reason")

  /** q03: deterministic manifest batching — files grouped by prefix
    * (lang plays date_prefix), ordered, chunked into batches of
    * `maxPerManifest` (reference default 10). Pure window function: no
    * DynamoDB claim/lock needed because the assignment is a
    * deterministic function of the input set.
    *
    * One shuffle, partitioned by prefix. A hot prefix (one date
    * holding most of the corpus — the reference's normal case at 338K
    * files/day) serializes its window on one task; `salt > 1` splits
    * each prefix into `salt` deterministic shards (`doc_id % salt`)
    * batched independently, with disjoint batch-id ranges
    * (`shard-local id · salt + shard`). Batches remain deterministic
    * and ≤ maxPerManifest, but differ from the unsalted numbering —
    * the declared q03/oracle semantics keep salt = 1; up to salt-1
    * extra partial batches per prefix can result. */
  def manifestBatches(documents: DataFrame, maxPerManifest: Int = 10,
                      salt: Int = 1): DataFrame = {
    val (partCols, shard) =
      if (salt <= 1) (Seq(col("lang")), lit(0))
      else {
        val s = pmod(col("doc_id"), lit(salt)).cast("int")
        (Seq(col("lang"), s), s)
      }
    val w = Window.partitionBy(partCols: _*).orderBy("doc_id")
    documents
      .withColumn("rn", row_number().over(w))
      // integer `div` (house rule, r16 sweep): rn is 1-based and
      // positive, so truncating and flooring division agree, and the
      // batch id stays exact past the 2^53 double ceiling
      .withColumn("batch_id",
        (expr(s"(rn - 1) div $maxPerManifest").cast("int") * salt
          + shard).cast("int"))
      .groupBy("lang", "batch_id")
      .agg(
        count(lit(1)).as("n_files"),
        min(col("doc_id")).as("first_file"),
        max(col("doc_id")).as("last_file"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** q04: sharded status bookkeeping
    * (lambda_manifest_builder.py:97-122): 10-way shard on the file key
    * crossed with validation status. */
  def statusShards(documents: DataFrame, shards: Int = 10): DataFrame =
    validate(documents)
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
      .groupBy("status", "shard")
      .agg(count(lit(1)).as("n_files"))
      .orderBy("status", "shard")

  /** q31: status-lifecycle resolution — the reference's
    * `pending → processing → completed/failed` transitions
    * (lambda_batch_status_updater.py) land as an update stream; the
    * current status of each key is the value at its latest update.
    * One `max(struct(ts, id, status))` partial aggregation — map-side
    * combine keeps the shuffle at one row per key, where a window
    * (`row_number … rn=1`) would shuffle every update. Deterministic:
    * (ts, event_id) is unique per key. */
  def statusLatest(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"),
        count(lit(1)).as("n_updates"))
      .select(
        col("user_id"),
        col("m.ts").as("last_ts"),
        col("m.event_type").as("last_status"),
        col("n_updates"))

  /** q33: full validation routing with extension checking —
    * lambda_manifest_builder.py validates extension BEFORE the size
    * band (:549-550); the reason precedence here mirrors that. The
    * test tables carry no file names, so the extension derives
    * deterministically from doc_id (same device as m01's mime column);
    * in production this is `regexp_extract(file_key, '\\.([^.]+)$')`. */
  def validateWithExtension(documents: DataFrame,
                            allowed: Seq[String] = Seq("ndjson", "json"),
                            expected: Double = 300.0,
                            tolerancePct: Double = 50.0): DataFrame = {
    val lo = expected * (1 - tolerancePct / 100)
    val hi = expected * (1 + tolerancePct / 100)
    val ext = element_at(typedLit(Seq("ndjson", "json", "csv", "tmp")),
      pmod(col("doc_id"), lit(4)).cast("int") + 1)
    val extOk = ext.isin(allowed.map(s => s: Any): _*)
    documents
      .withColumn("ext", ext)
      .withColumn("reason",
        when(!extOk, "invalid_extension")
          .when(col("n_chars") < lo, "below_min_size")
          .when(col("n_chars") > hi, "above_max_size")
          .otherwise("ok"))
      .withColumn("status",
        when(col("reason") === "ok", "valid").otherwise("quarantined"))
      .groupBy("status", "reason", "ext")
      .agg(count(lit(1)).as("n_files"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("status", "reason", "ext")
  }

  /** q76: incremental snapshot diff — the daily-crawl delta primitive.
    * Classifies every doc_id across two corpus snapshots as added /
    * removed / changed / unchanged by normalized content fingerprint
    * (the reference re-lists and re-validates the full bucket per run,
    * lambda_manifest_builder.py:519-540; at 100 TB you diff snapshots
    * and touch only the delta).
    *
    * Plan: tag-union both sides, then ONE hash exchange on doc_id with
    * a conditional-max pivot — not a full-outer join. Same bytes
    * shuffled either way, but one exchange node, no join buffering, and
    * partial aggregation collapses each side's row map-side. Only
    * (doc_id, 16-byte digest, side) ever moves — never document text. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame): DataFrame = {
    def fp(df: DataFrame, side: Int) =
      df.select(col("doc_id"), TextOps.fingerprintCol.as("fp"),
        lit(side).as("side"))
    fp(prev, 0).unionByName(fp(curr, 1))
      .groupBy("doc_id")
      .agg(
        max(when(col("side") === 0, col("fp"))).as("prev_fp"),
        max(when(col("side") === 1, col("fp"))).as("curr_fp"))
      .withColumn("verdict",
        when(col("prev_fp").isNull, "added")
          .when(col("curr_fp").isNull, "removed")
          .when(col("prev_fp") === col("curr_fp"), "unchanged")
          .otherwise("changed"))
      .orderBy("doc_id")
  }

  /** q78: snapshot drift — the distribution-shift report that answers
    * "did the crawl refresh change the corpus MIX", per dimension value
    * (source here; any low-cardinality column works): counts, shares,
    * and share delta across the two snapshots. Near-zero drift on a
    * refresh that was supposed to add a new source — or large drift on
    * one that wasn't — is the first corpus-health alarm a training-data
    * pipeline fires.
    *
    * Same plan skeleton as [[snapshotDiff]]: tag-union, ONE hash agg
    * (keyed by the dimension — partial aggs collapse each side
    * map-side, so only (value, side) pairs ever shuffle). Totals come
    * from a global window over the GROUPED frame (dimension-cardinality
    * rows — tiny), not a separate agg branch: a `g.agg → crossJoin(g)`
    * diamond would recompute the union and re-scan both snapshots
    * twice more (caught by the plan audit on the first cut). Shares
    * are `Exact.dround`ed and the drift is the IEEE difference of the
    * two rounded doubles — identical operands on both engines, so the
    * oracle matches bit-for-bit. */
  def snapshotDrift(prev: DataFrame, curr: DataFrame,
                    dim: String = "source"): DataFrame = {
    val u = prev.select(col(dim).as("dim"), lit(0).as("side"))
      .unionByName(curr.select(col(dim).as("dim"), lit(1).as("side")))
    val all = Window.partitionBy()
    u.groupBy("dim").agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_prev"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_curr"))
      .withColumn("tp", sum(col("n_prev")).over(all))
      .withColumn("tc", sum(col("n_curr")).over(all))
      .select(col("dim"), col("n_prev"), col("n_curr"),
        graft.Exact.dround(col("n_prev") / col("tp")).as("share_prev"),
        graft.Exact.dround(col("n_curr") / col("tc")).as("share_curr"))
      .withColumn("drift", col("share_curr") - col("share_prev"))
      .orderBy("dim")
  }

  /** The persisted side of the snapshot-diff lifecycle: one
    * (doc_id, prev_fp) row per document of a snapshot. Production
    * rewrites this store per accepted snapshot (it is the ~50-byte/doc
    * index [[snapshotDiff]] and s11's per-batch probe read — metadata
    * scale, like the q45 band index, never the corpus itself). */
  def writeFingerprintStore(documents: DataFrame, path: String): Unit =
    documents
      .select(col("doc_id"), TextOps.fingerprintCol.as("prev_fp"))
      .write.mode("overwrite").parquet(path)

  /** q19: schema-drift union — heterogeneous NDJSON days land with
    * different column sets; `unionByName(allowMissingColumns)` aligns
    * them with nulls, the Spark-native version of the Glue read's
    * permissive merge. */
  def schemaDriftUnion(events: DataFrame): DataFrame = {
    val a = events.filter(col("event_id") < 5000)
      .select("event_id", "event_type", "value")
    val b = events.filter(col("event_id") >= 5000)
      .select("event_id", "user_id", "value")
    a.unionByName(b, allowMissingColumns = true)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("event_type")).as("n_with_type"),
        count(col("user_id")).as("n_with_user"),
        graft.Exact.sumD(col("value")).as("total_value"))
  }
}

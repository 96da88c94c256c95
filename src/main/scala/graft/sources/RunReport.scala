package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-run processing reports — the reference pipeline's self-describing
  * JSON run logs (lambda_manifest_builder.py `report_metadata` /
  * `processing_summary`; glue_batch_job.py report section) re-expressed
  * as a Spark-native sink wrapper. The reference writes one JSON file
  * per invocation to `logs/lambda/` / `logs/glue/` and then queries
  * them with Athena (Athena.sql:44-176); graft writes one parquet row
  * per job run to a report directory and queries it with the SAME
  * analytics operators (q05–q08) every other event log feeds — see
  * [[asEventLog]].
  *
  * Scale notes:
  *  - `records_processed` comes from an [[Observation]] attached to the
  *    write itself — NO second scan of the input (a `df.count()` here
  *    would re-read 100 TB to report on it; the reference's Python can
  *    count rows in-process, a distributed engine must piggyback on the
  *    job that already flowed the rows).
  *  - `input_files` / `output_files` / `output_bytes` are filesystem
  *    metadata operations — O(files), never O(rows).
  *  - A report row is a few hundred bytes; the report table for a year
  *    of hourly runs is <10k rows. Querying it is driver-trivial, so
  *    the analytics path reuses the ordinary event-log operators
  *    unchanged.
  */
object RunReport {

  val ReportVersion = "1.0"

  /** One job run. Mirrors the union of the reference's lambda report
    * (`processing_summary`, `execution_metrics`, `report_metadata`) and
    * glue report (`job_info`, `parquet_files_created`) flattened to one
    * row — flat columns, not structs, so parquet stats/pushdown work on
    * every field and DuckDB reads it without extraction glue.
    * `error_message` is null on success (the glue report's shape). */
  final case class Run(
      job_name: String,
      run_id: String,
      started_at: Timestamp,
      finished_at: Timestamp,
      duration_seconds: Double,
      input_files: Long,
      records_processed: Long,
      output_files: Long,
      output_bytes: Long,
      status: String,
      error_message: Option[String],
      report_version: String,
      environment: String)

  /** [[Ingest.writeParquet]] plus a one-row run report appended to
    * `reportDir`. On write failure the FAILED report (with the error
    * message) is still emitted, then the failure rethrows — the
    * reference's behavior (report in the `except` branch, then raise),
    * and the property that makes the report table trustworthy: a run
    * that died is a row you can query, not a silent hole.
    *
    * Report emission is at-least-once: a retry of a failed-after-write
    * run appends a second report row (run_id distinguishes attempts).
    * Same contract as the reference's one-JSON-per-invocation logs. */
  def reportedWrite(df: DataFrame, path: String, targetPartitions: Int,
                    jobName: String, reportDir: String,
                    partitionCol: Option[String] = None,
                    mode: SaveMode = SaveMode.Append,
                    environment: String = "local",
                    runId: Option[String] = None): Run = {
    val spark = df.sparkSession
    val started = System.currentTimeMillis()
    val id = runId.getOrElse(jobName + "-" + java.util.UUID.randomUUID().toString)
    val inputFiles = df.inputFiles.length.toLong
    val obs = Observation()
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    val attempt =
      try {
        Ingest.writeParquet(observed, path, targetPartitions, partitionCol, mode)
        Right(obs.get("rows").asInstanceOf[Long])
      } catch {
        case e: Exception => Left(e)
      }
    val finished = System.currentTimeMillis()
    val (files, bytes) = outputStats(spark, path)
    val run = Run(
      job_name = jobName, run_id = id,
      started_at = new Timestamp(started), finished_at = new Timestamp(finished),
      duration_seconds = (finished - started) / 1000.0,
      input_files = inputFiles,
      records_processed = attempt.getOrElse(0L),
      output_files = files, output_bytes = bytes,
      status = if (attempt.isRight) "SUCCESS" else "FAILED",
      error_message = attempt.left.toOption.map(e =>
        e.toString.linesIterator.next().take(500)),
      report_version = ReportVersion, environment = environment)
    emit(spark, run, reportDir)
    attempt.left.foreach(e => throw e)
    run
  }

  /** Append one report row to the report table. One tiny file per run —
    * the same layout as the reference's one-JSON-per-invocation logs;
    * compact with an ordinary parquet rewrite when the table ages. */
  private def emit(spark: SparkSession, run: Run, reportDir: String): Unit = {
    val enc = org.apache.spark.sql.Encoders.product[Run]
    spark.createDataset(Seq(run))(enc).toDF()
      .coalesce(1).write.mode(SaveMode.Append).parquet(reportDir)
  }

  /** Count + total size of the data files under `path` (recursive;
    * commit markers and hidden files excluded). Filesystem metadata
    * only. */
  private def outputStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      val it = fs.listFiles(p, true)
      var files = 0L
      var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          files += 1L
          bytes += f.getLen
        }
      }
      (files, bytes)
    }
  }

  def readReports(spark: SparkSession, reportDir: String): DataFrame =
    spark.read.parquet(reportDir)

  /** The reference's LITERAL log layout, write side: one
    * self-describing JSON document per run under `logsDir/<job_name>/`
    * (lambda_manifest_builder writes `logs/lambda/…json`,
    * glue_batch_job `logs/glue/…json`; Athena.sql:42-110 queries them
    * as external JSON tables). Parquet ([[emit]]) stays graft's
    * primary report store — columnar stats, pushdown, no per-file
    * schema drift — but consumers still speaking the `logs/`
    * convention get the byte-level round trip here. The document is
    * rendered by the engine's own JSON writer (`to_json` over the Run
    * row — the exact serialization [[readJsonLogs]]' reader parses
    * back), timestamps in UTC ISO-8601; the single small file is
    * written driver-side (a report row is a few hundred bytes —
    * running a distributed job to emit it would be the tail wagging
    * the dog). */
  def emitJsonLog(spark: SparkSession, run: Run, logsDir: String): Unit = {
    val enc = org.apache.spark.sql.Encoders.product[Run]
    // timeZone pinned to UTC explicitly: to_json otherwise renders in
    // the SESSION zone, and the documented contract ("timestamps in
    // UTC ISO-8601") must hold for external consumers regardless of
    // how the writing session is configured
    // SSSSSS (micros): Spark timestamps carry microsecond precision, so
    // the fraction width must too — an SSS format silently truncated a
    // micros-precision Run, making readJsonLogs diverge from
    // readReports (round-15 advice; today's Runs are ms-precision, but
    // the round trip must not depend on that)
    val doc = spark.createDataset(Seq(run))(enc).toDF()
      .select(to_json(struct(col("*")),
        java.util.Map.of(
          "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
          "timeZone", "UTC")))
      .first().getString(0)
    val dir = new org.apache.hadoop.fs.Path(logsDir, run.job_name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val f = new org.apache.hadoop.fs.Path(dir, s"${run.run_id}.json")
    val out = fs.create(f, true)
    try out.write((doc + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The reference's log layout, read side: `spark.read.json` over the
    * one-JSON-per-run tree with the Run schema given EXPLICITLY — the
    * Athena external-table round trip (the DDL names its columns; so
    * do we), and the 100 TB discipline: schema inference over a
    * landing tree is a full extra pass ([[Ingest.readNdjson]]'s rule).
    * Returns [[readReports]]' exact shape, so [[asEventLog]] and
    * [[registerMetricsTable]] compose unchanged on top of raw logs. */
  def readJsonLogs(spark: SparkSession, logsDir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[Run]
    spark.read.schema(enc.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .option("timeZone", "UTC") // the write side's pinned zone
      .option("recursiveFileLookup", "true")
      .json(logsDir)
      .select(enc.schema.fieldNames.map(col).toSeq: _*)
  }

  /** The reference's metrics-table DDL
    * (metrics-app/create_metrics_table.py:10 — a (date_hour,
    * timestamp)-keyed store the collector lambda writes and dashboards
    * query) brought to the Spark catalog: the run-report table
    * registers EXTERNAL over its parquet, and the reference's access
    * path — partition key `date_hour` (yyyy-MM-dd-HH), sort key
    * epoch-millis `timestamp` — is realized as a catalog VIEW over it,
    * so the dashboard queries run as plain SQL
    * (`SELECT ... FROM graft.run_metrics WHERE date_hour = ...`).
    * A view, not a rewrite: the report files stay the source of truth
    * (100 TB note: partition the report table by a date column and the
    * date_hour predicate prunes files; the view is projection-only).
    * Idempotent; db validated because it is interpolated into DDL. */
  def registerMetricsTable(spark: SparkSession, reportDir: String,
                           db: String = "graft"): Unit = {
    require(db.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"database name must be a bare identifier, got '$db'")
    require(!reportDir.contains("'"),
      s"location path must not contain a quote, got '$reportDir'")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $db.run_reports " +
      s"USING PARQUET LOCATION '$reportDir'")
    spark.sql(
      s"""CREATE OR REPLACE VIEW $db.run_metrics AS
         |SELECT date_format(finished_at, 'yyyy-MM-dd-HH') AS date_hour,
         |       unix_millis(finished_at) AS `timestamp`,
         |       job_name, run_id, status, duration_seconds,
         |       records_processed, output_files, output_bytes
         |FROM $db.run_reports""".stripMargin)
  }

  /** Adapt the report table to the event-log schema q05–q08 consume, so
    * the engine's OWN runs flow through the same daily-summary /
    * failure-filter / duration-stats / correlation analytics as any
    * other event source (the reference points Athena's report queries
    * at its logs; graft points its operators at its reports):
    *  - q05 dailySummary   → runs/day, distinct jobs, total duration,
    *    failures (event_type = "error" for FAILED runs)
    *  - q06 failedEvents   → the failed-executions listing
    *  - q07 durationStats  → avg/max/min run duration per day
    *  - q08 correlationJoin→ props carries k = output_files
    * Hashed ids are stand-ins for the log's synthetic keys; the report
    * columns themselves stay queryable directly from [[readReports]]. */
  def asEventLog(reports: DataFrame): DataFrame =
    reports.select(
      xxhash64(col("run_id")).as("event_id"),
      col("finished_at").as("ts"),
      xxhash64(col("job_name")).as("user_id"),
      when(col("status") === "SUCCESS", lit("run_success"))
        .otherwise(lit("error")).as("event_type"),
      col("duration_seconds").as("value"),
      to_json(map(lit("k"), col("output_files").cast("string"))).as("props"))
}

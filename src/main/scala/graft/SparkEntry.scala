package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Etl, Relational, TextOps}

/** Driver contract — see SURVEY.md §2 for the capability each key
  * covers. Every query has a matching DuckDB oracle in [[oracleSql]]
  * with identically-aliased columns (the driver sorts columns by name
  * and hash-compares values). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables(spark, "/root/testdata/sf0.001").lineitem)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core ETL surface
    "q01_ingest_normalize"   -> ((s, d) => Etl.ingestNormalize(Tables(s, d).events)),
    "q02_validate_quarantine"-> ((s, d) => Etl.validateSummary(Tables(s, d).documents)),
    "q03_manifest_batching"  -> ((s, d) => Etl.manifestBatches(Tables(s, d).documents)),
    "q04_status_shards"      -> ((s, d) => Etl.statusShards(Tables(s, d).documents)),
    "q05_daily_summary"      -> ((s, d) => Analytics.dailySummary(Tables(s, d).events)),
    "q06_failed_filter"      -> ((s, d) => Analytics.failedEvents(Tables(s, d).events)),
    "q07_duration_stats"     -> ((s, d) => Analytics.durationStats(Tables(s, d).events)),
    "q08_correlation_join"   -> ((s, d) => Analytics.correlationJoin(Tables(s, d).events)),
    "q09_percentiles"        -> ((s, d) => Analytics.valueStats(Tables(s, d).events)),
    "q10_hourly_velocity"    -> ((s, d) => Analytics.hourlyVelocity(Tables(s, d).events)),
    "q11_peak_topk"          -> ((s, d) => Analytics.peakHours(Tables(s, d).events)),
    "q18_output_sizing"      -> ((s, d) => Analytics.outputSizing(Tables(s, d).events)),
    "q19_schema_drift"       -> ((s, d) => Etl.schemaDriftUnion(Tables(s, d).events)),
    // Analytical engine
    "q12_pricing_summary"    -> ((s, d) => Relational.pricingSummary(Tables(s, d).lineitem)),
    "q13_join_agg"           -> ((s, d) => { val t = Tables(s, d)
                                  Relational.shippingPriority(t.customer, t.orders, t.lineitem) }),
    "q14_broadcast_dims"     -> ((s, d) => { val t = Tables(s, d)
                                  Relational.regionRevenue(t.lineitem, t.supplier, t.nation, t.region) }),
    "q15_window_rank"        -> ((s, d) => Relational.topOrdersPerCustomer(Tables(s, d).orders)),
    "q16_running_total"      -> ((s, d) => Relational.runningTotal(Tables(s, d).orders)),
    "q17_sessionization"     -> ((s, d) => Relational.sessionize(Tables(s, d).events)),
    // LLM-training-data operators
    "q20_dedup_exact"        -> ((s, d) => TextOps.dedupExact(Tables(s, d).documents)),
    "q27_lang_id"            -> ((s, d) => TextOps.langId(Tables(s, d).documents)),
    "q28_quality_score"      -> ((s, d) => TextOps.qualityScore(Tables(s, d).documents)),
    "q29_token_count"        -> ((s, d) => TextOps.tokenCounts(Tables(s, d).documents)),
    "q30_fingerprint"        -> ((s, d) => TextOps.fingerprint(Tables(s, d).documents)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_ingest_normalize" ->
      """SELECT * FROM (
        |  SELECT CAST(event_id AS VARCHAR) AS event_id,
        |         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |         CAST(user_id AS VARCHAR) AS user_id,
        |         event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
        |         props
        |  FROM events) t
        |ORDER BY CAST(event_id AS BIGINT)""".stripMargin,
    "q02_validate_quarantine" ->
      """SELECT status, reason, COUNT(*) AS n_files,
        |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |       ROUND(AVG(n_chars), 4) AS avg_chars
        |FROM (SELECT n_chars,
        |        CASE WHEN n_chars >= 150 AND n_chars <= 450 THEN 'valid' ELSE 'quarantined' END AS status,
        |        CASE WHEN n_chars < 150 THEN 'below_min_size'
        |             WHEN n_chars > 450 THEN 'above_max_size' ELSE 'ok' END AS reason
        |      FROM documents) t
        |GROUP BY status, reason ORDER BY status, reason""".stripMargin,
    "q03_manifest_batching" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars,
        |         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) / 10.0) AS INTEGER) AS batch_id
        |  FROM documents)
        |SELECT lang, batch_id, COUNT(*) AS n_files,
        |       MIN(doc_id) AS first_file, MAX(doc_id) AS last_file,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY lang, batch_id ORDER BY lang, batch_id""".stripMargin,
    "q04_status_shards" ->
      """SELECT status, shard, COUNT(*) AS n_files
        |FROM (SELECT CASE WHEN n_chars >= 150 AND n_chars <= 450 THEN 'valid' ELSE 'quarantined' END AS status,
        |             CAST(doc_id % 10 AS INTEGER) AS shard
        |      FROM documents) t
        |GROUP BY status, shard ORDER BY status, shard""".stripMargin,
    "q05_daily_summary" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_failed_filter" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        |FROM events WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "q07_duration_stats" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       ROUND(AVG(value), 4) AS avg_duration,
        |       MAX(value) AS max_duration, MIN(value) AS min_duration,
        |       COUNT(*) AS n_runs
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_correlation_join" ->
      """WITH e AS (SELECT event_id, event_type, user_id,
        |                  CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k
        |           FROM events),
        |     d AS (SELECT k, COUNT(*) AS k_events, COUNT(DISTINCT user_id) AS k_users
        |           FROM e GROUP BY k)
        |SELECT e.event_id, e.k, d.k_events, d.k_users
        |FROM e JOIN d USING (k) WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin,
    "q09_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
        |       ROUND(AVG(value), 4) AS avg_value,
        |       ROUND(STDDEV_SAMP(value), 4) AS stdev_value,
        |       ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |       ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |       ROUND(quantile_cont(value, 0.99), 4) AS p99,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_hourly_velocity" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS volume,
        |       ROUND(COUNT(*) / 3600.0, 6) AS events_per_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_peak_topk" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY n_events DESC, hour LIMIT 3""".stripMargin,
    "q18_output_sizing" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_records,
        |       GREATEST(CAST(CEIL(COUNT(*) / 500.0) AS INTEGER), 1) AS target_files
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_schema_drift" ->
      """SELECT COUNT(*) AS n_rows, COUNT(event_type) AS n_with_type,
        |       COUNT(user_id) AS n_with_user,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS user_id
        |      FROM events WHERE event_id < 5000
        |      UNION ALL
        |      SELECT event_id, CAST(NULL AS VARCHAR), value, user_id
        |      FROM events WHERE event_id >= 5000) t""".stripMargin,
    "q12_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS DOUBLE) AS sum_charge,
        |       ROUND(AVG(l_quantity), 4) AS avg_qty,
        |       ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |       ROUND(AVG(l_discount), 4) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q13_join_agg" ->
      """SELECT l.l_orderkey AS l_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
        |       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q14_broadcast_dims" ->
      """SELECT r_name, n_name,
        |       ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q15_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q16_running_total" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_sessionization" ->
      """WITH f AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) > 1800.0
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "q27_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','a','value','fast','slow'], x))) AS INTEGER) AS s_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['table','row','merge'], x))) AS INTEGER) AS s_de,
        |  CAST(len(list_filter(toks, x -> list_contains(['query','scan','filter'], x))) AS INTEGER) AS s_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['join','group','sort'], x))) AS INTEGER) AS s_fr,
        |  CAST(len(list_filter(toks, x -> list_contains(['stream','batch','window'], x))) AS INTEGER) AS s_zh
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted_lang,
        |  s_en AS score_en, s_de AS score_de, s_es AS score_es,
        |  s_fr AS score_fr, s_zh AS score_zh
        |FROM s ORDER BY doc_id""".stripMargin,
    "q28_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(toks) AS DOUBLE) AS n_tok,
        |        CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
        |        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) AS n_stop,
        |        LEAST(n_chars / 500.0, 1.0) AS len_sat
        |      FROM t)
        |SELECT doc_id, ROUND(n_uniq / n_tok, 4) AS uniq_ratio,
        |       ROUND(n_stop / n_tok, 4) AS stop_ratio,
        |       ROUND(len_sat, 4) AS len_saturation,
        |       ROUND(n_uniq / n_tok * 0.4 + (1.0 - n_stop / n_tok) * 0.3 + len_sat * 0.3, 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q29_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |       CAST(len(list_filter(string_split(text, ' '), x -> len(x) >= 5)) AS INTEGER) AS n_long_tokens,
        |       CAST(len(text) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}

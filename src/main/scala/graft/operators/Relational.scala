package graft.operators

import graft.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytical-engine surface (SURVEY.md §2, q12–q17): the reference's
  * Athena SQL layer generalized to TPC-H-shaped plans.
  *
  * Every function is a pure LogicalPlan builder — no actions, no
  * collect — so Catalyst applies pushdown/pruning and AQE picks join
  * strategies at runtime. Dimension tables are explicitly
  * `broadcast()`-hinted where they are guaranteed small relative to the
  * fact table at any scale factor.
  */
object Relational {

  /** q12: single-scan multi-aggregate (TPC-H Q1 shape). One shuffle;
    * all aggregates partial-agg map-side; whole expression tree stays in
    * WholeStageCodegen.
    *
    * Sums use [[Exact.sumFixed]]: the monetary columns are 2-dp, their
    * products 4-dp, so quantizing each addend recovers the true decimal
    * value and the all-double pipeline runs ~3× faster than the
    * decimal-accumulator path (round-4 profile: 0.6 s vs 1.9 s at
    * sf0.1) while staying bit-identical across engines. */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "2000-09-02 00:00:00"): DataFrame = {
    val disc   = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.sumFixed(col("l_quantity")).as("sum_qty"),
        Exact.sumFixed(col("l_extendedprice")).as("sum_base_price"),
        Exact.sumFixed(disc, dp = 4).as("sum_disc_price"),
        Exact.sumFixed(charge, dp = 4).as("sum_charge"),
        Exact.avgD(col("l_quantity")).as("avg_qty"),
        Exact.avgD(col("l_extendedprice")).as("avg_price"),
        Exact.avgD(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q13: fact-dim-dim join + agg + top-k (TPC-H Q3 shape). customer is
    * broadcast (1.5k rows/SF-0.01, bounded at scale by the segment
    * filter); orders⋈lineitem shuffles on orderkey. Revenue is an exact
    * decimal sum, so the ORDER BY on it is engine-stable. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String = "BUILDING", cutoff: String = "1998-03-15 00:00:00"): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = lineitem.filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      // 4-dp fixed-point sum: exact and order-independent, so both the
      // top-k selection and the rendered value are engine-stable with
      // no rounding step
      .agg(Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), dp = 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q14: star join through small dims — supplier/nation/region all
    * broadcast, so the only shuffle is the final aggregation. */
  def regionRevenue(lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame = {
    lineitem.select("l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        // 4-dp fixed-point sum — exact, order-independent, no
        // decimal→double conversion to diverge across engines
        Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), dp = 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** q15: per-group top-k via window row_number. The window shuffle
    * partitions by customer, so skew is bounded by orders-per-customer;
    * rank filter happens before any further processing. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** q16: running total per customer — cumulative window sum over an
    * exact decimal so the running values are order-independent-exact. */
  def runningTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("running_total",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
          .over(w).cast("double"))
      .drop("o_totalprice")
  }

  /** q17: gap-based sessionization (30-min inactivity). Classic
    * lag → flag → cumulative-sum; one shuffle partitioned by user_id.
    * At 100 TB the per-user partition is small (events/user ≪ memory);
    * a skewed power-user key would be handled by AQE skew splitting on
    * the window shuffle. */
  def sessionize(events: DataFrame, gapSeconds: Double = 1800.0): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             (col("ts").cast("double") - col("prev_ts").cast("double")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** q39: as-of join — attribute each error event to the same user's
    * most recent strictly-earlier non-error action (the temporal-join
    * primitive behind "state at time of failure" debugging and
    * feature-at-event-time ML joins). Spark has no ASOF JOIN operator;
    * a range join would explode, and a per-probe subquery doesn't
    * distribute. The classic scalable encoding is union-and-sweep:
    *
    *  1. actions are deduped to one per (user, ts) — MAX(event_id)
    *     wins — so the as-of match is deterministic under ts ties;
    *  2. probes (kind 0) and actions (kind 1) are unioned and sorted
    *     within each user by (ts, kind): at equal ts the probe sorts
    *     FIRST, which is exactly strictly-earlier semantics;
    *  3. a running `last(action, ignoreNulls)` carries the latest
    *     action forward; probe rows read it and drop the helper rows.
    *
    * ONE shuffle+sort keyed by user_id — the same cost as a window
    * query, independent of time-range density. The DuckDB oracle is its
    * native ASOF JOIN, so this checks graft's encoding against an
    * independent first-class implementation. The gap is integer
    * microseconds (both engines subtract identical int64s). */
  def asofJoin(events: DataFrame): DataFrame = {
    val actions = events.filter(col("event_type") =!= "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("action_id"))
    val probes = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val unioned = probes
      .select(col("user_id"), col("ts"), lit(0).as("kind"), col("event_id"),
        lit(null).cast("long").as("action_id"))
      .unionByName(actions.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("long").as("event_id"), col("action_id")))
    val sweep = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("prior_action_id", last(col("action_id"), ignoreNulls = true).over(sweep))
      .withColumn("prior_ts",
        last(when(col("kind") === 1, col("ts")), ignoreNulls = true).over(sweep))
      .filter(col("kind") === 0 && col("prior_action_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prior_action_id"), col("prior_ts"),
        (unix_micros(col("ts")) - unix_micros(col("prior_ts"))).as("gap_us"))
  }

  /** Skew-salted equi-join: the portable hot-key mitigation for
    * fact-fact joins (AQE's skew split covers sort-merge joins at
    * runtime; salting is the technique that also works pre-AQE, in
    * streaming joins, and when the skew is in the GROUP BY that
    * follows). The left (skewed) side spreads each hot key over
    * `salts` sub-keys via a deterministic per-row hash; the right side
    * replicates every row `salts` ways so all sub-keys still meet
    * their match. Join output is EXACTLY the plain join's — salt
    * columns never escape — so correctness is oracle-checkable against
    * the unsalted SQL while the shuffle distributes a hot key across
    * `salts` reducers instead of one.
    *
    * Cost: right side shuffles `salts`× its size — use for fact-fact
    * where the right side is the smaller-but-unbroadcastable one. */
  def saltedJoin(left: DataFrame, right: DataFrame, joinExpr: Column,
                 saltSource: Column, salts: Int = 8): DataFrame = {
    require(!(left.columns ++ right.columns).exists(Set("_salt_l", "_salt_r")),
      "saltedJoin inputs must not already carry _salt_l/_salt_r columns")
    val l = left.withColumn("_salt_l", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val r = right.withColumn("_salt_r", explode(array((0 until salts).map(lit): _*)))
    l.join(r, joinExpr && col("_salt_l") === col("_salt_r"))
      .drop("_salt_l", "_salt_r")
  }

  /** q52: revenue by order status through the salted join — the TPC-H
    * Q3-shaped fact-fact join under a hot-key regime. At test SF the
    * salt is pure overhead (no skew to diffuse); the query exists so
    * the salted path itself is oracle-verified equal to the plain
    * join. */
  def saltedRevenueByStatus(lineitem: DataFrame, orders: DataFrame,
                            salts: Int = 8): DataFrame =
    saltedJoin(lineitem, orders,
        col("l_orderkey") === col("o_orderkey"), col("l_linenumber"), salts)
      .groupBy(col("o_orderstatus"))
      .agg(graft.Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderstatus")
}

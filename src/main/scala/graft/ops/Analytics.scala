package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** B-series relational engine queries (SURVEY.md §2.B): the operator core
  * the STAC search surface compiles onto, exercised TPC-H-style on the
  * fixture tables.
  *
  * Scale discipline (SURVEY.md §5): dims are broadcast explicitly; sums of
  * doubles go through DECIMAL(18,2) so results are exact and
  * order-independent (then cast back to DOUBLE so both engines emit the
  * same physical type); every query ends in a deterministic total ORDER BY.
  */
object Analytics {

  /** Exact, order-independent sum of a double column: accumulate as
    * decimal, emit double. Identical semantics in the DuckDB oracle via
    * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  private def dsum(c: String): Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  private def dsumSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- B1/B2
  /** TPC-H Q1 shape: pushdown scan (shipdate filter + column pruning) into
    * a partial-agg hash aggregate.
    */
  def b2Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        // Mean from the EXACT decimal sum, not avg() over doubles: avg
        // accumulates in partition order, so the pre-rounding double can
        // differ by an ulp across engines/runs and flip a rounding boundary.
        // Exact sum → one deterministic double division (identical IEEE 754
        // in both engines); decimal-division scale rules differ, so divide
        // in double space.
        (dsum("l_quantity") / count(lit(1)).cast("double"))
          .cast("decimal(18,6)").cast("double").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val b2AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B1: filter + projection that must reach the parquet scan
    * (PushedFilters / 2-column ReadSchema — audited in AnalyticsSpec).
    */
  def b1PushdownScan(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .where(col("o_totalprice") > 150000.0)
      .orderBy(col("o_orderkey"))

  val b1PushdownScanSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 150000.0 ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------------- B3
  /** Broadcast dim ⋈ fact: revenue by nation. nation/customer are tiny →
    * broadcast; only the fact side streams.
    */
  def b3BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val nation   = Tables.nation(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders   = Tables.orders(spark, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum("o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  val b3BroadcastJoinSql: String =
    s"""SELECT n_name, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------------- B4
  /** Fact ⋈ fact shuffle join (orders ⋈ lineitem on orderkey), AQE-planned. */
  def b4ShuffleJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val lineitem = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"))
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(dsum("l_extendedprice").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("o_year"))
  }

  val b4ShuffleJoinSql: String =
    s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  ${dsumSql("l_extendedprice")} AS revenue, COUNT(*) AS n_items
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------------- B5
  /** Star join across 5 tables (region→nation→customer→orders→lineitem). */
  def b5StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val region   = Tables.region(spark, dir)
    val nation   = Tables.nation(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders   = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") *
             (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  val b5StarJoinSql: String =
    """SELECT r_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ------------------------------------------------------------------- B6
  /** Window: top-3 orders per customer by price (dense ranking). */
  def b6Window(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  val b6WindowSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  // ------------------------------------------------------------------- B7
  /** Global top-k: planned as TakeOrderedAndProject (per-partition top-k +
    * merge of k), never a full sort — the 100 TB-safe pattern.
    */
  def b7Topk(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  val b7TopkSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin

  // ------------------------------------------------------------------- B8
  /** Distinct (exact) + HLL estimate side by side. approx_count_distinct
    * is engine-specific so only the exact column is oracle-compared; the
    * HLL path is asserted within ±5% in AnalyticsSpec.
    */
  def b8Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val b8DistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------- B9
  /** Left-semi and left-anti joins: customers with/without open orders. */
  def b9SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val open = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val withOpen = customer.join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(true).as("has_open"))
    val without = customer.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(false).as("has_open"))
    withOpen.unionAll(without).orderBy(col("c_custkey"))
  }

  val b9SemiAntiSql: String =
    """SELECT c_custkey, TRUE AS has_open FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |UNION ALL
      |SELECT c_custkey, FALSE AS has_open FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ B10
  /** Rollup (grouping sets): order totals by (status, priority) with
    * subtotal and grand-total rows.
    */
  def b10Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum("o_totalprice").as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val b10RollupSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  ${dsumSql("o_totalprice")} AS total, COUNT(*) AS n
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------ B31
  /** B31: the WINDOW-FUNCTION battery beyond B6's rank — lag (delta vs
    * previous order), lead (days until the next), running total, and
    * ntile quartile, all over one (customer, date, key) window — the
    * customer-timeline shape every activity feed / churn model computes.
    * ONE shuffle + ONE sort serve all four functions (they share the
    * window frame); money runs through exact cents (BIGINT), dates
    * compare as DATE in both engines (their timestamp day-diff
    * conventions differ; DATE does not). ntile is ANSI — both engines
    * split remainders to the leading buckets.
    */
  def b31WindowBattery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("cents") - lag(col("cents"), 1).over(w)).as("delta_cents"),
        datediff(lead(col("d"), 1).over(w), col("d")).cast("long").as("gap_days"),
        sum(col("cents")).over(wr).as("run_cents"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val b31WindowBatterySql: String =
    """SELECT o_custkey, o_orderkey,
      |  cents - LAG(cents, 1) OVER w AS delta_cents,
      |  CAST(date_diff('day', d, LEAD(d, 1) OVER w) AS BIGINT) AS gap_days,
      |  CAST(SUM(cents) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile
      |FROM (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------------------------ B32
  /** B32: skew-salted SHUFFLE JOIN — B13's salting rewrite applied to a
    * join, the standard cure when one fact key is hot enough to pin a
    * whole reducer and the dim side is too big to broadcast: the fact
    * side spreads each key over 16 salted sub-keys (salt from a
    * per-row column, so the hot key's rows land on 16 reducers), the
    * dim side is replicated ×16 via `explode` so every (key, salt)
    * partition holds its dim row, and the join runs on (key, salt).
    * `shuffle_hash` hints pin the shuffled plan — a broadcast would
    * mask what the rewrite demonstrates (PlanAuditSpec asserts the
    * ShuffledHashJoin and the salt in the join keys). Each fact row
    * meets its dim row exactly once (under its own salt), so the result
    * is EXACTLY the plain join — which is what the oracle computes:
    * equality proves the rewrite is semantics-preserving. At 100 TB the
    * ×16 dim replication costs |dim|×16 shuffle bytes — the trade
    * against a hot reducer that would otherwise run alone for hours.
    */
  def b32SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 16
    val fact = Tables.events(spark, dir)
      .select(col("user_id"), col("value"),
        pmod(col("event_id"), lit(salts)).as("salt"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("d_salt", explode(array((0 until salts).map(lit): _*)))
    fact.hint("shuffle_hash")
      .join(dim, col("user_id") === col("c_custkey") &&
        col("salt") === col("d_salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  val b32SaltedJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------ B33
  /** B33: strict SEQUENTIAL FUNNEL (signup → view → click → purchase,
    * each step strictly after the previous one's first completion) —
    * the product-analytics shape every growth dashboard computes, and a
    * sequence-matching query relational engines traditionally answer
    * with N self-joins. Here it is ONE groupBy pass: per user, the
    * signup time aggregates as a plain min while the later steps'
    * timestamps aggregate into per-type sorted arrays (bounded by
    * per-user activity, never corpus size), and the strictly-after
    * cascade is `array_min(filter(ts, x -> x > prev))` per step — a
    * null previous step nulls every later one (filter's null predicate
    * keeps nothing). The shuffle carries |users| rows once; the oracle
    * answers the same question with the classic 4-join algorithm, so
    * the gate is a genuine two-algorithm equality.
    */
  def b33Funnel(spark: SparkSession, dir: String): DataFrame = {
    def tsOf(t: String) =
      sort_array(collect_list(when(col("event_type") === t, col("ts"))))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"),
        tsOf("view").as("vw"), tsOf("click").as("ck"), tsOf("purchase").as("pu"))
      .select(col("t1"), expr("array_min(filter(vw, x -> x > t1))").as("t2"),
        col("ck"), col("pu"))
      .select(col("t1"), col("t2"),
        expr("array_min(filter(ck, x -> x > t2))").as("t3"), col("pu"))
      .select(col("t1"), col("t2"), col("t3"),
        expr("array_min(filter(pu, x -> x > t3))").as("t4"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("step_signup"), count(col("t2")).as("step_view"),
        count(col("t3")).as("step_click"), count(col("t4")).as("step_purchase"))
  }

  val b33FunnelSql: String =
    """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |t2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN t1 USING (user_id)
      |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
      |t3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN t2 USING (user_id)
      |       WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
      |t4 AS (SELECT e.user_id, MIN(ts) AS t4 FROM events e JOIN t3 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1)
      |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
      |  (SELECT COUNT(*) FROM t1) AS step_signup,
      |  (SELECT COUNT(*) FROM t2) AS step_view,
      |  (SELECT COUNT(*) FROM t3) AS step_click,
      |  (SELECT COUNT(*) FROM t4) AS step_purchase""".stripMargin

  // ------------------------------------------------------------------ B34
  /** B34: COHORT RETENTION matrix — users bucketed by first-activity day
    * (their cohort), then distinct active users per (cohort, day-offset):
    * the other half of the product-analytics pair with B33. The cohort
    * assignment is a whole-partition window min (no orderBy → no sort,
    * one shuffle on user_id), and the matrix is one distinct-aggregate
    * over (cohort, offset) — Spark's two-phase countDistinct keeps the
    * per-key distinct-user sets partial-aggregated map-side. The oracle
    * derives cohorts with a join instead of a window — two algorithms,
    * one matrix.
    */
  def b34Cohort(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort", min(col("day")).over(Window.partitionBy(col("user_id"))))
      // cohort serialized as a plain yyyy-MM-dd string: the two engines'
      // parquet DATE logical types stringify differently in the gate
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val b34CohortSql: String =
    """WITH c AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort
      |           FROM events GROUP BY 1)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
      |  CAST(date_diff('day', cohort, CAST(ts AS DATE)) AS BIGINT) AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS users
      |FROM events e JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ B37
  /** B37: RANGE-frame rolling window — 7-day rolling order count and
    * revenue per customer, the moving-aggregate shape every monitoring
    * and feature-engineering pipeline computes. The frame is a VALUE
    * range (all orders within the trailing week), not a row count —
    * B31's ROWS frames can't express it when order density varies:
    * `rangeBetween(-6, 0)` over integer epoch days picks every row
    * whose day value falls in the window regardless of how many there
    * are. Same single (customer) shuffle + sort as B31; exact cents;
    * both engines order by the same integer day, so frame membership is
    * bit-identical (a timestamp RANGE frame would drag each engine's
    * interval arithmetic into the gate; integer days don't).
    */
  def b37RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day_num"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("rev_7d_cents", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
        col("n_7d"), col("rev_7d_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val b37RollingWindowSql: String =
    """SELECT o_custkey, o_orderkey, day_num,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
      |  CAST(SUM(cents) OVER w AS BIGINT) AS rev_7d_cents
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |      AS day_num,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------------------------ B38
  /** B38: CORRELATED SCALAR SUBQUERY (TPC-H Q17's shape — "line items
    * ordered below 20% of their part's average quantity") — the query
    * form analysts actually write, and the optimizer capability that
    * makes it runnable: executed literally it is one aggregate PER OUTER
    * ROW; Catalyst decorrelates it into a per-part aggregate joined back
    * (PlanAuditSpec pins the rewrite: an Aggregate on the subquery side,
    * no nested loop, no cartesian). Written as SQL text on temp views —
    * the repo's one deliberate SQL-surface gate, because decorrelation
    * IS a SQL-surface feature. Exact decimal sums under double division
    * at fixed points keep both engines bit-identical; the oracle runs
    * the identical correlated text, so the gate proves the rewrite
    * preserves semantics.
    */
  def b38CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("b38_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("b38_part")
    spark.sql("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
             COUNT(*) AS n_small
      FROM b38_lineitem JOIN b38_part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4'
        AND l_quantity < 0.2 * (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM b38_lineitem l2 WHERE l2.l_partkey = b38_part.p_partkey)""")
  }

  val b38CorrelatedSubquerySql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |         AS avg_yearly,
      |       COUNT(*) AS n_small
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < 0.2 * (
      |    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  // ------------------------------------------------------------------ B40
  /** B40: referential-integrity AUDIT — the data-quality gate run
    * before trusting any star join (an orphaned fact row silently
    * vanishes from every inner join that should have counted it): per
    * relationship, total fact rows, orphans (anti-join against the
    * dimension's key set), and intact rows. Anti-joins broadcast the
    * key side where it is dimension-sized and shuffle where it is not —
    * the same plan discipline as the joins they audit; output is one
    * row per relationship regardless of corpus size.
    */
  def b40IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, fact: DataFrame, factKey: String,
            dim: DataFrame, dimKey: String) = {
      val total = fact.count()
      val orphans = fact.join(dim.select(col(dimKey)),
        col(factKey) === col(dimKey), "left_anti").count()
      (name, total, orphans, total - orphans)
    }
    import spark.implicits._
    val rows = Seq(
      rel("orders->customer", Tables.orders(spark, dir).select(col("o_custkey")),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"),
      rel("lineitem->orders", Tables.lineitem(spark, dir).select(col("l_orderkey")),
        "l_orderkey", Tables.orders(spark, dir), "o_orderkey"),
      rel("events->customer", Tables.events(spark, dir).select(col("user_id")),
        "user_id", Tables.customer(spark, dir), "c_custkey"))
    rows.toDF("relationship", "n_rows", "n_orphans", "n_intact")
      .orderBy(col("relationship"))
  }

  val b40IntegrityAuditSql: String =
    """SELECT relationship, n_rows, n_orphans, n_rows - n_orphans AS n_intact
      |FROM (
      |  SELECT 'orders->customer' AS relationship,
      |    (SELECT COUNT(*) FROM orders) AS n_rows,
      |    (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
      |      (SELECT c_custkey FROM customer)) AS n_orphans
      |  UNION ALL
      |  SELECT 'lineitem->orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
      |      (SELECT o_orderkey FROM orders))
      |  UNION ALL
      |  SELECT 'events->customer',
      |    (SELECT COUNT(*) FROM events),
      |    (SELECT COUNT(*) FROM events WHERE user_id NOT IN
      |      (SELECT c_custkey FROM customer)))
      |ORDER BY relationship""".stripMargin

  // ------------------------------------------------------------------ B29
  /** B29: full CUBE + grouping_id — B10's rollup widened to every
    * grouping-set combination, with the standard GROUPING bit vector
    * distinguishing "NULL because aggregated away" from a NULL group
    * value (the OLAP-cube contract BI layers depend on). Same
    * partial-aggregate shape as rollup: Spark expands the sets and
    * map-side-combines each; the shuffle carries \|sets × groups\|
    * partials. grouping_id bit order (first listed column = MSB) is the
    * SQL standard in both engines — the gate would catch a divergence.
    */
  def b29Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum("o_totalprice").as("total"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val b29CubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  ${dsumSql("o_totalprice")} AS total, COUNT(*) AS n,
       |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------ B11
  /** Conditional aggregation + scalar-subquery-style comparison: share of
    * high-value orders per priority vs the global mean price.
    */
  def b11ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("n_high"),
        // Mean with NO floating point anywhere: o_totalprice has exactly 2
        // decimals, so decimal(18,2)*100 is an integral cents value; sum the
        // cents as BIGINT, then floor-divide to 1e-4 precision. The previous
        // double→DECIMAL(18,4) round-trip rounds the shortest decimal repr
        // in Spark but the exact binary value in DuckDB — at a rounding
        // boundary the two differ in the last digit, which failed this
        // gate's hash in rounds 1 and 2.
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
          .as("sum_cents"))
      .select(
        col("o_orderpriority"), col("n"), col("n_high"),
        expr("(sum_cents * 100) div n").as("avg_price_e4"))
      .orderBy(col("o_orderpriority"))
  }

  // n_high MUST be cast: DuckDB's SUM over INTEGER returns HUGEINT
  // (int128), which reaches the driver's comparison as float64 while Spark
  // writes int64 — values equal, dtype different, hash mismatch. This, not
  // the avg rounding, is what kept this gate red in rounds 1-3.
  val b11ConditionalAggSql: String =
    """SELECT o_orderpriority, n, n_high,
      |  CAST((sum_cents * 100) // n AS BIGINT) AS avg_price_e4
      |FROM (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------------ B12
  /** UNION ALL + deduplicating UNION over heterogeneous account sources. */
  def b12Union(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    c.unionAll(s).distinct()
      .groupBy(lit(1).as("grp")).agg(count(lit(1)).as("n_nations"))
      .select(col("n_nations"))
  }

  val b12UnionSql: String =
    """SELECT COUNT(*) AS n_nations FROM (
      |  SELECT DISTINCT nationkey FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    UNION ALL
      |    SELECT s_nationkey AS nationkey FROM supplier))""".stripMargin

  // ------------------------------------------------------------------ B13
  /** Skew-safe two-phase aggregation: pre-aggregate on (key, salt) — the
    * hot key's rows spread over 16 reducers — then merge partials by key.
    * Decimal partials make the two-phase sum EXACTLY equal to the direct
    * aggregate, which is what the oracle computes: result equality proves
    * the salting rewrite is semantics-preserving.
    */
  def b13SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,2)")).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("pv")).cast("double").as("total_value"))
      .orderBy(col("user_id"))

  val b13SaltedAggSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------ B15
  /** Statistical aggregates (mean/variance/stddev/correlation) derived
    * from EXACT decimal sums, with the floating-point math confined to a
    * final projection: `stddev_samp`/`corr` built-ins accumulate doubles
    * in partition order, which is not reproducible across engines or even
    * runs — exact Σx, Σx², Σxy make the result order-independent and
    * bit-identical to the oracle.
    */
  def b15Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        sum((col("l_quantity").cast("decimal(18,2)") *
             col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)")).as("sqq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
             col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(28,4)")).as("spp"),
        sum((col("l_quantity").cast("decimal(18,2)") *
             col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(28,4)")).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        expr("CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_qty"),
        expr("(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)").as("var_qty"),
        expr("sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))").as("stddev_qty"),
        // corr has the longest double op chain of the suite; its inputs
        // are exact decimals but the ÷/sqrt cascade can land 1 ulp apart
        // across engines (seen at sf0.001) — round to 12 dp (b2's
        // decimal-round pattern) so the gate compares math, not ulps
        expr("CAST(CAST((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)) / " +
          "(sqrt(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) * " +
          "sqrt(CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))) AS DECIMAL(20,12)) AS DOUBLE)").as("corr_qty_price"))
      .orderBy(col("l_returnflag"))

  val b15StatsSql: String =
    """SELECT l_returnflag, n,
      |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
      |  (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty,
      |  sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS stddev_qty,
      |  CAST(CAST((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)) /
      |    (sqrt(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) *
      |     sqrt(CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))) AS DECIMAL(20,12)) AS DOUBLE) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sqq,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS spp,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sqp
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------ B16
  /** Exact quantiles (sort-based): median and p95 per group. Spark
    * `percentile` ≡ DuckDB `quantile_cont` (linear interpolation at
    * (n-1)·p) up to last-ulp differences in the interpolation formula —
    * both sides round to 6 dp. The exact path complements B8's
    * approximate sketch (approx_count_distinct); at 100 TB you'd use
    * approx_percentile the same way, trading this exactness for a
    * mergeable sketch.
    */
  def b16Quantiles(spark: SparkSession, dir: String): DataFrame = {
    // EXACT quantiles via two-level bin SELECTION, not a full sort. The
    // previous shape (row_number window partitioned by l_linestatus) was
    // exact but its parallelism equaled the group count — 2-3 tasks would
    // own the whole corpus at scale. Here no full-data sort ever happens:
    //   1. per-group min/max/count (one codegen'd aggregate pass);
    //   2. per-group histogram over 1024 value bins (second pass, partial
    //      agg) + cumulative counts over the TINY histogram → each
    //      bracketing rank k is located in exactly one bin, along with
    //      its rank WITHIN that bin;
    //   3. third pass keeps only rows falling in a target bin (~n/1024
    //      rows, broadcast-joined bin list) and sorts per (group, mark) —
    //      partitions of ~hundreds of rows at any corpus size.
    // The interpolation math on the two bracketing VALUES (lo + frac·
    // (hi−lo), identical to quantile_cont) is unchanged, so results are
    // bit-identical to the sort-based form; bin boundaries only steer
    // WHERE the candidates are, never the answer.
    // r13: ONE pass for both value columns. The former shape invoked the
    // three-pass pipeline once per column (q("l_quantity") ⋈
    // q("l_extendedprice")) — six full-data passes and a ~12-job floor.
    // Exploding each row into (which, v) pairs (which 0 = quantity,
    // 1 = extendedprice) keys every stage by (g, which) instead of g, so
    // both columns ride the SAME three passes; per-column bin boundaries,
    // bracketing ranks and the interpolation arithmetic are exactly the
    // per-q() formulas (keyed by which), so the output values are
    // bit-identical — oracle-verified at sf0.001/0.01/0.1.
    import org.apache.spark.sql.expressions.Window
    val nBins = 1024
    // (which, percentile, slot): quantity carries median+p95, price median
    val ps = Seq((0, 0.5, 0), (0, 0.95, 1), (1, 0.5, 0))
    val base = Tables.lineitem(spark, dir)
      .select(col("l_linestatus").as("g"), explode(array(
        struct(lit(0).as("which"), col("l_quantity").cast("double").as("v")),
        struct(lit(1).as("which"), col("l_extendedprice").cast("double").as("v"))
      )).as("e"))
      .select(col("g"), col("e.which").as("which"), col("e.v").as("v"))
    // |groups|·2 rows; checkpointed because it feeds THREE broadcast
    // consumers (binned, hist's n join, the final n join) and each
    // broadcast build otherwise re-runs this full-data aggregate.
    // coalesce(1): without it every downstream broadcast build schedules
    // one task per shuffle partition just to read ~6 rows.
    val ext = base.groupBy(col("g"), col("which")).agg(
      min(col("v")).as("vmin"), max(col("v")).as("vmax"),
      count(lit(1)).as("n")).coalesce(1).localCheckpoint(true)
    val width = (col("vmax") - col("vmin")) / nBins
    val binned = base.join(broadcast(ext), Seq("g", "which"))
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0)).otherwise(
          least(lit(nBins - 1),
            floor((col("v") - col("vmin")) / width).cast("int"))))
    val hist = binned.groupBy(col("g"), col("which"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(ext.select(col("g"), col("which"), col("n"))),
        Seq("g", "which"))
      .withColumn("hi_rank", sum(col("cnt")).over(
        Window.partitionBy(col("g"), col("which")).orderBy(col("bin"))))
      .withColumn("lo_rank", col("hi_rank") - col("cnt") + 1)
    // each percentile contributes two marks (floor and ceil rank); a
    // histogram row emits its own column's marks whose rank lands inside it
    val marks = ps.flatMap { case (wh, p, i) =>
      val idx = (col("n") - 1).cast("double") * lit(p)
      Seq(struct(lit(wh).as("wh"), lit(2 * i).as("mid"),
          (floor(idx).cast("bigint") + 1).as("k")),
        struct(lit(wh).as("wh"), lit(2 * i + 1).as("mid"),
          (ceil(idx).cast("bigint") + 1).as("k")))
    }
    val tbins = hist.select(col("g"), col("which"), col("bin"), col("lo_rank"),
        explode(filter(array(marks: _*),
          m => m.getField("wh") === col("which") &&
            m.getField("k").between(col("lo_rank"), col("hi_rank")))).as("m"))
      .select(col("g"), col("which"), col("bin"), col("m.mid").as("mid"),
        (col("m.k") - col("lo_rank") + 1).as("rk"))
    val wv = Window.partitionBy(col("g"), col("which"), col("mid"))
      .orderBy(col("v"))
    val vals = binned.join(broadcast(tbins), Seq("g", "which", "bin"))
      .withColumn("rn", row_number().over(wv))
      .where(col("rn") === col("rk"))
    val aggs = ps.flatMap { case (wh, _, i) =>
      Seq(min(when(col("which") === wh && col("mid") === 2 * i, col("v")))
          .as(s"lo${wh}_$i"),
        min(when(col("which") === wh && col("mid") === 2 * i + 1, col("v")))
          .as(s"hi${wh}_$i"))
    }
    // per-column n as explicit columns (n is in fact identical across
    // which — both source columns are non-null — but keep them separate
    // so the interpolation index is per-column by construction)
    val ns = ext.groupBy(col("g")).agg(
      max(when(col("which") === 0, col("n"))).as("n0"),
      max(when(col("which") === 1, col("n"))).as("n1"))
    val names = Map((0, 0) -> "median_qty", (0, 1) -> "p95_qty",
      (1, 0) -> "median_price")
    val outs = ps.map { case (wh, p, i) =>
      val idx = (col(s"n$wh") - 1).cast("double") * lit(p)
      round(col(s"lo${wh}_$i") + (idx - floor(idx)) *
        (col(s"hi${wh}_$i") - col(s"lo${wh}_$i")), 6).as(names((wh, i)))
    }
    vals.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .join(broadcast(ns), "g")
      .select(col("g").as("l_linestatus") +: outs: _*)
      .orderBy(col("l_linestatus"))
  }

  val b16QuantilesSql: String =
    """SELECT l_linestatus,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ------------------------------------------------------------------ B17
  /** Pivot (crosstab): order counts by status × priority. The Dataset
    * `pivot` API with EXPLICIT pivot values — at scale, never let pivot
    * infer values (that's an extra distinct scan); the oracle states the
    * equivalent conditional aggregation.
    */
  private val pivotPriorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def b17Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", pivotPriorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(pivotPriorities.map(p => p -> s"n_${p.charAt(0)}").toMap)
      .orderBy(col("o_orderstatus"))

  val b17PivotSql: String = {
    val cols = pivotPriorities.map(p =>
      s"COUNT(*) FILTER (o_orderpriority = '$p') AS n_${p.charAt(0)}").mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cols
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  // ------------------------------------------------------------------ B19
  /** TPC-H Q14 shape (promo-revenue share): broadcast dim join + GLOBAL
    * conditional aggregation — the share numerator is a filtered sum over
    * the joined stream, computed in the same partial-agg pass as the
    * denominator (no second scan). Exact decimal sums; the final ratio is
    * one deterministic double division.
    */
  def b19PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(28,4)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(28,4)")))
          .as("promo"),
        sum(rev).as("total"),
        count(lit(1)).as("n_items"))
      .select(
        expr("CAST(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS DECIMAL(18,6))")
          .cast("double").as("promo_pct"),
        col("promo").cast("double").as("promo_rev"),
        col("total").cast("double").as("total_rev"),
        col("n_items"))
  }

  val b19PromoShareSql: String =
    """SELECT
      |  CAST(CAST(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS promo_pct,
      |  CAST(promo AS DOUBLE) AS promo_rev,
      |  CAST(total AS DOUBLE) AS total_rev,
      |  n_items
      |FROM (
      |  SELECT
      |    SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))
      |        ELSE CAST(0 AS DECIMAL(28,4)) END) AS promo,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS total,
      |    COUNT(*) AS n_items
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')""".stripMargin

  // ------------------------------------------------------------------ B18
  /** AS-OF join: each event matched to the user's most recent order
    * at-or-before the event time. Spark lacks a native as-of join; the
    * scalable re-expression is the UNION-MERGE shape: tag both sides,
    * union, ONE shuffle+sort on (key, time, side-tag), and a running
    * `last(..., ignoreNulls)` window carries the latest right-side payload
    * forward into each left row. No range-join candidate explosion, no
    * per-key loop — wall-clock is one sort-merge pass at any scale.
    * Right side is pre-deduped to one row per (key, time) so ties are
    * deterministic in both engines; the oracle is DuckDB's NATIVE
    * ASOF LEFT JOIN, an independent implementation of the semantics.
    */
  def b18AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
      .select(col("user_id").cast("bigint").as("k"), col("ts").as("t"),
        col("event_id"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("bigint").as("k"),
        col("o_orderdate").cast("timestamp").as("t"), col("o_orderkey"))
      .groupBy(col("k"), col("t")).agg(max(col("o_orderkey")).as("ok"))
    val left = e.select(col("k"), col("t"), lit(1).as("tag"),
      col("event_id"), lit(null).cast("bigint").as("ok"))
    val right = o.select(col("k"), col("t"), lit(0).as("tag"),
      lit(null).cast("bigint").as("event_id"), col("ok"))
    // right rows sort BEFORE left rows at equal t (tag 0 < 1) → the match
    // is inclusive (ts >= order time), exactly ASOF's `>=`
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionAll(right)
      .withColumn("asof_ok", last(col("ok"), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("k").as("user_id"), col("event_id"), col("t").as("ts"),
        col("asof_ok").as("o_orderkey"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val b18AsofJoinSql: String =
    """WITH od AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS k, CAST(o_orderdate AS TIMESTAMP) AS t,
      |         max(o_orderkey) AS ok
      |  FROM orders GROUP BY 1, 2)
      |SELECT CAST(e.user_id AS BIGINT) AS user_id, e.event_id, e.ts, od.ok AS o_orderkey
      |FROM events e
      |ASOF LEFT JOIN od ON CAST(e.user_id AS BIGINT) = od.k AND e.ts >= od.t
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------ B20
  /** KEYLESS range join — points (purchases) matched to every overlapping
    * time window (views ± 10 min), with NO equality key: the case Spark
    * would otherwise plan as a BroadcastNestedLoopJoin (candidates =
    * |L|×|R|, dead at scale). Re-expression: quantize time into fixed
    * bins, explode each window onto the bins it covers (≤ 2 here), tag
    * each point with its single bin, shuffle equi-join on the bin, then
    * apply the true interval predicate as a residual filter. Candidate
    * pairs are Σ_bin |windows∩bin|·|points∩bin| — proportional to real
    * temporal locality, not |L|×|R| — and because a point owns exactly ONE
    * bin, no pair can match twice, so no post-join dedup is needed. Both
    * sides hash-partition on the bin; AQE's skew-join split handles a hot
    * bin. Checksum column is an exact BIGINT sum (no float accumulation);
    * DuckDB's HUGEINT sum is cast back to BIGINT in the oracle.
    */
  // Bin width MUST equal the window width: that equality is what bounds a
  // window to <=2 exploded bins, gives each point a single bin, and makes
  // post-join dedup unnecessary. Both engines' interval literals derive
  // from this one constant so a width edit can't desynchronize them.
  private val b20BinUs = 600000000L
  private val b20BinMinutes = b20BinUs / 60000000L
  require(b20BinMinutes * 60000000L == b20BinUs,
    s"b20 bin width must be whole minutes, got $b20BinUs us")

  def b20RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val windows = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("t0"),
        expr(s"ts + INTERVAL $b20BinMinutes MINUTES").as("t1"))
      .withColumn("bin",
        explode(expr(s"sequence(unix_micros(t0) div $b20BinUs, unix_micros(t1) div $b20BinUs)")))
    val points = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("pt"),
        expr(s"unix_micros(ts) div $b20BinUs").as("bin"))
    windows.join(points, windows("bin") === points("bin") &&
        col("pt") >= col("t0") && col("pt") < col("t1"))
      .groupBy(col("view_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("p_id")).as("id_sum"))
      .orderBy(col("view_id"))
  }

  val b20RangeJoinSql: String =
    s"""SELECT v.event_id AS view_id, COUNT(*) AS n_hits,
       |  CAST(SUM(p.event_id) AS BIGINT) AS id_sum
       |FROM events v JOIN events p
       |  ON p.ts >= v.ts AND p.ts < v.ts + INTERVAL $b20BinMinutes MINUTE
       |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
       |GROUP BY 1 ORDER BY view_id""".stripMargin

  // ------------------------------------------------------------------ B21
  /** MERGEABLE incremental aggregation — the 100 TB pipeline primitive:
    * yesterday's aggregate state + today's partition, never a recompute
    * of history. The query computes per-status partial states (count,
    * exact cents sum, min/max date — every one a commutative monoid) over
    * two date-disjoint slices of `orders` SEPARATELY, then MERGES the
    * partial states (sum of counts, sum of sums, min of mins, max of
    * maxes) and derives the average from the merged sums. The oracle is
    * the direct single-pass aggregate over everything — equality IS the
    * mergeability proof (merge ∘ partial ≡ aggregate). Derived metrics
    * (avg) are computed only after the merge, from exact integers, which
    * is what makes the state re-usable: avg itself doesn't merge, its
    * numerator and denominator do.
    */
  def b21IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val o = Tables.orders(spark, dir).select(
      col("o_orderstatus").as("st"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
      col("o_orderdate").as("d"))
    def partial(slice: DataFrame): DataFrame = slice.groupBy(col("st")).agg(
      count(lit(1)).as("n"), sum(col("cents")).as("c"),
      min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    partial(o.where(col("d") < cut))
      .unionByName(partial(o.where(col("d") >= cut)))
      .groupBy(col("st"))
      .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("total_cents"),
        min(col("dmin")).as("first_date"), max(col("dmax")).as("last_date"))
      .withColumn("avg_cents", expr("total_cents DIV n_orders"))
      .orderBy(col("st"))
  }

  val b21IncrementalAggSql: String =
    """SELECT o_orderstatus AS st, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
      |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    // COUNT(*) AS avg_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ B25
  /** CHANGELOG COMPACTION (the CDC merge-on-read primitive): latest row
    * per key from an append-only changelog — here "current state per
    * user" over the events stream, versioned by (ts, event_id).
    *
    * The 100 TB shape is the AGGREGATE form, not the window form:
    * `max_by(payload, version)` is a commutative monoid, so the
    * aggregate map-side-combines (struct-ordered max_by plans as
    * SortAggregate — a LOCAL group-key sort per task, no exchange below
    * it) — every task keeps ONE candidate row per key and the shuffle
    * carries |keys| partials, never the changelog. The equivalent window
    * (`row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1`)
    * shuffles EVERY changelog row and sorts each partition — unboundedly
    * more traffic as history grows.
    * The oracle deliberately uses the window form: two different
    * algorithms agreeing on the same result, and the plan audit pins the
    * aggregate shape (partial max_by, no Window, no pre-exchange Sort).
    *
    * Versions are totally ordered per key ((ts, event_id), event_id
    * unique), so the argmax is deterministic in both engines.
    */
  def b25ChangelogCompact(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    e.groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("ts"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("n_versions"))
      .orderBy(col("user_id"))
  }

  val b25ChangelogCompactSql: String =
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |  event_type AS last_type, value AS last_value, n_versions
      |FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_versions
      |  FROM events)
      |WHERE rk = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------ B41
  /** B41: CDC compaction WITH DELETE TOMBSTONES — the half of the CDC
    * contract B25's upsert-only merge doesn't cover (a real changelog
    * carries deletes; a key whose LATEST revision is a tombstone must
    * vanish from the serving view, not serve its stale payload): the
    * same one-pass `max_by` monoid merge (map-side-combined, shuffle
    * carries \|keys\| candidates, never history — B25's scale shape,
    * audited there), with the tombstone flag RIDING INSIDE the argmax
    * payload so the delete decision is made by the same latest-wins
    * comparison, then a post-aggregate filter drops deleted keys —
    * never a pre-aggregate filter, which would resurrect the previous
    * revision of a deleted key. Tombstone = `event_type = 'error'` on
    * the fixture (deterministic; a real feed carries an op column).
    * The oracle uses the window form with the same post-rank filter —
    * two algorithms, one surviving key set.
    */
  def b41CdcDeletes(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"),
        (col("event_type") === "error").as("tomb"))
    e.groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("ts"), col("event_id"), col("event_type"),
            col("value"), col("tomb")),
          struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_versions"))
      .where(!col("last.tomb")) // post-merge: latest revision decides
      .select(col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("n_versions"))
      .orderBy(col("user_id"))
  }

  val b41CdcDeletesSql: String =
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |  event_type AS last_type, value AS last_value, n_versions
      |FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_versions
      |  FROM events)
      |WHERE rk = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_pushdown_scan"   -> (b1PushdownScan _),
    "b2_agg"             -> (b2Agg _),
    "b3_broadcast_join"  -> (b3BroadcastJoin _),
    "b4_shuffle_join"    -> (b4ShuffleJoin _),
    "b5_star_join"       -> (b5StarJoin _),
    "b6_window"          -> (b6Window _),
    "b7_topk"            -> (b7Topk _),
    "b8_distinct"        -> (b8Distinct _),
    "b9_semi_anti"       -> (b9SemiAnti _),
    "b10_rollup"         -> (b10Rollup _),
    "b11_conditional_agg" -> (b11ConditionalAgg _),
    "b12_union"          -> (b12Union _),
    "b13_salted_agg"     -> (b13SaltedAgg _),
    "b15_stats"          -> (b15Stats _),
    "b16_quantiles"      -> (b16Quantiles _),
    "b17_pivot"          -> (b17Pivot _),
    "b18_asof_join"      -> (b18AsofJoin _),
    "b19_promo_share"    -> (b19PromoShare _),
    "b20_range_join"     -> (b20RangeJoin _),
    "b21_incremental_agg" -> (b21IncrementalAgg _),
    "b22_bucketed_join"  -> (graft.core.BucketedLayout.b22BucketedJoin _),
    "b23_bucketed_asof"  -> (graft.core.BucketedLayout.b23BucketedAsof _),
    "b24_incremental_state" -> (graft.core.IncrementalState.b24MergeOnRead _),
    "b35_incremental_join"  -> (graft.core.IncrementalState.b35JoinView _),
    "b36_dpp_join"          -> (graft.core.PartitionedLayout.b36DppJoin _),
    "b37_rolling_window"    -> (b37RollingWindow _),
    "b38_correlated_subquery" -> (b38CorrelatedSubquery _),
    "b39_merge_schema"      -> (graft.core.PartitionedLayout.b39MergeSchemaRead _),
    "b40_integrity_audit"   -> (b40IntegrityAudit _),
    "b28_heavy_hitters"  -> (graft.core.IncrementalState.b28HeavyHitters _),
    "b29_cube"           -> (b29Cube _),
    "b30_hist_quantiles" -> (graft.core.IncrementalState.b30HistQuantiles _),
    "b31_window_battery" -> (b31WindowBattery _),
    "b32_salted_join"    -> (b32SaltedJoin _),
    "b33_funnel"         -> (b33Funnel _),
    "b34_cohort"         -> (b34Cohort _),
    "b25_changelog_compact" -> (b25ChangelogCompact _),
    "b41_cdc_deletes"       -> (b41CdcDeletes _)
  )

  val oracle: Map[String, String] = Map(
    "b1_pushdown_scan"   -> b1PushdownScanSql,
    "b2_agg"             -> b2AggSql,
    "b3_broadcast_join"  -> b3BroadcastJoinSql,
    "b4_shuffle_join"    -> b4ShuffleJoinSql,
    "b5_star_join"       -> b5StarJoinSql,
    "b6_window"          -> b6WindowSql,
    "b7_topk"            -> b7TopkSql,
    "b8_distinct"        -> b8DistinctSql,
    "b9_semi_anti"       -> b9SemiAntiSql,
    "b10_rollup"         -> b10RollupSql,
    "b11_conditional_agg" -> b11ConditionalAggSql,
    "b12_union"          -> b12UnionSql,
    "b13_salted_agg"     -> b13SaltedAggSql,
    "b15_stats"          -> b15StatsSql,
    "b16_quantiles"      -> b16QuantilesSql,
    "b17_pivot"          -> b17PivotSql,
    "b18_asof_join"      -> b18AsofJoinSql,
    "b19_promo_share"    -> b19PromoShareSql,
    "b20_range_join"     -> b20RangeJoinSql,
    "b21_incremental_agg" -> b21IncrementalAggSql,
    "b22_bucketed_join"  -> graft.core.BucketedLayout.b22Sql,
    "b23_bucketed_asof"  -> graft.core.BucketedLayout.b23Sql,
    "b24_incremental_state" -> graft.core.IncrementalState.b24Sql,
    "b35_incremental_join"  -> graft.core.IncrementalState.b35Sql,
    "b36_dpp_join"          -> graft.core.PartitionedLayout.b36Sql,
    "b37_rolling_window"    -> b37RollingWindowSql,
    "b38_correlated_subquery" -> b38CorrelatedSubquerySql,
    "b39_merge_schema"      -> graft.core.PartitionedLayout.b39Sql,
    "b40_integrity_audit"   -> b40IntegrityAuditSql,
    "b28_heavy_hitters"  -> graft.core.IncrementalState.b28Sql,
    "b29_cube"           -> b29CubeSql,
    "b30_hist_quantiles" -> graft.core.IncrementalState.b30Sql,
    "b31_window_battery" -> b31WindowBatterySql,
    "b32_salted_join"    -> b32SaltedJoinSql,
    "b33_funnel"         -> b33FunnelSql,
    "b34_cohort"         -> b34CohortSql,
    "b25_changelog_compact" -> b25ChangelogCompactSql,
    "b41_cdc_deletes"       -> b41CdcDeletesSql
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The delegated relational operator surface (SURVEY.md §2.B): every
  * operator family the reference exercises through DataFusion built-ins,
  * re-expressed as idiomatic Spark DataFrame plans over the parquet test
  * corpus, each paired with an ANSI-SQL oracle for the DuckDB gate.
  *
  * Determinism discipline (the driver hash-compares values against
  * DuckDB):
  *   - Sums/avgs of double columns go through an exact, tight
  *     `DecimalType` cast before aggregation (decimal addition is
  *     associative, so Spark's partial aggregation order can't change
  *     the result), then the exact decimal is cast to double. The
  *     oracle SQL mirrors the same casts, so both engines produce
  *     bit-identical doubles.
  *   - Every query's result is a deterministic *set* (unique sort keys
  *     for any LIMIT/OFFSET/window ordering).
  *   - Int32-origin outputs are cast to BIGINT on both sides.
  *
  * Scale notes: dimension tables (`region`, `nation`, `customer`,
  * `supplier`, `part`) are broadcast explicitly; fact-fact joins key on
  * the natural join columns so the shuffle is a single hash exchange
  * that AQE can coalesce. Nothing collects to the driver.
  */
object Relational {

  private def dec(c: Column, p: Int, s: Int = 2): Column = c.cast(DecimalType(p, s))
  /** Exact sum of a 2-decimal-valued double column, returned as double. */
  private def dsum(c: Column, p: Int = 14): Column = sum(dec(c, p)).cast("double")
  /** Exact-sum-based average (identical in both engines). */
  private def davg(c: Column, p: Int = 14): Column =
    (sum(dec(c, p)).cast("double") / count(c)).cast("double")
  /** lineitem revenue: extendedprice * (1 - discount), exact decimal. */
  private def revenue(price: Column, disc: Column): Column =
    dec(price, 14) * (dec(lit(1), 4) - dec(disc, 4))

  private val sqlRev =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- queries

  /** TPC-H Q1-style pricing summary: wide hash aggregation with
    * map-side partial agg; exercises SUM/AVG/COUNT + GROUP BY
    * (SURVEY §2.B aggregations). */
  def q1_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 12).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")) * (dec(lit(1), 4) + dec(col("l_tax"), 4)))
          .cast("double").as("sum_charge"),
        davg(col("l_quantity"), 12).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Projection + arithmetic expressions + comparison predicates
    * (§2.B projections/filters); filter + column pruning both reach the
    * parquet scan. */
  def q2_filter_arith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") > lit(0.02) && col("l_quantity") < lit(24))
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        (dec(col("l_extendedprice"), 14) * dec(col("l_discount"), 4)).cast("double").as("disc_amount"),
        // decimal multiply stays exact in both engines; decimal *division*
        // degrades to double division in DuckDB, so scale by 1.8 not *9/5
        ((dec(col("l_extendedprice"), 14) - dec(lit(273.15), 6)) * dec(lit(1.8), 3))
          .cast("double").as("scaled"))

  /** TPC-H Q3-style shipping priority: dim broadcast + fact-fact shuffle
    * join + agg + deterministic top-10 (§2.B joins). */
  def q3_join_agg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Four-table star join, dims broadcast (§2.B joins): revenue rollup
    * region → nation. */
  def q4_multi_join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("o_totalprice")).as("total_revenue"), count(lit(1)).as("n_orders"))

  /** LEFT OUTER join with a non-trivial key expression
    * (reference: `a.lat = b.lat + 1`, docs/CLI_REFERENCE.md:417-426). */
  def q5_left_join_expr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey") + 1, "left")
      .groupBy("n_name")
      .agg(count(col("s_suppkey")).as("n_suppliers"))

  /** Semi + anti join (EXISTS / NOT EXISTS). */
  def q6_semi_anti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val semi = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal"), 12).as("acctbal"))
      .select(lit("with_orders").as("grp"), col("n"), col("acctbal"))
    val anti = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal"), 12).as("acctbal"))
      .select(lit("no_orders").as("grp"), col("n"), col("acctbal"))
    semi.unionAll(anti)
  }

  /** ROW_NUMBER() OVER (PARTITION BY … ORDER BY …) with a unique sort
    * key (§2.B windows). */
  def q7_window_rownum(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the corpus; quantity +
    // price complete a total order so both engines rank identically
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("rn").cast("long").as("rn"))
  }

  /** RANK / DENSE_RANK (ties share ranks — deterministic by value). */
  def q8_window_rank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
    t(s, dir, "part")
      .withColumn("price_rank", rank().over(w).cast("long"))
      .withColumn("price_dense_rank", dense_rank().over(w).cast("long"))
      .filter(col("price_rank") <= 2)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("price_rank"), col("price_dense_rank"))
  }

  /** LAG / LEAD over per-customer order history. */
  def q9_window_lag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"))
  }

  /** Moving aggregate with frame ROWS BETWEEN 2 PRECEDING AND CURRENT
    * ROW (reference docs/CLI_REFERENCE.md:291-300); exact decimal sum
    * divided by frame count so both engines agree bit-for-bit. */
  def q10_window_frame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(-2, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        (sum(dec(col("l_quantity"), 12)).over(w).cast("double") /
          count(lit(1)).over(w)).cast("double").as("moving_avg_qty"))
  }

  /** ORDER BY … LIMIT k (TakeOrderedAndProject — no full sort at scale). */
  def q11_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** LIMIT … OFFSET over a unique total order. */
  def q12_limit_offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .offset(40).limit(20)

  /** DISTINCT (hash aggregate, no value columns). */
  def q13_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"))
      .distinct()

  /** GROUP BY + HAVING (post-aggregation filter). */
  def q14_having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 12)

  /** BETWEEN / IN / IS NOT NULL predicate surface. */
  def q15_between_in(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity").between(10, 20) &&
        col("l_returnflag").isin("A", "R") && col("l_shipdate").isNotNull)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))

  /** UNION ALL of two heterogeneous selects (tagged). */
  def q16_union(s: SparkSession, dir: String): DataFrame = {
    val hi = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(lit("high").as("bucket"), col("o_orderkey").as("key"), col("o_totalprice").as("amount"))
    val lo = t(s, dir, "orders").filter(col("o_totalprice") < 2000)
      .select(lit("low").as("bucket"), col("o_orderkey").as("key"), col("o_totalprice").as("amount"))
    hi.unionAll(lo)
  }

  /** INTERSECT and EXCEPT set operations. */
  def q17_intersect_except(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val f = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = ord.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
    o.intersect(f).except(p)
  }

  /** WITH … multiple CTEs (SQL surface; §2.B CTEs). */
  def q18_cte(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "orders", "customer")
    s.sql("""
      WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey
      ), segments AS (
        SELECT c_custkey, c_mktsegment FROM customer
      )
      SELECT c_mktsegment, COUNT(*) AS n_customers,
             CAST(CAST(CAST(SUM(CAST(spent AS DECIMAL(16,2))) AS STRING) AS DOUBLE) / SUM(n_orders) AS DOUBLE)
               AS avg_order_value
      FROM cust_orders JOIN segments ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    """)
  }

  /** Scalar subquery: orders above the global average price. The
    * average is an exact decimal sum / count, so both engines compare
    * against the identical double threshold. */
  def q19_subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "orders")
    s.sql("""
      SELECT o_orderstatus, COUNT(*) AS n_above
      FROM orders
      WHERE o_totalprice > (
        SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) / COUNT(*) FROM orders)
      GROUP BY o_orderstatus
    """)
  }

  /** GROUP BY ROLLUP (multi-level aggregate). */
  def q20_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 12).as("sum_qty"))

  /** GROUP BY CUBE. */
  def q21_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  /** Scalar function surface: string / date / math / conditional
    * (§2.B scalar functions — all codegen'd builtins, no UDFs). */
  def q22_scalar_funcs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority").substr(1, 1)).as("status_code"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        round(col("o_totalprice")).as("price_rounded"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_k"),
        abs(col("o_totalprice") - lit(250000.0)).as("dist_from_mid"),
        (col("o_orderkey") % 7).as("key_mod"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("size_class"))

  /** Tumbling-window aggregation over the events table (hour buckets) —
    * the batch equivalent of the streaming pipeline in
    * graft.streaming; also exercises timestamp arithmetic. */
  def q23_events_window(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hour_bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 10).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** GROUPING SETS (beyond the reference's exercised surface; free in
    * both engines). */
  def q24_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)
  }

  /** Approximate distinct counting (HyperLogLog++), restated as a
    * machine-checkable bounded assertion: the sketch runs in-query next
    * to the exact count, but the emitted columns are all
    * engine-deterministic — the exact count, an integer error bound
    * (10% = 5× the sketch's 2% rsd, computed as `(exact+9) div 10` so
    * both engines agree bit-for-bit with no float rounding), and
    * `within_bound`. The oracle recomputes the exact side and emits
    * literal TRUE; a sketch outside its bound hash-mismatches the gate.
    * Raw sketch-vs-exact stays pinned in RelationalSpec via
    * [[q25_raw]]. */
  def q25_approx_distinct(s: SparkSession, dir: String): DataFrame =
    q25_raw(s, dir)
      .select(col("l_returnflag"), col("exact_orders"),
        expr("(exact_orders + 9) div 10").as("bound"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          expr("(exact_orders + 9) div 10")).as("within_bound"))

  /** The HLL++ sketch next to the exact distinct count (spec surface). */
  def q25_raw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))

  private val q25Sql = """
    SELECT l_returnflag,
      COUNT(DISTINCT l_orderkey) AS exact_orders,
      (COUNT(DISTINCT l_orderkey) + 9) // 10 AS bound,
      TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag"""

  /** As-of join, composed from a range-frame window (Spark has no ASOF
    * JOIN operator): for each purchase event, the user's most recent
    * view at-or-before it. One shuffle on `user_id`, no self-join —
    * the scalable as-of at any data size. The range frame (not a rows
    * frame) makes µs-truncation ties behave exactly like the oracle's
    * `v.ts_us <= p.ts_us` predicate. */
  def q26_asof_join(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_view_us",
        max(when(col("event_type") === "view", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase" && col("last_view_us").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_view_us"), (col("ts_us") - col("last_view_us")).as("gap_us"))
  }

  private val q26Sql = """
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      FROM events)
    SELECT p.event_id, p.user_id, p.ts_us,
      MAX(v.ts_us) AS last_view_us,
      p.ts_us - MAX(v.ts_us) AS gap_us
    FROM e p JOIN e v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts_us"""

  /** RANGE-frame window (value-based frame, vs q10's ROWS frame):
    * per event, activity of the same user in the preceding 60 s
    * exclusive of the current instant. Decimal-exact value sum. */
  def q27_range_frame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-60000000L, -1L)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_prev_min"),
        coalesce(sum(dec(col("value"), 10)).over(w).cast("double"), lit(0.0))
          .as("sum_prev_min"))
  }

  private val q27Sql = """
    WITH e AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
      FROM events)
    SELECT event_id, user_id, ts_us,
      COUNT(*) OVER w AS n_prev_min,
      COALESCE(CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER w AS STRING) AS DOUBLE), 0.0)
        AS sum_prev_min
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 60000000 PRECEDING AND 1 PRECEDING)"""

  /** Correlated EXISTS / NOT EXISTS (rewritten by Catalyst to
    * semi/anti joins — the declarative twin of q6). */
  def q28_exists(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "customer", "orders")
    s.sql("""
      SELECT c_mktsegment,
        COUNT(*) AS n_customers,
        CAST(SUM(CASE WHEN EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders
      FROM customer c
      GROUP BY c_mktsegment
    """)
  }

  private val q28Sql = """
    SELECT c_mktsegment,
      COUNT(*) AS n_customers,
      CAST(SUM(CASE WHEN EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders
    FROM customer c
    GROUP BY c_mktsegment"""

  /** UNPIVOT: wide → long over the two lineitem charge columns
    * (`Dataset.unpivot`; melt semantics). */
  def q29_unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        dec(col("l_extendedprice"), 14).as("price"), dec(col("l_tax"), 4).as("tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("price").cast("double").as("price"), col("tax").cast("double").as("tax")),
        "charge_kind", "amount")
      .groupBy("charge_kind")
      .agg(count(lit(1)).as("n"), dsum(col("amount"), 18).as("total"))

  private val q29Sql = """
    WITH melted AS (
      SELECT l_orderkey, 'price' AS charge_kind,
        CAST(CAST(l_extendedprice AS DECIMAL(14,2)) AS DOUBLE) AS amount
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'tax' AS charge_kind,
        CAST(CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE) AS amount
      FROM lineitem)
    SELECT charge_kind, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total
    FROM melted GROUP BY charge_kind"""

  /** Ranking-function breadth: ntile, percent_rank, cume_dist over a
    * total order (all exact rationals of row counts — bit-identical
    * across engines). */
  def q30_window_ranks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .filter(col("o_orderkey") % 100 === 0)
  }

  private val q30Sql = """
    SELECT o_orderkey, o_orderstatus, quartile, pct_rank, cume FROM (
      SELECT o_orderkey, o_orderstatus,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey))
    WHERE o_orderkey % 100 = 0"""

  /** Exact interpolated percentiles at binary-exact fractions (.25/.5/
    * .75): the interpolation arithmetic `lower + frac*(upper-lower)`
    * is exact in double for int inputs at these fractions, so both
    * engines agree bit-for-bit. */
  def q31_percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(q, 0.25)").as("p25"),
        expr("percentile(q, 0.5)").as("p50"),
        expr("percentile(q, 0.75)").as("p75"),
        count(lit(1)).as("n"))

  private val q31Sql = """
    SELECT l_returnflag,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.25) AS p25,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.5) AS p50,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.75) AS p75,
      COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag"""

  /** Hot-key aggregation through [[Skew.saltedSum]] (two-phase salted
    * partial→final). Results are identical to the plain GROUP BY —
    * that is the point: the oracle IS the unsalted query, proving the
    * mitigation changes only the shuffle layout. l_returnflag has 3
    * values over 600k rows — exactly the dominant-key shape AQE's
    * skew-join split cannot help with (it is an aggregation). */
  def k1_salted_agg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSum(
      t(s, dir, "lineitem"), "l_returnflag",
      dec(col("l_quantity"), 12), "sum_qty", saltFactor = 8)
      .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"))

  private val k1Sql = """
    SELECT l_returnflag,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag"""

  /** Hot-key join through [[Skew.saltedJoin]] (salted big side,
    * replicated small side). Oracle = the plain join. */
  def k2_salted_join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Skew.saltedJoin(t(s, dir, "orders"), cust, "o_custkey", saltFactor = 4)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  private val k2Sql = """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment"""

  /** Statistical aggregates (variance, stddev, correlation) computed
    * from exact decimal power sums rather than the engines' internal
    * accumulators — the only formulation that is bit-identical across
    * engines AND cluster sizes: the sums are exact decimals (order-
    * independent), and the final double arithmetic is the same textual
    * expression on both sides. sqrt is IEEE-correctly-rounded, so it
    * preserves the match. */
  def q32_stats_manual(s: SparkSession, dir: String): DataFrame = {
    val q = dec(col("l_quantity"), 12)
    val p = dec(col("l_extendedprice"), 14)
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sum_q"),
        sum(q * q).cast("double").as("sum_qq"),
        sum(p).cast("double").as("sum_p"),
        sum(q * p).cast("double").as("sum_qp"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sum_qq") - col("sum_q") * col("sum_q")) /
          (col("n") * (col("n") - 1))).as("var_q"),
        sqrt((col("n") * col("sum_qq") - col("sum_q") * col("sum_q")) /
          (col("n") * (col("n") - 1))).as("stddev_q"),
        ((col("n") * col("sum_qp") - col("sum_q") * col("sum_p")))
          .as("cov_num_qp"))
  }

  private val q32Sql = """
    WITH sums AS (
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_q,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qq,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS sum_p,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS sum_qp
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      (n * sum_qq - sum_q * sum_q) / (n * (n - 1)) AS var_q,
      SQRT((n * sum_qq - sum_q * sum_q) / (n * (n - 1))) AS stddev_q,
      (n * sum_qp - sum_q * sum_p) AS cov_num_qp
    FROM sums"""

  /** Funnel analysis over the event stream: users who viewed → first
    * click at-or-after that view → first purchase at-or-after that
    * click. Each stage is one aggregation + one re-join on `user_id`
    * (same shuffle key throughout, so at scale the exchanges reuse the
    * partitioning). Exact µs integer arithmetic. */
  def q33_funnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("v_ts"))
    val c = e.filter(col("event_type") === "click").as("e")
      .join(v, "user_id").filter(col("ts_us") >= col("v_ts"))
      .groupBy("user_id").agg(min("ts_us").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase").as("e")
      .join(c, "user_id").filter(col("ts_us") >= col("c_ts"))
      .groupBy("user_id").agg(min("ts_us").as("p_ts"))
    v.agg(count(lit(1)).as("n_view")).crossJoin(
      c.agg(count(lit(1)).as("n_click_after_view"))).crossJoin(
      p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  private val q33Sql = """
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
    v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts_us) AS c_ts
          FROM e JOIN v ON e.user_id = v.user_id AND e.ts_us >= v.v_ts
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts_us) AS p_ts
          FROM e JOIN c ON e.user_id = c.user_id AND e.ts_us >= c.c_ts
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click"""

  /** Approximate quantiles (GK sketch via `approx_percentile` with
    * accuracy 10000), restated like q25 as a machine-checkable bounded
    * assertion: the emitted columns are the exact interpolated
    * percentiles (the q31 arithmetic both engines agree on
    * bit-for-bit), the group count, and `within_bound` — the GK rank
    * error is ≤ n/accuracy, which on the dense 1..50 quantity domain
    * means |approx − exact| ≤ 1. The oracle recomputes the exact side
    * (QUANTILE_CONT) and emits literal TRUE; a sketch outside its
    * bound hash-mismatches. At scale the sketch is the point: constant
    * memory per group and a mergeable partial per partition, vs
    * percentile()'s full value buffer. Raw sketch-vs-exact stays
    * pinned in RelationalSpec via [[q34_raw]]. */
  def q34_approx_quantile(s: SparkSession, dir: String): DataFrame =
    q34_raw(s, dir)
      .select(col("l_returnflag"),
        col("ep25"), col("ep50"), col("ep75"), col("n"),
        (abs(col("ap25") - col("ep25")) <= lit(1.0) &&
          abs(col("ap50") - col("ep50")) <= lit(1.0) &&
          abs(col("ap75") - col("ep75")) <= lit(1.0)).as("within_bound"))

  /** The GK sketch percentiles next to their exact counterparts in one
    * pass (spec surface). */
  def q34_raw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(q, array(0.25, 0.5, 0.75), 10000)").as("ap"),
        expr("percentile(q, array(0.25, 0.5, 0.75))").as("ep"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("ap"), 1).cast("long").as("ap25"),
        element_at(col("ap"), 2).cast("long").as("ap50"),
        element_at(col("ap"), 3).cast("long").as("ap75"),
        element_at(col("ep"), 1).as("ep25"),
        element_at(col("ep"), 2).as("ep50"),
        element_at(col("ep"), 3).as("ep75"),
        col("n"))

  private val q34Sql = """
    SELECT l_returnflag,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.25) AS ep25,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.5) AS ep50,
      QUANTILE_CONT(CAST(l_quantity AS BIGINT), 0.75) AS ep75,
      COUNT(*) AS n,
      TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag"""

  /** Higher-order array functions (transform / filter / aggregate /
    * slice) over per-document token arrays — the lambda-function
    * surface Spark codegens without UDFs. All arithmetic is exact
    * int64; DuckDB mirrors with list_transform / list_filter /
    * list_aggregate and 1-based slices. The head3 array is serialized
    * with a '|' delimiter so the driver's pandas-based row hash (which
    * cannot sort on unhashable list cells) compares it as a plain
    * string; the raw-array semantics stay covered in RelationalSpec. */
  def q35_higher_order(s: SparkSession, dir: String): DataFrame =
    q35_arrays(s, dir)
      .withColumn("head3", expr("array_join(head3, '|')"))

  /** q35 with the head3 column as a genuine array — used by the spec
    * to pin the lambda/slice semantics before serialization. */
  def q35_arrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("CAST(size(filter(toks, x -> length(x) > 4)) AS BIGINT)").as("n_long"),
        expr("aggregate(toks, 0L, (acc, x) -> acc + CAST(length(x) AS BIGINT))")
          .as("total_len"),
        expr("transform(slice(toks, 1, 3), x -> upper(x))").as("head3"))

  private val q35Sql = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 0) AS toks
      FROM documents)
    SELECT doc_id,
      CAST(LEN(toks) AS BIGINT) AS n_toks,
      CAST(LEN(list_filter(toks, x -> LENGTH(x) > 4)) AS BIGINT) AS n_long,
      CAST(list_aggregate(list_transform(toks, x -> LENGTH(x)), 'sum') AS BIGINT)
        AS total_len,
      array_to_string(list_transform(toks[1:3], x -> UPPER(x)), '|') AS head3
    FROM toks"""

  /** Array aggregation: per-(lang, source) sorted id lists with
    * min/max/count — collect_list + sort_array gives a deterministic
    * array result (one shuffle on the group key; the per-group array
    * is the parallelism-bounded payload, same as any list aggregate).
    * The sorted id list is serialized comma-delimited for the driver's
    * pandas row hash; the raw-array shape is pinned in RelationalSpec. */
  def q36_array_agg(s: SparkSession, dir: String): DataFrame =
    q36_arrays(s, dir)
      .withColumn("ids", expr("array_join(transform(ids, x -> CAST(x AS STRING)), ',')"))

  /** q36 with the ids column as a genuine sorted array. */
  def q36_arrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(
        sort_array(collect_list(col("doc_id"))).as("ids"),
        min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"),
        count(lit(1)).as("n"))

  private val q36Sql = """
    SELECT lang, source,
      array_to_string(list_sort(list(doc_id)), ',') AS ids,
      MIN(doc_id) AS lo, MAX(doc_id) AS hi, COUNT(*) AS n
    FROM documents GROUP BY lang, source"""

  /** Recursive CTE: a month ladder spanning the order history (gap
    * months included with zero counts) — the calendar-dimension
    * generation every reporting pipeline needs. SURVEY §2.B listed
    * recursive CTEs as a gap ("Spark has none"); Spark 4 added
    * `WITH RECURSIVE` (SPARK-24497), so the same ANSI text now runs on
    * both engines. Recursion depth = month span (~80), far under
    * Spark's recursion limit; the ladder is driver-tiny and the join
    * against per-month aggregates is the only distributed work. */
  private val q37Text = """
    WITH RECURSIVE months(m) AS (
      SELECT CAST((SELECT MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) FROM orders) AS BIGINT)
      UNION ALL
      SELECT m + 1 FROM months
      WHERE m < (SELECT MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) FROM orders)
    ),
    per AS (
      SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT) AS m,
        COUNT(*) AS n_orders,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT months.m AS month_id,
      CAST(FLOOR((months.m - 1) / 12) AS BIGINT) AS yr,
      CAST((months.m - 1) % 12 + 1 AS BIGINT) AS mo,
      CAST(COALESCE(per.n_orders, 0) AS BIGINT) AS n_orders,
      CAST(COALESCE(per.revenue, 0.0) AS DOUBLE) AS revenue
    FROM months LEFT JOIN per ON per.m = months.m"""

  def q37_recursive_cte(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "orders")
    // Bounds computed once, driver-side (two tiny aggregates), then
    // inlined as literals: scalar subqueries inside the recursive step
    // are re-evaluated per iteration — ~80 full `orders` scans for an
    // 80-month ladder. The oracle keeps the subquery form (one pass in
    // DuckDB); results are identical.
    val Array(lo, hi) = s.sql(
      """SELECT MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)),
                MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) FROM orders""")
      .collect().head.toSeq.map(v => v.asInstanceOf[Number].longValue).toArray
    s.sql(q37Text
      .replace("(SELECT MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) FROM orders)", lo.toString)
      .replace("(SELECT MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) FROM orders)", hi.toString))
  }

  private val q37Sql = q37Text

  /** Semi-structured extraction: events.props is a JSON string; pull a
    * typed field out and aggregate — the metadata-extraction step every
    * ingest pipeline has. `get_json_object` stays inside codegen (no
    * UDF); at scale this runs map-side with only the small per-type
    * aggregate shuffling. */
  def q38_json_extract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  private val q38Sql = """
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
      CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type"""

  /** Correlated LATERAL join: top-2 orders per customer — the
    * "top-N per group via lateral subquery" idiom (both engines run
    * the identical ANSI text; Catalyst decorrelates it into a ranked
    * window, so no per-customer rescan happens at scale). Restricted
    * to one nation to keep gate output compact. */
  private val q39Text = """
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c_nationkey = 7"""

  def q39_lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.views(s, dir, "customer", "orders")
    s.sql(q39Text)
  }

  private val q39Sql = q39Text

  /** max_by / min_by (argmax/argmin aggregates, Spark 3.3+): per
    * nation, the customer holding the max/min account balance. Both
    * engines' argmax is documented tie-NONDETERMINISTIC, and replica
    * corpora (ScaleUp) tie balances k ways by construction — so the
    * ordering value is a composed bigint sort key, cents·10⁸ +
    * custkey, which breaks balance ties by custkey identically on
    * every engine and scale (lexicographic as long as 0 ≤ custkey <
    * 10⁸; richest tie → larger custkey, poorest tie → smaller). One
    * hash aggregate with map-side partials — argmax state is a single
    * (value, arg) pair per group at any scale. */
  def q40_argmax(s: SparkSession, dir: String): DataFrame = {
    val key = (dec(col("c_acctbal"), 12) * lit(100)).cast("long") * lit(100000000L) +
      col("c_custkey")
    t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(
        max_by(col("c_custkey"), key).as("richest"),
        min_by(col("c_custkey"), key).as("poorest"),
        max(dec(col("c_acctbal"), 12)).cast("double").as("max_bal"))
  }

  private val q40Sql = """
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
      ARG_MAX(c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * 100000000 + c_custkey) AS richest,
      ARG_MIN(c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * 100000000 + c_custkey) AS poorest,
      CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
    FROM customer GROUP BY 1"""

  /** Positional window values: first_value / last_value / nth_value
    * over the full partition frame (UNBOUNDED PRECEDING..UNBOUNDED
    * FOLLOWING — last_value under the default frame is just the
    * current row, the classic trap), ordered by the unique
    * (ts, event_id) key so results are deterministic. One shuffle on
    * user_id; frame evaluation is per-partition. */
  def q43_window_firstlast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        first(col("event_id")).over(w).as("first_ev"),
        last(col("event_id")).over(w).as("last_ev"),
        nth_value(col("event_id"), 2).over(w).as("second_ev"),
        count(lit(1)).over(w).cast("long").as("n_user_events"))
  }

  private val q43Sql = """
    SELECT event_id, user_id,
      FIRST_VALUE(event_id) OVER w AS first_ev,
      LAST_VALUE(event_id) OVER w AS last_ev,
      NTH_VALUE(event_id, 2) OVER w AS second_ev,
      CAST(COUNT(*) OVER w AS BIGINT) AS n_user_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""

  /** Map-typed columns end to end: per-user event-type counts rolled
    * into a `map<string,long>` (`map_from_entries` over a sorted
    * entry list), cardinality via `size`, `map_filter` lambda keeps
    * hot types, `explode` unrolls back to rows. The map round-trip is
    * the operator under test; the oracle is the equivalent relational
    * form (GROUP BY + window count + HAVING). One shuffle for the
    * count, one for the per-user rollup — both key on user_id. */
  def q41_map_funcs(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    counts.groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(col("user_id"), size(col("m")).cast("long").as("n_types"),
        explode(map_filter(col("m"), (_, v) => v >= 3)))
      .withColumnRenamed("key", "event_type")
      .withColumnRenamed("value", "cnt")
  }

  private val q41Sql = """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2),
    w AS (
      SELECT user_id, event_type, cnt,
        COUNT(*) OVER (PARTITION BY user_id) AS n_types FROM c)
    SELECT user_id, CAST(n_types AS BIGINT) AS n_types, event_type,
      CAST(cnt AS BIGINT) AS cnt
    FROM w WHERE cnt >= 3"""

  /** Datetime function surface over event timestamps: truncation,
    * field extraction (year/quarter/week/day-of-week/day-of-year),
    * interval arithmetic, month-end, and formatting. Pure per-row
    * codegen'd expressions — zero shuffles. Cross-engine parity
    * pinned where conventions differ: Spark `dayofweek` is 1=Sunday
    * vs DuckDB `dow` 0=Sunday (+1), both `weekofyear`/`week` are ISO
    * weeks, truncations compared as DATE. */
  def q42_datetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("ts"))
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM").as("ym"),
        year(col("ts")).cast("long").as("yr"),
        quarter(col("ts")).cast("long").as("qtr"),
        dayofweek(col("ts")).cast("long").as("dow"),
        dayofyear(col("ts")).cast("long").as("doy"),
        weekofyear(col("ts")).cast("long").as("iso_week"),
        date_trunc("MONTH", col("ts")).cast("date").as("month_start"),
        (col("ts") + expr("INTERVAL 7 DAYS")).cast("date").as("plus_week"),
        last_day(col("ts")).as("month_end"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour_bucket"))

  private val q42Sql = """
    SELECT event_id,
      strftime(ts, '%Y-%m') AS ym,
      CAST(EXTRACT(year FROM ts) AS BIGINT) AS yr,
      CAST(EXTRACT(quarter FROM ts) AS BIGINT) AS qtr,
      CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS dow,
      CAST(EXTRACT(doy FROM ts) AS BIGINT) AS doy,
      CAST(EXTRACT(week FROM ts) AS BIGINT) AS iso_week,
      CAST(date_trunc('month', ts) AS DATE) AS month_start,
      CAST(ts + INTERVAL 7 DAY AS DATE) AS plus_week,
      last_day(CAST(ts AS DATE)) AS month_end,
      strftime(ts, '%Y-%m-%d %H') AS hour_bucket
    FROM events"""

  // ---------------------------------------------------------------- oracles

  private val q1Sql = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM($sqlRev) AS STRING) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM($sqlRev * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_charge,
      CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS STRING) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus"""

  private val q2Sql = """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc_amount,
      CAST((CAST(l_extendedprice AS DECIMAL(14,2)) - CAST(273.15 AS DECIMAL(6,2))) * CAST(1.8 AS DECIMAL(3,2)) AS DOUBLE) AS scaled
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount > 0.02 AND l_quantity < 24"""

  private val q3Sql = s"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
      CAST(CAST(SUM($sqlRev) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""

  private val q4Sql = """
    SELECT r_name, n_name,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_revenue,
      COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name"""

  private val q5Sql = """
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey + 1
    GROUP BY n_name"""

  private val q6Sql = """
    SELECT 'with_orders' AS grp, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS acctbal
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'no_orders' AS grp, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS acctbal
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""

  private val q7Sql = """
    SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber,
        ROW_NUMBER() OVER (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
      FROM lineitem) x
    WHERE rn <= 3"""

  private val q8Sql = """
    SELECT p_brand, p_partkey, p_retailprice,
      CAST(price_rank AS BIGINT) AS price_rank,
      CAST(price_dense_rank AS BIGINT) AS price_dense_rank
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
        RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
        DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
      FROM part) x
    WHERE price_rank <= 2"""

  private val q9Sql = """
    SELECT o_custkey, o_orderkey,
      LAG(o_totalprice, 1) OVER w AS prev_price,
      LEAD(o_totalprice, 1) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  private val q10Sql = """
    SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS STRING) AS DOUBLE)
           / COUNT(*) OVER w AS DOUBLE) AS moving_avg_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""

  private val q11Sql = s"""
    SELECT l_orderkey, CAST(CAST(SUM($sqlRev) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  private val q12Sql = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 40"""

  private val q13Sql = """
    SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer"""

  private val q14Sql = """
    SELECT o_custkey, COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_spent
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12"""

  private val q15Sql = """
    SELECT l_returnflag, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R') AND l_shipdate IS NOT NULL
    GROUP BY l_returnflag"""

  private val q16Sql = """
    SELECT 'high' AS bucket, o_orderkey AS key, o_totalprice AS amount
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'low' AS bucket, o_orderkey AS key, o_totalprice AS amount
    FROM orders WHERE o_totalprice < 2000"""

  private val q17Sql = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'"""

  private val q18Sql = """
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS spent
      FROM orders GROUP BY o_custkey
    ), segments AS (
      SELECT c_custkey, c_mktsegment FROM customer
    )
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(CAST(CAST(SUM(CAST(spent AS DECIMAL(16,2))) AS STRING) AS DOUBLE) / SUM(n_orders) AS DOUBLE)
             AS avg_order_value
    FROM cust_orders JOIN segments ON o_custkey = c_custkey
    GROUP BY c_mktsegment"""

  private val q19Sql = """
    SELECT o_orderstatus, COUNT(*) AS n_above
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) / COUNT(*) FROM orders)
    GROUP BY o_orderstatus"""

  private val q20Sql = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""

  private val q21Sql = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""

  private val q22Sql = """
    SELECT o_orderkey,
      UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_name,
      CAST(LENGTH(o_orderpriority) AS BIGINT) AS prio_len,
      o_orderstatus || '-' || SUBSTRING(o_orderpriority, 1, 1) AS status_code,
      CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
      CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
      ROUND(o_totalprice) AS price_rounded,
      CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
      ABS(o_totalprice - 250000.0) AS dist_from_mid,
      o_orderkey % 7 AS key_mod,
      CASE WHEN o_totalprice > 300000 THEN 'big'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'small' END AS size_class
    FROM orders"""

  private val q24Sql = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""

  private val q23Sql = """
    SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS STRING) AS DOUBLE) AS sum_value,
      COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _),
    "q2_filter_arith" -> (q2_filter_arith _),
    "q3_join_agg" -> (q3_join_agg _),
    "q4_multi_join" -> (q4_multi_join _),
    "q5_left_join_expr" -> (q5_left_join_expr _),
    "q6_semi_anti" -> (q6_semi_anti _),
    "q7_window_rownum" -> (q7_window_rownum _),
    "q8_window_rank" -> (q8_window_rank _),
    "q9_window_lag" -> (q9_window_lag _),
    "q10_window_frame" -> (q10_window_frame _),
    "q11_topk" -> (q11_topk _),
    "q12_limit_offset" -> (q12_limit_offset _),
    "q13_distinct" -> (q13_distinct _),
    "q14_having" -> (q14_having _),
    "q15_between_in" -> (q15_between_in _),
    "q16_union" -> (q16_union _),
    "q17_intersect_except" -> (q17_intersect_except _),
    "q18_cte" -> (q18_cte _),
    "q19_subquery" -> (q19_subquery _),
    "q20_rollup" -> (q20_rollup _),
    "q21_cube" -> (q21_cube _),
    "q22_scalar_funcs" -> (q22_scalar_funcs _),
    "q23_events_window" -> (q23_events_window _),
    "q24_grouping_sets" -> (q24_grouping_sets _),
    "q25_approx_distinct" -> (q25_approx_distinct _),
    "q26_asof_join" -> (q26_asof_join _),
    "q27_range_frame" -> (q27_range_frame _),
    "q28_exists" -> (q28_exists _),
    "q29_unpivot" -> (q29_unpivot _),
    "q30_window_ranks" -> (q30_window_ranks _),
    "q31_percentiles" -> (q31_percentiles _),
    "k1_salted_agg" -> (k1_salted_agg _),
    "k2_salted_join" -> (k2_salted_join _),
    "q32_stats_manual" -> (q32_stats_manual _),
    "q33_funnel" -> (q33_funnel _),
    "q34_approx_quantile" -> (q34_approx_quantile _),
    "q35_higher_order" -> (q35_higher_order _),
    "q36_array_agg" -> (q36_array_agg _),
    "q37_recursive_cte" -> (q37_recursive_cte _),
    "q38_json_extract" -> (q38_json_extract _),
    "q39_lateral" -> (q39_lateral _),
    "q40_argmax" -> (q40_argmax _),
    "q41_map_funcs" -> (q41_map_funcs _),
    "q42_datetime" -> (q42_datetime _),
    "q43_window_firstlast" -> (q43_window_firstlast _))

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_filter_arith" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_multi_join" -> q4Sql,
    "q5_left_join_expr" -> q5Sql,
    "q6_semi_anti" -> q6Sql,
    "q7_window_rownum" -> q7Sql,
    "q8_window_rank" -> q8Sql,
    "q9_window_lag" -> q9Sql,
    "q10_window_frame" -> q10Sql,
    "q11_topk" -> q11Sql,
    "q12_limit_offset" -> q12Sql,
    "q13_distinct" -> q13Sql,
    "q14_having" -> q14Sql,
    "q15_between_in" -> q15Sql,
    "q16_union" -> q16Sql,
    "q17_intersect_except" -> q17Sql,
    "q18_cte" -> q18Sql,
    "q19_subquery" -> q19Sql,
    "q20_rollup" -> q20Sql,
    "q21_cube" -> q21Sql,
    "q22_scalar_funcs" -> q22Sql,
    "q23_events_window" -> q23Sql,
    "q24_grouping_sets" -> q24Sql,
    "q25_approx_distinct" -> q25Sql,
    "q26_asof_join" -> q26Sql,
    "q27_range_frame" -> q27Sql,
    "q28_exists" -> q28Sql,
    "q29_unpivot" -> q29Sql,
    "q30_window_ranks" -> q30Sql,
    "q31_percentiles" -> q31Sql,
    "k1_salted_agg" -> k1Sql,
    "k2_salted_join" -> k2Sql,
    "q32_stats_manual" -> q32Sql,
    "q33_funnel" -> q33Sql,
    "q34_approx_quantile" -> q34Sql,
    "q35_higher_order" -> q35Sql,
    "q36_array_agg" -> q36Sql,
    "q37_recursive_cte" -> q37Sql,
    "q38_json_extract" -> q38Sql,
    "q39_lateral" -> q39Sql,
    "q40_argmax" -> q40Sql,
    "q41_map_funcs" -> q41Sql,
    "q42_datetime" -> q42Sql,
    "q43_window_firstlast" -> q43Sql)
}

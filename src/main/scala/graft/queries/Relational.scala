package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational shell of the extraction pipeline plus TPC-H-flavoured headline
  * queries over the driver testdata. Every query here has an exact DuckDB
  * oracle (see the paired SQL in [[Relational.oracle]]).
  *
  * Determinism discipline (driver hashes values): all floating-point
  * aggregates run through exact DECIMAL(18,2)/(18,4) arithmetic so results
  * are independent of partial-aggregation order, then cast to double at the
  * very end. Counts stay BIGINT. Every query carries a total ORDER BY.
  *
  * Scale notes are on each query: what broadcasts, what shuffles, and why
  * the plan survives 1000 executors.
  */
object Relational {

  private val D2 = DecimalType(18, 2)

  private def dec2(c: Column): Column = c.cast(D2)

  /** TPC-H Q1 style pricing summary.
    * Scale: single hash-aggregate over lineitem; partial aggregation
    * (map-side combine) reduces the shuffle to |groups| rows per task.
    * Grouping keys have cardinality ~6, so the shuffle is negligible at any
    * scale; the scan is the cost and it prunes to 7 columns.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    // round 6: measured a spread floor here (the lineitem file is one row
    // group → single-task scan) and REVERTED it — the added exchange of
    // ~594k filtered rows costs more than it parallelizes (0.62 s vs
    // 0.63 s, inside noise); the single-task decimal aggregate is not the
    // bottleneck at this sf. q18 keeps its spread because there the
    // repartition key IS the group key (no extra exchange).
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D2) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 style shipping priority: 3-way join + top-10.
    * Scale: customer filter first (prunes the build side), then shuffle
    * joins on orderkey; the final TopK is `orderBy+limit` which Spark plans
    * as TakeOrderedAndProject — no global sort materialisation.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D2) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Region -> nation -> supplier rollup.
    * Scale: region (5 rows) and nation (25 rows) are broadcast — zero
    * shuffle on the big side; the aggregate is partial+final over 5 groups.
    */
  def q5RegionRollup(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val supp = Tables(spark, dir, "supplier")
    supp
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(dec2(col("s_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Top-3 orders per customer by totalprice (window TopK).
    * Scale: one shuffle on o_custkey; rank inside partitions. At 100 TB the
    * window is the canonical per-key TopK — Spark pushes a per-partition
    * limit via WindowGroupLimit before the shuffle (rankLimit optimisation).
    */
  def qWindowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        dec2(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Hourly event rollup (the batch shape of the streaming windowed agg).
    * Scale: partial aggregation collapses to |event_type × hour| groups
    * before the shuffle.
    */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Resume anti-join — the Spark restatement of the reference's cache-hit
    * path (extract.go:107-153): docs already present in the committed
    * manifest are skipped. Manifest here is simulated deterministically as
    * doc_id % 7 == 0 (in production it is the lineage table, broadcast when
    * small, shuffled-hash otherwise).
    * Scale: left_anti on doc_id; manifest side broadcasts.
    */
  def shellResumeAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val manifest = docs.select(col("doc_id")).filter(col("doc_id") % 7 === 0)
    docs.join(broadcast(manifest), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Per-source extraction metrics — the lineage-table aggregate
    * (docs / bytes / failures per partition of work).
    * Scale: hash agg, |sources| groups.
    */
  def shellMetricsAgg(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars"),
        count(when(col("n_chars") < 100, 1)).as("short_docs"))
      .orderBy(col("source"))
  }

  /** Salting policy distribution — mega-documents (by byte cost) get spread
    * over 8 salt buckets, small docs keep salt 0. This is the policy the
    * extraction stage uses to keep one scanned-PDF-heavy row from stalling
    * a task (reference analog: the fork threshold, config.go:27).
    * Output: per (bucket) doc count + bytes, proving the skew spread.
    */
  def shellSaltDistribution(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val salted = docs.withColumn("salt",
      when(col("n_chars") > 300, pmod(col("doc_id"), lit(8)).cast("int"))
        .otherwise(lit(0)))
    salted.groupBy(col("salt"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("bytes"))
      .orderBy(col("salt"))
  }

  /** Failure-code classification mirroring the reference's error paths:
    * zero_size/too_large (docfactory.go:28-29) and ok. Row-level predicate,
    * then a tiny aggregate.
    */
  def shellFailureCodes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs.select(
        when(col("n_chars") === 0, "zero_size")
          .when(col("n_chars") > 100000, "too_large")
          .otherwise("ok").as("failure_code"))
      .groupBy(col("failure_code"))
      .agg(count(lit(1)).as("docs"))
      .orderBy(col("failure_code"))
  }

  /** EXISTS via left-semi: customers with a high-value order, counted per
    * segment. Scale: semi-join shuffles only keys; orders side prunes on the
    * pushed price filter before the join.
    */
  def qExistsSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val bigOrders = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"))
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Set ops: large-size parts EXCEPT cheap parts, at (brand, partkey)
    * grain. Scale: EXCEPT plans as aggregate + anti-join on the distinct
    * sets. The 910.0 threshold sits INSIDE every gate size's price range
    * (sf0.001 spans 900-919.9) so the result is non-empty and the oracle
    * row actually discriminates — the previous 1200.0 cutoff covered the
    * whole table and made the query vacuously green at 0 rows.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
    val large = part.filter(col("p_size") > 25)
      .select(col("p_brand"), col("p_partkey")).distinct()
    val cheap = part.filter(col("p_retailprice") < 910.0)
      .select(col("p_brand"), col("p_partkey")).distinct()
    large.except(cheap).orderBy(col("p_brand"), col("p_partkey"))
  }

  /** Semi-structured props: JSON extraction + rollup (the schema-on-read
    * path; get_json_object is codegen'd and prunes to the props column).
    */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, dir, "events", "event_id")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** TPC-H Q2 shape — correlated scalar subquery: suppliers holding their
    * nation's maximum account balance, EUROPE region only. Spark side uses
    * the decorrelated plan Catalyst itself would produce (group-max +
    * equi-join), which is the scale shape: the per-nation max aggregate is
    * 25 rows → broadcast; no value arithmetic (raw double equality), so the
    * oracle's correlated form matches exactly.
    */
  def q2TopSupplierPerNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "EUROPE")
    val nation = Tables(spark, dir, "nation")
    val supp = Tables(spark, dir, "supplier")
    val maxPerNation = supp.groupBy(col("s_nationkey").as("mk"))
      .agg(max(col("s_acctbal")).as("max_bal"))
    supp
      .join(broadcast(maxPerNation),
        col("s_nationkey") === col("mk") && col("s_acctbal") === col("max_bal"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("s_name"), col("s_acctbal"))
      .orderBy(col("n_name"), col("s_name"))
  }

  /** TPC-H Q4 shape — anti-join with a date predicate: H1-1997 orders with
    * NO late-shipping lineitem (l_shipdate > o_orderdate + 60 days), counted
    * per priority. Scale: the anti-join shuffles on orderkey with the date
    * condition evaluated join-side; lineitem prunes to 2 columns.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q7 shape — volume shipping between two nations, both directions:
    * lineitem → orders → customer → nation(cust), lineitem → supplier →
    * nation(supp); revenue per (supp_nation, cust_nation, ship year).
    * Scale: both nation dims and supplier broadcast; the two big joins
    * shuffle on orderkey/custkey; DECIMAL(18,2) keeps the sum exact.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_1"
    val n2 = "NATION_2"
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") <= lit("1996-12-31").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val ord = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nationC = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val nationS = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nationC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(nationS), col("s_nationkey") === col("sn_key"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D2) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q13 shape — distribution of order counts per customer including
    * zero-order customers: LEFT OUTER join + aggregate-of-aggregate.
    * Scale: the outer join shuffles on custkey; the second aggregate's key
    * space is tiny (|distinct counts|), so its shuffle is negligible.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select(col("c_custkey"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // count skips nulls → 0 rows
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape — large orders: HAVING-filtered aggregate feeding an
    * IN-subquery (planned as a self-semi-join on the aggregate).
    * Scale: one shuffle on orderkey for the quantity rollup; the qualifying
    * key set is small → broadcast semi-join back against orders.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    // spread keyed on the GROUP key: the aggregate's required clustering is
    // already satisfied, so this adds parallelism with NO extra exchange
    val li = Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .select(col("l_orderkey"), col("l_quantity"))
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("sum_qty"))
      .where(col("sum_qty") > lit(BigDecimal(120)).cast(D2))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        dec2(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q22 shape — "global sales opportunity": customers with above-
    * average balance and NO orders (scalar subquery in the filter +
    * anti-join). Scale: the scalar average is one tiny agg broadcast into
    * the filter; the anti-join shuffles on custkey.
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    // exact above-average test: bal > sum/cnt ⟺ bal·cnt > sum — avoids the
    // engines' differing avg() result types (decimal division vs double)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(dec2(col("c_acctbal"))).as("tot"), count(lit(1)).as("cnt"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .where(dec2(col("c_acctbal")) * col("cnt") > col("tot"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("cseg", substring(col("c_mktsegment"), 1, 2))
      .groupBy(col("cseg"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("cseg"))
  }

  /** Sessionization (gaps-and-islands): per-user sessions split at ≥ 30 min
    * inactivity — lag + running flag-sum window, then per-session rollup.
    * The batch twin of the streaming `session_window` aggregation (see
    * `streaming.EventStream`); DuckDB oracle does the same two-window SQL.
    * Scale: two stacked windows over one shuffle on user_id, then a tiny
    * second aggregate — the canonical sessionization plan.
    */
  def qSessions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val evs = Tables(spark, dir, "events").select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("timestamp").cast("long") - col("prev_ts").cast("timestamp").cast("long") >= 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    evs.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts").cast("timestamp").cast("long")) -
          min(col("ts").cast("timestamp").cast("long"))).as("span_sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("span_sec")).as("max_span_sec"))
      .orderBy(col("user_id"))
  }

  /** TPC-H Q14 shape — promotion revenue share per ship month: conditional
    * aggregate over a part join. The numerator/denominator are exact
    * DECIMALs; the final ratio is one double division of identical exact
    * inputs (IEEE division is exactly rounded → engine-identical).
    * Scale: part side prunes to 2 columns and broadcasts under the
    * threshold / shuffle-joins on partkey beyond; one tiny month-grain agg.
    */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
    val part = Tables(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    val disc = dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D2) - dec2(col("l_discount")))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(BigDecimal(0)).cast(D2)))
          .cast("double").as("promo_revenue"),
        sum(disc).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        col("promo_revenue") * lit(100.0) / col("total_revenue"))
      .orderBy(col("ship_month"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_promo_effect" -> (q14PromoEffect _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q22_global_sales" -> (q22GlobalSales _),
    "q_sessions" -> (qSessions _),
    "q2_top_supplier" -> (q2TopSupplierPerNation _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q_json_props" -> (qJsonProps _),
    "q_exists_semijoin" -> (qExistsSemijoin _),
    "q_setops" -> (qSetOps _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_region_rollup" -> (q5RegionRollup _),
    "q_window_top_orders" -> (qWindowTopOrders _),
    "q_events_hourly" -> (qEventsHourly _),
    "shell_resume_antijoin" -> (shellResumeAntiJoin _),
    "shell_metrics_agg" -> (shellMetricsAgg _),
    "shell_salt_distribution" -> (shellSaltDistribution _),
    "shell_failure_codes" -> (shellFailureCodes _)
  )

  val oracle: Map[String, String] = Map(
    "q14_promo_effect" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY ship_month""",
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_custkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey) t
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q18_large_orders" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
         FROM orders
         JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120) big
           ON o_orderkey = big.l_orderkey
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 100""",
    "q22_global_sales" ->
      """WITH a AS (
           SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, COUNT(*) AS cnt
           FROM customer WHERE c_acctbal > 0.0)
         SELECT substr(c_mktsegment, 1, 2) AS cseg, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer, a
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1 ORDER BY cseg""",
    "q_sessions" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) >= 1800
                  THEN 1 ELSE 0 END AS new_session
           FROM e),
         s2 AS (
           SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM s),
         g AS (
           SELECT user_id, session_id, COUNT(*) AS n_events,
             CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS span_sec
           FROM s2 GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(max(span_sec) AS BIGINT) AS max_span_sec
         FROM g GROUP BY user_id ORDER BY user_id""",
    "q2_top_supplier" ->
      """SELECT n_name, s_name, s_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                            WHERE s2.s_nationkey = supplier.s_nationkey)
         ORDER BY n_name, s_name""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
           AND NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey
                             AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM (
           SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation nc ON c_nationkey = nc.n_nationkey
           JOIN nation ns ON s_nationkey = ns.n_nationkey
           WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
             AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
               OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))) t
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",
    "q_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_exists_semijoin" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_setops" ->
      """SELECT p_brand, p_partkey FROM part WHERE p_size > 25
         EXCEPT
         SELECT p_brand, p_partkey FROM part WHERE p_retailprice < 910.0
         ORDER BY p_brand, p_partkey""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey ASC
         LIMIT 10""",
    "q5_region_rollup" ->
      """SELECT r_name, COUNT(*) AS n_suppliers,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_window_top_orders" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders) t
         WHERE rnk <= 3 ORDER BY o_custkey, rnk""",
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "shell_resume_antijoin" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE NOT (doc_id % 7 = 0)
         ORDER BY doc_id""",
    "shell_metrics_agg" ->
      """SELECT source, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         MAX(n_chars) AS max_chars,
         COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS short_docs
         FROM documents GROUP BY source ORDER BY source""",
    "shell_salt_distribution" ->
      """SELECT salt, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS bytes FROM (
           SELECT CASE WHEN n_chars > 300 THEN CAST(doc_id % 8 AS INT) ELSE 0 END AS salt, n_chars
           FROM documents) t
         GROUP BY salt ORDER BY salt""",
    "shell_failure_codes" ->
      """SELECT failure_code, COUNT(*) AS docs FROM (
           SELECT CASE WHEN n_chars = 0 THEN 'zero_size'
                       WHEN n_chars > 100000 THEN 'too_large'
                       ELSE 'ok' END AS failure_code
           FROM documents) t
         GROUP BY failure_code ORDER BY failure_code"""
  )
}

package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator battery over the TPC-H-ish harness tables, covering
  * SURVEY.md §2's inventory: joins (J1/J5/J6), filters (P2-P8), aggregates
  * (A1-A9, A12), windows (§2.5), sorts/top-k (§2.6), set ops (§2.7).
  *
  * Float discipline for the DuckDB oracle: sums go through exact
  * DECIMAL(18,2), averages are exact-decimal-sum / count (bit-identical
  * double division), everything else is round(x, 6).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsum(c: String) = sum(col(c).cast("decimal(18,2)")).cast("double")
  private def davg(c: String) =
    (sum(col(c).cast("decimal(18,2)")).cast("double") / count(lit(1))).as(s"avg_$c")

  /** Sketch-tolerance verdict: 'ok' within `tol`, else the measured
    * relative error — a breach reads as a value diff, not a bare hash
    * mismatch, in the verify output. */
  private def tolVerdict(relErr: Column, tol: Double): Column =
    when(relErr <= tol, lit("ok"))
      .otherwise(concat(lit("rel_err="), round(relErr, 4).cast("string")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: multi-metric hash aggregate (pricing summary)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),
    // J1 chain: customer ⋈ nation ⋈ region ⋈ orders, revenue by geography
    "q2_join_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      val orders = t(s, dir, "orders")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_value"))
    }),
    // P5 BETWEEN + P6 IN-list + A3 count
    "q3_filter_range" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_value"))
    }),
    // P8 CASE WHEN segmentation + A4 multi-key aggregate
    "q4_case_when" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn(
          "balance_segment",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy(col("c_mktsegment"), col("balance_segment"))
        .agg(count(lit(1)).as("n_customers"), davg("c_acctbal"))
    }),
    // O1 top-k: orderBy desc + unique tie-break + limit → TakeOrderedAndProject
    "q5_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),
    // A5/U3: duplicate detection via count - distinct count
    "q6_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("total_rows"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("distinct_keys"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber"))).as("duplicates"),
        countDistinct(col("l_orderkey")).as("distinct_orders"))
    }),
    // §2.5 windows: row_number + lag over per-customer order history
    "q7_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_order_date", lag(col("o_orderdate"), 1).over(w))
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("rn"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          date_format(col("prev_order_date"), "yyyy-MM-dd").as("prev_order_date"))
    }),
    // J6 left-semi + left-anti: customers with / without orders
    "q8_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val keys = t(s, dir, "orders").select(col("o_custkey"))
      val withOrders = cust.join(keys, cust("c_custkey") === keys("o_custkey"), "left_semi")
      val withoutOrders = cust.join(keys, cust("c_custkey") === keys("o_custkey"), "left_anti")
      withOrders.agg(count(lit(1)).as("customers_with_orders"))
        .crossJoin(withoutOrders.agg(count(lit(1)).as("customers_without_orders")))
    }),
    // U1 unionByName with missing columns across two summaries
    "q9_union" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_value"))
      val b = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n_lines"))
      a.unionByName(b, allowMissingColumns = true)
    }),
    // A6 exact percentiles (interpolated), global + per flag
    "q10_quantile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75"),
          count(lit(1)).as("n"))
    }),
    // A12 rank correlation (Spearman-style with min-rank ties)
    "q11_rank_corr" -> ((s, dir) => {
      val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .select(
          col("l_returnflag"),
          rank().over(wq).as("rank_qty"),
          rank().over(wp).as("rank_price"))
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("rank_qty"), col("rank_price")), 6).as("rank_correlation"))
    }),
    // §2.5 RANGE frame: 7-day trailing event count per user-day (value
    // -based frame, complementing q12's ROWS frame)
    // A7: describe()/summary() equivalent — one aggregate pass, typed
    // output, one row per column
    "q23_describe" -> ((s, dir) => {
      graft.operators.Stats.describe(
        t(s, dir, "lineitem"), Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),
    "q22_range_window" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(
          col("user_id").cast("string").as("key"),
          to_date(col("ts")).as("period"))
        .agg(count(lit(1)).as("daily_events"))
        .withColumn("day_num", datediff(col("period"), lit("2024-01-01").cast("date")))
      val w = Window.partitionBy(col("key")).orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .withColumn("trailing_7d_events", sum(col("daily_events")).over(w))
        .select(
          col("key"),
          date_format(col("period"), "yyyy-MM-dd").as("period"),
          col("daily_events"),
          col("trailing_7d_events"))
    }),
    // §2.5 running aggregate: daily event counts + cumulative per user
    "q12_running_window" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(
          col("user_id").cast("string").as("key"),
          to_date(col("ts")).as("period"))
        .agg(count(lit(1)).as("daily_events"))
      val w = Window.partitionBy(col("key")).orderBy(col("period"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_events", sum(col("daily_events")).over(w))
        .select(
          col("key"),
          date_format(col("period"), "yyyy-MM-dd").as("period"),
          col("daily_events"),
          col("cum_events"))
    }),
    // S7/O2: SQL text over registered temp views, ORDER BY ... LIMIT
    "q14_sql_views" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT o.o_orderkey, c.c_name, o.o_totalprice,
          |       date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date
          |FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
          |WHERE o.o_totalprice > 100000
          |ORDER BY o.o_orderdate DESC, o.o_orderkey ASC LIMIT 100""".stripMargin)
    }),
    // gap-based sessionization: lag + running-sum session ids + session aggs
    "q15_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("key")).orderBy(col("ts_ms"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(
          col("user_id").cast("string").as("key"),
          col("event_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("value"))
        .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
        .withColumn(
          "new_session",
          when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy(col("key"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
          round(sum(col("value")), 6).as("total_value"))
    }),
    // A12 true Spearman: average ranks (min-rank + (ties-1)/2, matching
    // scipy.stats.spearmanr's tie handling) then Pearson corr of ranks
    "q16_spearman" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def avgRank(c: String) = {
        val r = rank().over(Window.partitionBy(col("l_returnflag")).orderBy(col(c)))
        val ties = count(lit(1)).over(Window.partitionBy(col("l_returnflag"), col(c)))
        r + (ties - 1) / lit(2.0)
      }
      li.select(
          col("l_returnflag"),
          avgRank("l_quantity").as("rq"),
          avgRank("l_extendedprice").as("rp"))
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("rq"), col("rp")), 6).as("spearman_rho"))
    }),
    // rollup: subtotals + grand total in one pass (sentinel 'ALL' for the
    // rolled-up levels keeps null-free sort/compare semantics)
    "q17_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"),
          col("sum_qty"))
    }),
    // HAVING: frequent customers only (post-aggregation filter)
    "q18_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_spend"))
        .filter(col("n_orders") >= 15)
    }),
    // EXISTS as a conditioned left-semi join: parts with a high-quantity line
    "q19_exists" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 45).select(col("l_partkey"))
      part
        .join(bigLines, part("p_partkey") === bigLines("l_partkey"), "left_semi")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
    }),
    // GROUPING SETS: explicit grouping combinations via SQL text
    "q21_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          |       COALESCE(l_linestatus, 'ALL') AS linestatus,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    }),
    // CUBE: all grouping combinations with sentinel keys
    "q20_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
    }),
    // as-of join (backward, inclusive): each purchase picks the user's
    // most recent click at-or-before it — union-marker scan, ONE shuffle,
    // no inequality join (operators/AsofJoin)
    "q24_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"),
          col("event_id"),
          unix_millis(col("ts")).as("ts_ms"),
          round(col("value"), 6).as("purchase_value"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("user_id"),
          col("event_id").as("click_id"),
          unix_millis(col("ts")).as("click_ms"))
      graft.operators.AsofJoin
        .asof(purchases, clicks, Seq("user_id"), leftTs = "ts_ms", rightTs = "click_ms")
        .withColumn("gap_ms", col("ts_ms") - col("click_ms"))
    }),
    // point-in-interval range join, bucketized to a day equi-join
    // (operators/IntervalJoin): 7-day sliding windows over the event month
    "q25_interval" -> ((s, dir) => {
      val windows = s.range(1)
        .select(explode(sequence(
          lit("2024-01-01").cast("date"),
          lit("2024-01-24").cast("date"),
          expr("interval 1 day"))).as("window_start"))
        .withColumn("window_end", date_add(col("window_start"), 6))
      val ev = t(s, dir, "events")
        .select(to_date(col("ts")).as("event_day"), col("user_id"), col("value"))
      graft.operators.IntervalJoin
        .pointInInterval(ev, "event_day", windows, "window_start", "window_end")
        .groupBy(col("window_start"), col("window_end"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 6).as("total_value"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd").as("window_start"),
          date_format(col("window_end"), "yyyy-MM-dd").as("window_end"),
          col("n_events"), col("n_users"), col("total_value"))
    }),
    // PIVOT: wide conditional-aggregate expansion (explicit value list so
    // the plan is ONE hash aggregate over when()-projected columns — no
    // extra pass to discover pivot values, and the schema is static, the
    // form that scales: a values-discovery pivot needs a distinct scan
    // first and yields a driver-dependent schema)
    "q26_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_orderpriority"),
          col("o_totalprice"))
        .groupBy(col("order_year"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
          "4-NOT SPECIFIED" -> "not_specified", "5-LOW" -> "low"))
    }),
    // UNPIVOT/melt: wide metrics back to long (metric, value) rows —
    // per-row array expansion, zero shuffle beyond the feeding aggregate
    "q27_unpivot" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      cust
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).cast("double").as("n_customers"),
          (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("avg_acctbal"),
          round(max(col("c_acctbal")), 6).as("max_acctbal"))
        .unpivot(
          Array(col("n_name")),
          Array(col("n_customers"), col("avg_acctbal"), col("max_acctbal")),
          "metric", "value")
    }),
    // Sketch aggregates: HLL distinct + KLL-style quantile, each checked
    // against its exact twin IN THE SAME QUERY (the oracle asserts the
    // tolerance flags; the sketch values themselves are engine-specific).
    // The 100 TB story: sketches are partial-aggregable constant-memory
    // state that merges map-side — countDistinct over a high-cardinality
    // key shuffles every distinct value, approx_count_distinct shuffles a
    // fixed-size HLL register set per group.
    "q28_sketch" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_distinct"),
          approx_count_distinct(col("l_partkey"), 0.02).as("hll"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_median_raw"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_median"))
        .select(
          col("l_returnflag"),
          col("exact_distinct"),
          // 'ok' when within tolerance (oracle-stable); on a breach the
          // actual relative error lands in the verify diff instead of an
          // opaque hash mismatch (sketch values are engine-specific, so
          // the raw error can't be a column of its own)
          tolVerdict(abs(col("hll") - col("exact_distinct")) / col("exact_distinct"), 0.05)
            .as("hll_within_5pct"),
          round(col("exact_median_raw"), 6).as("exact_median"),
          tolVerdict(
            abs(col("approx_median") - col("exact_median_raw")) / col("exact_median_raw"), 0.01)
            .as("median_within_1pct"))
    }),
    // Misra–Gries heavy-hitters sketch (functions.FrequentItems: 64
    // counters, constant memory per group, mergeable partial buffers)
    // gated against the exact top-5. Harness keys are near-uniform, so
    // hot keys are synthesized in-query (the d33 convention): half the
    // lineitem rows collapse onto 5 hot keys (~6k each at sf0.01),
    // far above the n/(c+1) ≈ 923 presence threshold. The gates are the
    // THEORY guarantees — presence, underestimate, n/(c+1) bound —
    // which hold for ANY partial-merge order; raw estimates are
    // sketch-internal, like q28's HLL innards.
    "q43_heavy_hitters" -> ((s, dir) => {
      import graft.functions.FrequentItems
      val capacity = 64
      val keyed = t(s, dir, "lineitem").select(
        when(
          col("l_orderkey") % 10 < 5,
          concat(lit("hot"), (col("l_orderkey") % 5).cast("string")))
          .otherwise(concat(lit("cold"), col("l_partkey").cast("string"))).as("k"))
      val sketch = keyed
        .agg(
          FrequentItems.udafFor(capacity)(col("k")).as("sk"),
          count(lit(1)).as("n"))
        .select(col("n"), explode(col("sk")).as("e"))
        .select(col("n"), col("e.item").as("k"), col("e.est").as("est"))
      val top5 = keyed
        .groupBy(col("k"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("k").asc)
        .limit(5)
      top5
        .join(sketch, Seq("k"), "left")
        .select(
          col("k"),
          col("exact_n"),
          when(col("est").isNotNull, lit("ok")).otherwise(lit("missing")).as("in_sketch"),
          when(coalesce(col("est"), lit(0L)) <= col("exact_n"), lit("ok"))
            .otherwise(concat(lit("over_by="), (col("est") - col("exact_n")).cast("string")))
            .as("underestimate"),
          when(
            col("exact_n") - coalesce(col("est"), lit(0L))
              <= floor(col("n") / (capacity + 1)), lit("ok"))
            .otherwise(
              concat(lit("err="), (col("exact_n") - coalesce(col("est"), lit(0L))).cast("string")))
            .as("within_bound"))
        .orderBy(col("exact_n").desc, col("k").asc)
    }),
    // Count-Min sketch point queries over the q43 key stream: depth-4 ×
    // width-256 counter table (portable salted hashes → the sketch AND
    // every estimate replay in the oracle, unlike engine-opaque sketches),
    // probed at the 5 hot keys + the 5 first cold keys. The never-
    // underestimates guarantee is asserted per row; `overcount` shows the
    // collision inflation the εN bound prices in. MG (q43) finds the hot
    // keys, CMS answers arbitrary after-the-fact frequency questions —
    // together the standard streaming-frequency toolbox.
    "q44_countmin" -> ((s, dir) => {
      import graft.functions.CountMin
      val keyed = t(s, dir, "lineitem").select(
        when(
          col("l_orderkey") % 10 < 5,
          concat(lit("hot"), (col("l_orderkey") % 5).cast("string")))
          .otherwise(concat(lit("cold"), col("l_partkey").cast("string"))).as("k"))
      val sketch = CountMin.build(keyed, col("k"), depth = 4, width = 256)
      val probes = keyed
        .groupBy(col("k"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("k").asc)
        .limit(10)
      CountMin.estimate(sketch, probes.select(col("k")), "k", depth = 4, width = 256)
        .join(probes, Seq("k"))
        .select(
          col("k"), col("exact_n"), col("est"),
          when(col("est") >= col("exact_n"), lit("ok"))
            .otherwise(lit("UNDERESTIMATE")).as("lower_bound"),
          (col("est") - col("exact_n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("k").asc)
    }),
    // HyperLogLog distinct count over the q43/q44 key stream — the third
    // leg of the streaming-frequency toolbox (MG: who's hot; CMS: how
    // often; HLL: how many distinct, in 256 bytes). Portable hash +
    // integer ranks + a pinned-order harmonic fold make the register
    // table AND the estimate replay bit-for-bit — the q44 convention,
    // where engine-native approx_count_distinct is opaque. One row per
    // set register, with the sketch-level numbers on every row (the d44
    // totals convention); estimate within ~1.04/√256 ≈ 6.5% expected.
    "q45_hll" -> ((s, dir) => {
      import graft.functions.Hll
      val keyed = t(s, dir, "lineitem").select(
        when(
          col("l_orderkey") % 10 < 5,
          concat(lit("hot"), (col("l_orderkey") % 5).cast("string")))
          .otherwise(concat(lit("cold"), col("l_partkey").cast("string"))).as("k"))
      // ≤256 rows: localCheckpoint pins them so estimate's collect and
      // the output below share one materialization
      val regs = Hll.registers(keyed, col("k")).localCheckpoint(true)
      val est = Hll.estimate(regs)
      val exact = keyed.distinct().count()
      regs
        .withColumn("n_buckets_set", lit(regs.count()))
        .withColumn("raw_est", round(lit(est), 6))
        .withColumn("exact_distinct", lit(exact))
        .withColumn(
          "rel_err", round(abs(lit(est) - col("exact_distinct")) / col("exact_distinct"), 6))
        .orderBy(col("bucket"))
    }),
    // per-GROUP HyperLogLog — the production shape of q45 ("distinct
    // customers per priority class"): registers keyed by (group,
    // bucket), shuffle ≤ m rows per group per partition where a grouped
    // countDistinct shuffles every distinct (group, key) pair. Same
    // bit-replay contract: integer registers + per-group pinned-order
    // harmonic folds
    "q49_hll_grouped" -> ((s, dir) => {
      import graft.functions.Hll
      val o = t(s, dir, "orders")
      val regs = Hll
        .groupedRegisters(o, col("o_orderpriority"), col("o_custkey"))
        .localCheckpoint(true)
      val ests = Hll.groupedEstimates(regs).toMap
      val estDf = broadcast(
        s.createDataFrame(ests.toSeq).toDF("grp", "raw"))
      regs.groupBy(col("grp")).agg(count(lit(1)).as("n_buckets_set"))
        .join(estDf, Seq("grp"))
        .join(
          o.groupBy(col("o_orderpriority").as("grp"))
            .agg(countDistinct(col("o_custkey")).as("exact_distinct")),
          Seq("grp"))
        .select(
          col("grp").as("o_orderpriority"),
          col("n_buckets_set"),
          round(col("raw"), 6).as("raw_est"),
          col("exact_distinct"),
          round(abs(col("raw") - col("exact_distinct")) / col("exact_distinct"), 6)
            .as("rel_err"))
        .orderBy(col("o_orderpriority"))
    }),
    // skew-safe exact distinct-count per key (two-phase: dedup spreads a
    // hot key's values across reducers via the value hash, then a
    // partial-aggregated count) — equivalent to countDistinct with
    // balanced shuffles, so the oracle IS countDistinct. Run over the
    // q43/q44 hot-key stream, whose 5 hot keys would otherwise land a
    // single reducer with ~30% of the table each
    "q48_skew_distinct" -> ((s, dir) => {
      import graft.functions.Skew
      val keyed = t(s, dir, "lineitem").select(
        when(
          col("l_orderkey") % 10 < 5,
          concat(lit("hot"), (col("l_orderkey") % 5).cast("string")))
          .otherwise(concat(lit("cold"), col("l_partkey").cast("string"))).as("k"),
        col("l_partkey").as("pk"))
      Skew.exactDistinctPerKey(keyed, "k", "pk")
        .orderBy(col("distinct_pk").desc, col("k").asc)
        .limit(10)
    }),
    // bloom-pruned selective join — the 100 TB pattern for a dimension
    // too big to broadcast as a hash table but whose BITS fit (10/key):
    // the big side is pre-filtered on approximate membership BEFORE the
    // shuffle (codegen'd bit probes over a broadcast literal word
    // array, no UDF), and the real join removes the ~1% false
    // positives — so the result is EXACT and the oracle is the plain
    // join; the bloom only cuts shuffle volume (spec-measured).
    "q47_bloom_join" -> ((s, dir) => {
      import graft.functions.BloomPrune
      val sel = t(s, dir, "orders")
        .filter(col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"))
      val bloom = BloomPrune.buildSized(sel, col("o_orderkey"))
      BloomPrune.prune(t(s, dir, "lineitem"), col("l_orderkey"), bloom)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          dsum("l_extendedprice").as("revenue"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),
    // mergeable equi-width histogram + interpolated quantiles — the
    // scale path for quantile monitoring (q10's exact percentile
    // materializes the whole column; this is ≤128 integer counters,
    // mergeable by addition). Bin geometry from an exact (min, max)
    // pass; bin indexes, counts, and the pinned-order interpolation all
    // replay bit-for-bit. exact_p50/err_p50 quantify the resolution
    // tradeoff (error ≤ bin width by construction).
    "q46_hist_quantile" -> ((s, dir) => {
      import graft.functions.HistogramSketch
      val li = t(s, dir, "lineitem")
      val bins = 128
      // ONE fused stats pass instead of three: exact (min, max) for the
      // bin geometry, the exact-p50 self-audit, and n — all from a single
      // lineitem scan (was: range pass + percentile pass + hist-sum
      // action). Values are identical: min/max/percentile are the same
      // aggregates, and n = count(non-null values) ≡ sum of bin counts
      // (build drops exactly the null rows).
      val st = li.agg(
        min(col("l_extendedprice").cast("double")),
        max(col("l_extendedprice").cast("double")),
        expr("percentile(l_extendedprice, 0.5)"),
        count(col("l_extendedprice").cast("double"))).head
      val (lo, hi, exactP50, n) =
        (st.getDouble(0), st.getDouble(1), st.getDouble(2), st.getLong(3))
      // ≤128 rows: localCheckpoint pins them for the quantile collect
      // and the output below
      val hist = HistogramSketch.build(li, col("l_extendedprice"), lo, hi, bins)
        .localCheckpoint(true)
      val est = HistogramSketch
        .quantiles(hist, lo, hi, bins, Seq(0.25, 0.5, 0.75, 0.95, 0.99)).toMap
      hist
        .withColumn("n", lit(n))
        .withColumn("lo", round(lit(lo), 6))
        .withColumn("hi", round(lit(hi), 6))
        .withColumn("est_p25", round(lit(est(0.25)), 6))
        .withColumn("est_p50", round(lit(est(0.5)), 6))
        .withColumn("est_p75", round(lit(est(0.75)), 6))
        .withColumn("est_p95", round(lit(est(0.95)), 6))
        .withColumn("est_p99", round(lit(est(0.99)), 6))
        .withColumn("exact_p50", round(lit(exactP50), 6))
        .withColumn("err_p50", round(abs(lit(est(0.5)) - lit(exactP50)), 6))
        .orderBy(col("bin"))
    }),
    // §2.7 set ops beyond union: EXCEPT and INTERSECT (both planned as
    // hash left-anti / left-semi aggregates — no sort, one shuffle each)
    "q29_setops" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def buyers(year: Int) = orders
        .filter(col("o_orderdate").between(
          lit(s"$year-01-01").cast("timestamp"), lit(s"$year-12-31").cast("timestamp")))
        .select(col("o_custkey"))
      val b96 = buyers(1996)
      val b97 = buyers(1997)
      b96.except(b97).withColumn("segment", lit("only_1996"))
        .unionByName(b97.except(b96).withColumn("segment", lit("only_1997")))
        .unionByName(b96.intersect(b97).withColumn("segment", lit("both")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"))
    }),
    // CDC MERGE semantics (sources/Upsert.merge): an update batch derived
    // from orders — matched keys take new values (+10.00, status 'U'),
    // shifted keys insert — merged via one full-outer coalesce with an
    // `op` provenance column; verified here through per-op row counts and
    // exact decimal totals over the whole merged table. The partition-
    // scoped copy-on-write WRITE path is locked by UpsertSpec (untouched
    // partition files survive bit-for-bit).
    "q33_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"),
          col("o_orderstatus"))
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + lit(10.00).cast("decimal(18,2)")).as("o_totalprice"),
          lit("U").as("o_orderstatus"))
        .unionByName(
          base.filter(col("o_orderkey") % 1000 === 1)
            .select(
              (col("o_orderkey") + 6000000L).as("o_orderkey"), col("o_custkey"),
              col("o_totalprice"), lit("N").as("o_orderstatus")))
      graft.sources.Upsert.merge(base, updates, Seq("o_orderkey"))
        .groupBy(col("op"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          sum(col("o_totalprice")).cast("double").as("total_price_raw"))
        .select(
          col("op"), col("n_rows"), col("n_keys"),
          round(col("total_price_raw"), 2).as("total_price"))
    }),
    // per-group winsorization (feature-prep clip at exact p05/p95):
    // boundaries from one small aggregate broadcast back, map-side clip,
    // then per-group clip counts + exact-decimal clipped mean
    "q34_winsorize" -> ((s, dir) => {
      graft.operators.Stats
        .winsorize(
          t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice", Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("__clipped") === -1, 1L).otherwise(0L)).as("n_clipped_lo"),
          sum(when(col("__clipped") === 1, 1L).otherwise(0L)).as("n_clipped_hi"),
          round(min(col("__plo")), 6).as("p_lo"),
          round(min(col("__phi")), 6).as("p_hi"),
          (sum(round(col("l_extendedprice_w"), 6).cast("decimal(28,6)")).cast("double") /
            count(lit(1))).as("mean_raw"))
        .select(
          col("l_returnflag"), col("n"), col("n_clipped_lo"), col("n_clipped_hi"),
          col("p_lo"), col("p_hi"), round(col("mean_raw"), 6).as("clipped_mean"))
    }),
    // robust outlier detection: |x − median| > 3·MAD per group — the
    // medians come from two small broadcast aggregates, the data never
    // shuffles; verified through per-group outlier counts + the robust
    // center/scale
    "q35_mad_outliers" -> ((s, dir) => {
      graft.operators.Stats
        .madOutliers(
          t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice", Seq("l_returnflag"), k = 3.0)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("__outlier"), 1L).otherwise(0L)).as("n_outliers"),
          round(min(col("__med")), 6).as("med"),
          round(min(col("__mad")), 6).as("mad"))
    }),
    // F-json: schema'd JSON extraction from the events props column
    // (from_json with an explicit schema — parse once at the scan stage,
    // no values-discovery pass), bucketed aggregate over the parsed field
    "q36_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "k", org.apache.spark.sql.types.LongType)))).getField("k").as("k"),
          col("value"))
        // `%` (not pmod): the oracle's `k % 10` follows the dividend's
        // sign, and so does Spark's `%` — pmod would bucket k=-5 as -10
        // while DuckDB says 0
        .groupBy(col("event_type"), (col("k") - (col("k") % lit(10))).as("k_bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("value")), 6).as("avg_value"))
    }),
    // first-touch conversion funnel: per-user min-ts per step in ONE
    // conditional aggregate (no per-step scans, no window), ordered-step
    // flags derived after, then a tiny global rollup. Time-to-convert
    // averages over exact integer millis so partial-agg order is moot.
    "q37_funnel" -> ((s, dir) => {
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .select(
          col("t_view").isNotNull.as("s1"),
          coalesce(col("t_click") > col("t_view"), lit(false)).as("s2pre"),
          coalesce(col("t_purchase") > col("t_click"), lit(false)).as("s3pre"),
          (unix_millis(col("t_purchase")) - unix_millis(col("t_view"))).as("ms"))
        .select(
          col("s1"),
          (col("s1") && col("s2pre")).as("s2"),
          (col("s1") && col("s2pre") && col("s3pre")).as("s3"),
          col("ms"))
      per.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n_view"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n_click_after_view"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n_converted"),
        round(
          sum(when(col("s2"), 1L).otherwise(0L)).cast("double") /
            nullif(sum(when(col("s1"), 1L).otherwise(0L)), lit(0L)),
          6).as("view_to_click"),
        round(
          sum(when(col("s3"), 1L).otherwise(0L)).cast("double") /
            nullif(sum(when(col("s2"), 1L).otherwise(0L)), lit(0L)),
          6).as("click_to_purchase"),
        round(
          (sum(when(col("s3"), col("ms"))).cast("double") /
            nullif(sum(when(col("s3"), 1L).otherwise(0L)), lit(0L))) / 3.6e6,
          6).as("avg_hours_to_convert"))
    }),
    // weekly cohort retention: distinct (user, week) activity → first
    // week per user → (cohort, offset) counts → rate against the
    // cohort's own week-0 row. Every stage is a partial-aggregated
    // count-distinct or a join of TINY aggregated tables; the raw events
    // shuffle once.
    "q38_retention" -> ((s, dir) => {
      val activity = t(s, dir, "events")
        .select(
          col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      val cohort = activity.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      val ret = activity
        .join(cohort, Seq("user_id"))
        .groupBy(
          col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val base = ret
        .filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      ret
        .join(base, Seq("cohort_week"))
        .select(
          date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"),
          col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
    }),
    // RFM segmentation with exact-median splits: per-user recency /
    // frequency / monetary in one conditional aggregate, split points
    // from one 1-row percentile aggregate (broadcast back), segments as
    // deterministic threshold CASEs — no ntile, whose tie placement is
    // row-order-dependent and engine-unstable
    "q39_rfm" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val asOf = ev.agg(max(col("ts")).as("as_of"))
      val per = ev
        .groupBy(col("user_id"))
        .agg(
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("f"),
          // exact-decimal sum (q34 pattern): m feeds a >-vs-median split,
          // where a double sum's partial-aggregation order could flip a
          // boundary user's segment between engines
          coalesce(
            sum(when(col("event_type") === "purchase",
              round(col("value"), 6).cast("decimal(28,6)"))).cast("double"),
            lit(0.0)).as("m"))
        .crossJoin(broadcast(asOf))
        .select(
          col("user_id"),
          datediff(to_date(col("as_of")), to_date(col("last_ts"))).cast("double").as("r"),
          col("f").cast("double").as("f"),
          col("m"))
      val splits = per.agg(
        percentile(col("r"), lit(0.5)).as("r50"),
        percentile(col("f"), lit(0.5)).as("f50"),
        percentile(col("m"), lit(0.5)).as("m50"))
      per
        .crossJoin(broadcast(splits))
        .select(
          col("user_id"), col("r"), col("f"), col("m"),
          // low recency-days is GOOD: score 1 when at or under the median
          when(col("r") <= col("r50"), 1L).otherwise(0L).as("r_hot"),
          when(col("f") > col("f50"), 1L).otherwise(0L).as("f_hi"),
          when(col("m") > col("m50"), 1L).otherwise(0L).as("m_hi"))
        .groupBy(
          (col("r_hot") * 4 + col("f_hi") * 2 + col("m_hi")).as("segment"))
        .agg(
          count(lit(1)).as("n_users"),
          round(avg(col("r")), 6).as("avg_recency_days"),
          round(avg(col("f")), 6).as("avg_frequency"),
          round(
            (sum(col("m").cast("decimal(28,6)")).cast("double") / count(lit(1))),
            6).as("avg_monetary"))
    }),
    // hopping-window aggregation with Spark's native window() TVF (the
    // batch form of the streaming daily tumble): 7-day windows sliding
    // 1 day, so each event lands in 7 — the engine expands windows at
    // the scan, one hash aggregate after
    "q40_hopping" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "7 days", "1 day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"), 6)
            .as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
          col("event_type"),
          col("n"),
          col("total_value"))
    }),
    // gaps-and-islands: contiguous per-user runs of the same event_type
    // (SCD2-style validity ranges) via the row_number-difference trick —
    // two window functions over ONE sort, no self-join
    "q41_runs" -> ((s, dir) => {
      val wAll = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(
          col("user_id"), col("event_type"), col("ts"), col("event_id"),
          (row_number().over(wAll) - row_number().over(wTyp)).as("grp"))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(
          count(lit(1)).as("run_len"),
          min(col("ts")).as("from_ts"),
          max(col("ts")).as("to_ts"))
        .filter(col("run_len") >= 3)
        .select(
          col("user_id"),
          col("event_type"),
          col("run_len"),
          date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
    }),
    // contribution / Pareto analysis: per-nation revenue share and the
    // cumulative share walked in revenue-desc order. The windows run
    // over the ALREADY-AGGREGATED 25-row table — a single-partition
    // window is only a scale bug on raw data, not on a group-by result
    // bounded by the dimension's cardinality
    "q42_contribution" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val wAll = Window.partitionBy()
      val wCum = Window
        .partitionBy()
        .orderBy(col("rev").desc, col("n_name").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev
        .select(
          col("n_name"),
          col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double") / sum(col("rev")).over(wAll).cast("double"), 6)
            .as("share"),
          round(
            sum(col("rev")).over(wCum).cast("double") /
              sum(col("rev")).over(wAll).cast("double"),
            6).as("cum_share"))
    }),
    // A9 derived-ratio aggregate with NULLIF guard
    "q13_ratio" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(avg(col("l_extendedprice") / nullif(col("l_quantity"), lit(0))), 6)
            .as("avg_unit_price"),
          round(avg(col("l_discount")), 6).as("avg_discount"),
          count(lit(1)).as("n"))
    }),
    // Incremental rollup via mergeable partial states (IncrementalAgg):
    // per-(day, event_type) states merged into the serving rollup, checked
    // against the direct one-pass aggregate IN-QUERY. The exact fields
    // (count / decimal sum / min / max) must match bit-for-bit; the HLL
    // distinct union gets the q28-style tolerance verdict (sketch innards
    // are engine-specific, mergeability is the point). The 100 TB story:
    // a new day appends ONE state partition, the rollup reads O(slices ×
    // groups) state rows — never the raw history (IncrementalAggSpec
    // asserts the partition pruning).
    "q30_incr_rollup" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_type"),
        col("value"),
        col("user_id"),
        to_date(col("ts")).cast("string").as("day"))
      val merged = graft.functions.IncrementalAgg.mergeStates(
        graft.functions.IncrementalAgg.partialStates(
          ev, col("day"), Seq(col("event_type")), col("value"), col("user_id")),
        Seq("event_type"))
      val direct = ev
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("d_n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("d_total"),
          min(col("value")).as("d_min"),
          max(col("value")).as("d_max"),
          countDistinct(col("user_id")).as("d_users"))
      merged
        .join(direct, Seq("event_type"))
        .select(
          col("event_type"),
          col("n_rows").as("n_events"),
          round(col("total_value"), 6).as("total_value"),
          round(col("min_value"), 6).as("min_value"),
          round(col("max_value"), 6).as("max_value"),
          col("d_users").as("n_users_exact"),
          when(
            col("n_rows") === col("d_n") && col("total_value") === col("d_total") &&
              col("min_value") === col("d_min") && col("max_value") === col("d_max"),
            lit("ok")).otherwise(lit("MERGE_MISMATCH")).as("merge_matches_direct"),
          tolVerdict(abs(col("distinct_est") - col("d_users")) / col("d_users"), 0.05)
            .as("hll_within_5pct"))
    }),
    // Z-order clustering key (ZOrder.zValue): the Morton interleave that
    // writeZOrdered sorts by. The oracle runs the IDENTICAL bit
    // arithmetic (zValueSql) in DuckDB; the file-skipping effect of the
    // layout itself is locked by ZOrderSpec. Deterministic 1-in-97
    // orderkey sample keeps the dump small.
    "q31_zorder" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey").cast("long").as("l_partkey"),
          col("l_suppkey").cast("long").as("l_suppkey"),
          graft.functions.ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 16)
            .as("zvalue"))
        .withColumn("zbucket", shiftright(col("zvalue"), 20))
    }),
    // Global row numbering WITHOUT the single-partition window
    // (GlobalOrder: range exchange + per-partition counts + offset
    // join-back). The oracle is the naive ROW_NUMBER() OVER (ORDER BY
    // ...) — identical numbers, distributed plan. Total order via the
    // (shipdate, orderkey, linenumber) tie-break.
    "q32_global_rownum" -> ((s, dir) => {
      graft.operators.GlobalOrder
        .withRowNumber(
          t(s, dir, "lineitem")
            .select(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
        .filter(col("l_orderkey") % 97 === 0)
        .select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("global_rn"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q3_filter_range" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin,
    "q4_case_when" ->
      """SELECT c_mktsegment,
        |       CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 1000 THEN 'low'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS balance_segment,
        |       COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_c_acctbal
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q6_distinct" ->
      """SELECT COUNT(*) AS total_rows,
        |       COUNT(DISTINCT (l_orderkey, l_linenumber)) AS distinct_keys,
        |       COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS duplicates,
        |       COUNT(DISTINCT l_orderkey) AS distinct_orders
        |FROM lineitem""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER w AS INTEGER) AS rn,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       strftime(lag(o_orderdate, 1) OVER w, '%Y-%m-%d') AS prev_order_date
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q8_semi_anti" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer WHERE EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS customers_with_orders,
        |  (SELECT COUNT(*) FROM customer WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS customers_without_orders""".stripMargin,
    "q9_union" ->
      """SELECT o_orderpriority AS grp, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(NULL AS BIGINT) AS n_lines
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag AS grp, CAST(NULL AS BIGINT) AS n_orders,
        |       CAST(NULL AS DOUBLE) AS total_value, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q29_setops" ->
      """WITH b96 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |), b97 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |), seg AS (
        |  SELECT o_custkey, 'only_1996' AS segment FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)
        |  UNION ALL
        |  SELECT o_custkey, 'only_1997' AS segment FROM (SELECT * FROM b97 EXCEPT SELECT * FROM b96)
        |  UNION ALL
        |  SELECT o_custkey, 'both' AS segment FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)
        |)
        |SELECT segment, COUNT(*) AS n_customers FROM seg GROUP BY segment""".stripMargin,
    "q33_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice, o_orderstatus
        |  FROM orders
        |), upd AS (
        |  SELECT o_orderkey, o_custkey,
        |         o_totalprice + CAST(10.00 AS DECIMAL(18,2)) AS o_totalprice,
        |         'U' AS o_orderstatus
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 6000000 AS o_orderkey, o_custkey, o_totalprice,
        |         'N' AS o_orderstatus
        |  FROM base WHERE o_orderkey % 1000 = 1
        |), m AS (
        |  SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |         COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |         CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
        |                THEN 'updated'
        |              WHEN b.o_orderkey IS NULL THEN 'inserted'
        |              ELSE 'unchanged' END AS op
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |)
        |SELECT op, COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys,
        |       round(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total_price
        |FROM m GROUP BY op""".stripMargin,
    "q34_winsorize" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.05) AS plo,
        |         quantile_cont(l_extendedprice, 0.95) AS phi
        |  FROM lineitem GROUP BY l_returnflag
        |), w AS (
        |  SELECT l.l_returnflag, b.plo, b.phi,
        |         least(greatest(l.l_extendedprice, b.plo), b.phi) AS v,
        |         CASE WHEN l.l_extendedprice < b.plo THEN 1 ELSE 0 END AS clo,
        |         CASE WHEN l.l_extendedprice > b.phi THEN 1 ELSE 0 END AS chi
        |  FROM lineitem l JOIN b USING (l_returnflag)
        |)
        |SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(clo) AS BIGINT) AS n_clipped_lo,
        |       CAST(SUM(chi) AS BIGINT) AS n_clipped_hi,
        |       round(MIN(plo), 6) AS p_lo,
        |       round(MIN(phi), 6) AS p_hi,
        |       round(CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
        |         AS clipped_mean
        |FROM w GROUP BY l_returnflag""".stripMargin,
    "q35_mad_outliers" ->
      """WITH med AS (
        |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
        |  FROM lineitem GROUP BY l_returnflag
        |), mad AS (
        |  SELECT l.l_returnflag, quantile_cont(abs(l.l_extendedprice - med.m), 0.5) AS d
        |  FROM lineitem l JOIN med USING (l_returnflag) GROUP BY l.l_returnflag
        |)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN abs(l.l_extendedprice - med.m) > 3.0 * mad.d
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(MIN(med.m), 6) AS med,
        |       round(MIN(mad.d), 6) AS mad
        |FROM lineitem l JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,
    "q38_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
        |), ret AS (
        |  SELECT c.cohort_week, (date_diff('day', c.cohort_week, a.week) // 7)::BIGINT AS week_offset,
        |         COUNT(DISTINCT a.user_id) AS n_active
        |  FROM activity a JOIN cohort c USING (user_id)
        |  GROUP BY 1, 2
        |), base AS (
        |  SELECT cohort_week, n_active AS cohort_size FROM ret WHERE week_offset = 0
        |)
        |SELECT CAST(r.cohort_week AS VARCHAR) AS cohort_week, r.week_offset,
        |       r.n_active, b.cohort_size,
        |       round(r.n_active::DOUBLE / b.cohort_size, 6) AS retention
        |FROM ret r JOIN base b USING (cohort_week)""".stripMargin,
    "q39_rfm" ->
      """WITH snap AS (SELECT MAX(ts) AS as_of FROM events),
        |per AS (
        |  SELECT user_id,
        |         date_diff('day', MAX(ts)::DATE, (SELECT as_of FROM snap)::DATE)::DOUBLE AS r,
        |         COUNT(*)::DOUBLE AS f,
        |         COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |                           THEN CAST(round(value, 6) AS DECIMAL(28,6)) END)::DOUBLE,
        |                  0.0) AS m
        |  FROM events GROUP BY user_id
        |), sp AS (
        |  SELECT quantile_cont(r, 0.5) AS r50, quantile_cont(f, 0.5) AS f50,
        |         quantile_cont(m, 0.5) AS m50
        |  FROM per
        |), scored AS (
        |  SELECT user_id, r, f, m,
        |         CASE WHEN r <= sp.r50 THEN 1 ELSE 0 END AS r_hot,
        |         CASE WHEN f > sp.f50 THEN 1 ELSE 0 END AS f_hi,
        |         CASE WHEN m > sp.m50 THEN 1 ELSE 0 END AS m_hi
        |  FROM per, sp
        |)
        |SELECT (r_hot * 4 + f_hi * 2 + m_hi)::BIGINT AS segment,
        |       COUNT(*) AS n_users,
        |       round(SUM(r) / COUNT(*), 6) AS avg_recency_days,
        |       round(SUM(f) / COUNT(*), 6) AS avg_frequency,
        |       round(SUM(CAST(m AS DECIMAL(28,6)))::DOUBLE / COUNT(*), 6) AS avg_monetary
        |FROM scored GROUP BY 1""".stripMargin,
    "q37_funnel" ->
      """WITH per AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id
        |), st AS (
        |  SELECT (t_view IS NOT NULL) AS s1,
        |         (t_view IS NOT NULL) AND COALESCE(t_click > t_view, FALSE) AS s2,
        |         (t_view IS NOT NULL) AND COALESCE(t_click > t_view, FALSE)
        |           AND COALESCE(t_purchase > t_click, FALSE) AS s3,
        |         epoch_ms(t_purchase) - epoch_ms(t_view) AS ms
        |  FROM per
        |)
        |SELECT COUNT(*) AS n_users,
        |       SUM(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS n_view,
        |       SUM(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS n_click_after_view,
        |       SUM(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS n_converted,
        |       round(SUM(CASE WHEN s2 THEN 1 ELSE 0 END)::DOUBLE
        |             / NULLIF(SUM(CASE WHEN s1 THEN 1 ELSE 0 END), 0), 6) AS view_to_click,
        |       round(SUM(CASE WHEN s3 THEN 1 ELSE 0 END)::DOUBLE
        |             / NULLIF(SUM(CASE WHEN s2 THEN 1 ELSE 0 END), 0), 6) AS click_to_purchase,
        |       round((SUM(CASE WHEN s3 THEN ms END)::DOUBLE
        |             / NULLIF(SUM(CASE WHEN s3 THEN 1 ELSE 0 END), 0)) / 3.6e6, 6)
        |         AS avg_hours_to_convert
        |FROM st""".stripMargin,
    // Spark's window(ts, 7d, 1d) is epoch-aligned at day granularity:
    // an event belongs to the 7 windows starting ts::DATE-6 .. ts::DATE
    "q40_hopping" ->
      """WITH w AS (
        |  SELECT ts::DATE - o.off::INTEGER AS win_start, event_type, value
        |  FROM events, (SELECT UNNEST(generate_series(0, 6)) AS off) o
        |)
        |SELECT CAST(win_start AS VARCHAR) AS win_start, event_type, COUNT(*) AS n,
        |       round(SUM(CAST(round(value, 6) AS DECIMAL(28,6)))::DOUBLE, 6) AS total_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q41_runs" ->
      """WITH g AS (
        |  SELECT user_id, event_type, ts,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
        |  FROM events
        |)
        |SELECT user_id, event_type, COUNT(*) AS run_len,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS valid_to
        |FROM g GROUP BY user_id, event_type, grp
        |HAVING COUNT(*) >= 3""".stripMargin,
    "q42_contribution" ->
      """WITH rev AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, rev::DOUBLE AS revenue,
        |       round(rev::DOUBLE / (SUM(rev) OVER ())::DOUBLE, 6) AS share,
        |       round((SUM(rev) OVER (ORDER BY rev DESC, n_name ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |             / (SUM(rev) OVER ())::DOUBLE, 6) AS cum_share
        |FROM rev""".stripMargin,
    "q36_json" ->
      """WITH p AS (
        |  SELECT event_type, (props->>'k')::BIGINT AS k, value FROM events
        |)
        |SELECT event_type, k - (k % 10) AS k_bucket, COUNT(*) AS n,
        |       SUM(k)::BIGINT AS sum_k, round(AVG(value), 6) AS avg_value
        |FROM p GROUP BY 1, 2""".stripMargin,
    "q26_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE) AS high,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE) AS medium,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE) AS not_specified,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS low
        |FROM orders GROUP BY 1""".stripMargin,
    "q27_unpivot" ->
      """WITH s AS (
        |  SELECT n_name,
        |         CAST(COUNT(*) AS DOUBLE) AS n_customers,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
        |         round(MAX(c_acctbal), 6) AS max_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM s
        |UNION ALL SELECT n_name, 'avg_acctbal', avg_acctbal FROM s
        |UNION ALL SELECT n_name, 'max_acctbal', max_acctbal FROM s""".stripMargin,
    "q28_sketch" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS exact_distinct,
        |       'ok' AS hll_within_5pct,
        |       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS exact_median,
        |       'ok' AS median_within_1pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q43_heavy_hitters" ->
      """WITH k AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 5
        |              THEN 'hot' || CAST(l_orderkey % 5 AS VARCHAR)
        |              ELSE 'cold' || CAST(l_partkey AS VARCHAR) END AS k
        |  FROM lineitem
        |), e AS (
        |  SELECT k, COUNT(*)::BIGINT AS exact_n
        |  FROM k GROUP BY k ORDER BY exact_n DESC, k LIMIT 5
        |)
        |SELECT k, exact_n, 'ok' AS in_sketch, 'ok' AS underestimate,
        |       'ok' AS within_bound
        |FROM e ORDER BY exact_n DESC, k""".stripMargin,
    // q44: full CMS replay — one portable hash per key expanded by
    // Kirsch–Mitzenmacher double hashing (h1 = low 30 bits, h2 = high
    // bits forced odd, c_r = (h1 + r·h2) mod width) makes the counter
    // table itself reproducible, not just its gates
    "q44_countmin" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 5
        |              THEN 'hot' || CAST(l_orderkey % 5 AS VARCHAR)
        |              ELSE 'cold' || CAST(l_partkey AS VARCHAR) END AS k
        |  FROM lineitem
        |), hk AS (
        |  SELECT k, ('0x' || substr(md5(k), 1, 15))::BIGINT AS v FROM keyed
        |), coords AS (
        |  SELECT k, i.r,
        |         (((v % 1073741824) + i.r * ((v // 1073741824) * 2 + 1)) % 256)::INT AS c
        |  FROM hk, (SELECT UNNEST(generate_series(0, 3)) AS r) i
        |), sketch AS (
        |  SELECT r, c, COUNT(*)::BIGINT AS cnt FROM coords GROUP BY 1, 2
        |), probes AS (
        |  SELECT k, COUNT(*)::BIGINT AS exact_n FROM keyed
        |  GROUP BY 1 ORDER BY exact_n DESC, k ASC LIMIT 10
        |), pc AS (
        |  SELECT pr.k, i.r,
        |         ((((('0x' || substr(md5(pr.k), 1, 15))::BIGINT) % 1073741824)
        |           + i.r * (((('0x' || substr(md5(pr.k), 1, 15))::BIGINT) // 1073741824) * 2 + 1)) % 256)::INT AS c
        |  FROM probes pr, (SELECT UNNEST(generate_series(0, 3)) AS r) i
        |), pest AS (
        |  SELECT p.k, MIN(COALESCE(s.cnt, 0))::BIGINT AS est
        |  FROM pc p LEFT JOIN sketch s ON s.r = p.r AND s.c = p.c
        |  GROUP BY 1
        |)
        |SELECT pr.k, pr.exact_n, p.est,
        |       CASE WHEN p.est >= pr.exact_n THEN 'ok' ELSE 'UNDERESTIMATE' END AS lower_bound,
        |       (p.est - pr.exact_n)::BIGINT AS overcount
        |FROM pest p JOIN probes pr USING (k)
        |ORDER BY pr.exact_n DESC, pr.k ASC""".stripMargin,
    // q45: full HLL replay — bucket/rank are integer functions of the
    // portable hash (rank via bitlength = length(bin(w))), and the
    // harmonic sum folds over buckets 0..255 in order with each term an
    // exact power of two, matching the Scala fold's IEEE sequence
    // term-for-term. All float literals cast ::DOUBLE (DuckDB decimals
    // would divide in decimal arithmetic and drift).
    "q45_hll" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 5
        |              THEN 'hot' || CAST(l_orderkey % 5 AS VARCHAR)
        |              ELSE 'cold' || CAST(l_partkey AS VARCHAR) END AS k
        |  FROM lineitem
        |), hk AS (
        |  SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT AS h FROM keyed
        |), rk AS (
        |  SELECT (h % 256)::INT AS bucket,
        |         (CASE WHEN h // 256 = 0 THEN 53
        |               ELSE 53 - length(bin(h // 256)) END)::INT AS rank
        |  FROM hk
        |), reg AS (
        |  SELECT bucket, MAX(rank)::INT AS max_rank FROM rk GROUP BY bucket
        |), fullreg AS (
        |  SELECT b.bucket, COALESCE(reg.max_rank, 0) AS r
        |  FROM (SELECT UNNEST(generate_series(0, 255)) AS bucket) b
        |  LEFT JOIN reg ON reg.bucket = b.bucket
        |), sfold AS (
        |  SELECT list_reduce(
        |           list_prepend(0.0::DOUBLE,
        |             list_transform(list(r ORDER BY bucket),
        |                            x -> 1.0::DOUBLE / (1::BIGINT << x))),
        |           (a, y) -> a + y) AS s
        |  FROM fullreg
        |), est AS (
        |  SELECT (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |           * 256 * 256 / s AS raw
        |  FROM sfold
        |), ex AS (SELECT COUNT(DISTINCT k)::BIGINT AS exact_distinct FROM keyed)
        |SELECT reg.bucket, reg.max_rank,
        |       (SELECT COUNT(*) FROM reg)::BIGINT AS n_buckets_set,
        |       round(est.raw, 6) AS raw_est,
        |       ex.exact_distinct,
        |       round(abs(est.raw - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
        |FROM reg, est, ex
        |ORDER BY reg.bucket""".stripMargin,
    // q49: the grouped q45 replay — per-group registers, per-group
    // ordered harmonic folds, identical float sequence to the Scala
    // driver fold
    "q49_hll_grouped" ->
      """WITH hk AS (
        |  SELECT o_orderpriority AS grp,
        |         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders
        |), rk AS (
        |  SELECT grp, (h % 256)::INT AS bucket,
        |         (CASE WHEN h // 256 = 0 THEN 53
        |               ELSE 53 - length(bin(h // 256)) END)::INT AS rank
        |  FROM hk
        |), reg AS (
        |  SELECT grp, bucket, MAX(rank)::INT AS max_rank FROM rk GROUP BY 1, 2
        |), grps AS (SELECT DISTINCT grp FROM reg),
        |fullreg AS (
        |  SELECT g.grp, b.bucket, COALESCE(reg.max_rank, 0) AS r
        |  FROM grps g
        |  CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS bucket) b
        |  LEFT JOIN reg ON reg.grp = g.grp AND reg.bucket = b.bucket
        |), sfold AS (
        |  SELECT grp,
        |         list_reduce(
        |           list_prepend(0.0::DOUBLE,
        |             list_transform(list(r ORDER BY bucket),
        |                            x -> 1.0::DOUBLE / (1::BIGINT << x))),
        |           (a, y) -> a + y) AS s
        |  FROM fullreg GROUP BY grp
        |), est AS (
        |  SELECT grp,
        |         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |           * 256 * 256 / s AS raw
        |  FROM sfold
        |), ex AS (
        |  SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey)::BIGINT AS exact_distinct
        |  FROM orders GROUP BY 1
        |), ns AS (SELECT grp, COUNT(*)::BIGINT AS n_buckets_set FROM reg GROUP BY 1)
        |SELECT e.grp AS o_orderpriority, ns.n_buckets_set,
        |       round(est.raw, 6) AS raw_est, e.exact_distinct,
        |       round(abs(est.raw - e.exact_distinct) / e.exact_distinct, 6) AS rel_err
        |FROM ex e
        |JOIN est ON est.grp = e.grp
        |JOIN ns ON ns.grp = e.grp
        |ORDER BY o_orderpriority""".stripMargin,
    // q48: the two-phase skew-safe distinct is EQUIVALENT to
    // countDistinct — the oracle is the plain form
    "q48_skew_distinct" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 5
        |              THEN 'hot' || CAST(l_orderkey % 5 AS VARCHAR)
        |              ELSE 'cold' || CAST(l_partkey AS VARCHAR) END AS k,
        |         l_partkey AS pk
        |  FROM lineitem
        |)
        |SELECT k, COUNT(DISTINCT pk)::BIGINT AS distinct_pk
        |FROM keyed GROUP BY k
        |ORDER BY distinct_pk DESC, k ASC LIMIT 10""".stripMargin,
    // q47: the oracle is the PLAIN join — the bloom pre-filter is an
    // optimization whose false positives the join removes, so the
    // result must be exactly the unpruned answer
    "q47_bloom_join" ->
      """SELECT l_returnflag,
        |       COUNT(*)::BIGINT AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       round(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 200000.0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q46: full histogram replay — bin = floor((x−lo)/(hi−lo)·128)
    // clamped, identical IEEE ops on identical doubles; the quantile
    // pick is the first bin whose running count reaches q·n (struct-MIN
    // over qualifying bins), interpolated with the same pinned formula
    // the Scala side evaluates
    "q46_hist_quantile" ->
      """WITH src AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem),
        |rng AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM src),
        |hist AS (
        |  SELECT LEAST(127, floor((LEAST(hi, GREATEST(lo, x)) - lo) / (hi - lo) * 128)::INT)::INT AS bin,
        |         COUNT(*)::BIGINT AS cnt
        |  FROM src, rng GROUP BY 1
        |), nn AS (SELECT SUM(cnt)::BIGINT AS n FROM hist),
        |c AS (
        |  SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist
        |), qs AS (
        |  SELECT UNNEST([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
        |                 0.95::DOUBLE, 0.99::DOUBLE]) AS q
        |), pick AS (
        |  SELECT q,
        |         MIN(struct_pack(b := bin, cb := cum - cnt, c := cnt)) AS s
        |  FROM qs, c, nn WHERE c.cum >= q * nn.n
        |  GROUP BY q
        |), ests AS (
        |  SELECT q,
        |         lo + (s.b + (q * nn.n - s.cb) / s.c) * ((hi - lo) / 128) AS est
        |  FROM pick, rng, nn
        |), wide AS (
        |  SELECT MAX(CASE WHEN q = 0.25 THEN est END) AS e25,
        |         MAX(CASE WHEN q = 0.5  THEN est END) AS e50,
        |         MAX(CASE WHEN q = 0.75 THEN est END) AS e75,
        |         MAX(CASE WHEN q = 0.95 THEN est END) AS e95,
        |         MAX(CASE WHEN q = 0.99 THEN est END) AS e99
        |  FROM ests
        |), ex AS (SELECT quantile_cont(x, 0.5) AS exact_p50 FROM src)
        |SELECT h.bin, h.cnt, nn.n,
        |       round(rng.lo, 6) AS lo, round(rng.hi, 6) AS hi,
        |       round(w.e25, 6) AS est_p25, round(w.e50, 6) AS est_p50,
        |       round(w.e75, 6) AS est_p75, round(w.e95, 6) AS est_p95,
        |       round(w.e99, 6) AS est_p99,
        |       round(ex.exact_p50, 6) AS exact_p50,
        |       round(abs(w.e50 - ex.exact_p50), 6) AS err_p50
        |FROM hist h, nn, rng, wide w, ex
        |ORDER BY h.bin""".stripMargin,
    "q10_quantile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q11_rank_corr" ->
      """WITH ranked AS (
        |  SELECT l_returnflag,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rank_qty,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rank_price
        |  FROM lineitem
        |)
        |SELECT l_returnflag, round(corr(rank_qty, rank_price), 6) AS rank_correlation
        |FROM ranked GROUP BY l_returnflag""".stripMargin,
    "q23_describe" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", COUNT($c)::BIGINT AS n,
           |       round(avg(CAST($c AS DOUBLE)), 6) AS mean,
           |       round(stddev(CAST($c AS DOUBLE)), 6) AS std,
           |       round(min(CAST($c AS DOUBLE)), 6) AS min,
           |       round(quantile_cont(CAST($c AS DOUBLE), 0.25), 6) AS p25,
           |       round(quantile_cont(CAST($c AS DOUBLE), 0.5), 6) AS p50,
           |       round(quantile_cont(CAST($c AS DOUBLE), 0.75), 6) AS p75,
           |       round(max(CAST($c AS DOUBLE)), 6) AS max
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one).mkString("\nUNION ALL\n")
    },
    "q22_range_window" ->
      """WITH daily AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(ts AS DATE) AS period,
        |         COUNT(*) AS daily_events,
        |         CAST(ts AS DATE) - DATE '2024-01-01' AS day_num
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT key, CAST(period AS VARCHAR) AS period, daily_events,
        |       CAST(SUM(daily_events) OVER (PARTITION BY key ORDER BY day_num
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_7d_events
        |FROM daily""".stripMargin,
    "q12_running_window" ->
      """WITH daily AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(ts AS DATE) AS period,
        |         COUNT(*) AS daily_events
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT key, CAST(period AS VARCHAR) AS period, daily_events,
        |       CAST(SUM(daily_events) OVER (PARTITION BY key ORDER BY period
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
        |FROM daily""".stripMargin,
    "q14_sql_views" ->
      """SELECT o.o_orderkey, c.c_name, o.o_totalprice,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 100000
        |ORDER BY o.o_orderdate DESC, o.o_orderkey ASC LIMIT 100""".stripMargin,
    "q15_sessions" ->
      """WITH e AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_id, epoch_ms(ts) AS ts_ms, value
        |  FROM events
        |), flagged AS (
        |  SELECT key, event_id, ts_ms, value,
        |         CASE WHEN lag(ts_ms, 1) OVER w IS NULL
        |                   OR ts_ms - lag(ts_ms, 1) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY key ORDER BY ts_ms, event_id)
        |), sess AS (
        |  SELECT key, ts_ms, value,
        |         CAST(SUM(new_session) OVER (PARTITION BY key ORDER BY ts_ms, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT key, session_id, COUNT(*) AS n_events,
        |       MAX(ts_ms) - MIN(ts_ms) AS duration_ms,
        |       round(SUM(value), 6) AS total_value
        |FROM sess GROUP BY key, session_id""".stripMargin,
    "q16_spearman" ->
      """WITH ranked AS (
        |  SELECT l_returnflag,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS rq,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS rp
        |  FROM lineitem
        |)
        |SELECT l_returnflag, round(corr(rq, rp), 6) AS spearman_rho
        |FROM ranked GROUP BY l_returnflag""".stripMargin,
    "q18_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin,
    "q19_exists" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 45)
        |GROUP BY p_brand""".stripMargin,
    "q21_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q20_cube" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COALESCE(o_orderstatus, 'ALL') AS status,
        |       COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin,
    "q17_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q24_asof" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, round(value, 6) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
        |  FROM events WHERE event_type = 'click'
        |), j AS (
        |  SELECT p.user_id, p.event_id, p.ts_ms, p.purchase_value, c.click_id, c.click_ms,
        |         row_number() OVER (PARTITION BY p.user_id, p.event_id
        |                            ORDER BY c.click_ms DESC NULLS LAST, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ms <= p.ts_ms
        |)
        |SELECT user_id, event_id, ts_ms, purchase_value, click_id, click_ms,
        |       ts_ms - click_ms AS gap_ms
        |FROM j WHERE rn = 1""".stripMargin,
    "q25_interval" ->
      """WITH w AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-24',
        |                                     INTERVAL 1 DAY)) AS DATE) AS wstart
        |)
        |SELECT strftime(wstart, '%Y-%m-%d') AS window_start,
        |       strftime(wstart + INTERVAL 6 DAY, '%Y-%m-%d') AS window_end,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT e.user_id) AS n_users,
        |       round(SUM(e.value), 6) AS total_value
        |FROM w JOIN events e
        |  ON CAST(e.ts AS DATE) BETWEEN wstart AND CAST(wstart + INTERVAL 6 DAY AS DATE)
        |GROUP BY wstart""".stripMargin,
    "q13_ratio" ->
      """SELECT l_returnflag,
        |       round(AVG(l_extendedprice / NULLIF(l_quantity, 0)), 6) AS avg_unit_price,
        |       round(AVG(l_discount), 6) AS avg_discount,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q30_incr_rollup" ->
      """SELECT event_type,
        |       COUNT(*) AS n_events,
        |       round(SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE, 6) AS total_value,
        |       round(MIN(value), 6) AS min_value,
        |       round(MAX(value), 6) AS max_value,
        |       COUNT(DISTINCT user_id) AS n_users_exact,
        |       'ok' AS merge_matches_direct,
        |       'ok' AS hll_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,
    "q31_zorder" -> {
      val z = graft.functions.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 16)
      s"""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       CAST(l_partkey AS BIGINT) AS l_partkey,
         |       CAST(l_suppkey AS BIGINT) AS l_suppkey,
         |       $z AS zvalue,
         |       $z >> 20 AS zbucket
         |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin
    },
    "q32_global_rownum" ->
      """WITH rn AS (
        |  SELECT l_orderkey, l_linenumber,
        |         ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS global_rn
        |  FROM lineitem)
        |SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(global_rn AS BIGINT) AS global_rn
        |FROM rn WHERE l_orderkey % 97 = 0""".stripMargin
  )
}

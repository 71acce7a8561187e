package graft.contract

import graft.core.Engine
import graft.ops.Aggregates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 contract queries — relational surface (A/C/D/E/F/G + I).
  *
  * Every query is fully deterministic (total ORDER BY incl. a unique
  * tiebreaker) and hash-comparable against the paired DuckDB oracle SQL:
  * doubles that suffer from summation-order nondeterminism are summed as
  * DECIMAL(18,6) and cast back to double; per-row double arithmetic is
  * IEEE-deterministic and left exact; counts are bigint on both sides.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** sum(CAST(x AS DECIMAL(18,6))) cast back to double — deterministic
    * regardless of partitioning / add order.
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 — parquet scan + projection + total sort
    "a1_parquet_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // C1/C4/C5 — projection, computed cols, case/coalesce/cast
    "c1_project_case" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        round(col("o_totalprice") * 0.9d, 6).as("discounted"),
        when(col("o_totalprice") > 300000d, "big")
          .when(col("o_totalprice") > 100000d, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_totalprice").cast("int").as("price_int"))
        .orderBy(col("o_orderkey"))
    }),

    // C2/C3 — filter with IN / BETWEEN / LIKE / comparison predicates
    "c2_filter_predicates" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(50000d, 200000d) &&
          col("o_orderpriority").like("%URGENT") &&
          col("o_custkey") =!= 0L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // D1/D6 — multi-way inner join (fact ⋈ dims, dims broadcast) + agg
    "d1_inner_join_agg" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .where(r("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // D2 — left outer join + null-tolerant agg
    "d2_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0d)).as("total_spend"))
        .orderBy(col("c_custkey"))
    }),

    // D3 — left semi join (EXISTS)
    "d3_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // D3 — left anti join (NOT EXISTS)
    "d3_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // D4 — cross join
    "d4_cross_join" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(t(s, dir, "supplier"))
        .select(col("r_name"), col("s_suppkey"))
        .orderBy(col("r_name"), col("s_suppkey"))
    }),

    // D5 — theta (non-equi) join
    "d5_theta_join" -> ((s, dir) => {
      val a = t(s, dir, "supplier").as("a")
      val b = t(s, dir, "supplier").as("b")
      graft.ops.Joins.thetaJoin(a, b, col("b.s_acctbal") < col("a.s_acctbal"))
        .groupBy(col("a.s_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("n_poorer"))
        .orderBy(col("s_suppkey"))
    }),

    // D9 — self join
    "d9_self_join" -> ((s, dir) => {
      val a = t(s, dir, "nation").as("a")
      val b = t(s, dir, "nation").as("b")
      a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_name").as("n1"), col("b.n_name").as("n2"))
        .orderBy(col("n1"), col("n2"))
    }),

    // E1/E2/C2/G1 — the flagship TPC-H-Q1-shaped aggregation
    "e1_agg_flagship" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // E2 — statistical aggregates
    "e2_stats_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // E3 — distinct aggregates (incl. multi-distinct)
    "e3_distinct_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // E5 — exact percentiles / median
    "e5_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
          round(expr("median(l_extendedprice)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75"))
        .orderBy(col("l_returnflag"))
    }),

    // E6 — collection aggregates + max_by/min_by. The collected set is
    // emitted as a sorted comma-joined STRING (not array<string>): the
    // driver's pandas compare sorts cells and cannot hash array cells.
    "e6_collect_agg" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
          expr("max_by(c_name, c_custkey)").as("max_cust_name"),
          expr("min_by(c_name, c_custkey)").as("min_cust_name"))
        .orderBy(col("c_nationkey"))
    }),

    // E5b — SQL:2008 inverse-distribution functions through the SQL
    // entry point (percentile_cont interpolates; percentile_disc returns
    // the smallest value with cume_dist >= p)
    "e5_within_group" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""SELECT l_returnflag,
                      percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_cont,
                      percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_cont,
                      percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_disc
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // E6b — ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP;
    // the ORDER BY makes it deterministic and therefore hash-matchable)
    "e6_listagg" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""SELECT c_nationkey,
                      listagg(c_mktsegment, '|') WITHIN GROUP (ORDER BY c_mktsegment, c_custkey) AS segs,
                      listagg(DISTINCT c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment) AS seg_set
               FROM customer
               WHERE c_custkey <= 200
               GROUP BY c_nationkey
               ORDER BY c_nationkey""")
    }),

    // C6 — correlated subqueries: scalar (per-customer average) and
    // EXISTS, through the SQL entry point — exercises Catalyst's
    // subquery decorrelation into aggregates + semi joins
    "c6_correlated_subquery" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS total
        FROM orders o
        WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
          AND EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        ORDER BY o.o_orderkey""")
    }),

    // E12 — DataFrameStatFunctions surface: contingency table
    // (crosstab); columns pinned to the known value set so the output
    // shape is deterministic and hash-matchable
    "e12_crosstab" -> ((s, dir) => {
      t(s, dir, "orders")
        .stat.crosstab("o_orderstatus", "o_orderpriority")
        .select(col("o_orderstatus_o_orderpriority").as("status"),
          col("1-URGENT").as("p1"), col("2-HIGH").as("p2"),
          col("3-MEDIUM").as("p3"), col("4-NOT SPECIFIED").as("p4"),
          col("5-LOW").as("p5"))
        .orderBy(col("status"))
    }),

    // E7 — rollup with grouping()
    "e7_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"), col("g_rf"), col("g_ls"))
    }),

    // E7 — GROUPING SETS through the SQL entry point
    "e7_grouping_sets" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
                      COALESCE(o_orderpriority, 'ALL') AS pr,
                      count(*) AS n
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY st, pr""")
    }),

    // E7 — cube with grouping_id() (all four grouping-set combinations)
    "e7_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          grouping_id().cast("int").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"), col("gid"))
    }),

    // G9 — dense 0-based ids in key order WITHOUT a single-partition
    // window: range partition + bounded offset collect + local ranks.
    // Hash-matched against the global row_number() the naive plan would
    // serialize onto one task.
    "g9_dense_ids" -> ((s, dir) => {
      graft.ops.Layout.denseIds(
          t(s, dir, "orders").select(col("o_orderkey")), "o_orderkey")
        .orderBy(col("o_orderkey"))
    }),

    // E8 — having
    "e8_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .where(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    }),

    // E9 — pivot
    "e9_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
        .orderBy(col("user_id"))
    }),

    // E10 — unpivot (wide → long)
    "e10_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_orderkey") < 500L)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    // E11 — custom typed Aggregator (geometric mean) via udaf()
    "e11_custom_udaf" -> ((s, dir) => {
      val geo = Aggregates.geometricMeanUdaf
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(round(geo(col("o_totalprice")), 6).as("geo_mean_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // F1 — ranking window functions
    "f1_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .where(col("rn") <= 5)
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // F2 — analytic window functions (lag/lead/first_value)
    "f2_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          first(col("event_id")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_id"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // F3 — running aggregate over window
    "f3_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("run_sum"),
          count(lit(1)).over(w).as("run_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // F4 — RANGE frame over a numeric ordering
    "f4_range_frame" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("n_close",
          expr("count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice " +
            "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("n_close"))
        .orderBy(col("o_orderkey"))
    }),

    // F5 — top-k per group (window idiom)
    "f5_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // G1 — global multi-key sort, asc/desc mixed
    "g1_sort_multikey" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
    }),

    // G3 — limit + offset after a total sort
    "g3_limit_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10)
        .limit(50)
    }),

    // G4/D1 — top-k join query (TPC-H Q3 shape → TakeOrderedAndProject)
    "g4_topk_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // G5 — union all / union distinct
    "g5_union" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val all = c.unionByName(sup).groupBy(col("k")).agg(count(lit(1)).as("n_all"))
      val dist = c.union(sup).distinct().select(col("k"), lit(1L).as("one"))
      all.join(dist, Seq("k"))
        .select(col("k"), col("n_all"), col("one"))
        .orderBy(col("k"))
    }),

    // G6 — intersect / except
    "g6_intersect_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
      c.intersect(sup).withColumn("tag", lit("both"))
        .unionByName(c.except(sup).withColumn("tag", lit("cust_only")))
        .unionByName(sup.except(c).withColumn("tag", lit("supp_only")))
        .orderBy(col("tag"), col("k"))
    }),

    // G7 — deterministic subset dedup (window idiom, not dropDuplicates)
    "g7_dedup_subset" -> ((s, dir) => {
      graft.cdc.Materialize.latestByKey(
          t(s, dir, "events"), Seq("user_id", "event_type"),
          Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // I1 — explode a tokenized text column
    "i1_explode" -> ((s, dir) => {
      t(s, dir, "documents")
        .where(col("doc_id") < 100L)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        .orderBy(col("doc_id"), col("token"))
    }),

    // I1 — posexplode (position-aware generator)
    "i2_posexplode" -> ((s, dir) => {
      t(s, dir, "documents")
        .where(col("doc_id") < 50L)
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.tokens(col("text"))).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // I2 — inline (struct-array → rows) and stack (literal pivot), the
    // actual I2 generator surface (posexplode above is I1-adjacent)
    "i2_inline_stack" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber, metric, val FROM (
          SELECT l_orderkey, l_linenumber, metric, val
          FROM lineitem
          LATERAL VIEW inline(array(
            struct('qty' AS metric, CAST(l_quantity AS DOUBLE) AS val),
            struct('price' AS metric, CAST(l_extendedprice AS DOUBLE) AS val))) t AS metric, val
          WHERE l_orderkey < 200
          UNION ALL
          SELECT o_orderkey, -1, metric, val
          FROM orders
          LATERAL VIEW stack(2,
            'total', CAST(o_totalprice AS DOUBLE),
            'priority', CAST(LENGTH(o_orderpriority) AS DOUBLE)) t AS metric, val
          WHERE o_orderkey < 200)
        ORDER BY l_orderkey, l_linenumber, metric""")
    }),

    // I3 — Scala UDF registration surface
    "i3_udf" -> ((s, dir) => {
      val clamp = udf((x: Double, lo: Double, hi: Double) => math.min(math.max(x, lo), hi))
      s.udf.register("graft_clamp", clamp)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(clamp(col("o_totalprice"), lit(50000.0d), lit(300000.0d)), 6).as("clamped"))
        .orderBy(col("o_orderkey"))
    }))

  val oracle: Map[String, String] = Map(
    "a1_parquet_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "c1_project_case" ->
      """SELECT o_orderkey,
        |  ROUND(o_totalprice * 0.9, 6) AS discounted,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_x,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(TRUNC(o_totalprice) AS INTEGER) AS price_int
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c2_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |  AND o_orderpriority LIKE '%URGENT'
        |  AND o_custkey <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "d1_inner_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "d2_outer_join" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "d3_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "d3_anti_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "d4_cross_join" ->
      """SELECT r_name, s_suppkey FROM region CROSS JOIN supplier
        |ORDER BY r_name, s_suppkey""".stripMargin,

    "d5_theta_join" ->
      """SELECT a.s_suppkey AS s_suppkey, COUNT(*) AS n_poorer
        |FROM supplier a JOIN supplier b ON b.s_acctbal < a.s_acctbal
        |GROUP BY a.s_suppkey ORDER BY s_suppkey""".stripMargin,

    "d9_self_join" ->
      """SELECT a.n_name AS n1, b.n_name AS n2
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2""".stripMargin,

    "e1_agg_flagship" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 6) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "e2_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
        |  ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "e3_distinct_agg" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "e5_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  ROUND(median(l_extendedprice), 6) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "e6_collect_agg" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  arg_max(c_name, c_custkey) AS max_cust_name,
        |  arg_min(c_name, c_custkey) AS min_cust_name
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "e5_within_group" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_cont,
        |  quantile_cont(l_quantity, 0.9) AS p90_cont,
        |  CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS p50_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "e6_listagg" ->
      """SELECT c_nationkey,
        |  string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey) AS segs,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS seg_set
        |FROM customer
        |WHERE c_custkey <= 200
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "c6_correlated_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey, CAST(o.o_totalprice AS DOUBLE) AS total
        |FROM orders o
        |WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
        |                            FROM orders o2
        |                            WHERE o2.o_custkey = o.o_custkey)
        |  AND EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey
        |                AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o.o_orderkey""".stripMargin,

    "e12_crosstab" ->
      """SELECT o_orderstatus AS status,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,

    "e7_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, g_rf, g_ls""".stripMargin,

    "e7_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |  COALESCE(o_orderpriority, 'ALL') AS pr,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pr""".stripMargin,

    "e7_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin,

    "g9_dense_ids" ->
      """SELECT o_orderkey,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS dense_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "e8_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "e9_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS "error",
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS signup,
        |  CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e10_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        |  FROM lineitem WHERE l_orderkey < 500
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 500
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 500)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "e11_custom_udaf" ->
      """SELECT o_orderstatus,
        |  ROUND(EXP(AVG(LN(o_totalprice))), 6) AS geo_mean_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "f1_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk, quartile, pct_rank
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |        row_number() OVER w AS rn,
        |        rank() OVER w AS rnk,
        |        dense_rank() OVER w AS drnk,
        |        ntile(4) OVER w AS quartile,
        |        ROUND(percent_rank() OVER w, 6) AS pct_rank
        |      FROM customer
        |      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin,

    "f2_lag_lead" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  first_value(event_id) OVER w AS first_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "f3_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS run_sum,
        |  COUNT(*) OVER w AS run_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "f4_range_frame" ->
      """SELECT o_orderkey, o_orderstatus,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_close
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f5_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "g1_sort_multikey" ->
      """SELECT o_orderstatus, o_totalprice, o_orderkey
        |FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "g3_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10""".stripMargin,

    "g4_topk_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_date
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "g5_union" ->
      """WITH a AS (SELECT c_nationkey AS k FROM customer
        |           UNION ALL SELECT s_nationkey FROM supplier),
        |     d AS (SELECT c_nationkey AS k FROM customer
        |           UNION SELECT s_nationkey FROM supplier)
        |SELECT a.k AS k, COUNT(*) AS n_all, CAST(1 AS BIGINT) AS one
        |FROM a JOIN d ON a.k = d.k
        |GROUP BY a.k ORDER BY k""".stripMargin,

    "g6_intersect_except" ->
      """SELECT k, tag FROM (
        |  SELECT k, 'both' AS tag FROM
        |    (SELECT DISTINCT c_nationkey AS k FROM customer
        |     INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT k, 'cust_only' FROM
        |    (SELECT DISTINCT c_nationkey AS k FROM customer
        |     EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT k, 'supp_only' FROM
        |    (SELECT DISTINCT s_nationkey AS k FROM supplier
        |     EXCEPT SELECT DISTINCT c_nationkey FROM customer))
        |ORDER BY tag, k""".stripMargin,

    "g7_dedup_subset" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "i1_explode" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, unnest(toks) AS token FROM tk
        |ORDER BY doc_id, token""".stripMargin,

    "i2_posexplode" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(0, len(toks) - 1)) AS INTEGER) AS pos,
        |  unnest(toks) AS token
        |FROM tk ORDER BY doc_id, pos""".stripMargin,

    "i2_inline_stack" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'qty' AS metric,
        |         CAST(l_quantity AS DOUBLE) AS val
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT o_orderkey, -1, 'total', CAST(o_totalprice AS DOUBLE)
        |  FROM orders WHERE o_orderkey < 200
        |  UNION ALL
        |  SELECT o_orderkey, -1, 'priority', CAST(LENGTH(o_orderpriority) AS DOUBLE)
        |  FROM orders WHERE o_orderkey < 200)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "i3_udf" ->
      """SELECT o_orderkey,
        |  ROUND(LEAST(GREATEST(o_totalprice, 50000.0), 300000.0), 6) AS clamped
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}

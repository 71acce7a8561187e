package graft.contract

import graft.core.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED-QUERY GAUNTLET (r17) — ALL 22 TPC-H query shapes
  * adapted to this star schema. Every §2 operator is probe-tested
  * elsewhere; these queries exercise what no single probe does:
  * 5–8-table join ordering, correlated subqueries UNDER joins
  * (scalar-min/avg/sum, EXISTS/NOT-EXISTS/IN/NOT-IN against facts and
  * derived relations), aggregation-of-aggregation, conditional-sum
  * ratios, disjunctive predicate factoring, and AQE behavior on
  * composed plans — the "same query capabilities" bar at 100× scale
  * [PK: the reference platform's consumers run exactly these reporting
  * shapes over CDC-materialized tables; REF README.md:13].
  *
  * Schema adaptation: the corpus has no partsupp table, so the
  * Q2/Q9/Q11/Q16/Q20 shapes derive the supply relation from lineitem
  * itself — `supply(ps_partkey, ps_suppkey, …)` as a grouped CTE —
  * which PRESERVES the interesting plan property (the correlated
  * subquery runs over a shuffled aggregate, not a base scan). Q21/Q4's
  * "late" predicate uses l_shipdate vs o_orderdate and Q12's "ship
  * mode" maps to l_linestatus (the corpus carries no
  * commit/receipt/shipmode columns); Q22's no-order clause becomes
  * no-URGENT-order (every customer here has orders).
  *
  * Determinism: money sums ride the repo-wide DECIMAL(18,6) rule;
  * l_quantity is integer-valued so double sums/avgs are exact in any
  * order; per-row arithmetic is IEEE-deterministic. One subtlety
  * (q09): Spark's double→decimal cast rounds the value's SHORTEST
  * decimal representation (java BigDecimal.valueOf) while DuckDB
  * rounds the exact binary value — a per-row product whose shortest
  * form lands on a .xxxxxx5 boundary diverges by 1e-6. q09 therefore
  * derives its supply cost WITHOUT division (2-dp-derived products
  * round-trip exactly, so the cast never rounds at all).
  *
  * Scale shape (plan-audited by CoreOpsSpec's blanket pass + the
  * dedicated GauntletSpec): dims (region/nation/supplier/part at
  * their TPC-H fan-ins) broadcast; the fact joins are keyed shuffles;
  * decorrelated subqueries become aggregate + semi/anti/equi joins,
  * never a per-row re-scan; no BNLJ, no cartesian; the only
  * single-partition exchanges are 1-row global/scalar-aggregate final
  * combines (documented in the blanket audit's exemption list).
  */
object GauntletQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** The CDC → GAUNTLET composition (r18, the r17 verdict's top_next):
    * replay a table as a CHANGELOG through the A8 bucketed upsert sink —
    * a real checkpointed file-source stream, one micro-batch per file —
    * and return the materialized target. The changelog is adversarial:
    * besides every row's final version (v3), keys ≡0 (mod 7) also carry
    * a STALE v1 with poisoned values (shifted dates, flipped flags,
    * inflated discounts — each chosen to corrupt q03/q10 if latest-wins
    * ever loses), and keys ≡0 (mod 9) inject GHOST rows (negated keys)
    * inserted at v1 and tombstoned at v2 — rows that must stay dead.
    * Batch assignment hashes (key, version), so a ghost's delete can
    * arrive in an EARLIER micro-batch than its insert: the merge must be
    * order-independent, which is exactly the at-least-once contract the
    * sink claims. The materialized table therefore equals the source
    * table IFF the whole CDC pipeline is correct — and the gauntlet
    * queries over it hash-match the SAME oracles as their base-table
    * twins [PK: reporting over changelog-materialized state IS the
    * reference platform's consumer story; REF README.md:13].
    */
  private def cdcMaterialize(s: SparkSession, dir: String, name: String,
                             src: DataFrame,
                             keyCols: Seq[String], bucketCols: Seq[String],
                             keyCol: org.apache.spark.sql.Column,
                             negateKey: DataFrame => DataFrame,
                             poison: DataFrame => DataFrame): DataFrame = {
    import graft.streaming.Sinks
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-cdcmat-$name").toString
    val chDir = s"$base/changelog"
    val target = s"$base/table"
    val ckpt = s"$base/ckpt"
    val fin = src.withColumn("op", lit("u")).withColumn("__v", lit(3L))
    val stale = poison(src.where(pmod(keyCol, lit(7L)) === 0L))
      .withColumn("op", lit("c")).withColumn("__v", lit(1L))
    val ghostIns = negateKey(src.where(pmod(keyCol, lit(9L)) === 0L))
      .withColumn("op", lit("c")).withColumn("__v", lit(1L))
    val ghostDel = negateKey(src.where(pmod(keyCol, lit(9L)) === 0L))
      .withColumn("op", lit("d")).withColumn("__v", lit(2L))
    val ch = fin.unionByName(stale).unionByName(ghostIns).unionByName(ghostDel)
      .withColumn("__b",
        pmod(hash((keyCols.map(col) :+ col("__v")): _*), lit(4)))
    // one file per batch dir → one micro-batch per file below
    ch.repartition(col("__b")).write.mode("overwrite")
      .partitionBy("__b").parquet(chDir)
    val stream = s.readStream.schema(ch.schema)
      .option("maxFilesPerTrigger", "1").parquet(chDir).drop("__b")
    val q = Sinks.foreachBatchUpsert(stream, target, ckpt, keyCols, "__v",
      nBuckets = 8, bucketCols = bucketCols)
    q.awaitTermination()
    Sinks.currentState(s, target).drop("op", "__v")
  }

  /** Orders materialized from its changelog (o_orderkey IS unique in
    * this corpus — the natural CDC key): stale versions shift the order
    * date +500 days (poisons q03's cutoff and q10's window) and remap
    * the priority.
    */
  private def ordersViaCdc(s: SparkSession, dir: String): DataFrame =
    cdcMaterialize(s, dir, "orders", t(s, dir, "orders"),
      Seq("o_orderkey"), Nil,
      col("o_orderkey"),
      negateKey = _.withColumn("o_orderkey", -col("o_orderkey")),
      poison = _.withColumn("o_orderdate",
          col("o_orderdate") + expr("INTERVAL 500 DAYS"))
        .withColumn("o_orderpriority", lit("9-POISON")))

  /** Lineitem materialized from its changelog. This corpus gives
    * lineitem NO unique natural key — (l_orderkey, l_linenumber)
    * repeats (4599 distinct pairs over 6000 rows at sf0.001) though
    * full rows are unique at every SF — so the changelog key is a
    * SURROGATE row id (`xxhash64` of every column, the deterministic
    * stand-in for the upstream PK a real connector would carry). The
    * merge key is (l_orderkey, __rid) while the LAYOUT buckets on
    * l_orderkey alone — the cluster-by-join-key shape the downstream
    * fact join wants. Stale versions shift the ship date −500 days
    * (poisons q03's filter), inflate the discount, and flip the return
    * flag (poisons q10's R-slice) — __rid is computed BEFORE the
    * poison, so the stale row carries its final twin's identity and
    * latest-wins must bury it.
    */
  private def lineitemViaCdc(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
    val keyed = base.withColumn("__rid",
      xxhash64(base.columns.map(col): _*))
    cdcMaterialize(s, dir, "lineitem", keyed,
      Seq("l_orderkey", "__rid"), Seq("l_orderkey"),
      col("l_orderkey"),
      negateKey = _.withColumn("__rid", -col("__rid")),
      poison = _.withColumn("l_shipdate",
          col("l_shipdate") - expr("INTERVAL 500 DAYS"))
        .withColumn("l_discount", col("l_discount") + 0.5d)
        .withColumn("l_returnflag",
          when(col("l_returnflag") === "R", "N").otherwise("R")))
      .drop("__rid")
  }

  /** r20 (guide §2.6): q03/q10_materialized each replay TWO CDC
    * pipelines that are fully independent — orders and lineitem
    * materialize into disjoint temp dirs with their own changelogs,
    * checkpoints and targets, sharing nothing but the session (whose
    * entry points here — Engine.table's ConcurrentHashMap schema memo,
    * per-target Sinks state — are concurrency-safe, the same surface
    * the k21 DriverPool fan-outs already drive in parallel). Ran
    * serially, each pipeline's per-micro-batch commit latency and
    * stage tails left the executors idle; two driver threads let one
    * pipeline's tasks back-fill the other's tail. Results are
    * byte-identical: the same two materialized tables are produced,
    * only the wall-clock interleaving of their jobs changes.
    */
  private def bothViaCdc(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val r = graft.ops.DriverPool.run(
      Seq(() => ordersViaCdc(s, dir), () => lineitemViaCdc(s, dir)),
      parallelism = 2)
    (r(0), r(1))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 shape — min-cost supplier: a 5-table join with a correlated
    // scalar-MIN subquery that itself joins 4 tables. Catalyst must
    // decorrelate the subquery into a grouped aggregate joined back on
    // p_partkey (a per-part re-scan would be quadratic at scale).
    "q02_min_cost_supplier" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 MIN(l_extendedprice / l_quantity) AS ps_supplycost
          FROM lineitem GROUP BY 1, 2)
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand
        FROM part p, supply ps, supplier s, nation n, region r
        WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
          AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'SMALL'
          AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
          AND r.r_name = 'EUROPE'
          AND ps.ps_supplycost = (
            SELECT MIN(ps2.ps_supplycost)
            FROM supply ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey""")
    }),

    // Q2, the MATERIALIZED form — the 100 TB answer to a cost the
    // declarative q02 plan pays: Spark does not materialize CTEs, so
    // decorrelation evaluates the supply aggregate TWICE (two full
    // lineitem agg scans — visible as two HashAggregate subtrees in
    // q02's plan; exchange reuse misses them because the two sides
    // canonicalize differently). Here the EUROPE supply relation is
    // computed ONCE, eagerly materialized, and both the min-cost
    // aggregate and the final join read the materialized result —
    // identical semantics (hash-matched against the SAME oracle),
    // half the lineitem work.
    "q02_min_cost_supplier_mat" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").where(col("r_name") === "EUROPE")
      val p = t(s, dir, "part")
        .where(col("p_size").between(10, 20) && col("p_type") === "SMALL")
      // one supply evaluation, pre-joined to the EUROPE supplier side
      val supply = l.groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
        .join(broadcast(sup), col("ps_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("ps_partkey"), col("ps_supplycost"),
          col("s_acctbal"), col("s_name"), col("n_name"))
        .localCheckpoint(true) // both consumers below read THIS, not lineitem
      val minCost = supply.groupBy(col("ps_partkey"))
        .agg(min(col("ps_supplycost")).as("__min_cost"))
      supply.join(minCost.withColumnRenamed("ps_partkey", "__mp"),
          col("ps_partkey") === col("__mp") &&
            col("ps_supplycost") === col("__min_cost"))
        .join(broadcast(p), col("ps_partkey") === p("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
    }),

    // Q3 shape — shipping priority: segment-filtered customer ⋈ orders ⋈
    // lineitem, grouped revenue, top-10. DataFrame surface: the dims
    // prune BEFORE the fact shuffle and the limit rides a TakeOrdered.
    "q03_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q3 over CDC-MATERIALIZED tables (r18, the r17 verdict's top_next):
    // orders and lineitem arrive as adversarial changelogs (stale
    // versions, out-of-order ghost inserts/deletes — see cdcMaterialize)
    // through the A8 bucketed upsert sink, and THE SAME q03 runs over
    // the materialized state — hash-matched against the SAME oracle.
    // Seventeen rounds of CDC machinery and the gauntlet composed into
    // one end-to-end proof: reporting over changelog-materialized state,
    // the reference platform's consumer story.
    "q03_materialized" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val (oMat, lMat) = bothViaCdc(s, dir)
      val o = oMat
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = lMat
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q10 over CDC-MATERIALIZED tables — the q03_materialized recipe on
    // the returned-items shape (the poisoned stale versions flip
    // l_returnflag, so a single lost merge changes this answer).
    "q10_materialized" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val (oMat, lMat) = bothViaCdc(s, dir)
      val o = oMat.where(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = lMat.where(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q10 shape — returned-item reporting: 4-table join (fact ⋈ orders ⋈
    // customer ⋈ broadcast nation) over a date window, top-20 by lost
    // revenue.
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q17 shape — small-quantity order revenue: fact ⋈ part with a
    // correlated scalar-AVG subquery over the fact itself. The
    // decorrelated form is a per-part average joined back — one extra
    // keyed shuffle, never a per-row rescan.
    "q17_small_qty_avg" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem l, part p
        WHERE p.p_partkey = l.l_partkey
          AND p.p_brand = 'Brand#23' AND p.p_type = 'PROMO'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)""")
    }),

    // Q20 shape — suppliers with excess stock of named parts: IN over a
    // grouped CTE, nested IN over part, and a correlated scalar-SUM over
    // a date-windowed fact slice — three decorrelation sites in one
    // predicate tree.
    "q20_part_supp_exists" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 SUM(l_quantity) AS ps_availqty
          FROM lineitem GROUP BY 1, 2)
        SELECT s.s_name, s.s_acctbal
        FROM supplier s, nation n
        WHERE s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM supply ps
            WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE 'red%')
              AND ps.ps_availqty > (
                SELECT 0.5 * SUM(l.l_quantity) FROM lineitem l
                WHERE l.l_partkey = ps.ps_partkey
                  AND l.l_suppkey = ps.ps_suppkey
                  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
          AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
        ORDER BY s.s_name""")
    }),

    // Q1 shape — pricing summary: the full scan-agg report with four
    // decimal sums and three derived means per (flag, status) cell.
    "q01_pricing_summary" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      val disc = col("l_extendedprice") * (lit(1.0d) - col("l_discount"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(disc).as("sum_disc_price"),
          dsum(disc * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).cast("double").as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).cast("double").as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).cast("double").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q4 shape — order-priority checking: EXISTS over the fact under a
    // date window (semi-join decorrelation with a non-equi residual).
    "q04_order_priority" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // Q6 shape — forecasting revenue change: the pure pushed-predicate
    // scan-agg (every filter must reach the parquet scan).
    "q06_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05d, 0.07d) && col("l_quantity") < 24d)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    // Q9 shape — product-type profit: 6-way join where the fact joins
    // the derived supply relation on BOTH its keys, profit grouped by
    // nation and derived year.
    "q09_product_profit" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 MIN(l_extendedprice) * 0.1 AS ps_supplycost
          FROM lineitem GROUP BY 1, 2)
        SELECT nation, o_year,
          CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM (SELECT n.n_name AS nation,
                     CAST(year(o.o_orderdate) AS INT) AS o_year,
                     l.l_extendedprice * (1.0 - l.l_discount)
                       - ps.ps_supplycost * l.l_quantity AS amount
              FROM part p, supplier s, lineitem l, supply ps, orders o, nation n
              WHERE s.s_suppkey = l.l_suppkey AND ps.ps_suppkey = l.l_suppkey
                AND ps.ps_partkey = l.l_partkey AND p.p_partkey = l.l_partkey
                AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
                AND p.p_name LIKE '%red%') profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC""")
    }),

    // Q12 shape — shipping-lag priority split: join + conditional count
    // pair per class ("ship mode" adapted to l_linestatus; the corpus
    // carries no shipmode/commit/receipt columns).
    "q12_ship_priority_split" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT l_linestatus AS ship_class,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAYS
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus ORDER BY l_linestatus""")
    }),

    // Q13 shape — customer order-count distribution: LEFT OUTER join
    // with an extra ON-clause predicate, then a second aggregation over
    // the first's result (the histogram-of-groups class).
    "q13_customer_distribution" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT OUTER JOIN orders o
                ON c.c_custkey = o.o_custkey
                   AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
    }),

    // Q14 shape — promotion effect: a conditional-revenue percentage
    // over one month (both sums decimal-exact, ratio deterministic).
    "q14_promo_effect" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
                ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""")
    }),

    // Q15 shape — top supplier: a derived revenue view joined against
    // its own MAX through a scalar subquery (equality on the exact
    // decimal-derived double is deterministic on both engines).
    "q15_top_supplier" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s, revenue r
        WHERE s.s_suppkey = r.supplier_no
          AND r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey""")
    }),

    // Q5 shape — local-supplier volume: the classic 6-table star join
    // with the extra customer-nation = supplier-nation equality, on the
    // DataFrame surface (small dims broadcast; the two fact-side joins
    // shuffle on their keys).
    "q05_local_supplier_volume" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .where(r("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q7 shape — volume shipping between a nation PAIR: two aliases of
    // the same dimension under a disjunctive pair predicate, grouped by
    // derived year.
    "q07_volume_shipping" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l.l_shipdate) AS INT) AS l_year,
                     l.l_extendedprice * (1.0 - l.l_discount) AS volume
              FROM supplier s, lineitem l, orders o, customer c,
                   nation n1, nation n2
              WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
                AND c.c_custkey = o.o_custkey
                AND s.s_nationkey = n1.n_nationkey
                AND c.c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                     AND TIMESTAMP '1997-12-31 00:00:00') shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    }),

    // Q8 shape — market share: a conditional-sum / total-sum ratio per
    // year over a 7-table join (both sums decimal-exact, so the double
    // ratio is deterministic).
    "q08_market_share" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT o_year,
          CAST(CAST(SUM(CASE WHEN nation = 'NATION_3'
                             THEN CAST(volume AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM (SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                     l.l_extendedprice * (1.0 - l.l_discount) AS volume,
                     n2.n_name AS nation
              FROM part p, supplier s, lineitem l, orders o, customer c,
                   nation n1, nation n2, region r
              WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
                AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
                AND c.c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
                AND s.s_nationkey = n2.n_nationkey
                AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                      AND TIMESTAMP '1997-12-31 00:00:00'
                AND p.p_type = 'ECONOMY') all_nations
        GROUP BY o_year ORDER BY o_year""")
    }),

    // Q11 shape — important stock: grouped value vs a scalar-aggregate
    // subquery over the SAME derived relation (the HAVING-against-
    // global-aggregate decorrelation class). TPC-H's SUM*fraction cutoff
    // is scale-dependent (0 rows at 10x the parts); 3x the per-part mean
    // keeps the identical plan shape and returns rows at every SF.
    "q11_important_stock" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 SUM(l_quantity) AS ps_availqty,
                 MIN(l_extendedprice / l_quantity) AS ps_supplycost
          FROM lineitem GROUP BY 1, 2),
        grouped AS (
          SELECT ps.ps_partkey,
            CAST(SUM(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,6))) AS DOUBLE) AS value
          FROM supply ps, supplier s, nation n
          WHERE ps.ps_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
            AND n.n_name = 'NATION_7'
          GROUP BY ps.ps_partkey)
        SELECT ps_partkey, value FROM grouped
        WHERE value > (
          SELECT 3.0 * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
          FROM grouped)
        ORDER BY value DESC, ps_partkey""")
    }),

    // Q11, the MATERIALIZED form (r18 — the r17 verdict's #2): Spark
    // inlines CTEs, so q11's `grouped` relation (a full lineitem agg +
    // two dim joins) is evaluated TWICE — once for the main SELECT, once
    // inside the scalar-AVG threshold subquery — two complete fact
    // aggregations for one answer. Here `grouped` is computed ONCE and
    // eagerly materialized; the threshold is a 1-row aggregate OF the
    // materialized relation, joined back by broadcast. Identical
    // semantics (hash-matched against the SAME oracle), half the
    // lineitem work — the q02_mat recipe applied to the
    // HAVING-against-global-aggregate class.
    "q11_important_stock_mat" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation").where(col("n_name") === "NATION_7")
      val supply = l.groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(sum(col("l_quantity")).as("ps_availqty"),
          min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val grouped = supply
        .join(broadcast(sup), col("ps_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("ps_partkey"))
        .agg(dsum(col("ps_supplycost") * col("ps_availqty")).as("value"))
        .localCheckpoint(true) // both consumers below read THIS, not lineitem
      val thr = grouped.agg(
        (lit(3.0d) * dsum(col("value")) / count(lit(1)))
          .cast("double").as("__thr"))
      grouped.join(broadcast(thr), col("value") > col("__thr"))
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q15, the MATERIALIZED form (r18): the `revenue` view is evaluated
    // twice in the declarative q15 (FROM clause + the scalar MAX
    // subquery) — two date-windowed fact aggregations. Materialize it
    // once; the MAX is a 1-row aggregate of the materialized relation.
    "q15_top_supplier_mat" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val revenue = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .as("total_revenue"))
        .localCheckpoint(true)
      val best = revenue.agg(max(col("total_revenue")).as("__max"))
      revenue.join(broadcast(best), col("total_revenue") === col("__max"))
        .join(broadcast(sup), col("supplier_no") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16 shape — supplier-count by part attributes: COUNT(DISTINCT)
    // under a NOT IN subquery (anti-join decorrelation on a dimension).
    "q16_supplier_count" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        WITH supply AS (
          SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem)
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
        FROM supply ps, part p
        WHERE p.p_partkey = ps.ps_partkey AND p.p_brand <> 'Brand#45'
          AND p.p_type <> 'SMALL'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 500)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""")
    }),

    // Q18 shape — large-volume customers: IN over a GROUP BY ... HAVING
    // subquery on the fact itself, re-joined and re-aggregated.
    "q18_large_volume_customer" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        FROM customer c, orders o, lineitem l
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING SUM(l_quantity) > 180)
          AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""")
    }),

    // Q18 under SKEW (r18 — the r17 verdict's #7): the gauntlet's
    // uniform TPC-H keys never stress the skew machinery, but 100×
    // clusters see hot keys constantly. Here 40% of the fact collapses
    // onto ONE order key (the hot-order shape), and the fact ⋈ orders
    // join routes through [[graft.ops.Skew.autoSaltedJoinApprox]]: the
    // Misra–Gries sketch detects the hot key in one narrow pass, the hot
    // slice salts across 8 shards, the cold slice joins plain, and the
    // composed customer leg + per-(segment, priority) aggregate runs on
    // the union. Routing is semantics-free — the result hash-matches the
    // PLAIN join's oracle on the same skewed data.
    "q18_skewed" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(
          when(pmod(col("l_orderkey"), lit(5L)) < 2L, lit(1L))
            .otherwise(col("l_orderkey")).as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.ops.Skew.autoSaltedJoinApprox(l, o, "o_orderkey",
          sketchK = 64, hotThreshold = 2000L, saltFactor = 8)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))
    }),

    // Q19 shape — discounted revenue under DISJUNCTIVE bracket
    // predicates: Catalyst must factor the common equi-condition out of
    // the OR into the join key (a nested-loop fallback would be
    // quadratic; GauntletSpec pins the no-BNLJ posture).
    "q19_disjunctive_brackets" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem l, part p
        WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
               AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
               AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#34'
               AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)""")
    }),

    // Q22 shape — global-acquisition opportunity: an uncorrelated
    // scalar-aggregate subquery (deterministic decimal-sum mean) AND a
    // NOT EXISTS anti-join in one predicate tree ("no urgent order"
    // adapts the original's no-order clause to this corpus, where every
    // customer has orders).
    "q22_global_sales_opportunity" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT cntrycode, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        FROM (SELECT c_custkey % 10 AS cntrycode, c_acctbal FROM customer
              WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
                AND c_acctbal > (
                  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                  FROM customer
                  WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
                AND NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c_custkey
                                  AND o.o_orderpriority = '1-URGENT')) custsale
        GROUP BY cntrycode ORDER BY cntrycode""")
    }),

    // Q21, the SINGLE-PASS form — the declarative q21's EXISTS + NOT
    // EXISTS decorrelate into a semi- and an anti-join that each rescan
    // lineitem (three fact passes total). The set-algebra rewrite reads
    // the fact ONCE: per (order, supplier) late-line counts, then one
    // order-partitioned window derives "another supplier exists" and
    // "no OTHER supplier is late" (late-supplier count = 1 AND this
    // supplier is late ⟺ L = {s}). Identical semantics — hash-matched
    // against the SAME oracle — with one lineitem scan and three keyed
    // shuffles instead of three scans.
    "q21_late_supplier_1pass" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val perSupp = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(col("late")).as("late_lines"))
      val w = Window.partitionBy(col("l_orderkey"))
      val qualified = perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late_supp",
          sum((col("late_lines") > 0).cast("int")).over(w))
        .where(col("late_lines") > 0 && col("n_supp") >= 2 &&
          col("n_late_supp") === 1)
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation").where(col("n_name") === "NATION_5")
      qualified.join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("late_lines")).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // Q21 shape — suppliers who kept multi-supplier orders waiting:
    // EXISTS + NOT EXISTS against the self-joined fact under a 4-table
    // join ("late" adapted to ship-lag, see header). The two correlated
    // subqueries decorrelate into semi/anti joins on l_orderkey.
    "q21_late_supplier" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s, lineitem l1, orders o, nation n
        WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
          AND o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                          WHERE o3.o_orderkey = l3.l_orderkey
                            AND l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAYS)
          AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name""")
    }))

  private def q02Oracle: String =
    """WITH supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand
      |FROM part p, supply ps, supplier s, nation n, region r
      |WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
      |  AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'SMALL'
      |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'EUROPE'
      |  AND ps.ps_supplycost = (
      |    SELECT MIN(ps2.ps_supplycost)
      |    FROM supply ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.ps_partkey = p.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey""".stripMargin

  val oracle: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q09_product_profit" ->
      """WITH supply AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(l_extendedprice) * 0.1 AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT nation, o_year,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM (SELECT n.n_name AS nation,
        |             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |             l.l_extendedprice * (1.0 - l.l_discount)
        |               - ps.ps_supplycost * l.l_quantity AS amount
        |      FROM part p, supplier s, lineitem l, supply ps, orders o, nation n
        |      WHERE s.s_suppkey = l.l_suppkey AND ps.ps_suppkey = l.l_suppkey
        |        AND ps.ps_partkey = l.l_partkey AND p.p_partkey = l.l_partkey
        |        AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
        |        AND p.p_name LIKE '%red%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    "q12_ship_priority_split" ->
      """SELECT l_linestatus AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |      FROM customer c LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |           AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_effect" ->
      """SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |        ELSE 0 END) AS DOUBLE)
        |     / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        |     AS DOUBLE) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,

    "q15_top_supplier" -> q15Oracle,

    // identical semantics, materialized evaluation — same oracle
    "q15_top_supplier_mat" -> q15Oracle,

    "q05_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q07_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |             l.l_extendedprice * (1.0 - l.l_discount) AS volume
        |      FROM supplier s, lineitem l, orders o, customer c,
        |           nation n1, nation n2
        |      WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        |        AND c.c_custkey = o.o_custkey
        |        AND s.s_nationkey = n1.n_nationkey
        |        AND c.c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                             AND TIMESTAMP '1997-12-31 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q08_market_share" ->
      """SELECT o_year,
        |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3'
        |                     THEN CAST(volume AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
        |     / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |             l.l_extendedprice * (1.0 - l.l_discount) AS volume,
        |             n2.n_name AS nation
        |      FROM part p, supplier s, lineitem l, orders o, customer c,
        |           nation n1, nation n2, region r
        |      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |        AND c.c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        |        AND s.s_nationkey = n2.n_nationkey
        |        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                              AND TIMESTAMP '1997-12-31 00:00:00'
        |        AND p.p_type = 'ECONOMY') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q11_important_stock" -> q11Oracle,

    // identical semantics, materialized evaluation — same oracle
    "q11_important_stock_mat" -> q11Oracle,

    "q16_supplier_count" ->
      """WITH supply AS (
        |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |  FROM lineitem)
        |SELECT p.p_brand, p.p_type, p.p_size,
        |       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
        |FROM supply ps, part p
        |WHERE p.p_partkey = ps.ps_partkey AND p.p_brand <> 'Brand#45'
        |  AND p.p_type <> 'SMALL'
        |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                            WHERE s_acctbal < 500)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin,

    "q18_large_volume_customer" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       o.o_totalprice,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        |FROM customer c, orders o, lineitem l
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                       GROUP BY l_orderkey
        |                       HAVING SUM(l_quantity) > 180)
        |  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |         o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin,

    // the skew twin's oracle is the PLAIN join over the same skewed key
    "q18_skewed" ->
      """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM (SELECT CASE WHEN l_orderkey % 5 < 2 THEN 1 ELSE l_orderkey END AS o_orderkey,
        |             l_extendedprice, l_discount FROM lineitem) l
        |JOIN orders o ON l.o_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q19_disjunctive_brackets" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
        |       AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
        |       AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#34'
        |       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_global_sales_opportunity" ->
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM (SELECT c_custkey % 10 AS cntrycode, c_acctbal FROM customer
        |      WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        |        AND c_acctbal > (
        |          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |          FROM customer
        |          WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
        |        AND NOT EXISTS (SELECT 1 FROM orders o
        |                        WHERE o.o_custkey = c_custkey
        |                          AND o.o_orderpriority = '1-URGENT')) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,

    "q02_min_cost_supplier" -> q02Oracle,

    // identical semantics, materialized evaluation — same oracle
    "q02_min_cost_supplier_mat" -> q02Oracle,


    "q03_shipping_priority" -> q03Oracle,

    // identical semantics over the CDC-materialized tables — same oracle
    "q03_materialized" -> q03Oracle,

    "q10_returned_items" -> q10Oracle,

    // identical semantics over the CDC-materialized tables — same oracle
    "q10_materialized" -> q10Oracle,

    "q17_small_qty_avg" ->
      """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |            / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem l, part p
        |WHERE p.p_partkey = l.l_partkey
        |  AND p.p_brand = 'Brand#23' AND p.p_type = 'PROMO'
        |  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = p.p_partkey)""".stripMargin,

    "q20_part_supp_exists" ->
      """WITH supply AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         SUM(l_quantity) AS ps_availqty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s.s_name, s.s_acctbal
        |FROM supplier s, nation n
        |WHERE s.s_suppkey IN (
        |    SELECT ps.ps_suppkey FROM supply ps
        |    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
        |                            WHERE p_name LIKE 'red%')
        |      AND ps.ps_availqty > (
        |        SELECT 0.5 * SUM(l.l_quantity) FROM lineitem l
        |        WHERE l.l_partkey = ps.ps_partkey
        |          AND l.l_suppkey = ps.ps_suppkey
        |          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |  AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
        |ORDER BY s.s_name""".stripMargin,

    // identical semantics, single-pass evaluation — same oracle
    "q21_late_supplier_1pass" -> q21Oracle,

    "q21_late_supplier" -> q21Oracle)

  private def q03Oracle: String =
    """SELECT l.l_orderkey,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  o.o_orderdate
      |FROM customer c, orders o, lineitem l
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin

  private def q10Oracle: String =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  c.c_acctbal, n.n_name
      |FROM customer c, orders o, lineitem l, nation n
      |WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
      |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin

  private def q11Oracle: String =
    """WITH supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         SUM(l_quantity) AS ps_availqty,
      |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2),
      |grouped AS (
      |  SELECT ps.ps_partkey,
      |    CAST(SUM(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,6))) AS DOUBLE) AS value
      |  FROM supply ps, supplier s, nation n
      |  WHERE ps.ps_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
      |    AND n.n_name = 'NATION_7'
      |  GROUP BY ps.ps_partkey)
      |SELECT ps_partkey, value FROM grouped
      |WHERE value > (
      |  SELECT 3.0 * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      |  FROM grouped)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  private def q15Oracle: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.total_revenue
      |FROM supplier s, revenue r
      |WHERE s.s_suppkey = r.supplier_no
      |  AND r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s.s_suppkey""".stripMargin

  private def q21Oracle: String =
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s, lineitem l1, orders o, nation n
        |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
        |                  WHERE o3.o_orderkey = l3.l_orderkey
        |                    AND l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |  AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name""".stripMargin
}

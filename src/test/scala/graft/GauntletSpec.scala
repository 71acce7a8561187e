package graft

import org.scalatest.funsuite.AnyFunSuite

/** The composed-query gauntlet's PLAN contract (r17 — the r16 verdict's
  * #1): deep multi-join + nested-subquery queries must decorrelate and
  * keep the repo's scale posture. The blanket ScalePostureSpec pass
  * already forbids BNLJ/single-partition surprises; this spec pins the
  * properties specific to subquery composition:
  *   - every correlated subquery is DECORRELATED into an aggregate +
  *     semi/anti/equi join (never a per-row re-scan — Spark would plan
  *     an un-decorrelatable subquery as a BNLJ or refuse outright);
  *   - the selective dimension filters reach the parquet scans
  *     (pushdown survives the composed plan);
  *   - results stay correct when AQE re-plans at runtime (the queries
  *     execute under the tuned session and return the oracle-matched
  *     row counts — the value-level contract lives in the driver gate).
  */
class GauntletSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val gauntlet = Seq(
    "q01_pricing_summary", "q02_min_cost_supplier", "q03_shipping_priority",
    "q04_order_priority", "q05_local_supplier_volume", "q06_forecast_revenue",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_ship_priority_split",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_count", "q17_small_qty_avg", "q18_large_volume_customer",
    "q19_disjunctive_brackets", "q20_part_supp_exists", "q21_late_supplier",
    "q22_global_sales_opportunity")

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.executedPlan.toString
  }

  test("gauntlet plans carry no nested-loop or cartesian fallback") {
    for (n <- gauntlet) {
      val p = planOf(n)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n plans a BNLJ:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
  }

  test("correlated subqueries decorrelate into joins, not per-row rescans") {
    // q20's IN + correlated SUM → LeftSemi; q21's EXISTS/NOT EXISTS →
    // LeftSemi + LeftAnti. If Catalyst ever stopped decorrelating these
    // the join types would disappear (replaced by a BNLJ the first test
    // catches, or an InSubqueryExec per-row probe).
    val p20 = planOf("q20_part_supp_exists")
    assert(p20.contains("LeftSemi"), s"q20 lost its semi-join form:\n$p20")
    val p21 = planOf("q21_late_supplier")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"q21 lost its semi/anti-join form:\n$p21")
    // q02's scalar-MIN and q17's scalar-AVG decorrelate into grouped
    // aggregates joined back on the correlation key — the plan must
    // contain the min/avg aggregate, and no per-row scalar-subquery
    // execution node
    val p02 = planOf("q02_min_cost_supplier")
    assert(p02.contains("partial_min"), s"q02 lost the decorrelated min agg:\n$p02")
    val p17 = planOf("q17_small_qty_avg")
    assert(p17.contains("partial_avg"), s"q17 lost the decorrelated avg agg:\n$p17")
    for ((n, p) <- Seq("q02" -> p02, "q17" -> p17))
      assert(!p.contains("ScalarSubquery"),
        s"$n still evaluates a scalar subquery per-row:\n$p")
    // r17 breadth set: q18's IN-over-HAVING → LeftSemi; q16's NOT IN →
    // a null-aware anti join that must still be a HASH join (the NAAJ
    // BNLJ fallback would be quadratic); q22's NOT EXISTS → LeftAnti
    val p18 = planOf("q18_large_volume_customer")
    assert(p18.contains("LeftSemi"), s"q18 lost its semi-join form:\n$p18")
    val p16 = planOf("q16_supplier_count")
    assert(p16.contains("LeftAnti"), s"q16 lost its anti-join form:\n$p16")
    val p22 = planOf("q22_global_sales_opportunity")
    assert(p22.contains("LeftAnti"), s"q22 lost its anti-join form:\n$p22")
  }

  test("selective dim filters reach the parquet scans under composition") {
    // q02: the part filter (p_size range + p_type) must be IN the scan,
    // not applied post-join — at 100 TB the difference is reading 2000
    // parts vs every part row
    val p02 = planOf("q02_min_cost_supplier")
    assert(p02.contains("PushedFilters: [IsNotNull(p_size)") ||
      p02.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(p_size,10\\).*"),
      s"q02 part filter not pushed to scan:\n$p02")
    // q10: the date-window filter must reach the orders scan
    val p10 = planOf("q10_returned_items")
    assert(p10.matches("(?s).*PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*\\].*"),
      s"q10 order-date window not pushed to scan:\n$p10")
  }

  test("the gauntlet's fact-fact join runs exchange-free over bucketed layout, same answer") {
    import org.apache.spark.sql.functions._
    // Q3's lineitem ⋈ orders is THE shuffle at 100 TB; pre-bucketing
    // both sides on the order key removes it (the layout answer for a
    // fact pair joined every hour), and the layout must never change
    // the answer.
    val li = graft.core.Engine.table(spark, TestSpark.sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val o = graft.core.Engine.table(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("g_li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("g_o_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cut = lit("1998-01-01").cast("timestamp")
      val joined = spark.table("g_li_bucketed").where(col("l_shipdate") > cut)
        .join(spark.table("g_o_bucketed").where(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
        "the co-located fact join must not shuffle")
      // compose the rest of Q3 on top (customer leg broadcast by hint)
      val c = graft.core.Engine.table(spark, TestSpark.sf, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      val viaBuckets = joined
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
        .collect().toSeq
      val plain = SparkEntry.queries("q03_shipping_priority")(
        spark, TestSpark.sf).collect().toSeq
      assert(viaBuckets === plain, "layout must never change the answer")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS g_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_o_bucketed")
    }
  }

  test("CDC-fed clustered tables run the whole q03 with ZERO shuffle exchanges, same answer") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Sinks
    // the r17 test above proves the bucketed LAYOUT removes the fact
    // shuffle for a batch write; this one feeds the SAME layout by CDC:
    // three changelog batches per table (a poisoned stale slice at v1,
    // ghost churn at v1/v2, the final state at v3) merge through the
    // clustered upsert sink into catalog tables partitioned by __kb and
    // BUCKETED by the join key — and q03 composed over the maintained
    // tables plans zero shuffle exchanges end-to-end.
    val liT = "g_li_cdc"; val oT = "g_o_cdc"
    spark.sql(s"DROP TABLE IF EXISTS $liT")
    spark.sql(s"DROP TABLE IF EXISTS $oT")
    // lineitem has no unique natural key in this corpus (linenumbers
    // repeat per order) — the changelog keys on a surrogate row hash,
    // exactly as the contract query's lineitemViaCdc does
    val liBase = graft.core.Engine.table(spark, TestSpark.sf, "lineitem")
    val li = liBase.withColumn("__rid", xxhash64(liBase.columns.map(col): _*))
      .select(col("l_orderkey"), col("__rid"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val o = graft.core.Engine.table(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"))
    def feed(src: org.apache.spark.sql.DataFrame, table: String,
             keyCols: Seq[String], bucketCols: Seq[String],
             keyCol: org.apache.spark.sql.Column,
             poison: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
             negate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      def apply(b: org.apache.spark.sql.DataFrame) =
        Sinks.applyUpsertBatchClustered(b, table, keyCols, "__v",
          bucketCols, nBuckets = 8, nKbParts = 4)
      // batch 1: stale poisoned slice; batch 2: ghost insert + delete
      // (same batch, order-free); batch 3: the final state
      apply(poison(src.where(pmod(keyCol, lit(7L)) === 0L))
        .withColumn("op", lit("c")).withColumn("__v", lit(1L)))
      apply(negate(src.where(pmod(keyCol, lit(9L)) === 0L))
        .withColumn("op", lit("c")).withColumn("__v", lit(1L))
        .unionByName(negate(src.where(pmod(keyCol, lit(9L)) === 0L))
          .withColumn("op", lit("d")).withColumn("__v", lit(2L))))
      apply(src.withColumn("op", lit("u")).withColumn("__v", lit(3L)))
    }
    feed(li, liT, Seq("l_orderkey", "__rid"), Seq("l_orderkey"),
      col("l_orderkey"),
      poison = _.withColumn("l_discount", col("l_discount") + 0.5d),
      negate = _.withColumn("__rid", -col("__rid")))
    feed(o, oT, Seq("o_orderkey"), Seq("o_orderkey"), col("o_orderkey"),
      poison = _.withColumn("o_orderdate",
        col("o_orderdate") + expr("INTERVAL 500 DAYS")),
      negate = _.withColumn("o_orderkey", -col("o_orderkey")))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cut = lit("1998-01-01").cast("timestamp")
      val lCur = Sinks.currentStateClustered(spark, liT).drop("__v", "__rid")
      val oCur = Sinks.currentStateClustered(spark, oT).drop("__v")
      val joined = lCur.where(col("l_shipdate") > cut)
        .join(oCur.where(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
        "the CDC-maintained clustered fact join must not shuffle")
      val c = graft.core.Engine.table(spark, TestSpark.sf, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      val viaCdc = joined
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      // the FULL composed query: the only exchange is the broadcast of
      // the customer dim — no shuffle anywhere (the bucketed join's
      // HashPartitioning(l_orderkey) also satisfies the groupBy)
      val full = viaCdc.queryExecution.executedPlan.toString
      assert(!full.contains("Exchange hashpartitioning"),
        s"q03 over clustered CDC tables must plan zero shuffles:\n$full")
      val plain = SparkEntry.queries("q03_shipping_priority")(
        spark, TestSpark.sf).collect().toSeq
      assert(viaCdc.collect().toSeq === plain,
        "the CDC-maintained layout must never change the answer")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $liT")
      spark.sql(s"DROP TABLE IF EXISTS $oT")
    }
  }

  test("the CDC-materialized q03/q10 equal their base-table twins") {
    for ((matN, plainN) <- Seq(
        "q03_materialized" -> "q03_shipping_priority",
        "q10_materialized" -> "q10_returned_items")) {
      val plain = SparkEntry.queries(plainN)(spark, TestSpark.sf).collect().toSeq
      val mat = SparkEntry.queries(matN)(spark, TestSpark.sf).collect().toSeq
      assert(mat === plain,
        s"$matN (adversarial changelog replay) must equal $plainN")
    }
  }

  test("the materialized q02 equals the declarative q02 (one supply scan, same rows)") {
    // Spark evaluates q02's supply CTE twice (decorrelation duplicates
    // the subtree); the _mat variant materializes it once. Same rows is
    // the law — the cost difference is the bench's to report.
    val plain = SparkEntry.queries("q02_min_cost_supplier")(
      spark, TestSpark.sf).collect().toSeq
    val mat = SparkEntry.queries("q02_min_cost_supplier_mat")(
      spark, TestSpark.sf).collect().toSeq
    assert(mat === plain)
  }

  test("the single-pass q21 equals the declarative q21 (one fact scan, same rows)") {
    // q21's EXISTS/NOT-EXISTS decorrelation rescans lineitem twice more;
    // the 1pass set-algebra rewrite (per-(order,supplier) late counts +
    // one order window) must agree row-for-row, and its plan must read
    // the fact exactly ONCE.
    val plain = SparkEntry.queries("q21_late_supplier")(
      spark, TestSpark.sf).collect().toSeq
    val onePass = SparkEntry.queries("q21_late_supplier_1pass")(
      spark, TestSpark.sf)
    assert(onePass.collect().toSeq === plain)
    val factScans = "FileScan parquet \\[l_orderkey".r
      .findAllIn(onePass.queryExecution.executedPlan.toString).size
    assert(factScans === 1,
      s"the 1pass form must scan lineitem exactly once, found $factScans")
  }

  test("the materialized q11/q15 equal their declarative twins and never rescan the fact") {
    // Spark evaluates q11's `grouped` CTE twice (main SELECT + the
    // scalar-AVG threshold) and q15's `revenue` view twice (FROM + the
    // scalar MAX) — two full fact aggregations each. The _mat twins
    // checkpoint the shared relation ONCE; their final plans must read
    // the materialized RDD, never lineitem.
    for ((plainN, matN) <- Seq(
        "q11_important_stock" -> "q11_important_stock_mat",
        "q15_top_supplier" -> "q15_top_supplier_mat")) {
      val plain = SparkEntry.queries(plainN)(spark, TestSpark.sf).collect().toSeq
      val mat = SparkEntry.queries(matN)(spark, TestSpark.sf)
      assert(mat.collect().toSeq === plain, s"$matN must equal $plainN")
      val p = mat.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan parquet [l_"),
        s"$matN's final plan must read the checkpointed relation, not lineitem:\n$p")
      assert(p.contains("ExistingRDD"),
        s"$matN's final plan must consume the materialized relation:\n$p")
    }
  }

  test("the skew-composed q18 routes the hot key through the salted path, same answer") {
    import org.apache.spark.sql.functions._
    // 40% of the fact collapses onto order key 1 (2400 of 6000 rows at
    // sf0.001 — well past the 2000 hot threshold even after the MG
    // sketch's N/(k+1) ≈ 92 undershoot), so the plan MUST carry the
    // salted hot route; and routing must never change the answer.
    val df = SparkEntry.queries("q18_skewed")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("__salt"),
      s"the hot slice must join on (key, salt):\n$p")
    assert(p.contains("Union"), s"hot and cold routes must union:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"no quadratic fallback:\n$p")
    // the plain join over the same skewed key is the law
    val l = graft.core.Engine.table(spark, TestSpark.sf, "lineitem")
      .select(
        when(pmod(col("l_orderkey"), lit(5L)) < 2L, lit(1L))
          .otherwise(col("l_orderkey")).as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val o = graft.core.Engine.table(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val c = graft.core.Engine.table(spark, TestSpark.sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = l.join(o, Seq("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
      .collect().toSeq
    assert(df.collect().toSeq === plain, "routing must never change the answer")
  }

  test("gauntlet executes correctly under AQE (row counts)") {
    val expected = Map(
      // sf0.001 row counts, cross-checked against the same SQL in DuckDB
      "q03_shipping_priority" -> 10L, "q17_small_qty_avg" -> 1L)
    for ((n, want) <- expected) {
      val got = SparkEntry.queries(n)(spark, TestSpark.sf).count()
      assert(got == want, s"$n returned $got rows, expected $want")
    }
    // the remaining queries' exact values are driver-gate-verified at
    // sf0.01/sf0.1; here just prove they execute end-to-end
    for (n <- gauntlet diff expected.keys.toSeq)
      SparkEntry.queries(n)(spark, TestSpark.sf).collect()
  }
}

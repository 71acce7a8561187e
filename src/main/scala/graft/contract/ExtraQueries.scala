package graft.contract

import graft.core.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional §2 probes: null-safe comparison and RLIKE (C3), second wave
  * of string/date built-ins (H1/H2), higher statistical moments (E2), and
  * the skew-salted join (the deterministic answer to hot keys at scale).
  */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C3 — null-safe equality + regex predicate
    "c3_nullsafe_rlike" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          col("lang") <=> "en" as "is_en_ns",
          col("text").rlike("sp[ae]rk") as "has_sparkish",
          nullif(col("lang"), lit("zh")).isNull.as("zh_nulled"))
        .orderBy(col("doc_id"))
    }),

    // H1/H2/F — third wave: initcap/overlay/split_part, fractional
    // months_between + next_day, nth_value + cume_dist windows
    "h1_string_funcs3" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .select(col("doc_id"),
          initcap(col("lang")).as("lang_cap"),
          expr("overlay(lang PLACING 'XX' FROM 2 FOR 1)").as("ov"),
          expr("split_part(concat_ws('|', lang, source), '|', 2)").as("src_part"))
        .orderBy(col("doc_id"))
    }),

    "h2_datetime_funcs3" -> ((s, dir) => {
      t(s, dir, "orders").where(col("o_orderkey") < 2000L)
        .select(col("o_orderkey"),
          months_between(date_trunc("month", col("o_orderdate")),
            lit("1995-01-01").cast("date")).as("mb"),
          date_format(next_day(col("o_orderdate"), "Mon"), "yyyy-MM-dd").as("next_mon"))
        .orderBy(col("o_orderkey"))
    }),

    "f1_rank2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").where(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_key"))
        .orderBy(col("o_orderkey"))
    }),

    // H1 — second string wave: printf-style, left/right, prefix join
    "h1_string_funcs2" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .select(col("doc_id"),
          format_string("%s-%03d", col("lang"), pmod(col("doc_id"), lit(100L))).as("fmt"),
          expr("left(text, 10)").as("l10"),
          expr("right(lang, 1)").as("r1"),
          substring_index(col("text"), " ", 3).as("first3_words"),
          ascii(col("lang")).as("first_cp"),
          expr("char(65 + CAST(doc_id % 26 AS INT))").as("letter"))
        .orderBy(col("doc_id"))
    }),

    // H2 — second date wave: make_date / from_unixtime / weekofyear
    "h2_datetime_funcs2" -> ((s, dir) => {
      t(s, dir, "orders").where(col("o_orderkey") < 2000L)
        .select(col("o_orderkey"),
          date_format(make_date(lit(2024), month(col("o_orderdate")),
            lit(1)), "yyyy-MM-dd").as("normalized_month"),
          from_unixtime(unix_timestamp(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("rendered"),
          weekofyear(col("o_orderdate")).as("woy"),
          dayofyear(col("o_orderdate")).as("doy"))
        .orderBy(col("o_orderkey"))
    }),

    // E2 — higher moments: skewness/kurtosis/covar_samp (Spark population
    // skew/kurt reproduced from raw moments in the oracle)
    "e2_stats_moments" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        // + 0.0 normalizes IEEE −0.0 to 0.0 (engines disagree on the sign
        // of a rounded negative underflow)
        .agg((round(skewness(col("l_quantity")), 4) + lit(0.0)).as("skew_qty"),
          (round(kurtosis(col("l_quantity")), 4) + lit(0.0)).as("kurt_qty"),
          (round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0)).as("covar_qp"))
        .orderBy(col("l_returnflag"))
    }),

    // E2 — linear-regression aggregates (regr_* family)
    "e2_stats_regression" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (round(expr("regr_slope(l_extendedprice, l_quantity)"), 4) + lit(0.0)).as("slope"),
          (round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4) + lit(0.0)).as("icept"),
          (round(expr("regr_r2(l_extendedprice, l_quantity)"), 6) + lit(0.0)).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"),
          (round(expr("regr_avgx(l_extendedprice, l_quantity)"), 6) + lit(0.0)).as("avgx"))
        .orderBy(col("l_returnflag"))
    }),

    // E4b — sketch partial-aggregate + merge (rows-only: sketch binaries
    // are order-sensitive): per-group HLL sketches are the PERSISTED
    // partial — at 100 TB you store one sketch per (segment, day) and
    // answer any distinct-count rollup by merging sketches, never
    // rescanning. Bounding spec asserts the merged estimate tracks exact.
    "e4_sketch_merge" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_custkeys"))
    }),

    // H10 — bitwise aggregates (bit_and / bit_or / bit_xor)
    "h10_bit_aggs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("bit_and(o_orderkey)").as("k_and"),
          expr("bit_or(o_orderkey)").as("k_or"),
          expr("bit_xor(o_orderkey)").as("k_xor"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // skew-salted join: must agree exactly with the plain equi-join
    "x1_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val o = t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderstatus"))
      graft.ops.Joins.saltedJoin(l, o, "l_orderkey", saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }),

    // file-stats manifest + data-skipping read: range-cluster orders on
    // o_orderdate, build the per-file min/max manifest, then answer a
    // date-range query scanning only overlapping files — must agree
    // exactly with the plain full-scan filter
    "x2_manifest_skipping" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-manifest").toString
      t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .write.mode("overwrite").parquet(out)
      graft.ops.Manifest.write(s, out, Seq("o_orderdate"))
      graft.ops.Manifest.prunedRead(s, out, "o_orderdate",
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // x3 — Bloom file skipping (round 10): the table is clustered by
    // DATE, so a point lookup on o_orderkey gets no help from min/max
    // (every file's key range spans the table) — the per-file Bloom
    // sidecar is what prunes it. Must agree exactly with the plain
    // full-scan equality filter; ManifestSpec pins that the pruning
    // actually bites (files scanned << files total) and the staleness
    // fallback.
    // x4 — crash-atomic corpus versioning (round 10): two publishes,
    // the read serves the SECOND atomically (generation commit marker),
    // the first stays pinned-readable. The checked result is the current
    // version's per-lang profile + the version number — the oracle is
    // the same aggregate over the v2 slice of documents.
    "x4_corpus_versions" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-corpusver-q").toString
      val docs = t(s, dir, "documents")
      graft.ops.CorpusVersions.publish(s, out, docs.where(col("doc_id") < 300L))
      val v2 = graft.ops.CorpusVersions.publish(s, out,
        docs.select(col("doc_id"), col("lang"), col("n_chars")))
      graft.ops.CorpusVersions.read(s, out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .withColumn("version", lit(v2))
        .orderBy(col("lang"))
    }),

    // x4 — VERSION-AWARE data skipping (round 11): the publish writes
    // the per-file min/max manifest INSIDE the staged generation before
    // the commit marker, so the sidecar is atomically part of the
    // version and a pinned read can prune through it with the manifest
    // TRUSTED outright (a committed version is immutable by
    // construction — no per-query staleness listing). A second publish
    // of a different slice proves the pinned v1 read serves v1's data
    // through v1's own sidecar. Must agree exactly with the plain
    // filter over orders; ManifestSpec's version test pins that the
    // pruning actually bites (files scanned << files in the version).
    "x4_version_pruned" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-verprune").toString
      val orders = t(s, dir, "orders").repartitionByRange(8, col("o_orderdate"))
      graft.ops.CorpusVersions.publish(s, out, orders,
        statsCols = Seq("o_orderdate"))
      graft.ops.CorpusVersions.publish(s, out,
        orders.where(col("o_orderkey") < 100L), statsCols = Seq("o_orderdate"))
      graft.ops.CorpusVersions.readVersionPruned(s, out, 1L, "o_orderdate",
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // x5 — STREAMING SIDECAR MAINTENANCE (▶ real stream, round 11): the
    // streaming twin of the x2/x3 data-skipping family. Two date-split
    // micro-batches land as `__batch` partitions through
    // foreachBatchCorpusAppend, which refreshes the min/max manifest AND
    // the o_orderkey Bloom sidecar O(new files) inside each batch turn;
    // the final pruned range read goes THROUGH the freshly-maintained
    // manifest (no fallback — the sidecar is exactly current) and
    // hash-matches the plain relational oracle.
    "x5_streaming_sidecar_append" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val out = java.nio.file.Files.createTempDirectory("graft-x5").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-x5-ckpt").toString
      val rows = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"))
        .as[(Long, String, Double, java.sql.Timestamp)].collect()
      val cut = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double, java.sql.Timestamp)]
      def drain(): Unit = {
        val q = graft.streaming.Ingest.foreachBatchCorpusAppend(
          src.toDS().toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
          out, ckpt, statsCols = Seq("o_orderdate"), bloomCols = Seq("o_orderkey"))
        q.awaitTermination()
      }
      src.addData(rows.filter(_._4.before(cut)).toSeq); drain()
      src.addData(rows.filterNot(_._4.before(cut)).toSeq); drain()
      graft.ops.Manifest.prunedRead(s, out, "o_orderdate",
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // x4 — VERSION DIFF (round 11): what entered/left the corpus between
    // two pinned versions — the reproducibility audit behind "why did
    // run B train on different data than run A". Two key-projected
    // anti-joins; hash-matched against the set arithmetic in DuckDB.
    "x4_version_diff" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-verdiff").toString
      val docs = t(s, dir, "documents")
      graft.ops.CorpusVersions.publish(s, out, docs.where(col("doc_id") < 300L))
      graft.ops.CorpusVersions.publish(s, out, docs.where(col("doc_id") >= 100L))
      graft.ops.CorpusVersions.diff(s, out, 1L, 2L, "doc_id")
        .orderBy(col("change"), col("key"))
    }),

    "x3_bloom_point_read" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .write.mode("overwrite").parquet(out)
      graft.ops.Manifest.writeBloom(s, out, "o_orderkey")
      graft.ops.Manifest.bloomRead(s, out, "o_orderkey", lit(999L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("price"))
        .orderBy(col("o_orderkey"))
    }),

    // x6 — exact hot-key detection (round 13): the diagnostic you run
    // before deciding a join needs the salted path. One map-side-combined
    // groupBy; hash-matched HAVING oracle.
    "x6_hot_keys" -> ((s, dir) => {
      graft.ops.Skew.hotKeys(t(s, dir, "lineitem"), "l_suppkey", minCount = 640L)
        .orderBy(col("l_suppkey"))
    }),

    // x6 — auto-salted join (round 13): detect the hot keys, salt ONLY
    // the hot slice (cold slice joins plain), and hash-match the plain
    // equi-join oracle — x1's salted join without its "salt everything"
    // small-side blowup and without the caller having to know the skew
    // a priori.
    "x6_auto_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey"))
      graft.ops.Skew.autoSaltedJoin(l, sup, "l_suppkey",
          hotThreshold = 640L, saltFactor = 4)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }),

    // x6 — SKETCH-routed salted join (round 13): the hot list comes from
    // the one-pass Misra–Gries summary instead of the exact groupBy — the
    // 100 TB detection path. The sketch only ROUTES rows (both routes are
    // exact inner joins), so the result hash-matches the plain-join
    // oracle even though the sketch is merge-order-dependent.
    "x6_approx_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey"))
      graft.ops.Skew.autoSaltedJoinApprox(l, sup, "l_suppkey",
          sketchK = 64, hotThreshold = 500L, saltFactor = 4)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }),

    // e13 — Misra–Gries heavy-hitter summary (round 13): one-pass,
    // bounded-memory, mergeable — the 100 TB answer to "which keys are
    // hot" when the exact groupBy's shuffle doesn't fit. Which
    // below-threshold keys survive depends on partition merge order →
    // declared rows-only; SkewSpec pins the three MG guarantees
    // (all true heavy hitters present, never overestimates, undershoot
    // ≤ N/(k+1)).
    "e13_heavy_hitters" -> ((s, dir) => {
      graft.ops.Skew.heavyHitters(t(s, dir, "lineitem"), col("l_suppkey"), k = 50)
    }))

  val oracle: Map[String, String] = Map(
    "h1_string_funcs3" ->
      """SELECT doc_id,
        |  upper(substr(lang, 1, 1)) || lower(substr(lang, 2)) AS lang_cap,
        |  substr(lang, 1, 1) || 'XX' || substr(lang, 3) AS ov,
        |  split_part(concat_ws('|', lang, source), '|', 2) AS src_part
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "h2_datetime_funcs3" ->
      """SELECT o_orderkey,
        |  CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS DOUBLE) AS mb,
        |  strftime(o_orderdate + INTERVAL ((7 - isodow(o_orderdate)) % 7 + 1) DAY,
        |           '%Y-%m-%d') AS next_mon
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "f1_rank2" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ROUND(cume_dist() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey), 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders WHERE o_orderkey < 4000 ORDER BY o_orderkey""".stripMargin,

    "c3_nullsafe_rlike" ->
      """SELECT doc_id,
        |  lang IS NOT DISTINCT FROM 'en' AS is_en_ns,
        |  regexp_matches(text, 'sp[ae]rk') AS has_sparkish,
        |  NULLIF(lang, 'zh') IS NULL AS zh_nulled
        |FROM documents ORDER BY doc_id""".stripMargin,

    "h1_string_funcs2" ->
      """SELECT doc_id,
        |  printf('%s-%03d', lang, doc_id % 100) AS fmt,
        |  left(text, 10) AS l10,
        |  right(lang, 1) AS r1,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3_words,
        |  CAST(ascii(lang) AS INTEGER) AS first_cp,
        |  chr(CAST(65 + doc_id % 26 AS INTEGER)) AS letter
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "h2_datetime_funcs2" ->
      """SELECT o_orderkey,
        |  strftime(make_date(2024, CAST(month(o_orderdate) AS INTEGER), 1), '%Y-%m-%d') AS normalized_month,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS rendered,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "e2_stats_regression" ->
      """SELECT l_returnflag,
        |  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
        |  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) + 0.0 AS icept,
        |  ROUND(REGR_R2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
        |  CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6) + 0.0 AS avgx
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "h10_bit_aggs" ->
      """SELECT o_orderstatus,
        |  CAST(BIT_AND(o_orderkey) AS BIGINT) AS k_and,
        |  CAST(BIT_OR(o_orderkey) AS BIGINT) AS k_or,
        |  CAST(BIT_XOR(o_orderkey) AS BIGINT) AS k_xor,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "e2_stats_moments" ->
      """WITH mu AS (SELECT l_returnflag, AVG(l_quantity) AS m, COUNT(*) AS n
        |            FROM lineitem GROUP BY l_returnflag),
        |mom AS (SELECT l.l_returnflag, ANY_VALUE(mu.n) AS n,
        |  SUM(POW(l.l_quantity - mu.m, 2)) AS m2,
        |  SUM(POW(l.l_quantity - mu.m, 3)) AS m3,
        |  SUM(POW(l.l_quantity - mu.m, 4)) AS m4
        |  FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        |  GROUP BY l.l_returnflag)
        |SELECT mom.l_returnflag,
        |  ROUND(sqrt(CAST(n AS DOUBLE)) * m3 / POW(m2, 1.5), 4) + 0.0 AS skew_qty,
        |  ROUND(CAST(n AS DOUBLE) * m4 / (m2 * m2) - 3.0, 4) + 0.0 AS kurt_qty,
        |  ROUND(covar_samp(l.l_quantity, l.l_extendedprice), 4) + 0.0 AS covar_qp
        |FROM mom JOIN lineitem l ON l.l_returnflag = mom.l_returnflag
        |GROUP BY mom.l_returnflag, n, m2, m3, m4
        |ORDER BY mom.l_returnflag""".stripMargin,

    "x1_salted_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "x2_manifest_skipping" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "x3_bloom_point_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey = 999 ORDER BY o_orderkey""".stripMargin,

    "x4_version_diff" ->
      """SELECT doc_id AS key, 'added' AS change FROM documents WHERE doc_id >= 300
        |UNION ALL
        |SELECT doc_id AS key, 'removed' AS change FROM documents WHERE doc_id < 100
        |ORDER BY change, key""".stripMargin,

    "x4_version_pruned" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "x4_corpus_versions" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(2 AS BIGINT) AS version
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the streamed-up, sidecar-maintained table must read back as the
    // plain relational range aggregate
    "x5_streaming_sidecar_append" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "x6_hot_keys" ->
      """SELECT l_suppkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_suppkey HAVING COUNT(*) >= 640
        |ORDER BY l_suppkey""".stripMargin,

    // the hot/cold split + salted hot slice must agree exactly with the
    // plain equi-join
    "x6_auto_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // the sketch only routes — the result is the same plain join
    "x6_approx_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}

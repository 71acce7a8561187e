package graft.contract

import graft.core.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 contract queries — scalar function surface (H) and
  * generator/UDF probes (I). One query per function family; each function
  * appears in at least one projected column checked against DuckDB.
  */
object ScalarQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // H1 — string functions
    "h1_string_funcs" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 20)).as("up20"),
          lower(col("source")).as("lo_src"),
          length(col("text")).as("len"),
          concat_ws("|", col("lang"), col("source")).as("cat"),
          lpad(col("lang"), 5, "_").as("pad_l"),
          rpad(col("lang"), 5, "*").as("pad_r"),
          trim(lit("  x  ")).as("trimmed"),
          instr(col("text"), "data").as("pos_data"),
          levenshtein(col("lang"), lit("en")).as("lev"),
          repeat(col("lang"), 2).as("rep2"),
          translate(col("lang"), "aeiou", "AEIOU").as("tr"),
          reverse(col("lang")).as("rev"),
          regexp_replace(col("text"), "query", "Q").as("rq"),
          regexp_extract(col("text"), "(s[a-z]+)", 1).as("first_s_word"))
        .orderBy(col("doc_id"))
    }),

    // H2 — date/time functions
    "h2_datetime_funcs" -> ((s, dir) => {
      t(s, dir, "orders").where(col("o_orderkey") < 2000L)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).as("days_to_2000"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2mo"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    }),

    // H3 — math functions
    "h3_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem").where(col("l_orderkey") < 2000L)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_q"),
          round(col("l_extendedprice") / 3.0d, 2).as("div_round"),
          ceil(col("l_discount") * 100d).as("ceil_disc"),
          floor(col("l_extendedprice") / 1000d).as("floor_k"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          round(pow(col("l_quantity"), 2.0d), 6).as("q_sq"),
          pmod(col("l_linenumber") - lit(3), lit(4)).as("pm"),
          signum(col("l_quantity") - 25.0d).as("sgn"),
          greatest(col("l_quantity"), col("l_discount") * 100d).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // H4 — array functions + higher-order functions
    "h4_array_funcs" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .withColumn("toks", toks)
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tok"),
          size(array_distinct(col("toks"))).as("n_dist"),
          array_contains(col("toks"), "data").as("has_data"),
          element_at(col("toks"), 1).as("first_tok"),
          array_join(slice(col("toks"), 1, 3), "-").as("first3"),
          array_join(slice(sort_array(col("toks")), 1, 3), "-").as("sorted3"),
          array_min(col("toks")).as("tok_min"),
          array_max(col("toks")).as("tok_max"),
          array_join(transform(slice(col("toks"), 1, 3), x => upper(x)), ",").as("up3"),
          size(filter(col("toks"), x => length(x) > 4)).as("n_long"),
          aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).as("total_chars"),
          exists(col("toks"), x => x === "spark").as("has_spark"),
          forall(col("toks"), x => length(x) > 0).as("all_nonempty"))
        .orderBy(col("doc_id"))
    }),

    // H5 — map functions (MapType build + lookup; oracle reproduces values)
    "h5_map_funcs" -> ((s, dir) => {
      val langRank = map(
        lit("en"), lit(1), lit("fr"), lit(2), lit("es"), lit(3),
        lit("de"), lit(4), lit("zh"), lit(5))
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .withColumn("m", langRank)
        .select(
          col("doc_id"),
          element_at(col("m"), col("lang")).as("lang_rank"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
          size(map_filter(col("m"), (_, v) => v <= 2)).as("n_low"),
          element_at(transform_values(col("m"), (_, v) => v * 10), col("lang")).as("rank_x10"))
        .orderBy(col("doc_id"))
    }),

    // H6 — JSON functions on events.props
    "h6_json_funcs" -> ((s, dir) => {
      t(s, dir, "events").where(col("event_id") < 2000L)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_typed"),
          to_json(struct(col("event_id").as("id"))).as("j_out"))
        .orderBy(col("event_id"))
    }),

    // H6b — VARIANT type (Spark 4): parse once into the binary variant
    // encoding, then typed path extraction. At scale variant beats
    // repeated get_json_object (one parse, many cheap reads) and is the
    // engine's answer to semi-structured columns.
    "h6_variant_funcs" -> ((s, dir) => {
      t(s, dir, "events").where(col("event_id") < 2000L)
        .select(
          col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
          expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
          expr("schema_of_variant(parse_json(props)) like 'OBJECT%'").as("is_obj"))
        .orderBy(col("event_id"))
    }),

    // H7 — portable hash functions (md5 / sha2)
    "h7_hash_funcs" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 200L)
        .select(
          col("doc_id"),
          md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"))
        .orderBy(col("doc_id"))
    }),

    // H7 — Spark-specific hashes: self-consistency only (no cross-engine
    // oracle exists for xxhash64/hash/crc32 → rows-only driver check)
    "h7_spark_hashes" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          xxhash64(col("text")).as("xx"),
          hash(col("text")).as("h32"),
          crc32(col("text").cast("binary")).as("crc"))
        .orderBy(col("doc_id"))
    }),

    // H8 — struct build / field access
    "h8_struct_funcs" -> ((s, dir) => {
      t(s, dir, "orders").where(col("o_orderkey") < 2000L)
        .withColumn("st", struct(col("o_orderkey").as("k"), col("o_custkey").as("c")))
        .select(
          col("o_orderkey"),
          col("st").getField("c").as("cust_from_struct"),
          to_json(col("st")).as("st_json"))
        .orderBy(col("o_orderkey"))
    }),

    // H9 — ANSI-mode safe arithmetic: try_* forms return null where
    // strict ANSI evaluation would raise (div by zero, bad cast,
    // overflow) — the functions a reference user migrating onto Spark 4's
    // ANSI default reaches for first
    "h9_try_funcs" -> ((s, dir) => {
      t(s, dir, "orders").where(col("o_orderkey") < 2000L)
        .select(
          col("o_orderkey"),
          expr("try_divide(o_totalprice, o_custkey % 3)").as("maybe_div"),
          expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
          expr("try_add(o_orderkey, 1)").as("plus1"),
          expr("try_multiply(o_custkey, 2)").as("cust2"))
        .orderBy(col("o_orderkey"))
    }),

    // I5 — one-to-many n-gram generation (flatMap/explode-of-transform)
    "i5_ngram_gen" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalizeText(col("text")))
      t(s, dir, "documents").where(col("doc_id") < 30L)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.ngrams(toks, 3)).as("gram"))
        .orderBy(col("doc_id"), col("gram"))
    }))

  val oracle: Map[String, String] = Map(
    "h9_try_funcs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey % 3 = 0 THEN NULL
        |       ELSE o_totalprice / (o_custkey % 3) END AS maybe_div,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        |  o_orderkey + 1 AS plus1,
        |  o_custkey * 2 AS cust2
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "h1_string_funcs" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 20)) AS up20,
        |  lower(source) AS lo_src,
        |  length(text) AS len,
        |  concat_ws('|', lang, source) AS cat,
        |  lpad(lang, 5, '_') AS pad_l,
        |  rpad(lang, 5, '*') AS pad_r,
        |  trim('  x  ') AS trimmed,
        |  CAST(instr(text, 'data') AS INTEGER) AS pos_data,
        |  CAST(levenshtein(lang, 'en') AS INTEGER) AS lev,
        |  repeat(lang, 2) AS rep2,
        |  translate(lang, 'aeiou', 'AEIOU') AS tr,
        |  reverse(lang) AS rev,
        |  regexp_replace(text, 'query', 'Q', 'g') AS rq,
        |  COALESCE(regexp_extract(text, '(s[a-z]+)', 1), '') AS first_s_word
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "h2_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_2000,
        |  strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2mo,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "h3_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(-l_quantity) AS abs_q,
        |  round(l_extendedprice / 3.0, 2) AS div_round,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
        |  round(sqrt(l_quantity), 6) AS sqrt_q,
        |  round(exp(l_discount), 6) AS exp_d,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(log10(l_extendedprice), 6) AS log10_p,
        |  round(pow(l_quantity, 2.0), 6) AS q_sq,
        |  CAST(((l_linenumber - 3) % 4 + 4) % 4 AS INTEGER) AS pm,
        |  CAST(CASE WHEN l_quantity - 25.0 > 0 THEN 1.0
        |       WHEN l_quantity - 25.0 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_tax, l_discount) AS le
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "h4_array_funcs" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tok,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_dist,
        |  list_contains(toks, 'data') AS has_data,
        |  toks[1] AS first_tok,
        |  array_to_string(toks[1:3], '-') AS first3,
        |  array_to_string(list_sort(toks)[1:3], '-') AS sorted3,
        |  list_aggregate(toks, 'min') AS tok_min,
        |  list_aggregate(toks, 'max') AS tok_max,
        |  array_to_string(list_transform(toks[1:3], x -> upper(x)), ',') AS up3,
        |  CAST(len(list_filter(toks, x -> len(x) > 4)) AS INTEGER) AS n_long,
        |  CAST(list_sum(list_transform(toks, x -> len(x))) AS INTEGER) AS total_chars,
        |  list_contains(toks, 'spark') AS has_spark,
        |  CAST(len(list_filter(toks, x -> len(x) = 0)) = 0 AS BOOLEAN) AS all_nonempty
        |FROM tk ORDER BY doc_id""".stripMargin,

    "h5_map_funcs" ->
      """SELECT doc_id,
        |  CASE lang WHEN 'en' THEN 1 WHEN 'fr' THEN 2 WHEN 'es' THEN 3
        |            WHEN 'de' THEN 4 WHEN 'zh' THEN 5 END AS lang_rank,
        |  'de,en,es,fr,zh' AS keys_sorted,
        |  2 AS n_low,
        |  CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 20 WHEN 'es' THEN 30
        |            WHEN 'de' THEN 40 WHEN 'zh' THEN 50 END AS rank_x10
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "h6_json_funcs" ->
      """SELECT event_id,
        |  props->>'$.k' AS k_str,
        |  CAST(props->>'$.k' AS INTEGER) AS k_int,
        |  CAST(props->>'$.k' AS INTEGER) AS k_typed,
        |  '{"id":' || CAST(event_id AS VARCHAR) || '}' AS j_out
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "h6_variant_funcs" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INTEGER) AS k_int,
        |  props->>'$.k' AS k_str,
        |  CAST(json_type(json(props)) = 'OBJECT' AS BOOLEAN) AS is_obj
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "h7_hash_funcs" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "h8_struct_funcs" ->
      """SELECT o_orderkey,
        |  o_custkey AS cust_from_struct,
        |  '{"k":' || CAST(o_orderkey AS VARCHAR) || ',"c":' || CAST(o_custkey AS VARCHAR) || '}' AS st_json
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "i5_ngram_gen" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
        |              x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id < 30),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(t) < 3 THEN []
        |       ELSE list_transform(range(0, len(t) - 2),
        |                           i -> array_to_string(t[(i+1):(i+3)], ' ')) END AS grams
        |  FROM tk)
        |SELECT doc_id, unnest(grams) AS gram FROM g
        |ORDER BY doc_id, gram""".stripMargin)
}

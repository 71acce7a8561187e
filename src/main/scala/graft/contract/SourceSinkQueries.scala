package graft.contract

import graft.core.Engine
import graft.functions.VectorFunctions
import graft.streaming.Replay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 contract queries — source/sink surface (A2/A3/A7/B9) and
  * the streaming similarity join (K9). Each roundtrips engine-written data
  * through the format under test and verifies the result against the
  * original parquet via the DuckDB oracle, so the write AND read paths are
  * both on the hook.
  */
object SourceSinkQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  case class VecRow(vec_id: Long, embedding: Seq[Float])

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2 — CSV write + schema-declared read roundtrip
    "a2_csv_roundtrip" -> ((s, dir) => {
      val out = tmp("graft-csv")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
        .option("header", "true").csv(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // A2b — ORC write + read roundtrip (the other columnar format Spark
    // ships natively; schema preserved, aggregate must equal the parquet
    // oracle)
    "a2_orc_roundtrip" -> ((s, dir) => {
      val out = tmp("graft-orc")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // A2c — XML write + read roundtrip (Spark 4 ships the XML datasource
    // natively — the remaining text format after CSV/JSON; explicit read
    // schema since XML carries no types)
    "a2_xml_roundtrip" -> ((s, dir) => {
      val out = tmp("graft-xml")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("rootTag", "events").option("rowTag", "event")
        .format("xml").save(out)
      s.read
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
        .option("rowTag", "event").format("xml").load(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // A3 — JSON-lines write + read roundtrip (schema inferred on read)
    "a3_jsonl_roundtrip" -> ((s, dir) => {
      val out = tmp("graft-jsonl")
      t(s, dir, "nation").write.mode("overwrite").json(out)
      val n = s.read.json(out)
      n.join(broadcast(t(s, dir, "region")),
          n("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    }),

    // A7 — partitioned parquet sink + partition-pruned read-back
    "a7_partitioned_sink" -> ((s, dir) => {
      val out = tmp("graft-part")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
      s.read.parquet(out)
        .where(col("l_returnflag") === "R") // static partition pruning
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // B9 — schema-drift scan: two writes with different schemas into one
    // dataset, merged read (the CDC schema-evolution-on-restart policy)
    "b9_schema_drift" -> ((s, dir) => {
      val out = tmp("graft-drift")
      val c = t(s, dir, "customer")
      val mid = (c.agg(max(col("c_custkey"))).head().getLong(0) + 1L) / 2L
      c.where(col("c_custkey") < mid)
        .select(col("c_custkey"), col("c_name"))
        .write.mode("append").parquet(out)
      c.where(col("c_custkey") >= mid)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.mode("append").parquet(out)
      s.read.option("mergeSchema", "true").parquet(out)
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_acctbal")).as("n_with_acctbal"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double").as("sum_acctbal"))
    }),

    // K9 — streaming similarity join: new vectors streamed against a
    // static corpus through the sign-bucket EQUI-join (never a
    // BroadcastNestedLoopJoin over the corpus — the 100 TB shape). The
    // oracle reproduces the same deterministic bucket function, so the
    // LSH-candidate semantics hash-match exactly; the brute-force
    // all-pairs baseline is k9_neardup_bruteforce.
    "k9_stream_static_sim" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val mid = (e.agg(max(col("vec_id"))).head().getLong(0) + 1L) / 2L
      val static = e.where(col("vec_id") < mid)
        .select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
      val streamRows = e.where(col("vec_id") >= mid)
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id"))
        .as[VecRow].collect().toSeq
      Replay.run(s, streamRows, chunkSize = streamRows.size / 4 + 1,
          name = s"graft_simjoin_${System.nanoTime() % 100000}") { ds =>
        graft.streaming.Streams.bucketedSimJoin(ds.toDF(), static,
            streamVec = "embedding", staticVec = "cv",
            dim = 64, nPlanes = 2, threshold = 0.3d)
          .select(col("vec_id"), col("corpus_id"))
      }
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_similar"))
        .orderBy(col("vec_id"))
    }),

    // K9 — BATCH embedding near-dup through the same sign-bucket LSH path
    // (brute-force baseline: k9_neardup_bruteforce), hash-matched end to
    // end: DuckDB regenerates the identical ±1 hyperplane buckets (same
    // murmur-derived literal signs, same sequential double sum) and the
    // identical 6dp-rounded cosine, so candidate generation AND
    // verification — including the r9 hot-bucket triangle-block bound,
    // which must not change the pair set — are oracle-checked.
    "k9_neardup_lsh" -> ((s, dir) => {
      graft.llm.Dedup.embeddingNearDupPairs(
          t(s, dir, "embeddings"), "embedding", "vec_id",
          dim = 64, threshold = 0.3, planes = 2)
        .orderBy(col("id_a"), col("id_b"))
    }))

  private def duckCosine(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1, 65), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin.replace("\n", " ")

  /** The exact SQL image of [[graft.functions.VectorFunctions.signBucket]]:
    * same murmur-derived ±1 hyperplane components (baked as literal signs
    * at generation time on BOTH sides), same left-to-right double sum, so
    * bucket assignments agree bit-for-bit across engines.
    * `productHash` stays despite the deprecation — the frozen-hash
    * contract note on signBucket.
    */
  @scala.annotation.nowarn("cat=deprecation")
  private def duckSignBucket(v: String, nPlanes: Int, dim: Int, seed: Int = 42): String =
    (0 until nPlanes).map { p =>
      val terms = (0 until dim).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, d, seed))
        val sgn = if ((h & 1) == 0) "+" else "-"
        s"$sgn CAST($v[${d + 1}] AS DOUBLE)"
      }.mkString(" ")
      s"(CASE WHEN ($terms) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val oracle: Map[String, String] = Map(
    "a2_csv_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a2_orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a2_xml_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a3_jsonl_roundtrip" ->
      """SELECT r_name, COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "a7_partitioned_sink" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "b9_schema_drift" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN c_custkey >= (SELECT (max(c_custkey) + 1) // 2 FROM customer)
        |             THEN 1 END) AS n_with_acctbal,
        |  CAST(SUM(CASE WHEN c_custkey >= (SELECT (max(c_custkey) + 1) // 2 FROM customer)
        |                THEN CAST(c_acctbal AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_acctbal
        |FROM customer""".stripMargin,

    "k9_stream_static_sim" ->
      s"""SELECT a.vec_id, COUNT(*) AS n_similar
         |FROM embeddings a JOIN embeddings b
         |  ON a.vec_id >= (SELECT (max(vec_id) + 1) // 2 FROM embeddings)
         | AND b.vec_id < (SELECT (max(vec_id) + 1) // 2 FROM embeddings)
         | AND ${duckSignBucket("a.embedding", 2, 64)} = ${duckSignBucket("b.embedding", 2, 64)}
         | AND ${duckCosine("a.embedding", "b.embedding")} >= 0.3
         |GROUP BY a.vec_id ORDER BY a.vec_id""".stripMargin,

    "k9_neardup_lsh" ->
      s"""WITH bk AS (SELECT vec_id, embedding,
         |  ${duckSignBucket("embedding", 2, 64)} AS bucket FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cosine
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin)
}

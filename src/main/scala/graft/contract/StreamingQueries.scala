package graft.contract

import graft.cdc.Envelope
import graft.core.Engine
import graft.streaming.{Replay, Sinks, Stateful, Streams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SURVEY.md §2 contract queries that REALLY run as Structured Streaming:
  * the events table is replayed through a MemoryStream in chunks, drained
  * with Trigger.AvailableNow into a memory sink, and the final state is
  * hash-compared against a batch DuckDB oracle (SURVEY.md §5.1
  * batch-equivalence strategy). This exercises MicroBatchExecution, state
  * stores, watermarks and output modes — not just the batch plans.
  */
object StreamingQueries {

  /** Typed event row for MemoryStream replay. */
  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double, props: String)

  /** The post-DDL change shape: [[graft.streaming.Stateful.Change]] plus
    * the added nullable column (a8_upsert_schema_widen's epoch 2).
    */
  case class WideChange(key: Long, version: Long, op: String,
                        payload: String, extra: Double)

  private def loadEvents(s: SparkSession, dir: String): Seq[EventRow] = {
    import s.implicits._
    Engine.table(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
      .as[EventRow].collect().toSeq
  }

  private val mts =
    """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |                  user_id, event_type, value, props FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J1/J9 streaming form — tumbling window counts through a real stream
    // (complete output mode; final state must equal the batch group-by)
    "j9_stream_tumbling" -> ((s, dir) => {
      import s.implicits._
      val rows = loadEvents(s, dir)
      Replay.run(s, rows, chunkSize = rows.size / 8 + 1,
          name = s"graft_tumbling_${System.nanoTime()}", outputMode = "complete") { ds =>
        Streams.windowedCounts(ds.toDF(), "ts", "1 hour", extraKeys = Seq("event_type"))
      }
        .select(unix_micros(col("w_start")).as("w_start_us"), col("event_type"),
          col("n"), col("sum_value").cast("decimal(18,6)").cast("double").as("sum_value"))
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    // J5 streaming dedup — every event delivered twice, exactly-once out
    "j5_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val rows = loadEvents(s, dir)
      val doubled = rows.flatMap(r => Seq(r, r))
      Replay.run(s, doubled, chunkSize = doubled.size / 8 + 1,
          name = s"graft_dedup_${System.nanoTime()}") { ds =>
        Streams.dedupWithinWatermark(ds.toDF(), "ts", "10 days", Seq("event_id"))
          .select(col("event_id"), col("event_type"))
      }
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // J10+ state introspection — drain a streaming dedup, then read the
    // checkpoint's state store back as a DataFrame (statestore source):
    // the persisted state keys themselves are the checked result
    "j13_state_inspect" -> ((s, dir) => {
      import s.implicits._
      implicit val sql = s.sqlContext
      val rows = loadEvents(s, dir)
      val src = MemoryStream[EventRow]
      rows.grouped(rows.size / 4 + 1).foreach(c => src.addData(c))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stinsp-q").toString
      val q = src.toDS().toDF().dropDuplicates("user_id")
        .select(col("user_id"))
        .writeStream.format("memory")
        .queryName(s"graft_stinsp_${System.nanoTime()}")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      graft.streaming.StateInspect.store(s, ckpt)
        .select(col("key.user_id").as("user_id"))
        .orderBy(col("user_id"))
    }),

    // J8 streaming keyed upsert (flatMapGroupsWithState) — the streaming
    // form of B5 materialization; final state must equal the batch window
    "j8_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      val rows = loadEvents(s, dir)
      val changes = rows.map { r =>
        val op = r.event_type match {
          case "error" => "d"
          case "purchase" => "c"
          case "signup" => "r"
          case _ => "u"
        }
        Stateful.Change(r.user_id, r.event_id, op, r.props)
      }
      val emitted = Replay.run(s, changes, chunkSize = changes.size / 8 + 1,
          name = s"graft_upsert_${System.nanoTime()}", outputMode = "update") { ds =>
        Stateful.upsertStream(ds).toDF()
      }
      // the memory sink accumulates per-batch updates; the final state is
      // the latest emitted version per key, minus deleted keys
      graft.cdc.Materialize.latestByKey(emitted, Seq("key"), Seq(col("version")))
        .where(!col("deleted"))
        .select(col("key").as("user_id"), col("version").as("last_event_id"),
          col("payload"))
        .orderBy(col("user_id"))
    }),

    // J8 primary — the same keyed upsert through Spark 4's
    // transformWithState (RocksDB state store). The replay runs the
    // TimeMode.None form: with processing-time TTL the AvailableNow
    // drain never terminates (the engine keeps scheduling empty
    // timer-sweep batches — measured 400+ batches for 8 chunks), so TTL
    // eviction belongs to continuously-triggered deployments and is
    // wired/asserted separately in the test suite.
    "j8_stream_upsert_tws" -> ((s, dir) => {
      import s.implicits._
      Stateful.withRocksDbStateStore(s)
      val rows = loadEvents(s, dir)
      val changes = rows.map { r =>
        val op = r.event_type match {
          case "error" => "d"
          case "purchase" => "c"
          case "signup" => "r"
          case _ => "u"
        }
        Stateful.Change(r.user_id, r.event_id, op, r.props)
      }
      val emitted = Replay.run(s, changes, chunkSize = changes.size / 8 + 1,
          name = s"graft_upsert_tws_${System.nanoTime()}", outputMode = "update") { ds =>
        Stateful.upsertStreamTws(ds, ttl = None).toDF()
      }
      graft.cdc.Materialize.latestByKey(emitted, Seq("key"), Seq(col("version")))
        .where(!col("deleted"))
        .select(col("key").as("user_id"), col("version").as("last_event_id"),
          col("payload"))
        .orderBy(col("user_id"))
    }),

    // A8 — foreachBatch upsert sink: the change stream is applied batch
    // by batch into a bucket-partitioned parquet target with
    // latest-version-wins merge semantics; the query returns the final
    // materialized table, which must equal the B5/J8 batch oracle
    "a8_foreach_upsert" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = loadEvents(s, dir)
      val changes = rows.map { r =>
        val op = r.event_type match {
          case "error" => "d"
          case "purchase" => "c"
          case "signup" => "r"
          case _ => "u"
        }
        Stateful.Change(r.user_id, r.event_id, op, r.props)
      }
      val target = java.nio.file.Files.createTempDirectory("graft-a8-target").toString + "/state"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-a8-ckpt").toString
      val source = MemoryStream[Stateful.Change]
      changes.grouped(changes.size / 8 + 1).foreach(chunk => source.addData(chunk))
      val q = Sinks.foreachBatchUpsert(source.toDS().toDF(), target, ckpt,
        keyCols = Seq("key"), versionCol = "version")
      q.awaitTermination()
      Sinks.currentState(s, target)
        .select(col("key").as("user_id"), col("version").as("last_event_id"),
          col("payload"))
        .orderBy(col("user_id"))
    }),

    // A8c — SCHEMA AUTO-WIDEN through the upsert sink (round 15, the r14
    // verdict's #3): epoch 1 applies the pre-DDL change stream; the
    // source then adds a nullable column and the consumer RESTARTS with
    // the wider schema (the real Debezium flow — one stream never changes
    // schema mid-flight). The sink widens the pinned table schema in
    // place: old buckets read the new column as null through the
    // explicit-schema scan, nothing is rewritten. The final state's hash
    // pins both the merge across epochs and the null backfill.
    "a8_upsert_schema_widen" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = loadEvents(s, dir)
      val mid = rows.map(_.event_id).max / 2
      def opOf(t: String): String = t match {
        case "error" => "d"; case "purchase" => "c"; case "signup" => "r"
        case _ => "u"
      }
      val target = java.nio.file.Files.createTempDirectory("graft-a8w-target").toString + "/state"
      val ckpt1 = java.nio.file.Files.createTempDirectory("graft-a8w-ckpt1").toString
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-a8w-ckpt2").toString
      val src1 = MemoryStream[Stateful.Change]
      val first = rows.filter(_.event_id < mid)
        .map(r => Stateful.Change(r.user_id, r.event_id, opOf(r.event_type), r.props))
      first.grouped(first.size / 4 + 1).foreach(src1.addData(_))
      Sinks.foreachBatchUpsert(src1.toDS().toDF(), target, ckpt1,
        keyCols = Seq("key"), versionCol = "version").awaitTermination()
      val src2 = MemoryStream[WideChange]
      val second = rows.filter(_.event_id >= mid)
        .map(r => WideChange(r.user_id, r.event_id, opOf(r.event_type),
          r.props, r.value * 2.0d))
      second.grouped(second.size / 4 + 1).foreach(src2.addData(_))
      Sinks.foreachBatchUpsert(src2.toDS().toDF(), target, ckpt2,
        keyCols = Seq("key"), versionCol = "version").awaitTermination()
      Sinks.currentState(s, target)
        .select(col("key").as("user_id"), col("version").as("last_event_id"),
          col("payload"), col("extra"))
        .orderBy(col("user_id"))
    }),

    // A8b — incrementally maintained rollup: per-user (count, sum)
    // partials folded into the bucketed target batch by batch; the final
    // table must equal the one-shot batch GROUP BY. Counts are not
    // latest-wins, so the sink's batch-id replay guard carries the
    // at-least-once → exactly-once argument here.
    "a8_foreach_rollup" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = loadEvents(s, dir)
      val target = java.nio.file.Files.createTempDirectory("graft-a8r-target").toString + "/rollup"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-a8r-ckpt").toString
      val source = MemoryStream[EventRow]
      rows.grouped(rows.size / 8 + 1).foreach(chunk => source.addData(chunk))
      val q = Sinks.foreachBatchRollup(source.toDS().toDF(), target, ckpt,
        keyCols = Seq("user_id"), valueCol = "value")
      q.awaitTermination()
      Sinks.currentRollup(s, target)
        .select(col("user_id"), col("cnt").as("n"),
          col("sum_val").cast("double").as("sum_value"))
        .orderBy(col("user_id"))
    }),

    // A4 — CDC source entry point: envelope JSON files stream through the
    // same `value`-column parse path the Kafka source uses
    // (Envelope.cdcStream composes readStream.format("kafka") with the
    // identical chain; no broker exists in this rig, so the file form
    // carries the correctness evidence — oracle equals B1's)
    "a4_cdc_file_stream" -> ((s, dir) => {
      val c = Engine.table(s, dir, "customer")
      val envelopes = c.select(to_json(struct(
        struct(c.columns.map(col).toIndexedSeq: _*).as("after"),
        struct(
          lit("graft").as("connector"), lit("db").as("db"),
          lit("public").as("schema"), lit("customer").as("table"),
          col("c_custkey").as("lsn"), lit(true).as("snapshot"),
          lit(1700000000000L).as("ts_ms")).as("source"),
        lit("r").as("op"),
        lit(1700000000000L).as("ts_ms"))).as("value"))
      val watchDir = java.nio.file.Files.createTempDirectory("graft-a4-watch").toString
      envelopes.write.mode("overwrite").text(watchDir)
      val parsed = Envelope.extractNewRecordState(
        Envelope.cdcFileStream(s, watchDir, CdcQueries.customerRowSchema))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("__op"), col("__deleted"))
      val name = s"graft_a4_${System.nanoTime() % 100000}"
      val sq = parsed.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-a4-ckpt").toString)
        .start()
      sq.awaitTermination()
      s.table(name).orderBy(col("c_custkey"))
    }),

    // A5 — file-based stream source (directory watch stand-in for Kafka):
    // stream the events parquet itself, aggregate, drain
    "a5_file_stream" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = Engine.table(s, dir, "events").schema // post ns→µs conversion
      // the file stream source watches a DIRECTORY; stage the single
      // parquet file into one (the Kafka-less directory-watch pattern)
      val watchDir = java.nio.file.Files.createTempDirectory("graft-watch")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        watchDir.resolve("events.parquet"))
      val raw = s.readStream
        .schema(org.apache.spark.sql.types.StructType(
          schema.fields.map(f => if (f.name == "ts")
            org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType)
          else f)))
        .parquet(watchDir.toString)
      val q = raw
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .writeStream.format("memory")
        .queryName(s"graft_filestream_${System.nanoTime() % 100000}")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ckpt-fs").toString)
      val sq = q.start()
      sq.awaitTermination()
      s.table(sq.name).orderBy(col("event_type"))
    }))

  val oracle: Map[String, String] = Map(
    "j9_stream_tumbling" -> (mts +
      """
        |SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY w_start_us, event_type
        |ORDER BY w_start_us, event_type""".stripMargin),

    "j5_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "j13_state_inspect" ->
      """SELECT DISTINCT user_id FROM events ORDER BY user_id""".stripMargin,

    "j8_stream_upsert" ->
      """SELECT user_id, event_id AS last_event_id, props AS payload
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "j8_stream_upsert_tws" ->
      """SELECT user_id, event_id AS last_event_id, props AS payload
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "a8_foreach_rollup" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a8_foreach_upsert" ->
      """SELECT user_id, event_id AS last_event_id, props AS payload
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // the widened column is non-null exactly for winners from the
    // post-DDL epoch; pre-widening winners read it as the null backfill
    "a8_upsert_schema_widen" ->
      """SELECT user_id, last_event_id, payload, extra FROM (
        |  SELECT user_id, event_id AS last_event_id, props AS payload,
        |    CASE WHEN event_id >= (SELECT max(event_id) // 2 FROM events)
        |         THEN value * 2 ELSE NULL END AS extra,
        |    event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "a4_cdc_file_stream" ->
      """SELECT c_custkey, c_name, c_acctbal, 'r' AS __op, false AS __deleted
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "a5_file_stream" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}

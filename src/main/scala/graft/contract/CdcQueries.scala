package graft.contract

import graft.cdc.{Envelope, Materialize}
import graft.core.Engine
import graft.ops.Joins
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 contract queries — CDC envelope operators (B), time joins
  * (D7/D8) and windowed/session aggregations in their batch-equivalence
  * form (J1-J3, J6, J7).
  *
  * The `events` table doubles as a synthetic changelog: op is derived from
  * event_type (error → delete, purchase → create, click/view → update,
  * signup → snapshot-read), user_id is the key, (ts, event_id) the version
  * order. Every oracle works on the µs-truncated timestamp (`mts` CTE) to
  * match Spark's nanos→micros read of the parquet (SURVEY.md §7.4).
  */
object CdcQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** op mapping used by every changelog-shaped query. */
  private def withOp(df: DataFrame): DataFrame =
    df.withColumn("op",
      when(col("event_type") === "error", "d")
        .when(col("event_type") === "purchase", "c")
        .when(col("event_type") === "signup", "r")
        .otherwise("u"))

  /** DuckDB-side prelude: events with the timestamp truncated to µs
    * exactly as Spark reads TIMESTAMP(NANOS) parquet.
    */
  private val mts =
    """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |                  user_id, event_type, value, props,
      |  CASE WHEN event_type = 'error' THEN 'd'
      |       WHEN event_type = 'purchase' THEN 'c'
      |       WHEN event_type = 'signup' THEN 'r'
      |       ELSE 'u' END AS op
      |  FROM events)""".stripMargin

  /** B19b's change-event shape: nullable payload (a truncate has no
    * images and no key), op ∈ {c,u,d,t}, ver = the source LSN.
    */
  case class TruncChange(ckey: Option[Long], name: Option[String],
                         bal: Option[Double], op: String, ver: Long)

  val customerRowSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B1+B2 — envelope JSON parse + ExtractNewRecordState round trip:
    // serialize customer rows into Debezium-style envelopes, parse them
    // back through the engine, flatten, and verify the original values.
    "b1_envelope_roundtrip" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val raw = c.select(to_json(struct(
        struct(c.columns.map(col).toIndexedSeq: _*).as("after"),
        struct(
          lit("graft").as("connector"), lit("db").as("db"),
          lit("public").as("schema"), lit("customer").as("table"),
          col("c_custkey").as("lsn"), lit(true).as("snapshot"),
          lit(1700000000000L).as("ts_ms")).as("source"),
        lit("r").as("op"),
        lit(1700000000000L).as("ts_ms"))).as("value"))
      Envelope.extractNewRecordState(Envelope.parse(raw, customerRowSchema))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("__op"), col("__deleted"))
        .orderBy(col("c_custkey"))
    }),

    // B13 — dead-letter routing (round 11): a deterministic 1/13th of
    // the envelopes arrive truncated mid-object (the torn-record /
    // producer-bug case); parseWithDeadLetter routes them to a
    // quarantine frame instead of silently dropping them or poisoning
    // the typed stream. Output = every cleanly-parsed row + one
    // dead-letter tally row — both exact.
    "b13_dead_letter" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val raw = c.select(to_json(struct(
        struct(c.columns.map(col).toIndexedSeq: _*).as("after"),
        struct(
          lit("graft").as("connector"), lit("db").as("db"),
          lit("public").as("schema"), lit("customer").as("table"),
          col("c_custkey").as("lsn"), lit(true).as("snapshot"),
          lit(1700000000000L).as("ts_ms")).as("source"),
        lit("r").as("op"),
        lit(1700000000000L).as("ts_ms"))).as("value"),
        col("c_custkey").as("__k"))
      val mangled = raw.select(
        when(col("__k") % 13 === 0, substring(col("value"), 1, 10))
          .otherwise(col("value")).as("value"))
      val (ok, dead) = Envelope.parseWithDeadLetter(mangled, customerRowSchema)
      val okOut = Envelope.extractNewRecordState(ok)
        .select(lit("ok").as("kind"), col("c_custkey").as("key"),
          col("c_name").as("payload"))
      val deadOut = dead.agg(count(lit(1)).as("__n"))
        .select(lit("dead").as("kind"), lit(null).cast("long").as("key"),
          col("__n").cast("string").as("payload"))
      okOut.unionByName(deadOut).orderBy(col("kind"), col("key"))
    }),

    // B14 — Kafka TOMBSTONES (round 11): delete events arrive as
    // key+NULL-value compaction tombstones instead of delete
    // envelopes (the tombstone-only pipeline mode); parseWithTombstones
    // synthesizes op='d' rows from them, and the materialized state
    // must equal b5's envelope-only path EXACTLY — one oracle, two
    // delete encodings.
    "b14_tombstones" -> ((s, dir) => {
      val evs = withOp(t(s, dir, "events"))
      val eventsRowSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_id", LongType),
        StructField("value", DoubleType)))
      val records = evs.select(
        col("user_id").cast("string").as("key"),
        when(col("op") === "d", lit(null).cast("string")).otherwise(
          to_json(struct(
            struct(col("user_id"), col("event_id"), col("value")).as("after"),
            struct(
              lit("graft").as("connector"), lit("db").as("db"),
              lit("public").as("schema"), lit("events").as("table"),
              col("event_id").as("lsn"), lit(false).as("snapshot"),
              lit(1700000000000L).as("ts_ms")).as("source"),
            col("op").as("op"),
            lit(1700000000000L).as("ts_ms")))).as("value"),
        col("ts"), col("event_id").as("offset"))
      val parsed = Envelope.parseWithTombstones(records, eventsRowSchema)
      val typed = parsed.select(
        coalesce(col("after.user_id"), col("key").cast("long")).as("user_id"),
        col("after.event_id").as("last_event_id"),
        col("ts"), col("offset"), col("op"), col("after.value").as("value"))
      Materialize.changelog(typed, Seq("user_id"), Seq(col("ts"), col("offset")))
        .select(col("user_id"), col("last_event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy(col("user_id"))
    }),

    // B3+B4 — op filter + regex router
    "b3_op_filter_route" -> ((s, dir) => {
      val evs = withOp(t(s, dir, "events"))
      Envelope.route(
          Envelope.filterOps(evs, Seq("c", "u", "d")),
          "^(click|view)$", "engagement", col("event_type"))
        .select(col("event_id"), col("op"), col("route"))
        .orderBy(col("event_id"))
    }),

    // B5 — changelog → current state (latest per key wins, deletes drop)
    "b5_materialize" -> ((s, dir) => {
      Materialize.changelog(withOp(t(s, dir, "events")),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy(col("user_id"))
    }),

    // B6 — snapshot ∪ delta materialization (first half replayed as
    // op='r' snapshot, second half as live changes)
    "b6_snapshot_union" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val mid = (evs.agg(max(col("event_id"))).head().getLong(0) + 1L) / 2L
      val snapshot = evs.where(col("event_id") < mid).withColumn("op", lit("r"))
      val delta = withOp(evs.where(col("event_id") >= mid))
      Materialize.snapshotPlusDelta(snapshot, delta,
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"), col("op"))
        .orderBy(col("user_id"))
    }),

    // B15 — DBLog-style INCREMENTAL SNAPSHOT (round 15, the r14 verdict's
    // #2): re-snapshot a live table in key-ordered chunks interleaved
    // with its change stream. Chunk k's read happens at an advancing low
    // watermark lo(k) and returns the live table AS OF that position
    // (what a real chunk SELECT sees); the merge gives each chunk row
    // effective LSN lo(k), outranked by any in-window or later change
    // and outranking same-LSN changes (the read saw them) — the whole
    // DBLog dedup buffer as ONE keyed window. Output carries provenance
    // (src = chunk | stream), so the hash pins the dedup decision per
    // key, not just the converged values. The chunk assignment window
    // is output-sized (distinct keys) — the declared benign class; the
    // production path is the resumable cursor loop
    // (IncrementalSnapshot.snapshotChunks, kill-and-resume spec-pinned).
    "b15_incremental_snapshot" -> ((s, dir) => {
      import graft.cdc.IncrementalSnapshot
      val evs = withOp(t(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("value"), col("op"))
      val mm = evs.agg(max(col("event_id"))).head().getLong(0)
      val mid = (mm + 1L) / 2L
      val changes = evs.where(col("event_id") >= mid)
      val base = evs.where(col("event_id") < mid)
      val start = Materialize.latestByKey(base, Seq("user_id"), Seq(col("event_id")))
        .where(col("op") =!= "d").select("user_id")
      val nUsers = start.count()
      val chunkSize = math.max(1L, (nUsers + 5L) / 6L)
      val stp = (mm - mid + 2L) / 6L
      val wu = org.apache.spark.sql.expressions.Window.orderBy(col("user_id"))
      val asg = start
        .withColumn("__chunk",
          ((row_number().over(wu) - 1L) / lit(chunkSize)).cast("long"))
        .withColumn("__lo_lsn", lit(mid - 1L) + col("__chunk") * lit(stp))
      val chunkRows = Materialize.latestByKey(
          evs.join(asg, Seq("user_id")).where(col("event_id") <= col("__lo_lsn")),
          Seq("user_id"), Seq(col("event_id")))
        .where(col("op") =!= "d")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("value"), col("__lo_lsn"))
      IncrementalSnapshot.merge(chunkRows,
          changes.select(col("user_id"), col("event_id").as("last_event_id"),
            col("value"), col("op"), col("event_id").as("lsn")),
          Seq("user_id"), "lsn")
        .orderBy(col("user_id"))
    }),

    // B15b — the COMPOSITE-KEY incremental snapshot (round 16, the r15
    // verdict's #2): real CDC tables chunk over arbitrary primary keys,
    // not a single Long — here lineitem's (l_orderkey, l_linenumber).
    // Unlike the Long form, this query drives the REAL production loop:
    // snapshotChunksCk lands every chunk through the resumable
    // lexicographic cursor (6 bounded TakeOrdered reads), then the
    // state() merge folds in an overlapping synthetic change stream.
    // The oracle re-derives chunk assignment by key RANK — equal to the
    // cursor loop over a static table because each chunk takes exactly
    // the next chunkSize keys in lexicographic order.
    "b15_incremental_snapshot_ck" -> ((s, dir) => {
      import graft.cdc.IncrementalSnapshot
      // the synthetic lineitem is NOT unique on (okey, line) — build a
      // proper PK table first (max qty per key, both sides identically)
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(col("l_quantity")).cast("double").as("qty"))
        .localCheckpoint(true) // the chunk loop re-reads it per chunk
      val mm = li.agg(max(col("l_orderkey"))).head().getLong(0)
      val mid = (mm + 1L) / 2L
      val base = li.where(col("l_orderkey") < mid)
      val csz = math.max(1L, (base.count() + 5L) / 6L).toInt
      val st = java.nio.file.Files
        .createTempDirectory("graft-isnap-ck").toString
      val landed = IncrementalSnapshot.snapshotChunksCk(s, st, base,
        Seq("l_orderkey", "l_linenumber"), csz, cid => 1990L + 5L * cid)
      require(landed >= 1, "the ck snapshot loop must land chunks")
      val changes = li.where(pmod(col("l_orderkey"), lit(3L)) === 0L)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("qty") + 100.0d).as("qty"),
          when(pmod(col("l_orderkey") + col("l_linenumber"), lit(7L)) === 0L,
            "d").otherwise("u").as("op"),
          (lit(1985L) + pmod(col("l_orderkey"), lit(60L))).as("lsn"))
      IncrementalSnapshot.state(s, st, changes,
          Seq("l_orderkey", "l_linenumber"), "lsn")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B15c — the LIVE-interleaved incremental snapshot (▶ round 16, the
    // r15 verdict's #3, the actual DBLog promise): a MemoryStream
    // changelog drains through the REAL streaming engine in six
    // micro-batches, and between every pair of batches ONE cursor-paced
    // chunk of the live table (as of the batches applied so far) lands
    // through snapshotChunks(maxChunks=1), watermarked at the stream
    // head it read under; remaining chunks drain after the stream ends.
    // The hash pins the CONVERGENCE law — the merged state equals the
    // plain changelog materialization exactly, whatever the pacing —
    // while per-chunk watermark/provenance precedence is pinned by the
    // b15/b15_ck hashes and the interleave spec (chunk pacing chooses
    // WHICH chunk carries a key, so src/last_lsn are excluded here by
    // design).
    "b15_incremental_snapshot_live" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.cdc.{IncrementalSnapshot, Materialize}
      val evs = withOp(t(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("value"), col("op"))
      val mm = evs.agg(max(col("event_id"))).head().getLong(0)
      val mid = (mm + 1L) / 2L
      val stp = math.max(1L, (mm - mid + 2L) / 6L)
      def bound(k: Int): Long = if (k >= 5) mm else mid - 1L + (k + 1L) * stp
      def live(b: Long) =
        Materialize.latestByKey(evs.where(col("event_id") <= b),
            Seq("user_id"), Seq(col("event_id")))
          .where(col("op") =!= "d")
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("value"))
      val csz = math.max(1L,
        (evs.select(col("user_id")).distinct().count() + 5L) / 6L).toInt
      val st = java.nio.file.Files
        .createTempDirectory("graft-isnap-live").toString
      val chDir = java.nio.file.Files
        .createTempDirectory("graft-isnap-live-ch").toString + "/changes"
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-isnap-live-ckpt").toString
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Double, String)]
      val sinkFn: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (b, _) => b.write.mode("append").parquet(chDir)
      def drain(): Unit = {
        val q = src.toDS().toDF("event_id", "user_id", "value", "op")
          .writeStream
          .foreachBatch(sinkFn)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val changes = evs.where(col("event_id") >= mid)
        .as[(Long, Long, Double, String)].collect().sortBy(_._1)
      var delivered = 0
      for (k <- 0 until 6) {
        val upto = bound(k)
        val batch = changes.drop(delivered).takeWhile(_._1 <= upto)
        if (batch.nonEmpty) { src.addData(batch.toSeq); drain() }
        delivered += batch.length
        IncrementalSnapshot.snapshotChunks(s, st, live(upto), "user_id",
          csz, _ => upto, maxChunks = 1)
      }
      // the snapshot outlives the stream: drain the rest at the head
      IncrementalSnapshot.snapshotChunks(s, st, live(mm), "user_id",
        csz, _ => mm)
      val chRead = s.read.parquet(chDir)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("value"), col("op"), col("event_id").as("lsn"))
      IncrementalSnapshot.state(s, st, chRead, Seq("user_id"), "lsn")
        .select(col("user_id"), col("last_event_id"), col("value"))
        .orderBy(col("user_id"))
    }),

    // B16 — the SIGNAL protocol driving incremental snapshots (round 16;
    // Debezium's execute/stop/pause/resume-snapshot signal rows): a
    // deterministic signal script walks the whole protocol over TWO
    // collections — execute-snapshot [customer, supplier]; two paced
    // turns into customer; pause (a turn lands ZERO); resume; customer
    // drains and pops; supplier lands two chunks; stop-snapshot ends it.
    // Final state: customer fully converged with its change stream,
    // supplier covered only by the chunks the protocol let land (rank ≤
    // 2·csz) merged with ALL its changes — the oracle re-derives both
    // collections' chunk assignment by key rank and replays the same
    // (lsn, side) precedence merge.
    "b16_signal_snapshot" -> ((s, dir) => {
      import graft.cdc.Signals
      val root = java.nio.file.Files
        .createTempDirectory("graft-signals").toString
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"))
      val su = t(s, dir, "supplier").select(col("s_suppkey").as("ckey"),
        col("s_name").as("name"), col("s_acctbal").cast("double").as("bal"))
      val tables = Map("customer" -> cu, "supplier" -> su)
      val csz = tables.map { case (n, df) =>
        n -> math.max(1L, (df.count() + 5L) / 6L).toInt
      }
      def sig(rows: Seq[(String, String, String, Long)]) = {
        import s.implicits._
        rows.toDF("id", "type", "data", "lsn")
      }
      def turn() = Signals.turn(s, root, tables, _ => Seq("ckey"), csz,
        (n, cid) => (if (n == "customer") 1990L else 2990L) + 5L * cid,
        maxChunks = 2)
      Signals.applySignals(s, root, sig(Seq(("s1", "execute-snapshot",
        """{"data-collections":["customer","supplier"]}""", 1L))))
      require(turn() == 2, "turn 1 must land two customer chunks")
      Signals.applySignals(s, root,
        sig(Seq(("s2", "pause-snapshot", null, 2L))))
      require(turn() == 0, "a paused turn must land nothing")
      Signals.applySignals(s, root,
        sig(Seq(("s3", "resume-snapshot", null, 3L))))
      require(turn() == 2 && turn() == 2, "customer drains in two more turns")
      require(turn() == 0, "the exhausted head pops on its empty turn")
      require(turn() == 2, "supplier lands two chunks")
      Signals.applySignals(s, root, sig(Seq(("s4", "stop-snapshot",
        """{"data-collections":["supplier"]}""", 4L))))
      require(turn() == 0, "a stopped snapshot lands nothing")
      def changes(df: DataFrame, m: Long, dm: Long, delta: Double,
                  lsn0: Long, lm: Long) = df.select(col("ckey"), col("name"),
        (col("bal") + delta).as("bal"),
        when(pmod(col("ckey"), lit(dm)) === 0L, "d").otherwise("u").as("op"),
        (lit(lsn0) + pmod(col("ckey"), lit(lm))).as("lsn"))
        .where(pmod(col("ckey"), lit(m)) === 0L)
      val cs = Signals.collectionState(s, root, "customer",
          changes(cu, 3L, 7L, 100.0d, 1985L, 60L), Seq("ckey"), "lsn")
        .withColumn("collection", lit("customer"))
      val ss = Signals.collectionState(s, root, "supplier",
          changes(su, 2L, 5L, 50.0d, 2985L, 20L), Seq("ckey"), "lsn")
        .withColumn("collection", lit("supplier"))
      cs.unionByName(ss)
        .select(col("collection"), col("ckey"), col("name"), col("bal"),
          col("last_lsn"), col("src"))
        .orderBy(col("collection"), col("ckey"))
    }),

    // B16b — the ▶ LIVE signal protocol (round 16): signals AND changes
    // both arrive through the real streaming engine. A control
    // MemoryStream drains signal batches via foreachBatch→applySignals
    // (the production wiring: the signal table IS a changelog topic); a
    // data MemoryStream drains customer changes in six micro-batches;
    // between batches the applied signals gate turn() over the LIVE
    // table (base + changes applied so far). execute lands mid-stream,
    // pause covers exactly one batch window, customer drains to done,
    // supplier is STOPPED after two chunks. The hash pins the two
    // collections' CONVERGED state — customer equals its changelog
    // materialization whatever the pacing (so last_lsn/src are excluded
    // by design, as in b15_live), supplier equals exactly the
    // rank ≤ 2·csz coverage the protocol allowed — while the pacing
    // itself is pinned by the in-query require()s and SignalsSpec.
    "b16_signal_snapshot_live" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.cdc.Signals
      val root = java.nio.file.Files
        .createTempDirectory("graft-signals-live").toString
      val chDir = java.nio.file.Files
        .createTempDirectory("graft-signals-live-ch").toString + "/changes"
      val ckpt1 = java.nio.file.Files
        .createTempDirectory("graft-signals-live-ck1").toString
      val ckpt2 = java.nio.file.Files
        .createTempDirectory("graft-signals-live-ck2").toString
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"))
      val su = t(s, dir, "supplier").select(col("s_suppkey").as("ckey"),
        col("s_name").as("name"), col("s_acctbal").cast("double").as("bal"))
      // one change per customer key ≡ a changelog with a trivial latest
      val allCh = cu.where(pmod(col("ckey"), lit(3L)) === 0L)
        .select(col("ckey"), col("name"), (col("bal") + 100.0d).as("bal"),
          when(pmod(col("ckey"), lit(7L)) === 0L, "d").otherwise("u").as("op"),
          (lit(1985L) + pmod(col("ckey"), lit(60L))).as("lsn"))
        .as[(Long, String, Double, String, Long)].collect().sortBy(_._5)
      // the LIVE table: base with every change applied as of the drained
      // batches (deletes drop) — what a chunk SELECT sees mid-stream
      def live(): DataFrame = {
        val ch = s.read.parquet(chDir)
          .select(col("ckey").as("__k"), col("bal").as("__b"), col("op").as("__o"))
        cu.join(ch, col("ckey") === col("__k"), "left")
          .where(col("__o").isNull || col("__o") =!= "d")
          .select(col("ckey"), col("name"),
            coalesce(col("__b"), col("bal")).as("bal"))
      }
      val dataSrc = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double, String, Long)]
      val sigSrc = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String, String, Long)]
      // the change sink rides the blocking-drain gate (r17): serialized
      // with this root's turns — a no-op here (turns run between drains)
      // but exactly the production wiring the gate contract documents
      val chSink: (DataFrame, Long) => Unit =
        graft.streaming.Ingest.gatedChangeSink(root)(
          (b, _) => b.write.mode("append").parquet(chDir))
      def drainData(): Unit = {
        val q = dataSrc.toDS().toDF("ckey", "name", "bal", "op", "lsn")
          .writeStream.foreachBatch(chSink)
          .option("checkpointLocation", ckpt1)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val sigSink: (DataFrame, Long) => Unit =
        // lenient = the stream wiring mode (r17): one malformed operator
        // row logs and skips instead of failing this batch on every retry
        (b, _) => Signals.applySignals(s, root, b, lenient = true)
      def drainSignals(): Unit = {
        val q = sigSrc.toDS().toDF("id", "type", "data", "lsn")
          .writeStream
          .foreachBatch(sigSink)
          .option("checkpointLocation", ckpt2)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val tables: String => DataFrame =
        n => if (n == "customer") live() else su
      val csz = Map(
        "customer" -> math.max(1L, (cu.count() + 5L) / 6L).toInt,
        "supplier" -> math.max(1L, (su.count() + 5L) / 6L).toInt)
      var head = 1984L
      def turn() = Signals.turn(s, root, tables, _ => Seq("ckey"), csz,
        (n, cid) => if (n == "customer") head else 2990L + 5L * cid,
        maxChunks = 2)
      var delivered = 0
      def feed(upto: Long): Unit = {
        val batch = allCh.drop(delivered).takeWhile(_._5 <= upto)
        if (batch.nonEmpty) { dataSrc.addData(batch.toSeq); drainData() }
        delivered += batch.length; head = upto
      }
      sigSrc.addData(("s1", "execute-snapshot",
        """{"data-collections":["customer","supplier"]}""", 1L))
      drainSignals()
      feed(1995L); require(turn() == 2, "live turn 1: two customer chunks")
      sigSrc.addData(("s2", "pause-snapshot", null, 2L)); drainSignals()
      feed(2005L); require(turn() == 0, "the paused batch window lands nothing")
      sigSrc.addData(("s3", "resume-snapshot", null, 3L)); drainSignals()
      feed(2015L); require(turn() == 2, "live turn 3: chunks 2-3")
      feed(2030L); require(turn() == 2, "live turn 4: chunks 4-5")
      feed(2044L); require(turn() == 0, "customer exhausted: the empty turn pops")
      require(turn() == 2, "supplier lands two chunks")
      sigSrc.addData(("s4", "stop-snapshot",
        """{"data-collections":["supplier"]}""", 4L))
      drainSignals()
      require(turn() == 0, "stopped: nothing further lands")
      require(delivered == allCh.length, "every change drained through the stream")
      val chRead = s.read.parquet(chDir)
        .select(col("ckey"), col("name"), col("bal"), col("op"), col("lsn"))
      val noCh = chRead.limit(0)
      val cs = Signals.collectionState(s, root, "customer", chRead,
          Seq("ckey"), "lsn").withColumn("collection", lit("customer"))
      val ss = Signals.collectionState(s, root, "supplier", noCh,
          Seq("ckey"), "lsn").withColumn("collection", lit("supplier"))
      cs.unionByName(ss)
        .select(col("collection"), col("ckey"), col("name"), col("bal"))
        .orderBy(col("collection"), col("ckey"))
    }),

    // B15d — ▶ the FULL consumer: incremental-snapshot chunks AND the
    // live change stream both flow through the A8 bucketed upsert sink
    // into ONE queryable table (what a production Debezium consumer
    // actually maintains while a re-snapshot is in flight). The DBLog
    // (lsn, side) precedence is encoded as a single upsert version
    // `__v = lsn·2 + side` (side < 2 makes it order-isomorphic to the
    // lexicographic pair), so the sink's latest-per-key merge IS the
    // B15 merge; chunk batches land between real micro-batches and
    // upsert at their low watermark. The hash pins convergence of the
    // PERSISTED table — the dynamic-overwrite bucket merge under
    // interleaved snapshot traffic — to the changelog materialization.
    "b15_snapshot_upsert" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.cdc.IncrementalSnapshot
      import graft.streaming.Sinks
      val st = java.nio.file.Files
        .createTempDirectory("graft-isnap-up").toString
      val target = java.nio.file.Files
        .createTempDirectory("graft-isnap-up-t").toString + "/table"
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-isnap-up-ckpt").toString
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"))
      val allCh = cu.where(pmod(col("ckey"), lit(3L)) === 0L)
        .select(col("ckey"), col("name"), (col("bal") + 100.0d).as("bal"),
          when(pmod(col("ckey"), lit(7L)) === 0L, "d").otherwise("u").as("op"),
          (lit(1985L) + pmod(col("ckey"), lit(60L))).as("lsn"))
        .as[(Long, String, Double, String, Long)].collect().sortBy(_._5)
      def live(): DataFrame = {
        val ch = s.read.parquet(s"$target")
        // the source table as of the applied changes: derive it from the
        // change rows already upserted (op != null marks stream rows)
        val applied = ch.where(col("op") =!= "r")
          .select(col("ckey").as("__k"), col("bal").as("__b"), col("op").as("__o"))
        cu.join(applied, col("ckey") === col("__k"), "left")
          .where(col("__o").isNull || col("__o") =!= "d")
          .select(col("ckey"), col("name"),
            coalesce(col("__b"), col("bal")).as("bal"))
      }
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double, String, Long)]
      def drain(): Unit = {
        val q = Sinks.foreachBatchUpsert(
          src.toDS().toDF("ckey", "name", "bal", "op", "lsn")
            .withColumn("__v", col("lsn") * 2L),
          target, ckpt, Seq("ckey"), "__v", nBuckets = 8)
        q.awaitTermination()
      }
      val csz = math.max(1L, (cu.count() + 5L) / 6L).toInt
      def landOne(upto: Long): Int = {
        val before = IncrementalSnapshot.cursor(s, st).map(_._1).getOrElse(0L)
        val n = IncrementalSnapshot.snapshotChunks(s, st, live(), "ckey",
          csz, _ => upto, maxChunks = 1)
        if (n > 0) {
          val after = IncrementalSnapshot.cursor(s, st).map(_._1).getOrElse(0L)
          val rows = s.read.parquet(s"$st/chunks")
            .where(col("__chunk") >= before && col("__chunk") < after)
          Sinks.applyUpsertBatch(rows.select(col("ckey"), col("name"),
              col("bal"), lit("r").as("op"), col("__lo_lsn").as("lsn"),
              (col("__lo_lsn") * 2L + 1L).as("__v")),
            target, Seq("ckey"), "__v", nBuckets = 8)
        }
        n
      }
      val mm = 1985L + 59L
      val stp = 10L
      var delivered = 0
      var head = 1984L
      for (k <- 0 until 6) {
        val upto = if (k >= 5) mm else 1985L + (k + 1L) * stp
        val batch = allCh.drop(delivered).takeWhile(_._5 <= upto)
        if (batch.nonEmpty) { src.addData(batch.toSeq); drain() }
        delivered += batch.length; head = upto
        landOne(head)
      }
      require(delivered == allCh.length, "every change drained into the sink")
      // the snapshot outlives the stream: drain remaining chunks at head
      while (landOne(mm) > 0) {}
      Sinks.currentState(s, target)
        .select(col("ckey"), col("name"), col("bal"))
        .orderBy(col("ckey"))
    }),

    // B16c — additional-conditions: a partial re-snapshot by predicate.
    // execute-snapshot carries a per-collection SQL filter that composes
    // INTO the chunk SELECT (under the key-range resume predicate), so
    // only matching rows ever move; chunk assignment ranks over the
    // FILTERED key space. A blocking execute drains it in one turn. The
    // hash pins coverage (exactly the matching keys), the per-chunk
    // watermarks over filtered ranks, and provenance.
    "b16_signal_snapshot_cond" -> ((s, dir) => {
      import graft.cdc.Signals
      val root = java.nio.file.Files
        .createTempDirectory("graft-signals-cond").toString
      val su = t(s, dir, "supplier").select(col("s_suppkey").as("ckey"),
        col("s_name").as("name"), col("s_acctbal").cast("double").as("bal"))
      val csz = math.max(1L,
        (su.where(pmod(col("ckey"), lit(2L)) === 0L).count() + 5L) / 6L).toInt
      def sig(rows: Seq[(String, String, String, Long)]) = {
        import s.implicits._
        rows.toDF("id", "type", "data", "lsn")
      }
      Signals.applySignals(s, root, sig(Seq(("s1", "execute-snapshot",
        """{"data-collections":["supplier"],"type":"blocking",
          |"additional-conditions":[
          |  {"data-collection":"supplier","filter":"ckey % 2 = 0"}]}"""
          .stripMargin.replace("\n", ""), 1L))))
      val landed = Signals.turn(s, root, _ => su, _ => Seq("ckey"),
        _ => csz, (_, cid) => 2990L + 5L * cid, maxChunks = 1)
      require(landed >= 1, "the blocking turn must drain the filtered table")
      require(Signals.state(s, root).done == Seq("supplier"),
        "blocking: one turn completes the collection")
      val noCh = su.limit(0).select(col("ckey"), col("name"), col("bal"),
        lit("u").as("op"), lit(0L).as("lsn"))
      Signals.collectionState(s, root, "supplier", noCh, Seq("ckey"), "lsn")
        .select(col("ckey"), col("name"), col("bal"), col("last_lsn"), col("src"))
        .orderBy(col("ckey"))
    }),

    // B17 — queryable SCHEMA HISTORY (r17): the DDL decisions the engine
    // enforces — A8 upsert pin/widen/refuse, B15 chunk-schema pin/refuse
    // — land as readable events under the state they protected. The
    // script drives a widening sequence through the REAL upsert sink
    // (three batches growing the column set, then a narrowing refusal)
    // and a mid-snapshot DDL refusal through the REAL B15 landing; the
    // hash pins the full log: event order, canonical old/new schema
    // strings, and the data-dependent batch row counts the oracle
    // re-derives from the customer table.
    "b17_schema_history" -> ((s, dir) => {
      import graft.cdc.SchemaHistory
      val (target, snap) = schemaHistoryScript(s, dir)
      SchemaHistory.read(s, target).withColumn("scope", lit("upsert"))
        .unionByName(SchemaHistory.read(s, snap)
          .withColumn("scope", lit("snapshot")))
        .select(col("scope"), col("seq"), col("action"),
          col("old_schema"), col("new_schema"), col("n_rows"))
        .orderBy(col("scope"), col("seq"))
    }),

    // B17b — ▶ the history consumed as a STREAM [PK: Debezium's
    // schema-history topic is replayed as a stream]: the same scripted
    // DDL sequence, but the log is read back through the REAL file
    // source (one event file per append = one row per micro-batch
    // element) and drained into a memory sink. Same oracle as b17 —
    // the stream must deliver exactly the batch log.
    "b17_schema_history_stream" -> ((s, dir) => {
      import graft.cdc.SchemaHistory
      val (target, snap) = schemaHistoryScript(s, dir)
      def drain(root: String, scope: String): DataFrame = {
        val q = SchemaHistory.stream(s, root)
          .withColumn("scope", lit(scope))
          .writeStream.format("memory")
          .queryName(s"graft_shist_${scope}_${System.nanoTime() % 100000}")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory(s"graft-shist-ckpt-$scope").toString)
          .start()
        q.awaitTermination()
        s.table(q.name)
      }
      drain(target, "upsert").unionByName(drain(snap, "snapshot"))
        .select(col("scope"), col("seq"), col("action"),
          col("old_schema"), col("new_schema"), col("n_rows"))
        .orderBy(col("scope"), col("seq"))
    }),

    // B16e — ▶ the FILE signal channel (r18) [PK: Debezium's signal
    // channels are pluggable — file beside table]: signals dropped as
    // claim-sequenced JSON files drive the protocol through a REAL
    // file-source stream (fileChannel → foreachBatch applySignals,
    // lenient), with paced turns between drains. The result is the
    // operator-facing progress readout — queued → paused (lands
    // nothing) → resumed → drained → done — with the landed coverage
    // re-derived by the oracle from the table.
    "b16_signal_file_channel" -> ((s, dir) => {
      import graft.cdc.Signals
      val root = java.nio.file.Files
        .createTempDirectory("graft-sig-file").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sig-file-ckpt").toString
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"))
      val csz = cu.count().toInt // one chunk — the plan is deterministic
      def drain(): Unit = {
        val q = Signals.fileChannel(s, root)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            Signals.applySignals(s, root, b, lenient = true): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def turn(): Int = Signals.turn(s, root, _ => cu, _ => Seq("ckey"),
        _ => csz, (_, cid) => 100L + cid, maxChunks = 1)
      Signals.dropSignal(s, root, "f1", "execute-snapshot",
        """{"data-collections":["customer"]}""")
      Signals.dropSignal(s, root, "f2", "pause-snapshot", null)
      drain()
      require(turn() == 0, "paused via the file channel: nothing lands")
      Signals.dropSignal(s, root, "f3", "resume-snapshot", null)
      drain()
      require(turn() == 1, "resumed: the single chunk lands")
      require(turn() == 0, "exhausted: the empty turn pops to done")
      Signals.progress(s, root)
        .select(col("collection"), col("phase"),
          col("chunks_landed"), col("rows_landed"))
        .orderBy(col("collection"))
    }),

    // B18 — the NOTIFICATION CHANNEL (r18): a scripted signal-protocol
    // walk — execute → drain → pause/resume → complete → partial stop →
    // re-execute → stop-all — whose lifecycle events land as one file
    // each under the state root and read back as the ordered log
    // (started / chunk-landed / completed / stopped / aborted / paused /
    // resumed, with each collection's landed coverage). The chunk plan
    // is pinned by construction (customer = 1 chunk, supplier = 2) so
    // the event list is exact at any SF; the oracle re-derives the row
    // counts from the tables.
    "b18_notifications" -> ((s, dir) => {
      val root = notificationsScript(s, dir)
      graft.cdc.Notifications.read(s, root)
        .select(col("seq"), col("type"), col("collection"),
          col("chunks_landed"), col("rows_landed"))
        .orderBy(col("seq"))
    }),

    // B18b — ▶ the channel consumed as a STREAM [PK: Debezium
    // notifications go to a consumable topic]: the same scripted walk,
    // read back through the REAL file source (one event file = one
    // streamed row) into a memory sink. Same oracle as b18.
    "b18_notifications_stream" -> ((s, dir) => {
      val root = notificationsScript(s, dir)
      val q = graft.cdc.Notifications.stream(s, root)
        .writeStream.format("memory")
        .queryName(s"graft_notif_${System.nanoTime() % 100000}")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-notif-ckpt").toString)
        .start()
      q.awaitTermination()
      s.table(q.name)
        .select(col("seq"), col("type"), col("collection"),
          col("chunks_landed"), col("rows_landed"))
        .orderBy(col("seq"))
    }),

    // B19 — TRUNCATE events (r19, the r18 verdict's #4) [PK: Debezium
    // emits op='t' for TRUNCATE TABLE on supported connectors; the event
    // has no images and no key — it addresses the whole table]: the
    // events changelog gets one synthetic truncate at the midpoint LSN;
    // materialization clears the whole key-space at that position —
    // earlier rows lose (whatever their key; users whose every event
    // predates the truncate vanish), later rows win, the row AT the
    // truncate's own version goes to the truncate. The oracle re-derives
    // truncate-then-resume as a plain post-cutoff materialization.
    "b19_truncate" -> ((s, dir) => {
      val evs = withOp(t(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("value"), col("op"))
      val mid = (evs.agg(max(col("event_id"))).head().getLong(0) + 1L) / 2L
      val trunc = s.range(1).select(lit(mid).as("event_id"),
        lit(null).cast("long").as("user_id"),
        lit(null).cast("double").as("value"), lit("t").as("op"))
      Materialize.changelogWithTruncates(evs.unionByName(trunc),
          Seq("user_id"), Seq(col("event_id")), col("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("value"))
        .orderBy(col("user_id"))
    }),

    // B19b — ▶ TRUNCATE through the REAL streaming upsert sink: three
    // ordered micro-batches — full snapshot (ver 100), truncate (ver
    // 200) + re-inserts (ver 300), then a STRAGGLER batch versioned
    // BEFORE the truncate (ver 150) that must not resurrect the cleared
    // key-space (the sink's persisted truncate floor, not just the
    // in-batch cutoff). Final state = exactly the re-inserted keys.
    "b19_truncate_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.Sinks
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"))
      def rowsOf(df: DataFrame, op: String, ver: Long) = df.collect().map(r =>
        TruncChange(Option(r.getLong(0)), Option(r.getString(1)),
          Option(r.getDouble(2)), op, ver)).toSeq
      val snapshot = rowsOf(cu, "c", 100L)
      val reinserts = rowsOf(cu.where(pmod(col("ckey"), lit(4L)) === 0L)
        .withColumn("bal", col("bal") + 7.0d), "c", 300L)
      val stragglers = rowsOf(cu.where(pmod(col("ckey"), lit(5L)) === 0L)
        .withColumn("bal", col("bal") + 999.0d), "u", 150L)
      val truncate = TruncChange(None, None, None, "t", 200L)
      val target = java.nio.file.Files
        .createTempDirectory("graft-b19-target").toString + "/state"
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-b19-ckpt").toString
      val source = MemoryStream[TruncChange]
      source.addData(snapshot)
      source.addData(truncate +: reinserts)
      source.addData(stragglers)
      val q = Sinks.foreachBatchUpsertTruncates(source.toDS().toDF(), target,
        ckpt, keyCols = Seq("ckey"), versionCol = "ver")
      q.awaitTermination()
      Sinks.currentState(s, target)
        .select(col("ckey"), col("name"), col("bal"))
        .orderBy(col("ckey"))
    }),

    // B19d — TRUNCATE mid-INCREMENTAL-SNAPSHOT (r19): the DBLog merge
    // reconciled against a truncate the chunk reads straddle. Chunks of
    // orders land at watermarks 100/200/300 (key mod 3 picks the chunk);
    // the change stream carries a pre-truncate update (lsn 150), the
    // truncate (lsn 200), post-truncate re-inserts (lsn 250) and deletes
    // (lsn 400). The plain merge would resurrect every pre-truncate
    // chunk row — a truncate has no per-key deletes to outrank them —
    // so mergeWithTruncates discards BOTH sides at or below the cutoff
    // (safe: anything live after the truncate re-arrives as a post-T
    // insert). Survivors: the lo=300 chunk plus the post-truncate
    // stream, minus the deletes. The oracle re-derives the window merge
    // over the post-cutoff slice.
    "b19_truncate_in_snapshot" -> ((s, dir) => {
      import graft.cdc.IncrementalSnapshot
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        col("o_totalprice").cast("double").as("price"))
      val chunks = base.withColumn("__lo_lsn",
        lit(100L) + pmod(col("okey"), lit(3L)) * lit(100L))
      val upd = base.where(pmod(col("okey"), lit(5L)) === 0L)
        .select(col("okey"), (col("price") + 1000.0d).as("price"),
          lit(150L).as("lsn"), lit("u").as("op"))
      val rein = base.where(pmod(col("okey"), lit(3L)) === 0L &&
          pmod(col("okey"), lit(7L)) === 0L)
        .select(col("okey"), (col("price") + 500.0d).as("price"),
          lit(250L).as("lsn"), lit("c").as("op"))
      val del = base.where(pmod(col("okey"), lit(11L)) === 0L)
        .select(col("okey"), lit(null).cast("double").as("price"),
          lit(400L).as("lsn"), lit("d").as("op"))
      val trunc = s.range(1).select(lit(null).cast("long").as("okey"),
        lit(null).cast("double").as("price"), lit(200L).as("lsn"),
        lit("t").as("op"))
      IncrementalSnapshot.mergeWithTruncates(
          chunks, upd.unionByName(rein).unionByName(del).unionByName(trunc),
          Seq("okey"), "lsn")
        .orderBy(col("okey"))
    }),

    // B19c — ▶ the PLATFORM WALK (r19, the r18 verdict's #6): every layer
    // of the consumer story composed under ONE root and pinned by ONE
    // hash. File-channel signals (execute WITH additional-conditions →
    // pause → resume) drive a paced, epoch-fenced incremental snapshot of
    // the even customer keys; each landed chunk AND a live change stream
    // (two real foreachBatch drains through the blocking-drain gate, the
    // second widened by a new column) upsert into ONE CLUSTERED catalog
    // table under the DBLog __v = lsn·2+side precedence; B18
    // notifications narrate the lifecycle (paused → resumed → started →
    // heartbeats → table-scan-completed → aggregate completed); B17
    // schema history records the pin and the widen at the table's
    // location; and the report — a q03-shaped join-agg of orders against
    // the materialized state — runs over the result. The output unions
    // all three observable records (report + notification log + schema
    // log) into one frame the oracle re-derives in a single DuckDB query.
    "b19_platform_walk" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.cdc.{IncrementalSnapshot, SchemaHistory, Signals}
      import graft.streaming.{Ingest, Sinks}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val root = java.nio.file.Files
        .createTempDirectory("graft-b19-walk").toString
      val table = s"b19_walk_state_${System.nanoTime() % 1000000}"
      s.sql(s"DROP TABLE IF EXISTS $table")
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"),
        col("c_mktsegment").as("seg"))
      val nEven = cu.where(pmod(col("ckey"), lit(2L)) === 0L).count()
      val csz = ((nEven + 1L) / 2L).toInt // exactly two chunks
      val epoch = Signals.acquireWriter(s, root)
      // live changes: keys ≡0 (mod 3) move (+100, or die when also ≡0 mod
      // 21), versioned ABOVE every chunk watermark so they win the merge
      // whatever the interleaving; the second (late) half carries a NEW
      // column the sink must widen for
      val ch = cu.where(pmod(col("ckey"), lit(3L)) === 0L)
        .select(col("ckey"), col("name"), (col("bal") + 100.0d).as("bal"),
          col("seg"),
          when(pmod(col("ckey"), lit(21L)) === 0L, "d").otherwise("u").as("op"),
          ((lit(2000L) + pmod(col("ckey"), lit(50L))) * 2L).as("__v"))
      val narrow = ch.where(col("__v") < 2L * 2025L)
        .as[(Long, String, Double, String, String, Long)].collect().toSeq
      val wide = ch.where(col("__v") >= 2L * 2025L)
        .withColumn("vip", pmod(col("ckey"), lit(2L)))
        .as[(Long, String, Double, String, String, Long, Long)].collect().toSeq
      val upsert: (DataFrame, Long) => Unit = Ingest.gatedChangeSink(root)(
        (b, _) => Sinks.applyUpsertBatchClustered(b, table,
          Seq("ckey"), "__v", Seq("ckey"), nBuckets = 4, nKbParts = 8))
      def drainChanges[T](rows: Seq[T], names: Seq[String])(
          implicit enc: org.apache.spark.sql.Encoder[T]): Unit = {
        val src = MemoryStream[T]
        src.addData(rows)
        val q = src.toDS().toDF(names: _*).writeStream.foreachBatch(upsert)
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft-b19-walk-ck").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // the signal leg: operator drops on the FILE channel, drained
      // through the real file source into lenient, epoch-fenced applies
      val sigCkpt = java.nio.file.Files
        .createTempDirectory("graft-b19-walk-sig").toString
      def drainSignals(): Unit = {
        val q = Signals.fileChannel(s, root).writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            Signals.applySignals(s, root, b, lenient = true,
              epoch = Some(epoch)): Unit
          }
          .option("checkpointLocation", sigCkpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def turn(): Int = Signals.turn(s, root, _ => cu, _ => Seq("ckey"),
        _ => csz, (_, cid) => 1990L + 5L * cid, maxChunks = 1,
        epoch = Some(epoch))
      // each landed chunk flows into the SAME clustered table at its low
      // watermark (side 1 → __v = lo·2+1, outranked by any same-or-later
      // change — the B15 precedence as one upsert version)
      def upsertLandedChunks(before: Long): Unit = {
        val cp = Signals.collectionPath(root, "customer")
        val after = IncrementalSnapshot.cursorStats(s, cp)
          .map(_._1).getOrElse(0L)
        if (after > before) {
          val rows = s.read.parquet(s"$cp/chunks")
            .where(col("__chunk") >= before && col("__chunk") < after)
          Sinks.applyUpsertBatchClustered(
            rows.select(col("ckey"), col("name"), col("bal"), col("seg"),
              lit("r").as("op"), (col("__lo_lsn") * 2L + 1L).as("__v")),
            table, Seq("ckey"), "__v", Seq("ckey"), nBuckets = 4, nKbParts = 8)
        }
      }
      Signals.dropSignal(s, root, "w1", "execute-snapshot",
        """{"data-collections":["customer"],"additional-conditions":[
          |{"data-collection":"customer","filter":"ckey % 2 = 0"}]}"""
          .stripMargin.replace("\n", ""))
      Signals.dropSignal(s, root, "w2", "pause-snapshot", null)
      drainSignals()
      require(turn() == 0, "paused via the file channel: nothing lands")
      Signals.dropSignal(s, root, "w3", "resume-snapshot", null)
      drainSignals()
      require(turn() == 1, "chunk 0 of the conditioned snapshot lands")
      upsertLandedChunks(0L) // batch 0 PINS the table schema (B17)
      drainChanges(narrow,
        Seq("ckey", "name", "bal", "seg", "op", "__v"))
      require(turn() == 1, "chunk 1 lands after live traffic")
      upsertLandedChunks(1L)
      require(turn() == 0,
        "the emptying pop: table-scan-completed + aggregate completed")
      drainChanges(wide,
        Seq("ckey", "name", "bal", "seg", "op", "__v", "vip")) // B17 widen
      // the three observable records, one frame, one oracle
      val notif = graft.cdc.Notifications.read(s, root)
        .select(lit("notif").as("section"), col("type").as("a"),
          col("collection").as("b"), col("seq").as("n1"),
          col("chunks_landed").as("n2"),
          col("rows_landed").cast("double").as("d"))
      val hist = SchemaHistory.read(s, Sinks.tableLocation(s, table))
        .select(lit("schema").as("section"), col("action").as("a"),
          col("new_schema").as("b"), col("seq").as("n1"),
          col("n_rows").as("n2"), lit(null).cast("double").as("d"))
      val report = Sinks.currentStateClustered(s, table)
        .join(t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
          col("ckey") === col("o_custkey"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .select(lit("report").as("section"), col("seg").as("a"),
          lit(null).cast("string").as("b"), lit(null).cast("long").as("n1"),
          col("n_orders").as("n2"), col("revenue").as("d"))
      val out = notif.unionByName(hist).unionByName(report)
        .orderBy(col("section"), coalesce(col("n1"), lit(-1L)), col("a"))
        .localCheckpoint(true)
      s.sql(s"DROP TABLE IF EXISTS $table")
      out
    }),

    // B20 — ▶ HEARTBEATS + the consumer OFFSET LEDGER (r19) [PK:
    // Debezium's heartbeat records advance source offsets on QUIET
    // tables]: three micro-batches — full snapshot (lsns 1000+), a
    // sparse update wave (lsns 3000+), then a HEARTBEAT-ONLY batch at
    // lsn 5000 (the quiet window) — through the real heartbeat-aware
    // sink. The output pins both the materialized state AND the
    // ledger: it reads 5000, PAST every data lsn, proving the quiet
    // batch moved the retention floor without touching the table.
    "b20_heartbeat_ledger" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.Sinks
      val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
        col("c_name").as("name"), col("c_acctbal").cast("double").as("bal"))
      def rowsOf(df: DataFrame, op: String,
                 v: org.apache.spark.sql.Column): Seq[TruncChange] =
        df.withColumn("__v", v)
          .select(col("ckey"), col("name"), col("bal"), col("__v"))
          .as[(Long, String, Double, Long)].collect()
          .map(r => TruncChange(Some(r._1), Some(r._2), Some(r._3), op, r._4))
          .toSeq
      val snap = rowsOf(cu, "c", lit(1000L) + pmod(col("ckey"), lit(50L)))
      val upd = rowsOf(cu.where(pmod(col("ckey"), lit(5L)) === 0L)
          .withColumn("bal", col("bal") + 9.0d), "u",
        lit(3000L) + pmod(col("ckey"), lit(10L)))
      val target = java.nio.file.Files
        .createTempDirectory("graft-b20-target").toString + "/state"
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-b20-ckpt").toString
      val src = MemoryStream[TruncChange]
      src.addData(snap)
      src.addData(upd)
      src.addData(Seq(TruncChange(None, None, None, "h", 5000L)))
      val q = Sinks.foreachBatchUpsertHeartbeats(src.toDS().toDF(), target,
        ckpt, keyCols = Seq("ckey"), versionCol = "ver")
      q.awaitTermination()
      val ledger = Sinks.readOffsetLedger(s, target)
      require(ledger.contains(5000L),
        s"the quiet heartbeat must advance the ledger to 5000, got $ledger")
      Sinks.currentState(s, target)
        .select(lit("row").as("kind"), col("ckey").as("k"), col("bal"))
        .unionByName(s.range(1).select(lit("ledger").as("kind"),
          lit(ledger.get).as("k"), lit(null).cast("double").as("bal")))
        .orderBy(col("kind"), col("k"))
    }),

    // B11 — snapshot diff: re-derive a change feed from two customer
    // snapshots (overlap shifted + some balances touched → c/u/d mix)
    "b11_snapshot_diff" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val oldSnap = c.where(col("c_custkey") <= 1400L)
      val newSnap = c.where(col("c_custkey") > 100L)
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(10L)) === 0L, col("c_acctbal") + 1.0d)
            .otherwise(col("c_acctbal")))
      Materialize.snapshotDiff(oldSnap, newSnap, Seq("c_custkey"))
        .select(col("c_custkey"), col("op"), col("c_name"),
          col("c_acctbal").cast("double").as("bal"))
        .orderBy(col("c_custkey"))
    }),

    // B12 — SCD Type-2 history: every change event gets a validity
    // interval; the current row per key has valid_to IS NULL
    "b12_scd2" -> ((s, dir) => {
      Materialize.scd2(withOp(t(s, dir, "events")).where(col("user_id") < 50L),
          Seq("user_id"), col("event_id"), col("ts"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("valid_from")).as("vf_us"),
          unix_micros(col("valid_to")).as("vt_us"),
          col("is_current"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // B7 — outbox router: JSON payload extraction + route derivation
    "b7_outbox" -> ((s, dir) => {
      Envelope.outbox(t(s, dir, "events"), "props",
          StructType(Seq(StructField("k", IntegerType))),
          regexp_replace(col("event_type"), "^(click|view)$", "engagement"))
        .select(col("event_id"), col("route"), col("payload").getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    // B10 — field masking: salted-hash pseudonymization of c_name (stays
    // joinable), null-out of c_acctbal
    "b10_mask_fields" -> ((s, dir) => {
      val masked = Envelope.maskFields(t(s, dir, "customer"),
        Seq("c_name"), hashSalt = Some("graft:"))
      Envelope.maskFields(masked, Seq("c_acctbal"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // B8 — transaction assembly (per user per UTC day)
    "b8_txn_summary" -> ((s, dir) => {
      Envelope.transactionSummary(t(s, dir, "events"),
          concat_ws(":", col("user_id"), date_format(col("ts"), "yyyy-MM-dd")),
          unix_micros(col("ts")))
        .orderBy(col("tx_id"))
    }),

    // D8 — as-of join: for each purchase, the user's latest click
    // at-or-before it (union+window implementation — no join blowup)
    "d8_asof_join" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val purchases = evs.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = evs.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"), col("value").as("click_value"))
      Materialize.asofJoin(purchases, clicks, "user_id", "ts",
          "click_id", Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("click_id_asof"), col("click_value_asof"))
        .orderBy(col("event_id"))
    }),

    // D7 — range join: views within [purchase.ts - 5 min, purchase.ts]
    // for the same user (binned equi-join + residual, not a nested loop)
    "d7_range_join" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val views = evs.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val purchases = evs.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
        .withColumn("lo", col("p_ts") - expr("INTERVAL 5 MINUTES"))
        .withColumn("hi", col("p_ts"))
      Joins.rangeJoinBinned(views, purchases, "ts", "lo", "hi",
          binSeconds = 300, equiKeys = Seq("user_id"))
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view_id"))
        .orderBy(col("purchase_id"))
    }),

    // J1 — tumbling window aggregation (batch form of the streaming op)
    "j1_tumbling_window" -> ((s, dir) => {
      Streams.windowedCounts(t(s, dir, "events"), "ts", "1 hour",
          extraKeys = Seq("event_type"))
        .select(unix_micros(col("w_start")).as("w_start_us"), col("event_type"),
          col("n"), col("sum_value").cast("decimal(18,6)").cast("double").as("sum_value"))
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    // J2 — sliding window aggregation
    "j2_sliding_window" -> ((s, dir) => {
      Streams.windowedCounts(t(s, dir, "events"), "ts", "1 hour",
          slide = Some("30 minutes"))
        .select(unix_micros(col("w_start")).as("w_start_us"), col("n"))
        .orderBy(col("w_start_us"))
    }),

    // J3 — session windows (30-minute gap per user)
    "j3_session_window" -> ((s, dir) => {
      Streams.sessionized(t(s, dir, "events"), "ts", "30 minutes", Seq("user_id"))
        .select(col("user_id"), unix_micros(col("s_start")).as("s_start_us"),
          unix_micros(col("s_end")).as("s_end_us"), col("n_events"),
          col("sum_value").cast("decimal(18,6)").cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("s_start_us"))
    }),

    // J11 — sessionized user journeys: per-session ordered event-type
    // paths, then the corpus-wide top-20 paths — session_window composed
    // with LISTAGG WITHIN GROUP, the product-analytics "path analysis"
    // query. Oracle rebuilds sessions with the lag/cumsum idiom.
    "j11_session_paths" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql("""SELECT path, count(*) AS n FROM (
                 SELECT user_id,
                        listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id) AS path
                 FROM events
                 GROUP BY session_window(ts, '30 minutes'), user_id)
               GROUP BY path ORDER BY n DESC, path LIMIT 20""")
    }),

    // J12 — funnel analysis: users reaching signup → click-after-signup →
    // purchase-after-that-click. Each stage is one keyed min-aggregate +
    // a broadcastable join of per-user stage times — no window over the
    // raw event stream, so the plan scales as three shuffles of (user,
    // ts) pairs, not event data.
    "j12_funnel" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val s1 = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = e.where(col("event_type") === "click")
        .join(s1, Seq("user_id")).where(col("ts") >= col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = e.where(col("event_type") === "purchase")
        .join(s2, Seq("user_id")).where(col("ts") >= col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_signup"))
        .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
        .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
        .select(col("stage"), col("n"))
        .orderBy(col("stage"))
    }),

    // J6 — stream-static enrichment join (dim broadcast)
    "j6_stream_static_join" -> ((s, dir) => {
      val evs = t(s, dir, "events").withColumn("c_custkey", col("user_id"))
      Streams.enrich(evs, t(s, dir, "customer"), Seq("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // J7 — interval join (stream-stream shape): clicks within ±10 min of
    // a signup by the same user
    "j7_interval_join" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val signups = evs.where(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      val clicks = evs.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      Streams.intervalJoin(signups, clicks, "s_ts", "c_ts", "user_id",
          "1 day", "10 minutes", "10 minutes")
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy(col("signup_id"))
    }),

    // J7 outer form — EVERY signup appears, zero-click signups included
    // (the retention-analysis shape an inner join silently drops).
    // count(click_id) counts matches only; unmatched rows carry nulls.
    "j7_interval_outer" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val signups = evs.where(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      val clicks = evs.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      Streams.intervalJoinOuter(signups, clicks, "s_ts", "c_ts", "user_id",
          "1 day", "10 minutes", "10 minutes")
        .groupBy(col("signup_id"))
        .agg(count(col("click_id")).as("n_clicks"))
        .orderBy(col("signup_id"))
    }),

    // J7 full-outer form — the reconciliation shape: every signup AND
    // every orphaned click survives (nulls sentineled to -1 so the
    // cross-engine row set is null-free and exact).
    "j7_interval_full" -> ((s, dir) => {
      val evs = t(s, dir, "events")
      val signups = evs.where(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      val clicks = evs.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      Streams.intervalJoinFull(signups, clicks, "s_ts", "c_ts", "user_id",
          "1 day", "10 minutes", "10 minutes")
        .select(coalesce(col("signup_id"), lit(-1L)).as("signup_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .orderBy(col("signup_id"), col("click_id"))
    }))

  /** The B17 scripted DDL sequence both b17 queries replay: three upsert
    * batches growing the column set (pin + two widens), a narrowing
    * refusal, then a B15 chunk-schema pin and a mid-snapshot-DDL
    * refusal. Returns the two state roots whose history logs the script
    * produced.
    */
  private def schemaHistoryScript(s: SparkSession,
                                  dir: String): (String, String) = {
    import graft.cdc.IncrementalSnapshot
    import graft.streaming.Sinks
    val target = java.nio.file.Files
      .createTempDirectory("graft-schemahist").toString + "/table"
    val snap = java.nio.file.Files
      .createTempDirectory("graft-schemahist-snap").toString
    val c = t(s, dir, "customer")
    def slice(m: Long) = c.where(pmod(col("c_custkey"), lit(3L)) === m)
    // batch 0 pins (ckey, name, ver); batches 1-2 widen in place
    Sinks.applyUpsertBatch(slice(0L).select(col("c_custkey").as("ckey"),
      col("c_name").as("name"), lit(1).as("ver")),
      target, Seq("ckey"), "ver")
    Sinks.applyUpsertBatch(slice(1L).select(col("c_custkey").as("ckey"),
      col("c_name").as("name"), col("c_acctbal").as("bal"), lit(2).as("ver")),
      target, Seq("ckey"), "ver")
    Sinks.applyUpsertBatch(slice(2L).select(col("c_custkey").as("ckey"),
      col("c_name").as("name"), col("c_acctbal").as("bal"),
      col("c_mktsegment").as("mkt"), lit(3).as("ver")),
      target, Seq("ckey"), "ver")
    // a NARROWING batch refuses — and the refusal is itself an event
    val narrowed = try {
      Sinks.applyUpsertBatch(slice(0L).select(col("c_custkey").as("ckey"),
        lit(4).as("ver")), target, Seq("ckey"), "ver")
      false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("NARROWING")
    }
    require(narrowed, "the narrowing batch must refuse loudly")
    // the B15 leg: first chunk pins the snapshot schema; a chunk with
    // an extra column is mid-snapshot DDL and refuses
    val su = t(s, dir, "supplier").select(col("s_suppkey").as("skey"),
      col("s_name").as("sname"))
    IncrementalSnapshot.landChunkCk(s, snap,
      IncrementalSnapshot.nextChunkCk(su, Seq("skey"), None, 10),
      Seq("skey"), 0L, 100L)
    val refusedDdl = try {
      IncrementalSnapshot.landChunkCk(s, snap,
        IncrementalSnapshot.nextChunkCk(su.withColumn("extra", lit(1)),
          Seq("skey"), None, 10), Seq("skey"), 1L, 101L)
      false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("chunk schema changed")
    }
    require(refusedDdl, "the mid-snapshot DDL must refuse loudly")
    (target, snap)
  }

  /** The B18 walk: chunk sizes pin customer to ONE chunk (size = its
    * count) and supplier to TWO (size = ceil(count/2)), so the lifecycle
    * event list is exact at every SF while the row counts stay
    * data-dependent (the oracle re-derives them).
    */
  private def notificationsScript(s: SparkSession, dir: String): String = {
    import graft.cdc.Signals
    val root = java.nio.file.Files
      .createTempDirectory("graft-notif").toString
    val cu = t(s, dir, "customer").select(col("c_custkey").as("ckey"),
      col("c_name").as("name"))
    val su = t(s, dir, "supplier").select(col("s_suppkey").as("ckey"),
      col("s_name").as("name"))
    val cuN = cu.count(); val suN = su.count()
    val csz = Map("customer" -> cuN.toInt,
      "supplier" -> ((suN + 1L) / 2L).toInt)
    val tables: String => DataFrame =
      n => if (n == "customer") cu else su
    def sig(rows: Seq[(String, String, String, Long)]) = {
      import s.implicits._
      rows.toDF("id", "type", "data", "lsn")
    }
    def turn(): Int = Signals.turn(s, root, tables, _ => Seq("ckey"),
      csz, (_, cid) => 100L + cid, maxChunks = 1)
    Signals.applySignals(s, root, sig(Seq(("s1", "execute-snapshot",
      """{"data-collections":["customer","supplier"]}""", 1L))))
    require(turn() == 1, "customer lands its single chunk") // started + chunk-landed
    Signals.applySignals(s, root, sig(Seq(("s2", "pause-snapshot", null, 2L))))
    require(turn() == 0, "paused: no events, nothing lands")
    Signals.applySignals(s, root, sig(Seq(("s3", "resume-snapshot", null, 3L))))
    require(turn() == 0, "customer exhausted: the empty turn pops") // completed
    require(turn() == 1, "supplier lands chunk 1 of 2") // started + chunk-landed
    Signals.applySignals(s, root, sig(Seq(("s4", "stop-snapshot",
      """{"data-collections":["supplier"]}""", 4L)))) // stopped w/ coverage
    // re-execute resets customer's chunk state; a stop-EVERYTHING then
    // kills it before anything lands — the aborted event
    Signals.applySignals(s, root, sig(Seq(("s5", "execute-snapshot",
      """{"data-collections":["customer"]}""", 5L))))
    Signals.applySignals(s, root, sig(Seq(("s6", "stop-snapshot", null, 6L))))
    // the AGGREGATE closure (r19, the r18 verdict's #3): a final
    // re-execute drains customer to the pop that EMPTIES the queue —
    // per-collection table-scan-completed, then the aggregate completed
    // an operator pages on (contrast seq 4's pop, which left supplier
    // queued and emitted no aggregate)
    Signals.applySignals(s, root, sig(Seq(("s7", "execute-snapshot",
      """{"data-collections":["customer"]}""", 7L))))
    require(turn() == 1, "customer lands its single chunk afresh")
    require(turn() == 0, "the emptying pop: table-scan-completed + completed")
    root
  }

  private def notificationsOracle: String =
    """WITH n AS (SELECT
      |    (SELECT COUNT(*) FROM customer) AS ncu,
      |    (SELECT CAST((COUNT(*) + 1) // 2 AS BIGINT) FROM supplier) AS nsu1)
      |SELECT * FROM (
      |  SELECT CAST(0 AS BIGINT) AS seq, 'started' AS type,
      |         'customer' AS collection, CAST(0 AS BIGINT) AS chunks_landed,
      |         CAST(0 AS BIGINT) AS rows_landed FROM n
      |  UNION ALL SELECT 1, 'chunk-landed', 'customer', 1, ncu FROM n
      |  UNION ALL SELECT 2, 'paused', NULL, NULL, NULL FROM n
      |  UNION ALL SELECT 3, 'resumed', NULL, NULL, NULL FROM n
      |  UNION ALL SELECT 4, 'table-scan-completed', 'customer', 1, ncu FROM n
      |  UNION ALL SELECT 5, 'started', 'supplier', 0, 0 FROM n
      |  UNION ALL SELECT 6, 'chunk-landed', 'supplier', 1, nsu1 FROM n
      |  UNION ALL SELECT 7, 'stopped', 'supplier', 1, nsu1 FROM n
      |  UNION ALL SELECT 8, 'aborted', 'customer', 0, 0 FROM n
      |  UNION ALL SELECT 9, 'started', 'customer', 0, 0 FROM n
      |  UNION ALL SELECT 10, 'chunk-landed', 'customer', 1, ncu FROM n
      |  UNION ALL SELECT 11, 'table-scan-completed', 'customer', 1, ncu FROM n
      |  UNION ALL SELECT 12, 'completed', NULL, NULL, NULL FROM n)
      |ORDER BY seq""".stripMargin

  private def schemaHistoryOracle: String =
    """WITH n AS (
      |  SELECT
      |    (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 0) AS n0,
      |    (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1) AS n1,
      |    (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 2) AS n2)
      |SELECT * FROM (
      |  SELECT 'upsert' AS scope, CAST(0 AS BIGINT) AS seq, 'pin' AS action,
      |         CAST(NULL AS VARCHAR) AS old_schema,
      |         'ckey bigint, name string, ver int' AS new_schema,
      |         CAST(n0 AS BIGINT) AS n_rows FROM n
      |  UNION ALL SELECT 'upsert', 1, 'widen',
      |         'ckey bigint, name string, ver int',
      |         'bal double, ckey bigint, name string, ver int', n1 FROM n
      |  UNION ALL SELECT 'upsert', 2, 'widen',
      |         'bal double, ckey bigint, name string, ver int',
      |         'bal double, ckey bigint, mkt string, name string, ver int', n2 FROM n
      |  UNION ALL SELECT 'upsert', 3, 'refuse',
      |         'bal double, ckey bigint, mkt string, name string, ver int',
      |         'ckey bigint, ver int', n0 FROM n
      |  UNION ALL SELECT 'snapshot', 0, 'pin', NULL,
      |         'skey bigint, sname string', NULL FROM n
      |  UNION ALL SELECT 'snapshot', 1, 'refuse', 'skey bigint, sname string',
      |         'extra int, skey bigint, sname string', NULL FROM n)
      |ORDER BY scope, seq""".stripMargin

  val oracle: Map[String, String] = Map(
    // the stream must deliver exactly the batch log — same oracle
    "b17_schema_history_stream" -> schemaHistoryOracle,

    // the notification channel's scripted-walk event log; the stream
    // must deliver exactly the batch log — same oracle
    "b18_notifications" -> notificationsOracle,
    "b18_notifications_stream" -> notificationsOracle,

    // the file-channel walk ends with customer fully drained in one
    // chunk; the row count is the table's
    "b16_signal_file_channel" ->
      """SELECT 'customer' AS collection, 'done' AS phase,
        |  CAST(1 AS BIGINT) AS chunks_landed,
        |  (SELECT COUNT(*) FROM customer) AS rows_landed""".stripMargin,

    // the schema-history log of the scripted widen sequence: event order
    // and canonical schema strings follow from the script; the batch row
    // counts are re-derived from the customer table
    "b17_schema_history" -> schemaHistoryOracle,

    "b1_envelope_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal, 'r' AS __op, false AS __deleted
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the corrupted 13th envelopes land in the dead-letter tally; every
    // other row parses cleanly
    "b13_dead_letter" ->
      """SELECT 'ok' AS kind, c_custkey AS key, c_name AS payload
        |FROM customer WHERE c_custkey % 13 <> 0
        |UNION ALL
        |SELECT 'dead', NULL, CAST(COUNT(*) AS VARCHAR)
        |FROM customer WHERE c_custkey % 13 = 0
        |ORDER BY kind, key""".stripMargin,

    "b3_op_filter_route" -> (mts +
      """
        |SELECT event_id, op,
        |  regexp_replace(event_type, '^(click|view)$', 'engagement') AS route
        |FROM e WHERE op IN ('c','u','d')
        |ORDER BY event_id""".stripMargin),

    "b5_materialize" -> (mts +
      """
        |SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS ts_us, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM e)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    // truncate-then-resume: only events strictly after the midpoint
    // truncate survive into the materialization — users whose every
    // event predates it vanish
    "b19_truncate" -> (mts +
      """, mm AS (SELECT (max(event_id) + 1) // 2 AS mid FROM e)
        |SELECT user_id, event_id AS last_event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn
        |      FROM e WHERE event_id > (SELECT mid FROM mm))
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    // the streamed truncate's convergence: the snapshot (ver 100) and the
    // pre-truncate stragglers (ver 150, arriving AFTER the truncate's
    // batch) are both cleared by the ver-200 truncate; only the ver-300
    // re-inserts survive
    "b19_truncate_stream" ->
      """SELECT c_custkey AS ckey, c_name AS name,
        |  CAST(c_acctbal AS DOUBLE) + 7.0 AS bal
        |FROM customer WHERE c_custkey % 4 = 0
        |ORDER BY ckey""".stripMargin,

    // truncate × incremental snapshot: the window merge runs over the
    // post-cutoff slice only — chunks at lo<=200 and changes at lsn<=200
    // are gone; chunk rows rank at their watermark and win ties
    "b19_truncate_in_snapshot" ->
      """WITH base AS (SELECT o_orderkey AS okey,
        |            CAST(o_totalprice AS DOUBLE) AS price FROM orders),
        |chunks AS (SELECT okey, price, 100 + (okey % 3) * 100 AS lsn,
        |           1 AS side, 'r' AS op FROM base),
        |changes AS (
        |  SELECT okey, price + 1000.0 AS price, 150 AS lsn, 0 AS side,
        |         'u' AS op FROM base WHERE okey % 5 = 0
        |  UNION ALL
        |  SELECT okey, price + 500.0, 250, 0, 'c' FROM base
        |  WHERE okey % 3 = 0 AND okey % 7 = 0
        |  UNION ALL
        |  SELECT okey, CAST(NULL AS DOUBLE), 400, 0, 'd' FROM base
        |  WHERE okey % 11 = 0),
        |merged AS (
        |  SELECT *, row_number() OVER (PARTITION BY okey
        |           ORDER BY lsn DESC, side DESC) AS rn
        |  FROM (SELECT * FROM chunks WHERE lsn > 200
        |        UNION ALL SELECT * FROM changes WHERE lsn > 200))
        |SELECT okey, price, lsn AS last_lsn,
        |  CASE WHEN side = 1 THEN 'chunk' ELSE 'stream' END AS src
        |FROM merged WHERE rn = 1 AND op <> 'd'
        |ORDER BY okey""".stripMargin,

    // the whole platform walk re-derived in one query: the notification
    // narrative (chunk plan pinned by construction: 2 chunks over the
    // even keys), the schema log (pin at the chunk batch, widen at the
    // late change batch), and the q03-shaped report over the converged
    // state (changes outrank chunks; deletes drop; non-snapshotted odd
    // keys appear only via changes)
    "b19_platform_walk" ->
      """WITH cu AS (SELECT c_custkey AS ckey, CAST(c_acctbal AS DOUBLE) AS bal,
        |            c_mktsegment AS seg FROM customer),
        |prm AS (SELECT COUNT(*) AS n, CAST((COUNT(*) + 1) // 2 AS BIGINT) AS csz
        |        FROM cu WHERE ckey % 2 = 0),
        |wn AS (SELECT COUNT(*) AS w FROM cu
        |       WHERE ckey % 3 = 0 AND ckey % 50 >= 25),
        |state AS (
        |  SELECT ckey, seg,
        |         CASE WHEN ckey % 3 = 0 THEN bal + 100.0 ELSE bal END AS bal
        |  FROM cu
        |  WHERE (ckey % 3 = 0 AND ckey % 21 <> 0)
        |     OR (ckey % 2 = 0 AND ckey % 3 <> 0)),
        |rep AS (SELECT seg, COUNT(*) AS n_orders,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          AS revenue
        |        FROM state JOIN orders ON ckey = o_custkey GROUP BY seg)
        |SELECT * FROM (
        |  SELECT 'notif' AS section, 'paused' AS a, CAST(NULL AS VARCHAR) AS b,
        |         CAST(0 AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
        |         CAST(NULL AS DOUBLE) AS d FROM prm
        |  UNION ALL SELECT 'notif', 'resumed', NULL, 1, NULL, NULL FROM prm
        |  UNION ALL SELECT 'notif', 'started', 'customer', 2, 0, 0 FROM prm
        |  UNION ALL SELECT 'notif', 'chunk-landed', 'customer', 3, 1,
        |         CAST(csz AS DOUBLE) FROM prm
        |  UNION ALL SELECT 'notif', 'chunk-landed', 'customer', 4, 2,
        |         CAST(n AS DOUBLE) FROM prm
        |  UNION ALL SELECT 'notif', 'table-scan-completed', 'customer', 5, 2,
        |         CAST(n AS DOUBLE) FROM prm
        |  UNION ALL SELECT 'notif', 'completed', NULL, 6, NULL, NULL FROM prm
        |  UNION ALL SELECT 'schema', 'pin',
        |    '__v bigint, bal double, ckey bigint, name string, op string, seg string',
        |    0, csz, NULL FROM prm
        |  UNION ALL SELECT 'schema', 'widen',
        |    '__v bigint, bal double, ckey bigint, name string, op string, seg string, vip bigint',
        |    1, (SELECT w FROM wn), NULL FROM prm
        |  UNION ALL SELECT 'report', seg, NULL, NULL, n_orders, revenue FROM rep)
        |ORDER BY section, COALESCE(n1, -1), a""".stripMargin,

    // the heartbeat-only batch advanced the ledger to 5000 (past every
    // data lsn) without changing the state: every customer survives,
    // the %5 keys carry the update wave's +9
    "b20_heartbeat_ledger" ->
      """SELECT * FROM (
        |  SELECT 'ledger' AS kind, CAST(5000 AS BIGINT) AS k,
        |         CAST(NULL AS DOUBLE) AS bal
        |  UNION ALL
        |  SELECT 'row', c_custkey,
        |         CAST(c_acctbal AS DOUBLE) +
        |           CASE WHEN c_custkey % 5 = 0 THEN 9.0 ELSE 0.0 END
        |  FROM customer)
        |ORDER BY kind, k""".stripMargin,

    // tombstone deletes must land exactly where envelope deletes do
    "b14_tombstones" -> (mts +
      """
        |SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS ts_us, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM e)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    // the whole DBLog construction re-derived: start table, chunk
    // assignment by key rank, as-of chunk reads at advancing watermarks,
    // the (lsn, side) precedence merge with provenance
    "b15_incremental_snapshot" -> (mts +
      """,
        |mm AS (SELECT max(event_id) AS m, (max(event_id) + 1) // 2 AS mid FROM e),
        |start AS (SELECT user_id FROM (
        |  SELECT user_id, op,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM e WHERE event_id < (SELECT mid FROM mm)) WHERE rn = 1 AND op <> 'd'),
        |prm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM start),
        |asg AS (SELECT user_id,
        |  ((row_number() OVER (ORDER BY user_id)) - 1) // (SELECT csz FROM prm) AS chunk
        |  FROM start),
        |lo AS (SELECT user_id,
        |  (SELECT mid FROM mm) - 1
        |    + chunk * (SELECT (m - mid + 2) // 6 FROM mm) AS lo_lsn FROM asg),
        |cr AS (SELECT user_id, event_id AS last_event_id, value, lo_lsn FROM (
        |  SELECT e.user_id, e.event_id, e.value, e.op, l.lo_lsn,
        |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.event_id DESC) AS rn
        |  FROM e JOIN lo l USING (user_id) WHERE e.event_id <= l.lo_lsn)
        |  WHERE rn = 1 AND op <> 'd'),
        |u AS (
        |  SELECT user_id, last_event_id, value, lo_lsn AS lsn, 1 AS side, 'r' AS op FROM cr
        |  UNION ALL
        |  SELECT user_id, event_id, value, event_id, 0, op FROM e
        |  WHERE event_id >= (SELECT mid FROM mm))
        |SELECT user_id, last_event_id, value, lsn AS last_lsn,
        |  CASE WHEN side = 1 THEN 'chunk' ELSE 'stream' END AS src
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY lsn DESC, side DESC) AS rn FROM u)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    // the live-interleaved snapshot's CONVERGENCE closure: whatever the
    // chunk pacing, the merged state is the changelog materialization
    "b15_incremental_snapshot_live" -> (mts +
      """
        |SELECT user_id, event_id AS last_event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn FROM e)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    // the composite-key DBLog construction: chunk assignment by
    // lexicographic key rank, fixed per-chunk watermarks, the same
    // (lsn, side) precedence merge over (l_orderkey, l_linenumber)
    "b15_incremental_snapshot_ck" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |            CAST(max(l_quantity) AS DOUBLE) AS qty
        |            FROM lineitem GROUP BY 1, 2),
        |mm AS (SELECT (max(l_orderkey) + 1) // 2 AS mid FROM li),
        |base AS (SELECT * FROM li WHERE l_orderkey < (SELECT mid FROM mm)),
        |prm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM base),
        |asg AS (SELECT *,
        |  ((row_number() OVER (ORDER BY l_orderkey, l_linenumber)) - 1)
        |    // (SELECT csz FROM prm) AS chunk FROM base),
        |cr AS (SELECT l_orderkey, l_linenumber, qty,
        |       1990 + 5 * chunk AS lo_lsn FROM asg),
        |ch AS (SELECT l_orderkey, l_linenumber, qty + 100.0 AS qty,
        |       CASE WHEN (l_orderkey + l_linenumber) % 7 = 0
        |            THEN 'd' ELSE 'u' END AS op,
        |       1985 + (l_orderkey % 60) AS lsn
        |       FROM li WHERE l_orderkey % 3 = 0),
        |u AS (
        |  SELECT l_orderkey, l_linenumber, qty, lo_lsn AS lsn,
        |         1 AS side, 'r' AS op FROM cr
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, qty, lsn, 0, op FROM ch)
        |SELECT l_orderkey, l_linenumber, qty, CAST(lsn AS BIGINT) AS last_lsn,
        |  CASE WHEN side = 1 THEN 'chunk' ELSE 'stream' END AS src
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY l_orderkey, l_linenumber
        |        ORDER BY lsn DESC, side DESC) AS rn FROM u)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // the composed-consumer closure: the persisted upsert table converges
    // to the changelog materialization whatever the chunk pacing (one
    // change per key: +100 for ckey%3=0, deleted when also ckey%7=0) —
    // per-key precedence and the sink's merge mechanics are pinned by the
    // b15/a8 hashes and their specs
    "b15_snapshot_upsert" ->
      """WITH cu AS (SELECT c_custkey AS ckey, c_name AS name,
        |            CAST(c_acctbal AS DOUBLE) AS bal FROM customer)
        |SELECT ckey, name,
        |  CASE WHEN ckey % 3 = 0 THEN bal + 100.0 ELSE bal END AS bal
        |FROM cu WHERE NOT (ckey % 3 = 0 AND ckey % 7 = 0)
        |ORDER BY ckey""".stripMargin,

    // additional-conditions coverage: exactly the matching keys, chunked
    // by rank over the FILTERED key space at the blocking turn's
    // advancing watermarks
    "b16_signal_snapshot_cond" ->
      """WITH su AS (SELECT s_suppkey AS ckey, s_name AS name,
        |       CAST(s_acctbal AS DOUBLE) AS bal FROM supplier
        |       WHERE s_suppkey % 2 = 0),
        |prm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM su),
        |asg AS (SELECT *, ((row_number() OVER (ORDER BY ckey)) - 1)
        |           // (SELECT csz FROM prm) AS chunk FROM su)
        |SELECT ckey, name, bal, CAST(2990 + 5 * chunk AS BIGINT) AS last_lsn,
        |       'chunk' AS src
        |FROM asg ORDER BY ckey""".stripMargin,

    // the signal protocol's observable outcome: customer chunked in
    // full (rank-assigned, lo = 1990 + 5·chunk), supplier cut off at
    // two chunks by stop-snapshot (rank ≤ 2·csz, lo = 2990 + 5·chunk),
    // both merged with their change streams under the (lsn, side)
    // precedence law — pause/resume and pacing are oracle-invisible by
    // design (they choose WHEN chunks land, not what converges) and are
    // pinned by the require()s in the query + SignalsSpec
    "b16_signal_snapshot" ->
      """WITH cu AS (SELECT c_custkey AS ckey, c_name AS name,
        |            CAST(c_acctbal AS DOUBLE) AS bal FROM customer),
        |su AS (SELECT s_suppkey AS ckey, s_name AS name,
        |       CAST(s_acctbal AS DOUBLE) AS bal FROM supplier),
        |cprm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM cu),
        |sprm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM su),
        |casg AS (SELECT *, ((row_number() OVER (ORDER BY ckey)) - 1)
        |           // (SELECT csz FROM cprm) AS chunk FROM cu),
        |sasg AS (SELECT *, ((row_number() OVER (ORDER BY ckey)) - 1)
        |           // (SELECT csz FROM sprm) AS chunk FROM su),
        |u AS (
        |  SELECT 'customer' AS collection, ckey, name, bal,
        |         1990 + 5 * chunk AS lsn, 1 AS side, 'r' AS op FROM casg
        |  UNION ALL
        |  SELECT 'supplier', ckey, name, bal, 2990 + 5 * chunk, 1, 'r'
        |  FROM sasg WHERE chunk < 2
        |  UNION ALL
        |  SELECT 'customer', ckey, name, bal + 100.0, 1985 + ckey % 60, 0,
        |         CASE WHEN ckey % 7 = 0 THEN 'd' ELSE 'u' END
        |  FROM cu WHERE ckey % 3 = 0
        |  UNION ALL
        |  SELECT 'supplier', ckey, name, bal + 50.0, 2985 + ckey % 20, 0,
        |         CASE WHEN ckey % 5 = 0 THEN 'd' ELSE 'u' END
        |  FROM su WHERE ckey % 2 = 0)
        |SELECT collection, ckey, name, bal, CAST(lsn AS BIGINT) AS last_lsn,
        |  CASE WHEN side = 1 THEN 'chunk' ELSE 'stream' END AS src
        |FROM (SELECT *, row_number() OVER (PARTITION BY collection, ckey
        |        ORDER BY lsn DESC, side DESC) AS rn FROM u)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY collection, ckey""".stripMargin,

    // the live protocol's convergence closure: customer equals its
    // changelog materialization whatever the pacing (one change per key:
    // +100 for ckey%3=0, deleted when also ckey%7=0); supplier equals
    // exactly the rank ≤ 2·csz coverage stop-snapshot allowed
    "b16_signal_snapshot_live" ->
      """WITH cu AS (SELECT c_custkey AS ckey, c_name AS name,
        |            CAST(c_acctbal AS DOUBLE) AS bal FROM customer),
        |su AS (SELECT s_suppkey AS ckey, s_name AS name,
        |       CAST(s_acctbal AS DOUBLE) AS bal FROM supplier),
        |sprm AS (SELECT greatest(1, (COUNT(*) + 5) // 6) AS csz FROM su),
        |sasg AS (SELECT *, ((row_number() OVER (ORDER BY ckey)) - 1)
        |           // (SELECT csz FROM sprm) AS chunk FROM su)
        |SELECT * FROM (
        |  SELECT 'customer' AS collection, ckey, name,
        |    CASE WHEN ckey % 3 = 0 THEN bal + 100.0 ELSE bal END AS bal
        |  FROM cu WHERE NOT (ckey % 3 = 0 AND ckey % 7 = 0)
        |  UNION ALL
        |  SELECT 'supplier', ckey, name, bal FROM sasg WHERE chunk < 2)
        |ORDER BY collection, ckey""".stripMargin,

    "b11_snapshot_diff" ->
      """WITH oldS AS (SELECT c_custkey, c_name, c_acctbal FROM customer
        |              WHERE c_custkey <= 1400),
        |newS AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey > 100)
        |SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'c'
        |       WHEN n.c_custkey IS NULL THEN 'd'
        |       ELSE 'u' END AS op,
        |  COALESCE(n.c_name, o.c_name) AS c_name,
        |  CAST(COALESCE(n.c_acctbal, o.c_acctbal) AS DOUBLE) AS bal
        |FROM oldS o FULL OUTER JOIN newS n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR (o.c_name IS DISTINCT FROM n.c_name
        |       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal)
        |ORDER BY c_custkey""".stripMargin,

    "b12_scd2" -> (mts +
      """
        |SELECT user_id, event_id,
        |  epoch_us(ts) AS vf_us,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)) AS vt_us,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)) IS NULL AS is_current
        |FROM e WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin),

    "b6_snapshot_union" -> (mts +
      """, u AS (
        |  SELECT event_id, ts, user_id,
        |    CASE WHEN event_id < (SELECT (max(event_id) + 1) // 2 FROM e) THEN 'r' ELSE op END AS op
        |  FROM e)
        |SELECT user_id, event_id AS last_event_id, op
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM u)
        |WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin),

    "b7_outbox" -> (mts +
      """
        |SELECT event_id,
        |  regexp_replace(event_type, '^(click|view)$', 'engagement') AS route,
        |  CAST(props->>'$.k' AS INTEGER) AS k
        |FROM e ORDER BY event_id""".stripMargin),

    "b10_mask_fields" ->
      """SELECT c_custkey, sha256('graft:' || c_name) AS c_name,
        |  CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "b8_txn_summary" -> (mts +
      """
        |SELECT CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS tx_id,
        |  COUNT(*) AS event_count,
        |  MIN(epoch_us(ts)) AS first_ts,
        |  MAX(epoch_us(ts)) AS last_ts
        |FROM e GROUP BY tx_id ORDER BY tx_id""".stripMargin),

    "d8_asof_join" -> (mts +
      """, u AS (
        |  SELECT user_id, ts, event_id,
        |    NULL AS p_event, event_id AS b_event, value AS b_value, 0 AS side
        |  FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, event_id, NULL, NULL, 1
        |  FROM e WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(b_event IGNORE NULLS) OVER win AS click_id_asof,
        |    last_value(b_value IGNORE NULLS) OVER win AS click_value_asof
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id
        |                 ORDER BY ts, side, b_event ASC NULLS FIRST
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT p_event AS event_id, user_id, epoch_us(ts) AS ts_us,
        |       click_id_asof, click_value_asof
        |FROM w WHERE side = 1
        |ORDER BY event_id""".stripMargin),

    "d7_range_join" -> (mts +
      """
        |SELECT p.event_id AS purchase_id,
        |  COUNT(*) AS n_views,
        |  MIN(v.event_id) AS first_view_id
        |FROM e p JOIN e v
        |  ON v.user_id = p.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 5 MINUTE AND v.ts <= p.ts
        |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin),

    "j1_tumbling_window" -> (mts +
      """
        |SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY w_start_us, event_type
        |ORDER BY w_start_us, event_type""".stripMargin),

    "j2_sliding_window" -> (mts +
      """, b AS (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - o.off * 1800000000 AS w_start_us
        |  FROM e CROSS JOIN (VALUES (0), (1)) o(off))
        |SELECT w_start_us, COUNT(*) AS n
        |FROM b GROUP BY w_start_us ORDER BY w_start_us""".stripMargin),

    "j3_session_window" -> (mts +
      """, m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id,
        |  epoch_us(MIN(ts)) AS s_start_us,
        |  epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS s_end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, s_start_us""".stripMargin),

    "j12_funnel" -> (mts +
      """, s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
        |         WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT stage, n FROM (
        |  SELECT '1_signup' AS stage, COUNT(*) AS n FROM s1
        |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
        |ORDER BY stage""".stripMargin),

    "j11_session_paths" -> (mts +
      """, m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |p AS (SELECT user_id, sid,
        |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |      FROM s GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS n FROM p
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin),

    "j6_stream_static_join" -> (mts +
      """
        |SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e JOIN customer ON e.user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "j7_interval_join" -> (mts +
      """
        |SELECT s.event_id AS signup_id, COUNT(*) AS n_clicks
        |FROM e s JOIN e c
        |  ON c.user_id = s.user_id
        | AND s.event_type = 'signup' AND c.event_type = 'click'
        | AND c.ts >= s.ts - INTERVAL 10 MINUTE
        | AND c.ts <= s.ts + INTERVAL 10 MINUTE
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin),

    "j7_interval_outer" -> (mts +
      """
        |SELECT s.event_id AS signup_id, COUNT(c.event_id) AS n_clicks
        |FROM (SELECT * FROM e WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |  ON c.user_id = s.user_id
        | AND c.ts >= s.ts - INTERVAL 10 MINUTE
        | AND c.ts <= s.ts + INTERVAL 10 MINUTE
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin),

    "j7_interval_full" -> (mts +
      """
        |SELECT COALESCE(s.event_id, -1) AS signup_id,
        |  COALESCE(c.event_id, -1) AS click_id
        |FROM (SELECT * FROM e WHERE event_type = 'signup') s
        |FULL JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |  ON c.user_id = s.user_id
        | AND c.ts >= s.ts - INTERVAL 10 MINUTE
        | AND c.ts <= s.ts + INTERVAL 10 MINUTE
        |ORDER BY signup_id, click_id""".stripMargin))
}

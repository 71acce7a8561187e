package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** B17 — the QUERYABLE SCHEMA HISTORY (r17, the r16 verdict's #4):
  * the engine already enforces its DDL posture loudly — the A8 upsert
  * sink widens in place and refuses narrowing/type changes
  * ([[graft.streaming.Sinks]]), the B15 chunk loop pins the snapshot
  * schema and refuses mid-snapshot DDL
  * ([[IncrementalSnapshot]]) — but the decisions themselves vanished
  * into log lines. [PK: Debezium's schema-history topic is also a
  * READABLE record of what changed when — consumers replay it to
  * interpret old events; REF README.md:13.] This module is that record:
  * every pin, widen, and refusal appends one event under the same
  * state root the decision protected, and [[read]] returns the log as
  * a DataFrame.
  *
  * Layout: `<root>/_schema_history/<seq>.json`, ONE file per event,
  * written tmp-then-rename — an append either completes or leaves only
  * a `.tmp` the reader ignores, so the readable log never contains a
  * torn event (crash-window spec-pinned). Schemas are serialized in a
  * CANONICAL form (fields sorted by name, `name type` pairs) so the
  * log is comparable and hash-stable regardless of projection order.
  *
  * Delivery is AT-LEAST-ONCE by design: the widen event lands after
  * the data write and before the schema pin moves, so a crash between
  * the two replays the batch, re-detects the same widening, and
  * appends the same event again — a duplicate row (dedupable on
  * (action, old, new)) rather than a silently missing one, the right
  * trade for an audit log.
  *
  * Scale shape: events are DDL-rate (operator actions), never
  * data-plane volume — appends are one tmp write + rename, [[read]] is
  * a driver FS listing of an O(DDL-count) directory.
  */
object SchemaHistory {

  private val Dir = "_schema_history"
  private val CkptPrefix = "_checkpoint_"

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Canonical, order-independent rendering of a schema: fields sorted
    * by name, `name type` with Catalyst simple type strings.
    */
  def canonical(st: StructType): String =
    st.fields.sortBy(_.name)
      .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")

  /** Append one event; returns its sequence number. `action` is one of
    * `pin` (first schema recorded), `widen` (columns absorbed in
    * place), `refuse` (restart-level DDL rejected). `nRows` carries the
    * triggering batch's row count where the call site knows it (the
    * data-dependent half of the event).
    *
    * Seq-claim protocol (r18 — the r17 verdict's append race): the old
    * exists-then-rename was check-then-act, so two concurrent appenders
    * could claim the same seq and one event silently clobbered the other
    * (RawLocalFileSystem renames OVER existing files). Now the slot is
    * claimed with an atomic CREATE-EXCLUSIVE marker (`<seq>.claim`, the
    * [[Signals.acquireWriter]] idiom): exactly one appender wins each
    * number, losers retry at seq+1 with nothing contested to clean up.
    * The event body still lands tmp-then-rename AFTER the claim — the
    * readable log never contains a torn event, and the rename target
    * cannot pre-exist because the claim holder is unique. A claim whose
    * writer crashed before the rename burns its number (readers and
    * [[nextSeq]] ignore bare claims; the next appender fails the
    * create-exclusive and moves past it) — a gap in the log, never a
    * lost or overwritten event.
    *
    * `epoch`: pass the driver's [[Signals.acquireWriter]] token to fence
    * zombie appenders on roots that use writer epochs; a holder of an
    * older epoch refuses ([[Signals.StaleWriterException]]) instead of
    * interleaving stale history. Epoch-less calls (the A8 sink's
    * single-driver posture) stay valid. In-JVM appenders additionally
    * serialize on the root's [[Signals.gated]] lock.
    */
  def append(spark: org.apache.spark.sql.SparkSession, root: String,
             action: String, oldSchema: Option[StructType],
             newSchema: Option[StructType], nRows: Option[Long] = None,
             tsMs: Long = System.currentTimeMillis,
             epoch: Option[Long] = None): Long = Signals.gated(root) {
    epoch.foreach { e =>
      val cur = Signals.currentEpoch(spark, root)
      if (cur != e)
        throw new Signals.StaleWriterException(
          s"schema-history append refused at $root: this driver holds " +
            s"writer epoch $e but the root is at epoch $cur — another " +
            "driver has taken over (acquireWriter). Stop this writer.")
    }
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    fs.mkdirs(dir)
    val content = {
      val node = mapper.createObjectNode()
      node.put("ts_ms", tsMs)
      node.put("action", action)
      oldSchema.foreach(s => node.put("old_schema", canonical(s)))
      newSchema.foreach(s => node.put("new_schema", canonical(s)))
      nRows.foreach(n => node.put("n_rows", n))
      node
    }
    var seq = nextSeq(spark, root)
    var written = -1L
    while (written < 0) {
      val claim = new Path(dir, f"$seq%010d.claim")
      val claimed =
        try { fs.create(claim, false).close(); true } // atomic create-exclusive
        catch { case _: java.io.IOException => false } // rival owns this seq
      if (!claimed) seq += 1
      else {
        content.put("seq", seq)
        val name = f"$seq%010d.json"
        val tmp = new Path(dir, name + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(mapper.writeValueAsString(content).getBytes("UTF-8"))
        finally out.close()
        fs.rename(tmp, new Path(dir, name))
        // the claim is PERMANENT (never deleted — by append OR by
        // compact, whose own note explains why a deleted claim could be
        // re-claimed by a stale appender and land an event the
        // checkpoint already hides): deleting it after the rename would
        // let a rival that computed the same seq before our rename
        // re-claim the number and rename over the landed event — the
        // exact clobber this protocol closes. Claims are empty DDL-rate
        // files; keeping them forever is the price of an at-least-once
        // history (the BEST-EFFORT channels — Notifications, the signal
        // file channel — do fold claims under their prune watermark,
        // where losing a racing event is within their contract).
        written = seq
      }
    }
    written
  }

  private def nextSeq(spark: org.apache.spark.sql.SparkSession,
                      root: String): Long = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    if (!fs.exists(dir)) 0L
    else {
      // the checkpoint's seq counts (r18 retention): after compaction
      // deletes the folded per-event files, numbering must CONTINUE past
      // the checkpoint — a restart at 0 would alias retired seqs and
      // the reader (which hides seqs ≤ the checkpoint) would drop the
      // new events
      val ns = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".json"))
        .flatMap(n => scala.util.Try(
          n.stripPrefix(CkptPrefix).stripSuffix(".json").toLong).toOption)
      if (ns.isEmpty) 0L else ns.max + 1L
    }
  }

  /** The event schema [[read]] and [[stream]] share. */
  val eventSchema: StructType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("seq",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts_ms",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("old_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("new_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_rows",
      org.apache.spark.sql.types.LongType)))

  /** The history as a LIVE STREAM [PK: consumers replay Debezium's
    * schema-history topic as a stream to interpret old events]: one
    * file per event makes the log a natural Structured Streaming file
    * source — every append is a new file the stream picks up in its
    * next micro-batch, and the glob keeps in-flight `.tmp` appends
    * invisible here exactly as in [[read]].
    */
  def stream(spark: org.apache.spark.sql.SparkSession,
             root: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("pathGlobFilter", "*.json")
      .json(s"$root/$Dir")

  private case class Event(seq: Long, tsMs: Long, action: String,
                           oldSchema: String, newSchema: String,
                           nRows: Option[Long])

  private def parseEvent(fs: org.apache.hadoop.fs.FileSystem,
                         p: Path): Event = {
    val in = fs.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    val n = mapper.readTree(txt)
    def str(f: String) = Option(n.get(f)).map(_.asText()).orNull
    Event(n.get("seq").asLong(), n.get("ts_ms").asLong(), str("action"),
      str("old_schema"), str("new_schema"),
      Option(n.get("n_rows")).map(_.asLong()))
  }

  /** The log's current VISIBLE rows: the newest checkpoint (if any)
    * followed by the per-event files with seq past it. Per-event files
    * at or below the checkpoint's seq — deletion leftovers from a crash
    * mid-[[compact]] — are hidden: the checkpoint is the authority for
    * everything it folded. Driver FS reads, O(DDL-count).
    */
  private def visibleEvents(fs: org.apache.hadoop.fs.FileSystem,
                            dir: Path): Seq[Event] = {
    if (!fs.exists(dir)) return Nil
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
    val (ckptNames, eventNames) = names.partition(_.startsWith(CkptPrefix))
    val newestCkpt = ckptNames
      .flatMap(n => scala.util.Try(
        n.stripPrefix(CkptPrefix).stripSuffix(".json").toLong)
        .toOption.map(_ -> n))
      .sortBy(_._1).lastOption
    val floor = newestCkpt.map(_._1).getOrElse(-1L)
    val ckptRow = newestCkpt.map { case (_, n) => parseEvent(fs, new Path(dir, n)) }
    val tail = eventNames
      .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong)
        .toOption.map(_ -> n))
      .filter(_._1 > floor)
      .sortBy(_._1)
      .map { case (_, n) => parseEvent(fs, new Path(dir, n)) }
    ckptRow.toSeq ++ tail
  }

  /** The log as a DataFrame — `(seq, ts_ms, action, old_schema,
    * new_schema, n_rows)` — complete events only (a torn `.tmp` from a
    * crashed append is invisible; bare `.claim` markers likewise). On a
    * compacted log the first row is the `checkpoint` event standing for
    * everything it folded. Driver FS reads; no Spark job until the
    * caller acts on the frame.
    */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    visibleEvents(fs, new Path(root, Dir))
      .map(e => (e.seq, e.tsMs, e.action, e.oldSchema, e.newSchema, e.nRows))
      .toDF("seq", "ts_ms", "action", "old_schema", "new_schema", "n_rows")
  }

  /** B17 RETENTION (r18 — the r17 verdict's #5): fold every visible
    * event with seq ≤ `uptoSeq` into ONE `checkpoint` event, then retire
    * the folded per-event files (and their claims, and any older
    * checkpoint). The log stops growing one-file-per-DDL-forever while
    * the READABLE record stays complete: the checkpoint carries the
    * fold's net meaning — the CURRENT schema (last non-null new_schema),
    * the genesis old side (first folded event's old_schema, null for a
    * log starting at its pin), the folded events' total n_rows, and the
    * last folded ts/seq — and [[read]] returns it as the log's first row.
    *
    * Crash-ordering (generation-swap shape, matching the repo's
    * index-maintenance idiom): the checkpoint file LANDS FIRST
    * (claim + tmp-then-rename, like [[append]]); the deletions follow.
    * A crash between the two leaves folded files the reader already
    * hides (seq ≤ checkpoint), re-deletable by the next compaction. Two
    * racing compactions at the same watermark produce the identical
    * checkpoint (the fold is deterministic); the claim makes one of
    * them the writer and the rename target can never pre-exist.
    *
    * A file-source [[stream]] consumer is unaffected going forward (it
    * tracks files it has seen; deletions don't retract) but a FRESH
    * stream starting after a compaction sees only the live tail —
    * bootstrap from [[read]], then stream, exactly the
    * snapshot-then-stream pattern the rest of the engine uses. That
    * bootstrap discipline also covers the crash window: folded event
    * files a crashed compaction left behind are hidden from [[read]]
    * but would match a fresh stream's glob — a consumer that drops
    * streamed rows with seq ≤ its bootstrap checkpoint never
    * double-counts them.
    *
    * Returns the checkpoint's seq, or None when nothing was foldable.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
              uptoSeq: Long): Option[Long] = Signals.gated(root) {
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    val fold = visibleEvents(fs, dir).filter(_.seq <= uptoSeq)
    if (fold.isEmpty) None
    else {
      val maxSeq = fold.map(_.seq).max
      val node = mapper.createObjectNode()
      node.put("seq", maxSeq)
      node.put("ts_ms", fold.last.tsMs)
      node.put("action", "checkpoint")
      Option(fold.head.oldSchema).foreach(node.put("old_schema", _))
      fold.reverseIterator.map(_.newSchema).find(_ != null)
        .foreach(node.put("new_schema", _))
      val rows = fold.flatMap(_.nRows)
      if (rows.nonEmpty) node.put("n_rows", rows.sum)
      val name = f"$CkptPrefix$maxSeq%010d.json"
      val claim = new Path(dir, name + ".claim")
      val claimed =
        try { fs.create(claim, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (claimed) {
        val tmp = new Path(dir, name + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
        finally out.close()
        fs.rename(tmp, new Path(dir, name))
      } // an unclaimed name means a rival landed the identical checkpoint
      // retire the folded EVENT files ≤ maxSeq and any older checkpoint
      // (its content is subsumed). The `.claim` markers are NEVER
      // deleted (r18 review): a deleted claim could be re-claimed by a
      // stale appender that computed its seq before this compaction, and
      // its event would land at a number the checkpoint already hides —
      // a silently lost history row. Claims are empty DDL-rate files;
      // keeping them is the price of the no-clobber guarantee.
      fs.listStatus(dir).map(_.getPath).foreach { p =>
        val n = p.getName
        def seqOf(s: String) = scala.util.Try(
          s.stripSuffix(".json").toLong).toOption
        val retire = n.endsWith(".json") && (
          if (n.startsWith(CkptPrefix))
            seqOf(n.stripPrefix(CkptPrefix)).exists(_ < maxSeq)
          else seqOf(n).exists(_ <= maxSeq))
        if (retire) fs.delete(p, false)
      }
      Some(maxSeq)
    }
  }
}

package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B16 — the SIGNAL protocol that drives incremental snapshots
  * [PK: Debezium's signal table/topic — `execute-snapshot`,
  * `stop-snapshot`, `pause-snapshot`, `resume-snapshot` rows arriving
  * THROUGH the change stream control when and what the connector
  * re-snapshots; REF README.md:13 names the connectors whose headline
  * consumer feature this protocol fronts].
  *
  * Signals are control-plane rows: `(id, type, data)` where `data` is a
  * small JSON object naming the data collections. They are applied in
  * arrival (lsn, id) order against a tiny persisted state —
  * `{queue, paused, done}` — and a paced maintenance `turn` then lands
  * bounded chunk reads for the HEAD collection through the B15 cursor
  * loop ([[IncrementalSnapshot.snapshotChunksCk]]). Pacing, resume, and
  * crash behavior are therefore exactly B15's; what this module adds is
  * the protocol: who starts/stops/pauses a snapshot, in what order
  * collections drain, and what survives a stop.
  *
  * Semantics (each pinned by SignalsSpec):
  *  - `execute-snapshot {data-collections:[t…]}` appends the named
  *    collections to the queue (deduped); re-executing a COMPLETED or
  *    STOPPED collection resets its chunk state — a fresh re-snapshot,
  *    the protocol's re-run behavior. `"type":"blocking"` marks the
  *    collections to drain in ONE turn (the ad-hoc full snapshot);
  *    `additional-conditions` attach per-collection SQL filters that
  *    compose INTO the chunk SELECT — a partial re-snapshot where
  *    unmatched rows never move. Re-executing an already-QUEUED
  *    collection with a DIFFERENT condition or blocking flag adopts the
  *    newest signal entirely: its chunk state resets and the new
  *    condition applies from row zero (r17 advice — the operator's
  *    latest instruction wins, never a silent drop); an identical
  *    re-execute stays a pure dedup.
  *  - `stop-snapshot {data-collections:[t…]}` removes the named
  *    collections from the queue (absent data = stop everything).
  *    Chunks already landed STAY readable — a consumer's merged state
  *    keeps whatever coverage the stopped snapshot achieved.
  *  - `pause-snapshot` / `resume-snapshot` gate the turn (pause beats
  *    blocking); a paused turn lands ZERO chunks, the queue untouched.
  *  - Unknown signal types are IGNORED (the shared-signal-table
  *    contract: other tools may write their own types through the same
  *    channel) — deliberate, spec-pinned.
  *  - Signals usually arrive AS ROWS of a captured signal table:
  *    [[fromEnvelope]] lifts (id, type, data, lsn) out of the B1-parsed
  *    envelope stream. Only streamed INSERTS act as signals by default
  *    (r17 advice): a re-snapshot of the signal table itself replays
  *    historical rows as op='r', and acting on those would wipe
  *    completed collections' chunk state and re-run their snapshots.
  *
  * Scale shape: the state file is O(collections) bytes, applySignals
  * collects the signal batch to the driver — control-plane rows, a
  * handful per day in production, never data-plane volume. Every
  * data-plane byte moves through the B15 chunk loop (bounded
  * TakeOrdered reads, O(chunk) landings, one keyed merge shuffle).
  *
  * Concurrency contract (r17, hardened from the r16 prose-only form):
  *  - WITHIN one driver, [[applySignals]] and [[turn]] serialize on a
  *    per-root JVM lock for their whole read-modify-write (the turn
  *    holds it through its chunk landings — turns are bounded paced
  *    reads, so the wait is bounded). The documented wiring (signal
  *    stream foreachBatch + scheduled maintenance turns in one driver)
  *    can therefore never interleave a signal between a turn's re-read
  *    and its pop, and a blocking drain excludes any [[gated]] change
  *    sink for exactly its duration — the "caller holds stream
  *    application" contract, enforced.
  *  - ACROSS drivers, a WRITER EPOCH fences zombies: a successor calls
  *    [[acquireWriter]] (atomic create-exclusive under `_epoch/`) and
  *    passes its epoch to applySignals/turn; any holder of an older
  *    epoch REFUSES (StaleWriterException) instead of clobbering the
  *    successor's state [PK: Debezium's connector-task fencing via
  *    Kafka rebalance — one task owns the signal channel at a time].
  *    Epoch-less calls stay valid for single-driver deployments.
  */
object Signals {

  /** The persisted protocol state. `queue` drains head-first; `done`
    * records completed collections (so a re-execute can be told apart
    * from a first execute); `blocking` names queued collections whose
    * execute-snapshot asked for `"type":"blocking"` — they drain in ONE
    * turn instead of pacing (the protocol's ad-hoc full snapshot: the
    * caller holds stream application for that turn, so the landed
    * watermark is a single consistent point — enforced in-driver by
    * [[gated]]); `conditions` carries each queued collection's
    * additional-conditions filter (a SQL predicate composed INTO the
    * chunk SELECT — the partial re-snapshot), retired when its
    * collection pops or stops.
    */
  case class State(queue: Seq[String], paused: Boolean, done: Seq[String],
                   blocking: Seq[String] = Nil,
                   conditions: Map[String, String] = Map.empty)

  val Empty: State = State(Nil, paused = false, Nil)

  /** A fenced writer observed a newer epoch: another driver has taken
    * over the root. The loser must stop writing, not retry.
    */
  final class StaleWriterException(msg: String)
    extends IllegalStateException(msg)

  private val StateFile = "_signals"
  private val EpochDir = "_epoch"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One monitor per state root (JVM-wide): both protocol writers —
    * and any [[gated]] change sink — serialize on it. Keyed by the raw
    * root string; callers must name a root consistently.
    */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Where a collection's B15 chunk state lives under the signal root. */
  def collectionPath(root: String, collection: String): String =
    s"$root/collections/$collection"

  /** Run `body` under the root's writer lock — the change-stream gate
    * for blocking snapshots: wrap the change sink's foreachBatch body in
    * this and a blocking drain (which holds the same lock for its whole
    * turn) excludes it for exactly the drain window; the gated changes
    * then land AFTER the blocking watermark and outrank the chunk rows
    * at merge, which is the consistency the protocol promises. Zero cost
    * when no turn is in flight.
    */
  def gated[T](root: String)(body: => T): T = lockFor(root).synchronized(body)

  /** The root's current writer epoch — 0 before any [[acquireWriter]]. */
  def currentEpoch(spark: org.apache.spark.sql.SparkSession,
                   root: String): Long = {
    val fs = fsOf(spark, root)
    val d = new Path(root, EpochDir)
    if (!fs.exists(d)) 0L
    else {
      val ns = fs.listStatus(d).flatMap(s =>
        scala.util.Try(s.getPath.getName.toLong).toOption)
      if (ns.isEmpty) 0L else ns.max
    }
  }

  /** Take over the root as ITS writer: atomically claim the next epoch
    * (create-exclusive marker file — two racing successors get distinct
    * epochs, and the larger one wins every later fence check). Pass the
    * returned epoch to [[applySignals]]/[[turn]]; any older driver's
    * next fenced write then refuses instead of clobbering this one.
    */
  def acquireWriter(spark: org.apache.spark.sql.SparkSession,
                    root: String): Long = {
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(root, EpochDir))
    var e = currentEpoch(spark, root) + 1
    var claimed = -1L
    while (claimed < 0) {
      val marker = new Path(new Path(root, EpochDir), e.toString)
      try {
        // overwrite=false: atomic create-exclusive — the claim either
        // succeeds uniquely or throws because a rival took this number
        val out = fs.create(marker, false)
        out.close()
        claimed = e
      } catch { case _: java.io.IOException => e += 1 }
    }
    claimed
  }

  private def checkEpoch(spark: org.apache.spark.sql.SparkSession,
                         root: String, epoch: Option[Long],
                         what: String): Unit =
    epoch.foreach { e =>
      val cur = currentEpoch(spark, root)
      if (cur != e)
        throw new StaleWriterException(
          s"$what refused at $root: this driver holds writer epoch $e but " +
            s"the root is at epoch $cur — another driver has taken over " +
            "(acquireWriter). Stop this writer; do not retry.")
    }

  /** Read the protocol state through the same TMP-then-rename +
    * lenient-tmp protocol as the B15 cursor (a crash during the very
    * first state write leaves only a truncated tmp — that degrades to
    * the empty state, and the lost signals re-apply when their batch
    * replays; the MAIN file stays strict).
    */
  def state(spark: org.apache.spark.sql.SparkSession, root: String): State = {
    val fs = fsOf(spark, root)
    def readAt(p: Path, lenient: Boolean): Option[State] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        def parse = {
          val n = mapper.readTree(s)
          def arr(f: String): Seq[String] = {
            val b = Seq.newBuilder[String]
            val node = n.get(f)
            if (node != null)
              node.elements().forEachRemaining(v => b += v.asText())
            b.result()
          }
          val conds = {
            val b = Map.newBuilder[String, String]
            val node = n.get("conditions")
            if (node != null)
              node.fieldNames().forEachRemaining(k => b += k -> node.get(k).asText())
            b.result()
          }
          State(arr("queue"), n.get("paused").asBoolean(), arr("done"),
            arr("blocking"), conds)
        }
        if (lenient) scala.util.Try(parse).toOption else Some(parse)
      }
    readAt(new Path(root, StateFile), lenient = false)
      .orElse(readAt(new Path(root, StateFile + ".tmp"), lenient = true))
      .getOrElse(Empty)
  }

  private def writeState(spark: org.apache.spark.sql.SparkSession,
                         root: String, st: State): Unit = {
    val node = mapper.createObjectNode()
    val q = node.putArray("queue"); st.queue.foreach(q.add)
    node.put("paused", st.paused)
    val d = node.putArray("done"); st.done.foreach(d.add)
    val bl = node.putArray("blocking"); st.blocking.foreach(bl.add)
    val cn = node.putObject("conditions")
    st.conditions.toSeq.sortBy(_._1).foreach { case (k, v) => cn.put(k, v) }
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(root))
    val tmp = new Path(root, StateFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
    val main = new Path(root, StateFile)
    if (fs.exists(main)) fs.delete(main, false)
    fs.rename(tmp, main)
  }

  private def collections(data: String): Seq[String] =
    if (data == null || data.trim.isEmpty) Nil
    else {
      val n = mapper.readTree(data)
      val c = n.get("data-collections")
      if (c == null) Nil
      else {
        val b = Seq.newBuilder[String]
        c.elements().forEachRemaining(v => b += v.asText())
        b.result()
      }
    }

  /** Extract signal rows from a CDC-PARSED signal-table stream: in the
    * protocol, operators send signals by INSERTING into a signal table
    * captured like any other — the envelope stream IS the transport.
    * Only streamed inserts (`op` = c) act by default (r17 advice): a
    * re-snapshot of the signal table replays its history as op='r'
    * rows, and replayed execute-snapshots would wipe completed
    * collections' chunk state. `includeSnapshotReads = true` restores
    * the r16 behavior for deployments whose signal table is
    * insert-once-then-truncated (where a snapshot read IS the first
    * delivery). Updates and deletes are housekeeping, always ignored.
    * Order rides the log position. Feed the result to [[applySignals]]
    * (typically as the signal stream's foreachBatch).
    */
  def fromEnvelope(parsed: DataFrame,
                   includeSnapshotReads: Boolean = false): DataFrame = {
    val ops = if (includeSnapshotReads) Seq("c", "r") else Seq("c")
    parsed.where(col("op").isin(ops: _*) && col("after").isNotNull)
      .select(col("after.id").as("id"), col("after.type").as("type"),
        col("after.data").as("data"), col("source.lsn").as("lsn"))
  }

  /** B16b — the FILE signal channel (r18) [PK: Debezium's signal
    * channels are pluggable — the signal TABLE through the change
    * stream is the default, and a FILE channel reads signals an
    * operator drops as JSON, no database write access needed]. A signal
    * is one JSON file `{"id","type","data","lsn"}` under
    * `<root>/_signal_channel/`; the lsn IS the claimed file sequence
    * ([[dropSignal]] uses the notification channel's create-exclusive
    * claim idiom), so arrival order is total and survives concurrent
    * droppers. [[fileChannel]] exposes the channel as a streaming frame
    * shaped exactly like [[fromEnvelope]]'s output — wire it to
    * [[applySignals]] (lenient) in a foreachBatch, same as the
    * table-borne transport.
    */
  private val ChannelDir = "_signal_channel"

  /** Drop one signal into the root's file channel; returns its lsn. */
  def dropSignal(spark: org.apache.spark.sql.SparkSession, root: String,
                 id: String, typ: String, data: String): Long = gated(root) {
    val fs = fsOf(spark, root)
    val dir = new Path(root, ChannelDir)
    fs.mkdirs(dir)
    val node = mapper.createObjectNode()
    node.put("id", id)
    node.put("type", typ)
    if (data != null) node.put("data", data)
    var seq = {
      // the prune watermark counts: lsn numbering continues past a
      // retired range (see [[pruneChannel]])
      val ns = fs.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.endsWith(".json") || n.startsWith("_pruned_"))
        .flatMap(n => scala.util.Try(
          n.stripPrefix("_pruned_").stripSuffix(".json").toLong).toOption)
      if (ns.isEmpty) 0L else ns.max + 1L
    }
    var written = -1L
    while (written < 0) {
      val claim = new Path(dir, f"$seq%010d.claim")
      val claimed =
        try { fs.create(claim, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!claimed) seq += 1
      else {
        node.put("lsn", seq)
        val name = f"$seq%010d.json"
        val tmp = new Path(dir, name + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
        finally out.close()
        fs.rename(tmp, new Path(dir, name))
        written = seq
      }
    }
    written
  }

  /** Channel retention (the notification channel's Kafka-shaped prune):
    * drop consumed signal files at or below `uptoLsn` behind a
    * `_pruned_<lsn>` watermark marker, so lsn numbering never restarts
    * into the retired range. A live stream is unaffected (the file
    * source tracks seen files); a FRESH consumer starting after a prune
    * sees only the retained tail — which is retention's meaning, and
    * why you prune only below every consumer's committed offset.
    */
  def pruneChannel(spark: org.apache.spark.sql.SparkSession, root: String,
                   uptoLsn: Long): Long = gated(root) {
    // the shared retention protocol — watermark-first with landed
    // verification, claim folding, seq numbering that survives the
    // retired range; see Notifications.pruneSeqDir for the full safety
    // argument (one implementation for both channels, r19 review)
    Notifications.pruneSeqDir(fsOf(spark, root), new Path(root, ChannelDir),
      uptoLsn, "pruneChannel")
  }

  /** The file channel as a streaming frame `(id, type, data, lsn)` —
    * one dropped file per streamed signal row; `.tmp` writes and bare
    * `.claim` markers never match the glob. Feed to [[applySignals]]
    * with `lenient = true` (one corrupt dropped file must not wedge
    * the channel).
    */
  def fileChannel(spark: org.apache.spark.sql.SparkSession,
                  root: String): DataFrame =
    spark.readStream.schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lsn",
          org.apache.spark.sql.types.LongType))))
      .option("pathGlobFilter", "*.json")
      .json(s"$root/$ChannelDir")

  /** Apply ONE signal against the in-memory state (pure protocol step;
    * throws IllegalArgumentException on a malformed signal).
    */
  private def applyOne(spark: org.apache.spark.sql.SparkSession, root: String,
                       st: State, typ: String, data: String): State =
    typ match {
      case "execute-snapshot" =>
        val named = collections(data)
        require(named.nonEmpty,
          "execute-snapshot needs data-collections naming what to snapshot")
        val snapTyp = {
          val n = mapper.readTree(data).get("type")
          if (n == null) "incremental" else n.asText()
        }
        require(snapTyp == "incremental" || snapTyp == "blocking",
          s"unsupported snapshot type '$snapTyp' (incremental | blocking)")
        // additional-conditions: per-collection SQL predicates narrowing
        // WHAT the snapshot reads (the protocol's partial re-snapshot —
        // "re-read the rows WHERE ..."), evaluated at chunk-read time in
        // [[turn]]
        val conds = {
          val b = Map.newBuilder[String, String]
          val node = mapper.readTree(data).get("additional-conditions")
          if (node != null) node.elements().forEachRemaining { c =>
            val dc = c.get("data-collection"); val f = c.get("filter")
            require(dc != null && f != null,
              "each additional-condition needs data-collection and filter")
            b += dc.asText() -> f.asText()
          }
          b.result()
        }
        require(conds.keySet.forall(named.contains),
          s"additional-conditions name collections outside data-collections: " +
            conds.keySet.filterNot(named.contains).mkString(", "))
        val wantBlocking = snapTyp == "blocking"
        val (queued, fresh) = named.partition(st.queue.contains)
        // an already-queued collection whose NEW signal asks for a
        // different condition or blocking flag adopts the newest signal
        // (r17 advice — previously the change was silently discarded):
        // its chunk state resets so the new condition applies from row
        // zero, never a mixed-coverage read. Identical re-executes stay
        // pure dedups (no reset — spec-pinned).
        val changed = queued.filter { c =>
          st.blocking.contains(c) != wantBlocking ||
            st.conditions.get(c) != conds.get(c)
        }
        // re-execute of a finished/stopped collection = a fresh
        // re-snapshot: drop its old chunk state so stale chunks from a
        // longer previous run can't shadow the new read
        (fresh ++ changed).foreach { c =>
          val p = new Path(collectionPath(root, c))
          val fs = fsOf(spark, root)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val adopt = fresh ++ changed
        st.copy(queue = st.queue ++ fresh,
          done = st.done.filterNot(fresh.contains),
          blocking = {
            val base = st.blocking.filterNot(changed.contains)
            if (wantBlocking) base ++ adopt.filterNot(base.contains) else base
          },
          conditions = st.conditions -- adopt ++
            conds.filter { case (k, _) => adopt.contains(k) })
      case "stop-snapshot" =>
        val named = collections(data)
        if (named.isEmpty)
          st.copy(queue = Nil, blocking = Nil, conditions = Map.empty)
        else st.copy(queue = st.queue.filterNot(named.contains),
          blocking = st.blocking.filterNot(named.contains),
          conditions = st.conditions -- named)
      case "pause-snapshot"  => st.copy(paused = true)
      case "resume-snapshot" => st.copy(paused = false)
      case _                 => st // unknown types pass through untouched
    }

  /** Apply one batch of signal rows `(id, type, data[, lsn])` in
    * (lsn, id) order and persist the new state. The collect is
    * control-plane-bounded by construction (signals are operator
    * actions, not data).
    *
    * `lenient = true` is the STREAM wiring mode (r17 advice): a
    * malformed signal row is logged and skipped instead of failing the
    * batch — a foreachBatch that throws retries the same batch forever,
    * and one bad operator row must not wedge the whole signal channel
    * [PK: Debezium logs and skips invalid signals]. The default stays
    * strict for direct programmatic use, where the caller IS the signal
    * author and wants the error.
    *
    * `epoch`: pass this driver's [[acquireWriter]] token to fence
    * zombie writers; the write refuses (StaleWriterException) when a
    * newer epoch exists.
    */
  def applySignals(spark: org.apache.spark.sql.SparkSession, root: String,
                   signals: DataFrame, lenient: Boolean = false,
                   epoch: Option[Long] = None): State = {
    val hasLsn = signals.columns.contains("lsn")
    val ordered = (if (hasLsn) signals.orderBy(col("lsn"), col("id"))
                   else signals.orderBy(col("id")))
      .select(col("id").cast("string"), col("type").cast("string"),
        col("data").cast("string"))
      .collect()
    lockFor(root).synchronized {
      checkEpoch(spark, root, epoch, "applySignals")
      var st = state(spark, root)
      val pendingEvents = scala.collection.mutable.ArrayBuffer
        .empty[(String, Option[String], Option[Long], Option[Long])]
      ordered.foreach { r =>
        val (id, typ, data) = (r.getString(0), r.getString(1), r.getString(2))
        val prev = st
        // lenient catches exactly the VALIDATION failure classes (r18
        // advice, narrowed in the r18 review): applyOne surfaces
        // malformed signals as IllegalArgumentException, and an
        // unparseable JSON `data` field throws JsonProcessingException
        // from mapper.readTree — under the original IAE-only catch one
        // corrupt row failed the whole foreachBatch and retried forever,
        // the exact wedge lenient mode exists to prevent. The catch must
        // NOT widen to NonFatal: applyOne's execute branch DELETES chunk
        // state after validation passes, and swallowing a transient FS
        // IOException there would permanently drop a VALID signal when a
        // retry is the correct behavior (applyOne validates before any
        // write, so a validation throw never leaves partial effects).
        try st = applyOne(spark, root, st, typ, data)
        catch {
          case e @ (_: IllegalArgumentException |
                    _: com.fasterxml.jackson.core.JsonProcessingException)
            if lenient =>
            log.warn(s"skipping invalid signal id=$id type=$typ at $root: " +
              e.getMessage)
        }
        // B18 — collect the protocol transitions this signal caused
        // (skipped signals changed nothing → no event). `stopped` = a
        // stop NAMING collections cut this one off; `aborted` = a
        // stop-everything killed it; either way the counts record
        // whatever coverage the collection keeps — captured NOW (a later
        // execute in the same batch may reset the chunk state) but
        // appended only AFTER the state commits below (r18 review): a
        // mid-batch validation throw or a stale-epoch refusal must not
        // leave the replayable log claiming transitions that never
        // happened.
        typ match {
          case "stop-snapshot" =>
            val stopAll = scala.util.Try(collections(data)).toOption
              .forall(_.isEmpty)
            val evt = if (stopAll) "aborted" else "stopped"
            prev.queue.filterNot(st.queue.contains).foreach { c =>
              val stats = IncrementalSnapshot.cursorStats(
                spark, collectionPath(root, c))
              pendingEvents += ((evt, Some(c),
                Some(stats.map(_._1).getOrElse(0L)),
                Some(stats.map(_._2).getOrElse(0L))))
            }
          case "pause-snapshot" if !prev.paused && st.paused =>
            pendingEvents += (("paused", None, None, None))
          case "resume-snapshot" if prev.paused && !st.paused =>
            pendingEvents += (("resumed", None, None, None))
          case _ => ()
        }
      }
      checkEpoch(spark, root, epoch, "applySignals")
      writeState(spark, root, st)
      // events describe COMMITTED transitions; a crash between the state
      // write and these appends loses them (best-effort delivery — the
      // pull-side progress readout remains the authoritative state; the
      // window is pinned by NotificationsSpec's crash-injection case:
      // the log shows a GAP, never a torn or wrong event). Debezium's
      // notifications are likewise best-effort; B17's history is the
      // at-least-once record (event before pin move).
      pendingEvents.foreach { case (t, c, ch, ro) =>
        Notifications.append(spark, root, t, c, ch, ro)
      }
      st
    }
  }

  /** One paced maintenance turn: land up to `maxChunks` chunks of the
    * queue's HEAD collection through the B15 composite-key cursor loop.
    * A paused state lands nothing — pause beats blocking. A head that
    * exhausts (lands fewer than asked) pops to `done`; the NEXT turn
    * starts the next collection — one collection in flight at a time,
    * in signal order, exactly the protocol's sequential-collection
    * drain. A BLOCKING head ignores the pacing knob and drains
    * completely in this one turn (the ad-hoc full snapshot; the turn
    * holds the root's writer lock throughout, so a [[gated]] change
    * sink is excluded for exactly the drain window). Returns the number
    * of chunks landed.
    *
    * `epoch`: the fence token (see [[applySignals]]) — checked at turn
    * entry and again before the pop write.
    */
  def turn(spark: org.apache.spark.sql.SparkSession, root: String,
           tableOf: String => DataFrame, keyColsOf: String => Seq[String],
           chunkSizeOf: String => Int, loLsnOf: (String, Long) => Long,
           maxChunks: Int, epoch: Option[Long] = None): Int = {
    require(maxChunks >= 1, s"a turn must be allowed at least one chunk: $maxChunks")
    lockFor(root).synchronized {
      checkEpoch(spark, root, epoch, "turn")
      val st = state(spark, root)
      if (st.paused || st.queue.isEmpty) 0
      else {
        val head = st.queue.head
        val allowed = if (st.blocking.contains(head)) Int.MaxValue else maxChunks
        // additional-conditions narrow the snapshot read itself: the filter
        // composes INTO the chunk SELECT (pushed down under the key-range
        // predicate), so unmatched rows never move — a partial re-snapshot,
        // not a post-filter
        val table = st.conditions.get(head) match {
          case Some(cond) => tableOf(head).where(expr(cond))
          case None       => tableOf(head)
        }
        // B18 — a head with no `_started` marker is STARTING its chunk
        // loop (first execute or a reset re-execute — the reset deletes
        // the collection dir, marker included). `started` is emitted
        // BEFORE the landing attempt and deduped on retry by the marker
        // (r18 advice): the old post-landing ordering keyed freshness on
        // the cursor, so a turn that threw AFTER chunk 1 landed (epoch
        // fence on chunk 2, FS error mid-loop) left a cursor and its
        // retry never emitted `started` while later heartbeats and the
        // terminal event still appeared — a permanently malformed
        // lifecycle. Ordering: event first, marker second — a crash
        // between the two re-emits `started` on retry, a dedupable
        // duplicate (at-least-once), never a started-less lifecycle.
        // The marker is underscore-named: Spark's file listings hide it
        // from the chunk-row reads sharing the directory.
        val headPath = collectionPath(root, head)
        val fs = fsOf(spark, root)
        val startedMark = new Path(headPath, "_started")
        if (!fs.exists(startedMark)) {
          Notifications.append(spark, root, "started", Some(head),
            Some(0L), Some(0L))
          fs.mkdirs(new Path(headPath))
          try fs.create(startedMark, false).close()
          catch { case _: java.io.IOException => () } // a rival marked it
        }
        // the epoch is re-verified PER CHUNK (r18 advice), not only at
        // turn entry: loLsnOf runs inside the chunk loop immediately
        // before each landing, so a zombie driver that passed the entry
        // check stops landing chunks (and moving the collection cursor)
        // within one chunk of a successor's takeover — without this, a
        // successor that re-executed the collection under a different
        // condition could watch the zombie repopulate the reset chunk
        // dir with stale-condition data
        val landed = IncrementalSnapshot.snapshotChunksCk(
          spark, headPath, table, keyColsOf(head),
          chunkSizeOf(head),
          cid => { checkEpoch(spark, root, epoch, "turn chunk"); loLsnOf(head, cid) },
          allowed)
        // B18 — the per-turn heartbeat (cumulative coverage off the B15
        // cursor — driver FS reads, no job) and the terminal events
        val statsAfter = IncrementalSnapshot.cursorStats(spark, headPath)
        if (landed > 0)
          Notifications.append(spark, root, "chunk-landed", Some(head),
            Some(statsAfter.map(_._1).getOrElse(0L)),
            Some(statsAfter.map(_._2).getOrElse(0L)))
        if (landed < allowed) {
          // exhausted: pop — re-read state first so a CROSS-driver signal
          // applied while the chunks landed is not clobbered by our stale
          // copy (in-driver interleaving is excluded by the lock).
          // NOTE (documented residual race): the checkEpoch→writeState
          // window below is check-then-act — a successor acquiring the
          // epoch in exactly that gap can still have its state write
          // clobbered by this pop. The fence is BEST-EFFORT zombie
          // suppression (bounded to one state write, and the successor's
          // next fenced write re-reads state), not a distributed lock;
          // closing it fully needs a CAS the FS API doesn't offer.
          checkEpoch(spark, root, epoch, "turn pop")
          val now = state(spark, root)
          val rest = now.queue.filterNot(_ == head)
          // Debezium's vocabulary splits the terminal events (r19, the
          // r18 verdict's #3): `table-scan-completed` is PER COLLECTION;
          // the aggregate `completed` — the event an operator pages on —
          // fires when this pop leaves the queue EMPTY: every collection
          // the snapshot was asked for has drained (a stop-snapshot
          // emptying the queue is an abort, not a completion, and emits
          // stopped/aborted instead). The terminal events get the
          // `started` treatment (r19 review): emitted BEFORE the pop
          // write, deduped on retry by a `_scan_completed` marker — the
          // old post-writeState ordering made the one event an operator
          // pages on best-effort (a crash in the window lost it forever:
          // the retry short-circuits on the already-popped queue and
          // never reaches the append). Ordering: events, marker, state —
          // a crash before the marker re-emits on retry (an at-least-once
          // duplicate, dedupable by seq-adjacent type+collection), a
          // crash after it completes the pop with the events already
          // durable. A reset re-execute deletes the collection dir,
          // marker included, so a re-snapshot's own completion emits
          // fresh events. applySignals's stopped/aborted stay best-effort
          // post-commit (NotificationsSpec pins that window separately).
          val scanMark = new Path(headPath, "_scan_completed")
          if (!fs.exists(scanMark)) {
            Notifications.append(spark, root, "table-scan-completed",
              Some(head),
              Some(statsAfter.map(_._1).getOrElse(0L)),
              Some(statsAfter.map(_._2).getOrElse(0L)))
            if (rest.isEmpty)
              Notifications.append(spark, root, "completed", None, None, None)
            try fs.create(scanMark, false).close()
            catch { case _: java.io.IOException => () } // a rival marked it
          }
          writeState(spark, root, now.copy(
            queue = rest,
            blocking = now.blocking.filterNot(_ == head),
            conditions = now.conditions - head,
            done = if (now.done.contains(head)) now.done else now.done :+ head))
        }
        landed
      }
    }
  }

  /** Operator-facing PROGRESS readout — what the reference platform
    * exposes over management interfaces: one row per collection the
    * protocol has ever touched, with its lifecycle phase and landed
    * volume. Phases: `queued` (waiting), `in-flight` (the head),
    * `paused` (the head under a pause), `done` (completed), `stopped`
    * (has landed chunks but is neither queued nor done — a
    * stop-snapshot cut it off). JOB-FREE (r17, the r16 verdict's #3):
    * the landed (chunks, rows) ride the B15 cursor the chunk loop
    * already writes, so the whole readout is driver FS reads — zero
    * Spark jobs (spec-asserted). Pre-r17 collection dirs without cursor
    * stats fall back to one metadata count job each.
    */
  def progress(spark: org.apache.spark.sql.SparkSession,
               root: String): DataFrame = {
    import spark.implicits._
    val st = state(spark, root)
    val fs = fsOf(spark, root)
    val onDisk = {
      val p = new Path(s"$root/collections")
      if (fs.exists(p)) fs.listStatus(p).map(_.getPath.getName).toSeq else Nil
    }
    val all = (st.queue ++ st.done ++ onDisk).distinct.sorted
    all.map { c =>
      val phase =
        if (st.done.contains(c)) "done"
        else if (st.queue.headOption.contains(c))
          if (st.paused) "paused" else "in-flight"
        else if (st.queue.contains(c)) "queued"
        else "stopped"
      val cp = collectionPath(root, c)
      val (chunks, rows) = IncrementalSnapshot.cursorStats(spark, cp) match {
        case Some((ch, ro)) => (ch, ro)
        case None =>
          if (fs.exists(new Path(s"$cp/chunks"))) {
            val landed = spark.read.parquet(s"$cp/chunks")
            (landed.select("__chunk").distinct().count(), landed.count())
          } else (0L, 0L)
      }
      (c, phase, chunks, rows, st.blocking.contains(c),
        st.conditions.get(c).orNull)
    }.toDF("collection", "phase", "chunks_landed", "rows_landed",
      "blocking", "condition")
  }

  /** A stopped-or-finished collection's merged read — B15's `state`
    * over whatever chunks the signal protocol let land.
    */
  def collectionState(spark: org.apache.spark.sql.SparkSession, root: String,
                      collection: String, changes: DataFrame,
                      keyCols: Seq[String], lsnCol: String): DataFrame =
    IncrementalSnapshot.state(spark, collectionPath(root, collection),
      changes, keyCols, lsnCol)
}

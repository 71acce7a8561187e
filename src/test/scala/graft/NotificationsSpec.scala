package graft

import graft.cdc.{Notifications, Signals}
import org.scalatest.funsuite.AnyFunSuite

/** B18 — the notification channel: crash-window invisibility (torn tmp),
  * claim-protocol slot skipping, and the lifecycle-emission wiring the
  * contract query's scripted walk relies on (started fires once per
  * chunk-loop start, never on a mid-drain resume; heartbeats carry
  * cumulative coverage).
  */
class NotificationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("a torn tmp event is invisible; the claim protocol skips a rival's slot") {
    val root = tmp("graft-notif-crash")
    Notifications.append(spark, root, "started", Some("t1"), Some(0L), Some(0L))
    // crash mid-append: only a torn .tmp — readers must not see it
    val dir = new java.io.File(s"$root/_notifications")
    val w1 = new java.io.FileWriter(new java.io.File(dir, "0000000001.json.tmp"))
    w1.write("{\"seq\":1,\"ty"); w1.close()
    assert(Notifications.read(spark, root).count() === 1L)
    // a rival's standing claim forces the next append past its number
    new java.io.File(dir, "0000000001.claim").createNewFile()
    val seq = Notifications.append(spark, root, "completed", Some("t1"))
    assert(seq === 2L)
    assert(new java.io.File(dir, "0000000001.claim").exists())
    assert(Notifications.read(spark, root).select("seq")
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 2L),
      "the log carries a gap, never a lost or torn event")
  }

  test("started fires at chunk-loop start only — a mid-drain turn emits just the heartbeat") {
    val root = tmp("graft-notif-started")
    val t1 = (0L until 40L).map(i => (i, s"a$i")).toDF("k", "v")
    Signals.applySignals(spark, root, Seq(
      ("a", "execute-snapshot", """{"data-collections":["t1"]}""", 1L))
      .toDF("id", "type", "data", "lsn"))
    def turn() = Signals.turn(spark, root, _ => t1, _ => Seq("k"), _ => 10,
      (_, cid) => 100L + cid, maxChunks = 2)
    assert(turn() === 2) // chunks 0-1: started + heartbeat
    assert(turn() === 2) // chunks 2-3: heartbeat only (mid-drain)
    assert(turn() === 0) // exhausted: table-scan-completed + aggregate
    val ev = Notifications.read(spark, root)
      .select("type", "collection", "chunks_landed", "rows_landed")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(ev.toSeq === Seq(
      ("started", "t1", 0L, 0L),
      ("chunk-landed", "t1", 2L, 20L),
      ("chunk-landed", "t1", 4L, 40L),
      ("table-scan-completed", "t1", 4L, 40L),
      ("completed", null, -1L, -1L)),
      "one started, cumulative heartbeats, the per-collection terminal, " +
        "and — the pop emptied the queue — the aggregate completed")
    // a re-execute RESETS the chunk loop: started fires again
    Signals.applySignals(spark, root, Seq(
      ("b", "execute-snapshot", """{"data-collections":["t1"]}""", 2L))
      .toDF("id", "type", "data", "lsn"))
    turn()
    val restarted = Notifications.read(spark, root)
      .where($"type" === "started").count()
    assert(restarted === 2L, "a reset re-execute is a NEW chunk loop")
  }

  test("law: random protocol scripts produce EXACTLY the modeled event log (seeded)") {
    // the SignalsFencingSpec law pins landed COVERAGE against a ~30-line
    // model; this one pins the B18 CHANNEL: for random scripts of
    // executes (with conditions + blocking), stops, pauses, resumes and
    // turns, the notification log must equal — event for event, count
    // for count, in seq order — what the model emits. An extra, missing,
    // or mis-counted lifecycle event anywhere in the protocol fails here.
    val rnd = new scala.util.Random(20260818L)
    val total = Map("t1" -> 40L, "t2" -> 20L)
    val condChoices = Seq(None, Some("k < 10"), Some("k % 2 = 0"))
    def matching(t: String, cond: Option[String]): Long = cond match {
      case None              => total(t)
      case Some("k < 10")    => 10L
      case Some("k % 2 = 0") => total(t) / 2
      case other             => fail(s"unmodeled condition $other")
    }
    def tableOf(n: String) = n match {
      case "t1" => (0L until 40L).map(i => (i, s"a$i")).toDF("k", "payload")
      case "t2" => (0L until 20L).map(i => (i, s"b$i")).toDF("k", "payload")
      case other => fail(s"unexpected collection $other")
    }
    for (trial <- 0 until 6) {
      val root = tmp(s"graft-notif-law-$trial")
      // protocol model state
      var q = Vector.empty[String]
      var paused = false
      var rows = Map("t1" -> 0L, "t2" -> 0L)
      var chunks = Map("t1" -> 0L, "t2" -> 0L)
      var hasCursor = Set.empty[String]
      var condOf = Map.empty[String, Option[String]].withDefaultValue(None)
      var blockingOf = Set.empty[String]
      // the modeled channel: (type, collection, chunks, rows) — nulls as
      // (-1) sentinels for the gate events
      val expected = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Long)]
      def modelTurn(): Unit = if (!paused && q.nonEmpty) {
        val h = q.head
        if (!hasCursor.contains(h)) expected += (("started", h, 0L, 0L))
        val rem = matching(h, condOf(h)) - rows(h)
        val k =
          if (blockingOf.contains(h)) (rem + 9L) / 10L
          else math.min(2L, (rem + 9L) / 10L)
        if (k > 0) {
          hasCursor += h
          rows += h -> (rows(h) + math.min(rem, k * 10L))
          chunks += h -> (chunks(h) + k)
          expected += (("chunk-landed", h, chunks(h), rows(h)))
        }
        val pops = blockingOf.contains(h) || k < 2L
        if (pops) {
          q = q.tail; blockingOf -= h; condOf -= h
          expected += (("table-scan-completed", h, chunks(h), rows(h)))
          // the pop that EMPTIES the queue ends the whole requested
          // snapshot: the aggregate completed (r19, Debezium vocabulary)
          if (q.isEmpty) expected += (("completed", null, -1L, -1L))
        }
      }
      def modelExecute(c: String, cond: Option[String], blocking: Boolean): Unit = {
        val fresh = !q.contains(c)
        val changed = !fresh &&
          (condOf(c) != cond || blockingOf.contains(c) != blocking)
        if (fresh || changed) {
          rows += c -> 0L; chunks += c -> 0L; hasCursor -= c
          condOf += c -> cond
          blockingOf = if (blocking) blockingOf + c else blockingOf - c
          if (fresh) q = q :+ c
        }
      }
      var sigId = 0
      def apply(typ: String, data: String): Unit = {
        sigId += 1
        Signals.applySignals(spark, root, Seq(
          (f"s$sigId%03d", typ, data, sigId.toLong))
          .toDF("id", "type", "data", "lsn"))
      }
      def realTurn() = Signals.turn(spark, root, tableOf, _ => Seq("k"),
        _ => 10, (_, cid) => 100L + cid, maxChunks = 2)
      for (_ <- 0 until 12) rnd.nextInt(6) match {
        case 0 | 1 =>
          val c = if (rnd.nextBoolean()) "t1" else "t2"
          val cond = condChoices(rnd.nextInt(condChoices.length))
          val blocking = rnd.nextInt(4) == 0
          val condJson = cond.map(f =>
            s""","additional-conditions":[{"data-collection":"$c","filter":"$f"}]""")
            .getOrElse("")
          val typJson = if (blocking) ""","type":"blocking"""" else ""
          apply("execute-snapshot",
            s"""{"data-collections":["$c"]$typJson$condJson}""")
          modelExecute(c, cond, blocking)
        case 2 =>
          val c = if (rnd.nextBoolean()) "t1" else "t2"
          apply("stop-snapshot", s"""{"data-collections":["$c"]}""")
          if (q.contains(c))
            expected += (("stopped", c, chunks(c), rows(c)))
          q = q.filterNot(_ == c); blockingOf -= c; condOf -= c
        case 3 =>
          apply("pause-snapshot", null)
          if (!paused) expected += (("paused", null, -1L, -1L))
          paused = true
        case 4 =>
          apply("resume-snapshot", null)
          if (paused) expected += (("resumed", null, -1L, -1L))
          paused = false
        case 5 => realTurn(); modelTurn()
      }
      // stop-everything at the end: every queued collection ABORTS
      apply("stop-snapshot", null)
      q.foreach(c => expected += (("aborted", c, chunks(c), rows(c))))
      q = Vector.empty
      val got = Notifications.read(spark, root)
        .select("type", "collection", "chunks_landed", "rows_landed")
        .collect().map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(got === expected.toSeq,
        s"trial $trial: the channel must equal the modeled event log")
      // retention composes with the LIVE protocol: prune everything,
      // then one more scripted transition — the channel must hold
      // exactly the new event, numbered past the retired range
      if (expected.nonEmpty) {
        val maxSeq = Notifications.read(spark, root)
          .agg(org.apache.spark.sql.functions.max("seq")).head().getLong(0)
        Notifications.prune(spark, root, maxSeq)
        apply("pause-snapshot", null)
        val tail = Notifications.read(spark, root)
          .select("seq", "type").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        val want =
          if (paused) Nil // already paused: no transition, no event
          else Seq((maxSeq + 1L, "paused"))
        assert(tail === want,
          s"trial $trial: post-prune emission must continue past the watermark")
      }
    }
  }

  test("retention: prune drops the old tail, numbering and readers respect the watermark") {
    val root = tmp("graft-notif-prune")
    for (i <- 0 until 6)
      Notifications.append(spark, root, "chunk-landed", Some("t1"),
        Some(i.toLong), Some(i * 10L))
    assert(Notifications.prune(spark, root, uptoSeq = 3L) === 4L)
    assert(Notifications.read(spark, root).select("seq")
      .collect().map(_.getLong(0)).toSeq === Seq(4L, 5L),
      "only the retained tail is readable")
    // numbering continues past the pruned range — even after pruning
    // EVERYTHING (the watermark marker carries the floor)
    assert(Notifications.prune(spark, root, uptoSeq = 5L) === 2L)
    val next = Notifications.append(spark, root, "completed", Some("t1"))
    assert(next === 6L, "seqs never restart into the retired range")
    // crash window: a leftover event file at or below the watermark is
    // invisible (the marker is authoritative) and a re-prune removes it
    val w = new java.io.FileWriter(s"$root/_notifications/0000000002.json")
    w.write("""{"seq":2,"ts_ms":1,"type":"started"}"""); w.close()
    assert(Notifications.read(spark, root).select("seq")
      .collect().map(_.getLong(0)).toSeq === Seq(6L),
      "a crash-leftover below the watermark stays retired")
    assert(Notifications.prune(spark, root, 5L) === 1L,
      "re-prune sweeps the leftover")
    // prune is monotone: an older watermark is a no-op
    assert(Notifications.prune(spark, root, 1L) === 0L)
    assert(Notifications.read(spark, root).count() === 1L)
  }

  test("crash window between writeState and the event appends: state authoritative, the log gaps, never lies (r18 verdict #5)") {
    val root = tmp("graft-notif-crashwin")
    val t1 = (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v")
    Signals.applySignals(spark, root, Seq(
      ("a", "execute-snapshot", """{"data-collections":["t1"]}""", 1L))
      .toDF("id", "type", "data", "lsn"))
    assert(Signals.turn(spark, root, _ => t1, _ => Seq("k"), _ => 5,
      (_, cid) => 100L + cid, maxChunks = 1) === 1)
    // INJECT the crash: a file squatting on the channel dir makes the
    // post-writeState append throw — exactly the documented window in
    // applySignals (state commits first, events append after)
    val dir = new java.io.File(s"$root/_notifications")
    val saved = new java.io.File(s"$root/_notif_saved")
    assert(dir.renameTo(saved))
    assert(new java.io.File(s"$root/_notifications").createNewFile())
    val ex = intercept[java.io.IOException] {
      Signals.applySignals(spark, root, Seq(
        ("b", "stop-snapshot", """{"data-collections":["t1"]}""", 2L))
        .toDF("id", "type", "data", "lsn"))
    }
    assert(ex.getMessage.contains("not a directory"))
    // the state write PRECEDED the crash: the pull-side progress readout
    // is authoritative — the stop applied
    assert(Signals.state(spark, root).queue.isEmpty,
      "the stop committed even though its notification was lost")
    // ...while the channel shows a GAP (no stopped event), never a torn
    // or wrong one — best-effort delivery loses, never lies
    assert(new java.io.File(s"$root/_notifications").delete())
    assert(saved.renameTo(dir))
    val types = Notifications.read(spark, root)
      .select("type").collect().map(_.getString(0)).toSeq
    assert(types === Seq("started", "chunk-landed"),
      s"no stopped event may appear after the crash, got $types")
    // life goes on: the fault cleared, the next transition lands with a
    // continuing seq
    Signals.applySignals(spark, root, Seq(("c", "pause-snapshot", null, 3L))
      .toDF("id", "type", "data", "lsn"))
    val tail = Notifications.read(spark, root)
      .orderBy($"seq".desc).select("seq", "type").head()
    assert(tail.getLong(0) === 2L && tail.getString(1) === "paused")
  }

  test("pop crash windows: terminal events at-least-once — a pre-event crash re-emits on retry, the marker dedupes a post-event one (r19 review)") {
    def run(root: String): Int = {
      val t1 = (0L until 4L).map(i => (i, s"a$i")).toDF("k", "v")
      Signals.applySignals(spark, root, Seq(
        ("a", "execute-snapshot", """{"data-collections":["t1"]}""", 1L))
        .toDF("id", "type", "data", "lsn"))
      // one chunk covers the table; landed == allowed, so the POP is the
      // NEXT turn's (landed 0) — where the crash windows live
      Signals.turn(spark, root, _ => t1, _ => Seq("k"), _ => 5,
        (_, cid) => 100L + cid, maxChunks = 1)
    }
    def turnOnce(root: String) = Signals.turn(spark, root,
      _ => (0L until 4L).map(i => (i, s"a$i")).toDF("k", "v"),
      _ => Seq("k"), _ => 5, (_, cid) => 100L + cid, maxChunks = 1)
    // window 1: the channel dies BEFORE the terminal events land — the
    // pop ABORTS (state unwritten, head still queued), the retry emits
    // the events and completes: lost-forever became retry-once
    val r1 = tmp("graft-notif-popcrash1")
    assert(run(r1) === 1)
    val dir1 = new java.io.File(s"$r1/_notifications")
    val saved1 = new java.io.File(s"$r1/_notif_saved")
    assert(dir1.renameTo(saved1))
    assert(new java.io.File(s"$r1/_notifications").createNewFile())
    intercept[java.io.IOException] { turnOnce(r1) }
    assert(Signals.state(spark, r1).queue === Seq("t1"),
      "the aborted pop must leave the head queued — the retry finishes it")
    assert(new java.io.File(s"$r1/_notifications").delete())
    assert(saved1.renameTo(dir1))
    assert(turnOnce(r1) === 0)
    val types1 = Notifications.read(spark, r1)
      .orderBy($"seq").select("type").collect().map(_.getString(0)).toSeq
    assert(types1 === Seq("started", "chunk-landed", "table-scan-completed",
      "completed"), s"the retry must deliver the terminal events: $types1")
    assert(Signals.state(spark, r1).done === Seq("t1"))
    // window 2: the crash lands AFTER the events and the marker but
    // BEFORE the state write — the retry must NOT duplicate the
    // terminal events (the marker dedupes) and must complete the pop
    val r2 = tmp("graft-notif-popcrash2")
    assert(run(r2) === 1)
    val squat = new java.io.File(s"$r2/_signals.tmp")
    assert(squat.mkdir()) // writeState's tmp create now throws
    intercept[java.io.IOException] { turnOnce(r2) }
    val midTypes = Notifications.read(spark, r2)
      .select("type").collect().map(_.getString(0)).toSeq
    assert(midTypes.count(_ == "completed") === 1,
      "the events landed before the state-write crash")
    assert(squat.delete())
    assert(turnOnce(r2) === 0)
    val types2 = Notifications.read(spark, r2)
      .orderBy($"seq").select("type").collect().map(_.getString(0)).toSeq
    assert(types2 === Seq("started", "chunk-landed", "table-scan-completed",
      "completed"), s"the marker must dedupe the retry's events: $types2")
    assert(Signals.state(spark, r2).queue.isEmpty &&
      Signals.state(spark, r2).done === Seq("t1"))
  }

  test("prune folds claims under the watermark — append's listing is bounded (r18 verdict #8)") {
    val root = tmp("graft-notif-claimfold")
    val dir = new java.io.File(s"$root/_notifications")
    // soak: rounds of (append a burst, prune all but the tail) — the
    // directory must stay O(retained + claims-since-prune), never grow
    // with lifetime
    var lastSeq = -1L
    for (round <- 0 until 5) {
      for (i <- 0 until 8)
        lastSeq = Notifications.append(spark, root, "chunk-landed",
          Some("t1"), Some(round * 8L + i), Some(0L))
      Notifications.prune(spark, root, lastSeq - 2L)
      val names = dir.list().toSeq
      val jsons = names.count(_.endsWith(".json"))
      val claims = names.count(_.endsWith(".claim"))
      val marks = names.count(_.startsWith("_pruned_"))
      assert(jsons === 2 && claims === 2 && marks === 1,
        s"round $round: retained-tail bound violated — $names")
    }
    // numbering still continues past the folded range
    assert(Notifications.append(spark, root, "completed", Some("t1"))
      === lastSeq + 1L)
  }

  test("prune ABORTS before deleting anything when the watermark cannot land (r18 advice)") {
    val root = tmp("graft-notif-prune-abort")
    for (i <- 0 until 4)
      Notifications.append(spark, root, "chunk-landed", Some("t1"),
        Some(i.toLong), Some(0L))
    // inject the create failure: a directory squatting on the marker name
    // makes the create-exclusive throw, and a directory is NOT a valid
    // watermark — without the post-catch verification the old code would
    // have deleted every event and left the channel floorless
    val blocker = new java.io.File(s"$root/_notifications/_pruned_2")
    assert(blocker.mkdir())
    val ex = intercept[java.io.IOException] {
      Notifications.prune(spark, root, 2L)
    }
    assert(ex.getMessage.contains("did not land"))
    assert(Notifications.read(spark, root).count() === 4L,
      "an aborted prune must not have deleted any event")
    // clear the fault: the retried prune completes normally
    assert(blocker.delete())
    assert(Notifications.prune(spark, root, 2L) === 3L)
    assert(Notifications.read(spark, root).select("seq")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}

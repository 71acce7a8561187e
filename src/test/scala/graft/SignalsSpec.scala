package graft

import graft.cdc.{IncrementalSnapshot, Signals}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B16 — signal-protocol laws the contract hash can't carry: queue
  * order and sequential drain, pause gating, stop keeping landed
  * chunks, re-execute resetting a finished collection, unknown-type
  * tolerance, and the crash protocol on the state file itself.
  */
class SignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def tableOf(n: String) = n match {
    case "t1" => (0L until 40L).map(i => (i, s"a$i")).toDF("k", "payload")
    case "t2" => (0L until 20L).map(i => (i, s"b$i")).toDF("k", "payload")
    case other => fail(s"unexpected collection $other")
  }

  private def sig(rows: (String, String, String, Long)*) =
    rows.toDF("id", "type", "data", "lsn")

  private def turn(root: String, maxChunks: Int = 2) =
    Signals.turn(spark, root, tableOf, _ => Seq("k"), _ => 10,
      (_, cid) => 100L + cid, maxChunks)

  test("execute queues in order; collections drain sequentially; done records completion") {
    val root = tmp("graft-sig-order")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t1","t2"]}""", 1L)))
    assert(Signals.state(spark, root) === Signals.State(Seq("t1", "t2"), false, Nil))
    // t1 = 4 chunks of 10: two turns land it, the third pops it
    assert(turn(root) === 2 && turn(root) === 2)
    assert(Signals.state(spark, root).queue === Seq("t1", "t2"),
      "a head that filled its allowance is not popped yet")
    assert(turn(root) === 0)
    assert(Signals.state(spark, root) === Signals.State(Seq("t2"), false, Seq("t1")))
    // t2 = 2 chunks: lands in one turn, pops on the next
    assert(turn(root) === 2 && turn(root) === 0)
    assert(Signals.state(spark, root) === Signals.State(Nil, false, Seq("t1", "t2")))
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t1")).count() === 40L)
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t2")).count() === 20L)
    // nothing queued: further turns are free no-ops
    assert(turn(root) === 0)
  }

  test("pause gates the turn; resume releases it; the queue never moves while paused") {
    val root = tmp("graft-sig-pause")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t1"]}""", 1L),
      ("b", "pause-snapshot", null, 2L)))
    assert(Signals.state(spark, root).paused)
    assert(turn(root) === 0 && turn(root) === 0)
    assert(!new java.io.File(Signals.collectionPath(root, "t1")).exists,
      "a paused turn must not touch the collection")
    Signals.applySignals(spark, root, sig(("c", "resume-snapshot", null, 3L)))
    assert(turn(root) === 2)
  }

  test("stop keeps landed chunks readable; dataless stop clears everything") {
    val root = tmp("graft-sig-stop")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t1","t2"]}""", 1L)))
    assert(turn(root) === 2) // 20 of t1's 40 rows landed
    Signals.applySignals(spark, root, sig(
      ("b", "stop-snapshot", """{"data-collections":["t1"]}""", 2L)))
    assert(Signals.state(spark, root).queue === Seq("t2"))
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t1")).count() === 20L,
      "stop-snapshot keeps what already landed")
    Signals.applySignals(spark, root, sig(("c", "stop-snapshot", null, 3L)))
    assert(Signals.state(spark, root).queue === Nil)
    assert(turn(root) === 0)
  }

  test("re-execute of a completed collection resets its chunk state for a fresh pass") {
    val root = tmp("graft-sig-rerun")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t2"]}""", 1L)))
    assert(turn(root) === 2 && turn(root) === 0)
    assert(Signals.state(spark, root).done === Seq("t2"))
    Signals.applySignals(spark, root, sig(
      ("b", "execute-snapshot", """{"data-collections":["t2"]}""", 2L)))
    val st = Signals.state(spark, root)
    assert(st.queue === Seq("t2") && st.done === Nil)
    assert(!new java.io.File(Signals.collectionPath(root, "t2")).exists,
      "re-execute starts from a clean collection dir")
    assert(turn(root) === 2)
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t2")).count() === 20L)
    // while QUEUED, a duplicate execute is deduped, not a reset
    Signals.applySignals(spark, root, sig(
      ("c", "execute-snapshot", """{"data-collections":["t2"]}""", 3L)))
    assert(Signals.state(spark, root).queue === Seq("t2"))
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t2")).count() === 20L,
      "a dedup must not wipe the in-flight chunk state")
  }

  test("a blocking execute drains its collection in ONE turn; pause still beats blocking") {
    val root = tmp("graft-sig-blocking")
    // t1 is paced, t2 is blocking: the queue drains t1 at maxChunks pace,
    // then t2 all at once
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t1"]}""", 1L),
      ("b", "execute-snapshot",
        """{"data-collections":["t2"],"type":"blocking"}""", 2L)))
    assert(Signals.state(spark, root).blocking === Seq("t2"))
    assert(turn(root) === 2 && turn(root) === 2 && turn(root) === 0) // t1 paced
    assert(turn(root) === 2, "the blocking head ignores maxChunks and drains fully")
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t2")).count() === 20L)
    assert(turn(root) === 0)
    assert(Signals.state(spark, root) ===
      Signals.State(Nil, false, Seq("t1", "t2")))
    // pause beats blocking
    val root2 = tmp("graft-sig-blocking2")
    Signals.applySignals(spark, root2, sig(
      ("a", "execute-snapshot",
        """{"data-collections":["t2"],"type":"blocking"}""", 1L),
      ("b", "pause-snapshot", null, 2L)))
    assert(turn(root2) === 0, "pause gates a blocking head too")
    // an unsupported snapshot type refuses loudly
    val ex = intercept[IllegalArgumentException] {
      Signals.applySignals(spark, root2, sig(("c", "execute-snapshot",
        """{"data-collections":["t1"],"type":"read-only"}""", 3L)))
    }
    assert(ex.getMessage.contains("unsupported snapshot type"))
  }

  test("unknown signal types pass through; execute without collections refuses") {
    val root = tmp("graft-sig-unknown")
    Signals.applySignals(spark, root, sig(
      ("a", "log", """{"message":"hello"}""", 1L),
      ("b", "execute-snapshot", """{"data-collections":["t2"]}""", 2L),
      ("c", "custom-tool-type", null, 3L)))
    assert(Signals.state(spark, root).queue === Seq("t2"))
    val ex = intercept[IllegalArgumentException] {
      Signals.applySignals(spark, root, sig(("d", "execute-snapshot", null, 4L)))
    }
    assert(ex.getMessage.contains("data-collections"))
  }

  test("additional-conditions narrow the snapshot to matching rows only") {
    val root = tmp("graft-sig-cond")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot",
        """{"data-collections":["t1"],
          |"additional-conditions":[
          |  {"data-collection":"t1","filter":"k % 2 = 0"}]}"""
          .stripMargin.replace("\n", ""), 1L)))
    assert(Signals.state(spark, root).conditions === Map("t1" -> "k % 2 = 0"))
    // t1 has 40 rows, 20 match: 2 chunks of 10 land, then the pop turn
    assert(turn(root) === 2 && turn(root) === 0)
    val landed = IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t1"))
    assert(landed.count() === 20L, "only matching rows moved")
    assert(landed.where(col("k") % 2 =!= 0).count() === 0L)
    val st = Signals.state(spark, root)
    assert(st.done === Seq("t1") && st.conditions.isEmpty,
      "the condition retires with its collection")
    // a condition naming a collection outside data-collections refuses
    val ex = intercept[IllegalArgumentException] {
      Signals.applySignals(spark, root, sig(
        ("b", "execute-snapshot",
          """{"data-collections":["t2"],
            |"additional-conditions":[
            |  {"data-collection":"t1","filter":"k > 5"}]}"""
            .stripMargin.replace("\n", ""), 2L)))
    }
    assert(ex.getMessage.contains("outside data-collections"))
  }

  test("signals arrive as envelope rows of a captured signal table") {
    import graft.cdc.Envelope
    import org.apache.spark.sql.types._
    val root = tmp("graft-sig-env")
    val sigSchema = StructType(Seq(StructField("id", StringType),
      StructField("type", StringType), StructField("data", StringType)))
    def env(id: String, typ: String, data: String, op: String, lsn: Long) = {
      val d = if (data == null) "null" else
        s""""${data.replace("\"", "\\\"")}""""
      s"""{"before":null,"after":{"id":"$id","type":"$typ","data":$d},
         |"source":{"connector":"pg","db":"d","schema":"s","table":"signals",
         |"lsn":$lsn,"snapshot":false,"ts_ms":1},"op":"$op","ts_ms":1}"""
        .stripMargin.replace("\n", "")
    }
    val raw = Seq(
      env("a", "execute-snapshot", """{"data-collections":["t2"]}""", "c", 10L),
      env("b", "pause-snapshot", null, "c", 11L),
      // an UPDATE to the signal table is housekeeping, not a signal
      env("z", "resume-snapshot", null, "u", 12L)
    ).toDF("value")
    val sigs = Signals.fromEnvelope(Envelope.parse(raw, sigSchema))
    Signals.applySignals(spark, root, sigs)
    val st = Signals.state(spark, root)
    assert(st.queue === Seq("t2") && st.paused,
      "inserted signals apply; the update row is ignored")
  }

  test("signals apply in (lsn, id) order regardless of row order") {
    val root = tmp("graft-sig-order2")
    // resume arrives with a LATER lsn than pause: net state is running
    Signals.applySignals(spark, root, sig(
      ("z", "resume-snapshot", null, 5L),
      ("a", "pause-snapshot", null, 4L),
      ("m", "execute-snapshot", """{"data-collections":["t2"]}""", 3L)))
    val st = Signals.state(spark, root)
    assert(!st.paused && st.queue === Seq("t2"))
  }

  test("signals drain through the REAL streaming engine and gate turns between micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("graft-sig-stream")
    val ckpt = tmp("graft-sig-stream-ckpt")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, String, Long)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => Signals.applySignals(spark, root, b)
    def drain(): Unit = {
      val q = src.toDS().toDF("id", "type", "data", "lsn")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    src.addData(("a", "execute-snapshot", """{"data-collections":["t2"]}""", 1L))
    drain()
    assert(Signals.state(spark, root).queue === Seq("t2"))
    assert(turn(root, maxChunks = 1) === 1)
    src.addData(("b", "pause-snapshot", null, 2L)); drain()
    assert(turn(root) === 0, "the mid-stream pause gates the next turn")
    src.addData(("c", "resume-snapshot", null, 3L)); drain()
    assert(turn(root) === 1, "resume releases the remaining chunk")
    assert(IncrementalSnapshot.landedChunks(spark,
      Signals.collectionPath(root, "t2")).count() === 20L)
  }

  test("progress reads every touched collection with its phase and landed volume") {
    val root = tmp("graft-sig-progress")
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot",
        """{"data-collections":["t1","t2"],
          |"additional-conditions":[
          |  {"data-collection":"t2","filter":"k < 100"}]}"""
          .stripMargin.replace("\n", ""), 1L)))
    assert(turn(root) === 2) // 2 of t1's 4 chunks
    Signals.applySignals(spark, root, sig(
      ("b", "stop-snapshot", """{"data-collections":["t1"]}""", 2L),
      ("c", "pause-snapshot", null, 3L)))
    val p = Signals.progress(spark, root).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getString(5)))).toMap
    assert(p("t1") === (("stopped", 2L, 20L, false, null)),
      "stopped: cut off with its landed chunks still visible")
    assert(p("t2") === (("paused", 0L, 0L, false, "k < 100")),
      "the paused head reports its condition and zero progress")
    Signals.applySignals(spark, root, sig(("d", "resume-snapshot", null, 4L)))
    assert(turn(root) === 2 && turn(root) === 0)
    val p2 = Signals.progress(spark, root).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(p2 === Map("t1" -> "stopped", "t2" -> "done"))
  }

  test("law: random signal scripts match a driver-side model of the protocol (seeded)") {
    // model-based check: replay a random action script against BOTH the
    // real module and a 20-line in-memory model; after a final drain the
    // landed coverage per collection must agree exactly. Catches
    // queue/pause/stop/pop interactions no hand-written walk covers.
    val rnd = new scala.util.Random(20260816L)
    val tables = Map("t1" -> 40L, "t2" -> 20L) // rows; chunkSize 10
    for (trial <- 0 until 6) {
      val root = tmp(s"graft-sig-law$trial")
      // model state
      var q = Vector.empty[String]; var paused = false
      var landedRows = Map("t1" -> 0L, "t2" -> 0L) // rows landed so far
      var finished = Set.empty[String]
      def modelTurn(): Unit = if (!paused && q.nonEmpty) {
        val h = q.head
        val total = tables(h)
        val already = landedRows(h)
        val take = math.min(20L, total - already) // maxChunks=2 × size 10
        if (take <= 0L) { q = q.tail; finished += h }
        else landedRows += h -> (already + take)
      }
      val actions = Seq.fill(8)(rnd.nextInt(5))
      var sigId = 0
      def apply(t: String, data: String): Unit = {
        sigId += 1
        Signals.applySignals(spark, root, sig((f"s$sigId%03d", t, data, sigId.toLong)))
      }
      actions.foreach {
        case 0 =>
          val t = if (rnd.nextBoolean()) "t1" else "t2"
          apply("execute-snapshot", s"""{"data-collections":["$t"]}""")
          if (!q.contains(t)) {
            // the module wipes the collection dir for EVERY fresh
            // (non-queued) execute — finished or stopped-partial alike
            landedRows += t -> 0L; finished -= t
            q = q :+ t
          }
        case 1 => apply("pause-snapshot", null); paused = true
        case 2 => apply("resume-snapshot", null); paused = false
        case 3 =>
          val t = if (rnd.nextBoolean()) "t1" else "t2"
          apply("stop-snapshot", s"""{"data-collections":["$t"]}""")
          q = q.filterNot(_ == t)
        case 4 =>
          turn(root); modelTurn()
      }
      // final drain: resume and turn until idle, in lockstep
      apply("resume-snapshot", null); paused = false
      var guard = 0
      while (q.nonEmpty && guard < 20) { turn(root); modelTurn(); guard += 1 }
      assert(turn(root) === 0)
      for ((t, rows) <- landedRows) {
        val p = Signals.collectionPath(root, t)
        val real =
          if (new java.io.File(s"$p/chunks").exists)
            IncrementalSnapshot.landedChunks(spark, p).count()
          else 0L
        assert(real === rows, s"trial $trial: $t landed $real, model says $rows " +
          s"(script ${actions.mkString(",")})")
      }
    }
  }

  test("a truncated first-write state tmp degrades to the empty state, not a wedge") {
    val root = tmp("graft-sig-tmp")
    val dir = new java.io.File(root); dir.mkdirs()
    val w = new java.io.FileWriter(new java.io.File(dir, "_signals.tmp"))
    w.write("{\"queue\":[\"t1\""); w.close() // torn mid-write
    assert(Signals.state(spark, root) === Signals.Empty)
    // and the protocol recovers: the next applySignals rebuilds cleanly
    Signals.applySignals(spark, root, sig(
      ("a", "execute-snapshot", """{"data-collections":["t2"]}""", 1L)))
    assert(Signals.state(spark, root).queue === Seq("t2"))
  }
}

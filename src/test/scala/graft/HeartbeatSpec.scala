package graft

import graft.cdc.Signals
import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B20 — heartbeats + the consumer offset ledger: a heartbeat-only
  * batch advances the ledger with ZERO table IO, the ledger never moves
  * backwards, and it is the safe retention floor for a channel prune.
  */
class HeartbeatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def log(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "ver", "op", "v")

  // the heartbeat row: no key, no image, just a position
  private def hb(ver: Long) =
    Seq((null.asInstanceOf[java.lang.Long], ver, "h",
      null.asInstanceOf[String]))
      .toDF("k", "ver", "op", "v")

  private def tableFiles(target: String): Set[String] = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f.getPath)
    val root = new java.io.File(target)
    if (!root.exists()) Set.empty
    else walk(root).filter(_.contains("__kb=")).toSet
  }

  test("a heartbeat-only batch advances the ledger with zero table IO; the ledger is monotone") {
    val target = tmp("graft-hb") + "/state"
    def apply(b: org.apache.spark.sql.DataFrame) =
      Sinks.applyUpsertBatchWithHeartbeats(b, target, Seq("k"), "ver",
        nBuckets = 2)
    apply(log((0L until 10L).map(k => (k, 100L + k, "c", s"a$k")): _*))
    assert(Sinks.readOffsetLedger(spark, target) === Some(109L),
      "the data batch's max lsn is the initial floor")
    val before = tableFiles(target)
    assert(before.nonEmpty)
    // the QUIET window: only a heartbeat arrives
    apply(hb(500L))
    assert(Sinks.readOffsetLedger(spark, target) === Some(500L),
      "the heartbeat advances the floor past every data lsn")
    assert(tableFiles(target) === before,
      "a heartbeat-only batch must not touch a single table file")
    assert(Sinks.currentState(spark, target).count() === 10L)
    // monotone: a replayed older heartbeat can never LOWER the floor
    apply(hb(300L))
    assert(Sinks.readOffsetLedger(spark, target) === Some(500L),
      "replays never move the consumed floor backwards")
    // a mixed batch: data merges, the ledger takes the batch max
    apply(log((3L, 600L, "u", "a3x")).unionByName(hb(700L)))
    assert(Sinks.readOffsetLedger(spark, target) === Some(700L))
    assert(Sinks.currentState(spark, target).where($"k" === 3L)
      .select("v").head().getString(0) === "a3x")
  }

  test("the ledger is the safe retention floor for a channel prune (composition)") {
    val root = tmp("graft-hb-chan")
    val target = tmp("graft-hb-cons") + "/state"
    // three operator drops on the file channel: lsns 0, 1, 2
    assert(Signals.dropSignal(spark, root, "s0", "pause-snapshot", null) === 0L)
    assert(Signals.dropSignal(spark, root, "s1", "resume-snapshot", null) === 1L)
    assert(Signals.dropSignal(spark, root, "s2", "pause-snapshot", null) === 2L)
    // the consumer has durably applied through lsn 1 (its ledger — here
    // advanced by a heartbeat, the quiet-stream case the ledger exists
    // for): pruning AT the ledger can never drop unconsumed signals
    Sinks.applyUpsertBatchWithHeartbeats(
      Seq((0L, 0L, "c", "x"), (1L, 1L, "c", "y")).toDF("k", "ver", "op", "v")
        .unionByName(hb(1L)),
      target, Seq("k"), "ver", nBuckets = 2)
    val floor = Sinks.readOffsetLedger(spark, target).get
    assert(floor === 1L)
    assert(Signals.pruneChannel(spark, root, floor) === 2L,
      "signals at or below the consumed floor retire")
    val left = new java.io.File(s"$root/_signal_channel").list()
      .filter(_.endsWith(".json")).toSeq
    assert(left === Seq("0000000002.json"),
      "the unconsumed signal survives the prune")
  }
}

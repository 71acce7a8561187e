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
    assert(turn() === 0) // exhausted: completed
    val ev = Notifications.read(spark, root)
      .select("type", "collection", "chunks_landed", "rows_landed")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(ev.toSeq === Seq(
      ("started", "t1", 0L, 0L),
      ("chunk-landed", "t1", 2L, 20L),
      ("chunk-landed", "t1", 4L, 40L),
      ("completed", "t1", 4L, 40L)),
      "one started, cumulative heartbeats, one completed")
    // a re-execute RESETS the chunk loop: started fires again
    Signals.applySignals(spark, root, Seq(
      ("b", "execute-snapshot", """{"data-collections":["t1"]}""", 2L))
      .toDF("id", "type", "data", "lsn"))
    turn()
    val restarted = Notifications.read(spark, root)
      .where($"type" === "started").count()
    assert(restarted === 2L, "a reset re-execute is a NEW chunk loop")
  }
}

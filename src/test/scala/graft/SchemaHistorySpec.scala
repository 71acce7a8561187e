package graft

import graft.cdc.{IncrementalSnapshot, SchemaHistory}
import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B17 — the queryable schema-history log: event content for the three
  * action classes, the crash window under the tmp-rename protocol, and
  * the at-least-once delivery contract.
  */
class SchemaHistorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("upsert pin → widen → refuse sequence lands as ordered readable events") {
    val target = tmp("graft-shist") + "/t"
    val base = (0L until 30L).map(i => (i, s"n$i")).toDF("k", "name")
    Sinks.applyUpsertBatch(base.withColumn("ver", lit(1)),
      target, Seq("k"), "ver")
    Sinks.applyUpsertBatch(base.withColumn("bal", col("k") * 1.5d)
      .withColumn("ver", lit(2)), target, Seq("k"), "ver")
    intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatch(base.select(col("k"), lit(3).as("ver")),
        target, Seq("k"), "ver")
    }
    val ev = SchemaHistory.read(spark, target).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(ev.toSeq === Seq(
      (0L, "pin", null, "k bigint, name string, ver int", 30L),
      (1L, "widen", "k bigint, name string, ver int",
        "bal double, k bigint, name string, ver int", 30L),
      (2L, "refuse", "bal double, k bigint, name string, ver int",
        "k bigint, ver int", 30L)))
    // and the data survived the whole sequence, widened column readable
    val cur = spark.read.parquet(target)
    assert(cur.count() === 30L)
    assert(cur.where(col("bal").isNotNull).count() === 30L)
  }

  test("B15 chunk-schema pin and mid-snapshot DDL refusal are events") {
    val st = tmp("graft-shist-snap")
    val t1 = (0L until 20L).map(i => (i, s"a$i")).toDF("k", "v")
    IncrementalSnapshot.landChunkCk(spark, st,
      IncrementalSnapshot.nextChunkCk(t1, Seq("k"), None, 10), Seq("k"), 0L, 5L)
    intercept[IllegalArgumentException] {
      IncrementalSnapshot.landChunkCk(spark, st,
        IncrementalSnapshot.nextChunkCk(t1.withColumn("x", lit(1.0d)),
          Seq("k"), None, 10), Seq("k"), 1L, 6L)
    }
    val ev = SchemaHistory.read(spark, st).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getString(4)))
    assert(ev.toSeq === Seq(
      (0L, "pin", null, "k bigint, v string"),
      (1L, "refuse", "k bigint, v string", "k bigint, v string, x double")))
  }

  test("crash window: a torn tmp event is invisible and the sequence continues past it") {
    val root = tmp("graft-shist-crash")
    SchemaHistory.append(spark, root, "pin", None,
      Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType)))))
    // a crash mid-append leaves only a torn .tmp — the reader must not
    // see it, and the next append claims the next sequence number
    val torn = new java.io.File(s"$root/_schema_history/0000000001.json.tmp")
    val w = new java.io.FileWriter(torn); w.write("{\"seq\":1,\"act"); w.close()
    assert(SchemaHistory.read(spark, root).count() === 1L,
      "the torn tmp is invisible to readers")
    val seq = SchemaHistory.append(spark, root, "widen", None, None)
    assert(seq === 1L, "the next append reuses the never-completed slot")
    val ev = SchemaHistory.read(spark, root).select("seq", "action")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ev.toSeq === Seq((0L, "pin"), (1L, "widen")))
  }

  test("at-least-once: a replayed widen appends a dedupable duplicate, never loses the event") {
    // the widen event lands BEFORE the pin moves; a crash between the two
    // replays the batch and re-detects the widening. Emulate the replay
    // window: delete the pin sidecar after a widen (as if the crash hit
    // pre-pin) and re-apply the same batch.
    val target = tmp("graft-shist-alo") + "/t"
    val base = (0L until 10L).map(i => (i, s"n$i")).toDF("k", "name")
    Sinks.applyUpsertBatch(base.withColumn("ver", lit(1)),
      target, Seq("k"), "ver")
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinFile = new org.apache.hadoop.fs.Path(s"$target/_graft_schema")
    val preWidenPin = {
      val in = fs.open(pinFile)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }
    val widen = base.withColumn("bal", col("k") * 2.0d).withColumn("ver", lit(2))
    Sinks.applyUpsertBatch(widen, target, Seq("k"), "ver")
    // the crash hit after the history append, before the pin moved: the
    // pin still carries the pre-widen schema on replay
    val out = fs.create(pinFile, true)
    try out.write(preWidenPin) finally out.close()
    Sinks.applyUpsertBatch(widen, target, Seq("k"), "ver") // the replay
    val ev = SchemaHistory.read(spark, target)
      .select("action", "old_schema", "new_schema").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val widens = ev.filter(_._1 == "widen")
    assert(widens.length === 2 && widens.distinct.length === 1,
      "the replayed widening re-appends the SAME event — dedupable, not lost")
    assert(spark.read.parquet(target).count() === 10L,
      "the replay itself stays idempotent")
  }

  private def st(names: String*) = org.apache.spark.sql.types.StructType(
    names.map(n => org.apache.spark.sql.types.StructField(n,
      org.apache.spark.sql.types.LongType)))

  test("concurrent appenders never lose or overwrite a seq (r18: the claim race)") {
    val root = tmp("graft-shist-race")
    // 4 writers × 10 appends racing on one root: every append must land
    // under a UNIQUE seq with its own content intact — the pre-r18
    // exists-then-rename let two writers claim one number and clobber
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        for (i <- 0 until 10) {
          val action = s"widen-w$w-$i"
          val seq = SchemaHistory.append(spark, root, action, None, Some(st("a")))
          results.add((seq, action))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val mine = results.asScala.toSeq
    assert(mine.map(_._1).distinct.length === 40, "every append got a unique seq")
    val onDisk = SchemaHistory.read(spark, root).select("seq", "action")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(onDisk.length === 40, "no event was lost or overwritten")
    assert(onDisk.toSet === mine.toSet,
      "each landed event carries exactly its writer's content")
  }

  test("a rival's standing claim is skipped, never renamed over (r18)") {
    val root = tmp("graft-shist-claim")
    SchemaHistory.append(spark, root, "pin", None, Some(st("a")))
    // a rival process claimed seq 1 (and may still be writing its tmp):
    // our append must move to seq 2 and leave the claim alone
    val dir = new java.io.File(s"$root/_schema_history")
    new java.io.File(dir, "0000000001.claim").createNewFile()
    val seq = SchemaHistory.append(spark, root, "widen", Some(st("a")), Some(st("a", "b")))
    assert(seq === 2L, "the standing claim's number is skipped")
    assert(new java.io.File(dir, "0000000001.claim").exists(),
      "the rival's claim survives")
    // the rival later completes: its event is readable at the claimed seq
    val w = new java.io.FileWriter(new java.io.File(dir, "0000000001.json"))
    w.write("""{"seq":1,"ts_ms":5,"action":"widen","new_schema":"a bigint"}""")
    w.close()
    assert(SchemaHistory.read(spark, root).select("seq")
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
  }

  test("a stale writer epoch refuses the append (r18: optional fencing)") {
    val root = tmp("graft-shist-epoch")
    val e1 = graft.cdc.Signals.acquireWriter(spark, root)
    SchemaHistory.append(spark, root, "pin", None, Some(st("a")), epoch = Some(e1))
    graft.cdc.Signals.acquireWriter(spark, root) // successor takes over
    intercept[graft.cdc.Signals.StaleWriterException] {
      SchemaHistory.append(spark, root, "widen", Some(st("a")),
        Some(st("a", "b")), epoch = Some(e1))
    }
    assert(SchemaHistory.read(spark, root).count() === 1L,
      "the zombie's event never lands")
    // epoch-less appends (single-driver posture) stay valid
    SchemaHistory.append(spark, root, "widen", Some(st("a")), Some(st("a", "b")))
    assert(SchemaHistory.read(spark, root).count() === 2L)
  }

  test("compaction folds the prefix into one checkpoint; the readable record is unchanged in meaning") {
    val root = tmp("graft-shist-compact")
    SchemaHistory.append(spark, root, "pin", None, Some(st("a")), nRows = Some(10L), tsMs = 100L)
    SchemaHistory.append(spark, root, "widen", Some(st("a")), Some(st("a", "b")), nRows = Some(20L), tsMs = 200L)
    SchemaHistory.append(spark, root, "widen", Some(st("a", "b")), Some(st("a", "b", "c")), nRows = Some(30L), tsMs = 300L)
    val ck = SchemaHistory.compact(spark, root, uptoSeq = 1L)
    assert(ck === Some(1L))
    val ev1 = SchemaHistory.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(ev1.toSeq === Seq(
      // checkpoint: genesis old side, schema as of seq 1, folded rows
      (1L, 200L, "checkpoint", null, "a bigint, b bigint", 30L),
      (2L, 300L, "widen", "a bigint, b bigint", "a bigint, b bigint, c bigint", 30L)),
      "checkpoint + live tail; the net schema lineage is intact")
    // appends continue PAST the checkpoint — numbering never restarts
    val s3 = SchemaHistory.append(spark, root, "widen",
      Some(st("a", "b", "c")), Some(st("a", "b", "c", "d")), nRows = Some(5L), tsMs = 400L)
    assert(s3 === 3L)
    // a second compaction folds checkpoint + tail into one newer checkpoint
    assert(SchemaHistory.compact(spark, root, uptoSeq = 99L) === Some(3L))
    val ev2 = SchemaHistory.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(ev2.toSeq === Seq((3L, "checkpoint", "a bigint, b bigint, c bigint, d bigint", 65L)))
    // the folded per-event files are gone (retention actually shrank the log)
    val left = new java.io.File(s"$root/_schema_history").listFiles()
      .map(_.getName).filter(_.endsWith(".json")).sorted
    assert(left.toSeq === Seq("_checkpoint_0000000003.json"))
    // crash leftover: a folded event file that escaped deletion is hidden
    val w = new java.io.FileWriter(s"$root/_schema_history/0000000002.json")
    w.write("""{"seq":2,"ts_ms":300,"action":"widen","new_schema":"x bigint"}""")
    w.close()
    assert(SchemaHistory.read(spark, root).count() === 1L,
      "events at or below the checkpoint stay hidden — the checkpoint is the authority")
    // and nothing foldable → no-op
    val root2 = tmp("graft-shist-compact-empty")
    assert(SchemaHistory.compact(spark, root2, 10L) === None)
  }
}

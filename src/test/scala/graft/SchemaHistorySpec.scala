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
}

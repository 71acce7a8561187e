package graft

import graft.cdc.{IncrementalSnapshot, Materialize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B15 — DBLog incremental snapshot laws the contract hash can't carry:
  * the resumable cursor (kill mid-snapshot, resume, converge), chunk
  * re-landing idempotence (the crash window between rows and cursor),
  * and the merge precedence law (in-window change wins over the chunk
  * row; same-LSN change loses; convergence to the full materialization
  * when chunk reads are consistent as-of reads).
  */
class IncrementalSnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("cursor loop: chunks cover the key space once; kill-and-resume converges; replay idempotent") {
    val table = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "payload")
    // one-shot reference
    val oneShot = tmp("graft-isnap-one")
    val n1 = IncrementalSnapshot.snapshotChunks(spark, oneShot, table, "k",
      chunkSize = 7, loLsnOf = k => 1000L + k)
    assert(n1 === 15) // ceil(100/7)
    val all = IncrementalSnapshot.landedChunks(spark, oneShot)
    assert(all.count() === 100L)
    assert(all.select("k").as[Long].collect().toSet === (0L until 100L).toSet)
    // watermarks rode each chunk
    assert(all.where(col("k") < 7L).select("__lo_lsn").distinct()
      .as[Long].head() === 1000L)
    // exhausted: a second call lands nothing
    assert(IncrementalSnapshot.snapshotChunks(spark, oneShot, table, "k",
      chunkSize = 7, loLsnOf = k => 1000L + k) === 0)

    // kill-and-resume: 4 chunks, crash, resume the rest — same landed set
    val resumed = tmp("graft-isnap-res")
    assert(IncrementalSnapshot.snapshotChunks(spark, resumed, table, "k",
      chunkSize = 7, loLsnOf = k => 1000L + k, maxChunks = 4) === 4)
    assert(IncrementalSnapshot.cursor(spark, resumed) === Some((4L, 27L)))
    assert(IncrementalSnapshot.snapshotChunks(spark, resumed, table, "k",
      chunkSize = 7, loLsnOf = k => 1000L + k) === 11)
    val resumedAll = IncrementalSnapshot.landedChunks(spark, resumed)
      .select("k", "payload", "__lo_lsn").as[(Long, String, Long)].collect().toSet
    val oneShotAll = all
      .select("k", "payload", "__lo_lsn").as[(Long, String, Long)].collect().toSet
    assert(resumedAll === oneShotAll)

    // the crash window between rows and cursor: re-landing the cursor's
    // next chunk rewrites exactly itself (dynamic overwrite)
    val chunk4 = IncrementalSnapshot.nextChunk(table, "k", Some(27L), 7)
    IncrementalSnapshot.landChunk(spark, resumed, chunk4, "k", 4L, 1004L)
    val afterReplay = IncrementalSnapshot.landedChunks(spark, resumed)
      .select("k", "payload", "__lo_lsn").as[(Long, String, Long)].collect().toSet
    assert(afterReplay === oneShotAll, "chunk replay must be idempotent")
  }

  test("composite-key loop: lexicographic chunks, kill-and-resume, string keys round-trip") {
    // composite (string, long) keys; the string group 'a|b' carries the
    // separator that broke concat-style encodings — the JSON cursor and
    // native comparisons must be exact
    val table = (for { g <- Seq("a", "a|b", "b"); i <- 0L until 30L }
      yield (g, i, s"$g-$i")).toDF("g", "i", "payload")
    val oneShot = tmp("graft-isnapck-one")
    val n1 = IncrementalSnapshot.snapshotChunksCk(spark, oneShot, table,
      Seq("g", "i"), chunkSize = 7, loLsnOf = k => 100L + k)
    assert(n1 === 13) // ceil(90/7)
    val all = IncrementalSnapshot.landedChunks(spark, oneShot)
    assert(all.count() === 90L)
    // chunk 0 is the 7 lexicographically smallest keys: ('a', 0..6)
    val c0 = all.where(col("__lo_lsn") === 100L)
      .select("g", "i").as[(String, Long)].collect().toSet
    assert(c0 === (0L until 7L).map(("a", _)).toSet)
    // exhausted: nothing more to land
    assert(IncrementalSnapshot.snapshotChunksCk(spark, oneShot, table,
      Seq("g", "i"), chunkSize = 7, loLsnOf = k => 100L + k) === 0)

    // kill after 5 chunks: the cursor holds the serialized composite
    // key (35th key = ('a|b', 4)); resume converges to the same set
    val resumed = tmp("graft-isnapck-res")
    assert(IncrementalSnapshot.snapshotChunksCk(spark, resumed, table,
      Seq("g", "i"), chunkSize = 7, loLsnOf = k => 100L + k, maxChunks = 5) === 5)
    assert(IncrementalSnapshot.cursorCk(spark, resumed) === Some((5L, Seq("a|b", "4"))))
    assert(IncrementalSnapshot.snapshotChunksCk(spark, resumed, table,
      Seq("g", "i"), chunkSize = 7, loLsnOf = k => 100L + k) === 8)
    def rows(p: String) = IncrementalSnapshot.landedChunks(spark, p)
      .select("g", "i", "payload", "__lo_lsn")
      .as[(String, Long, String, Long)].collect().toSet
    assert(rows(resumed) === rows(oneShot))

    // the crash window: re-landing the cursor's chunk rewrites itself
    val chunk5 = IncrementalSnapshot.nextChunkCk(table, Seq("g", "i"),
      Some(Seq("a|b", "4")), 7)
    IncrementalSnapshot.landChunkCk(spark, resumed, chunk5, Seq("g", "i"), 5L, 105L)
    assert(rows(resumed) === rows(oneShot), "ck chunk replay must be idempotent")

    // a truncated first-write JSON tmp degrades to 'no cursor'
    val st = tmp("graft-isnapck-tmpcrash")
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(st, "_cursor.tmp"), true)
    try out.write("""{"next":3,"key":["a""".getBytes("UTF-8")) finally out.close()
    assert(IncrementalSnapshot.cursorCk(spark, st) === None)
  }

  test("a truncated first-write cursor tmp degrades to 'no cursor', not a wedged resume") {
    // crash DURING the very first cursor write: a partial tmp exists,
    // no main — resume must re-land chunk 0, never throw (r16 advice)
    val st = tmp("graft-isnap-tmpcrash")
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpFile = new org.apache.hadoop.fs.Path(st, "_cursor.tmp")
    val out = fs.create(tmpFile, true)
    try out.write("3,".getBytes("UTF-8")) finally out.close() // truncated mid-write
    assert(IncrementalSnapshot.cursor(spark, st) === None,
      "malformed tmp with no main must read as absent")
    val table = (0L until 20L).map(i => (i, s"v$i")).toDF("k", "payload")
    val n = IncrementalSnapshot.snapshotChunks(spark, st, table, "k",
      chunkSize = 7, loLsnOf = k => 1000L + k)
    assert(n === 3, "snapshot must restart cleanly from chunk 0")
    assert(IncrementalSnapshot.landedChunks(spark, st).count() === 20L)
    // an empty tmp (crash before any byte) degrades the same way
    val st2 = tmp("graft-isnap-tmpempty")
    val fs2 = new org.apache.hadoop.fs.Path(st2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs2.create(new org.apache.hadoop.fs.Path(st2, "_cursor.tmp"), true).close()
    assert(IncrementalSnapshot.cursor(spark, st2) === None)
    // a COMPLETE tmp (crash inside the delete-before-rename window)
    // still resumes exactly where it points
    val st3 = tmp("graft-isnap-tmpok")
    val fs3 = new org.apache.hadoop.fs.Path(st3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out3 = fs3.create(new org.apache.hadoop.fs.Path(st3, "_cursor.tmp"), true)
    try out3.write("2,13".getBytes("UTF-8")) finally out3.close()
    assert(IncrementalSnapshot.cursor(spark, st3) === Some((2L, 13L)))
  }

  test("the Long cursor path refuses non-integral keys (use the ck path)") {
    // a string key would land chunks fine and then corrupt every resume
    // through the "id,key".toLong parse — refuse up front
    val t = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      IncrementalSnapshot.nextChunk(t, "k", None, 1)
    }
    assert(ex.getMessage.contains("snapshotChunksCk"))
    // the composite path takes the same table happily
    val st = tmp("graft-isnap-strkey")
    assert(IncrementalSnapshot.snapshotChunksCk(spark, st, t, Seq("k"),
      chunkSize = 1, loLsnOf = _ => 1L) === 2)
  }

  test("a mid-snapshot schema change refuses loudly instead of mixing chunk schemas") {
    // chunks land over a LIVE table across a long window; a DDL between
    // chunks would otherwise mix schemas inside chunks/ where the merge's
    // plain parquet read resolves them by footer luck — restart-level
    val st = tmp("graft-isnap-ddl")
    val t1 = (0L until 10L).map(i => (i, s"v$i")).toDF("k", "payload")
    assert(IncrementalSnapshot.snapshotChunks(spark, st, t1, "k",
      chunkSize = 4, loLsnOf = _ => 100L, maxChunks = 1) === 1)
    // the source gained a column mid-snapshot
    val t2 = (0L until 10L).map(i => (i, s"v$i", i * 2.0))
      .toDF("k", "payload", "extra")
    val ex = intercept[IllegalArgumentException] {
      IncrementalSnapshot.snapshotChunks(spark, st, t2, "k",
        chunkSize = 4, loLsnOf = _ => 101L, maxChunks = 1)
    }
    assert(ex.getMessage.contains("restart-level"))
    // same column set in a different field ORDER is not a DDL — proceeds
    val t3 = t1.select(col("payload"), col("k"))
    assert(IncrementalSnapshot.snapshotChunks(spark, st, t3, "k",
      chunkSize = 4, loLsnOf = _ => 102L, maxChunks = 1) === 1)
    // and after clearing the state dir, the new schema re-snapshots fresh
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(st), true)
    assert(IncrementalSnapshot.snapshotChunks(spark, st, t2, "k",
      chunkSize = 4, loLsnOf = _ => 103L) === 3)
    assert(IncrementalSnapshot.landedChunks(spark, st).columns.contains("extra"))
  }

  test("merge precedence: in-window change wins, same-LSN change loses, deletes drop") {
    // chunk read of keys 1..4 at lo = 10
    val chunks = Seq(
      (1L, 100L, 1.0, 10L), // no later change -> chunk survives
      (2L, 101L, 2.0, 10L), // change at lsn 11 (in-window/after) -> stream wins
      (3L, 102L, 3.0, 10L), // change at lsn 10 (same LSN) -> chunk read saw it, chunk wins
      (4L, 103L, 4.0, 10L)  // delete at lsn 12 -> key dropped
    ).toDF("k", "last_id", "v", "__lo_lsn")
    val changes = Seq(
      (2L, 111L, 2.5, "u", 11L),
      (3L, 102L, 3.0, "u", 10L),
      (4L, 112L, 0.0, "d", 12L),
      (5L, 113L, 5.0, "c", 13L) // created after the snapshot started
    ).toDF("k", "last_id", "v", "op", "lsn")
    val got = IncrementalSnapshot.merge(chunks, changes, Seq("k"), "lsn")
      .select("k", "last_id", "v", "last_lsn", "src")
      .as[(Long, Long, Double, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 100L, 1.0, 10L, "chunk"),
      (2L, 111L, 2.5, 11L, "stream"),
      (3L, 102L, 3.0, 10L, "chunk"),
      (5L, 113L, 5.0, 13L, "stream")))
  }

  test("merge plans ONE keyed shuffle — no single-partition exchange, no BNLJ") {
    val chunks = Seq((1L, 100L, 1.0, 10L)).toDF("k", "last_id", "v", "__lo_lsn")
    val changes = Seq((2L, 111L, 2.5, "u", 11L)).toDF("k", "last_id", "v", "op", "lsn")
    val plan = IncrementalSnapshot.merge(chunks, changes, Seq("k"), "lsn")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"merge must never single-partition:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"merge must never nested-loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"merge should shuffle once on the key, found $shuffles:\n$plan")
  }

  test("live interleave: chunks landed between REAL micro-batches converge; pacing decides provenance") {
    implicit val sqlCtx = spark.sqlContext
    // changelog: keys 0..39 created at lsn=key, then updates/deletes in
    // the streamed tail — key 5 updated AFTER its chunk lands (stream
    // must win), key 15 updated BEFORE its chunk lands (the chunk read
    // carries it and wins), key 9 deleted mid-snapshot (dropped)
    val creates = (0L until 40L).map(k => (k, k, k.toDouble, "c"))
    val tail = Seq(
      (43L, 15L, 150.0, "u"), // lands in batch 0 (bound 44), chunked later
      (45L, 5L, 50.0, "u"),   // lands in batch 1, AFTER key 5's chunk (lo 44)
      (47L, 9L, 0.0, "d"),    // delete mid-snapshot
      (49L, 41L, 41.0, "c")   // created while snapshotting
    )
    val evs = (creates ++ tail).toDF("lsn", "k", "v", "op")
    def live(b: Long) = graft.cdc.Materialize.latestByKey(
        evs.where(col("lsn") <= b), Seq("k"), Seq(col("lsn")))
      .where(col("op") =!= "d").select(col("k"), col("v"))
    val st = tmp("graft-isnap-live-spec")
    val chDir = tmp("graft-isnap-live-spec-ch") + "/changes"
    val ckpt = tmp("graft-isnap-live-spec-ckpt")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double, String)]
    val sinkFn: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => b.write.mode("append").parquet(chDir)
    def drain(): Unit = {
      val q = src.toDS().toDF("lsn", "k", "v", "op").writeStream
        .foreachBatch(sinkFn)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // turn 0: batch {43} drains, chunk 0 (keys 0..9) lands at lo=44
    src.addData(tail.filter(_._1 <= 44L)); drain()
    assert(graft.cdc.IncrementalSnapshot.snapshotChunks(spark, st, live(44L),
      "k", chunkSize = 10, loLsnOf = _ => 44L, maxChunks = 1) === 1)
    // turn 1: batch {45, 47} drains, chunk 1 (keys 10..19) lands at lo=48
    src.addData(tail.filter(t => t._1 > 44L && t._1 <= 48L)); drain()
    assert(graft.cdc.IncrementalSnapshot.snapshotChunks(spark, st, live(48L),
      "k", chunkSize = 10, loLsnOf = _ => 48L, maxChunks = 1) === 1)
    // turn 2: batch {49} drains, then the snapshot drains to exhaustion
    src.addData(tail.filter(_._1 > 48L)); drain()
    graft.cdc.IncrementalSnapshot.snapshotChunks(spark, st, live(49L),
      "k", chunkSize = 10, loLsnOf = _ => 49L)
    val chRead = spark.read.parquet(chDir)
      .select(col("k"), col("v"), col("op"), col("lsn"))
    val got = graft.cdc.IncrementalSnapshot.state(spark, st, chRead,
      Seq("k"), "lsn")
    val byKey = got.select(col("k"), col("v"), col("src"))
      .as[(Long, Double, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // convergence: exactly the changelog materialization
    val want = graft.cdc.Materialize.changelog(
        evs.select(col("k"), col("lsn"), col("v"), col("op")),
        Seq("k"), Seq(col("lsn")), opCol = col("op"))
      .select(col("k"), col("v")).as[(Long, Double)].collect().toMap
    assert(byKey.view.mapValues(_._1).toMap === want,
      "live-interleaved snapshot must converge to the changelog state")
    // pacing-determined provenance: the in-window-arrival law per key
    assert(byKey(5L) === ((50.0, "stream")),
      "an update arriving after the key's chunk landed must win")
    assert(byKey(15L) === ((150.0, "chunk")),
      "an update the chunk read already saw rides the chunk row")
    assert(!byKey.contains(9L), "a mid-snapshot delete must drop the key")
    assert(byKey(41L)._1 === 41.0, "a mid-snapshot create must appear")
  }

  test("convergence law: consistent as-of chunk reads + stream == full materialization") {
    // synthetic changelog over 60 keys, lsn = event order; chunk reads
    // are true as-of reads at advancing watermarks
    val events = (0L until 600L).map { lsn =>
      val k = lsn % 60L
      val op = if (lsn % 97L == 5L) "d" else if (lsn < 60L) "c" else "u"
      (k, lsn, lsn.toDouble, op)
    }.toDF("k", "lsn", "v", "op")
    val mid = 300L
    val changes = events.where(col("lsn") >= mid)
    val start = Materialize.latestByKey(events.where(col("lsn") < mid),
      Seq("k"), Seq(col("lsn"))).where(col("op") =!= "d").select("k")
    val wu = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val asg = start
      .withColumn("__chunk", ((row_number().over(wu) - 1L) / lit(20L)).cast("long"))
      .withColumn("__lo_lsn", lit(mid - 1L) + col("__chunk") * lit(90L))
    val chunkRows = Materialize.latestByKey(
        events.join(asg, Seq("k")).where(col("lsn") <= col("__lo_lsn")),
        Seq("k"), Seq(col("lsn")))
      .where(col("op") =!= "d")
      .select(col("k"), col("lsn").as("last_lsn_src"), col("v"), col("__lo_lsn"))
    val got = IncrementalSnapshot.merge(chunkRows,
        changes.select(col("k"), col("lsn").as("last_lsn_src"), col("v"),
          col("op"), col("lsn")),
        Seq("k"), "lsn")
      .select(col("k"), col("v")).as[(Long, Double)].collect().toSet
    val want = Materialize.changelog(events, Seq("k"), Seq(col("lsn")),
        opCol = col("op"))
      .select(col("k"), col("v")).as[(Long, Double)].collect().toSet
    assert(got === want, "incremental snapshot must converge to the live state")
  }
}

package graft

import graft.cdc.{Envelope, Materialize}
import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B19 — TRUNCATE events (op='t'): the batch materialization law, the
  * dead-letter split for sinks that can't honor one, and the upsert
  * sink's truncate mechanics — persisted floor against stragglers,
  * fully-dead partition deletion, replay idempotence.
  */
class TruncateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  // (key, ver, op, payload) changelog helpers
  private def log(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "ver", "op", "v")

  test("law: changelogWithTruncates == plain changelog of the post-cutoff slice") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 8) {
      val n = 60
      val rows = (0 until n).map { i =>
        (rnd.nextInt(8).toLong, i.toLong,
          if (rnd.nextInt(5) == 0) "d" else "u", s"p$i")
      }
      val truncAt = rnd.nextInt(n).toLong
      val full = log(rows: _*)
        .unionByName(log((-1L, truncAt, "t", null)))
      val got = Materialize.changelogWithTruncates(full, Seq("k"),
          Seq(col("ver")), col("ver"))
        .select("k", "ver", "v").as[(Long, Long, String)]
        .collect().sorted.toSeq
      // the oracle: drop everything at or below the truncate, then the
      // ordinary materialization — earlier rows lose, later rows win
      val want = Materialize.changelog(
          log(rows.filter(_._2 > truncAt): _*), Seq("k"), Seq(col("ver")))
        .select("k", "ver", "v").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(got === want, s"trial $trial (cutoff $truncAt)")
    }
    // no truncate at all → exactly the plain changelog
    val plain = log((1L, 1L, "u", "a"), (1L, 2L, "u", "b"), (2L, 1L, "d", null))
    val got = Materialize.changelogWithTruncates(plain, Seq("k"),
        Seq(col("ver")), col("ver"))
      .select("k", "ver", "v").as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, 2L, "b")))
  }

  test("a row AT the truncate's own version goes to the truncate; multiple truncates use the last") {
    val full = log(
      (1L, 5L, "u", "early"), (2L, 10L, "u", "at-cutoff"),
      (-1L, 7L, "t", null), (-1L, 10L, "t", null),
      (3L, 11L, "u", "after"))
    val got = Materialize.changelogWithTruncates(full, Seq("k"),
        Seq(col("ver")), col("ver"))
      .select("k", "ver", "v").as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === Seq((3L, 11L, "after")),
      "ver<=10 dies (ties to the truncate), ver 11 survives")
  }

  test("splitTruncates routes op='t' to the dead letter; null-op tombstones stay mainline") {
    val df = Seq(
      (1L, "u"), (2L, "t"), (3L, "d"), (4L, null.asInstanceOf[String]))
      .toDF("k", "op")
    val (main, dead) = Envelope.splitTruncates(df)
    assert(main.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 4L),
      "the null-op Kafka tombstone is NOT a truncate — it stays mainline")
    assert(dead.select("k").as[Long].collect().toSeq === Seq(2L))
  }

  test("sink: the persisted floor blocks stragglers from LATER batches; dead partitions' dirs are deleted") {
    val target = tmp("graft-trunc-sink") + "/state"
    def batch(rows: (Long, Long, String, String)*) =
      Sinks.applyUpsertBatchWithTruncates(log(rows: _*), target,
        Seq("k"), "ver", nBuckets = 4)
    // batch 1: keys 0..7 at ver 100 — with 4 buckets several __kb dirs fill
    batch((0L until 8L).map(k => (k, 100L, "c", s"a$k")): _*)
    val dirs0 = new java.io.File(target).list().count(_.startsWith("__kb="))
    assert(dirs0 > 1, "the fixture must span multiple partitions")
    // batch 2: truncate at 200, re-insert ONLY key 3 at 300
    batch((-1L, 200L, "t", null), (3L, 300L, "c", "b3"))
    assert(Sinks.currentState(spark, target)
      .select("k", "ver", "v").as[(Long, Long, String)]
      .collect().toSeq === Seq((3L, 300L, "b3")))
    // every partition without a survivor is GONE from disk, not just empty
    val dirs1 = new java.io.File(target).list().filter(_.startsWith("__kb="))
    assert(dirs1.length === 1,
      s"only key 3's partition may remain, got ${dirs1.toSeq}")
    // batch 3: a straggler versioned BEFORE the truncate — the persisted
    // floor (not the long-gone in-batch cutoff) must drop it
    batch((5L, 150L, "u", "zombie"))
    assert(Sinks.currentState(spark, target)
      .select("k").as[Long].collect().toSeq === Seq(3L),
      "a pre-truncate straggler in a later batch must not resurrect")
    // post-truncate rows in later batches merge as usual
    batch((6L, 400L, "c", "c6"))
    assert(Sinks.currentState(spark, target)
      .select("k").as[Long].collect().sorted.toSeq === Seq(3L, 6L))
  }

  test("clustered sink: truncate clears the catalog table, drops dead partitions, keeps the bucket contract") {
    val t = "trunc_clustered_t1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
    def apply(rows: (Long, Long, String, String)*) =
      Sinks.applyUpsertBatchClusteredWithTruncates(log(rows: _*), t,
        Seq("k"), "ver", Seq("k"), nBuckets = 4, nKbParts = 8)
    try {
      apply((0L until 12L).map(k => (k, 100L, "c", s"a$k")): _*)
      val parts0 = spark.sql(s"SHOW PARTITIONS $t").count()
      assert(parts0 > 1, "the fixture must span partitions")
      // truncate at 200 + re-insert key 5 at 300
      apply((-1L, 200L, "t", null), (5L, 300L, "c", "b5"))
      assert(Sinks.currentStateClustered(spark, t)
        .select("k", "ver", "v").as[(Long, Long, String)]
        .collect().toSeq === Seq((5L, 300L, "b5")))
      // dead partitions are GONE from the catalog, not just empty
      assert(spark.sql(s"SHOW PARTITIONS $t").count() === 1L,
        "only the survivor's partition may remain in the catalog")
      // the persisted floor blocks a later pre-truncate straggler
      apply((7L, 150L, "u", "zombie"))
      assert(Sinks.currentStateClustered(spark, t)
        .select("k").as[Long].collect().toSeq === Seq(5L))
      // the bucket contract survives: a self-join on k over the kept
      // state plans no shuffle on the table side (catalog bucket spec is
      // metadata, untouched by the partition drops)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        apply((0L until 12L).map(k => (k, 400L + k, "c", s"c$k")): _*)
        val a = Sinks.currentStateClustered(spark, t).select("k", "v")
        val b = Sinks.currentStateClustered(spark, t)
          .select(col("k"), col("v").as("v2"))
        val j = a.join(b, Seq("k"))
        assert(!j.queryExecution.executedPlan.toString
            .contains("Exchange hashpartitioning"),
          "post-truncate, the bucketed self-join still plans zero shuffles")
        assert(j.count() === 12L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("sink: replaying the truncate batch is idempotent (foreachBatch at-least-once)") {
    val target = tmp("graft-trunc-replay") + "/state"
    def apply(rows: Seq[(Long, Long, String, String)]) =
      Sinks.applyUpsertBatchWithTruncates(log(rows: _*), target,
        Seq("k"), "ver", nBuckets = 2)
    apply((0L until 6L).map(k => (k, 100L, "c", s"a$k")))
    val truncBatch = Seq((-1L, 200L, "t", (null: String)), (1L, 300L, "c", "b1"))
    apply(truncBatch)
    val once = Sinks.currentState(spark, target)
      .select("k", "ver", "v").as[(Long, Long, String)].collect().sorted.toSeq
    apply(truncBatch) // the replay
    val twice = Sinks.currentState(spark, target)
      .select("k", "ver", "v").as[(Long, Long, String)].collect().sorted.toSeq
    assert(once === Seq((1L, 300L, "b1")) && twice === once)
  }

  test("null-op tombstones stay mainline through the truncate cutoff (batch and merge)") {
    // regression (r19 review): `opCol =!= 't'` evaluates NULL for a
    // Kafka-compaction tombstone's null op and silently dropped it
    // BEFORE the window — resurrecting the tombstoned key, even in a
    // truncate-free batch. A null-op winner must delete its key exactly
    // as in the truncate-free operators.
    val batch = log(
      (1L, 5L, "u", "a"), (1L, 8L, (null: String), (null: String)),
      (2L, 6L, "u", "b"),
      (-1L, 2L, "t", (null: String))) // truncate BELOW everything
    val got = Materialize.changelogWithTruncates(batch, Seq("k"),
        Seq(col("ver")), col("ver"))
      .select("k", "ver", "v").as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === Seq((2L, 6L, "b")),
      "key 1's tombstone (ver 8, null op) must win and delete it")
    // the DBLog merge: same law — a post-cutoff tombstone kills the key
    // a post-cutoff chunk row would otherwise keep
    import graft.cdc.IncrementalSnapshot
    val chunks = Seq((1L, "c1", 100L), (2L, "c2", 100L))
      .toDF("k", "v", "__lo_lsn")
    val changes = Seq(
      (1L, (null: String), 300L, (null: String)), // tombstone above cutoff
      (-1L, (null: String), 50L, "t"))
      .toDF("k", "v", "lsn", "op")
    val merged = IncrementalSnapshot.mergeWithTruncates(chunks, changes,
        Seq("k"), "lsn")
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    assert(merged === Seq((2L, "c2")),
      "key 1's tombstone must survive the cutoff filter and delete it")
  }

  test("clustered sink: a truncate-only FIRST batch still creates the table and pins the floor") {
    // the floor block re-checks tableExists AFTER the upsert ran, and
    // batch 0 defines the table even when the post-cutoff slice is
    // empty — so a truncate arriving before any data cannot be lost
    val t = "trunc_clustered_first"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
    def apply(rows: (Long, Long, String, String)*) =
      Sinks.applyUpsertBatchClusteredWithTruncates(log(rows: _*), t,
        Seq("k"), "ver", Seq("k"), nBuckets = 2, nKbParts = 4)
    try {
      apply((-1L, 200L, "t", (null: String)),
        (3L, 150L, "u", "pre")) // at/below the truncate: dies in-batch
      assert(spark.catalog.tableExists(t),
        "batch 0 must define the table even with an empty live slice")
      assert(Sinks.currentStateClustered(spark, t).count() === 0L)
      // the floor persisted: a straggler in the NEXT batch stays dead
      apply((5L, 150L, "u", "zombie"))
      assert(Sinks.currentStateClustered(spark, t).count() === 0L,
        "the first-batch truncate's floor must block later stragglers")
      // and post-truncate data lands normally
      apply((7L, 300L, "c", "ok"))
      assert(Sinks.currentStateClustered(spark, t)
        .select("k", "v").as[(Long, String)].collect().toSeq ===
        Seq((7L, "ok")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("truncate × incremental snapshot: stale chunks die; post-cutoff chunk, re-inserts and deletes compose") {
    import graft.cdc.IncrementalSnapshot
    val chunks = Seq(
      (1L, "c1", 100L), (2L, "c2", 100L), // pre-truncate chunk: discarded
      (3L, "c3", 200L),                   // watermark AT the truncate: discarded
      (4L, "c4", 300L), (5L, "c5", 300L)  // post-truncate chunk: survives
    ).toDF("k", "v", "__lo_lsn")
    val changes = Seq(
      (1L, "u-early", 150L, "u"),    // pre-truncate change: discarded
      (2L, "re", 250L, "c"),         // post-truncate re-insert of a cleared key
      (5L, null: String, 400L, "d"), // delete outranks the post-cutoff chunk row
      (-1L, null: String, 200L, "t") // the truncate
    ).toDF("k", "v", "lsn", "op")
    val got = IncrementalSnapshot.mergeWithTruncates(chunks, changes,
        Seq("k"), "lsn")
      .select("k", "v", "last_lsn", "src").as[(Long, String, Long, String)]
      .collect().sorted.toSeq
    assert(got === Seq((2L, "re", 250L, "stream"), (4L, "c4", 300L, "chunk")),
      "the plain merge would have resurrected k=1,2,3 from the stale chunks")
  }

  test("law: mergeWithTruncates == plain merge of the post-cutoff slices (and IS merge when no truncate)") {
    import graft.cdc.IncrementalSnapshot
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 0 until 6) {
      // one chunk row per key (real chunks are disjoint key ranges);
      // change lsns globally unique so both executions rank identically
      val chunks = (0 until 10).map { k =>
        (k.toLong, s"c$k", (rnd.nextInt(5) * 100 + 100).toLong)
      }.toDF("k", "v", "__lo_lsn")
      val changeRows = (0 until 40).map { i =>
        (rnd.nextInt(10).toLong, s"s$i", (1 + i * 15).toLong,
          if (rnd.nextInt(5) == 0) "d" else "u")
      }
      val truncAt = rnd.nextInt(600).toLong
      val changes = changeRows.toDF("k", "v", "lsn", "op").unionByName(
        Seq((-1L, null: String, truncAt, "t")).toDF("k", "v", "lsn", "op"))
      val got = IncrementalSnapshot.mergeWithTruncates(chunks, changes,
          Seq("k"), "lsn")
        .select("k", "v", "last_lsn", "src").as[(Long, String, Long, String)]
        .collect().sorted.toSeq
      val want = IncrementalSnapshot.merge(
          chunks.where(col("__lo_lsn") > truncAt),
          changeRows.filter(_._3 > truncAt).toDF("k", "v", "lsn", "op"),
          Seq("k"), "lsn")
        .select("k", "v", "last_lsn", "src").as[(Long, String, Long, String)]
        .collect().sorted.toSeq
      assert(got === want, s"trial $trial (cutoff $truncAt)")
    }
    // no truncate at all → exactly the plain merge (chunk wins its tie)
    val chunks = Seq((1L, "a", 100L)).toDF("k", "v", "__lo_lsn")
    val changes = Seq((1L, "b", 100L, "u")).toDF("k", "v", "lsn", "op")
    val got = IncrementalSnapshot.mergeWithTruncates(chunks, changes,
        Seq("k"), "lsn")
      .select("k", "v", "last_lsn", "src").as[(Long, String, Long, String)]
      .collect().toSeq
    assert(got === Seq((1L, "a", 100L, "chunk")))
  }
}

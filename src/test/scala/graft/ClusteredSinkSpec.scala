package graft

import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A8d — the clustered catalog upsert sink's contracts beyond the
  * GauntletSpec exchange-free proof: schema parity with the dir sink
  * (catalog-pinned widen / refuse, each a B17 event at the table's
  * location), replay idempotence, and compaction that shrinks files
  * without touching the bucket contract.
  */
class ClusteredSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshTable(): String = {
    n += 1
    val t = s"csink_t$n"
    // a previously failed run can leave the managed location behind
    // after its table is dropped — clear both
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
    t
  }

  private def batch1 = Seq((1L, 10L, "a", "u", 1L), (2L, 20L, "b", "u", 1L))
    .toDF("k", "sub", "payload", "op", "__v")

  test("widening absorbs via the catalog; pin and widen land as B17 events") {
    val t = freshTable()
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2)
    // batch 2 adds a column: the catalog widens in place, old rows read
    // the new column as null — no rewrite of batch 1's files
    val wide = Seq((3L, 30L, "c", "u", 2L, 1.5d))
      .toDF("k", "sub", "payload", "op", "__v", "extra")
    Sinks.applyUpsertBatchClustered(wide, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2)
    val cur = Sinks.currentStateClustered(spark, t)
    assert(cur.count() === 3L)
    assert(cur.where(col("extra").isNull).count() === 2L,
      "pre-widen rows read the new column as null")
    assert(cur.where(col("k") === 3L).select("extra").head().getDouble(0) === 1.5d)
    val ev = graft.cdc.SchemaHistory.read(spark, Sinks.tableLocation(spark, t))
      .select("action").collect().map(_.getString(0)).toSeq
    assert(ev === Seq("pin", "widen"),
      "the clustered sink records its schema decisions like the dir sink")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("narrowing and type changes refuse loudly, each a B17 refuse event") {
    val t = freshTable()
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2)
    val narrow = intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatchClustered(
        Seq((3L, 30L, "u", 2L)).toDF("k", "sub", "op", "__v"),
        t, Seq("k", "sub"), "__v", Seq("k"), nBuckets = 4, nKbParts = 2)
    }
    assert(narrow.getMessage.contains("NARROWING"))
    val retype = intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatchClustered(
        Seq((3L, 30L, 7L, "u", 2L)).toDF("k", "sub", "payload", "op", "__v"),
        t, Seq("k", "sub"), "__v", Seq("k"), nBuckets = 4, nKbParts = 2)
    }
    assert(retype.getMessage.contains("type changes"))
    assert(Sinks.currentStateClustered(spark, t).count() === 2L,
      "neither refusal moved the table")
    val ev = graft.cdc.SchemaHistory.read(spark, Sinks.tableLocation(spark, t))
      .select("action").collect().map(_.getString(0)).toSeq
    assert(ev === Seq("pin", "refuse", "refuse"))
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("layout pins refuse drift: a different nKbParts or keyCols is loud, never silent (r18 review)") {
    val t = freshTable()
    Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2)
    // a different __kb modulus would prune the wrong partitions and
    // resurrect stale rows — the table property pin refuses it
    val drift = intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
        Seq("k"), nBuckets = 4, nKbParts = 4)
    }
    assert(drift.getMessage.contains("nKbParts"))
    val keyDrift = intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatchClustered(batch1, t, Seq("k"), "__v",
        Seq("k"), nBuckets = 4, nKbParts = 2)
    }
    assert(keyDrift.getMessage.contains("keyCols"))
    // a table not created through this sink (no pin) is refused outright
    val t2 = freshTable()
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, sub BIGINT, payload STRING, " +
      "op STRING, __v BIGINT, __kb INT) USING parquet PARTITIONED BY (__kb) " +
      "CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS")
    val unpinned = intercept[IllegalArgumentException] {
      Sinks.applyUpsertBatchClustered(batch1, t2, Seq("k", "sub"), "__v",
        Seq("k"), nBuckets = 4, nKbParts = 2)
    }
    assert(unpinned.getMessage.contains("graft.nKbParts"))
    spark.sql(s"DROP TABLE IF EXISTS $t"); spark.sql(s"DROP TABLE IF EXISTS $t2")
  }

  test("re-applying a batch is idempotent (the foreachBatch at-least-once contract)") {
    val t = freshTable()
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2)
    val before = Sinks.currentStateClustered(spark, t)
      .orderBy("k").collect().toSeq
    Sinks.applyUpsertBatchClustered(batch1, t, Seq("k", "sub"), "__v",
      Seq("k"), nBuckets = 4, nKbParts = 2) // the replay
    val after = Sinks.currentStateClustered(spark, t)
      .orderBy("k").collect().toSeq
    assert(after === before, "a replayed batch must change nothing")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compaction shrinks files, keeps the answer, and the bucket contract survives") {
    val t = freshTable()
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // several batches over the same keys → file accrual per partition.
    // AQE's partition coalescing hides the accrual at this toy size (the
    // whole merge fits one task); disable it for the feed so the merge
    // shuffle spreads across tasks the way a real-sized merge does
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      for (v <- 1 to 4)
        Sinks.applyUpsertBatchClustered(
          (1L to 200L).map(i => (i % 40, i, s"p$v-$i", "u", v.toLong))
            .toDF("k", "sub", "payload", "op", "__v"),
          t, Seq("k", "sub"), "__v", Seq("k"), nBuckets = 4, nKbParts = 2)
    } finally spark.conf.set(coalesceKey, prevCoalesce)
    def files(): Int = {
      val loc = new java.net.URI(Sinks.tableLocation(spark, t)).getPath
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(loc)).count(_.getName.endsWith(".parquet"))
    }
    val beforeFiles = files()
    val beforeRows = Sinks.currentStateClustered(spark, t)
      .orderBy("k", "sub").collect().toSeq
    Sinks.compactClustered(spark, t)
    assert(files() < beforeFiles,
      s"compaction must shrink the file count (was $beforeFiles, now ${files()})")
    assert(Sinks.currentStateClustered(spark, t)
      .orderBy("k", "sub").collect().toSeq === beforeRows,
      "compaction must never change the answer")
    // the bucket spec is catalog metadata — the exchange-free join
    // contract holds after compaction
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val other = freshTable()
      spark.sql(s"DROP TABLE IF EXISTS $other")
      Sinks.applyUpsertBatchClustered(
        (0L until 40L).map(i => (i, s"dim$i", "u", 1L))
          .toDF("k", "name", "op", "__v"),
        other, Seq("k"), "__v", Seq("k"), nBuckets = 4, nKbParts = 2)
      val j = Sinks.currentStateClustered(spark, t).drop("__v", "op")
        .join(Sinks.currentStateClustered(spark, other).drop("__v", "op"),
          Seq("k"))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "the compacted table still joins exchange-free")
      assert(j.count() === 200L)
      spark.sql(s"DROP TABLE IF EXISTS $other")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}

package graft

import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical corpus tombstone compaction (round 14) — the laws the
  * `k21_corpus_compact` contract hash can't express: the read plan
  * loses its anti-join, the tombstone dir clears, post-compaction
  * appends land in the served generation, the fragmentation gate
  * triggers without tombstones, and a no-op turn really is a no-op.
  */
class CorpusCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def writeBatch(adm: String, ids: Range, batchId: Long): Unit =
    ids.map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(Ingest.corpusDataDir(spark, adm))

  test("compaction bakes tombstones: same admitted rows, no anti-join, _ret cleared") {
    val adm = tmp("graft-ccspec") + "/t"
    writeBatch(adm, 0 until 50, 0L)
    writeBatch(adm, 50 until 100, 1L)
    Ingest.retractEverywhere(spark,
      (0L until 100L by 7L).map(i => (i, s"doc $i text")).toDF("doc_id", "text"),
      retractionId = 0L, Ingest.RetractTargets(corpusDir = Some(adm)),
      "text", "doc_id")
    val before = Ingest.admitted(spark, adm).as[(Long, String)].collect().toSet
    // pre-compaction the tombstones are applied at read — via an anti-join
    val planBefore = Ingest.admitted(spark, adm)
      .queryExecution.optimizedPlan.toString
    assert(planBefore.toLowerCase.contains("leftanti"),
      "setup should read through the tombstone anti-join")
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "compact")
    val after = Ingest.admitted(spark, adm).as[(Long, String)].collect().toSet
    assert(after === before, "compaction moved served value")
    val planAfter = Ingest.admitted(spark, adm)
      .queryExecution.optimizedPlan.toString
    assert(!planAfter.toLowerCase.contains("leftanti"),
      s"post-compaction read still carries the anti-join:\n$planAfter")
    // tombstones baked → cleared; a clean follow-up turn is a no-op
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "none")
  }

  test("appends after compaction land in the served generation") {
    val adm = tmp("graft-ccspec2") + "/t"
    writeBatch(adm, 0 until 30, 0L)
    Ingest.retractEverywhere(spark,
      Seq((3L, "doc 3 text")).toDF("doc_id", "text"),
      retractionId = 0L, Ingest.RetractTargets(corpusDir = Some(adm)),
      "text", "doc_id")
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "compact")
    // the writer resolves the CURRENT generation — a post-compaction
    // batch must not be shadowed by the superseded root layout
    writeBatch(adm, 100 until 110, 1L)
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got === ((0L until 30L).toSet - 3L) ++ (100L until 110L).toSet)
  }

  test("mixGateBatch after compaction writes through the served generation (r15)") {
    // the r14 advice defect: the mix gate wrote to the raw admittedDir
    // root, so post-compaction admissions landed in the superseded
    // layout — invisible to admitted() and deleted by the next vacuum
    val adm = tmp("graft-ccspec6") + "/t"
    val st = tmp("graft-ccspec6-state")
    writeBatch(adm, 0 until 20, 0L)
    Ingest.retractEverywhere(spark,
      Seq((5L, "doc 5 text")).toDF("doc_id", "text"),
      retractionId = 0L, Ingest.RetractTargets(corpusDir = Some(adm)),
      "text", "doc_id")
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "compact")
    graft.llm.Mixing.mixGateBatch(spark, st,
      (100L until 110L).map(i => (i, s"doc $i text", "s"))
        .toDF("doc_id", "text", "source"),
      "text", "doc_id", "source", batchId = 1L,
      tokenBudget = 1000000L, sourceCap = 1000L, admittedDir = adm)
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got === ((0L until 20L).toSet - 5L) ++ (100L until 110L).toSet,
      "mix-gate admissions must land in the CURRENT corpus generation")
    // and they survive the vacuum that reclaims the superseded root
    Ingest.corpusVacuum(spark, adm)
    val got2 = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got2 === got, "vacuum deleted post-compaction mix-gate admissions")
  }

  test("a retired-lineage re-attach at batch 0 cannot clobber the folded corpus") {
    // corpus writers use the stream batch id DIRECTLY, and a fresh
    // checkpoint lineage restarts at 0 — the fold must therefore park
    // under an id no stream can produce (__batch = -1), or the new
    // lineage's dynamic overwrite of batch 0 silently destroys it
    val adm = tmp("graft-ccspec4") + "/t"
    writeBatch(adm, 0 until 40, 0L)
    Ingest.retractEverywhere(spark,
      Seq((7L, "doc 7 text")).toDF("doc_id", "text"),
      retractionId = 0L, Ingest.RetractTargets(corpusDir = Some(adm)),
      "text", "doc_id")
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "compact")
    // the new lineage's first batch lands at id 0
    writeBatch(adm, 200 until 205, 0L)
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got === ((0L until 40L).toSet - 7L) ++ (200L until 205L).toSet,
      "the folded corpus must survive a new lineage's batch-0 write")
  }

  test("fragmentation alone triggers the fold; root gen-0 partitions reclaimed one compaction late") {
    val adm = tmp("graft-ccspec3") + "/t"
    (0 until 10).foreach(b => writeBatch(adm, b * 10 until (b + 1) * 10, b.toLong))
    val fs = new org.apache.hadoop.fs.Path(adm)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rootBatchDirs: Int = fs.listStatus(new org.apache.hadoop.fs.Path(adm))
      .count(_.getPath.getName.startsWith("__batch="))
    assert(rootBatchDirs === 10)
    // no tombstones, 10 live batches > 4 → fold
    assert(Ingest.corpusCompact(spark, adm, "doc_id", maxLiveBatches = 4) === "compact")
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got === (0L until 100L).toSet)
    // gen 1 current: the root layout is the PREVIOUS generation — kept
    // (in-flight-reader grace), reclaimed only once gen 2 commits
    assert(rootBatchDirs === 10)
    (10 until 16).foreach(b => writeBatch(adm, b * 10 until (b + 1) * 10, b.toLong))
    assert(Ingest.corpusCompact(spark, adm, "doc_id", maxLiveBatches = 4) === "compact")
    assert(rootBatchDirs === 0, "gen-0 root partitions should be reclaimed at gen 2")
    val got2 = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got2 === (0L until 160L).toSet)
  }

  test("corpusVacuum reclaims superseded generations and the legacy root layout") {
    val adm = tmp("graft-ccspec5") + "/t"
    writeBatch(adm, 0 until 20, 0L)
    Ingest.retractEverywhere(spark,
      Seq((5L, "doc 5 text")).toDF("doc_id", "text"),
      retractionId = 0L, Ingest.RetractTargets(corpusDir = Some(adm)),
      "text", "doc_id")
    assert(Ingest.corpusCompact(spark, adm, "doc_id") === "compact")
    val fs = new org.apache.hadoop.fs.Path(adm)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // gen 1 current; gen 0 (root __batch dirs) kept by the grace period
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(adm))
      .exists(_.getPath.getName.startsWith("__batch=")))
    Ingest.corpusVacuum(spark, adm)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(adm))
      .exists(_.getPath.getName.startsWith("__batch=")),
      "vacuum should reclaim the legacy root partitions")
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    assert(got === (0L until 20L).toSet - 5L, "vacuum must not touch the served corpus")
  }
}

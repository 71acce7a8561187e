package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted BM25 index family (r10 verdict #1): the index path must
  * be SCORE-IDENTICAL to the one-shot corpus scan — build, O(batch)
  * append, compact, and the crash window each proven against
  * [[graft.llm.TextAnalysis.bm25]] as the in-suite oracle (the contract
  * queries additionally hash the same scores against DuckDB).
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Q = Seq("spark", "join", "vector")

  private def docs: DataFrame =
    core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (doc, n_hit_terms, bm25) rows as a comparable set. */
  private def scores(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc"), col("n_hit_terms"), col("bm25"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("indexed search is score-identical to the one-shot corpus scan") {
    val path = tmp("graft-bm25-spec")
    llm.Search.bm25IndexWrite(docs, "text", "doc_id", path, nBuckets = 8)
    val oneShot = scores(llm.TextAnalysis.bm25(docs, "text", "doc_id", Q))
    val indexed = scores(llm.Search.bm25Indexed(spark, path, Q))
    assert(indexed === oneShot, "index path must reproduce the scan's scores exactly")
    assert(oneShot.nonEmpty, "the fixture corpus must actually hit the query terms")
  }

  test("incremental appends score identically to a one-shot full build") {
    val path = tmp("graft-bm25-spec-inc")
    val split = docs.agg((max(col("doc_id")) * lit(0.7)).cast("long")).head().getLong(0)
    llm.Search.bm25IndexWrite(docs.where(col("doc_id") < split),
      "text", "doc_id", path, nBuckets = 8)
    llm.Search.bm25AppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "doc_id", batchId = 1L)
    val full = scores(llm.TextAnalysis.bm25(docs, "text", "doc_id", Q))
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === full,
      "append must be score-identical to a rebuild: df/N/avgdl derive across batches")
    // replayed append (the streaming at-least-once case): dynamic
    // overwrite rewrites exactly itself — scores unchanged
    llm.Search.bm25AppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "doc_id", batchId = 1L)
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === full,
      "a replayed batch id must be idempotent")
  }

  test("bm25Retract == rebuild on survivors; crash window refuses; compact bakes") {
    val path = tmp("graft-bm25-spec-ret")
    llm.Search.bm25IndexWrite(docs, "text", "doc_id", path, nBuckets = 8)
    val removedDocs = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    val survivorScores = scores(llm.TextAnalysis.bm25(survivors, "text", "doc_id", Q))
    llm.Search.bm25Retract(spark, path, removedDocs, "text", "doc_id", 0L)
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === survivorScores,
      "tombstone + negated-stats correction must equal a survivor rebuild exactly")
    // replayed retraction rewrites exactly itself
    llm.Search.bm25Retract(spark, path, removedDocs, "text", "doc_id", 0L)
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === survivorScores)
    // crash window: tombstones landed but the stats delta did not —
    // simulate by deleting the delta partition; reads must refuse
    val fs = fsOf(path)
    assert(fs.delete(new Path(s"$path/stats/__batch=-1"), true))
    val ex = intercept[IllegalArgumentException] {
      llm.Search.bm25Indexed(spark, path, Q)
    }
    assert(ex.getMessage.contains("retraction"))
    // the documented heal: replay the retraction
    llm.Search.bm25Retract(spark, path, removedDocs, "text", "doc_id", 0L)
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === survivorScores)
    // compaction bakes tombstones + deltas and clears the tombstone set
    llm.Search.bm25Compact(spark, path)
    assert(!fs.exists(new Path(s"$path/removed")),
      "compaction must clear the applied tombstones")
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === survivorScores,
      "the compacted index IS the survivor index")
    import spark.implicits._
    val rawDocs = spark.read.parquet(llm.Search.postingsDir(spark, path))
      .select(col("doc")).distinct().as[Long].collect().toSet
    assert(rawDocs.forall(_ % 7 != 3),
      "retracted docs must be physically gone from the folded postings")
  }

  test("re-ingest of a retracted id is safe ONLY after compaction (delete-side id rule)") {
    val removedDocs = docs.where(col("doc_id") % 7 === 3)
    val fullScores = scores(llm.TextAnalysis.bm25(docs, "text", "doc_id", Q))
    val survivorScores = scores(llm.TextAnalysis.bm25(
      docs.where(col("doc_id") % 7 =!= 3), "text", "doc_id", Q))
    // HAZARD pinned: re-adding a tombstoned id BEFORE the compaction —
    // the id-keyed tombstone filters the fresh postings at read while
    // the appended stats row counts the doc, so the index serves scores
    // that match NEITHER a full corpus NOR the survivors. This is the
    // drift the scaladoc precondition forbids.
    val hazard = tmp("graft-bm25-reingest-hazard")
    llm.Search.bm25IndexWrite(docs, "text", "doc_id", hazard, nBuckets = 8)
    llm.Search.bm25Retract(spark, hazard, removedDocs, "text", "doc_id", 0L)
    llm.Search.bm25AppendBatch(spark, hazard, removedDocs, "text", "doc_id",
      batchId = 1L)
    val drifted = scores(llm.Search.bm25Indexed(spark, hazard, Q))
    assert(drifted !== fullScores,
      "pre-compaction re-ingest must NOT read as a clean re-add")
    assert(drifted !== survivorScores,
      "…and the appended stats already skew the survivor scores")
    // SAFE path: the compaction absorbs the tombstone first; the same
    // id then re-ingests as a fresh doc and the index equals a corpus
    // the doc never left
    val safe = tmp("graft-bm25-reingest-safe")
    llm.Search.bm25IndexWrite(docs, "text", "doc_id", safe, nBuckets = 8)
    llm.Search.bm25Retract(spark, safe, removedDocs, "text", "doc_id", 0L)
    llm.Search.bm25Compact(spark, safe)
    llm.Search.bm25AppendBatch(spark, safe, removedDocs, "text", "doc_id",
      batchId = 1L)
    assert(scores(llm.Search.bm25Indexed(spark, safe, Q)) === fullScores,
      "post-compaction re-ingest must be score-identical to the full corpus")
  }

  test("crash window between postings and stats writes: reads refuse, replay heals") {
    val path = tmp("graft-bm25-spec-crash")
    val split = docs.agg((max(col("doc_id")) * lit(0.7)).cast("long")).head().getLong(0)
    llm.Search.bm25IndexWrite(docs.where(col("doc_id") < split),
      "text", "doc_id", path, nBuckets = 8)
    llm.Search.bm25AppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "doc_id", batchId = 1L)
    // simulate the crash: postings for batch 1 landed, stats row did not
    val fs = fsOf(path)
    assert(fs.delete(new Path(s"$path/stats/__batch=1"), true))
    val e = intercept[IllegalArgumentException] {
      llm.Search.bm25Indexed(spark, path, Q)
    }
    assert(e.getMessage.contains("crashed between"),
      s"refusal must name the crash window, got: ${e.getMessage}")
    // the checkpointed replay re-runs the SAME append → healed
    llm.Search.bm25AppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "doc_id", batchId = 1L)
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) ===
      scores(llm.TextAnalysis.bm25(docs, "text", "doc_id", Q)))
  }

  test("compact folds batches into one generation; scores and stats invariant") {
    val path = tmp("graft-bm25-spec-compact")
    val split = docs.agg((max(col("doc_id")) * lit(0.7)).cast("long")).head().getLong(0)
    llm.Search.bm25IndexWrite(docs.where(col("doc_id") < split),
      "text", "doc_id", path, nBuckets = 8)
    llm.Search.bm25AppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "doc_id", batchId = 1L)
    val before = scores(llm.Search.bm25Indexed(spark, path, Q))
    llm.Search.bm25Compact(spark, path)
    assert(llm.Search.postingsDir(spark, path).endsWith("postings_gen=1"),
      "compaction must commit a new postings generation")
    assert(llm.Search.liveBatches(spark, path) === Seq(0L),
      "compaction collapses every append fragment into __batch=0")
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === before,
      "compaction must not move a single score")
    // the superseded generation survives as the in-flight-reader grace
    // period; vacuum reclaims it
    assert(fsOf(path).exists(new Path(s"$path/postings")))
    llm.Search.bm25Vacuum(spark, path)
    assert(!fsOf(path).exists(new Path(s"$path/postings")),
      "vacuum reclaims superseded postings generations")
    assert(scores(llm.Search.bm25Indexed(spark, path, Q)) === before)
  }

  test("append refuses a pre-batch-layout postings directory") {
    val path = tmp("graft-bm25-spec-flat")
    import spark.implicits._
    // hand-write the legacy flat layout: tb partitions with files directly
    // under them (no __batch level), plus the meta the append reads first
    docs.limit(10)
      .select(lower(col("text")).as("term"), col("doc_id").as("doc"),
        lit(1L).as("tf"), lit(1L).as("dl"), lit(0).as("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    Seq(8).toDF("n_buckets").coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val e = intercept[IllegalArgumentException] {
      llm.Search.bm25AppendBatch(spark, path, docs.limit(5), "text", "doc_id",
        batchId = 1L)
    }
    assert(e.getMessage.contains("not the batch-partitioned layout"))
  }
}

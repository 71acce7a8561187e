package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The K17 persisted novelty index ([[graft.llm.TextAnalysis]]): the
  * incremental path must be row-identical to the full-corpus recompute
  * (monotone-id batches cannot steal first-ness), appends replay
  * idempotently, and gram-set compaction moves no score (the contract
  * queries additionally hash the same scores against DuckDB).
  */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs: DataFrame =
    core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select(col("doc_id"), col("n_grams"), col("n_novel"), col("novelty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("incremental scores equal the full recompute; replay idempotent; compact invariant") {
    val path = tmp("graft-nov-spec")
    val full = rows(graft.llm.TextAnalysis.noveltyScores(docs, "text", "doc_id"))
    graft.llm.TextAnalysis.noveltyIndexWrite(docs.where(col("doc_id") < 300L),
      "text", "doc_id", path)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      docs.where(col("doc_id") >= 300L && col("doc_id") < 400L),
      "text", "doc_id", batchId = 1L)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      docs.where(col("doc_id") >= 400L), "text", "doc_id", batchId = 2L)
    val indexed = rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path))
    assert(indexed === full,
      "batch folds must reproduce the full-corpus first-occurrence fractions exactly")
    // at-least-once replay: the dynamic overwrite rewrites exactly itself,
    // and the replayed batch's grams are ALREADY in the index — scores for
    // the replayed docs must not change (their grams' first ids are
    // in-batch minima, reproduced identically)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      docs.where(col("doc_id") >= 400L), "text", "doc_id", batchId = 2L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === full)
    // gram-set compaction is score-invariant and further appends stay exact
    graft.llm.TextAnalysis.noveltyCompact(spark, path)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === full)
    // compaction folds provenance away, so a replay of an already-folded
    // batch would see its own grams as 'seen' and zero its scores — the
    // persisted watermark REJECTS it (the retired-lineage rule, enforced)
    assert(graft.llm.TextAnalysis.noveltyCompactWatermark(spark, path) === 2L)
    val ex = intercept[IllegalArgumentException] {
      graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
        docs.where(col("doc_id") >= 400L), "text", "doc_id", batchId = 2L)
    }
    assert(ex.getMessage.contains("watermark"))
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === full,
      "the rejected replay must not have touched the scores")
    // a genuinely NEW batch above the watermark still appends exactly
    val extra = docs.limit(0) // empty new batch exercises the path cheaply
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path, extra,
      "text", "doc_id", batchId = 3L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === full)
  }
}

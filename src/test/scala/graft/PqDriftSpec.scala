package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ codebook-staleness metric (round 11) — the bounding spec for
  * the rows-only `k4_pq_drift` contract entry: an in-distribution append
  * must NOT flag against the batch-0 baseline, a shifted append MUST,
  * a pre-drift code table refuses loudly, and a full re-encode
  * re-anchors the baseline over every live batch.
  */
class PqDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb: DataFrame =
    core.Engine.table(spark, TestSpark.sf, "embeddings")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("in-distribution append stays unflagged; a shifted batch flags") {
    val path = tmp("graft-pqdrift-spec")
    val e = emb
    val s80 = e.agg((max(col("vec_id")) * lit(0.8)).cast("long")).head().getLong(0)
    val s90 = e.agg((max(col("vec_id")) * lit(0.9)).cast("long")).head().getLong(0)
    llm.Similarity.ivfWriteIndex(
      e.where(col("vec_id") < s80)
        .select(col("vec_id").as("id"), col("embedding").as("v")),
      "v", "id", nCells = 4, lloydRounds = 1, path = path)
    llm.Quantization.ivfPqWriteCodes(spark, path, m = 8, k = 16)
    // batch 1: same synthetic distribution as the base
    llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("vec_id") >= s80 && col("vec_id") < s90)
        .select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", batchId = 1L)
    llm.Quantization.ivfPqAppendCodes(spark, path, batchId = 1L)
    // batch 2: every component shifted far outside the codebooks
    llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("vec_id") >= s90)
        .select(col("vec_id"),
          transform(col("embedding"), x => x + lit(4.0f)).as("embedding")),
      "embedding", "vec_id", batchId = 2L)
    llm.Quantization.ivfPqAppendCodes(spark, path, batchId = 2L)
    val d = llm.Quantization.pqDriftStats(spark, path, flagRatio = 2.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(d(0L) === false, "the baseline batch cannot drift against itself")
    assert(d(1L) === false,
      "an in-distribution batch must stay under a 2x error ratio")
    assert(d(2L) === true,
      "a +4.0-shifted batch must flag: the frozen codebooks cannot cover it")
    // full re-encode retrains on everything live and re-anchors: the
    // sidecar then covers every batch under the NEW codebooks
    llm.Quantization.ivfPqWriteCodes(spark, path, m = 8, k = 16)
    val re = llm.Quantization.pqDriftStats(spark, path, flagRatio = 2.0)
    assert(re.select(col("__batch")).collect().map(_.getLong(0)).sorted
      === Array(0L, 1L, 2L))
  }

  test("pqMaintain: retrains past the flag, no-ops inside it, state-idempotent") {
    val path = tmp("graft-pqmaint-spec")
    val e = emb
    val s80 = e.agg((max(col("vec_id")) * lit(0.8)).cast("long")).head().getLong(0)
    val s90 = e.agg((max(col("vec_id")) * lit(0.9)).cast("long")).head().getLong(0)
    llm.Similarity.ivfWriteIndex(
      e.where(col("vec_id") < s80)
        .select(col("vec_id").as("id"), col("embedding").as("v")),
      "v", "id", nCells = 4, lloydRounds = 1, path = path)
    llm.Quantization.ivfPqWriteCodes(spark, path, m = 8, k = 16)
    // in-distribution append: the signal stays quiet, maintain no-ops
    llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("vec_id") >= s80 && col("vec_id") < s90)
        .select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", batchId = 1L)
    llm.Quantization.ivfPqAppendCodes(spark, path, batchId = 1L)
    assert(llm.Quantization.pqMaintain(spark, path) === "none",
      "an unflagged sidecar must not trigger a retrain")
    // shifted append: flagged → maintain retrains + re-encodes
    llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("vec_id") >= s90)
        .select(col("vec_id"),
          transform(col("embedding"), x => x + lit(4.0f)).as("embedding")),
      "embedding", "vec_id", batchId = 2L)
    llm.Quantization.ivfPqAppendCodes(spark, path, batchId = 2L)
    assert(llm.Quantization.pqMaintain(spark, path) === "retrain")
    // the retrain re-anchored the baseline over every live batch and
    // the composed read serves with no stale refusal
    val stats = llm.Quantization.pqDriftStats(spark, path)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(stats.map(_._1) === Set(0L, 1L, 2L))
    val queries = e.where(col("vec_id") < 5L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    assert(llm.Quantization.ivfPqKnn(spark, path, queries, "qv", "qid",
      kNN = 3, nProbe = 4, shortlist = 30).count() > 0)
    // state idempotence: whatever a second turn decides, deterministic
    // training makes the resulting sidecar identical
    llm.Quantization.pqMaintain(spark, path)
    val stats2 = llm.Quantization.pqDriftStats(spark, path)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(stats2 === stats, "a replayed maintenance turn must be state-idempotent")
  }

  test("a pre-drift code table refuses loudly") {
    val path = tmp("graft-pqdrift-refuse")
    intercept[IllegalArgumentException] {
      llm.Quantization.pqDriftStats(spark, path)
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed delete turn ([[graft.streaming.Ingest.retractEverywhere]]):
  * one removal batch must reach EVERY registered family — the contract
  * query `k21_retract_pipeline` hash-checks the oracle-able families;
  * this spec covers the float-class IVF/PQ leg (excluded from the hash
  * union by the declared k4 exclusion), the misconfiguration guards,
  * and replay idempotence of the whole turn.
  */
class RetractPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("the composed turn reaches LSH, IVF, and the assignment; replay is a no-op") {
    import spark.implicits._
    val docs = core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val emb = core.Engine.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val lsh = tmp("graft-rp-lsh")
    val ivf = tmp("graft-rp-ivf")
    val gph = tmp("graft-rp-gph")
    llm.Dedup.minhashIndexWrite(docs, "text", "doc_id", lsh,
      shingleN = 3, k = 8, bands = 4)
    llm.Similarity.ivfWriteIndex(emb, "v", "id", nCells = 8, lloydRounds = 1,
      path = ivf)
    ops.Graph.foldBatch(spark,
      gph, llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 2, threshold = 0.1).select(col("id_a").cast("long"),
        col("id_b").cast("long")), "id_a", "id_b", batchId = 0L)
    val removed = docs.where(col("doc_id") % 5 === 2)
    val removedIds = removed.select(col("doc_id")).as[Long].collect().toSet
    val targets = streaming.Ingest.RetractTargets(
      lshIndexPath = Some(lsh), ivfIndexPath = Some(ivf), graphPath = Some(gph))
    streaming.Ingest.retractEverywhere(spark, removed, retractionId = 1L,
      targets, "text", "doc_id")
    // LSH: tombstones landed
    assert(ops.Tombstones.retIds(spark, lsh) === Seq(1L))
    // IVF: the full-probe read never surfaces a removed vector
    val queries = emb.where(col("id") < 10L)
      .select(col("id").as("qid"), col("v").as("qv"))
    val neigh = llm.Similarity.ivfKnnPruned(spark, ivf, queries, "qv", "qid",
        k = 5, nProbe = 8)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(neigh.nonEmpty && neigh.intersect(removedIds).isEmpty,
      "IVF reads must exclude the composed turn's tombstones")
    // assignment: removed docs' rows are gone
    val asg = ops.Graph.assignment(spark, gph)
      .select(col("id")).as[Long].collect().toSet
    assert(asg.intersect(removedIds).isEmpty)
    val asgBefore = ops.Graph.assignment(spark, gph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at-least-once replay of the SAME turn rewrites identical state
    streaming.Ingest.retractEverywhere(spark, removed, retractionId = 1L,
      targets, "text", "doc_id")
    assert(ops.Tombstones.retIds(spark, lsh) === Seq(1L))
    assert(ops.Graph.assignment(spark, gph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === asgBefore)
  }

  test("misconfiguration refuses loudly") {
    import spark.implicits._
    val removed = Seq((1L, "en", "some text")).toDF("doc_id", "lang", "text")
    val none = intercept[IllegalArgumentException] {
      streaming.Ingest.retractEverywhere(spark, removed, 1L,
        streaming.Ingest.RetractTargets(), "text", "doc_id")
    }
    assert(none.getMessage.contains("no targets"))
    val noLabel = intercept[IllegalArgumentException] {
      streaming.Ingest.retractEverywhere(spark, removed, 1L,
        streaming.Ingest.RetractTargets(nbModelPath = Some("/nonexistent")),
        "text", "doc_id")
    }
    assert(noLabel.getMessage.contains("labelCol"))
  }
}

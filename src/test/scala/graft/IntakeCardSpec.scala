package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The K19 card folded INSIDE the intake turn (round 13): curateBatch's
  * optional stage 5 accumulates per-batch card sidecars (lang = the
  * gate's predicted label — lang-id at intake), and the assembled card
  * must equal a one-shot [[graft.llm.TextAnalysis.datasetCard]] over
  * the admitted corpus. The standalone accumulate path is additionally
  * hash-pinned by `k19_card_incremental`.
  */
class IntakeCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("intake-folded card == one-shot card over the admitted corpus; replay invariant") {
    val docs = core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val model = tmp("graft-card-model")
    val idx = tmp("graft-card-idx")
    val adm = tmp("graft-card-adm") + "/t"
    val nov = tmp("graft-card-nov")
    val card = tmp("graft-card-card")
    llm.Classifier.nbWrite(docs.where(col("doc_id") < 400L), "text", "lang", model)
    def turn(lo: Long, hi: Long, id: Long): Unit =
      streaming.Ingest.curateBatch(
        docs.where(col("doc_id") >= lo && col("doc_id") < hi)
          .select(col("doc_id"), col("text"), col("source")),
        id, model, Seq("en"), idx, adm, nov, "text", "doc_id",
        shingleN = 3, k = 8, bands = 4, threshold = 0.8,
        maxBucketSize = Int.MaxValue, sourceCol = "source", cardPath = card)
    turn(400L, 450L, 0L)
    turn(450L, 500L, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7))).toSet
    val oneShot = rows(llm.TextAnalysis.datasetCard(
      streaming.Ingest.admitted(spark, adm), "text", "source", "predicted",
      "doc_id"))
    val folded = rows(llm.TextAnalysis.cardIndexed(spark, card))
    assert(folded === oneShot,
      "the sidecar-assembled card must equal the one-shot recompute exactly")
    // at-least-once replay of the last turn rewrites its deltas exactly
    turn(450L, 500L, 1L)
    assert(rows(llm.TextAnalysis.cardIndexed(spark, card)) === oneShot)
  }
}

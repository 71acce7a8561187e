package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed maintenance turn
  * ([[graft.streaming.Ingest.maintainEverywhere]]): one scheduled pass
  * must reach every registered family's threshold-gated entry point,
  * move NO served value (the contract query `k21_maintain_turn`
  * hash-checks that across the oracle-able families), and be
  * state-idempotent — the second run's gates all report "none". This
  * spec covers the float-class IVF/PQ leg (excluded from the hash
  * union), the pending-tombstone gates added in round 13, and the
  * misconfiguration guard.
  */
class MaintainTurnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("the turn compacts every pending family once, then reports all-none") {
    import spark.implicits._
    val docs = core.Engine.table(spark, TestSpark.sf, "documents")
      .where(col("doc_id") < 300L).select(col("doc_id"), col("lang"), col("text"))
    val lsh = tmp("graft-mt-lsh"); val bm = tmp("graft-mt-bm25")
    val lm = tmp("graft-mt-lm"); val nb = tmp("graft-mt-nb")
    val gph = tmp("graft-mt-gph"); val nov = tmp("graft-mt-nov")
    val base = docs.where(col("doc_id") < 200L)
    val rest = docs.where(col("doc_id") >= 200L)
    llm.Dedup.minhashIndexWrite(docs, "text", "doc_id", lsh,
      shingleN = 3, k = 8, bands = 4)
    llm.Search.bm25IndexWrite(base, "text", "doc_id", bm, nBuckets = 8)
    llm.Search.bm25AppendBatch(spark, bm, rest, "text", "doc_id", batchId = 1L)
    llm.LanguageModel.lmWrite(base, "text", "doc_id", lm)
    llm.LanguageModel.lmAppendBatch(spark, lm, rest, "text", "doc_id", batchId = 1L)
    llm.Classifier.nbWrite(base, "text", "lang", nb)
    llm.Classifier.nbAppendBatch(spark, nb, rest, "text", "lang", batchId = 1L)
    ops.Graph.foldBatch(spark, gph,
      llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 2, threshold = 0.1)
        .select(col("id_a").cast("long"), col("id_b").cast("long")),
      "id_a", "id_b", batchId = 0L)
    llm.TextAnalysis.noveltyIndexWrite(docs, "text", "doc_id", nov)
    streaming.Ingest.retractEverywhere(spark,
      docs.where(col("doc_id") % 7 === 3), retractionId = 1L,
      streaming.Ingest.RetractTargets(
        lshIndexPath = Some(lsh), bm25IndexPath = Some(bm),
        lmModelPath = Some(lm), nbModelPath = Some(nb),
        graphPath = Some(gph), noveltyPath = Some(nov)),
      "text", "doc_id", labelCol = "lang")
    // served values BEFORE maintenance (tombstones applied at read)
    def novRows() = llm.TextAnalysis.noveltyScoresIndexed(spark, nov)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def asgRows() = ops.Graph.assignment(spark, gph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bmRows() = llm.Search.bm25Indexed(spark, bm, Seq("spark", "join"))
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Double]("bm25"))).toSet
    val (nov0, asg0, bm0) = (novRows(), asgRows(), bmRows())
    val targets = streaming.Ingest.MaintainTargets(
      lshIndexPath = Some(lsh), bm25IndexPath = Some(bm),
      lmModelPath = Some(lm), nbModelPath = Some(nb),
      graphPath = Some(gph), noveltyPath = Some(nov))
    val report = streaming.Ingest.maintainEverywhere(spark, targets,
      maxLiveBatches = 1)
    assert(report === Seq("lsh" -> "compact", "bm25" -> "compact",
      "lm" -> "compact", "nb" -> "compact", "k13" -> "compact",
      "k17" -> "compact"),
      s"every family had pending tombstones or >1 live batch: $report")
    // maintenance moved no served value
    assert(novRows() === nov0)
    assert(asgRows() === asg0)
    assert(bmRows() === bm0)
    // and discharged everything: the second turn is all-none
    val again = streaming.Ingest.maintainEverywhere(spark, targets,
      maxLiveBatches = 1)
    assert(again.forall(_._2 == "none"), s"second run must gate out: $again")
  }

  test("the IVF leg compacts on pending tombstones alone (round-13 gate)") {
    import spark.implicits._
    val emb = core.Engine.table(spark, TestSpark.sf, "embeddings")
      .where(col("vec_id") < 500L)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val ivf = tmp("graft-mt-ivf")
    llm.Similarity.ivfWriteIndex(emb, "v", "id", nCells = 4, lloydRounds = 1,
      path = ivf)
    llm.Similarity.ivfRetract(spark, ivf,
      emb.where(col("id") % 5 === 2).select(col("id")), "id", retractionId = 1L)
    val report = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(ivfIndexPath = Some(ivf)))
    assert(report === Seq("ivf" -> "compact"),
      "one live batch but pending tombstones — the compact must fire")
    assert(ops.Tombstones.retIds(spark, ivf).isEmpty)
    assert(streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(ivfIndexPath = Some(ivf)))
      === Seq("ivf" -> "none"))
  }

  test("misconfiguration refuses loudly") {
    val ex = intercept[IllegalArgumentException] {
      streaming.Ingest.maintainEverywhere(spark,
        streaming.Ingest.MaintainTargets())
    }
    assert(ex.getMessage.contains("no targets"))
  }

  test("the drift advisory leg reports stable vs retune from persisted state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-mt-drift").toString
    val bin = graft.llm.Drift.lengthBin(col("text"), 10)
    def docs(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "source", "text")
    val ref = (0L until 100L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    graft.llm.Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    // stable intake: same shape as the reference
    graft.llm.Drift.accumulate(spark, path,
      docs(ref.map(r => (r._1 + 1000L, r._2, r._3))), "source", bin, 5, batchId = 0L)
    val stable = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(driftStatePath = Some(path), driftNBins = 5)).toMap
    assert(stable("drift") === "stable")
    // drifted intake: everything lands in the top bin
    graft.llm.Drift.accumulate(spark, path,
      docs((0L until 300L).map(i => (i + 2000L, "s", "x" * 45))),
      "source", bin, 5, batchId = 1L)
    val drifted = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(driftStatePath = Some(path), driftNBins = 5)).toMap
    assert(drifted("drift").startsWith("retune("))
  }

  test("the corpus leg compacts+refreshes through the turn (round 14, opt-in)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val adm = java.nio.file.Files.createTempDirectory("graft-mt-corpus").toString + "/t"
    (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("__batch", lit(0L))
      .write.mode("overwrite").partitionBy("__batch").parquet(adm)
    streaming.Ingest.retractEverywhere(spark,
      Seq((3L, "doc 3")).toDF("doc_id", "text"), retractionId = 0L,
      streaming.Ingest.RetractTargets(corpusDir = Some(adm)), "text", "doc_id")
    // default OFF: tombstones stay logical, action is refresh-only
    val off = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(corpusDir = Some(adm),
        corpusStatsCols = Seq("doc_id"))).toMap
    assert(off("corpus") === "refresh")
    // opt-in: the bake fires, then a clean second turn refreshes only
    val on = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(corpusDir = Some(adm),
        corpusStatsCols = Seq("doc_id"), compactCorpus = true)).toMap
    assert(on("corpus") === "compact+refresh")
    val again = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(corpusDir = Some(adm),
        corpusStatsCols = Seq("doc_id"), compactCorpus = true)).toMap
    assert(again("corpus") === "refresh")
    val got = streaming.Ingest.admitted(spark, adm)
      .select("doc_id").as[Long].collect().toSet
    assert(got === (0L until 50L).toSet - 3L)
  }

  test("the snapshot leg paces chunk landings across turns (round 15)") {
    import spark.implicits._
    val st = java.nio.file.Files.createTempDirectory("graft-mt-snap").toString
    val table = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "payload")
    def turn() = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(snapshot = Some(
        streaming.Ingest.SnapshotTarget(st, table, "k", chunkSize = 10,
          loLsnOf = c => 100L + c, maxChunksPerTurn = 2)))).toMap
    assert(turn()("snapshot") === "landed(2)")
    assert(turn()("snapshot") === "landed(2)")
    assert(turn()("snapshot") === "landed(1)") // 5 chunks of 10 over 50 keys
    assert(turn()("snapshot") === "none")      // finished: the turn no-ops
    val landed = graft.cdc.IncrementalSnapshot.landedChunks(spark, st)
    assert(landed.count() === 50L)
    assert(landed.select("k").as[Long].collect().toSet === (0L until 50L).toSet)
  }

  test("the signal leg: the turn obeys whatever the signal protocol says (round 16)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mt-sig").toString
    val table = (0L until 40L).map(i => (i, s"v$i")).toDF("k", "payload")
    def turn() = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(signals = Some(
        streaming.Ingest.SignalTarget(root, _ => table, _ => Seq("k"),
          _ => 10, (_, c) => 100L + c, maxChunksPerTurn = 2)))).toMap
    def signal(id: String, typ: String, data: String): Unit =
      graft.cdc.Signals.applySignals(spark, root,
        Seq((id, typ, data, 1L)).toDF("id", "type", "data", "lsn"))
    // nothing queued: the leg idles
    assert(turn()("signal_snapshot") === "idle")
    signal("a", "execute-snapshot", """{"data-collections":["t"]}""")
    assert(turn()("signal_snapshot") === "landed(2)")
    signal("b", "pause-snapshot", null)
    assert(turn()("signal_snapshot") === "paused")
    signal("c", "resume-snapshot", null)
    assert(turn()("signal_snapshot") === "landed(2)")
    assert(turn()("signal_snapshot") === "idle") // pops, queue empty
    assert(graft.cdc.IncrementalSnapshot.landedChunks(spark,
      graft.cdc.Signals.collectionPath(root, "t")).count() === 40L)
  }

  test("the drift_state leg folds fragments through the turn (round 14, opt-in r15)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-mt-dcomp").toString
    val bin = graft.llm.Drift.lengthBin(col("text"), 10)
    def docs(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "source", "text")
    val ref = (0L until 50L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    graft.llm.Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    (0 until 4).foreach { b =>
      graft.llm.Drift.accumulate(spark, path,
        docs(ref.map(r => (r._1 + 1000L * (b + 1), r._2, r._3))),
        "source", bin, 5, batchId = b.toLong)
    }
    // default OFF (r15 — the r14 advice): compaction watermarks fold
    // replays away, so it is a retired-lineage opt-in like compactCorpus
    val off = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(driftStatePath = Some(path), driftNBins = 5),
      maxLiveBatches = 2).toMap
    assert(off("drift_state") === "none")
    val r = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(driftStatePath = Some(path), driftNBins = 5,
        compactDriftState = true),
      maxLiveBatches = 2).toMap
    assert(r("drift_state") === "compact")
    assert(r("drift") === "stable")
    val again = streaming.Ingest.maintainEverywhere(spark,
      streaming.Ingest.MaintainTargets(driftStatePath = Some(path), driftNBins = 5,
        compactDriftState = true),
      maxLiveBatches = 2).toMap
    assert(again("drift_state") === "none")
  }
}

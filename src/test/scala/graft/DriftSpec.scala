package graft

import graft.llm.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K8 PSI drift — the laws the contract query's hash can't express:
  * identical slices score ~0, a genuine shape shift scores high, a
  * VANISHED bin registers (the Laplace grid's whole point), and the
  * advisory trips exactly on the threshold.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  private def psiOf(rows: Seq[(Long, String, String)]): Map[String, Double] =
    Drift.psiDrift(docs(rows), "source", Drift.lengthBin(col("text"), 10),
        isCur = col("doc_id") % 2 === 1L, nBins = 5)
      .as[(String, Double)].collect().toMap

  test("identical distributions across halves give PSI near zero") {
    // even and odd docs get the same length mix
    val rows = (0L until 200L).map { i =>
      (i, "s", "x" * (((i / 2) % 5).toInt * 10 + 5))
    }
    val psi = psiOf(rows)("s")
    assert(psi >= 0.0 && psi < 0.01, s"stable corpus scored $psi")
  }

  test("a shifted distribution scores far above the re-tune threshold") {
    // reference: short docs; current: long docs
    val rows = (0L until 200L).map { i =>
      val len = if (i % 2 == 0L) 5 else 45
      (i, "s", "x" * len)
    }
    val psi = psiOf(rows)("s")
    assert(psi > 1.0, s"hard shift scored only $psi")
  }

  test("a bin emptying out registers drift (Laplace grid keeps it)") {
    // bin 4 exists only in the reference half
    val rows = (0L until 100L).map { i =>
      val len = if (i % 2 == 0L && i % 10 == 0L) 45 else 5
      (i, "s", "x" * len)
    }
    val psi = psiOf(rows)("s")
    assert(psi > 0.05, s"vanished bin scored only $psi")
  }

  test("groups are independent: one drifting source doesn't contaminate a stable one") {
    val stable = (0L until 100L).map(i => (i, "stable", "x" * 5))
    val drifty = (1000L until 1100L).map { i =>
      (i, "drift", "x" * (if (i % 2 == 0L) 5 else 45))
    }
    val psi = psiOf(stable ++ drifty)
    assert(psi("stable") < 0.01)
    assert(psi("drift") > 1.0)
  }

  test("accumulate is replay-idempotent and batching-invariant") {
    val path = java.nio.file.Files.createTempDirectory("graft-driftspec").toString
    val ref = (0L until 100L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    val curA = (100L until 150L).map(i => (i, "s", "x" * 45))
    val curB = (150L until 200L).map(i => (i, "s", "x" * 5))
    val bin = Drift.lengthBin(col("text"), 10)
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    Drift.accumulate(spark, path, docs(curA), "source", bin, 5, batchId = 0L)
    Drift.accumulate(spark, path, docs(curB), "source", bin, 5, batchId = 1L)
    // an at-least-once redelivery of batch 1 rewrites its own partition
    Drift.accumulate(spark, path, docs(curB), "source", bin, 5, batchId = 1L)
    val streamed = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    // one-shot over the same split must agree exactly
    val oneShot = Drift.psiDrift(
        docs(ref.map(r => (r._1 * 2, r._2, r._3)) ++
             (curA ++ curB).map(r => (r._1 * 2 + 1, r._2, r._3))),
        "source", bin, isCur = col("doc_id") % 2 === 1L, nBins = 5)
      .as[(String, Double)].head()._2
    assert(streamed === oneShot)
  }

  test("retraction through the composed delete turn; over-retraction refuses loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-driftret-spec").toString
    val bin = Drift.lengthBin(col("text"), 10)
    val ref = (0L until 100L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    val cur = (100L until 200L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    Drift.accumulate(spark, path, docs(cur), "source", bin, 5, batchId = 0L)
    // delete a slice via the ONE composed turn (drift-only target)
    val removed = cur.filter(_._1 % 7 == 3)
    graft.streaming.Ingest.retractEverywhere(spark, docs(removed), 10L,
      graft.streaming.Ingest.RetractTargets(
        driftState = Some(graft.streaming.Ingest.DriftTarget(path, "source", bin, 5))),
      textCol = "text", idCol = "doc_id")
    val got = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    // survivor-corpus one-shot
    val want = Drift.psiDrift(
        docs(ref.map(r => (r._1 * 2, r._2, r._3)) ++
             cur.filterNot(_._1 % 7 == 3).map(r => (r._1 * 2 + 1, r._2, r._3))),
        "source", bin, isCur = col("doc_id") % 2 === 1L, nBins = 5)
      .as[(String, Double)].head()._2
    assert(got === want)
    // retracting docs that were never accumulated must refuse, not NaN
    val ghost = (9000L until 9500L).map(i => (i, "s", "x" * 5))
    Drift.retract(spark, path, docs(ghost), "source", bin, 5, retractionId = 11L)
    val ex = intercept[IllegalArgumentException] {
      Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source").collect()
    }
    assert(ex.getMessage.contains("negative bin counts"))
  }

  test("quantile bins give equal reference mass; quantileBin counts edges below") {
    val ref = (1L to 100L).map(i => (i, "s", "x" * i.toInt)).toDF("doc_id", "source", "text")
    val edges = Drift.quantileBinEdges(ref, length(col("text")), nBins = 4)
    assert(edges.length === 3)
    // quartiles of 1..100 under linear interpolation: 25.75, 50.5, 75.25
    assert(edges === Seq(25.75, 50.5, 75.25))
    val binned = ref.select(Drift.quantileBin(length(col("text")), edges).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(binned === Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
  }

  test("intake-folded drift == one-shot PSI over the admitted corpus") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val corpus = graft.core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val model = tmp("graft-dint-model")
    val idx = tmp("graft-dint-idx")
    val adm = tmp("graft-dint-adm") + "/t"
    val nov = tmp("graft-dint-nov")
    val dft = tmp("graft-dint-drift")
    val bin = Drift.lengthBin(col("text"), 200)
    graft.llm.Classifier.nbWrite(corpus.where(col("doc_id") < 400L), "text", "lang", model)
    Drift.referenceWrite(spark, dft, corpus.where(col("doc_id") < 400L),
      "source", bin, nBins = 10)
    def turn(lo: Long, hi: Long, id: Long): Unit =
      graft.streaming.Ingest.curateBatch(
        corpus.where(col("doc_id") >= lo && col("doc_id") < hi)
          .select(col("doc_id"), col("text"), col("source")),
        id, model, Seq("en"), idx, adm, nov, "text", "doc_id",
        shingleN = 3, k = 8, bands = 4, threshold = 0.8,
        maxBucketSize = Int.MaxValue,
        driftTarget = graft.streaming.Ingest.DriftTarget(dft, "source", bin, 10))
    turn(400L, 450L, 0L)
    turn(450L, 500L, 1L)
    val folded = Drift.psiAgainstReference(spark, dft, nBins = 10, groupOut = "source")
      .as[(String, Double)].collect().toMap
    // one-shot: reference half vs the ADMITTED corpus as the cur slice
    val ref = corpus.where(col("doc_id") < 400L)
      .select(col("source"), col("text")).withColumn("cur", lit(false))
    val admitted = graft.streaming.Ingest.admitted(spark, adm)
      .select(col("source"), col("text")).withColumn("cur", lit(true))
    val oneShot = Drift.psiDrift(ref.unionByName(admitted), "source", bin,
        isCur = col("cur"), nBins = 10)
      .as[(String, Double)].collect().toMap
    assert(folded === oneShot)
  }

  test("reservoirFold: replay no-op, batching-order-free, equals one-shot top-k") {
    import graft.llm.TextAnalysis
    val path = java.nio.file.Files.createTempDirectory("graft-res-spec").toString
    val all = (0L until 300L).map(i => (i, if (i % 3 == 0) "heavy" else "light"))
    val wt = when(col("source") === "heavy", 5.0d).otherwise(1.0d)
    def fold(rows: Seq[(Long, String)]): Unit =
      TextAnalysis.reservoirFold(spark, path, rows.toDF("doc_id", "source"),
        "doc_id", wt, k = 20)
    fold(all.filter(_._1 < 150L))
    fold(all.filter(_._1 >= 150L))
    fold(all.filter(_._1 >= 150L)) // at-least-once replay: set no-op
    val got = TextAnalysis.reservoirRead(spark, path)
      .select("doc_id").as[Long].collect().toSet
    // one-shot top-20 over everything with the same deterministic keys
    val oneShot = all.toDF("doc_id", "source")
      .withColumn("__wt", wt)
      .withColumn("__skey", TextAnalysis.aresPriority(col("doc_id"), col("__wt")))
      .orderBy(col("__skey").desc, col("doc_id")).limit(20)
      .select("doc_id").as[Long].collect().toSet
    assert(got === oneShot)
    // reversed batch order converges to the same reservoir
    val path2 = java.nio.file.Files.createTempDirectory("graft-res-spec2").toString
    TextAnalysis.reservoirFold(spark, path2,
      all.filter(_._1 >= 150L).toDF("doc_id", "source"), "doc_id", wt, 20)
    TextAnalysis.reservoirFold(spark, path2,
      all.filter(_._1 < 150L).toDF("doc_id", "source"), "doc_id", wt, 20)
    val got2 = TextAnalysis.reservoirRead(spark, path2)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 === oneShot)
  }

  test("a NULL signal lands in bin 0, not the top bin (least/greatest skip NULLs)") {
    val rows = Seq((0L, "s", "x" * 45), (1L, "s", null: String))
    val counts = Drift.binCounts(docs(rows), "source",
        Drift.lengthBin(col("text"), 10), nBins = 5)
      .select("b", "c").as[(Int, Long)].collect().toMap
    // before the r13-advice fix, least(null, 4) resolved to 4 and the
    // null doc landed in the TOP bin
    assert(counts === Map(4 -> 1L, 0 -> 1L))
  }

  test("pinned quantile edges: accumulate uses the persisted edges; re-pin refuses") {
    val path = java.nio.file.Files.createTempDirectory("graft-qpin-spec").toString
    val ref = (1L to 100L).map(i => (i, "s", "x" * i.toInt))
    // pinning derives + persists the edges and bins the reference with them
    val edges = Drift.quantileReferenceWrite(spark, path, docs(ref), "source",
      length(col("text")), nBins = 4)
    assert(edges === Seq(25.75, 50.5, 75.25))
    assert(Drift.pinnedQuantileState(spark, path) === ((edges, 4)))
    // accumulate reads the PINNED edges — no caller-held Seq exists to
    // diverge with
    val cur = (200L until 300L).map(i => (i, "s", "x" * 80))
    Drift.quantileAccumulate(spark, path, docs(cur), "source",
      length(col("text")), batchId = 0L)
    val got = Drift.quantilePsiAgainstReference(spark, path, groupOut = "source")
      .as[(String, Double)].head()._2
    val want = Drift.psiDrift(
        docs(ref.map(r => (r._1 * 2, r._2, r._3)) ++
             cur.map(r => (r._1 * 2 + 1, r._2, r._3))),
        "source", Drift.quantileBin(length(col("text")), edges),
        isCur = col("doc_id") % 2 === 1L, nBins = 4)
      .as[(String, Double)].head()._2
    assert(got === want)
    // re-deriving edges over accumulated history is the silent-mismatch
    // bug class — the re-pin refuses loudly
    val ex = intercept[IllegalArgumentException] {
      Drift.quantileReferenceWrite(spark, path, docs(cur), "source",
        length(col("text")), nBins = 4)
    }
    assert(ex.getMessage.contains("already has accumulated counts"))
    // the intake-turn hook builds its DriftTarget FROM the pinned state
    val dt = graft.streaming.Ingest.quantileDriftTarget(
      spark, path, "source", length(col("text")))
    assert(dt.nBins === 4 && dt.statePath === path)
    // an edge-less state refuses quantile accumulation (no ad-hoc edges)
    val bare = java.nio.file.Files.createTempDirectory("graft-qpin-bare").toString
    Drift.referenceWrite(spark, bare, docs(ref), "source",
      Drift.lengthBin(col("text"), 10), nBins = 5)
    val ex2 = intercept[IllegalArgumentException] {
      Drift.quantileAccumulate(spark, bare, docs(cur), "source",
        length(col("text")), batchId = 0L)
    }
    assert(ex2.getMessage.contains("no pinned quantile edges"))
  }

  test("psiTrend: one keyed plan equals the per-batch fold; 100-batch planning stays flat") {
    val path = java.nio.file.Files.createTempDirectory("graft-trend-soak").toString
    val bin = Drift.lengthBin(col("text"), 10)
    val ref = (0L until 100L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    val nBatches = 100
    (0 until nBatches).foreach { b =>
      val rows = (0L until 10L).map(i =>
        (b * 100L + i, "s", "x" * (((i + b) % 5).toInt * 10 + 5)))
      Drift.accumulate(spark, path, docs(rows), "source", bin, 5, batchId = b.toLong)
    }
    val t0 = System.nanoTime()
    val trend = Drift.psiTrend(spark, path, nBins = 5, groupOut = "source")
    val planNs = System.nanoTime() - t0 // plan construction only (lazy)
    val got = trend.as[(Long, String, Double)].collect()
      .map(r => (r._1, r._3)).toMap
    assert(got.size === nBatches)
    // the r13 shape built one psiFromCounts plan PER batch; the keyed
    // plan must agree with that fold batch for batch
    val refCounts = Drift.binCounts(docs(ref), "source", bin, 5)
    (0 until nBatches by 19).foreach { b =>
      val rows = (0L until 10L).map(i =>
        (b * 100L + i, "s", "x" * (((i + b) % 5).toInt * 10 + 5)))
      val alone = Drift.psiFromCounts(refCounts,
          Drift.binCounts(docs(rows), "source", bin, 5), 5, "source")
        .as[(String, Double)].head()._2
      assert(got(b.toLong) === alone, s"batch $b diverged from the solo fold")
    }
    // plan construction is O(1) in the batch count now — building the
    // lazy frame must not walk the batches (generous bound; the r13
    // loop built 100 plans + 99 unions here)
    assert(planNs < 5e9, s"psiTrend plan construction took ${planNs / 1e9} s")
  }

  test("retune re-pins the reference to the live distribution: PSI drops to exactly 0") {
    val path = java.nio.file.Files.createTempDirectory("graft-retune-spec").toString
    val bin = Drift.lengthBin(col("text"), 10)
    val ref = (0L until 100L).map(i => (i, "s", "x" * 5))
    val cur = (100L until 200L).map(i => (i, "s", "x" * 45)) // hard shift
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    Drift.accumulate(spark, path, docs(cur), "source", bin, 5, batchId = 0L)
    val before = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(before > 1.0, s"setup should drift hard, scored $before")
    Drift.retune(spark, path)
    val after = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(after === 0.0, s"post-retune PSI must be exactly 0, got $after")
    // the accumulated history survives the swap (the time axis keeps it)
    val trend = Drift.psiTrend(spark, path, nBins = 5, groupOut = "source").collect()
    assert(trend.length === 1)
    // and the monitor re-arms: a NEW drifted batch scores high again
    Drift.accumulate(spark, path, docs((300L until 400L).map(i => (i, "s", "x" * 5))),
      "source", bin, 5, batchId = 1L)
    val rearmed = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(rearmed > 0.1, s"monitor did not re-arm after retune: $rearmed")
  }

  test("retune on a PINNED-edge quantile state keeps the edges (the binning is the lineage)") {
    val path = java.nio.file.Files.createTempDirectory("graft-qretune-spec").toString
    val ref = (1L to 100L).map(i => (i, "s", "x" * i.toInt))
    val edges = Drift.quantileReferenceWrite(spark, path, docs(ref), "source",
      length(col("text")), nBins = 4)
    Drift.quantileAccumulate(spark, path,
      docs((200L until 300L).map(i => (i, "s", "x" * 90))), "source",
      length(col("text")), batchId = 0L)
    val before = Drift.quantilePsiAgainstReference(spark, path, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(before > 0.25, s"setup should drift past the threshold, got $before")
    Drift.retune(spark, path)
    // the edges survive the ref swap — re-binning would be a NEW lineage
    assert(Drift.pinnedQuantileState(spark, path) === ((edges, 4)))
    assert(Drift.quantilePsiAgainstReference(spark, path, groupOut = "source")
      .as[(String, Double)].head()._2 === 0.0)
    // and the pinned accumulate path still works against the new baseline
    Drift.quantileAccumulate(spark, path,
      docs((400L until 450L).map(i => (i, "s", "x" * 90))), "source",
      length(col("text")), batchId = 1L)
    val after = Drift.quantilePsiAgainstReference(spark, path, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(after >= 0.0 && after < before,
      s"same-shape batches vs the retuned baseline should score low: $after")
  }

  test("maintainEverywhere retune leg: NB gate retrains on survivors, reference re-pins") {
    import graft.streaming.Ingest
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dft = tmp("graft-mretune-drift")
    val model = tmp("graft-mretune-model")
    val adm = tmp("graft-mretune-adm") + "/t"
    val bin = Drift.lengthBin(col("text"), 10)
    // drifting monitor state
    Drift.referenceWrite(spark, dft,
      docs((0L until 100L).map(i => (i, "s", "x" * 5))), "source", bin, nBins = 5)
    Drift.accumulate(spark, dft,
      docs((100L until 200L).map(i => (i, "s", "x" * 45))), "source", bin, 5, 0L)
    // a stale gate model + an admitted corpus carrying its audit labels
    val corpus = (0L until 60L).map(i =>
      (i, s"good doc $i about spark and parquet tables", "en"))
    graft.llm.Classifier.nbWrite(
      corpus.take(10).toDF("doc_id", "text", "predicted"), "text", "predicted", model)
    corpus.toDF("doc_id", "text", "predicted").withColumn("__batch", lit(0L))
      .write.mode("overwrite").partitionBy("__batch").parquet(adm)
    val report = Ingest.maintainEverywhere(spark,
      Ingest.MaintainTargets(
        driftStatePath = Some(dft), driftNBins = 5,
        driftRetune = Some(Ingest.RetuneTarget(
          nbModelPath = Some(model), corpusDir = Some(adm)))))
    assert(report.exists { case (f, a) => f == "drift" && a.startsWith("retrain") },
      s"expected retrain, got $report")
    // reference re-pinned → PSI 0
    val after = Drift.psiAgainstReference(spark, dft, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(after === 0.0)
    // the gate model now equals a from-scratch train on the FULL
    // admitted survivors (not the 10-doc stale set)
    val want = graft.llm.Classifier.nbTrain(
        corpus.toDF("doc_id", "text", "predicted"), "text", "predicted")
      .as[(String, String, Long)].collect().toSet
    val gotModel = graft.llm.Classifier.nbModel(spark, model)
      .as[(String, String, Long)].collect().toSet
    assert(gotModel === want)
    // a second turn reports stable — the retune converged
    val report2 = Ingest.maintainEverywhere(spark,
      Ingest.MaintainTargets(driftStatePath = Some(dft), driftNBins = 5,
        driftRetune = Some(Ingest.RetuneTarget(
          nbModelPath = Some(model), corpusDir = Some(adm)))))
    assert(report2.contains("drift" -> "stable"), s"got $report2")
  }

  test("driftCompact: PSI-invariant fold, folded-batch replay refused, trend coarsens") {
    val path = java.nio.file.Files.createTempDirectory("graft-dcomp-spec").toString
    val bin = Drift.lengthBin(col("text"), 10)
    val ref = (0L until 100L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    (0 until 10).foreach { b =>
      val rows = (0L until 20L).map(i =>
        (b * 100L + i, "s", "x" * (((i + b) % 5).toInt * 10 + 5)))
      Drift.accumulate(spark, path, docs(rows), "source", bin, 5, batchId = b.toLong)
    }
    Drift.retract(spark, path,
      docs((0L until 20L).filter(_ % 7 == 3).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))),
      "source", bin, 5, retractionId = 50L)
    val before = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    // gate: 10 cur + 1 ret fragments > 8 → compact; second turn no-op
    assert(Drift.driftMaintain(spark, path, maxLiveBatches = 8) === "compact")
    assert(Drift.driftMaintain(spark, path, maxLiveBatches = 8) === "none")
    val after = Drift.psiAgainstReference(spark, path, nBins = 5, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(after === before, "compaction moved the monitored PSI")
    // the time axis coarsens to the single folded batch
    val trend = Drift.psiTrend(spark, path, nBins = 5, groupOut = "source").collect()
    assert(trend.length === 1 && trend.head.getLong(0) === 0L)
    // a replayed pre-compaction batch refuses loudly (watermark)
    val ex = intercept[IllegalArgumentException] {
      Drift.accumulate(spark, path, docs(Seq((5000L, "s", "x" * 5))),
        "source", bin, 5, batchId = 7L)
    }
    assert(ex.getMessage.contains("compaction watermark"))
    // post-compaction accumulation above the watermark works and sums in
    Drift.accumulate(spark, path, docs(Seq((5000L, "s", "x" * 5))),
      "source", bin, 5, batchId = 10L)
    val trend2 = Drift.psiTrend(spark, path, nBins = 5, groupOut = "source").collect()
    assert(trend2.length === 2, "the new batch should join the folded one in the trend")
  }

  test("stratifiedReservoirFold: per-group top-k, replay no-op, order-free") {
    import graft.llm.TextAnalysis
    val path = java.nio.file.Files.createTempDirectory("graft-sres-spec").toString
    val all = (0L until 300L).map(i => (i, s"src${i % 4}"))
    val wt = when(col("source") === "src0", 5.0d).otherwise(1.0d)
    def fold(rows: Seq[(Long, String)], p: String = path): Unit =
      TextAnalysis.stratifiedReservoirFold(spark, p,
        rows.toDF("doc_id", "source"), "doc_id", "source", wt, k = 7)
    fold(all.filter(_._1 < 150L))
    fold(all.filter(_._1 >= 150L))
    fold(all.filter(_._1 >= 150L)) // at-least-once replay: set no-op
    val got = TextAnalysis.stratifiedReservoirRead(spark, path)
      .select("doc_id").as[Long].collect().toSet
    // one-shot per-group top-7 with the same deterministic keys
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__skey").desc, col("doc_id"))
    val oneShot = all.toDF("doc_id", "source")
      .withColumn("__wt", wt)
      .withColumn("__skey", TextAnalysis.aresPriority(col("doc_id"), col("__wt")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 7)
      .select("doc_id").as[Long].collect().toSet
    assert(got === oneShot)
    assert(TextAnalysis.stratifiedReservoirRead(spark, path)
      .groupBy("source").count().as[(String, Long)].collect().toMap
      .values.forall(_ === 7L))
    // reversed batch order converges to the same reservoirs
    val path2 = java.nio.file.Files.createTempDirectory("graft-sres-spec2").toString
    fold(all.filter(_._1 >= 150L), path2)
    fold(all.filter(_._1 < 150L), path2)
    val got2 = TextAnalysis.stratifiedReservoirRead(spark, path2)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 === oneShot)
  }

  test("retract refuses a folded retractionId (r15 — the accumulate guard, mirrored)") {
    val path = java.nio.file.Files.createTempDirectory("graft-retfold-spec").toString
    val bin = Drift.lengthBin(col("text"), 10)
    val ref = (0L until 50L).map(i => (i, "s", "x" * ((i % 5).toInt * 10 + 5)))
    Drift.referenceWrite(spark, path, docs(ref), "source", bin, nBins = 5)
    Drift.accumulate(spark, path, docs(ref.map(r => (r._1 + 100L, r._2, r._3))),
      "source", bin, 5, batchId = 0L)
    Drift.retract(spark, path,
      docs(Seq((100L, "s", "x" * 5))), "source", bin, 5, retractionId = 7L)
    Drift.driftCompact(spark, path)
    // id 7 is folded into the committed generation — reusing it would be
    // written to ret/ but excluded from liveCounts: a silent no-op delete
    val ex = intercept[IllegalArgumentException] {
      Drift.retract(spark, path,
        docs(Seq((101L, "s", "x" * 15))), "source", bin, 5, retractionId = 7L)
    }
    assert(ex.getMessage.contains("already folded"))
    // a FRESH id still retracts normally
    Drift.retract(spark, path,
      docs(Seq((101L, "s", "x" * 15))), "source", bin, 5, retractionId = 8L)
    Drift.psiAgainstReference(spark, path, nBins = 5).collect() // no negative-count refusal
  }

  test("exact edge pin is size-gated; approxEdges is the declared bounded mode (r15)") {
    val ref = (1L to 100L).map(i => (i, "s", "x" * i.toInt))
    // over the bound: the exact pin refuses instead of buffering the slice
    val p1 = java.nio.file.Files.createTempDirectory("graft-qgate-spec").toString
    val ex = intercept[IllegalArgumentException] {
      Drift.quantileReferenceWrite(spark, p1, docs(ref), "source",
        length(col("text")), nBins = 4, maxExactRows = 10L)
    }
    assert(ex.getMessage.contains("exact-percentile edge pin bound"))
    // approx mode pins a WORKING state under the same bound; the mode is
    // recorded in the sidecar and the pinned-edge lifecycle is unchanged
    val edges = Drift.quantileReferenceWrite(spark, p1, docs(ref), "source",
      length(col("text")), nBins = 4, approxEdges = true, maxExactRows = 10L)
    assert(edges.size === 3 && edges === edges.sorted)
    assert(spark.read.parquet(s"$p1/edges").select("edge_mode")
      .as[String].head() === "approx")
    Drift.quantileAccumulate(spark, p1, docs(ref.map(r => (r._1 + 1000L, r._2, r._3))),
      "source", length(col("text")), batchId = 0L)
    val psi = Drift.quantilePsiAgainstReference(spark, p1, groupOut = "source")
      .as[(String, Double)].head()._2
    assert(psi === 0.0, s"same-shape intake should be stable, got $psi")
  }

  test("psiAdvisory trips on the threshold") {
    val rows = (0L until 200L).map { i =>
      val len = if (i % 2 == 0L) 5 else 45
      (i, "s", "x" * len)
    } ++ (1000L until 1100L).map(i => (i, "t", "x" * 5))
    val psi = Drift.psiDrift(docs(rows), "source", Drift.lengthBin(col("text"), 10),
      isCur = col("doc_id") % 2 === 1L, nBins = 5)
    val adv = Drift.psiAdvisory(psi).select("retune", "groups_over")
      .as[(Boolean, Long)].head()
    assert(adv._1 && adv._2 === 1L)
    val calm = Drift.psiAdvisory(psi.where(col("source") === "t"))
      .select("retune").as[Boolean].head()
    assert(!calm)
  }
}

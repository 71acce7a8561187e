package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The K15 multinomial Naive-Bayes family ([[graft.llm.Classifier]]):
  * the persisted path must be SCORE-IDENTICAL to the inline path,
  * appends bit-identical to a retrain (counts are additive), compaction
  * score-invariant, and the smoothing/prior/tie-break arithmetic pinned
  * on hand-computed fixtures (the contract queries additionally hash
  * the same scores against DuckDB).
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs: DataFrame =
    core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** (doc, n_tokens, predicted, score) rows as a comparable set. */
  private def cls(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select(col("doc"), col("n_tokens"), col("predicted"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

  private def tiny(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("indexed classification is score-identical to the inline path") {
    val path = tmp("graft-nb-spec")
    llm.Classifier.nbWrite(docs, "text", "lang", path)
    val inline = cls(llm.Classifier.nbClassify(docs,
      llm.Classifier.nbTrain(docs, "text", "lang"), "text", "doc_id"))
    val indexed = cls(llm.Classifier.nbClassifyIndexed(spark, path, docs, "text", "doc_id"))
    val self = cls(llm.Classifier.nbSelfClassify(docs, "text", "lang", "doc_id"))
    assert(indexed === inline, "persisted model must reproduce inline scores exactly")
    assert(self === inline, "the shared-pass self-classify must equal the two-step path")
    assert(inline.nonEmpty)
  }

  test("retraction equals a survivor retrain; a fully-removed class vanishes") {
    val path = tmp("graft-nb-ret")
    val removed = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    llm.Classifier.nbWrite(docs, "text", "lang", path)
    llm.Classifier.nbRetractBatch(spark, path, removed, "text", "lang", 0L)
    val retrain = cls(llm.Classifier.nbClassify(survivors,
      llm.Classifier.nbTrain(survivors, "text", "lang"), "text", "doc_id"))
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, survivors,
      "text", "doc_id")) === retrain,
      "negated counts + zero-row filter must equal a survivor retrain")
    // replay rewrites exactly itself; compaction bakes the cancellation
    llm.Classifier.nbRetractBatch(spark, path, removed, "text", "lang", 0L)
    llm.Classifier.nbCompact(spark, path)
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, survivors,
      "text", "doc_id")) === retrain)
    // a class retracted WHOLE must vanish from the priors like a retrain
    val p2 = tmp("graft-nb-ret2")
    val corpus = tiny((1L, "aa bb", "x"), (2L, "aa cc", "x"), (3L, "dd ee", "y"))
    llm.Classifier.nbWrite(corpus, "text", "lang", p2)
    llm.Classifier.nbRetractBatch(spark, p2,
      tiny((3L, "dd ee", "y")), "text", "lang", 0L)
    val m = llm.Classifier.nbModel(spark, p2)
    assert(m.where(col("label") === "y").count() === 0L,
      "class y's counts (sentinel included) must cancel away entirely")
    val out = cls(llm.Classifier.nbClassifyIndexed(spark, p2,
      tiny((9L, "dd ee", "?")), "text", "doc_id"))
    assert(out.forall(_._3 == "x"), "only the surviving class can be predicted")
  }

  test("incremental appends classify identically to a one-shot build; replay idempotent") {
    val path = tmp("graft-nb-spec-inc")
    val split = docs.agg((max(col("doc_id")) * lit(0.7)).cast("long")).head().getLong(0)
    llm.Classifier.nbWrite(docs.where(col("doc_id") < split), "text", "lang", path)
    llm.Classifier.nbAppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "lang", batchId = 1L)
    val full = cls(llm.Classifier.nbClassify(docs,
      llm.Classifier.nbTrain(docs, "text", "lang"), "text", "doc_id"))
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, docs, "text", "doc_id")) === full,
      "appended counts must sum to the retrained model bit-for-bit")
    // at-least-once replay: dynamic overwrite rewrites exactly itself
    llm.Classifier.nbAppendBatch(spark, path, docs.where(col("doc_id") >= split),
      "text", "lang", batchId = 1L)
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, docs, "text", "doc_id")) === full,
      "a replayed batch id must be idempotent")
  }

  test("compaction is score-invariant and the maintain policy fires on fragmentation") {
    val path = tmp("graft-nb-spec-cmp")
    val d = docs
    llm.Classifier.nbWrite(d.where(col("doc_id") < 100L), "text", "lang", path)
    (1L to 3L).foreach { b =>
      llm.Classifier.nbAppendBatch(spark, path,
        d.where(col("doc_id") >= b * 100L && col("doc_id") < (b + 1) * 100L),
        "text", "lang", batchId = b)
    }
    val scoreSet = d.where(col("doc_id") < 400L)
    val before = cls(llm.Classifier.nbClassifyIndexed(spark, path, scoreSet, "text", "doc_id"))
    assert(llm.Classifier.nbMaintain(spark, path, maxLiveBatches = 8) === "none",
      "4 live batches under a bound of 8 must be a no-op")
    assert(llm.Classifier.nbMaintain(spark, path, maxLiveBatches = 2) === "compact")
    assert(llm.Classifier.liveBatches(spark, path) === Seq(0L),
      "compaction must fold every batch into __batch=0")
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, scoreSet, "text", "doc_id")) === before,
      "summed counts are the counts: compaction must not move a single score")
    llm.Classifier.nbVacuum(spark, path)
    assert(cls(llm.Classifier.nbClassifyIndexed(spark, path, scoreSet, "text", "doc_id")) === before)
  }

  test("hand-computed smoothing, priors, OOV floor, and tie-break") {
    val train = tiny((1L, "x x", "A"), (2L, "y", "B"))
    val model = llm.Classifier.nbTrain(train, "text", "lang")
    // model: A×x:2, B×y:1, doc rows A:1 B:1 → ctx_A=2, ctx_B=1, V=2, N=2
    val got = llm.Classifier.nbClassify(tiny((10L, "x", "A"), (11L, "z", "A")),
      model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    // doc 10 "x": A: round6(ln(3/4)) + round6(ln(1/2)) = -0.287682 - 0.693147
    //             B: round6(ln(1/3)) + prior = -1.098612 - 0.693147
    assert(got(10L)._1 === "A")
    assert(got(10L)._2 === -0.980829)
    // doc 11 "z" is fully OOV: the add-one floor ln(1/(ctx+V)) favors the
    // SMALLER class mass — B wins on likelihood, priors equal
    assert(got(11L)._1 === "B")
    assert(got(11L)._2 === -1.791759)
  }

  test("exact score ties resolve to the greatest label deterministically") {
    val train = tiny((1L, "x", "A"), (2L, "x", "B"))
    val model = llm.Classifier.nbTrain(train, "text", "lang")
    // both classes: ln((1+1)/(1+1)) = 0 per occurrence, equal priors
    val got = llm.Classifier.nbClassify(tiny((10L, "x x", "?")), model, "text", "doc_id")
      .collect().head
    assert(got.getString(2) === "B", "ties must pick max(struct(score, label)) = greatest label")
  }

  test("the model join is broadcast under the gate and shuffles above it") {
    val model = llm.Classifier.nbTrain(docs, "text", "lang")
    // pin autoBroadcast off so the ONLY broadcast source is the gate's
    // hint — the planner would otherwise broadcast the small test model
    // on size stats and the gate would be untestable (TfidfGateSpec rule)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val under = llm.Classifier.nbScore(docs, model, "text", "doc_id")
        .queryExecution.executedPlan.toString
      assert(under.contains("BroadcastHashJoin"),
        s"an under-gate model must ride a broadcast join:\n$under")
      val over = llm.Classifier.nbScore(docs, model, "text", "doc_id",
        maxBroadcastModel = 0L)
        .queryExecution.executedPlan.toString
      assert(over.contains("SortMergeJoin") || over.contains("ShuffledHashJoin"),
        s"an over-gate model must fall back to a shuffled equi-join:\n$over")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("binaryAuc: hand-computed ties, the degenerate corners, partition invariance") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Boolean)], parts: Int = 0): (Long, Long, Double) =
      llm.Classifier.binaryAuc(rows.toDF("score", "pos"),
          org.apache.spark.sql.functions.col("score"),
          org.apache.spark.sql.functions.col("pos"), numPartitions = parts)
        .as[(Long, Long, Double)].head()
    // hand case with a tie straddling the classes: groups asc
    // 0.3(nn=1) 0.8(np=1,nn=1) 0.9(np=1) → wins = 1·1 + 1·2 = 3,
    // ties = 1 → AUC = (3 + 0.5)/4 = 0.875
    assert(auc(Seq((0.9, true), (0.8, false), (0.8, true), (0.3, false)))
      === ((2L, 2L, 0.875)))
    // perfect separation / inversion / indistinguishable
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))._3 === 1.0)
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)))._3 === 0.0)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))._3 === 0.5)
    // the range-partitioned two-pass must be partition-count-invariant
    val rnd = (0 until 500).map { i =>
      (((i * 37) % 101).toDouble / 101.0, (i * 13) % 3 == 0)
    }
    assert(auc(rnd, parts = 1) === auc(rnd, parts = 7))
    assert(auc(rnd, parts = 32) === auc(rnd, parts = 7))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The K14 bigram-LM perplexity family: the persisted model must be
  * SCORE-IDENTICAL to the inline self-scored path, appends must equal a
  * full retrain (count additivity), compaction must be score-invariant,
  * and cross-corpus scoring must hit the documented add-one OOV floor
  * −ln(V). The contract queries additionally hash four of these paths
  * against DuckDB.
  */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs: DataFrame =
    core.Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def scores(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc"), col("n_bigrams"), col("sum_logprob"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def modelRows(df: DataFrame): Set[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("persisted model scores identically to the inline self-scored path") {
    val path = tmp("graft-lm-spec")
    llm.LanguageModel.lmWrite(docs, "text", "doc_id", path)
    val inline = scores(llm.LanguageModel.perplexity(docs, "text", "doc_id"))
    val indexed = scores(
      llm.LanguageModel.lmScoreIndexed(spark, path, docs, "text", "doc_id"))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }

  test("appended model equals a full retrain, and replay is idempotent") {
    val path = tmp("graft-lm-inc")
    val split = 40L
    llm.LanguageModel.lmWrite(docs.where(col("doc_id") < split),
      "text", "doc_id", path)
    val batch = docs.where(col("doc_id") >= split)
    llm.LanguageModel.lmAppendBatch(spark, path, batch, "text", "doc_id", 1L)
    val full = modelRows(llm.LanguageModel.lmTrain(docs, "text", "doc_id"))
    assert(modelRows(llm.LanguageModel.lmModel(spark, path)) === full,
      "summed per-batch counts must equal the one-shot count table")
    // at-least-once replay: the same batch id rewrites exactly itself
    llm.LanguageModel.lmAppendBatch(spark, path, batch, "text", "doc_id", 1L)
    assert(modelRows(llm.LanguageModel.lmModel(spark, path)) === full,
      "a replayed batch must not double-count")
  }

  test("retraction equals a survivor retrain; replay idempotent; compact bakes zeros") {
    val path = tmp("graft-lm-ret")
    val removed = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    llm.LanguageModel.lmWrite(docs, "text", "doc_id", path)
    llm.LanguageModel.lmRetractBatch(spark, path, removed, "text", "doc_id", 0L)
    // the MODEL TABLE itself equals a survivor retrain (not just scores)
    val retrained = modelRows(llm.LanguageModel.lmTrain(survivors, "text", "doc_id"))
    assert(modelRows(llm.LanguageModel.lmModel(spark, path)) === retrained,
      "summed counts minus negated counts, zero rows dropped == retrain")
    val want = scores(llm.LanguageModel.lmScoreIndexed(spark, path, survivors,
      "text", "doc_id"))
    assert(want === scores(llm.LanguageModel.lmScore(survivors,
      llm.LanguageModel.lmTrain(survivors, "text", "doc_id"), "text", "doc_id")))
    // replayed retraction rewrites exactly itself
    llm.LanguageModel.lmRetractBatch(spark, path, removed, "text", "doc_id", 0L)
    assert(modelRows(llm.LanguageModel.lmModel(spark, path)) === retrained)
    // compaction bakes the cancellation: zero rows gone from the fold
    llm.LanguageModel.lmCompact(spark, path)
    assert(modelRows(llm.LanguageModel.lmModel(spark, path)) === retrained)
    assert(scores(llm.LanguageModel.lmScoreIndexed(spark, path, survivors,
      "text", "doc_id")) === want)
  }

  test("compaction collapses batches without changing scores") {
    val path = tmp("graft-lm-compact")
    val split = 40L
    llm.LanguageModel.lmWrite(docs.where(col("doc_id") < split),
      "text", "doc_id", path)
    llm.LanguageModel.lmAppendBatch(spark, path,
      docs.where(col("doc_id") >= split), "text", "doc_id", 1L)
    val before = scores(
      llm.LanguageModel.lmScoreIndexed(spark, path, docs, "text", "doc_id"))
    llm.LanguageModel.lmCompact(spark, path)
    assert(llm.LanguageModel.liveBatches(spark, path) === Seq(0L),
      "compaction must fold every batch into __batch=0")
    val after = scores(
      llm.LanguageModel.lmScoreIndexed(spark, path, docs, "text", "doc_id"))
    assert(after === before, "compaction must be score-invariant")
    llm.LanguageModel.lmVacuum(spark, path)
    assert(scores(llm.LanguageModel.lmScoreIndexed(
      spark, path, docs, "text", "doc_id")) === before,
      "vacuum must not touch the current generation")
  }

  test("fully-OOV documents score the add-one uniform floor -ln(V)") {
    import spark.implicits._
    val train = Seq((1L, "a b c"), (2L, "b c d")).toDF("id", "text")
    val oov = Seq((9L, "x y z")).toDF("id", "text")
    val model = llm.LanguageModel.lmTrain(train, "text", "id")
    val v = model.select(col("w2")).distinct().count().toDouble
    val got = scores(llm.LanguageModel.lmScore(oov, model, "text", "id"))
    val floor = BigDecimal(math.log(1.0 / v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Set((9L, 2L, 2 * floor)),
      s"every unseen transition must score the ln(1/V) = $floor floor")
  }

  test("band assignment is a partition with boundaries in the upper band") {
    val sc = llm.LanguageModel.perplexity(docs, "text", "doc_id")
      .localCheckpoint(true)
    val banded = llm.LanguageModel.perplexityBands(sc).localCheckpoint(true)
    assert(banded.count() === sc.count())
    val byBand = banded.groupBy(col("band")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBand.getOrElse("head", 0L) > 0 && byBand.getOrElse("tail", 0L) > 0,
      s"a 25/75 split over a real corpus must populate the outer bands: $byBand")
    // every head doc's MEAN logprob >= every middle doc's >= every tail's
    val withAvg = banded.withColumn("__a",
      col("sum_logprob") / col("n_bigrams").cast("double"))
    val minHead = withAvg.where(col("band") === "head")
      .agg(min(col("__a"))).head().getDouble(0)
    val maxMiddle = withAvg.where(col("band") === "middle")
      .agg(max(col("__a"))).head().getDouble(0)
    val maxTail = withAvg.where(col("band") === "tail")
      .agg(max(col("__a"))).head().getDouble(0)
    assert(minHead >= maxMiddle && maxMiddle >= maxTail)
    intercept[IllegalArgumentException] {
      llm.LanguageModel.perplexityBands(sc, loPct = 0.75, hiPct = 0.25)
    }
  }

  test("score join is broadcast under the vocab gate, shuffled above it") {
    // pin autoBroadcast off so the ONLY broadcast source is the hint —
    // locally every model passes the size threshold; at 100 TB it won't
    // (the 1-row V cross join stays a broadcast by design either way)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val model = llm.LanguageModel.lmTrain(docs, "text", "doc_id")
      val small = llm.LanguageModel.lmScore(docs, model, "text", "doc_id")
        .queryExecution.executedPlan.toString
      assert(small.contains("BroadcastHashJoin"),
        s"a gate-passing model must broadcast into the transition stream:\n$small")
      // force the gate shut: the model side must become a partitioned
      // join (sort-merge or shuffled-hash), never an unbounded broadcast
      val big = llm.LanguageModel.lmScore(docs, model, "text", "doc_id",
        maxBroadcastVocab = 1L).queryExecution.executedPlan.toString
      assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"),
        s"an over-gate model must not broadcast:\n$big")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append guards: batch 0 reserved, missing model refused") {
    val path = tmp("graft-lm-guards")
    intercept[IllegalArgumentException] {
      llm.LanguageModel.lmAppendBatch(spark, path, docs, "text", "doc_id", 0L)
    }
    intercept[IllegalArgumentException] {
      llm.LanguageModel.lmAppendBatch(spark, path, docs, "text", "doc_id", 1L)
    }
    intercept[IllegalArgumentException] {
      llm.LanguageModel.lmModel(spark, path)
    }
  }
}

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

  test("retraction: credit re-attributes, a later doc GAINS novelty, dead grams reopen") {
    import spark.implicits._
    val path = tmp("graft-nov-ret")
    // d1 holds gram "aa bb cc" first; d2 shares it and owns "bb cc dd";
    // d3 is disjoint — the smallest corpus where every retraction case
    // (re-attribution, death, disjoint untouched) is visible by eye
    val corpus = Seq((1L, "aa bb cc"), (2L, "aa bb cc dd"), (3L, "ee ff gg"))
      .toDF("doc_id", "text")
    graft.llm.TextAnalysis.noveltyIndexWrite(corpus, "text", "doc_id", path)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) ===
      Set((1L, 1L, 1L, 1.0), (2L, 2L, 1L, 0.5), (3L, 1L, 1L, 1.0)))
    // remove d1: its gram's first-occurrence credit must move to d2 —
    // the later doc GAINS novelty (0.5 → 1.0)
    val d1 = corpus.where(col("doc_id") === 1L)
    graft.llm.TextAnalysis.noveltyRetract(spark, path, d1, "text", "doc_id", 1L)
    val afterR1 = Set((2L, 2L, 2L, 1.0), (3L, 1L, 1L, 1.0))
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === afterR1,
      "d2 must gain the first-occurrence credit d1 held")
    // replay of the same retraction rewrites exactly itself
    graft.llm.TextAnalysis.noveltyRetract(spark, path, d1, "text", "doc_id", 1L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === afterR1)
    // remove d2 too: both its grams now have NO surviving holder — they
    // must leave the seen set entirely (dead grams)
    graft.llm.TextAnalysis.noveltyRetract(spark, path,
      corpus.where(col("doc_id") === 2L), "text", "doc_id", 2L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) ===
      Set((3L, 1L, 1L, 1.0)))
    // a future ingest of a dead gram is FIRST again — survivor-corpus
    // semantics, not tombstone-only semantics
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      Seq((10L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", batchId = 1L)
    val afterIngest = Set((3L, 1L, 1L, 1.0), (10L, 1L, 1L, 1.0))
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === afterIngest,
      "a dead gram's next ingest must score as novel again")
    // compaction bakes all of it physically and clears the lineage
    graft.llm.TextAnalysis.noveltyCompact(spark, path)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === afterIngest)
    assert(graft.ops.Tombstones.retIds(spark, path).isEmpty,
      "compaction must clear applied tombstones")
    assert(graft.llm.TextAnalysis.noveltyRetractWatermark(spark, path) === 2L)
    // a folded retraction lineage is retired — replaying it is refused
    val ex = intercept[IllegalArgumentException] {
      graft.llm.TextAnalysis.noveltyRetract(spark, path, d1, "text", "doc_id", 2L)
    }
    assert(ex.getMessage.contains("watermark"))
    // the lifecycle continues above the watermark: retract the re-ingest
    graft.llm.TextAnalysis.noveltyRetract(spark, path,
      Seq((10L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", 3L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) ===
      Set((3L, 1L, 1L, 1.0)))
  }

  test("compaction retires dead grams PHYSICALLY — the next ingest is first again") {
    import spark.implicits._
    // round-13 review: the scores fold used to advance the folded-
    // retraction watermark BEFORE the gram-set fold read the dead-gram
    // sidecar, so the sidecar read came back empty, the gram stayed in
    // the folded set, and step 4 deleted the sidecar for good — a
    // post-compaction ingest of the retired gram scored 0-novel forever
    val path = tmp("graft-nov-deadfold")
    val corpus = Seq((1L, "aa bb cc"), (2L, "ee ff gg")).toDF("doc_id", "text")
    graft.llm.TextAnalysis.noveltyIndexWrite(corpus, "text", "doc_id", path)
    graft.llm.TextAnalysis.noveltyRetract(spark, path,
      corpus.where(col("doc_id") === 1L), "text", "doc_id", 1L)
    graft.llm.TextAnalysis.noveltyCompact(spark, path)
    assert(graft.ops.Tombstones.retIds(spark, path).isEmpty)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      Seq((10L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", batchId = 1L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) ===
      Set((2L, 1L, 1L, 1.0), (10L, 1L, 1L, 1.0)),
      "a gram whose kill was folded by compaction must be FIRST again on re-ingest")
  }

  test("a revived dead gram is seen by every LATER batch while the retraction is live") {
    import spark.implicits._
    // round-13 review: the dead filter used to drop gram-set rows on h
    // alone, so a gram revived by batch N kept scoring novel in batch
    // N+1, N+2, … until a compaction happened to run. The dead mark now
    // carries the gram-set batch watermark at retraction time and leaves
    // later rows alone.
    val path = tmp("graft-nov-revive")
    val corpus = Seq((1L, "aa bb cc"), (3L, "ee ff gg")).toDF("doc_id", "text")
    graft.llm.TextAnalysis.noveltyIndexWrite(corpus, "text", "doc_id", path)
    graft.llm.TextAnalysis.noveltyRetract(spark, path,
      corpus.where(col("doc_id") === 1L), "text", "doc_id", 1L)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      Seq((10L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", batchId = 1L)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      Seq((20L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", batchId = 2L)
    val expect = Set((3L, 1L, 1L, 1.0), (10L, 1L, 1L, 1.0), (20L, 1L, 0L, 0.0))
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === expect,
      "batch 2 must see the gram batch 1 revived — only the FIRST revival is novel")
    // and that is exactly the survivor-corpus recompute
    val truth = rows(graft.llm.TextAnalysis.noveltyScores(
      Seq((3L, "ee ff gg"), (10L, "aa bb cc"), (20L, "aa bb cc"))
        .toDF("doc_id", "text"), "text", "doc_id"))
    assert(expect === truth)
    graft.llm.TextAnalysis.noveltyCompact(spark, path)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === expect,
      "the watermark-aware gram-set fold must keep the revived gram")
  }

  test("a COMMITTED retraction replays as a no-op even after interleaved appends") {
    import spark.implicits._
    // round-13 review: the composed delete turn replays every family
    // after a mid-fan-out crash; if the append stream folded a batch
    // between first play and replay, recomputing the sidecars would see
    // the post-retraction occurrences — a +1 delta for a doc whose
    // stored score ALREADY holds the credit, plus a stale dead mark the
    // empty dynamic overwrite cannot clear. Committed ⇒ return.
    val path = tmp("graft-nov-replay")
    val corpus = Seq((1L, "aa bb cc"), (3L, "ee ff gg")).toDF("doc_id", "text")
    val d1 = corpus.where(col("doc_id") === 1L)
    graft.llm.TextAnalysis.noveltyIndexWrite(corpus, "text", "doc_id", path)
    graft.llm.TextAnalysis.noveltyRetract(spark, path, d1, "text", "doc_id", 1L)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      Seq((10L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id", batchId = 1L)
    val settled = Set((3L, 1L, 1L, 1.0), (10L, 1L, 1L, 1.0))
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === settled)
    graft.llm.TextAnalysis.noveltyRetract(spark, path, d1, "text", "doc_id", 1L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === settled,
      "replaying a committed retraction must not double-credit the revived doc")
  }

  test("lifecycle law: ANY append/retract/compact interleaving equals the survivor recompute") {
    import spark.implicits._
    import org.scalacheck.Gen
    // the generative version of every hand-picked edge above (the
    // round-13 review found three lifecycle bugs in exactly this state
    // machine): random monotone-id appends, random live-doc
    // retractions, compactions at random points — after EVERY
    // operation the indexed read must equal the full survivor-corpus
    // recompute. Texts draw from a 4-token alphabet so gram collisions
    // (revives, re-attributions, deaths) are frequent.
    val tok = Gen.oneOf("aa", "bb", "cc", "dd")
    val textGen = for {
      k <- Gen.chooseNum(3, 5)
      ts <- Gen.listOfN(k, tok)
    } yield ts.mkString(" ")
    val opGen = Gen.chooseNum(0, 2) // 0 = append, 1 = retract, 2 = compact
    val caseGen = for {
      nBase <- Gen.chooseNum(1, 4)
      baseTexts <- Gen.listOfN(nBase, textGen)
      nOps <- Gen.chooseNum(3, 5)
      ops <- Gen.listOfN(nOps, opGen)
      opTexts <- Gen.listOfN(nOps, Gen.listOfN(2, textGen))
      rmPick <- Gen.listOfN(nOps, Gen.chooseNum(0, 1000))
    } yield (baseTexts, ops, opTexts, rmPick)
    var sample = 0
    (0 until 6).foreach { seed =>
      caseGen(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
        .foreach { case (baseTexts, ops, opTexts, rmPick) =>
          sample += 1
          val path = tmp(s"graft-nov-law-$seed")
          var live = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          var nextId = live.size.toLong
          var nextBatch = 1L
          var nextRet = 1L
          graft.llm.TextAnalysis.noveltyIndexWrite(
            live.toDF("doc_id", "text"), "text", "doc_id", path)
          def check(stage: String): Unit = {
            val got = rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path))
            val want =
              if (live.isEmpty) Set.empty[(Long, Long, Long, Double)]
              else rows(graft.llm.TextAnalysis.noveltyScores(
                live.toDF("doc_id", "text"), "text", "doc_id"))
            assert(got === want, s"seed=$seed $stage live=$live")
          }
          check("base")
          ops.zip(opTexts).zip(rmPick).foreach { case ((op, texts), pick) =>
            op match {
              case 0 =>
                val batch = texts.map { t => val d = (nextId, t); nextId += 1; d }
                graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
                  batch.toDF("doc_id", "text"), "text", "doc_id",
                  batchId = nextBatch)
                nextBatch += 1; live = live ++ batch
                check(s"append b=${nextBatch - 1}")
              case 1 if live.nonEmpty =>
                val rm = Seq(live(pick % live.size))
                graft.llm.TextAnalysis.noveltyRetract(spark, path,
                  rm.toDF("doc_id", "text"), "text", "doc_id",
                  retractionId = nextRet)
                nextRet += 1; live = live.filterNot(d => rm.contains(d))
                check(s"retract r=${nextRet - 1}")
              case 2 =>
                graft.llm.TextAnalysis.noveltyCompact(spark, path)
                check("compact")
              case _ => () // retract with no live docs: skip
            }
          }
        }
    }
    assert(sample >= 5, "generator must produce the samples")
  }

  test("retraction at corpus scale equals the survivor-corpus recompute") {
    val path = tmp("graft-nov-ret-sf")
    val survivors = docs.where(col("doc_id") % 5L =!= 2L)
    val removed = docs.where(col("doc_id") % 5L === 2L)
    val truth = rows(graft.llm.TextAnalysis.noveltyScores(survivors, "text", "doc_id"))
    graft.llm.TextAnalysis.noveltyIndexWrite(docs.where(col("doc_id") < 300L),
      "text", "doc_id", path)
    graft.llm.TextAnalysis.noveltyAppendBatch(spark, path,
      docs.where(col("doc_id") >= 300L), "text", "doc_id", batchId = 1L)
    graft.llm.TextAnalysis.noveltyRetract(spark, path, removed,
      "text", "doc_id", retractionId = 1L)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === truth)
    graft.llm.TextAnalysis.noveltyCompact(spark, path)
    assert(rows(graft.llm.TextAnalysis.noveltyScoresIndexed(spark, path)) === truth,
      "the physical fold must preserve the survivor-corpus scores exactly")
  }
}

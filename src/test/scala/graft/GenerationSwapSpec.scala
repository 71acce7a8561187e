package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-atomicity of the index compaction swap (r9 verdict #1): the
  * generation mechanism must leave a COMPLETE, readable index at every
  * kill point — before the staged write, after it, after the commit
  * marker, mid-GC — for both families (IVF vectors, LSH buckets), plus
  * the grace-period retention, the vacuum reclaim, and the rebuild reset.
  */
class GenerationSwapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def exists(p: String) = fsOf(p).exists(new org.apache.hadoop.fs.Path(p))

  test("IVF compaction kill points: readers resolve a complete index at every instant") {
    import graft.ops.Generations
    val e = core.Engine.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val path = java.nio.file.Files.createTempDirectory("graft-genswap").toString
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(path)
    val split = e.agg((max(col("id")) * lit(0.8)).cast("long")).head().getLong(0)
    graft.llm.Similarity.ivfWriteIndex(e.where(col("id") < split), "v", "id",
      nCells = 4, lloydRounds = 1, path = path)
    graft.llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("id") >= split), "v", "id", batchId = 1L)
    def contents() = graft.llm.Similarity.ivfVectors(spark, path)
      .select(col("id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    def servable(): Unit = {
      assert(graft.llm.Similarity.ivfKnnPruned(spark, path,
        e.where(col("id") < 5), "v", "id", k = 3, nProbe = 2).count() > 0,
        "pruned ANN reads must work at every kill point")
    }
    val full = contents()
    assert(full.size.toLong === e.count())

    // KILL POINT A — staged generation fully written, commit NEVER lands
    // (the crash that used to leave `vectors/` deleted): readers still
    // resolve the OLD generation, untouched.
    val (staged, gen) = Generations.stage(fs, root, "vectors")
    graft.llm.Similarity.ivfVectors(spark, path)
      .select(col("id"), col("v"), col("cell"))
      .repartition(col("cell")).withColumn("__batch", lit(0L))
      .write.mode("overwrite").partitionBy("cell", "__batch").parquet(staged.toString)
    assert(Generations.currentDir(fs, root, "vectors").getName === "vectors",
      "an uncommitted staged generation must be invisible to readers")
    assert(contents() === full); servable()

    // a RETRY after that crash re-stages the same number cleanly
    val (staged2, gen2) = Generations.stage(fs, root, "vectors")
    assert(gen2 === gen, "retry must reuse the uncommitted generation number")
    graft.llm.Similarity.ivfVectors(spark, path)
      .select(col("id"), col("v"), col("cell"))
      .repartition(col("cell")).withColumn("__batch", lit(0L))
      .write.mode("overwrite").partitionBy("cell", "__batch").parquet(staged2.toString)

    // KILL POINT B — the commit marker lands (the one atomic instant):
    // readers flip to the new generation; the old one is STILL on disk
    // for in-flight readers (grace period).
    Generations.commit(fs, root, "vectors", gen2)
    assert(Generations.currentDir(fs, root, "vectors").getName === s"vectors_gen=$gen2")
    assert(contents() === full); servable()
    assert(exists(s"$path/vectors"),
      "the superseded generation must survive the commit (grace period)")

    // KILL POINT C — GC: current + previous retained, so a crash mid-GC
    // can only leak a directory, never orphan readers.
    Generations.gcOld(fs, root, "vectors")
    assert(exists(s"$path/vectors"), "gcOld keeps the previous generation")
    assert(contents() === full); servable()

    // a real end-to-end compaction on top: gen2 current, gen0 dropped
    // (it is no longer current OR previous), gen1 retained
    graft.llm.Similarity.ivfCompact(spark, path)
    assert(Generations.currentDir(fs, root, "vectors").getName === "vectors_gen=2")
    assert(!exists(s"$path/vectors"), "two generations back is GC'd")
    assert(exists(s"$path/vectors_gen=1"), "previous generation retained")
    assert(contents() === full); servable()

    // vacuum = the explicit reclaim: only the current generation remains
    graft.llm.Similarity.ivfVacuum(spark, path)
    assert(!exists(s"$path/vectors_gen=1"))
    assert(contents() === full); servable()

    // rebuild at the same path resets generation state: the fresh
    // `vectors/` must not stay shadowed by the stale committed gen=2
    graft.llm.Similarity.ivfWriteIndex(e.where(col("id") < split), "v", "id",
      nCells = 4, lloydRounds = 1, path = path)
    assert(Generations.currentDir(fs, root, "vectors").getName === "vectors")
    assert(contents().size.toLong === e.where(col("id") < split).count(),
      "rebuild must serve only the fresh build")
  }

  test("LSH compactIndex swaps buckets generations atomically; vacuumIndex reclaims") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-genswap-lsh").toString
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t2 = "entirely novel text that matches nothing in the corpus at all"
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")
    graft.llm.Dedup.ingestAgainstIndex(spark, idx, 0L, batch((1L, t1)), "text", "id",
      shingleN = 3, k = 8, bands = 4)
    graft.llm.Dedup.ingestAgainstIndex(spark, idx, 1L, batch((2L, t2)), "text", "id",
      shingleN = 3, k = 8, bands = 4)
    def pairsAgainst(text: String) =
      graft.llm.Dedup.minhashPairsAgainstIndex(spark, idx, batch((99L, text)),
        "text", "id", shingleN = 3, k = 8, bands = 4, jaccardThreshold = 0.8)
    assert(pairsAgainst(t1).count() === 1)

    graft.llm.Dedup.compactIndex(spark, idx, maxBucketSize = 100)
    // commit flipped the resolved dir; the old one is retained (grace)
    assert(graft.llm.Dedup.bucketsDir(spark, idx).endsWith("buckets_gen=1"))
    assert(exists(s"$idx/buckets"), "superseded buckets generation retained")
    // small-files fold (round 10): BOTH halves collapse their per-batch
    // fragments into one __batch=0 — a long-running ingest stream no
    // longer accumulates a directory per batch forever
    for (half <- Seq(graft.llm.Dedup.bucketsDir(spark, idx),
                     graft.llm.Dedup.sigsDir(spark, idx))) {
      assert(half.contains("_gen=1"), s"$half should resolve to generation 1")
      assert(spark.read.parquet(half).select(col("__batch").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq === Seq(0L),
        s"compaction must fold $half into __batch=0")
    }
    // reads and appends resolve the new generation
    assert(pairsAgainst(t1).count() === 1)
    graft.llm.Dedup.ingestAgainstIndex(spark, idx, 2L,
      batch((3L, "completely different corpus content about spark engines")),
      "text", "id", shingleN = 3, k = 8, bands = 4)
    assert(spark.read.parquet(graft.llm.Dedup.bucketsDir(spark, idx))
      .select(col("id")).distinct().count() === 3,
      "post-compaction appends must land in the current generation")

    graft.llm.Dedup.vacuumIndex(spark, idx)
    assert(!exists(s"$idx/buckets"), "vacuum reclaims superseded generations")
    assert(pairsAgainst(t1).count() === 1)

    // rebuild via minhashIndexWrite resets the generation state
    graft.llm.Dedup.minhashIndexWrite(batch((10L, t1)), "text", "id", idx,
      shingleN = 3, k = 8, bands = 4)
    assert(graft.llm.Dedup.bucketsDir(spark, idx).endsWith("/buckets"),
      "a rebuilt index must not stay shadowed by a stale committed generation")
    assert(pairsAgainst(t1).count() === 1)
  }
}

/** The persisted simhash index (round 10) — the third index family,
  * riding the shared lifecycle invariants: build with banding pinned in
  * meta/, query-against-index with bucket-carried signatures, replay-
  * idempotent appends, the shared generation-swapped compaction, loud
  * layout refusals.
  */
class SimhashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("simhash index: build, query, append, replay, shared compaction") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t2 = "entirely novel text that matches nothing in the corpus at all"
    val t3 = "completely different corpus content about spark engines"
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-simidx-spec").toString
    graft.llm.Dedup.simhashIndexWrite(batch((1L, t1), (2L, t3)), "text", "id", path,
      bits = 16, maxHamming = 2)
    def hits(text: String) =
      graft.llm.Dedup.simhashPairsAgainstIndex(spark, path, batch((99L, text)), "text", "id")
        .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    // identical text → hamming 0 against its corpus twin only
    assert(hits(t1) === Set((1L, 0)))
    assert(hits(t2) === Set.empty[(Long, Int)])

    // append batch 1; a replayed append leaves the index row-identical
    graft.llm.Dedup.simhashAppendBatch(spark, path, 1L, batch((3L, t2)), "text", "id")
    def snapshot() = spark.read.parquet(graft.llm.Dedup.bucketsDir(spark, path))
      .select(col("id"), col("band"), col("key"), col("__batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val after1 = snapshot()
    graft.llm.Dedup.simhashAppendBatch(spark, path, 1L, batch((3L, t2)), "text", "id")
    assert(snapshot() === after1, "replayed append must be idempotent")
    // the appended doc is now part of the served corpus
    assert(hits(t2) === Set((3L, 0)))

    // shared compaction: generation swap + fold to __batch=0, queries
    // and appends keep working against the new generation
    val preCompact = hits(t1) ++ hits(t2)
    graft.llm.Dedup.compactIndex(spark, path, maxBucketSize = 100)
    assert(graft.llm.Dedup.bucketsDir(spark, path).endsWith("buckets_gen=1"))
    assert(spark.read.parquet(graft.llm.Dedup.bucketsDir(spark, path))
      .select(col("__batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
    assert(hits(t1) ++ hits(t2) === preCompact, "compaction must not change hits")
    graft.llm.Dedup.simhashAppendBatch(spark, path, 2L, batch((4L, "more spark text here")),
      "text", "id")
    assert(spark.read.parquet(graft.llm.Dedup.bucketsDir(spark, path))
      .select(col("id")).distinct().count() === 4)

    // loud refusals: batch 0 is reserved; a missing index refuses
    assert(intercept[IllegalArgumentException] {
      graft.llm.Dedup.simhashAppendBatch(spark, path, 0L, batch((9L, t1)), "text", "id")
    }.getMessage.contains("batchId must be > 0"))
    val empty = java.nio.file.Files.createTempDirectory("graft-simidx-none").toString
    intercept[Exception] { // no meta/ → analysis error before any write
      graft.llm.Dedup.simhashAppendBatch(spark, empty, 1L, batch((9L, t1)), "text", "id")
    }

    // the write-time cap drops the degenerate bucket but keeps the rest
    // (shared cap semantics): the saturated text finds nothing, a normal
    // corpus doc still matches
    val dup = (1L to 30L).map(i => (i, "identical duplicated sentence content")) :+
      ((100L, t3))
    val capped = java.nio.file.Files.createTempDirectory("graft-simidx-cap").toString
    graft.llm.Dedup.simhashIndexWrite(dup.toDF("id", "text"), "text", "id", capped,
      bits = 16, maxHamming = 2, maxBucketSize = 10)
    assert(graft.llm.Dedup.simhashPairsAgainstIndex(spark, capped,
      batch((99L, "identical duplicated sentence content")), "text", "id").count() === 0,
      "an over-wide bucket must be dropped at write time")
    assert(graft.llm.Dedup.simhashPairsAgainstIndex(spark, capped,
      batch((99L, t3)), "text", "id")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet === Set((100L, 0)),
      "under-cap buckets must survive the write-time cap")
  }
}

/** The per-batch centroid-drift metric (r9 verdict #2): an appended batch
  * drawn from the indexed distribution must NOT flag; a batch the frozen
  * centroids never saw must. The sidecar is replay-idempotent like the
  * data it describes.
  */
class IvfDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("exactGroupStats: two-pass cumsum equals the naive per-batch window (r15)") {
    import spark.implicits._
    // ties, duplicate values, uneven batch sizes — the p95 edge cases
    val rows = (0L until 3000L).map { i =>
      val b = i % 3L
      (b, (i * 7919L) % (50L + b * 400L)) // different value spreads per batch
    }
    val d = rows.toDF("__batch", "__v")
    val got = graft.llm.Similarity.exactGroupStats(d, "mean", "p95")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // the naive formulation (what the distributed form must equal)
    val naive = rows.groupBy(_._1).toSeq.map { case (b, vs0) =>
      val vs = vs0.map(_._2).sorted
      val n = vs.size
      val p95 = vs(math.ceil(n * 0.95).toInt - 1).toDouble
      (b, n.toLong, p95)
    }.sortBy(_._1)
    got.zip(naive).foreach { case ((gb, gn, gm, gp), (nb, nn, np)) =>
      assert(gb === nb && gn === nn)
      assert(gp === np, s"batch $gb p95: got $gp want $np")
    }
  }

  test("in-distribution append stays unflagged; a shifted batch flags") {
    val e = core.Engine.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val path = java.nio.file.Files.createTempDirectory("graft-drift-spec").toString
    val s80 = e.agg((max(col("id")) * lit(0.8)).cast("long")).head().getLong(0)
    val s90 = e.agg((max(col("id")) * lit(0.9)).cast("long")).head().getLong(0)
    graft.llm.Similarity.ivfWriteIndex(e.where(col("id") < s80), "v", "id",
      nCells = 4, lloydRounds = 1, path = path)
    val inDist = e.where(col("id") >= s80 && col("id") < s90)
    graft.llm.Similarity.ivfAppendBatch(spark, path, inDist, "v", "id", batchId = 1L)
    graft.llm.Similarity.ivfAppendBatch(spark, path,
      e.where(col("id") >= s90)
        .select(col("id"), transform(col("v"), x => x + lit(4.0f)).as("v")),
      "v", "id", batchId = 2L)
    def stats() = graft.llm.Similarity.ivfDriftStats(spark, path, flagRatio = 2.0)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(4), r.getBoolean(6)))).toMap
    val d = stats()
    assert(d.keySet === Set(0L, 1L, 2L))
    assert(d(0L)._2 === 1.0 && !d(0L)._3, "the baseline is its own reference")
    assert(!d(1L)._3,
      s"an in-distribution batch must not flag (mean_ratio ${d(1L)._2})")
    assert(d(1L)._2 < 2.0)
    assert(d(2L)._3, s"a shifted batch must flag (mean_ratio ${d(2L)._2})")
    // the sidecar is replay-idempotent: re-appending batch 1 rewrites
    // exactly its own row with identical values
    graft.llm.Similarity.ivfAppendBatch(spark, path, inDist, "v", "id", batchId = 1L)
    assert(stats() === d, "a replayed append must leave drift stats unchanged")
    // and a compaction re-anchors the baseline on the whole corpus:
    // batch 0 is then the only row, trivially unflagged
    graft.llm.Similarity.ivfCompact(spark, path)
    val post = stats()
    assert(post.keySet === Set(0L) && !post(0L)._3)
    assert(post(0L)._1 === e.count(), "post-compaction baseline covers the whole corpus")
  }

  test("ivfMaintain: drifted rebuilds (atomic geometry swap); fragmented compacts; healthy no-ops") {
    import graft.llm.Similarity
    val e = core.Engine.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val s80 = e.agg((max(col("id")) * lit(0.8)).cast("long")).head().getLong(0)
    val queries = e.where(col("id") < 5L)

    // CASE 1: a drifted append → the policy rebuilds the geometry
    val p1 = java.nio.file.Files.createTempDirectory("graft-maintain-drift").toString
    Similarity.ivfWriteIndex(e.where(col("id") < s80), "v", "id",
      nCells = 4, lloydRounds = 1, path = p1)
    Similarity.ivfAppendBatch(spark, p1,
      e.where(col("id") >= s80)
        .select(col("id"), transform(col("v"), x => x + lit(4.0f)).as("v")),
      "v", "id", batchId = 1L)
    assert(Similarity.ivfMaintain(spark, p1) === "rebuild")
    // rebuilt: one batch, re-anchored unflagged baseline over everything
    assert(Similarity.ivfLiveBatches(spark, p1) === Seq(0L))
    val post = Similarity.ivfDriftStats(spark, p1, flagRatio = 2.0).collect()
    assert(post.length === 1 && !post.head.getBoolean(6))
    assert(post.head.getLong(1) === e.count(), "rebuild re-assigns the whole corpus")
    // the new centroids live INSIDE the committed generation (one-marker
    // swap of geometry + assignments) and the read path resolves them:
    // full-probe recall over the rebuilt index is exactly 1
    val fs = new org.apache.hadoop.fs.Path(p1)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Similarity.ivfVectorsDir(spark, p1), "_centroids")))
    assert(Similarity.ivfCentroids(spark, p1).count() === 4L)
    val recall = Similarity.ivfRecallCurve(spark, p1, queries, "v", "id",
      k = 5, probes = Seq(4)).head().getDouble(3)
    assert(recall === 1.0, s"full-probe recall after rebuild: $recall")
    // maintain again: the rebuilt index is healthy → no-op
    assert(Similarity.ivfMaintain(spark, p1) === "none")

    // CASE 2: in-distribution appends → compact only when fragmented
    val p2 = java.nio.file.Files.createTempDirectory("graft-maintain-frag").toString
    Similarity.ivfWriteIndex(e.where(col("id") < s80), "v", "id",
      nCells = 4, lloydRounds = 1, path = p2)
    Similarity.ivfAppendBatch(spark, p2, e.where(col("id") >= s80), "v", "id",
      batchId = 1L)
    // a composed PQ code table rides the index; maintain must heal it
    // through the swap (the compact collapses its recorded batch set)
    graft.llm.Quantization.ivfPqWriteCodes(spark, p2, m = 8, k = 4)
    assert(Similarity.ivfMaintain(spark, p2, maxLiveBatches = 8) === "none")
    assert(Similarity.ivfMaintain(spark, p2, maxLiveBatches = 1) === "compact")
    assert(Similarity.ivfLiveBatches(spark, p2) === Seq(0L))
    // compaction carried the plain-layout centroids forward in-generation
    assert(Similarity.ivfCentroids(spark, p2).count() === 4L)
    // and the compressed read path is live again without a manual
    // re-encode — before the heal, ivfPqKnn would refuse on the stale
    // batch list (IvfPqSpec pins that refusal)
    val pq = graft.llm.Quantization.ivfPqKnn(spark, p2, queries, "v", "id",
      kNN = 3, nProbe = 4, shortlist = 10)
    assert(pq.count() > 0)
  }
}

/** Corpus versioning over the generation mechanism: publishes are
  * atomic version flips, history stays readable for pinned reproduction
  * until explicitly vacuumed, rollback rolls FORWARD.
  */
class CorpusVersionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.ops.CorpusVersions

  test("publish/read/pin/rollback/vacuum lifecycle") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-corpusver").toString
    val v1df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val v2df = Seq((1L, "alpha"), (2L, "beta PATCHED"), (3L, "gamma")).toDF("id", "text")

    assert(CorpusVersions.publish(spark, path, v1df) === 1L)
    assert(CorpusVersions.read(spark, path).count() === 2L)
    assert(CorpusVersions.publish(spark, path, v2df) === 2L)
    // current flips to v2; the pinned v1 read is byte-stable
    assert(CorpusVersions.read(spark, path).count() === 3L)
    assert(CorpusVersions.readVersion(spark, path, 1L)
      .orderBy(col("id")).as[(Long, String)].collect().toSeq ===
      Seq((1L, "alpha"), (2L, "beta")))
    val hist = CorpusVersions.history(spark, path)
      .orderBy(col("version")).as[(Long, Boolean, String)].collect()
    assert(hist.map(h => (h._1, h._2)).toSeq === Seq((1L, false), (2L, true)))

    // rollback ROLLS FORWARD: v3 serves v1's content, history grows
    assert(CorpusVersions.rollback(spark, path, 1L) === 3L)
    assert(CorpusVersions.read(spark, path)
      .orderBy(col("id")).as[(Long, String)].collect().toSeq ===
      Seq((1L, "alpha"), (2L, "beta")))

    // vacuum keeps the last 2 (v2, v3); the retired v1 refuses loudly
    CorpusVersions.vacuumVersions(spark, path, keepLast = 2)
    assert(CorpusVersions.history(spark, path)
      .select(col("version")).as[Long].collect().toSeq === Seq(2L, 3L))
    val gone = intercept[IllegalArgumentException] {
      CorpusVersions.readVersion(spark, path, 1L)
    }
    assert(gone.getMessage.contains("no committed version"))
    // current still serves after the vacuum
    assert(CorpusVersions.read(spark, path).count() === 2L)

    // an unpublished corpus reads loudly, not emptily
    intercept[Exception] {
      CorpusVersions.read(spark, java.nio.file.Files
        .createTempDirectory("graft-corpusver-empty").toString).collect()
    }
  }

  test("published sidecars ride the version: pinned reads prune, and bite") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-corpusver-side").toString
    // 200 rows range-clustered into 8 files → per-file key ranges are
    // tight, so a narrow range must NOT touch most files
    val df = spark.range(0, 200).select(col("id"), (col("id") * 2).as("k"),
      concat(lit("doc "), col("id")).as("text"))
      .repartitionByRange(8, col("id"))
    assert(CorpusVersions.publish(spark, path, df,
      statsCols = Seq("id"), bloomCols = Seq("k")) === 1L)
    // a second version, published WITHOUT sidecars — the pinned v1 read
    // must keep serving v1's rows through v1's OWN sidecar
    CorpusVersions.publish(spark, path, df.where(col("id") < 50L))

    val pruned = CorpusVersions.readVersionPruned(spark, path, 1L, "id",
      lit(10L), lit(30L))
    assert(pruned.orderBy(col("id")).select(col("id")).as[Long].collect().toSeq
      === (10L to 30L))
    val v1files = CorpusVersions.readVersion(spark, path, 1L).inputFiles.length
    assert(v1files === 8, s"expected 8 clustered files, got $v1files")
    assert(pruned.inputFiles.length < v1files,
      s"manifest pruning did not bite: ${pruned.inputFiles.length} of $v1files files")
    // the sidecars are INSIDE the generation dir (atomic with the data)
    // and invisible to the snapshot scan
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/data_gen=1/_graft_manifest")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/data_gen=1/_graft_manifest_bloom_k")))
    assert(CorpusVersions.readVersion(spark, path, 1L).count() === 200L)

    // Bloom point read on the pinned version: exact rows, fewer files
    val pt = CorpusVersions.readVersionPoint(spark, path, 1L, "k", lit(100L))
    assert(pt.select(col("id")).as[Long].collect().toSeq === Seq(50L))
    assert(pt.inputFiles.length < v1files,
      s"bloom pruning did not bite: ${pt.inputFiles.length} of $v1files files")

    // a version published WITHOUT sidecars refuses both skipping reads
    val bare = intercept[IllegalArgumentException] {
      CorpusVersions.readVersionPruned(spark, path, 2L, "id", lit(0L), lit(1L))
    }
    assert(bare.getMessage.contains("sidecar"))
    intercept[IllegalArgumentException] {
      CorpusVersions.readVersionPoint(spark, path, 2L, "k", lit(0L))
    }
  }
}

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

/** The per-batch centroid-drift metric (r9 verdict #2): an appended batch
  * drawn from the indexed distribution must NOT flag; a batch the frozen
  * centroids never saw must. The sidecar is replay-idempotent like the
  * data it describes.
  */
class IvfDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

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
}

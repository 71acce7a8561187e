package graft

import graft.llm.Shards
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K22 — training-shard export laws: the distributed two-pass shard
  * assignment equals the naive global window, re-running the export is
  * byte-identical (the reproducible-run contract), a different epoch
  * reshuffles without changing the selection, and mounting a shard is a
  * partition-pruned read of exactly its rows.
  */
class ShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs() = (0L until 500L).map { i =>
    (i, s"src${i % 7}", ("w" + (i % 13) + " ") * ((i % 29 + 1).toInt))
  }.toDF("doc_id", "source", "text")

  test("two-pass shard assignment equals the naive global window") {
    val d = docs().withColumn("n_tokens",
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .select(col("doc_id"), col("n_tokens"))
    val got = Shards.assignShards(d, "doc_id", "n_tokens",
        shardTokens = 300L, epoch = 7L, numPartitions = 8)
      .select(col("doc_id"), col("shard")).as[(Long, Long)].collect().toMap
    // the naive formulation: one global window over the same order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(concat_ws(":", lit(7L), col("doc_id").cast("string"))), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = d.withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("shard", expr("(__cum - n_tokens) div 300L"))
      .select(col("doc_id"), col("shard")).as[(Long, Long)].collect().toMap
    assert(got === want)
    // every doc assigned exactly once
    assert(got.size === 500)
  }

  test("export re-run is byte-identical; a new epoch reshuffles, not reselects") {
    val d = docs()
    val targets = Map("src0" -> 0.3, "src1" -> 0.3, "src2" -> 0.4)
    val p1 = java.nio.file.Files.createTempDirectory("graft-shards-a").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft-shards-b").toString
    val (v1, m1) = Shards.exportShards(spark, p1, d, "text", "doc_id", "source",
      targets, maxVocab = 50, shardTokens = 400L, epoch = 1L)
    val (v2, m2) = Shards.exportShards(spark, p2, d, "text", "doc_id", "source",
      targets, maxVocab = 50, shardTokens = 400L, epoch = 1L)
    def rows(p: String, v: Long) =
      graft.ops.CorpusVersions.readVersion(spark, p, v)
        .select(col("doc"), col("shard"), col("n_tokens"),
          concat_ws(" ", col("ids")).as("ids"))
        .as[(Long, Long, Long, String)].collect().toSet
    assert(rows(p1, v1) === rows(p2, v2), "same (corpus, epoch) must export identically")
    assert(m1.collect().toSeq === m2.collect().toSeq)
    // a different epoch keeps the selection and totals, moves boundaries
    val p3 = java.nio.file.Files.createTempDirectory("graft-shards-c").toString
    val (v3, m3) = Shards.exportShards(spark, p3, d, "text", "doc_id", "source",
      targets, maxVocab = 50, shardTokens = 400L, epoch = 2L)
    val docs1 = rows(p1, v1).map(_._1)
    val docs3 = rows(p3, v3).map(_._1)
    assert(docs1 === docs3, "epoch must not change the selected docs")
    val tok1 = m1.agg(sum(col("n_tokens"))).head().getLong(0)
    val tok3 = m3.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(tok1 === tok3, "epoch must not change the token mass")
    val b1 = m1.select("shard", "first_doc").as[(Long, Long)].collect().toSet
    val b3 = m3.select("shard", "first_doc").as[(Long, Long)].collect().toSet
    assert(b1 !== b3, "a new epoch should move shard boundaries")
  }

  test("shardRoutes is a bijection onto 0..n-1 under Spark's own hash partitioning") {
    val r = Shards.shardRoutes(spark, 37)
    assert(r.keySet === (0L until 37L).toSet, "every partition index needs a salt")
    val landed = r.toSeq.toDF("p", "salt")
      .repartition(37, col("salt"))
      .withColumn("pid", spark_partition_id().cast("long"))
    assert(landed.where(col("p") =!= col("pid")).count() === 0L,
      "each salt must land exactly on its partition index")
  }

  test("published shard files are shard-PURE: every file holds exactly one shard") {
    val d = docs()
    val p = java.nio.file.Files.createTempDirectory("graft-shards-pure").toString
    val (v, m) = Shards.exportShards(spark, p, d, "text", "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.5), maxVocab = 50,
      shardTokens = 300L, epoch = 1L)
    val byFile = graft.ops.CorpusVersions.readVersion(spark, p, v)
      .groupBy(input_file_name().as("f"))
      .agg(countDistinct(col("shard")).as("n"))
    assert(byFile.where(col("n") > 1L).count() === 0L,
      "a published data file must never span shards")
    // and the sidecar agrees: min==max per manifest row, so a pruned
    // mount of shard k admits only shard-k files
    val manifest = graft.ops.Manifest.read(spark,
      graft.ops.Generations.genDir(new org.apache.hadoop.fs.Path(p), "data", v).toString)
    assert(manifest.where(col("min_shard") =!= col("max_shard")).count() === 0L,
      "manifest stats must pin one shard per file")
    assert(manifest.select("min_shard").distinct().count() === m.count(),
      "every shard must own at least one file")
  }

  test("BPE export: byte-identical re-run; n_tokens are the subword counts") {
    val d = docs()
    val targets = Map("src0" -> 0.3, "src1" -> 0.3, "src2" -> 0.4)
    val p1 = java.nio.file.Files.createTempDirectory("graft-shards-bpe-a").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft-shards-bpe-b").toString
    val (v1, m1) = Shards.exportShardsBpe(spark, p1, d, "text", "doc_id", "source",
      targets, numMerges = 10, maxWordTypes = 1000, shardTokens = 400L, epoch = 1L)
    val (v2, m2) = Shards.exportShardsBpe(spark, p2, d, "text", "doc_id", "source",
      targets, numMerges = 10, maxWordTypes = 1000, shardTokens = 400L, epoch = 1L)
    def rows(p: String, v: Long) =
      graft.ops.CorpusVersions.readVersion(spark, p, v)
        .select(col("doc"), col("shard"), col("n_tokens"), col("ids"))
        .as[(Long, Long, Long, String)].collect().toSet
    assert(rows(p1, v1) === rows(p2, v2),
      "same (corpus, epoch) must BPE-export identically")
    assert(m1.collect().toSeq === m2.collect().toSeq)
    // the packed token counts are the SUBWORD counts of the standalone
    // K18b encode over the same mixed corpus — the budget a trainer's
    // context window consumes
    val mixed = graft.llm.Mixing.targetMix(d, "source", "doc_id", targets)
    val model = graft.llm.Bpe.train(mixed, "text", numMerges = 10, maxWordTypes = 1000)
    val want = graft.llm.Bpe.encode(mixed, model, "text", "doc_id")
      .select(col("doc"), col("n_subwords")).as[(Long, Long)].collect().toMap
    val got = rows(p1, v1).map(r => (r._1, r._3)).toMap
    assert(got === want, "shard n_tokens must equal the BPE subword counts")
    // a caller-trained model routes through the OOV-safe encodeAny path
    val p3 = java.nio.file.Files.createTempDirectory("graft-shards-bpe-c").toString
    val full = graft.llm.Bpe.train(d, "text", numMerges = 10, maxWordTypes = 1000)
    val (v3, _) = Shards.exportShardsBpe(spark, p3, d, "text", "doc_id", "source",
      targets, numMerges = 10, maxWordTypes = 1000, shardTokens = 400L,
      epoch = 1L, model = Some(full))
    assert(rows(p3, v3).nonEmpty)
  }

  test("mounting one shard is a partition-pruned read of exactly its rows") {
    val d = docs()
    val p = java.nio.file.Files.createTempDirectory("graft-shards-read").toString
    val (v, m) = Shards.exportShards(spark, p, d, "text", "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.5), maxVocab = 50,
      shardTokens = 300L, epoch = 1L)
    val manifest = m.select("shard", "n_docs").as[(Long, Long)].collect().toMap
    val one = graft.ops.CorpusVersions.readVersionPruned(spark, p, v, "shard", lit(1L), lit(1L))
    assert(one.count() === manifest(1L))
    assert(one.select("shard").distinct().as[Long].collect().toSeq === Seq(1L))
  }
}

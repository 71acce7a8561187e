package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K22 — the TERMINAL export step of the curation pipeline (round 15,
  * the r14 verdict's #4): everything upstream selects and scores; a
  * trainer mounts a SHARD SET — epoch-shuffled, fixed-token-count
  * shards with a manifest recording exactly what landed where. This
  * composes the existing pieces (k12 mix → k18 encode → deterministic
  * shuffle → token-budget packing → x4 pinned version) into that one
  * artifact.
  *
  * Determinism is the whole point: the epoch shuffle is
  * `md5(epoch:doc_id)` order — no RNG state, so re-running the export
  * for the same (corpus version, epoch) is byte-identical (the
  * reproducible-training-run contract x4 pins), and a different epoch
  * reshuffles without touching the selection.
  *
  * Scale shape of the shard assignment: a naive
  * `sum(tokens) over (order by shuffle_key)` is ONE global window — a
  * single-partition sort at 100 TB. This uses the [[Classifier.binaryAuc]]
  * two-pass discipline instead: range-partition by the shuffle key and
  * FREEZE the layout (localCheckpoint — re-evaluation could rebalance
  * partitions between the offset pass and the window pass), collect the
  * per-partition token totals (bounded by the partition count), then a
  * partition-LOCAL cumulative sum plus the broadcast offsets. Exact
  * long arithmetic end to end, fully parallel.
  */
object Shards {

  /** Assign every row a shard id: rows are ordered by the deterministic
    * epoch shuffle key and packed so each shard holds ~`shardTokens`
    * tokens (a row lands in the shard its STARTING offset falls into —
    * the packSequences law). Output: input columns + `__okey` (the
    * shuffle key) + `shard`.
    */
  def assignShards(docs: DataFrame, idCol: String, tokensCol: String,
                   shardTokens: Long, epoch: Long,
                   numPartitions: Int = 0): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1: $shardTokens")
    val keyed = docs.withColumn("__okey",
      md5(concat_ws(":", lit(epoch), col(idCol).cast("string"))))
    // the shared frozen two-pass cumsum (graft.ops.Prefix, r15 review)
    graft.ops.Prefix.frozenRangeCumSum(keyed,
        rangeCols = Seq(col("__okey"), col(idCol)), groupCols = Nil,
        orderCols = Seq(col("__okey"), col(idCol)),
        valueCol = col(tokensCol), cumName = "__cum",
        numPartitions = numPartitions)
      .withColumn("shard",
        expr(s"(__cum - $tokensCol) div ${shardTokens}L"))
      .drop("__cum", "__pid")
  }

  /** The shard MANIFEST — what a trainer actually mounts: one row per
    * shard with its document count, token mass, and shuffle-order
    * boundaries (first/last doc id in epoch order). Exact longs; the
    * boundaries pin the packing decision itself, not just the totals.
    */
  def shardManifest(assigned: DataFrame, idCol: String,
                    tokensCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        min(struct(col("__okey"), col(idCol))).getField(idCol).as("first_doc"),
        max(struct(col("__okey"), col(idCol))).getField(idCol).as("last_doc"))
      .orderBy(col("shard"))

  /** The COMPOSED export: target-mix the corpus (k12), encode through a
    * frequency vocabulary (k18), epoch-shuffle + pack into
    * fixed-token-count shards, and PUBLISH the shard set with its
    * manifest as one pinned corpus version (x4) — data and manifest
    * commit under one marker, so a training run pinning the returned
    * version reads exactly this shard set forever. Returns (version,
    * manifest).
    *
    * The published rows carry (doc, shard, n_tokens, ids) — the id
    * sequences a loader streams — partitioned by `shard`, so mounting
    * shard k is a partition-pruned read.
    */
  def exportShards(spark: SparkSession, outPath: String, docs: DataFrame,
                   textCol: String, idCol: String, stratumCol: String,
                   targets: Map[String, Double], maxVocab: Int,
                   shardTokens: Long, epoch: Long): (Long, DataFrame) = {
    val mixed = Mixing.targetMix(docs, stratumCol, idCol, targets)
    val vocab = TextAnalysis.buildVocab(mixed, textCol, maxVocab)
    val encoded = TextAnalysis.encodeTokens(mixed, vocab, textCol, idCol)
    val assigned = assignShards(encoded, "doc", "n_tokens", shardTokens, epoch)
      .select(col("doc"), col("__okey"), col("shard"), col("n_tokens"), col("ids"))
    val manifest = shardManifest(assigned, "doc", "n_tokens")
      .localCheckpoint(true) // survives the publish's write
    val version = graft.ops.CorpusVersions.publish(spark, outPath,
      assigned.drop("__okey")
        // RANGE partition (r15 review): hash partitioning can land two
        // shards in one writer's file, so a pruned mount of shard k
        // would scan both through the residual filter — range gives
        // shard-PURE files and tight min/max manifest stats
        .repartitionByRange(col("shard"))
        .sortWithinPartitions(col("shard"), col("doc")),
      statsCols = Seq("shard"))
    (version, manifest)
  }
}

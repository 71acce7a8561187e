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

  /** Pack an already-ENCODED corpus — rows of (doc, n_tokens, ids) from
    * ANY tokenizer — into epoch-shuffled fixed-token-count shards and
    * PUBLISH the shard set with its manifest as one pinned corpus
    * version (x4): data and manifest commit under one marker, so a
    * training run pinning the returned version reads exactly this shard
    * set forever. Returns (version, manifest).
    *
    * The encoder is a PARAMETER of the composed exports below (r16, the
    * r15 verdict's #1): the terminal artifact must carry whatever id
    * space the trainer mounts — the word-frequency vocabulary
    * ([[exportShards]]) or the K18 BPE subwords ([[exportShardsBpe]])
    * — and the packing/publish law is identical for both.
    *
    * The published rows carry (doc, shard, n_tokens, ids) with
    * GUARANTEED shard-pure files (r16, the r15 verdict's #6): the old
    * implicit `repartitionByRange` used the session shuffle-partition
    * count — several shards routinely landed in one file — and even an
    * explicit count only makes purity typical, not guaranteed (range
    * bounds come from row sampling; a doc-count-skewed shard can pull a
    * neighbor into its partition). Instead each shard is ROUTED to its
    * own partition bijectively ([[shardRoutes]]), so every output file
    * holds exactly one shard and a pruned mount of shard k reads only
    * files whose manifest stats are min==max==k.
    */
  def exportEncoded(spark: SparkSession, outPath: String, encoded: DataFrame,
                    shardTokens: Long, epoch: Long): (Long, DataFrame) = {
    import spark.implicits._
    val assigned = assignShards(encoded, "doc", "n_tokens", shardTokens, epoch)
      .select(col("doc"), col("__okey"), col("shard"), col("n_tokens"), col("ids"))
    val manifest = shardManifest(assigned, "doc", "n_tokens")
      .localCheckpoint(true) // survives the publish's write
    // shard ids can be SPARSE (a doc longer than shardTokens leaves a
    // hole), so route the actual ids from the manifest, rank-indexed
    val shardIds = manifest.select(col("shard")).as[Long].collect()
    val routeOf = shardRoutes(spark, shardIds.length)
    val routes = shardIds.zipWithIndex.toSeq
      .map { case (s, i) => (s, routeOf(i)) }.toDF("shard", "__route")
    val version = graft.ops.CorpusVersions.publish(spark, outPath,
      assigned.drop("__okey")
        .join(broadcast(routes), Seq("shard"))
        .repartition(shardIds.length, col("__route"))
        .sortWithinPartitions(col("shard"), col("doc"))
        .drop("__route"),
      statsCols = Seq("shard"))
    (version, manifest)
  }

  /** A BIJECTIVE partition routing: for every partition index
    * p < numShards, a Long salt whose hash partitioning lands exactly
    * on p — `pmod(hash(salt_p), numShards) == p`, the identical
    * Murmur3(seed 42) + pmod expression `repartition(n, col)` plans.
    * Repartitioning on the salt column therefore puts each shard in
    * EXACTLY its own output partition — purity by construction, no
    * range-sampling luck. Cost: a coupon-collector scan over
    * `spark.range` (expected O(n·ln n) candidate hashes) and an
    * n-entry driver map — both bounded by the SHARD count, never the
    * corpus.
    */
  // r20: the routing table is a PURE function of numShards (the
  // coupon-collector scan is deterministic — min id per partition over
  // a fixed candidate order), so exports of the same shard count reuse
  // it instead of re-running the candidate-hash job every call. Not a
  // result cache: no input data is involved, it is an arithmetic table
  // like a codegen cache.
  private val routesMemo =
    new java.util.concurrent.ConcurrentHashMap[Int, Map[Long, Long]]()

  private[graft] def shardRoutes(spark: SparkSession, numShards: Int): Map[Long, Long] = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    val memoed = routesMemo.get(numShards)
    if (memoed != null) return memoed
    var routes = Map.empty[Long, Long]
    var base = 0L
    val batch = math.max(1024L, numShards.toLong * 20L)
    while (routes.size < numShards) {
      val found = spark.range(base, base + batch)
        .select(pmod(hash(col("id")), lit(numShards)).cast("long").as("p"),
          col("id"))
        .groupBy(col("p")).agg(min(col("id")).as("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      found.foreach { case (p, id) =>
        if (!routes.contains(p)) routes += p -> id
      }
      base += batch
    }
    routesMemo.putIfAbsent(numShards, routes)
    routes
  }

  /** The COMPOSED word-vocabulary export: target-mix the corpus (k12),
    * encode through a frequency vocabulary (k18), pack + publish
    * ([[exportEncoded]]).
    */
  def exportShards(spark: SparkSession, outPath: String, docs: DataFrame,
                   textCol: String, idCol: String, stratumCol: String,
                   targets: Map[String, Double], maxVocab: Int,
                   shardTokens: Long, epoch: Long): (Long, DataFrame) = {
    // intra-export multi-consumer cache (r20, guide §5): the mixed frame
    // is evaluated by the vocab count AND again inside the pack's frozen
    // cumsum — caching it runs the two mix windows once; unpersisted
    // before return (the cumsum checkpoint froze everything downstream)
    val mixed = Mixing.targetMix(docs, stratumCol, idCol, targets).persist()
    try {
      val vocab = TextAnalysis.buildVocab(mixed, textCol, maxVocab)
      val encoded = TextAnalysis.encodeTokens(mixed, vocab, textCol, idCol)
      exportEncoded(spark, outPath, encoded, shardTokens, epoch)
    } finally mixed.unpersist(false)
  }

  /** The BPE export — the shard set a trainer actually mounts (r16, the
    * r15 verdict's #1): target-mix the corpus, TRAIN the K18b subword
    * merges on the mixed corpus itself (or encode through a caller-
    * trained model via `model`), encode every document to its subword
    * id sequence, pack + publish. `n_tokens` in the manifest and the
    * shard rows is the SUBWORD count — the token budget the packing law
    * divides is the one the trainer's context window consumes. `ids`
    * is the flat space-joined id string [[Bpe.encode]] publishes.
    */
  def exportShardsBpe(spark: SparkSession, outPath: String, docs: DataFrame,
                      textCol: String, idCol: String, stratumCol: String,
                      targets: Map[String, Double], numMerges: Int,
                      maxWordTypes: Int, shardTokens: Long, epoch: Long,
                      model: Option[Bpe.Model] = None): (Long, DataFrame) = {
    // same intra-export cache as exportShards (r20, guide §5): the BPE
    // twin evaluates the mixed frame THREE times — the trainer's word
    // count, the encoder's coverage guard, and the pack's frozen cumsum
    val mixed = Mixing.targetMix(docs, stratumCol, idCol, targets).persist()
    try {
      val m = model.getOrElse(
        Bpe.train(mixed, textCol, numMerges, maxWordTypes))
      val encoded = (if (model.isEmpty) Bpe.encode(mixed, m, textCol, idCol)
                     else Bpe.encodeAny(mixed, m, textCol, idCol))
        .withColumnRenamed("n_subwords", "n_tokens")
      exportEncoded(spark, outPath, encoded, shardTokens, epoch)
    } finally mixed.unpersist(false)
  }
}

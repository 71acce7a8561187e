package graft.llm

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (K1/K2 plus
  * SimHash, n-gram Jaccard and embedding near-dup variants).
  *
  * Scale shape shared by every variant: compute a per-document key or
  * signature in a single codegen'd pass (no shuffle), then ONE shuffle on
  * the key/bucket, then work only within buckets. Nothing here ever
  * compares all pairs; the candidate set is always bucket-bounded.
  */
object Dedup {

  /** Default over-wide-LSH-bucket cap, shared by the batch pipeline, the
    * persisted-index write, and the contract oracle SQL (which models the
    * cap so the checked surface stays exact at any scale factor).
    */
  val DefaultMaxBucketSize: Int = 1000

  /** Drop over-wide (band, key) buckets from a persisted+counted bucket
    * frame — THE shared cap: widths via a map-side-combinable cache-local
    * aggregate (a window over all bucket rows measurably regresses — see
    * SCALING.md round 4), anti-join only planned when something was
    * actually dropped, drop list broadcast while provably small with a
    * shuffled fallback for pathological corpora. Returns the capped frame
    * AND the dropped-bucket count, so callers can surface the cap's
    * effect instead of burying it in a log line (r9 advice).
    */
  private def capOverWideBuckets(bucketed: DataFrame, maxBucketSize: Int,
                                 logCtx: String): (DataFrame, Long) = {
    val wide = bucketed.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("__bw")).where(col("__bw") > maxBucketSize)
      .select(col("band"), col("key"))
    val droppedBuckets = wide.count()
    if (droppedBuckets > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$logCtx: dropped $droppedBuckets over-wide LSH buckets " +
          s"(> $maxBucketSize members) — near-dup-saturated; use exact dedup for those")
    val capped =
      if (droppedBuckets == 0) bucketed
      else if (droppedBuckets <= 100000)
        bucketed.join(broadcast(wide), Seq("band", "key"), "left_anti")
      else bucketed.join(wide, Seq("band", "key"), "left_anti")
    (capped, droppedBuckets)
  }

  /** K1 — exact dedup after text normalization. Keeps the row with the
    * smallest `idCol` per normalized-hash group (deterministic winner,
    * unlike `dropDuplicates`). One shuffle on the 128-bit hash — at 100 TB
    * the shuffle carries (hash, id) pairs only if you project first; we
    * keep the full row because the winner's payload is the output.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol).asc)
    df.withColumn("__h", md5(normalizeText(col(textCol))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Per-duplicate-group summary (group hash, surviving id, group size) —
    * the audit view of `exact`.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("__h", md5(normalizeText(col(textCol))))
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))

  /** K1 substring form — duplicated-SPAN detection, the relational
    * re-expression of the exact-substring-dedup recipe from the public
    * training-data writeups (suffix-array substring dedup): find every
    * maximal token span whose n-gram windows each occur at least `minDf`
    * times corpus-wide (all occurrences count, including repeats within
    * one document — the substring-dedup semantic). Downstream either
    * drops the spans from the text or drops documents dominated by them.
    *
    * Shape at 100 TB: one codegen'd positional gram-hash pass (md5-prefix
    * longs — 8 bytes per gram, the Decontaminate/MinHash representation,
    * and the reason a SQL oracle reproduces the set bit-for-bit), ONE
    * shuffle on the hash for corpus-wide df, one equi-join back (hash
    * shuffle — the df side is corpus-derived, so it is never broadcast),
    * then a per-document gaps-and-islands window: hits at starts p and q
    * chain into one span while q - p <= n (their [p, p+n-1] coverages
    * overlap or abut). Returns (doc_id, span_start, span_end,
    * span_tokens, n_dup_grams) with token indices 0-based inclusive,
    * eagerly materialized (localCheckpoint) so the positional gram cache
    * can be released before the caller composes further.
    */
  def duplicatedNgramSpans(df: DataFrame, textCol: String, idCol: String,
                           n: Int, minDf: Long = 2L): DataFrame = {
    require(n >= 2, s"span grams need n >= 2: $n")
    require(minDf >= 2L, s"minDf < 2 would mark every gram duplicated: $minDf")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val grams = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), tokens(normalizeText(col("__text"))).as("__toks"))
      .select(col("doc_id"),
        posexplode(shingleHashes(ngrams(col("__toks"), n))))
      .withColumnRenamed("col", "gh")
      .persist()
    try {
      grams.count() // two consumers below (df agg + hit join) hit cache
      val dup = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
        .where(col("df") >= minDf)
      val hits = grams.join(dup, Seq("gh")).select(col("doc_id"), col("pos"))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      hits
        .withColumn("__brk",
          when(col("pos") - lag(col("pos"), 1).over(wd) <= n, lit(0))
            .otherwise(lit(1))) // null gap (first hit) starts a span
        .withColumn("__span", sum(col("__brk")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("__span"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + lit(n - 1)).as("span_end"),
          count(lit(1)).as("n_dup_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + lit(1)).as("span_tokens"),
          col("n_dup_grams"))
        .localCheckpoint(true)
    } finally grams.unpersist(false)
  }

  /** Per-document duplication profile from [[duplicatedNgramSpans]]:
    * (doc_id, n_tokens, dup_tokens, dup_fraction). Spans within a doc are
    * disjoint by construction (maximal islands), so their token sum IS
    * the duplicated token count; docs with no spans report zeros. This is
    * the drop/trim decision input — drop when dup_fraction exceeds the
    * policy threshold, else trim the spans.
    */
  def duplicationStats(df: DataFrame, textCol: String, idCol: String,
                       n: Int, minDf: Long = 2L): DataFrame =
    duplicationStatsFrom(df,
      duplicatedNgramSpans(df, textCol, idCol, n, minDf), textCol, idCol)

  /** [[duplicationStats]] against precomputed spans — compute
    * [[duplicatedNgramSpans]] ONCE and feed both this and
    * [[trimDuplicatedSpansFrom]] when a pipeline needs stats AND
    * trimming (the Decontaminate `...AgainstGrams` rule: the expensive
    * pass is shared, the policy arms read the checkpointed result).
    */
  def duplicationStatsFrom(df: DataFrame, spans: DataFrame,
                           textCol: String, idCol: String): DataFrame = {
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_tokens")).as("dup_tokens"))
    df.select(col(idCol).as("doc_id"),
        size(tokens(normalizeText(col(textCol)))).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        round(when(col("n_tokens") > 0,
            col("dup_tokens").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)), 6).as("dup_fraction"))
  }

  /** K2 — MinHash/LSH near-duplicate candidate pairs.
    *
    * shingle (distinct word n-grams) → k-component MinHash signature (pure
    * HOFs, one scan) → `bands` LSH band keys → explode + self-join within
    * band buckets → distinct (a < b) pairs → exact Jaccard verification on
    * the shingle sets.
    *
    * The only shuffles are the band-bucket groupBys; bucket sizes are the
    * LSH load factor, so the pair blowup is bounded by design (and any
    * pathological bucket is AQE-skew-split). Hashes are md5-derived so a
    * SQL oracle reproduces signatures exactly (SURVEY.md §7.4).
    *
    * `maxBucketSize` caps degenerate buckets: a corpus with thousands of
    * IDENTICAL documents puts them all in one bucket, and the self-join
    * then emits O(b²) pairs no matter how good the banding is. Buckets
    * wider than the cap are dropped before the join (standard production
    * LSH practice — such buckets are near-dup-saturated; route their
    * members through exact dedup instead, which handles identical text in
    * one shuffle). Dropped-bucket count is logged.
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                            jaccardThreshold: Double = 0.0,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // The ONLY persisted intermediate is (id, array<long> shingle hashes):
    // ~8 bytes per shingle instead of the raw n-gram strings (~4-8× less
    // cache footprint — the difference between "fits in executor storage"
    // and "spills" at corpus scale). Both the signature (affine mins over
    // h) and the Jaccard verification (set overlap of h values) derive
    // from it, so the shingle strings never leave the projection that
    // hashes them. Jaccard over distinct hashes equals shingle Jaccard up
    // to md5-prefix collisions (p = 2^31-1; expected error ~|sh|²/2p per
    // doc — negligible, and deterministic, so the SQL oracle applies the
    // identical function and still matches bit-for-bit).
    val projected = shingleHashProjection(df, textCol, idCol, shingleN).persist()
    projected.count() // eager: later fan-out consumers (incl. broadcast
    // builds) must hit the cache, not re-execute the expensive pipeline
    try minhashCandidatePairsFrom(projected, k, bands, jaccardThreshold, maxBucketSize)
    finally projected.unpersist(false)
  }

  /** The LSH candidate pipeline over an ALREADY-PERSISTED shingle-hash
    * projection (id, hs) — split out so callers that also need the
    * projection for other work ([[lshQualityMetrics]]'s exact ground
    * truth) share ONE cached copy instead of executing the md5-heavy
    * shingle pass twice (r8 advice). The caller owns the persist/unpersist
    * of `projected`; the returned frame is eagerly checkpointed, so it
    * remains valid after the caller unpersists.
    */
  private def minhashCandidatePairsFrom(projected: DataFrame, k: Int, bands: Int,
                                        jaccardThreshold: Double,
                                        maxBucketSize: Int): DataFrame =
    scoredCandidatePairsFrom(projected, k, bands, maxBucketSize) { d =>
      // round BEFORE thresholding: the SQL oracle thresholds the rounded
      // value, and a pair landing in [t - 5e-7, t) would otherwise be
      // dropped here but kept there — invisible at test scale, real at
      // shingle-set sizes where the 6th decimal is reachable
      d.withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 6))
        .where(col("jaccard") >= jaccardThreshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }

  /** K2 — CONTAINMENT near-dup over the same LSH candidates (round 13):
    * cont_a = |A∩B| / |A| (how much of A lives inside B), cont_b the
    * mirror, thresholded on the larger of the two. Catches the
    * near-SUPERSET pairs Jaccard structurally misses — a doc fully
    * embedded in a 10× larger one has containment 1.0 but Jaccard ≤ 0.1,
    * and boilerplate-wrapped exact reposts are exactly that shape.
    * Candidate generation is the identical banded-bucket closure (LSH
    * recall for high one-sided containment at skewed sizes is lower than
    * for symmetric Jaccard — the declared trade; the bucket cap and
    * bands are shared so one index serves both scores).
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                       containmentThreshold: Double = 0.5,
                       maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val projected = shingleHashProjection(df, textCol, idCol, shingleN).persist()
    projected.count()
    try scoredCandidatePairsFrom(projected, k, bands, maxBucketSize) { d =>
      val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
      d.withColumn("cont_a", round(inter / size(col("hs_a")), 6))
        .withColumn("cont_b", round(inter / size(col("hs_b")), 6))
        .withColumn("containment", greatest(col("cont_a"), col("cont_b")))
        .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 6))
        .where(col("containment") >= containmentThreshold)
        .select(col("id_a"), col("id_b"), col("cont_a"), col("cont_b"),
          col("containment"), col("jaccard"))
    } finally projected.unpersist(false)
  }

  /** The shared LSH candidate core: banded buckets → capped pair closure
    * → hash-set join-back; `score` maps the (id_a, id_b, hs_a, hs_b)
    * frame to the final scored/filtered columns (Jaccard for the classic
    * path, containment for [[containmentPairs]]).
    */
  private def scoredCandidatePairsFrom(projected: DataFrame, k: Int, bands: Int,
                                       maxBucketSize: Int)
                                      (score: DataFrame => DataFrame): DataFrame = {
    // Filter ABOVE the cache boundary: predicate pushdown would otherwise
    // shove `size(...) > 0` through the repartition and recompute the
    // whole shingle pipeline in the narrow pre-shuffle stage (measured: a
    // 17 s single-task stage).
    val base = projected.where(size(col("hs")) > 0)
    // bucket rows carry only (id, band, key) — never the hash arrays.
    val bucketed = bandBucketRows(base, k, bands).persist()
    bucketed.count() // eager for the same reason (self-join reads it twice)
    // Measured r4 A/B (quiet rig, sf0.1, 2×3 reps each): the r3 width-
    // window form (sorts every bucket row inside the shuffle, persists
    // width-widened rows) ran 8.9-9.5 s cold / 2.7-3.2 s warm vs the
    // helper's groupBy form at 8.3-8.5 s cold / 2.6-2.7 s warm.
    val (buckets, _) = capOverWideBuckets(bucketed, maxBucketSize, "minhashCandidatePairs")
    val pairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // join the candidate pairs back to the hash sets for Jaccard
    // verification. Broadcast the PAIRS (tiny — the LSH output), never the
    // corpus: planner statistics would otherwise pick the corpus side
    // (small on disk) and execute the whole signature pipeline inside a
    // 1-task broadcast build — measured 30+ s here, and a non-starter at
    // 100 TB where the corpus can never be broadcast.
    val withA = base.select(col("id").as("id_a"), col("hs").as("hs_a"))
      .join(broadcast(pairs), Seq("id_a"))
    val result = score(
        base.select(col("id").as("id_b"), col("hs").as("hs_b"))
          .join(broadcast(withA), Seq("id_b")))
      // Eagerly materialize the (bucket-bounded, tiny relative to the
      // corpus) pair list and sever lineage so the big intermediates can
      // be released NOW instead of accumulating for the session lifetime;
      // localCheckpoint blocks are ContextCleaner-collected once the
      // caller drops the result, unlike CacheManager entries.
      .localCheckpoint(true)
    bucketed.unpersist(false)
    result
  }

  /** The shared shingle-hash projection (id, hs: array<long>).
    *
    * Planner discipline (each measured in round 1): repartition the RAW
    * text BEFORE the md5-heavy map (a 6 MB parquet is one input split —
    * one core doing ~100M md5 calls otherwise); tokenize in its OWN
    * projection (interpreted HOFs get no common-subexpression
    * elimination, so inlining tokens() into ngrams() re-tokenizes per
    * element_at); hash then dedupe (deduping 8-byte longs beats sorting
    * string arrays).
    */
  private[graft] def shingleHashProjection(df: DataFrame, textCol: String, idCol: String,
                                           shingleN: Int): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    shingleHashProjectionFromTokens(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(parallelism, col("id"))
        .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks")),
      shingleN)
  }

  /** [[shingleHashProjection]] from a PRE-TOKENIZED (id, __toks) frame —
    * the `curateBatch` shared-pass hook (one tokenization feeds the NB
    * gate AND this projection). Same expressions, so `hs` is
    * bit-identical to the textCol path.
    */
  private[graft] def shingleHashProjectionFromTokens(toks: DataFrame,
                                                     shingleN: Int): DataFrame =
    toks.select(col("id"),
      array_distinct(shingleHashes(ngrams(col("__toks"), shingleN))).as("hs"))

  /** (id, band, key) LSH bucket rows for a (id, hs) frame — a pure MAP
    * over the cached projection, zero shuffle.
    *
    * History of this function is the escalation ladder in action: k
    * nested array-transform lambdas produced a >1 MB codegen unit
    * (~25 s Janino); the explode → hash-aggregate form that replaced
    * them kept codegen small but materialized one row PER SHINGLE
    * through a (map-side combined) exchange. The native
    * [[graft.functions.MinHashSignature]] expression (round 6) computes
    * all k components in one fused per-row loop, so the per-gram explode
    * AND the signature shuffle are both gone; components cast to their
    * decimal strings keep the band-key derivation byte-identical.
    */
  private def bandBucketRows(base: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    base.where(size(col("hs")) > 0) // shingle-less docs have no signature
      .select(col("id"),
        graft.functions.MinHashSignature(col("hs"), k)
          .cast("array<string>").as("sigarr"))
      .select(col("id"), explode(lshBandKeys(col("sigarr"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** Persist the LSH index of a corpus at `path`: `sigs/` (id, hs) for
    * Jaccard verification and `buckets/` (id, band, key) for candidate
    * generation. This is the INCREMENTAL dedup layout — the production
    * LLM-data workflow is "dedup today's crawl against the existing
    * corpus", and rebuilding signatures over 100 TB per batch is a
    * non-starter; with the index persisted, a new batch costs only its own
    * signature pass plus two joins against the index.
    *
    * `maxBucketSize` applies the same over-wide-bucket cap as
    * [[minhashCandidatePairs]] AT WRITE TIME: an uncapped degenerate
    * bucket persisted here would join every colliding future batch row
    * forever (the worst place to leave the blowup). Dropped buckets are
    * logged; their members are near-dup-saturated — exact dedup is the
    * right tool for them.
    */
  def minhashIndexWrite(df: DataFrame, textCol: String, idCol: String, path: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    // a rebuild at a previously-compacted path must not stay shadowed by
    // a stale committed buckets/sigs generation (the ivfWriteIndex rule)
    val idxRoot = new org.apache.hadoop.fs.Path(path)
    val idxFs = idxRoot.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    graft.ops.Generations.reset(idxFs, idxRoot, "buckets")
    graft.ops.Generations.reset(idxFs, idxRoot, "sigs")
    val projected = shingleHashProjection(df, textCol, idCol, shingleN).persist()
    projected.count()
    val base = projected.where(size(col("hs")) > 0)
    base.write.mode("overwrite").parquet(s"$path/sigs")
    val bucketed = bandBucketRows(base, k, bands).persist()
    bucketed.count()
    capOverWideBuckets(bucketed, maxBucketSize, "minhashIndexWrite")._1
      .write.mode("overwrite").parquet(s"$path/buckets")
    bucketed.unpersist(false)
    projected.unpersist(false)
  }

  // ---------------------------------------------------------------- //
  // Retraction — deletes without an index rewrite (tombstones)        //
  // ---------------------------------------------------------------- //

  private[graft] def removedDir(path: String): String =
    graft.ops.Tombstones.dir(path)

  private[graft] def removedSet(spark: org.apache.spark.sql.SparkSession,
                                path: String): Option[DataFrame] =
    graft.ops.Tombstones.set(spark, path)

  private def dropRemoved(df: DataFrame, removed: Option[DataFrame],
                          idCol: String): DataFrame =
    graft.ops.Tombstones.drop(df, removed, idCol)

  /** RETRACT documents from a persisted text-similarity index (MinHash
    * OR simhash — both keep the `buckets`(+`sigs`) layout) WITHOUT
    * rewriting it — the Lucene-deletes shape, and the index-family
    * counterpart of [[graft.ops.Graph.retractBatch]]: retraction lands
    * as a tombstone id set under `removed/__ret=<retractionId>`
    * (dynamic overwrite — a replayed retraction rewrites exactly
    * itself), every read path anti-joins it, and the next
    * [[compactIndex]] applies it PHYSICALLY and clears it. At 100 TB a
    * delete therefore costs O(removals) now and rides the compaction
    * the index already schedules — never an immediate corpus-scale
    * rewrite.
    *
    * Semantics at read time are IDENTICAL to an index whose retracted
    * docs never entered it, with one deliberate exception: bucket-width
    * caps were computed at write time over the then-full corpus and do
    * not reopen on retraction (a capped bucket stays capped until the
    * compaction recomputes widths) — the same write-time-cap rule the
    * append families follow.
    *
    * PRECONDITION (the whole-stream id-uniqueness rule's delete-side
    * twin): a retracted id must NOT be re-ingested before a compaction
    * has applied and cleared its tombstone — the tombstone is id-keyed,
    * so a re-added doc under the same id would be invisible to every
    * read until then, and the next compaction would physically delete
    * its fresh rows. Re-use an id only after the compaction epoch that
    * absorbed its retraction (or use fresh ids — the cheaper rule).
    */
  def retractFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       removedIds: DataFrame, idCol: String,
                       retractionId: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(bucketsDir(spark, path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $path — build it first")
    graft.ops.Tombstones.write(spark, path, removedIds, idCol, retractionId)
  }

  /** The CURRENT buckets directory of the LSH index at `path` —
    * generation-resolved ([[graft.ops.Generations]]): `buckets/` until the
    * first [[compactIndex]], the highest committed `buckets_gen=N/` after.
    * Readers and the ingest appender all resolve through this, so a
    * compaction commit atomically redirects them.
    */
  private[graft] def bucketsDir(spark: org.apache.spark.sql.SparkSession,
                                path: String): String =
    graft.ops.Generations.currentDir(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(path), "buckets").toString

  /** One-pass ingestion core: the admitted (novel) rows of `newDf`
    * against an optional persisted index, with the survivors' signatures
    * and bucket rows appended under `__batch=<batchId>`.
    *
    * Composing [[minhashPairsAgainstIndex]] + [[minhashDedup]] + a
    * separate index append would signature the batch THREE times; the
    * md5 shingle pass dominates batch cost, so this core computes the
    * projection and band buckets ONCE and derives all three stages from
    * the cache:
    *   - vs-index dups: capped batch buckets ⋈ index buckets → verified
    *     pairs (same-id matches excluded — replay artifacts);
    *   - intra-batch dups: self-join of the capped buckets restricted to
    *     vs-index survivors, greater id loses (min-id-wins greedy);
    *   - append: survivors' (id, hs) and bucket rows, batch-partitioned.
    * Shingle-less docs (< shingleN tokens) are LSH-invisible and always
    * admitted — see Ingest's exactGuard for their dedup story.
    * `appendToIndex` requires the index to be empty or batch-partitioned
    * (an ingest-maintained layout, NOT a static `minhashIndexWrite`).
    */
  def ingestAgainstIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                         batchId: Long, newDf: DataFrame, textCol: String, idCol: String,
                         shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                         threshold: Double = 0.8,
                         maxBucketSize: Int = DefaultMaxBucketSize,
                         appendToIndex: Boolean = true,
                         projection: Option[DataFrame] = None,
                         scorer: String = "jaccard",
                         containmentThreshold: Double = 0.9): DataFrame = {
    // Scorer choice (round 14, the r13 verdict's containment-intake gap):
    // "jaccard" is the classic symmetric near-dup drop; "containment"
    // drops boilerplate-wrapped reposts (a doc embedded in a 10× larger
    // one has containment 1.0 but Jaccard <= 0.1 — it sailed through the
    // jaccard-only intake the K2 containment family was built to catch);
    // "both" is the union of the two drop sets. All three ride the ONE
    // cached signature pass and the same banded candidate joins — the
    // scorer only changes the verification predicate.
    //   - vs-index: the new doc drops when greatest(cont_new, cont_corpus)
    //     >= containmentThreshold (either direction of wrapping is a
    //     repost; the corpus doc is already admitted, so the new arrival
    //     is always the loser);
    //   - intra-batch: the containmentDedup policy — the STRICTLY SMALLER
    //     side drops (cont_a > cont_b ⇔ |A| < |B|), ties keep the smaller
    //     id — order-free, so the survivor set stays deterministic.
    require(Set("jaccard", "containment", "both")(scorer),
      s"scorer must be jaccard | containment | both, got '$scorer'")
    val useJac = scorer != "containment"
    val useCont = scorer != "jaccard"
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasData(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir)
      fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        n.startsWith("__batch=") || n.endsWith(".parquet")
      }
    }
    // enforce the layout precondition rather than corrupt: appending
    // __batch= partitions into a static (root-file) index would leave a
    // mixed layout parquet partition discovery rejects
    if (appendToIndex) {
      def static(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")) &&
          !fs.listStatus(p).exists(_.getPath.getName.startsWith("__batch="))
      }
      // check BOTH halves: a fully-capped static write leaves sigs/ with
      // root files while buckets/ is empty — appending would still corrupt
      val mixed = static(bucketsDir(spark, indexPath)) || static(sigsDir(spark, indexPath))
      require(!mixed,
        s"index at $indexPath has the static minhashIndexWrite layout (root data " +
          "files); ingestAgainstIndex appends need the batch-partitioned layout — " +
          "start from an empty index dir (or rebuild via ingest batches)")
    }
    // `projection` lets a composed pipeline (Ingest.curateBatch) share
    // ONE shingle pass across dedup and novelty: it must be
    // shingleHashProjection(newDf, textCol, idCol, shingleN), already
    // persisted — the caller owns its lifecycle
    val ownProj = projection.isEmpty
    val projected = projection.getOrElse(
      shingleHashProjection(newDf, textCol, idCol, shingleN).persist())
    if (ownProj) projected.count()
    val base = projected.where(size(col("hs")) > 0)
    val bucketed = bandBucketRows(base, k, bands).persist()
    bucketed.count()
    val (capped, _) = capOverWideBuckets(bucketed, maxBucketSize,
      s"ingestAgainstIndex(batch $batchId)")
    val vsDup =
      if (!hasData(bucketsDir(spark, indexPath)))
        base.select(col("id")).where(lit(false)) // typed empty
      else {
        // retracted corpus docs must not veto new arrivals (tombstones
        // consulted at read — the retractFromIndex contract)
        val liveBuckets = dropRemoved(
          spark.read.parquet(bucketsDir(spark, indexPath)),
          removedSet(spark, indexPath), "id")
        val pairs = capped.as("n")
          .join(liveBuckets.as("o"),
            col("n.band") === col("o.band") && col("n.key") === col("o.key"))
          .select(col("n.id").as("new_id"), col("o.id").as("corpus_id"))
          .where(col("new_id") =!= col("corpus_id"))
          .dropDuplicates("new_id", "corpus_id")
        val idxSigs = spark.read.parquet(sigsDir(spark, indexPath))
          .select(col("id").as("corpus_id"), col("hs").as("hs_o"))
        val interVs = size(array_intersect(col("hs_n"), col("hs_o"))).cast("double")
        val jacHit = round(jaccard(col("hs_n"), col("hs_o")), 6) >= threshold
        val contHit = greatest(
          round(interVs / size(col("hs_n")), 6),
          round(interVs / size(col("hs_o")), 6)) >= containmentThreshold
        val vsCond =
          if (useJac && useCont) jacHit || contHit
          else if (useCont) contHit
          else jacHit
        base.select(col("id").as("new_id"), col("hs").as("hs_n"))
          .join(pairs, Seq("new_id"))
          .join(idxSigs, Seq("corpus_id"))
          .where(vsCond)
          .select(col("new_id").as("id")).distinct()
      }
    val survBuckets = capped.join(vsDup, Seq("id"), "left_anti")
    val p2 = survBuckets.as("a").join(survBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // pairs-side broadcast, same shape as minhashCandidatePairs (bucket-
    // bounded intra-batch pair list; the batch pipeline itself is cached)
    val scoredIntra = base.select(col("id").as("id_a"), col("hs").as("hs_a"))
      .join(broadcast(p2), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
    val interIn = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    val contA = round(interIn / size(col("hs_a")), 6)
    val contB = round(interIn / size(col("hs_b")), 6)
    // per-pair loser(s): jaccard drops the greater id (min-id-wins);
    // containment drops the strictly-smaller side, tie to the greater id
    // (the containmentDedup rule). "both" unions the drop sets — a pair
    // can lose BOTH sides (b wrapped in a AND jaccard-close), which is
    // the correct set semantics for an EXISTS-style oracle.
    val jacLoss = round(jaccard(col("hs_a"), col("hs_b")), 6) >= threshold
    val dropA =
      if (useCont) (contA >= containmentThreshold) && (contA > contB)
      else lit(false)
    val dropB = {
      val c = if (useCont) (contB >= containmentThreshold) && (contB >= contA)
              else lit(false)
      if (useJac) jacLoss || c else c
    }
    val intraLosers = scoredIntra
      .select(explode(array(
        when(dropA, col("id_a")), when(dropB, col("id_b")))).as("id"))
      .where(col("id").isNotNull)
      .distinct()
    // materialize the (small) drop list once — it gates three consumers
    // (two index writes + the admitted anti-join)
    val dropIds = vsDup.union(intraLosers).distinct().localCheckpoint(true)
    if (appendToIndex) {
      base.join(dropIds, Seq("id"), "left_anti")
        .withColumn("__batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch").parquet(sigsDir(spark, indexPath))
      capped.join(dropIds, Seq("id"), "left_anti")
        .withColumn("__batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch").parquet(bucketsDir(spark, indexPath))
    }
    val admitted = newDf
      .join(dropIds.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint(true) // sever lineage before the caches release
    if (ownProj) projected.unpersist(false)
    bucketed.unpersist(false)
    admitted
  }

  /** Compact a persisted index (MinHash OR simhash — both keep (band,
    * key) bucket rows): drop (band, key) groups that grew past the cap
    * ACROSS batches — appends only cap within their own batch, so a key
    * that collides batch after batch accrues unbounded join fan-out
    * until compacted — and fold the per-batch small files into one
    * `__batch=0` (batch-partitioned layouts only; a long-running ingest
    * stream otherwise accumulates one directory of fragments per batch
    * forever — the ivfCompact small-files rule, and the same
    * retired-lineage precondition: a replayed pre-compaction batch would
    * re-append under its old id). MinHash indexes also fold `sigs/` the
    * same way (content untouched — sigs carry no cap).
    *
    * Every rewrite is a CRASH-ATOMIC generation swap
    * ([[graft.ops.Generations]], shared with [[Similarity.ivfCompact]]):
    * the output lands fully in the next `<base>_gen=N/` and becomes
    * current when its immutable commit marker is created — a kill at any
    * point leaves readers a complete directory (old generation before
    * the marker, new after). The superseded generation is retained until
    * the next compaction; [[vacuumIndex]] is the explicit reclaim.
    * Writing into a staging dir also removes the old
    * read-before-overwrite hazard, so the rewrite streams
    * executor-to-disk instead of checkpointing.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // tombstones apply PHYSICALLY here (retractFromIndex's deferred
    // half): retracted rows drop before the width pass, so bucket caps
    // recompute over the surviving membership
    val removed = removedSet(spark, path)
    val b = dropRemoved(
      spark.read.parquet(graft.ops.Generations.currentDir(fs, root, "buckets").toString),
      removed, "id")
    val wide = b.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("__bw")).where(col("__bw") > maxBucketSize)
      .select(col("band"), col("key"))
    val kept = b.join(wide, Seq("band", "key"), "left_anti")
    swapGeneration(fs, root, "buckets",
      if (kept.columns.contains("__batch")) kept.withColumn("__batch", lit(0L)) else kept)
    // MinHash sigs: fold the per-batch fragments too (no width pass —
    // sigs are verification payload, the cap is a bucket concern)
    val sigsCur = graft.ops.Generations.currentDir(fs, root, "sigs")
    if (fs.exists(sigsCur)) {
      val s = dropRemoved(spark.read.parquet(sigsCur.toString), removed, "id")
      if (s.columns.contains("__batch"))
        swapGeneration(fs, root, "sigs", s.withColumn("__batch", lit(0L)))
      else if (removed.isDefined)
        swapGeneration(fs, root, "sigs", s)
    }
    // tombstones are now baked into the committed generations — clear
    // them (a crash mid-delete leaves no-op tombstones for ids that are
    // already gone; readers stay correct at every point)
    if (removed.isDefined) graft.ops.Tombstones.clear(spark, path)
  }

  /** Stage → write → commit → GC one generation swap (the write is
    * partitioned by `__batch` when the frame carries it).
    */
  private def swapGeneration(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path, base: String,
                             out: DataFrame): Unit = {
    val (staged, gen) = graft.ops.Generations.stage(fs, root, base)
    val w = out.write.mode("overwrite")
    (if (out.columns.contains("__batch")) w.partitionBy("__batch") else w)
      .parquet(staged.toString)
    graft.ops.Generations.commit(fs, root, base, gen)
    graft.ops.Generations.gcOld(fs, root, base)
  }

  /** ONE maintenance entry point for the text-similarity indexes (LSH
    * and simhash share the `buckets`(+`sigs`) layout and
    * [[compactIndex]]) — the [[Similarity.ivfMaintain]] policy shape,
    * minus the drift arm: banded signatures have no geometry to drift
    * (the banding is pinned in `meta/` and md5-derived), so the only
    * measured degradation is FRAGMENTATION — every append adds one
    * `__batch` directory of small files. COMPACT when the live batch
    * count exceeds `maxLiveBatches`, else no-op; returns the action
    * taken ("compact" | "none"). Same retired-lineage rule as every
    * compacting family: run only after the appending stream's
    * checkpoint is dropped.
    */
  def indexMaintain(spark: org.apache.spark.sql.SparkSession, path: String,
                    maxLiveBatches: Int = 8,
                    maxBucketSize: Int = DefaultMaxBucketSize): String = {
    val root = new org.apache.hadoop.fs.Path(bucketsDir(spark, path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $path — build it first")
    // __batch partition-directory names — an FS listing, no Spark job
    // (a flat pre-batch layout counts as one batch)
    val live = fs.listStatus(root).map(_.getPath.getName)
      .count(_.startsWith("__batch=")).max(1)
    // pending tombstones are the second degradation (round 13): every
    // read anti-joins them until a compaction bakes them physically —
    // and baking them is what re-opens their ids for ingest
    val pendingRets = graft.ops.Tombstones.retIds(spark, path).nonEmpty
    if (pendingRets || live > maxLiveBatches) {
      compactIndex(spark, path, maxBucketSize); "compact"
    } else "none"
  }

  /** Reclaim every superseded generation (buckets AND sigs) — run when no
    * reader can still be older than the last [[compactIndex]] commit.
    */
  def vacuumIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.Generations.vacuum(fs, root, "buckets")
    graft.ops.Generations.vacuum(fs, root, "sigs")
  }

  /** The CURRENT sigs directory of the LSH index at `path` — generation-
    * resolved like [[bucketsDir]] (compaction folds sigs through the same
    * mechanism).
    */
  private[graft] def sigsDir(spark: org.apache.spark.sql.SparkSession,
                             path: String): String =
    graft.ops.Generations.currentDir(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(path), "sigs").toString

  /** Near-dup pairs of a NEW batch against a persisted corpus index
    * (`minhashIndexWrite` layout): (new_id, corpus_id, jaccard). The new
    * side computes its own signatures (identical md5-derived math, so the
    * SQL oracle reproduces the whole thing); candidates come from an
    * equi-join of the new batch's band keys against the index buckets,
    * and verification joins the index `sigs/`. The corpus index is only
    * ever shuffled on its join keys — nothing corpus-sized is collected,
    * broadcast, or rebuilt.
    *
    * Unlike [[minhashCandidatePairs]] the pair list here is NOT broadcast:
    * with a capped index each new doc contributes at most bands ×
    * maxBucketSize pairs, so the list scales with the BATCH, and "today's
    * crawl" can itself be arbitrarily large. Both verification joins are
    * plain equi-joins — the new side's expensive signature pipeline is
    * persisted + eagerly materialized above, so even if the planner elects
    * to broadcast it at runtime (AQE, small batches) the build reads the
    * cache, never re-executes the pipeline (the round-1 trap).
    */
  def minhashPairsAgainstIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                               newDf: DataFrame, textCol: String, idCol: String,
                               shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                               jaccardThreshold: Double = 0.0): DataFrame =
    scoredPairsAgainstIndex(spark, path, newDf, textCol, idCol, shingleN, k, bands) { d =>
      // round before thresholding, like minhashCandidatePairs — the SQL
      // oracle thresholds the rounded value
      d.withColumn("jaccard", round(jaccard(col("hs_n"), col("hs_o")), 6))
        .where(col("jaccard") >= jaccardThreshold)
        .select(col("new_id"), col("corpus_id"), col("jaccard"))
    }

  /** [[containmentPairs]] against a persisted index — the production
    * "is today's crawl a boilerplate-wrapped repost of the corpus"
    * probe: same banded candidate join as [[minhashPairsAgainstIndex]]
    * (one index serves both scores), containment computed per side
    * (cont_new = |N∩C| / |N|, cont_corpus the mirror) and thresholded
    * on the larger.
    */
  def containmentPairsAgainstIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                                   newDf: DataFrame, textCol: String, idCol: String,
                                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                                   containmentThreshold: Double = 0.5): DataFrame =
    scoredPairsAgainstIndex(spark, path, newDf, textCol, idCol, shingleN, k, bands) { d =>
      val inter = size(array_intersect(col("hs_n"), col("hs_o"))).cast("double")
      d.withColumn("cont_new", round(inter / size(col("hs_n")), 6))
        .withColumn("cont_corpus", round(inter / size(col("hs_o")), 6))
        .withColumn("containment", greatest(col("cont_new"), col("cont_corpus")))
        .withColumn("jaccard", round(jaccard(col("hs_n"), col("hs_o")), 6))
        .where(col("containment") >= containmentThreshold)
        .select(col("new_id"), col("corpus_id"), col("cont_new"),
          col("cont_corpus"), col("containment"), col("jaccard"))
    }

  /** The shared batch-vs-index candidate core (band-bucket equi-join into
    * the persisted buckets, tombstones dropped at read, signature
    * join-back); `score` maps (new_id, corpus_id, hs_n, hs_o) to the
    * final scored/filtered columns.
    */
  private def scoredPairsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                                      path: String, newDf: DataFrame,
                                      textCol: String, idCol: String,
                                      shingleN: Int, k: Int, bands: Int)
                                     (score: DataFrame => DataFrame): DataFrame = {
    val projected = shingleHashProjection(newDf, textCol, idCol, shingleN).persist()
    projected.count()
    val newBase = projected.where(size(col("hs")) > 0)
    // tombstoned ids drop out of candidate generation (retractFromIndex
    // deletes-at-read; None in the common never-retracted case)
    val idxBuckets = dropRemoved(spark.read.parquet(bucketsDir(spark, path)),
      removedSet(spark, path), "id")
    val pairs = bandBucketRows(newBase, k, bands).as("n")
      .join(idxBuckets.as("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key"))
      .select(col("n.id").as("new_id"), col("o.id").as("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
    val idxSigs = spark.read.parquet(sigsDir(spark, path))
      .select(col("id").as("corpus_id"), col("hs").as("hs_o"))
    val result = score(
        newBase.select(col("id").as("new_id"), col("hs").as("hs_n"))
          .join(pairs, Seq("new_id"))
          .join(idxSigs, Seq("corpus_id")))
      .localCheckpoint(true)
    projected.unpersist(false)
    result
  }

  /** Incremental dedup: rows of `newDf` that near-match nothing in the
    * indexed corpus (admit-or-drop for an append-only corpus).
    */
  def dedupAgainstIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        newDf: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashPairsAgainstIndex(spark, path, newDf, textCol, idCol,
        shingleN, k, bands, threshold)
      .select(col("new_id").as(idCol)).distinct()
    newDf.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Near-dedup driven by `minhashCandidatePairs`: drop every doc that is
    * the greater id of a pair above the threshold (union-find-free greedy;
    * deterministic).
    */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.8): DataFrame = {
    val losers = minhashCandidatePairs(df, textCol, idCol, shingleN, k, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** The containment POLICY arm (round 13): drop every doc whose shingle
    * set lives ≥ `threshold` inside a STRICTLY LARGER doc (ties broken
    * to the smaller id) — the boilerplate-wrapped-repost cleanup
    * [[containmentPairs]] detects. The larger-or-earlier rule makes the
    * drop set non-greedy and order-free (a doc is dropped iff such a
    * superset EXISTS among all docs, surviving or not — matching the
    * transitive reality that the superset's own superset still contains
    * the doc), so the survivor set is deterministic and the oracle is
    * one EXISTS over the scored pairs.
    */
  def containmentDedup(df: DataFrame, textCol: String, idCol: String,
                       shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                       threshold: Double = 0.9,
                       maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    df.join(containmentLosers(df, textCol, idCol, shingleN, k, bands,
      threshold, maxBucketSize), Seq(idCol), "left_anti")

  /** The DROP SET of [[containmentDedup]] — one `idCol` row per doc
    * living ≥ `threshold` inside a strictly larger (or tie-smaller-id)
    * doc. Exposed since round 15: the audit card counts these per
    * source as the residual-containment signal.
    *
    * Sizes decide the keeper: join the pair's two hash-set cardinalities
    * back in via the scores already carried — cont_a = i/|A| and
    * cont_b = i/|B|, so |A| < |B| exactly when cont_a > cont_b
    * (same intersection), and |A| = |B| when they tie. Dropped:
    *   id_a when cont_a >= t and (cont_a > cont_b  → A is smaller)
    *   id_b when cont_b >= t and (cont_b > cont_a  → B is smaller,
    *        or cont_a = cont_b → tie broken to keep the smaller id = a)
    */
  def containmentLosers(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        threshold: Double = 0.9,
                        maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val pairs = containmentPairs(df, textCol, idCol, shingleN, k, bands,
      containmentThreshold = threshold, maxBucketSize = maxBucketSize)
    pairs.select(
        when(col("cont_a") >= threshold && col("cont_a") > col("cont_b"),
          col("id_a"))
          .when(col("cont_b") >= threshold && col("cont_b") >= col("cont_a"),
            col("id_b"))
          .as(idCol))
      .where(col(idCol).isNotNull)
      .distinct()
  }

  /** Connected components over an undirected pair list (e.g. the LSH
    * candidate pairs): every node gets the minimum id reachable from it as
    * its cluster label. This is what turns pairwise near-dup hits into
    * dedup GROUPS — the greedy pair-drop in [[minhashDedup]] is not
    * transitive (a~b, b~c keeps a and c).
    *
    * Delegates to [[graft.ops.Graph.connectedComponents]] (alternating
    * large-star/small-star) — the round-10 unification: the original
    * min-label propagation here converged in diameter rounds and
    * serialized high-degree hubs through a single groupBy(node) task;
    * the star algorithm converges in O(log n) rounds and splits hubs by
    * construction. Labels are identical by definition (component-min
    * id), so oracle hashes are unchanged. Hitting `maxIter` without
    * convergence still THROWS (IllegalStateException) rather than
    * returning silently-wrong labels.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame =
    graft.ops.Graph.connectedComponents(pairs, aCol, bCol, maxIter)
      .select(col("id").as("node"), col("component").as("cluster"))

  /** A capped pair result with the cap's effect surfaced:
    * `droppedBuckets` counts the over-wide (band, key) buckets whose
    * members were EXCLUDED from pair generation. A nonzero count is the
    * caller's signal to route those documents through exact dedup (they
    * are near-dup-saturated — the scaladoc's prescription), instead of
    * discovering the hole in a log file.
    */
  case class CappedPairs(pairs: DataFrame, droppedBuckets: Long)

  /** SimHash near-dup: docs whose `bits`-bit simhash differs by at most
    * `maxHamming`. Exact-bucket join on the simhash value for maxHamming=0;
    * for small positive distances the signature is split into
    * (maxHamming+1) sub-bands (pigeonhole: two docs within distance d share
    * at least one of d+1 bands exactly).
    *
    * ==== BEHAVIOR CHANGE (round 9) ====
    * `maxBucketSize` (default [[DefaultMaxBucketSize]] = 1000) now applies
    * the shared over-wide-bucket cap: ALL pairs from a (band, key) bucket
    * wider than the cap are dropped — on a duplicate-heavy corpus this can
    * remove entire duplicate groups from the pair list (a degenerate
    * corpus of 50 identical docs under a cap of 10 yields ZERO pairs where
    * pre-r9 emitted 1225). Such buckets are near-dup-saturated; route
    * their members through [[exact]] dedup, which handles identical text
    * in one shuffle. Pass `maxBucketSize = Int.MaxValue` for the pre-r9
    * uncapped behavior, and use [[simhashPairsWithStats]] to OBSERVE the
    * cap (dropped-bucket count) instead of inferring it from logs.
    *
    * Round-9 hardening, both from the MinHash sibling's playbook: the
    * banded rows are persisted + eagerly counted (the self-join's two
    * sides and the width probe previously each re-ran the simhash HOF
    * pipeline — the round-6 fan-out rule), and the cap above bounds the
    * O(b²) bucket self-join.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   bits: Int = 32, maxHamming: Int = 3,
                   maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    simhashPairsWithStats(df, textCol, idCol, bits, maxHamming, maxBucketSize).pairs

  /** [[simhashPairs]] plus the cap's observable effect — see
    * [[CappedPairs]]. Same plan, same output pairs.
    */
  def simhashPairsWithStats(df: DataFrame, textCol: String, idCol: String,
                            bits: Int = 32, maxHamming: Int = 3,
                            maxBucketSize: Int = DefaultMaxBucketSize): CappedPairs = {
    val banded = simhashBandedRows(df, textCol, idCol, bits, maxHamming).persist()
    try {
      banded.count() // eager: width probe + both join sides read the cache
      val (buckets, dropped) = capOverWideBuckets(banded, maxBucketSize, "simhashPairs")
      val a = buckets.as("a"); val b = buckets.as("b")
      val pairs = a.join(b,
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
        .dropDuplicates("id_a", "id_b")
        .where(col("hamming") <= maxHamming)
        // bounded output (bucket-capped); sever before the cache releases
        .localCheckpoint(true)
      CappedPairs(pairs, dropped)
    } finally banded.unpersist(false)
  }

  /** The TRIM arm of the drop-or-trim policy over
    * [[duplicatedNgramSpans]]: rebuild each document's text with every
    * duplicated span's tokens removed, remainder re-joined by single
    * spaces (the tokenizer's own normalization, so trimming is
    * idempotent modulo newly-exposed duplicate junctions). Span
    * membership is an `exists` over the doc's (start, end) list — spans
    * are disjoint and per-doc few, so the check is a codegen'd HOF, not
    * a join blowup; docs without spans pass through whole.
    */
  def trimDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
                          n: Int, minDf: Long = 2L): DataFrame =
    trimDuplicatedSpansFrom(df,
      duplicatedNgramSpans(df, textCol, idCol, n, minDf), textCol, idCol)

  /** [[trimDuplicatedSpans]] against precomputed spans — see
    * [[duplicationStatsFrom]].
    */
  def trimDuplicatedSpansFrom(df: DataFrame, spans: DataFrame,
                              textCol: String, idCol: String): DataFrame = {
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    df.select(col(idCol).as("doc_id"), tokens(normalizeText(col(textCol))).as("__t"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        concat_ws(" ",
          filter(col("__t"), (_, i) =>
            coalesce(!exists(col("__spans"), s =>
              i >= s("span_start") && i <= s("span_end")), lit(true))))
          .as("trimmed_text"))
  }

  /** Quality harness for the simhash banding — the invariant-5 symmetry
    * completing the tuning-harness family (LSH: [[lshQualityMetrics]];
    * IVF: `ivfRecallCurve`): precision of the (band, key) candidate join
    * and the recall COST of the over-wide-bucket cap, on a bounded
    * sample. Ground truth needs NO cross join: two signatures within
    * `maxHamming` share at least one of the maxHamming+1 bands exactly
    * (the pigeonhole split), so the UNCAPPED banded join is a complete
    * candidate universe and its Hamming-verified pairs ARE the truth
    * set. One row: (n_true, n_candidates, n_hit, dropped_buckets,
    * precision, recall) where candidates/hits come from the CAPPED
    * pipeline — recall < 1 is exactly the pair mass the cap dropped
    * (route those buckets through exact dedup, the documented policy)
    * and precision is the band-collision verification waste the
    * (bits, maxHamming) choice is tuned against.
    */
  def simhashQualityMetrics(df: DataFrame, textCol: String, idCol: String,
                            bits: Int = 32, maxHamming: Int = 3,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val banded = simhashBandedRows(df, textCol, idCol, bits, maxHamming).persist()
    try {
      banded.count() // width probe + all join sides read the cache
      def candPairs(buckets: DataFrame): DataFrame = {
        val a = buckets.as("a"); val b = buckets.as("b")
        a.join(b,
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
          .dropDuplicates("id_a", "id_b")
      }
      val uRow = candPairs(banded)
        .agg(count(lit(1)).as("ncu"),
          count(when(col("hamming") <= maxHamming, 1)).as("nt")).head()
      val (nCandUncapped, nTrue) = (uRow.getLong(0), uRow.getLong(1))
      val (capped, dropped) = capOverWideBuckets(banded, maxBucketSize,
        "simhashQualityMetrics")
      // nothing dropped → the capped join IS the uncapped one; skip it
      val (nCand, nHit) =
        if (dropped == 0L) (nCandUncapped, nTrue)
        else {
          val cRow = candPairs(capped)
            .agg(count(lit(1)).as("nc"),
              count(when(col("hamming") <= maxHamming, 1)).as("nh")).head()
          (cRow.getLong(0), cRow.getLong(1))
        }
      val spark = df.sparkSession
      import spark.implicits._
      Seq((nTrue, nCand, nHit, dropped))
        .toDF("n_true", "n_candidates", "n_hit", "dropped_buckets")
        .withColumn("precision", when(col("n_candidates") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_candidates"), 6)))
        .withColumn("recall", when(col("n_true") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_true"), 6)))
    } finally banded.unpersist(false)
  }

  /** The banded simhash rows (id, sig, band, key) — zero shuffle after
    * an input spread; the sub-band split is the pigeonhole guarantee
    * (two docs within hamming distance d share at least one of d+1
    * bands exactly). Shared by the batch pipeline and the persisted
    * index.
    *
    * Planner discipline (both measured — the round-1 shingle rules,
    * re-learned here in round 10 when the first index build ran 9.1 s
    * vs the MinHash twin's 1.1 s over the same corpus): repartition the
    * RAW text BEFORE the md5-heavy map (a few-MB parquet is one input
    * split — one core otherwise), and materialize [[tokenHashes]] in
    * its OWN projection so the `bits` per-bit vote aggregates read the
    * 8-byte hash array instead of re-running md5 over every token per
    * BIT (interpreted HOFs get no CSE; the split is what
    * CollapseProject preserves for non-cheap multiply-referenced
    * aliases). Signatures are bit-identical to the single-expression
    * [[graft.functions.TextFunctions.simhash]] — same votes, same tie
    * rule — pinned by the simhash parity case in CoreOpsSpec and by
    * both simhash oracles hash-matching the same DuckDB chain.
    */
  private def simhashBandedRows(df: DataFrame, textCol: String, idCol: String,
                                bits: Int, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = bits / nBands
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(parallelism, col("id"))
      .select(col("id"), tokenHashes(tokens(normalizeText(col("__text")))).as("__th"))
      .select(col("id"), simhashFromHashes(col("__th"), bits).as("sig"))
      .select(col("id"), col("sig"),
        explode(array((0 until nBands).map { i =>
          struct(lit(i).as("band"),
            shiftright(col("sig"), i * bandBits).bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
        }: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** Persist a simhash index of a corpus at `path` — the third member of
    * the index family (LSH MinHash, IVF), riding the SAME lifecycle
    * invariants (SCALING.md round 10): build → per-batch append →
    * generation-swapped compaction → vacuum. The bucket rows CARRY the
    * full signature, so queries verify hamming distance in the bucket
    * join itself — no second table, unlike MinHash's sigs/.
    *
    * Layout: `buckets/` (id, sig, band, key) under `__batch=0` from day
    * one (the IVF precedent), so [[simhashAppendBatch]] appends are
    * dynamic-overwrite replay-idempotent; `meta/` pins (bits,
    * maxHamming) — queries and appends read the banding FROM the index,
    * so a caller can never band-mismatch the equi-join into silent
    * misses. `maxBucketSize` caps degenerate buckets at write time
    * (the [[minhashIndexWrite]] rule: an uncapped persisted bucket joins
    * every colliding future batch forever).
    */
  def simhashIndexWrite(df: DataFrame, textCol: String, idCol: String, path: String,
                        bits: Int = 32, maxHamming: Int = 3,
                        maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Generations.reset(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(path), "buckets")
    Seq((bits, maxHamming)).toDF("bits", "max_hamming")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val banded = simhashBandedRows(df, textCol, idCol, bits, maxHamming).persist()
    banded.count() // width probe + the capped write read the cache
    try capOverWideBuckets(banded, maxBucketSize, "simhashIndexWrite")._1
      .withColumn("__batch", lit(0L))
      .write.mode("overwrite").partitionBy("__batch").parquet(s"$path/buckets")
    finally banded.unpersist(false)
  }

  private def simhashMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String): (Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getInt(0), r.getInt(1))
  }

  /** Near-dup pairs of a NEW batch against a persisted simhash index:
    * (new_id, corpus_id, hamming ≤ maxHamming). The batch computes its
    * own signatures with the banding read from the index `meta/`; the
    * candidate join is a plain (band, key) equi-join against the
    * generation-resolved buckets, verification is a codegen'd
    * `bit_count(xor)` on the signatures both sides already carry —
    * nothing corpus-sized is collected, broadcast, or rebuilt, and the
    * corpus is only ever shuffled on its join keys.
    */
  def simhashPairsAgainstIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                               newDf: DataFrame, textCol: String, idCol: String): DataFrame = {
    val (bits, maxHamming) = simhashMeta(spark, path)
    // the same tombstone contract as the MinHash paths (retractFromIndex
    // serves both layouts)
    val idx = dropRemoved(spark.read.parquet(bucketsDir(spark, path)),
      removedSet(spark, path), "id")
    simhashBandedRows(newDf, textCol, idCol, bits, maxHamming).as("n")
      .join(idx.as("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key") &&
          col("n.id") =!= col("o.id"))
      .select(col("n.id").as("new_id"), col("o.id").as("corpus_id"),
        hammingDistance(col("n.sig"), col("o.sig")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("new_id", "corpus_id")
  }

  /** Append a new batch to a persisted simhash index under
    * `__batch=<batchId>` — dynamic-overwrite replay idempotence, banding
    * from `meta/`, per-batch bucket cap, and the same loud stale-layout
    * refusal as the other two families (a flat pre-append layout would
    * corrupt partition discovery for every future read).
    */
  def simhashAppendBatch(spark: org.apache.spark.sql.SparkSession, path: String,
                         batchId: Long, newDf: DataFrame, textCol: String, idCol: String,
                         maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    require(batchId > 0, s"batchId must be > 0 (batch 0 is the base build): $batchId")
    val (bits, maxHamming) = simhashMeta(spark, path)
    val bRoot = new org.apache.hadoop.fs.Path(bucketsDir(spark, path))
    val fs = bRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(bRoot), s"no simhash index at $path — run simhashIndexWrite first")
    require(fs.listStatus(bRoot).exists(_.getPath.getName.startsWith("__batch=")),
      s"$bRoot is not the batch-partitioned layout: rebuild with simhashIndexWrite " +
        "before appending")
    val banded = simhashBandedRows(newDf, textCol, idCol, bits, maxHamming).persist()
    banded.count()
    try capOverWideBuckets(banded, maxBucketSize, s"simhashAppendBatch(batch $batchId)")._1
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(bRoot.toString)
    finally banded.unpersist(false)
  }

  /** N-gram Jaccard pairwise similarity within blocking buckets (here: a
    * cheap first-token block; callers pick the blocker). Exact Jaccard on
    * n-gram sets.
    *
    * Plan (round 10): an INVERTED-INDEX join, not a blocked self-join
    * over gram arrays. Explode the (distinct) grams, equi-join on
    * (block, gram) with `id_a < id_b`, count rows per pair — that count
    * IS |A∩B|, and |A∪B| = nA + nB − |A∩B| from a per-doc size
    * projection. The previous plan paired whole gram ARRAYS and ran an
    * interpreted `array_intersect`/`array_union` per candidate — every
    * same-block pair paid O(|A|+|B|) even with zero overlap. The
    * inverted index touches only pairs that actually share a gram, the
    * intersection count is a codegen hash aggregate, and the gram
    * arrays never move through the pair join. Measured at sf0.1
    * (5k docs, threshold 0.3): 85 s warm → ~3 s, identical rows.
    *
    * Skew: the join key is (block, gram) — strictly finer than the
    * first-token block alone, and hot keys ride AQE's skew-join split,
    * so the triangle-block decomposition the old plan needed is moot.
    * Output/threshold semantics unchanged (raw Jaccard thresholded,
    * 6dp-rounded output — the oracle's shape); `threshold` must be > 0
    * because a zero threshold would ask for the disjoint same-block
    * pairs the inverted index, by construction, never surfaces.
    *
    * Eager like the minhash family: the gram projection is persisted and
    * counted (four consumers), the result localCheckpoint'd so the cache
    * is released before return.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0,
      s"threshold must be > 0 (the inverted-index plan never surfaces " +
        s"zero-overlap pairs, so 0 would change semantics): $threshold")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // repartition the RAW text before the HOF-heavy gram pass (the
    // shingleHashProjection planner discipline: a small parquet is one
    // input split — one core tokenizing the whole corpus otherwise)
    val gd = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(parallelism, col("id"))
      .select(element_at(tokens(normalizeText(col("__text"))), 1).as("block"),
        col("id"), shingles(col("__text"), n).as("grams"))
      .persist()
    gd.count() // eager: sizes + both exploded join sides must hit cache
    try {
      // the gram-less filter goes ON TOP of the cache, never inside `gd`:
      // a `.where(size(grams) > 0)` below the persist gets substituted by
      // predicate pushdown into size(shingles(__text)) > 0 and pushed
      // BELOW the repartition — one core then runs the whole shingle
      // pipeline over the corpus just to evaluate the filter (measured:
      // 12 s single-task map stage at sf0.1; the cache boundary stops the
      // pushdown and the filter costs one size() over materialized arrays)
      val nz = gd.where(size(col("grams")) > 0)
      val sz = nz.select(col("id"), size(col("grams")).cast("long").as("n"))
      // EXPLICIT-width shuffle on the join key: the exploded gram rows are
      // small in BYTES, so AQE's coalescer would fold the self-join into
      // one post-shuffle partition — and then one core pays the join's
      // Σ df² output fan-out (measured: 13 s single-task vs ~1 s wide at
      // sf0.1). A user-specified partition count is exempt from AQE
      // coalescing, and the self-join reuses this one exchange for both
      // sides (ReusedExchange), so the width costs nothing extra.
      val ex = nz.select(col("block"), col("id"), explode(col("grams")).as("g"))
        .repartition(parallelism, col("block"), col("g"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.block") === col("b.block") && col("a.g") === col("b.g") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sz.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .join(sz.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
        .withColumn("__raw",
          col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
        .where(col("__raw") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("__raw"), 6).as("jaccard"))
        .localCheckpoint(true)
    } finally gd.unpersist(false)
  }

  /** LSH quality metrics — the number a production operator actually
    * tunes `bands` / `k` against: precision and recall of the MinHash/LSH
    * candidate generation versus EXACT brute-force ground truth at a
    * Jaccard threshold, on the given (sampled, bounded) frame.
    *
    * One row: (n_true, n_candidates, n_hit, precision, recall) where
    * `n_true` counts all pairs with exact shingle-hash Jaccard ≥
    * `threshold`, `n_candidates` all LSH candidate pairs (bucket-capped,
    * exactly as production generates them), and `n_hit` the candidates
    * that are true pairs — so `recall` charges the banding AND the
    * over-wide-bucket cap for every true pair they fail to surface, and
    * `precision` prices the Jaccard-verification work wasted on false
    * candidates.
    *
    * Ground truth is computed by the inverted-index join (pairs sharing
    * ≥ 1 shingle hash — a pair sharing none has Jaccard 0), NEVER a
    * cartesian product; still, total work is Σ df² over shingle document
    * frequencies, so this is a TUNING HARNESS for a sample of the corpus
    * (10⁴-10⁵ docs), not a full-corpus operator — the point is to pick
    * (k, bands) on the sample, then run the bucketed pipeline at scale.
    *
    * `threshold` must be > 0: at 0 a band-key collision between DISJOINT
    * shingle sets would count as a hit (jaccard 0 ≥ 0) while the
    * inverted-index ground truth — correctly — never pairs disjoint sets,
    * so recall could exceed 1 (r8 advice). A 0-threshold "quality" number
    * is meaningless anyway: every candidate is vacuously true.
    *
    * Cost discipline (r8 verdict + advice): ONE shingle projection is
    * persisted and shared by the candidate pipeline and the ground truth
    * (previously each side computed its own), and the candidate counts
    * come from ONE aggregation (`count(*)` + conditional count) instead
    * of two passes over the candidate frame.
    */
  def lshQualityMetrics(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        threshold: Double = 0.5,
                        maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(threshold > 0,
      s"threshold must be > 0 (at 0, disjoint-set band collisions count as hits): $threshold")
    val projected = shingleHashProjection(df, textCol, idCol, shingleN).persist()
    try {
      projected.count()
      val cand = minhashCandidatePairsFrom(projected, k, bands,
        jaccardThreshold = 0.0, maxBucketSize = maxBucketSize)
      val base = projected.where(size(col("hs")) > 0)
      // explicit-width shuffle on the join key: exempt from AQE
      // coalescing, so the Σ df² join fan-out stays parallel (the
      // ngramJaccardPairs lesson — small shuffle BYTES, huge join OUTPUT)
      val ex = base.select(col("id"), explode(col("hs")).as("h"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, col("h"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("i"))
      val sz = base.select(col("id"), size(col("hs")).cast("long").as("n"))
      val truth = inter
        .join(sz.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .join(sz.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
        .where(round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")), 6) >= threshold)
      val nTrue = truth.count()
      // one job over the (checkpointed) candidate frame for BOTH counts
      val candRow = cand.agg(count(lit(1)).as("nc"),
        count(when(col("jaccard") >= threshold, 1)).as("nh")).head()
      val (nCand, nHit) = (candRow.getLong(0), candRow.getLong(1))
      val spark = df.sparkSession
      import spark.implicits._
      Seq((nTrue, nCand, nHit)).toDF("n_true", "n_candidates", "n_hit")
        .withColumn("precision", when(col("n_candidates") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_candidates"), 6)))
        .withColumn("recall", when(col("n_true") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_true"), 6)))
    } finally projected.unpersist(false)
  }

  /** Embedding near-dup: pairs with cosine >= threshold, bucketed by a
    * deterministic random-hyperplane sign hash so candidate generation is
    * an equi-join, not a cross join. Recall is tunable via `planes`
    * (fewer planes → bigger buckets → higher recall & cost).
    *
    * Buckets over `maxBucketRows` run the exact triangle-block
    * decomposition ([[Similarity.boundedWithinGroupPairs]]) — with only
    * 2^planes buckets, ONE bucket holding a meaningful corpus fraction is
    * the expected case, not the tail, so the bound matters here even more
    * than for cells/clusters. The size probe adds one narrow counting agg
    * over the bucket projection (a third map pass next to the self-join's
    * two sides — cheap relative to the pair join it de-skews).
    *
    * NOTE (rounding): pre-r9 this thresholded the UNROUNDED cosine and
    * then rounded for output; it now rounds to 6dp BEFORE thresholding
    * like every other cosine operator (the shared oracle-exactness rule)
    * — a pair within 5e-7 of the threshold may now differ from pre-r9
    * output by design.
    */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            dim: Int, threshold: Double, planes: Int = 4,
                            maxBucketRows: Long = Similarity.DefaultMaxCellRows): DataFrame = {
    val withBucket = df.select(
      VectorFunctions.signBucket(col(vecCol), planes, dim).as("__grp"),
      col(idCol).as("id"), col(vecCol).as("v"))
    val sizes = withBucket.groupBy(col("__grp")).agg(count(lit(1)).as("n"))
    Similarity.boundedWithinGroupPairs(withBucket, sizes, threshold, maxBucketRows)
  }
}

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
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                            jaccardThreshold: Double = 0.0): DataFrame = {
    val rowsPerBand = k / bands
    val sigs = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("bk", lshBandKeys(col("sig"), bands, rowsPerBand))
    val buckets = sigs.select(col("id"), col("sh"), explode(col("bk")).as("b"))
      .select(col("id"), col("sh"), col("b.band").as("band"), col("b.key").as("key"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
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

  /** SimHash near-dup: docs whose `bits`-bit simhash differs by at most
    * `maxHamming`. Exact-bucket join on the simhash value for maxHamming=0;
    * for small positive distances the signature is split into
    * (maxHamming+1) sub-bands (pigeonhole: two docs within distance d share
    * at least one of d+1 bands exactly).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   bits: Int = 32, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = bits / nBands
    val withSig = df.select(col(idCol).as("id"),
      simhash(tokens(normalizeText(col(textCol))), bits).as("sig"))
    val banded = withSig.select(col("id"), col("sig"),
      explode(array((0 until nBands).map { i =>
        struct(lit(i).as("band"),
          shiftright(col("sig"), i * bandBits).bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
      }: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.band").as("band"), col("b.key").as("key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard pairwise similarity within blocking buckets (here: a
    * cheap first-token block; callers pick the blocker). Exact Jaccard on
    * n-gram sets, bucket-bounded.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, threshold: Double = 0.5): DataFrame = {
    val prepped = df.select(col(idCol).as("id"),
        shingles(col(textCol), n).as("grams"),
        element_at(tokens(normalizeText(col(textCol))), 1).as("block"))
      .where(size(col("grams")) > 0)
    val a = prepped.as("a"); val b = prepped.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccard(col("a.grams"), col("b.grams")))
      .where(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup: pairs with cosine >= threshold, bucketed by a
    * deterministic random-hyperplane sign hash so candidate generation is
    * an equi-join, not a cross join. Recall is tunable via `planes`
    * (fewer planes → bigger buckets → higher recall & cost).
    */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            dim: Int, threshold: Double, planes: Int = 4): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.signBucket(col(vecCol), planes, dim).as("bucket"))
    val a = withBucket.as("a"); val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", VectorFunctions.cosine(col("a.v"), col("b.v")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }
}

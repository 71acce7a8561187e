package graft.llm

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for LLM training corpora: flag (and drop)
  * training documents whose word-n-gram overlap with an evaluation /
  * benchmark corpus exceeds a threshold, so that held-out benchmarks are
  * not leaked into the training set. The standard pipeline step described
  * in public training-data writeups (GPT-3 §C, PaLM, Llama): n-gram
  * collision against the benchmark, document-level drop on overlap ratio.
  *
  * Scale shape (the asymmetry is the whole design): the BENCHMARK side is
  * small by construction (eval sets are MBs, the corpus is TBs), so its
  * distinct gram-hash set broadcasts; the corpus side is one codegen'd
  * shingle pass + explode, a broadcast LEFT SEMI join that keeps only
  * colliding grams (sparse in practice), and ONE shuffle of those hits on
  * doc id. The corpus is never shuffled whole and never self-joined.
  *
  * Grams are md5-keyed (engine-portable, like every hash in this library)
  * so the DuckDB oracle reproduces the collision set bit-for-bit.
  */
object Decontaminate {

  /** Per-document overlap stats against a benchmark corpus.
    *
    * Returns one row per `docs` row: (idCol, n_grams, n_hits, overlap,
    * contaminated) where `n_grams` is the document's distinct-shingle
    * count, `n_hits` how many of those occur anywhere in `bench`,
    * `overlap` = n_hits / n_grams (0 when the doc is shorter than n
    * tokens) and `contaminated` = overlap >= threshold.
    *
    * Two scans of `docs` (one for the gram explode, one for the per-doc
    * gram counts) — deliberate: re-scanning (id, text) through a pruned
    * parquet read is cheaper at scale than carrying n_grams through the
    * explode and shuffling EVERY gram row to re-group zero-hit docs; the
    * semi-join path shuffles only the colliding grams.
    */
  def overlapStats(docs: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, n: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"threshold must be in [0,1]: $threshold")
    val benchGrams = bench
      .select(explode(shingles(col(textCol), n)).as("g"))
      .select(md5(col("g")).as("__gk")).distinct()
    val hits = docs
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .select(col(idCol), md5(col("g")).as("__gk"))
      .join(broadcast(benchGrams), Seq("__gk"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs
      .select(col(idCol), size(shingles(col(textCol), n)).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("overlap",
        when(col("n_grams") > 0,
          round(col("n_hits").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  /** The production form: `docs` minus contaminated rows. Anti-join on the
    * flagged id set (flagged docs are few, so AQE plans it broadcast).
    */
  def clean(docs: DataFrame, bench: DataFrame, textCol: String,
            idCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val flagged = overlapStats(docs, bench, textCol, idCol, n, threshold)
      .where(col("contaminated")).select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}

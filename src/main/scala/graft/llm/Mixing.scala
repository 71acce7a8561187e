package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing / resampling operators — the "what do we train on"
  * knobs of a training-data pipeline, downstream of dedup and quality
  * filtering: cap any one domain's contribution, and rebalance languages
  * (or any stratum) with temperature sampling. Both are deterministic
  * pure functions of the row ids (md5-derived priorities / uniforms, the
  * same engine-portable trick as the K8 sampling family), so reruns,
  * engines and re-partitions all select the identical subset — the
  * property a reproducible training mix needs.
  */
object Mixing {

  /** Per-source (domain) cap: keep at most `cap` documents per source,
    * chosen by a deterministic md5 priority over the doc id (ties broken
    * by id). The Common-Crawl-style guard against any one domain
    * dominating the corpus.
    *
    * Scale shape: ONE shuffle on the source key; the window computes
    * row_number per source partition with partial ordering only within
    * each source. A pathological mega-domain makes a hot partition —
    * but such a domain is exactly what the cap drops, so pre-filtering
    * obvious offenders (count > 100×cap via a cheap agg) before the
    * window is the documented mitigation at extreme skew.
    */
  def perSourceCap(df: DataFrame, sourceCol: String, idCol: String,
                   cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Temperature resampling over a stratum column (typically language):
    * sampling weight ∝ count^alpha (alpha in (0,1] flattens the
    * distribution — the multilingual rebalancing rule from public
    * training recipes), scaled so the expected kept total is
    * `targetTotal`. Per-stratum keep fraction =
    * min(1, targetTotal · (w_l / Σw) / n_l), applied with the
    * deterministic per-doc md5 uniform.
    *
    * Determinism discipline: the per-stratum counts are collected
    * (bounded driver state — one row per language), weights are summed
    * in a SORTED left fold, and the keep threshold is rounded to 6
    * decimals before comparing — the oracle mirrors the identical
    * fold order (`list_reduce(list(w ORDER BY lang))`) and rounding, so
    * both engines draw the same sample. The corpus side is one agg plus
    * one codegen'd filter — no join, no extra shuffle.
    */
  def temperatureResample(df: DataFrame, stratumCol: String, idCol: String,
                          targetTotal: Long, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(targetTotal >= 1, s"targetTotal must be >= 1: $targetTotal")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "temperatureResample needs a non-empty frame")
    // sqrt for the canonical alpha=0.5 (correctly-rounded IEEE in every
    // engine); Math.pow otherwise (matches SQL POW to the ulp in
    // practice; thresholds are rounded below, which absorbs it)
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val wSum = counts.foldLeft(0.0d)((acc, c) => acc + weight(c._2))
    val thresholds = counts.map { case (l, n) =>
      val keep = math.min(1.0d, targetTotal.toDouble * (weight(n) / wSum) / n.toDouble)
      l -> BigDecimal(keep).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val thr = thresholds.foldLeft(lit(Double.NaN)) { case (acc, (l, t)) =>
      when(col(stratumCol) === l, lit(t)).otherwise(acc)
    }
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0d)
    df.where(u < thr)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators beyond plain equi-joins (those are `Dataset.join`
  * pass-throughs — see graft.SparkEntry for the contract queries that pin
  * their semantics).
  */
object Joins {

  /** D7 — range/interval join: `left.tsCol` within
    * [right.loCol, right.hiCol] (inclusive), plus an optional equi key.
    *
    * A naive theta join is a BroadcastNestedLoopJoin — O(n·m) and a
    * deal-breaker at scale. This implementation buckets both sides by a
    * fixed time bin (`binSeconds`), expands the right side to every bin
    * its interval overlaps, equi-joins on (key, bin) — a plain shuffled
    * hash join — and applies the exact range predicate as a residual
    * filter. Cost is O(n + m·bins_per_interval + matches): linear,
    * shuffle-partitioned, AQE-skew-safe. Choose `binSeconds` near the
    * median interval length so expansion stays small.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame,
                      tsCol: String, loCol: String, hiCol: String,
                      binSeconds: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    // explicit aliases: left/right often share lineage (self-joins on the
    // same table) and unaliased key equality would silently resolve both
    // sides to the same attribute (a trivially-true predicate)
    val binL = (unix_micros(col(tsCol)) / lit(binSeconds * 1000000L)).cast("long")
    val l = left.withColumn("__bin", binL).alias("__l")
    val r = right.withColumn("__bins",
      sequence((unix_micros(col(loCol)) / lit(binSeconds * 1000000L)).cast("long"),
        (unix_micros(col(hiCol)) / lit(binSeconds * 1000000L)).cast("long")))
      .withColumn("__bin", explode(col("__bins")))
      .drop("__bins")
      .alias("__r")
    val joinCond = (Seq(col("__l.__bin") === col("__r.__bin")) ++
      equiKeys.map(k => col(s"__l.$k") === col(s"__r.$k"))).reduce(_ && _)
    val joined = l.join(r, joinCond)
      .where(col(s"__l.$tsCol") >= col(s"__r.$loCol") &&
        col(s"__l.$tsCol") <= col(s"__r.$hiCol"))
      .drop(col("__l.__bin")).drop(col("__r.__bin"))
    // drop the right-side copies of the equi keys for a clean output schema
    equiKeys.foldLeft(joined)((d, k) => d.drop(col(s"__r.$k")))
  }

  /** D5 helper — explicit theta join (documents the capability; the planner
    * uses BroadcastNestedLoopJoin, so keep one side broadcast-small).
    */
  def thetaJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(broadcast(right), cond)

  /** Skew-safe equi-join: salt the skewed (large) side's key with a random
    * shard in [0, saltFactor) and replicate the small side across all
    * shards, so one hot key spreads over `saltFactor` reducers instead of
    * melting a single task. AQE's skew-join split handles moderate skew at
    * runtime; explicit salting is the deterministic tool for the
    * pathological keys a 100 TB fact table always has. Inner equi-join
    * semantics on `key` are preserved exactly (salt columns are dropped).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)))) // one copy per shard
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

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
    val binL = (unix_micros(col(tsCol)) / lit(binSeconds * 1000000L)).cast("long")
    val l = left.withColumn("__bin", binL)
    val r = right.withColumn("__bins",
      sequence((unix_micros(col(loCol)) / lit(binSeconds * 1000000L)).cast("long"),
        (unix_micros(col(hiCol)) / lit(binSeconds * 1000000L)).cast("long")))
      .withColumn("__bin", explode(col("__bins")))
      .drop("__bins")
    val joinCond = (Seq(l("__bin") === r("__bin")) ++
      equiKeys.map(k => l(k) === r(k))).reduce(_ && _)
    l.join(r, joinCond)
      .where(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop(l("__bin")).drop(r("__bin"))
  }

  /** D5 helper — explicit theta join (documents the capability; the planner
    * uses BroadcastNestedLoopJoin, so keep one side broadcast-small).
    */
  def thetaJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(broadcast(right), cond)
}

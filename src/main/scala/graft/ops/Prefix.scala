package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed-prefix-sum harness (round 15, extracted per review):
  * a global (or per-group) INCLUSIVE cumulative sum with NO
  * single-partition window — the discipline
  * [[graft.llm.Classifier.binaryAuc]] introduced, now shared by the
  * K22 shard packer and the exact drift-stat p95.
  *
  * Mechanics, order-critical: range-partition on `rangeCols` and FREEZE
  * the layout (`localCheckpoint` — a lazy re-evaluation could rebalance
  * partitions between the offset pass and the window pass), collect the
  * per-(partition, group) totals (bounded by partitions × groups),
  * then run a partition-LOCAL window and add each partition's broadcast
  * offset. Exact long arithmetic end to end; value-identical to the
  * naive global window (parity-spec-pinned at both call sites).
  *
  * `binaryAuc` itself keeps its inlined copy deliberately: its offsets
  * accumulate a DIFFERENT measure (negatives only) into an exclusive
  * rank, and the path is adjudicated hash-matched — not worth
  * re-risking for the dedup.
  */
object Prefix {

  /** `df` + `cumName` = the inclusive running sum of `valueCol` over
    * `orderCols` within each group (empty `groupCols` = one global
    * order), plus the `__pid` layout column (caller drops it). The
    * returned frame is the FROZEN checkpoint — callers fan out over it
    * without re-evaluating upstream lineage.
    */
  def frozenRangeCumSum(df: DataFrame, rangeCols: Seq[Column],
                        groupCols: Seq[Column], orderCols: Seq[Column],
                        valueCol: Column, cumName: String,
                        numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(parts, rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__pfx_v", valueCol.cast("long"))
      .localCheckpoint(true) // freeze the layout between the two passes
    val keyed = parted.groupBy((col("__pid") +: groupCols): _*)
      .agg(sum(col("__pfx_v")).as("t"))
      .select(col("__pid"),
        concat_ws("|", groupCols: _*).as("__g"), col("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets: Map[String, Long] = keyed.groupBy(_._2).iterator
      .flatMap { case (g, rows) =>
        val cums = rows.map(_._3).scanLeft(0L)(_ + _).dropRight(1)
        rows.map(_._1).zip(cums).map { case (p, c) =>
          (if (groupCols.isEmpty) s"$p" else s"$p|$g") -> c
        }
      }.toMap
    val offset =
      if (offsets.isEmpty) lit(0L)
      else coalesce(
        element_at(
          map(offsets.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          concat_ws("|", (col("__pid") +: groupCols): _*)),
        lit(0L))
    val w = Window.partitionBy((col("__pid") +: groupCols): _*)
      .orderBy(orderCols: _*)
    parted
      .withColumn(cumName, sum(col("__pfx_v")).over(w) + offset)
      .drop("__pfx_v")
  }
}

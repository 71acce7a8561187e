package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional (z-order) clustering for
  * write-once analytical tables.
  *
  * Why it matters at 100 TB: parquet readers prune row groups and files on
  * min/max statistics. A table sorted on ONE column prunes only filters on
  * that column; interleaving the bits of TWO columns (a Morton/z-curve)
  * gives every file a tight bounding box in BOTH dimensions, so selective
  * filters on either column (or both) skip most of the data. This is the
  * same layout idea behind lakehouse `OPTIMIZE ZORDER BY`, expressed here
  * as plain codegen-able column math + `repartitionByRange` — no custom
  * writer needed, and the write itself is one extra shuffle.
  */
object Layout {

  /** Morton z-value of two columns normalized to `bits`-bit integers.
    * `loA/hiA`, `loB/hiB` are the column domains (from a prior 1-row agg —
    * the honest two-pass cost of clustering an unknown domain; pass
    * constants when the domain is known, e.g. dates or ids).
    */
  def zValue(a: Column, b: Column, loA: Double, hiA: Double,
             loB: Double, hiB: Double, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val maxV = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      // clamp in DOUBLE space BEFORE the long cast: a degenerate domain
      // (lo == hi) scales to ±Infinity, which the ANSI cast rejects
      val scaled = (c.cast("double") - lit(lo)) / lit(span) * lit(maxV.toDouble)
      least(lit(maxV.toDouble), greatest(lit(0.0d), scaled)).cast("long")
    }
    val na = norm(a, loA, hiA)
    val nb = norm(b, loB, hiB)
    // interleave: a takes even bit positions, b odd — 2*bits ops, all
    // codegen'd long arithmetic fused into one projection
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Dense 0-based ids in `orderCol` order WITHOUT a single-partition
    * window: range-partition on the order column, count rows per
    * partition (a tiny P-row aggregate), turn counts into per-partition
    * offsets with one driver-side prefix sum (bounded by the partition
    * count, not the data), then intra-partition `row_number` + offset.
    * Equivalent to `row_number() OVER (ORDER BY orderCol) - 1` — which
    * Spark would otherwise execute on ONE task — at full parallelism.
    * `orderCol` must be a total order (unique); ids are deterministic.
    */
  def denseIds(df: DataFrame, orderCol: String, numPartitions: Int = 0,
               idName: String = "dense_id"): DataFrame = {
    val p = if (numPartitions > 0) numPartitions
            else df.sparkSession.sparkContext.defaultParallelism
    // materialize the range shuffle ONCE: repartitionByRange samples its
    // boundaries per execution, so the counts pass and the rank pass
    // would otherwise see different partitionings and the offsets would
    // be wrong (observed). The checkpoint also means one shuffle total.
    val parted = df.repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // P counts → P offsets; the collect is bounded by the partition count
    val counts = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // cum(pid) = total rows in partitions strictly before pid
    val cum = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val offsetCol = coalesce(
      element_at(
        map(cum.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("__pid")),
      lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(orderCol))
    parted
      .withColumn(idName, row_number().over(w).cast("long") - 1L + offsetCol)
      .drop("__pid")
  }

  /** Write `df` z-order-clustered on (`colA`, `colB`) into `nFiles` range
    * partitions at `path`. One pass to learn the domains (a 1-row agg),
    * one range shuffle on the z-value, a partition-local sort, and a plain
    * parquet write — each output file ends up with a tight min/max
    * bounding box in both dimensions, which is what downstream scan
    * pruning consumes.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  path: String, nFiles: Int, bits: Int = 16): Unit = {
    val d = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // An empty input (or an all-null cluster column) has no domain to
    // interleave — short-circuit to a plain write of whatever is there
    // (nothing, or rows with no meaningful order on the null column)
    // instead of NPE-ing on the null aggregate.
    if (d.isNullAt(0) || d.isNullAt(2)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"zorderWrite: no min/max domain for ($colA, $colB) — empty input " +
          "or all-null cluster column; writing without z-order clustering")
      df.repartition(nFiles).write.mode("overwrite").parquet(path)
      return
    }
    val z = zValue(col(colA), col(colB),
      d.getDouble(0), d.getDouble(1), d.getDouble(2), d.getDouble(3), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

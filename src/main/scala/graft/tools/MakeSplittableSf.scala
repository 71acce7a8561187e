package graft.tools

/** Dev-only (r20, the r19 verdict's #7): produce a SPLITTABLE copy of a
  * scale-factor dir. The shipped sf* fact files are single-row-group
  * single-file parquet, so a scan cannot parallelize below one task per
  * table and 8c-vs-32c ratios pin at ~1 regardless of code — this
  * rewrites each big table as a multi-file `<name>.parquet/` directory
  * (same rows, same schema via the engine's own reader) so the scaling
  * measurement has something to split. Small dimension tables are
  * copied as-is through one-file writes.
  */
object MakeSplittableSf {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf0.1-split"
    val files = if (args.length > 2) args(2).toInt else 16
    val spark = graft.core.Engine.local(cores = 16, shufflePartitions = 16)
    spark.sparkContext.setLogLevel("ERROR")
    val big = Set("lineitem", "orders", "events", "documents", "embeddings")
    graft.core.Engine.tableNames.foreach { n =>
      val df = spark.read.parquet(s"$src/$n.parquet")
      val parts = if (big(n)) files else 1
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      System.err.println(s"[mksplit] $n -> $parts files")
    }
    spark.stop()
  }
}

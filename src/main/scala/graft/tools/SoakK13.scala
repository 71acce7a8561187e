package graft.tools

import graft.core.Engine
import org.apache.spark.sql.functions._

/** Soak harness for the K13 fold-time pair-evidence store (round 14,
  * r13 verdict #5): the store writes up to [[graft.ops.Graph.PairBuckets]]
  * partition dirs per micro-batch, so a long-running fold stream's one
  * growth axis is small-file spray. This measures, across N streaming
  * folds: per-fold wall time, store file/dir counts, then the
  * `pairsCompact` recovery (files after, fold time after). Dev-only —
  * numbers land in SCALING.md.
  */
object SoakK13 {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 24
    val pairsPerBatch = if (args.length > 1) args(1).toInt else 500
    val spark = Engine.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-k13-soak").toString
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFs(p: org.apache.hadoop.fs.Path): (Long, Long) = {
      var files = 0L; var dirs = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) { it.next(); files += 1 }
      def walkDirs(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).filter(_.isDirectory).foreach { s => dirs += 1; walkDirs(s.getPath) }
      walkDirs(p)
      (files, dirs)
    }
    def storeStats(): (Long, Long) = {
      val store = new org.apache.hadoop.fs.Path(
        graft.ops.Graph.pairStoreDir(fs, path))
      if (!fs.exists(store)) (0L, 0L) else countFs(store)
    }
    def fold(b: Long): Double = {
      // chained pairs over a per-batch id window, plus a few cross-batch
      // links so the incremental closure genuinely merges components
      val base = b * pairsPerBatch * 2L
      val edges = (0 until pairsPerBatch).map { i =>
        if (i % 10 == 9 && b > 0) (base + i, base + i - pairsPerBatch * 2L)
        else (base + i, base + i + 1L)
      }.toDF("a", "b")
      val t0 = System.nanoTime()
      graft.ops.Graph.foldBatch(spark, path, edges, "a", "b", batchId = b)
      (System.nanoTime() - t0) / 1e9
    }
    val times = (0L until n.toLong).map { b =>
      val t = fold(b)
      val (files, dirs) = storeStats()
      println(f"""{"fold":$b,"sec":$t%.3f,"store_files":$files,"store_dirs":$dirs}""")
      t
    }
    val firstQ = times.take(n / 4)
    val lastQ = times.takeRight(n / 4)
    println(f"""{"first_quartile_mean":${firstQ.sum / firstQ.size}%.3f,"last_quartile_mean":${lastQ.sum / lastQ.size}%.3f}""")
    val (filesBefore, dirsBefore) = storeStats()
    val tc0 = System.nanoTime()
    graft.ops.Graph.pairsCompact(spark, path)
    val tCompact = (System.nanoTime() - tc0) / 1e9
    val (filesAfter, dirsAfter) = storeStats()
    val tPost = fold(n.toLong + 1L) // a fold against the compacted store
    println(f"""{"compact_sec":$tCompact%.3f,"files_before":$filesBefore,"dirs_before":$dirsBefore,"files_after":$filesAfter,"dirs_after":$dirsAfter,"fold_after_compact_sec":$tPost%.3f}""")
    spark.stop()
  }
}

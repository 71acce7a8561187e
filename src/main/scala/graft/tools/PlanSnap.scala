package graft.tools

/** Dev-only: write `.explain("formatted")` of named contract queries to
  * files (args: <filter-substring> <outDir> [sfDir]). Uses the SAME session
  * construction as Bench (Engine.local) so the captured plans are the
  * plans the bench actually runs — broadcast threshold, AQE, bloom
  * filters all match. Multiple comma-separated filters are allowed.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val filters = args(0).split(',').toSeq
    val outDir = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Engine.local(cores = cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    for ((n, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if filters.exists(n.contains)) {
      try {
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plansnap] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[plansnap] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

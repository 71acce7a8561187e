package graft.tools

import graft.core.Engine
import org.apache.spark.sql.functions._

/** Dev profiling harness for the MinHash/LSH contract query. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.get - si.submissionTime.get) / 1000.0
        if (dur > 0.5)
          println(f"  STAGE ${si.stageId} tasks=${si.numTasks} time=$dur%.1f s  ${si.name.take(60)}")
      }
    })
    val q = graft.contract.LlmQueries.queries("k2_lsh_candidate_pairs")(spark, dir)
    q.explain("formatted")
    time("contract query exact")(
      q.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

package graft.tools

import graft.core.Engine
import org.apache.spark.sql.functions._

/** Dev profiling harness for the k13 dedup-resolve pipeline: where do the
  * seconds go between pair generation, the CC fixpoint, and resolution?
  */
object ProfileK13 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.ops.Graph", org.apache.logging.log4j.Level.INFO)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t00 = System.currentTimeMillis()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(f"  JOB ${js.jobId} start@${(js.time - t00) / 1000.0}%.1f stages=${js.stageIds.mkString(",")} " +
          js.properties.getProperty("callSite.short", "?"))
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val sub = (si.submissionTime.get - t00) / 1000.0
        val dur = (si.completionTime.get - si.submissionTime.get) / 1000.0
        if (dur > 0.3)
          println(f"  STAGE ${si.stageId} tasks=${si.numTasks} sub@$sub%.1f dur=$dur%.1f s  ${si.name.take(55)}")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("pairs cold (eager)")(
      graft.llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1).count())
    time("pairs warm (eager)")(
      graft.llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1).count())
    val pairs = graft.llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1)
    val cc = time("cc over pairs")(
      graft.ops.Graph.connectedComponents(pairs, "id_a", "id_b").count())
    println(s"  ccRows=$cc")
    (1 to 2).foreach { i =>
      time(s"full k13_dedup_resolve contract query #$i")(
        graft.contract.LlmQueries.queries("k13_dedup_resolve")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

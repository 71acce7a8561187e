package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only (r20 optimization round): phase-timing probe for the
  * k22_shard_export / k22_shard_export_bpe pipeline — replicates
  * LlmQueries' entries step by step (same parameters) and prints
  * wall-clock + Spark-job count per phase, so the r19 verdict's #6
  * ("shrink the BPE twin's serial section") has an attribution.
  */
object ProfileShards {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Engine.local(cores = cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val r = f
      System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"${jobs.get() - j0} jobs")
      r
    }
    val docs = graft.core.Engine.table(spark, dir, "documents")
    val targets = Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15, "zh" -> 0.05)
    for (round <- Seq("cold", "warm")) {
      val out = java.nio.file.Files.createTempDirectory(s"graft-prof-shards-$round").toString
      val mixed = phase(s"$round targetMix") {
        val m = graft.llm.Mixing.targetMix(docs, "lang", "doc_id", targets)
        m.write.format("noop").mode("overwrite").save(); m
      }
      val model = phase(s"$round bpe train (20 merges)") {
        graft.llm.Bpe.train(mixed, "text", 20, 100000)
      }
      val encoded = phase(s"$round bpe encode") {
        val e = graft.llm.Bpe.encode(mixed, model, "text", "doc_id")
          .withColumnRenamed("n_subwords", "n_tokens")
        e.write.format("noop").mode("overwrite").save(); e
      }
      phase(s"$round exportEncoded (pack+publish)") {
        graft.llm.Shards.exportEncoded(spark, out, encoded,
          shardTokens = 2000L, epoch = 1L)
      }
    }
    spark.stop()
  }
}

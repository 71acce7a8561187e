package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only (r19 optimization round): phase-timing probe for the
  * q03/q10_materialized pipeline — replicates GauntletQueries.cdcMaterialize
  * step by step and prints wall-clock per phase, so the fs_bound 15 s has
  * an attribution (changelog write vs stream drains vs final query).
  */
object ProfileCdcMat {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Engine.local(cores = cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Sinks
    // r20: count Spark JOBS per phase — the per-micro-batch fixed cost
    // the r19 verdict's #1 targets is jobs (touched distinct +
    // checkpoint materialization + write), so the before/after evidence
    // must show the job count per drain, not just seconds
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
    // the orders leg of q03_materialized, phase-timed
    val src = graft.core.Engine.table(spark, dir, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft-prof-cdc").toString
    val chDir = s"$base/changelog"; val target = s"$base/table"; val ckpt = s"$base/ckpt"
    val keyCols = Seq("o_orderkey")
    val keyCol = col("o_orderkey")
    val fin = src.withColumn("op", lit("u")).withColumn("__v", lit(3L))
    val stale = src.where(pmod(keyCol, lit(7L)) === 0L)
      .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 500 DAYS"))
      .withColumn("o_orderpriority", lit("9-POISON"))
      .withColumn("op", lit("c")).withColumn("__v", lit(1L))
    val gi = src.where(pmod(keyCol, lit(9L)) === 0L)
      .withColumn("o_orderkey", -col("o_orderkey"))
      .withColumn("op", lit("c")).withColumn("__v", lit(1L))
    val gd = src.where(pmod(keyCol, lit(9L)) === 0L)
      .withColumn("o_orderkey", -col("o_orderkey"))
      .withColumn("op", lit("d")).withColumn("__v", lit(2L))
    val ch = fin.unionByName(stale).unionByName(gi).unionByName(gd)
      .withColumn("__b", pmod(hash(col("o_orderkey"), col("__v")), lit(4)))
    phase("changelog write") {
      ch.repartition(col("__b")).write.mode("overwrite")
        .partitionBy("__b").parquet(chDir)
    }
    val stream = spark.readStream.schema(ch.schema)
      .option("maxFilesPerTrigger", "1").parquet(chDir).drop("__b")
    phase("stream drain (4 micro-batches)") {
      val q = Sinks.foreachBatchUpsert(stream, target, ckpt, keyCols, "__v",
        nBuckets = 8, bucketCols = Nil)
      q.awaitTermination()
    }
    phase("final read count") {
      Sinks.currentState(spark, target).drop("op", "__v")
        .write.format("noop").mode("overwrite").save()
    }
    // second run of the drain against a FRESH checkpoint+target to see a
    // warm-JVM drain cost
    val target2 = s"$base/table2"; val ckpt2 = s"$base/ckpt2"
    val stream2 = spark.readStream.schema(ch.schema)
      .option("maxFilesPerTrigger", "1").parquet(chDir).drop("__b")
    phase("stream drain (warm, fresh target)") {
      val q = Sinks.foreachBatchUpsert(stream2, target2, ckpt2, keyCols, "__v",
        nBuckets = 8, bucketCols = Nil)
      q.awaitTermination()
    }
    spark.stop()
  }
}

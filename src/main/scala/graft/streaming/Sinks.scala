package graft.streaming

import graft.cdc.Materialize
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A8 — `foreachBatch` upsert sink: the standard way a CDC consumer applies
  * a change stream to a queryable target table (the reference's whole
  * purpose per /root/reference/README.md:13 is feeding such consumers).
  *
  * Target layout: parquet partitioned by a hash bucket of the key
  * (`__kb`), so each micro-batch rewrites ONLY the buckets it touches
  * (dynamic partition overwrite) and reads back only those buckets
  * (partition-pruned scan) — at 100 TB the per-batch cost is proportional
  * to the touched working set, not the table. On a lakehouse table format
  * this whole function is a single MERGE INTO; plain parquet needs the
  * read-merge-overwrite cycle below.
  *
  * The stored state keeps the latest event per key INCLUDING delete
  * tombstones, so a replayed or out-of-order batch can never resurrect a
  * deleted key; readers get live rows via [[currentState]]. Re-applying a
  * batch is idempotent (latest-version-wins), which is exactly what
  * foreachBatch's at-least-once contract requires for end-to-end
  * exactly-once tables.
  */
object Sinks {

  /** Merge one batch of flattened change events into the target.
    * `versionCol` must totally order events per key (e.g. lsn).
    */
  def applyUpsertBatch(batch: DataFrame, targetDir: String, keyCols: Seq[String],
                       versionCol: String, nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = batch.withColumn("__kb", pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
    // buckets touched by this batch — bounded by nBuckets, a driver-safe collect
    val touched = b.select(col("__kb")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val existing =
      if (fs.exists(new Path(targetDir)))
        // partition-pruned: only the touched buckets are read
        Some(spark.read.parquet(targetDir).where(col("__kb").isin(touched: _*)))
      else None
    val all = existing.map(_.unionByName(b, allowMissingColumns = true)).getOrElse(b)
    val merged = Materialize.latestByKey(all, keyCols, Seq(col(versionCol)))
      // materialize BEFORE the overwrite below deletes the very files the
      // `existing` branch reads — the classic self-overwrite hazard
      .localCheckpoint(true)
    merged.write.mode("overwrite").partitionBy("__kb").parquet(targetDir)
  }

  /** A8 — attach the upsert sink to a (streaming) frame of flattened
    * change events. Batches apply serially in batch-id order; recovery
    * replays the in-flight batch, which [[applyUpsertBatch]] absorbs
    * idempotently.
    */
  def foreachBatchUpsert(changes: DataFrame, targetDir: String, checkpointDir: String,
                         keyCols: Seq[String], versionCol: String,
                         nBuckets: Int = 16,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpsertBatch(batch, targetDir, keyCols, versionCol, nBuckets)
      }
      .start()

  /** Live rows of the materialized table (tombstones filtered, layout
    * column dropped).
    */
  def currentState(spark: SparkSession, targetDir: String,
                   opCol: String = "op", deleteOp: String = "d"): DataFrame =
    spark.read.parquet(targetDir).where(col(opCol) =!= deleteOp).drop("__kb")
}

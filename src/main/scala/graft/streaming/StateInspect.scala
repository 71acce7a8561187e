package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming-state introspection: read a Structured Streaming checkpoint's
  * operator state back as DataFrames, via Spark's built-in `state-metadata`
  * and `statestore` v2 sources.
  *
  * Why it exists: a CDC materialization or streaming upsert keeps its
  * source of truth inside the checkpoint's state store. When a pipeline
  * misbehaves, the question is always "what does the STATE say for key X?"
  * — these readers answer it with plain SQL over the checkpoint instead of
  * replaying the topic, and at scale they read only the state files (one
  * task per state partition, no job rerun, no driver materialization).
  */
object StateInspect {

  /** One row per stateful operator per state store in the checkpoint:
    * operator/store names, partition count, the batch-id range still
    * available — the map you consult before [[store]].
    */
  def metadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)

  /** Keyed state rows of one stateful operator, as of the last committed
    * batch (or `batchId`). Columns are source-defined: `key` / `value`
    * structs (plus `partition_id`) for aggregations/dedup; stream-stream
    * joins expose per-side stores via `joinSide`.
    */
  def store(spark: SparkSession, checkpoint: String,
            operatorId: Int = 0, batchId: Option[Long] = None,
            storeName: Option[String] = None,
            joinSide: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId)
    batchId.foreach(b => r = r.option("batchId", b))
    storeName.foreach(n => r = r.option("storeName", n))
    joinSide.foreach(sd => r = r.option("joinSide", sd))
    r.load(checkpoint)
  }
}

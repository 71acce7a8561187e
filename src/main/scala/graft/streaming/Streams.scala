package graft.streaming

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming transforms (J1-J7, J9). Every function here is
  * source-agnostic: it accepts either a streaming or a batch DataFrame, so
  * the exact same plan is differential-tested in batch (DuckDB oracle) and
  * then run as a stream (MemoryStream replay, Trigger.AvailableNow) — the
  * batch-equivalence strategy of SURVEY.md §5.
  *
  * Streaming state posture at scale: every stateful op carries a watermark
  * bound so state is evicted, and keys are hash-partitioned by Spark's
  * state-store layout (one store per shuffle partition — sizing
  * `shuffle.partitions` sizes state parallelism).
  */
object Streams {

  /** J1/J2 — tumbling (slide == width) or sliding window aggregation. */
  def windowedCounts(events: DataFrame, tsCol: String, width: String,
                     slide: Option[String] = None,
                     extraKeys: Seq[String] = Nil,
                     valueCol: String = "value"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), width, s)
      case None    => window(col(tsCol), width)
    }
    events
      .groupBy(win.as("w") +: extraKeys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(Seq(col("w.start").as("w_start"), col("w.end").as("w_end")) ++
        extraKeys.map(col) ++ Seq(col("n"), col("sum_value")): _*)
  }

  /** J3 — session windows: gap-based sessions per key. */
  def sessionized(events: DataFrame, tsCol: String, gap: String,
                  keyCols: Seq[String], valueCol: String = "value"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("s") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(keyCols.map(col) ++
        Seq(col("s.start").as("s_start"), col("s.end").as("s_end"),
          col("n_events"), col("sum_value")): _*)

  /** J4 — attach a watermark (no-op on batch frames, where Spark ignores
    * withWatermark).
    */
  def withLateness(events: DataFrame, tsCol: String, delay: String): DataFrame =
    if (events.isStreaming) events.withWatermark(tsCol, delay) else events

  /** J5 — streaming dedup by event id within the watermark. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, delay: String,
                           idCols: Seq[String]): DataFrame = {
    val wm = withLateness(events, tsCol, delay)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(idCols)
    else wm.dropDuplicates(idCols)
  }

  /** J6 — stream-static enrichment join (static side broadcast). */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** K9 at scale — stream-static similarity as a sign-bucket EQUI-join.
    *
    * Both sides carry a deterministic random-hyperplane sign bucket
    * ([[VectorFunctions.signBucket]]); the join key is the bucket and the
    * cosine threshold is a post-join filter. Candidate generation is
    * therefore hash-partitionable — the physical plan is a hash/merge
    * equi-join, never a BroadcastNestedLoopJoin over the corpus (which is
    * a broadcast OOM by construction at 100 TB). Recall follows the LSH
    * S-curve and is tuned with `nPlanes` (fewer planes → bigger buckets →
    * higher recall & cost); the brute-force all-pairs form remains the
    * small-probe-set correctness baseline (`k9_neardup_bruteforce`).
    * Source-agnostic: the same plan runs batch (oracle-checked) and
    * streaming (MemoryStream replay).
    */
  def bucketedSimJoin(stream: DataFrame, static: DataFrame,
                      streamVec: String, staticVec: String,
                      dim: Int, nPlanes: Int, threshold: Double): DataFrame = {
    val s = stream.withColumn("__bucket",
      VectorFunctions.signBucket(col(streamVec), nPlanes, dim))
    val c = static.withColumn("__bucket",
      VectorFunctions.signBucket(col(staticVec), nPlanes, dim))
    s.join(c, Seq("__bucket"))
      .withColumn("cosine", VectorFunctions.cosine(col(streamVec), col(staticVec)))
      .where(col("cosine") >= threshold)
      .drop("__bucket")
  }

  /** J7 — stream-stream join with a time-interval condition; both sides
    * watermarked so join state is bounded.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, key: String,
                   delay: String, lowerBound: String, upperBound: String): DataFrame = {
    val l = withLateness(left, leftTs, delay).alias("l")
    val r = withLateness(right, rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lowerBound") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperBound"))
  }
}

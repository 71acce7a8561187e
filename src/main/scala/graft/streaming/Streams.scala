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

  /** Skew-safe [[bucketedSimJoin]] — with only 2^nPlanes buckets, ONE
    * hot static bucket is the expected case, and every micro-batch pays
    * its skewed join forever (AQE cannot re-plan inside a running
    * stream). Static bucket sizes are probed ONCE at plan-build time
    * (the static side is fixed for the stream's lifetime; ≤ 2^nPlanes
    * rows collected): buckets over `maxStaticBucketRows` split into
    * s = ⌈n/max⌉ deterministic salt partitions of the STATIC side, and
    * stream rows landing in a hot bucket replicate to all s salts via a
    * broadcast block table — every (stream, static) same-bucket pair
    * still matches exactly once (the static row has ONE salt), result
    * row-identical to the plain join (spec-pinned), per-partition static
    * state bounded at ~maxStaticBucketRows. Cost: stream-side rows in
    * hot buckets amplify s×; cold buckets join untouched, and with no
    * hot bucket the returned plan IS the plain join.
    */
  def bucketedSimJoinSkewed(stream: DataFrame, static: DataFrame,
                            streamVec: String, staticVec: String,
                            dim: Int, nPlanes: Int, threshold: Double,
                            maxStaticBucketRows: Long = 1000000L): DataFrame = {
    require(maxStaticBucketRows >= 1, s"maxStaticBucketRows must be >= 1: $maxStaticBucketRows")
    val s = stream.withColumn("__bucket",
      VectorFunctions.signBucket(col(streamVec), nPlanes, dim))
    val c = static.withColumn("__bucket",
      VectorFunctions.signBucket(col(staticVec), nPlanes, dim))
    def verified(j: DataFrame) = j
      .withColumn("cosine", VectorFunctions.cosine(col(streamVec), col(staticVec)))
      .where(col("cosine") >= threshold)
      .drop("__bucket")
    // one action over the STATIC side only; ≤ 2^nPlanes rows
    val hot = c.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxStaticBucketRows)
      .withColumn("__s",
        ceil(col("__n").cast("double") / lit(maxStaticBucketRows.toDouble)).cast("int"))
      .select(col("__bucket"), col("__s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    if (hot.isEmpty) verified(s.join(c, Seq("__bucket")))
    else {
      val spark = static.sparkSession
      import spark.implicits._
      val hotKeys = hot.map(_._1).toSeq
      val plain = verified(
        s.where(!col("__bucket").isin(hotKeys: _*))
          .join(c.where(!col("__bucket").isin(hotKeys: _*)), Seq("__bucket")))
      val splits = hot.toSeq.toDF("__bucket", "__s")
      val cHot = c.where(col("__bucket").isin(hotKeys: _*))
        .join(broadcast(splits), Seq("__bucket"))
        .withColumn("__salt", pmod(hash(col(staticVec)), col("__s")))
        .drop("__s")
      val blocks = splits
        .select(col("__bucket"), explode(sequence(lit(0), col("__s") - 1)).as("__salt"))
      val sHot = s.where(col("__bucket").isin(hotKeys: _*))
        .join(broadcast(blocks), Seq("__bucket"))
      val hotJoined = verified(
        sHot.join(cHot, Seq("__bucket", "__salt")).drop("__salt"))
      plain.unionByName(hotJoined)
    }
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

  /** J7 outer form — stream-stream LEFT OUTER interval join. Matches
    * emit like the inner form; an UNMATCHED left row emits with nulled
    * right columns once the watermark passes its join window (Spark's
    * outer-result-on-state-expiry rule — which is why both watermarks
    * are mandatory here, not just state hygiene: without them the
    * engine could never prove "no match will arrive" and unmatched rows
    * would be held forever). Same bounded state as the inner form; rows
    * whose window the final watermark has not yet passed remain pending
    * — an AvailableNow drain emits outer results only for windows below
    * max(event time) - delay.
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
                        leftTs: String, rightTs: String, key: String,
                        delay: String, lowerBound: String,
                        upperBound: String): DataFrame = {
    val l = withLateness(left, leftTs, delay).alias("l")
    val r = withLateness(right, rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lowerBound") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperBound"),
      "left_outer")
  }

  /** J7 full-outer form — BOTH sides' unmatched rows emit with nulled
    * opposite columns on watermark expiry (left-outer's rule applied
    * symmetrically; both watermarks mandatory for the same reason).
    * The audit-complete join: every signup AND every orphaned click
    * survives — the shape reconciliation pipelines need, where a
    * dropped row on either side is a miscount.
    */
  def intervalJoinFull(left: DataFrame, right: DataFrame,
                       leftTs: String, rightTs: String, key: String,
                       delay: String, lowerBound: String,
                       upperBound: String): DataFrame = {
    val l = withLateness(left, leftTs, delay).alias("l")
    val r = withLateness(right, rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lowerBound") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperBound"),
      "full_outer")
  }
}

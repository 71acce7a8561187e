package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** X6 — hot-key detection and the auto-salted join built on it.
  *
  * [[Joins.saltedJoin]] (X1) salts EVERY row: correct, but it multiplies
  * the small side by the salt factor even for the 99.9% of keys that were
  * never hot, and the caller has to know a priori that the join is skewed.
  * The production shape is: detect the hot keys first (exact count or a
  * one-pass Misra–Gries summary), then salt ONLY the hot slice and run the
  * cold slice as a plain equi-join. At 100 TB the hot-key list is tiny
  * (keys above a count threshold — by definition few), so it broadcasts,
  * and the small side is replicated `saltFactor`× only for those few keys.
  */
object Skew {

  /** Exact hot keys: every key of `keyCol` with at least `minCount` rows.
    * One map-side-combined groupBy — the exact diagnostic you run before
    * deciding a join needs the salted path. SQL-expressible (HAVING).
    */
  def hotKeys(df: DataFrame, keyCol: String, minCount: Long): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Skew-aware equi-join of `big` (potentially hot keys) with `small`.
    *
    * 1. Count `big`'s keys once (map-side combine — one shuffle of the
    *    distinct-key aggregate, NOT the data) and keep keys with
    *    ≥ `hotThreshold` rows; that list is broadcast (hot keys are few
    *    by definition — if they weren't, no threshold would call them hot).
    * 2. Cold slice: plain equi-join — AQE handles residual moderation.
    * 3. Hot slice: big side salted with a uniform shard in
    *    [0, saltFactor), small side restricted to hot keys and exploded
    *    across all shards, equi-join on (key, salt).
    *
    * Inner-join semantics on `key` are exactly those of
    * `big.join(small, key)`: the hot/cold split partitions `big`'s rows,
    * each row joins the identical set of `small` matches on either path,
    * and the salt columns are internal. The contract query hash-matches
    * the plain-join oracle on a deliberately skewed key.
    */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                     hotThreshold: Long = 100000L,
                     saltFactor: Int = 8): DataFrame = {
    splitSaltedJoin(big, small, key,
      hotKeys(big, key, hotThreshold).select(col(key)), saltFactor)
  }

  /** [[autoSaltedJoin]] with the hot-key list taken from the one-pass
    * [[MisraGries]] sketch instead of the exact groupBy — the 100 TB
    * detection path (no key-cardinality shuffle; the fact table is read
    * once, narrow).
    *
    * Correctness does NOT depend on the sketch: the hot/cold split only
    * routes rows, and both routes implement the identical inner-join
    * semantics — a missed hot key degrades to the cold path (AQE's skew
    * split then moderates it), a false positive pays one needless salt
    * replication. That routing-only role is why the contract query can
    * hash-match the plain-join oracle even though the sketch itself is
    * merge-order-dependent. MG's guarantee does the tuning math: a key
    * with true count c surfaces with est ≥ c − N/(k+1), so size k well
    * above N/hotThreshold (and/or lower the est filter by that margin)
    * and every truly hot key routes to the salted path.
    */
  def autoSaltedJoinApprox(big: DataFrame, small: DataFrame, key: String,
                           sketchK: Int = 64,
                           hotThreshold: Long = 100000L,
                           saltFactor: Int = 8): DataFrame =
    splitSaltedJoin(big, small, key,
      heavyHitters(big, col(key), sketchK)
        .where(col("est") >= hotThreshold)
        .select(col("key").cast(big.schema(key).dataType).as(key)),
      saltFactor)

  /** The shared split-and-salt core: rows of `big` whose key is in `hot`
    * take the salted path, the rest join plain; exact inner-join
    * semantics either way, so the hot list is pure routing.
    */
  private def splitSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                              hotList: DataFrame, saltFactor: Int): DataFrame = {
    // MATERIALIZE the hot list before building the split (r13 advice):
    // the three semi/anti joins below are evaluated lazily by the caller,
    // and a persist+unpersist-on-return left them recomputing the list —
    // harmless for the exact groupBy, but the Misra-Gries list is
    // merge-order-dependent, so three independent recomputes could each
    // see a DIFFERENT hot set and a key flipping hot/cold between them
    // would drop or duplicate join rows (only Spark's broadcast-exchange
    // reuse masked it). localCheckpoint(true) evaluates ONCE and severs
    // lineage, so every consumer reads the same frozen (tiny) list.
    val hot = hotList.localCheckpoint(true)
    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigCold = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    val cold = bigCold.join(small, Seq(key))
    val salted = bigHot.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = smallHot.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // the hot sides join on ONE composite key `__ks = struct(key, salt)`
    // rather than the column pair — r19, the r18 verdict's #7: when
    // either input is a bucketed/clustered table, its scan reports
    // HashPartitioning(key), which SATISFIES a (key, salt) column-pair
    // join's ClusteredDistribution (clustering on a SUBSET of the join
    // keys co-locates; same key → same partition regardless of salt), so
    // EnsureRequirements would keep the bucket layout, co-partition the
    // other side on the bare key, and land every salt shard of a hot key
    // back in ONE partition — the salt silently defeated exactly where
    // it matters. The struct key is NOT satisfied by the bare-key
    // layout, so a shuffle join must exchange both sides on __ks (hot
    // keys forfeit bucket locality by construction — this spread IS the
    // point), while the planner keeps its OTHER freedoms: a
    // broadcast-small replicated side still plans as BroadcastHashJoin
    // with ZERO exchanges of the hot probe slice (an explicit
    // repartition — the r19 first cut — forced a full shuffle of the
    // highest-volume rows exactly where none was needed; the bucket
    // defeat can only arise in shuffle joins). The COLD slice joins
    // plain and keeps whatever locality its inputs carry
    // (ClusteredSinkSpec pins both halves). Null keys never reach the
    // hot path (the semi-join on the hot list drops them), so struct
    // null-field equality cannot widen the join.
    val hotJoined = salted
      .withColumn("__ks", struct(col(key), col("__salt")))
      .join(replicated.withColumn("__ks", struct(col(key), col("__salt")))
          .drop(key, "__salt"),
        Seq("__ks"))
      .drop("__ks", "__salt")
    cold.unionByName(hotJoined)
  }

  /** E13 — Misra–Gries heavy-hitter summary as a mergeable UDAF: one pass,
    * bounded memory (≤ k counters per partial), map-side combinable.
    *
    * Guarantees (the bounding spec pins all three): for stream length N,
    * (a) every key with true count > N/(k+1) is in the summary,
    * (b) estimates never exceed the true count,
    * (c) estimates undershoot by at most N/(k+1).
    *
    * Merge is the Agarwal et al. mergeable-summaries rule: sum counters
    * keywise, then subtract the (k+1)-th largest counter from every
    * counter and drop the non-positive ones — the error bounds compose
    * across partials, which is what makes this safe as a distributed
    * aggregate (partial per partition, merge at the exchange).
    *
    * This is the 100 TB path for [[hotKeys]]: the exact groupBy is fine
    * when the key cardinality fits a shuffle; the sketch answers "which
    * keys are hot" in one narrow pass when it doesn't. Which keys survive
    * (below the guarantee threshold) and their exact estimates depend on
    * partition merge order → declared rows-only; SkewSpec bounds it.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      if (b.contains(key) || b.size < k) b.updated(key, b.getOrElse(key, 0L) + 1L)
      else { // decrement-all step, realized lazily: drop zeros
        val dec = b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        dec // the incoming key's single count is cancelled by the same decrement
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = (b1.keySet ++ b2.keySet).iterator
        .map(key => key -> (b1.getOrElse(key, 0L) + b2.getOrElse(key, 0L))).toMap
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** [[MisraGries]] as a one-column UDAF over a string key; returns the
    * summary exploded to (key, est) rows sorted by estimate descending —
    * never collected: the map column explodes in-plan.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    val agg = udaf(new MisraGries(k))
    df.select(keyCol.cast("string").as("__k"))
      .agg(agg(col("__k")).as("mg"))
      .select(explode(col("mg")).as(Seq("key", "est")))
      .orderBy(col("est").desc, col("key"))
  }
}

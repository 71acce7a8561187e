package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Embedding clustering: deterministic fixed-point Lloyd k-means — the
  * semantic-dedup / topic-bucketing primitive of training-data pipelines
  * (cluster the corpus, then sample/dedup within clusters).
  *
  * Cross-engine exactness by construction: float embeddings are quantized
  * to integers once (`floor(x * scale + 0.5)`), and every subsequent step
  * — squared-L2 distances, argmin, centroid means (floor division) — is
  * integer arithmetic. No accumulation-order nondeterminism, no float
  * drift through iterations (one near-boundary float flip would cascade
  * into a completely different clustering), so a SQL oracle reproduces the
  * final model bit-for-bit. Quantization error is 0.5/scale per component
  * — noise relative to any embedding model's own variance.
  *
  * Scale shape per iteration: assignment is a pure codegen'd projection
  * against k BROADCAST-LITERAL centroids (no join, no shuffle of the
  * corpus); the centroid update is one map-side-combinable shuffle with k
  * groups and `dim` sum columns; the driver holds only k × dim longs
  * (same boundedness class as the IVF centroid collect). The corpus is
  * persisted across iterations — the standard iterative-ML trade.
  */
object Clustering {

  /** Final model: per-point assignments, the quantized centroids, and the
    * per-cluster row counts (free — the last Lloyd round's update agg
    * already collected them alongside the sums; k rows, driver-bounded).
    */
  case class KmeansModel(assignments: DataFrame,
                         centroids: Seq[(Long, Seq[Long])],
                         clusterSizes: Seq[(Long, Long)] = Nil)

  /** Lloyd k-means on a quantized copy of `vecCol`.
    *
    * Init: the k rows with the smallest `idCol` (deterministic, no RNG —
    * ids are hash-shuffled upstream in any real corpus; pass a
    * pre-sampled frame if you want k-means++ flavored seeds).
    * Each of `iters` rounds assigns every point to its nearest centroid
    * (squared L2, ties to the lowest centroid id) and recomputes centroids
    * as the floor-divided component mean. Clusters that lose all points
    * are dropped (mirrored exactly by the oracle).
    *
    * Returns assignments from the LAST round and the centroids computed
    * FROM those assignments.
    */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
             iters: Int, scale: Long = 1000000L): KmeansModel = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val q = df.select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * scale + lit(0.5d)).cast("long")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // shape validation rides the pass that FILLS the cache (r9 verdict:
      // a separate guard agg over the raw frame cost one whole extra
      // corpus scan — iters+2 reads instead of iters+1). Same fail-fast:
      // an empty frame, a null vector, or mixed lengths would otherwise
      // surface as a NoSuchElementException at init or — worse — silently
      // null-padded centroid sums iterations later. `transform` maps null
      // vectors to null (element count preserved otherwise), so the
      // quantized projection carries exactly the raw frame's shape.
      val shape = q.agg(
        min(size(col("v"))).as("lo"), max(size(col("v"))).as("hi"),
        count(when(col("v").isNull, 1)).as("nulls"), count(lit(1)).as("n")).head()
      require(shape.getLong(3) > 0, "kmeans needs a non-empty input frame")
      require(shape.getLong(2) == 0, s"kmeans input has ${shape.getLong(2)} null vectors")
      require(shape.getInt(0) == shape.getInt(1),
        s"kmeans needs uniform vector length: found sizes ${shape.getInt(0)}..${shape.getInt(1)}")
      val dim = shape.getInt(0)
      require(dim > 0, "kmeans vectors must be non-empty")
      // deterministic init: k smallest ids, centroid id = rank in id order
      var centroids: Seq[(Long, Seq[Long])] =
        q.orderBy(col("id")).limit(k).collect().zipWithIndex.map {
          case (r, i) => (i.toLong, r.getSeq[Long](1))
        }.toSeq

      var assigned: DataFrame = null
      var sizes: Seq[(Long, Long)] = Nil
      for (_ <- 1 to iters) {
        assigned = assign(q, centroids)
        val sums = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n"),
            (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i")): _*)
          .collect()
        centroids = sums.map { r =>
          val n = r.getLong(1)
          (r.getLong(0), (0 until dim).map(i => Math.floorDiv(r.getLong(2 + i), n)))
        }.sortBy(_._1).toSeq
        // the counts of the FINAL assignments, kept from the last round —
        // consumers (SemDeDup's skew probe) get cluster sizes for free
        sizes = sums.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      }
      KmeansModel(assigned.select(col("id"), col("cluster")), centroids, sizes)
    } finally q.unpersist()
  }

  /** Above this many centroid elements (k × dim), [[assign]] stops
    * embedding the centroids as a plan literal and ships them as
    * broadcast DATA instead. A `typedLit` is re-serialized into every
    * task binary and codegen unit — fine at contract scale (k=4 × 64 =
    * 256 longs), a scale-killer at real semantic-dedup scale (k≈1000 ×
    * dim 1024 ≈ 8 MB in EVERY task; the bench's task-binary warnings are
    * the small preview). 16384 longs ≈ 128 KB keeps plan/codegen size
    * comfortably bounded.
    */
  private[graft] val AssignLiteralMaxElems = 16384L

  /** Nearest-centroid projection: the fused native argmin
    * ([[graft.functions.NearestCentroid]] — whole-stage codegen, pure
    * long math, no intermediate distance array) over the centroid list;
    * ZERO corpus shuffle on either transport. Ties break to the lowest
    * centroid id (the list is sorted by id and the expression keeps the
    * FIRST minimum, like the `array_position` it replaced).
    *
    * Centroid transport is gated on k × dim: below
    * [[AssignLiteralMaxElems]] they ride as a plan literal; above, as ONE
    * broadcast row (torrent-broadcast block, deserialized once per
    * executor) cross-joined in — a 1-row condition-free broadcast join is
    * the documented-safe BNLJ shape (cf. k7's corpus-count fold), and the
    * corpus itself is still never shuffled or broadcast.
    */
  private[graft] def assign(q: DataFrame,
                            centroids: Seq[(Long, Seq[Long])]): DataFrame = {
    val cids = centroids.map(_._1)
    val cents = centroids.map(_._2)
    val dim = cents.headOption.map(_.size.toLong).getOrElse(0L)
    import graft.functions.NearestCentroid
    if (centroids.size * dim <= AssignLiteralMaxElems) {
      q.withColumn("cluster",
        element_at(typedLit(cids), NearestCentroid(col("v"), typedLit(cents))))
    } else {
      val spark = q.sparkSession
      import spark.implicits._
      val centRow = Seq((cids, cents)).toDF("__cids", "__cents")
      q.join(broadcast(centRow))
        .withColumn("cluster",
          element_at(col("__cids"), NearestCentroid(col("v"), col("__cents"))))
        .drop("__cids", "__cents")
    }
  }

  /** Interpreted HOF formulation of [[assign]] — the differential-test
    * witness for the native expression (bit-parity pinned by
    * `NearestCentroidSpec` on both transports). Not used in any hot
    * path.
    */
  private[graft] def assignHof(q: DataFrame,
                               centroids: Seq[(Long, Seq[Long])]): DataFrame = {
    val cids = centroids.map(_._1)
    val cents = centroids.map(_._2)
    val dim = cents.headOption.map(_.size.toLong).getOrElse(0L)
    def argmin(dists: Column, ids: Column): Column =
      element_at(ids, array_position(dists, array_min(dists)).cast("int"))
    if (centroids.size * dim <= AssignLiteralMaxElems) {
      val dists = transform(typedLit(cents),
        c => aggregate(zip_with(col("v"), c, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      q.withColumn("__d", dists)
        .withColumn("cluster", argmin(col("__d"), typedLit(cids)))
        .drop("__d")
    } else {
      val spark = q.sparkSession
      import spark.implicits._
      val centRow = Seq((cids, cents)).toDF("__cids", "__cents")
      val dists = transform(col("__cents"),
        c => aggregate(zip_with(col("v"), c, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      q.join(broadcast(centRow))
        .withColumn("__d", dists)
        .withColumn("cluster", argmin(col("__d"), col("__cids")))
        .drop("__d", "__cids", "__cents")
    }
  }

  /** SemDeDup-style semantic near-duplicate pairs: cluster the corpus
    * with the fixed-point k-means, then compare embeddings only WITHIN a
    * cluster — (id_a, id_b, cosine) for every same-cluster pair at or
    * over `threshold` (cosine rounded to 6 decimals BEFORE thresholding,
    * the shared oracle-exactness rule).
    *
    * This is the point of clustering in a dedup pipeline: the self-join
    * is bucketed by cluster id (ONE shuffle on the cluster key), so the
    * pair count is Σ c_i² over cluster sizes — never corpus all-pairs.
    * Size k so n/k stays bounded (SemDeDup uses k ≈ n/10k); the
    * assignment itself scales through the gated centroid transport
    * above. Cosine is the native codegen'd expression, bit-matched by
    * the DuckDB oracle (k3 precedent).
    *
    * Real corpora cluster unevenly, so clusters over `maxClusterRows`
    * run [[Similarity.boundedWithinGroupPairs]]' exact triangle-block
    * decomposition (row-identical, spec-pinned) instead of one quadratic
    * straggler task; the size probe is FREE — the model carries the
    * final per-cluster counts from the last Lloyd update agg, so no
    * extra pass over the corpus runs to detect skew.
    */
  def semanticNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                           k: Int, iters: Int, threshold: Double,
                           scale: Long = 1000000L,
                           maxClusterRows: Long = Similarity.DefaultMaxCellRows): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = kmeans(df, vecCol, idCol, k, iters, scale)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(model.assignments, Seq("id"))
      .select(col("cluster").as("__grp"), col("id"), col("v"))
    val sizes = model.clusterSizes.toDF("__grp", "n")
    Similarity.boundedWithinGroupPairs(vecs, sizes, threshold, maxClusterRows)
  }

  /** Per-cluster summary of a finished model: (cluster_id, n, centroid) —
    * the contract-facing view. Built from the model's driver-held
    * centroids (k rows) joined against the assignment counts.
    */
  def summary(model: KmeansModel): DataFrame = {
    val spark = model.assignments.sparkSession
    import spark.implicits._
    val cents = model.centroids.toDF("cluster", "centroid")
    model.assignments.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .join(cents, Seq("cluster"))
      .select(col("cluster").as("cluster_id"), col("n"), col("centroid"))
  }
}

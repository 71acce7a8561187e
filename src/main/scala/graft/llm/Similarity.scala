package graft.llm

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (K3/K4/K9).
  *
  * Two tiers, same API:
  *  - `bruteForceKnn` — exact: broadcast the (small) query set, score every
  *    corpus vector with codegen'd HOF math, per-query top-k via
  *    TakeOrdered-style window+filter. Linear in corpus size, embarrassingly
  *    parallel, zero corpus shuffle: THE baseline and the correctness oracle.
  *  - `ivfKnn` — approximate: corpus pre-clustered into `nCells` centroids
  *    (deterministic farthest-point seeding, a few Lloyd rounds); queries
  *    probe only the `nProbe` nearest cells. At 100 TB the cell assignment
  *    is a write-once partitioned layout (partitionBy(cell)), so a query
  *    touches nProbe/nCells of the data — this is the scale path.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` must be
    * broadcast-small (the typical case: a batch of probe vectors).
    * Result: (query id, neighbor id, cosine, rank 1..k).
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame,
                    vecCol: String, idCol: String, k: Int,
                    excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic IVF index: pick `nCells` centroids by farthest-point
    * traversal from the lexicographically-first vector, run `lloydRounds`
    * refinement passes, and assign every corpus vector to its nearest
    * centroid. Returns (corpus ∪ {cell}) plus the centroid table.
    * Centroids are tiny (nCells × dim) → always broadcast.
    */
  def ivfIndex(corpus: DataFrame, vecCol: String, idCol: String,
               nCells: Int, lloydRounds: Int = 2): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // NO corpus cache: at 100 TB the corpus cannot be cached; each Lloyd
    // round re-scans it (lloydRounds + 1 scans total) — the honest cost of
    // distributed k-means. Centroids ARE collected per round (nCells rows,
    // driver-bounded) so the assignment plan stays one broadcast join deep
    // instead of nesting round upon round of lazy lineage.
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // Farthest-point seeding on a bounded sample (deterministic order by id).
    val sample = c.orderBy(col("id")).limit(math.max(nCells * 64, 1024))
      .as[(Long, Seq[Float])].collect()
    val first = sample.head._2.map(_.toDouble).toArray
    val seeds = scala.collection.mutable.ArrayBuffer(first)
    def d2(a: Array[Double], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    while (seeds.size < nCells) {
      val far = sample.maxBy { case (_, v) => seeds.map(s => d2(s, v)).min }
      seeds += far._2.map(_.toDouble).toArray
    }
    var centroids: Seq[(Int, Seq[Double])] =
      seeds.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
    val dim = first.length
    // Lloyd refinement: assign → average, via `dim` per-dimension sum
    // columns in ONE map-side-combinable hash agg (the Clustering.kmeans
    // shape, unified here per the r7 review): nCells groups × (dim + 1)
    // columns, partial aggregation on the map side, no row amplification.
    // The posexplode + double-groupBy formulation this replaces pushed
    // dim× the corpus row count through the first hash aggregate. Only
    // the nCells averaged centroids come back to the driver.
    for (_ <- 0 until lloydRounds) {
      val cdf = centroids.toDF("cell", "centroid")
      val sums = assignCells(c, cdf)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i =>
            sum(element_at(col("v"), i + 1).cast("double")).as(s"s$i")): _*)
        .collect()
      centroids = sums.map { r =>
        val cnt = r.getLong(1)
        (r.getInt(0), (0 until dim).map(i => r.getDouble(2 + i) / cnt))
      }.sortBy(_._1).toSeq
    }
    val cdf = centroids.toDF("cell", "centroid")
    val indexed = assignCells(c, cdf)
      .select(col("id"), col("v"), col("cell"))
    (indexed, cdf)
  }

  /** Write-once IVF layout: the indexed corpus partitioned by `cell` on
    * disk plus the centroid table alongside. Queries through
    * [[ivfKnnPruned]] then read only the probed cells' files — the scan
    * is partition-pruned to ~nProbe/nCells of the data, which is what
    * makes IVF the 100 TB path (the index is built once per corpus
    * version, amortized over every query batch).
    */
  def ivfWriteIndex(corpus: DataFrame, vecCol: String, idCol: String,
                    nCells: Int, lloydRounds: Int, path: String): Unit = {
    val (indexed, centroids) = ivfIndex(corpus, vecCol, idCol, nCells, lloydRounds)
    indexed.write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** ANN top-k against the persisted layout. The probe set is
    * broadcast-small, so its distinct cells become a STATIC `isin`
    * partition filter — the vectors scan provably touches only the probed
    * cell directories (PartitionFilters in the plan), independent of
    * dynamic-pruning heuristics.
    */
  def ivfKnnPruned(spark: org.apache.spark.sql.SparkSession, path: String,
                   queries: DataFrame, vecCol: String, idCol: String,
                   k: Int, nProbe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("cell").asc)
    val probes = q.join(broadcast(centroids))
      .withColumn("dist", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val cells = probes.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
    val indexed = spark.read.parquet(s"$path/vectors")
      .where(col("cell").isin(cells: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    indexed.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Nearest-cell assignment with ZERO corpus shuffle: the (driver-
    * bounded, nCells × dim) centroid table rides as ONE broadcast row
    * and the argmin is the fused native
    * [[graft.functions.NearestCentroid]] expression — whole-stage
    * codegen, no per-centroid intermediate array (the interpreted HOF it
    * replaced allocated one distance array per row per pass, executed
    * `lloydRounds + 1` times over the corpus). Ties break to the lowest
    * cell id exactly as before: cells ride sorted ascending and the
    * expression keeps the FIRST minimum; the per-element double
    * arithmetic is unchanged, so assignments are bit-identical (pinned
    * by `NearestCentroidSpec`'s float-vs-double parity case).
    */
  private def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = centroids.select(col("cell"), col("centroid"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    val centRow = Seq((cents.map(_._1).toSeq, cents.map(_._2).toSeq))
      .toDF("__cells", "__cents")
    vecs.join(broadcast(centRow))
      .withColumn("cell", element_at(col("__cells"),
        graft.functions.NearestCentroid(col("v"), col("__cents"))))
      .drop("__cells", "__cents")
  }

  /** SemDeDup over a PERSISTED IVF index — the amortized form of
    * [[Clustering.semanticNearDupPairs]]: pairs are compared only within
    * an IVF cell, but the cells come from the write-once
    * `partitionBy(cell)` layout instead of a fresh k-means run, so
    * repeated dedup passes (every corpus version, every threshold sweep)
    * pay ONE shuffle on the cell key and zero clustering cost. Pair
    * count is Σ c_i² over cell sizes — never corpus all-pairs; size
    * `nCells` at index-build time so n/nCells stays bounded (for
    * k ≫ √n corpora build the index with more cells — the assignment
    * scales through the native argmin + broadcast-row transport).
    *
    * Within-cell pairs at or over `threshold` only: a vector pair split
    * across cells is never compared (the standard SemDeDup trade —
    * recall is tuned by nCells, pinned by the spec's subset/recall
    * bounds). Cosine is rounded to 6 decimals BEFORE thresholding, the
    * shared oracle-exactness rule.
    */
  def ivfSemanticNearDupPairs(spark: org.apache.spark.sql.SparkSession,
                              path: String, threshold: Double): DataFrame = {
    val indexed = spark.read.parquet(s"$path/vectors")
    val a = indexed.select(col("cell"), col("id").as("id_a"), col("v").as("__va"))
    val b = indexed.select(col("cell"), col("id").as("id_b"), col("v").as("__vb"))
    a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** ANN top-k through the IVF index: each query probes its `nProbe`
    * closest cells only.
    */
  def ivfKnn(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("cell").asc)
    val probes = q.join(broadcast(centroids))
      .withColumn("dist", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    indexed.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}

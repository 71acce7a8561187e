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
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v")).cache()
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
    var centroids = seeds.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
    // Lloyd refinement: assign → average. Aggregation is per-dimension
    // (posexplode + groupBy) so it stays distributed.
    for (_ <- 0 until lloydRounds) {
      val assigned = assignCells(c, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("p"))
        .select(col("cell"), transform(col("p"), e => e.getField("m")).as("centroid"))
    }
    val indexed = assignCells(c, centroids)
      .select(col("id"), col("v"), col("cell"))
    (indexed, centroids)
  }

  private def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dist").asc, col("cell").asc)
    vecs.join(broadcast(centroids))
      .withColumn("dist", squaredDistance(col("v"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "dist", "centroid")
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

package graft

import graft.llm.{Quantization, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the composed IVF-PQ layout: partition-pruned cells + ADC
  * shortlist + exact rerank must reproduce brute force when the probe
  * covers the corpus, and the derived code table must refuse loudly the
  * moment the index moves under it.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5 well-separated blobs (the IVF operating regime), dim 16 —
  // magnitudes inside the r16 requireGeomBound contract (|x| ≤ 11.86
  // at dim 16; the old ±40 corpus now refuses by design)
  private def blobCorpus() = {
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(5)(Seq.fill(16)(rnd.between(-10.0f, 10.0f)))
    (0 until 300).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + rnd.between(-0.25f, 0.25f)))
    }.toDF("id", "v")
  }

  private def bruteL2(rows: org.apache.spark.sql.DataFrame,
                      queries: org.apache.spark.sql.DataFrame,
                      kNN: Int): Set[(Long, Long, Int)] = {
    val corpus = rows.select(col("id"), col("v")).as[(Long, Seq[Float])].collect()
    val qs = queries.select(col("id"), col("v")).as[(Long, Seq[Float])].collect()
    qs.flatMap { case (qid, qv) =>
      corpus.filter(_._1 != qid)
        .map { case (nid, nv) =>
          (nid, qv.indices.map(i => (qv(i).toDouble - nv(i).toDouble) *
            (qv(i).toDouble - nv(i).toDouble)).sum)
        }
        .sortBy { case (nid, d) => (d, nid) }
        .take(kNN).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, r + 1) }
    }.toSet
  }

  test("full-probe IVF-PQ equals brute force; pruned probe stays in-blob exact") {
    val rows = blobCorpus()
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.ivfWriteIndex(rows, "v", "id", nCells = 5, lloydRounds = 2, path = path)
    val model = Quantization.ivfPqWriteCodes(spark, path, m = 4, k = 8)
    assert(model.dim === 16)
    val queries = rows.where(col("id") < 5L)
    // probe EVERY cell with a blob-sized shortlist -> the two-stage read
    // must equal brute force row for row
    val full = Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 5, shortlist = 60)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(full === bruteL2(rows, queries, 5))
    // nProbe=1 on well-separated blobs: the query's own cell holds its
    // true neighbors, so the pruned read is STILL exactly brute force
    val pruned = Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 1, shortlist = 60)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(pruned === full)
  }

  test("a stale code table refuses loudly after an append") {
    val rows = blobCorpus()
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-stale").toString
    Similarity.ivfWriteIndex(rows.where(col("id") < 250L), "v", "id",
      nCells = 5, lloydRounds = 1, path = path)
    Quantization.ivfPqWriteCodes(spark, path, m = 4, k = 8)
    Similarity.ivfAppendBatch(spark, path,
      rows.where(col("id") >= 250L), "v", "id", batchId = 1L)
    val queries = rows.where(col("id") < 3L)
    val ex = intercept[IllegalArgumentException] {
      Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 5, shortlist = 30)
    }
    assert(ex.getMessage.contains("stale"))
    // re-deriving the codes heals it: the full-probe read over the
    // appended index must equal brute force over base ∪ appended — which
    // proves the appended batch is in the candidate universe
    Quantization.ivfPqWriteCodes(spark, path, m = 4, k = 8)
    val out = Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 5, shortlist = 300)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === bruteL2(rows, queries, 5))
  }

  test("append-encode: O(batch) codes equal a frozen-model encode, replay idempotent") {
    val rows = blobCorpus()
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    Similarity.ivfWriteIndex(rows.where(col("id") < 250L), "v", "id",
      nCells = 5, lloydRounds = 1, path = path)
    val model = Quantization.ivfPqWriteCodes(spark, path, m = 4, k = 8)
    // appending codes for a batch the index does not hold refuses
    val missing = intercept[IllegalArgumentException] {
      Quantization.ivfPqAppendCodes(spark, path, batchId = 7L)
    }
    assert(missing.getMessage.contains("ivfAppendBatch"))
    Similarity.ivfAppendBatch(spark, path,
      rows.where(col("id") >= 250L), "v", "id", batchId = 1L)
    // the crash-window surface: index appended, codes not yet — the read
    // REFUSES (never silently misses the batch) until append-codes lands
    val queries = rows.where(col("id") < 3L)
    intercept[IllegalArgumentException] {
      Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 5, shortlist = 300)
    }
    Quantization.ivfPqAppendCodes(spark, path, batchId = 1L)
    // the healed read covers the appended rows exactly
    val out = Quantization.ivfPqKnn(spark, path, queries, "v", "id",
        kNN = 5, nProbe = 5, shortlist = 300)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === bruteL2(rows, queries, 5))
    // parity: the appended partition's codes are EXACTLY what encoding
    // the batch with the frozen model yields (no retrain drift)
    def batchCodes() = spark.read.parquet(s"$path/pq_codes")
      .where(col("__batch") === 1L).select(col("id"), col("code"))
      .as[(Long, Array[Byte])].collect()
      .map { case (id, c) => id -> c.toSeq }.toMap
    val appended = batchCodes()
    val expected = Quantization.pqEncode(
        rows.where(col("id") >= 250L), "v", "id", model)
      .as[(Long, Array[Byte])].collect()
      .map { case (id, c) => id -> c.toSeq }.toMap
    assert(appended === expected)
    // replay: the same append lands on itself (dynamic overwrite), the
    // model's batch list stays deduplicated, the read keeps working
    Quantization.ivfPqAppendCodes(spark, path, batchId = 1L)
    assert(batchCodes() === expected)
    val (_, batches) = Quantization.pqLoadModel(spark, path)
    assert(batches === Seq(0L, 1L))
    assert(Quantization.ivfPqKnn(spark, path, queries, "v", "id",
      kNN = 5, nProbe = 5, shortlist = 300).count() === 15L)
  }
}

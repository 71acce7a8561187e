package graft

import graft.llm.{Quantization, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixed-point geometry's CONTRACT GUARDS (r16 advice): embeddings
  * whose quantized magnitude could push a squared distance past 2⁵³
  * refuse loudly at build/append time instead of silently voiding the
  * oracle-exactness guarantee, and indexes/models persisted by the
  * pre-r15 double geometry refuse with a versioned rebuild message
  * instead of an opaque encoder error.
  */
class GeomGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(scale: Float) = (0L until 64L).map { i =>
    (i, Array(scale + i % 3, scale - i % 5, i % 7 * 0.1f, 1.0f))
  }.toDF("vec_id", "embedding")

  test("ivfIndex refuses an out-of-contract magnitude; in-bound corpora build") {
    val bad = intercept[IllegalArgumentException] {
      Similarity.ivfIndex(vecs(1000.0f), "embedding", "vec_id", nCells = 4)
    }
    assert(bad.getMessage.contains("exact-arithmetic"))
    // |x| ~ 1 is far inside the bound — builds fine
    val (indexed, cents) =
      Similarity.ivfIndex(vecs(1.0f), "embedding", "vec_id", nCells = 4)
    assert(indexed.count() === 64L && cents.count() > 0L)
    // and the guard also fires on the rounds=0 dedicated path
    val bad0 = intercept[IllegalArgumentException] {
      Similarity.ivfIndex(vecs(1000.0f), "embedding", "vec_id",
        nCells = 4, lloydRounds = 0)
    }
    assert(bad0.getMessage.contains("exact-arithmetic"))
  }

  test("pqTrain and ivfAppendBatch refuse out-of-contract magnitudes") {
    val bad = intercept[IllegalArgumentException] {
      Quantization.pqTrain(vecs(1000.0f), "embedding", "vec_id", m = 2, k = 4)
    }
    assert(bad.getMessage.contains("exact-arithmetic"))
    val path = java.nio.file.Files.createTempDirectory("graft-geomg").toString
    Similarity.ivfWriteIndex(vecs(1.0f), "embedding", "vec_id",
      nCells = 4, lloydRounds = 1, path = path)
    val badBatch = (100L until 110L).map(i =>
      (i, Array(2000.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val appendErr = intercept[IllegalArgumentException] {
      Similarity.ivfAppendBatch(spark, path, badBatch, "embedding", "vec_id",
        batchId = 1L)
    }
    assert(appendErr.getMessage.contains("exact-arithmetic"))
  }

  test("a pre-fixed-point (double) persisted model refuses with a rebuild message") {
    val path = java.nio.file.Files.createTempDirectory("graft-geomfmt").toString
    // forge the old format: centroids as array<double>
    Seq((0, Seq(0.5d, 1.5d))).toDF("cell", "centroid")
      .write.parquet(s"$path/centroids")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfCentroids(spark, path)
    }
    assert(err.getMessage.contains("pre-fixed-point") &&
      err.getMessage.contains("rebuild"))
    // and the PQ model reader the same way
    val pq = java.nio.file.Files.createTempDirectory("graft-geomfmt-pq").toString
    Seq((2, 4, 2, 0, 0, Seq(0.5d, 1.5d), Seq(0L)))
      .toDF("m", "k", "sub_dim", "mi", "ki", "c", "batches")
      .write.parquet(s"$pq/pq_model")
    val err2 = intercept[IllegalArgumentException] {
      Quantization.pqLoadModel(spark, pq)
    }
    assert(err2.getMessage.contains("pre-fixed-point"))
  }
}

package graft

import graft.llm.Dedup
import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Containment-aware intake (round 14) — the scenario the r13 verdict
  * named: a boilerplate-wrapped VERBATIM repost (containment 1.0,
  * jaccard well under the 0.8 gate) sails through the jaccard-only
  * intake and must be dropped by scorer="containment"/"both". Pins both
  * the vs-index arm (new arrival always loses) and the intra-batch arm
  * (the strictly-smaller side loses — the containmentDedup rule).
  */
class ContainmentIntakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  // 200 distinct tokens → 198 shingles
  private val baseText = (0 until 200).map(i => s"w$i").mkString(" ")
  // the wrapped repost: a shingle-disjoint wrapper of similar size around
  // the verbatim base → every base shingle appears (containment vs base
  // = 1.0) but jaccard ≈ 198/400 ≈ 0.5, far under the 0.8 gate
  private val wrappedText =
    (0 until 200).map(i => s"b$i").mkString(" ") + " " + baseText

  test("setup sanity: the pair is an LSH candidate with containment 1.0, jaccard < 0.8") {
    val pairs = Dedup.containmentPairs(
        Seq((1L, baseText), (2L, wrappedText)).toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, k = 16, bands = 16,
        containmentThreshold = 0.9)
      .select("cont_a", "cont_b", "jaccard")
      .as[(Double, Double, Double)].collect()
    assert(pairs.length === 1, "the wrapped pair must band-collide (tune the texts if not)")
    val (ca, cb, j) = pairs.head
    assert(ca === 1.0 && cb < 0.6 && j < 0.8, s"got cont_a=$ca cont_b=$cb jaccard=$j")
  }

  test("vs-index: jaccard-only admits the wrapped repost; containment drops it") {
    def run(scorer: String): Set[Long] = {
      val idx = tmp(s"graft-cint-idx-$scorer")
      val adm = tmp(s"graft-cint-adm-$scorer") + "/t"
      Ingest.ingestBatch(Seq((1L, baseText)).toDF("doc_id", "text"),
        idx, adm, batchId = 0L, "text", "doc_id",
        shingleN = 3, k = 16, bands = 16, threshold = 0.8,
        scorer = scorer, containmentThreshold = 0.9)
      Ingest.ingestBatch(Seq((2L, wrappedText)).toDF("doc_id", "text"),
        idx, adm, batchId = 1L, "text", "doc_id",
        shingleN = 3, k = 16, bands = 16, threshold = 0.8,
        scorer = scorer, containmentThreshold = 0.9)
      Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    }
    assert(run("jaccard") === Set(1L, 2L),
      "jaccard-only should admit the wrapped repost (that's the gap)")
    assert(run("both") === Set(1L),
      "scorer=both must drop the wrapped repost against the index")
    assert(run("containment") === Set(1L))
  }

  test("intra-batch: the strictly-smaller contained doc loses, the superset survives") {
    val idx = tmp("graft-cint-idx-intra")
    val adm = tmp("graft-cint-adm-intra") + "/t"
    Ingest.ingestBatch(
      Seq((1L, baseText), (2L, wrappedText)).toDF("doc_id", "text"),
      idx, adm, batchId = 0L, "text", "doc_id",
      shingleN = 3, k = 16, bands = 16, threshold = 0.8,
      scorer = "both", containmentThreshold = 0.9)
    val got = Ingest.admitted(spark, adm).select("doc_id").as[Long].collect().toSet
    // containmentDedup rule: the contained (smaller-set) doc drops even
    // though it has the SMALLER id — unlike the jaccard min-id-wins arm
    assert(got === Set(2L))
  }

  test("scorer=jaccard stays byte-identical to the pre-round-14 path") {
    val docs = (0L until 40L).map { i =>
      (i, (0 until 30).map(t => s"t${(i % 7) * 31 + t}").mkString(" "))
    }
    val idxA = tmp("graft-cint-reg-a")
    val admA = tmp("graft-cint-reg-adm-a") + "/t"
    Ingest.ingestBatch(docs.toDF("doc_id", "text"), idxA, admA, 0L,
      "text", "doc_id", shingleN = 3, k = 8, bands = 4, threshold = 0.8)
    val defaulted = Ingest.admitted(spark, admA)
      .select("doc_id").as[Long].collect().toSet
    val idxB = tmp("graft-cint-reg-b")
    val admB = tmp("graft-cint-reg-adm-b") + "/t"
    Ingest.ingestBatch(docs.toDF("doc_id", "text"), idxB, admB, 0L,
      "text", "doc_id", shingleN = 3, k = 8, bands = 4, threshold = 0.8,
      scorer = "jaccard")
    val explicit = Ingest.admitted(spark, admB)
      .select("doc_id").as[Long].collect().toSet
    assert(defaulted === explicit)
    assert(defaulted.nonEmpty && defaulted.size < 40, "setup should dedup something")
  }
}

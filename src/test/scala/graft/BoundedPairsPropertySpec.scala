package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Generative row-parity law for [[Similarity.boundedWithinGroupPairs]]
  * (r9 verdict #5): four operators now ride the triangle-block core (IVF
  * cells, k-means clusters, sign buckets, Jaccard blocks), so its
  * evidence should be a LAW over random group-size distributions and
  * split factors, not three hand-picked cases — every (skewed-or-not)
  * input must produce the EXACT pair set of the plain within-group
  * self-join, for any maxGroupRows ≥ 1. Salting shapes only the physical
  * plan, never the pair set.
  *
  * The spec lives in package graft.llm to drive the core directly with
  * explicit (__grp, id, v) / (__grp, n) frames — the public callers pin
  * their own wiring; this pins the shared mechanism.
  */
class BoundedPairsPropertySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** Raw-scalacheck driver (the scalatest bridge artifact is not in the
    * offline cache) — the PropertySpec pattern.
    */
  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }

  // random group-size distribution: 1..5 groups of 1..45 rows each, a
  // 3-dim vector per row, and a split factor 1..50 — small enough that
  // several groups land on BOTH sides of the hot threshold across draws
  // (including s = 2..45-way splits and the all-plain case)
  private case class Case(groups: List[Int], maxGroupRows: Long, seed: Long)
  private val caseGen: Gen[Case] = for {
    nGroups <- Gen.chooseNum(1, 5)
    sizes <- Gen.listOfN(nGroups, Gen.chooseNum(1, 45))
    maxRows <- Gen.chooseNum(1L, 50L)
    seed <- Gen.chooseNum(0L, 1000000L)
  } yield Case(sizes, maxRows, seed)

  test("triangle-block pair set equals the plain self-join for random skew shapes") {
    import spark.implicits._
    forSamples(caseGen, 8) { c =>
      val rnd = new scala.util.Random(c.seed)
      var id = 0L
      val rows = c.groups.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map { _ =>
          id += 1
          (g, id, Seq.fill(3)(rnd.between(-5.0f, 5.0f)))
        }
      }
      val vecs = rows.toDF("__grp", "id", "v")
      val sizes = vecs.groupBy(col("__grp")).agg(count(lit(1)).as("n"))
      // threshold -1.0 keeps EVERY pair (cosine ∈ [-1, 1]) — the parity
      // claim is about the full pair set, not a filtered survivor set
      def pairSet(maxRows: Long) =
        Similarity.boundedWithinGroupPairs(vecs, sizes, threshold = -1.0, maxRows)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plain = pairSet(Long.MaxValue)
      val bounded = pairSet(c.maxGroupRows)
      val expectedCount = c.groups.map(s => s.toLong * (s - 1) / 2).sum
      assert(plain.size.toLong === expectedCount,
        s"plain join must emit every within-group pair (case $c)")
      assert(bounded === plain,
        s"triangle-block decomposition changed the pair set (case $c)")
    }
  }
}

/** Generative parity law for [[Mixing.tokenBudgetSample]]: for ANY
  * random corpus (doc count, token sizes, id spacing) and ANY budget,
  * the bucketed-cutoff decomposition must admit EXACTLY the documents
  * the naive global running sum admits — bucketing shapes only the
  * physical plan, never the sample. The oracle checks one fixed corpus
  * cross-engine; this pins the law over the input space.
  */
class TokenBudgetPropertySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }

  private case class Case(nDocs: Int, maxTokens: Int, budgetFrac: Double,
                          hexChars: Int, seed: Long)
  private val caseGen: Gen[Case] = for {
    n <- Gen.chooseNum(1, 120)
    mt <- Gen.chooseNum(1, 40)
    f <- Gen.chooseNum(0, 130).map(_ / 100.0) // 0..1.3× the corpus total
    h <- Gen.chooseNum(1, 2)
    seed <- Gen.chooseNum(0L, 1000000L)
  } yield Case(n, mt, f, h, seed)

  test("bucketed token-budget cutoff equals the naive global cumsum for random corpora") {
    import spark.implicits._
    forSamples(caseGen, 8) { c =>
      val rnd = new scala.util.Random(c.seed)
      // sparse ids so the md5 lottery order varies across draws; token
      // counts are exact words, so n_tokens is deterministic
      val docs = (0 until c.nDocs).map { i =>
        val id = i.toLong * rnd.between(1, 7) + rnd.between(0, 3)
        (id, Seq.fill(rnd.between(1, c.maxTokens + 1))("w").mkString(" "))
      }.distinctBy(_._1)
      val df = docs.toDF("doc_id", "text")
      val total = docs.map(_._2.split(" ").length.toLong).sum
      val budget = (total * c.budgetFrac).toLong
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__prio"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val naive = df
        .withColumn("__prio", md5(col("doc_id").cast("string")))
        .withColumn("__tok",
          size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
        .withColumn("__cum", sum(col("__tok")).over(w))
        .where(col("__cum") <= budget)
        .select("doc_id").as[Long].collect().toSet
      val bucketed = Mixing
        .tokenBudgetSample(df, "text", "doc_id", budget, bucketHexChars = c.hexChars)
        .select("doc_id").as[Long].collect().toSet
      assert(bucketed === naive,
        s"n=${c.nDocs} budget=$budget/$total h=${c.hexChars} seed=${c.seed}")
    }
  }
}

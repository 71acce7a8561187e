package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Generative laws for [[TextAnalysis.hashedEmbedding]] — the two
  * algebraic identities feature hashing promises, checked over random
  * token soups instead of hand-picked fixtures:
  *
  *  1. BAG-OF-WORDS: the vector is a function of the token MULTISET —
  *     permuting a document's tokens cannot move a single weight.
  *  2. ADDITIVITY: vec(a ⊕ b) = vec(a) + vec(b) elementwise (the sparse
  *     frames merge by summing buckets, zero-sums dropping out) — the
  *     identity that makes the trick's inner-product preservation an
  *     expectation over signs rather than a modeling assumption.
  *
  * Plus the self-cosine anchor on the dense form: every surviving
  * vector measures cosine 1.0 against itself to within an ulp (the
  * dot/(√·√) round-trip is IEEE, not symbolic).
  */
class HashedEmbeddingPropertySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }

  // small vocab so buckets collide and signs cancel across draws —
  // the regimes where a wrong merge/drop rule would show
  private val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
  private case class Case(a: List[String], b: List[String], seed: Long)
  private val caseGen: Gen[Case] = for {
    na <- Gen.chooseNum(0, 25)
    nb <- Gen.chooseNum(1, 25)
    a <- Gen.listOfN(na, wordGen)
    b <- Gen.listOfN(nb, wordGen)
    seed <- Gen.chooseNum(0L, 1000000L)
  } yield Case(a, b, seed)

  private def sparse(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    TextAnalysis.hashedEmbedding(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("permutation invariance and additivity over random token soups") {
    forSamples(caseGen, 8) { c =>
      val rnd = new scala.util.Random(c.seed)
      val all = sparse(Seq(
        1L -> c.a.mkString(" "),
        2L -> c.b.mkString(" "),
        3L -> (c.a ++ c.b).mkString(" "),
        4L -> rnd.shuffle(c.b).mkString(" ")))
      def vecOf(doc: Long): Map[Long, Long] =
        all.collect { case ((d, b), w) if d == doc => b -> w }
      // bag-of-words: a shuffled copy is the identical sparse vector
      assert(vecOf(4L) === vecOf(2L), s"permutation moved weights: $c")
      // additivity with zero-sums dropped
      val merged = (vecOf(1L).keySet ++ vecOf(2L).keySet).flatMap { b =>
        val s = vecOf(1L).getOrElse(b, 0L) + vecOf(2L).getOrElse(b, 0L)
        if (s == 0L) None else Some(b -> s)
      }.toMap
      assert(vecOf(3L) === merged, s"vec(a⊕b) != vec(a)+vec(b): $c")
    }
  }

  test("every dense vector has self-cosine 1.0 to within an ulp") {
    import spark.implicits._
    val docs = Seq(1L -> "aa bb aa cc", 2L -> "dd", 3L -> "ee ff ee ff gg")
      .toDF("doc_id", "text")
    val v = TextAnalysis.hashedEmbeddingVec(docs, "text", "doc_id")
    val self = v.select(col("doc"),
      graft.functions.VectorFunctions.cosine(col("vec"), col("vec")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    self.values.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
    assert(self.nonEmpty)
  }
}

package graft

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 property-based laws, generated with scalacheck and
  * evaluated through the real engine (Datasets, not plain Scala): cosine
  * bounds/symmetry, dedup fixpoint/subset, materialization idempotence,
  * set-op cardinality laws, window-sum == group-sum.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Raw-scalacheck driver (the scalatest bridge artifact is not in the
    * offline cache): draw `n` samples from the generators and run the body.
    */
  private def forSamples[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }
  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(1000L + i))
      } body(a, b)
    }

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f))
  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 15)
    docs <- Gen.listOfN(n,
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("cosine ∈ [-1,1] and symmetric for random vectors") {
    forSamples2(vecGen, vecGen, 10) { (a, b) =>
      if (a.exists(_ != 0f) && b.exists(_ != 0f)) {
        val r = Seq((a, b)).toDF("a", "b")
          .select(VectorFunctions.cosine(col("a"), col("b")).as("ab"),
            VectorFunctions.cosine(col("b"), col("a")).as("ba")).head
        assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
        assert(r.getDouble(0) === r.getDouble(1))
      }
    }
  }

  test("exact dedup: fixpoint and subset of input") {
    forSamples(docGen) { docs =>
      val df = docs.toDF("id", "text")
      val once = llm.Dedup.exact(df, "text", "id")
      val ids = once.select("id").as[Long].collect().toSet
      assert(ids.subsetOf(docs.map(_._1).toSet))
      val twice = llm.Dedup.exact(once, "text", "id")
      assert(twice.select("id").as[Long].collect().toSet === ids)
      // survivors have pairwise-distinct normalized text
      val norms = once.select(normalizeText(col("text"))).as[String].collect()
      assert(norms.distinct.length === norms.length)
    }
  }

  test("changelog materialization is idempotent for random changelogs") {
    val changeGen = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 5L)
        v <- Gen.chooseNum(1L, 100L)
        op <- Gen.oneOf("c", "u", "d")
      } yield (k, v, op))
    } yield rows
    forSamples(changeGen) { rows =>
      // make versions unique per key to keep the order total
      val uniq = rows.zipWithIndex.map { case ((k, _, op), i) => (k, i.toLong, op) }
      val df = uniq.toDF("k", "ver", "op")
      val once = cdc.Materialize.changelog(df, Seq("k"), Seq(col("ver")))
      val twice = cdc.Materialize.changelog(once, Seq("k"), Seq(col("ver")))
      assert(twice.select("k", "ver").as[(Long, Long)].collect().toSet ===
        once.select("k", "ver").as[(Long, Long)].collect().toSet)
      // per key: survives iff the max-version op is not a delete
      val expected = uniq.groupBy(_._1).collect {
        case (k, g) if g.maxBy(_._2)._3 != "d" => (k, g.maxBy(_._2)._2)
      }.toSet
      assert(once.select("k", "ver").as[(Long, Long)].collect().toSet === expected)
    }
  }

  test("set-op cardinality laws: |A∪B| = |A| + |B| - |A∩B| (distinct sets)") {
    val setGen = Gen.listOf(Gen.chooseNum(0, 20)).map(_.distinct)
    forSamples2(setGen, setGen, 10) { (a, b) =>
      val da = a.toDF("x").distinct()
      val db = b.toDF("x").distinct()
      val union = da.union(db).distinct().count()
      val inter = da.intersect(db).count()
      assert(union === da.count() + db.count() - inter)
      val except = da.except(db).count()
      assert(except === da.count() - inter)
    }
  }

  test("connectedComponents equals a union-find reference on random graphs") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.chooseNum(2, 12)
      nEdges <- Gen.chooseNum(1, 15)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0L, nNodes.toLong - 1)
        b <- Gen.chooseNum(0L, nNodes.toLong - 1)
      } yield (a, b))
    } yield edges.filter { case (a, b) => a != b }
    forSamples(graphGen, 8) { edges =>
      if (edges.nonEmpty) {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical: min node id per component
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        val got = llm.Dedup.connectedComponents(
            edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(got === expected, s"edges=$edges")
      }
    }
  }

  test("running window sum over full frame equals group-by sum") {
    val rowsGen = Gen.listOf(for {
      k <- Gen.chooseNum(1, 3)
      v <- Gen.chooseNum(-50, 50)
    } yield (k, v.toLong)).suchThat(_.nonEmpty)
    forSamples(rowsGen) { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "ord")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
        .orderBy("ord")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val lastRunning = df.withColumn("run", sum("v").over(w))
        .groupBy("k").agg(max(struct(col("ord"), col("run"))).getField("run").as("final"))
        .as[(Int, Long)].collect().toMap
      val grouped = df.groupBy("k").agg(sum("v").as("s")).as[(Int, Long)].collect().toMap
      assert(lastRunning === grouped)
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Laws for [[Graph.connectedComponents]] / [[Graph.dedupResolve]]: the
  * alternating large/small-star labels must equal a reference union-find
  * on ANY edge set (random graphs via scalacheck), components must be
  * labeled by their minimum id, and the canonical pick must be the
  * (prefer desc, id asc) argmax per component with singletons canonical.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }

  /** Reference: driver-side union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are not min-canonical under arbitrary union order; normalize
    val members = par.keys.toSeq.groupBy(find)
    members.flatMap { case (_, ms) =>
      val m = ms.min; ms.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components equal union-find on random graphs (law)") {
    val gen = for {
      n <- Gen.chooseNum(2, 60)          // node-id universe
      m <- Gen.chooseNum(1, 120)         // edge count (dups/self-loops ok)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
    } yield es
    forSamples(gen, 12) { es =>
      val expected = unionFind(es.filter(e => e._1 != e._2))
      assert(run(es) === expected)
    }
  }

  test("incrementalComponents == full recompute on random edge splits (law)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(2, 60)
      m <- Gen.chooseNum(1, 120)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
      cut <- Gen.chooseNum(0, m) // any prefix/suffix split, incl. empty sides
    } yield (es, cut)
    forSamples(gen, 10) { case (es, cut) =>
      val clean = es.filter(e => e._1 != e._2)
      if (clean.nonEmpty) {
        val (oldE, newE) = clean.splitAt(math.min(cut, clean.size))
        val base = Graph.connectedComponents(
          (if (oldE.isEmpty) Seq.empty[(Long, Long)] else oldE).toDF("a", "b"),
          "a", "b")
        val inc = Graph.incrementalComponents(base, "id", "component",
            newE.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(inc === unionFind(clean), s"old=${oldE.size} new=${newE.size}")
      }
    }
  }

  test("incrementalComponents merges across batches and admits brand-new nodes") {
    import spark.implicits._
    // batch 1: {1,2} and {3,4}; batch 2's 2-3 edge merges them to min 1,
    // and 10-11 arrives as a completely new component
    val base = Graph.connectedComponents(
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), "a", "b")
    val inc = Graph.incrementalComponents(base, "id", "component",
        Seq((2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // chaining: feeding the output back in with a further merge works
    val inc2 = Graph.incrementalComponents(
        Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L))
          .toDF("id", "component"), "id", "component",
        Seq((4L, 10L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 1L, 11L -> 1L))
  }

  test("a 200-node path converges (worst-case diameter) and labels by min") {
    val es = (0L until 199L).map(i => (i + 1, i))
    val got = run(es)
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("two components + self-loops + duplicate edges") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 1L),
                 (10L, 20L), (20L, 30L))
    val got = run(es)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("empty edge set yields an empty, well-typed assignment") {
    import spark.implicits._
    val out = Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(out.columns.toSeq === Seq("id", "component"))
    assert(out.count() === 0)
  }

  test("non-convergence inside maxIter throws loudly, never partial labels") {
    import spark.implicits._
    val es = (0L until 64L).map(i => (i + 1, i)).toDF("a", "b")
    intercept[IllegalStateException] {
      Graph.connectedComponents(es, "a", "b", maxIter = 1)
    }
  }

  test("dedupResolve keeps the longest text per component, ties to min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaaa"),   // comp {1,2,3}: 2 wins (len tie 2 vs 3 → min id)
      (7L, "zz"),                               // singleton: canonical
      (8L, "b"), (9L, "bbb")                    // comp {8,9}: 9 wins
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Graph.dedupResolve(docs, "doc_id", length(col("text")),
        pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (7L, 7L, true),
      (8L, 8L, false), (9L, 8L, true)))
  }

  test("exactly one canonical per component on a random corpus (law)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(5, 40)
      m <- Gen.chooseNum(0, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1)
      } yield (a, b))
      lens <- Gen.listOfN(n, Gen.chooseNum(1, 8))
    } yield (n, es, lens)
    forSamples(gen, 8) { case (n, es, lens) =>
      val docs = (0 until n).map(i => (i.toLong, "x" * lens(i))).toDF("doc_id", "text")
      val pairs = es.toDF("id_a", "id_b")
      val out = Graph.dedupResolve(docs, "doc_id", length(col("text")),
        pairs, "id_a", "id_b").collect()
      assert(out.length === n)                       // every doc assigned
      val byComp = out.groupBy(_.getLong(1))
      byComp.foreach { case (comp, rows) =>
        val canons = rows.filter(_.getBoolean(2)).map(_.getLong(0))
        assert(canons.length === 1, s"component $comp: $canons")
        // the canonical is the (len desc, id asc) argmax
        val best = rows.map(r => (lens(r.getLong(0).toInt), -r.getLong(0))).max
        assert((lens(canons.head.toInt), -canons.head) === best)
      }
    }
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-graph-fold").toString

  private def readAssignment(path: String): Map[Long, Long] =
    Graph.assignment(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("foldBatch chains micro-batches into the full closure (streaming law)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(4, 50)
      m <- Gen.chooseNum(2, 90)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
    } yield es
    forSamples(gen, 6) { es =>
      val path = freshDir()
      // three deterministic micro-batches; some may be edgeless after the
      // self-loop filter — foldBatch must absorb those as no-ops too
      (0 until 3).foreach { b =>
        val batch = es.filter(e => (e._1 + e._2) % 3 == b)
        Graph.foldBatch(spark, path, batch.toDF("a", "b"), "a", "b")
      }
      val full = run(es)
      if (full.nonEmpty) assert(readAssignment(path) === full)
    }
  }

  test("refolding an absorbed batch is a content no-op (replay law)") {
    import spark.implicits._
    val path = freshDir()
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 20L))
    val b2 = Seq((3L, 4L), (20L, 30L))
    Graph.foldBatch(spark, path, b1.toDF("a", "b"), "a", "b")
    Graph.foldBatch(spark, path, b2.toDF("a", "b"), "a", "b")
    val before = readAssignment(path)
    // at-least-once redelivery: the SAME batch folds again
    Graph.foldBatch(spark, path, b2.toDF("a", "b"), "a", "b")
    assert(readAssignment(path) === before)
    assert(before === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                          10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("retractBatch splits a bridged component and equals the surviving closure (law)") {
    import spark.implicits._
    // deterministic bridge case first: 1-2-3-4-5 path; removing bridge 3
    // must SPLIT {1..5} into {1,2} and {4,5}
    val path = freshDir()
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 20L))
    Graph.foldBatch(spark, path, es.toDF("a", "b"), "a", "b")
    assert(readAssignment(path)(5L) === 1L, "pre-retraction: one component")
    Graph.retractBatch(spark, path, Seq(3L).toDF("id"), "id",
      es.toDF("a", "b"), "a", "b")
    assert(readAssignment(path) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 20L -> 10L))
    // replay: the same retraction republishes identical content
    Graph.retractBatch(spark, path, Seq(3L).toDF("id"), "id",
      es.toDF("a", "b"), "a", "b")
    assert(readAssignment(path) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 20L -> 10L))
    // law: on random graphs, retract == from-scratch closure over the
    // surviving pair set, with pairless survivors as singletons
    val gen = for {
      n <- Gen.chooseNum(4, 40)
      m <- Gen.chooseNum(2, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
      rm <- Gen.someOf(0L to n.toLong)
    } yield (es, rm.toSet)
    forSamples(gen, 6) { case (es, rm) =>
      val real = es.filter(e => e._1 != e._2)
      if (real.nonEmpty) {
        val p = freshDir()
        Graph.foldBatch(spark, p, es.toDF("a", "b"), "a", "b")
        Graph.retractBatch(spark, p, rm.toSeq.toDF("id"), "id",
          es.toDF("a", "b"), "a", "b")
        val surviving = real.filter(e => !rm(e._1) && !rm(e._2))
        val nodes = real.flatMap(e => Seq(e._1, e._2)).toSet -- rm
        val closure = unionFind(surviving)
        val expected = nodes.map(id => id -> closure.getOrElse(id, id)).toMap
        if (rm.nonEmpty || nodes.nonEmpty)
          assert(readAssignment(p) === expected,
            s"edges=$real removed=$rm")
      }
    }
  }

  test("retractBatchStored prunes the persisted pair store and equals the evidence path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir()
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 20L), (100L, 200L))
    // two folds — the store must accumulate evidence across batches
    Graph.foldBatch(spark, path, es.take(3).toDF("a", "b"), "a", "b", batchId = 0L)
    Graph.foldBatch(spark, path, es.drop(3).toDF("a", "b"), "a", "b", batchId = 1L)
    // twin retraction with caller-retained evidence — the equality law
    val twin = freshDir()
    Graph.foldBatch(spark, twin, es.toDF("a", "b"), "a", "b")
    Graph.retractBatch(spark, twin, Seq(3L).toDF("id"), "id",
      es.toDF("a", "b"), "a", "b")
    Graph.retractBatchStored(spark, path, Seq(3L).toDF("id"), "id")
    assert(readAssignment(path) === readAssignment(twin))
    assert(readAssignment(path) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 20L -> 10L, 100L -> 100L, 200L -> 100L))
    // replay republishes identical content off the same store
    Graph.retractBatchStored(spark, path, Seq(3L).toDF("id"), "id")
    assert(readAssignment(path) === readAssignment(twin))
    // the store read is a REAL partition prune: affected buckets are
    // {1,2,3,4,5} mod 64, while the store also holds buckets for the
    // untouched components (10, 100 — dst of their canonical pairs), so
    // the scan's PartitionFilters skip real directories
    val buckets = Seq(1, 2, 3, 4, 5).map(_ % Graph.PairBuckets.toInt).distinct
    val store = spark.read.parquet(s"$path/pairs")
    val pruned = store.where(col("__cb").isin(buckets: _*))
    val planLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(planLine.contains("__cb"),
      s"expected __cb inside the scan's PartitionFilters, got: $planLine")
    val allBuckets = store.select(col("__cb")).distinct().collect()
      .map(_.getInt(0)).toSet
    assert((allBuckets -- buckets.toSet).nonEmpty,
      "the store must hold buckets outside the prune set for the test to bite")
    assert(pruned.select(col("__cb")).distinct().collect().map(_.getInt(0)).toSet
      === allBuckets.intersect(buckets.toSet))
  }

  test("pair-store lifecycle: tombstones refuse re-ingest, pairsCompact prunes and discharges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // round-13 review: the store used to keep retracted-era pairs
    // forever with no compaction and no re-ingest guard, so a re-used id
    // silently inherited stale evidence — docs that must split stayed
    // merged. The family now carries the engine-wide rule ENFORCED:
    // tombstone at retract, refuse folds touching tombstoned ids,
    // compact to prune + discharge.
    val path = freshDir()
    Graph.foldBatch(spark, path,
      Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b"), "a", "b", batchId = 0L)
    Graph.retractBatchStored(spark, path, Seq(3L).toDF("id"), "id",
      retractionId = 0L)
    // fold touching the retracted id → refused loudly
    val ex = intercept[IllegalArgumentException] {
      Graph.foldBatch(spark, path, Seq((3L, 6L)).toDF("a", "b"), "a", "b",
        batchId = 1L)
    }
    assert(ex.getMessage.contains("retracted"))
    // compaction prunes the stale evidence physically and clears the
    // tombstone — the re-ingest rule is now DISCHARGED, not documented
    Graph.pairsCompact(spark, path)
    assert(graft.ops.Tombstones.retIds(spark, path).isEmpty)
    // a replay of an already-folded store batch is refused (retired
    // lineage — it could resurrect pruned pairs)
    val ex2 = intercept[IllegalArgumentException] {
      Graph.foldBatch(spark, path, Seq((1L, 2L)).toDF("a", "b"), "a", "b",
        batchId = 0L)
    }
    assert(ex2.getMessage.contains("watermark"))
    // id 3 re-ingested as a NEW doc pairing with 6 — accepted now
    Graph.foldBatch(spark, path, Seq((3L, 6L)).toDF("a", "b"), "a", "b",
      batchId = 1L)
    assert(readAssignment(path) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      3L -> 3L, 6L -> 3L),
      "the re-ingested id must NOT inherit the retracted era's component")
    // the review's poison case: a retraction in the re-ingested doc's
    // component must see ONLY current-era evidence — the stale (2,3)
    // pair was pruned, so removing 6 leaves 3 a singleton, not merged
    // into {1,2}
    Graph.retractBatchStored(spark, path, Seq(6L).toDF("id"), "id")
    assert(readAssignment(path) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      3L -> 3L))
    // compaction folded batches + the append area into one __batch=0
    val store = spark.read.parquet(s"$path/pairs_gen=1")
    assert(store.select(col("__batch")).distinct().collect()
      .map(_.get(0).toString.toLong).toSet === Set(0L, 1L),
      "post-compact store = folded __batch=0 plus the post-compact fold")
  }

  test("assignment() before any fold refuses loudly; edgeless folds skip") {
    import spark.implicits._
    val path = freshDir()
    intercept[IllegalArgumentException] { Graph.assignment(spark, path) }
    // an edgeless batch (self-loops only) publishes nothing
    Graph.foldBatch(spark, path, Seq((5L, 5L)).toDF("a", "b"), "a", "b")
    intercept[IllegalArgumentException] { Graph.assignment(spark, path) }
  }

  test("leakage-safe split law: near-dup pairs never straddle a split boundary") {
    // the k20 contract: split is a function of the component, so any two
    // docs connected by a pair — even transitively — share a split
    val docs = graft.core.Engine.table(spark, graft.TestSpark.sf, "documents")
    val pairs = graft.llm.Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", n = 2, threshold = 0.1)
      .localCheckpoint(true)
    val split = graft.SparkEntry.queries("k20_leakage_safe_split")(spark, graft.TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("split"))
    val a = split.withColumnRenamed("doc_id", "id_a")
      .withColumnRenamed("split", "split_a")
    val b = split.withColumnRenamed("doc_id", "id_b")
      .withColumnRenamed("split", "split_b")
    val straddling = pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .where(org.apache.spark.sql.functions.col("split_a") =!=
        org.apache.spark.sql.functions.col("split_b"))
      .count()
    assert(straddling === 0L, "a near-dup pair crossed the train/test boundary")
    assert(pairs.count() > 0L, "the fixture corpus must actually have near-dup pairs")
  }
}

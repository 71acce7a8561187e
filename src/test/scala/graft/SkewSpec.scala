package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X6/E13 — hot-key detection, the auto-salted join, and the Misra–Gries
  * heavy-hitter summary.
  *
  * The auto-salted join's contract query hash-matches the plain-join
  * oracle at both SFs; here we pin the mechanism on a deliberately
  * pathological key (one key holding half the rows — the shape AQE alone
  * mitigates but a 100 TB fact table's worst key defeats), plus the three
  * Misra–Gries guarantees the rows-only e13 entry relies on.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed() = {
    // key 7 is pathologically hot (500 rows); keys 0..49 get 10 each
    val hot = (0 until 500).map(i => (7L, i.toLong))
    val cold = for (k <- 0 until 50; i <- 0 until 10) yield (k.toLong, i.toLong)
    (hot ++ cold).toDF("k", "v")
  }

  test("hotKeys finds exactly the keys at or above the threshold") {
    val keys = Skew.hotKeys(skewed(), "k", 100L).as[(Long, Long)].collect().toMap
    assert(keys === Map(7L -> 510L)) // 500 hot + its own 10 cold rows
    val all = Skew.hotKeys(skewed(), "k", 1L).count()
    assert(all === 50L)
  }

  test("autoSaltedJoin row-multiset equals the plain equi-join") {
    val big = skewed()
    val small = (0 until 60).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Long, String, Long, Long)].collect().toSet
    val auto = Skew.autoSaltedJoin(big, small, "k", hotThreshold = 100L, saltFactor = 4)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(auto === plain)
  }

  test("autoSaltedJoinApprox equals the plain join regardless of sketch routing") {
    val big = skewed()
    val small = (0 until 60).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Long, String, Long, Long)].collect().toSet
    // tiny sketch (k=3, heavy decrementing) AND a threshold low enough to
    // misroute cold keys — result must still be exact either way
    for (sk <- Seq(3, 100); thr <- Seq(5L, 100L)) {
      val approx = Skew.autoSaltedJoinApprox(big, small, "k",
          sketchK = sk, hotThreshold = thr, saltFactor = 4)
        .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(approx === plain, s"sketchK=$sk thr=$thr diverged")
    }
  }

  test("autoSaltedJoin with no hot keys degenerates to the plain join") {
    val big = skewed()
    val small = (0 until 60).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plainN = big.join(small, Seq("k")).count()
    val autoN = Skew.autoSaltedJoin(big, small, "k",
      hotThreshold = 100000L, saltFactor = 4).count()
    assert(autoN === plainN)
  }

  test("Misra–Gries: heavy hitters present, never overestimates, bounded undershoot") {
    val df = skewed().repartition(8) // force multi-partition partials + merges
    val k = 10
    val n = df.count()
    val truth = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().map { case (key, c) => key.toString -> c }.toMap
    val est = Skew.heavyHitters(df, col("k"), k).as[(String, Long)].collect().toMap
    val eps = n.toDouble / (k + 1)
    // (a) every key with true count > N/(k+1) survives the summary
    truth.filter(_._2 > eps).keys.foreach { key =>
      assert(est.contains(key), s"true heavy hitter $key missing")
    }
    // (b) estimates never exceed the true count; (c) undershoot <= N/(k+1)
    est.foreach { case (key, e) =>
      val t = truth(key)
      assert(e <= t, s"$key overestimated: $e > $t")
      assert(t - e <= eps, s"$key undershoots too far: $t - $e > $eps")
    }
    assert(est.size <= k)
  }

  test("Misra–Gries is exact when k exceeds the key cardinality") {
    val df = skewed().repartition(8)
    val truth = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().map { case (key, c) => key.toString -> c }.toMap
    val est = Skew.heavyHitters(df, col("k"), 100).as[(String, Long)].collect().toMap
    assert(est === truth)
  }
}

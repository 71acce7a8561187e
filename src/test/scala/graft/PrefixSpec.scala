package graft

import graft.ops.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared two-pass distributed cumsum (ops/Prefix) — the laws the
  * call-site hashes can't isolate: parity with the naive global window
  * at any partition count, NULL-safe and separator-safe group keys
  * (r16 advice: the old concat_ws key silently skipped nulls), and the
  * bounded-plan guarantee (offsets past the inline threshold ship as a
  * broadcast join, never a partitions×groups literal map — the r15
  * verdict's #5).
  */
class PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("global cumsum equals the naive single-partition window at several partition counts") {
    val df = (0L until 500L).map(i => (s"k${(i * 7919L) % 500L}", i % 13L))
      .toDF("k", "v")
    val naive = df
      .withColumn("want", sum(col("v")).over(Window.orderBy(col("k"))))
    for (parts <- Seq(1, 4, 32, 300)) {
      val got = Prefix.frozenRangeCumSum(df, rangeCols = Seq(col("k")),
        groupCols = Nil, orderCols = Seq(col("k")), valueCol = col("v"),
        cumName = "cum", numPartitions = parts)
      val joined = got.join(naive.select("k", "want"), Seq("k"))
      assert(joined.where(col("cum") =!= col("want")).count() === 0L,
        s"two-pass cumsum diverged from the global window at parts=$parts")
    }
  }

  test("grouped cumsum is exact for NULL groups and separator-bearing string groups") {
    // groups: null, 'a', 'a|b' (the old concat_ws key collapsed
    // null→absent and could not distinguish 'a|b' from nested keys)
    val df = Seq(
      (1L, Option.empty[String], 10L), (2L, Option.empty[String], 20L),
      (3L, Some("a"), 1L), (4L, Some("a"), 2L),
      (5L, Some("a|b"), 100L), (6L, Some("a|b"), 200L),
      (7L, Some("a|0"), 7L) // would collide with a pid-prefixed 'a|…' key
    ).toDF("id", "g", "v")
    val naive = df.withColumn("want",
      sum(col("v")).over(Window.partitionBy(col("g")).orderBy(col("id"))))
    val got = Prefix.frozenRangeCumSum(df, rangeCols = Seq(col("id")),
      groupCols = Seq(col("g")), orderCols = Seq(col("id")),
      valueCol = col("v"), cumName = "cum", numPartitions = 4)
    val joined = got.join(naive.select("id", "want"), Seq("id"))
    assert(joined.where(col("cum") =!= col("want")).count() === 0L,
      "grouped cumsum must be exact for null and separator-bearing groups")
    assert(got.count() === 7L, "the offset join must never duplicate rows")
  }

  test("empty input: no offsets, no join, zero rows out") {
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "id", "v")
    val got = Prefix.frozenRangeCumSum(empty, rangeCols = Seq(col("id")),
      groupCols = Seq(col("g")), orderCols = Seq(col("id")),
      valueCol = col("v"), cumName = "cum", numPartitions = 4)
    assert(got.count() === 0L)
    assert(got.columns.contains("cum"))
  }

  test("past the inline threshold the offsets ship as a broadcast join, never a literal map") {
    val df = (0L until 2000L).map(i => (i, 1L)).toDF("k", "v")
    val many = Prefix.frozenRangeCumSum(df, rangeCols = Seq(col("k")),
      groupCols = Nil, orderCols = Seq(col("k")), valueCol = col("v"),
      cumName = "cum", numPartitions = Prefix.MaxInlineOffsets + 100)
    val plan = many.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"large offset tables must broadcast-join, got:\n${plan.take(2000)}")
    // parity still holds on the join path
    val naive = df.withColumn("want", sum(col("v")).over(Window.orderBy(col("k"))))
    assert(many.join(naive.select("k", "want"), Seq("k"))
      .where(col("cum") =!= col("want")).count() === 0L)
    // and the small-global path stays join-free (pure codegen projection)
    val few = Prefix.frozenRangeCumSum(df, rangeCols = Seq(col("k")),
      groupCols = Nil, orderCols = Seq(col("k")), valueCol = col("v"),
      cumName = "cum", numPartitions = 8)
    assert(!few.queryExecution.executedPlan.toString.contains("Join"),
      "small global offset tables must inline, not join")
  }
}

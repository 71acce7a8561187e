package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only (r19 optimization round): formatted-plan evidence for the
  * INTERNAL operator rewrites — these run inside foreachBatch merges /
  * index writes, so the declared queries' captured plans cannot show
  * them (a declared query returns a read of the materialized result).
  * Each pair below builds the OLD and NEW expression tree over the same
  * real input (token-for-token the code paths cited in
  * OPTIMIZATION_r19.md) and writes `.explain("formatted")` to
  * plans/r19/INTERNAL_<name>_{before,after}.txt.
  */
object InternalPlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/plans/r19"
    val spark = graft.core.Engine.local(cores = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    def snap(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[internalplans] wrote $name")
    }

    // ---- 1. the A8 upsert merge (Sinks.applyUpsertBatch) -------------
    // lineitem-shaped layout: merge key (l_orderkey, __rid), bucket
    // column l_orderkey alone — the bucketCols ⊂ keyCols case.
    val li = graft.core.Engine.table(spark, dir, "lineitem")
    val keyed = li.withColumn("__rid", xxhash64(li.columns.map(col): _*))
      .withColumn("op", lit("u")).withColumn("__v", lit(3L))
      .withColumn("__kb", pmod(hash(col("l_orderkey")), lit(8)))
    val keyCols = Seq("l_orderkey", "__rid")
    // BEFORE: Materialize.latestByKey — window keyed on the merge key;
    // the write then partitions by __kb, fragmenting each bucket across
    // every merge task
    val wOld = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__v").desc)
    snap("INTERNAL_upsert_merge_before",
      keyed.withColumn("__rn", row_number().over(wOld))
        .where(col("__rn") === 1).drop("__rn"))
    // AFTER: Sinks.latestByKeyAligned — one repartition on __kb; the
    // window's ClusteredDistribution(__kb :: keys) is satisfied by
    // HashPartitioning(__kb), so the plan has ONE exchange keyed on the
    // layout column and every task holds whole buckets
    val wNew = Window.partitionBy((col("__kb") +: keyCols.map(col)): _*)
      .orderBy(col("__v").desc)
    snap("INTERNAL_upsert_merge_after",
      keyed.repartition(col("__kb"))
        .withColumn("__rn", row_number().over(wNew))
        .where(col("__rn") === 1).drop("__rn"))

    // ---- 2. BM25 postings (Search.postingsOf) ------------------------
    import graft.functions.TextFunctions._
    val docs = graft.core.Engine.table(spark, dir, "documents")
    def termBucket = pmod(xxhash64(col("term")), lit(16L)).cast("int")
    // BEFORE: dl = sum(tf) over (partition by doc) — a second exchange +
    // sort on top of the (doc, term) tf aggregate
    val tfOld = docs
      .select(col("doc_id").as("doc"),
        explode(tokens(normalizeText(col("text")))).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    snap("INTERNAL_bm25_postings_before",
      tfOld.withColumn("dl",
          sum(col("tf")).over(Window.partitionBy(col("doc"))))
        .withColumn("tb", termBucket))
    // AFTER: dl = size(tokens) in the projection; one aggregate, no
    // window, no second exchange
    snap("INTERNAL_bm25_postings_after",
      docs.select(col("doc_id").as("doc"),
          tokens(normalizeText(col("text"))).as("__toks"))
        .select(col("doc"), size(col("__toks")).cast("long").as("dl"),
          explode(col("__toks")).as("term"))
        .groupBy(col("doc"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
        .select(col("doc"), col("term"), col("tf"), col("dl"))
        .withColumn("tb", termBucket))

    // ---- 3. novelty stats (TextAnalysis.noveltyStatsOf) --------------
    val proj = graft.llm.Dedup.shingleHashProjection(docs, "text", "doc_id", 3)
    val hd = proj.select(col("id"), explode(col("hs")).as("h"))
    val first = hd.groupBy(col("h")).agg(min(col("id")).as("__first"))
    // BEFORE: rejoin the exploded occurrences on h and re-aggregate all
    // of hd by doc — two occurrence-sized shuffles
    snap("INTERNAL_novelty_stats_before",
      hd.join(first, Seq("h"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__first") === col("id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("id").as("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty")))
    // AFTER: n_grams = size(hs) per row; n_novel aggregated from the
    // gram-keyed first table (|grams| rows) joined on the credited doc
    val novel = first.groupBy(col("__first").as("id"))
      .agg(count(lit(1)).as("n_novel"))
    snap("INTERNAL_novelty_stats_after",
      proj.where(size(col("hs")) > 0)
        .select(col("id"), size(col("hs")).cast("long").as("n_grams"))
        .join(novel, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          round(coalesce(col("n_novel"), lit(0L)).cast("double")
            / col("n_grams"), 6).as("novelty")))

    // ---- 4. the A8b rollup merge (Sinks.applyRollupBatch, r20) --------
    // the r19 verdict's #4: the rollup's final aggregate keyed on
    // (keyCols, __kb) shuffles on the FULL grouping hash while the write
    // partitions dirs by __kb alone — the same unaligned-layout
    // fragmentation class the upsert merge fixed in r19.
    // the REAL merge input is existing-buckets-read ∪ batch-partials —
    // a union, whose output partitioning is unknown, so the final
    // aggregate always needs one exchange; the question is its KEY
    val ev = graft.core.Engine.table(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
    val partial = ev.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,6)")).as("sum_val"))
      .withColumn("__kb", pmod(hash(col("k")), lit(16)))
      .withColumn("__bid", lit(1L))
    val exDir = java.nio.file.Files
      .createTempDirectory("graft-plans-rollup").toString
    partial.write.mode("overwrite").partitionBy("__kb").parquet(exDir)
    val exRead = spark.read.parquet(exDir)
      .select(partial.columns.map(col): _*)
    def rollupAll = exRead.unionByName(partial)
    // BEFORE: groupBy(keyCols, __kb) over the union — the one exchange
    // is keyed on the full grouping hash, unaligned with the __kb dir
    // layout, so every agg task writes up to one file per touched bucket
    snap("INTERNAL_rollup_merge_before",
      rollupAll.groupBy(col("k"), col("__kb"))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_val")).cast("decimal(18,6)").as("sum_val"),
          max(col("__bid")).as("__bid")))
    // AFTER: one explicit repartition on __kb — HashPartitioning(__kb)
    // satisfies the aggregate's ClusteredDistribution(k :: __kb), so the
    // plan still has exactly ONE exchange below the final aggregate, now
    // keyed on the layout column; each task holds whole buckets and the
    // rewrite lands ~one file per touched bucket
    snap("INTERNAL_rollup_merge_after",
      rollupAll.repartition(col("__kb"))
        .groupBy(col("k"), col("__kb"))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_val")).cast("decimal(18,6)").as("sum_val"),
          max(col("__bid")).as("__bid")))
    spark.stop()
  }
}

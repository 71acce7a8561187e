package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest + data-skipping reads — a poor-man's
  * lakehouse data-skipping index over a plain parquet directory.
  *
  * Why it matters at 100 TB: parquet footers already carry min/max stats,
  * but the reader must still OPEN every footer to discover a file is
  * irrelevant — on a 100k-file table that is 100k round-trips to object
  * storage per query. A manifest (one small parquet holding per-FILE
  * min/max/row-count) moves that to one read: the planner filters the
  * manifest, then scans only the overlapping files. Same idea as Delta /
  * Iceberg file statistics, expressed over vanilla parquet with zero table
  * format. Pairs with [[Layout.zorderWrite]] / `repartitionByRange`
  * writes, which make per-file ranges tight so skipping actually bites.
  *
  * The manifest lives UNDER the table directory as `_graft_manifest` —
  * Hadoop's input listing hides `_`-prefixed paths, so plain
  * `spark.read.parquet(table)` never sees it (same convention as
  * `_delta_log` / `_SUCCESS`).
  */
object Manifest {

  val ManifestDir = "_graft_manifest"

  /** Scan `tablePath` once and persist per-file (min, max) for each of
    * `cols` plus a row count: one codegen'd pass, one map-side-combinable
    * shuffle keyed by file name (groups = number of files). Returns the
    * manifest. Re-run after any write that adds/replaces files.
    */
  def write(spark: SparkSession, tablePath: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // manifests are tiny (one row per data file)
      .write.mode("overwrite").parquet(s"$tablePath/$ManifestDir")
    read(spark, tablePath)
  }

  /** Read the manifest back. Spark logs a one-line
    * `All paths were ignored: .../_graft_manifest` WARN here — that is the
    * hidden-path check noticing an explicitly-named `_` path before using
    * it anyway (the same listing rule that hides the manifest from table
    * scans); harmless.
    */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(s"$tablePath/$ManifestDir")

  /** Files whose [min, max] range on `c` intersects [lo, hi]. An all-null
    * file has null min/max → the predicate is null → correctly skipped
    * (a range predicate never matches null). The collected list is
    * bounded by the table's FILE count (not rows) — the same boundedness
    * class as the IVF probe-cell list; a table beyond ~1M files wants the
    * manifest pushed into a join instead (see [[prunedRead]] note).
    */
  def pruneFiles(spark: SparkSession, tablePath: String, c: String,
                 lo: Column, hi: Column): Seq[String] =
    read(spark, tablePath)
      .where(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq

  /** Range-filtered read that scans ONLY the files the manifest says can
    * match, then applies the exact residual predicate. Semantically equal
    * to `spark.read.parquet(table).where(c between lo and hi)` — the
    * manifest only removes files that cannot contain a match.
    *
    * The file list rides in the plan as scan paths (a static pruning
    * decision, like IVF's `isin` partition filter), so the driver cost is
    * one tiny manifest read — not a footer per file.
    */
  def prunedRead(spark: SparkSession, tablePath: String, c: String,
                 lo: Column, hi: Column): DataFrame = {
    val files = pruneFiles(spark, tablePath, c, lo, hi)
    val base =
      if (files.isEmpty)
        // keep the caller's schema without scanning data
        spark.read.parquet(tablePath).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(c) >= lo && col(c) <= hi)
  }
}

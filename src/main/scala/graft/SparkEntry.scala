package graft

import graft.contract._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query name maps to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The driver hands us ITS session — tune it (AQE, broadcast threshold,
    * nanos-parquet legality) exactly like Verify/Bench tune theirs.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.core.Engine.tune(spark)
    RelationalQueries.queries("e1_agg_flagship")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ScalarQueries.queries ++ CdcQueries.queries ++
      LlmQueries.queries ++ StreamingQueries.queries ++ SourceSinkQueries.queries ++
      ExtraQueries.queries ++ GauntletQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Queries absent here (non-SQL-expressible /
    * approximate / mechanism ops) get the driver's rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ ScalarQueries.oracle ++ CdcQueries.oracle ++
      LlmQueries.oracle ++ StreamingQueries.oracle ++ SourceSinkQueries.oracle ++
      ExtraQueries.oracle ++ GauntletQueries.oracle
}

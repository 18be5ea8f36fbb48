package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CoreQueries, PipelineQueries, RelationalQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Per-key next-event intervals (scan → window lead → epoch diff) —
    * the reference engine's signature analytic (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.windowLead(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++
      RelationalQueries.queries ++ TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++
      RelationalQueries.oracles ++ TpchQueries.oracles
}

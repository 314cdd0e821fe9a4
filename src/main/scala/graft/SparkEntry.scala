package graft

import graft.queries.{ContentQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from three modules:
  *  - RelationalQueries: joins/aggs/windows/set-ops/sorts (SURVEY §2.8)
  *  - PipelineQueries: the ingest engine's partitioner/rotation/naming
  *    semantics exercised relationally (SURVEY §2.2–2.5)
  *  - ContentQueries: dedup, similarity search, text analysis, multimodal
  *    (training-data-pipeline extensions)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++
      ContentQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++
      ContentQueries.oracles ++ ContentQueries.dynamicOracles
}

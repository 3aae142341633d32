package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries; each module pairs a
  * DataFrame planner with the ANSI-SQL oracle the driver replays in DuckDB.
  */
object SparkEntry {
  private val sf0001 = "/root/testdata/sf0.001"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a22_combined_search")(spark, sf0001)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    search.StacSearch.queries ++ ops.Analytics.queries ++
      ops.TextAnalysis.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.Multimodal.queries ++
      ops.Curation.queries ++ streaming.Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    search.StacSearch.oracle ++ ops.Analytics.oracle ++
      ops.TextAnalysis.oracle ++ ops.Dedup.oracle ++
      ops.Similarity.oracle ++ ops.Multimodal.oracle ++
      ops.Curation.oracle ++ streaming.Events.oracle
}

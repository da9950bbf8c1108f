package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from the
  * per-category modules under graft.operators.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary(T(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.defs ++
      operators.SqlSurface.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.UserFns.defs ++
      operators.Pipeline.defs ++
      operators.Graph.defs ++
      operators.Routing.defs ++
      streaming.StreamOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.SqlSurface.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.UserFns.oracles ++
      operators.Pipeline.oracles ++
      operators.Graph.oracles ++
      operators.Routing.oracles ++
      streaming.StreamOps.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query
  * with (where SQL-expressible) a DuckDB oracle. Registries live in
  * graft.queries.*; this object only concatenates them.
  */
object SparkEntry {

  /** All registered queries, in registry order. */
  def registry: Seq[Q] =
    ScalarQueries.all ++ AggQueries.all ++ JoinQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ CurationQueries.all ++
      HygieneQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all ++ SourceQueries.all ++ LedgerQueries.all ++
      MetaDexQueries.all ++ RegistryQueries.all ++ PipelineQueries.all ++
      StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The wallet serving query (SURVEY §3.3, J9): facts ⋈ entity ⋈
    * broadcast dims with money projections.
    */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.j9.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

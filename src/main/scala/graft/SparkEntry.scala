package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory: one entry per implemented
  * operator from SURVEY.md §2, each paired (where SQL-expressible) with a
  * DuckDB oracle in `oracleSql`. Column names are aliased identically on both
  * sides; every query carries a total ORDER BY mirrored in the oracle.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape — the reference's native scan→filter→
    * agg→sort surface) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q03(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Extended.queries ++
      operators.Events.queries ++ operators.Text.queries ++
      operators.Similarity.queries ++ operators.Reporting.queries ++
      operators.Curation.queries ++ operators.Corpus.queries ++
      operators.Ranges.queries ++ operators.Graphs.queries ++
      operators.Inference.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Extended.oracles ++
      operators.Events.oracles ++ operators.Text.oracles ++
      operators.Similarity.oracles ++ operators.Reporting.oracles ++
      operators.Curation.oracles ++ operators.Corpus.oracles ++
      operators.Ranges.oracles ++ operators.Graphs.oracles ++
      operators.Inference.oracles
}

package graft

import graft.queries.{Analytic, EngineSql, Pipeline, Q, Relational, Temporal}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; those with ANSI-SQL-expressible semantics also carry a
  * DuckDB oracle for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    Relational.all ++ Analytic.all ++ Temporal.all ++ Pipeline.all ++
      EngineSql.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Analytics, Assembly, Curate, Extensions, Graph, Learn, Maintenance, Mining, Q, Relational, Relational2, TypedOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared in graft.queries.Relational (E1-E16 relational
  * surface + reference parity) and graft.queries.Extensions (E17-E20
  * dedup / simsearch / text analysis / multimodal). */
object SparkEntry {

  val allQueries: Seq[Q] =
    Relational.all ++ Relational2.all ++ Extensions.all ++ Advanced.all ++
      Analytics.all ++ Assembly.all ++ Graph.all ++ Maintenance.all ++ TypedOps.all ++
      Curate.all ++ Learn.all ++ Mining.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_three")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-function-specific signatures) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

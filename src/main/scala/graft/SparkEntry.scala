package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All engine queries, in registration order. */
  def allQueries: Seq[Q] =
    graft.queries.Relational.all ++
    graft.queries.Workloads.all ++
    graft.queries.Generic.all ++
    graft.queries.Llm.all ++
    graft.queries.Extensions.all ++
    graft.queries.Stats.all ++
    graft.queries.Tpch.all ++
    graft.queries.Subqueries.all ++
    graft.queries.Coverage.all ++
    graft.queries.TrainPrep.all ++
    graft.queries.Curation.all ++
    graft.queries.Embeddings.all ++
    graft.queries.Mining.all ++
    graft.queries.Selection.all ++
    graft.queries.Crawl.all ++
    graft.queries.Maintenance.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query catalogs; each module owns its
  * Spark implementations and their DuckDB oracle SQL.
  */
object SparkEntry {

  private def modules: Seq[Query] =
    operators.Relational.queries ++
      operators.TextOps.queries ++
      operators.Corpus.queries ++
      operators.GridOps.queries ++
      operators.VectorSearch.queries ++
      operators.Hybrid.queries ++
      operators.Dedup.queries ++
      operators.Multimodal.queries ++
      sources.VersionedStore.queries ++
      streaming.Streams.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: end-to-end semantic search (chunk -> embed -> cosine
    * top-10 with provenance links), the reference's core lifecycle. */
  def entry(spark: SparkSession): DataFrame =
    operators.VectorSearch.searchE2E(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

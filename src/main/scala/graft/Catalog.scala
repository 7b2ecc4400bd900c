package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle equivalent the
  * driver hash-compares against (t2 gate, BASELINE.md). `oracle = None`
  * downgrades to the driver's rows-only check — reserved for ops whose
  * core is a custom kernel (chunker, embeddings, LSH, streaming merge).
  */
final case class Query(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    benchmark: Boolean = true)

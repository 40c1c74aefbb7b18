package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark program plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. Column names and
  * value representations must match exactly — the driver sorts columns by
  * name and hashes values, so every computed column is aliased identically
  * on both sides, doubles only ever come from exact decimal/integer
  * arithmetic followed by the same IEEE ops, and timestamps are reduced to
  * dates or integer epoch units.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  /** All query suites, in presentation order. */
  def defs: Seq[QueryDef] =
    RelationalQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++ EventQueries.defs ++
      SamplingQueries.defs ++ AdvancedQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-domain suites in
  * [[QueryRegistry]]: relational (reference surface), events (windows /
  * sessions), text analysis, dedup family, similarity search, multimodal.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The E2-shaped composed pipeline (SURVEY.md §7.2) re-expressed over the
    * star schema: dedup -> broadcast-enrich -> derive -> top-k per group.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs.find(_.name == "q10_revenue_by_nation").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted only for ops whose scale path is not
    * SQL-expressible (driver then records a rows-only check). */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}

package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* grouped by operator family; each carries
  * its DuckDB oracle SQL when SQL-expressible.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    RelationalQueries.all ++ StatQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ MiscQueries.all ++ OperatorQueries.all

  /** Flagship query on /root/testdata/sf0.001: the full validation-suite
    * verdict table over the synthetic pages fixture (driver smoke-checks
    * rows > 0). */
  def entry(spark: SparkSession): DataFrame = Flagship.verdicts(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark plan and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  * Column names/aliases must match EXACTLY between the two (the driver
  * sorts columns by name before hashing). */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

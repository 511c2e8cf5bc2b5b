package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Uniform result schemas — the engine's replacement for the reference's
  * RTF/PDF listings (SURVEY.md §2.1 S5): every check family emits
  *
  *   verdicts:   one row per (check, scope partition) — pass/fail + the
  *               statistic behind it (Categorical_Check.sas:495-500's
  *               "darkened bar" and DigitPref.sas:378-396's flags become
  *               `pass=false` rows);
  *   violations: one row per offending input row / group, carrying the key
  *               (url), observed and expected values (the reference's
  *               flagged-record listings, e.g. longitudinalPlot.sas:765-929).
  */
object Results {

  val verdictSchema: StructType = StructType(Seq(
    StructField("check_id", StringType, nullable = false),
    StructField("partition", StringType, nullable = true),  // scope tuple, "k=v/k=v"
    StructField("pass", BooleanType, nullable = false),
    StructField("metric", StringType, nullable = true),     // which statistic
    StructField("stat", DoubleType, nullable = true),
    StructField("p_value", DoubleType, nullable = true),
    StructField("threshold", DoubleType, nullable = true),
    StructField("n_obs", LongType, nullable = true),
    StructField("severity", StringType, nullable = true)
  ))

  val violationSchema: StructType = StructType(Seq(
    StructField("check_id", StringType, nullable = false),
    StructField("key", StringType, nullable = true),        // url / row key
    StructField("partition", StringType, nullable = true),
    StructField("observed", StringType, nullable = true),
    StructField("expected", StringType, nullable = true),
    StructField("label", StringType, nullable = true)
  ))

  /** Render scope columns into the canonical partition string. Must be
    * deterministic and order-stable: "col1=v1/col2=v2". */
  def partitionString(scope: Seq[String]): org.apache.spark.sql.Column =
    if (scope.isEmpty) lit("")
    else concat_ws("/", scope.map(c => concat_ws("=", lit(c), coalesce(col(c).cast("string"), lit("∅")))): _*)

  def emptyVerdicts(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], verdictSchema)

  def emptyViolations(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], violationSchema)

  /** Project an arbitrary per-partition stat frame into the verdict schema. */
  def toVerdicts(df: DataFrame, checkId: String, severity: String): DataFrame = {
    val cols = df.columns.toSet
    def opt(name: String, tpe: String) =
      if (cols(name)) col(name).cast(tpe) else lit(null).cast(tpe)
    df.select(
      lit(checkId).as("check_id"),
      opt("partition", "string").as("partition"),
      col("pass").cast("boolean").as("pass"),
      opt("metric", "string").as("metric"),
      opt("stat", "double").as("stat"),
      opt("p_value", "double").as("p_value"),
      opt("threshold", "double").as("threshold"),
      opt("n_obs", "long").as("n_obs"),
      lit(severity).as("severity"))
  }

  /** Project into the violation schema. */
  def toViolations(df: DataFrame, checkId: String): DataFrame = {
    val cols = df.columns.toSet
    def opt(name: String) =
      if (cols(name)) col(name).cast("string") else lit(null).cast("string")
    df.select(
      lit(checkId).as("check_id"),
      opt("key").as("key"),
      opt("partition").as("partition"),
      opt("observed").as("observed"),
      opt("expected").as("expected"),
      opt("label").as("label"))
  }
}

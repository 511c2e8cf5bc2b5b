package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar-panel binning — re-expression of the reference's pangroup
  * derivation (Categorical_Check.sas:104-141, DigitPref.sas:160-185):
  * `ceil(month/(12/interval))` within year, with a human label. One
  * codegen'd expression, no shuffle.
  */
object PanelBins {

  /** Number of bins per year for a named interval. */
  def binsPerYear(interval: String): Int = interval.toLowerCase match {
    case "year" => 1
    case "half" => 2
    case "quarter" => 4
    case "month" => 12
    case other => throw new IllegalArgumentException(
      s"interval must be year|half|quarter|month|overall, got $other")
  }

  /** Panel id column: "2024 H1", "2024 Q3", "2024-07", "2024", or "_ALL_". */
  def panel(dateCol: Column, interval: String): Column = interval.toLowerCase match {
    case "overall" => lit("_ALL_")
    case "year" => year(dateCol).cast("string")
    case "month" => date_format(dateCol, "yyyy-MM")
    case "half" =>
      concat(year(dateCol).cast("string"), lit(" H"),
        ceil(month(dateCol) / lit(6.0)).cast("int").cast("string"))
    case "quarter" =>
      concat(year(dateCol).cast("string"), lit(" Q"),
        ceil(month(dateCol) / lit(3.0)).cast("int").cast("string"))
    case other => throw new IllegalArgumentException(s"bad interval $other")
  }
}

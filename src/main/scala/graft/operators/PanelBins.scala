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

  /** Integer panel code — the ROW-LEVEL form of [[panel]]: the full-scan
    * groupBy keys on this int and [[renderPanel]] rebuilds the exact label
    * on the REDUCED frame (thousands of rows), so the per-row hot path
    * allocates no strings (JFR: label building — Integer.getChars /
    * String.getBytes / IsoChronology — was ~5% of suite CPU at bench
    * scale). Encoding is year*100 + bin index (bin 0 for year panels),
    * −1 for overall: code order == label order within one interval. */
  def panelCode(dateCol: Column, interval: String): Column =
    interval.toLowerCase match {
      case "overall" => lit(-1)
      case "year" => year(dateCol) * 100
      case "month" => year(dateCol) * 100 + month(dateCol)
      case "half" => year(dateCol) * 100 + ceil(month(dateCol) / lit(6.0)).cast("int")
      case "quarter" => year(dateCol) * 100 + ceil(month(dateCol) / lit(3.0)).cast("int")
      case other => throw new IllegalArgumentException(s"bad interval $other")
    }

  /** Render a frame's `panel` column from [[panelCode]] form to the label
    * form — a no-op when the frame already carries labels (a caller-built
    * pre-aggregate under the original string contract). */
  def renderPanelCol(df: org.apache.spark.sql.DataFrame, interval: String):
      org.apache.spark.sql.DataFrame =
    if (df.schema("panel").dataType == org.apache.spark.sql.types.StringType) df
    else df.withColumn("panel", renderPanel(col("panel"), interval))

  /** Label for a [[panelCode]] value — byte-identical to [[panel]] of the
    * same row. Run on reduced frames only. */
  def renderPanel(code: Column, interval: String): Column = {
    val y = floor(code / 100).cast("int").cast("string")
    val b = pmod(code, lit(100)).cast("int").cast("string")
    val lbl = interval.toLowerCase match {
      case "overall" => lit("_ALL_")
      case "year" => y
      case "month" => concat(y, lit("-"), lpad(b, 2, "0"))
      case "half" => concat(y, lit(" H"), b)
      case "quarter" => concat(y, lit(" Q"), b)
      case other => throw new IllegalArgumentException(s"bad interval $other")
    }
    when(code === -1, lit("_ALL_")).otherwise(lbl)
  }
}

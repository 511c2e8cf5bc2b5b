package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** usingColumns equi-joins never match null keys, so a `join(other, keys)`
  * over group-by keys silently drops (or zero-fills) every null-keyed group.
  * Validation inputs are dirty by definition — null scope values, null
  * panels from null timestamps — and those groups must flow through the
  * zero-fill shells and grand-total joins like any other. These helpers
  * join on `<=>` per key and keep the left side's key columns.
  */
object NullSafeJoin {

  def apply(l: DataFrame, r: DataFrame, keys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val rr = r.select(r.columns.map(c =>
      if (keys.contains(c)) col(c).as(s"__nsj_$c") else col(c)): _*)
    l.join(rr, keys.map(k => l(k) <=> rr(s"__nsj_$k")).reduce(_ && _), joinType)
      .drop(keys.map(k => s"__nsj_$k"): _*)
  }

  def left(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    apply(l, r, keys, "left")
}

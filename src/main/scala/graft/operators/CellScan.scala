package graft.operators

import graft.engine.CacheTracker.TrackedCacheOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fused multi-family cell scan.
  *
  * CategoricalConsistency, DigitPreference and Drift all reduce the input
  * with the same shape of pass — `filter → derive keys → groupBy(keys)
  * .count` — differing only in the key derivations. Run separately that is
  * one full input scan per family; at the 10^12-row design scale the scans
  * dominate, so this fuses them into ONE scan + ONE shuffle:
  *
  *   derive every family's key columns (namespaced) →
  *   explode one family-tagged struct per row per family, null when the
  *   family's row filter rejects the row (so per-family filters survive
  *   fusion exactly) →
  *   groupBy(struct).count
  *
  * The struct keeps every key column's NATIVE type (other families' slots
  * are typed nulls), so slicing a family back out is a filter + rename —
  * no stringify/cast round-trip. The explode triples the row stream, but
  * map-side partial aggregation collapses it to the distinct-cell count
  * per partition (thousands of cells at any input scale), so the shuffle
  * stays tiny; total compute equals the separate passes — the saving is
  * the input scans themselves.
  */
object CellScan {

  /** One count-based family: a row filter and named key expressions.
    * Key names must be unique within the family. */
  final case class Family(filter: Column, keys: Seq[(String, Column)])

  /** One-pass fused counts, cached. Slice per family with [[slice]]. */
  def counts(df: DataFrame, fams: Seq[Family]): DataFrame = {
    require(fams.nonEmpty)
    val named: Seq[(String, Column)] = fams.zipWithIndex.flatMap { case (f, i) =>
      f.keys.map { case (n, e) => (s"__c${i}_$n", e) }
    }
    val derived = named.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, e) }
    val schema = derived.schema
    val structs: Seq[Column] = fams.zipWithIndex.map { case (f, i) =>
      val fields = lit(i).as("__fam") +: named.map { case (n, _) =>
        if (n.startsWith(s"__c${i}_")) col(n).as(n)
        else lit(null).cast(schema(n).dataType).as(n)
      }
      when(f.filter, struct(fields: _*))
    }
    derived
      .select(explode(array(structs: _*)).as("__cell"))
      .filter(col("__cell").isNotNull)
      .groupBy(col("__cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("__cell.*"), col("cnt"))
      .trackedCache()
  }

  /** Family `i`'s cell counts with its original key names restored. */
  def slice(counts: DataFrame, i: Int, fams: Seq[Family]): DataFrame =
    counts.filter(col("__fam") === i)
      .select(fams(i).keys.map { case (n, _) => col(s"__c${i}_$n").as(n) } :+
        col("cnt"): _*)
}

package graft.operators

import graft.checks.{ByteIdentityCheck, Results}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-identity audit (north-rule row invariant): the engine never
  * rewrites `text`; this check proves it by asserting one sha2-256 per key.
  * A fresh run and a checkpoint-resumed run produce identical digests, and
  * any two rows claiming the same key must agree byte-for-byte.
  */
object ByteIdentity {

  def conflicts(df: DataFrame, check: ByteIdentityCheck): DataFrame =
    df.groupBy(col(check.keyCol))
      .agg(countDistinct(sha2(col(check.column).cast("binary"), 256)).as("n_digests"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_digests") > 1)

  def verdicts(df: DataFrame, check: ByteIdentityCheck): DataFrame = {
    val framed = conflicts(df, check).groupBy().agg(
      coalesce(count(lit(1)), lit(0L)).as("bad_keys")).select(
      lit("").as("partition"),
      lit("keys_with_divergent_bytes").as("metric"),
      col("bad_keys").cast("double").as("stat"),
      lit(0.0).as("threshold"),
      col("bad_keys").as("n_obs"),
      (col("bad_keys") === 0).as("pass"))
    Results.toVerdicts(framed, check.id, check.severity)
  }

  def violations(df: DataFrame, check: ByteIdentityCheck, limit: Int = 10000): DataFrame = {
    val v = conflicts(df, check).limit(limit).select(
      col(check.keyCol).cast("string").as("key"),
      lit("").as("partition"),
      col("n_digests").cast("string").as("observed"),
      lit("1").as("expected"),
      lit("text bytes diverge across rows of same key").as("label"))
    Results.toViolations(v, check.id)
  }
}

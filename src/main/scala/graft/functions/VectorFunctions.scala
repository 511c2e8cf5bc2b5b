package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over array<float>/array<double> columns, all as
  * builtin higher-order functions (zip_with / aggregate) so the hot path
  * stays inside whole-stage codegen — no UDF, no UDT, no shuffle.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Deterministic coarse-quantizer cell id for IVF-style bucketed ANN:
    * sign pattern of the first `bits` components (a random-hyperplane LSH
    * with axis-aligned planes — cheap, deterministic, portable). Vectors
    * only compete against vectors in the same cell, so the candidate join
    * is a bucket-equi-join instead of a full cross product.
    */
  def signBucket(a: Column, bits: Int): Column =
    aggregate(
      zip_with(slice(d(a), 1, bits), sequence(lit(0), lit(bits - 1)),
        (v, i) => when(v > 0, expr("1").cast("long") * pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
}

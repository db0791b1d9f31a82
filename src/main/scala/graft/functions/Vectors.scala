package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over Array[Float]/Array[Double] columns, composed from
  * Spark's higher-order functions (`zip_with` + `aggregate`) — left-to-right
  * accumulation, so the result is bit-identical to any engine that sums in
  * index order. No UDF, no driver-side math.
  */
object Vectors {

  /** Cast an Array[Float] column to Array[Double] for stable math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ‖v‖₂ */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cos(a,b) = dot/(‖a‖·‖b‖) — the exact formula mirrored in oracles:
    * dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

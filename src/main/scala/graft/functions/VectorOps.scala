package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * Spark's higher-order functions (`zip_with` / `aggregate`) so the
  * whole computation stays inside Catalyst — no UDFs, no
  * serialization breaks, executes distributed on column batches.
  *
  * Determinism contract (shared with the DuckDB oracle): every sum is
  * a *sequential left fold in double* over the array order. The
  * oracle mirrors it with `SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))`
  * over zipped `UNNEST`s, which DuckDB also evaluates in list order —
  * verified bit-identical (`list_dot_product` is NOT: it accumulates
  * in float).
  */
object VectorOps {

  /** Sequential double-fold dot product of two float vectors —
    * codegen'd via [[FloatVecDot]] (same arithmetic, ~10x faster than
    * the higher-order formulation in the pairwise hot path). */
  def dot(a: Column, b: Column): Column = FloatVecDot(a, b)

  /** Higher-order-function formulation of [[dot]] — kept as the
    * readable reference implementation; VectorOpsSpec asserts both are
    * bit-identical. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm (dot with itself). */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine from a precomputed dot and squared norms. */
  def cosineFrom(d: Column, n2a: Column, n2b: Column): Column =
    d / sqrt(n2a * n2b)

  /** Direct cosine similarity of two vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineFrom(dot(a, b), norm2(a), norm2(b))
}

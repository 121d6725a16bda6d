package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built from Spark's
  * codegen'd higher-order functions (no UDFs — `zip_with` and
  * `aggregate` stay inside whole-stage codegen; reference vector side
  * is ChromaDB cosine search, storage.py:255-276).
  *
  * All math is double-precision sequential fold, matching DuckDB's
  * `list_cosine_similarity` over `DOUBLE[]` closely enough that
  * round(x, 6) is engine-stable.
  */
object VectorFunctions {

  /** Elementwise cast to double (parquet stores float32 embeddings). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine rounded for cross-engine comparison stability. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Codegen'd native dot product (graft.plans.DotProduct) — the fast
    * path for all-pairs scoring. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.dot(a, b)

  /** Cosine via native dot: dot / (|a| |b|), all in one codegen span. */
  def cosineNative6(a: Column, b: Column): Column =
    round(dotNative(a, b) /
      (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))), 6)

  /** L2 norm via the native dot (for precomputing per-vector norms). */
  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** round-6 cosine from one native dot + PRECOMPUTED per-side norms.
    * Bit-identical to cosineNative6 — sqrt(dot(x,x)) is deterministic,
    * so hoisting it out of the pair loop changes nothing — but an
    * all-pairs scoring pass does ONE dot per pair instead of three. */
  def cosinePre6(a: Column, b: Column, na: Column, nb: Column): Column =
    round(cosinePreRaw(a, b, na, nb), 6)

  /** UNROUNDED prenorm cosine — for hot loops that defer round(6) to
    * the few surviving rows (Spark's round allocates a BigDecimal per
    * value, which dominates an all-pairs pass if applied per pair). */
  def cosinePreRaw(a: Column, b: Column, na: Column, nb: Column): Column =
    dotNative(a, b) / (na * nb)
}

package graft.functions

import graft.plans.VectorExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity column builders over `array<float>` embedding columns.
  *
  * All folds run index 0..n-1 accumulating in Double (products widened
  * before the multiply) — bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(range ...))` form, and to the native
  * [[graft.plans.FloatDotProduct]] codegen loop.
  */
object VectorFunctions {

  /** Dot product via the native codegen expression. */
  def dot(a: Column, b: Column): Column = VectorExpressions.floatDot(a, b)

  /** Dot product composed from built-in higher-order functions (reference
    * implementation / fallback — used in tests to cross-check the native
    * expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity — single textual formula `d / (sqrt(na) * sqrt(nb))`
    * so both engines execute the same IEEE op sequence. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Deterministic random hyperplanes for sign-LSH: values in [-0.5, 0.5)
    * from a fixed-seed SplitMix64-style generator. The SAME literals are
    * embedded in the DuckDB oracle SQL (see VectorOps). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // top 53 bits → [0,1) → [-0.5, 0.5)
      (z >>> 11).toDouble / 9007199254740992.0 - 0.5
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** Sign-LSH bucket id in [0, 2^nPlanes): bit j set iff dot(v, plane_j) > 0.
    * The plane is a literal double array, so the fold is
    * sum_i(cast(v[i] as double) * <literal>) in index order. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeDot = aggregate(
        zip_with(v, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t)
      when(planeDot > 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}

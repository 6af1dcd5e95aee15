package graft.functions

import graft.plans.GraftExtensions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `ArrayType(FloatType)` columns.
  *
  * The production entry points ([[cosine]], [[hyperplaneSignature]]) compile
  * to the native Catalyst expressions in [[graft.plans.VectorExpressions]] —
  * one fused primitive loop per row inside whole-stage codegen. The
  * higher-order-function forms ([[cosineHof]], [[hyperplaneSignatureHof]])
  * are kept as the independently-derived reference implementation: they
  * evaluate per-element lambdas (interpreted, boxed) and exist so property
  * tests can assert bit-parity between the two paths.
  *
  * All accumulation is double-precision and strictly left-to-right over the
  * array in BOTH paths, which makes results bit-deterministic for a given row
  * (needed for the oracle hash checks).
  */
object VectorFunctions {

  /** cos(a,b) — native codegen'd expression; null when lengths differ, any
    * element is null, or either norm is 0. Resolved through the session
    * function registry ([[graft.plans.GraftExtensions]]). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `bits` sign bits
    * packed into a long (MSB-first), planes drawn from a fixed seed so bucket
    * assignment is deterministic across runs and executors. Native codegen'd
    * expression; the plane matrix is baked in at plan time. */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column =
    call_function("hyperplane_sig", vec, lit(dim), lit(bits), lit(seed))

  // ------------------------------------------------------------ HOF forms

  /** Σ aᵢ·bᵢ with double accumulation (HOF reference path). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)),
        (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ (HOF reference path). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) via higher-order functions — reference implementation for
    * parity tests. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(d / (na * nb))
  }

  /** Hyperplane signature via higher-order functions — reference
    * implementation for parity tests: acc' = acc*2 + (vec·plane >= 0). */
  def hyperplaneSignatureHof(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val flat = GraftExtensions.planeMatrix(dim, bits, seed)
    val planes: Seq[Seq[Double]] =
      (0 until bits).map(b => (0 until dim).map(j => flat(b * dim + j)))
    val v = vec.cast(ArrayType(DoubleType))
    aggregate(
      typedlit(planes),
      lit(0L),
      (acc, plane) =>
        acc * 2 + when(
          aggregate(zip_with(v, plane, (x, w) => x * w), lit(0.0),
            (s, t) => s + t) >= 0.0, lit(1L)).otherwise(lit(0L)))
  }
}

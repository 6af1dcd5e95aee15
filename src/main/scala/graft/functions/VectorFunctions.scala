package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `ArrayType(FloatType)` columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) — no
  * Scala UDFs, so the expressions stay inside whole-stage codegen and
  * vectorize on the executor.
  *
  * All accumulation is double-precision and strictly left-to-right over the
  * array, which makes results bit-deterministic for a given row (needed for
  * the oracle hash checks).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)),
        (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b); null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(d / (na * nb))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `bits` sign bits
    * packed into a long (MSB-first). Hyperplanes come from a fixed seed so
    * bucket assignment is deterministic across runs and executors; the plane
    * matrix travels as a literal, so the whole signature stays one codegen'd
    * expression: acc' = acc*2 + (vec·plane >= 0). */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] = Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
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

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composed alternative (`zip_with`/`aggregate` higher-order functions,
  * kept in [[graft.functions.VectorFunctions]] as the reference
  * implementation) evaluates one lambda call per element outside
  * whole-stage codegen. For a 64-dim cosine that is ~192 boxed lambda
  * invocations per row; these expressions compile to a single fused primitive
  * loop inside the generated code — the "native Expression beats UDF beats
  * HOF" preference order of the extension brief. Both carry an interpreted
  * `nullSafeEval` with identical semantics, so they work in
  * interpreted-fallback paths and property tests verify bit-parity with the
  * HOF forms.
  */

/** Per-side primitive accessor: both float and double element types are
  * supported (a float corpus column is routinely compared against a
  * double-precision query literal), resolved at plan/codegen time — never a
  * per-row branch. Any other element type fails loudly at planning. */
private object VectorElem {
  def genGet(dt: DataType, arr: String, idx: String, side: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($idx)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($idx)"
      case other => throw new IllegalArgumentException(
        s"$side must be array<float> or array<double>, got ${other.simpleString(10)}")
    }

  def read(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  /** Analysis-time gate: these expressions read primitive slots directly, so
    * a wrong-typed array must be an analysis error, never garbage values. */
  def check(name: String, dts: DataType*): TypeCheckResult = {
    val bad = dts.filterNot {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double> arguments, got " +
        bad.map(_.simpleString(10)).mkString(", "))
  }
}

/** cos(a, b) over array<float>/array<double> columns in ONE pass (dot and both
  * norms accumulate in the same loop, double precision, strict left-to-right
  * — bit-deterministic). NULL when either argument is null, lengths differ,
  * any element is null, or either norm is zero — exactly the HOF composition's
  * null semantics. */
case class CosineSimilarityFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorElem.check(prettyName, left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = VectorElem.read(left.dataType, x, i)
      val yi = VectorElem.read(right.dataType, y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      val getX = VectorElem.genGet(left.dataType, a, i, "cosine_sim left")
      val getY = VectorElem.genGet(right.dataType, b, i, "cosine_sim right")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if ($bad || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: `bits` sign bits of plane·vec packed into
  * a long, MSB-first. The plane matrix (bits×dim, flattened row-major) is
  * derived lazily from (dim, bits, seed) — keeping the case-class fields
  * scalar preserves structural equality between independently built
  * instances, so common-subexpression elimination and exchange reuse see
  * identical signature expressions as equal (an Array field would compare by
  * reference and defeat both). One multiply-accumulate loop in codegen, no
  * per-plane lambda evaluation.
  *
  * Degenerate inputs (length != dim, or any null element) yield signature 0 —
  * the same value the HOF composition produces, since every per-plane dot
  * goes null and each `when(null >= 0)` bit falls to 0. */
case class HyperplaneSignature(child: Expression, dim: Int, bits: Int,
    seed: Long)
    extends UnaryExpression {

  @transient private lazy val planes: Array[Double] =
    GraftExtensions.planeMatrix(dim, bits, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorElem.check(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return 0L; i += 1 }
    var acc = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      val base = b * dim
      var j = 0
      while (j < dim) {
        s += planes(base + j) * VectorElem.read(child.dataType, v, j); j += 1
      }
      acc = acc * 2L + (if (s >= 0.0) 1L else 0L)
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val ok = ctx.freshName("ok")
      val getV = VectorElem.genGet(child.dataType, v, j, "hyperplane_sig input")
      s"""
         |boolean $ok = ($v.numElements() == $dim);
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($v.isNullAt($j)) $ok = false;
         |}
         |long $acc = 0L;
         |if ($ok) {
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $s = 0.0;
         |    int $base = $b * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += $planesRef[$base + $j] * $getV;
         |    }
         |    $acc = $acc * 2L + ($s >= 0.0 ? 1L : 0L);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

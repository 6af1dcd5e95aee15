package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** The SemDeDup per-block transitive closure + keep-rule as ONE native
  * kernel (`semdedup_closure(ms, es)`): `ms` = a closure block's
  * (vec_id, cscore) members, `es` = its qualifying similarity pairs (null
  * when the block has none). Edges never span blocks, so a block-local
  * union-find is the EXACT transitive closure. Labels = each set's members
  * under path-halving union-find; per group of size ≥ 2 keep the member
  * LEAST similar to its centroid (lowest cscore, ties → smaller vec_id —
  * the SemDeDup keep-rule); singletons keep themselves. Returns
  * struct<_1: n_dup_groups, _2: n_dropped, _3: kept_id_sum>.
  *
  * Until r16 this kernel was a Scala `udf` — a [[org.apache.spark.sql.catalyst.expressions.ScalaUDF]]
  * in q257's plan, which the de-vacuized PlanQualitySpec sweep (ADVICE r16
  * #1) now correctly flags: a ScalaUDF deserializes every member/pair
  * struct into `Row` objects through an encoder round-trip per aggregation
  * row. This expression reads the [[ArrayData]] buffers directly (two
  * primitive arrays + one long→index map) and stays inside the generated
  * stage via a real doGenCode. Blocks are [[graft.queries.Semantic.ClosureMemberCap]]-bounded
  * upstream, so the kernel's working set is capped by construction. */
case class SemDedupClosure(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = SemDedupClosure.outType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "semdedup_closure"

  private def isLongStructArray(dt: DataType, fields: Int): Boolean =
    dt match {
      case ArrayType(st: StructType, _) =>
        st.fields.length >= fields &&
          st.fields.take(fields).forall(_.dataType == LongType)
      case _ => false
    }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongStructArray(left.dataType, 2) &&
        isLongStructArray(right.dataType, 2))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>> members and " +
        s"pairs, got ${left.dataType.simpleString(10)} and " +
        s"${right.dataType.simpleString(10)}")

  // NOT nullSafeEval: a null pair array is a meaningful input (a block with
  // no qualifying pairs — the left-join miss), only null MEMBERS null out.
  override def eval(input: InternalRow): Any = {
    val ms = left.eval(input)
    if (ms == null) null
    else SemDedupClosure.compute(ms.asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msCode = left.genCode(ctx)
    val esCode = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${msCode.code}
        boolean ${ev.isNull} = ${msCode.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${esCode.code}
          ${ev.value} = graft.plans.SemDedupClosure.compute(
            ${msCode.value}, ${esCode.isNull} ? null : ${esCode.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SemDedupClosure {

  val outType: StructType = StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", LongType, nullable = false)))

  /** Block-local union-find closure; `es` may be null (no pairs). */
  def compute(ms: ArrayData, es: ArrayData): InternalRow = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val cs = new Array[Long](n)
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 2)
      ids(i) = r.getLong(0)
      cs(i) = r.getLong(1)
      idx.put(ids(i), i)
      i += 1
    }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    if (es != null) {
      val m = es.numElements()
      var e = 0
      while (e < m) {
        val p = es.getStruct(e, 2)
        val ia = idx.get(p.getLong(0))
        val ib = idx.get(p.getLong(1))
        if (ia == null || ib == null)
          throw new IllegalStateException(
            s"$prettyNameStatic pair references a vec_id outside its " +
              "member block — the (cid, sub) grouping upstream is broken")
        val (a, b) = (find(ia), find(ib))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
        e += 1
      }
    }
    val size = new Array[Int](n)
    val bestCs = new Array[Long](n)
    val bestId = new Array[Long](n)
    java.util.Arrays.fill(bestCs, Long.MaxValue)
    i = 0
    while (i < n) {
      val r = find(i)
      size(r) += 1
      if (cs(i) < bestCs(r) || (cs(i) == bestCs(r) && ids(i) < bestId(r))) {
        bestCs(r) = cs(i)
        bestId(r) = ids(i)
      }
      i += 1
    }
    var groups = 0L
    var dropped = 0L
    var keptSum = 0L
    i = 0
    while (i < n) {
      if (size(i) >= 2) {
        groups += 1L
        dropped += size(i) - 1L
        keptSum += bestId(i)
      } else if (size(i) == 1) keptSum += bestId(i)
      i += 1
    }
    new GenericInternalRow(Array[Any](groups, dropped, keptSum))
  }

  private val prettyNameStatic = "semdedup_closure"
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

private object HashElem {
  /** Analysis-time gate: these expressions call getLong on primitive slots —
    * non-array<bigint> input must fail analysis, never return garbage. */
  def check(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<bigint> argument, got ${other.simpleString(10)}")
  }
}

/** Native signature expressions for the dedup family.
  *
  * The composed alternative — `explode` the shingle-hash stream and fold it
  * through a 64-column aggregate (`min(xxhash64(h, i))` per permutation /
  * conditional ±1 sums per bit) — works, but it materializes |shingles| rows
  * per document, runs 64 aggregate updates per shingle, and needs a full
  * hash-partition SHUFFLE just to regroup what was already per-document data.
  * These expressions compute the same signatures as a narrow per-row map:
  * one fused loop per document, zero exchanges. On a 100 TB corpus that
  * removes the largest shuffle of the MinHash pipeline entirely.
  *
  * Hashing is Spark's own XXH64 with the same seed-chaining as the
  * `xxhash64(h, i)` SQL expression (seed 42, fold left), so signatures are
  * bit-identical to the composed plan — asserted in DedupSpec.
  */

/** MinHash signature: for permutation p, min over shingle hashes h of
  * xxhash64(h, p). Returns array<long> of length `numPerms`; NULL for an
  * empty shingle array (docs with no shingles have no signature — matching
  * the explode-then-aggregate plan, where such docs vanish). Null elements
  * are skipped. */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    HashElem.check(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s1 = XXH64.hashLong(arr.getLong(i), 42L)
        var p = 0
        while (p < numPerms) {
          // hashInt, not hashLong: the permutation index is an INT in the
          // reference composition xxhash64(h, lit(i)), and XXH64 folds int
          // and long inputs differently
          val v = XXH64.hashInt(p, s1)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s1 = ctx.freshName("s1")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numPerms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) continue;
         |    long $s1 = $xxh.hashLong($a.getLong($i), 42L);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      long $v = $xxh.hashInt($p, $s1);
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a (distinct) shingle-hash array: bit b of the result
  * is set iff Σ_h sign(bit b of h) > 0. NULL for an empty array (matching the
  * explode-then-aggregate plan). Null elements are skipped. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    HashElem.check(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) acc |= (1L << b); b += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val counts = ctx.freshName("counts")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $counts = new long[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) continue;
         |    long $h = $a.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |  long $acc = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($counts[$b] > 0) $acc |= (1L << $b);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

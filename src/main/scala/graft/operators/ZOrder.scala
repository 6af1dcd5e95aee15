package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-ORDER layout: multi-column data clustering for scan pruning.
  *
  * [[Load.overwriteSorted]] gives perfect pruning on ONE key — but a range
  * sort on (a, b) leaves b spanning its whole domain inside every file, so
  * predicates on b alone prune nothing. Interleaving the bits of both keys
  * (the Morton curve) makes file ranges compact in BOTH dimensions at once:
  * a predicate on either column skips most files, which on a 100 TB table
  * read by two independent access paths is the difference between two
  * physical copies and one.
  *
  * The key is a plain column expression (64 shift-and-or terms, all
  * codegen'd constants), paid once per row at write time. Production
  * caveat, as for any Z-order: the curve interleaves the RAW integer
  * domains, so heavily skewed columns should be rank/quantile-bucketed
  * first; the fixture keys are near-uniform, which is the honest case for
  * surrogate keys.
  */
object ZOrder {

  /** 64-bit Morton code of two non-negative 32-bit ints: bit i of `a` lands
    * at position 2i+1, bit i of `b` at position 2i. Negative inputs raise at
    * run time rather than silently producing a negative key (a sign-extended
    * bit 31 would land at key bit 63, sorting those rows before everything
    * and voiding the compact-rectangle guarantee the layout exists for). */
  def mortonKey(a: Column, b: Column): Column = {
    val al = a.cast(LongType)
    val bl = b.cast(LongType)
    val key = (0 until 32).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }
    when(al < 0 || bl < 0,
      raise_error(lit("mortonKey requires non-negative inputs")))
      .otherwise(key)
  }

  /** Overwrite with a Z-ordered layout on (colA, colB): range-partition and
    * sort by the Morton key, so every file owns a compact rectangle of the
    * (a, b) plane and parquet min/max stats prune predicates on EITHER
    * column. Same empty-input guard as the other [[Load]] sinks. */
  def overwriteZordered(df: DataFrame, path: String,
      colA: String, colB: String, files: Int): Boolean = {
    if (df.isEmpty) false
    else {
      val z = mortonKey(col(colA), col(colB))
      df.withColumn("_zkey", z)
        .repartitionByRange(files, col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite").parquet(path)
      true
    }
  }

  /** 32-bit Morton code of two 16-bit keys via the magic-mask bit spread
    * (Hacker's Delight §7-2 / the classic Morton interleave): 4 shift-or-
    * mask steps per key instead of [[mortonKey]]'s 16 per-bit terms — an
    * 8× smaller expression tree, which matters twice at scale: per-row
    * work AND Catalyst analysis/codegen cost both track expression size.
    * Inputs MUST already be normalized to [0, 2^16) (callers interleaving
    * unequal key domains normalize first — raw interleaving of an 11-bit
    * and a 7-bit key puts only the wide key's bits at the boundary
    * positions a file layout splits on; q288 measured that mistake at
    * 97%-scan before normalizing). Property-pinned equal to [[mortonKey]]
    * on the shared domain. */
  def mortonKey16(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
      x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
    }
    val al = a.cast(LongType)
    val bl = b.cast(LongType)
    when(al < 0 || bl < 0 || al > 65535 || bl > 65535,
      raise_error(lit("mortonKey16 requires inputs in [0, 65536)")))
      .otherwise(shiftleft(spread(al), 1).bitwiseOR(spread(bl)))
  }
}

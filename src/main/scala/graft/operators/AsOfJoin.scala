package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the greatest right timestamp
  * `rightTs <= leftTs` within the same key (inclusive match). Absent from the
  * reference (SURVEY §2.3 declares no as-of/range joins) and from Spark's
  * built-in join types; provided as a composed operator per the extension
  * brief's preference order (compose > custom plan).
  *
  * Scale shape — a merge as-of, not a range join: both sides are tagged and
  * unioned, then a single hash shuffle on `key` plus one within-partition
  * sort orders every row on (t, side); a running `last(right t)` window then
  * resolves each left row's match in one pass. Work is O(n log n) per key
  * group with NO candidate blow-up — the naive alternative
  * (`l.join(r, key && rTs <= lTs)` + max) materializes |matches| rows per
  * left row before aggregating, which is quadratic on long histories. Skewed
  * keys are handled by AQE skew-split like any other shuffle.
  */
object AsOfJoin {

  /** Left-outer backward as-of: every left row survives; `outCol` holds the
    * matched right timestamp or NULL when no right row precedes it.
    *
    * Right rows sort BEFORE left rows at equal timestamps (side 0 < side 1),
    * making the match inclusive: a right row at exactly `leftTs` matches.
    * Ties among right rows at the same (key, t) carry the same `t` value, so
    * the output is deterministic regardless of physical row order.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__row"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(outCol,
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+ col(outCol): _*)
  }

  /** Left-outer FORWARD as-of: for each left row, the least right timestamp
    * `rightTs >= leftTs` within the same key (inclusive), or NULL when no
    * right row follows. The mirror image of [[backward]] — same single
    * keyed shuffle + one within-partition sort, traversed in DESCENDING
    * time order so the running window carries the nearest FUTURE right
    * timestamp; right rows still sort before left rows at equal timestamps
    * (side 0 first under the (t DESC, side ASC) order), keeping the match
    * inclusive. The "next scheduled event" lookup of a time-series join. */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__row"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy("__k").orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(outCol,
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+ col(outCol): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — an operator Spark lacks natively, composed
  * from existing ops (preference (a) of the custom-operator ladder):
  * for each left row, attach the payload of the latest right row with
  * `rightTime <= leftTime` on the same key.
  *
  * Implementation: tag and union both sides, then ONE window pass per
  * key ordered by (time, side) carrying the last non-null right
  * payload forward. Exactly one shuffle on the key — the sort-merge
  * as-of algorithm, distributed; no range join, no per-row lookup.
  * Right-side time ties must be pre-resolved by the caller (e.g. keep
  * the max-tiebreak row) — the window would otherwise pick
  * nondeterministically.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        Seq(col("_k"), col("_t"), col("_side")) ++
          leftCols.map(col) ++
          payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        Seq(col("_k"), col("_t"), col("_side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col): _*)
    // right rows sort before left rows at equal time → inclusive (<=)
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] =
      payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    l.unionByName(r)
      .select(Seq(col("_side")) ++ leftCols.map(col) ++ carried: _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Nearest-neighbor as-of: each left row gets the right row with the
    * MINIMUM |time delta| (backward or forward), ties to the backward
    * side. Same single-shuffle shape as [[join]]: one union, one sort
    * per key, and TWO frames over that one sort (trailing last +
    * leading first) — never a per-row search or a range join. Output
    * adds `direction` ('b'/'f', null when the key has no right rows)
    * and the signed `delta` (leftTime − matched rightTime).
    * Right-side time ties must be pre-collapsed by the caller, as in
    * [[join]].
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rCarry = "_rt" +: payload
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        Seq(col("_k"), col("_t"), col("_side")) ++
          leftCols.map(col) ++
          (lit(null).cast(right.schema(rightTime).dataType).as("_rt") +:
            payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        Seq(col("_k"), col("_t"), col("_side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          (col(rightTime).as("_rt") +: payload.map(col)): _*)
    // right rows sort before left rows at equal time → the backward
    // frame is inclusive (≤) and an equal-time right row never lands
    // in the forward frame (a distance-0 match resolves backward)
    val wb = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withCands = l
      .unionByName(r)
      .select(
        Seq(col("_side"), col("_t")) ++ leftCols.map(col) ++
          rCarry.flatMap(c =>
            Seq(
              last(col(c), ignoreNulls = true).over(wb).as(s"_b_$c"),
              first(col(c), ignoreNulls = true).over(wf).as(s"_f_$c"))): _*)
      .filter(col("_side") === 1)
    val backwardWins = col("_f__rt").isNull ||
      (col("_b__rt").isNotNull && (col("_t") - col("_b__rt")) <= (col("_f__rt") - col("_t")))
    withCands.select(
      leftCols.map(col) ++
        payload.map(c => when(backwardWins, col(s"_b_$c")).otherwise(col(s"_f_$c")).as(c)) ++
        Seq(
          when(col("_b__rt").isNull && col("_f__rt").isNull, lit(null).cast("string"))
            .otherwise(when(backwardWins, "b").otherwise("f")).as("direction"),
          (col("_t") - when(backwardWins, col("_b__rt")).otherwise(col("_f__rt"))).as("delta")): _*)
  }
}

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
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** DiskANN RobustPrune (Subramanya et al. 2019, Alg. 2) over ONE
  * node's candidate list, run natively in a single pass (r13
  * optimization round). The former DataFrame form ran the r selection
  * rounds as r sequential distributed jobs — per round one window
  * argmax + two corpus joins + an eager checkpoint, ~16 stage-jobs per
  * prune invocation and three invocations per Vamana build, which the
  * profiler showed dominating `ann_vamana` (229 stage-jobs at ~175 ms
  * each). Here the per-node loop is the same arithmetic on the same e6
  * integer grid — argmax by (cos_e6 desc, c asc), then drop every
  * remaining v with α·(1e6 − cosE6(c*, v)) ≤ (1e6 − cosE6(p, v)),
  * cross-multiplied exactly — so the emitted (c, cos_e6, rank) rows
  * are bit-identical to the unrolled form (the DuckDB oracle replays
  * the unrolled CTEs unchanged and still hash-matches; VamanaSpec pins
  * the α invariant and selection-order monotonicity on this path).
  *
  * Input: array<struct<c: bigint, cos_e6: bigint, emb: array<float>>>
  * (one node's scored candidates, any order; (c) unique per the
  * callers' upstream distinct — duplicate c of a pick is dropped
  * exactly like the old `c != cstar` filter).
  * Output: array<struct<c: bigint, cos_e6: bigint, rank: bigint>>,
  * rank = 1-based selection order, ≤ r entries, stops early when the
  * candidate set empties (the window-over-empty behaviour).
  *
  * The cosine is [[CosineSim]]'s exact float→double loop with the
  * same `floor(cos·1e6 + 0.5)` half-up quantization the `cosE6`
  * column expression applies — digit-for-digit the join form.
  */
case class RobustPruneExpr(child: Expression, r: Int, alphaNum: Long, alphaDen: Long)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b, c)), _)
        if a.dataType == LongType && b.dataType == LongType &&
          (c.dataType == ArrayType(FloatType, false) ||
            c.dataType == ArrayType(FloatType, true)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"robust_prune expects array<struct<bigint, bigint, array<float>>>, got " +
          other.simpleString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c", LongType, nullable = false),
      StructField("cos_e6", LongType, nullable = false),
      StructField("rank", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "robust_prune"

  /** `CAST(floor(cosine_sim(a, b) * 1000000 + 0.5) AS BIGINT)` — the
    * exact expression-grid quantization of [[CosineSim]]'s value.
    */
  private def cosE6(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val cos = if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
    math.floor(cos * 1000000.0 + 0.5).toLong
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cs = new Array[Long](n)
    val cos = new Array[Long](n)
    val embs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 3)
      cs(i) = st.getLong(0)
      cos(i) = st.getLong(1)
      embs(i) = st.getArray(2)
      i += 1
    }
    val alive = Array.fill(n)(true)
    val picks = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var round = 1
    var done = false
    while (round <= r && !done) {
      // argmax over the survivors by (cos_e6 desc, c asc) — the
      // row_number()-over-(cos_e6 desc, c) = 1 pick
      var best = -1
      i = 0
      while (i < n) {
        if (alive(i) &&
          (best < 0 || cos(i) > cos(best) || (cos(i) == cos(best) && cs(i) < cs(best))))
          best = i
        i += 1
      }
      if (best < 0) done = true
      else {
        picks += new GenericInternalRow(
          Array[Any](cs(best), cos(best), round.toLong))
        alive(best) = false
        if (round < r) {
          // drop the pick's duplicates (c = cstar) and every v the
          // pick α-dominates — the exact cross-multiplied compare
          i = 0
          while (i < n) {
            if (alive(i)) {
              if (cs(i) == cs(best)) alive(i) = false
              else if (alphaNum * (1000000L - cosE6(embs(best), embs(i))) <=
                  alphaDen * (1000000L - cos(i))) alive(i) = false
            }
            i += 1
          }
        }
        round += 1
      }
    }
    new GenericArrayData(picks.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): RobustPruneExpr =
    copy(child = newChild)
}

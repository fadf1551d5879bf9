package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Achlioptas ±1 random projection: 64-dim float vector → `k`
  * doubles, y_j = (Σᵢ ±xᵢ) / √k with the sign matrix derived from
  * md5('graft-rp:i:j') parity ([[RpProject.sign]] — the same public
  * engine-portable definition the DuckDB oracle replays as literals).
  *
  * Exists because the composed form — a k×64-term textual expression
  * (2048 adds at k=32) — costs seconds of planning/codegen per query
  * before a single row moves; this kernel is one reference object and
  * a 2-level loop, codegen'd inside the same whole stage. Arithmetic
  * is ORDER-IDENTICAL to the literal chain (left-to-right adds of
  * ±(double)xᵢ, then one divide by √k), so results are bit-identical
  * and every projection oracle is unchanged.
  *
  * Null elements contribute 0 (corpus embeddings are non-null floats;
  * the literal form would null the whole dim instead — don't feed
  * sparse-null vectors to either).
  */
case class RpProject(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"rp_project expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rp_project"

  // flat k×64 sign matrix: signs(j*64 + i) = sign(i, j)
  @transient private lazy val signs: Array[Double] = RpProject.matrix(k)
  @transient private lazy val sqrtK: Double = math.sqrt(k.toDouble)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(64, x.numElements())
    val ys = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) acc += signs(j * 64 + i) * x.getFloat(i).toDouble
        i += 1
      }
      ys(j) = acc / sqrtK
      j += 1
    }
    new GenericArrayData(ys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val signsRef = ctx.addReferenceObj("rpSigns", signs, "double[]")
        val n = ctx.freshName("rpN")
        val ys = ctx.freshName("rpYs")
        val acc = ctx.freshName("rpAcc")
        val i = ctx.freshName("rpI")
        val j = ctx.freshName("rpJ")
        s"""
        |int $n = java.lang.Math.min(64, $x.numElements());
        |double[] $ys = new double[$k];
        |for (int $j = 0; $j < $k; $j++) {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if (!$x.isNullAt($i)) $acc += $signsRef[$j * 64 + $i] * (double) $x.getFloat($i);
        |  }
        |  $ys[$j] = $acc / ${sqrtK}D;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ys);
      """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}

object RpProject {

  /** ±1 from the parity of the engine-portable 60-bit md5 hash of
    * "graft-rp:i:j" — i the input dim, j the output dim. Public
    * construction: any engine (the DuckDB oracle) re-derives the same
    * matrix, so the "random" projection is reproducible across
    * engines, runs, and backfills.
    */
  def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft-rp:$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 0L) 1 else -1
  }

  private[functions] def matrix(k: Int): Array[Double] = {
    val m = new Array[Double](k * 64)
    var j = 0
    while (j < k) {
      var i = 0
      while (i < 64) { m(j * 64 + i) = sign(i, j).toDouble; i += 1 }
      j += 1
    }
    m
  }
}

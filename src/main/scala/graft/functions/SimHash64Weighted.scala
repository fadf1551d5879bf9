package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Weighted 64-bit SimHash: per-bit vote of ±weight per feature
  * (Charikar SimHash with feature weights — here IDF weights, so rare
  * discriminative tokens dominate the signature and common filler
  * doesn't wash it out). Same one-pass counter-array shape as the
  * unweighted `simhash64`.
  */
case class SimHash64Weighted(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"simhash64w expects (array<bigint>, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64w"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val ws = b.asInstanceOf[ArrayData]
    val n = math.min(hs.numElements(), ws.numElements())
    val votes = new Array[Double](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      val w = ws.getDouble(i)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += w else votes(bit) -= w
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) sig |= (1L << bit); bit += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (hs, ws) => {
        // freshName every local: nullSafeCodeGen inlines this body with
        // no brace scope for non-nullable inputs; fixed names collide when
        // two kernels fuse into one whole-stage (janino redefinition error).
        val n = ctx.freshName("swN")
        val votes = ctx.freshName("swVotes")
        val i = ctx.freshName("swI")
        val h = ctx.freshName("swH")
        val w = ctx.freshName("swW")
        val b = ctx.freshName("swB")
        val sig = ctx.freshName("swSig")
        s"""
        |int $n = java.lang.Math.min($hs.numElements(), $ws.numElements());
        |double[] $votes = new double[64];
        |for (int $i = 0; $i < $n; $i++) {
        |  long $h = $hs.getLong($i);
        |  double $w = $ws.getDouble($i);
        |  for (int $b = 0; $b < 64; $b++) {
        |    if ((($h >>> $b) & 1L) == 1L) $votes[$b] += $w; else $votes[$b] -= $w;
        |  }
        |}
        |long $sig = 0L;
        |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $sig |= (1L << $b); }
        |${ev.value} = $sig;
      """.stripMargin
      })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHash64Weighted =
    copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two float vectors — single fused loop
  * (dot + both norms), whole-stage-codegen'd. The hot inner kernel of
  * the ANN/embedding-dedup operators: at 100 TB this runs once per
  * (candidate, query) pair, so it must stay a tight primitive loop, not
  * a chain of `zip_with`/`aggregate` allocations.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // widen BEFORE multiplying: float-precision products make
      // cos(x, x·k) overshoot 1.0 by ~4e-8 (caught by KernelProps)
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        // freshName every local: nullSafeCodeGen inlines this body with
        // no brace scope for non-nullable inputs, so two cosine_sim calls
        // fused into one whole-stage would redefine locals and break janino.
        val n = ctx.freshName("csN")
        val dot = ctx.freshName("csDot")
        val nx = ctx.freshName("csNx")
        val ny = ctx.freshName("csNy")
        val i = ctx.freshName("csI")
        val a = ctx.freshName("csA")
        val b = ctx.freshName("csB")
        s"""
        |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $a = (double) $x.getFloat($i); double $b = (double) $y.getFloat($i);
        |  $dot += $a * $b; $nx += $a * $a; $ny += $b * $b;
        |}
        |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
      """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

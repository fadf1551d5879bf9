package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over an array of pre-hashed features (token hashes,
  * e.g. from `transform(tokens, t -> xxhash64(t))`): per-bit majority
  * vote, codegen'd as one pass with a 64-slot counter array.
  *
  * Taking `array<long>` (not raw strings) keeps the string hashing in
  * Spark's own codegen'd `xxhash64` and makes this expression a pure
  * bit-vote kernel — per-document work is O(tokens × 64) with zero
  * allocation beyond the counter array.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      hs => {
        // freshName every local: nullSafeCodeGen inlines this body with
        // no brace scope for non-nullable inputs; fixed names collide when
        // two kernels fuse into one whole-stage (janino redefinition error).
        val counts = ctx.freshName("shCounts")
        val i = ctx.freshName("shI")
        val h = ctx.freshName("shH")
        val b = ctx.freshName("shB")
        val sig = ctx.freshName("shSig")
        s"""
        |int[] $counts = new int[64];
        |for (int $i = 0; $i < $hs.numElements(); $i++) {
        |  long $h = $hs.getLong($i);
        |  for (int $b = 0; $b < 64; $b++) {
        |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
        |  }
        |}
        |long $sig = 0L;
        |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] > 0) $sig |= (1L << $b); }
        |${ev.value} = $sig;
      """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

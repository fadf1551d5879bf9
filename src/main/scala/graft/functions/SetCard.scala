package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Set-cardinality kernels over `array<bigint>`: compute
  * |distinct(A) ∩ distinct(B)| / |distinct(A) ∪ distinct(B)| without
  * materializing the intersection/union arrays that
  * `size(array_intersect(...))` / `size(array_union(...))` allocate
  * per row — the hot path of exact-Jaccard verification, where only
  * the counts are ever used. Installed by the `RewriteSetCardinality`
  * optimizer rule.
  */
abstract class SetCardBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _                          => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects (array<bigint> not null, array<bigint> not null), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  // drop-in for Size(...): same result type (int)
  override def dataType: DataType = IntegerType
}

/** |distinct(left) ∩ distinct(right)| — semantics of
  * `size(array_intersect(left, right))` for null-free long arrays.
  */
case class IntersectCard(left: Expression, right: Expression) extends SetCardBase {
  override def prettyName: String = "intersect_card"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val rightSet = new java.util.HashSet[Long](y.numElements() * 2)
    var i = 0
    while (i < y.numElements()) { rightSet.add(y.getLong(i)); i += 1 }
    val seen = new java.util.HashSet[Long](x.numElements() * 2)
    var n = 0
    i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i)
      if (rightSet.contains(v) && seen.add(v)) n += 1
      i += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        // freshName every local: nullSafeCodeGen inlines this body with
        // no brace scope for non-nullable inputs, so two fused instances
        // (e.g. intersect_card + union_card in one projection after
        // RewriteSetCardinality) would redefine locals and break janino.
        val rightSet = ctx.freshName("icRight")
        val seen = ctx.freshName("icSeen")
        val n = ctx.freshName("icN")
        val i = ctx.freshName("icI")
        val v = ctx.freshName("icV")
        s"""
        |java.util.HashSet $rightSet = new java.util.HashSet($y.numElements() * 2);
        |for (int $i = 0; $i < $y.numElements(); $i++) {
        |  $rightSet.add(java.lang.Long.valueOf($y.getLong($i)));
        |}
        |java.util.HashSet $seen = new java.util.HashSet($x.numElements() * 2);
        |int $n = 0;
        |for (int $i = 0; $i < $x.numElements(); $i++) {
        |  java.lang.Long $v = java.lang.Long.valueOf($x.getLong($i));
        |  if ($rightSet.contains($v) && $seen.add($v)) $n++;
        |}
        |${ev.value} = $n;
      """.stripMargin
      })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCard =
    copy(left = l, right = r)
}

/** |distinct(left) ∪ distinct(right)| — semantics of
  * `size(array_union(left, right))` for null-free long arrays.
  */
case class UnionCard(left: Expression, right: Expression) extends SetCardBase {
  override def prettyName: String = "union_card"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Long]((x.numElements() + y.numElements()) * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getLong(i)); i += 1 }
    i = 0
    while (i < y.numElements()) { set.add(y.getLong(i)); i += 1 }
    set.size()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val set = ctx.freshName("ucSet")
        val i = ctx.freshName("ucI")
        s"""
        |java.util.HashSet $set =
        |  new java.util.HashSet(($x.numElements() + $y.numElements()) * 2);
        |for (int $i = 0; $i < $x.numElements(); $i++) {
        |  $set.add(java.lang.Long.valueOf($x.getLong($i)));
        |}
        |for (int $i = 0; $i < $y.numElements(); $i++) {
        |  $set.add(java.lang.Long.valueOf($y.getLong($i)));
        |}
        |${ev.value} = $set.size();
      """.stripMargin
      })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnionCard =
    copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SRP-LSH bucket id: bit p = sign(Σᵢ ±⌊xᵢ·10⁶⌋) over the
  * md5-parity Rademacher planes of `table` ([[LshBucket.sign]] — the
  * public engine-portable definition the DuckDB oracle rebuilds
  * relationally). One pass over the vector computes ALL `bits` dots:
  * the composed form (one zip_with + aggregate per bit) re-reads the
  * array `bits` times and carries a 24-aggregate expression tree at
  * the 100 TB bit count. Integer sums are exact and order-independent,
  * so kernel and composed form are value-identical by construction.
  */
case class LshBucket(child: Expression, table: Int, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  // flat bits×64 sign matrix: signs(p*64 + i) = sign(table, p, i)
  @transient private lazy val signs: Array[Long] = LshBucket.matrix(table, bits)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(64, x.numElements())
    var bucket = 0L
    var p = 0
    while (p < bits) {
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i))
          dot += signs(p * 64 + i) * math.floor(x.getFloat(i).toDouble * 1000000.0).toLong
        i += 1
      }
      if (dot > 0L) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[]")
        val n = ctx.freshName("lbN")
        val bucket = ctx.freshName("lbBucket")
        val dot = ctx.freshName("lbDot")
        val i = ctx.freshName("lbI")
        val p = ctx.freshName("lbP")
        s"""
        |int $n = java.lang.Math.min(64, $x.numElements());
        |long $bucket = 0L;
        |for (int $p = 0; $p < $bits; $p++) {
        |  long $dot = 0L;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if (!$x.isNullAt($i))
        |      $dot += $signsRef[$p * 64 + $i]
        |        * (long) java.lang.Math.floor((double) $x.getFloat($i) * 1000000.0);
        |  }
        |  if ($dot > 0L) $bucket |= (1L << $p);
        |}
        |${ev.value} = $bucket;
      """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** ±1 from md5('graft-lsh:t:p:i') parity — table t, plane p, dim i. */
  def sign(table: Int, p: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex =
      md.digest(s"graft-lsh:$table:$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 0L) 1 else -1
  }

  private[functions] def matrix(table: Int, bits: Int): Array[Long] = {
    val m = new Array[Long](bits * 64)
    var p = 0
    while (p < bits) {
      var i = 0
      while (i < 64) { m(p * 64 + i) = sign(table, p, i).toLong; i += 1 }
      p += 1
    }
    m
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingles: sig[i] = min over
  * shingle hashes h of splitmix64(h + GOLDEN·(i+1)) — `numHashes`
  * universal hash families derived from one base hash per shingle.
  *
  * One codegen'd pass, O(shingles × numHashes) long arithmetic with
  * zero allocation beyond the output array. Replaces the naive
  * `transform(seq, i -> array_min(transform(shingles, s ->
  * xxhash64(i, s))))` formulation, which re-hashes every shingle
  * STRING numHashes times (~100× slower measured at sf0.1).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        var z = h + 0x9e3779b97f4a7c15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < mins(i)) mins(i) = z
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      hs => {
        // Every local MUST be ctx.freshName'd: for non-nullable inputs
        // nullSafeCodeGen inlines this body with no brace scope, so two
        // kernel instances fused into one whole-stage would otherwise
        // redefine the same Java locals and janino fails the compile
        // (silent interpreted fallback — the round-1 perf bug).
        val mins = ctx.freshName("mhMins")
        val j = ctx.freshName("mhJ")
        val h = ctx.freshName("mhH")
        val i = ctx.freshName("mhI")
        val z = ctx.freshName("mhZ")
        s"""
        |long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $j = 0; $j < $hs.numElements(); $j++) {
        |  long $h = $hs.getLong($j);
        |  for (int $i = 0; $i < $numHashes; $i++) {
        |    long $z = $h + 0x9e3779b97f4a7c15L * ($i + 1);
        |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
        |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
        |    $z = $z ^ ($z >>> 31);
        |    if ($z < $mins[$i]) $mins[$i] = $z;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

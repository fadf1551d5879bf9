package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingles: sig[i] = min over
  * shingle hashes h of (aᵢ·(h mod P) + bᵢ) mod P, the classic
  * universal family over the Mersenne prime P = 2³¹−1 (Carter–Wegman
  * '79 / Broder '97), with (aᵢ, bᵢ) derived deterministically from a
  * splitmix64 stream (see companion).
  *
  * The mod-P family (instead of a 64-bit wraparound mixer) is chosen
  * for CROSS-ENGINE REPRODUCIBILITY: aᵢ·r + bᵢ < 2⁶² never overflows
  * a signed 64-bit integer, so plain-SQL engines (the DuckDB oracle in
  * `SparkEntry.oracleSql`) recompute bit-identical signatures. The
  * reduction uses the Mersenne shift trick — no division in the hot
  * loop.
  *
  * One codegen'd pass, O(shingles × numHashes) long arithmetic with
  * zero allocation beyond the output array. Replaces the naive
  * `transform(seq, i -> array_min(transform(shingles, s ->
  * xxhash64(i, s))))` formulation, which re-hashes every shingle
  * STRING numHashes times (~100× slower measured at sf0.1).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  private lazy val famA: Array[Long] = Array.tabulate(numHashes)(MinHashSig.a)
  private lazy val famB: Array[Long] = Array.tabulate(numHashes)(MinHashSig.b)

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
    val p = MinHashSig.P
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j)
      val r = ((h % p) + p) % p // nonneg residue; identity for h ≥ 0
      var i = 0
      while (i < numHashes) {
        // (a·r + b) mod P via the Mersenne reduction: 2³¹ ≡ 1 (mod P),
        // so x mod P = fold of (x >> 31) + (x & P); two folds suffice
        // for x < 2⁶², then one conditional subtract.
        var z = famA(i) * r + famB(i)
        z = (z >>> 31) + (z & p)
        z = (z >>> 31) + (z & p)
        if (z >= p) z -= p
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
        val r = ctx.freshName("mhR")
        val i = ctx.freshName("mhI")
        val z = ctx.freshName("mhZ")
        val aRef = ctx.addReferenceObj("mhFamA", famA, "long[]")
        val bRef = ctx.addReferenceObj("mhFamB", famB, "long[]")
        val p = MinHashSig.P
        s"""
        |long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $j = 0; $j < $hs.numElements(); $j++) {
        |  long $h = $hs.getLong($j);
        |  long $r = (($h % ${p}L) + ${p}L) % ${p}L;
        |  for (int $i = 0; $i < $numHashes; $i++) {
        |    long $z = $aRef[$i] * $r + $bRef[$i];
        |    $z = ($z >>> 31) + ($z & ${p}L);
        |    $z = ($z >>> 31) + ($z & ${p}L);
        |    if ($z >= ${p}L) $z -= ${p}L;
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

/** The (aᵢ, bᵢ) family constants: aᵢ ∈ [1, P−1], bᵢ ∈ [0, P−1],
  * derived from a splitmix64 stream so every engine (this kernel, the
  * DuckDB oracle, a future re-implementation) can regenerate them
  * from the index alone.
  */
object MinHashSig {

  /** Family modulus: the Mersenne prime 2³¹ − 1. */
  val P = 2147483647L

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def a(i: Int): Long = (mix(2L * i + 1) & Long.MaxValue) % (P - 1) + 1
  def b(i: Int): Long = (mix(2L * i + 2) & Long.MaxValue) % P
}

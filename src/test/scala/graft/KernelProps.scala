package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{CosineSim, IntersectCard, MinHashSig, SimHash64, UnionCard}

/** Property-based checks of the native kernels against reference
  * implementations — evaluated directly through nullSafeEval (no
  * session), so hundreds of random cases cost milliseconds.
  */
object KernelProps extends Properties("graft.kernels") {

  private val dummy = Literal(1)

  private def floats(g: Gen[Float], n: Gen[Int]): Gen[Array[Float]] =
    n.flatMap(k => Gen.containerOfN[Array, Float](k, g))

  // scalacheck's numeric edge cases include NaN; real embeddings are
  // finite floats, so the kernel contract excludes specials
  private val vecGen = floats(
    Gen.chooseNum(-10.0f, 10.0f).map(f => if (f.isNaN || f.isInfinite) 0.0f else f),
    Gen.chooseNum(1, 64))
  private val longsGen =
    Gen.chooseNum(0, 40).flatMap(k => Gen.containerOfN[Array, Long](k, Gen.chooseNum(-50L, 50L)))

  private def cos(a: Array[Float], b: Array[Float]): Double =
    CosineSim(dummy, dummy)
      .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
      .asInstanceOf[Double]

  private def simhash(a: Array[Long]): Long =
    SimHash64(dummy).nullSafeEval(new GenericArrayData(a)).asInstanceOf[Long]

  private def minhash(a: Array[Long]): Seq[Long] =
    MinHashSig(dummy, 32)
      .nullSafeEval(new GenericArrayData(a))
      .asInstanceOf[GenericArrayData]
      .toLongArray()
      .toSeq

  property("cosine(x, x) == 1 for nonzero x") = Prop.forAll(vecGen) { x =>
    val nonzero = x.exists(_ != 0.0f)
    !nonzero || math.abs(cos(x, x) - 1.0) < 1e-6
  }

  property("cosine is symmetric and bounded") = Prop.forAll(vecGen, vecGen) { (a, b) =>
    val c1 = cos(a, b); val c2 = cos(b, a)
    val ok = math.abs(c1 - c2) < 1e-12 && c1 <= 1.0 + 1e-9 && c1 >= -1.0 - 1e-9
    if (!ok) println(s"COUNTEREXAMPLE c1=$c1 c2=$c2 a=${a.toList} b=${b.toList}")
    ok
  }

  property("simhash is invariant under feature duplication") = Prop.forAll(longsGen) { a =>
    simhash(a ++ a) == simhash(a)
  }

  property("minhash_sig(a ++ b) == elementwise min of signatures") =
    Prop.forAll(longsGen, longsGen) { (a, b) =>
      val merged = minhash(a ++ b)
      val expect = minhash(a).zip(minhash(b)).map { case (x, y) => math.min(x, y) }
      merged == expect
    }

  // pins the Mersenne-shift reduction against exact BigInt arithmetic —
  // the cross-engine contract the DuckDB oracle replays with plain %
  property("minhash family values equal (a*(h mod P)+b) mod P exactly, any input sign") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { h =>
      val p = BigInt(MinHashSig.P)
      val r = ((BigInt(h) mod p) + p) mod p
      val expect = (0 until 32).map(i =>
        ((BigInt(MinHashSig.a(i)) * r + BigInt(MinHashSig.b(i))) mod p).toLong)
      minhash(Array(h)) == expect
    }

  property("minhash signatures live in [0, P)") = Prop.forAll(longsGen) { a =>
    a.isEmpty || minhash(a).forall(v => v >= 0 && v < MinHashSig.P)
  }

  property("intersect_card matches Set intersection size") =
    Prop.forAll(longsGen, longsGen) { (a, b) =>
      val got = IntersectCard(dummy, dummy)
        .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
        .asInstanceOf[Int]
      got == (a.toSet & b.toSet).size
    }

  property("union_card matches Set union size") =
    Prop.forAll(longsGen, longsGen) { (a, b) =>
      val got = UnionCard(dummy, dummy)
        .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
        .asInstanceOf[Int]
      got == (a.toSet | b.toSet).size
    }
}

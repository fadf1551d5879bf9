package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit string hash as a native kernel:
  * numerically IDENTICAL to
  * `conv(substring(md5(cast(s as binary)), 1, 15), 16, 10)` — i.e. the
  * first 15 hex digits of the MD5 as an integer, which every SQL
  * engine can recompute (`('0x' || substr(md5(s),1,15))::BIGINT` in
  * DuckDB) — but computed straight from the digest bytes: big-endian
  * first 8 bytes, logical-shifted right 4. Skips the 32-char hex
  * string, the substring, and the base-16 string parse that the
  * composed form allocates PER SHINGLE — the hot inner loop of the
  * dedup family.
  *
  * Non-nullable for non-nullable input, so `transform(tokens,
  * t -> hash60(t))` keeps `array<bigint> containsNull=false` — the
  * type the set-cardinality kernels and RewriteSetCardinality key on.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"hash60 expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Hash60.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  // MessageDigest is stateful; one instance per executor thread
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes): bytes 0..7 big-endian >>> 4 —
    * exactly the integer the first 15 hex digits spell.
    */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

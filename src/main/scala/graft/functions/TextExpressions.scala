package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * One-pass k-element MinHash signature over an `array<string>` of shingles.
 *
 * Hash family (Kirsch-Mitzenmacher): one md5 per shingle, split into two
 * unsigned 32-bit halves (hex chars 1-8 → a, 9-16 → b); the j-th hash is
 * `(a + j·b) mod 2^32`. One digest per shingle instead of k — ~k× less
 * hashing than salting md5 per hash — while staying engine-replayable:
 * the DuckDB oracle recomputes the identical values from `md5(s)` hex.
 *
 * Imperative with a reused MessageDigest per task (expressions are
 * deserialized per task, so the transient digest is single-threaded).
 * CodegenFallback: md5 dominates; only this projection drops out of
 * codegen, the surrounding plan keeps its spans.
 */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0 && k <= 64, s"k must be in [1,64], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      // unsigned big-endian 32-bit halves == hex chars 1-8 / 9-16 of md5(s)
      val a = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      val b = ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
        ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
      var j = 0
      while (j < k) {
        val h = (a + j * b) & 0xffffffffL
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

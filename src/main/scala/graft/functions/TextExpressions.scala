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
    var seen = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 }
      else {
      seen += 1
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
    }
    // all-null input == empty input: no shingles to hash → null signature
    // (null elements are skipped — the public API accepts
    // containsNull=true arrays; internal pipelines never produce them)
    if (seen == 0) return null
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * 64-bit SimHash over an `array<string>` of tokens, returned as a 64-char
 * '0'/'1' string (bit b = sign of Σ_tokens ±1 votes; bit b of a token =
 * bit b%4 of hex digit b/4 of md5(token) — identical to the declarative
 * [[graft.ops.TextOps.simhash64FromHashes]] and to the DuckDB oracle).
 *
 * One md5 digest per token, votes accumulated from the digest BYTES
 * (hex char 2c is the high nibble of byte c) — no hex strings, no
 * per-bit substring walks. ~64× less per-token work than the HOF form.
 */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64"

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
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null tokens are skipped (no vote) — the public API accepts
      // containsNull=true arrays; internal pipelines never produce them
      if (arr.isNullAt(i)) { i += 1 }
      else {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      var c = 0 // hex-digit index 0..15 over the first 8 digest bytes
      while (c < 16) {
        val byte = digest(c >> 1) & 0xff
        val digit = if ((c & 1) == 0) byte >> 4 else byte & 0xf
        var k = 0
        while (k < 4) {
          votes(c * 4 + k) += (((digit >> k) & 1) * 2 - 1)
          k += 1
        }
        c += 1
      }
      i += 1
      }
    }
    val bits = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      bits(b) = if (votes(b) >= 0) '1'.toByte else '0'.toByte
      b += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(bits)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Polynomial rolling-hash fingerprint over a string's Unicode code
 * points: fold `(acc*31 + codePoint) mod 1e9+7` left-to-right — the
 * native form of `aggregate(transform(sequence(...), i ->
 * ascii(substr(s,i,1))), ...)`, which walks an interpreted lambda per
 * CHARACTER (14s for 5000 docs at sf0.1; this kernel is milliseconds).
 * Matches DuckDB's `ascii()` (code point) replay exactly.
 */
case class Fingerprint(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 work (driver round 14): the r13 ADVICE regression pins
  * (NearestSeed stale-buffer cache, WavAudio undeclared frame count)
  * plus specs for the round's new operators. */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- NearestSeed cache: same Unsafe buffer, different bytes ----

  test("NearestSeed re-unpacks when a reused UnsafeRow buffer carries new seed bytes") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, GenericInternalRow}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._

    val fields: Array[DataType] = Array(
      ArrayType(DoubleType), DoubleType,
      ArrayType(ArrayType(DoubleType)), ArrayType(DoubleType))
    // ONE projection => one BufferHolder: every apply() rewrites the
    // SAME backing array at the SAME offset — the exact aliasing the
    // (baseObject, baseOffset) cache key cannot distinguish.
    val proj = UnsafeProjection.create(fields)
    def unsafeRow(vec: Array[Double], seeds: Array[Array[Double]]): InternalRow = {
      val g = new GenericInternalRow(4)
      g.update(0, new GenericArrayData(vec))
      g.update(1, math.sqrt(vec.map(x => x * x).sum))
      g.update(2, new GenericArrayData(
        seeds.map(s => new GenericArrayData(s)): Array[Any]))
      g.update(3, new GenericArrayData(
        seeds.map(s => math.sqrt(s.map(x => x * x).sum)): Array[Any]))
      proj.apply(g)
    }
    val expr = graft.functions.NearestSeed(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, DoubleType, nullable = true),
      BoundReference(2, ArrayType(ArrayType(DoubleType)), nullable = true),
      BoundReference(3, ArrayType(DoubleType), nullable = true))

    def e(i: Int): Array[Double] = Array.tabulate(8)(d => if (d == i) 1.0 else 0.0)

    // Case 1: corner elements differ between the two matrices.
    val vecA = Array(1.0, 0.0)
    val seedsA1 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val seedsA2 = Array(Array(0.0, 1.0), Array(1.0, 0.0))
    assert(expr.eval(unsafeRow(vecA, seedsA1)) == 0)
    assert(expr.eval(unsafeRow(vecA, seedsA2)) == 1,
      "stale cache served the previous row's seed matrix (corner case)")

    // Case 2: corners IDENTICAL, only interior seeds rewritten — the
    // sampled-word checksum has to catch this one.
    val vecB = e(2)
    val seedsB1 = Array(e(0), e(2), e(3), e(7)) // argmax cos at position 1
    val seedsB2 = Array(e(0), e(4), e(5), e(7)) // all cos 0 -> tie -> position 0
    assert(expr.eval(unsafeRow(vecB, seedsB1)) == 1)
    assert(expr.eval(unsafeRow(vecB, seedsB2)) == 0,
      "stale cache served the previous row's seed matrix (interior case)")

    // And the legitimate broadcast-constant pattern still hits the
    // cache path correctly (same bytes, repeated evals).
    val r = unsafeRow(vecB, seedsB1)
    assert(expr.eval(r) == 1 && expr.eval(r) == 1)
  }

  // ---- WavAudio: container with no declared frame count ----

  test("WavAudio derives the frame count when the container declares none (AU unknown size)") {
    val frames = 100
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeInt(0x2e736e64) // ".snd"
    d.writeInt(24)         // data offset
    d.writeInt(0xffffffff) // data size UNKNOWN -> reader frameLength -1
    d.writeInt(3)          // 16-bit linear PCM
    d.writeInt(8000)       // sample rate
    d.writeInt(1)          // channels
    (0 until frames).foreach(i => d.writeShort((i * 100).toShort))
    val payload = bos.toByteArray
    val s = graft.ops.Multimodal.MediaCodec.WavAudio.open()
    val dec = s.decode("audio/basic", payload)
    assert(dec.width == frames,
      s"expected derived frame count $frames, got ${dec.width}")
    assert(dec.height == 1)
    s.close()
  }
}

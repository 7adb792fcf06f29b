package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `mode(x)` — most frequent value; NULLs ignored; empty input → NULL.
 *
 * Tie-break matches the reference exactly:
 *  - primitives/dates/times/floats: greatest value wins
 *    (/root/reference/src/common/mode/native.rs:111-131)
 *  - strings: smallest value wins
 *    (/root/reference/src/common/mode/bytes.rs:125-134)
 *
 * Spark-native design: a [[TypedImperativeAggregate]] with a value→count
 * map buffer. Partial maps are built map-side and merged by key on the
 * reducer (same distributive decomposition as the reference's
 * state()/merge_batch, but running under Spark's ObjectHashAggregateExec,
 * which falls back to sort-based aggregation under memory pressure).
 * State is O(distinct values per group); for very-high-cardinality columns
 * at 100 TB prefer the two-shuffle compositional form `GraftOps.modeBy`.
 */
case class GraftMode(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mode"

  // Reference supports primitives/dates/times/timestamps/floats/utf8 only
  // (/root/reference/src/mode.rs:96-215). Complex types are rejected here
  // too: map keys must be value-comparable boxed objects, and unsafe
  // array/struct/binary values would alias reused row buffers.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case dt if org.apache.spark.sql.graft.ColumnBridge.isAtomic(dt) &&
          !dt.isInstanceOf[BinaryType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_mode does not support input type ${other.catalogString}")
    }
  }

  private def isString: Boolean = child.dataType.isInstanceOf[StringType]

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty[AnyRef, Long]

  override def update(
      buffer: mutable.HashMap[AnyRef, Long],
      input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from an UnsafeRow aliases a reused buffer — copy on store.
      val key = v match {
        case s: UTF8String => s.copy()
        case other => other.asInstanceOf[AnyRef]
      }
      val existing = buffer.getOrElse(key, 0L)
      buffer.update(key, existing + 1L)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[AnyRef, Long],
      other: mutable.HashMap[AnyRef, Long]): mutable.HashMap[AnyRef, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    buffer
  }

  private def cmp(a: AnyRef, b: AnyRef): Int =
    a.asInstanceOf[Comparable[AnyRef]].compareTo(b)

  /** true if candidate v beats current best under the reference tie rule. */
  private def tieBetter(v: AnyRef, cur: AnyRef): Boolean =
    if (isString) cmp(v, cur) < 0 else cmp(v, cur) > 0

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    if (buffer.isEmpty) return null
    var bestV: AnyRef = null
    var bestC = Long.MinValue
    buffer.foreach { case (v, c) =>
      if (bestV == null || c > bestC || (c == bestC && tieBetter(v, bestV))) {
        bestV = v
        bestC = c
      }
    }
    bestV
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def serialize(buffer: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val row = new GenericInternalRow(2)
    buffer.foreach { case (k, c) =>
      row.update(0, k)
      row.update(1, c)
      val ur = projection(row)
      out.writeInt(ur.getSizeInBytes)
      out.write(ur.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[AnyRef, Long] = {
    val map = mutable.HashMap.empty[AnyRef, Long]
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    while (in.available() > 0) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      val v = row.get(0, child.dataType) match {
        case s: UTF8String => s.copy()
        case o => o.asInstanceOf[AnyRef]
      }
      map.update(v, map.getOrElse(v, 0L) + row.getLong(1))
    }
    map
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMode =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GraftMode =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): GraftMode =
    copy(child = newChild)
}

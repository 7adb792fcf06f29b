package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/**
 * Bounded per-group KMV state: the k smallest DISTINCT 32-bit hash
 * values, kept in a sorted set capped at k (insert + evict-largest are
 * O(log k)).
 */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }
}

/**
 * Per-group KMV (k-minimum-values) distinct-count estimate as an
 * AGGREGATE: state is the k smallest distinct 32-bit md5 hashes of the
 * group's values; if the k-th smallest is m, the estimate is
 * (k−1)·2^32/m — exact (= |distinct hashes|) when the group has fewer
 * than k distinct values. Error ~1/√k.
 *
 * Why: `countDistinct(x) GROUP BY g` must shuffle every distinct
 * (g, x) pair — at 100 TB the distinct set itself is the bottleneck.
 * This aggregate ships AT MOST k longs per group per map task
 * (map-side combine merges sets), so the shuffle volume is bounded by
 * groups·k regardless of data size, and two sketches merge by set
 * union — the same property that makes the global
 * [[graft.ops.Sketches.kmvDistinct]] a portable artifact.
 *
 * The hash is the first 8 hex chars of md5 (identical to the SQL replay
 * `conv(substring(md5(x), 1, 8), 16, 10)`), so the estimate is
 * bit-identical in every engine. Null inputs are ignored (like
 * count distinct). Runs under ObjectHashAggregate with sort fallback.
 */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      md.reset()
      val digest = md.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      // unsigned big-endian 32-bit = first 8 hex chars of md5(s)
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      buf.insert(h)
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.set.size
    if (n == 0) null
    // same operation order as the SQL replay: (k-1)·2^32 (exact dyadic
    // product), then ONE division
    else if (n < k) n.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf.set.last().toDouble
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * [[TypedImperativeAggregate]] — the oracle-expressible alternative to
  * HLL (`q_approx_distinct` is rows-only because Spark's HLL register
  * layout has no DuckDB twin; the k smallest portable md5 hashes DO:
  * `ORDER BY hash LIMIT k` + the same estimator arithmetic).
  *
  * Estimator (Bar-Yossef et al. 2002): hash every value to the uniform
  * 32-bit portable hash `int(md5(x)[:8 hex])`; keep the k smallest
  * DISTINCT hashes. With h_k = the k-th smallest, distinct ≈
  * (k−1) · 2³² / h_k; when fewer than k distinct hashes exist the sketch
  * degenerates to the exact count. Deterministic given the data — no RNG,
  * no ordering sensitivity — so the result hash-matches cross-engine,
  * unlike every HLL implementation.
  *
  * Scale shape: the buffer is a bounded TreeSet (≤ k longs); update is
  * O(log k) with an early reject for hashes above the current k-th
  * minimum, so partial aggregation does map-side combining with O(k)
  * state per task and the shuffle carries ≤ k longs per partial — the
  * same contract as Spark's own approx_count_distinct, with a portable
  * register layout.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    // toString on UTF8String/Long/Int matches DuckDB's ::VARCHAR render,
    // which is what keeps the hashes cross-engine identical
    if (v != null) add(buf, PortableHash.md5Int8(v.toString))
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else math.round((k - 1).toDouble * 4294967296.0 / buf.last.doubleValue)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

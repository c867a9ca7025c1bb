package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{col, conv, lit, md5, substring, to_binary}
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the engine's custom-aggregate surface
  * (SURVEY §4.2 anticipated exactly one `TypedImperativeAggregate` for a
  * sketch beyond `approx_count_distinct`).
  *
  * The input is a 32-bit hash (as LONG, in [0, 2^32)); the buffer keeps
  * the k SMALLEST distinct hash values seen. With u_k = kth-min / 2^32,
  * the classic KMV estimator gives distinct ≈ (k−1)/u_k (Bar-Yossef et
  * al. 2002); below k distinct inputs the sketch is exact. Unlike HLL,
  * the result is a pure function of the input SET — no engine-specific
  * salt, no layout — so with a portable hash (md5, see [[KmvDistinct.onMd5]])
  * any SQL engine reproduces the estimate bit for bit, and the driver can
  * hash-check an APPROXIMATE aggregate (agg_hll stays rows-only for
  * exactly this reason).
  *
  * Scale shape: per-group state is ≤ k longs; partial aggregation merges
  * sketches (union, keep k smallest) — the shuffle carries k values per
  * group per mapper, never the input. Buffers serialize as packed longs.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert if it can enter the k-minimum set (constant-time
      // reject keeps update O(1) amortized for the common miss case)
      if (buf.size < k || h < buf.last) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[Long], b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k || h < b1.last) {
        b1.add(h)
        if (b1.size > k) b1.pollLast()
      }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else math.round((k - 1).toDouble / (buf.last.toDouble / 4294967296.0))

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = new java.util.TreeSet[Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a LONG hash input, got ${child.dataType}")
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Aggregate Column over a pre-hashed LONG column in [0, 2^32). */
  def apply(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.graftcompat.ColumnCompat
    ColumnCompat.column(
      KmvDistinct(ColumnCompat.resolvedExpression(hash), k).toAggregateExpression())
  }

  /** The portable full recipe: md5-hash any column to 32 bits (the
    * engine-portable unit-hash family every dedup operator uses), then
    * sketch — `onMd5(col, k)` in Spark equals the DuckDB oracle's
    * `('0x'||substr(md5(x),1,8))::BIGINT` pipeline value for value. */
  def onMd5(c: Column, k: Int): Column =
    apply(conv(substring(md5(to_binary(c.cast("string"), lit("utf-8"))), 1, 8), 16, 10)
      .cast("long"), k)
}

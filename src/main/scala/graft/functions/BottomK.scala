package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** The k smallest DISTINCT long values of a column, as a sorted
  * ascending array — the KMV / theta-sketch building block
  * (SURVEY §2.12 #81at–81av; Beyer et al. "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD'07;
  * the same bottom-k primitive Apache DataSketches' theta sketch is
  * built on).
  *
  * Why a custom [[TypedImperativeAggregate]] instead of
  * `distinct().orderBy().limit(k)`: the declarative form's shuffle
  * carries EVERY distinct value (the `distinct` is a full-width
  * exchange before the top-k can prune anything). Here the aggregation
  * buffer is a size-capped sorted set, so what travels the wire in the
  * partial/merge step is at most k longs PER PARTITION, regardless of
  * input size — the sketch property that makes a 100 TB distinct-count
  * estimate a constant-size artifact. Spark plans it as an
  * ObjectHashAggregate with a map-side partial, and the partial→final
  * merge IS the sketch union (capped set-union), so sharded builds
  * merge for free — Round10Spec pins shard-merge ≡ whole-input law.
  *
  * Determinism: the result is a pure set property of the input values
  * (smallest k distinct), independent of partitioning and arrival
  * order — which is what lets KMV estimates be hash-gated against the
  * DuckDB oracle's `SELECT DISTINCT h ORDER BY h LIMIT k` replay.
  */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"bottom_k requires k > 0, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // admit only if it would make the bottom-k (avoids churn on the
      // common no-op path once the buffer is warm)
      if (buf.size < k) buf.add(x)
      else if (x < buf.last) { if (buf.add(x)) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val x = it.next()
      if (buf.size < k) buf.add(x)
      else if (x < buf.last) { if (buf.add(x)) buf.pollLast() }
      else return buf // `other` is sorted ascending: the rest only grows
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

/** The k entries with the smallest DISTINCT long keys, each carrying a
  * long payload — the payload-carrying sibling of [[BottomK]] and the
  * deterministic form of reservoir sampling: with the key a uniform
  * hash of a row identifier, the surviving payloads are a UNIFORM
  * random sample of exactly min(k, distinct rows) values that is
  * nevertheless a pure set property of the input — partition- and
  * order-invariant, shard-mergeable (the partial→final merge is the
  * capped union), and replayable relationally (`GROUP BY h → min(v)
  * ORDER BY h LIMIT k`), which is what lets SAMPLE-DERIVED estimates
  * (quantiles, means) be hash-gated instead of rows-only. Key
  * collisions keep the minimum payload — a deterministic law, though
  * at 52-bit hashes over real corpora collisions are ~absent.
  *
  * Buffer is a TreeMap capped at k entries: ≤ k (key, payload) pairs
  * per partition on the wire, regardless of input size — the same
  * sketch property as [[BottomK]], where classic reservoir sampling
  * (Vitter's R) is arrival-order-dependent and therefore neither
  * deterministic under Spark's partitioning nor oracle-checkable.
  */
case class BottomKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k > 0, s"bottom_k_pairs requires k > 0, got $k")

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def admit(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      key: java.lang.Long, v: java.lang.Long): Unit = {
    val prev = buf.get(key)
    if (prev != null) { if (v < prev) buf.put(key, v) }
    else if (buf.size < k) buf.put(key, v)
    else if (key < buf.lastKey) { buf.put(key, v); buf.pollLastEntry() }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val kv = left.eval(input)
    val vv = right.eval(input)
    if (kv != null && vv != null)
      admit(buf, kv.asInstanceOf[Long], vv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // ascending: once the buffer is full and the incoming key exceeds
      // its maximum, no remaining entry can be admitted or collide
      if (buf.size == k && e.getKey > buf.lastKey) return buf
      admit(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKPairs =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for [[BottomK]] / [[BottomKPairs]]. */
object bottomk {
  def bottomK(h: Column, k: Int): Column =
    Bridge.column(BottomK(Bridge.expression(h), k).toAggregateExpression())
  def bottomKPairs(h: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKPairs(Bridge.expression(h), Bridge.expression(v), k)
      .toAggregateExpression())
}

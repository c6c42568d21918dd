package graft.functions

import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k LARGEST values of `child`
  * (any orderable type — typically `struct(sort_key, payload…)`, whose
  * ordering is lexicographic) and returns them as a descending-sorted
  * array.
  *
  * This is the scale-correct shape for "top-k per group": a window
  * `row_number() ≤ k` must shuffle and sort EVERY input row, while an
  * aggregate gets Spark's partial aggregation for free — each map task
  * reduces its input to ≤ k rows per group before the exchange, so the
  * shuffle carries O(groups · k) heaps instead of O(rows). At 100 TB
  * with bounded k that is the difference between shuffling terabytes
  * and shuffling megabytes.
  *
  * The buffer is a size-k min-heap (head = current k-th value): update
  * is O(log k) per row, merge drains the smaller heap into the larger.
  * Serialization reuses Catalyst's unsafe array format. Null inputs are
  * ignored (like built-in aggregates); the result array is never null.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[Any]] with UnaryLike[Expression] {

  require(k >= 1, "topk requires k >= 1")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): PriorityQueue[Any] =
    new PriorityQueue[Any](k + 1, ordering.asInstanceOf[Comparator[Any]])

  override def update(buf: PriorityQueue[Any], input: InternalRow): PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v, copyNeeded = true)
    buf
  }

  override def merge(buf: PriorityQueue[Any], other: PriorityQueue[Any]): PriorityQueue[Any] = {
    // Drain the smaller heap into the larger — elements are already
    // defensive copies, no re-copy needed.
    val (into, from) = if (buf.size >= other.size) (buf, other) else (other, buf)
    val it = from.iterator()
    while (it.hasNext) offer(into, it.next(), copyNeeded = false)
    into
  }

  private def offer(heap: PriorityQueue[Any], v: Any, copyNeeded: Boolean): Unit = {
    if (heap.size < k) {
      heap.add(if (copyNeeded) InternalRow.copyValue(v) else v)
    } else if (ordering.compare(v, heap.peek) > 0) {
      heap.poll()
      heap.add(if (copyNeeded) InternalRow.copyValue(v) else v)
    }
  }

  override def eval(buf: PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, ordering.reverse.asInstanceOf[Comparator[Any]])
    new GenericArrayData(arr)
  }

  @transient private lazy val serProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: PriorityQueue[Any]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType,
      (_, v: Any) => offer(buf, v, copyNeeded = true))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

/** Elementwise sum of array<float> vectors, accumulated in double — the
  * centroid/k-means/IVF-training primitive. Partial aggregation is
  * map-side like any built-in sum: each task folds its vectors into one
  * double[dim] buffer, the exchange carries O(groups·dim) doubles, and
  * merge is elementwise add. Vectors shorter than the first-seen dim
  * contribute their prefix; eval emits array<double> (divide by
  * count(*) in the plan for a mean). */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) { acc(i) += arr.getFloat(i); i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    val (into, from) =
      if (buf.length >= other.length) (buf, other) else (other, buf)
    var i = 0
    while (i < from.length) { into(i) += from(i); i += 1 }
    into
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  @transient private lazy val serProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(DoubleType, containsNull = false)))

  override def serialize(buf: Array[Double]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buf))).getBytes

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).toDoubleArray()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

/** Blocked Bloom filter over a LONG key column, for semi-join
  * pre-filtering: build on the (smaller) build side, broadcast the one
  * aggregated row, and `BloomMightContain` drops non-matching probe rows
  * BEFORE the join shuffle. At 100 TB that turns "shuffle the whole
  * fact table to discover 1% matches" into "shuffle ~1% (+ fpp)".
  *
  * `numBits` is rounded up to a power of two; each key sets
  * `numHashes` bits derived from two xxhash64-style mixes (Kirsch-
  * Mitzenmacher double hashing). Merge is a bitwise OR, eval emits the
  * long-array bitset as BinaryType (8·numBits/64 bytes).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits <= (1 << 30),
    s"numBits must be in (0, 2^30], got $numBits (highestOneBit*2 overflows past 2^30)")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  private val bits = java.lang.Integer.highestOneBit(math.max(numBits - 1, 1)) * 2
  private val mask = bits - 1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

  @inline private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  private def setBits(buf: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) setBits(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** Count–Min sketch over a LONG key column: a depth×width counter grid
  * where each key increments one counter per row (Kirsch–Mitzenmacher
  * double hashing, same scheme as BloomFilterAgg); point estimates come
  * from `CmsEstimate` as the min across rows — never an undercount,
  * overcount bounded by colliding mass ~N/width per row. The
  * fixed-size frequency summary for when exact per-key counts don't
  * fit: the sketch is width·depth longs REGARDLESS of key cardinality,
  * partial-aggregates map-side, and merge is elementwise long addition
  * — associative/commutative, so the result is bit-identical under any
  * partial-merge order. Width rounds up to a power of two. */
case class CountMinAgg(
    child: Expression,
    weight: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(width > 0 && width <= (1 << 24), s"width must be in (0, 2^24], got $width")
  require(depth > 0 && depth <= 16, s"depth must be in (0, 16], got $depth")

  override def left: Expression = child
  override def right: Expression = weight
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  private val w2 = java.lang.Integer.highestOneBit(math.max(width - 1, 1)) * 2
  private val mask = w2 - 1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](w2 * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val wv = weight.eval(input)
    if (v != null && wv != null) {
      // Weighted update: feeding a pre-grouped (key, count) table is
      // exactly equivalent to `count` raw-stream updates — the sketch
      // from one aggregated pass is byte-identical to the streamed one.
      val key = v.asInstanceOf[Long]
      val inc = wv.asInstanceOf[Long]
      val h1 = CmsEstimate.mix(key)
      val h2 = CmsEstimate.mix(h1) | 1L
      var i = 0
      while (i < depth) {
        buf(i * w2 + (((h1 + i * h2) & Long.MaxValue).toInt & mask)) += inc
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Byte](buf.length * 8)
    java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().put(buf)
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinAgg =
    copy(child = newLeft, weight = newRight)
}

/** KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
  * DISTINCT long hash values in UNSIGNED order and returns them as an
  * ascending array. With hashes from [[Md5Hash64]] the whole sketch —
  * contents, order, and therefore the derived estimate — is
  * reproducible from any engine with an MD5 (DuckDB: the k smallest
  * `md5_number_upper` values), which Spark's DataSketches HLL
  * (q159) is not. Mergeable: the k smallest of a union are always
  * among the union of each side's k smallest, so partial aggregation
  * is exact — map tasks reduce to ≤ k values per group before the
  * exchange (O(groups·k) rows shuffled), and re-aggregating stored
  * per-partition sketches merges a store without rescanning raws.
  *
  * Buffer: a TreeSet under unsigned comparison (distinct + sorted +
  * O(log k) capped insert). Nulls ignored; result never null.
  */
case class KmvMinAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_min requires k >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_min"

  private def unsignedCmp: Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](unsignedCmp)

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (java.lang.Long.compareUnsigned(v, buf.last()) < 0) {
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  @transient private lazy val serProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(LongType, containsNull = false)))

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    serProjection(InternalRow(eval(buf))).getBytes

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) { offer(buf, arr.getLong(i)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinAgg =
    copy(child = newChild)
}

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

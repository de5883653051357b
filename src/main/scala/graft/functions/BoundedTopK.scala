package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k per group: keeps at most k (score, id) pairs in the
  * aggregation buffer AT ALL TIMES, including during map-side partial
  * aggregation.
  *
  * Why not `row_number().over(Window.partitionBy(key)) <= k`? The window
  * shuffles EVERY row on the key and sorts whole partitions; at 100 TB a
  * top-3-per-customer query moves the entire fact table through one
  * exchange. As a partial-aggregating aggregate, each map task emits at
  * most k rows per key, the shuffle carries k * numPartitions rows per
  * key, and the final merge is O(k log k). Same results, bounded memory.
  *
  * Ranking: score descending; ties broken by id (ascending when
  * `idAsc`, else descending) — mirror the tiebreak in any oracle SQL.
  *
  * Output: array<struct<score:double, id:bigint>> sorted best-first.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    idAsc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
  with UnaryLike[Expression] {

  require(k > 0, "bounded_topk requires k > 0")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  /** true if a is a better (higher-ranked) item than b. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    if (a._1 != b._1) a._1 > b._1
    else if (idAsc) a._2 < b._2
    else a._2 > b._2

  /** Heap with the WORST item at the head, for O(log k) eviction. */
  private def newHeap(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](
      k + 1,
      (a: (Double, Long), b: (Double, Long)) =>
        if (a == b) 0 else if (better(a, b)) 1 else -1)

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    newHeap()

  private def insert(
      heap: java.util.PriorityQueue[(Double, Long)], item: (Double, Long)): Unit = {
    if (heap.size < k) heap.offer(item)
    else if (better(item, heap.peek())) { heap.poll(); heap.offer(item) }
  }

  override def update(
      heap: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      insert(heap, (row.getDouble(0), row.getLong(1)))
    }
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, Long)],
      b: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[(Double, Long)]): Any = {
    // non-destructive: window aggregation re-evals the same buffer per row,
    // so draining the heap here would empty it after the first output row
    val items = new Array[(Double, Long)](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { items(i) = it.next(); i += 1 }
    java.util.Arrays.sort(items, (a: (Double, Long), b: (Double, Long)) =>
      if (a == b) 0 else if (better(a, b)) -1 else 1) // best-first
    new GenericArrayData(items.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(heap: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 16)
    buf.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) { val (s, id) = it.next(); buf.putDouble(s); buf.putLong(id) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = newHeap()
    var i = 0
    while (i < n) { insert(heap, (buf.getDouble, buf.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(sim, id, k)` — bounded-heap top-k aggregate.
  *
  * WHY: per-query top-k via `row_number() OVER (PARTITION BY q ORDER BY
  * sim DESC)` shuffles EVERY scored candidate to the query's reducer and
  * sorts there — #queries partitions each holding corpus-sized input at
  * 100 TB. A TypedImperativeAggregate gets map-side partial aggregation
  * for free: each map task reduces its candidates to a k-item heap, the
  * exchange carries ≤ #queries × k × #map-partitions rows, and the
  * reducer merges heaps. Same rows out (total order: sim DESC, id ASC —
  * the window formulation's tie-break), plan goes Window+sort →
  * ObjectHashAggregate(partial) → exchange → ObjectHashAggregate(final).
  *
  * Buffer: a worst-on-top priority queue capped at k. Result:
  * `ARRAY<STRUCT<c_id BIGINT, sim DOUBLE>>` best-first.
  */
case class TopKAgg(simExpr: Expression, idExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  // k <= 0 would make offer() peek an empty queue and NPE mid-aggregate;
  // failing at construction surfaces the misuse at analysis time instead
  require(k > 0, s"graft_topk requires a positive k, got $k")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(simExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("c_id", LongType, nullable = false)
    .add("sim", DoubleType, nullable = false), containsNull = false)

  private def worstOnTop = TopKAgg.WorstOnTop

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, worstOnTop)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)],
                    item: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(item)
    else if (worstOnTop.compare(item, buf.peek()) > 0) { buf.poll(); buf.add(item) }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = simExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)],
                     other: java.util.PriorityQueue[(Double, Long)])
      : java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val n = buf.size
    val items = new Array[(Double, Long)](n)
    var i = n - 1
    while (i >= 0) { items(i) = buf.poll(); i -= 1 } // drain worst-first → best-first
    // restore the buffer (eval must not destroy it under retries)
    items.foreach(buf.add)
    new GenericArrayData(items.map { case (s, id) =>
      InternalRow(id, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, id) = it.next(); bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(simExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Worst-on-top: the head is the item to evict — lowest sim, tie-broken
    * toward the HIGHER id (so the kept set prefers lower ids, matching
    * `ORDER BY sim DESC, id ASC LIMIT k`).
    */
  object WorstOnTop extends java.util.Comparator[(Double, Long)] with Serializable {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(y._2, x._2)
    }
  }
}

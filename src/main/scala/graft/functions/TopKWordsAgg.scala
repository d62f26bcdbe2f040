package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_topk_words(score, word, payload, k)` — bounded-heap top-k
  * over (BIGINT score, STRING word) keys with a BIGINT payload riding
  * along: the [[TopKAgg]] shape for the keyword-ranking family, where
  * the ranked id is a WORD and the row carries its term frequency.
  *
  * WHY (same argument as [[TopKAgg]]): per-doc top-k via
  * `row_number() OVER (PARTITION BY doc ORDER BY score DESC, w ASC)`
  * shuffles and sorts EVERY (doc, term) row; the
  * TypedImperativeAggregate gets map-side partial aggregation — each
  * map task reduces to a k-item heap per doc, the exchange carries
  * ≤ #docs × k × #map-partitions rows, the reducer merges heaps.
  *
  * Total order matches the window twin: score DESC, word ASC — word
  * comparison is UTF8String's BINARY order, which is exactly Spark's
  * StringType sort order AND DuckDB's default varchar collation, so
  * the kept set is bit-identical to the `ORDER BY ... LIMIT k` both
  * engines replay. Result: `ARRAY<STRUCT<w STRING, tf BIGINT,
  * score BIGINT>>` best-first.
  */
case class TopKWordsAgg(scoreExpr: Expression, wordExpr: Expression,
                        payloadExpr: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, UTF8String, Long)]] {

  require(k > 0, s"graft_topk_words requires a positive k, got $k")

  override def prettyName: String = "graft_topk_words"
  override def children: Seq[Expression] = Seq(scoreExpr, wordExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("w", StringType, nullable = false)
    .add("tf", LongType, nullable = false)
    .add("score", LongType, nullable = false), containsNull = false)

  private def worstOnTop = TopKWordsAgg.WorstOnTop

  override def createAggregationBuffer(): java.util.PriorityQueue[(Long, UTF8String, Long)] =
    new java.util.PriorityQueue[(Long, UTF8String, Long)](k + 1, worstOnTop)

  private def offer(buf: java.util.PriorityQueue[(Long, UTF8String, Long)],
                    item: (Long, UTF8String, Long)): Unit = {
    if (buf.size < k) buf.add(item)
    else if (worstOnTop.compare(item, buf.peek()) > 0) { buf.poll(); buf.add(item) }
  }

  override def update(buf: java.util.PriorityQueue[(Long, UTF8String, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Long, UTF8String, Long)] = {
    val s = scoreExpr.eval(input)
    val w = wordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && w != null && p != null)
      // copy: the UTF8String may point into a reused row buffer
      offer(buf, (s.asInstanceOf[Long], w.asInstanceOf[UTF8String].clone(),
        p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Long, UTF8String, Long)],
                     other: java.util.PriorityQueue[(Long, UTF8String, Long)])
      : java.util.PriorityQueue[(Long, UTF8String, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Long, UTF8String, Long)]): Any = {
    val n = buf.size
    val items = new Array[(Long, UTF8String, Long)](n)
    var i = n - 1
    while (i >= 0) { items(i) = buf.poll(); i -= 1 } // drain worst-first → best-first
    items.foreach(buf.add) // restore (eval must not destroy under retries)
    new GenericArrayData(items.map { case (s, w, p) =>
      InternalRow(w, p, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[(Long, UTF8String, Long)]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.iterator()
    while (it0.hasNext) { bytes += 20 + it0.next()._2.numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, w, p) = it.next()
      bb.putLong(s); bb.putLong(p)
      val wb = w.getBytes
      bb.putInt(wb.length); bb.put(wb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Long, UTF8String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getLong; val p = bb.getLong
      val len = bb.getInt
      val wb = new Array[Byte](len)
      bb.get(wb)
      buf.add((s, UTF8String.fromBytes(wb), p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWordsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWordsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKWordsAgg =
    copy(scoreExpr = newChildren(0), wordExpr = newChildren(1),
      payloadExpr = newChildren(2))
}

object TopKWordsAgg {
  /** Worst-on-top: the head is the item to evict — lowest score,
    * tie-broken toward the binary-GREATER word (so the kept set
    * prefers binary-smaller words, matching
    * `ORDER BY score DESC, w ASC LIMIT k` — UTF8 binary order on both
    * engines).
    */
  object WorstOnTop extends java.util.Comparator[(Long, UTF8String, Long)]
      with Serializable {
    override def compare(x: (Long, UTF8String, Long),
                         y: (Long, UTF8String, Long)): Int = {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c else y._2.binaryCompare(x._2)
    }
  }
}

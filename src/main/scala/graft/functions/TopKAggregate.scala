package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs ordered
  * by (score DESC, id ASC) in a fixed-size heap.
  *
  * The composable alternative — `row_number().over(partitionBy(g).
  * orderBy(score))` then `WHERE rn <= k` — shuffles and sorts EVERY
  * candidate row (n² rows for all-pairs similarity). This aggregate is
  * algebraic: partial buffers of size ≤ k combine associatively, so the
  * map side reduces each partition to k rows per group before the
  * exchange — the shuffle carries n·k rows instead of n². At 100 TB
  * this is the difference between a top-k that runs and one that spills
  * forever.
  *
  * Result: `array<struct<score double, id bigint>>` sorted best-first.
  *
  * With `distinctIds` the aggregate ALSO deduplicates: an id already in
  * the buffer is skipped. Sound only when every occurrence of an id
  * within a group carries the SAME score (deterministic scoring — e.g.
  * LSH candidate pairs that collide in several hash tables); it lets a
  * caller feed a candidate multiset straight into the aggregate instead
  * of paying a separate `distinct()` exchange first. Dedup is bounded
  * too: only ids currently among the best k are compared (an O(k) scan
  * per row), so a duplicate beyond the current top-k is dropped by the
  * score bound before identity ever matters.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // min-heap on "goodness": head = worst kept entry (lowest score,
  // then highest id — the first to evict)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
                  e: (Double, Long)): Unit = {
    if (buf.size < k) {
      if (!(distinctIds && buf.exists(_._2 == e._2))) buf.enqueue(e)
    } else {
      val worst = buf.head
      val better = e._1 > worst._1 || (e._1 == worst._1 && e._2 < worst._2)
      // a duplicate id always carries the same score, so if it is
      // "better" than the worst kept entry it must already be in the
      // buffer — the O(k) identity scan only runs for rows that beat
      // the score bound
      if (better && !(distinctIds && buf.exists(_._2 == e._2))) {
        buf.dequeue(); buf.enqueue(e)
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Bounded bottom-k by a LONG sort key: keeps the k lexicographically
  * smallest (key, value) pairs. The long-key twin of [[TopKByScore]] —
  * kept exact on 60-bit hash keys (a double score would round away low
  * bits and perturb selection at the k boundary), which is what
  * bottom-k-by-hash sampling needs for oracle-stable row selection.
  * Same algebraic-partial property: the map side reduces every
  * partition to ≤ k pairs per group before the exchange, replacing a
  * row_number window whose sort parallelism is the GROUP count (3
  * groups = 3 tasks sorting everything, at any cluster size). */
case class BottomKByKey(
    keyExpr: Expression,
    valExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  // max-heap: head = largest kept pair — the first to evict
  private val largestFirst: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(largestFirst)

  private def add(buf: mutable.PriorityQueue[(Long, Double)],
                  e: (Long, Double)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (largestFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val h = keyExpr.eval(input)
    val v = valExpr.eval(input)
    if (h != null && v != null)
      add(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Double)],
                     other: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    val sorted = buf.toArray.sorted(largestFirst)
    new GenericArrayData(sorted.map { case (h, v) =>
      InternalRow(h, v)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readLong(), in.readDouble())); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType), StructField("v", DoubleType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(keyExpr, valExpr)
  override def prettyName: String = "bottomk_by_key"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByKey =
    copy(keyExpr = newChildren(0), valExpr = newChildren(1))
}

object TopKAggregate {
  /** Column API: top-k (score, id) pairs per group, best first. */
  def topkByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(TopKByScore(Shim.expression(score), Shim.expression(id), k)
      .toAggregateExpression())
  }

  /** Column API: the k lexicographically smallest (key, value) pairs
    * per group, ascending. */
  def bottomkByKey(key: Column, value: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(BottomKByKey(Shim.expression(key), Shim.expression(value), k)
      .toAggregateExpression())
  }

  /** Like [[topkByScore]] but id-deduplicating — for candidate
    * MULTISETS with deterministic per-id scores (see `distinctIds`). */
  def topkByScoreDistinct(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(TopKByScore(Shim.expression(score), Shim.expression(id), k,
      distinctIds = true).toAggregateExpression())
  }
}

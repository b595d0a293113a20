package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `top_k_by(score, id, k)` keeps the k
  * best (score DESC, id ASC on ties) `(score, id)` pairs per group and
  * returns them best-first as `array<struct<score:double, id:bigint>>`.
  *
  * This is the scale-path replacement for the `row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k` idiom: the window form
  * must SHUFFLE EVERY CANDIDATE ROW to the group's reducer and sort it
  * there — for ANN scoring that is |corpus| x |queries| rows through
  * the exchange, which at 100 TB is the whole job. As a
  * TypedImperativeAggregate this runs map-side partial aggregation
  * (ObjectHashAggregate): each input partition reduces to at most k
  * pairs per group BEFORE the exchange, so the shuffle carries
  * k x partitions rows per group regardless of corpus size, and no
  * reducer ever sorts more than the merged partials.
  *
  * Determinism: the comparator is a total order (score desc, then id
  * asc), so the result is independent of input and merge order —
  * bit-identical to the window form it replaces, which the ANN oracle
  * queries (hash-compared against DuckDB) and TopKByScoreSpec pin.
  *
  * Reference analogue: the top-k path of DriftDB's ORDER BY .. LIMIT
  * executor (crates/driftdb-core/src/query/executor.rs) — a heap, not
  * a full sort; here it is additionally distributed and partial.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"top_k_by: k must be positive, got $k")

  // Max of this ordering = the WORST retained pair (lowest score, then
  // highest id), so the priority queue's head is the eviction victim.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects (double, bigint), got ${s.sql} and ${i.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      heap: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit =
    if (heap.size < k) heap.enqueue(cand)
    else if (worstFirst.compare(cand, heap.head) < 0) {
      heap.dequeue(); heap.enqueue(cand)
    }

  override def update(
      heap: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // a null score or id cannot rank; skip the row. DELIBERATE
    // divergence from the row_number window form: under DESC NULLS
    // LAST the window still emitted null-score rows when k >= the
    // group's non-null count — a null similarity is not a neighbor,
    // so this aggregate never returns one. Identical output whenever
    // scores are non-null (the ANN paths: cosine over the fixture) or
    // k < the non-null count.
    if (s != null && i != null)
      offer(heap, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = heap.toArray.sortBy(t => (-t._1, t._2)) // best-first
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 16)
    buf.putInt(heap.size)
    heap.foreach { case (s, i) => buf.putDouble(s); buf.putLong(i) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val heap = createAggregationBuffer()
    var j = 0
    while (j < n) { heap.enqueue((buf.getDouble(), buf.getLong())); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Column-level entry point: `top_k_by(score, id, k)` as an
    * aggregate Column usable in `groupBy(..).agg(..)`. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score),
        GraftBridge.expression(id), k).toAggregateExpression())
}

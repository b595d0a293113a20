package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Bounded-memory frequent-items aggregate: `freq_items(item, m)`
  * maintains a Misra–Gries summary of at most `m` counters per group
  * and returns the surviving `(item, est)` pairs as
  * `array<struct<item:string, est:bigint>>`, est-descending (item ASC
  * on ties).
  *
  * Guarantees (the classic MG bounds, preserved under arbitrary
  * partial-aggregation merge order by the mergeable-summaries merge —
  * Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
  * PODS 2012, §3): with N total non-null items per group and true
  * frequency f(t),
  *
  *   est(t) <= f(t)            (absent => est 0), and
  *   f(t) - est(t) <= N/(m+1).
  *
  * Hence every item with f(t) > N/(m+1) IS in the summary. The
  * borderline membership and the exact `est` values depend on input
  * and merge order — callers that need deterministic output surface
  * only the guarantee (see `HeavyHitters.hotReport`); callers with
  * m >= the group's distinct count get exact counts (no decrement
  * ever fires).
  *
  * This is the scale path for "top tokens over 100 TB": a plain
  * `groupBy(token).count` shuffles the FULL token keyspace (billions
  * of keys for web-scale n-grams); as a TypedImperativeAggregate this
  * runs map-side partial aggregation, so the exchange carries at most
  * m counters per input partition regardless of corpus size.
  *
  * Reference analogue: DriftDB has no frequency sketch — nearest is
  * the exact GROUP BY path of its executor
  * (crates/driftdb-core/src/query/executor.rs); this is a [REF-GAP]
  * pipeline addition like HLL/quantile sketches (q_approx_sketch).
  */
case class FrequentItems(
    item: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m > 0, s"freq_items: capacity must be positive, got $m")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): TypeCheckResult =
    item.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_items expects a string item, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      map: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      map.get(t) match {
        case Some(c) => map.update(t, c + 1)
        case None if map.size < m => map.update(t, 1L)
        case None =>
          // Misra–Gries decrement step: charge this arrival against
          // one unit of every tracked counter (m+1 distinct items
          // cancel); amortized O(1) per arrival, O(m) here
          val dead = mutable.ArrayBuffer.empty[String]
          map.mapValuesInPlace((_, c) => c - 1)
          map.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(map.remove)
      }
    }
    map
  }

  override def merge(
      map: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      map.update(t, map.getOrElse(t, 0L) + c)
    }
    if (map.size > m) {
      // mergeable-summaries reduction: subtract the (m+1)-th largest
      // count from every counter and keep the positive ones — at most
      // m survive, and the subtracted mass is bounded so the total
      // undercount stays <= N/(m+1)
      val pivot = map.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      val dead = mutable.ArrayBuffer.empty[String]
      map.mapValuesInPlace((_, c) => c - pivot)
      map.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(map.remove)
    }
    map
  }

  override def eval(map: mutable.HashMap[String, Long]): Any = {
    val out = map.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(out.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  override def serialize(map: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = map.toArray
    val bytes = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val buf = ByteBuffer.allocate(
      4 + entries.length * 12 + bytes.map(_.length).sum)
    buf.putInt(entries.length)
    entries.indices.foreach { i =>
      buf.putInt(bytes(i).length)
      buf.put(bytes(i))
      buf.putLong(entries(i)._2)
    }
    buf.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[String, Long] = {
    val buf = ByteBuffer.wrap(b)
    val n = buf.getInt()
    val map = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = buf.getInt()
      val sb = new Array[Byte](len)
      buf.get(sb)
      map.update(new String(sb, StandardCharsets.UTF_8), buf.getLong())
      i += 1
    }
    map
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(item = newChildren(0))
}

object FrequentItems {
  /** Column-level entry point: `freq_items(item, m)` as an aggregate
    * Column usable in `groupBy(..).agg(..)`. */
  def apply(item: Column, m: Int): Column =
    GraftBridge.column(
      FrequentItems(GraftBridge.expression(item), m).toAggregateExpression())
}

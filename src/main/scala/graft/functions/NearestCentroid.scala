package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Shared argmax-cosine kernel over a driver-side centroid model.
  *
  * Why an expression and not a join: the k-means assignment step used
  * to be `points.crossJoin(broadcast(cents)).groupBy(pid).agg(max_by)`
  * — correct, but it MATERIALIZES an N×k candidate row product where
  * every row carries both the point vector and the centroid array
  * (~1 KB/row). At the third scaling decade (2M × 64-dim, k = 4000)
  * that is ~128 GB of generated rows PER Lloyd pass, and the measured
  * q_semdedup blowup (SCALE.md: α ≈ 1.9, kmeansTwoLevel 1634 s of a
  * 1713 s query) was exactly this product. Centroids are model state,
  * not data — k×d doubles, megabytes at any k this engine clusters
  * with — so the scale-right shape is MLlib's: keep the model on the
  * driver, evaluate argmax as a PROJECTION (one output row per input
  * row, no join, no shuffle), and let the k-row mean recompute be the
  * only exchange per pass. This expression is that projection; the
  * model rides the serialized plan to executors like any literal.
  *
  * Tie-breaking is deterministic: candidates iterate in ascending
  * label order and a candidate replaces the incumbent only on a
  * STRICTLY greater cosine under `java.lang.Double.compare` (which
  * orders NaN greatest, matching Spark's double ordering in the old
  * max_by-over-struct form), so bitwise-equal cosines — exact
  * duplicate embeddings, or a zero-norm vector whose every cosine is
  * NaN — resolve to the LOWEST label exactly like the old
  * `max_by(struct(round(cos, 9), -label))`. The one intentional
  * refinement: the old form ROUNDED to 9 decimals before comparing,
  * so two centroids within 5e-10 of cosine tied; this kernel compares
  * raw doubles (a stricter, still deterministic order). Nulls match
  * the old behavior: a null/mismatched-length/null-element vector
  * yields a null cluster.
  */
private[functions] object NearestCentroidKernel {
  /** (label, cosine-best) argmax; labels/cents MUST be label-ascending
    * and length-aligned. Returns null for a null-scoring vector. */
  def nearest(v: ArrayData, vecIsFloat: Boolean, labels: Array[Long],
      cents: Array[Array[Double]]): java.lang.Long = {
    val n = v.numElements()
    var i = 0
    var nv = 0.0
    val x = new Array[Double](n)
    while (i < n) {
      if (v.isNullAt(i)) return null
      val xv = if (vecIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = xv
      nv += xv * xv
      i += 1
    }
    val snv = math.sqrt(nv)
    var best = 0.0
    var bestSet = false
    var bestLabel = 0L
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      if (ct.length == n) {
        var dot = 0.0
        var nc = 0.0
        var j = 0
        while (j < n) {
          dot += x(j) * ct(j)
          nc += ct(j) * ct(j)
          j += 1
        }
        val cos = dot / snv / math.sqrt(nc)
        if (!bestSet || java.lang.Double.compare(cos, best) > 0) {
          best = cos; bestLabel = labels(c); bestSet = true
        }
      }
      c += 1
    }
    if (bestSet) java.lang.Long.valueOf(bestLabel) else null
  }

  def checkVec(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<float|double> vector, got ${other.sql}")
  }

  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Sort a (label, centroid) model label-ascending into aligned
    * arrays — the iteration order the tie-break contract requires. */
  def aligned(model: Seq[(Long, Array[Double])])
      : (Array[Long], Array[Array[Double]]) = {
    val s = model.sortBy(_._1)
    (s.map(_._1).toArray, s.map(_._2).toArray)
  }
}

/** `nearest_centroid(vec)` over one flat model: the label of the
  * centroid with the greatest cosine similarity to `vec`. See
  * NearestCentroidKernel for semantics and the scale rationale. */
case class NearestCentroid(child: Expression, labels: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {
  require(labels.length == cents.length && labels.nonEmpty,
    s"model arity: ${labels.length} labels, ${cents.length} centroids")

  override def checkInputDataTypes(): TypeCheckResult =
    NearestCentroidKernel.checkVec(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  @transient private lazy val vecIsFloat = NearestCentroidKernel.isFloat(child)

  def nearestOf(v: ArrayData): java.lang.Long =
    NearestCentroidKernel.nearest(v, vecIsFloat, labels, cents)

  override def nullSafeEval(v: Any): Any =
    nearestOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("nearestCentroid", this)
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = $self.nearestOf($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-level entry point over a (label, centroid) model
    * (GraftBridge crosses Spark 4's Column/Expression split). */
  def apply(vec: org.apache.spark.sql.Column,
      model: Seq[(Long, Array[Double])]): org.apache.spark.sql.Column = {
    val (labels, cents) = NearestCentroidKernel.aligned(model)
    org.apache.spark.sql.GraftBridge.column(
      NearestCentroid(org.apache.spark.sql.GraftBridge.expression(vec),
        labels, cents))
  }
}

/** `nearest_centroid_in(key, vec)` over a PER-KEY model (the two-level
  * fine stage and any per-partition sub-clustering): the label of the
  * greatest-cosine centroid among the centroids registered under
  * `key`; null when the key has no centroids (callers guarantee every
  * live key is present — seeds are drawn per key). */
case class NearestCentroidIn(left: Expression, right: Expression,
    model: Map[Long, (Array[Long], Array[Array[Double]])])
    extends BinaryExpression {
  require(model.nonEmpty, "empty per-key centroid model")

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case LongType => NearestCentroidKernel.checkVec(right)
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected bigint key, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_in"
  @transient private lazy val vecIsFloat = NearestCentroidKernel.isFloat(right)

  def nearestOf(key: Long, v: ArrayData): java.lang.Long =
    model.get(key) match {
      case Some((labels, cents)) =>
        NearestCentroidKernel.nearest(v, vecIsFloat, labels, cents)
      case None => null
    }

  override def nullSafeEval(key: Any, v: Any): Any =
    nearestOf(key.asInstanceOf[Long], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, v) => {
      val self = ctx.addReferenceObj("nearestCentroidIn", this)
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = $self.nearestOf($k, $v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object NearestCentroidIn {
  /** Column-level entry point over a per-key (label, centroid) model. */
  def apply(key: org.apache.spark.sql.Column, vec: org.apache.spark.sql.Column,
      model: Map[Long, Seq[(Long, Array[Double])]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      NearestCentroidIn(org.apache.spark.sql.GraftBridge.expression(key),
        org.apache.spark.sql.GraftBridge.expression(vec),
        model.map { case (k, m) =>
          k -> NearestCentroidKernel.aligned(m)
        }))
}

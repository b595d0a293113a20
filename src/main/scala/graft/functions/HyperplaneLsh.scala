package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH bucket of a float/double vector — native
  * codegen'd counterpart of the composed form (`bits` separate
  * aggregate(zip_with(...)) folds with an xxhash64 per element, all on
  * Catalyst's interpreted higher-order-function path). One fused
  * bits×dim loop, no per-row allocation, deterministic and model-free:
  * hyperplane j's component i is the sign of a splitmix64 mix of
  * (j, i), memoized per (bits, dim) so rows pay one table lookup per
  * element instead of re-deriving the identical ±1 matrix. Identical
  * vectors land in identical buckets on any executor and across runs —
  * the property the LSH recall invariant rests on.
  *
  * Degenerate vectors — empty, or containing a null element — bucket
  * as NULL and drop out of candidate joins: they cannot be
  * cosine-scored anyway (null / zero-norm), and herding them into one
  * shared bucket (the composed form's null-fold made every such row
  * bucket 0) builds a quadratic garbage bucket out of exactly the rows
  * that can never produce a usable pair.
  */
case class HyperplaneLsh(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63] (got $bits)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_lsh expects an array<float|double> input, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_lsh"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    val f = isFloat
    val signs = HyperplaneLsh.signTable(bits, n)
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        proj += v * signs(j * n + i)
        i += 1
      }
      if (proj >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val signs = ctx.freshName("signs")
      val get = if (isFloat) "getFloat" else "getDouble"
      val cls = classOf[HyperplaneLsh].getName
      s"""
         |int $n = $x.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $signs = $cls.signTable($bits, $n);
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits && !${ev.isNull}; $j++) {
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $proj += ((double) $x.$get($i)) * $signs[$j * $n + $i];
         |    }
         |    if (!${ev.isNull} && $proj >= 0) $bucket |= 1L << $j;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

object HyperplaneLsh {
  /** Flattened ±1 hyperplane matrix for (bits, dim), memoized per
    * executor JVM — the matrix is identical for every row, so the
    * splitmix64 mixes run once instead of bits×dim times per row.
    * bits×dim×8 bytes (a 768-dim, 8-bit table is ~48 KiB). Callable
    * from generated code. */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def signTable(bits: Int, dim: Int): Array[Double] =
    tables.computeIfAbsent((bits, dim), { case (b, d) =>
      val a = new Array[Double](b * d)
      var j = 0
      while (j < b) {
        var i = 0
        while (i < d) { a(j * d + i) = sign(j, i); i += 1 }
        j += 1
      }
      a
    })

  /** ±1.0 from a splitmix64 mix of (plane, component) — stateless,
    * deterministic on every JVM, callable from generated code. */
  def sign(plane: Int, component: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + component.toLong + 0x632BE59BD9B4E019L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  def apply(v: Column, bits: Int): Column =
    GraftBridge.column(HyperplaneLsh(GraftBridge.expression(v), bits))
}

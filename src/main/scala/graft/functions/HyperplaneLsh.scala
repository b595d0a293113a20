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
  * (j, i), so identical vectors land in identical buckets on any
  * executor and across runs — the property the LSH recall invariant
  * rests on. Bucket VALUES differ from the old xxhash64-based ones;
  * only self-consistency matters (both join sides use this same
  * expression).
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
    val f = isFloat
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        proj += v * HyperplaneLsh.sign(j, i)
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
      val get = if (isFloat) "getFloat" else "getDouble"
      val cls = classOf[HyperplaneLsh].getName
      s"""
         |int $n = $x.numElements();
         |long $bucket = 0L;
         |for (int $j = 0; $j < $bits && !${ev.isNull}; $j++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $proj += ((double) $x.$get($i)) * $cls.sign($j, $i);
         |  }
         |  if (!${ev.isNull} && $proj >= 0) $bucket |= 1L << $j;
         |}
         |if (!${ev.isNull}) ${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

object HyperplaneLsh {
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

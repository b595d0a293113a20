package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row n-gram repetition statistics for the Gopher quality gate:
  * given one document's n-gram array, returns
  * `struct<n_grams:bigint, top:bigint, dup:bigint>` where `top` is the
  * highest single-gram occurrence count and `dup` the number of gram
  * occurrences whose gram appears more than once.
  *
  * Why an expression and not explode + groupBy: every n-gram of a
  * document already lives on that document's row, so the repetition
  * profile is a PER-ROW computation. The explode form ships every gram
  * of the corpus through a (doc_id, gram)-keyed exchange — at 100 TB
  * that shuffle (long string keys, ~token-count rows) IS the job. This
  * expression computes the same counts in one hash pass per row inside
  * whole-stage codegen: zero exchanges, zero joins, memory bounded by
  * one document's distinct grams.
  *
  * Null elements are legal map keys (counted like any gram); a null
  * array yields a null struct.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new java.util.HashMap[Any, Array[Long]]()
    var i = 0
    while (i < n) {
      val g = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1L)) else c(0) += 1
      i += 1
    }
    var top = 0L
    var dup = 0L
    counts.values.forEach { c =>
      if (c(0) > top) top = c(0)
      if (c(0) > 1) dup += c(0)
    }
    InternalRow(n.toLong, top, dup)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val top = ctx.freshName("top")
      val dup = ctx.freshName("dup")
      val it = ctx.freshName("it")
      val v = ctx.freshName("v")
      s"""
         |int $n = $g.numElements();
         |java.util.HashMap $m = new java.util.HashMap();
         |for (int $i = 0; $i < $n; $i++) {
         |  Object $k = $g.isNullAt($i) ? null : $g.getUTF8String($i);
         |  long[] $c = (long[]) $m.get($k);
         |  if ($c == null) { $m.put($k, new long[]{1L}); } else { $c[0]++; }
         |}
         |long $top = 0L;
         |long $dup = 0L;
         |java.util.Iterator $it = $m.values().iterator();
         |while ($it.hasNext()) {
         |  long $v = ((long[]) $it.next())[0];
         |  if ($v > $top) $top = $v;
         |  if ($v > 1L) $dup += $v;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(long) $n, $top, $dup});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** Column-level entry point. */
  def apply(grams: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(grams)))
}

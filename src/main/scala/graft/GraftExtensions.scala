package graft

import graft.functions.{CosineSimilarity, HyperplaneLsh}
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Library entry point: graft's native Catalyst expressions as plain
  * SQL functions, so a Spark user gets them with nothing but
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `GraftFunctions.register(spark)` on a live session). This is
  * the Spark-idiomatic analogue of the reference's built-in function
  * surface (sql_bridge.rs registers its scalar functions in its own
  * dispatcher) — here they enter Catalyst's registry and participate
  * in codegen, constant folding, and EXPLAIN like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    for ((name, usage, builder) <- GraftFunctions.all)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
        builder))
}

object GraftFunctions {

  /** (name, usage, builder) for every SQL-registrable graft function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      "cosine_similarity(a, b) - exact cosine similarity of two float/double arrays",
      (args: Seq[Expression]) => {
        require(args.size == 2,
          s"cosine_similarity(a, b) takes 2 arguments, got ${args.size}")
        CosineSimilarity(args.head, args(1))
      }),
    ("hyperplane_lsh",
      "hyperplane_lsh(vec, bits) - deterministic random-hyperplane LSH bucket of a float/double array",
      (args: Seq[Expression]) => {
        require(args.size == 2,
          s"hyperplane_lsh(vec, bits) takes 2 arguments, got ${args.size}")
        val bits = args(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"hyperplane_lsh bits must be an integer literal, got ${other.sql}")
        }
        HyperplaneLsh(args.head, bits)
      }),
    ("top_k_by",
      "top_k_by(score, id, k) - aggregate keeping the k best (score DESC, id ASC) pairs per group, best-first",
      (args: Seq[Expression]) => {
        require(args.size == 3,
          s"top_k_by(score, id, k) takes 3 arguments, got ${args.size}")
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"top_k_by k must be an integer literal, got ${other.sql}")
        }
        graft.functions.TopKByScore(args.head, args(1), k)
          .toAggregateExpression()
      }),
    ("freq_items",
      "freq_items(item, m) - Misra-Gries frequent-items aggregate: at most m (item, est) counters per group, est-descending; every item with share > 1/(m+1) guaranteed present",
      (args: Seq[Expression]) => {
        require(args.size == 2,
          s"freq_items(item, m) takes 2 arguments, got ${args.size}")
        val m = args(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"freq_items m must be an integer literal, got ${other.sql}")
        }
        graft.functions.FrequentItems(args.head, m).toAggregateExpression()
      }),
    ("repetition_stats",
      "repetition_stats(grams) - struct(n_grams, top, dup) occurrence statistics of a string array, one hash pass per row",
      (args: Seq[Expression]) => {
        require(args.size == 1,
          s"repetition_stats(grams) takes 1 argument, got ${args.size}")
        graft.functions.RepetitionStats(args.head)
      }))

  /** Runtime registration for an already-constructed session. */
  def register(spark: SparkSession): Unit =
    for ((name, usage, builder) <- all)
      GraftBridge.registerFunction(spark, name, usage, builder)
}

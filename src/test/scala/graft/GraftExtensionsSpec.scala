package graft

import graft.functions.{CosineSimilarity, HyperplaneLsh}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft's native expressions as plain SQL functions: the
  * `spark.sql.extensions=graft.GraftExtensions` builder path and the
  * live-session `GraftFunctions.register` path share one registry of
  * builders, so SQL-text results must match the Column API bit-exactly.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("cosine_similarity and hyperplane_lsh callable from SQL text") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .where($"vec_id" < 50)
    df.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       cosine_similarity(a.embedding, b.embedding) AS sim,
        |       hyperplane_lsh(a.embedding, 8) AS bucket
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id""".stripMargin)
      .orderBy("id1", "id2").collect()
    val viaColumns = df.as("a").join(df.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        CosineSimilarity(col("a.embedding"), col("b.embedding")).as("sim"),
        HyperplaneLsh(col("a.embedding"), 8).as("bucket"))
      .orderBy("id1", "id2").collect()
    assert(viaSql.toSeq === viaColumns.toSeq)
    assert(viaSql.nonEmpty && viaSql.forall(r => !r.isNullAt(2)))
  }

  test("the extensions builder wires the same functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder list must not throw
    // arity errors surface as clear messages through the SQL path
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0))").collect()
    }
    assert(err.getMessage.contains("cosine_similarity"))
  }

  test("repetition_stats callable from SQL text, equal to the Column API") {
    val viaSql = spark.sql(
      """SELECT repetition_stats(array('a b', 'b c', 'a b')) AS st""")
      .selectExpr("st.n_grams", "st.top", "st.dup").head()
    assert((viaSql.getLong(0), viaSql.getLong(1), viaSql.getLong(2)) === ((3L, 2L, 2L)))
  }

  test("bits argument must be a literal") {
    spark.sql("SELECT 1 AS n").createOrReplaceTempView("one_ext")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT hyperplane_lsh(array(CAST(1.0 AS DOUBLE)), n) FROM one_ext")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
